package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SINK half of exactly-once for the probe-then-append fold family
  * — the piece [[ReplaySafe]] explicitly leaves to the caller: a crash
  * AFTER a fold's index appends committed but BEFORE the caller
  * persisted the fold's emissions loses them forever, because the
  * replayed fold (correctly) emits nothing. The fix is the standard
  * foreachBatch discipline — persist the emissions durably BEFORE the
  * replay ledger commits — packaged so every fold can apply it: each
  * fold takes an optional `sink` callback invoked on the materialized
  * emission frame before its first index append, and this object is
  * the canonical callback.
  *
  * Layout: one parquet dir per batch, `dir/batch_id=<k>/` (Spark
  * partition discovery reads the whole store as one frame with a
  * `batch_id` column). Commit protocol per batch:
  *
  *  1. if `batch_id=<k>` exists → SKIP (first write wins). The fold
  *     calls the sink before any ledger append and each batch's
  *     emission frame is a deterministic function of the pre-append
  *     index state, so an existing dir is either byte-equivalent to
  *     what this attempt would write, or — when the previous attempt
  *     crashed after BOTH the sink commit and the appends — strictly
  *     more complete than the replay's (suppressed) re-derivation.
  *     First-write-wins is what makes replay suppression safe here:
  *     overwrite-by-batch semantics would let a replayed, fully-folded
  *     batch clobber real emissions with the empty (or, in the exact
  *     family's NULL-text niche, partial) re-derivation.
  *  2. write to a dot-prefixed staging dir (hidden from Spark/Hadoop
  *     file listings), then `rename(staging, target)` — atomic on a
  *     posix local FS and on HDFS, so a reader never sees a
  *     half-written batch dir and a crash mid-write leaves only
  *     invisible staging litter, reclaimed by the next attempt's
  *     [[sweepStaging]].
  *
  * Empty emission frames ARE committed (a schema-bearing zero-row
  * partition): the dir then doubles as a complete per-batch progress
  * ledger ([[committedBatches]]), and a replayed batch — whose
  * re-derivation is empty — still skips at step 1, so it can never
  * erase a first attempt's rows.
  *
  * Object stores without atomic rename (S3) need a manifest commit
  * instead of step 2 — pair the store with a table format there; the
  * first-write-wins contract (step 1) is what any implementation must
  * keep. Assumes one writer per batch id at a time (Structured
  * Streaming replays are sequential by the offset log).
  *
  * Provenance: the overwrite/skip-by-batchId discipline is the standard
  * Structured Streaming foreachBatch exactly-once recipe (Apache Spark
  * Structured Streaming programming guide, "foreachBatch"); the
  * reference's analog is surviving node/session death with re-shippable
  * state (/root/reference/R/rscl.R:98-104) — here the re-shipped unit is
  * a micro-batch and the sink is what makes its emissions survivable.
  */
object IdempotentSink {

  /** The canonical fold `sink` argument:
    * `fold(..., sink = Some(IdempotentSink.batchWriter(dir, batchId)))`.
    */
  def batchWriter(dir: String, batchId: Long): DataFrame => Unit =
    df => { writeBatch(df, dir, batchId); () }

  /** Commit `emissions` as batch `batchId` of `dir` under the
    * first-write-wins protocol above. Returns true iff THIS call
    * committed the batch (false = already committed, nothing written).
    */
  def writeBatch(emissions: DataFrame, dir: String, batchId: Long): Boolean = {
    require(
      !emissions.columns.contains("batch_id"),
      "emissions must not carry a batch_id column — the sink adds it as " +
        "the partition key")
    val spark = emissions.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new Path(dir)
    val fs = base.getFileSystem(conf)
    val target = new Path(base, s"batch_id=$batchId")
    if (fs.exists(target)) return false
    fs.mkdirs(base)
    sweepStaging(spark, dir, batchId)
    val staging =
      new Path(base, s".staging-$batchId-${java.util.UUID.randomUUID()}")
    emissions.write.parquet(staging.toString)
    // rename-commit
    if (!fs.rename(staging, target)) {
      fs.delete(staging, true)
      return false
    }
    // Hadoop rename semantics: if target already existed (a concurrent
    // winner landed between the exists check and the rename), our
    // staging dir was moved INSIDE it rather than becoming it — the
    // litter is dot-prefixed (invisible to reads) either way; detect,
    // clean, and yield to the winner
    val movedInside = new Path(target, staging.getName)
    if (fs.exists(movedInside)) {
      fs.delete(movedInside, true)
      return false
    }
    true
  }

  /** Delete staging litter for `batchId` left by a crashed prior
    * attempt (safe: stagings are only ever pre-commit copies).
    */
  private def sweepStaging(spark: SparkSession, dir: String, batchId: Long): Unit = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(base))
      fs.listStatus(base)
        .filter(_.getPath.getName.startsWith(s".staging-$batchId-"))
        .foreach(s => fs.delete(s.getPath, true))
  }

  /** Every committed batch's emissions as one frame, with the
    * `batch_id` partition column. Requires at least one committed
    * batch (parquet needs a schema source).
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Batch ids committed so far, ascending — the store's progress
    * ledger (empty batches count: they committed a zero-row dir).
    */
  def committedBatches(spark: SparkSession, dir: String): Seq[Long] = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) Seq.empty
    else
      fs.listStatus(base)
        .map(_.getPath.getName)
        .collect { case s if s.startsWith("batch_id=") =>
          s.stripPrefix("batch_id=").toLong
        }
        .sorted
        .toSeq
  }
}
