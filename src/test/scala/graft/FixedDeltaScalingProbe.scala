package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-scoped scale probe, the controlled-experiment companion to
  * [[IncrementalIndexProbe]]: hold the DELTA fixed and scale only the
  * CORPUS, so probe wall time isolates its corpus-size dependence —
  * the empirical form of the 100 TB claim that daily-ingest cost
  * tracks the delta, not the corpus.
  *
  * `sbt "Test/runMain graft.FixedDeltaScalingProbe <dir1x> <dir10x> <dir100x>"`
  * (dirs from [[ScaleFixture]] — within-copy structure isomorphic,
  * cross-copy similarity collapsed). The delta is the SAME 500 docs at
  * every factor: copy-0 fixture docs with one token appended, so each
  * near-dups exactly its copy-0 original and nothing in any salted
  * copy. Emitted pair sets are therefore IDENTICAL across factors
  * (asserted) — only the corpus behind the index varies; any probe-time
  * growth is pure corpus-side cost (the column-pruned bucket-admission
  * scan plus bigger bucket tables behind the zero-Exchange probe join).
  *
  * Build time is reported too (it SHOULD scale ~linearly — the one-time
  * amortized cost); the headline is the probe row.
  */
object FixedDeltaScalingProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: FixedDeltaScalingProbe <sfDir>...")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // the fixed delta: 500 copy-0 docs, one appended token each — a
    // near-dup of exactly its original (ids in the fixtures' copy-0
    // range at every factor; salted copies share no shingle with it)
    val deltaFrom = (dir: String) =>
      spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") < 100000000L) // copy 0 only
        .orderBy("doc_id").limit(500)
        .select(
          // offset far above copy 99's id range (99 × 1e8 + fixture ids)
          (col("doc_id") + lit(100000000000L)).as("doc_id"),
          concat(col("text"), lit(" probedelta")).as("text"))
        .localCheckpoint(true)

    var prevPairs: Option[Set[(Long, Long)]] = None
    args.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text")).localCheckpoint(true)
      val n = docs.count()
      val delta = deltaFrom(dir)
      // --- minhash family ---
      val (mhIdx, mhBuild) = timed {
        operators.Dedup.writeMinHashIndex(docs, "text", "doc_id", "fdsp_mh")
      }
      val (mhPairs, mhProbe) = timed {
        val df = operators.Dedup
          .minHashNearDupsIncremental(delta, "text", "doc_id", 0.4, mhIdx)
        val p = df.select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        CacheUtil.release(df)
        p
      }
      // --- simhash64 family ---
      val (shIdx, shBuild) = timed {
        operators.Dedup.writeSimHashIndex(docs, "text", "doc_id", "fdsp_sh")
      }
      val (shPairs, shProbe) = timed {
        val df = operators.Dedup
          .simHashNearDupsIncremental(delta, "text", "doc_id", shIdx)
        val p = df.count()
        CacheUtil.release(df)
        p
      }
      println(f"[fdsp] corpus=$n%9d  mh_build=$mhBuild%7.2f s  mh_probe=$mhProbe%6.2f s (${mhPairs.size}%5d pairs)  sh_build=$shBuild%7.2f s  sh_probe=$shProbe%6.2f s ($shPairs%7d pairs)")
      // the controlled-experiment invariant: the fixed delta's minhash
      // pair set is byte-identical at every corpus factor (simhash's
      // wide-radius count is fixture-dense and copy-0-stable too, but
      // pairs against copy-0 only — count equality is the cheap check)
      prevPairs.foreach { p =>
        require(p == mhPairs,
          s"minhash pair set changed with corpus factor: ${p.size} vs ${mhPairs.size}")
      }
      prevPairs = Some(mhPairs)
      spark.sql(s"DROP TABLE IF EXISTS `${mhIdx.bandTable}`")
      spark.sql(s"DROP TABLE IF EXISTS `${mhIdx.shingleTable}`")
      spark.sql(s"DROP TABLE IF EXISTS `${shIdx.chunkTable}`")
      CacheUtil.release(delta)
      CacheUtil.release(docs)
    }
    spark.stop()
  }
}
