package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Test-scoped scale probe for the BATCHED retrieval claim (round 18):
  * hold the QUERY BATCH fixed (the 69 copy-0 `vec_id % 29 == 0`
  * queries — identical rows at every factor) and scale only the corpus
  * (1×/10×/100× [[ScaleFixture]] embeddings), so wall time isolates the
  * corpus-size dependence of one batched call — the daily-delta-
  * against-a-growing-index shape [[operators.Quantization
  * .ivfSq8SearchMany]] exists for. Three columns per factor:
  *
  *  - `pruned`: the production shape (nProbe = 4 of 16 lists) — DPP
  *    prunes the codes scan to the union of probed lists; expected to
  *    grow with corpus/nCentroids per probed list;
  *  - `full`: nProbe = all lists (the s19 ORACLE form) — scores the
  *    whole corpus per query; expected to grow linearly with the
  *    corpus and exist only as the correctness anchor;
  *  - `brute`: [[operators.Similarity.knnMany]] exact cosine — the
  *    recall baseline, |corpus| × |queries| floats by definition.
  *
  * Result-shape require()s pin non-vacuity (69 queries × k rows each).
  *
  * `sbt "Test/runMain graft.BatchedRetrievalProbe <dir1x> <dir10x> <dir100x>"`
  */
object BatchedRetrievalProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BatchedRetrievalProbe <sfDir>...")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import operators.{Quantization, Similarity}

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    args.foreach { dir =>
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      val n = emb.count()
      // the FIXED query batch: copy-0 rows only (ids below the
      // ScaleFixture stride), the same 69 vectors at every factor
      val queries = emb
        .filter(col("vec_id") < 100000000L && pmod(col("vec_id"), lit(29)) === 0)
        .localCheckpoint(true)
      val nq = queries.count()
      val path = "/root/repo/target/tmp/batched_probe_idx"
      val (_, build) = timed {
        Quantization.ivfSq8Build(emb, "embedding", "vec_id", path, nCentroids = 16)
      }
      val idx = Quantization.ivfSq8Read(spark, path, "vec_id")
      val (prunedRows, pruned) = timed {
        Quantization.ivfSq8SearchMany(
          spark, idx, queries, "embedding", "vec_id", k = 10, nProbe = 4).count()
      }
      val (fullRows, full) = timed {
        Quantization.ivfSq8SearchMany(
          spark, idx, queries, "embedding", "vec_id", k = 10, nProbe = 16).count()
      }
      val (bruteRows, brute) = timed {
        Similarity.knnMany(
          emb, "embedding", "vec_id", queries, "embedding", "vec_id", k = 10).count()
      }
      require(fullRows == nq * 10 && bruteRows == nq * 10,
        s"full/brute must return k rows per query: $fullRows/$bruteRows for $nq queries")
      require(prunedRows == nq * 10,
        s"pruned returned $prunedRows rows for $nq queries (a probed list ran dry?)")
      println(f"[batched-probe] corpus=$n%7d queries=$nq%3d build=$build%6.2f " +
        f"pruned=$pruned%6.2f full=$full%6.2f brute=$brute%6.2f")
      graft.CacheUtil.release(queries)
      graft.CacheUtil.release(emb)
    }
    spark.stop()
  }
}
