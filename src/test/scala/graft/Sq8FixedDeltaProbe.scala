package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Test-scoped scale probe for the quantized-ANN ingest claim, the SQ8
  * twin of [[FixedDeltaScalingProbe]]: hold the DELTA fixed (2,000
  * copy-0 vectors with far-shifted ids) and scale only the corpus
  * (1×/10×/100× [[ScaleFixture]] embeddings), so append wall time
  * isolates its corpus-size dependence — the empirical form of "the
  * daily crawl's encode cost tracks the delta, not the corpus". The
  * probe rows measure the search side: the flat-scan `sq8TopKIndexed`
  * (expected to grow with the corpus — the gap IVF-SQ8 exists to
  * close) vs the pruned `ivfSq8Search` (expected to grow with
  * corpus/nCentroids per probed list).
  *
  * `sbt "Test/runMain graft.Sq8FixedDeltaProbe <dir1x> <dir10x> <dir100x>"`
  */
object Sq8FixedDeltaProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Sq8FixedDeltaProbe <sfDir>...")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import operators.Quantization

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    args.foreach { dir =>
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      val n = emb.count()
      // the fixed delta: every copy-0 vector, ids shifted far above any
      // salted copy's range — identical bytes at every factor
      val delta = emb.filter(col("vec_id") < 100000000L)
        .select((col("vec_id") + lit(100000000000L)).as("vec_id"), col("embedding"))
        .localCheckpoint(true)
      val qv = emb.filter(col("vec_id") === 0L)
        .select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0).toArray
      // ---- flat SQ8 index ----
      val (idx, build) = timed {
        Quantization.writeSq8Index(emb, "embedding", "vec_id", "sq8_fdsp")
      }
      val (_, app) = timed {
        Quantization.appendToSq8Index(delta, "embedding", "vec_id", idx)
      }
      require(
        spark.table(idx.codeTable).count() == n + delta.count(),
        "append must land every delta row exactly once")
      val (_, probe) = timed {
        Quantization.sq8TopKIndexed(spark, idx, qv, k = 10, excludeId = Some(0L))
          .collect()
      }
      // ---- IVF-SQ8 pruned index ----
      val path = "/root/repo/target/tmp/sq8_fdsp_ivf"
      val (ivfIdx, ivfBuild) = timed {
        Quantization.ivfSq8Build(emb, "embedding", "vec_id", path, nCentroids = 16)
      }
      val (_, ivfApp) = timed {
        Quantization.ivfSq8Append(spark, delta, path, "embedding", "vec_id")
      }
      val (_, ivfProbe) = timed {
        Quantization.ivfSq8Search(spark, ivfIdx, qv, k = 10, nProbe = 4,
          excludeId = Some(0L)).collect()
      }
      // ---- st15's ingest form: the PARTITION-PRUNED replay ledger ----
      // a second fixed delta (ids shifted again) through the replay-safe
      // append, then the SAME call replayed: the ledger scan reads only
      // the _centroid partitions the delta touches, so BOTH costs must
      // stay flat as the corpus grows — the claim st15 rides on
      val delta2 = delta
        .select((col("vec_id") + lit(100000000000L)).as("vec_id"), col("embedding"))
        .localCheckpoint(true)
      val before = spark.read.parquet(s"$path/codes").count()
      val (_, rsApp) = timed {
        Quantization.ivfSq8AppendReplaySafe(spark, delta2, path, "embedding", "vec_id")
      }
      val afterFirst = spark.read.parquet(s"$path/codes").count()
      require(afterFirst == before + delta2.count(),
        "replay-safe append must land every delta row exactly once")
      val (_, replay) = timed {
        Quantization.ivfSq8AppendReplaySafe(spark, delta2, path, "embedding", "vec_id")
      }
      require(spark.read.parquet(s"$path/codes").count() == afterFirst,
        "a replayed delta appended rows")
      println(f"[sq8-fdsp] corpus=$n%7d build=$build%6.2f append=$app%6.2f " +
        f"flatProbe=$probe%6.2f ivfBuild=$ivfBuild%6.2f ivfAppend=$ivfApp%6.2f " +
        f"prunedProbe=$ivfProbe%6.2f rsAppend=$rsApp%6.2f replay=$replay%6.2f")
      spark.sql("DROP TABLE IF EXISTS sq8_fdsp_codes")
      graft.CacheUtil.release(delta2)
    }
    spark.stop()
  }
}
