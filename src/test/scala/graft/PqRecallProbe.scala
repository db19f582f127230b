package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Test-scoped recall probe for the OPQ go/no-go decision (round-8
  * VERDICT ask #8: "OPQ rotation / residual re-ranking — only with a
  * measured recall gap on a driver workload"). Residual re-ranking
  * (`ivfPqSearchReranked`) already exists; this probe decomposes the
  * remaining recall gap over an (nProbe, refine) grid.
  *
  * Measured at sf0.1 (5000 vecs, 10 queries, recall@10, m=16 k=32
  * nCentroids=16), 2026-08-14:
  *
  * {{{
  * nProbe= 6 refine=1 0.30   nProbe=16 refine=1 0.38
  * nProbe= 6 refine=2 0.44   nProbe=16 refine=2 0.51
  * nProbe= 6 refine=4 0.62   nProbe=16 refine=4 0.82
  * nProbe= 6 refine=8 0.70   nProbe=16 refine=8 0.90
  * }}}
  *
  * DECISION — OPQ stays deferred:
  *  1. the gap decomposes as ~0.20 coarse-pruning loss (6 → 16 lists at
  *     refine=8) + ~0.10 residual PQ distortion (at full probing);
  *     OPQ's rotation attacks only the SMALLER component — nProbe and
  *     refine are cheaper levers (refine costs k×refine exact scores,
  *     corpus-size-independent);
  *  2. the fixture's synthetic embeddings are isotropic (i.i.d. dims),
  *     and OPQ's objective is invariant under rotation of isotropic
  *     data — on THIS workload a learned rotation cannot show a
  *     measurable lift, so there is no driver workload exhibiting the
  *     gap the ask requires before building it.
  *
  * `sbt "Test/runMain graft.PqRecallProbe [nQueries] [sfDir]"`
  */
object PqRecallProbe {
  def main(args: Array[String]): Unit = {
    val nQ = if (args.nonEmpty) args(0).toInt else 10
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Quantization
    val emb = Tables.embeddings(spark, d)
    val idx = Quantization.ivfPqBuild(
      emb, "embedding", "vec_id",
      nCentroids = 16, refineIters = 1, m = 16, k = 32, iters = 2)
    val qids = (0L until nQ.toLong)
    val refines = Seq(1, 2, 4, 8)
    // (nProbe, refine) grid: nProbe=16 (ALL lists) separates coarse-
    // pruning loss from PQ quantization distortion — if recall saturates
    // with full probing, the gap is the coarse quantizer, and OPQ (which
    // only reduces PQ distortion) cannot close it
    val grid = for { np <- Seq(6, 16); r <- refines } yield (np, r)
    val perRefine = scala.collection.mutable.Map.empty[(Int, Int), List[Double]]
    for (qid <- qids) {
      val qv = emb.filter(col("vec_id") === qid)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
      val exact = emb.filter(col("vec_id") =!= qid)
        .select(col("vec_id"), graft.functions.VectorFunctions
          .sqDist(col("embedding"), array(qv.map(lit): _*)).as("_d"))
        .orderBy(col("_d").asc, col("vec_id").asc).limit(10)
        .collect().map(_.getLong(0)).toSet
      for ((np, r) <- grid) {
        val got =
          (if (r == 1)
             Quantization.ivfPqSearch(idx, qv, 10, nProbe = np, excludeId = Some(qid))
           else
             Quantization.ivfPqSearchReranked(
               idx, emb, "embedding", qv, 10, nProbe = np, refine = r,
               excludeId = Some(qid)))
            .collect().map(_.getLong(0)).toSet
        perRefine((np, r)) =
          ((exact intersect got).size / 10.0) :: perRefine.getOrElse((np, r), Nil)
      }
    }
    for ((np, r) <- grid) {
      val rs = perRefine((np, r))
      println(f"[pq-recall] nProbe=$np%2d refine=$r%d mean recall@10 = ${rs.sum / rs.size}%.3f  (n=${rs.size}%d, min=${rs.min}%.1f)")
    }
    graft.CacheUtil.release(idx.encoded)
    spark.stop()
  }
}
