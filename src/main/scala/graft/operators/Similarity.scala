package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`ArrayType(FloatType)`).
  * Baseline: brute-force cosine top-k (exact). Scale path: LSH
  * random-hyperplane bucketing — candidates come from an equi-join on the
  * bucket key, so the cross product never materializes.
  */
object Similarity {

  /** Exact top-k neighbors of one query id by cosine. The query vector is
    * a 1-row broadcast; ranking is (cosine desc, id asc) so results are
    * deterministic under ties. Output: neighbor_id, rank.
    *
    * At scale the scan side stays fully distributed; the global top-k is
    * a TakeOrdered (per-partition heaps + driver merge of k).
    */
  def knn(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryId: Long,
      k: Int
  ): DataFrame = {
    val q = df
      .filter(col(idCol) === queryId)
      .select(col(vecCol).as("_qv"))
    val scored = df
      .filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("_cos", VectorFunctions.cosine(col(vecCol), col("_qv")))
      .orderBy(col("_cos").desc, col(idCol).asc)
      .limit(k)
    scored
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("_cos").desc, col(idCol).asc))
      )
      .select(col(idCol).as("neighbor_id"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplanes (seeded driver-side; tiny,
    * broadcast as literals and constant-folded by Catalyst).
    */
  private def planes(nPlanes: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Random-hyperplane (SimHash-for-vectors) bucket signature: one bit per
    * plane = sign of the dot product, packed into a long. Cosine-similar
    * vectors collide with high probability.
    */
  def hyperplaneSignature(
      vec: Column,
      nPlanes: Int,
      dim: Int,
      seed: Long = 42L
  ): Column = {
    val ps = planes(nPlanes, dim, seed)
    val bits = ps.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(VectorFunctions.dot(vec, planeLit) >= 0, shiftleft(lit(1L), i))
        .otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN top-k for one query id: candidates share the query's hyperplane
    * bucket or any 1-bit-flip neighbor bucket (multi-probe for recall),
    * then exact cosine ranking within candidates. Bucket equi-join — the
    * shape that scales to IVF-style partitioned indexes.
    */
  def annTopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryId: Long,
      k: Int,
      nPlanes: Int = 12,
      dim: Int = 64,
      seed: Long = 42L
  ): DataFrame = {
    val withSig = df.withColumn(
      "_sig",
      hyperplaneSignature(col(vecCol), nPlanes, dim, seed)
    )
    // query side: its bucket + all 1-bit flips (multi-probe)
    val probeSigs = withSig
      .filter(col(idCol) === queryId)
      .select(
        explode(
          array(
            col("_sig") +:
              (0 until nPlanes).map(b =>
                col("_sig").bitwiseXOR(shiftleft(lit(1L), b))
              ): _*
          )
        ).as("_probe"),
        col(vecCol).as("_qv")
      )
    withSig
      .filter(col(idCol) =!= queryId)
      .join(broadcast(probeSigs), col("_sig") === col("_probe"))
      .withColumn("_cos", VectorFunctions.cosine(col(vecCol), col("_qv")))
      .orderBy(col("_cos").desc, col(idCol).asc)
      .limit(k)
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("_cos").desc, col(idCol).asc))
      )
      .select(col(idCol).as("neighbor_id"), col("rank"))
  }

  /** IVF (inverted-file) index: deterministic coarse centroids (an
    * evenly-strided sample of the vectors themselves — k-means would
    * refine them, but stride-sampling is deterministic and adequate for a
    * coarse quantizer), each vector assigned to its nearest centroid.
    * The centroid list is tiny and broadcast as literals; assignment is a
    * per-row argmin — no shuffle.
    */
  def ivfAssign(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      nCentroids: Int
  ): DataFrame = {
    val n = df.count()
    val stride = math.max(1L, n / nCentroids)
    val centroids = df
      .filter(pmod(col(idCol), lit(stride)) === 0)
      .limit(nCentroids)
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val centArr = centroids.map { case (cid, v) =>
      struct(lit(cid).as("cid"), array(v.map(x => lit(x.toDouble)): _*).as("cv"))
    }
    // argmin over the centroid array: array_sort by (distance, cid), take head
    val scored = array_sort(
      array(centArr.map { c =>
        struct(
          VectorFunctions
            .euclidean(col(vecCol), c.getField("cv"))
            .as("dist"),
          c.getField("cid").as("cid")
        )
      }: _*)
    )
    df.withColumn("_centroid", scored.getItem(0).getField("cid"))
  }

  /** IVF ANN top-k for one query id: probe the `nProbe` centroids nearest
    * to the query vector, exact cosine ranking within those inverted
    * lists only. The probe set is computed once (tiny); candidate scan is
    * a partition-prunable equi-filter on the centroid column — at scale
    * the inverted lists are the partition layout.
    */
  def ivfTopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryId: Long,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4
  ): DataFrame = {
    val assigned = ivfAssign(df, vecCol, idCol, nCentroids).cache()
    try {
      val qRow = assigned.filter(col(idCol) === queryId).select(vecCol).head()
      val qVec = qRow.getSeq[Float](0).toArray
      val qLit = array(qVec.map(x => lit(x.toDouble)): _*)
      // rank centroids by distance to the query → probe set
      val probes = assigned
        .select(col("_centroid"))
        .distinct()
        .join(
          assigned.select(col(idCol).as("_cid2"), col(vecCol).as("_cv")),
          col("_centroid") === col("_cid2")
        )
        .withColumn("_qd", VectorFunctions.euclidean(col("_cv"), qLit))
        .orderBy(col("_qd").asc)
        .limit(nProbe)
        .collect()
        .map(_.getLong(0))
      assigned
        .filter(col("_centroid").isin(probes: _*) && col(idCol) =!= queryId)
        .withColumn("_cos", VectorFunctions.cosine(col(vecCol), qLit))
        .orderBy(col("_cos").desc, col(idCol).asc)
        .limit(k)
        .withColumn(
          "rank",
          row_number().over(Window.orderBy(col("_cos").desc, col(idCol).asc))
        )
        .select(col(idCol).as("neighbor_id"), col("rank"))
    } finally assigned.unpersist()
  }

  /** LSH-blocked near-dup pairs over embeddings (scale path of
    * [[Dedup.embeddingNearDupsBrute]]): pairs must share a bucket, then
    * exact cosine filter.
    */
  def lshNearDups(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double,
      nPlanes: Int = 8,
      dim: Int = 64,
      seed: Long = 42L
  ): DataFrame = {
    val withSig = df.select(
      col(idCol).as("_id"),
      col(vecCol).as("_v"),
      hyperplaneSignature(col(vecCol), nPlanes, dim, seed).as("_sig")
    )
    withSig
      .as("a")
      .join(
        withSig.as("b"),
        col("a._sig") === col("b._sig") && col("a._id") < col("b._id")
      )
      .withColumn("cos", VectorFunctions.cosine(col("a._v"), col("b._v")))
      .filter(col("cos") > threshold)
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"))
  }
}
