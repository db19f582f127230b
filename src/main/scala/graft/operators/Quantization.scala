package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Product quantization (PQ) for embedding columns — the storage layout
  * that makes 100 TB of vectors searchable: each vector is split into `m`
  * subvectors, each subvector is replaced by the id of its nearest
  * per-subspace centroid (a "code"), so a `dim`-float vector compresses to
  * `m` small ints (64 floats → 8 bytes at m=8, 32× smaller), and distances
  * are approximated from a per-query lookup table without touching the
  * original floats (asymmetric distance computation, ADC). After Jégou,
  * Douze, Schmid, "Product Quantization for Nearest Neighbor Search"
  * (IEEE TPAMI 2011) — PQ/ADC in §II-III, IVFADC (the IVF-PQ residual
  * layout below) in §IV; public paper, independent implementation.
  *
  * Everything is DataFrame composition over compiled kernels: training is
  * Lloyd iterations expressed as aggregation (ONE job per iteration
  * covering all subspaces, at index-BUILD time only), encoding is one
  * [[PQEncode]] kernel call per row (codegen'd, no shuffle), and search
  * is a scan + TakeOrdered — the same shapes as [[Similarity]]'s IVF
  * index. Centroids live on the driver (m × k × dim/m doubles — tiny)
  * exactly like [[Similarity.IvfIndex]]; codes live distributed.
  */
object Quantization {

  /** Trained PQ codebooks: `centroids(sub)(code)` is the centroid of
    * subspace `sub` (length dim/m). Deterministic for a given corpus:
    * stride-sampled init + fixed Lloyd iterations, no RNG.
    */
  final case class PQCodebooks(
      m: Int,
      k: Int,
      dim: Int,
      centroids: Array[Array[Array[Double]]]
  ) {
    def subDim: Int = dim / m
  }

  /** The `sub`-th subvector (1-based slice; length dim/m). */
  private def subVec(vec: Column, sub: Int, subDim: Int): Column =
    slice(vec.cast("array<double>"), sub * subDim + 1, subDim)

  /** All `m` codes for one vector, as a single compiled expression. The
    * first cut expressed the argmin as m × k literal structs + m
    * array_sorts PER ROW — the generated Java grew with m·k·subDim and
    * janino recompiled it on every training iteration (new literals),
    * dominating the runtime 6-to-1 over actual execution. The kernel call
    * is constant-size source (the codebook rides along as a codegen
    * reference object), so the code cache hits across iterations and
    * passes.
    */
  private def encodeExpr(vec: Column, cb: PQCodebooks): Column =
    Shim.toColumn(
      PQEncode(Shim.toExpression(vec.cast("array<double>")), cb.centroids)
    )

  /** Train per-subspace codebooks: stride-sampled init (the IVF rule —
    * deterministic, no RNG), then `iters` Lloyd rounds, each one
    * assignment pass + per-(code, position) mean per subspace. Empty
    * clusters keep their previous centroid. Build-time cost only.
    */
  def pqTrain(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 2
  ): PQCodebooks = {
    val dim = df
      .select(size(col(vecCol)))
      .head()
      .getInt(0)
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim = dim / m
    // init: the same sampled rows seed every subspace. Numeric ids
    // stride directly (unchanged); any other id type takes a
    // hash-ORDERED k-row sample ([[Ops.hashOrderedSample]] — a
    // hash-residue stride filter would under-select binomially and trip
    // the seeds require on ~half of real string-id corpora).
    // SPARSE numeric ids (snowflake/random longs) under-select the
    // residue filter the same way (r15 verdict ask #2): when the strided
    // sample comes back short, fall back to the hash-ordered sample —
    // dense 0..n id corpora still hit the exact historical seeds, so
    // committed bench/oracle rows don't move.
    def collectSeeds(s: DataFrame): Array[Array[Double]] = s
      .select(col(vecCol).cast("array<double>"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    val seeds = {
      val strided = if (Ops.isNumericId(df, idCol)) {
        val n = df.count()
        val stride = math.max(1L, n / k)
        Some(collectSeeds(
          df.filter(pmod(col(idCol), lit(stride)) === 0).orderBy(col(idCol)).limit(k)))
      } else None
      strided match {
        case Some(s) if s.length == k => s
        case _ => collectSeeds(Ops.hashOrderedSample(df, idCol, k))
      }
    }
    require(seeds.length == k, s"corpus too small for k=$k (got ${seeds.length} seeds)")
    var cb = PQCodebooks(
      m, k, dim,
      Array.tabulate(m)(sub => seeds.map(_.slice(sub * subDim, (sub + 1) * subDim)))
    )
    for (_ <- 0 until iters) {
      val next = cb.centroids.map(_.map(_.clone()))
      // ONE job per iteration: assign every subspace's code (one kernel
      // call) and emit (sub, code, pos, value) in a single pass, then one
      // aggregation. A per-subspace loop here would rescan the corpus m
      // times per iteration (the shape that made the first cut 16× slower).
      val codes = encodeExpr(col(vecCol), cb)
      val perSub = array((0 until m).map { sub =>
        struct(
          lit(sub).as("_sub"),
          codes.getItem(sub).as("_code"),
          subVec(col(vecCol), sub, subDim).as("_sv")
        )
      }: _*)
      val means = df
        .select(explode(perSub).as("_e"))
        .select(
          col("_e._sub").as("_sub"),
          col("_e._code").as("_code"),
          posexplode(col("_e._sv")).as(Seq("_pos", "_v"))
        )
        .groupBy(col("_sub"), col("_code"), col("_pos"))
        .agg(avg(col("_v")).as("_m"))
        .collect()
      means.foreach(r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
      )
      cb = cb.copy(centroids = next)
    }
    cb
  }

  /** Encode: vector column → `m` codes (array<int>), one compiled kernel
    * call per row, no shuffle. The codes column is what a 100 TB pipeline
    * persists.
    */
  def pqEncode(df: DataFrame, vecCol: String, cb: PQCodebooks): DataFrame =
    df.withColumn("_pq", encodeExpr(col(vecCol), cb))

  /** Driver-side decode (centroid concatenation) — reconstruction for
    * tests/diagnostics; production search never reconstructs.
    */
  def pqDecodeLocal(codes: Seq[Int], cb: PQCodebooks): Array[Double] =
    codes.toArray.zipWithIndex.flatMap { case (c, sub) => cb.centroids(sub)(c) }

  /** ADC lookup table for one query: `lut(sub)(code)` = squared distance
    * between the query's sub-vector and that centroid. O(k · dim) on the
    * driver, once per query.
    */
  def adcLut(query: Array[Double], cb: PQCodebooks): Array[Array[Double]] =
    Array.tabulate(cb.m) { sub =>
      val qs = query.slice(sub * cb.subDim, (sub + 1) * cb.subDim)
      cb.centroids(sub).map { cv =>
        var s = 0.0
        var i = 0
        while (i < qs.length) { val d = qs(i) - cv(i); s += d * d; i += 1 }
        s
      }
    }

  /** ADC score: approximate squared distance = Σ_sub lut(sub)(code(sub)).
    * One compiled kernel call over the codes column; the original vectors
    * are never read.
    */
  def adcScore(codes: Column, lut: Array[Array[Double]]): Column =
    Shim.toColumn(PQAdc(Shim.toExpression(codes), lut))

  /** Top-k by ADC over a pre-encoded corpus: scan codes + TakeOrdered —
    * distributed, no shuffle beyond the final k-row merge. Ranks are
    * deterministic (ADC asc, id asc). Output: (neighbor_id, rank), plus
    * the ADC score as `adc` when `emitScore` is set (the audit form —
    * [[adcTopKAudit]] recomputes it through an independent join and
    * checks it bit-for-bit, which only works if the emitter shows it).
    */
  def pqSearchEncoded(
      encoded: DataFrame,
      idCol: String,
      query: Array[Double],
      cb: PQCodebooks,
      k: Int,
      excludeId: Option[Long] = None,
      emitScore: Boolean = false
  ): DataFrame = {
    val lut = adcLut(query, cb)
    val base = excludeId match {
      case Some(id) => encoded.filter(col(idCol) =!= id)
      case None     => encoded
    }
    Similarity.rankLimited(
      base
        // NULL codes (a null source vector) must not rank: NULL ADC
        // sorts NULLS-FIRST under asc and would eat top-k slots
        .filter(col("_pq").isNotNull)
        .withColumn("_adc", adcScore(col("_pq"), lut))
        .orderBy(col("_adc").asc, col(idCol).asc)
        .limit(k),
      idCol,
      keep = if (emitScore) Seq("_adc" -> "adc") else Nil
    )
  }

  /** End-to-end convenience (train + encode + search) for one query id —
    * the registry/gate form. Production amortizes train/encode across
    * queries; this pins the whole path under one deterministic call.
    */
  def pqSearch(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryId: Long,
      topK: Int,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 2
  ): DataFrame = {
    val cb = pqTrain(df, vecCol, idCol, m, k, iters)
    val q = lookupQueryVec(df, vecCol, idCol, queryId)
    pqSearchEncoded(pqEncode(df, vecCol, cb), idCol, q, cb, topK, Some(queryId))
  }

  // ---------------------------------------------------------- IVF-PQ

  /** IVF-PQ index: coarse centroids prune which rows are scored, PQ codes
    * on the RESIDUAL (vec − assigned coarse centroid) score them — the
    * residual's spread is much tighter than the raw vectors', so the same
    * code budget quantizes finer (the FAISS IVFPQ layout). Coarse
    * centroids + codebooks live on the driver; `(id, _centroid, _pq)`
    * lives distributed — at 100 TB that table is written partitioned by
    * `_centroid` so a probe is a partition-pruned scan of nProbe lists
    * (the [[Similarity.ivfWrite]] layout), scored off codes alone.
    */
  final case class IvfPqIndex(
      encoded: DataFrame,
      coarse: Array[Array[Double]],
      cb: PQCodebooks,
      idCol: String
  )

  /** Build: coarse quantizer (stride-seeded + Lloyd, the IVF machinery),
    * per-row residuals via the compiled [[VectorFunctions.vecSub]], PQ
    * codebooks trained on the residuals, corpus encoded. Deterministic.
    */
  def ivfPqBuild(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      nCentroids: Int = 16,
      refineIters: Int = 1,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 2
  ): IvfPqIndex = {
    val coarse = Similarity.kMeansRefine(
      df,
      vecCol,
      Similarity.ivfInitCentroids(df, vecCol, idCol, nCentroids),
      refineIters
    )
    val coarseLit = array(coarse.map(cv => array(cv.map(lit): _*)): _*)
    // materialize the assignment + residuals ONCE: pqTrain runs several
    // actions (dim probe, count, seed collect, one aggregation per Lloyd
    // round) and pqEncode scans again — without this every action would
    // re-run the nCentroids-way argmin and the subtraction over the whole
    // corpus. Build-time blocks only: released before returning; the
    // returned `encoded` is its own (small) checkpoint — free it with
    // [[graft.CacheUtil.release]] when the index is no longer needed.
    val withRes = Similarity
      .ivfAssign(df, vecCol, coarse)
      .withColumn(
        "_res",
        graft.functions.VectorFunctions
          .vecSub(col(vecCol), element_at(coarseLit, col("_centroid") + 1))
      )
      .select(col(idCol), col("_centroid"), col("_res"))
      .localCheckpoint(true)
    val cb = pqTrain(withRes, "_res", idCol, m, k, iters)
    val encoded = pqEncode(withRes, "_res", cb)
      .select(col(idCol), col("_centroid"), col("_pq"))
      .localCheckpoint(true)
    graft.CacheUtil.release(withRes)
    IvfPqIndex(encoded, coarse, cb, idCol)
  }

  /** Probe: pick the `nProbe` nearest coarse lists on the driver (tiny),
    * score only their rows with a PER-LIST ADC LUT (the query residual
    * differs per list), TakeOrdered the top-k. No vectors are read.
    */
  def ivfPqSearch(
      idx: IvfPqIndex,
      query: Array[Double],
      topK: Int,
      nProbe: Int = 4,
      excludeId: Option[Long] = None,
      emitScore: Boolean = false
  ): DataFrame = {
    val probes = idx.coarse.zipWithIndex
      .map { case (cv, ci) => (Similarity.sqDistLocal(query, cv), ci) }
      .sortBy(p => (p._1, p._2))
      .take(nProbe)
      .map(_._2)
    val luts = probes.map { ci =>
      val resid = query.zip(idx.coarse(ci)).map { case (q, c) => q - c }
      ci -> adcLut(resid, idx.cb)
    }
    val scoreCol = luts.foldLeft(lit(Double.MaxValue)) {
      case (acc, (ci, lut)) =>
        when(col("_centroid") === ci, adcScore(col("_pq"), lut)).otherwise(acc)
    }
    val base = excludeId match {
      case Some(id) => idx.encoded.filter(col(idx.idCol) =!= id)
      case None     => idx.encoded
    }
    Similarity.rankLimited(
      base
        .filter(col("_centroid").isin(probes.map(Integer.valueOf): _*))
        // see pqSearchEncoded: NULL codes must not rank NULLS-FIRST
        .filter(col("_pq").isNotNull)
        .withColumn("_adc", scoreCol)
        .orderBy(col("_adc").asc, col(idx.idCol).asc)
        .limit(topK),
      idx.idCol,
      keep = if (emitScore) Seq("_adc" -> "adc") else Nil
    )
  }

  /** The per-centroid residual-ADC score column [[ivfPqSearch]] ranks
    * by, built over an arbitrary centroid/codes column pair — exposed so
    * [[adcTopKAudit]] can recompute the emitted score through an
    * INDEPENDENT join (same compiled kernel, same LUTs, different data
    * path) and compare bit-for-bit.
    */
  def ivfPqScoreColumn(
      idx: IvfPqIndex,
      query: Array[Double],
      nProbe: Int,
      centroidCol: Column,
      codesCol: Column
  ): Column = {
    val probes = idx.coarse.zipWithIndex
      .map { case (cv, ci) => (Similarity.sqDistLocal(query, cv), ci) }
      .sortBy(p => (p._1, p._2))
      .take(nProbe)
      .map(_._2)
    probes.foldLeft(lit(Double.MaxValue)) { case (acc, ci) =>
      val resid = query.zip(idx.coarse(ci)).map { case (q, c) => q - c }
      when(centroidCol === ci, adcScore(codesCol, adcLut(resid, idx.cb)))
        .otherwise(acc)
    }
  }

  /** Structural audit of an ADC-ranked top-k result (the
    * [[pqSearchEncoded]] / [[ivfPqSearch]] `emitScore` shape,
    * `(neighbor_id, rank, adc)`) — the quantized twin of
    * [[Similarity.topKAudit]]. ADC emitters rank by APPROXIMATE distance
    * by design, so the exact-cosine `disorder` check does not apply;
    * what IS invariant, codebook seeds notwithstanding:
    *
    *  - `missing_rows`: `k` minus rows returned — 0 when the candidate
    *    pool covers k rows (true on the fixture);
    *  - `bad_ids`: neighbors absent from the corpus or equal to the
    *    query id — must be 0;
    *  - `bad_rank_set`: 1 unless ranks are exactly {1..returned};
    *  - `adc_mismatch`: emitted `adc` != the score recomputed from the
    *    neighbor's stored codes through an independent join (`recomputed`
    *    references the `enc` alias) — same kernel + LUT over the same
    *    codes must agree bit-for-bit; must be 0;
    *  - `adc_disorder`: adjacent ranks whose emitted ADC DECREASES with
    *    rank (ADC ranking is ascending) — must be 0;
    *  - `above_best`: neighbors whose EXACT cosine (recomputed from raw
    *    vectors) exceeds the corpus brute best — impossible, must be 0.
    *
    * Scale shape: one broadcast 1-row query, one broadcast scalar brute
    * best, a k-row window — nothing driver-side beyond the k rows.
    */
  def adcTopKAudit(
      res: DataFrame,
      encoded: DataFrame,
      recomputed: Column,
      raw: DataFrame,
      vecCol: String,
      idCol: String,
      queryId: Long,
      k: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vf = graft.functions.VectorFunctions
    val q = raw
      .filter(col(idCol) === queryId)
      .select(col(vecCol).as("_qv"), lit(1).as("_k1"))
    val bruteBest = raw
      .filter(col(idCol) =!= queryId)
      .withColumn("_k1", lit(1))
      .join(broadcast(q), "_k1")
      .agg(max(vf.cosine(col(vecCol), col("_qv"))).as("_best"))
      .select(col("_best"), lit(1).as("_k1"))
    val scored = res
      .withColumn("_k1", lit(1))
      .join(
        encoded.as("enc"),
        col("neighbor_id") === col(s"enc.$idCol"),
        "left")
      .join(
        raw.select(col(idCol).as("_rid"), col(vecCol).as("_rv")),
        col("neighbor_id") === col("_rid"),
        "left")
      .join(broadcast(q), "_k1")
      .join(broadcast(bruteBest), "_k1")
      .withColumn("_re", recomputed)
      .withColumn("_cos", vf.cosine(col("_rv"), col("_qv")))
      .withColumn("_prevadc", lag(col("adc"), 1).over(Window.orderBy(col("rank"))))
    scored.agg(
      (lit(k.toLong) - count(lit(1))).as("missing_rows"),
      coalesce(
        sum(when(col("_rid").isNull || col("neighbor_id") === queryId, 1L)),
        lit(0L)).as("bad_ids"),
      when(
        countDistinct(col("rank")) === count(lit(1)) &&
          min(col("rank")) === 1 && max(col("rank")) === count(lit(1)),
        0L).otherwise(1L).as("bad_rank_set"),
      coalesce(sum(when(col("adc") =!= col("_re"), 1L)), lit(0L))
        .as("adc_mismatch"),
      coalesce(sum(when(col("adc") < col("_prevadc"), 1L)), lit(0L))
        .as("adc_disorder"),
      coalesce(sum(when(col("_cos") > col("_best"), 1L)), lit(0L))
        .as("above_best")
    )
  }

  /** Persist the index in the production layout: codes partitioned by
    * coarse list (so [[ivfPqSearch]] over the read-back table is a
    * partition-pruned scan of nProbe directories — untouched lists never
    * leave disk), coarse centroids and residual codebooks as tiny
    * driver-readable parquet sidecars (the [[Similarity.ivfWrite]]
    * convention).
    */
  def ivfPqWrite(idx: IvfPqIndex, path: String): Unit = {
    idx.encoded.write
      .mode("overwrite")
      .partitionBy("_centroid")
      .parquet(s"$path/codes")
    Similarity.writeCentroids(idx.encoded.sparkSession, idx.coarse, s"$path/coarse")
    val spark = idx.encoded.sparkSession
    import spark.implicits._
    val flat = for {
      (codes, sub) <- idx.cb.centroids.zipWithIndex
      (cv, code) <- codes.zipWithIndex
    } yield (sub, code, cv)
    flat.toSeq
      .toDF("sub", "code", "cvec")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$path/codebooks")
  }

  /** Fold new vectors into a WRITTEN IVF-PQ index under the
    * FROZEN-QUANTIZER contract (coarse centroids AND residual codebooks
    * stay fixed — the production ingest shape; re-train via
    * [[ivfPqBuild]]/[[ivfPqWrite]] when drift accumulates): assign the
    * delta to its coarse lists, encode each residual with the stored
    * codebooks — per-row compiled expressions, no shuffle — and append
    * the codes to the partitioned layout. A search after the append
    * equals a search over the union encoded with the same quantizers
    * (gated).
    */
  def ivfPqAppend(
      spark: org.apache.spark.sql.SparkSession,
      delta: DataFrame,
      path: String,
      vecCol: String,
      idCol: String
  ): Unit = {
    // quantizers only — opening the codes table here would add a
    // per-append listing/footer pass over a directory that grows with
    // every prior append, for data the append never reads
    Similarity.failIfCompacting(spark, s"$path/codes")
    val (coarse, cb) = ivfPqReadQuantizers(spark, path)
    val coarseLit = array(coarse.map(cv => array(cv.map(lit): _*)): _*)
    val withRes = Similarity
      .ivfAssign(delta, vecCol, coarse)
      .withColumn(
        "_res",
        graft.functions.VectorFunctions
          .vecSub(col(vecCol), element_at(coarseLit, col("_centroid") + 1))
      )
      .select(col(idCol), col("_centroid"), col("_res"))
    pqEncode(withRes, "_res", cb)
      .select(col(idCol), col("_centroid"), col("_pq"))
      .write
      .mode("append")
      .partitionBy("_centroid")
      .parquet(s"$path/codes")
  }

  /** Compact the codes table of a written IVF-PQ index after many
    * [[ivfPqAppend]]s — same rename-aside swap and crash-recovery
    * contract as [[graft.operators.Similarity.ivfCompact]]; searches are
    * result-identical before and after (gated). Quantizers untouched.
    */
  def ivfPqCompact(spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    Similarity.compactPartitionedDir(spark, s"$path/codes", "_centroid")

  /** Driver-side quantizers of a written IVF-PQ index (coarse centroids
    * + PQ codebooks) WITHOUT opening the codes table.
    */
  def ivfPqReadQuantizers(
      spark: org.apache.spark.sql.SparkSession,
      path: String
  ): (Array[Array[Double]], PQCodebooks) = {
    val coarse = Similarity.readCentroids(spark, s"$path/coarse")
    val cbRows = spark.read
      .parquet(s"$path/codebooks")
      .collect()
      .map(r =>
        (r.getInt(r.fieldIndex("sub")),
         r.getInt(r.fieldIndex("code")),
         r.getSeq[Double](r.fieldIndex("cvec")).toArray))
    val m = cbRows.map(_._1).max + 1
    val k = cbRows.map(_._2).max + 1
    val cents = Array.ofDim[Array[Double]](m, k)
    cbRows.foreach { case (sub, code, cv) => cents(sub)(code) = cv }
    val subDim = cents(0)(0).length
    (coarse, PQCodebooks(m, k, m * subDim, cents))
  }

  /** Load a written IVF-PQ index; centroids/codebooks return to the
    * driver (tiny), codes stay on disk as a partitioned table.
    */
  def ivfPqRead(spark: org.apache.spark.sql.SparkSession, path: String, idCol: String): IvfPqIndex = {
    val (coarse, cb) = ivfPqReadQuantizers(spark, path)
    IvfPqIndex(spark.read.parquet(s"$path/codes"), coarse, cb, idCol)
  }

  /** Re-ranked IVF-PQ search (the IVFADC+R refinement, Jégou et al. §V):
    * over-fetch `k × refine` candidates by ADC — cheap, codes only — then
    * rescore just those few rows EXACTLY against the original vectors and
    * keep the true top-k. The exact pass touches `k × refine` vectors
    * regardless of corpus size (the candidate id list is broadcast into a
    * semi-join against the vector table), so the quantization error only
    * has to land true neighbors inside the over-fetched set, not rank
    * them perfectly.
    */
  def ivfPqSearchReranked(
      idx: IvfPqIndex,
      vectors: DataFrame,
      vecCol: String,
      query: Array[Double],
      topK: Int,
      nProbe: Int = 4,
      refine: Int = 4,
      excludeId: Option[Long] = None
  ): DataFrame = {
    require(refine >= 1, s"refine must be >= 1, got $refine")
    val cands = ivfPqSearch(idx, query, topK * refine, nProbe, excludeId)
      .select(col("neighbor_id"))
    val qLit = array(query.map(lit): _*)
    Similarity.rankLimited(
      vectors
        // see pqSearchEncoded: a null raw vector scores NULL distance
        // and would rank NULLS-FIRST under asc
        .filter(col(vecCol).isNotNull)
        .join(
          broadcast(cands),
          col(idx.idCol) === col("neighbor_id"),
          "left_semi"
        )
        .withColumn(
          "_d",
          graft.functions.VectorFunctions.sqDist(col(vecCol), qLit)
        )
        .orderBy(col("_d").asc, col(idx.idCol).asc)
        .limit(topK),
      idx.idCol
    )
  }

  /** End-to-end registry/gate form for one query id (build + probe under
    * one deterministic call; production amortizes the build).
    */
  def ivfPqTopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryId: Long,
      topK: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      m: Int = 8,
      k: Int = 16
  ): DataFrame = {
    val idx = ivfPqBuild(df, vecCol, idCol, nCentroids, refineIters = 1, m = m, k = k)
    val q = lookupQueryVec(df, vecCol, idCol, queryId)
    ivfPqSearch(idx, q, topK, nProbe, Some(queryId))
  }

  // ----------------------------------------------- scalar quantization

  /** Uniform (per-tensor) 8-bit scalar quantization parameters: one
    * [mn, mx] range shared by EVERY element of the corpus (the faiss
    * `ScalarQuantizer` QT_8bit_uniform layout — a published idea,
    * independent implementation). 4× smaller than float32.
    *
    * The per-tensor (not per-dimension) scale is a deliberate trade:
    * with one scale, the decoded L2 distance is `(span/255)² ×` the
    * INTEGER squared distance between code arrays, so symmetric distance
    * computation (SDC — Jégou et al., TPAMI 2011 §III.A) ranks in pure
    * int64 arithmetic: no float LUT, no summation-order sensitivity, and
    * the whole chain (min/max → codes → distances → ranks) is exactly
    * reproducible by any engine — s13's DuckDB oracle hash-matches the
    * scores themselves, which no per-dimension or PQ variant can offer
    * (their ADC sums are float-order-dependent). Per-dimension scaling's
    * accuracy niche is already covered by [[pqTrain]]/[[ivfPqBuild]].
    */
  final case class SQ8Params(mn: Double, mx: Double) {
    def span: Double = mx - mn
  }

  /** Train = ONE corpus scan for the element-wise min/max (`array_min`
    * per row, then a plain agg — partial-aggregated map-side, no
    * shuffle beyond the final 2-double reduce; at 100 TB this is the
    * cheapest possible pass over the vectors). Exact for float inputs:
    * min/max are comparisons, not accumulations, so the result is
    * bit-identical under any partitioning or row order.
    */
  def sq8Train(df: DataFrame, vecCol: String): SQ8Params = {
    val r = df
      .agg(
        min(array_min(col(vecCol))).cast("double").as("mn"),
        max(array_max(col(vecCol))).cast("double").as("mx")
      )
      .head()
    require(
      !r.isNullAt(0) && !r.isNullAt(1),
      s"sq8Train: column '$vecCol' has no non-null vectors"
    )
    SQ8Params(r.getDouble(0), r.getDouble(1))
  }

  /** Quantile-clipped SQ8 training: the range is the corpus elements at
    * ascending ranks `floor(lo·(n−1))` and `ceil(hi·(n−1))` instead of
    * min/max. Why: the per-tensor min/max hands ONE outlier element the
    * entire code range — every other code's resolution collapses (real
    * embedding corpora have hot dimensions; faiss's ScalarQuantizer
    * trains with the same quantile option, RangeStat_quantiles — a
    * published idea, independent implementation). Encode already
    * saturates at the range edges, so clipping trades the outliers'
    * accuracy for everyone else's (gated: planted-outlier recall).
    *
    * NEAREST-RANK, not interpolated, deliberately: an interpolated
    * percentile is `(1−g)·lower + g·higher` in one engine and
    * `lower + g·(higher−lower)` in another — ulp-divergent formulas, so
    * the clipped params (and with them every code) could flip a
    * downstream hash. A rank-SELECTED element is a corpus value:
    * bit-identical cross-engine exactly like min/max (the argument that
    * makes the whole SQ8 family oracle-able). The rank itself is one
    * double multiply + floor/ceil of identical inputs — also exact.
    * `lo = 0, hi = 1` degenerates to [[sq8Train]] precisely (ranks 0
    * and n−1 are the min and max).
    *
    * Scale note: rank selection runs as two TakeOrdered passes over the
    * exploded elements (ascending for the low rank, descending for the
    * high — each heap holds clip·n elements, NOT n). Train-time only;
    * at extreme scale train on a sample or swap approx_percentile in
    * (different codes, same contract — forfeits the exact oracle).
    */
  def sq8TrainClipped(
      df: DataFrame,
      vecCol: String,
      lo: Double = 0.001,
      hi: Double = 0.999
  ): SQ8Params = {
    require(0.0 <= lo && lo < hi && hi <= 1.0,
      s"sq8TrainClipped: need 0 <= lo < hi <= 1, got lo=$lo hi=$hi")
    val els = df
      .filter(col(vecCol).isNotNull)
      .select(explode(col(vecCol).cast("array<double>")).as("_x"))
    // element count AND null-element count in the same pass: element-level
    // NULLs sort NULLS-FIRST in Spark but NULLS-LAST in the DuckDB
    // oracle's row_number, so ANY null silently rank-shifts the selected
    // bounds — with fewer nulls than floor(lo·(n−1)) the old rank-landing
    // require never fired and the pipeline only failed later, at encode
    // time, with no hint the TRAIN was already wrong (r17 verdict,
    // "what's wrong" #3). Fail here, at the real cause.
    val cnt = els.agg(
      count(lit(1)).as("n"),
      count(col("_x")).as("nn")
    ).head()
    val n = cnt.getLong(0)
    val nullEls = n - cnt.getLong(1)
    require(n > 0, s"sq8TrainClipped: column '$vecCol' has no non-null vectors")
    require(nullEls == 0L,
      s"sq8TrainClipped: '$vecCol' has $nullEls NULL element(s) — null " +
        "elements carry no geometry, rank-shift the clip bounds, and are " +
        "out of the SQ8 contract (sq8_encode fails fast on them too)")
    val rLo = math.floor(lo * (n - 1)).toLong
    val rHi = math.ceil(hi * (n - 1)).toLong
    def at(sorted: DataFrame, offset: Long): Double = {
      require(offset <= Int.MaxValue,
        s"sq8TrainClipped: clip rank $offset exceeds the driver-side " +
          "offset limit — train on a sample at this scale")
      // each rank pass buffers `offset` elements in per-partition heaps
      // (orderBy + offset + limit plans as TakeOrdered): warn the caller
      // LOUDLY before the heaps quietly approach a full-sort cost — at
      // the default lo=0.001 this fires around a 100-billion-element
      // corpus, well before the hard Int.MaxValue stop above
      if (offset > 100000000L)
        System.err.println(
          s"[sq8TrainClipped] WARN clip rank $offset buffers that many " +
            "elements in per-partition heaps per pass — train on a " +
            "sample at this scale (same contract, bounded cost)")
      val row = sorted.offset(offset.toInt).limit(1).head
      // defense in depth: the agg above already rejected null elements,
      // but a selected-rank NULL would silently read 0.0 via getDouble
      require(!row.isNullAt(0),
        s"sq8TrainClipped: '$vecCol' has NULL elements — null elements " +
          "carry no geometry and are out of the SQ8 contract")
      row.getDouble(0)
    }
    val mn = at(els.orderBy(col("_x").asc), rLo)
    val mx = at(els.orderBy(col("_x").desc), (n - 1) - rHi)
    SQ8Params(mn, mx)
  }

  /** Per-element code: `floor((x - mn) / span * 255)` clamped to
    * [0, 255], computed in double ([[SQ8Kernels.codeOf]]). Compiled
    * kernel per row — no HOF lambda in the scan (the
    * [[graft.functions.VectorKernels]] CodegenFallback lesson). Vectors
    * outside the trained range (a delta encoded under frozen params —
    * the incremental-ingest shape) saturate at 0/255 rather than wrap.
    */
  def sq8Encode(
      df: DataFrame,
      vecCol: String,
      p: SQ8Params,
      codeCol: String = "_sq8"
  ): DataFrame =
    df.withColumn(codeCol, sq8EncodeExpr(col(vecCol), p))

  private def sq8EncodeExpr(vec: Column, p: SQ8Params): Column =
    Shim.toColumn(
      SQ8Encode(Shim.toExpression(vec.cast("array<double>")), p.mn, p.span)
    )

  /** Integer squared L2 distance between a code column and one query's
    * codes (SDC). Exact int64 — overflow-free up to 2^46 dimensions.
    */
  def sq8Sdc(codes: Column, qCodes: Array[Int]): Column =
    Shim.toColumn(SQ8Sdc(Shim.toExpression(codes), qCodes))

  /** Top-k nearest neighbors of one query id under SQ8 symmetric
    * distance, ties broken by id. Output: neighbor_id, rank, sdc_l2
    * (the integer score — hash-exact cross-engine, so unlike the
    * float-ranked s01/s02 this row's ORACLE verifies the scores too).
    *
    * Scale shape: train is one scan; search is one encode+score scan
    * into a TakeOrdered (per-partition heaps, driver merge of k) — no
    * shuffle, no join, same plan class as [[Similarity.knn]] but over
    * 4×-compressed codes. Production amortizes `sq8Train`/`sq8Encode`
    * across queries; this end-to-end form is the deterministic
    * registry/gate entry.
    */
  def sq8TopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryId: Long,
      k: Int
  ): DataFrame =
    sq8TopKWithParams(df, vecCol, idCol, sq8Train(df, vecCol), queryId, k)

  /** [[sq8TopK]] under caller-supplied params — the entry point for the
    * clipped quantizer ([[sq8TrainClipped]]) and for amortizing one
    * train across queries.
    */
  def sq8TopKWithParams(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      p: SQ8Params,
      queryId: Long,
      k: Int
  ): DataFrame = {
    val qCodes =
      SQ8Kernels.encodeLocal(lookupQueryVec(df, vecCol, idCol, queryId), p.mn, p.span)
    // NULL vectors are excluded, not ranked: a NULL SDC would sort
    // NULLS-FIRST into the top-k ahead of every real neighbor
    val scored = sq8Encode(
      df.filter(col(idCol) =!= queryId && col(vecCol).isNotNull), vecCol, p)
      .withColumn("_sdc", sq8Sdc(col("_sq8"), qCodes))
      .orderBy(col("_sdc").asc, col(idCol).asc)
      .limit(k)
    Similarity.rankLimited(scored, idCol, keep = Seq("_sdc" -> "sdc_l2"))
  }

  /** A persisted SQ8 index: one bucketed code table (`_vid`, `_code`)
    * plus the FROZEN training params riding in the handle (the
    * [[Similarity.LshIndex]] convention — params are deterministic
    * corpus statistics, so rebuilding a handle is one [[sq8Train]]
    * scan, never a retrain). Codes are 0..255 ints; parquet dictionary/
    * bit-pack encoding stores them at ~1 byte each, the 4×-compressed
    * layout that makes a 100 TB float corpus a 25 TB scan.
    */
  final case class Sq8Index(
      codeTable: String,
      params: SQ8Params,
      dim: Int,
      buckets: Int
  )

  /** Build and persist an SQ8 index under catalog table
    * `<name>_codes`, bucketed by id (so later id-joins — e.g. an
    * exact-refine against the raw vectors — co-locate without a
    * shuffle). Params come from THIS corpus; deltas appended later are
    * encoded under them unchanged (saturating at the range edges), so
    * the index never needs retraining — the unbounded-corpus ANN
    * ingest shape, same contract as [[Similarity.ivfAppend]] but with
    * a closed-form quantizer: unlike IVF/PQ, an SQ8 probe over
    * build+append is exactly reproducible by any engine (s14's FULL
    * oracle).
    */
  def writeSq8Index(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      name: String,
      buckets: Int = 32
  ): Sq8Index = {
    val (params, dim) = sq8TrainWithDim(df, vecCol, "writeSq8Index")
    val idx = Sq8Index(s"${name}_codes", params, dim, buckets)
    writeSq8Table(df, vecCol, idCol, idx, org.apache.spark.sql.SaveMode.Overwrite)
    idx
  }

  /** Params + dim in ONE corpus scan (the same pass [[sq8Train]] makes);
    * min(size) == max(size) proves EVERY row's dim, not just a sampled
    * one — a mixed-dim corpus fails here, before anything is written.
    * Shared by the flat ([[writeSq8Index]]) and partitioned
    * ([[ivfSq8Build]]) index builders so the train/guard semantics can
    * never diverge between the families.
    */
  private def sq8TrainWithDim(
      df: DataFrame,
      vecCol: String,
      caller: String
  ): (SQ8Params, Int) = {
    val r = df
      .filter(col(vecCol).isNotNull)
      .agg(
        min(array_min(col(vecCol))).cast("double").as("mn"),
        max(array_max(col(vecCol))).cast("double").as("mx"),
        min(size(col(vecCol))).as("dmin"),
        max(size(col(vecCol))).as("dmax")
      )
      .head()
    require(
      !r.isNullAt(0) && !r.isNullAt(1),
      s"$caller: column '$vecCol' has no non-null vectors"
    )
    require(
      r.getInt(2) == r.getInt(3),
      s"$caller: mixed vector dims in '$vecCol' " +
        s"(${r.getInt(2)} .. ${r.getInt(3)})"
    )
    (SQ8Params(r.getDouble(0), r.getDouble(1)), r.getInt(2))
  }

  /** Fold a delta into the index under the handle's frozen params.
    * The dim guard checks EVERY row of the batch (a short-circuiting
    * take(1) over the mismatches — per-BATCH cost, bounded by the
    * micro-batch) and fails a wrong-corpus append before any row
    * lands: the SDC kernel would only catch the poison at probe time.
    *
    * Replay-idempotent under the at-least-once foreachBatch contract
    * ([[ReplaySafe]]: the index is the ledger): ids the table already
    * holds are dropped before the write, so a replayed batch appends
    * nothing — duplicate `_vid` rows would otherwise eat top-k slots.
    * One row per id, so id-level healing suffices (no within-id torn
    * commits to complete); first attempts skip the filter entirely.
    */
  def appendToSq8Index(
      delta: DataFrame,
      vecCol: String,
      idCol: String,
      idx: Sq8Index
  ): Unit = {
    failOnWrongDim(delta, vecCol, idx.dim, "appendToSq8Index")
    val spark = delta.sparkSession
    // same finally discipline as [[ivfSq8AppendReplaySafe]]: a failed
    // ledger read or append must not leak the checkpointed id frames
    val rids = ReplaySafe.ids(delta, idCol)
    var seen: DataFrame = null
    try {
      seen = ReplaySafe.seenIds(spark.table(idx.codeTable), "_vid", rids)
      val fresh =
        if (ReplaySafe.noneSeen(seen)) delta
        else ReplaySafe.dropSeen(delta, idCol, seen)
      writeSq8Table(fresh, vecCol, idCol, idx, org.apache.spark.sql.SaveMode.Append)
    } finally {
      graft.CacheUtil.release(rids)
      if (seen != null) graft.CacheUtil.release(seen)
    }
  }

  /** Two-stage SQ8 search (the IVFADC+R refinement idea, Jégou et al.
    * TPAMI 2011 §V, applied to the scalar quantizer): over-fetch
    * `k × refine` candidates by integer SDC — cheap, codes only — then
    * re-rank exactly those rows by EXACT squared L2 against the raw
    * vectors and keep the true top-k. The exact pass touches only
    * `k × refine` vectors, fetched through a broadcast semi-join
    * against the raw scan (no shuffle), so recall approaches brute
    * while the shortlist scan stays 4×-compressed.
    *
    * Oracle shape (s15): the candidate SET is integer-exact
    * cross-engine (the SQ8 property), so the oracle replays it in
    * closed form and re-ranks with its own exact distance; the final
    * ranks are stable because exact-distance gaps dwarf engine float
    * noise (the s01 argument) — output is ids + rank.
    *
    * CONTRACT: `vectors` must cover every id in the index's code table
    * (it is the raw corpus the index was built+appended from). The
    * re-rank is a semi-join, so a shortlist id missing from `vectors`
    * — e.g. a stale frame probed after appends — silently drops and
    * fewer than k rows return; pass the current corpus, not a snapshot.
    */
  def sq8TopKRefined(
      vectors: DataFrame,
      vecCol: String,
      idCol: String,
      idx: Sq8Index,
      query: Array[Double],
      k: Int,
      refine: Int = 4,
      excludeId: Option[Long] = None
  ): DataFrame = {
    require(refine >= 1, s"refine must be >= 1, got $refine")
    val cands =
      sq8TopKIndexed(vectors.sparkSession, idx, query, k * refine, excludeId)
        .select(col("neighbor_id"))
    exactRerank(vectors, vecCol, idCol, cands, query, k)
  }

  /** Shared exact re-rank stage (the "+R" of IVFADC+R over any
    * shortlist emitter): rescore only the candidate ids by exact
    * squared L2 against the raw vectors — a broadcast semi-join, so
    * the exact pass touches `|cands|` rows regardless of corpus size —
    * and keep the true top-k. `vectors` must cover every candidate id
    * (see the [[sq8TopKRefined]] contract).
    */
  private def exactRerank(
      vectors: DataFrame,
      vecCol: String,
      idCol: String,
      cands: DataFrame,
      query: Array[Double],
      k: Int
  ): DataFrame = {
    val qLit = array(query.map(lit): _*)
    Similarity.rankLimited(
      vectors
        // a null raw vector scores NULL distance and would rank
        // NULLS-FIRST under asc
        .filter(col(vecCol).isNotNull)
        .join(broadcast(cands), col(idCol) === col("neighbor_id"), "left_semi")
        .withColumn(
          "_d",
          graft.functions.VectorFunctions.sqDist(col(vecCol), qLit)
        )
        .orderBy(col("_d").asc, col(idCol).asc)
        .limit(k),
      idCol
    )
  }

  /** Compact an append-fragmented SQ8 code table: one row per id under
    * the replay-safe append contract, so this is a pure small-file
    * merge through [[Dedup.compactBucketedIndexTable]]'s crash-safe
    * rename-aside swap (same wrapper shape as every other index
    * family).
    */
  def compactSq8Index(
      spark: org.apache.spark.sql.SparkSession,
      idx: Sq8Index
  ): Unit =
    Dedup.compactBucketedIndexTable(spark, idx.codeTable, idx.buckets, Seq("_vid"))

  /** NULL vectors never enter the table: they carry no geometry, and a
    * NULL `_code` row would score NULL SDC and — under Spark's
    * NULLS-FIRST ascending sort — eat top-k slots ahead of every real
    * neighbor.
    */
  private def writeSq8Table(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      idx: Sq8Index,
      mode: org.apache.spark.sql.SaveMode
  ): Unit =
    Dedup.writeBucketedTable(
      sq8Encode(df.filter(col(vecCol).isNotNull), vecCol, idx.params, "_code")
        .select(col(idCol).as("_vid"), col("_code")),
      idx.codeTable,
      idx.buckets,
      Seq("_vid"),
      mode
    )

  /** Top-k over a WRITTEN SQ8 index: one code-table scan (4× smaller
    * than the floats) + compiled integer SDC + TakeOrdered — no
    * shuffle, no join. Output: neighbor_id, rank, sdc_l2, with the
    * integer scores hash-exact cross-engine like [[sq8TopK]].
    */
  def sq8TopKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      idx: Sq8Index,
      query: Array[Double],
      k: Int,
      excludeId: Option[Long] = None
  ): DataFrame = {
    require(
      query.length == idx.dim,
      s"sq8TopKIndexed: query dim ${query.length} != index dim ${idx.dim}"
    )
    val qCodes = SQ8Kernels.encodeLocal(query, idx.params.mn, idx.params.span)
    val base = spark.table(idx.codeTable)
    val candidates =
      excludeId.map(id => base.filter(col("_vid") =!= id)).getOrElse(base)
    val scored = candidates
      .withColumn("_sdc", sq8Sdc(col("_code"), qCodes))
      .orderBy(col("_sdc").asc, col("_vid").asc)
      .limit(k)
    Similarity.rankLimited(scored, "_vid", keep = Seq("_sdc" -> "sdc_l2"))
  }

  // ------------------------------------------------------------ IVF-SQ8

  /** A written IVF-SQ8 index: the partition-pruned probe for the
    * scalar-quantized family. Every plain SQ8 probe ([[sq8TopKIndexed]],
    * [[sq8TopK]]) scans the WHOLE code table — right for batch analytics
    * over the 4×-compressed layout, but at the 100 TB north star that is
    * a 25 TB scan per query. This member combines the two halves the
    * repo already owns: the IVF inverted-list layout ([[Similarity
    * .ivfWrite]] — codes partitioned by coarse list, so a probe's
    * `_centroid IN (...)` filter prunes partition DIRECTORIES before any
    * IO) with the SQ8 code table, so a probe reads `nProbe/nCentroids`
    * of the compressed bytes and still ranks in pure int64 SDC.
    *
    * Codes quantize the RAW vectors (not residuals) under ONE per-tensor
    * [[SQ8Params]] range: the query is encoded once and a single
    * [[sq8Sdc]] column scores every probed list — no per-list LUT
    * dispatch — and the SDC stays bit-exact cross-engine (the audit twin
    * recomputes it through an independent join). Residual quantization's
    * accuracy niche is already covered by [[ivfPqBuild]]; the coarse
    * centroids here are float-sum k-means means, so the probed SET is
    * seed-dependent (rows-only registry row, like s03/s05) while every
    * emitted SCORE is integer-exact.
    *
    * Layout under `path`: `codes/` — `( _vid, _code )` parquet
    * partitioned by `_centroid`; `coarse/` — the centroid vectors
    * (driver-readable sidecar, [[Similarity.ivfWrite]] convention);
    * `params/` — one row `(mn, mx, dim)`, the frozen quantizer.
    */
  final case class IvfSq8Index(
      path: String,
      coarse: Array[Array[Double]],
      params: SQ8Params,
      dim: Int,
      idCol: String
  )

  /** Build and persist: coarse quantizer (stride-seeded + Lloyd — the
    * IVF machinery), per-tensor SQ8 params + an exact every-row dim
    * guard in ONE corpus scan (the [[writeSq8Index]] shape), then one
    * assign+encode pass written partitioned by list. NULL vectors never
    * enter the table ([[writeSq8Table]]'s contract). Deterministic for
    * a given corpus. Build-time cost: the Lloyd iterations dominate,
    * same as [[Similarity.ivfBuild]].
    */
  def ivfSq8Build(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      path: String,
      nCentroids: Int = 16,
      refineIters: Int = 1
  ): IvfSq8Index = {
    val nn = df.filter(col(vecCol).isNotNull)
    val (params, dim) = sq8TrainWithDim(df, vecCol, "ivfSq8Build")
    val coarse = Similarity.kMeansRefine(
      nn,
      vecCol,
      Similarity.ivfInitCentroids(nn, vecCol, idCol, nCentroids),
      refineIters
    )
    writeIvfSq8Codes(nn, vecCol, idCol, coarse, params,
      path, org.apache.spark.sql.SaveMode.Overwrite)
    Similarity.writeCentroids(df.sparkSession, coarse, s"$path/coarse")
    val spark = df.sparkSession
    import spark.implicits._
    Seq((params.mn, params.mx, dim))
      .toDF("mn", "mx", "dim")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$path/params")
    IvfSq8Index(path, coarse, params, dim, idCol)
  }

  /** One assign+encode pass into the partitioned layout — shared by
    * build (overwrite) and append (append). No shuffle: the centroid
    * argmin and the encode are per-row compiled expressions; the write
    * splits rows into partition directories without exchanging them.
    */
  private def writeIvfSq8Codes(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      coarse: Array[Array[Double]],
      params: SQ8Params,
      path: String,
      mode: org.apache.spark.sql.SaveMode
  ): Unit =
    Similarity
      .ivfAssign(df.filter(col(vecCol).isNotNull), vecCol, coarse)
      .withColumn("_code", sq8EncodeExpr(col(vecCol), params))
      .select(col(idCol).as("_vid"), col("_centroid"), col("_code"))
      .write
      .mode(mode)
      .partitionBy("_centroid")
      .parquet(s"$path/codes")

  /** Load a written index's driver-side state (coarse centroids +
    * frozen params) WITHOUT opening the codes table.
    */
  def ivfSq8Read(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      idCol: String
  ): IvfSq8Index = {
    val coarse = Similarity.readCentroids(spark, s"$path/coarse")
    val p = spark.read.parquet(s"$path/params").head()
    IvfSq8Index(
      path,
      coarse,
      SQ8Params(
        p.getDouble(p.fieldIndex("mn")), p.getDouble(p.fieldIndex("mx"))),
      p.getInt(p.fieldIndex("dim")),
      idCol
    )
  }

  /** Fold a delta in under the FROZEN quantizers (coarse centroids AND
    * SQ8 params — the never-retrain ingest contract of
    * [[Similarity.ivfAppend]] / [[appendToSq8Index]]): assign + encode
    * per-row (out-of-range elements saturate at the trained edges),
    * append to the partitioned layout; untouched lists gain no files.
    * The dim guard checks EVERY row of the delta before anything lands
    * (the [[appendToSq8Index]] policy — the SDC kernel would only catch
    * a wrong-corpus append at probe time).
    *
    * NOT replay-gated, matching [[Similarity.ivfAppend]] /
    * [[ivfPqAppend]] (the partitioned-layout family): a caller driving
    * this from an at-least-once source must dedupe batches itself —
    * the replay-idempotent streaming-ANN ingest shape is
    * [[appendToSq8Index]] over the bucketed catalog table (st13).
    */
  def ivfSq8Append(
      spark: org.apache.spark.sql.SparkSession,
      delta: DataFrame,
      path: String,
      vecCol: String,
      idCol: String
  ): Unit = {
    Similarity.failIfCompacting(spark, s"$path/codes")
    val idx = ivfSq8Read(spark, path, idCol)
    failOnWrongDim(delta, vecCol, idx.dim, "ivfSq8Append")
    writeIvfSq8Codes(delta, vecCol, idCol, idx.coarse, idx.params,
      path, org.apache.spark.sql.SaveMode.Append)
  }

  /** [[ivfSq8Append]]'s replay-idempotent twin — the streaming-ingest
    * form ([[ReplaySafe]]: the index is the ledger, st15). The ledger
    * check is PARTITION-PRUNED, which the flat [[appendToSq8Index]]
    * cannot offer: under the frozen coarse quantizer a replayed delta
    * re-assigns to exactly the lists its first attempt wrote, so the
    * seen-id scan reads ONLY the `_centroid` partitions the delta
    * touches — at 100 TB a replay probe over a daily delta reads a few
    * lists, never the corpus. (Sound because ids are unique across
    * batches — the [[ReplaySafe]] contract — so a delta id can only
    * pre-exist in a list the SAME delta maps to.) One row per id, so
    * id-level healing suffices; first attempts skip nothing but the
    * pruned scan.
    */
  def ivfSq8AppendReplaySafe(
      spark: org.apache.spark.sql.SparkSession,
      delta: DataFrame,
      path: String,
      vecCol: String,
      idCol: String
  ): Unit = {
    Similarity.failIfCompacting(spark, s"$path/codes")
    val idx = ivfSq8Read(spark, path, idCol)
    failOnWrongDim(delta, vecCol, idx.dim, "ivfSq8AppendReplaySafe")
    // materialize the assignment ONCE: the touched-list collect, the
    // ledger ids, and the final write all derive from it — without this
    // each would re-run the nCentroids-way argmin and re-read the
    // micro-batch source (the dim guard above stays a separate
    // short-circuit pass by design: it must fail before any work)
    val assigned = Similarity
      .ivfAssign(delta.filter(col(vecCol).isNotNull), vecCol, idx.coarse)
      .localCheckpoint(true)
    // release in a finally: an exception in the ledger read or the append
    // write must not leak the checkpointed blocks for the life of the JVM
    // (this runs once per micro-batch in long-lived stream/bench JVMs)
    var rids: DataFrame = null
    var seen: DataFrame = null
    try {
      val touched = assigned
        .select(col("_centroid")).distinct().collect().map(_.getInt(0))
      val existing = spark.read
        .parquet(s"$path/codes")
        .filter(col("_centroid").isin(touched.map(Integer.valueOf): _*))
      rids = ReplaySafe.ids(assigned, idCol)
      seen = ReplaySafe.seenIds(existing, "_vid", rids)
      val fresh =
        if (ReplaySafe.noneSeen(seen)) assigned
        else ReplaySafe.dropSeen(assigned, idCol, seen)
      fresh
        .withColumn("_code", sq8EncodeExpr(col(vecCol), idx.params))
        .select(col(idCol).as("_vid"), col("_centroid"), col("_code"))
        .write
        .mode(org.apache.spark.sql.SaveMode.Append)
        .partitionBy("_centroid")
        .parquet(s"$path/codes")
    } finally {
      if (rids != null) graft.CacheUtil.release(rids)
      if (seen != null) graft.CacheUtil.release(seen)
      graft.CacheUtil.release(assigned)
    }
  }

  /** The [[appendToSq8Index]] every-row dim guard, shared by both
    * append forms: fail a wrong-corpus delta before anything lands.
    */
  private def failOnWrongDim(
      delta: DataFrame,
      vecCol: String,
      dim: Int,
      caller: String
  ): Unit =
    delta
      .filter(col(vecCol).isNotNull && size(col(vecCol)) =!= dim)
      .select(size(col(vecCol)))
      .head(1)
      .headOption
      .foreach { r =>
        throw new IllegalArgumentException(
          s"$caller: delta has a dim-${r.getInt(0)} vector but " +
            s"the index dim is $dim"
        )
      }

  /** Compact the codes table after many [[ivfSq8Append]]s — same
    * rename-aside swap and crash-recovery contract as
    * [[Similarity.ivfCompact]]; probes are result-identical before and
    * after (gated). Quantizers untouched.
    */
  def ivfSq8Compact(
      spark: org.apache.spark.sql.SparkSession,
      path: String
  ): Unit =
    Similarity.compactPartitionedDir(spark, s"$path/codes", "_centroid")

  /** The pruned probe: rank centroids against the query ON THE DRIVER
    * (tiny, zero jobs), encode the query once, then integer SDC +
    * TakeOrdered over ONLY the probed lists — the `_centroid IN (...)`
    * filter is a partition-pruning predicate on the written layout, so
    * untouched lists never leave disk (plan-gated). Output:
    * (neighbor_id, rank, sdc_l2), scores integer-exact like every SQ8
    * emitter.
    */
  def ivfSq8Search(
      spark: org.apache.spark.sql.SparkSession,
      idx: IvfSq8Index,
      query: Array[Double],
      k: Int,
      nProbe: Int = 4,
      excludeId: Option[Long] = None
  ): DataFrame = {
    require(
      query.length == idx.dim,
      s"ivfSq8Search: query dim ${query.length} != index dim ${idx.dim}"
    )
    // nProbe = 0 would make the isin() filter vacuously false and
    // return an empty result that looks like "no matches" — fail the
    // misuse instead (the ivfSq8SearchRefined refine >= 1 convention)
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val qCodes = SQ8Kernels.encodeLocal(query, idx.params.mn, idx.params.span)
    val probes = idx.coarse.zipWithIndex
      .map { case (cv, ci) => (Similarity.sqDistLocal(query, cv), ci) }
      .sortBy(p => (p._1, p._2))
      .take(nProbe)
      .map(_._2)
    val base = spark.read
      .parquet(s"${idx.path}/codes")
      .filter(col("_centroid").isin(probes.map(Integer.valueOf): _*))
    val candidates =
      excludeId.map(id => base.filter(col("_vid") =!= id)).getOrElse(base)
    val scored = candidates
      // the write path excludes NULL vectors, but defend the rank chain
      // anyway: a NULL code row would sort NULLS-FIRST under asc
      .filter(col("_code").isNotNull)
      .withColumn("_sdc", sq8Sdc(col("_code"), qCodes))
      .orderBy(col("_sdc").asc, col("_vid").asc)
      .limit(k)
    Similarity.rankLimited(scored, "_vid", keep = Seq("_sdc" -> "sdc_l2"))
  }

  /** Two-stage pruned retrieval: [[ivfSq8Search]] over-fetches
    * `k × refine` candidates from the probed lists, then the shared
    * exact re-rank touches only those rows (broadcast semi-join against
    * the raw vectors — see [[sq8TopKRefined]]'s coverage contract).
    */
  def ivfSq8SearchRefined(
      vectors: DataFrame,
      vecCol: String,
      idCol: String,
      idx: IvfSq8Index,
      query: Array[Double],
      k: Int,
      nProbe: Int = 4,
      refine: Int = 4,
      excludeId: Option[Long] = None
  ): DataFrame = {
    require(refine >= 1, s"refine must be >= 1, got $refine")
    val cands =
      ivfSq8Search(vectors.sparkSession, idx, query, k * refine, nProbe, excludeId)
        .select(col("neighbor_id"))
    exactRerank(vectors, vecCol, idCol, cands, query, k)
  }

  /** BATCHED pruned retrieval — top-k for EVERY row of a query DataFrame
    * in ONE plan (the dominant production shape: dedup a daily delta
    * against the corpus index, hard-negative mining, semantic lookup for
    * N documents at once). Every other searcher in the stack takes one
    * driver-side query; a driver loop over millions of query rows is the
    * per-query-job bottleneck SURVEY §7.4.8 forbids. This is the
    * join-shaped composition instead:
    *
    *  1. each query row gets its `nProbe` nearest list ids via
    *     [[Similarity.ivfProbes]] and its own SQ8 codes via the encode
    *     EXPRESSION — both pure per-row columns, no driver work;
    *  2. the exploded `(query_id, _centroid, _qcode)` probe table —
    *     nProbe rows per query, codes not vectors — is BROADCAST and
    *     equi-joined to the partitioned code table on `_centroid`: the
    *     corpus side never shuffles, and Catalyst's dynamic partition
    *     pruning turns the broadcast into a `_centroid IN (...)`
    *     partition filter on the scan (plan-gated), so lists no query
    *     probes never leave disk — the same pruning [[ivfSq8Search]]
    *     gets from its driver-side isin, derived at runtime instead;
    *  3. scoring is the two-column integer SDC kernel ([[SQ8SdcCols]] —
    *     the corpus code against THAT ROW's joined query code; emitted
    *     scores stay integer-exact like every SQ8 emitter);
    *  4. per-query top-k is a rank-limited window on `(query_id)` — the
    *     d-family cap shape Spark plans as WindowGroupLimit, so each map
    *     task keeps only k rows per query before the single exchange.
    *
    * At nProbe = nCentroids the candidate pool is the whole corpus and
    * each query's ranking equals the flat full scan — closed-form
    * cross-engine (the s19 FULL oracle); pruned probes are
    * seed-dependent in SET but each emitted score stays exact, and the
    * s20 audit twin checks per-query parity against N single-query
    * [[ivfSq8Search]] calls.
    *
    * `excludeSelf` drops `neighbor_id == query_id` matches — the
    * queries-drawn-from-the-corpus shape; external query ids never
    * collide and the filter is free. Broadcast contract: the probe side
    * is `|queries| × nProbe` rows of codes (bytes per row, not floats) —
    * at a million-query delta, chunk the query frame or lift the
    * broadcast hint; the plan shape survives either way.
    *
    * ID CONTRACT: query ids must be UNIQUE within `queries` (the
    * [[ReplaySafe]] convention) — a duplicated id would double its
    * candidate rows through the join and interleave duplicate neighbors
    * into that query's rank sequence. `dropDuplicates(qIdCol)` first if
    * the source can repeat. Applies to [[ivfSq8SearchManyRefined]] and
    * [[Similarity.knnMany]] identically.
    */
  def ivfSq8SearchMany(
      spark: org.apache.spark.sql.SparkSession,
      idx: IvfSq8Index,
      queries: DataFrame,
      qVecCol: String,
      qIdCol: String,
      k: Int,
      nProbe: Int = 4,
      excludeSelf: Boolean = true
  ): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    require(k >= 1, s"k must be >= 1, got $k")
    failOnWrongDim(queries, qVecCol, idx.dim, "ivfSq8SearchMany")
    val probes = Similarity
      .ivfProbes(queries.filter(col(qVecCol).isNotNull), qVecCol, idx.coarse, nProbe)
      .withColumn("_qcode", sq8EncodeExpr(col(qVecCol), idx.params))
      .select(
        col(qIdCol).as("query_id"),
        explode(col("_probes")).as("_centroid"),
        col("_qcode"))
    val codes = spark.read.parquet(s"${idx.path}/codes")
    val scored = codes
      // the write path excludes NULL vectors; defend the rank chain anyway
      .filter(col("_code").isNotNull)
      .join(broadcast(probes), Seq("_centroid"))
      .filter(if (excludeSelf) col("_vid") =!= col("query_id") else lit(true))
      .withColumn(
        "_sdc",
        Shim.toColumn(SQ8SdcCols(
          Shim.toExpression(col("_code")), Shim.toExpression(col("_qcode")))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("_sdc").asc, col("_vid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col("_vid").as("neighbor_id"),
        col("rank"),
        col("_sdc").as("sdc_l2"))
  }

  /** Two-stage BATCHED retrieval — [[ivfSq8SearchMany]]'s shortlist plus
    * the exact re-rank, still join-shaped end to end (the batched twin of
    * [[ivfSq8SearchRefined]]): the candidate table (`|queries| × k×refine`
    * rows of ids — tiny) is broadcast against the raw vectors, each
    * surviving (neighbor, query) pair joins its query VECTOR (a second
    * broadcast) and is rescored by the exact two-column squared L2, and
    * the true per-query top-k is one more WindowGroupLimit. The corpus
    * never shuffles; the exact pass touches `k × refine` rows per query
    * regardless of corpus size. Output: (query_id, neighbor_id, rank) —
    * ranks ride exact-distance gaps (the s01/s15 argument), so at
    * nProbe = nCentroids the whole chain is oracle-replayable (s21).
    * `vectors` must cover every candidate id (the [[sq8TopKRefined]]
    * coverage contract).
    */
  def ivfSq8SearchManyRefined(
      spark: org.apache.spark.sql.SparkSession,
      idx: IvfSq8Index,
      vectors: DataFrame,
      vecCol: String,
      idCol: String,
      queries: DataFrame,
      qVecCol: String,
      qIdCol: String,
      k: Int,
      nProbe: Int = 4,
      refine: Int = 4,
      excludeSelf: Boolean = true
  ): DataFrame = {
    require(refine >= 1, s"refine must be >= 1, got $refine")
    val cands = ivfSq8SearchMany(
      spark, idx, queries, qVecCol, qIdCol, k * refine, nProbe, excludeSelf)
      .select(col("query_id"), col("neighbor_id"))
    val qVecs = queries
      .filter(col(qVecCol).isNotNull)
      .select(
        col(qIdCol).as("query_id"),
        col(qVecCol).cast("array<double>").as("_qv"))
    val scored = vectors
      // a null raw vector scores NULL distance and would rank NULLS-FIRST
      .filter(col(vecCol).isNotNull)
      .select(
        col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("_nv"))
      .join(broadcast(cands), Seq("neighbor_id"))
      .join(broadcast(qVecs), Seq("query_id"))
      .withColumn(
        "_d", graft.functions.VectorFunctions.sqDist(col("_nv"), col("_qv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("_d").asc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Fetch the query vector by id, naming the id/column in the error when
    * absent (a bare `.head()` surfaces a missing id as "next on empty
    * iterator" with no hint the query id was wrong).
    */
  private def lookupQueryVec(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryId: Long
  ): Array[Double] =
    df.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>"))
      .head(1)
      .headOption
      .getOrElse(
        throw new IllegalArgumentException(
          s"query id $queryId not found in column '$idCol'"
        )
      )
      .getSeq[Double](0)
      .toArray

}

// --------------------------------------------------- compiled kernels

/** Row-level PQ kernels, shared by interpreted eval and generated Java
  * (the [[graft.functions.VectorKernels]] pattern). TOP-LEVEL object on
  * purpose: Scala only emits Java-visible static forwarders for top-level
  * objects — nested inside [[Quantization]], the generated Java could not
  * resolve the call and every row silently fell back to interpreted eval
  * (caught via the UnsafeProjection codegen-error WARN). Codebooks/LUTs
  * ride along as codegen reference objects — the generated source stays
  * constant-size in m and k, so the code cache hits across training
  * iterations (inlining them as literal structs made janino compilation
  * dominate the runtime 6:1).
  */
object PQKernels {

  /** argmin code per subspace; ties to the lowest code (strict <).
    *
    * Fails fast on a vector/codebook dim mismatch (the
    * [[graft.functions.VectorKernels]] checkSameLength policy):
    * pqEncode/pqSearchEncoded accept user-supplied codebooks (e.g. from
    * ivfPqRead), and reading past the input array would return garbage
    * codes on UnsafeArrayData or AIOOBE on GenericArrayData.
    */
  def encode(vec: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData = {
      val m = cb.length
      var expected = 0
      var s = 0
      while (s < m) { expected += cb(s)(0).length; s += 1 }
      if (vec.numElements() != expected)
        throw new IllegalArgumentException(
          s"pq_encode requires vector length == codebook dim, got vector " +
            s"length ${vec.numElements()} and codebook dim $expected " +
            s"($m subspaces)"
        )
      val out = new Array[Int](m)
      var sub = 0
      var off = 0
      while (sub < m) {
        val cents = cb(sub)
        val subDim = cents(0).length
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cents.length) {
          val cv = cents(c)
          var d = 0.0
          var i = 0
          while (i < subDim) {
            val x = vec.getDouble(off + i) - cv(i)
            d += x * x
            i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        out(sub) = best
        off += subDim
        sub += 1
      }
      new GenericArrayData(out)
    }

  def adc(codes: ArrayData, lut: Array[Array[Double]]): Double = {
      var s = 0.0
      var sub = 0
      while (sub < lut.length) {
        s += lut(sub)(codes.getInt(sub))
        sub += 1
      }
      s
    }
  }

  case class PQEncode(child: Expression, cb: Array[Array[Array[Double]]])
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "pq_encode"

    override protected def nullSafeEval(input: Any): Any =
      PQKernels.encode(input.asInstanceOf[ArrayData], cb)

    override protected def doGenCode(
        ctx: CodegenContext,
        ev: ExprCode
    ): ExprCode = {
      val cbRef = ctx.addReferenceObj("pqCodebooks", cb, "double[][][]")
      defineCodeGen(
        ctx,
        ev,
        c => s"graft.operators.PQKernels.encode($c, $cbRef)"
      )
    }

    override protected def withNewChildInternal(newChild: Expression): PQEncode =
      copy(child = newChild)
  }

  case class PQAdc(child: Expression, lut: Array[Array[Double]])
      extends UnaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "pq_adc"

    override protected def nullSafeEval(input: Any): Any =
      PQKernels.adc(input.asInstanceOf[ArrayData], lut)

    override protected def doGenCode(
        ctx: CodegenContext,
        ev: ExprCode
    ): ExprCode = {
      val lutRef = ctx.addReferenceObj("pqLut", lut, "double[][]")
      defineCodeGen(
        ctx,
        ev,
        c => s"graft.operators.PQKernels.adc($c, $lutRef)"
      )
    }

    override protected def withNewChildInternal(newChild: Expression): PQAdc =
      copy(child = newChild)
  }

/** Row-level SQ8 kernels — top-level for the same static-forwarder
  * reason as [[PQKernels]]. Shared by interpreted eval, generated Java,
  * and the driver-side query-vector encode, so all three paths run the
  * identical IEEE sequence.
  */
object SQ8Kernels {

  /** `floor((x - mn) / span * 255)` clamped to [0, 255]. The chain stays
    * in double until the final cast — the exact expression the DuckDB
    * oracle replays (`least(255.0, greatest(0.0, floor(...)))`), so for
    * FINITE inputs with `span > 0` (every real corpus) codes are
    * bit-identical cross-engine: subtraction, division, and
    * multiplication of identical doubles are each correctly rounded,
    * and floor of identical doubles is identical.
    *
    * Degenerate inputs have NO engine-neutral chain — measured: Spark's
    * own least/greatest HOF sends NaN to 0, DuckDB sends it to 255
    * (greatest(0, NaN) = NaN, least(255, NaN) = 255) and sends
    * div-by-zero to 0 (x/0 is NULL there, and least/greatest skip
    * NULLs). That divergence is exactly why the production semantics
    * live in THIS kernel rather than a HOF: it pins the ORACLE's
    * (DuckDB's) measured outcomes, so a degenerate row can never flip a
    * hash. NaN element → 255; `span == 0` → 0 for every x; ±Infinity
    * saturate to 255/0.
    */
  def codeOf(x: Double, mn: Double, span: Double): Int =
    if (span == 0d) 0
    else {
      val v = math.floor((x - mn) / span * 255.0)
      if (java.lang.Double.isNaN(v)) 255
      else if (v >= 255.0) 255
      else if (v <= 0.0) 0
      else v.toInt
    }

  /** NULL elements are rejected, not encoded: `getDouble` on a null
    * slot reads 0.0 from UnsafeArrayData (a silent wrong code — the
    * DuckDB oracle would yield NULL there), so the kernel fails fast
    * like [[sdc]]'s length check. NULL *vectors* are handled above this
    * kernel (nullSafeEval skips them; the write/search paths filter
    * them); element-level nulls have no geometry and are a corpus bug.
    */
  def encode(vec: ArrayData, mn: Double, span: Double): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i))
        throw new IllegalArgumentException(
          s"sq8_encode: vector has a NULL element at position $i — " +
            "null elements carry no geometry and would silently encode " +
            "as 0.0 on unsafe rows")
      out(i) = codeOf(vec.getDouble(i), mn, span)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Driver-side twin of [[encode]] for the query vector. */
  def encodeLocal(vec: Array[Double], mn: Double, span: Double): Array[Int] = {
    val out = new Array[Int](vec.length)
    var i = 0
    while (i < vec.length) {
      out(i) = codeOf(vec(i), mn, span)
      i += 1
    }
    out
  }

  /** Integer squared L2 distance between two code arrays. Fails fast on
    * a length mismatch (the [[graft.functions.VectorKernels]]
    * checkSameLength policy — reading past the input would return
    * garbage on UnsafeArrayData).
    */
  def sdc(codes: ArrayData, q: Array[Int]): Long = {
    if (codes.numElements() != q.length)
      throw new IllegalArgumentException(
        s"sq8_sdc requires code length == query length, got " +
          s"${codes.numElements()} and ${q.length}"
      )
    var s = 0L
    var i = 0
    while (i < q.length) {
      val d = (codes.getInt(i) - q(i)).toLong
      s += d * d
      i += 1
    }
    s
  }

  /** [[sdc]]'s two-COLUMN twin — the batched-retrieval kernel: both sides
    * are per-row code arrays (corpus code vs that row's joined query
    * code), so no driver-side query literal exists. Identical arithmetic
    * (int64 Σ(aᵢ−bᵢ)²), identical fail-fast length policy.
    */
  def sdcCols(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"sq8_sdc_cols requires equal code lengths, got " +
          s"$n and ${b.numElements()}"
      )
    var s = 0L
    var i = 0
    while (i < n) {
      val d = (a.getInt(i) - b.getInt(i)).toLong
      s += d * d
      i += 1
    }
    s
  }
}

  case class SQ8Encode(child: Expression, mn: Double, span: Double)
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "sq8_encode"

    // analysis-time input check: applied to a mistyped column (e.g.
    // array<bigint>), ArrayData.getInt/getDouble on unsafe rows would
    // silently read wrong byte slots instead of failing
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"sq8_encode requires array<double>, got ${other.catalogString}")
      }

    override protected def nullSafeEval(input: Any): Any =
      SQ8Kernels.encode(input.asInstanceOf[ArrayData], mn, span)

    override protected def doGenCode(
        ctx: CodegenContext,
        ev: ExprCode
    ): ExprCode = {
      // Embed the two scalars via their raw bits: always-valid Java
      // source (a printed shortest-repr literal breaks on ±Infinity)
      // and exactly the constructor's doubles.
      val mnBits = java.lang.Double.doubleToRawLongBits(mn)
      val spanBits = java.lang.Double.doubleToRawLongBits(span)
      defineCodeGen(
        ctx,
        ev,
        c =>
          s"graft.operators.SQ8Kernels.encode($c, " +
            s"Double.longBitsToDouble(${mnBits}L), " +
            s"Double.longBitsToDouble(${spanBits}L))"
      )
    }

    override protected def withNewChildInternal(newChild: Expression): SQ8Encode =
      copy(child = newChild)
  }

  case class SQ8Sdc(child: Expression, q: Array[Int])
      extends UnaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "sq8_sdc"

    // see SQ8Encode: a mistyped codes column must fail analysis, not
    // read wrong 4-byte slots from unsafe rows
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(IntegerType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"sq8_sdc requires array<int> codes, got ${other.catalogString}")
      }

    override protected def nullSafeEval(input: Any): Any =
      SQ8Kernels.sdc(input.asInstanceOf[ArrayData], q)

    override protected def doGenCode(
        ctx: CodegenContext,
        ev: ExprCode
    ): ExprCode = {
      val qRef = ctx.addReferenceObj("sq8Query", q, "int[]")
      defineCodeGen(
        ctx,
        ev,
        c => s"graft.operators.SQ8Kernels.sdc($c, $qRef)"
      )
    }

    override protected def withNewChildInternal(newChild: Expression): SQ8Sdc =
      copy(child = newChild)
  }

  /** [[SQ8Sdc]]'s binary form for the batched probe: integer SDC between
    * TWO code columns (corpus code × the joined query code). Same
    * analysis-time type policy — a mistyped side must fail analysis, not
    * read wrong 4-byte slots from unsafe rows.
    */
  case class SQ8SdcCols(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "sq8_sdc_cols"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (l, r) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"sq8_sdc_cols requires two array<int> code columns, got " +
              s"${l.catalogString} and ${r.catalogString}")
      }

    override protected def nullSafeEval(a: Any, b: Any): Any =
      SQ8Kernels.sdcCols(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(
        ctx: CodegenContext,
        ev: ExprCode
    ): ExprCode =
      defineCodeGen(
        ctx,
        ev,
        (a, b) => s"graft.operators.SQ8Kernels.sdcCols($a, $b)"
      )

    override protected def withNewChildrenInternal(
        newLeft: Expression,
        newRight: Expression
    ): SQ8SdcCols = copy(left = newLeft, right = newRight)
  }
