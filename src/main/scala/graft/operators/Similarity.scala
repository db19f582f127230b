package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`ArrayType(FloatType)`).
  * Baseline: brute-force cosine top-k (exact). Scale paths: LSH
  * random-hyperplane bucketing (candidates from an equi-join on the
  * bucket key) and an IVF index whose inverted lists ARE the physical
  * partition layout (probes become partition-pruned scans).
  */
object Similarity {

  /** Rank the ≤k already-sorted-and-limited rows without a window at all:
    * orderBy().limit(k) plans as TakeOrderedAndProject, whose output is
    * ONE partition in sorted order, so a monotonically_increasing_id over
    * it enumerates 0..k-1 in rank order. (A bare row_number() window here
    * would re-sort k rows and spam "No Partition Defined" warnings into
    * every bench log; a constant partitionBy key gets optimizer-folded
    * back to the empty spec.)
    */
  private[operators] def rankLimited(
      scored: DataFrame,
      idCol: String,
      keep: Seq[(String, String)] = Nil
  ): DataFrame =
    scored
      .coalesce(1)
      .withColumn("rank", (monotonically_increasing_id() + 1).cast("int"))
      .select(
        col(idCol).as("neighbor_id") +: col("rank") +:
          keep.map { case (c, a) => col(c).as(a) }: _*)

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
    rankLimited(scored, idCol)
  }

  /** BATCHED exact top-k — [[knn]] for EVERY row of a query DataFrame in
    * ONE plan: the EXACT baseline of the batched-retrieval family (the
    * quantized scale path is [[Quantization.ivfSq8SearchMany]]; this is
    * what its recall is measured against, and the right tool outright
    * when the query set is small enough that |corpus| × |queries| exact
    * scoring is affordable — recall 1.0 by definition). Query vectors
    * broadcast (one row each, no codes — keep the query set bounded or
    * take the quantized path); the corpus scans ONCE and never shuffles:
    * scoring is the compiled two-column cosine over the broadcast
    * nested-loop pairs, per-query top-k is a rank-limited window Spark
    * plans as WindowGroupLimit (map-side partial top-k before the one
    * hash exchange). Work is inherently |corpus| × |queries| — brute is
    * the contract; the job COUNT stays constant in the query count.
    * Output: (query_id, neighbor_id, rank) — ranks ride cosine gaps
    * (the s01 argument). `excludeSelf` drops `neighbor_id == query_id`
    * (the queries-drawn-from-the-corpus shape). Query ids must be
    * UNIQUE within `queries` (the [[Quantization.ivfSq8SearchMany]] id
    * contract — a duplicate would interleave duplicate neighbors into
    * that query's ranks).
    */
  def knnMany(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queries: DataFrame,
      qVecCol: String,
      qIdCol: String,
      k: Int,
      excludeSelf: Boolean = true
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val q = queries
      .filter(col(qVecCol).isNotNull)
      .select(col(qIdCol).as("query_id"), col(qVecCol).as("_qv"))
    val scored = df
      // a NULL corpus vector scores NULL cosine; desc sorts NULLS LAST so
      // it cannot outrank real rows, but drop it anyway — a k-row window
      // over a mostly-null corpus would surface null-cosine rows
      .filter(col(vecCol).isNotNull)
      .join(
        broadcast(q),
        if (excludeSelf) col(idCol) =!= col("query_id") else lit(true))
      .withColumn("_cos", VectorFunctions.cosine(col(vecCol), col("_qv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("_cos").desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("rank"))
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
    * bucket or any bucket within `probeBits` sign flips (multi-probe —
    * a near neighbor's dot product sits close to zero on a few planes,
    * so probing low-Hamming buckets recovers most of the lost recall),
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
      seed: Long = 42L,
      probeBits: Int = 2
  ): DataFrame = {
    val withSig = df.withColumn(
      "_sig",
      hyperplaneSignature(col(vecCol), nPlanes, dim, seed)
    )
    // all flip masks of Hamming weight ≤ probeBits (driver-side; tiny:
    // sum of C(nPlanes, w) for w ≤ probeBits)
    val masks: Seq[Long] = (0 to probeBits).flatMap(w =>
      (0 until nPlanes)
        .combinations(w)
        .map(_.foldLeft(0L)((acc, b) => acc | (1L << b)))
    )
    val probeSigs = withSig
      .filter(col(idCol) === queryId)
      .select(
        explode(
          array(masks.map(m => col("_sig").bitwiseXOR(lit(m))): _*)
        ).as("_probe"),
        col(vecCol).as("_qv")
      )
    val scored = withSig
      .filter(col(idCol) =!= queryId)
      .join(broadcast(probeSigs), col("_sig") === col("_probe"))
      .withColumn("_cos", VectorFunctions.cosine(col(vecCol), col("_qv")))
      .orderBy(col("_cos").desc, col(idCol).asc)
      .limit(k)
    rankLimited(scored, idCol)
  }

  // ------------------------------------------------------------------ IVF

  /** A built IVF index: coarse centroids live on the DRIVER (tiny —
    * nCentroids × dim doubles), the data lives distributed with a
    * `_centroid` assignment column. Probing never runs a Spark job to
    * pick centroids and never caches/counts the table.
    */
  final case class IvfIndex(
      assigned: DataFrame,
      centroids: Array[Array[Double]],
      vecCol: String,
      idCol: String
  )

  private[operators] def sqDistLocal(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** The distance-sorted `(dist, cid)` struct array behind [[ivfAssign]]
    * and [[ivfProbes]]: per-row distances to every literal centroid,
    * sorted ascending by (dist, cid) — the same tie order the
    * driver-side probe ranking uses ([[sqDistLocal]] + sortBy).
    */
  private def centroidRanking(
      vecCol: String,
      centroids: Array[Array[Double]]
  ): Column =
    array_sort(
      array(centroids.zipWithIndex.map { case (cv, ci) =>
        struct(
          VectorFunctions
            .euclidean(col(vecCol), array(cv.map(lit): _*))
            .as("dist"),
          lit(ci).as("cid")
        )
      }: _*)
    )

  /** Assign every row to its nearest centroid (index into `centroids`).
    * Pure per-row column argmin over literal centroid vectors — no
    * shuffle, no job.
    */
  def ivfAssign(
      df: DataFrame,
      vecCol: String,
      centroids: Array[Array[Double]]
  ): DataFrame =
    df.withColumn(
      "_centroid", centroidRanking(vecCol, centroids).getItem(0).getField("cid"))

  /** [[ivfAssign]] generalized to the PROBE side of batched retrieval:
    * every row gets its `nProbe` nearest list ids as `_probes`
    * (array<int>, ascending by distance then cid — the exact set and
    * order the single-query probes pick driver-side). Still a pure
    * per-row expression: no shuffle, no job, no driver loop — the
    * composition that lets N queries probe in ONE plan.
    */
  def ivfProbes(
      df: DataFrame,
      vecCol: String,
      centroids: Array[Array[Double]],
      nProbe: Int
  ): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    df.withColumn(
      "_probes",
      transform(
        slice(centroidRanking(vecCol, centroids), 1, nProbe),
        s => s.getField("cid")))
  }

  /** Initial coarse centroids: an evenly-strided sample of the vectors
    * themselves (deterministic). One count + one nCentroids-row collect,
    * at index-BUILD time only. Numeric ids stride directly (unchanged
    * behavior); any other id type — the surface is type-dynamic, like
    * the reference's — takes a hash-ORDERED sample instead
    * ([[Ops.hashOrderedSample]]): a hash-residue stride filter would
    * under-select (binomially, possibly to zero), and zero centroids
    * here would silently assign every vector a NULL centroid downstream.
    */
  def ivfInitCentroids(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      nCentroids: Int
  ): Array[Array[Double]] = {
    // SPARSE numeric ids (snowflake/random longs) under-select the
    // residue filter binomially, just like string ids did before r15
    // (r15 verdict ask #2): when the strided sample returns fewer rows
    // than the corpus could supply (min(n, nCentroids)), fall back to
    // the hash-ordered sample. Dense 0..n ids always stride to exactly
    // min(n, nCentroids) rows, so every historical corpus keeps its
    // exact seed set and order — committed bench/oracle rows don't move.
    def collectSeeds(s: DataFrame): Array[Array[Double]] = s
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val seeds =
      if (Ops.isNumericId(df, idCol)) {
        val n = df.count()
        val stride = math.max(1L, n / nCentroids)
        val strided = collectSeeds(
          df.filter(pmod(col(idCol), lit(stride)) === 0).limit(nCentroids))
        if (strided.length >= math.min(n, nCentroids.toLong)) strided
        else collectSeeds(Ops.hashOrderedSample(df, idCol, nCentroids))
      } else collectSeeds(Ops.hashOrderedSample(df, idCol, nCentroids))
    require(
      seeds.nonEmpty,
      s"ivfInitCentroids selected zero seed vectors for nCentroids=$nCentroids — " +
        "an empty centroid set would silently NULL every assignment; is the corpus empty?")
    seeds
  }

  /** Lloyd refinement of the coarse quantizer, expressed as DataFrame
    * aggregation: assign → per-(centroid, position) mean → new centroid
    * literals. Each iteration is one pass + one (nCentroids × dim)-row
    * collect. Empty clusters keep their previous centroid.
    */
  def kMeansRefine(
      df: DataFrame,
      vecCol: String,
      centroids: Array[Array[Double]],
      iterations: Int
  ): Array[Array[Double]] = {
    var cents = centroids
    for (_ <- 0 until iterations) {
      val means = ivfAssign(df, vecCol, cents)
        .select(col("_centroid"), posexplode(col(vecCol)).as(Seq("_pos", "_v")))
        .groupBy(col("_centroid"), col("_pos"))
        .agg(avg(col("_v")).as("_m"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      }
      cents = next
    }
    cents
  }

  /** Build an IVF index in memory: centroids (optionally Lloyd-refined)
    * + assignment column, inverted lists co-located via repartition on
    * `_centroid`.
    */
  def ivfBuild(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      nCentroids: Int,
      refineIters: Int = 2
  ): IvfIndex = {
    val init = ivfInitCentroids(df, vecCol, idCol, nCentroids)
    val cents =
      if (refineIters > 0) kMeansRefine(df, vecCol, init, refineIters) else init
    IvfIndex(ivfAssign(df, vecCol, cents), cents, vecCol, idCol)
  }

  /** Persist an IVF index as the on-disk inverted-list layout: parquet
    * PARTITIONED BY `_centroid` (each inverted list is a partition
    * directory, so a probe's `_centroid IN (...)` filter prunes files
    * before any IO) plus the centroid vectors as a tiny side table.
    * This is the 100 TB shape: build once, probe many.
    */
  def ivfWrite(index: IvfIndex, path: String): Unit = {
    index.assigned.write
      .mode("overwrite")
      .partitionBy("_centroid")
      .parquet(s"$path/lists")
    writeCentroids(index.assigned.sparkSession, index.centroids, s"$path/centroids")
  }

  /** The centroid-sidecar writer paired with [[readCentroids]] — ONE
    * owner for the `(cid, cvec)` layout every partitioned ANN family
    * round-trips through ([[ivfWrite]], `ivfPqWrite`, `ivfSq8Build`).
    */
  private[operators] def writeCentroids(
      spark: SparkSession,
      centroids: Array[Array[Double]],
      path: String
  ): Unit = {
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (v, i) => (i, v) }
      .toSeq
      .toDF("cid", "cvec")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(path)
  }

  /** Fold new vectors into a WRITTEN IVF index under the FROZEN-QUANTIZER
    * contract (the production ANN ingest shape: train the coarse
    * quantizer once, append forever, re-train via
    * [[ivfBuild]]/[[ivfWrite]] when drift accumulates): assign the delta
    * against the stored centroids — a per-row argmin, no shuffle — and
    * append to the partitioned inverted-list layout. Untouched lists
    * gain no files, and a probe after the append equals a probe over
    * the union assigned with the same centroids (gated). `delta` must
    * carry the same columns the index was built from.
    */
  def ivfAppend(
      spark: SparkSession,
      delta: DataFrame,
      path: String,
      vecCol: String,
      idCol: String
  ): Unit = {
    failIfCompacting(spark, s"$path/lists")
    val cents = readCentroids(spark, s"$path/centroids")
    ivfAssign(delta, vecCol, cents).write
      .mode("append")
      .partitionBy("_centroid")
      .parquet(s"$path/lists")
  }

  /** Compact the inverted lists of a written IVF index after many
    * [[ivfAppend]]s / [[semDedupPairsIncrementalFold]]s — the ANN twin
    * of [[graft.operators.Dedup.compactBucketedIndexTable]]. Every
    * append adds a file set to each touched `_centroid=` directory, so a
    * year of daily deltas leaves ~365 small files per hot list — correct
    * but increasingly listing- and footer-heavy to open. This rewrites
    * the lists with one task (→ one file) per centroid and swaps the
    * directory in via rename-aside, recoverable at every crash point
    * (worst case the canonical dir is absent for ONE rename, with both
    * `_compact_old` and `_compact_tmp` intact and the idempotent-retry
    * branch restoring automatically). Probes and folds are
    * result-identical before and after (gated). Centroids are untouched.
    */
  def ivfCompact(spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    compactPartitionedDir(spark, s"$path/lists", "_centroid")

  /** Shared rename-aside compactor for the `_centroid`-partitioned
    * parquet layouts ([[ivfWrite]] lists, `ivfPqWrite` codes). Uses the
    * Hadoop FileSystem of the target path, so it works on any scheme
    * whose rename is atomic-enough for a single directory move (local
    * FS, HDFS); object-store deployments should front this with their
    * own commit protocol.
    *
    * SINGLE-WRITER CONTRACT: compaction must not run concurrently with
    * an append ([[ivfAppend]], [[Quantization.ivfPqAppend]],
    * [[semDedupPairsIncrementalFold]]) against the same index — an
    * append that lands between the snapshot read and the swap renames
    * would be silently DISCARDED by the rename(target→old) +
    * delete(old), and a probe racing the swap sees a window where the
    * canonical dir is absent. The compactor takes an advisory
    * `<dir>_compact_lock` sentinel for its duration and the append
    * entry points fail fast when it is present ([[failIfCompacting]]).
    * The sentinel is a fail-fast guard against honest concurrent use on
    * one filesystem, not a distributed mutex — deployments with
    * multiple drivers must serialize compaction externally. A JVM that
    * dies mid-compaction leaves the sentinel behind; the next compact
    * call reclaims it ONLY once the holder pid is provably not a live
    * foreign compactor ([[CompactLock.acquire]] — a live holder's
    * sentinel is never stolen), and its leftover-recovery already
    * handles every crash state; appends keep failing fast until then —
    * the safe direction. On an in-process failure the sentinel is
    * released only when the canonical dir survived
    * ([[CompactLock.releaseIfCanonical]]): a mid-swap failure leaves it
    * behind so appends cannot recreate the canonical dir and trick the
    * next compact's recovery branch into deleting `_compact_old`.
    */
  private[operators] def compactPartitionedDir(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      partCol: String
  ): Unit = {
    import org.apache.hadoop.fs.Path
    val target = new Path(dir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + "_compact_tmp")
    val old = new Path(dir + "_compact_old")
    val lock = compactLockPath(dir)
    // take (or reclaim per the staleness rules) the advisory lock
    CompactLock.acquire(fs, lock)
    try {
      // idempotent retry: clear leftovers from a previously failed attempt
      // (keep `old` only as long as the canonical dir still exists — if a
      // prior crash left ONLY `old`, restore it instead of dropping it)
      if (fs.exists(target)) {
        fs.delete(old, true)
        fs.delete(tmp, true)
      } else if (fs.exists(old)) {
        require(fs.rename(old, target), s"recovery rename $old -> $target failed")
        fs.delete(tmp, true)
      } else {
        throw new IllegalStateException(s"no index data at $dir (nor $old)")
      }
      // one task per partition value → one file per directory; the source
      // dir is only read, never written, until the swap below
      spark.read
        .parquet(dir)
        .repartition(col(partCol))
        .write
        .mode("overwrite")
        .partitionBy(partCol)
        .parquet(tmp.toString)
      require(fs.rename(target, old), s"swap rename $target -> $old failed")
      require(fs.rename(tmp, target), s"swap rename $tmp -> $target failed")
      fs.delete(old, true)
      ()
    } finally
      // only when the canonical dir survived: a mid-swap failure keeps
      // the sentinel so appends fail fast until the next compact recovers
      CompactLock.releaseIfCanonical(fs, lock, fs.exists(target))
  }

  private[operators] def compactLockPath(dir: String): org.apache.hadoop.fs.Path =
    CompactLock.forDir(dir)

  /** Fail fast if a compaction of `dir` is in flight (or died holding
    * the sentinel): an append that proceeded would be silently dropped
    * by the compactor's swap. See the single-writer contract on
    * [[compactPartitionedDir]].
    */
  private[operators] def failIfCompacting(
      spark: org.apache.spark.sql.SparkSession,
      dir: String
  ): Unit = {
    val lock = compactLockPath(dir)
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    CompactLock.failIfHeld(fs, lock, dir)
  }

  private[operators] def readCentroids(
      spark: SparkSession,
      path: String
  ): Array[Array[Double]] =
    spark.read
      .parquet(path)
      .collect()
      .map(r => r.getInt(r.fieldIndex("cid")) -> r.getSeq[Double](r.fieldIndex("cvec")).toArray)
      .sortBy(_._1)
      .map(_._2)

  /** Load a written IVF index; centroids come back to the driver (tiny). */
  def ivfRead(spark: SparkSession, path: String, vecCol: String, idCol: String): IvfIndex =
    IvfIndex(
      spark.read.parquet(s"$path/lists"),
      readCentroids(spark, s"$path/centroids"),
      vecCol,
      idCol)

  /** Probe an IVF index: rank centroids against the query vector ON THE
    * DRIVER (the centroid table is driver-resident — zero Spark jobs),
    * then exact cosine top-k over only the probed inverted lists. On a
    * written index the `_centroid` IN-filter is a partition-pruning
    * predicate — untouched lists are never read.
    */
  def ivfProbe(
      index: IvfIndex,
      queryVec: Array[Double],
      k: Int,
      nProbe: Int,
      excludeId: Option[Long] = None
  ): DataFrame = {
    val probeIds = index.centroids.zipWithIndex
      .sortBy { case (cv, _) => sqDistLocal(cv, queryVec) }
      .take(nProbe)
      .map(_._2)
    val qLit = array(queryVec.map(lit): _*)
    val base = index.assigned.filter(col("_centroid").isin(probeIds.map(Integer.valueOf): _*))
    val filtered = excludeId.fold(base)(q => base.filter(col(index.idCol) =!= q))
    val scored = filtered
      .withColumn("_cos", VectorFunctions.cosine(col(index.vecCol), qLit))
      .orderBy(col("_cos").desc, col(index.idCol).asc)
      .limit(k)
    rankLimited(scored, index.idCol)
  }

  /** One-shot IVF ANN top-k for one query id (registry form): build the
    * index (no cache — every stage is single-use here), fetch the query
    * vector via a pushed-down id filter, probe. For repeated queries use
    * [[ivfBuild]]/[[ivfWrite]] once and [[ivfProbe]] per query.
    */
  def ivfTopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryId: Long,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      refineIters: Int = 2
  ): DataFrame = {
    val index = ivfBuild(df, vecCol, idCol, nCentroids, refineIters)
    val qVec = df
      .filter(col(idCol) === queryId)
      .select(col(vecCol))
      .head()
      .getSeq[Float](0)
      .toArray
      .map(_.toDouble)
    ivfProbe(index, qVec, k, nProbe, excludeId = Some(queryId))
  }

  /** Structural audit of a cosine-ranked top-k result (the
    * [[knn]]/[[annTopK]]/[[ivfTopK]] `(neighbor_id, rank)` shape) — the
    * top-k twin of [[Dedup.pairInvariants]]: the returned SET is
    * bucket/centroid-dependent, but its invariants are not, so an
    * independent oracle can record the expected row. ONE row of
    * violation counts:
    *
    *  - `missing_rows`: `k` minus rows returned — 0 for any emitter
    *    whose candidate pool covers k rows (true on the fixture);
    *  - `bad_ids`: neighbors absent from the corpus or equal to the
    *    query id — must be 0;
    *  - `bad_rank_set`: 1 unless ranks are exactly {1..returned};
    *  - `disorder`: adjacent rank pairs whose EXACT cosine (recomputed
    *    from the raw vectors, independent of the emitter's score path)
    *    increases with rank — must be 0 for true-cosine rankers (do
    *    NOT audit PQ/ADC emitters with this: their rank order is by
    *    approximate distance by design);
    *  - `above_best`: neighbors whose exact cosine exceeds the corpus
    *    brute best — impossible (a max over a subset), must be 0.
    *
    * Scale shape: one broadcast of the 1-row query vector, one
    * broadcast-able scalar (brute best = a max-agg over the corpus),
    * a k-row window — nothing driver-side beyond the k rows.
    */
  def topKAudit(
      res: DataFrame,
      df: DataFrame,
      vecCol: String,
      idCol: String,
      queryId: Long,
      k: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = df
      .filter(col(idCol) === queryId)
      .select(col(vecCol).as("_qv"), lit(1).as("_k1"))
    val bruteBest = df
      .filter(col(idCol) =!= queryId)
      .withColumn("_k1", lit(1))
      .join(broadcast(q), "_k1")
      .agg(max(VectorFunctions.cosine(col(vecCol), col("_qv"))).as("_best"))
      .select(col("_best"), lit(1).as("_k1"))
    val scored = res
      .withColumn("_k1", lit(1))
      .join(
        df.select(col(idCol).as("_nid"), col(vecCol).as("_nv")),
        col("neighbor_id") === col("_nid"),
        "left")
      .join(broadcast(q), "_k1")
      .join(broadcast(bruteBest), "_k1")
      .withColumn("_cos", VectorFunctions.cosine(col("_nv"), col("_qv")))
      .withColumn(
        "_prev",
        lag(col("_cos"), 1).over(Window.orderBy(col("rank"))))
    scored.agg(
      (lit(k.toLong) - count(lit(1))).as("missing_rows"),
      coalesce(
        sum(when(col("_nid").isNull || col("neighbor_id") === queryId, 1L)),
        lit(0L)).as("bad_ids"),
      when(
        countDistinct(col("rank")) === count(lit(1)) &&
          min(col("rank")) === 1 && max(col("rank")) === count(lit(1)),
        0L).otherwise(1L).as("bad_rank_set"),
      coalesce(sum(when(col("_cos") > col("_prev"), 1L)), lit(0L))
        .as("disorder"),
      coalesce(sum(when(col("_cos") > col("_best"), 1L)), lit(0L))
        .as("above_best")
    )
  }

  // ------------------------------------------------------- SemDeDup

  /** Semantic near-dup pairs via k-means clustering — SemDeDup (Abbas
    * et al., arXiv:2303.09540): cluster the embeddings with the IVF
    * coarse quantizer, then verify cosine similarity only WITHIN each
    * cluster. Complements [[lshNearDups]]: LSH recall is per-pair
    * probabilistic but global; SemDeDup recall is exact within a cluster
    * and zero across cluster boundaries (the paper's accepted loss —
    * near-dups are near the same centroid, so boundary misses are rare
    * for genuinely close pairs and grow as the threshold loosens).
    *
    * Scale shape: assignment is a per-row argmin over centroid literals
    * (no shuffle), the within-cluster join is the same capped-bucket →
    * localCheckpoint → codegen'd self-equi-join kernel as every other
    * dedup path, with clusters as the buckets — candidate mass is
    * Σ C(cluster, 2), controlled by `nClusters` ≈ n / targetClusterSize.
    * Unlike the multi-table LSH path each vector is in exactly ONE
    * cluster, so no exactly-once conjunction is needed. Audit cluster
    * sizes with `index.assigned.groupBy("_centroid").count()` before
    * trusting a `maxCluster` cap. Release the result's checkpoint blocks
    * with [[graft.CacheUtil.release]].
    */
  def semDedupPairsFromIndex(
      index: IvfIndex,
      threshold: Double,
      maxCluster: Int = 10000
  ): DataFrame = {
    require(maxCluster > 1, "maxCluster must allow at least one pair")
    val members = semDedupCappedStored(index, maxCluster)
    members
      .as("a")
      .join(
        members.as("b"),
        col("a._centroid") === col("b._centroid") && col("a._id") < col("b._id")
      )
      .select(
        col("a._id").as("id_a"),
        col("b._id").as("id_b"),
        VectorFunctions.dot(col("a._nv"), col("b._nv")).as("cosine")
      )
      .filter(col("cosine") >= threshold)
  }

  /** SemDeDup for daily deltas — the semantic member of the incremental
    * dedup family, under the same contracts as the rest of it: FROZEN
    * coarse centroids (the index's), capped clusters with
    * FIRST-SEEN-WINS admission (lowest ids keep their slots; under the
    * monotone-id daily-crawl contract stored ids precede delta ids, so
    * the capped members of corpus ∪ delta are exactly stored-capped
    * plus delta rows admitted into the remaining slots), and emission =
    * every within-cluster pair ≥ `threshold` touching the delta:
    * (admitted delta × capped stored members) ∪ (admitted delta ×
    * admitted delta). Fold the delta in afterwards with [[ivfAppend]]
    * (lists stay uncapped on disk — ANN completeness; the cap is a
    * pairing concern, applied by slicing the lowest ids at probe time,
    * so a later probe over the grown lists still sees the capped-batch
    * member set). Gated: emission == capped-batch pairs on the union
    * restricted to delta-touching, incl. over-cap clusters.
    */
  def semDedupPairsIncremental(
      delta: DataFrame,
      index: IvfIndex,
      threshold: Double,
      maxCluster: Int = 10000
  ): DataFrame = {
    require(maxCluster > 1, "maxCluster must allow at least one pair")
    val stored = semDedupCappedStored(index, maxCluster)
    val probe = ivfAssign(
      delta.select(col(index.idCol), col(index.vecCol)),
      index.vecCol, index.centroids)
      .select(
        col(index.idCol).as("_id"),
        VectorFunctions.l2Normalize(col(index.vecCol)).as("_nv"),
        col("_centroid"))
    val admitted = semDedupAdmit(probe, stored, maxCluster)
    val out =
      semDedupPairsTouchingDelta(admitted, stored, threshold).localCheckpoint(true)
    graft.CacheUtil.release(stored)
    graft.CacheUtil.release(admitted)
    out
  }

  /** Probe-then-append in ONE delta pass against a WRITTEN IVF index
    * (the [[ivfWrite]] layout) — the semantic member of the fold family
    * ([[graft.operators.Dedup.minHashNearDupsIncrementalFold]] et al.):
    * emit every threshold-passing within-cluster pair touching the
    * delta against the lists as they stood, then fold the delta in.
    * Gated observationally identical to [[semDedupPairsIncremental]]
    * over [[ivfRead]] followed by [[ivfAppend]], but the per-row
    * centroid argmin runs ONCE (checkpointed) and feeds both the probe
    * and the appended list rows. Like [[ivfAppend]], `delta` must carry
    * the same columns the index was built from, and the lists stay
    * uncapped on disk (ANN completeness — the cluster cap is a pairing
    * concern applied at probe time).
    *
    * CONTRACT (required when a cluster can exceed `maxCluster`): delta
    * ids must be GREATER than every stored id — the daily-crawl
    * monotone-id contract shared by the whole incremental family
    * ([[graft.operators.Dedup.admittedAgainstIndexKeyed]] documents the
    * same rule). First-seen-wins admission fills a cluster's remaining
    * slots with the lowest delta ids; a delta id that undercuts a
    * stored id cannot retroactively evict the stored member, so the
    * capped member set would diverge from the capped batch over the
    * union with no runtime signal. Under-cap clusters are unaffected.
    * The over-cap ScalaTest leg asserts the precondition explicitly.
    */
  def semDedupPairsIncrementalFold(
      spark: org.apache.spark.sql.SparkSession,
      delta: DataFrame,
      path: String,
      vecCol: String,
      idCol: String,
      threshold: Double,
      maxCluster: Int = 10000,
      sink: Option[DataFrame => Unit] = None
  ): DataFrame = {
    require(maxCluster > 1, "maxCluster must allow at least one pair")
    failIfCompacting(spark, s"$path/lists")
    val cents = readCentroids(spark, s"$path/centroids")
    // REPLAY SAFETY ([[graft.operators.ReplaySafe]], single lists dir):
    // the lists record every folded row, so they are both index and
    // ledger; the probe reads them with the delta's ids excluded
    // (pre-append state on a replay, a no-op on a first attempt) and
    // the append writes only unseen rows
    val rids = ReplaySafe.ids(delta, idCol)
    val listsRaw = spark.read.parquet(s"$path/lists")
    val seen = ReplaySafe.seenIds(listsRaw, idCol, rids)
    val unseen = ReplaySafe.unseenIds(rids, seen)
    // the ONE delta-side assignment pass: reused by the probe and the fold
    val assigned = ivfAssign(delta, vecCol, cents).localCheckpoint(true)
    val index = IvfIndex(
      ReplaySafe.excludeIds(listsRaw, idCol, rids), cents, vecCol, idCol)
    val stored = semDedupCappedStored(index, maxCluster)
    val probe = assigned.select(
      col(idCol).as("_id"),
      VectorFunctions.l2Normalize(col(vecCol)).as("_nv"),
      col("_centroid"))
    val admitted = semDedupAdmit(probe, stored, maxCluster)
    // materializes the pair set BEFORE the append mutates the lists
    val out = ReplaySafe.keepPairsTouchingUnseen(
      semDedupPairsTouchingDelta(admitted, stored, threshold),
      "id_a", "id_b", unseen).localCheckpoint(true)
    sink.foreach(_(out)) // persist before the ledger append ([[IdempotentSink]])
    ReplaySafe.dropSeen(assigned, idCol, seen)
      .write.mode("append").partitionBy("_centroid").parquet(s"$path/lists")
    graft.CacheUtil.release(stored)
    graft.CacheUtil.release(admitted)
    graft.CacheUtil.release(assigned)
    graft.CacheUtil.release(seen)
    graft.CacheUtil.release(unseen)
    graft.CacheUtil.release(rids)
    out
  }

  /** Normalized members of every cluster, capped at the `maxCluster`
    * LOWEST ids — the same rank-filter window as
    * [[graft.operators.Dedup.capBucketMembership]] (`row_number ≤ k`
    * over the cluster key, which Spark 4 executes as a per-partition
    * WindowGroupLimit top-k, plan-gated) instead of a
    * groupBy+collect_list+slice: a hot 10k-member cluster never
    * materializes its members (id, vector) array in one aggregation
    * buffer, and the normalized vectors ride the sort as payload, never
    * as a sort key. Singleton clusters are KEPT (the self-equi-join
    * emits nothing for them; incremental probes pair arrivals against
    * them). Checkpointed — callers release.
    */
  private def semDedupCappedStored(
      index: IvfIndex,
      maxCluster: Int
  ): DataFrame =
    semDedupCappedStoredLazy(index, maxCluster).localCheckpoint(true)

  /** The un-materialized plan behind [[semDedupCappedStored]], exposed
    * for the WindowGroupLimit plan gate (the public forms checkpoint
    * eagerly, hiding the window from the returned plan).
    */
  private[graft] def semDedupCappedStoredLazy(
      index: IvfIndex,
      maxCluster: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("_centroid")).orderBy(col("_id"))
    index.assigned
      .select(
        col(index.idCol).as("_id"),
        VectorFunctions.l2Normalize(col(index.vecCol)).as("_nv"),
        col("_centroid")
      )
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= maxCluster)
      .drop("_rk")
  }

  /** First-seen-wins admission of assigned delta rows (`_centroid`,
    * `_id`, `_nv`) into each cluster's remaining slots. `stored` must
    * already be capped, so its per-cluster count IS the number of
    * occupied slots. Checkpointed — callers release.
    */
  private def semDedupAdmit(
      probe: DataFrame,
      stored: DataFrame,
      maxCluster: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val slots = stored.groupBy(col("_centroid")).agg(count(lit(1)).as("_nstored"))
    val w = Window.partitionBy(col("_centroid")).orderBy(col("_id"))
    probe
      .withColumn("_rk", row_number().over(w))
      .join(slots, Seq("_centroid"), "left")
      .filter(col("_rk") <= lit(maxCluster) - coalesce(col("_nstored"), lit(0L)))
      .select(col("_centroid"), col("_id"), col("_nv"))
      .localCheckpoint(true)
  }

  /** Every within-cluster pair ≥ `threshold` touching the delta:
    * (admitted × capped stored) ∪ (admitted × admitted). Lazy — callers
    * materialize.
    */
  private def semDedupPairsTouchingDelta(
      admitted: DataFrame,
      stored: DataFrame,
      threshold: Double
  ): DataFrame = {
    val cross = admitted
      .as("d")
      .join(
        stored.as("c"),
        col("d._centroid") === col("c._centroid") && col("d._id") =!= col("c._id"))
      .select(
        least(col("d._id"), col("c._id")).as("id_a"),
        greatest(col("d._id"), col("c._id")).as("id_b"),
        VectorFunctions.dot(col("d._nv"), col("c._nv")).as("cosine"))
      .filter(col("cosine") >= threshold)
    val within = admitted
      .as("a")
      .join(
        admitted.as("b"),
        col("a._centroid") === col("b._centroid") && col("a._id") < col("b._id"))
      .select(
        col("a._id").as("id_a"),
        col("b._id").as("id_b"),
        VectorFunctions.dot(col("a._nv"), col("b._nv")).as("cosine"))
      .filter(col("cosine") >= threshold)
    cross.unionByName(within)
  }

  /** Convenience form: build the cluster index (deterministic strided
    * init + Lloyd refinement) and emit pairs. Use
    * [[semDedupPairsFromIndex]] to reuse an index across thresholds.
    */
  def semDedupPairs(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      nClusters: Int,
      threshold: Double,
      refineIters: Int = 2,
      maxCluster: Int = 10000
  ): DataFrame =
    semDedupPairsFromIndex(
      ivfBuild(df, vecCol, idCol, nClusters, refineIters), threshold, maxCluster)

  /** SemDeDup retention: drop every row that pairs (within-cluster
    * cosine ≥ threshold) with a lower-id keeper — connected-component
    * clustering over the pair graph, keep the minimum id per component
    * (same rule as [[Dedup.dedupByPairs]]).
    */
  def semDedup(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      nClusters: Int,
      threshold: Double,
      refineIters: Int = 2,
      maxCluster: Int = 10000
  ): DataFrame =
    Dedup.dedupByPairs(
      df,
      idCol,
      semDedupPairs(df, vecCol, idCol, nClusters, threshold, refineIters, maxCluster)
    )

  /** LSH-blocked near-dup pairs over embeddings (scale path of
    * [[Dedup.embeddingNearDupsBrute]]): a pair is a candidate when it
    * shares a bucket in ANY of `nTables` independent hyperplane tables
    * (recall per pair = 1 − (1 − p^nPlanes)^nTables for per-plane
    * agreement probability p = 1 − θ/π), then verified with an exact
    * cosine filter. Tune nPlanes down / nTables up for recall, the
    * reverse for cost.
    *
    * Same two-step shape as [[Dedup.minHashCandidates]] (full rationale
    * there): all nTables signatures are computed in ONE checkpoint job
    * (each signature evaluated exactly once), buckets grouped on
    * (table, sig) and capped at the `maxBucket` lowest ids
    * (deterministic; bounds any degenerate bucket at maxBucket²/2
    * pairs), membership exploded back to rows, and in-bucket i<j pairs
    * generated by a codegen'd self-equi-join on the bucket key — pairs
    * stream instead of materializing per-bucket arrays, and AQE splits
    * hot buckets across tasks. The verify joins rescan the (pruned)
    * vector columns instead of caching them — vectors come straight off
    * parquet, so two cheap scans beat holding the corpus in block
    * storage.
    *
    * Sizing `nPlanes` at scale: each table has 2^nPlanes buckets, so
    * random collisions per table ≈ n²/2^(nPlanes+1) — pick nPlanes ≈
    * log2(n / targetBucketSize) and raise nTables to recover per-pair
    * recall (1 − (1 − p^nPlanes)^nTables). Probed at 20k vectors on the
    * near-threshold fixture: runtime is bound by the ~1.5 M VERIFIED
    * pairs, not random collisions, so the small defaults hold there;
    * on sparse real corpora the collision term dominates and nPlanes
    * must grow with log n.
    *
    * The returned plan reads the membership checkpoint blocks; free them
    * with [[graft.CacheUtil.release]] on the result when done (as with
    * [[Dedup.minHashCandidates]] — repeated calls otherwise accumulate
    * MEMORY_AND_DISK blocks until the RDD is GC'd).
    */
  /** Suggested (nPlanes, nTables) for [[lshNearDups]]. */
  final case class LshParams(nPlanes: Int, nTables: Int)

  /** Auto-size hyperplane LSH from corpus stats — the docstring rule of
    * [[lshNearDups]] as code.
    *
    *  - `nPlanes ≈ log2(n / targetBucket)`: each table has 2^nPlanes
    *    buckets, so the average bucket holds ~targetBucket vectors and
    *    random collisions stay ≈ n·targetBucket/2 per table instead of
    *    n²/2^(nPlanes+1) blowing up with the corpus.
    *  - `nTables` from the per-pair recall bound: a pair at EXACTLY
    *    `threshold` cosine collides per plane with p = 1 − acos(t)/π,
    *    per table with p^nPlanes, across tables with
    *    1 − (1 − p^nPlanes)^nTables ≥ recallTarget. Real above-threshold
    *    pairs collide more, so measured recall beats the bound (the
    *    sf0.1 probe: bound 0.943 at (3, 12), measured 0.951).
    *
    * The bound treats buckets as uncapped; an ACTIVE maxBucket cap drops
    * pairs the bound counts (audit before trusting the target).
    */
  def suggestLshParams(
      n: Long,
      targetBucket: Int = 250,
      recallTarget: Double = 0.95,
      threshold: Double = 0.3
  ): LshParams = {
    require(n > 0, s"corpus size must be positive, got $n")
    require(targetBucket > 0, s"targetBucket must be positive, got $targetBucket")
    require(
      recallTarget > 0 && recallTarget < 1,
      s"recallTarget must be in (0, 1), got $recallTarget"
    )
    require(
      threshold > -1 && threshold < 1,
      s"threshold must be a cosine in (-1, 1), got $threshold"
    )
    val nPlanes =
      math.max(1, math.round(math.log(n.toDouble / targetBucket) / math.log(2.0)).toInt)
    val p = 1.0 - math.acos(threshold) / math.Pi
    val pTable = math.pow(p, nPlanes)
    val nTables =
      if (pTable >= 1.0) 1
      else math.max(1, math.ceil(math.log1p(-recallTarget) / math.log1p(-pTable)).toInt)
    LshParams(nPlanes, nTables)
  }

  def lshNearDups(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double,
      nPlanes: Int = 8,
      dim: Int = 64,
      seed: Long = 42L,
      nTables: Int = 4,
      maxBucket: Int = 10000
  ): DataFrame = {
    require(maxBucket > 1, "maxBucket must allow at least one pair")
    val banded = lshBanded(df, vecCol, idCol, nPlanes, dim, seed, nTables)
    val cands = lshCandidatesFromBanded(banded, nTables, maxBucket)
    val v = df.select(
      col(idCol).as("_vid"),
      VectorFunctions.l2Normalize(col(vecCol)).as("_nv")
    )
    cands
      .join(v.select(col("_vid").as("_ida"), col("_nv").as("_va")), col("id_a") === col("_ida"))
      .join(v.select(col("_vid").as("_idb"), col("_nv").as("_vb")), col("id_b") === col("_idb"))
      .withColumn("cos", VectorFunctions.dot(col("_va"), col("_vb")))
      .filter(col("cos") > threshold)
      // the verification measure rides along (same contract as the
      // minhash jaccard / simhash hamming columns) so output-side
      // audits can recompute and compare it
      .select(col("id_a"), col("id_b"), col("cos").as("cosine"))
  }

  /** (_id, _tbl, _sig, _lower) hyperplane-table blocking rows. Each row
    * carries the table signatures BELOW its own table for
    * lowest-matching-table pair emission (see Dedup.minHashCandidates):
    * a pair colliding in several tables is emitted only from the lowest
    * one, so no distinct() over the candidate set is needed.
    */
  private def lshBanded(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      nPlanes: Int,
      dim: Int,
      seed: Long,
      nTables: Int
  ): DataFrame = {
    val spread = df
      .select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    val sigs = array((0 until nTables).map { t =>
      hyperplaneSignature(col("_v"), nPlanes, dim, seed + 1000L * t)
    }: _*)
    spread
      .select(col("_id"), sigs.as("_sigs"))
      .select(
        col("_id"),
        col("_sigs"),
        posexplode(col("_sigs")).as(Seq("_tbl", "_sig"))
      )
      .select(
        col("_id"),
        col("_tbl"),
        col("_sig"),
        slice(col("_sigs"), lit(1), col("_tbl")).as("_lower")
      )
  }

  /** True iff NO table below the bucket's own table matches between the
    * two sides' carried `_lower` signature arrays. */
  private def noLowerTableMatches(
      nTables: Int,
      left: String,
      right: String
  ): Column =
    (0 until nTables - 1)
      .map { t =>
        col(s"$left._tbl") <= lit(t) ||
          col(s"$left._lower")(t) =!= col(s"$right._lower")(t)
      }
      .reduceOption(_ && _)
      .getOrElse(lit(true))

  /** Capped-bucket membership + exactly-once self-join: the candidate
    * half of [[lshNearDups]], shared with the within-delta leg of
    * [[lshNearDupsIncremental]]. Returns (id_a, id_b); the returned plan
    * reads a localCheckpoint (release via the final result).
    */
  private def lshCandidatesFromBanded(
      banded: DataFrame,
      nTables: Int,
      maxBucket: Int
  ): DataFrame = {
    val members = Dedup.cappedMultiMembers(
      banded.select(col("_tbl"), col("_sig"), col("_id"), col("_lower")),
      maxBucket, Seq("_tbl", "_sig"))
      .localCheckpoint(true)
    members
      .as("a")
      .join(
        members.as("b"),
        col("a._tbl") === col("b._tbl") &&
          col("a._sig") === col("b._sig") &&
          col("a._id") < col("b._id") &&
          noLowerTableMatches(nTables, "a", "b")
      )
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"))
  }

  /** Audit view for [[lshNearDups]]' bucket cap — the vector twin of
    * [[graft.operators.Dedup.hotMinHashBuckets]] /
    * [[graft.operators.Dedup.hotSimHashBuckets]]: every (table,
    * signature) block larger than `maxBucket`, with its size. Run at
    * index-build time and size the cap (or re-plane with
    * [[suggestLshParams]]) so it never triggers — a bound bucket cap
    * silently drops pairs.
    */
  def hotLshBuckets(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      nPlanes: Int = 8,
      dim: Int = 64,
      seed: Long = 42L,
      nTables: Int = 4,
      maxBucket: Int = 10000
  ): DataFrame =
    lshBanded(df, vecCol, idCol, nPlanes, dim, seed, nTables)
      .groupBy(col("_tbl"), col("_sig"))
      .agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > maxBucket)
      .select(col("_tbl").as("table"), col("_sig").as("signature"), col("bucket_size"))

  // ------------------------------------ incremental hyperplane-LSH index

  /** Handle for a persisted vector-LSH dedup index — the third member of
    * the incremental-index family ([[graft.operators.Dedup.MinHashIndex]],
    * [[graft.operators.Dedup.SimHashIndex]]):
    *  - `bandTable`: (_id, _tbl, _sig, _lower) hyperplane-table
    *    membership, bucketed by (_tbl, _sig) — the delta-vs-corpus
    *    candidate join reads it with NO corpus-side Exchange.
    *  - `vecTable`: (_vid, _nv) L2-normalized vectors, bucketed by _vid —
    *    cosine verification looks corpus vectors up without recompute.
    * The hyperplane parameters travel with the handle: probing with a
    * different seed/shape would hash into a disjoint signature space.
    */
  case class LshIndex(
      bandTable: String,
      vecTable: String,
      nPlanes: Int,
      dim: Int,
      seed: Long,
      nTables: Int,
      buckets: Int,
      maxBucket: Int = 10000
  )

  /** Build and persist an LSH index for `df` under catalog tables
    * `<name>_bands` / `<name>_vecs`. Band buckets are capped at the
    * `maxBucket` lowest ids AT WRITE TIME (round-10 contract, same as
    * every other pair-emitting family); the vector table stays COMPLETE
    * — a doc capped out of one table may be in-cap in another and must
    * verify.
    */
  def writeLshIndex(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      name: String,
      nPlanes: Int = 8,
      dim: Int = 64,
      seed: Long = 42L,
      nTables: Int = 4,
      buckets: Int = 32,
      maxBucket: Int = 10000
  ): LshIndex = {
    require(maxBucket > 1, "maxBucket must allow at least one pair")
    val idx = LshIndex(
      s"${name}_bands", s"${name}_vecs", nPlanes, dim, seed, nTables,
      buckets, maxBucket)
    writeLshIndexTables(df, vecCol, idCol, idx, org.apache.spark.sql.SaveMode.Overwrite)
    idx
  }

  /** Fold a delta into an existing LSH index (after its pairs were
    * emitted via [[lshNearDupsIncremental]]). Band rows are admitted
    * into each bucket's remaining slots (the capped-write contract);
    * vector rows append in full.
    */
  def appendToLshIndex(
      delta: DataFrame,
      vecCol: String,
      idCol: String,
      idx: LshIndex
  ): Unit = {
    val admitted = Dedup.admittedAgainstIndexKeyed(
      lshBanded(delta, vecCol, idCol, idx.nPlanes, idx.dim, idx.seed, idx.nTables),
      idx.bandTable,
      idx.maxBucket,
      Seq("_tbl", "_sig")
    ).localCheckpoint(true)
    Dedup.writeBucketedTable(
      admitted, idx.bandTable, idx.buckets, Seq("_tbl", "_sig"),
      org.apache.spark.sql.SaveMode.Append)
    graft.CacheUtil.release(admitted)
    Dedup.writeBucketedTable(
      delta.select(
        col(idCol).as("_vid"),
        VectorFunctions.l2Normalize(col(vecCol)).as("_nv")
      ),
      idx.vecTable,
      idx.buckets,
      Seq("_vid"),
      org.apache.spark.sql.SaveMode.Append
    )
  }

  /** Compact an LSH index after many appends: band-membership and
    * normalized-vector rows are unique per doc under the disjoint-delta
    * append contract — the band table re-applies the bucket cap (healing
    * legacy uncapped tables), the vector table is a pure small-file
    * merge via [[Dedup.compactBucketedIndexTable]]'s crash-safe swap.
    */
  def compactLshIndex(
      spark: org.apache.spark.sql.SparkSession,
      idx: LshIndex
  ): Unit = {
    Dedup.compactBucketedIndexTable(
      spark, idx.bandTable, idx.buckets, Seq("_tbl", "_sig"),
      Dedup.capBucketMembership(_, idx.maxBucket, Seq("_tbl", "_sig"), Seq("_lower")))
    Dedup.compactBucketedIndexTable(spark, idx.vecTable, idx.buckets, Seq("_vid"))
  }

  private def writeLshIndexTables(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      idx: LshIndex,
      mode: org.apache.spark.sql.SaveMode
  ): Unit = {
    Dedup.writeBucketedTable(
      Dedup.capBucketMembership(
        lshBanded(df, vecCol, idCol, idx.nPlanes, idx.dim, idx.seed, idx.nTables),
        idx.maxBucket,
        Seq("_tbl", "_sig"),
        Seq("_lower")),
      idx.bandTable,
      idx.buckets,
      Seq("_tbl", "_sig"),
      mode
    )
    Dedup.writeBucketedTable(
      df.select(
        col(idCol).as("_vid"),
        VectorFunctions.l2Normalize(col(vecCol)).as("_nv")
      ),
      idx.vecTable,
      idx.buckets,
      Seq("_vid"),
      mode
    )
  }

  /** Incremental vector near-dups: every pair above `threshold` cosine
    * with at least one member in `delta` = (delta × corpus) via the
    * bucketed band table ∪ (delta × delta) via the batch self-join —
    * union the per-delta outputs with the corpus's own batch pairs for
    * the full set. Scale shape mirrors the minhash/simhash twins: the
    * delta is banded ONCE and reused by both legs, the corpus side is a
    * bucketed scan feeding the (_tbl, _sig) equi-join with zero
    * Exchange, exactly-once emission uses the carried lower-table
    * signatures across the delta/corpus pair, and verification joins
    * corpus vectors from the index's bucketed vector table (delta
    * vectors are computed once and checkpointed).
    *
    * Bucket-cap contract (round-10, same as every pair-emitting family):
    * the band table is pre-capped at write/append/compact time and the
    * delta side is admitted per bucket into the remaining slots, so
    * incremental == capped-batch holds even on buckets OVER
    * `idx.maxBucket`, under the monotone-id daily-crawl contract.
    *
    * Result is materialized (localCheckpoint) and delta-side blocks are
    * released before returning.
    */
  def lshNearDupsIncremental(
      delta: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double,
      idx: LshIndex
  ): DataFrame = {
    val lazyPairs =
      lshPairsIncrementalLazy(delta, vecCol, idCol, threshold, idx)
    val out = lazyPairs.localCheckpoint(true)
    graft.CacheUtil.release(lazyPairs)
    out
  }

  /** The un-materialized plan behind [[lshNearDupsIncremental]], exposed
    * for plan-shape tests; callers must [[graft.CacheUtil.release]] it.
    */
  private[graft] def lshPairsIncrementalLazy(
      delta: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double,
      idx: LshIndex
  ): DataFrame = {
    val banded = lshAdmittedBands(delta, vecCol, idCol, idx)
    val deltaV = lshNormalizedDelta(delta, vecCol, idCol)
    lshPairsFromAdmitted(banded, deltaV, threshold, idx)
  }

  /** Probe-then-append in ONE delta pass — the vector twin of
    * [[graft.operators.Dedup.minHashNearDupsIncrementalFold]]: emit
    * near-dup pairs against the index as it stood, then fold the delta
    * in. Gated identical to [[lshNearDupsIncremental]] followed by
    * [[appendToLshIndex]], but the hyperplane banding, the admission
    * scan over the corpus index, and the vector normalization each run
    * ONCE instead of twice.
    */
  def lshNearDupsIncrementalFold(
      delta: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double,
      idx: LshIndex,
      sink: Option[DataFrame => Unit] = None
  ): DataFrame = {
    val spark = delta.sparkSession
    // REPLAY SAFETY ([[graft.operators.ReplaySafe]]): the vector table
    // records EVERY folded doc — it is the emission ledger; the band
    // table's own id set gates its append separately (same two-table
    // healing contract as the minhash fold)
    val rids = ReplaySafe.ids(delta, idCol)
    val seenVec = ReplaySafe.seenIds(spark.table(idx.vecTable), "_vid", rids)
    val seenBand = ReplaySafe.seenIds(spark.table(idx.bandTable), "_id", rids)
    val unseen = ReplaySafe.unseenIds(rids, seenVec)
    val banded = lshAdmittedBands(delta, vecCol, idCol, idx, Some(rids))
    val deltaV = lshNormalizedDelta(delta, vecCol, idCol)
    val lazyPairs = ReplaySafe.keepPairsTouchingUnseen(
      lshPairsFromAdmitted(banded, deltaV, threshold, idx, Some(rids)),
      "id_a", "id_b", unseen)
    // materializes the pair set BEFORE the appends mutate the tables
    val out = lazyPairs.localCheckpoint(true)
    sink.foreach(_(out)) // persist before the ledger appends ([[IdempotentSink]])
    // band append heals at ROW granularity — (_id, _tbl) — a torn job
    // commit can land WITHIN one id ([[Dedup.appendRowHealed]])
    Dedup.appendRowHealed(
      banded, idx.bandTable, idx.buckets, Seq("_tbl", "_sig"),
      Seq("_id", "_tbl"), "_id", rids, seenBand)
    Dedup.writeBucketedTable(
      ReplaySafe.dropSeen(deltaV, "_vid", seenVec),
      idx.vecTable, idx.buckets, Seq("_vid"),
      org.apache.spark.sql.SaveMode.Append)
    graft.CacheUtil.release(lazyPairs) // frees banded + deltaV in its lineage
    graft.CacheUtil.release(seenVec)
    graft.CacheUtil.release(seenBand)
    graft.CacheUtil.release(unseen)
    graft.CacheUtil.release(rids)
    out
  }

  private def lshAdmittedBands(
      delta: DataFrame,
      vecCol: String,
      idCol: String,
      idx: LshIndex,
      excludeIds: Option[DataFrame] = None
  ): DataFrame = {
    val bandedRaw =
      lshBanded(delta, vecCol, idCol, idx.nPlanes, idx.dim, idx.seed, idx.nTables)
        .localCheckpoint(true)
    val banded = Dedup.admittedAgainstIndexKeyed(
      bandedRaw, idx.bandTable, idx.maxBucket, Seq("_tbl", "_sig"), excludeIds)
      .localCheckpoint(true)
    graft.CacheUtil.release(bandedRaw)
    banded
  }

  private def lshNormalizedDelta(
      delta: DataFrame,
      vecCol: String,
      idCol: String
  ): DataFrame =
    delta
      .select(col(idCol).as("_vid"), VectorFunctions.l2Normalize(col(vecCol)).as("_nv"))
      .localCheckpoint(true)

  private def lshPairsFromAdmitted(
      banded: DataFrame,
      deltaV: DataFrame,
      threshold: Double,
      idx: LshIndex,
      excludeIds: Option[DataFrame] = None
  ): DataFrame = {
    val spark = banded.sparkSession
    val within = lshCandidatesFromBanded(banded, idx.nTables, idx.maxBucket)
    val corpus = excludeIds.fold(spark.table(idx.bandTable))(
      ReplaySafe.excludeIds(spark.table(idx.bandTable), "_id", _))
    val cross = banded
      .as("d")
      .join(
        corpus.as("c"),
        col("d._tbl") === col("c._tbl") &&
          col("d._sig") === col("c._sig") &&
          col("d._id") =!= col("c._id") &&
          noLowerTableMatches(idx.nTables, "d", "c")
      )
      .select(
        least(col("d._id"), col("c._id")).as("id_a"),
        greatest(col("d._id"), col("c._id")).as("id_b")
      )
    val cands = cross.unionByName(within)
    val corpusV = excludeIds.fold(spark.table(idx.vecTable))(
      ReplaySafe.excludeIds(spark.table(idx.vecTable), "_vid", _))
    val withA = cands
      .join(corpusV.as("ca"), col("id_a") === col("ca._vid"), "left")
      .join(deltaV.as("da"), col("id_a") === col("da._vid"), "left")
      .select(
        col("id_a"),
        col("id_b"),
        coalesce(col("ca._nv"), col("da._nv")).as("_va")
      )
    withA
      .join(corpusV.as("cb"), col("id_b") === col("cb._vid"), "left")
      .join(deltaV.as("db"), col("id_b") === col("db._vid"), "left")
      .withColumn("cos", VectorFunctions.dot(col("_va"), coalesce(col("cb._nv"), col("db._nv"))))
      .filter(col("cos") > threshold)
      // cosine emitted for the same reason the batch emitter shows it
      // (round-9): the structural audit recomputes it through an
      // independent join and checks it bit-for-bit — the same IEEE dot
      // over the same stored-normalized floats in the same (a, b) order
      .select(col("id_a"), col("id_b"), col("cos").as("cosine"))
  }
}
