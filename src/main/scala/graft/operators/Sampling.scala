package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines:
  * train/holdout splits, per-stratum subsampling (data mixing), and
  * weight > 1 upsampling — all keyed on a content hash of the row id, so
  * results are reproducible across runs, engines, partitionings, and
  * cluster sizes with NO seed state and no shuffle (every decision is a
  * per-row codegen'd predicate on the scan).
  *
  * Contrast with `df.sample()` / `df.stat.sampleBy()`: Spark's samplers
  * are seeded per-partition, so the selected set changes with the
  * partitioning — a repartitioned 100 TB corpus yields a different
  * sample. Hash sampling is stable under any layout, and samples are
  * NESTED by construction (the 10 % sample is a subset of the 20 %
  * sample with the same salt), which makes scaling-law subset curves
  * consistent. Use a different `salt` per independent decision (e.g.
  * the holdout split vs a downsampling pass) to decorrelate them.
  *
  * North-star extension beyond the reference surface (SURVEY.md §7.2);
  * the md5-prefix formulation is chosen over xxhash64 because every
  * engine (Spark, DuckDB, Trino, …) produces the identical lowercase
  * hex digest, making the sample membership itself portable.
  */
object Sampling {

  /** Fraction of the 32-bit hash space as a zero-padded 8-hex-char
    * threshold; lexicographic compare on fixed-width lowercase hex is
    * numeric compare. Granularity 1/2^32.
    */
  private def fracThreshold(frac: Double): String =
    f"${(frac * 4294967296L).toLong}%08x"

  /** Deterministic inclusion predicate: true for ~`frac` of ids. The
    * hash input is `id` cast to string (portable), plus `salt` so
    * independent sampling decisions don't reuse the same hash bits.
    * NULL ids evaluate to `false` — not NULL — so filter(p) /
    * filter(!p) splits stay exhaustive (a NULL predicate would drop
    * the row from BOTH sides).
    */
  def hashSample(id: Column, frac: Double, salt: String = ""): Column =
    if (frac >= 1.0) lit(true)
    else if (frac <= 0.0) lit(false)
    else
      coalesce(
        substring(md5(concat(id.cast("string"), lit(salt))), 1, 8) <
          lit(fracThreshold(frac)),
        lit(false)
      )

  /** (train, holdout) split at `trainFrac` — complementary by the same
    * predicate, so every row lands in exactly one side.
    */
  def split(
      df: DataFrame,
      idCol: String,
      trainFrac: Double,
      salt: String = ""
  ): (DataFrame, DataFrame) = {
    val p = hashSample(col(idCol), trainFrac, salt)
    (df.filter(p), df.filter(!p))
  }

  /** Deterministic training-order shuffle: global sort by a salted md5
    * of the id, with the id as tie-break. The same corpus shuffles to
    * the same order on any cluster size or input layout (unlike
    * `orderBy(rand(seed))`, which is per-partition-seeded), and
    * different salts give independent epoch orders. Scale shape: a
    * range-partitioned global sort (sampled boundaries, no single-task
    * stage) — the q36 shape; the added `shuffle_key` column is what
    * downstream consumers resume/verify against.
    *
    * The hash input carries a fixed `"shuffle:"` domain separator so
    * the order is INDEPENDENT of [[hashSample]]-based decisions even at
    * the default salts: without it, rows kept by a sampling pass (md5
    * prefix below the threshold) would sort as exactly the leading
    * prefix of the epoch — a severe training-order skew.
    */
  def shuffleDeterministic(
      df: DataFrame,
      idCol: String,
      salt: String = ""
  ): DataFrame = {
    require(
      !df.columns.contains("shuffle_key"),
      "input already has a shuffle_key column (a prior epoch's order?) — " +
        "drop or rename it first; silently overwriting it would break " +
        "consumers verifying against the stored key"
    )
    df.withColumn(
      "shuffle_key",
      md5(concat(lit("shuffle:"), col(idCol).cast("string"), lit(salt)))
    ).orderBy(col("shuffle_key"), col(idCol))
  }

  /** Deterministic EXACT-k sample: the k rows with the smallest salted
    * hash — a fixed-size eval/debug subset, stable across runs and
    * layouts, nested in the same hash order as [[shuffleDeterministic]]
    * uses (distinct domain though: this is its own `"samplek:"`
    * domain). Scale shape: `orderBy(hash).limit(k)` plans as
    * TakeOrderedAndProject — per-partition heaps of k, no global sort,
    * driver merge of partition heads only. Use [[hashSample]] when a
    * FRACTION (not an exact count) is wanted — it needs no ordering at
    * all.
    */
  def sampleExactK(
      df: DataFrame,
      idCol: String,
      k: Int,
      salt: String = ""
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.withColumn(
      "_sample_key",
      md5(concat(lit("samplek:"), col(idCol).cast("string"), lit(salt)))
    ).orderBy(col("_sample_key"), col(idCol))
      .limit(k)
      .drop("_sample_key")
  }

  /** Deterministic per-group TOKEN budget: keep each group's documents
    * in salted-md5 order until the group's cumulative token count would
    * exceed `maxTokens` — the unit real training mixes are specified in
    * ("1B tokens per source"), where [[capPerGroup]] counts documents.
    * Strict prefix semantics: the first document that would overflow
    * the budget is dropped and (cumulative sums being monotone) so is
    * everything after it; no document is split — splitting is
    * [[Packing.chunkByTokens]]'s job, applied before this if partial
    * documents are acceptable.
    *
    * Scale shape — a distributed prefix sum, NOT one window per group
    * (a hot group would serialize into a single task, and AQE cannot
    * split window partitions): (1) chunk each group's key order into
    * 256 pieces by the FIRST TWO HEX CHARS of the md5 key — a pure
    * function of the key, so both consumers below recompute identical
    * chunk ids with no checkpoint (the round-8 shape range-partitioned
    * and localCheckpointed the FULL corpus, text included, because
    * RangePartitioner samples boundaries per execution — at 100 TB
    * that pins corpus-scale text in block storage). The hex prefix is
    * deterministic, uniform (md5), and MONOTONE in the (key, id) sort
    * order — string order on fixed-width lowercase hex equals numeric
    * order of the prefix — so "sum of earlier chunks" equals "sum of
    * earlier keys" and the algebra below is exact. A
    * `pmod(xxhash64(key), n)` bucket would be deterministic too but
    * NOT order-contiguous, which silently breaks the prefix sum.
    * (2) per-(group, chunk) token sums — a tiny aggregate (groups ×
    * 256 rows) — turned into per-chunk group offsets by a window over
    * that aggregate; (3) within-chunk running sums in parallel windows
    * (a hot group splits 256 ways), plus the broadcast offset, give
    * the exact global prefix sum (single-window parity
    * ScalaTest-gated). Nothing is cached or checkpointed;
    * CacheUtil.release on the result is a harmless no-op kept at call
    * sites for uniformity with the operators that do pin blocks.
    *
    * `rangeParts` is retained for source compatibility with the
    * round-8 range-partitioned shape; the chunk count is now fixed at
    * 256 and the value is ignored (the result was already independent
    * of it by the parity contract).
    */
  def capTokensPerGroup(
      df: DataFrame,
      textCol: String,
      groupCol: String,
      idCol: String,
      maxTokens: Long,
      salt: String = "",
      rangeParts: Int = 0
  ): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat(lit("captok:"), col(idCol).cast("string"), lit(salt)))
    val ranged = df
      .withColumn("_ct_key", key)
      .withColumn(
        "_ct_toks",
        graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long")
      )
      .withColumn(
        "_ct_part",
        conv(substring(col("_ct_key"), 1, 2), 16, 10).cast("int")
      )
    val offsets = ranged
      .groupBy(col(groupCol), col("_ct_part"))
      .agg(sum(col("_ct_toks")).as("_ct_psum"))
      .withColumn(
        "_ct_off",
        coalesce(
          sum(col("_ct_psum")).over(
            Window
              .partitionBy(col(groupCol))
              .orderBy(col("_ct_part"))
              .rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select(col(groupCol).as("_ct_g"), col("_ct_part").as("_ct_p"), col("_ct_off"))
    ranged
      .withColumn(
        "_ct_run",
        sum(col("_ct_toks")).over(
          Window
            .partitionBy(col(groupCol), col("_ct_part"))
            .orderBy(col("_ct_key"), col(idCol))
        )
      )
      // null-SAFE group match: a plain equi-join would silently drop
      // every NULL-group row (the window semantics, and capPerGroup,
      // keep the NULL group as a group like any other)
      .join(
        broadcast(offsets),
        col(groupCol) <=> col("_ct_g") && col("_ct_part") === col("_ct_p")
      )
      .filter(col("_ct_off") + col("_ct_run") <= maxTokens)
      .drop("_ct_key", "_ct_toks", "_ct_part", "_ct_run", "_ct_off", "_ct_g", "_ct_p")
  }

  /** Deterministic per-group cap: keep at most `maxN` rows per group —
    * the C4/RefinedWeb "no more than N documents per host/domain" rule —
    * chosen by salted-md5 order (its own `"cap:"` domain, id tiebreak),
    * so the survivors are a stable pseudo-random subset, independent of
    * layout and of every other hash-based decision.
    *
    * Scale shape: grouped top-k WITHOUT a group-partitioned window — a
    * hot group (one domain holding 10⁸ of the corpus's docs) would
    * serialize into a single task, and AQE cannot split window
    * partitions. Phase 1 ranks within (group, id-hash subbucket) —
    * every partition bounded by the group's share / `subBuckets` — and
    * keeps `maxN` per subbucket; phase 2 ranks the ≤ maxN·subBuckets
    * survivors per group. The global top-maxN of a group is contained
    * in the union of its per-subbucket top-maxNs, so the result is
    * EXACTLY the single-window answer (ScalaTest-gated), at two bounded
    * shuffles.
    */
  def capPerGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      maxN: Int,
      salt: String = "",
      subBuckets: Int = 32
  ): DataFrame = {
    require(maxN > 0, s"maxN must be positive, got $maxN")
    require(subBuckets > 0, s"subBuckets must be positive, got $subBuckets")
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat(lit("cap:"), col(idCol).cast("string"), lit(salt)))
    val phase1 = df
      .withColumn("_cap_key", key)
      .withColumn("_cap_sb", pmod(xxhash64(col(idCol).cast("string")), lit(subBuckets)))
      .withColumn(
        "_cap_rn",
        row_number().over(
          Window
            .partitionBy(col(groupCol), col("_cap_sb"))
            .orderBy(col("_cap_key"), col(idCol))
        )
      )
      .filter(col("_cap_rn") <= maxN)
    phase1
      .withColumn(
        "_cap_rn2",
        row_number().over(
          Window.partitionBy(col(groupCol)).orderBy(col("_cap_key"), col(idCol))
        )
      )
      .filter(col("_cap_rn2") <= maxN)
      .drop("_cap_key", "_cap_sb", "_cap_rn", "_cap_rn2")
  }

  /** Per-stratum deterministic subsampling — the data-mixing primitive:
    * keep `fracs(stratum)` of each stratum (languages, sources, quality
    * buckets), `default` of unlisted strata. One scan, no shuffle, no
    * seed; proportions are binomial in expectation, not exact-count (an
    * exact-count sampler needs a per-stratum sort — wrong trade at
    * 100 TB).
    */
  def sampleByStratum(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      fracs: Map[String, Double],
      default: Double = 0.0,
      salt: String = ""
  ): DataFrame = {
    // NULL strata take the default fraction (isInCollection is NULL for
    // NULL input, and a NULL predicate would silently drop the row)
    val unlisted =
      col(stratumCol).isNull || !col(stratumCol).isInCollection(fracs.keys.toSeq)
    val pred = fracs.foldLeft(lit(false)) { case (acc, (k, f)) =>
      acc || (col(stratumCol) === lit(k) && hashSample(col(idCol), f, salt))
    } || (unlisted && hashSample(col(idCol), default, salt))
    df.filter(coalesce(pred, lit(false)))
  }

  /** Weight ≥ 0 mixture upsampling: emit `floor(w)` copies of each row
    * plus one more for a deterministic `frac(w)` subset, so a stratum
    * with weight 2.3 appears 2.3× in expectation — the epoch-mixing
    * primitive for weighted training mixtures. Output adds `_copy`
    * (0-based) so downstream shuffling/interleaving can distinguish
    * copies. Rows of unlisted strata get weight `default`. The explode
    * is a generator on the scan — no shuffle, output is mixture-sized.
    */
  def upsampleByWeight(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      weights: Map[String, Double],
      default: Double = 1.0,
      salt: String = ""
  ): DataFrame = {
    require(weights.values.forall(_ >= 0) && default >= 0, "weights must be ≥ 0")
    val whole = weights.foldLeft(lit(math.floor(default).toInt)) {
      case (acc, (k, w)) =>
        when(col(stratumCol) === lit(k), lit(math.floor(w).toInt)).otherwise(acc)
    }
    val fractional = weights.foldLeft(
      hashSample(col(idCol), default - math.floor(default), salt)
    ) { case (acc, (k, w)) =>
      when(
        col(stratumCol) === lit(k),
        hashSample(col(idCol), w - math.floor(w), salt)
      ).otherwise(acc)
    }
    val copies = whole + fractional.cast("int")
    df.withColumn("_copies", copies)
      .filter(col("_copies") > 0)
      .select(
        col("*"),
        explode(sequence(lit(0), col("_copies") - 1)).as("_copy")
      )
      .drop("_copies")
  }
}
