package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Relational helper operators re-expressing the reference's combinator
  * surface (SURVEY.md §2.A/§2.B) as plan-level DataFrame transforms.
  */
object Ops {

  /** Type-dynamic id handling, shared by every entry point that
    * buckets or strides on an id column (the reference surface infers
    * types, never casts — `/root/reference/R/big.data.table.R:348-355`):
    * numeric ids keep their exact historical key; any other type maps
    * through xxhash64 so Spark 4's ANSI numeric casts never fire.
    */
  private[operators] def isNumericId(df: DataFrame, idCol: String): Boolean =
    df.schema(idCol).dataType.isInstanceOf[NumericType]

  /** The id-derived bucket/stride key per the rule above. */
  private[operators] def idBucketKey(df: DataFrame, idCol: String): Column =
    if (isNumericId(df, idCol)) col(idCol) else xxhash64(col(idCol))

  /** A deterministic `want`-row sample for NON-numeric ids: ordered by
    * the id's hash (id itself tiebreaks a collision), so exactly
    * min(want, n) rows come back. The numeric stride-filter shape can
    * UNDER-select here — hash residues are ~Binomial(n, 1/stride), so
    * a filter-then-limit would return fewer than `want` rows on
    * roughly half of real id sets (and possibly zero).
    */
  private[operators] def hashOrderedSample(
      df: DataFrame,
      idCol: String,
      want: Int
  ): DataFrame =
    df.orderBy(xxhash64(col(idCol)), col(idCol)).limit(want)

  /** `lapply(.SD, f)` ≈ aggregate every (numeric) column by group
    * (reference README.md:221-224, tests/tests-06-readme.R:244-253).
    * Single shuffle; all partial aggregates computed map-side.
    */
  def aggAllNumeric(
      df: DataFrame,
      by: Seq[String],
      f: Column => Column = sum,
      roundTo: Int = -1
  ): DataFrame = {
    val numCols = df.schema.fields
      .filter(fld => fld.dataType.isInstanceOf[NumericType] && !by.contains(fld.name))
      .map(_.name)
    val aggs = numCols.map { c =>
      // cast to double pre-agg so the result type matches the oracle's
      // round() (DuckDB round → DOUBLE) regardless of the input type
      val a = if (roundTo >= 0) round(f(col(c).cast("double")), roundTo) else f(col(c))
      a.as(c)
    }
    df.groupBy(by.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** `rbindlapply` / rbindlist with idcol ≈ union-by-name with an id tag
    * (reference R/big.data.table.R:341-343; B19). `allowMissing` maps to
    * data.table's `fill=TRUE`.
    */
  def unionWithId(
      dfs: Seq[(String, DataFrame)],
      idCol: String = "id",
      allowMissing: Boolean = false
  ): DataFrame =
    dfs
      .map { case (id, d) => d.withColumn(idCol, lit(id)) }
      .reduce((a, b) => a.unionByName(b, allowMissingColumns = allowMissing))

  /** Ordered top-k ≈ head/tail of a keyed table (B18). Spark turns this
    * into TakeOrderedAndProject — no full sort, no full shuffle.
    */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Skew-resistant two-phase aggregation: salt the key, partial-agg on
    * (key, salt), final-agg on key. For heavy-hitter keys whose single
    * reducer would bottleneck (or spill) at scale, the salt spreads the
    * partial aggregation over `saltBuckets` reducers. Results are
    * identical to the direct groupBy for any decomposable aggregate —
    * the caller provides the partial and final forms.
    */
  def saltedAgg(
      df: DataFrame,
      key: Seq[String],
      saltBuckets: Int
  )(partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    // the salt must be DETERMINISTIC per row content: under task retry /
    // stage recomputation a re-executed map task must land each row in
    // the same bucket, or the two-phase aggregate double-counts/drops
    // (partition-id or monotonically_increasing_id salts break exactly
    // when the skew path matters — shuffle-fetch failure at scale)
    val salted = df.withColumn(
      "_salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(saltBuckets.toLong))
    )
    val phase1 = salted
      .groupBy((key.map(col) :+ col("_salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(key.map(col): _*)
      .agg(finalAgg.head, finalAgg.tail: _*)
  }

  /** Deterministic per-partition generation helper (B24): mixes a seed
    * with the partition id so each shard draws an independent,
    * reproducible stream — the reference's `set.seed` per node
    * (tests/tests-04-sub-.big.data.table.R:11-14).
    */
  def seededRand(seed: Long): Column = {
    // splitmix64-style mix of (seed, partition id, row id) — pure Column
    // arithmetic, codegen-friendly, no UDF.
    val x = (spark_partition_id().cast("long") * lit(0x9E3779B97F4A7C15L)) +
      (monotonically_increasing_id() * lit(0xBF58476D1CE4E5B9L)) + lit(seed)
    abs(xxhash64(x)) / lit(Long.MaxValue).cast("double")
  }
}
