package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-memory approximate analytics for 100 TB interactive use:
  * distinct counts and quantiles whose aggregation state is a
  * fixed-size, MERGEABLE sketch instead of the exact forms' per-value
  * state. The exact counterparts stay the correctness oracles (q07
  * exact uniqueN, q34 exact quantiles); these are the forms a pipeline
  * runs when the answer feeds a dashboard or a join-size decision, not
  * an invoice.
  *
  * Why this matters at scale: exact `count(DISTINCT x)` shuffles every
  * distinct tuple (q07's cost IS that shuffle), and its state cannot be
  * pre-aggregated across days. An HLL register array is a few KB
  * regardless of cardinality, merges associatively, and can be
  * PERSISTED per partition-of-data (per day, per source) — the
  * analytics twin of the persisted dedup indexes: yesterday's sketches
  * never get recomputed.
  *
  * North-star extension beyond the reference surface (SURVEY.md §7.2);
  * `uniqueN` itself is reference surface (R/big.data.table.R tests use
  * it) — this family is its scale-path complement.
  */
object Sketches {

  /** Per-group approximate distinct count (HyperLogLog++): one
    * partial→final aggregate over fixed-size registers — no distinct
    * shuffle, no Expand. `rsd` is the target relative standard
    * deviation (default 5%).
    */
  def uniqueNApprox(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      rsd: Double = 0.05
  ): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_n"))

  /** Build a persistable DataSketches HLL sketch of `valueCol` per key
    * (e.g. per day / per source). The returned `sketch` column is
    * binary: write it to parquet once per increment and merge later
    * with [[mergeSketches]] — no re-scan of historical raw data, ever.
    * `lgK` trades size for accuracy (2^lgK registers; 12 ≈ ±1.6%).
    */
  def distinctSketch(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      lgK: Int = 12
  ): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Merge per-increment sketches down to `byCols` and estimate the
    * distinct count. HLL union is register-wise max, so merging daily
    * sketches yields EXACTLY the estimate the whole corpus would give
    * at the same lgK — incremental and batch answers agree bit-for-bit.
    */
  def mergeSketches(
      df: DataFrame,
      byCols: Seq[String],
      sketchCol: String = "sketch"
  ): DataFrame =
    df.groupBy(byCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol))).as("approx_n"))

  /** Approximate quantiles (mergeable percentile digest). `accuracy` is
    * the inverse relative error knob of Spark's `percentile_approx`
    * (10000 ≈ 0.01%); state is bounded, unlike q34's exact percentiles
    * which buffer per-group values.
    */
  def approxQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      probabilities: Seq[Double],
      accuracy: Int = 10000
  ): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        percentile_approx(
          col(valueCol),
          array(probabilities.map(lit(_)): _*),
          lit(accuracy)
        ).as("approx_quantiles")
      )
}
