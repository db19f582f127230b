package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over the `events` fixture. Batch implementations
  * here (oracle-checkable); [[Streams]] runs the same shapes as Structured
  * Streaming with watermarks. Beyond the reference surface (SURVEY.md §2
  * "What the reference does NOT have") — north-star extension.
  */
object EventOps {

  /** Tumbling-window aggregate via `date_trunc` — hour granularity. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_trunc("hour", col("ts")).as("w_start"),
        col("event_type")
      )
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total_value")
      )

  /** Tumbling-window aggregate via Spark's `window()` — arbitrary width.
    * Window boundaries are epoch-aligned (multiples of `width` from
    * 1970-01-01 UTC), matching DuckDB's `time_bucket`.
    */
  def tumblingAgg(events: DataFrame, width: String = "5 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("window.start").as("w_start"),
        col("event_type"),
        col("n")
      )

  /** Gap-based sessionization: a new session starts after `gapSec` of
    * user inactivity. Single shuffle on user_id; the window sort is
    * within-partition. At 100 TB the same shape holds — sessions are
    * bounded per user; skewed users would get AQE skew handling.
    */
  def sessionize(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapUs = gapSec * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn(
        "new_sess",
        when(
          col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > gapUs,
          1
        ).otherwise(0)
      )
      .withColumn(
        "sess_id",
        sum(col("new_sess"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
  }

  /** Sessions-per-user summary on top of [[sessionize]]. */
  def sessionStats(events: DataFrame, gapSec: Long = 1800): DataFrame =
    sessionize(events, gapSec)
      .groupBy(col("user_id"))
      .agg(
        max(col("sess_id")).as("n_sessions"),
        count(lit(1)).as("n_events")
      )
}
