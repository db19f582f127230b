package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the canonical operator Spark's
  * built-in join types lack. Composed from existing operators (preference
  * (a) of the custom-operator ladder): tag both sides, union, one window
  * pass carrying the latest right row forward, keep left rows.
  *
  * Scale shape: ONE shuffle on the key + a within-partition sort — the
  * same cost as a sort-merge join; no range-explosion, no cross product.
  * Skewed keys get AQE's skew handling like any other sort.
  */
object AsofJoin {

  /** For each left row, attach the right row with the greatest
    * `rightTs <= leftTs` for the same `key` (left rows with no prior
    * right row get nulls — an as-of LEFT join).
    *
    * @param rightCols right-side columns to carry (renamed as given)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Map[String, String]
  ): DataFrame = {
    val leftKeep = left.columns.toSeq
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_carry", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightCols.keys.toSeq.map(c =>
            org.apache.spark.sql.types.StructField(c, right.schema(c).dataType))
        )
      ))
    val r = right
      .select(
        (col(key) +: Seq(
          col(rightTs).as("_ts"),
          lit(0).as("_side"),
          struct(rightCols.keys.toSeq.map(col): _*).as("_carry")
        )) ++ leftKeep.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)
        ): _*
      )
    val unioned = l.select(
      (col(key) +: col("_ts") +: col("_side") +: col("_carry") +:
        leftKeep.filterNot(_ == key).map(col)): _*
    ).unionByName(r)
    // right rows sort before left rows at equal ts → inclusive match
    val w = Window
      .partitionBy(col(key))
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_match", last(col("_carry"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    carried.select(
      leftKeep.map(col) ++
        rightCols.map { case (src, dst) => col(s"_match.$src").as(dst) }: _*
    )
  }
}
