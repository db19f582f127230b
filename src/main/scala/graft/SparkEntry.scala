package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — queries + DuckDB oracles for every implemented
  * operator (SURVEY.md §2). Each Q below keeps the Spark implementation and
  * its oracle SQL adjacent; column names/types are aligned on both sides
  * (the driver's compare sorts columns by name and hashes values).
  *
  * Float policy: any aggregate producing a double is `round(..., 2)` (or 4
  * for ratios) on BOTH sides so ulp-level summation-order differences
  * between Spark and DuckDB cannot flip the hash. Passthrough doubles are
  * bit-identical from parquet and left untouched.
  */
object SparkEntry {

  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String]
  )

  import Tables._

  // ------------------------------------------------------------------
  // Reference-parity surface (SURVEY.md §2.B) on the TPC-H-ish fixtures
  // ------------------------------------------------------------------

  private val registry: Seq[Q] = Seq(
    // B1 full-table aggregate (reference tests-06-readme.R:136-143):
    // global partial→final agg, Spark-native (OuterAgg.Auto).
    Q(
      "q01_global_agg",
      (s, d) =>
        BigDataTable
          .fromDF(lineitem(s, d), "lineitem_q01")
          .query(j = Seq(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_price"),
            count(lit(1)).as("n")
          )),
      Some("""SELECT round(sum(l_quantity), 2) AS sum_qty,
             |       round(sum(l_extendedprice), 2) AS sum_price,
             |       CAST(count(*) AS BIGINT) AS n
             |FROM lineitem""".stripMargin)
    ),
    // B2 grouped aggregate, single key (reference README.md:171)
    Q(
      "q02_group_year",
      (s, d) =>
        BigDataTable
          .fromDF(lineitem(s, d), "lineitem_q02")
          .query(
            j = Seq(round(sum(col("l_extendedprice")), 2).as("revenue")),
            by = Seq(year(col("l_shipdate")).as("l_year"))
          ),
      Some("""SELECT CAST(year(l_shipdate) AS INT) AS l_year,
             |       round(sum(l_extendedprice), 2) AS revenue
             |FROM lineitem GROUP BY 1""".stripMargin)
    ),
    // B3 grouped aggregate, composite key (reference README.md:172-173)
    Q(
      "q03_group_multi",
      (s, d) =>
        BigDataTable
          .fromDF(lineitem(s, d), "lineitem_q03")
          .query(
            j = Seq(
              round(sum(col("l_quantity")), 2).as("sum_qty"),
              round(sum(col("l_extendedprice")), 2).as("sum_price"),
              round(avg(col("l_discount")), 4).as("avg_disc"),
              count(lit(1)).as("n")
            ),
            by = Seq(col("l_returnflag"), col("l_linestatus"))
          ),
      Some("""SELECT l_returnflag, l_linestatus,
             |       round(sum(l_quantity), 2) AS sum_qty,
             |       round(sum(l_extendedprice), 2) AS sum_price,
             |       round(avg(l_discount), 4) AS avg_disc,
             |       CAST(count(*) AS BIGINT) AS n
             |FROM lineitem GROUP BY 1, 2""".stripMargin)
    ),
    // B4 keyby = grouped + sorted result (reference R/big.data.table.R:266)
    Q(
      "q04_keyby",
      (s, d) =>
        BigDataTable
          .fromDF(orders(s, d), "orders_q04")
          .query(
            j = Seq(
              count(lit(1)).as("n"),
              round(sum(col("o_totalprice")), 2).as("total")
            ),
            keyBy = Seq(col("o_orderpriority"))
          ),
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             |       round(sum(o_totalprice), 2) AS total
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    // B5 row count per group `.N` (reference README.md:176-178) — Auto
    // mode is the always-correct partial-count + final-sum.
    Q(
      "q05_count_groups",
      (s, d) =>
        BigDataTable
          .fromDF(lineitem(s, d), "lineitem_q05")
          .query(j = Seq(count(lit(1)).as("n")), by = Seq(col("l_returnflag"))),
      Some(
        "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY 1"
      )
    ),
    // B6 aggregate every column `lapply(.SD, sum)` (reference README.md:
    // 221-224) via the AggAll helper.
    Q(
      "q06_agg_all_numeric",
      (s, d) =>
        operators.Ops.aggAllNumeric(
          lineitem(s, d),
          by = Seq("l_returnflag"),
          roundTo = 2
        ),
      Some("""SELECT l_returnflag,
             |       round(sum(l_orderkey), 2) AS l_orderkey,
             |       round(sum(l_partkey), 2) AS l_partkey,
             |       round(sum(l_suppkey), 2) AS l_suppkey,
             |       round(sum(l_linenumber), 2) AS l_linenumber,
             |       round(sum(l_quantity), 2) AS l_quantity,
             |       round(sum(l_extendedprice), 2) AS l_extendedprice,
             |       round(sum(l_discount), 2) AS l_discount,
             |       round(sum(l_tax), 2) AS l_tax
             |FROM lineitem GROUP BY 1""".stripMargin)
    ),
    // B7 uniqueN / countDistinct (reference R/big.data.table.R:45)
    Q(
      "q07_uniqueN",
      (s, d) =>
        lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            countDistinct(col("l_orderkey")).as("n_orders")
          ),
      Some("""SELECT l_returnflag,
             |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
             |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
             |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
             |FROM lineitem GROUP BY 1""".stripMargin)
    ),
    // B8 distinct / dedup by columns (reference R/as.big.data.table.R:86)
    Q(
      "q08_distinct",
      (s, d) =>
        lineitem(s, d).select("l_returnflag", "l_linestatus").distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")
    ),
    // B9 filter / subset in `i` (reference R/big.data.table.R:266)
    Q(
      "q09_filter",
      (s, d) =>
        BigDataTable
          .fromDF(lineitem(s, d), "lineitem_q09")
          .filter(
            col("l_quantity") > 30 && col("l_discount").between(0.02, 0.08)
          )
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
          .toLocalDF(),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount
             |FROM lineitem
             |WHERE l_quantity > 30 AND l_discount BETWEEN 0.02 AND 0.08""".stripMargin)
    ),
    // B10 equi-join (reference README.md:226-227) — dim side broadcast.
    Q(
      "q10_join_agg",
      (s, d) =>
        orders(s, d)
          .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("total")
          ),
      Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
             |       round(sum(o_totalprice), 2) AS total
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1""".stripMargin)
    ),
    // B13 projection (reference tests/tests-04:29)
    Q(
      "q13_projection",
      (s, d) =>
        BigDataTable
          .fromDF(part(s, d), "part_q13")
          .select("p_partkey", "p_brand", "p_retailprice")
          .toLocalDF(),
      Some("SELECT p_partkey, p_brand, p_retailprice FROM part")
    )
  )

  def queryDefs: Seq[Q] = registry

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
