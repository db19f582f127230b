package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

final case class GenTestRow(year: Int, low: String, value: Double)

/** Mirrors the reference's constructor/equivalence tests
  * (tests-03-as.big.data.table.R, tests-04-sub-.big.data.table.R).
  */
class BigDataTableSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def genData(n: Int): Seq[GenTestRow] = {
    val rng = new scala.util.Random(123)
    Seq.fill(n)(
      GenTestRow(
        2011 + rng.nextInt(4),
        ('a' + rng.nextInt(26)).toChar.toString,
        rng.nextGaussian()
      )
    )
  }

  test("fromLocal round-trip: gathered rows == input rows (tests-03:53-60)") {
    val rows = genData(200)
    val bdt = BigDataTable.fromLocal(spark, rows, "t_rt", numShards = 4)
    assert(bdt.nrow === 200)
    assert(bdt.ncol === 3)
    val back = bdt.toLocal().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).sorted
    assert(back === rows.map(r => (r.year, r.low, r.value)).sorted.toArray)
  }

  test("distributed agg == local recompute (equivalence oracle, tests-04:19)") {
    val rows = genData(1000)
    val bdt = BigDataTable.fromLocal(spark, rows, "t_eq", numShards = 4)
    val got = bdt
      .query(j = Seq(sum($"value").as("value")), by = Seq($"year"))
      .collect()
      .map(r => r.getInt(0) -> r.getDouble(1))
      .toMap
    val want = rows.groupBy(_.year).map { case (y, rs) => y -> rs.map(_.value).sum }
    assert(got.keySet === want.keySet)
    got.foreach { case (y, v) => assert(math.abs(v - want(y)) < 1e-9) }
  }

  test("PerNode partials re-aggregate to the Auto result (tests-04:30-31)") {
    val rows = genData(1000)
    val bdt = BigDataTable.fromLocal(spark, rows, "t_pn", numShards = 4)
    val partials = bdt.query(
      j = Seq(sum($"value").as("value")),
      by = Seq($"year"),
      outer = OuterAgg.PerNode
    )
    // partials: one row per (node, year); final sum over them == Auto
    val refined = partials
      .groupBy($"year")
      .agg(sum($"value").as("value"))
      .collect()
      .map(r => r.getInt(0) -> r.getDouble(1))
      .toMap
    val auto = bdt
      .query(j = Seq(sum($"value").as("value")), by = Seq($"year"))
      .collect()
      .map(r => r.getInt(0) -> r.getDouble(1))
      .toMap
    refined.foreach { case (y, v) => assert(math.abs(v - auto(y)) < 1e-9) }
  }

  test("OuterAgg.Fn applies user combine to partials (A9)") {
    val rows = genData(400)
    val bdt = BigDataTable.fromLocal(spark, rows, "t_fn", numShards = 4)
    val got = bdt
      .query(
        j = Seq(count(lit(1)).as("n")),
        outer = OuterAgg.Fn(p => p.agg(sum($"n").as("n")))
      )
      .collect()
      .head
      .getLong(0)
    assert(got === 400L)
  }

  test(".N per node: partition counts sum to total (tests-06:198, B23)") {
    val bdt = BigDataTable.fromLocal(spark, genData(150), "t_n", numShards = 4)
    val counts = bdt.partitionRowCounts.collect().map(_.getLong(1))
    assert(counts.sum === 150L)
    assert(counts.length <= 4)
  }

  test("keyed scatter: every partition holds at most its own keys (tests-03 purity)") {
    val rows = genData(500)
    val bdt = BigDataTable.fromLocal(spark, rows, "t_key", partitionBy = Seq("year"))
    // key purity: each key lives in exactly one partition (hash
    // partitioning co-locates keys; several keys may share a partition)
    val purity = bdt
      .toLocalDF()
      .withColumn("_pid", spark_partition_id())
      .groupBy($"year")
      .agg(countDistinct($"_pid").as("p"))
      .collect()
      .map(_.getLong(1))
    assert(purity.forall(_ === 1L))
    assert(bdt.partitions.count() === 4)
  }

  test("empty table and nrow < nshards edge cases (tests-03:62-111)") {
    val empty = BigDataTable.fromLocal(spark, Seq.empty[GenTestRow], "t_empty")
    assert(empty.nrow === 0L)
    assert(empty.core.count() === 0L)
    val tiny = BigDataTable.fromLocal(spark, genData(3), "t_tiny", numShards = 4)
    assert(tiny.nrow === 3L)
    assert(tiny.partitionRowCounts.collect().map(_.getLong(1)).sum === 3L)
  }

  test("update rebinds the named handle without fetching (B15)") {
    val bdt = BigDataTable.fromLocal(spark, genData(100), "t_upd")
    val upd = bdt.update("flag", when($"value" > 0, "pos").otherwise("neg"))
    assert(upd.columnNames.contains("flag"))
    assert(spark.table("t_upd").columns.contains("flag"))
    assert(upd.nrow === 100L)
  }

  test("newVar caches a derived table under a new name (B16)") {
    val bdt = BigDataTable.fromLocal(spark, genData(100), "t_nv")
    val derived = bdt.query(j = Seq(avg($"value").as("v")), by = Seq($"year"))
    val y = bdt.newVar(derived, "t_nv_y")
    assert(Cluster.ls(spark).contains("t_nv_y"))
    assert(y.nrow === 4L)
    y.toLocalDF().unpersist()
  }

  test("perPartition node targeting (A13/B25)") {
    val bdt = BigDataTable.fromLocal(spark, genData(400), "t_pp", numShards = 4)
    val all = bdt.perPartition() { it => Iterator(it.size) }.collect()
    assert(all.sum === 400)
    val some = bdt.perPartition(targets = Set(0, 1)) { it => Iterator(it.size) }.collect()
    assert(some.length === 2)
  }

  test("print/str render head, tail, and schema (A21/A22)") {
    val bdt = BigDataTable.fromLocal(spark, genData(50), "t_print", numShards = 4)
    val p = bdt.printTable(3)
    assert(p.contains("---"))
    assert(p.linesIterator.size === 8) // header + 3 head + --- + 3 tail
    val s = bdt.strTable
    assert(s.contains("50 obs. of 3 variables"))
    assert(s.contains("partition.by: <none>"))
  }

  test("print/str golden output on a fixed fixture (A21/A22, reference tests-06-readme.R:177-187)") {
    // the reference pins exact capture.output strings; same here — any
    // formatting drift in printTable/strTable is a break, not a tweak
    val rows = (1 to 10).map(i => GenTestRow(2000 + i, f"s$i%02d", i.toDouble))
    val bdt = BigDataTable.fromLocal(spark, rows, "t_golden")
    val p = bdt.printTable(2)
    assert(p ===
      """year	low	value
        |2001	s01	1.0
        |2002	s02	2.0
        |---
        |2009	s09	9.0
        |2010	s10	10.0
        |""".stripMargin)
    val s = bdt.strTable
    assert(s ===
      """'BigDataTable': 10 obs. of 3 variables across 1 partitions
        |root
        | |-- year: integer (nullable = false)
        | |-- low: string (nullable = true)
        | |-- value: double (nullable = false)
        |rows per partition: 10
        |partition.by: <none>""".stripMargin)
  }

  test("fromGenerator: per-partition deterministic generation (A15/B24)") {
    val bdt = BigDataTable.fromGenerator(spark, 4, "t_gen") { pid =>
      (0 until 10).iterator.map(i => GenTestRow(2011 + pid, s"p$pid", i.toDouble))
    }
    assert(bdt.nrow === 40L)
    val years = bdt.toLocalDF().select("year").distinct().collect().map(_.getInt(0)).sorted
    assert(years === Array(2011, 2012, 2013, 2014))
  }

  test("columnProbe: 0-row frame carrying the exact DataType, name + position (A13)") {
    import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}
    val bdt = BigDataTable.fromLocal(spark, genData(20), "t_probe")
    val byName = bdt.columnProbe("value")
    assert(byName.count() === 0L)
    assert(byName.schema.length === 1)
    assert(byName.schema.head.name === "value")
    assert(byName.schema.head.dataType === DoubleType)
    val byPos = bdt.columnProbe(1)
    assert(byPos.schema.head.name === "low")
    assert(byPos.schema.head.dataType === StringType)
    // a column literally named "a.year" must resolve as itself, not as a
    // nested-field access on a struct column "a"
    val dotted = BigDataTable.fromDF(
      spark.createDataset(genData(5)).toDF("a.year", "low", "value"),
      "t_probe_dot"
    )
    assert(dotted.columnProbe("a.year").schema.head.name === "a.year")
    assert(dotted.columnProbe("a.year").schema.head.dataType === IntegerType)
    assert(dotted.columnProbe(0).schema.head.name === "a.year")
  }

  test("printTableWarnings golden strings: single node / empty first / empty last (A21)") {
    val one = BigDataTable.fromLocal(spark, genData(10), "t_w1", numShards = 1)
    assert(one.printTableWarnings ===
      Seq("Running big.data.table with single node, print will be incorrect."))
    def gen(skip: Int) = BigDataTable.fromGenerator(spark, 3, s"t_w$skip") { pid =>
      if (pid == skip) Iterator.empty
      else (0 until 5).iterator.map(i => GenTestRow(2000 + pid, s"p$pid", i.toDouble))
    }
    assert(gen(0).printTableWarnings ===
      Seq("First node doesn't have any rows, print will be incorrect."))
    assert(gen(2).printTableWarnings ===
      Seq("Last node doesn't have any rows, print will be incorrect."))
    assert(gen(1).printTableWarnings === Seq.empty) // healthy end shards
  }

  test("empty table: reference banner, no warnings (A21, reference R:49-57)") {
    val empty = BigDataTable.fromLocal(spark, Seq.empty[GenTestRow], "t_wempty")
    // an empty DataFrame still has >= 1 (empty) partitions — the reference
    // returns early on nrow==0 with NO warnings, not the empty-shard ones
    assert(empty.printTableWarnings === Seq.empty)
    assert(empty.printTable() ===
      "Empty data.table (0 rows) of 3 cols: year,low,value")
  }

  test("cluster surface: ls/isValid/require (A1-A8)") {
    assert(Cluster.isValid(spark))
    BigDataTable.fromLocal(spark, genData(5), "t_ls")
    assert(Cluster.ls(spark).contains("t_ls"))
    assert(Cluster.require(spark, "graft.BigDataTable$"))
    assert(!Cluster.require(spark, "no.such.Class"))
    assert(Cluster.lsStr(spark)("t_ls").contains("year"))
  }
}
