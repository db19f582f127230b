package graft

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import scala.reflect.ClassTag

/** How per-partition partial results are finalized — the reference's
  * `outer.aggregate` argument (R/big.data.table.R:140-151).
  */
sealed trait OuterAgg
object OuterAgg {

  /** Spark-native partial→final aggregation (always correct; what
    * `HashAggregate(Partial)` → shuffle → `HashAggregate(Final)` does).
    * Default, unlike the reference whose default returns raw partials.
    */
  case object Auto extends OuterAgg

  /** Raw per-node partials, one result row set per partition — the
    * reference's default behavior (R/big.data.table.R:138-139, README
    * "4 rows, one per node"). Exposed for parity/diagnostics via
    * `spark_partition_id()`.
    */
  case object PerNode extends OuterAgg

  /** User-supplied final combine applied to the union of partials — the
    * reference's `outer.aggregate = function` mode
    * (R/big.data.table.R:141-143).
    */
  final case class Fn(f: DataFrame => DataFrame) extends OuterAgg
}

/** A distributed table with the reference's `big.data.table` surface.
  *
  * Reference data model (R/as.big.data.table.R:4-14): an empty client
  * `data.table` carrying `rscl` (cluster), `var` (remote name),
  * `partitions` (distinct key combos). Here: a `DataFrame` (the shards ARE
  * its partitions), a registered temp-view name, and a declared partition
  * key. `partitions` metadata is computed lazily as
  * `df.select(keys).distinct()` (reference R/big.data.table.R:229-230).
  *
  * Design stance for 100 TB: nothing routes through the driver except the
  * explicit [[toLocal]]; scatter = shuffle (`repartition`), gather = union;
  * aggregation stays inside Tungsten partial/final.
  */
final class BigDataTable private (
    val df: DataFrame,
    val name: String,
    val partitionBy: Seq[String]
) {

  private def spark: SparkSession = df.sparkSession

  // ---------------------------------------------------------------- metadata

  /** ≈ `names.big.data.table` (reference R/big.data.table.R:27-34). */
  def columnNames: Seq[String] = df.columns.toSeq

  /** ≈ `dim.big.data.table` (reference R/big.data.table.R:36-47):
    * (row count, column count). Spark enforces schema consistency at
    * analysis, so the reference's "ncol must agree across nodes" check is
    * structural here.
    */
  def dims: (Long, Int) = (df.count(), df.columns.length)

  def nrow: Long = df.count()
  def ncol: Int = df.columns.length

  /** ≈ `core.data.table` (reference R/big.data.table.R:348-355): 0-row
    * schema skeleton probe.
    */
  def core: DataFrame = df.limit(0)

  def schema: StructType = df.schema

  /** ≈ `bdt[[j]]` with scalar `j` (reference R/big.data.table.R:312):
    * probes one column's TYPE without touching data — the reference
    * returns `core.data.table(x)[[j]]`, a 0-length typed vector; here, a
    * 0-row single-column DataFrame carrying the column's exact DataType.
    */
  def columnProbe(j: String): DataFrame = core.select(quotedCol(j))

  /** 0-based positional variant of [[columnProbe]] (the reference accepts
    * numeric `j`; R is 1-based, Scala collections are 0-based).
    */
  def columnProbe(j: Int): DataFrame = core.select(quotedCol(df.columns(j)))

  /** `col(name)` parses '.' as a nested-field accessor, so a column
    * literally named "a.b" would mis-resolve — quote with backticks
    * (embedded backticks doubled, the SQL escape).
    */
  private def quotedCol(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  /** ≈ `is.big.data.table(check.nodes=TRUE)`
    * (reference R/big.data.table.R:18-25): the view still resolves.
    */
  def isValid: Boolean =
    try { spark.table(name); true }
    catch { case _: Exception => false }

  /** Distinct partition-key combinations — the reference's `partitions`
    * attribute (R/as.big.data.table.R:9-10), computed from data like
    * `bdt.partition` (R/big.data.table.R:229-230). Empty DataFrame when
    * unpartitioned.
    */
  def partitions: DataFrame =
    if (partitionBy.isEmpty) spark.emptyDataFrame
    else df.select(partitionBy.map(col): _*).distinct()

  /** Per-partition row counts ≈ the reference `str` footer's per-node
    * rows vector (R/big.data.table.R:92-96) and `bdt[, .N]` per-node
    * semantics (tests/tests-06-readme.R:198).
    */
  def partitionRowCounts: DataFrame =
    df.groupBy(spark_partition_id().as("node"))
      .count()
      .orderBy(col("node"))

  /** ≈ `print.big.data.table`'s warning set (reference
    * R/big.data.table.R:61-67): the reference prints head from the FIRST
    * node and tail from the LAST, and warns when that view is unfaithful —
    * a single node (head and tail come from the same shard) or an empty
    * end shard. Checked with one two-partition probe job (`it.hasNext` on
    * partitions 0 and n-1 only — no scan of the middle).
    */
  def printTableWarnings: Seq[String] = {
    val rdd = df.rdd
    val n = rdd.getNumPartitions
    if (n == 0) return Seq.empty
    val ends = spark.sparkContext.runJob(
      rdd,
      (it: Iterator[_]) => it.hasNext,
      if (n == 1) Seq(0) else Seq(0, n - 1)
    )
    // the reference returns early for an empty TABLE (R:49-53) before any
    // warning — emptiness is rows, not partitions (an empty DataFrame
    // almost always still has >= 1 empty partitions). The full-frame probe
    // runs only when both end shards came back empty.
    if (!ends.exists(identity) && df.isEmpty) return Seq.empty
    val w = Seq.newBuilder[String]
    if (n == 1)
      w += "Running big.data.table with single node, print will be incorrect."
    if (!ends.head)
      w += "First node doesn't have any rows, print will be incorrect."
    if (!ends.last)
      w += "Last node doesn't have any rows, print will be incorrect."
    w.result()
  }

  /** ≈ `print.big.data.table` (reference R/big.data.table.R:49-74):
    * head from the first shard, "---", tail from the last shard, without a
    * full scan (head/tail read only the end partitions). Reference-parity
    * warnings ([[printTableWarnings]]) go to stderr, like R's `warning()`.
    */
  def printTable(topn: Int = 5): String = {
    // empty table: the reference prints its empty-frame banner and
    // returns before any warning (R/big.data.table.R:49-57)
    if (df.isEmpty) {
      val cs = df.columns
      val plural = if (cs.length > 1) "s" else ""
      val ell = if (cs.length > 6) "..." else ""
      val out =
        s"Empty data.table (0 rows) of ${cs.length} col$plural: " +
          cs.take(6).mkString(",") + ell
      println(out)
      return out
    }
    printTableWarnings.foreach(w => Console.err.println(s"Warning: $w"))
    val head = df.limit(topn).collect()
    val tail = df.tail(topn)
    val cols = df.columns
    val sb = new StringBuilder
    sb.append(cols.mkString("\t")).append('\n')
    head.foreach(r => sb.append(r.toSeq.mkString("\t")).append('\n'))
    sb.append("---\n")
    tail.foreach(r => sb.append(r.toSeq.mkString("\t")).append('\n'))
    val out = sb.toString()
    println(out)
    out
  }

  /** ≈ `str.big.data.table` (reference R/big.data.table.R:76-99): header,
    * schema, per-node counts, partition-by footer.
    */
  def strTable: String = {
    val counts = partitionRowCounts.collect().map(_.getLong(1))
    val header =
      s"'BigDataTable': ${counts.sum} obs. of ${ncol} variables across ${counts.length} partitions"
    val pb =
      if (partitionBy.nonEmpty) s"partition.by: ${partitionBy.mkString(", ")}"
      else "partition.by: <none>"
    s"$header\n${schema.treeString}rows per partition: ${counts.mkString(", ")}\n$pb"
  }

  // ---------------------------------------------------------------- queries

  /** The main query entry ≈ `[.big.data.table` (reference
    * R/big.data.table.R:274-294): `bdt[i, j, by]`.
    *
    * @param i filter predicate (data.table `i`)
    * @param j aggregate/select expressions (data.table `j`)
    * @param by grouping columns
    * @param keyBy grouping columns + sort result by them (data.table `keyby`,
    *              reference R/big.data.table.R:266)
    * @param outer finalization mode, see [[OuterAgg]]; the reference's
    *              `.N`-partials footgun (README.md:176-178) does not exist
    *              in Auto mode — Spark's partial/final split is always
    *              correct.
    */
  def query(
      i: Column = lit(true),
      j: Seq[Column] = Nil,
      by: Seq[Column] = Nil,
      keyBy: Seq[Column] = Nil,
      outer: OuterAgg = OuterAgg.Auto
  ): DataFrame = {
    val filtered = df.filter(i)
    val groups = if (keyBy.nonEmpty) keyBy else by
    val out = outer match {
      case OuterAgg.Auto =>
        if (j.isEmpty) {
          if (groups.nonEmpty) filtered.select(groups: _*).distinct()
          else filtered
        } else if (groups.nonEmpty)
          filtered.groupBy(groups: _*).agg(j.head, j.tail: _*)
        else filtered.agg(j.head, j.tail: _*)
      case OuterAgg.PerNode =>
        val g = spark_partition_id().as("_node") +: groups
        if (j.isEmpty) filtered.groupBy(g: _*).count()
        else filtered.groupBy(g: _*).agg(j.head, j.tail: _*)
      case OuterAgg.Fn(f) =>
        // partials per node, then the user's final combine on their union
        val g = spark_partition_id().as("_node") +: groups
        val partials = filtered.groupBy(g: _*).agg(j.head, j.tail: _*)
        f(partials.drop("_node"))
    }
    if (keyBy.nonEmpty) out.orderBy(keyBy: _*) else out
  }

  /** SQL entry over the registered view — the string-expression analog of
    * the reference's quoted-expression shipping (the AST the reference
    * serializes over TCP is here a SQL string resolved by Catalyst
    * against this table's temp view).
    */
  def sql(queryText: String): DataFrame = spark.sql(queryText)

  /** Select a subset of columns ≈ `[, cols, with=FALSE]`
    * (reference R/as.big.data.table.R:86).
    */
  def select(cols: String*): BigDataTable =
    withDF(df.select(cols.map(col): _*))

  /** Row filter ≈ `i` subset (reference R/big.data.table.R:266). */
  def filter(i: Column): BigDataTable = withDF(df.filter(i))

  /** Immutable `:=` ≈ update-by-reference (reference
    * R/big.data.table.R:108, 301 `send=TRUE` side-effect queries): returns
    * a rebound handle under the same name; no data is fetched, matching
    * the reference's boolean-ack protocol.
    */
  def update(colName: String, value: Column): BigDataTable = {
    val nd = df.withColumn(colName, value)
    nd.createOrReplaceTempView(name)
    new BigDataTable(nd, name, partitionBy)
  }

  /** ≈ `new.var` result caching (reference R/big.data.table.R:281-292,
    * README.md:202-207): persist the derived table remotely under a new
    * name, return a handle, fetch nothing.
    */
  def newVar(result: DataFrame, newName: String): BigDataTable = {
    val cached = result.persist()
    cached.createOrReplaceTempView(newName)
    new BigDataTable(cached, newName, Nil)
  }

  /** Re-partition by key ≈ `bdt.partition` (reference
    * R/big.data.table.R:219-260) — but actually moves the data (the
    * reference left the movement commented out at lines 236-258; here the
    * shuffle IS the movement).
    */
  def partitionByKeys(keys: String*): BigDataTable = {
    val nd = df.repartition(keys.map(col): _*)
    nd.createOrReplaceTempView(name)
    new BigDataTable(nd, name, keys)
  }

  /** Keyed + sorted shards ≈ data.table's `setkeyv` semantics (B22,
    * reference R/as.big.data.table.R:10): co-locate by key AND sort
    * within each shard — the layout that makes per-shard merge joins and
    * range scans cheap (Spark's bucketed-sorted-table shape).
    */
  def keyBy(keys: String*): BigDataTable = {
    val nd = df
      .repartition(keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
    nd.createOrReplaceTempView(name)
    new BigDataTable(nd, name, keys)
  }

  // ------------------------------------------------------- per-node escape

  /** ≈ `[[.big.data.table` expr mode (reference R/big.data.table.R:310-324)
    * with node targeting `i` (lines 316-322): run an arbitrary typed
    * closure on each (optionally targeted) partition.
    */
  def perPartition[T: ClassTag](targets: Set[Int] = Set.empty)(
      f: Iterator[Row] => Iterator[T]
  ): org.apache.spark.rdd.RDD[T] =
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (targets.isEmpty || targets.contains(pid)) f(it) else Iterator.empty
    }

  /** ≈ `[[rbind = FALSE]]` (reference README.md:242-249): per-node results
    * kept separate — relational form, results tagged by partition id so the
    * plan stays distributed (no glom-to-driver).
    */
  def perPartitionTagged(exprs: Column*): DataFrame =
    df.groupBy(spark_partition_id().as("_node")).agg(exprs.head, exprs.tail: _*)

  /** Scalar-vector simplification (B27, reference R/big.data.table.R:
    * 149-151): one scalar per node → a node-indexed vector on the client
    * (the reference names entries by port; partition id is our node id,
    * SURVEY.md §7.4.1).
    */
  def perPartitionScalar(expr: Column): Seq[(Int, Any)] =
    perPartitionTagged(expr.as("_v"))
      .orderBy(col("_node"))
      .collect()
      .map(r => r.getInt(0) -> r.get(1))
      .toSeq

  // ---------------------------------------------------------------- gather

  /** ≈ `as.data.table.big.data.table` (reference R/as.big.data.table.R:
    * 133-135): gather the whole table to the client. Same OOM caveat.
    */
  def toLocal(): Array[Row] = df.collect()

  def toLocalDF(): DataFrame = df

  private def withDF(nd: DataFrame): BigDataTable =
    new BigDataTable(nd, name, partitionBy)
}

object BigDataTable {

  /** Adopt an existing DataFrame ≈ `as.big.data.table.list` — the cluster
    * already holds the data (reference R/as.big.data.table.R:63-91).
    * Partition-key names may not start with `.` (reference line 69).
    */
  def fromDF(
      df: DataFrame,
      name: String = "x",
      partitionBy: Seq[String] = Nil
  ): BigDataTable = {
    require(
      partitionBy.forall(!_.startsWith(".")),
      "partition.by columns must not start with '.' (reference R/as.big.data.table.R:69)"
    )
    val d =
      if (partitionBy.nonEmpty) df.repartition(partitionBy.map(col): _*)
      else df
    d.createOrReplaceTempView(name)
    new BigDataTable(d, name, partitionBy)
  }

  /** Ingest a local collection ≈ `as.big.data.table.data.table`
    * (reference R/as.big.data.table.R:96-122): scatter via shuffle
    * (`bdt.assign`'s keyed split, R/big.data.table.R:194-202 — the hash
    * repartition does the keyed chunking; empty shards fall out naturally).
    */
  def fromLocal[T <: Product: org.apache.spark.sql.Encoder](
      spark: SparkSession,
      rows: Seq[T],
      name: String = "x",
      partitionBy: Seq[String] = Nil,
      numShards: Int = 0
  ): BigDataTable = {
    var base = spark.createDataset(rows).toDF()
    if (numShards > 0 && partitionBy.isEmpty) base = base.repartition(numShards)
    fromDF(base, name, partitionBy)
  }

  /** Ingest by per-node generation ≈ `as.big.data.table.function`
    * (reference R/as.big.data.table.R:35-45): each partition generates its
    * own shard — data never routes through the driver. Seeding is
    * per-partition-deterministic (reference B24: `set.seed` per node).
    */
  def fromGenerator[T <: Product: org.apache.spark.sql.Encoder: ClassTag](
      spark: SparkSession,
      nPartitions: Int,
      name: String = "x"
  )(gen: Int => Iterator[T]): BigDataTable = {
    // one seed element per partition → each partition generates locally
    val rdd = spark.sparkContext
      .parallelize(0 until nPartitions, nPartitions)
      .flatMap(gen)
    val ds: Dataset[T] = spark.createDataset(rdd)
    fromDF(ds.toDF(), name)
  }

  /** Adopt a registered view ≈ `as.big.data.table.call` on pre-existing
    * remote data (reference R/as.big.data.table.R:50-58).
    */
  def fromExisting(spark: SparkSession, view: String): BigDataTable =
    new BigDataTable(spark.table(view), view, Nil)

  /** Distributed scan — replaces the reference's per-node `fread`
    * (README.md:123-131, B20).
    */
  def fromParquet(
      spark: SparkSession,
      path: String,
      name: String = "x",
      partitionBy: Seq[String] = Nil
  ): BigDataTable = fromDF(spark.read.parquet(path), name, partitionBy)

  def fromCsv(
      spark: SparkSession,
      path: String,
      name: String = "x",
      header: Boolean = true,
      inferSchema: Boolean = true
  ): BigDataTable = fromDF(
    spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .csv(path),
    name
  )
}
