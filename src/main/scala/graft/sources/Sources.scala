package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source/sink surface (reference B20-B21: per-node `fread`/`write.csv`
  * replaced by distributed scans/writes; README.md:123-131).
  *
  * All readers/writers are the distributed Spark implementations — a
  * directory of part files, not a single client-side file — which is the
  * shape that scales: each executor reads/writes its own split.
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(
      spark: SparkSession,
      path: String,
      header: Boolean = true,
      inferSchema: Boolean = true
  ): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .csv(path)

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("header", header.toString)
      .csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC — the columnar interchange format Hive-era warehouses ship in;
    * Spark's reader is native (predicate pushdown + column pruning like
    * parquet), so an ORC-resident corpus needs no conversion pass.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Persist `df` hash-bucketed (and sorted) by `key` as a catalog table —
    * the cross-JOB analogue of the reference's key-partitioned node shards
    * (reference: R/as.big.data.table.R:9-10 partitions each node's shard by
    * the key once, and node-scoped joins then run shuffle-free for the
    * session, README.md:226-227). `keyBy` co-locates within ONE job; a
    * bucketed table makes the layout durable: every later job that joins
    * two tables bucketed by the same key into the same bucket count gets a
    * sort-merge join with ZERO Exchange on either side — at 100 TB that is
    * the difference between a metadata-only plan and re-shuffling both fact
    * tables on every query.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int = 32
  ): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed catalog table back; its bucket spec drives the
    * shuffle-free join planning. */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Write `df` compacted to approximately `targetFileMB`-sized parquet
    * files — the small-files remedy. A filtered/deduped pipeline stage
    * inherits its input's partitioning, so a 10 000-partition scan that
    * keeps 1% of rows would otherwise write 10 000 tiny files, and at
    * 100 TB the NameNode/listing cost of millions of kilobyte files
    * dominates reads.
    *
    * Sizing is delegated to AQE's REBALANCE: the hint inserts a
    * round-robin shuffle whose output partitions are coalesced AND
    * skew-split to the advisory size from the shuffle's RUNTIME byte
    * statistics. Earlier revisions sized from
    * `optimizedPlan.stats.sizeInBytes` and were wrong in both
    * directions — post-filter estimates carry no selectivity (1000
    * near-empty files for a 99%-selective filter), and clamping by the
    * input partition count broke fat-coalesced inputs (a 100 GB
    * 2-partition frame forced into 8 huge files). Runtime sizes have
    * neither failure mode. Files land somewhat under `targetFileMB`
    * (shuffle bytes are uncompressed; parquet then compresses) — the
    * remedy targets order-of-magnitude file-count sanity, not exact
    * sizes. Requires AQE (on in every session this library builds).
    *
    * Caveats of the conf window (advisory size is session-scoped, not
    * per-plan): upstream shuffle stages of THIS job also coalesce
    * toward `targetFileMB` — pass an already-materialized frame if the
    * plan contains heavy joins and the target is large — and other
    * queries planned on the same session DURING the write observe the
    * altered advisory; on a session shared across threads, call this
    * from a dedicated `spark.newSession()` whose conf is yours.
    */
  def writeCompacted(
      df: DataFrame,
      path: String,
      targetFileMB: Int = 128
  ): Unit = {
    require(targetFileMB > 0, s"targetFileMB must be positive, got $targetFileMB")
    val spark = df.sparkSession
    val advisoryKey = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val rebalanceKey = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    val prevAdvisory = spark.conf.getOption(advisoryKey)
    val prevMin = spark.conf.getOption(rebalanceKey)
    spark.conf.set(advisoryKey, s"${targetFileMB}m")
    // floor at 1/4 target so AQE never splits below it for this write
    spark.conf.set(rebalanceKey, s"${(targetFileMB + 3) / 4}m")
    try
      df.hint("rebalance").write.mode(SaveMode.Overwrite).parquet(path)
    finally {
      prevAdvisory.fold(spark.conf.unset(advisoryKey))(spark.conf.set(advisoryKey, _))
      prevMin.fold(spark.conf.unset(rebalanceKey))(spark.conf.set(rebalanceKey, _))
    }
  }

  /** Round-trip helper used by tests and the q28 query: write through a
    * format and read back (schema inferred), exercising both directions
    * of the source surface.
    */
  def roundTrip(
      df: DataFrame,
      path: String,
      format: String
  ): DataFrame = {
    val spark = df.sparkSession
    format match {
      case "csv" => writeCsv(df, path); readCsv(spark, path)
      case "json" => writeJson(df, path); readJson(spark, path)
      case "orc" => writeOrc(df, path); readOrc(spark, path)
      case _ => writeParquet(df, path); readParquet(spark, path)
    }
  }
}
