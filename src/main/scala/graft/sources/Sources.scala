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
    * dominates reads. Sizing uses the optimizer's plan statistics
    * (`sizeInBytes`; parquet scans report actual file bytes, post-filter
    * stages an estimate), and the repartition is a round-robin rebalance —
    * one extra shuffle traded for a bounded file count.
    */
  def writeCompacted(
      df: DataFrame,
      path: String,
      targetFileMB: Int = 128
  ): Unit = {
    require(targetFileMB > 0, s"targetFileMB must be positive, got $targetFileMB")
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val target = BigInt(targetFileMB.toLong * 1024 * 1024)
    // sizeInBytes is a BigInt: leaves without real statistics default to
    // the spark.sql.defaultSizeInBytes sentinel (Long.MaxValue), and
    // stat-less join estimates are PRODUCTS of child sizes that can
    // exceed it — both mean "unknown", and sizing from them would emit
    // the 100000-file clamp for a tiny input (the very problem this
    // helper remedies). Fall back to the input's partition count then.
    // Ceiling division keeps files at ≤ targetFileMB, not up to 2×; the
    // clamp arithmetic stays in BigInt (a .toLong of a huge estimate
    // would wrap, min(1) it, and funnel a huge result through ONE task).
    val inputParts = df.rdd.getNumPartitions.max(1)
    // Estimates BELOW the sentinel can still be inflated by orders of
    // magnitude: post-filter/join stages carry no selectivity, so a
    // 99%-selective filter inherits its scan's full sizeInBytes and would
    // ask for thousands of near-empty files. Cap at a small multiple of
    // the input partition count — each input partition is already at most
    // ~maxPartitionBytes (≈ targetFileMB for scans), so the output can
    // never usefully need many more files than input partitions.
    val files =
      if (bytes <= 0 || bytes >= BigInt(Long.MaxValue)) inputParts
      else
        ((bytes + target - 1) / target)
          .min(BigInt(100000))
          .toInt
          .min(inputParts * 4)
          .max(1)
    df.repartition(files).write.mode(SaveMode.Overwrite).parquet(path)
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
      case _ => writeParquet(df, path); readParquet(spark, path)
    }
  }
}
