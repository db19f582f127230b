package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet fixture loaders (TESTDATA.md). One call per table so tests and
  * queries share the same scan (column pruning + filter pushdown reach the
  * parquet reader from here).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** The events fixture stores ts as parquet TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects (PARQUET_TYPE_ILLEGAL). Sessions
    * must set `spark.sql.legacy.parquet.nanosAsLong=true` (Cluster.open
    * and every main/test session do); this loader then truncates to
    * microsecond TimestampType — the same truncation DuckDB applies
    * casting TIMESTAMP_NS → TIMESTAMP.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.withColumn(
      "ts",
      org.apache.spark.sql.functions.timestamp_micros(
        (org.apache.spark.sql.functions.col("ts") / 1000L).cast("long")
      )
    )
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
