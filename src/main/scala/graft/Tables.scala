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
  /** The events fixture's ts column has shipped as both parquet
    * TIMESTAMP(NANOS) (older driver generations — Spark's vectorized
    * reader rejects it unless `spark.sql.legacy.parquet.nanosAsLong=true`,
    * which every session here sets, yielding a nanos LONG) and plain
    * TIMESTAMP(MICROS) (current generation, read as TIMESTAMP_NTZ). This
    * loader normalizes BOTH to microsecond TimestampType — for the nanos
    * form that is the same truncation DuckDB applies casting
    * TIMESTAMP_NS → TIMESTAMP; for the NTZ form the cast is wall-clock
    * preserving under the UTC session timezone all mains/tests pin.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // integer `div`, not `/`: epoch-nanos (~1.7e18) exceed double's
        // 53-bit mantissa, so float division could be off by ±1µs vs
        // DuckDB's integer TIMESTAMP_NS → TIMESTAMP truncation
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
