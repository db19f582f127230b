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
