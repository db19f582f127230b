package graft

import org.apache.spark.sql.SparkSession

/** Test-scoped plan inspector: print the formatted physical plan of one
  * or more registry queries without materializing them (generator-only
  * plans print fully; eagerly-checkpointed operators print the plan of
  * the blocks they return).
  *
  * `sbt "Test/runMain graft.PlanProbe q07_uniqueN p05_pack_greedy [sfDir]"`
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val (names, dirs) = args.partition(a => !a.startsWith("/"))
    val sfDir = dirs.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      CacheUtil.release(df)
    }
    spark.stop()
  }
}
