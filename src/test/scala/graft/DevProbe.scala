package graft

import org.apache.spark.sql.SparkSession

/** Test-scoped profiling harness (not part of the library surface):
  * `sbt "Test/runMain graft.DevProbe <queryName> [passes] [sfDir]"` times
  * one registry query at the given SF and prints its executed plan once.
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "d03_simhash_neardup"
    val passes = if (args.length > 1) args(1).toInt else 3
    val d = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to passes) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, d).count()
      println(f"[probe] $name pass$i rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    if (sys.env.contains("GRAFT_PROBE_PLAN"))
      println(
        SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString.take(6000)
      )
    spark.stop()
  }
}
