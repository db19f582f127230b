package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the library surface). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name rows=$n t=${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    for (i <- 1 to 4)
      time(s"d02_full_$i") {
        operators.Dedup.minHashNearDups(docs, "text", "doc_id", 0.4).count()
      }
    val q = operators.Dedup.minHashNearDups(docs, "text", "doc_id", 0.4)
    println(q.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
