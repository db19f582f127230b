package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (SURVEY.md §5: `local[4]` as
  * the 4-node fixture).
  */
object SparkTestSession {
  lazy val spark: SparkSession = Cluster.open(
    nodes = 4,
    appName = "graft-test",
    shufflePartitions = 4
  )
  val sfDir = "/root/testdata/sf0.001"
}
