package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Storage hygiene for operator results.
  *
  * Iterative / multi-use operators ([[operators.Dedup.dupClusters]],
  * [[operators.Dedup.minHashNearDups]], [[operators.Similarity.lshNearDups]])
  * return a `localCheckpoint`-ed DataFrame: materialized once, lineage
  * truncated, blocks held at MEMORY_AND_DISK. Those blocks are NOT in the
  * Dataset cache manager, so `spark.catalog.clearCache()` cannot free them —
  * this helper walks the plan to the checkpointed RDD and unpersists it.
  * Call it when a result is no longer needed (e.g. between dedup passes over
  * different corpora in one long session).
  */
object CacheUtil {

  /** Release the block storage behind a localCheckpoint-ed result. Safe to
    * call on any DataFrame — plans without a checkpointed RDD are a no-op.
    * The DataFrame must not be used afterwards (its blocks are gone and its
    * lineage was truncated, so it cannot be recomputed).
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _              => ()
    }
}
