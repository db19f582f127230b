package graft

import org.apache.spark.sql.{DataFrame, Row}

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Async fan-out ≈ the reference's fire-then-collect protocol
  * (`rscl.eval(wait=FALSE)` + `rscl.collect`, R/rscl.R:58-69, 98-104).
  *
  * In Spark, task-level parallelism is native; what the reference's async
  * mode adds is running several independent ACTIONS concurrently from the
  * client — which maps to Futures over Spark jobs (the scheduler
  * interleaves their stages across executors).
  */
object AsyncOps {

  /** Fire a collect without waiting ≈ `RS.eval(wait=FALSE)`. */
  def collectAsync(df: DataFrame)(implicit
      ec: ExecutionContext
  ): Future[Array[Row]] = Future(df.collect())

  /** Fire all, then collect all ≈ `rscl.eval(parallel=TRUE)`
    * (R/rscl.R:63-65). Per-job failures come back as `Failure` values —
    * one failed job doesn't abort the others, matching `rscl.collect`'s
    * per-node `try` (R/rscl.R:99-100).
    */
  def fireAndCollect(
      dfs: Seq[DataFrame],
      timeout: Duration = Duration.Inf
  )(implicit ec: ExecutionContext): Seq[scala.util.Try[Array[Row]]] = {
    val futures = dfs.map(df => Future(df.collect()).transform(scala.util.Success(_)))
    Await.result(Future.sequence(futures), timeout)
  }
}
