package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Query-execution logging ≈ the reference's logR integration (A26,
  * R/big.data.table.R:156-175): per-call records with expression text,
  * output rows, timing and status — captured from Spark's own execution
  * callbacks instead of a Postgres round-trip (the reference pays 10 DB
  * hits per query, README.md:262-264; this pays none).
  */
object Observability {

  final case class QueryRecord(
      funcName: String,
      planDigest: String,
      durationNs: Long,
      outputRows: Option[Long],
      status: String,
      error: Option[String]
  )

  /** In-memory log handle; `entries` is safe to read concurrently. */
  final class QueryLog extends QueryExecutionListener {
    private val queue = new ConcurrentLinkedQueue[QueryRecord]()

    override def onSuccess(
        funcName: String,
        qe: QueryExecution,
        durationNs: Long
    ): Unit = {
      val rows = qe.executedPlan.metrics
        .get("numOutputRows")
        .map(_.value)
      queue.add(
        QueryRecord(
          funcName,
          qe.analyzed.simpleString(3),
          durationNs,
          rows,
          "success",
          None
        )
      )
    }

    override def onFailure(
        funcName: String,
        qe: QueryExecution,
        exception: Exception
    ): Unit =
      queue.add(
        QueryRecord(
          funcName,
          qe.analyzed.simpleString(3),
          0L,
          None,
          "error",
          Some(exception.getMessage)
        )
      )

    def entries: Seq[QueryRecord] = queue.asScala.toSeq
    def clear(): Unit = queue.clear()
  }

  /** Attach a fresh log to the session; caller keeps the handle. */
  def attach(spark: SparkSession): QueryLog = {
    val log = new QueryLog
    spark.listenerManager.register(log)
    log
  }

  def detach(spark: SparkSession, log: QueryLog): Unit =
    spark.listenerManager.unregister(log)
}
