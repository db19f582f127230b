package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input event for stateful sessionization. */
final case class SessionEvent(user_id: Long, ts_us: Long)

/** Per-user session accumulator carried across micro-batches. */
final case class SessionState(
    lastTsUs: Long,
    nSessions: Long,
    nEvents: Long
)

/** Emitted summary row. */
final case class SessionSummary(user_id: Long, n_sessions: Long, n_events: Long)

/** Custom streaming state via `flatMapGroupsWithState`: gap-based session
  * counting that works incrementally — the stateful twin of
  * [[EventOps.sessionize]] (which needs the whole history in one window).
  * State per key is three longs — bounded regardless of stream length,
  * the property that matters when the stream is 100 TB/day.
  */
object StatefulSessions {

  def updateState(gapUs: Long)(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[SessionState]
  ): Iterator[SessionSummary] = {
    val sorted = events.toSeq.sortBy(_.ts_us)
    var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
    sorted.foreach { e =>
      val newSession = st.lastTsUs == Long.MinValue || e.ts_us - st.lastTsUs > gapUs
      st = SessionState(
        lastTsUs = e.ts_us,
        nSessions = st.nSessions + (if (newSession) 1 else 0),
        nEvents = st.nEvents + 1
      )
    }
    state.update(st)
    Iterator(SessionSummary(userId, st.nSessions, st.nEvents))
  }

  /** Run the stateful sessionization over a (micro-batched) event stream.
    * Update mode: each batch emits the refreshed per-user summary.
    */
  def sessionStream(
      spark: SparkSession,
      events: DataFrame,
      gapSec: Long = 1800
  ): Dataset[SessionSummary] = {
    import spark.implicits._
    events
      .select(
        col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("ts_us")
      )
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update,
        GroupStateTimeout.NoTimeout
      )(updateState(gapSec * 1000000L))
  }
}
