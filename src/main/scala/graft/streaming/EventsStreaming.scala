package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DoubleType

/** Structured Streaming over the events stream.
  *
  * The reference engine has no streaming surface at all (SURVEY §2.10) —
  * this is a capability extension built on Spark's native incremental
  * engine: the same `DataFrame` transforms as the batch queries
  * ([[graft.operators.WindowQueries.eventsWindow]] is the batch twin of
  * [[windowedAggregates]]), executed incrementally with watermark-bounded
  * state.
  *
  * Scale notes: state size is bounded by (watermark horizon × key
  * cardinality); the shuffle keys on (window, event_type) — the same
  * partial/final hash-agg shape as batch. Sessionization keeps one small
  * state object per user_id and emits on timeout, so state is O(active
  * users), not O(events).
  */
object EventsStreaming {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionSummary(user_id: Long, n_events: Int,
                            total_value: Double, start: Timestamp, end: Timestamp)
  case class SessionState(nEvents: Int, totalValue: Double,
                          start: Long, end: Long)

  /** Tumbling event-time window aggregation with a 10-minute watermark:
    * late events beyond the watermark are dropped, state is evicted as the
    * watermark advances. */
  def windowedAggregates(events: DataFrame,
                         windowLen: String = "1 hour",
                         watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(DoubleType)).as("total_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
              col("n"), col("total_value"))

  /** Per-user sessionization with explicit state: a session closes after
    * `gapSeconds` of event-time silence. Emission is driven by EVENT-time
    * timeouts against the watermark — processing-time timeouts would force
    * the engine to run continuous empty microbatches just to poll timers
    * (and `processAllAvailable` never quiesces); with event time, state
    * fires exactly when the watermark passes session-end + gap.
    * The streaming analogue of the batch gap-detection query
    * ([[graft.operators.WindowQueries.sessionize]]). */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800)
      : Dataset[SessionSummary] = {
    import events.sparkSession.implicits._

    def update(userId: Long, rows: Iterator[Event],
               state: GroupState[SessionState]): Iterator[SessionSummary] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(SessionSummary(userId, s.nEvents, s.totalValue,
          new Timestamp(s.start), new Timestamp(s.end)))
      } else {
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        var closed = List.empty[SessionSummary]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.end <= gapSeconds * 1000 =>
              cur = Some(s.copy(nEvents = s.nEvents + 1,
                totalValue = s.totalValue + e.value, end = t))
            case Some(s) =>
              closed ::= SessionSummary(userId, s.nEvents, s.totalValue,
                new Timestamp(s.start), new Timestamp(s.end))
              cur = Some(SessionState(1, e.value, t, t))
            case None =>
              cur = Some(SessionState(1, e.value, t, t))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // A late-arriving burst can put end+gap behind the current
          // watermark; setTimeoutTimestamp rejects past timestamps, so clamp
          // just ahead of the watermark (fires in the next batch).
          val wm = state.getCurrentWatermarkMs()
          state.setTimeoutTimestamp(math.max(s.end + gapSeconds * 1000, wm + 1))
        }
        closed.reverseIterator
      }
    }

    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
