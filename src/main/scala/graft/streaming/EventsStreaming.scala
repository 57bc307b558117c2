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

  /** Streaming exact dedup — the ingestion-side twin of the batch
    * [[graft.pipeline.DedupQueries.exact]] content-hash dedup: each row gets
    * a deterministic fingerprint, and `dropDuplicatesWithinWatermark` keeps
    * state only for the watermark horizon, so dedup state is bounded by
    * (ingest rate × horizon), not by stream history. At 100 TB/day ingest
    * this is the only shape that works: unbounded `dropDuplicates` state
    * grows forever, while a horizon matches the at-least-once redelivery
    * window of upstream queues. */
  def dedupWithinWatermark(events: DataFrame,
                           watermark: String = "10 minutes"): DataFrame =
    events
      // Null-safe fingerprint: JSON keeps field names and (with
      // ignoreNullFields=false) explicit nulls, so (a, NULL, c) and
      // (a, c, NULL) serialize differently -- concat_ws would skip the
      // null field and collide them.
      .withColumn("fingerprint",
        md5(to_json(
          struct(col("user_id"), col("event_type"), col("value")),
          Map("ignoreNullFields" -> "false"))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Stream-static enrichment: join the event stream against a static
    * dimension table. The static side is planned per micro-batch (and
    * broadcast when small), so dimension updates between batches are picked
    * up without restarting the query — the streaming analogue of the batch
    * dim joins. */
  def enrichWithUserDim(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(
      broadcast(userDim),
      events("user_id") === userDim("c_custkey"), "left_outer")

  /** Stream-stream interval join: pair each click with the same user's
    * purchases landing within `horizon` AFTER the click. Both sides carry a
    * watermark and the join condition bounds purchase-time relative to
    * click-time, so the state store retains each side only for
    * watermark + horizon — the join is feasible on unbounded streams
    * precisely because the time bound makes eviction provable. At 100 TB/day
    * the state is (ingest rate × horizon) per side, partitioned by user_id.
    *
    * `clicks`/`purchases` are event frames (schema of [[Event]]); column
    * prefixes keep the self-join unambiguous. */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame,
                      horizon: String = "15 minutes",
                      watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("click_ts"),
                          col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
                             col("event_id").as("purchase_id"),
                             col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    c.join(p,
      col("c_user") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
              col("click_ts"), col("purchase_ts"), col("purchase_value"))
  }

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
              // min/max, not assignment: an in-watermark late event older
              // than the stored end must not move the session end backward
              // (it would re-arm the timeout early and report a session
              // that ends before events it contains)
              cur = Some(s.copy(nEvents = s.nEvents + 1,
                totalValue = s.totalValue + e.value,
                start = math.min(s.start, t), end = math.max(s.end, t)))
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
