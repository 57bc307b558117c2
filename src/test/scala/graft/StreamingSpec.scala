package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventsStreaming
import graft.streaming.EventsStreaming.Event

class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed aggregation over a memory stream produces hourly buckets") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventsStreaming.windowedAggregates(input.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .start()
    input.addData(
      Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:45:00"), 2, "click", 2.0),
      Event(3, ts("2024-01-01 11:05:00"), 1, "view", 4.0),
      Event(4, ts("2024-01-01 11:20:00"), 3, "click", 8.0))
    query.processAllAvailable()
    query.stop()
    val out = spark.table("win_out").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out == Set(
      ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
      ("2024-01-01 11:00:00.0", "view", 1L, 4.0),
      ("2024-01-01 11:00:00.0", "click", 1L, 8.0)))
  }

  test("watermark drops events later than the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventsStreaming.windowedAggregates(
        input.toDF(), watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("wm_out").start()
    // Batch 1 advances the watermark to 11:50; batch 2's 09:00 event is
    // older than the horizon and must be dropped, not aggregated.
    input.addData(Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
                  Event(2, ts("2024-01-01 12:00:00"), 2, "click", 2.0))
    query.processAllAvailable()
    input.addData(Event(3, ts("2024-01-01 09:00:00"), 3, "click", 99.0))
    query.processAllAvailable()
    input.addData(Event(4, ts("2024-01-01 14:00:00"), 1, "view", 1.0))
    query.processAllAvailable()
    query.stop()
    val emitted = spark.table("wm_out").collect()
      .map(r => (r.getTimestamp(0).toString, r.getDouble(3))).toMap
    assert(emitted.contains("2024-01-01 10:00:00.0"))
    assert(emitted("2024-01-01 10:00:00.0") == 1.0,
      "late 09:00 event must not leak into emitted state")
  }

  test("stateful sessionization groups per-user event bursts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventsStreaming.sessionize(input.toDS(), gapSeconds = 600)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    // User 1: two bursts 2h apart → first burst closes when the second
    // arrives. User 2: one burst → closes via event-time timeout once the
    // watermark passes its end + gap. User 3's far-future event drives the
    // watermark forward so the timeout fires.
    input.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:05:00"), 1, "click", 2.0),
      Event(3, ts("2024-01-01 10:02:00"), 2, "view", 5.0))
    query.processAllAvailable()
    input.addData(Event(4, ts("2024-01-01 12:00:00"), 1, "click", 4.0))
    query.processAllAvailable()
    input.addData(Event(5, ts("2024-01-01 18:00:00"), 3, "view", 0.5))
    query.processAllAvailable()
    query.stop()
    val sessions = spark.table("sess_out").as[EventsStreaming.SessionSummary]
      .collect()
    val u1 = sessions.filter(_.user_id == 1)
    assert(u1.exists(s => s.n_events == 2 && s.total_value == 3.0),
      s"first burst of user 1 not closed correctly: ${sessions.toSeq}")
    val u2 = sessions.filter(_.user_id == 2)
    assert(u2.length == 1 && u2.head.n_events == 1 && u2.head.total_value == 5.0,
      s"user 2 session must close via event-time timeout: ${sessions.toSeq}")
    assert(!sessions.exists(_.user_id == 3), "user 3 session is still open")
  }

  test("a late in-watermark event must not move the session end backward") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventsStreaming.sessionize(input.toDS(), gapSeconds = 600)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_late_out").start()
    // Batch 1: event at 10:09. Batch 2: a LATE event at 10:00 (inside the
    // 10-min watermark horizon) joins the same session — regression: it
    // once overwrote end=10:00, reporting a session ending before its
    // latest event and re-arming the timeout 9 minutes early. Batch 3
    // closes the session via the watermark.
    input.addData(Event(1, ts("2024-01-01 10:09:00"), 1, "click", 1.0))
    query.processAllAvailable()
    input.addData(Event(2, ts("2024-01-01 10:00:00"), 1, "click", 2.0))
    query.processAllAvailable()
    input.addData(Event(3, ts("2024-01-01 18:00:00"), 9, "view", 0.0))
    query.processAllAvailable()
    query.stop()
    val s = spark.table("sess_late_out").as[EventsStreaming.SessionSummary]
      .collect().filter(_.user_id == 1)
    assert(s.length == 1, s"expected one closed session: ${s.toSeq}")
    assert(s.head.n_events == 2 && s.head.total_value == 3.0, s.head.toString)
    assert(s.head.start.toString.contains("10:00:00") &&
      s.head.end.toString.contains("10:09:00"),
      s"late event corrupted the boundaries: ${s.head}")
  }

  test("streaming dedup drops redelivered rows within the watermark horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventsStreaming.dedupWithinWatermark(input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    // Same (user, type, value) delivered twice in-batch and once redelivered
    // in the next batch while still inside the horizon → one survivor.
    input.addData(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:00:01"), 1, "click", 1.0),
      Event(3, ts("2024-01-01 10:00:02"), 2, "view", 2.0))
    query.processAllAvailable()
    input.addData(Event(4, ts("2024-01-01 10:01:00"), 1, "click", 1.0))
    query.processAllAvailable()
    query.stop()
    val out = spark.table("dedup_out").collect()
    assert(out.length == 2,
      s"expected 2 unique rows, got ${out.length}: ${out.toSeq}")
    assert(out.map(_.getAs[Long]("user_id")).toSet == Set(1L, 2L))
  }

  test("stream-static join enriches events with the customer dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Tables.table(spark, sfDir, "customer")
    val someCust = dim.select("c_custkey").as[Long].head()
    val input = MemoryStream[Event]
    val query = EventsStreaming.enrichWithUserDim(input.toDF(), dim)
      .select("event_id", "user_id", "c_name", "c_mktsegment")
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    input.addData(
      Event(1, ts("2024-01-01 10:00:00"), someCust, "click", 1.0),
      Event(2, ts("2024-01-01 10:00:01"), -999L, "view", 2.0)) // no dim match
    query.processAllAvailable()
    query.stop()
    val out = spark.table("enrich_out").collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(out(1L).isDefined, "matched event must carry the dim columns")
    assert(out(2L).isEmpty, "unmatched event must survive with NULL dim (left outer)")
  }

  test("stream-stream interval join pairs clicks with in-horizon purchases") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val query = EventsStreaming
      .clickToPurchase(clicks.toDF(), purchases.toDF(), horizon = "15 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_join_out").start()
    clicks.addData(
      Event(10, ts("2024-01-01 10:00:00"), 1, "click", 0.0),
      Event(11, ts("2024-01-01 10:00:00"), 2, "click", 0.0))
    purchases.addData(
      Event(20, ts("2024-01-01 10:10:00"), 1, "purchase", 9.99), // in horizon
      Event(21, ts("2024-01-01 10:30:00"), 2, "purchase", 5.00), // too late
      Event(22, ts("2024-01-01 09:59:00"), 1, "purchase", 1.00)) // before click
    query.processAllAvailable()
    // advance both watermarks so joined rows are emitted in append mode
    clicks.addData(Event(12, ts("2024-01-01 11:30:00"), 3, "click", 0.0))
    purchases.addData(Event(23, ts("2024-01-01 11:30:00"), 4, "noise", 0.0))
    query.processAllAvailable()
    query.stop()
    val out = spark.table("ss_join_out")
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(out == Set((10L, 20L)),
      s"only the in-horizon purchase after its click may match, got $out")
  }
}
