package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of picks the latest prior-or-equal right row per key") {
    import spark.implicits._
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), 100L),
      (1L, ts("2024-01-01 10:00:10"), 101L),
      (2L, ts("2024-01-01 10:00:01"), 200L))
      .toDF("user_id", "ts", "event_id")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 900L),
      (1L, ts("2024-01-01 10:00:05"), 901L), // equal time: included (<=)
      (1L, ts("2024-01-01 10:00:07"), 902L),
      (2L, ts("2024-01-01 10:00:02"), 950L)) // after the only trade: excluded
      .toDF("user_id", "ts", "event_id")

    val got = AsOfJoin.asOfIds(trades, quotes, "user_id", "ts", "event_id")
      .select("event_id", "asof_event_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got == Map(100L -> 901L, 101L -> 902L, 200L -> -1L))
  }

  test("as-of output keeps exactly the left rows") {
    val out = AsOfJoin.purchasesAsOfClicks(spark, sfDir)
    val purchases = Tables.table(spark, sfDir, "events")
      .filter(col("event_type") === "purchase").count()
    assert(out.count() == purchases)
  }
}
