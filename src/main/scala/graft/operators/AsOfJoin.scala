package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the most recent right row (by event
  * time) with the same key — the standard event-to-dimension-state /
  * trade-to-quote primitive. The reference engine has nothing comparable;
  * DuckDB grew a native ASOF JOIN (used as the oracle).
  *
  * Implementation is the union-carry-forward composition rather than a
  * custom operator: union both sides tagged, sort within (key) by time, and
  * carry the last right-row id forward with a running `last(...ignoreNulls)`
  * window. One shuffle on the key, one local sort — the same cost as the
  * sort-merge join an engine-native as-of would do, with no custom exec to
  * maintain. (Preference order (a): compose existing ops when semantics
  * allow — SURVEY build guidance.)
  */
object AsOfJoin {

  /** For each left row, the id-column value of the latest right row with
    * `right.time <= left.time` and equal key (NULL when none). Returns the
    * left frame + `asof_<idCol>`. */
  def asOfIds(left: DataFrame, right: DataFrame, key: String, time: String,
              idCol: String): DataFrame = {
    val l = left.select(col(key), col(time),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__lrow"),
      lit(null).cast(right.schema(idCol).dataType).as("__rid"))
    val r = right.select(col(key), col(time),
      lit(null).cast(l.schema("__lrow").dataType).as("__lrow"),
      col(idCol).as("__rid"))
    // Right rows sort before left rows at equal time so "<=" includes them.
    val tagged = l.withColumn("__tag", lit(1)).union(
      r.withColumn("__tag", lit(0)))
    // __rid as the final key: among right rows tied on (time), last() must
    // pick deterministically (the max id), not by partition arrival order
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__tag"), col("__rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("__asof", last(col("__rid"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col("__lrow.*"), col("__asof").as(s"asof_$idCol"))
  }

  /** Each purchase event joined as-of to the user's latest prior-or-equal
    * click (oracle: DuckDB native ASOF LEFT JOIN). */
  val purchasesAsOfClicks: QueryFn = (s, dir) => {
    val e = t(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    asOfIds(purchases, clicks, key = "user_id", time = "ts", idCol = "event_id")
      .select(col("event_id"), col("user_id"),
              col("asof_event_id").as("last_click_id"))
      .orderBy(col("event_id"))
  }
  // ts is CAST to µs TIMESTAMP on both sides: Spark reads the parquet NANOS
  // column truncated to µs, so the oracle must compare at the same precision
  // or a click/purchase landing in the same microsecond could order
  // differently.
  val purchasesAsOfClicksSql: String =
    """SELECT p.event_id, p.user_id, c.event_id AS last_click_id
      |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      |      WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      |                WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin

  val all: Map[String, QueryFn] = Map(
    "q_asof_join" -> purchasesAsOfClicks)
  val oracle: Map[String, String] = Map(
    "q_asof_join" -> purchasesAsOfClicksSql)
}
