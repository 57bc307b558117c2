package graft

/** Pins for [[Tables]]' corpus normalization. */
class TablesSpec extends SparkSpec {

  test("events ts normalization is session-zone independent and mutates no session conf") {
    val utc = Tables.table(spark, sfDir, "events")
      .select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap

    // An externally-created session on a non-UTC host: same SparkContext,
    // independent conf. The NTZ wall-clock must still be read as UTC
    // instants (the engine convention), and reading events must NOT
    // overwrite the session's own zone (the old fix silently did, changing
    // the semantics of every subsequent timestamp op in that session).
    val tokyo = spark.newSession()
    tokyo.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    val viaTokyo = Tables.table(tokyo, sfDir, "events")
      .select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap

    assert(tokyo.conf.get("spark.sql.session.timeZone") == "Asia/Tokyo",
      "reading events must not rewrite the session time zone")
    assert(viaTokyo == utc,
      "instants must be identical under any session zone")
    assert(utc.nonEmpty)
  }
}
