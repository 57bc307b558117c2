package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Dialect function-pack behavior, driven through the SQL surface (the way
  * an Impala user would call them) against an externally built session. */
class FunctionsSpec extends SparkSpec {

  private def sql1(q: String): Row = {
    Tables.registerViews(spark, sfDir)
    spark.sql(q).head()
  }

  test("distinctpc / distinctpcsa estimate within FM error bounds") {
    Tables.registerViews(spark, sfDir)
    val r = spark.sql(
      """SELECT distinctpc(l_partkey) AS pc, distinctpcsa(l_partkey) AS pcsa,
        |       count(DISTINCT l_partkey) AS exact
        |FROM lineitem""".stripMargin).head()
    val (pc, pcsa, exact) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // FM with 64 bitmaps: stddev ≈ 0.78/sqrt(64) ≈ 10%; allow 3σ.
    assert(math.abs(pc - exact).toDouble / exact < 0.35, s"pc=$pc exact=$exact")
    assert(math.abs(pcsa - exact).toDouble / exact < 0.35, s"pcsa=$pcsa exact=$exact")
  }

  test("distinctpc estimates are deterministic across runs and partitioning") {
    Tables.registerViews(spark, sfDir)
    val q = "SELECT distinctpcsa(l_suppkey) FROM lineitem"
    val a = spark.sql(q).head().getLong(0)
    val b = spark.sql(q).head().getLong(0)
    assert(a == b)
  }

  test("term_counts equals explode+groupBy on the documents corpus, " +
      "null and empty tokens handled") {
    import spark.implicits._
    // semantic twin of the aggregate shape it replaces in q_text_tfidf
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
    val viaExpr = d
      .select(col("doc_id"), explode(graft.functions.TermCounts(col("toks"))))
      .select(col("doc_id"), col("key").as("term"), col("value").as("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val viaAgg = d
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(viaExpr == viaAgg)
    // edge rows: repeats counted, null elements skipped, empty map on
    // empty array, null array → null (nullIntolerant)
    val edge = Seq(
      (1L, Seq("a", "b", "a", "a")),
      (2L, Seq.empty[String]),
    ).toDF("id", "toks")
    val m = edge.select(col("id"), graft.functions.TermCounts(col("toks")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getMap[String, Long](1)).toMap
    assert(m(1L) == Map("a" -> 3L, "b" -> 1L))
    assert(m(2L).isEmpty)
    val viaCol = Seq(Tuple1(Seq[String]("x", null, "x"))).toDF("toks")
      .select(graft.functions.TermCounts(col("toks")).as("m"))
      .head().getMap[String, Long](0)
    assert(viaCol == Map("x" -> 2L))
  }

  test("group_concat concatenates with separator, null-safe") {
    val r = sql1(
      "SELECT group_concat(n_name, '|') FROM nation WHERE n_regionkey = 0")
    val parts = r.getString(0).split("\\|").sorted.toSeq
    val expected = Tables.table(spark, sfDir, "nation")
      .filter(col("n_regionkey") === 0).select("n_name")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(parts == expected)
    // default separator
    val r2 = sql1("SELECT group_concat(n_name) FROM nation WHERE n_regionkey = 0")
    assert(r2.getString(0).split(", ").length == expected.length)
  }

  test("timestamp interval family matches direct interval arithmetic") {
    val r = sql1(
      """SELECT years_add(TIMESTAMP '2000-02-29 10:00:00', 1) AS ya,
        |       months_sub(TIMESTAMP '2000-03-31 00:00:00', 1) AS ms,
        |       days_add(TIMESTAMP '2000-12-31 23:00:00', 1) AS da,
        |       hours_add(TIMESTAMP '2000-01-01 23:30:00', 2) AS ha,
        |       milliseconds_add(TIMESTAMP '2000-01-01 00:00:00', 1500) AS msa
        |""".stripMargin)
    assert(r.getTimestamp(0).toString == "2001-02-28 10:00:00.0")
    assert(r.getTimestamp(1).toString == "2000-02-29 00:00:00.0")
    assert(r.getTimestamp(2).toString == "2001-01-01 23:00:00.0")
    assert(r.getTimestamp(3).toString == "2000-01-02 01:30:00.0")
    assert(r.getTimestamp(4).toString == "2000-01-01 00:00:01.5")
  }

  test("trunc accepts Impala unit spellings") {
    val r = sql1(
      """SELECT trunc(TIMESTAMP '2000-05-17 13:45:23', 'YYYY') AS y,
        |       trunc(TIMESTAMP '2000-05-17 13:45:23', 'MM') AS m,
        |       trunc(TIMESTAMP '2000-05-17 13:45:23', 'DD') AS d,
        |       trunc(TIMESTAMP '2000-05-17 13:45:23', 'HH') AS h""".stripMargin)
    assert(r.getTimestamp(0).toString == "2000-01-01 00:00:00.0")
    assert(r.getTimestamp(1).toString == "2000-05-01 00:00:00.0")
    assert(r.getTimestamp(2).toString == "2000-05-17 00:00:00.0")
    assert(r.getTimestamp(3).toString == "2000-05-17 13:00:00.0")
  }

  test("trunc week-family units follow the reference's StrToTruncUnit") {
    // 2000-05-17 is a Wednesday. DAY/DY/D = previous Monday
    // (TruncDayOfWeek); Q = quarter; W = back to the weekday of the
    // month's first day (May 1st 2000 = Monday); WW = back to the weekday
    // of the year's first day (Jan 1st 2000 = Saturday → 2000-05-13).
    val r = sql1(
      """SELECT trunc(TIMESTAMP '2000-05-17 13:45:23', 'DAY') AS dw,
        |       trunc(TIMESTAMP '2000-05-17 13:45:23', 'DY') AS dw2,
        |       trunc(TIMESTAMP '2000-05-17 13:45:23', 'Q') AS q,
        |       trunc(TIMESTAMP '2000-05-17 13:45:23', 'W') AS w,
        |       trunc(TIMESTAMP '2000-05-17 13:45:23', 'WW') AS ww,
        |       trunc(TIMESTAMP '2000-05-17 13:45:23', 'J') AS j""".stripMargin)
    assert(r.getTimestamp(0).toString == "2000-05-15 00:00:00.0")
    assert(r.getTimestamp(1).toString == "2000-05-15 00:00:00.0")
    assert(r.getTimestamp(2).toString == "2000-04-01 00:00:00.0")
    assert(r.getTimestamp(3).toString == "2000-05-15 00:00:00.0")
    assert(r.getTimestamp(4).toString == "2000-05-13 00:00:00.0")
    assert(r.getTimestamp(5).toString == "2000-05-17 00:00:00.0")
  }

  test("quotient truncates each operand first, like the reference") {
    // expr-test.cc:2125-2130: quotient casts BOTH operands to int64 and
    // divides — quotient(30.5, 2.5) = 30/2 = 15, not int(30.5/2.5) = 12
    val r = sql1("SELECT quotient(12, 6), quotient(-12, 6), " +
      "quotient(30.5, 2.5), quotient(-30.5, 2.5), quotient(-12, 0)")
    assert(r.getLong(0) == 2 && r.getLong(1) == -2)
    assert(r.getLong(2) == 15 && r.getLong(3) == -15)
    assert(r.isNullAt(4))
  }

  test("decimal precision/scale/truncate semantics") {
    val r = sql1(
      """SELECT precision(CAST(1.5 AS DECIMAL(10,3))) AS p,
        |       scale(CAST(1.5 AS DECIMAL(10,3))) AS s,
        |       truncate(CAST(3.789 AS DECIMAL(10,3)), 1) AS t_pos,
        |       truncate(CAST(-3.789 AS DECIMAL(10,3)), 1) AS t_neg,
        |       truncate(CAST(9.99 AS DECIMAL(10,2)), 0) AS t_zero""".stripMargin)
    assert(r.getInt(0) == 10)
    assert(r.getInt(1) == 3)
    assert(r.getDecimal(2).compareTo(new java.math.BigDecimal("3.7")) == 0)
    // toward zero, not floor: -3.789 → -3.7
    assert(r.getDecimal(3).compareTo(new java.math.BigDecimal("-3.7")) == 0)
    assert(r.getDecimal(4).compareTo(new java.math.BigDecimal("9")) == 0)
  }

  test("conditional aliases: isnull both arities, zeroifnull, nullifzero, quotient") {
    val r = sql1(
      """SELECT isnull(NULL, 'fallback') AS i2,
        |       isnull(NULL) AS i1,
        |       zeroifnull(CAST(NULL AS INT)) AS z,
        |       nullifzero(0.0) AS nz,
        |       quotient(17, 5) AS q,
        |       strleft('impala', 3) AS sl,
        |       strright('impala', 3) AS sr,
        |       is_inf(CAST('Infinity' AS DOUBLE)) AS inf""".stripMargin)
    assert(r.getString(0) == "fallback")
    assert(r.getBoolean(1))
    assert(r.getInt(2) == 0)
    assert(r.isNullAt(3))
    assert(r.getLong(4) == 3L)
    assert(r.getString(5) == "imp")
    assert(r.getString(6) == "ala")
    assert(r.getBoolean(7))
  }

  test("utility trivia: user/effective_user/version/pid/sleep") {
    // `user` and `version` shadow Spark built-ins, so the dialect spellings
    // live under the impala_ prefix in a shared session (register() policy).
    val r = sql1(
      """SELECT impala_user() AS u, effective_user() AS eu,
        |       impala_version() AS v, pid() AS p""".stripMargin)
    assert(r.getString(0).nonEmpty)
    assert(r.getString(1) == r.getString(0))
    assert(r.getString(2).startsWith("graft (spark "))
    assert(r.getInt(3) == ProcessHandle.current().pid().toInt)

    val t0 = System.nanoTime()
    assert(sql1("SELECT sleep(120) AS ok").getBoolean(0))
    assert((System.nanoTime() - t0) / 1e6 >= 120,
      "sleep(120) must block at least 120 ms")
  }
}
