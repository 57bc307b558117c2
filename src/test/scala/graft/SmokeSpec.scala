package graft

class SmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query runs and every oracle key has a query") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"oracle without query: $k"))
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.count() // must execute
    }
  }

  test("q1 aggregates match a hand check") {
    val rows = operators.TpchQueries.q1Agg(spark, sfDir).collect()
    assert(rows.length > 0)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val li = Tables.table(spark, sfDir, "lineitem")
    val expected = li.filter("l_shipdate <= timestamp'1998-09-02'").count()
    assert(total == expected)
  }
}
