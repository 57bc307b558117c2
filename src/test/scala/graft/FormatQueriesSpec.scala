package graft

import graft.sources.FormatQueries

/** Local oracle for the format round-trip queries: each must return the
  * supplier table byte-identically to the parquet scan it started from —
  * same rows, same values, same schema. The driver repeats this check
  * against DuckDB; this spec catches lossy writer/scanner pairs first.
  */
class FormatQueriesSpec extends SparkSpec {

  private def expected = Tables.table(spark, sfDir, "supplier")
    .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    .orderBy("s_suppkey")

  private def expectedTs = {
    import org.apache.spark.sql.functions.col
    Tables.table(spark, sfDir, "orders")
      .where(col("o_orderkey") <= 4000)
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .orderBy("o_orderkey")
  }

  for ((name, fn) <- FormatQueries.all) {
    test(s"$name is a lossless round-trip") {
      val expected = if (name == "q_fmt_text_ts") expectedTs else this.expected
      val got = fn(spark, sfDir)
      assert(got.schema == expected.schema,
        s"$name schema drift: ${got.schema.treeString}")
      val e = expected.collect()
      val g = got.collect()
      assert(g.length == e.length)
      g.zip(e).foreach { case (a, b) => assert(a == b, s"$name row: $a != $b") }
    }
  }
}
