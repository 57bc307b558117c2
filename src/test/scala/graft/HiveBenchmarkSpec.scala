package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

import graft.operators.HiveBenchmarkQueries
import graft.plans.GraftSqlParser

/** The hive-benchmark (Pavlo) port: dialect parity for the `&&` spelling
  * and the plan shapes the workload exists to measure. Values are owned by
  * the DuckDB oracle (q_hb_* registry entries). */
class HiveBenchmarkSpec extends SparkSpec {

  test("C-style && parses as AND (sql-scanner.flex dialect)") {
    Tables.registerViews(spark, sfDir)
    val got = spark.sql(
      "select count(*) as cnt from part where p_size > 10 && p_size < 25")
      .head().getLong(0)
    val want = spark.sql(
      "select count(*) as cnt from part where p_size > 10 and p_size < 25")
      .head().getLong(0)
    assert(got == want && want > 0)
  }

  test("&& rewrite is quote-aware and leaves concat-|| alone") {
    assert(GraftSqlParser.rewriteAndAnd("a && b") == "a  AND  b")
    assert(GraftSqlParser.rewriteAndAnd("'x && y'") == "'x && y'")
    assert(GraftSqlParser.rewriteAndAnd("`a&&b` && c") == "`a&&b`  AND  c")
    assert(GraftSqlParser.rewriteAndAnd("'it''s' && 1") == "'it''s'  AND  1")
    assert(GraftSqlParser.rewriteAndAnd("a || b") == "a || b")
    // a genuinely bad statement still fails after the rewrite
    val e = intercept[Exception] {
      spark.sql("select * from t where (x && )")
    }
    assert(e.getMessage.toLowerCase.contains("syntax"))
  }

  test("WEB_Q1 joins the visits fact to a broadcast rankings dimension") {
    val plan = HiveBenchmarkQueries.webJoin(spark, sfDir)
      .queryExecution.executedPlan
    val inner = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(inner.collect { case b: BroadcastExchangeExec => b }.nonEmpty ||
      plan.toString.contains("BroadcastHashJoin"),
      s"rankings must broadcast:\n$plan")
  }

  test("GREP is a pure scan: no shuffle below the single aggregation") {
    val plan = HiveBenchmarkQueries.grepLike(spark, sfDir)
      .queryExecution.executedPlan.toString
    // one exchange for the global agg's partial->final is fine; a join or
    // repartition exchange is not
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"grep must not join:\n$plan")
  }
}
