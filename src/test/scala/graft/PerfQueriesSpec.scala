package graft

import org.apache.spark.sql.catalyst.expressions.{Contains, EndsWith, StartsWith}
import org.apache.spark.sql.execution.LocalTableScanExec

import graft.operators.PerfQueries

/** Plan-shape pins for the targeted-perf port (reference
  * `testdata/workloads/targeted-perf/queries/`): the suite exists to
  * measure scan/agg/string throughput, so the claims worth regression-
  * testing are the PLANS — pruning, predicate rewrites, the limit-0
  * fold — not the values (the DuckDB oracle owns those). */
class PerfQueriesSpec extends SparkSpec {

  test("AGG-Q6/Q7: unused inline-view sums prune down to a 2-column scan") {
    for (q <- Seq(PerfQueries.aggPruneView, PerfQueries.aggPruneWith)) {
      val plan = q(spark, sfDir).queryExecution.executedPlan.toString
      assert(plan.contains(
        "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint>"),
        s"scan must read only the two surviving columns:\n$plan")
    }
  }

  test("LIMIT 0 folds to an empty local relation — no scan at all") {
    val plan = PerfQueries.limit0(spark, sfDir).queryExecution.executedPlan
    assert(plan.collectLeaves().forall(_.isInstanceOf[LocalTableScanExec]),
      s"limit 0 must not plan a file scan:\n$plan")
  }

  test("string patterns rewrite to StartsWith/EndsWith/Contains primitives") {
    def predicates(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition
      }.flatMap(c => c +: c.children)
    def flat(df: org.apache.spark.sql.DataFrame) =
      predicates(df).flatMap(e => e +: e.collect { case x => x })
    assert(flat(PerfQueries.stringPrefix(spark, sfDir))
      .exists(_.isInstanceOf[StartsWith]), "prefix LIKE -> StartsWith")
    assert(flat(PerfQueries.stringSuffix(spark, sfDir))
      .exists(_.isInstanceOf[EndsWith]), "suffix LIKE -> EndsWith")
    assert(flat(PerfQueries.stringInfix(spark, sfDir))
      .exists(_.isInstanceOf[Contains]), "infix LIKE -> Contains")
  }

  test("pattern queries are non-vacuous: each LIKE matches rows at sf0.001") {
    // a pattern that matches nothing measures only the scan, not the
    // match-hit path; these counts also catch corpus drift
    for ((name, q) <- Seq(
        "prefix" -> PerfQueries.stringPrefix,
        "suffix" -> PerfQueries.stringSuffix,
        "infix" -> PerfQueries.stringInfix)) {
      val n = q(spark, sfDir).head().getLong(0)
      assert(n > 0, s"$name pattern matched no documents at sf0.001")
    }
  }
}
