package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Multi-level aggregation, window frames, multiset ops, packing. */
class GroupingSpec extends SparkSpec {
  import spark.implicits._

  test("rollup plans ONE Expand + aggregate, not a per-level rescan") {
    val df = operators.GroupingQueries.rollupQ(spark, sfDir)
    val plan = df.queryExecution.executedPlan
    def collectAll(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      (p.nodeName +: p.children.flatMap(collectAll)) ++ (p match {
        case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
        case _ => Nil
      })
    val nodes = collectAll(plan)
    assert(nodes.count(_.contains("Expand")) == 1,
      s"expected exactly one Expand, got: $nodes")
    // 3 levels for rollup(a, b): (a,b), (a), ()
    val gids = df.select("gid").distinct().as[Int].collect().sorted
    assert(gids.toSeq == Seq(0, 1, 3))
  }

  test("cube emits all four grouping levels with consistent totals") {
    val df = operators.GroupingQueries.cubeQ(spark, sfDir).cache()
    try {
      val grand = df.filter(col("gid") === 3).select("n").as[Long].head()
      val detail = df.filter(col("gid") === 0).agg(sum("n")).as[Long].head()
      assert(grand == detail && grand > 0)
    } finally df.unpersist()
  }

  test("exceptAll keeps multiplicity (multiset difference)") {
    val a = Seq(1, 1, 1, 2, 3).toDF("x")
    val b = Seq(1, 2, 2).toDF("x")
    val diff = a.exceptAll(b).as[Int].collect().sorted
    assert(diff.toSeq == Seq(1, 1, 3))
  }

  test("packing: every bin is filled past budget only by its last doc") {
    // A bin closes when cum crosses the budget, so bin_tokens may exceed the
    // budget by at most one document; all non-final bins must be non-empty
    // and bins are dense per lang starting at 0.
    val df = pipeline.PackingQueries.packBins(spark, sfDir).cache()
    try {
      val perLang = df.groupBy("lang")
        .agg(min("bin").as("lo"), max("bin").as("hi"), count(lit(1)).as("n"))
        .collect()
      perLang.foreach { r =>
        assert(r.getAs[Long]("lo") == 0L)
        assert(r.getAs[Long]("hi") == r.getAs[Long]("n") - 1, s"bins not dense: $r")
      }
      assert(df.filter(col("n_docs") <= 0).isEmpty)
    } finally df.unpersist()
  }

  test("deterministic sample is stable across repartitionings") {
    val q = operators.GroupingQueries.sampleMod
    val once = q(spark, sfDir).collect().toSet
    val again = q(spark, sfDir).repartition(7).collect().toSet
    assert(once == again && once.nonEmpty)
  }
}
