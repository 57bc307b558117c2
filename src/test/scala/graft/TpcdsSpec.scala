package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.operators.TpcdsQueries

/** Semantic invariants for the TPC-DS-shaped queries (the driver's DuckDB
  * oracle does the bit-exact check; these assert the defining shape
  * properties hold at sf0.001). */
class TpcdsSpec extends SparkSpec {

  test("qds43 pivot: one row per nation, day columns partition total sales") {
    val out = TpcdsQueries.qds43Pivot(spark, sfDir).collect()
    val nations = Tables.table(spark, sfDir, "nation").count()
    assert(out.length == nations)
    // Sum of the 7 pivot columns equals total order value per nation join.
    val pivotTotal = out.flatMap(r => (1 to 7).map(i =>
      if (r.isNullAt(i)) BigDecimal(0) else BigDecimal(r.getDouble(i)))).sum
    val direct = Tables.table(spark, sfDir, "orders")
      .join(Tables.table(spark, sfDir, "customer"),
            org.apache.spark.sql.functions.col("o_custkey") ===
            org.apache.spark.sql.functions.col("c_custkey"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(12, 2))))
      .collect()(0).getDecimal(0)
    assert((pivotTotal - BigDecimal(direct)).abs < BigDecimal(0.01) * out.length)
  }

  test("qds59 week-over-week: every output week is in 1997 and ratio = cur/prev") {
    val rows = TpcdsQueries.qds59Wow(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getTimestamp(1).toLocalDateTime.getYear == 1997)
      val cur = r.getDouble(2); val prev = r.getDouble(3)
      assert(r.getDouble(4) == cur / prev)
    }
  }

  test("qds65: every surviving pair is at most half its supplier average") {
    val rows = TpcdsQueries.qds65BelowAvg(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) <= r.getDouble(3) * 0.5))
  }

  test("qds34: counts stay inside the [9,13] band") {
    val rows = TpcdsQueries.qds34CountRange(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) >= 9 && r.getLong(3) <= 13))
  }

  test("qds8: only popular type prefixes contribute") {
    // 4 of the 6 type prefixes pass the 16% threshold in the corpus; the
    // brand rollup must therefore see strictly fewer lines than the
    // unfiltered join.
    val filtered = TpcdsQueries.qds8PrefixJoin(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_lines")).collect()(0).getLong(0)
    val total = Tables.table(spark, sfDir, "lineitem").count()
    assert(filtered > 0 && filtered < total)
  }

  test("qds98: shares sum to 100 within each type") {
    val byType = TpcdsQueries.qds98Share(spark, sfDir).collect()
      .groupBy(_.getString(0))
    assert(byType.nonEmpty)
    byType.values.foreach { rs =>
      val share = rs.map(_.getDouble(3)).sum
      assert(math.abs(share - 100.0) < 1e-6)
    }
  }

  test("qds89: all rows deviate >10% from their brand's monthly average") {
    val rows = TpcdsQueries.qds89WindowDev(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getDouble(2); val a = r.getDouble(3)
      assert(math.abs(s - a) > a * 0.1)
    }
  }

  // ---- wave 2: the remaining reference workload files ----

  test("qds19: the substr non-equi residual filters but is not vacuous") {
    // Chosen on the trailing key digits: the leading digits of the padded
    // Customer#/Supplier# names are constant, which would make a <> filter
    // on them silently drop every row (pinned here so the query can never
    // regress into comparing a constant prefix).
    val rows = operators.TpcdsWave2Queries.qds19BrandNonequi(spark, sfDir).collect()
    assert(rows.nonEmpty)
  }

  test("qds46/qds68: every surviving row bought outside its current nation") {
    Seq(operators.TpcdsWave2Queries.qds46BoughtCity,
        operators.TpcdsWave2Queries.qds68ThreeSums).foreach { q =>
      val rows = q(spark, sfDir).collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getString(1) != r.getString(2)))
    }
  }

  test("qds73: counts stay inside the [1,3] band under the priority filter") {
    val rows = operators.TpcdsWave2Queries.qds73CountRange2(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= 1 && r.getLong(3) <= 3)
      assert(Seq("1-URGENT", "2-HIGH").contains(r.getString(1)))
    }
  }

  test("qds96 counts the star without materializing columns") {
    val rows = operators.TpcdsWave2Queries.qds96CountJoin(spark, sfDir).collect()
    assert(rows.length == 1 && rows(0).getLong(0) > 0)
  }

  test("qds_count sweeps every corpus table with nonzero cardinality") {
    val rows = operators.TpcdsWave2Queries.qdsCount(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getLong(1) > 0, r.getString(0)))
    val li = rows.find(_.getString(0) == "lineitem").get.getLong(1)
    assert(li == Tables.table(spark, sfDir, "lineitem").count())
  }

  test("qds7/qds27 plan: all dimension joins broadcast") {
    // The fact side must never shuffle for these star aggs: part, supplier
    // and nation are dimension-bounded at any corpus scale.
    Seq(operators.TpcdsWave2Queries.qds7Avg4,
        operators.TpcdsWave2Queries.qds27Avg4State).foreach { q =>
      val df = q(spark, sfDir)
      df.collect()
      val plan = (df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
      assert(plan.contains("BroadcastHashJoin"), plan)
      assert(!plan.contains("SortMergeJoin"), plan)
    }
  }

  test("qds98 plan: window runs over the aggregate, not the fact table") {
    // The window stage must consume dimension-sized (post-agg) data: the
    // Window node sits above the HashAggregate in the physical plan.
    val plan = TpcdsQueries.qds98Share(spark, sfDir).queryExecution.executedPlan
    val s = (plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    val winIdx = s.indexOf("Window")
    val aggIdx = s.indexOf("HashAggregate")
    assert(winIdx >= 0 && aggIdx >= 0 && winIdx < aggIdx,
      s"expected Window above HashAggregate:\n$s")
  }
}
