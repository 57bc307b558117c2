package graft

import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** The reference's targeted-stress sort workload
  * (testdata/workloads/targeted-stress/queries/sort_stress.test): one query
  * "designed to spill to disk with the memory limit set in the .py file" —
  * an ORDER BY over lineitem on a non-key prefix (l_comment) with LIMIT 100.
  *
  * The Spark-native pin: the same query must complete CORRECTLY through the
  * external-sort spill path. Spark's equivalents of the reference's
  * mem_limit knob here are `spark.sql.execution.topKSortFallbackThreshold`
  * (below the LIMIT, so the plan is a real global SortExec + limit rather
  * than an in-memory top-K heap — the operator the reference stresses) and
  * `spark.shuffle.spill.numElementsForceSpillThreshold` (forces the
  * UnsafeExternalSorter to spill every N records, the deterministic stand-in
  * for memory pressure). Asserted: the plan is a global sort, the sort
  * REALLY spilled (SortExec's spillSize metric), and the spilled result
  * equals the driver-side oracle ordering of the full table.
  */
class SortSpillSpec extends SparkSpec {

  private def findSorts(p: SparkPlan): Seq[SortExec] = {
    val out = scala.collection.mutable.ListBuffer.empty[SortExec]
    def walk(n: SparkPlan): Unit = {
      n match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan); return
        case q: QueryStageExec => walk(q.plan); return
        case s: SortExec => out += s
        case _ => ()
      }
      n.children.foreach(walk)
    }
    walk(p)
    out.toList
  }

  test("sort_stress: forced-spill external sort returns the exact top 100") {
    val li = Tables.table(spark, sfDir, "lineitem")
      .select("l_partkey", "l_extendedprice", "l_comment")
    li.createOrReplaceTempView("sort_stress_lineitem")

    // Driver-side oracle: the same total order, computed without touching
    // the sort-under-test (collect + sort in Scala).
    val expected = li.collect()
      .map(r => (r.getString(2), r.getLong(0), r.getDouble(1)))
      .sortBy(identity)
      .take(100)
      .map(t => (t._2, t._3))
      .toSeq

    val topK = spark.conf.get("spark.sql.execution.topKSortFallbackThreshold")
    val spillEvery =
      spark.conf.getOption("spark.shuffle.spill.numElementsForceSpillThreshold")
    spark.conf.set("spark.sql.execution.topKSortFallbackThreshold", "1")
    spark.conf.set("spark.shuffle.spill.numElementsForceSpillThreshold", "500")
    try {
      val df = spark.sql(
        """select l_partkey, l_extendedprice
          |from sort_stress_lineitem
          |order by l_comment, l_partkey, l_extendedprice
          |limit 100""".stripMargin)
      val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == expected, "spilled sort diverged from the oracle order")

      val sorts = findSorts(df.queryExecution.executedPlan)
      assert(sorts.exists(_.global),
        s"expected a global SortExec (top-K fallback did not disengage):\n" +
          df.queryExecution.executedPlan)
      val spilled = sorts.map(_.metrics("spillSize").value).sum
      assert(spilled > 0,
        s"sort completed without spilling — the forced-spill threshold " +
          s"did not engage (spillSize=0; rows=${li.count()})")
    } finally {
      spark.conf.set("spark.sql.execution.topKSortFallbackThreshold", topK)
      spillEvery match {
        case Some(v) => spark.conf
          .set("spark.shuffle.spill.numElementsForceSpillThreshold", v)
        case None => spark.conf
          .unset("spark.shuffle.spill.numElementsForceSpillThreshold")
      }
      spark.catalog.dropTempView("sort_stress_lineitem")
    }
  }

  test("sort_stress: full global sort (no limit) under forced spill") {
    val li = Tables.table(spark, sfDir, "lineitem")
    val spillEvery =
      spark.conf.getOption("spark.shuffle.spill.numElementsForceSpillThreshold")
    spark.conf.set("spark.shuffle.spill.numElementsForceSpillThreshold", "500")
    try {
      val df = li.select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
      val got = df.collect()
      assert(got.length == li.count())
      // strictly non-decreasing over the composite key
      val keys = got.map(r => (r.getLong(0), r.getInt(1)))
      assert(keys.zip(keys.tail).forall { case (a, b) =>
        a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2) },
        "spilled global sort produced out-of-order rows")
      val spilled = findSorts(df.queryExecution.executedPlan)
        .map(_.metrics("spillSize").value).sum
      assert(spilled > 0, "global sort did not spill under the forced budget")
    } finally {
      spillEvery match {
        case Some(v) => spark.conf
          .set("spark.shuffle.spill.numElementsForceSpillThreshold", v)
        case None => spark.conf
          .unset("spark.shuffle.spill.numElementsForceSpillThreshold")
      }
    }
  }
}
