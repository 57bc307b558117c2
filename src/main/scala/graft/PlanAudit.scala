package graft

/** Maintenance tool: physical-plan audit over every registered query.
  *
  * Prints per-query join strategies, exchange counts, whole-stage-codegen
  * spans and scan pushdown so plan regressions (a dimension join falling
  * back to sort-merge, a filter failing to reach parquet) are visible
  * without reading full EXPLAIN output. Run:
  * `java -cp "target/scala-2.13/classes:/opt/spark/jars/ALL" graft.PlanAudit [sfDir]`
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("local[8]")
    val names = SparkEntry.queries.keys.toSeq.sorted
    println(f"${"query"}%-24s bcast smj shj bnl exch codegen pushedScans")
    names.foreach { name =>
      try {
        val plan = SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString
        // Note: under AQE the string is the initial adaptive plan, so
        // WholeStageCodegen spans appear as 0 — codegen is applied at
        // execution time per stage; use df.explain("codegen") to inspect.
        def c(s: String) = plan.linesIterator.count(_.contains(s))
        val pushed = plan.linesIterator
          .filter(_.contains("PushedFilters: ["))
          .count(!_.contains("PushedFilters: []"))
        println(f"$name%-24s ${c("BroadcastHashJoin")}%5d ${c("SortMergeJoin")}%3d " +
          f"${c("ShuffledHashJoin")}%3d ${c("BroadcastNestedLoopJoin")}%3d " +
          f"${c("Exchange")}%4d ${c("WholeStageCodegen")}%7d $pushed%11d")
      } catch {
        case e: Throwable =>
          println(f"$name%-24s ERROR ${Option(e.getMessage).getOrElse(e.toString).take(80)}")
      }
    }
    spark.stop()
  }
}
