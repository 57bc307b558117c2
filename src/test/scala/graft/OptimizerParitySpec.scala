package graft

import org.apache.spark.sql.functions._

/** Optimizer parity + scale-idiom assertions.
  *
  * The reference's frontend rewrites (SURVEY §4.1) all map to stock Catalyst
  * rules; these tests pin the ones that matter most at 100 TB, so a config
  * or plan regression that silently disables them fails loudly:
  *  - predicate propagation across join equivalence classes
  *    (reference: Analyzer.getBoundPredicates / ValueTransferGraph,
  *    fe/src/main/java/.../analysis/Analyzer.java:808-927,1553) —
  *    Catalyst `InferFiltersFromConstraints` + pushdown must land the
  *    inferred filter in the OTHER table's parquet scan;
  *  - dynamic partition pruning (runtime analogue of the reference's
  *    plan-time HdfsPartitionFilter, HdfsScanNode.java:128-160) — a
  *    selective dim filter must prune fact partitions at runtime;
  *  - runtime bloom-filter join pruning (beyond the reference; Impala grew
  *    runtime filters only later) — on a shuffle join, the big side's scan
  *    gets a `might_contain` filter built from the small side.
  */
class OptimizerParitySpec extends SparkSpec {

  private def executed(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter on one join side is inferred and pushed to the other side's scan") {
    val o = Tables.table(spark, sfDir, "orders").filter(col("o_orderkey") === 7)
    val l = Tables.table(spark, sfDir, "lineitem")
    val plan = executed(o.join(l, col("o_orderkey") === col("l_orderkey")))
    // The literal predicate was written against orders only; the lineitem
    // scan must still carry the inferred EqualTo on its own join key.
    assert(plan.contains("EqualTo(l_orderkey,7)"),
      s"inferred filter missing from lineitem scan:\n$plan")
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val base = tmp("graft_dpp")
    val dir = s"$base/fact"
    Tables.table(spark, sfDir, "orders")
      .write.partitionBy("o_orderstatus").parquet(dir)
    val fact = spark.read.parquet(dir)
    // The dim must be file-backed: a LocalRelation's filter constant-folds
    // to nothing, and DPP only fires off a surviving selective Filter node.
    spark.createDataFrame(Seq(("F", "finished"), ("X", "unused")))
      .toDF("status", "label").write.parquet(s"$base/dim")
    val dim = spark.read.parquet(s"$base/dim").filter(col("label") === "finished")
    val joined = fact.join(dim, col("o_orderstatus") === col("status"))
    val plan = executed(joined)
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning subquery in fact scan:\n$plan")
    assert(joined.count() ==
      Tables.table(spark, sfDir, "orders").filter(col("o_orderstatus") === "F").count())
  }

  test("runtime bloom filter injects might_contain on the shuffle-join big side") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val o = Tables.table(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val l = Tables.table(spark, sfDir, "lineitem")
      val joined = l.join(o, col("l_orderkey") === col("o_orderkey"))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"no runtime bloom filter on the probe side:\n$opt")
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
