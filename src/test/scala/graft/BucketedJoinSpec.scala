package graft

import org.apache.spark.sql.functions._

/** Bucketing = pre-shuffled, co-located storage: both sides bucketed on the
  * join key join WITHOUT any exchange — at 100 TB this turns every repeated
  * fact-to-fact join on the same key into a shuffle-free map-side join,
  * amortizing one write-time shuffle across all future reads. The Spark
  * analogue of pre-partitioned co-located joins the reference's planner
  * could only get via matching scan partitioning. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bkt")
    spark.sql("DROP TABLE IF EXISTS graft_bkt.orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_bkt.lineitem_b")

    Tables.table(spark, sfDir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_bkt.orders_b")
    Tables.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_bkt.lineitem_b")

    val o = spark.table("graft_bkt.orders_b")
    val l = spark.table("graft_bkt.lineitem_b")
    // Disable broadcast so the join must pick a shuffle-based strategy —
    // which bucketing then satisfies without any Exchange.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(o("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      val exchangesBelowJoin = plan.linesIterator
        .count(line => line.contains("Exchange hashpartitioning") &&
          (line.contains("o_orderkey") || line.contains("l_orderkey")))
      assert(exchangesBelowJoin == 0,
        s"bucketed join must not shuffle its inputs:\n$plan")
      // Correctness unchanged vs the unbucketed path.
      val expected = Tables.table(spark, sfDir, "orders")
        .join(Tables.table(spark, sfDir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      assert(joined.orderBy("o_orderstatus").collect().toSeq ==
             expected.orderBy("o_orderstatus").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE graft_bkt.lineitem_b")
      spark.sql("DROP TABLE graft_bkt.orders_b")
      spark.sql("DROP DATABASE graft_bkt")
    }
  }
}
