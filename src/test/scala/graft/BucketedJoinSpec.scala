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

  test("ScaleData bucketed layout: generated corpus joins custkey without " +
      "an exchange and matches the plain corpus row-for-row") {
    val dir = tmp("bucketed_corpus")
    ScaleData.amplify(spark, sfDir, dir, factor = 1, layout = "bucketed")
    // marker written, plain-parquet read still works elsewhere
    assert(new java.io.File(s"$dir/orders.parquet", Tables.BucketMarker).isFile)
    assert(spark.read.parquet(s"$dir/orders.parquet").count() ==
      Tables.table(spark, sfDir, "orders").count())

    val o = Tables.table(spark, dir, "orders")
    val c = Tables.table(spark, dir, "customer")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the q13 shape: customer LEFT JOIN orders ON custkey, per-customer
      // count — both sides bucketed on custkey ⇒ no Exchange below the join
      val q13 = c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("c_count"))
      val plan = q13.queryExecution.executedPlan.toString
      val exchanges = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") &&
          (l.contains("c_custkey") || l.contains("o_custkey")))
      assert(exchanges == 0,
        s"bucketed q13 shape must not shuffle its inputs:\n$plan")
      // same histogram as the source corpus (factor=1 keeps keys unshifted)
      val got = q13.groupBy(col("c_count")).count()
        .orderBy(col("c_count")).collect().toSeq
      val want = Tables.table(spark, sfDir, "customer")
        .join(Tables.table(spark, sfDir, "orders"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey")).agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count")).count()
        .orderBy(col("c_count")).collect().toSeq
      assert(got == want, "bucketed corpus changed q13 results")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
