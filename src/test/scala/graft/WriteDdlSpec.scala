package graft

import org.apache.spark.sql.functions._

/** INSERT / partitioned-write / CTAS / DDL surface — the Spark mapping of
  * the reference's `HdfsTableSink` (dynamic partitioning + overwrite,
  * `be/src/exec/hdfs-table-sink.h:30-65`) and DDL statements (SURVEY §2.11).
  */
class WriteDdlSpec extends SparkSpec {

  test("partitioned write + partition pruning on read") {
    val dir = tmp("graft_part")
    val li = Tables.table(spark, sfDir, "lineitem")
      .withColumn("ship_year", year(col("l_shipdate")))
    li.write.mode("overwrite").partitionBy("ship_year").parquet(dir)

    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    // partition pruning: the filter must land in PartitionFilters, not Data.
    val pruned = back.filter(col("ship_year") === 1996)
    val expected = li.filter(col("ship_year") === 1996).count()
    assert(pruned.count() == expected)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(ship_year"),
      s"partition filter not pushed:\n$plan")
  }

  test("dynamic partition overwrite replaces only touched partitions") {
    val dir = tmp("graft_dyn")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val df = spark.range(10)
      .select(col("id"), (col("id") % 2).as("p"))
    df.write.mode("overwrite").partitionBy("p").parquet(dir)
    // Overwrite only p=0 with a single row.
    spark.range(1).select(lit(100L).as("id"), lit(0L).as("p"))
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.filter(col("p") === 1).count() == 5, "untouched partition lost")
    assert(back.filter(col("p") === 0).count() == 1, "overwrite incomplete")
  }

  test("CTAS, INSERT INTO/OVERWRITE, and DDL statement surface") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_test")
    spark.sql("DROP TABLE IF EXISTS graft_test.nation_ctas")
    Tables.registerViews(spark, sfDir)

    // CTAS
    spark.sql(
      """CREATE TABLE graft_test.nation_ctas USING parquet AS
        |SELECT n_nationkey, n_name, n_regionkey FROM nation""".stripMargin)
    assert(spark.table("graft_test.nation_ctas").count() == 25)

    // INSERT INTO appends
    spark.sql(
      """INSERT INTO graft_test.nation_ctas
        |VALUES (99, 'ATLANTIS', 0)""".stripMargin)
    assert(spark.table("graft_test.nation_ctas").count() == 26)

    // INSERT OVERWRITE replaces
    spark.sql(
      """INSERT OVERWRITE TABLE graft_test.nation_ctas
        |SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_regionkey = 0""".stripMargin)
    assert(spark.table("graft_test.nation_ctas").count() == 5)

    // ALTER TABLE ADD COLUMNS
    spark.sql("ALTER TABLE graft_test.nation_ctas ADD COLUMNS (note STRING)")
    assert(spark.table("graft_test.nation_ctas").columns.contains("note"))

    // SHOW / DESCRIBE / EXPLAIN
    assert(spark.sql("SHOW TABLES IN graft_test").collect()
      .exists(_.getString(1) == "nation_ctas"))
    assert(spark.sql("DESCRIBE graft_test.nation_ctas").collect()
      .exists(_.getString(0) == "n_name"))
    assert(spark.sql("EXPLAIN SELECT * FROM graft_test.nation_ctas")
      .head().getString(0).contains("Scan"))

    // COMPUTE STATS analogue feeds the CBO (reference: ComputeStatsStmt)
    spark.sql("ANALYZE TABLE graft_test.nation_ctas COMPUTE STATISTICS")
    val stats = spark.table("graft_test.nation_ctas")
      .queryExecution.optimizedPlan.stats
    assert(stats.rowCount.exists(_.longValue == 5), s"stats: $stats")

    spark.sql("DROP TABLE graft_test.nation_ctas")
    spark.sql("DROP DATABASE graft_test")
  }

  test("CREATE/DROP VIEW and WITH-clause queries") {
    Tables.registerViews(spark, sfDir)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW big_nations AS " +
      "SELECT * FROM nation WHERE n_regionkey >= 3")
    val n = spark.sql(
      """WITH r AS (SELECT n_regionkey, count(*) AS c FROM big_nations
        |           GROUP BY n_regionkey)
        |SELECT sum(c) FROM r""".stripMargin).head().getLong(0)
    assert(n == spark.table("big_nations").count())
    spark.sql("DROP VIEW big_nations")
  }
}
