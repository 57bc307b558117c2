package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, TimestampType}

/** TPC-H-style end-to-end queries, adapted to the driver's synthetic corpus
  * (TESTDATA.md — the tables carry a column subset of full TPC-H).
  *
  * These mirror the reference's end-to-end correctness gate: the 21 golden
  * TPC-H query tests in `testdata/workloads/tpch/queries/tpch-q*.test`
  * (driver `tests/query_test/test_tpch_queries.py`). Each exercises the full
  * scan → filter → join → aggregate → sort → limit lifecycle that the
  * reference plans in `fe/.../planner/Planner.java` and executes through the
  * §2 operator set.
  *
  * Scale notes: filters sit directly on scans (parquet pushdown), dimension
  * joins broadcast (nation/region are tiny at any SF; customer/orders joins
  * shuffle on their keys and AQE handles skew), aggregates are partial+final
  * hash aggregations planned by Catalyst — the same 2-phase shape the
  * reference plans in `Planner.java:722-795`.
  */
object TpchQueries {

  /** TPC-H Q1: pricing summary report — scan+filter+agg+sort.
    * Reference: testdata/workloads/tpch/queries/tpch-q1.test */
  val q1Agg: QueryFn = (s, dir) => {
    val l = t(s, dir, "lineitem")
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumd(col("l_quantity")).as("sum_qty"),
        sumd(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        sum((dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
            .cast(DecimalType(18, 4)) * (lit(1) + dec2(col("l_tax"))))
          .cast(DoubleType).as("sum_charge"),
        (sumd(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (sumd(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (sumd(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(1) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(1) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(1) AS avg_disc,
      |  COUNT(1) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3: shipping priority — 3-way join + agg + top-n.
    * Reference: testdata/workloads/tpch/queries/tpch-q3.test */
  val q3Topn: QueryFn = (s, dir) => {
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1995-03-15").cast(TimestampType))
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1995-03-15").cast(TimestampType))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  val q3TopnSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-style: local supplier volume — 6-way join incl. broadcast dims.
    * Reference: testdata/workloads/tpch/queries/tpch-q5.test */
  val q5JoinAgg: QueryFn = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1994-01-01").cast(TimestampType) &&
              col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
    val c = t(s, dir, "customer")
    val su = t(s, dir, "supplier")
    val n = broadcast(t(s, dir, "nation"))
    val r = broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(su, col("l_suppkey") === col("s_suppkey") &&
                col("c_nationkey") === col("s_nationkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5JoinAggSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM lineitem, orders, customer, supplier, nation, region
      |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q6: forecast revenue change — pure scan+filter+global agg; the
    * filters must reach the parquet reader as PushedFilters.
    * Reference: testdata/workloads/tpch/queries/tpch-q6.test */
  val q6Filter: QueryFn = (s, dir) => {
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
              col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
             .cast(DoubleType).as("revenue"),
           count(lit(1)).as("n_rows"))
  }

  val q6FilterSql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(1) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q10-style: returned-item reporting — join + agg + top-n with a
    * wider group-by (tests multi-column grouping keys at shuffle). */
  val q10AggTopn: QueryFn = (s, dir) => {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-10-01").cast(TimestampType) &&
              col("o_orderdate") < lit("1996-10-01").cast(TimestampType))
    val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    val n = broadcast(t(s, dir, "nation"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10AggTopnSql: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  val all: Map[String, QueryFn] = Map(
    "q1_agg" -> q1Agg,
    "q3_topn" -> q3Topn,
    "q5_join_agg" -> q5JoinAgg,
    "q6_filter" -> q6Filter,
    "q10_agg_topn" -> q10AggTopn)

  val oracle: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "q3_topn" -> q3TopnSql,
    "q5_join_agg" -> q5JoinAggSql,
    "q6_filter" -> q6FilterSql,
    "q10_agg_topn" -> q10AggTopnSql)
}
