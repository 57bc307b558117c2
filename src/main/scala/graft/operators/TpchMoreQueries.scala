package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, TimestampType}

/** Second wave of TPC-H-shaped queries (adapted to the corpus' column
  * subset) plus the subquery surface.
  *
  * Subqueries are a Spark SUPERSET: the reference grammar has no
  * WHERE-clause subqueries at all (`sql-parser.y`; SURVEY §4.1 "no subquery
  * decorrelation") — these queries exercise scalar, IN, and correlated
  * EXISTS decorrelation that Catalyst performs (RewriteCorrelatedScalarQuery,
  * RewritePredicateSubquery) and the reference could not.
  */
object TpchMoreQueries {

  /** Q4-shape: priority check — orders with a late-shipped line (semi join
    * through SQL EXISTS), counted per priority. */
  val q4Semi: QueryFn = (s, dir) => {
    graft.Tables.registerViews(s, dir)
    s.sql("""SELECT o_orderpriority, count(*) AS order_count
            |FROM orders
            |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
            |  AND EXISTS (SELECT 1 FROM lineitem
            |              WHERE l_orderkey = o_orderkey
            |                AND l_shipdate > o_orderdate + INTERVAL 45 DAYS)
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }
  val q4SemiSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 45 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q14-shape: promotion effect — conditional aggregation over a part
    * join; percentage of revenue from PROMO parts. */
  val q14Promo: QueryFn = (s, dir) => {
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
              col("l_shipdate") < lit("1996-07-01").cast(TimestampType))
    val p = t(s, dir, "part")
    val rev = dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .agg(
        (sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0)))
           .cast(DoubleType) * 100.0 /
         sum(rev).cast(DoubleType)).as("promo_revenue_pct"),
        count(lit(1)).as("n_lines"))
  }
  val q14PromoSql: String =
    """SELECT
      |  CAST(SUM(CASE WHEN p_type = 'PROMO'
      |       THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
      |       ELSE 0 END) AS DOUBLE) * 100.0 /
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
      |    AS promo_revenue_pct,
      |  COUNT(1) AS n_lines
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'""".stripMargin

  /** Q17-shape: small-quantity lines vs the per-part average — Q17's
    * correlated scalar subquery. The aggregate-derived-join decorrelation
    * scans lineitem twice (once for the per-part averages, once for the
    * probe side) with no exchange reuse; since the correlation key is the
    * join key, a window average over the part-filtered join does the same
    * job in ONE scan: the brand filter shrinks the stream first, so the
    * window's l_partkey shuffle carries ~1/brand-count of the fact instead
    * of a full second read — at 100 TB that is one fact pass instead of
    * two. The window sum stays DECIMAL, cast to double only at the
    * division, matching the oracle's CAST(SUM(DECIMAL) AS DOUBLE)/COUNT. */
  val q17Avg: QueryFn = (s, dir) => {
    val w = Window.partitionBy(col("l_partkey"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "part").filter(col("p_brand") === "Brand#1"),
            col("l_partkey") === col("p_partkey"))
      .withColumn("avg_qty",
        sum(dec2(col("l_quantity"))).over(w).cast(DoubleType) /
          count(lit(1)).over(w))
      .filter(col("l_quantity") < col("avg_qty") * 0.5)
      .agg((sumd(col("l_extendedprice")) / 7.0).as("avg_yearly"),
           count(lit(1)).as("n_small"))
  }
  val q17AvgSql: String =
    """WITH a AS (
      |  SELECT l_partkey AS ap_partkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(1) AS avg_qty
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  COUNT(1) AS n_small
      |FROM lineitem, part, a
      |WHERE l_partkey = p_partkey AND l_partkey = ap_partkey
      |  AND p_brand = 'Brand#1' AND l_quantity < avg_qty * 0.5""".stripMargin

  /** Q18-shape: large-volume orders — HAVING-derived IN filter joined back
    * to customers, top-n. */
  val q18Large: QueryFn = (s, dir) => {
    val l = t(s, dir, "lineitem")
    val big = l.groupBy(col("l_orderkey").as("bk"))
      .agg(sumd(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 250.0)
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    o.join(big, col("o_orderkey") === col("bk"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
              col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(15)
  }
  val q18LargeSql: String =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
      |FROM orders
      |JOIN (SELECT l_orderkey AS bk,
      |        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 250.0) b
      |  ON o_orderkey = bk
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_qty DESC, o_orderkey LIMIT 15""".stripMargin

  /** Q19-shape: disjunctive multi-attribute join predicates (the planner
    * must keep the equi-key and evaluate the OR residual on the join). */
  val q19Disjunct: QueryFn = (s, dir) => {
    val l = t(s, dir, "lineitem")
    val p = t(s, dir, "part")
    val rev = dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))
    l.join(p, col("l_partkey") === col("p_partkey") && (
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
         col("l_quantity").between(1, 21)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
         col("l_quantity").between(15, 35)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
         col("l_quantity").between(25, 50))))
      .agg(sum(rev).cast(DoubleType).as("revenue"), count(lit(1)).as("n"))
  }
  val q19DisjunctSql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
      |  COUNT(1) AS n
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey AND (
      |  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21) OR
      |  (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 15 AND 35) OR
      |  (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 25 AND 50))""".stripMargin

  /** Q22-shape: above-average customers with no orders — scalar subquery +
    * anti join through SQL. */
  val q22Anti: QueryFn = (s, dir) => {
    graft.Tables.registerViews(s, dir)
    s.sql("""SELECT c_mktsegment, count(*) AS n_cust,
            |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
            |FROM customer
            |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
            |                   FROM customer WHERE c_acctbal > 0.0)
            |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
            |                  AND o_orderstatus = 'F')
            |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }
  val q22AntiSql: String =
    """SELECT c_mktsegment, count(*) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
      |FROM customer
      |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
      |                   FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderstatus = 'F')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Q13-shape: customer order-count distribution — left outer join with an
    * ON-clause residual, double aggregation (per-customer then histogram). */
  val q13Dist: QueryFn = (s, dir) => {
    graft.Tables.registerViews(s, dir)
    s.sql("""SELECT c_count, count(*) AS custdist
            |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
            |      FROM customer LEFT OUTER JOIN orders
            |        ON c_custkey = o_custkey
            |       AND o_orderpriority <> '1-URGENT'
            |      GROUP BY c_custkey)
            |GROUP BY c_count
            |ORDER BY custdist DESC, c_count DESC""".stripMargin)
  }
  val q13DistSql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey
      |       AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Q15-shape: top supplier(s) by revenue — CTE + scalar-subquery max over
    * the aggregate (exact: revenue is decimal-summed, so the max equality
    * can't be flipped by float reduction order). */
  val q15Top: QueryFn = (s, dir) => {
    graft.Tables.registerViews(s, dir)
    s.sql("""WITH revenue AS (
            |  SELECT l_suppkey,
            |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS total_revenue
            |  FROM lineitem
            |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
            |  GROUP BY l_suppkey)
            |SELECT s_suppkey, s_name, total_revenue
            |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
            |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
            |ORDER BY s_suppkey""".stripMargin)
  }
  val q15TopSql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** Correlated scalar subquery in the SELECT list (pure Spark-superset
    * surface; Catalyst decorrelates to a left outer join + agg). */
  val subqueryScalar: QueryFn = (s, dir) => {
    graft.Tables.registerViews(s, dir)
    s.sql("""SELECT n_name,
            |  (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey)
            |    AS n_suppliers
            |FROM nation ORDER BY n_name""".stripMargin)
  }
  val subqueryScalarSql: String =
    """SELECT n_name,
      |  (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey) AS n_suppliers
      |FROM nation ORDER BY n_name""".stripMargin

  /** IN (subquery) — absent from the reference grammar entirely. */
  val subqueryIn: QueryFn = (s, dir) => {
    graft.Tables.registerViews(s, dir)
    s.sql("""SELECT o_orderkey, o_totalprice FROM orders
            |WHERE o_custkey IN (SELECT c_custkey FROM customer
            |                    WHERE c_mktsegment = 'MACHINERY'
            |                      AND c_acctbal > 9000.0)
            |ORDER BY o_orderkey""".stripMargin)
  }
  val subqueryInSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer
      |                    WHERE c_mktsegment = 'MACHINERY' AND c_acctbal > 9000.0)
      |ORDER BY o_orderkey""".stripMargin

  val all: Map[String, QueryFn] = Map(
    "q13_dist" -> q13Dist,
    "q15_top" -> q15Top,
    "q4_semi" -> q4Semi,
    "q14_promo" -> q14Promo,
    "q17_avg" -> q17Avg,
    "q18_large" -> q18Large,
    "q19_disjunct" -> q19Disjunct,
    "q22_anti" -> q22Anti,
    "q_subquery_scalar" -> subqueryScalar,
    "q_subquery_in" -> subqueryIn)

  val oracle: Map[String, String] = Map(
    "q13_dist" -> q13DistSql,
    "q15_top" -> q15TopSql,
    "q4_semi" -> q4SemiSql,
    "q14_promo" -> q14PromoSql,
    "q17_avg" -> q17AvgSql,
    "q18_large" -> q18LargeSql,
    "q19_disjunct" -> q19DisjunctSql,
    "q22_anti" -> q22AntiSql,
    "q_subquery_scalar" -> subqueryScalarSql,
    "q_subquery_in" -> subqueryInSql)
}
