package graft.operators

import org.apache.spark.sql.functions._

/** Join operator inventory — one query per `TJoinOp` variant of the
  * reference's `HashJoinNode`/`CrossJoinNode`
  * (`common/thrift/PlanNodes.thrift:149-156`, `be/src/exec/hash-join-node.cc`,
  * `be/src/exec/cross-join-node.cc`), plus `left_anti` which the reference
  * grammar cannot reach (no NOT EXISTS) but any practical engine needs.
  *
  * Scale notes: Catalyst picks broadcast-hash for the small build sides here
  * (the reference does the same cost-based broadcast decision in
  * `fe/.../planner/Planner.java:431-489` — and, like us, forbids broadcast
  * for right/full outer joins where the build side must see all rows).
  * Large-vs-large joins shuffle on the equi-keys; AQE splits skewed
  * partitions at runtime. The non-equi residual ("other join conjuncts",
  * `hash-join-node.h:74-87`) stays attached to the hash join, not a
  * post-filter, so rows drop before materialization.
  */
object JoinQueries {

  /** INNER equi-join, orders ⋈ customer. */
  val inner: QueryFn = (s, dir) => {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .select(o("o_orderkey"), o("o_custkey"), c("c_name"), c("c_mktsegment"),
              o("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }
  val innerSql: String =
    """SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin

  /** LEFT OUTER: every customer, orders matched where they exist (filter on
    * the right side keeps unmatched rows flowing through as NULLs). */
  val leftOuter: QueryFn = (s, dir) => {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .select(c("c_custkey"), c("c_name"), o("o_orderkey"), o("o_totalprice"))
      .orderBy(col("c_custkey"), col("o_orderkey"))
  }
  val leftOuterSql: String =
    """SELECT c_custkey, c_name, o_orderkey, o_totalprice
      |FROM customer LEFT OUTER JOIN
      |  (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
      |  ON c_custkey = o.o_custkey
      |ORDER BY c_custkey, o_orderkey""".stripMargin

  /** RIGHT OUTER (reference: matched-build-row tracking,
    * `hash-join-node.h:70-72`). */
  val rightOuter: QueryFn = (s, dir) => {
    val o = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
    val c = t(s, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"), "right_outer")
      .select(c("c_custkey"), c("c_acctbal"), o("o_orderkey"), o("o_orderstatus"))
      .orderBy(col("c_custkey"), col("o_orderkey"))
  }
  val rightOuterSql: String =
    """SELECT c_custkey, c_acctbal, o_orderkey, o_orderstatus
      |FROM (SELECT * FROM orders WHERE o_orderstatus = 'O') o
      |  RIGHT OUTER JOIN customer ON o.o_custkey = c_custkey
      |ORDER BY c_custkey, o_orderkey""".stripMargin

  /** FULL OUTER with filters on both sides so NULLs appear on both. */
  val fullOuter: QueryFn = (s, dir) => {
    val c = t(s, dir, "customer").filter(col("c_acctbal") > 0.0)
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
      .select(c("c_custkey"), c("c_acctbal"), o("o_orderkey"), o("o_totalprice"))
      .orderBy(col("c_custkey"), col("o_orderkey"), col("c_acctbal"))
  }
  val fullOuterSql: String =
    """SELECT c.c_custkey, c.c_acctbal, o.o_orderkey, o.o_totalprice
      |FROM (SELECT * FROM customer WHERE c_acctbal > 0.0) c
      |  FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
      |  ON c.c_custkey = o.o_custkey
      |ORDER BY c_custkey, o_orderkey, c_acctbal""".stripMargin

  /** LEFT SEMI — customers that have at least one urgent order. */
  val leftSemi: QueryFn = (s, dir) => {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }
  val leftSemiSql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** LEFT ANTI — customers with no urgent order (beyond the reference's
    * grammar, which has no NOT EXISTS; first-class in Spark). */
  val leftAnti: QueryFn = (s, dir) => {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }
  val leftAntiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** CROSS JOIN (reference: `CrossJoinNode`, build side fully materialized —
    * here both sides are tiny dims and Spark broadcasts). */
  val cross: QueryFn = (s, dir) => {
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    n.crossJoin(r)
      .select(col("n_name"), col("r_name"))
      .orderBy(col("n_name"), col("r_name"))
  }
  val crossSql: String =
    """SELECT n_name, r_name FROM nation CROSS JOIN region
      |ORDER BY n_name, r_name""".stripMargin

  /** Equi-join with a non-equi residual conjunct — the reference's
    * `other_join_conjuncts_` (`hash-join-node.h:74-87`): suppliers paired
    * with richer same-nation customers. */
  val nonEqui: QueryFn = (s, dir) => {
    val su = t(s, dir, "supplier")
    val c = t(s, dir, "customer")
    su.join(c, su("s_nationkey") === c("c_nationkey") &&
               su("s_acctbal") * 2 < c("c_acctbal"))
      .select(col("s_suppkey"), col("c_custkey"), col("s_acctbal"), col("c_acctbal"))
      .orderBy(col("s_suppkey"), col("c_custkey"))
  }
  val nonEquiSql: String =
    """SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
      |FROM supplier JOIN customer
      |  ON s_nationkey = c_nationkey AND s_acctbal * 2 < c_acctbal
      |ORDER BY s_suppkey, c_custkey""".stripMargin

  val all: Map[String, QueryFn] = Map(
    "q_join_inner" -> inner,
    "q_join_left_outer" -> leftOuter,
    "q_join_right_outer" -> rightOuter,
    "q_join_full_outer" -> fullOuter,
    "q_join_left_semi" -> leftSemi,
    "q_join_left_anti" -> leftAnti,
    "q_join_cross" -> cross,
    "q_join_nonequi" -> nonEqui)

  val oracle: Map[String, String] = Map(
    "q_join_inner" -> innerSql,
    "q_join_left_outer" -> leftOuterSql,
    "q_join_right_outer" -> rightOuterSql,
    "q_join_full_outer" -> fullOuterSql,
    "q_join_left_semi" -> leftSemiSql,
    "q_join_left_anti" -> leftAntiSql,
    "q_join_cross" -> crossSql,
    "q_join_nonequi" -> nonEquiSql)
}
