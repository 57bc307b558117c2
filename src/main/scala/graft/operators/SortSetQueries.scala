package graft.operators

import org.apache.spark.sql.functions._

/** Sort / top-n / limit+offset / set-operation inventory.
  *
  * Reference operators: `TopNNode` (ORDER BY + LIMIT via priority queue,
  * `be/src/exec/topn-node.cc`), `SortNode` (spilling external sort,
  * `be/src/exec/sort-node.cc` + `be/src/runtime/sorter.cc`), limit/offset
  * pushed into sort fragments (`fe/.../planner/Planner.java:873-927`),
  * `UnionNode` (`be/src/exec/union-node.cc`).
  *
  * Spark picks the same physical split: ORDER BY+LIMIT plans as
  * `TakeOrderedAndProject` (per-partition top-k then k-way merge — no full
  * sort, no global shuffle of all rows), unlimited ORDER BY plans a
  * range-partitioned spilling global sort. Impala's NULL ordering default
  * (NULLs LAST when ASC — `topn-node.h:69-70`) differs from Spark's
  * (NULLs FIRST when ASC), so dialect-faithful queries must emit
  * `asc_nulls_last` explicitly; [[orderNulls]] pins that semantic.
  */
object SortSetQueries {

  /** Top-n: ORDER BY ... LIMIT with full deterministic tiebreak. */
  val topn: QueryFn = (s, dir) => {
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(25)
  }
  val topnSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25""".stripMargin

  /** LIMIT + OFFSET (reference: `offset_` skip in `topn-node.h:34-70`,
    * offset applied at the merging exchange, `Planner.java:895-896`). */
  val sortOffset: QueryFn = (s, dir) => {
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(10)
      .limit(15)
  }
  val sortOffsetSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15 OFFSET 10""".stripMargin

  /** Impala NULL-ordering semantics: NULLs last on ASC. NULLs synthesized
    * via nullifzero (discount=0 → NULL). */
  val orderNulls: QueryFn = (s, dir) => {
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
              nullifzero(col("l_discount")).as("disc_or_null"))
      .orderBy(col("disc_or_null").asc_nulls_last,
               col("l_orderkey").desc, col("l_linenumber"))
      .limit(40)
  }
  val orderNullsSql: String =
    """SELECT l_orderkey, l_linenumber, NULLIF(l_discount, 0) AS disc_or_null
      |FROM lineitem
      |ORDER BY disc_or_null ASC NULLS LAST, l_orderkey DESC, l_linenumber
      |LIMIT 40""".stripMargin

  /** Full (unlimited) global sort — plans as a range-partitioned external
    * sort, the `SortNode` analogue. */
  val sortFull: QueryFn = (s, dir) => {
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
      .orderBy(col("c_mktsegment"), col("c_acctbal").desc, col("c_custkey"))
  }
  val sortFullSql: String =
    """SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
      |ORDER BY c_mktsegment, c_acctbal DESC, c_custkey""".stripMargin

  /** UNION ALL of disjoint projections (`UnionNode` pass-through mode). */
  val unionAll: QueryFn = (s, dir) => {
    val c = t(s, dir, "customer")
    val hi = c.filter(col("c_acctbal") > 9000.0)
      .select(col("c_custkey"), lit("high").as("bucket"))
    val lo = c.filter(col("c_acctbal") < -500.0)
      .select(col("c_custkey"), lit("low").as("bucket"))
    hi.union(lo).orderBy(col("c_custkey"), col("bucket"))
  }
  val unionAllSql: String =
    """SELECT c_custkey, 'high' AS bucket FROM customer WHERE c_acctbal > 9000.0
      |UNION ALL
      |SELECT c_custkey, 'low' AS bucket FROM customer WHERE c_acctbal < -500.0
      |ORDER BY c_custkey, bucket""".stripMargin

  /** UNION DISTINCT — union + dedup agg on top, the exact rewrite the
    * reference plans (`fe/.../analysis/UnionStmt.java`). */
  val unionDistinct: QueryFn = (s, dir) => {
    val o = t(s, dir, "orders")
    val a = o.select(col("o_orderpriority").as("val"))
    val b = o.select(col("o_orderstatus").as("val"))
    a.union(b).distinct().orderBy(col("val"))
  }
  val unionDistinctSql: String =
    """SELECT o_orderpriority AS val FROM orders
      |UNION
      |SELECT o_orderstatus AS val FROM orders
      |ORDER BY val""".stripMargin

  /** Constant VALUES select — the reference materializes constant expr lists
    * in `UnionNode` (`Planner.java:1246-1281`, `ValuesStmt.java`). */
  val values: QueryFn = (s, _) =>
    s.sql("""SELECT * FROM VALUES
            |  (1, 'impala', 2.5), (2, 'spark', 3.5), (3, 'graft', CAST(NULL AS DOUBLE))
            |  AS t(id, name, score) ORDER BY id""".stripMargin)
  val valuesSql: String =
    """SELECT * FROM (VALUES
      |  (1, 'impala', 2.5), (2, 'spark', 3.5), (3, 'graft', CAST(NULL AS DOUBLE)))
      |  t(id, name, score) ORDER BY id""".stripMargin

  /** INTERSECT / EXCEPT — absent from the reference grammar
    * (`sql-parser.y` has no production), free in Spark; included for the
    * complete set-operation surface. */
  val intersect: QueryFn = (s, dir) => {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    o.select(col("o_custkey").as("k")).intersect(
      c.filter(col("c_acctbal") > 5000.0).select(col("c_custkey").as("k")))
      .orderBy(col("k"))
  }
  val intersectSql: String =
    """SELECT o_custkey AS k FROM orders
      |INTERSECT
      |SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000.0
      |ORDER BY k""".stripMargin

  val except: QueryFn = (s, dir) => {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.select(col("c_custkey").as("k")).except(
      o.select(col("o_custkey").as("k")))
      .orderBy(col("k"))
  }
  val exceptSql: String =
    """SELECT c_custkey AS k FROM customer
      |EXCEPT
      |SELECT o_custkey AS k FROM orders
      |ORDER BY k""".stripMargin

  /** Top-k per group through the custom TopKPerGroup physical operator
    * (graft.plans): bounded per-group heaps in a partial/final pair instead
    * of WindowExec's full per-group sort — the shuffle carries k·|groups|
    * rows instead of the whole table. Oracle: the equivalent ROW_NUMBER
    * formulation (results identical; the plan is what differs). */
  val topkPerGroup: QueryFn = (s, dir) => {
    val li = t(s, dir, "lineitem")
    graft.plans.TopKPerGroup.topK(
        li.select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
                  col("l_extendedprice")),
        Seq(col("l_returnflag")),
        struct(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")),
        k = 5)
      .orderBy(col("l_returnflag"), col("l_extendedprice").desc,
               col("l_orderkey").desc, col("l_linenumber").desc)
  }
  val topkPerGroupSql: String =
    """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
      |FROM (SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
      |        ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |          ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC) AS rn
      |      FROM lineitem)
      |WHERE rn <= 5
      |ORDER BY l_returnflag, l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC""".stripMargin

  val all: Map[String, QueryFn] = Map(
    "q_topk_per_group" -> topkPerGroup,
    "q_topn" -> topn,
    "q_sort_offset" -> sortOffset,
    "q_order_nulls" -> orderNulls,
    "q_sort_full" -> sortFull,
    "q_union_all" -> unionAll,
    "q_union_distinct" -> unionDistinct,
    "q_values" -> values,
    "q_intersect" -> intersect,
    "q_except" -> except)

  val oracle: Map[String, String] = Map(
    "q_topk_per_group" -> topkPerGroupSql,
    "q_topn" -> topnSql,
    "q_sort_offset" -> sortOffsetSql,
    "q_order_nulls" -> orderNullsSql,
    "q_sort_full" -> sortFullSql,
    "q_union_all" -> unionAllSql,
    "q_union_distinct" -> unionDistinctSql,
    "q_values" -> valuesSql,
    "q_intersect" -> intersectSql,
    "q_except" -> exceptSql)
}
