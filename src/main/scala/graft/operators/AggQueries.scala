package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Aggregation inventory — the reference's `AggregationNode`
  * (`be/src/exec/aggregation-node.cc`) + builtin UDA set
  * (`be/src/exprs/aggregate-functions.cc`, registered
  * `fe/.../catalog/BuiltinsDb.java:207-368`).
  *
  * Catalyst plans every one of these as partial+final `HashAggregateExec`
  * (map-side combine before the shuffle — the 2-phase plan the reference
  * builds in `Planner.java:722-795`), and rewrites DISTINCT aggregates via
  * Expand into the same multi-phase shape as `AggregateInfo.java:393-434`.
  * Unlike the reference's in-memory-only hash agg, Spark's spills.
  */
object AggQueries {

  /** Global (no GROUP BY) aggregate — the reference's
    * `singleton_output_tuple_` path (`aggregation-node.h:77-79`). */
  val global: QueryFn = (s, dir) => {
    val l = t(s, dir, "lineitem")
    l.agg(
      count(lit(1)).as("n_rows"),
      count(col("l_orderkey")).as("n_orderkey"),
      sumd(col("l_quantity")).as("sum_qty"),
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty"),
      min(col("l_shipdate")).as("min_ship"),
      max(col("l_shipdate")).as("max_ship"),
      min(col("l_returnflag")).as("min_flag"),
      max(col("l_returnflag")).as("max_flag"))
  }
  val globalSql: String =
    """SELECT COUNT(1) AS n_rows, COUNT(l_orderkey) AS n_orderkey,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
      |  MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship,
      |  MIN(l_returnflag) AS min_flag, MAX(l_returnflag) AS max_flag
      |FROM lineitem""".stripMargin

  /** DISTINCT aggregates — the reference rewrites these into two
    * aggregation phases (`AggregateInfo.java:52-66`); Catalyst's Expand
    * rewrite is the same idea. */
  val distinctAgg: QueryFn = (s, dir) => {
    val l = t(s, dir, "lineitem")
    l.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("nd_supp"),
        countDistinct(col("l_partkey")).as("nd_part"),
        sum_distinct(dec2(col("l_quantity"))).cast(DoubleType).as("sum_dist_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }
  val distinctAggSql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_suppkey) AS nd_supp,
      |  COUNT(DISTINCT l_partkey) AS nd_part,
      |  CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_dist_qty,
      |  COUNT(1) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** SELECT DISTINCT over multiple columns. */
  val selectDistinct: QueryFn = (s, dir) => {
    t(s, dir, "orders")
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct()
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }
  val selectDistinctSql: String =
    """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  /** Variance / stddev family — Knuth online variance in the reference
    * (`aggregate-functions.h:95-113`); same algorithm class in both Spark
    * and DuckDB but summation order differs, so results are rounded to 6
    * decimals on both sides (the reference's own tests do tolerance
    * comparison for these, `test_result_verifier.py`). */
  val stats: QueryFn = (s, dir) => {
    val l = t(s, dir, "lineitem")
    l.groupBy(col("l_returnflag"))
      .agg(
        round(var_samp(col("l_quantity")), 6).as("var_samp_qty"),
        round(var_pop(col("l_quantity")), 6).as("var_pop_qty"),
        round(stddev_samp(col("l_quantity")), 6).as("stddev_samp_qty"),
        round(stddev_pop(col("l_quantity")), 6).as("stddev_pop_qty"),
        (sumd(col("l_quantity")) / count(lit(1))).as("avg_qty"))
      .orderBy(col("l_returnflag"))
  }
  val statsSql: String =
    """SELECT l_returnflag,
      |  ROUND(VAR_SAMP(l_quantity), 6) AS var_samp_qty,
      |  ROUND(VAR_POP(l_quantity), 6) AS var_pop_qty,
      |  ROUND(STDDEV_SAMP(l_quantity), 6) AS stddev_samp_qty,
      |  ROUND(STDDEV_POP(l_quantity), 6) AS stddev_pop_qty,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(1) AS avg_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** group_concat(s, sep) (`aggregate-functions.h:65-68`) — made
    * deterministic by sorting elements (the reference's own group_concat
    * order is arrival-order, undefined across plans). */
  val groupConcat: QueryFn = (s, dir) => {
    val n = t(s, dir, "nation")
    n.groupBy(col("n_regionkey"))
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))
      .orderBy(col("n_regionkey"))
  }
  val groupConcatSql: String =
    """SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** HAVING — conjuncts evaluated above the agg (reference: `SelectNode`
    * stacked on `AggregationNode`). */
  val having: QueryFn = (s, dir) => {
    val l = t(s, dir, "lineitem")
    l.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"), sumd(col("l_extendedprice")).as("total"))
      .filter(col("n") > 150)
      .orderBy(col("l_suppkey"))
  }
  val havingSql: String =
    """SELECT l_suppkey, COUNT(1) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM lineitem GROUP BY l_suppkey HAVING COUNT(1) > 150
      |ORDER BY l_suppkey""".stripMargin

  /** ndv() — HyperLogLog estimate (`aggregate-functions.cc:435-470`,
    * precision 10). Spark's HLL++ differs in constants, DuckDB's in
    * algorithm — no cross-engine oracle; the spec instead bounds relative
    * error against exact counts. Exact counts ride along for the driver's
    * rows-only check. */
  val ndv: QueryFn = (s, dir) => {
    val l = t(s, dir, "lineitem")
    // Aggregated over the distinct (flag, partkey) pairs (round 20, same
    // rationale as q_distinctpc): mixing the HLL sketch with
    // count(DISTINCT) keys the first aggregate on (flag, partkey), giving
    // every distinct key its own 52-word HLL buffer; HLL is idempotent
    // under duplicates and count over the distinct pairs IS the distinct
    // count, so this is value-identical with 3 sketch buffers total.
    l.select(col("l_returnflag"), col("l_partkey")).distinct()
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("ndv_part"),
        count(col("l_partkey")).as("exact_part"))
      .orderBy(col("l_returnflag"))
  }

  val all: Map[String, QueryFn] = Map(
    "q_agg_global" -> global,
    "q_agg_distinct" -> distinctAgg,
    "q_select_distinct" -> selectDistinct,
    "q_agg_stats" -> stats,
    "q_group_concat" -> groupConcat,
    "q_agg_having" -> having,
    "q_agg_ndv" -> ndv)

  val oracle: Map[String, String] = Map(
    "q_agg_global" -> globalSql,
    "q_agg_distinct" -> distinctAggSql,
    "q_select_distinct" -> selectDistinctSql,
    "q_agg_stats" -> statsSql,
    "q_group_concat" -> groupConcatSql,
    "q_agg_having" -> havingSql)
}
