package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}

/** Multi-level aggregation (ROLLUP / CUBE / GROUPING SETS), window frames
  * with lag/lead, multiset set-operations, exact percentiles, and
  * deterministic sampling.
  *
  * The reference's grammar (`fe/src/main/cup/sql-parser.y:407-470`) has plain
  * GROUP BY only — no ROLLUP/CUBE, no OVER clause; these are capability
  * extensions in the same spirit as the window module, expressed through
  * Spark's native `Expand` + hash-aggregate and `WindowExec` operators.
  *
  * Scale notes:
  *  - ROLLUP/CUBE plan as a single `Expand` — but Spark places Expand BELOW
  *    the partial aggregate, replicating every INPUT row once per grouping
  *    set; the queries here therefore pre-aggregate to the finest grouping
  *    set first and expand the partial frame (one fact pass + one shuffle,
  *    no per-level rescan and no N× row replication — see rollupQ).
  *  - Window queries here partition by HIGH-cardinality keys (o_custkey,
  *    l_orderkey): millions of small partitions spread evenly, never a
  *    3-partition skew. (q_window_rank intentionally covers the coarse-key
  *    case.)
  *  - exceptAll/intersectAll plan as a single shuffle on the value with a
  *    count-diff aggregate + generate — no join explosion, linear in input.
  *  - Deterministic key-mod sampling is the reproducible-pipeline variant of
  *    TABLESAMPLE: the sample is a pure filter (pushed to the scan), stable
  *    across runs/partitionings, and stratification falls out of grouping.
  *
  * Documented divergence (found by tools/fuzz.py seed 11): over EMPTY input
  * Spark's grouping sets emit 0 rows, while the SQL standard (and
  * DuckDB/Postgres) gives the `()` grouping set one grand-total row with
  * count 0. The queries here never aggregate an empty input.
  */
object GroupingQueries {

  /** ROLLUP over (returnflag, linestatus): detail + per-flag + grand total.
    *
    * Pre-aggregated to the finest grouping set first (round 20): Spark
    * plans ROLLUP as Expand BELOW the partial aggregate, so the raw form
    * replicates every fact row once per grouping level (3× the row mass
    * through Expand + partial agg — at 100 TB, 3 copies of the fact table
    * through the first stage). count/sum are decomposable, so rolling up
    * the per-(flag, status) partial frame (a handful of rows) is
    * value-identical: detail rows re-aggregate singleton groups, upper
    * levels sum the partial sums (exact decimal — reassociation-safe),
    * and data NULLs vs rollup NULL-markers are distinguished by
    * grouping_id exactly as before. Guide §2.3 "aggregate before you
    * shuffle", applied to Expand. */
  val rollupQ: QueryFn = (s, dir) => {
    val l = t(s, dir, "lineitem")
    val base = l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n0"),
           sum(dec2(col("l_quantity"))).as("q0"),
           sum(dec2(col("l_extendedprice"))).as("p0"))
    base.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("int").as("gid"),
           sum(col("n0")).as("n"),
           sum(col("q0")).cast(DoubleType).as("sum_qty"),
           sum(col("p0")).cast(DoubleType).as("sum_price"))
  }
  val rollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
      |  count(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  /** CUBE over (status, priority): all four grouping levels in one pass.
    * Same pre-aggregate-then-expand shape as [[rollupQ]] — CUBE replicates
    * 4×, so the raw form pushes 4 copies of every order row through Expand;
    * the rewritten form cubes the per-(status, priority) partial frame. */
  val cubeQ: QueryFn = (s, dir) => {
    val o = t(s, dir, "orders")
    val base = o.groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n0"), sum(dec2(col("o_totalprice"))).as("p0"))
    base.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast("int").as("gid"),
           sum(col("n0")).as("n"),
           sum(col("p0")).cast(DoubleType).as("total_price"))
  }
  val cubeSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
      |  count(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin

  /** Explicit GROUPING SETS — the general form both ROLLUP and CUBE lower
    * to; exercised through the SQL front-end. */
  val groupingSetsQ: QueryFn = (s, dir) => {
    graft.Tables.registerViews(s, dir)
    // Same pre-aggregate-then-expand shape as rollupQ, through the SQL
    // front-end: the inner GROUP BY collapses the fact table to the finest
    // grouping set before Expand replicates anything (value-identical —
    // decomposable count/sum over exact decimal).
    s.sql("""SELECT l_returnflag, l_linestatus,
            |  CAST(grouping_id() AS INT) AS gid,
            |  SUM(n0) AS n,
            |  CAST(SUM(d0) AS DOUBLE) AS sum_disc
            |FROM (SELECT l_returnflag, l_linestatus, count(*) AS n0,
            |        SUM(CAST(l_discount AS DECIMAL(12,2))) AS d0
            |      FROM lineitem GROUP BY l_returnflag, l_linestatus)
            |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
            |                        (l_returnflag), ())""".stripMargin)
  }
  val groupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
      |  count(*) AS n,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |                        (l_returnflag), ())""".stripMargin

  /** lag/lead per customer: days since the previous order and the next
    * order's key. Partition key o_custkey is high-cardinality — at 100 TB
    * this is millions of tiny sorted runs, not a handful of giant ones. */
  val windowLag: QueryFn = (s, dir) => {
    val o = t(s, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    o.select(col("o_custkey"), col("o_orderkey"),
             datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
               .cast(LongType).as("days_since_prev"),
             lead(col("o_orderkey"), 1).over(w).as("next_orderkey"))
  }
  val windowLagSql: String =
    """SELECT o_custkey, o_orderkey,
      |  date_diff('day', lag(o_orderdate, 1) OVER w, o_orderdate) AS days_since_prev,
      |  lead(o_orderkey, 1) OVER w AS next_orderkey
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  /** Explicit ROWS frame: 3-line moving sum + first line's price per order.
    * Decimal arithmetic keeps the moving sums bit-stable cross-engine.
    * (l_orderkey, l_linenumber) is NOT unique in this corpus, so the window
    * order carries l_extendedprice as tiebreaker — remaining ties are rows
    * identical in every referenced column, where order can't matter. */
  val windowFrame: QueryFn = (s, dir) => {
    val l = t(s, dir, "lineitem")
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_extendedprice"))
    val moving = w.rowsBetween(-2, Window.currentRow)
    l.select(col("l_orderkey"), col("l_linenumber"),
             sum(dec2(col("l_extendedprice"))).over(moving)
               .cast(DoubleType).as("moving_price"),
             first(dec2(col("l_extendedprice"))).over(w)
               .cast(DoubleType).as("first_price"),
             ntile(2).over(w).as("half"))
  }
  val windowFrameSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS moving_price,
      |  CAST(first_value(CAST(l_extendedprice AS DECIMAL(12,2)))
      |       OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice) AS DOUBLE) AS first_price,
      |  ntile(2) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice) AS half
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice
      |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Multiset difference: customers' 1996 order multiplicity minus their
    * 1997 multiplicity (a customer with 3 orders in '96 and 1 in '97
    * appears twice). */
  val exceptAllQ: QueryFn = (s, dir) => {
    val o = t(s, dir, "orders")
    def yr(y: Int) = o.filter(
        col("o_orderdate") >= lit(f"$y%d-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit(f"${y + 1}%d-01-01").cast(TimestampType))
      .select(col("o_custkey"))
    yr(1996).exceptAll(yr(1997))
  }
  val exceptAllSql: String =
    """SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |EXCEPT ALL
      |SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'""".stripMargin

  /** Multiset intersection of the same two order-year profiles. */
  val intersectAllQ: QueryFn = (s, dir) => {
    val o = t(s, dir, "orders")
    def yr(y: Int) = o.filter(
        col("o_orderdate") >= lit(f"$y%d-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit(f"${y + 1}%d-01-01").cast(TimestampType))
      .select(col("o_custkey"))
    yr(1996).intersectAll(yr(1997))
  }
  val intersectAllSql: String =
    """SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |INTERSECT ALL
      |SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'""".stripMargin

  /** Exact percentiles (linear interpolation) of quantity per returnflag.
    * l_quantity holds integral values, so the quartile interpolation is a
    * sum of exactly-representable doubles — bit-identical cross-engine. */
  val percentileQ: QueryFn = (s, dir) => {
    graft.Tables.registerViews(s, dir)
    s.sql("""SELECT l_returnflag,
            |  percentile(l_quantity, 0.25) AS p25,
            |  percentile(l_quantity, 0.5)  AS p50,
            |  percentile(l_quantity, 0.75) AS p75
            |FROM lineitem GROUP BY l_returnflag""".stripMargin)
  }
  val percentileSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5)  AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Deterministic 10% stratified sample: key-mod keeps the same rows on
    * every run and every cluster layout (unlike TABLESAMPLE), so downstream
    * training-data builds are reproducible; per-segment aggregation shows
    * the strata. The predicate is a pure scan-side filter. */
  val sampleMod: QueryFn = (s, dir) => {
    val c = t(s, dir, "customer")
    c.filter(pmod(col("c_custkey"), lit(10)) === 3)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
           sumd(col("c_acctbal")).as("total_bal"))
  }
  val sampleModSql: String =
    """SELECT c_mktsegment, count(*) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
      |FROM customer WHERE c_custkey % 10 = 3
      |GROUP BY c_mktsegment""".stripMargin

  val all: Map[String, QueryFn] = Map(
    "q_rollup" -> rollupQ,
    "q_cube" -> cubeQ,
    "q_grouping_sets" -> groupingSetsQ,
    "q_window_lag" -> windowLag,
    "q_window_frame" -> windowFrame,
    "q_except_all" -> exceptAllQ,
    "q_intersect_all" -> intersectAllQ,
    "q_percentile" -> percentileQ,
    "q_sample_mod" -> sampleMod)

  val oracle: Map[String, String] = Map(
    "q_rollup" -> rollupSql,
    "q_cube" -> cubeSql,
    "q_grouping_sets" -> groupingSetsSql,
    "q_window_lag" -> windowLagSql,
    "q_window_frame" -> windowFrameSql,
    "q_except_all" -> exceptAllSql,
    "q_intersect_all" -> intersectAllSql,
    "q_percentile" -> percentileSql,
    "q_sample_mod" -> sampleModSql)
}
