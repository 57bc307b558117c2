package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.GraftFunctions.{fnv_hash, strleft, strright}

/** Scalar expression & function inventory — the reference's expression
  * evaluation layer (`be/src/exprs/`, 275 builtin signatures in
  * `common/function-registry/impala_functions.py:55-489`) re-expressed as
  * codegen'd `org.apache.spark.sql.functions` columns.
  *
  * Everything here stays inside whole-stage codegen (no UDFs) — at 100 TB
  * scalar work is pure per-row CPU and must fuse into the scan stage.
  * Oracle caveats (documented divergences, mirrored in the SQL):
  *  - double→integral CAST truncates in Impala/Spark, rounds in DuckDB →
  *    oracle wraps with TRUNC().
  *  - dayofweek is 1=Sunday in Impala/Spark, 0=Sunday in DuckDB → +1.
  *  - libm-dependent fns (exp/ln/sin) rounded to 6dp on both sides.
  */
object ExprQueries {

  /** Math functions (`be/src/exprs/math-functions.cc`,
    * `impala_functions.py:56-147`). */
  val math: QueryFn = (s, dir) => {
    val p = t(s, dir, "part")
    p.select(
        col("p_partkey"),
        abs(col("p_size") - 25).as("abs_v"),
        ceil(col("p_retailprice")).as("ceil_v"),
        floor(col("p_retailprice")).as("floor_v"),
        round(dec2(col("p_retailprice")), 1).cast(DoubleType).as("round_v"),
        sqrt(col("p_size")).as("sqrt_v"),
        pow(col("p_size"), 2).as("pow_v"),
        pmod(col("p_partkey"), lit(7)).as("pmod_v"),
        (col("p_size") % 7).as("mod_v"),
        signum(col("p_size") - 25).as("sign_v"),
        greatest(col("p_size"), lit(10)).as("greatest_v"),
        least(col("p_size"), lit(10)).as("least_v"),
        round(log(col("p_size")), 6).as("ln_v"),
        round(exp(col("p_size") / 10.0), 6).as("exp_v"))
      .orderBy(col("p_partkey"))
  }
  val mathSql: String =
    """SELECT p_partkey,
      |  ABS(p_size - 25) AS abs_v,
      |  CAST(CEIL(p_retailprice) AS BIGINT) AS ceil_v,
      |  CAST(FLOOR(p_retailprice) AS BIGINT) AS floor_v,
      |  CAST(ROUND(CAST(p_retailprice AS DECIMAL(12,2)), 1) AS DOUBLE) AS round_v,
      |  SQRT(p_size) AS sqrt_v,
      |  POW(p_size, 2) AS pow_v,
      |  ((p_partkey % 7) + 7) % 7 AS pmod_v,
      |  p_size % 7 AS mod_v,
      |  CAST(SIGN(p_size - 25) AS DOUBLE) AS sign_v,
      |  GREATEST(p_size, 10) AS greatest_v,
      |  LEAST(p_size, 10) AS least_v,
      |  ROUND(LN(p_size), 6) AS ln_v,
      |  ROUND(EXP(p_size / 10.0), 6) AS exp_v
      |FROM part ORDER BY p_partkey""".stripMargin

  /** String functions (`be/src/exprs/string-functions.cc`,
    * `impala_functions.py:149-212`) incl. the Impala-only
    * strleft/strright aliases. */
  val string: QueryFn = (s, dir) => {
    val c = t(s, dir, "customer")
    c.select(
        col("c_custkey"),
        length(col("c_name")).as("len_v"),
        upper(col("c_name")).as("upper_v"),
        lower(col("c_mktsegment")).as("lower_v"),
        substring(col("c_name"), 2, 5).as("substr_v"),
        strleft(col("c_name"), lit(4)).as("strleft_v"),
        strright(col("c_name"), lit(3)).as("strright_v"),
        lpad(col("c_mktsegment"), 12, "*").as("lpad_v"),
        rpad(col("c_mktsegment"), 12, "*").as("rpad_v"),
        trim(lpad(col("c_mktsegment"), 12, " ")).as("trim_v"),
        reverse(col("c_mktsegment")).as("reverse_v"),
        concat(col("c_mktsegment"), lit("#"), col("c_name")).as("concat_v"),
        concat_ws("-", col("c_mktsegment"), col("c_name")).as("concat_ws_v"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("translate_v"),
        instr(col("c_name"), "0").as("instr_v"),
        ascii(col("c_mktsegment")).as("ascii_v"),
        repeat(col("c_mktsegment"), 2).as("repeat_v"))
      .orderBy(col("c_custkey"))
      .limit(2000)
  }
  val stringSql: String =
    """SELECT c_custkey,
      |  LENGTH(c_name) AS len_v,
      |  UPPER(c_name) AS upper_v,
      |  LOWER(c_mktsegment) AS lower_v,
      |  SUBSTRING(c_name, 2, 5) AS substr_v,
      |  LEFT(c_name, 4) AS strleft_v,
      |  RIGHT(c_name, 3) AS strright_v,
      |  LPAD(c_mktsegment, 12, '*') AS lpad_v,
      |  RPAD(c_mktsegment, 12, '*') AS rpad_v,
      |  TRIM(LPAD(c_mktsegment, 12, ' ')) AS trim_v,
      |  REVERSE(c_mktsegment) AS reverse_v,
      |  c_mktsegment || '#' || c_name AS concat_v,
      |  CONCAT_WS('-', c_mktsegment, c_name) AS concat_ws_v,
      |  TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS translate_v,
      |  INSTR(c_name, '0') AS instr_v,
      |  ASCII(c_mktsegment) AS ascii_v,
      |  REPEAT(c_mktsegment, 2) AS repeat_v
      |FROM customer ORDER BY c_custkey LIMIT 2000""".stripMargin

  /** Timestamp functions (`be/src/exprs/timestamp-functions.cc`,
    * `impala_functions.py:239-355`). */
  val datetime: QueryFn = (s, dir) => {
    val o = t(s, dir, "orders")
    o.select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("year_v"),
        month(col("o_orderdate")).as("month_v"),
        dayofmonth(col("o_orderdate")).as("day_v"),
        dayofweek(col("o_orderdate")).as("dow_v"),
        dayofyear(col("o_orderdate")).as("doy_v"),
        weekofyear(col("o_orderdate")).as("woy_v"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast(DateType)).as("datediff_v"),
        date_add(col("o_orderdate").cast(DateType), 30).as("dateadd_v"),
        add_months(col("o_orderdate").cast(DateType), 2).as("addmonths_v"),
        date_trunc("month", col("o_orderdate")).as("trunc_month_v"),
        unix_timestamp(col("o_orderdate")).as("epoch_v"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("fmt_v"),
        date_format(col("o_orderdate"), "EEEE").as("dayname_v"))
      .orderBy(col("o_orderkey"))
      .limit(3000)
  }
  val datetimeSql: String =
    """SELECT o_orderkey,
      |  YEAR(o_orderdate) AS year_v,
      |  MONTH(o_orderdate) AS month_v,
      |  DAYOFMONTH(o_orderdate) AS day_v,
      |  DAYOFWEEK(o_orderdate) + 1 AS dow_v,
      |  DAYOFYEAR(o_orderdate) AS doy_v,
      |  WEEKOFYEAR(o_orderdate) AS woy_v,
      |  DATEDIFF('day', DATE '1995-01-01', o_orderdate) AS datediff_v,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS dateadd_v,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS addmonths_v,
      |  CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS trunc_month_v,
      |  CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_v,
      |  STRFTIME(o_orderdate, '%Y-%m-%d') AS fmt_v,
      |  DAYNAME(o_orderdate) AS dayname_v
      |FROM orders ORDER BY o_orderkey LIMIT 3000""".stripMargin

  /** Conditionals (`be/src/exprs/conditional-functions.cc`,
    * `case-expr.cc`) — CASE (searched + simple), IF, NULLIF, COALESCE,
    * ZEROIFNULL, NULLIFZERO and Kleene AND/OR on NULLs. */
  val conditional: QueryFn = (s, dir) => {
    val l = t(s, dir, "lineitem")
    l.select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 40, "mid")
          .otherwise("high").as("case_searched"),
        when(col("l_returnflag") === "A", 1)
          .when(col("l_returnflag") === "N", 2)
          .otherwise(0).as("case_simple"),
        when(col("l_discount") > 0.05, "disc").otherwise("full").as("if_v"),
        nullif(col("l_tax"), lit(0.0)).as("nullif_v"),
        coalesce(nullif(col("l_tax"), lit(0.0)), lit(-1.0)).as("coalesce_v"),
        zeroifnull(nullifzero(col("l_discount"))).as("zeroifnull_v"),
        (nullifzero(col("l_discount")) > 0.05).as("kleene_v"))
      // (l_orderkey, l_linenumber) is NOT unique in this corpus; the extra
      // keys cover every source column the projections read, so rows tied
      // on the full key are identical in the output and the LIMIT boundary
      // cannot diverge between engines
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"), col("l_tax"), col("l_returnflag"))
      .limit(5000)
  }
  val conditionalSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CASE WHEN l_quantity < 10 THEN 'low'
      |       WHEN l_quantity < 40 THEN 'mid' ELSE 'high' END AS case_searched,
      |  CASE l_returnflag WHEN 'A' THEN 1 WHEN 'N' THEN 2 ELSE 0 END AS case_simple,
      |  IF(l_discount > 0.05, 'disc', 'full') AS if_v,
      |  NULLIF(l_tax, 0.0) AS nullif_v,
      |  COALESCE(NULLIF(l_tax, 0.0), -1.0) AS coalesce_v,
      |  COALESCE(NULLIF(l_discount, 0), 0) AS zeroifnull_v,
      |  NULLIF(l_discount, 0) > 0.05 AS kleene_v
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity,
      |  l_discount, l_tax, l_returnflag LIMIT 5000""".stripMargin

  /** CAST matrix (`be/src/exprs/cast-expr.cc`). Impala/Spark truncate on
    * double→integral; DuckDB rounds — oracle wraps with TRUNC. */
  val casts: QueryFn = (s, dir) => {
    val o = t(s, dir, "orders")
    o.select(
        col("o_orderkey"),
        col("o_orderkey").cast(StringType).as("long_to_str"),
        col("o_totalprice").cast(LongType).as("dbl_to_long"),
        col("o_totalprice").cast(StringType).as("dbl_to_str"),
        lit("12345").cast(IntegerType).as("str_to_int"),
        lit("3.75").cast(DoubleType).as("str_to_dbl"),
        col("o_orderdate").cast(DateType).as("ts_to_date"),
        lit("2020-01-02 03:04:05").cast(TimestampType).as("str_to_ts"),
        col("o_custkey").cast(DoubleType).as("long_to_dbl"),
        (col("o_orderkey") % 2 === 0).cast(IntegerType).as("bool_to_int"))
      .orderBy(col("o_orderkey"))
      .limit(3000)
  }
  val castsSql: String =
    """SELECT o_orderkey,
      |  CAST(o_orderkey AS VARCHAR) AS long_to_str,
      |  CAST(TRUNC(o_totalprice) AS BIGINT) AS dbl_to_long,
      |  CAST(o_totalprice AS VARCHAR) AS dbl_to_str,
      |  CAST('12345' AS INTEGER) AS str_to_int,
      |  CAST('3.75' AS DOUBLE) AS str_to_dbl,
      |  CAST(o_orderdate AS DATE) AS ts_to_date,
      |  CAST('2020-01-02 03:04:05' AS TIMESTAMP) AS str_to_ts,
      |  CAST(o_custkey AS DOUBLE) AS long_to_dbl,
      |  CAST(o_orderkey % 2 = 0 AS INTEGER) AS bool_to_int
      |FROM orders ORDER BY o_orderkey LIMIT 3000""".stripMargin

  /** LIKE fast paths (prefix/suffix/substring — `like-predicate.cc`
    * compiles these to non-regex searches) + RLIKE + regexp_extract/replace
    * on patterns valid in both RE2 (reference, DuckDB) and java.util.regex. */
  val like: QueryFn = (s, dir) => {
    val p = t(s, dir, "part")
    p.select(
        col("p_partkey"),
        col("p_name").like("%a%").as("like_sub"),
        col("p_name").like("p%").as("like_prefix"),
        col("p_name").like("%5").as("like_suffix"),
        col("p_name").like("part_5%").as("like_under"),
        col("p_name").rlike("[0-9]{3}").as("rlike_v"),
        regexp_extract(col("p_name"), "([0-9]+)", 1).as("re_extract"),
        regexp_replace(col("p_name"), "[0-9]+", "#").as("re_replace"))
      .orderBy(col("p_partkey"))
  }
  val likeSql: String =
    """SELECT p_partkey,
      |  p_name LIKE '%a%' AS like_sub,
      |  p_name LIKE 'p%' AS like_prefix,
      |  p_name LIKE '%5' AS like_suffix,
      |  p_name LIKE 'part_5%' AS like_under,
      |  REGEXP_MATCHES(p_name, '[0-9]{3}') AS rlike_v,
      |  COALESCE(REGEXP_EXTRACT(p_name, '([0-9]+)', 1), '') AS re_extract,
      |  REGEXP_REPLACE(p_name, '[0-9]+', '#', 'g') AS re_replace
      |FROM part ORDER BY p_partkey""".stripMargin

  /** IN value lists / BETWEEN / IS NULL (`in-predicate.cc`,
    * `BetweenPredicate.java:61-78` — BETWEEN is rewritten to >= AND <= in
    * both engines' frontends). */
  val inBetween: QueryFn = (s, dir) => {
    val l = t(s, dir, "lineitem")
    l.select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag").isin("A", "R").as("in_v"),
        (!col("l_returnflag").isin("A", "R")).as("not_in_v"),
        col("l_quantity").between(10, 20).as("between_v"),
        nullifzero(col("l_discount")).isNull.as("is_null_v"),
        nullifzero(col("l_discount")).isNotNull.as("is_not_null_v"))
      // total order under LIMIT — see conditional
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"), col("l_tax"), col("l_returnflag"))
      .limit(5000)
  }
  val inBetweenSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  l_returnflag IN ('A', 'R') AS in_v,
      |  l_returnflag NOT IN ('A', 'R') AS not_in_v,
      |  l_quantity BETWEEN 10 AND 20 AS between_v,
      |  NULLIF(l_discount, 0) IS NULL AS is_null_v,
      |  NULLIF(l_discount, 0) IS NOT NULL AS is_not_null_v
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity,
      |  l_discount, l_tax, l_returnflag LIMIT 5000""".stripMargin

  /** fnv_hash — our codegen'd Catalyst expression. DuckDB has no fnv
    * builtin, but FNV-1a is 8 integer ops per byte, so the oracle BUILDS it
    * from scratch with HUGEINT modular arithmetic (`list_reduce` over the
    * byte sequence, xor on the low byte, ×prime mod 2⁶⁴) and re-signs the
    * result to int64 — every one of the 2×25 hashes is hash-compared
    * bit-exactly, upgraded from rows-only (round 11b). The known-answer
    * vectors in FnvHashSpec stay as the primary spec. The oracle's string
    * byte walk uses ascii() per char, valid because nation names are pure
    * ASCII (UTF-8 bytes == codepoints); the int walk shifts out 4
    * little-endian slot bytes exactly like FnvHash.hashLong. */
  val fnv: QueryFn = (s, dir) => {
    val n = t(s, dir, "nation")
    n.select(
        col("n_nationkey"),
        fnv_hash(col("n_name")).as("h_name"),
        fnv_hash(col("n_nationkey")).as("h_key"))
      .orderBy(col("n_nationkey"))
  }

  /** Timestamp interval family through the SQL surface (our registered
    * years_add/months_sub/... builders → Catalyst TimestampAdd). */
  val dateArith: QueryFn = (s, dir) => {
    graft.Tables.registerViews(s, dir)
    s.sql("""SELECT o_orderkey,
            |  years_add(o_orderdate, 1) AS ya,
            |  months_sub(o_orderdate, 2) AS ms,
            |  weeks_add(o_orderdate, 3) AS wa,
            |  days_add(o_orderdate, 45) AS da,
            |  hours_add(o_orderdate, 6) AS ha,
            |  seconds_sub(o_orderdate, 90) AS ss,
            |  impala_trunc(o_orderdate, 'YYYY') AS ty
            |FROM orders ORDER BY o_orderkey LIMIT 2000""".stripMargin)
  }
  val dateArithSql: String =
    """SELECT o_orderkey,
      |  o_orderdate + INTERVAL 1 YEAR AS ya,
      |  o_orderdate - INTERVAL 2 MONTH AS ms,
      |  o_orderdate + INTERVAL 21 DAY AS wa,
      |  o_orderdate + INTERVAL 45 DAY AS da,
      |  o_orderdate + INTERVAL 6 HOUR AS ha,
      |  o_orderdate - INTERVAL 90 SECOND AS ss,
      |  CAST(DATE_TRUNC('year', o_orderdate) AS TIMESTAMP) AS ty
      |FROM orders ORDER BY o_orderkey LIMIT 2000""".stripMargin

  /** Probabilistic distinct estimators (rows-only; accuracy bounds pinned
    * in FunctionsSpec, exact counts ride along for sanity).
    *
    * Aggregated over `SELECT DISTINCT (flag, partkey)`, not the raw rows
    * (round 20): mixing the sketches with `count(DISTINCT ...)` in one
    * aggregate makes Spark's single-distinct rewrite key the FIRST
    * aggregate on (l_returnflag, l_partkey) — every distinct key then owns
    * its own 2×256-byte FM buffer + HLL words, built, serialized and
    * shuffled per key (a 56-column exchange), which defeats the whole point
    * of a fixed-size sketch. FM bitmaps (bit-OR), PCSA and HLL (register
    * max) are all idempotent under duplicate values, and `count(partkey)`
    * over the distinct pairs IS `count(DISTINCT partkey)` — so aggregating
    * the deduplicated pairs is value-identical while the plan becomes:
    * narrow 2-column distinct exchange, then 3 sketch buffers total
    * (one per returnflag) with map-side partials (guide §2.3). */
  val distinctPc: QueryFn = (s, dir) => {
    graft.Tables.registerViews(s, dir)
    s.sql("""SELECT l_returnflag,
            |  distinctpc(l_partkey) AS pc,
            |  distinctpcsa(l_partkey) AS pcsa,
            |  ndv(l_partkey) AS ndv_est,
            |  count(l_partkey) AS exact
            |FROM (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem)
            |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  val all: Map[String, QueryFn] = Map(
    "q_date_arith" -> dateArith,
    "q_distinctpc" -> distinctPc,
    "q_expr_math" -> math,
    "q_expr_string" -> string,
    "q_expr_datetime" -> datetime,
    "q_expr_conditional" -> conditional,
    "q_expr_cast" -> casts,
    "q_expr_like" -> like,
    "q_expr_in_between" -> inBetween,
    "q_fnv_hash" -> fnv)

  val fnvSql: String =
    """WITH b AS (
      |  SELECT n_nationkey,
      |    list_prepend(CAST(14695981039346656037 AS HUGEINT),
      |      list_transform(range(1, len(n_name)+1),
      |        i -> CAST(ascii(n_name[i]) AS HUGEINT))) AS name_bytes,
      |    list_prepend(CAST(14695981039346656037 AS HUGEINT),
      |      list_transform(range(0, 4),
      |        i -> CAST((CAST(n_nationkey AS BIGINT) >> (8*i)) & 255 AS HUGEINT)))
      |      AS key_bytes
      |  FROM nation),
      |h AS (
      |  SELECT n_nationkey,
      |    list_reduce(name_bytes, (acc, x) ->
      |      ((acc - acc % 256 + xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)))
      |       * 1099511628211) % CAST(18446744073709551616 AS HUGEINT)) AS hn,
      |    list_reduce(key_bytes, (acc, x) ->
      |      ((acc - acc % 256 + xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)))
      |       * 1099511628211) % CAST(18446744073709551616 AS HUGEINT)) AS hk
      |  FROM b)
      |SELECT n_nationkey,
      |  CASE WHEN hn >= 9223372036854775808 THEN CAST(hn - 18446744073709551616 AS BIGINT)
      |       ELSE CAST(hn AS BIGINT) END AS h_name,
      |  CASE WHEN hk >= 9223372036854775808 THEN CAST(hk - 18446744073709551616 AS BIGINT)
      |       ELSE CAST(hk AS BIGINT) END AS h_key
      |FROM h ORDER BY n_nationkey""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_fnv_hash" -> fnvSql,
    "q_date_arith" -> dateArithSql,
    "q_expr_math" -> mathSql,
    "q_expr_string" -> stringSql,
    "q_expr_datetime" -> datetimeSql,
    "q_expr_conditional" -> conditionalSql,
    "q_expr_cast" -> castsSql,
    "q_expr_like" -> likeSql,
    "q_expr_in_between" -> inBetweenSql)
}
