package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, TimestampType}

/** The rest of the reference's TPC-DS workload — one query per remaining
  * file of `testdata/workloads/tpcds/queries/` (q3, q7, q19, q27, q42,
  * q46, q52, q53, q55, q63, q68, q73, q79, q96, count.test), adapted to
  * the corpus tables under the same rules as [[TpcdsQueries]]: the corpus
  * has no store_sales star schema, so each query re-creates its
  * counterpart's defining plan shape over the TPC-H-ish tables, keeping
  * the reference's join tree, filter structure (equality + OR families +
  * IN lists + non-equi residuals), grouping arity, ordering and LIMIT.
  * Attribute mapping: item→part, store/demographics→supplier(+nation),
  * date_dim→the fact's own timestamp column, ticket→orderkey.
  *
  * Scale notes as in [[TpcdsQueries]]: facts aggregate before joining
  * derived sides; every dimension side is bounded by dimension cardinality
  * and broadcastable; two-level queries (q46/q68/q79) shuffle the fact
  * once on the inner group key and join dimensions map-side.
  *
  * Oracle-exactness: package convention (decimal sums surfaced as double,
  * integer outputs cast to INTEGER in the DuckDB mirror, order keys chosen
  * totally ordered under LIMIT).
  */
object TpcdsWave2Queries {

  private def ts(d: String) = lit(d).cast(TimestampType)

  /** Q3-shape (tpcds-q3.test): star agg over OR'd December windows across
    * five years, grouped by sale year + brand attributes. */
  val qds3YearBrand: QueryFn = (s, dir) => {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val dec = (1995 to 1999).map { y =>
      col("o_orderdate") >= ts(f"$y-12-01") &&
        col("o_orderdate") < ts(f"${y + 1}-01-01")
    }.reduce(_ || _)
    o.filter(dec)
      .join(c, col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === "AUTOMOBILE")
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .groupBy(year(col("o_orderdate")).as("year_sold"), col("n_name"))
      .agg(sumd(col("o_totalprice")).as("sum_agg"))
      .orderBy(col("year_sold"), col("sum_agg").desc, col("n_name"))
      .limit(100)
  }
  val qds3YearBrandSql: String = {
    val dec = (1995 to 1999).map { y =>
      s"(o_orderdate >= TIMESTAMP '$y-12-01 00:00:00' AND o_orderdate < TIMESTAMP '${y + 1}-01-01 00:00:00')"
    }.mkString(" OR ")
    s"""SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS year_sold, n_name,
       |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_agg
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE c_mktsegment = 'AUTOMOBILE' AND ($dec)
       |GROUP BY 1, 2
       |ORDER BY year_sold, sum_agg DESC, n_name LIMIT 100""".stripMargin
  }

  /** Q7-shape (tpcds-q7.test): four AVG measures under equality + OR'd
    * dimension predicates and a year window, grouped by one item column. */
  val qds7Avg4: QueryFn = (s, dir) => {
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1997-01-01") &&
              col("l_shipdate") < ts("1998-01-01"))
    val p = t(s, dir, "part")
      .filter(col("p_brand") === "Brand#1" || col("p_size") === 10)
    val sup = t(s, dir, "supplier")
    // region-level equality: selective but populated at every SF (the
    // sf0.001 corpus has only 10 suppliers over 25 nations)
    val n = t(s, dir, "nation").filter(col("n_regionkey") === 1)
    def avg4(c: String, as: String) =
      (sumd(col(c)) / count(lit(1))).as(as)
    l.join(p, col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("p_type"))
      .agg(avg4("l_quantity", "agg1"), avg4("l_extendedprice", "agg2"),
           avg4("l_discount", "agg3"), avg4("l_tax", "agg4"))
      .orderBy(col("p_type"))
      .limit(100)
  }
  val qds7Avg4Sql: String = {
    def avg4(c: String, as: String) =
      s"CAST(SUM(CAST($c AS DECIMAL(12,2))) AS DOUBLE) / COUNT(1) AS $as"
    s"""SELECT p_type, ${avg4("l_quantity", "agg1")}, ${avg4("l_extendedprice", "agg2")},
       |  ${avg4("l_discount", "agg3")}, ${avg4("l_tax", "agg4")}
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE (p_brand = 'Brand#1' OR p_size = 10) AND n_regionkey = 1
       |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY p_type ORDER BY p_type LIMIT 100""".stripMargin
  }

  /** Q19-shape (tpcds-q19.test): five-table star with a month window and a
    * non-equi SUBSTR(<>) residual between two dimension columns. */
  val qds19BrandNonequi: QueryFn = (s, dir) => {
    val l = t(s, dir, "lineitem")
    val p = t(s, dir, "part").filter(col("p_type") === "PROMO")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-12-01") &&
              col("o_orderdate") < ts("1997-01-01"))
    val c = t(s, dir, "customer")
    val sup = t(s, dir, "supplier")
    l.join(p, col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .filter(substring(col("c_name"), 17, 2) =!= substring(col("s_name"), 17, 2))
      .groupBy(col("p_brand"))
      .agg(sumd(col("l_extendedprice")).as("ext_price"))
      .orderBy(col("ext_price").desc, col("p_brand"))
      .limit(100)
  }
  val qds19BrandNonequiSql: String =
    """SELECT p_brand,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS ext_price
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE p_type = 'PROMO'
      |  AND o_orderdate >= TIMESTAMP '1996-12-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND SUBSTR(c_name, 17, 2) <> SUBSTR(s_name, 17, 2)
      |GROUP BY p_brand ORDER BY ext_price DESC, p_brand LIMIT 100""".stripMargin

  /** Q27-shape (tpcds-q27.test): four AVG measures with an IN-list state
    * filter, grouped by (item, state). */
  val qds27Avg4State: QueryFn = (s, dir) => {
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1998-01-01") &&
              col("l_shipdate") < ts("1999-01-01"))
    val p = t(s, dir, "part")
    val sup = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
      .filter(col("n_regionkey").isin(1, 2))
    def avg4(c: String, as: String) =
      (sumd(col(c)) / count(lit(1))).as(as)
    l.join(p, col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("p_brand"), col("n_name"))
      .agg(avg4("l_quantity", "agg1"), avg4("l_extendedprice", "agg2"),
           avg4("l_discount", "agg3"), avg4("l_tax", "agg4"))
      .orderBy(col("p_brand"), col("n_name"))
      .limit(100)
  }
  val qds27Avg4StateSql: String = {
    def avg4(c: String, as: String) =
      s"CAST(SUM(CAST($c AS DECIMAL(12,2))) AS DOUBLE) / COUNT(1) AS $as"
    s"""SELECT p_brand, n_name, ${avg4("l_quantity", "agg1")},
       |  ${avg4("l_extendedprice", "agg2")}, ${avg4("l_discount", "agg3")},
       |  ${avg4("l_tax", "agg4")}
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE n_regionkey IN (1, 2)
       |  AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
       |GROUP BY 1, 2 ORDER BY p_brand, n_name LIMIT 100""".stripMargin
  }

  /** Q42/Q52/Q55-family (tpcds-q42/52/55.test): single-month star agg; the
    * three differ in grouping column and ordering, kept per file. */
  private def monthStar(s: org.apache.spark.sql.SparkSession, dir: String,
                        from: String, until: String, groupCol: String,
                        sizeFilter: Option[Int]) = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts(from) && col("o_orderdate") < ts(until))
    val l = t(s, dir, "lineitem")
    val p0 = t(s, dir, "part")
    val p = sizeFilter.fold(p0)(sz => p0.filter(col("p_size") === sz))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(year(col("o_orderdate")).as("d_year"), col(groupCol))
      .agg(sumd(col("l_extendedprice")).as("ext_price"))
  }
  private def monthStarSql(from: String, until: String, groupCol: String,
                           sizeFilter: Option[Int], order: String) = {
    val size = sizeFilter.fold("")(sz => s"AND p_size = $sz\n      |  ")
    s"""SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS d_year, $groupCol,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS ext_price
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |JOIN part ON l_partkey = p_partkey
       |WHERE o_orderdate >= TIMESTAMP '$from 00:00:00'
       |  AND o_orderdate < TIMESTAMP '$until 00:00:00'
       |  $size
       |GROUP BY 1, 2 ORDER BY $order LIMIT 100""".stripMargin
  }

  val qds42CategoryYear: QueryFn = (s, dir) =>
    monthStar(s, dir, "1997-12-01", "1998-01-01", "p_type", Some(1))
      .orderBy(col("ext_price").desc, col("d_year"), col("p_type"))
      .limit(100)
  val qds42CategoryYearSql: String =
    monthStarSql("1997-12-01", "1998-01-01", "p_type", Some(1),
      "ext_price DESC, d_year, p_type")

  val qds52BrandYear: QueryFn = (s, dir) =>
    monthStar(s, dir, "1997-12-01", "1998-01-01", "p_brand", Some(1))
      .orderBy(col("d_year"), col("ext_price").desc, col("p_brand"))
      .limit(100)
  val qds52BrandYearSql: String =
    monthStarSql("1997-12-01", "1998-01-01", "p_brand", Some(1),
      "d_year, ext_price DESC, p_brand")

  val qds55BrandTopn: QueryFn = (s, dir) =>
    monthStar(s, dir, "1998-12-01", "1999-01-01", "p_brand", None)
      .orderBy(col("ext_price").desc, col("p_brand"))
      .limit(100)
  val qds55BrandTopnSql: String =
    monthStarSql("1998-12-01", "1999-01-01", "p_brand", None,
      "ext_price DESC, p_brand")

  /** Q53/Q63-family (tpcds-q53/63.test): a year of sales under an OR of
    * two (category-list AND brand-list) conjunctions, grouped by an item
    * column × a calendar bucket, only the item column surfacing. */
  private val orFamily =
    (col("p_type").isin("ECONOMY", "MEDIUM") &&
      col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")) ||
    (col("p_type").isin("PROMO", "LARGE") &&
      col("p_brand").isin("Brand#13", "Brand#15", "Brand#19"))
  private val orFamilySql =
    """((p_type IN ('ECONOMY', 'MEDIUM')
      |    AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3'))
      |   OR (p_type IN ('PROMO', 'LARGE')
      |    AND p_brand IN ('Brand#13', 'Brand#15', 'Brand#19')))""".stripMargin

  val qds53QuarterManufact: QueryFn = (s, dir) => {
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1997-01-01") &&
              col("l_shipdate") < ts("1998-01-01"))
    val p = t(s, dir, "part").filter(orFamily)
    l.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), quarter(col("l_shipdate")).as("qoy"))
      .agg(sumd(col("l_extendedprice")).as("sum_sales"))
      // qoy joins the sort only as a tiebreaker BEFORE the projection: the
      // (sum_sales, p_brand) key alone is not total over (brand, quarter)
      // rows, so a tie at the LIMIT boundary could keep different rows in
      // each engine
      .orderBy(col("sum_sales"), col("p_brand"), col("qoy"))
      .limit(100)
      .select(col("p_brand"), col("sum_sales"))
  }
  val qds53QuarterManufactSql: String =
    s"""SELECT p_brand, sum_sales FROM (
       |  SELECT p_brand, QUARTER(l_shipdate) AS qoy,
       |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_sales
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |    AND $orFamilySql
       |  GROUP BY 1, 2) tmp1
       |ORDER BY sum_sales, p_brand, qoy LIMIT 100""".stripMargin

  val qds63MonthManager: QueryFn = (s, dir) => {
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1997-01-01") &&
              col("l_shipdate") < ts("1998-01-01"))
    val p = t(s, dir, "part").filter(orFamily)
    l.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_size"), month(col("l_shipdate")).as("moy"))
      .agg(sumd(col("l_extendedprice")).as("sum_sales"))
      // moy tiebreaker before the projection — see qds53
      .orderBy(col("p_size"), col("sum_sales"), col("moy"))
      .limit(100)
      .select(col("p_size"), col("sum_sales"))
  }
  val qds63MonthManagerSql: String =
    s"""SELECT p_size, sum_sales FROM (
       |  SELECT p_size, MONTH(l_shipdate) AS moy,
       |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_sales
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |    AND $orFamilySql
       |  GROUP BY 1, 2) tmp1
       |ORDER BY p_size, sum_sales, moy LIMIT 100""".stripMargin

  /** Q46/Q68/Q79-family (tpcds-q46/68/79.test): aggregate the fact at
    * (ticket, customer, bought-location) granularity, then join customer
    * detail and (q46/q68) the customer's CURRENT location with a non-equi
    * residual against the bought one. Location := the supplying nation. */
  private def boughtNation(s: org.apache.spark.sql.SparkSession, dir: String,
                           factFilter: org.apache.spark.sql.Column) = {
    val l = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val sup = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(factFilter)
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(n.select(col("n_nationkey").as("sn_key"),
                     col("n_name").as("bought_city")),
            col("s_nationkey") === col("sn_key"))
  }

  val qds46BoughtCity: QueryFn = (s, dir) => {
    val inner = boughtNation(s, dir,
        dayofweek(col("o_orderdate")).isin(1, 7) && // weekend, like d_dow IN (6,0)
          year(col("o_orderdate")).isin(1996, 1997, 1998))
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .groupBy(col("l_orderkey"), col("o_custkey"), col("bought_city"))
      .agg(sumd(col("l_extendedprice")).as("amt"),
           sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
             .cast(DoubleType).as("profit"))
    val c = t(s, dir, "customer")
    val cur = t(s, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("ca_city"))
    inner.join(c, col("o_custkey") === col("c_custkey"))
      .join(cur, col("c_nationkey") === col("cn_key"))
      .filter(col("ca_city") =!= col("bought_city"))
      .select(col("c_name"), col("ca_city"), col("bought_city"),
              col("l_orderkey").as("ss_ticket_number"), col("amt"), col("profit"))
      .orderBy(col("c_name"), col("ca_city"), col("bought_city"),
               col("ss_ticket_number"))
      .limit(100)
  }
  val qds46BoughtCitySql: String =
    """SELECT c_name, cur.n_name AS ca_city, dn.bought_city,
      |  dn.l_orderkey AS ss_ticket_number, dn.amt, dn.profit
      |FROM (
      |  SELECT l_orderkey, o_custkey, n_name AS bought_city,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS amt,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |             (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS profit
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE DAYOFWEEK(o_orderdate) + 1 IN (1, 7)
      |    AND YEAR(o_orderdate) IN (1996, 1997, 1998)
      |    AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      |  GROUP BY 1, 2, 3) dn
      |JOIN customer ON dn.o_custkey = c_custkey
      |JOIN nation cur ON c_nationkey = cur.n_nationkey
      |WHERE cur.n_name <> dn.bought_city
      |ORDER BY c_name, ca_city, bought_city, ss_ticket_number
      |LIMIT 100""".stripMargin

  val qds68ThreeSums: QueryFn = (s, dir) => {
    val inner = boughtNation(s, dir,
        dayofmonth(col("o_orderdate")).isin(1, 2) &&
          year(col("o_orderdate")).between(1996, 1998))
      .groupBy(col("l_orderkey"), col("o_custkey"), col("bought_city"))
      .agg(sumd(col("l_extendedprice")).as("extended_price"),
           sumd(col("l_tax")).as("extended_tax"),
           sumd(col("l_quantity")).as("list_price"))
    val c = t(s, dir, "customer")
    val cur = t(s, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("ca_city"))
    inner.join(c, col("o_custkey") === col("c_custkey"))
      .join(cur, col("c_nationkey") === col("cn_key"))
      .filter(col("ca_city") =!= col("bought_city"))
      .select(col("c_name"), col("ca_city"), col("bought_city"),
              col("l_orderkey").as("ss_ticket_number"),
              col("extended_price"), col("extended_tax"), col("list_price"))
      .orderBy(col("c_name"), col("ss_ticket_number"), col("bought_city"))
      .limit(100)
  }
  val qds68ThreeSumsSql: String =
    """SELECT c_name, cur.n_name AS ca_city, dn.bought_city,
      |  dn.l_orderkey AS ss_ticket_number,
      |  dn.extended_price, dn.extended_tax, dn.list_price
      |FROM (
      |  SELECT l_orderkey, o_custkey, n_name AS bought_city,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS extended_price,
      |    CAST(SUM(CAST(l_tax AS DECIMAL(12,2))) AS DOUBLE) AS extended_tax,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS list_price
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE DAYOFMONTH(o_orderdate) IN (1, 2)
      |    AND YEAR(o_orderdate) BETWEEN 1996 AND 1998
      |  GROUP BY 1, 2, 3) dn
      |JOIN customer ON dn.o_custkey = c_custkey
      |JOIN nation cur ON c_nationkey = cur.n_nationkey
      |WHERE cur.n_name <> dn.bought_city
      |ORDER BY c_name, ss_ticket_number, bought_city
      |LIMIT 100""".stripMargin

  val qds79SubstrOut: QueryFn = (s, dir) => {
    val inner = boughtNation(s, dir,
        dayofweek(col("o_orderdate")) === 2 && // Monday, like d_dow = 1
          year(col("o_orderdate")).isin(1997, 1998, 1999))
      .filter(col("s_acctbal").between(0, 5000))
      .groupBy(col("l_orderkey"), col("o_custkey"), col("bought_city"))
      .agg(sumd(col("l_discount")).as("amt"),
           sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
             .cast(DoubleType).as("profit"))
    val c = t(s, dir, "customer")
    inner.join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), substring(col("bought_city"), 1, 8).as("ss_city"),
              col("l_orderkey").as("ss_ticket_number"), col("amt"), col("profit"))
      .orderBy(col("c_name"), col("ss_city"), col("profit"),
               col("ss_ticket_number"))
      .limit(100)
  }
  val qds79SubstrOutSql: String =
    """SELECT c_name, SUBSTR(ms.bought_city, 1, 8) AS ss_city,
      |  ms.l_orderkey AS ss_ticket_number, ms.amt, ms.profit
      |FROM (
      |  SELECT l_orderkey, o_custkey, n_name AS bought_city,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS amt,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |             (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS profit
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE DAYOFWEEK(o_orderdate) + 1 = 2
      |    AND YEAR(o_orderdate) IN (1997, 1998, 1999)
      |    AND s_acctbal BETWEEN 0 AND 5000
      |  GROUP BY 1, 2, 3) ms
      |JOIN customer ON ms.o_custkey = c_custkey
      |ORDER BY c_name, ss_city, profit, ss_ticket_number
      |LIMIT 100""".stripMargin

  /** Q73-shape (tpcds-q73.test): Q34's count-range sibling with a narrow
    * range and priority/year dimension filters. */
  val qds73CountRange2: QueryFn = (s, dir) => {
    val l = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
              year(col("o_orderdate")).isin(1996, 1997, 1998))
    val c = t(s, dir, "customer")
    val dn = l.groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").between(1, 3))
    dn.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderpriority"), col("o_orderkey"), col("cnt"))
      .orderBy(col("cnt").desc, col("c_name"), col("o_orderkey"))
  }
  val qds73CountRange2Sql: String =
    """SELECT c_name, o_orderpriority, o_orderkey, cnt
      |FROM (SELECT l_orderkey, COUNT(1) AS cnt FROM lineitem
      |      GROUP BY l_orderkey HAVING COUNT(1) BETWEEN 1 AND 3) dn
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |  AND YEAR(o_orderdate) IN (1996, 1997, 1998)
      |ORDER BY cnt DESC, c_name, o_orderkey""".stripMargin

  /** Q96-shape (tpcds-q96.test): bare COUNT(*) over a four-way star with
    * selective dimension equality/range filters. */
  val qds96CountJoin: QueryFn = (s, dir) => {
    val l = t(s, dir, "lineitem")
      .filter(dayofmonth(col("l_shipdate")) >= 15)
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val sup = t(s, dir, "supplier")
    val n = t(s, dir, "nation").filter(col("n_regionkey") === 0)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .agg(count(lit(1)).as("total"))
  }
  val qds96CountJoinSql: String =
    """SELECT COUNT(1) AS total
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE DAYOFMONTH(l_shipdate) >= 15
      |  AND c_mktsegment = 'BUILDING' AND n_regionkey = 0""".stripMargin

  /** count.test: the workload's table-cardinality sweep, one row per
    * corpus table (the reference pins loader row counts the same way). */
  private val countTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
  val qdsCount: QueryFn = (s, dir) =>
    countTables.map { name =>
      t(s, dir, name).agg(count(lit(1)).as("n"))
        .select(lit(name).as("tbl"), col("n"))
    }.reduce(_.unionAll(_)).orderBy(col("tbl"))
  val qdsCountSql: String =
    countTables.map(name =>
      s"SELECT '$name' AS tbl, COUNT(1) AS n FROM $name")
      .mkString("", "\nUNION ALL\n", "\nORDER BY tbl")

  val all: Map[String, QueryFn] = Map(
    "qds3_year_brand" -> qds3YearBrand,
    "qds7_avg4" -> qds7Avg4,
    "qds19_brand_nonequi" -> qds19BrandNonequi,
    "qds27_avg4_state" -> qds27Avg4State,
    "qds42_category_year" -> qds42CategoryYear,
    "qds46_bought_city" -> qds46BoughtCity,
    "qds52_brand_year" -> qds52BrandYear,
    "qds53_quarter_manufact" -> qds53QuarterManufact,
    "qds55_brand_topn" -> qds55BrandTopn,
    "qds63_month_manager" -> qds63MonthManager,
    "qds68_three_sums" -> qds68ThreeSums,
    "qds73_count_range2" -> qds73CountRange2,
    "qds79_substr_out" -> qds79SubstrOut,
    "qds96_count_join" -> qds96CountJoin,
    "qds_count" -> qdsCount)

  val oracle: Map[String, String] = Map(
    "qds3_year_brand" -> qds3YearBrandSql,
    "qds7_avg4" -> qds7Avg4Sql,
    "qds19_brand_nonequi" -> qds19BrandNonequiSql,
    "qds27_avg4_state" -> qds27Avg4StateSql,
    "qds42_category_year" -> qds42CategoryYearSql,
    "qds46_bought_city" -> qds46BoughtCitySql,
    "qds52_brand_year" -> qds52BrandYearSql,
    "qds53_quarter_manufact" -> qds53QuarterManufactSql,
    "qds55_brand_topn" -> qds55BrandTopnSql,
    "qds63_month_manager" -> qds63MonthManagerSql,
    "qds68_three_sums" -> qds68ThreeSumsSql,
    "qds73_count_range2" -> qds73CountRange2Sql,
    "qds79_substr_out" -> qds79SubstrOutSql,
    "qds96_count_join" -> qds96CountJoinSql,
    "qds_count" -> qdsCountSql)
}
