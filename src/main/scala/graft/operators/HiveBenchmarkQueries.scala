package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The reference's hive-benchmark workload — the Pavlo et al. grep/web
  * suite (`testdata/workloads/hive-benchmark/queries/hive-benchmark.test`)
  * — re-expressed over this corpus and oracle-checked.
  *
  * The benchmark's tables do not exist in this corpus, so each derives
  * deterministically from a corpus table with the SAME derivation on the
  * Spark and DuckDB sides (the oracle therefore checks the full pipeline,
  * not just the final aggregate):
  *
  *  - `grep1gb(field)` := `documents(text)` — the corpus' long-string
  *    column, scanned by the GREP family (count(*), count(col),
  *    contains-LIKE);
  *  - `rankings(pageurl, pagerank)` := `part(p_partkey, p_size)`;
  *  - `uservisits(sourceip, desturl, visitdate, adrevenue)` :=
  *    `lineitem(l_suppkey, l_partkey, l_shipdate, l_extendedprice)` — the
  *    fact×dim join of WEB_Q1 keeps its real shape: uservisits⋈rankings on
  *    a key whose dimension side is broadcast-sized at every SF.
  *
  * Determinism deltas from the reference text: the LIMIT queries add a
  * key tiebreaker to ORDER BY (the reference's totals have unique values
  * on its data; derived doubles here could tie), and WEB_Q4's C-style
  * `&&` conjunction is exercised through the dialect parser's rewrite
  * (sql-scanner.flex maps `&&` -> KW_AND) in the spec, while the
  * registered query spells AND.
  *
  * Scale notes: GREP is a pure scan (predicate evaluated in codegen, no
  * shuffle); WEB_Q1/Q2 are scan → partial agg → single shuffle on the
  * group key with a broadcast dimension join; WEB_Q3 is a dimension-only
  * TopN (ordered limit pushes the bound into the sort). All money math
  * goes through DECIMAL per the package convention.
  */
object HiveBenchmarkQueries {

  /** GREP1GB_Q1: bare count. */
  val grepCount: QueryFn = (s, dir) =>
    t(s, dir, "documents").agg(count(lit(1)).as("cnt"))
  val grepCountSql: String =
    "SELECT CAST(count(*) AS BIGINT) AS cnt FROM documents"

  /** GREP1GB_Q2: count(col) — null-skipping count over the string column. */
  val grepField: QueryFn = (s, dir) =>
    t(s, dir, "documents").agg(count(col("text")).as("cnt"))
  val grepFieldSql: String =
    "SELECT CAST(count(text) AS BIGINT) AS cnt FROM documents"

  /** GREP1GB_Q3 / GREP10GB_Q1: contains-LIKE grep over the string column. */
  val grepLike: QueryFn = (s, dir) =>
    t(s, dir, "documents").filter(col("text").like("%agg%"))
      .agg(count(col("text")).as("cnt"))
  val grepLikeSql: String =
    "SELECT CAST(count(text) AS BIGINT) AS cnt FROM documents WHERE text LIKE '%agg%'"

  private def rankings(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "part").select(
      col("p_partkey").as("pageurl"), col("p_size").as("pagerank"))

  private def uservisits(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir, "lineitem").select(
      col("l_suppkey").as("sourceip"), col("l_partkey").as("desturl"),
      col("l_shipdate").as("visitdate"), col("l_extendedprice").as("adrevenue"))

  private val RankingsCte =
    "rankings AS (SELECT p_partkey AS pageurl, p_size AS pagerank FROM part)"
  private val UservisitsCte =
    """uservisits AS (SELECT l_suppkey AS sourceip, l_partkey AS desturl,
      |  l_shipdate AS visitdate, l_extendedprice AS adrevenue FROM lineitem)""".stripMargin

  /** WEB_Q1: the Pavlo join — visits in a date window joined to page
    * ranks, revenue-ranked top source. */
  val webJoin: QueryFn = (s, dir) => {
    val uv = uservisits(s, dir).filter(
      col("visitdate") > lit("1997-01-01").cast("timestamp") &&
      col("visitdate") < lit("1998-01-01").cast("timestamp"))
    uv.join(broadcast(rankings(s, dir)), col("pageurl") === col("desturl"))
      .groupBy(col("sourceip"))
      .agg((sum(col("pagerank")).cast(DoubleType) / count(lit(1))).as("avg_rank"),
        sumd(col("adrevenue")).as("totalrevenue"))
      .orderBy(col("totalrevenue").desc, col("sourceip"))
      .limit(1)
  }
  val webJoinSql: String =
    s"""WITH $RankingsCte,
       |$UservisitsCte
       |SELECT uv.sourceip, CAST(SUM(r.pagerank) AS DOUBLE) / COUNT(1) AS avg_rank,
       |  CAST(SUM(CAST(uv.adrevenue AS DECIMAL(12,2))) AS DOUBLE) AS totalrevenue
       |FROM uservisits uv JOIN rankings r ON r.pageurl = uv.desturl
       |WHERE uv.visitdate > TIMESTAMP '1997-01-01 00:00:00'
       |  AND uv.visitdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY uv.sourceip
       |ORDER BY totalrevenue DESC, uv.sourceip LIMIT 1""".stripMargin

  /** WEB_Q2: revenue top-10 sources. */
  val webTopSources: QueryFn = (s, dir) =>
    uservisits(s, dir).groupBy(col("sourceip"))
      .agg(sumd(col("adrevenue")).as("totalrevenue"))
      .orderBy(col("totalrevenue").desc, col("sourceip"))
      .limit(10)
  val webTopSourcesSql: String =
    s"""WITH $UservisitsCte
       |SELECT sourceip,
       |  CAST(SUM(CAST(adrevenue AS DECIMAL(12,2))) AS DOUBLE) AS totalrevenue
       |FROM uservisits GROUP BY sourceip
       |ORDER BY totalrevenue DESC, sourceip LIMIT 10""".stripMargin

  /** WEB_Q3: rank-filtered dimension TopN. */
  val webRankFilter: QueryFn = (s, dir) =>
    rankings(s, dir).filter(col("pagerank") > 10)
      .select(col("pagerank"), col("pageurl"))
      .orderBy(col("pagerank"), col("pageurl"))
      .limit(100)
  val webRankFilterSql: String =
    s"""WITH $RankingsCte
       |SELECT pagerank, pageurl FROM rankings WHERE pagerank > 10
       |ORDER BY pagerank, pageurl LIMIT 100""".stripMargin

  /** WEB_Q4: rank-range count (the reference spells the conjunction `&&`;
    * the dialect rewrite is pinned in HiveBenchmarkSpec). */
  val webRankRange: QueryFn = (s, dir) =>
    rankings(s, dir)
      .filter(col("pagerank") > 10 && col("pagerank") < 25)
      .agg(count(lit(1)).as("cnt"))
  val webRankRangeSql: String =
    s"""WITH $RankingsCte
       |SELECT CAST(count(*) AS BIGINT) AS cnt FROM rankings
       |WHERE pagerank > 10 AND pagerank < 25""".stripMargin

  /** WEB_Q5: global revenue average. */
  val webAvg: QueryFn = (s, dir) =>
    uservisits(s, dir)
      .agg((sumd(col("adrevenue")) / count(lit(1))).as("avg_revenue"))
  val webAvgSql: String =
    s"""WITH $UservisitsCte
       |SELECT CAST(SUM(CAST(adrevenue AS DECIMAL(12,2))) AS DOUBLE) / COUNT(1)
       |  AS avg_revenue FROM uservisits""".stripMargin

  /** WEB_Q6: the same average inside a date window. */
  val webAvgWindow: QueryFn = (s, dir) =>
    uservisits(s, dir).filter(
      col("visitdate") > lit("1997-07-01").cast("timestamp") &&
      col("visitdate") < lit("1997-12-31").cast("timestamp"))
      .agg((sumd(col("adrevenue")) / count(lit(1))).as("avg_revenue"))
  val webAvgWindowSql: String =
    s"""WITH $UservisitsCte
       |SELECT CAST(SUM(CAST(adrevenue AS DECIMAL(12,2))) AS DOUBLE) / COUNT(1)
       |  AS avg_revenue FROM uservisits
       |WHERE visitdate > TIMESTAMP '1997-07-01 00:00:00'
       |  AND visitdate < TIMESTAMP '1997-12-31 00:00:00'""".stripMargin

  val all: Map[String, QueryFn] = Map(
    "q_hb_grep_count" -> grepCount,
    "q_hb_grep_field" -> grepField,
    "q_hb_grep_like" -> grepLike,
    "q_hb_web_join" -> webJoin,
    "q_hb_web_topsources" -> webTopSources,
    "q_hb_web_rankfilter" -> webRankFilter,
    "q_hb_web_rankrange" -> webRankRange,
    "q_hb_web_avg" -> webAvg,
    "q_hb_web_avg_window" -> webAvgWindow)

  val oracle: Map[String, String] = Map(
    "q_hb_grep_count" -> grepCountSql,
    "q_hb_grep_field" -> grepFieldSql,
    "q_hb_grep_like" -> grepLikeSql,
    "q_hb_web_join" -> webJoinSql,
    "q_hb_web_topsources" -> webTopSourcesSql,
    "q_hb_web_rankfilter" -> webRankFilterSql,
    "q_hb_web_rankrange" -> webRankRangeSql,
    "q_hb_web_avg" -> webAvgSql,
    "q_hb_web_avg_window" -> webAvgWindowSql)
}
