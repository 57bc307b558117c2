package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.operators.{t, QueryFn}
import graft.pipeline.TextQueries.tokens

/** Corpus-assembly operators: STRATIFIED SAMPLING (build a training mixture
  * by drawing a fixed byte/token budget per stratum) and BM25 RETRIEVAL
  * (keyword-ranked selection — the lexical half of retrieval-based curation,
  * complementing the embedding tiers in [[SimilarityQueries]]).
  *
  * No analogue in the reference engine; these are training-data-pipeline
  * mandate extensions like [[CurationQueries]]. Scale design:
  *
  *  - Stratified sampling orders each stratum by a DETERMINISTIC hash of the
  *    doc id (md5, no RNG state, reproducible on any cluster) and keeps the
  *    prefix whose cumulative size fits the stratum budget. Expressed as one
  *    window (cumsum + rank share a single sort). With few strata each
  *    stratum serializes through one task; at 100 TB you'd (a) pre-aggregate
  *    per-stratum totals (tiny), (b) turn the budget into a hash THRESHOLD
  *    p = budget/total and keep rows where hash < p — one broadcast join,
  *    zero sort, approximate-but-unbiased budget adherence; the exact-budget
  *    window form below is the correctness baseline the threshold form is
  *    validated against.
  *  - BM25 computes per-document term frequencies as pure projections (no
  *    explode — the query term set is fixed and tiny), aggregates corpus
  *    stats (N, Σdl, per-term df) into ONE broadcast row, and scores in a
  *    second pass over the narrow checkpointed tf frame. Only the final
  *    top-k sorts, and that after a score>0 filter. At 100 TB: the tf
  *    projection fuses into the scan, the stats row is O(1), and top-k is
  *    Spark's TakeOrderedAndProject — no global sort materializes.
  */
object MixtureQueries {

  // ------------------------------------------------------------- stratified

  /** Per-language character budget. Fixed (not SF-scaled) on purpose: a
    * mixture spec says "this many bytes of French", whatever the corpus
    * holds; strata smaller than the budget contribute everything. */
  private val StratumCharBudget = 10000L

  /** Deterministic per-stratum sample: order docs inside each language by
    * md5("smp"+doc_id), keep the prefix with cumulative n_chars within
    * budget. Emits the sample order and running totals — the frame a
    * pipeline joins back to materialize the mixture. */
  val stratifiedSample: QueryFn = (s, dir) => {
    val d = t(s, dir, "documents")
    val key = md5(concat(lit("smp"), col("doc_id").cast("string")))
    val ord = Window.partitionBy(col("lang")).orderBy(col("skey"))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.select(col("lang"), col("doc_id"), col("n_chars"), key.as("skey"))
      .withColumn("cum_chars", sum(col("n_chars")).over(cum))
      .withColumn("sample_rank", row_number().over(ord))
      .filter(col("cum_chars") <= StratumCharBudget)
      .select(col("lang"), col("sample_rank"), col("doc_id"),
              col("n_chars"), col("cum_chars"))
  }
  val stratifiedSampleSql: String =
    s"""WITH k AS (
       |  SELECT lang, doc_id, n_chars,
       |    md5('smp' || CAST(doc_id AS VARCHAR)) AS skey
       |  FROM documents)
       |SELECT lang,
       |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY skey) AS sample_rank,
       |  doc_id, n_chars,
       |  CAST(SUM(n_chars) OVER (PARTITION BY lang ORDER BY skey
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cum_chars
       |FROM k
       |QUALIFY cum_chars <= $StratumCharBudget
       |ORDER BY lang, sample_rank""".stripMargin

  /** The 100 TB form of [[stratifiedSample]]: no per-stratum sort at all.
    * Per-stratum totals (a tiny aggregate, broadcast) turn the byte budget
    * into a keep-RATE, and a document is kept iff its deterministic hash
    * unit u = int(md5[0:8])/2³² falls below the stratum's rate — one
    * shuffle-free scan, unbiased expected budget adherence (exact-budget
    * selection is what the window variant above is for; MixtureSpec
    * measures the adherence of this one against it). Strata smaller than
    * the budget get rate 1.0 and are kept whole. Same "smp" hash domain as
    * the window variant, so the two samplers rank documents identically. */
  val stratifiedSampleThreshold: QueryFn = (s, dir) => {
    val d = t(s, dir, "documents")
    val totals = d.groupBy(col("lang")).agg(sum(col("n_chars")).as("tot"))
    val u = conv(substring(
        md5(concat(lit("smp"), col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("long").cast(DoubleType) / lit(4294967296.0)
    d.join(broadcast(totals), "lang")
      .select(col("lang"), col("doc_id"), col("n_chars"),
        u.as("hash_u"),
        least(lit(1.0), lit(StratumCharBudget.toDouble) / col("tot"))
          .as("keep_rate"))
      .filter(col("hash_u") < col("keep_rate"))
  }
  val stratifiedSampleThresholdSql: String =
    s"""WITH tot AS (
       |  SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS tot
       |  FROM documents GROUP BY lang),
       |u AS (
       |  SELECT d.lang, d.doc_id, d.n_chars,
       |    CAST(CAST(('0x' || substr(
       |        md5('smp' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
       |      AS DOUBLE) / 4294967296.0 AS hash_u,
       |    LEAST(1.0, ${StratumCharBudget.toDouble} / tot) AS keep_rate
       |  FROM documents d JOIN tot USING (lang))
       |SELECT lang, doc_id, n_chars, hash_u, keep_rate
       |FROM u WHERE hash_u < keep_rate
       |ORDER BY lang, doc_id""".stripMargin

  // ------------------------------------------------------------------ bm25

  /** Fixed keyword query. BM25 parameters are the classic Robertson
    * defaults (k1=1.2, b=0.75); idf is the +1-smoothed Lucene form
    * ln((N−df+0.5)/(df+0.5)+1), positive for every df ≤ N. */
  private val QueryTerms = Seq("spark", "join", "window")
  private val K1 = 1.2
  private val Bb = 0.75
  private val TopK = 20

  /** BM25 top-20: scores every document containing at least one query term.
    * The score sums the three per-term contributions IN WRITTEN ORDER on
    * both engines (no SUM over an unordered term set), so the only
    * cross-engine FP hazard is ln()'s last ulp — absorbed by round(6). */
  val bm25: QueryFn = (s, dir) => {
    val d = t(s, dir, "documents")
    val toks = tokens(col("text"))
    // Narrow (doc_id, dl, tf_i...) frame, checkpointed: both the stats
    // aggregate and the scoring pass read it, so the corpus scans once.
    val tf = d.select(
        col("doc_id") +: size(toks).as("dl") +:
          QueryTerms.zipWithIndex.map { case (term, i) =>
            size(filter(toks, x => x === lit(term))).as(s"tf_$i")
          }: _*)
      .transform(graft.Engine.materialize)
    val statCols =
      count(lit(1)).as("n_docs") +: sum(col("dl")).as("sum_dl") +:
        QueryTerms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1).otherwise(0)).as(s"df_$i"))
    val stats = tf.agg(statCols.head, statCols.tail: _*)
    val avgdl = col("sum_dl").cast(DoubleType) / col("n_docs")
    def contrib(i: Int): Column = {
      val tfi = col(s"tf_$i").cast(DoubleType)
      val idf = log((col("n_docs") - col(s"df_$i") + 0.5) /
                    (col(s"df_$i") + 0.5) + 1.0)
      when(col(s"tf_$i") > 0,
        idf * (tfi * (K1 + 1.0)) /
          (tfi + lit(K1) * (lit(1.0 - Bb) +
            lit(Bb) * col("dl").cast(DoubleType) / avgdl)))
        .otherwise(lit(0.0))
    }
    val score = QueryTerms.indices.map(contrib).reduceLeft(_ + _)
    val anyHit = QueryTerms.indices
      .map(i => col(s"tf_$i") > 0)
      .reduceLeft(_ || _)
    val scored = tf.crossJoin(broadcast(stats))
      .filter(anyHit) // same match predicate as the oracle's WHERE, not the
                      // rounded score (a sub-ulp score could round to 0.0)
      .select(col("doc_id"), col("dl"), round(score, 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(TopK)
    scored.withColumn("rank",
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("dl"), col("bm25"))
      .orderBy(col("rank"))
  }
  val bm25Sql: String =
    s"""WITH tf AS (
       |  SELECT doc_id, len(w) AS dl,
       |    len(list_filter(w, x -> x = 'spark'))  AS tf_0,
       |    len(list_filter(w, x -> x = 'join'))   AS tf_1,
       |    len(list_filter(w, x -> x = 'window')) AS tf_2
       |  FROM (SELECT doc_id,
       |          regexp_split_to_array(trim(text), '\\s+') AS w
       |        FROM documents)),
       |st AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(dl) AS BIGINT) AS sum_dl,
       |    CAST(SUM(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_0,
       |    CAST(SUM(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_1,
       |    CAST(SUM(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_2
       |  FROM tf),
       |scored AS (
       |  SELECT doc_id, dl, ROUND(
       |      (CASE WHEN tf_0 > 0 THEN
       |        ln((n_docs - df_0 + 0.5) / (df_0 + 0.5) + 1.0)
       |          * (CAST(tf_0 AS DOUBLE) * ${K1 + 1.0})
       |          / (CAST(tf_0 AS DOUBLE) + $K1 * (${1.0 - Bb} + $Bb
       |             * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))
       |        ELSE 0.0 END)
       |    + (CASE WHEN tf_1 > 0 THEN
       |        ln((n_docs - df_1 + 0.5) / (df_1 + 0.5) + 1.0)
       |          * (CAST(tf_1 AS DOUBLE) * ${K1 + 1.0})
       |          / (CAST(tf_1 AS DOUBLE) + $K1 * (${1.0 - Bb} + $Bb
       |             * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))
       |        ELSE 0.0 END)
       |    + (CASE WHEN tf_2 > 0 THEN
       |        ln((n_docs - df_2 + 0.5) / (df_2 + 0.5) + 1.0)
       |          * (CAST(tf_2 AS DOUBLE) * ${K1 + 1.0})
       |          / (CAST(tf_2 AS DOUBLE) + $K1 * (${1.0 - Bb} + $Bb
       |             * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))
       |        ELSE 0.0 END), 6) AS bm25
       |  FROM tf CROSS JOIN st
       |  WHERE tf_0 > 0 OR tf_1 > 0 OR tf_2 > 0)
       |SELECT ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rank,
       |  doc_id, dl, bm25
       |FROM scored
       |ORDER BY bm25 DESC, doc_id
       |LIMIT $TopK""".stripMargin

  val all: Map[String, QueryFn] = Map(
    "q_sample_stratified" -> stratifiedSample,
    "q_sample_threshold" -> stratifiedSampleThreshold,
    "q_search_bm25" -> bm25)

  val oracle: Map[String, String] = Map(
    "q_sample_stratified" -> stratifiedSampleSql,
    "q_sample_threshold" -> stratifiedSampleThresholdSql,
    "q_search_bm25" -> bm25Sql)
}
