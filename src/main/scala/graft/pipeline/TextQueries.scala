package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.operators.{t, QueryFn}

/** Text-analysis operators for training-data curation over the `documents`
  * table: token counting, quality scoring, language-ID heuristics, document
  * fingerprinting.
  *
  * These have no analogue in the reference engine (it is a pure SQL engine);
  * they are the data-pipeline capabilities a 100 TB curation workload needs,
  * expressed entirely as codegen'd column expressions — per-row CPU that
  * fuses into the scan stage, no shuffle at all (embarrassingly parallel at
  * any scale).
  */
object TextQueries {

  /** Whitespace tokens of the (trimmed) document text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Word n-grams over an ALREADY-MATERIALIZED token-array column — THE
    * n-gram builder (shingling, decontamination, repetition all call this;
    * keep the short-doc guard and window build in one place). The caller
    * must project its token split into its own column first: fed the split
    * expression inline, every `element_at` re-runs the regex split
    * (CollapseProject keeps a multiply-referenced non-cheap projection,
    * which is exactly what the two-step select exploits — measured 22 s vs
    * ~2 s at sf0.1 in the decontam gram pass). Guarded because Spark's
    * `sequence(0, stop)` steps DOWNWARD for stop < 0: a doc shorter than n
    * tokens must short-circuit to an empty gram set. */
  def wordNgrams(toks: Column, n: Int, distinct: Boolean): Column = {
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (1 to n).map(k => element_at(toks, i + k)): _*))
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(if (distinct) array_distinct(grams) else grams)
  }

  /** Whitespace-normalized lowercase text — THE content-identity key: both
    * exact dedup (DedupQueries) and fingerprinting hash this exact
    * expression, so dedup groups and fingerprint shard buckets stay
    * consistent by construction. */
  def normalizedText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** English-ish stopword list used by quality + lang-id scoring. */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "in", "is", "to")

  /** Token counting: whitespace tokens + a BPE-ish subword proxy (4 chars ≈
    * 1 token, the common rule-of-thumb estimator) + non-space char count. */
  val tokenCount: QueryFn = (s, dir) => tokenCountFrame(t(s, dir, "documents"))
  def tokenCountFrame(d: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nChars = length(regexp_replace(col("text"), "\\s+", ""))
    d.select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        nChars.as("n_nonspace_chars"),
        ceil(nChars.cast(DoubleType) / 4.0).cast("long").as("bpe_est_tokens"),
        (nChars.cast(DoubleType) / size(toks)).as("avg_token_len"))
  }
  val tokenCountSql: String =
    """SELECT doc_id,
      |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
      |  length(regexp_replace(text, '\s+', '', 'g')) AS n_nonspace_chars,
      |  CAST(CEIL(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / 4.0) AS BIGINT) AS bpe_est_tokens,
      |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
      |    / len(regexp_split_to_array(trim(text), '\s+')) AS avg_token_len
      |FROM documents""".stripMargin

  /** Quality scoring: stopword ratio, type-token ratio (vocabulary
    * diversity), digit ratio; combined into one [0,1] score. */
  val quality: QueryFn = (s, dir) => qualityFrame(t(s, dir, "documents"))
  def qualityFrame(d: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast(DoubleType)
    val stopHits = size(filter(toks, tk => tk.isInCollection(EnStopwords)))
    val ttr = size(array_distinct(toks)).cast(DoubleType) / nTok
    val digitRatio =
      length(regexp_replace(col("text"), "[^0-9]", "")).cast(DoubleType) /
        length(col("text"))
    val stopRatio = stopHits.cast(DoubleType) / nTok
    // No rounding: both engines evaluate these ratio expressions in the same
    // IEEE operation order, so raw doubles are bit-identical — while ROUND
    // at a half-boundary diverges (Spark rounds the double's shortest
    // decimal repr, DuckDB its exact binary value).
    d.select(
        col("doc_id"),
        stopRatio.as("stopword_ratio"),
        ttr.as("type_token_ratio"),
        digitRatio.as("digit_ratio"),
        ((ttr * 0.5) + (lit(1.0) - digitRatio) * 0.3 + stopRatio * 0.2)
          .as("quality_score"))
  }
  val qualitySql: String =
    """WITH q AS (
      |  SELECT doc_id,
      |    regexp_split_to_array(trim(text), '\s+') AS toks,
      |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
      |      / length(text) AS digit_ratio
      |  FROM documents),
      |r AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(toks,
      |      tk -> tk IN ('the','a','an','of','and','in','is','to'))) AS DOUBLE)
      |      / len(toks) AS stopword_ratio,
      |    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS type_token_ratio,
      |    digit_ratio
      |  FROM q)
      |SELECT doc_id,
      |  stopword_ratio,
      |  type_token_ratio,
      |  digit_ratio,
      |  type_token_ratio * 0.5 + (1.0 - digit_ratio) * 0.3
      |    + stopword_ratio * 0.2 AS quality_score
      |FROM r""".stripMargin

  /** Language-ID n-gram/stopword heuristic: per-language function-word hit
    * counts; highest count wins (threshold 1, else 'und'). The corpus is
    * synthetic word-soup so most rows land 'en'/'und' — the point is the
    * mechanism: pure projection, no shuffle. */
  val langId: QueryFn = (s, dir) => langIdFrame(t(s, dir, "documents"))
  def langIdFrame(d: DataFrame): DataFrame = {
    val toks = tokens(lower(col("text")))
    def hits(words: Seq[String]): Column =
      size(filter(toks, tk => tk.isInCollection(words)))
    val en = hits(Seq("the", "a", "of", "and", "is"))
    val de = hits(Seq("der", "die", "das", "und", "ist"))
    val fr = hits(Seq("le", "la", "les", "et", "est"))
    val es = hits(Seq("el", "los", "las", "y", "es"))
    val best = greatest(en, de, fr, es)
    d.select(
        col("doc_id"), col("lang").as("lang_claimed"),
        en.as("en_hits"), de.as("de_hits"), fr.as("fr_hits"), es.as("es_hits"),
        when(best === 0, "und")
          .when(en === best, "en").when(de === best, "de")
          .when(fr === best, "fr").otherwise("es").as("lang_pred"))
  }
  val langIdSql: String =
    """WITH h AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        tk -> tk IN ('the','a','of','and','is'))) AS en_hits,
      |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        tk -> tk IN ('der','die','das','und','ist'))) AS de_hits,
      |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        tk -> tk IN ('le','la','les','et','est'))) AS fr_hits,
      |    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
      |        tk -> tk IN ('el','los','las','y','es'))) AS es_hits
      |  FROM documents)
      |SELECT doc_id, lang AS lang_claimed, en_hits, de_hits, fr_hits, es_hits,
      |  CASE WHEN GREATEST(en_hits, de_hits, fr_hits, es_hits) = 0 THEN 'und'
      |       WHEN en_hits = GREATEST(en_hits, de_hits, fr_hits, es_hits) THEN 'en'
      |       WHEN de_hits = GREATEST(en_hits, de_hits, fr_hits, es_hits) THEN 'de'
      |       WHEN fr_hits = GREATEST(en_hits, de_hits, fr_hits, es_hits) THEN 'fr'
      |       ELSE 'es' END AS lang_pred
      |FROM h""".stripMargin

  /** Document fingerprinting: md5 over whitespace-normalized lowercase text
    * (the content hash exact-dedup keys on) + a 16-bit shard bucket derived
    * from it — the partition key a 100 TB dedup would shuffle on. */
  val fingerprint: QueryFn = (s, dir) => fingerprintFrame(t(s, dir, "documents"))
  def fingerprintFrame(d: DataFrame): DataFrame = {
    val fp = md5(normalizedText(col("text")).cast("binary"))
    d.select(
        col("doc_id"), fp.as("fingerprint"),
        substring(fp, 1, 4).as("shard_bucket"))
  }
  val fingerprintSql: String =
    """SELECT doc_id,
      |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
      |  substring(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 4) AS shard_bucket
      |FROM documents""".stripMargin

  /** Document chunking: fixed token windows with overlap — the step every
    * pretraining pipeline runs between cleaning and tokenization. Window
    * `ChunkW` = 64 whitespace tokens, stride `ChunkStride` = 48 (overlap
    * 16); a document of n tokens emits `1 + ceil((n-W)/stride)` chunks
    * (one chunk when n ≤ W; the final chunk may be short, never empty).
    *
    * Scale shape: `sequence` + `posexplode` over per-row arithmetic — a
    * scan-side rowwise expansion with NO shuffle and no driver
    * involvement; output rows ≈ input tokens / stride, so the expansion
    * factor is bounded by construction. Chunk text is emitted as an md5
    * (content-identity for the dedup tiers downstream) plus its exact
    * token count — the full chunk text would multiply the output bytes by
    * the overlap factor for no verification gain. */
  val ChunkW = 64
  val ChunkStride = 48
  val chunk: QueryFn = (s, dir) => chunkFrame(t(s, dir, "documents"))
  def chunkFrame(d: DataFrame): DataFrame = {
    val toks = filter(tokens(col("text")), _ =!= "")
    val n = size(toks)
    val nChunks = when(n <= ChunkW, lit(1))
      .otherwise(lit(1) + ceil((n - ChunkW).cast(DoubleType) / ChunkStride)
        .cast("int"))
    d.select(col("doc_id"), toks.as("toks"), nChunks.as("n_chunks"))
      .select(col("doc_id"),
        posexplode(sequence(lit(0), col("n_chunks") - 1)).as(Seq("pos", "k")),
        col("toks"))
      .select(
        col("doc_id"),
        col("k").cast("int").as("chunk_id"),
        size(slice(col("toks"), col("k") * ChunkStride + 1, lit(ChunkW)))
          .as("n_chunk_tokens"),
        md5(encode(array_join(
          slice(col("toks"), col("k") * ChunkStride + 1, lit(ChunkW)), " "),
          "UTF-8")).as("chunk_md5"))
  }
  val chunkSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(trim(text), '\\s+'),
      |                x -> x != '') AS t
      |  FROM documents
      |), n AS (
      |  SELECT doc_id, t, len(t) AS nt,
      |    CASE WHEN len(t) <= $ChunkW THEN 1
      |         ELSE 1 + CAST(CEIL(CAST(len(t) - $ChunkW AS DOUBLE)
      |                            / $ChunkStride) AS INT) END AS n_chunks
      |  FROM toks
      |), e AS (
      |  SELECT doc_id, t, unnest(range(0, n_chunks)) AS k FROM n
      |)
      |SELECT doc_id,
      |  CAST(k AS INT) AS chunk_id,
      |  CAST(len(t[k*$ChunkStride+1 : k*$ChunkStride+$ChunkW]) AS INT)
      |    AS n_chunk_tokens,
      |  md5(array_to_string(t[k*$ChunkStride+1 : k*$ChunkStride+$ChunkW],
      |      ' ')) AS chunk_md5
      |FROM e""".stripMargin

  /** Winnowing fingerprints ([[graft.functions.Winnow]] — MOSS rolling-hash
    * k-gram fingerprinting, k=8 w=4 base=263 mod 2³¹−1): one row per
    * (doc, selected fingerprint). Complements [[fingerprint]]'s whole-doc
    * md5: winnowing survives partial overlap (any shared ≥11-char substring
    * of the normalized text shares a fingerprint), which is what a
    * plagiarism/near-dup index joins on. The expression is a single
    * codegen'd O(n) pass (monotonic-deque window minimum over a true
    * rolling hash); output is the canonical sorted distinct VALUE set, so
    * the DuckDB oracle can rebuild it positionally with list ops over the
    * text's UTF-8 BYTES ([[DedupQueries.utf8BytesSql]] — the expression
    * walks `UTF8String.getBytes`, so the oracle expands code points to
    * their encoded octets; exact on every code-point width, gated by
    * q_doc_winnow_utf8). At 100 TB the (fingerprint → doc) inverted
    * index this explodes into is an ordinary hash-shuffle groupBy. */
  val winnowFp: QueryFn = (s, dir) => winnowFpFrame(t(s, dir, "documents"))
  def winnowFpFrame(d: DataFrame): DataFrame =
    // No global orderBy: the compare harness sorts rows itself, and a
    // range-exchange over the exploded fingerprint frame would be pure
    // waste at scale (same convention as fingerprint/dedup outputs).
    d.select(col("doc_id"),
        explode(graft.functions.Winnow(normalizedText(col("text"))))
          .as("fingerprint"))
  val winnowFpSql: String =
    s"""WITH nt AS (
      |  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS s
      |  FROM documents),
      |bs AS (
      |  SELECT doc_id,
      |    list_transform(${DedupQueries.utf8BytesSql("s")},
      |                   b -> CAST(b AS BIGINT)) AS b
      |  FROM nt),
      |h AS (
      |  SELECT doc_id,
      |    list_transform(range(1, greatest(len(b) - 7, 0) + 1),
      |      i -> list_reduce(
      |        list_prepend(CAST(0 AS BIGINT), b[i:i+7]),
      |        (acc, c) -> (acc * 263 + c) % 2147483647)) AS hs
      |  FROM bs),
      |fp AS (
      |  SELECT doc_id,
      |    CASE WHEN len(hs) = 0 THEN []
      |         WHEN len(hs) <= 4 THEN [list_min(hs)]
      |         ELSE list_distinct(list_transform(range(1, len(hs) - 2),
      |                j -> list_min(hs[j:j+3]))) END AS fps
      |  FROM h)
      |SELECT doc_id, unnest(list_sort(fps)) AS fingerprint
      |FROM fp ORDER BY doc_id, fingerprint""".stripMargin

  /** Repetition filters (the Gopher/MassiveText family): boilerplate and
    * degenerate generations show up as REPEATED n-grams, not as bad
    * vocabulary, so production quality gates threshold on
    *
    *  - `dup_token_frac`: fraction of token occurrences that are repeats
    *    of an earlier token (1 − distinct/total),
    *  - `top_2gram_frac` / `top_3gram_frac`: share of all n-gram positions
    *    taken by the single most frequent n-gram,
    *  - `dup_5gram_frac`: share of 5-gram positions that duplicate another
    *    position (the long-window variant that catches looping text).
    *
    * All four are ratios of exact integer counts, so the doubles are
    * bit-identical across engines (single division, no rounding needed).
    * Pure projection — fuses into the scan, zero shuffle at any corpus
    * size. The per-row top-count is distinct×total element comparisons,
    * bounded by the document's own length (no joins, no state); docs
    * shorter than n emit 0.0 for that window. */
  val repetition: QueryFn = (s, dir) => repetitionFrame(t(s, dir, "documents"))
  def repetitionFrame(d: DataFrame): DataFrame = {
    def grams(toks: Column, n: Int): Column =
      wordNgrams(toks, n, distinct = false)
    // Top-frequency as max multiplicity via the codegen'd hash-count
    // kernel (graft.functions.TopRunFrac; round 20). History: the naive
    // distinct×total nested filter ran O(L²) interpreted lambdas per row
    // (3.1 s at sf0.1); the sorted longest-equal-run fold cut that to
    // O(L log L) (~0.6 s) but still walked L higher-order-function lambda
    // steps per gram window through the interpreted evaluator. The kernel
    // computes the identical value (longest equal run of any total order
    // IS the max multiplicity; same empty/null semantics — see its
    // scaladoc) in one static-call pass inside whole-stage codegen.
    def topFrac(g: Column): Column = graft.functions.TopRunFrac(g)
    def dupFrac(g: Column): Column =
      when(size(g) === 0, lit(0.0))
        .otherwise((size(g) - size(array_distinct(g))).cast(DoubleType) / size(g))
    val toksC = tokens(col("text"))
    // Materialized token/gram columns: multiply-referenced non-cheap
    // expressions must land in their own projection or each reference
    // re-splits the text (same trap wordNgrams documents in Curation).
    d.select(col("doc_id"), toksC.as("w"))
      .select(col("doc_id"), col("w"),
        grams(col("w"), 2).as("g2"), grams(col("w"), 3).as("g3"),
        grams(col("w"), 5).as("g5"))
      .select(
        col("doc_id"),
        dupFrac(col("w")).as("dup_token_frac"),
        topFrac(col("g2")).as("top_2gram_frac"),
        topFrac(col("g3")).as("top_3gram_frac"),
        dupFrac(col("g5")).as("dup_5gram_frac"))
  }
  val repetitionSql: String =
    """WITH tk AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, w,
      |    CASE WHEN len(w) < 2 THEN [] ELSE list_transform(range(0, len(w)-1),
      |      i -> w[i+1] || ' ' || w[i+2]) END AS g2,
      |    CASE WHEN len(w) < 3 THEN [] ELSE list_transform(range(0, len(w)-2),
      |      i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]) END AS g3,
      |    CASE WHEN len(w) < 5 THEN [] ELSE list_transform(range(0, len(w)-4),
      |      i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
      |           || ' ' || w[i+5]) END AS g5
      |  FROM tk)
      |SELECT doc_id,
      |  CASE WHEN len(w) = 0 THEN 0.0 ELSE
      |    CAST(len(w) - len(list_distinct(w)) AS DOUBLE) / len(w) END
      |    AS dup_token_frac,
      |  CASE WHEN len(g2) = 0 THEN 0.0 ELSE
      |    CAST(list_max(list_transform(list_distinct(g2),
      |      u -> len(list_filter(g2, x -> x = u)))) AS DOUBLE) / len(g2) END
      |    AS top_2gram_frac,
      |  CASE WHEN len(g3) = 0 THEN 0.0 ELSE
      |    CAST(list_max(list_transform(list_distinct(g3),
      |      u -> len(list_filter(g3, x -> x = u)))) AS DOUBLE) / len(g3) END
      |    AS top_3gram_frac,
      |  CASE WHEN len(g5) = 0 THEN 0.0 ELSE
      |    CAST(len(g5) - len(list_distinct(g5)) AS DOUBLE) / len(g5) END
      |    AS dup_5gram_frac
      |FROM g ORDER BY doc_id""".stripMargin

  /** Per-language length-distribution profile: exact interpolated
    * p50/p90/p99 of n_chars plus count and decimal-exact mean — the
    * corpus-profiling pass a mixture spec is written against (per-language
    * length cutoffs, token-budget planning). EXACT quantiles are scalable
    * here because the aggregation state is a value→count map over the
    * BOUNDED domain of document lengths, not a buffer of rows — Spark's
    * built-in `percentile` aggregate carries exactly that map, so the
    * shuffle moves one histogram per (partition, lang), independent of row
    * count. Both engines interpolate linearly (position p·(n−1) between
    * the two straddling order statistics); the result rounds to 6 dp on
    * both sides because the engines associate the interpolation product
    * differently (a·(1−f)+b·f vs a+(b−a)·f — a ULP apart on some inputs,
    * identical after rounding at these magnitudes). */
  val lengthProfile: QueryFn = (s, dir) =>
    t(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(expr("percentile(n_chars, 0.5)"), 6).as("p50"),
        round(expr("percentile(n_chars, 0.9)"), 6).as("p90"),
        round(expr("percentile(n_chars, 0.99)"), 6).as("p99"),
        (sum(col("n_chars").cast(org.apache.spark.sql.types.DecimalType(20, 0)))
          .cast(DoubleType) / count(lit(1))).as("mean_chars"))
      .orderBy(col("lang"))

  val lengthProfileSql: String =
    """SELECT lang, COUNT(1) AS n_docs,
      |  ROUND(quantile_cont(n_chars, 0.5), 6) AS p50,
      |  ROUND(quantile_cont(n_chars, 0.9), 6) AS p90,
      |  ROUND(quantile_cont(n_chars, 0.99), 6) AS p99,
      |  CAST(SUM(CAST(n_chars AS DECIMAL(20,0))) AS DOUBLE) / COUNT(1)
      |    AS mean_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  val all: Map[String, QueryFn] = Map(
    "q_text_length_profile" -> lengthProfile,
    "q_text_token_count" -> tokenCount,
    "q_text_quality" -> quality,
    "q_text_langid" -> langId,
    "q_doc_fingerprint" -> fingerprint,
    "q_text_chunk" -> chunk,
    "q_text_repetition" -> repetition,
    "q_doc_winnow" -> winnowFp)

  val oracle: Map[String, String] = Map(
    "q_text_length_profile" -> lengthProfileSql,
    "q_text_token_count" -> tokenCountSql,
    "q_text_quality" -> qualitySql,
    "q_text_langid" -> langIdSql,
    "q_doc_fingerprint" -> fingerprintSql,
    "q_text_chunk" -> chunkSql,
    "q_text_repetition" -> repetitionSql,
    "q_doc_winnow" -> winnowFpSql)
}
