package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.FnvHash
import graft.operators.QueryFn

/** UTF-8 gate corpus (VERDICT r13 #2): the driver-generated `documents`
  * fixture is 100% ASCII, so the byte-walking hash oracles
  * ([[DedupQueries.fnvCols]] — the UTF-8 CASE ladder) and every text-tier
  * operator were validated only on single-byte code points. This module
  * carries a fixed multilingual corpus — 2-byte (Latin accents, Cyrillic,
  * Greek, Arabic, Hebrew), 3-byte (CJK, Devanagari, Thai, Hangul) and
  * 4-byte (emoji, mathematical alphanumerics, Gothic) encodings, planted
  * exact and near duplicates across scripts — as ONE source of truth that
  * becomes both the Spark frame and the DuckDB `VALUES` oracle, and
  * re-registers the hash/dedup/text pipelines over it. A revert of
  * `fnvCols` to a per-character `ascii()` walk, or any byte-vs-codepoint
  * confusion in the engine's own kernels, hash-fails these entries.
  *
  * Content rules that keep the oracle exact (documented, not incidental):
  * texts are pre-lowercased (lower() is identity — engines' Unicode case
  * tables never consulted), tokens are separated by ASCII spaces (both
  * regex engines treat `\s` as ASCII in this corpus), no apostrophes (SQL
  * literal safety), no combining-sequence graphemes that would make
  * code-point counts ambiguous.
  */
object Utf8Queries {

  /** (doc_id, lang, text). 9006=9023=9024 (exact dups, Cyrillic — modulo
    * edge whitespace for 9024) guarantee non-empty minhash (jaccard 1.0)
    * and simhash (hamming 0) pair sets over non-ASCII bytes even if the
    * near-dup pairs (9001/9002, 9006/9007, 9011/9012, 9017/9018) drift
    * below a threshold; 9021/9022 exercise the <3-token shingle guard. */
  val rows: Seq[(Long, String, String)] = Seq(
    (9001L, "en", "the café menu lists crème brûlée and naïve blend coffee for the résumé club"),
    (9002L, "en", "the café menu lists crème brûlée and naïve blend tea for the résumé club"),
    (9003L, "de", "der müller wäscht die große straße und ist am abend sehr müde"),
    (9004L, "fr", "le café est très près de la forêt et la crème est légère"),
    (9005L, "es", "el niño pequeño y la señora están en el jardín según los años"),
    (9006L, "ru", "в лесу родилась ёлочка в лесу она росла зимой и летом стройная зелёная была"),
    (9007L, "ru", "в лесу родилась ёлочка в лесу она росла зимой и летом стройная красивая была"),
    (9008L, "el", "η θάλασσα και ο ουρανός είναι γαλάζια και όμορφα σήμερα το πρωί"),
    (9009L, "ar", "الشمس تشرق من الشرق و القمر يضيء في الليل الهادئ"),
    (9010L, "he", "השמש זורחת בבוקר והירח מאיר בלילה הקריר"),
    (9011L, "zh", "天空 是 蓝色 的 大海 也 是 蓝色 的 今天 天气 很 好"),
    (9012L, "zh", "天空 是 蓝色 的 大海 也 是 绿色 的 今天 天气 很 好"),
    (9013L, "ja", "今日 の 天気 は とても 良い です 空 は 青い です"),
    (9014L, "ko", "오늘 날씨 가 매우 좋다 하늘 은 파랗다 바다 도 파랗다"),
    (9015L, "hi", "आज मौसम बहुत अच्छा है आकाश नीला है और सूरज चमक रहा है"),
    (9016L, "th", "วันนี้ อากาศ ดี มาก ท้องฟ้า สีฟ้า ทะเล สวย"),
    (9017L, "emoji", "launch day 🚀 the team 😀 shipped 🎉 the release 🌍 today with 𝒻𝓊𝓃 and 𝕛𝕠𝕪"),
    (9018L, "emoji", "launch day 🚀 the team 😀 shipped 🎉 the release 🌍 today with 𝒻𝓊𝓃 and 𝓰𝓵𝓮𝓮"),
    (9019L, "got", "𐌰𐌱𐌲 𐌳𐌴𐌶 𐍈𐍉𐍊 𐌰𐌱𐌲 𐌷𐌸𐌹 mixed gothic runes here"),
    (9020L, "mix", "résumé 天空 ёлочка 🚀 mixed script soup here with the of and is"),
    (9021L, "zh", "你好 世界"),
    (9022L, "he", "שלום"),
    (9023L, "ru", "в лесу родилась ёлочка в лесу она росла зимой и летом стройная зелёная была"),
    (9024L, "ru", "  в лесу родилась ёлочка в лесу она росла зимой и летом стройная зелёная была  "),
  )

  def corpus(s: SparkSession): DataFrame = {
    import s.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  /** The same rows as a DuckDB inline relation named `documents`, so every
    * existing `FROM documents` twin re-targets with one substitution. */
  val valuesSql: String = rows
    .map { case (id, lang, text) => s"($id, '$lang', '$text')" }
    .mkString("(VALUES ", ", ", ") documents(doc_id, lang, text)")

  /** Retarget a `documents` twin at the VALUES corpus. The COUNT and the
    * REPLACE use the same word-boundary regex, so every appearance of the
    * table name (any syntactic role — `JOIN documents`, a trailing alias,
    * a prefix-named table like `documentsx`) either is a substitution point
    * or trips the guard; a missed occurrence would otherwise silently bind
    * the UTF-8 query's oracle to the sf-parquet documents view, i.e. the
    * wrong corpus (ADVICE r14/r15). An aliased `FROM documents d` passes
    * the count but rewrites to doubled-alias SQL that fails loudly at parse
    * time (the VALUES relation carries its own alias) — acceptable: no
    * silent wrong-corpus binding is possible. */
  private val fromDocuments = "(?i)\\bFROM\\s+documents\\b".r
  private def overUtf8(sql: String): String = {
    val occurrences = "(?i)\\bdocuments\\b".r.findAllMatchIn(sql).length
    val replaced = fromDocuments.findAllMatchIn(sql).length
    require(occurrences == replaced && replaced > 0,
      s"overUtf8: $occurrences 'documents' references but only $replaced " +
        s"bare 'FROM documents' substitution points — rewrite the twin so " +
        s"every reference is a plain un-aliased 'FROM documents':\n$sql")
    fromDocuments.replaceAllIn(sql,
      java.util.regex.Matcher.quoteReplacement("FROM " + valuesSql))
  }

  /** Direct known-construction gate on the base hash: one fnv_hash per text
    * — non-empty by construction, so it can never pass vacuously. */
  private val fnvUtf8: QueryFn = (s, _) =>
    corpus(s).select(col("doc_id"), FnvHash(col("text")).as("h"))
  private val fnvUtf8Sql: String =
    s"""SELECT doc_id, h FROM (
       |  SELECT doc_id,
       |    ${DedupQueries.fnvCols("text", "h")}
       |  FROM ${valuesSql})""".stripMargin

  val all: Map[String, QueryFn] = Map(
    "q_fnv_hash_utf8" -> fnvUtf8,
    "q_dedup_exact_utf8" ->
      ((s, _) => DedupQueries.exactFrame(corpus(s))),
    "q_dedup_minhash_utf8" ->
      ((s, _) => DedupQueries.minhashPairs(corpus(s))),
    "q_dedup_simhash_utf8" ->
      ((s, _) => DedupQueries.simhashPairs(corpus(s))),
    "q_text_token_utf8" ->
      ((s, _) => TextQueries.tokenCountFrame(corpus(s))),
    "q_text_langid_utf8" ->
      ((s, _) => TextQueries.langIdFrame(corpus(s))),
    "q_text_chunk_utf8" ->
      ((s, _) => TextQueries.chunkFrame(corpus(s))),
    "q_doc_winnow_utf8" ->
      ((s, _) => TextQueries.winnowFpFrame(corpus(s))),
    "q_doc_fingerprint_utf8" ->
      ((s, _) => TextQueries.fingerprintFrame(corpus(s))),
    "q_text_quality_utf8" ->
      ((s, _) => TextQueries.qualityFrame(corpus(s))),
    "q_text_repetition_utf8" ->
      ((s, _) => TextQueries.repetitionFrame(corpus(s))),
  )

  val oracle: Map[String, String] = Map(
    "q_fnv_hash_utf8" -> fnvUtf8Sql,
    "q_dedup_exact_utf8" -> overUtf8(DedupQueries.exactSql),
    "q_dedup_minhash_utf8" -> overUtf8(DedupQueries.minhashLshSql),
    "q_dedup_simhash_utf8" -> overUtf8(DedupQueries.simhashSql),
    "q_text_token_utf8" -> overUtf8(TextQueries.tokenCountSql),
    "q_text_langid_utf8" -> overUtf8(TextQueries.langIdSql),
    "q_text_chunk_utf8" -> overUtf8(TextQueries.chunkSql),
    "q_doc_winnow_utf8" -> overUtf8(TextQueries.winnowFpSql),
    "q_doc_fingerprint_utf8" -> overUtf8(TextQueries.fingerprintSql),
    "q_text_quality_utf8" -> overUtf8(TextQueries.qualitySql),
    "q_text_repetition_utf8" -> overUtf8(TextQueries.repetitionSql),
  )
}
