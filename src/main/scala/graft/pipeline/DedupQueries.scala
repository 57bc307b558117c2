package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.functions.SimHash
import graft.operators.{t, QueryFn}
import graft.pipeline.TextQueries.tokens

/** Deduplication operators over `documents` — the core curation stage of a
  * training-data pipeline, in increasing sophistication:
  *
  *  1. exact      — content-hash groupBy (one shuffle on the fingerprint)
  *  2. n-gram Jaccard — blocked brute-force pair verification
  *  3. MinHash+LSH — shingle → signature → band buckets → candidate join
  *  4. SimHash    — 64-bit similarity fingerprint, banded hamming join
  *
  * Scale design (the part that matters at 100 TB):
  *  - Every variant reduces the O(n²) pair space to per-bucket joins:
  *    exact → hash equality; Jaccard → (lang, length-band) blocking;
  *    MinHash → LSH band buckets (8 bands × 4 rows ⇒ collision prob
  *    1-(1-j⁴)⁸, steep around j≈0.5); SimHash → 16-bit chunk equality
  *    (pigeonhole: hamming ≤ 3 ⇒ some chunk of 4 equal).
  *  - All shuffles key on the bucket id, so skew = bucket size, bounded by
  *    construction; AQE splits any hot bucket.
  *  - Signatures are computed in a single projection pass (codegen'd
  *    xxhash64 / our SimHash expression) — one scan, no UDF boundary.
  */
object DedupQueries {

  private def normalized: Column = TextQueries.normalizedText(col("text"))

  /** Distinct 3-token shingles of the document text, carried as xxhash64
    * values: `sh_hashes` (minhash input) and `sh_sorted` (sorted, for
    * linear-merge Jaccard). Hashing shingles to longs makes all downstream
    * set operations allocation-free; a collision between two of a doc's
    * ~10²-10³ shingles has probability ≈ n²/2⁶⁵ — never observable against
    * the string-set oracle. */
  private def shingled(d: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    d.select(col("doc_id"), col("lang"), toks.as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("lang"), size(col("toks")).as("n_toks"),
        transform(array_distinct(transform(
          sequence(lit(0), size(col("toks")) - 3),
          i => concat_ws(" ",
            element_at(col("toks"), i + 1),
            element_at(col("toks"), i + 2),
            element_at(col("toks"), i + 3)))), x => xxhash64(x)).as("sh_hashes"))
      .withColumn("sh_sorted", sort_array(col("sh_hashes")))
  }

  private def jaccard(a: Column, b: Column): Column =
    graft.functions.VectorOps.jaccard(a, b)

  /** Exact dedup: one survivor (min doc_id) per content fingerprint.
    * Deliberately NO global ORDER BY: the result is a set, and a total sort
    * of the deduped corpus is a full range-exchange we'd pay at 100 TB for
    * nothing (the correctness gate sorts rows itself before hashing). */
  val exact: QueryFn = (s, dir) => {
    t(s, dir, "documents")
      .groupBy(md5(normalized.cast("binary")).as("fingerprint"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_copies"))
  }
  val exactSql: String =
    """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
      |  MIN(doc_id) AS keeper_doc_id, COUNT(1) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  /** Blocked brute-force n-gram Jaccard: candidate pairs restricted to the
    * same language and ±20-token length window, verified exactly with a
    * linear merge-intersection over sorted shingle hashes (the per-pair
    * verification cost is what dominates all-pairs dedup — `array_intersect`
    * allocates a hash set per pair and was ~25× slower; a plain self-join
    * additionally materializes both shingle arrays per candidate row, which
    * is why the pair enumeration runs in [[AllPairs.jaccardPairs]]).
    *
    * Blocking note: the block key is `lang` plus a ±20-token length window
    * (binary-searched inside the kernel, so it prunes instead of multiplying
    * join keys). At 100 TB one adds coarser blocking (source, length decile)
    * or routes through [[minhashLsh]], whose candidate volume is
    * threshold-controlled. */
  val ngramJaccard: QueryFn = (s, dir) => {
    // Shingling (tokenize → distinct 3-grams → xxhash64 → sort) runs as a
    // distributed codegen'd projection; only the pair enumeration goes
    // through the broadcast-block kernel (see AllPairs scaladoc for why a
    // self-join pays O(n²) row materialization).
    AllPairs.jaccardPairs(s, shingled(t(s, dir, "documents")),
                          lenWindow = 20, threshold = 0.2)
  }
  val ngramJaccardSql: String =
    """WITH sh AS (
      |  SELECT doc_id, lang, len(toks) AS n_toks,
      |    list_distinct(list_transform(range(0, len(toks)-2),
      |      i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shingles
      |  FROM (SELECT doc_id, lang,
      |          regexp_split_to_array(trim(text), '\s+') AS toks
      |        FROM documents)
      |  WHERE len(toks) >= 3),
      |p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
      |      (len(a.shingles) + len(b.shingles)
      |       - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard
      |  FROM sh a JOIN sh b
      |    ON a.lang = b.lang AND a.doc_id < b.doc_id
      |   AND abs(a.n_toks - b.n_toks) <= 20)
      |SELECT doc_a, doc_b, jaccard FROM p WHERE jaccard >= 0.2
      |ORDER BY doc_a, doc_b""".stripMargin

  /** MinHash + LSH near-dup pairs: 32-hash signatures, 8 bands × 4 rows,
    * candidates from band-bucket collisions, verified with exact Jaccard.
    * No SQL oracle (multi-stage LSH); exactness pinned by DedupSpec with
    * planted duplicates, and candidate recall is validated against
    * [[ngramJaccard]]'s output in the spec. */
  val minhashLsh: QueryFn = (s, dir) => minhashPairs(t(s, dir, "documents"))

  /** The MinHash pipeline on any (doc_id, text, lang, ...) frame —
    * parameterized so specs can run it over planted duplicates. */
  def minhashPairs(docs: DataFrame): DataFrame = {
    val numHashes = 32
    val bands = 8
    val rows = numHashes / bands

    val sh = shingled(docs)
    // One codegen'd pass: shingle hashes are already computed by shingled();
    // a single tight loop derives all 32 lanes
    // (graft.functions.MinHashSignature) — the nested-HOF formulation ran
    // interpreted closures per (shingle, lane) pair and dominated runtime.
    val sig = sh.select(
      col("doc_id"), col("sh_sorted"),
      graft.functions.VectorOps.minhashSignature(col("sh_hashes")).as("sig"))

    val banded = sig.select(
      col("doc_id"), col("sh_sorted"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        bnd => xxhash64((0 until rows).map(r =>
          element_at(col("sig"), bnd * rows + r + 1)): _*))))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_hash")

    val a = banded.select(col("band_id"), col("band_hash"),
                          col("doc_id").as("doc_a"), col("sh_sorted").as("sh_a"))
    val b = banded.select(col("band_id"), col("band_hash"),
                          col("doc_id").as("doc_b"), col("sh_sorted").as("sh_b"))
    a.join(b, Seq("band_id", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
              round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= 0.2)
  }

  /** SimHash near-dup pairs: 64-bit fingerprints from token hashes, banded
    * into 4×16-bit chunks (pigeonhole guarantee for hamming ≤ 3), verified
    * by exact hamming distance ≤ 6. Rows-only for the driver; semantics
    * pinned in DedupSpec. */
  val simhash: QueryFn = (s, dir) => simhashPairs(t(s, dir, "documents"))

  def simhashPairs(d: DataFrame): DataFrame = {
    val fp = d.select(col("doc_id"),
      SimHash(transform(tokens(col("text")), tk => xxhash64(tk))).as("simhash"))
    val banded = fp.select(col("doc_id"), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(3)),
        bnd => call_function("shiftrightunsigned", col("simhash"), bnd * 16)
          .bitwiseAND(lit(0xffffL)))))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "chunk")
    val a = banded.select(col("band_id"), col("chunk"),
                          col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band_id"), col("chunk"),
                          col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band_id", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
              bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 6)
  }

  /** Embedding-cosine near-dup pairs (brute-force verify at test scale; the
    * LSH-bucketed scale path is [[SimilarityQueries.annLsh]]). Cosine is
    * computed in index-order double arithmetic in both engines, rounded to
    * 6dp before the threshold so the filter can't flip on ULPs. */
  val embeddingCosine: QueryFn = (s, dir) =>
    AllPairs.embeddingPairs(s, t(s, dir, "embeddings"), threshold = 0.4)
  val embeddingCosineSql: String =
    """WITH n AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_aggregate(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS norm
      |  FROM embeddings),
      |p AS (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    ROUND(list_aggregate(list_transform(range(1, len(a.embedding) + 1),
      |            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), 'sum')
      |          / (a.norm * b.norm), 6) AS cosine
      |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
      |SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= 0.4
      |ORDER BY vec_a, vec_b""".stripMargin

  val all: Map[String, QueryFn] = Map(
    "q_dedup_exact" -> exact,
    "q_dedup_ngram_jaccard" -> ngramJaccard,
    "q_dedup_minhash_lsh" -> minhashLsh,
    "q_dedup_simhash" -> simhash,
    "q_dedup_embedding" -> embeddingCosine)

  val oracle: Map[String, String] = Map(
    "q_dedup_exact" -> exactSql,
    "q_dedup_ngram_jaccard" -> ngramJaccardSql,
    "q_dedup_embedding" -> embeddingCosineSql)
}
