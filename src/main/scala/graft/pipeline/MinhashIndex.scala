package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{t, QueryFn}

/** Standing MinHash signature artifact — the scale path for repeated
  * near-dup sweeps (VERDICT r17 task 2).
  *
  * The inline pipeline ([[DedupQueries.minhashPairs]]) deliberately scans
  * `documents` four times (two band sides + two verify sides; the trade
  * that bought id-only candidate exchanges — FactScanSpec pins it). At
  * 100 TB those scans ARE the cost: each one re-tokenizes, re-shingles and
  * re-hashes the full corpus text. This mirrors the IVF standing-index
  * pattern ([[IvfAnn.annIvfIndexed]]): materialize
  * `(doc_id, sh_sorted, sig)` ONCE — one scan of the text, one signature
  * computation — then every subsequent sweep probes the narrow artifact:
  * the candidate join reads only `(doc_id, sig)` (column-pruned), the
  * verify back-join only `(doc_id, sh_sorted)`. Zero scans of `documents`
  * per probe; the artifact is a few % of the corpus width.
  *
  * Identical semantics to the inline pipeline by construction — the band
  * geometry, band hashing, candidate shape and verification all come from
  * the same shared helpers ([[DedupQueries.bandHashes]] /
  * [[DedupQueries.bandCandidates]] / [[DedupQueries.verifyJaccard]]), so
  * `q_dedup_minhash_indexed` runs against the SAME DuckDB oracle as
  * `q_dedup_minhash_lsh` and must produce the same pairs (also pinned
  * directly in MinhashIndexSpec). Build-once lifecycle, fingerprint
  * freshness and atomic publish come from [[StandingIndex]].
  *
  * Corpus×corpus broadcast safety is engine-level
  * ([[graft.plans.CorpusBroadcastGuard]]): the artifact rows carry
  * collection payloads, so none of the probe joins can ever be statically
  * broadcast on an estimate.
  */
object MinhashIndex {

  /** One-scan signature build: `(doc_id, sh_sorted, sig)` parquet under
    * `outDir`. At 100 TB this is the only pass over the text. */
  def buildSignatures(docs: DataFrame, outDir: String): Unit =
    DedupQueries.shingled(docs)
      .select(col("doc_id"), col("sh_sorted"),
        graft.functions.VectorOps.minhashSignature(col("sh_hashes")).as("sig"))
      .write.mode("overwrite").parquet(s"$outDir/signatures.parquet")

  /** Near-dup pairs from a standing signature artifact: band candidates
    * from the pruned `(doc_id, sig)` columns, exact-Jaccard verification
    * from the pruned `(doc_id, sh_sorted)` columns. Same output as
    * [[DedupQueries.minhashPairs]] over the source corpus. */
  def pairsIndexed(spark: SparkSession, idxDir: String,
                   threshold: Double = 0.2): DataFrame = {
    val sig = spark.read.parquet(s"$idxDir/signatures.parquet")
    val banded = sig
      .select(col("doc_id"), posexplode(DedupQueries.bandHashes(col("sig"))))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_hash")
      .select(col("band_id"), col("band_hash"), col("doc_id"))
    DedupQueries.verifyJaccard(
      DedupQueries.bandCandidates(banded),
      sig.select(col("doc_id"), col("sh_sorted")), threshold)
  }

  /** Registry entry: build the artifact once per gate corpus (fingerprint
    * keyed, amortized across Verify/Bench invocations), probe it. */
  val minhashIndexed: QueryFn = (s, dir) => {
    val idxDir = StandingIndex.artifactDir(dir, "documents", "graft_minhash_sig")
    StandingIndex.ensure(idxDir) { staging =>
      buildSignatures(t(s, dir, "documents"), staging)
    }
    pairsIndexed(s, idxDir.toString)
  }

  val all: Map[String, QueryFn] = Map(
    "q_dedup_minhash_indexed" -> minhashIndexed)
  val oracle: Map[String, String] = Map(
    "q_dedup_minhash_indexed" -> DedupQueries.minhashLshSql)
}
