package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{t, QueryFn}

/** Standing MinHash signature artifact — the scale path for repeated
  * near-dup sweeps (VERDICT r17 task 2).
  *
  * The inline pipeline ([[DedupQueries.minhashPairs]]) re-tokenizes,
  * re-shingles and re-hashes the corpus text on every sweep (four
  * column-pruned scans). At 100 TB those scans ARE the cost. This mirrors
  * the IVF standing-index pattern ([[IvfAnn.annIvfIndexed]]): materialize
  * the signature state ONCE — one pass over the text — then every
  * subsequent sweep probes the narrow artifact. The artifact is stored
  * CONTRACTED (the [[DedupQueries.contractExact]] form):
  *
  *  - `members.parquet` (doc_id, rep) — exact-duplicate group map, two
  *    longs per document;
  *  - `signatures.parquet` (doc_id, sh_sorted, sig) — one row per
  *    distinct-content REPRESENTATIVE.
  *
  * A probe runs band candidates + Jaccard verification over the
  * representative signatures only (the candidate join reads the pruned
  * (doc_id, sig) columns, verification the pruned (doc_id, sh_sorted)),
  * then expands to member pairs via thin id joins
  * ([[DedupQueries.expandPairs]]). Zero scans of `documents` per probe
  * (FactScanSpec pins 0); no array ever rides a duplication-scaled
  * exchange.
  *
  * Identical semantics to the inline pipeline by construction — the same
  * shared helpers end to end — so `q_dedup_minhash_indexed` runs against
  * the SAME DuckDB oracle as `q_dedup_minhash_lsh` and must produce the
  * same pairs (also pinned directly in MinhashIndexSpec). Build-once
  * lifecycle, fingerprint freshness and atomic publish come from
  * [[StandingIndex]]. Corpus×corpus broadcast safety is engine-level
  * ([[graft.plans.CorpusBroadcastGuard]]).
  */
object MinhashIndex {

  /** One-scan signature build under `outDir`: the contracted member map
    * plus per-representative (sh_sorted, sig). At 100 TB this is the only
    * pass over the text.
    *
    * `outDir` MUST be a private staging directory (publish atomically via
    * [[StandingIndex.ensure]], as every caller in this repo does): the
    * organic branch derives `members.parquet` by re-reading the
    * `signatures.parquet` it just wrote into the same directory, so a
    * build aimed at a LIVE artifact directory would expose a window with
    * fresh signatures next to absent/stale members to concurrent
    * readers. */
  def buildSignatures(docs: DataFrame, outDir: String): Unit = {
    val c = DedupQueries.contractExact(docs)
    DedupQueries.shingled(c.repDocs)
      .select(col("doc_id"), col("sh_sorted"),
        graft.functions.VectorOps.minhashSignature(col("sh_hashes")).as("sig"))
      .write.mode("overwrite").parquet(s"$outDir/signatures.parquet")
    // The artifact layout always carries a member map (the probe is
    // branch-free). Below the contraction floor every doc is its own
    // representative, so the map is the identity over the signature rows --
    // derived from the just-written narrow parquet (doc_id column only),
    // not from another pass over the corpus text. Same bytes the
    // contracted build would have produced on such a corpus (organic
    // groups are singletons with rep == min == doc_id), so artifacts stay
    // interchangeable across branches and code versions.
    val members = c.members.getOrElse(
      docs.sparkSession.read.parquet(s"$outDir/signatures.parquet")
        .select(col("doc_id"), col("doc_id").as("rep")))
    members.write.mode("overwrite").parquet(s"$outDir/members.parquet")
    c.members.foreach(graft.Engine.releaseMaterialized)
  }

  /** Near-dup pairs from a standing signature artifact: representative
    * band candidates from the pruned `(doc_id, sig)` columns, exact
    * Jaccard from the pruned `(doc_id, sh_sorted)` columns, member
    * expansion from `members.parquet`. Same output as
    * [[DedupQueries.minhashPairs]] over the source corpus. */
  def pairsIndexed(spark: SparkSession, idxDir: String,
                   threshold: Double = 0.2): DataFrame =
    pairsIndexedMulti(spark, Seq(idxDir), threshold)

  /** [[pairsIndexed]] over the UNION of several batch partitions — the
    * probe side of the incremental lifecycle ([[DeltaIndex]]): each batch
    * carries the contracted signatures of ITS documents only, and the
    * union is exactly the single-build artifact's relation EXCEPT that an
    * exact-duplicate group split across batches appears as one
    * representative per batch. That changes nothing in the output: the
    * split reps' signatures are identical, so the band self-join emits
    * their candidate pair, verification scores it at Jaccard 1.0 (the same
    * value intra-group expansion pins), and member expansion of the rep
    * pair restores the cross-batch member pairs — the contraction-
    * invariance argument of [[DedupQueries.contractExact]], applied per
    * batch. DeltaIndexSpec pins equality against the inline pipeline on a
    * two-append corpus; the registry entry `q_dedup_minhash_delta` runs
    * the same DuckDB oracle as the inline sweep. */
  def pairsIndexedMulti(spark: SparkSession, idxDirs: Seq[String],
                        threshold: Double = 0.2): DataFrame = {
    val sig = spark.read.parquet(idxDirs.map(d => s"$d/signatures.parquet"): _*)
    val members = spark.read.parquet(idxDirs.map(d => s"$d/members.parquet"): _*)
    val banded = sig
      .select(col("doc_id"), posexplode(DedupQueries.bandHashes(col("sig"))))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_hash")
      .select(col("band_id"), col("band_hash"), col("doc_id"))
    val repPairs = DedupQueries.verifyJaccard(
      DedupQueries.bandCandidates(banded),
      sig.select(col("doc_id"), col("sh_sorted")), threshold)
    DedupQueries.expandPairs(repPairs, members, "jaccard", lit(1.0))
  }

  /** Registry entry: build the artifact once per gate corpus (fingerprint
    * keyed, amortized across Verify/Bench invocations), probe it. */
  val minhashIndexed: QueryFn = (s, dir) => {
    // the _v2 prefix is the artifact FORMAT version (contracted layout:
    // members.parquet + per-rep signatures.parquet) — the corpus
    // fingerprint alone cannot see a layout change across code versions
    val idxDir = StandingIndex.artifactDir(dir, "documents", "graft_minhash_sig_v2")
    StandingIndex.ensure(idxDir) { staging =>
      buildSignatures(t(s, dir, "documents"), staging)
    }
    pairsIndexed(s, idxDir.toString)
  }

  /** PRODUCTION incremental maintenance ([[DeltaIndex]] — the round-19
    * lead item): reconcile the standing signature artifact with the source
    * table's current part files, deriving signatures for ONLY the new
    * files (one delta batch per ingest), and return the live batch dirs
    * for [[pairsIndexedMulti]]. A daily append costs O(delta) signature
    * work instead of the fingerprint-keyed artifact's O(corpus) rebuild;
    * a rewritten corpus still invalidates fully. */
  /** `maxLiveBatches` > 0 makes the compaction cadence ENGINE-OWNED
    * (VERDICT r19 task 5): when a sync leaves more than that many live
    * batches, one [[compactIncremental]] rebase fires inline — steady-state
    * probe fan-in stays bounded without the caller scheduling OPTIMIZE.
    * `retainMillis` defers GC of retired batch dirs ([[DeltaIndex.sync]]). */
  def ensureIncremental(spark: SparkSession, sourceDir: String,
                        table: String = "documents", maxLiveBatches: Int = 0,
                        retainMillis: Long = 0L): Seq[String] = {
    val root = DeltaIndex.root(sourceDir, table, "graft_minhash_inc_v1")
    val live = DeltaIndex.sync(spark, sourceDir, table, root, retainMillis) {
      (delta, staging, _) => buildSignatures(delta, staging)
    }
    if (maxLiveBatches > 0 && live.size > maxLiveBatches)
      compactIncremental(spark, sourceDir, table, retainMillis)
    else live.map(_.toString)
  }

  /** OPTIMIZE pass for the incremental artifact ([[DeltaIndex.compact]]):
    * rebase the live delta batches into one by UNIONING their payloads —
    * the batch partitions are already the contracted per-batch relations,
    * and [[pairsIndexedMulti]]'s output is invariant under how those
    * relations are partitioned (the cross-batch-duplicate argument in its
    * scaladoc), so concatenation IS the correct rebase. Reads only the
    * artifact's own parquet (never `documents` — DeltaIndexSpec compacts
    * with the source table deleted), so the periodic pass that bounds
    * probe-side batch-count growth costs O(artifact), not the O(corpus)
    * rebuild. Note the compacted batch keeps one representative PER
    * ORIGINAL BATCH for content duplicated across batches (byte-wise it
    * is the union, not a from-scratch single build); probe output is
    * identical either way. */
  def compactIncremental(spark: SparkSession, sourceDir: String,
                         table: String = "documents",
                         retainMillis: Long = 0L): Seq[String] = {
    val root = DeltaIndex.root(sourceDir, table, "graft_minhash_inc_v1")
    DeltaIndex.compact(spark, root, retainMillis) { (batches, staging) =>
      spark.read.parquet(batches.map(b => s"$b/signatures.parquet"): _*)
        .write.mode("overwrite").parquet(s"$staging/signatures.parquet")
      spark.read.parquet(batches.map(b => s"$b/members.parquet"): _*)
        .write.mode("overwrite").parquet(s"$staging/members.parquet")
    }.map(_.toString)
  }

  /** Two-append REHEARSAL of the incremental artifact on the gate corpus
    * (which ships as one parquet file, so the file-grained [[DeltaIndex]]
    * sees a single batch there — the file-level lifecycle is exercised by
    * DeltaIndexSpec on real two-file corpora and measured by
    * [[graft.DeltaBench]]): batch 0 indexes ~2/3 of the documents (the
    * standing corpus), batch 1 the remaining third (the append) — each
    * build reads only its slice — and the probe unions the two partitions.
    * Runs the SAME DuckDB oracle as the inline sweep, so the driver
    * hash-checks that an artifact built in two appends answers exactly
    * like the one-shot corpus sweep. */
  val minhashDelta: QueryFn = (s, dir) => {
    val idxDir = StandingIndex.artifactDir(dir, "documents", "graft_minhash_delta_v1")
    StandingIndex.ensure(idxDir) { staging =>
      val docs = t(s, dir, "documents")
      val standing = col("doc_id") % 3 < 2
      buildSignatures(docs.filter(standing), s"$staging/batch_0")
      buildSignatures(docs.filter(!standing), s"$staging/batch_1")
    }
    pairsIndexedMulti(s, Seq(s"$idxDir/batch_0", s"$idxDir/batch_1"))
  }

  /** COMPACTION rehearsal on the gate corpus (single-file table, same
    * convention as [[minhashDelta]]): build the two-append artifact, then
    * run the [[compactIncremental]] rebase — payload union of the batch
    * partitions into ONE batch — and probe ONLY the compacted partition.
    * Runs the SAME DuckDB oracle as the inline sweep, so the driver
    * hash-checks that the OPTIMIZE pass loses/duplicates nothing: a
    * rebase that dropped a batch, doubled one, or broke the cross-batch
    * duplicate-representative invariant would hash-fail here. */
  val minhashCompact: QueryFn = (s, dir) => {
    val idxDir = StandingIndex.artifactDir(dir, "documents", "graft_minhash_compact_v1")
    StandingIndex.ensure(idxDir) { staging =>
      val docs = t(s, dir, "documents")
      val standing = col("doc_id") % 3 < 2
      buildSignatures(docs.filter(standing), s"$staging/batch_0")
      buildSignatures(docs.filter(!standing), s"$staging/batch_1")
      for (p <- Seq("signatures", "members"))
        s.read.parquet(s"$staging/batch_0/$p.parquet",
                       s"$staging/batch_1/$p.parquet")
          .write.mode("overwrite").parquet(s"$staging/compacted/$p.parquet")
    }
    pairsIndexed(s, s"$idxDir/compacted")
  }

  /** GROUPED answer (doc_id → cluster/survivor, the
    * [[CurationQueries.minhashCluster]] shape) probed from the STANDING
    * artifact — the production composition of the two round-19 pieces: a
    * sweep that re-reads neither the corpus text (artifact probe; the one
    * corpus access is a doc_id-pruned scan for sub-shingle-floor
    * singletons, which the artifact rightly excludes) nor emits member
    * pairs (components over the REPRESENTATIVE graph, labels expand
    * through the thin member map). Identical output to the inline grouped
    * sweep — same oracle — because the artifact's rep-level band/Jaccard
    * relation is the contraction of the corpus relation and component
    * labels are contraction-invariant (each group's rep is its min
    * doc_id, so min-over-reps = min-over-members per component). */
  def clusterIndexed(spark: SparkSession, idxDirs: Seq[String],
                     docs: DataFrame, threshold: Double = 0.2): DataFrame = {
    val sig = spark.read.parquet(idxDirs.map(d => s"$d/signatures.parquet"): _*)
    val members = spark.read.parquet(idxDirs.map(d => s"$d/members.parquet"): _*)
    val banded = sig
      .select(col("doc_id"), posexplode(DedupQueries.bandHashes(col("sig"))))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_hash")
      .select(col("band_id"), col("band_hash"), col("doc_id"))
    val repPairs = DedupQueries.verifyJaccard(
      DedupQueries.bandCandidates(banded),
      sig.select(col("doc_id"), col("sh_sorted")), threshold)
      .select(col("doc_a"), col("doc_b"))
    val repLabels = CurationQueries
      .connectedComponents(sig.select(col("doc_id")), repPairs)
      .select(col("doc_id").as("rep"), col("label"))
    val memberLabels = members.join(repLabels, Seq("rep"))
      .select(col("doc_id"), col("label"))
    // Docs the artifact excludes (below the 3-token shingle floor / null
    // text) can never pair: singleton self-labels from ONE doc_id-pruned
    // corpus scan.
    val rest = docs.select(col("doc_id"))
      .join(members.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("label"))
    val labels = memberLabels.union(rest)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("label"))
    labels.select(col("doc_id"), col("label").as("cluster_id"),
                  count(lit(1)).over(w).as("cluster_size"),
                  (col("doc_id") === col("label")).as("is_canonical"))
  }

  /** Registry entry: same standing artifact as [[minhashIndexed]]
    * (amortized across both probes), grouped answer, same DuckDB oracle
    * as the inline grouped sweep. */
  val minhashClusterIndexed: QueryFn = (s, dir) => {
    val idxDir = StandingIndex.artifactDir(dir, "documents", "graft_minhash_sig_v2")
    StandingIndex.ensure(idxDir) { staging =>
      buildSignatures(t(s, dir, "documents"), staging)
    }
    clusterIndexed(s, Seq(idxDir.toString), t(s, dir, "documents"))
  }

  val all: Map[String, QueryFn] = Map(
    "q_dedup_minhash_indexed" -> minhashIndexed,
    "q_dedup_minhash_delta" -> minhashDelta,
    "q_dedup_minhash_compact" -> minhashCompact,
    "q_dedup_minhash_cluster_indexed" -> minhashClusterIndexed)
  val oracle: Map[String, String] = Map(
    "q_dedup_minhash_indexed" -> DedupQueries.minhashLshSql,
    "q_dedup_minhash_delta" -> DedupQueries.minhashLshSql,
    "q_dedup_minhash_compact" -> DedupQueries.minhashLshSql,
    "q_dedup_minhash_cluster_indexed" -> CurationQueries.minhashClusterSql)
}
