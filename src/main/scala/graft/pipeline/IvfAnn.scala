package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.operators.{t, QueryFn}

/** IVF (inverted-file) approximate nearest neighbor — the second ANN scale
  * path next to [[SimilarityQueries.annLsh]]: partition the corpus into
  * Voronoi cells around learned centroids, search only the `nprobe` cells
  * nearest to each query.
  *
  * Everything is deterministic DataFrame composition:
  *  - seed centroids = the `nlist` lowest-vec_id vectors (reproducible);
  *  - one Lloyd refinement step: assign all vectors to their nearest seed,
  *    recompute centroids as per-cell elementwise means
  *    (posexplode → avg per (cell, dim) → reassemble sorted arrays);
  *  - index = nearest-centroid cell id per vector (one k×n scoring pass —
  *    k is small, the centroid table broadcasts);
  *  - query = probe `nprobe` nearest cells, exact cosine within them.
  *
  * At 100 TB: the index pass is one broadcast join + projection; the search
  * shuffles only (query, cell) candidates — cost scales with nprobe/nlist
  * of the corpus, the knob IVF exists for.
  */
object IvfAnn {

  private def cosine(a: Column, b: Column): Column = {
    val dot = VectorOps.dot(a, b)
    dot / (sqrt(VectorOps.dot(a, a)) * sqrt(VectorOps.dot(b, b)))
  }

  /** (vector frame, nlist) → (cell centroids as (cell_id, centroid)). */
  def trainCentroids(emb: DataFrame, nlist: Int): DataFrame = {
    val seeds = emb.orderBy(col("vec_id")).limit(nlist)
      .select(monotonically_increasing_id().as("cell_id"),
              col("embedding").as("centroid"))
    // Lloyd step 1: assign every vector to its nearest seed.
    val assigned = assignCells(emb, seeds)
    // Recompute centroids as elementwise means per cell.
    assigned
      .select(col("cell_id"), posexplode(col("embedding")))
      .groupBy(col("cell_id"), col("pos"))
      .agg(avg(col("col")).as("m"))
      .groupBy(col("cell_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pairs"))
      .select(col("cell_id"),
        transform(col("pairs"), p => p.getField("m").cast("float")).as("centroid"))
  }

  /** Nearest-centroid cell id for every vector — a pure per-row projection:
    * the centroid set is folded into ONE broadcast row (`collect_list` of
    * nlist structs) and the argmax runs as `array_max(transform(...))`
    * inside whole-stage codegen. Ties break toward the lowest cell_id (the
    * negated tie field) for determinism.
    *
    * Round-20 shape change (guide §2.4): the previous form scored nlist
    * rows per vector and folded them back with
    * `groupBy(vec_id).agg(max_by(...))`; the max_by value struct carries
    * `embedding` (an array), so hash aggregation is unavailable and the
    * plan ran Sort → SortAggregate → Exchange → Sort → SortAggregate — a
    * full corpus sort plus an exchange carrying every embedding, on every
    * index build / delta assignment. Now assignment shuffles NOTHING: at
    * 100 TB the index pass is scan → argmax projection → partitioned write.
    * Same lexicographic ordering (sim desc, cell_id asc) as the old max_by
    * ordering struct; DeltaIndexSpec/IvfAnnSpec/LifecycleFuzz pin
    * batch-vs-one-shot assignment equality. */
  def assignCells(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = centroids.agg(collect_list(
      struct(col("cell_id"), col("centroid"))).as("cents"))
    emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"),
        array_max(transform(col("cents"), c =>
          struct(
            cosine(col("embedding"), c.getField("centroid")).as("sim"),
            (-c.getField("cell_id")).as("tie"),
            c.getField("cell_id").as("cell_id")))).as("best"))
      .select(col("vec_id"), col("embedding"),
              col("best.cell_id").as("cell_id"))
  }

  /** Probe `nprobe` cells per query against an already-built (index,
    * centroids) pair and return exact-cosine top-k within them — the
    * shared core of [[search]] (in-memory build) and [[searchIndexed]]
    * (standing on-disk index). */
  private def probeTopK(index: DataFrame, centroids: DataFrame,
                        queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cell_id"))
    // The (query_id → probed cell_id) assignment is collected ONCE and
    // feeds BOTH the literal partition filter and the candidate join below
    // (ADVICE r19): a single evaluation of the queries×centroids scoring,
    // and no silent dependency on the probe ranking being deterministic
    // across two evaluations. The collect is |queries|·nprobe id pairs —
    // probe batches are request-sized by contract (see [[searchIndexed]]:
    // the corpus side is never the query side), and the local relation is
    // re-broadcast to executors for the join, so nothing corpus-sized ever
    // lands on the driver.
    val assignment = queries.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("cell_id"),
        cosine(col("q_emb"), col("centroid")).as("sim"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("cell_id"))
    val assignedRows = assignment.collect()
    val spark = queries.sparkSession
    val assignedLocal = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(assignedRows: _*)),
      assignment.schema)
    val probed = queries.join(broadcast(assignedLocal), Seq("query_id"))
      .select(col("query_id"), col("q_emb"), col("cell_id"))

    // STATIC cell pruning: Spark's dynamic partition pruning does NOT
    // fire through this join shape — the executed plan carries
    // `dynamicpruningexpression(true)` and the cell_id-partitioned index
    // scan reads ALL nlist partitions (IvfPruneProbeSpec pins the fixed
    // behavior). The probed cell set is bounded by nlist values no matter
    // how many queries probe (distinct cells ≤ min(nlist, K·nprobe)), so
    // the collected assignment becomes a LITERAL partition filter —
    // the scan that actually delivers the nprobe/nlist-fraction read the
    // partitioned layout exists for at 100 TB.
    val probedCells = assignedRows.map(_.get(1)).distinct.toSeq
    val prunedIndex = index.filter(col("cell_id").isin(probedCells: _*))
    // Final per-query top-k through the bounded-heap operator
    // (plans/TopKPerGroup), NOT a row_number window: the window variant
    // funnels each query's whole candidate set (∝ corpus·nprobe/nlist)
    // into one task for a full sort. The heap pass reduces map-side, so
    // the shuffle carries ≤ k rows per query; the rank is then a window
    // over that already-k-bounded result (k·|queries| rows total).
    val scored = probed.join(prunedIndex, Seq("cell_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cosine"))
    val top = graft.plans.TopKPerGroup.topK(
      scored, Seq(col("query_id")),
      // ties (rounded cosine) break toward the lowest vec_id, same as the
      // previous ORDER BY cosine DESC, vec_id — negate for descending
      struct(col("cosine"), (-col("vec_id")).as("tb")), k)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    top
      .withColumn("rn", row_number().over(w))
      .select(col("query_id"), col("rn"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("rn"))
  }

  /** Top-k within the nprobe nearest cells per query — self-contained form
    * (trains + assigns per call; for repeated probing build the index once
    * with [[buildIndex]] and use [[searchIndexed]]: the AnnScale 1.5 M-
    * vector rehearsal measured the per-call build at ~2 min vs millisecond
    * probes). */
  def search(emb: DataFrame, queryIds: Seq[Long], k: Int,
             nlist: Int, nprobe: Int): DataFrame = {
    // Materialize the nlist centroids as a LOCAL relation instead of
    // .cache(): the trained frame is reused by both the index build and the
    // probe join, and a per-invocation cached RDD is never unpersisted —
    // repeated search() calls would pin storage memory for the session
    // lifetime. nlist rows × one float vector is kilobytes.
    val trained = trainCentroids(emb, nlist)
    val centroids = emb.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(trained.collect(): _*)),
      trained.schema)
    val index = assignCells(emb, centroids)
    val queries = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    probeTopK(index, centroids, queries, k, nprobe)
  }

  /** Build the IVF index ONCE as a standing artifact under `indexDir`:
    * `centroids.parquet` (cell_id, centroid — kilobytes) and
    * `index.parquet`, the corpus PARTITIONED BY cell_id on disk. The
    * partitioned layout is the point at 100 TB: a probe touches only its
    * nprobe cells' directories — probeTopK's LITERAL cell filter (Spark's
    * dynamic partition pruning does not fire through the probe join;
    * IvfPruneProbeSpec) turns the probe into an nprobe/nlist-fraction
    * scan, and the O(n·nlist)
    * training/assignment cost is paid once, amortized over every
    * subsequent [[searchIndexed]] call (AnnScale measured the per-call
    * build at ~2 min for 1.5 M×612 vs seconds per probe batch). */
  def buildIndex(emb: DataFrame, nlist: Int, indexDir: String): Unit = {
    val trained = trainCentroids(emb, nlist)
    trained.write.mode("overwrite").parquet(s"$indexDir/centroids.parquet")
    val spark = emb.sparkSession
    val centroids = spark.read.parquet(s"$indexDir/centroids.parquet")
    assignCells(emb, centroids)
      // co-locate each cell before the partitioned write: without this,
      // every upstream task writes a file into every cell directory
      // (tasks × nlist small files — measured 250 s build / 20 s probe at
      // 1.5 M×612 from file-listing alone); hashed on cell_id each cell
      // lands in one task ⇒ one file per cell
      .repartition(math.min(nlist, 1024), col("cell_id"))
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$indexDir/index.parquet")
  }

  /** Append a batch of NEW vectors to a standing [[buildIndex]] artifact
    * without retraining: assign the batch against the STANDING centroids
    * (one broadcast scoring pass over only the new rows) and append into
    * the existing cell partitions. This is the production ingest path — a
    * daily 0.1% batch costs O(batch·nlist), not the O(corpus·nlist) full
    * rebuild.
    *
    * Exact contract (pinned in IvfAnnSpec): after appends, the index holds
    * BYTE-IDENTICAL rows to a single [[assignCells]] pass of the combined
    * corpus against the same centroids — append changes freshness, never
    * assignment semantics. What appends DO degrade is centroid fit: the
    * cells were trained on the original distribution, so recall against
    * the drifted corpus decays as the appended fraction grows
    * (`graft.AnnScale` drift mode measures recall@k per appended tranche;
    * BASELINE.md names the measured retrain trigger). Callers retrain by
    * re-running [[buildIndex]] over the full corpus. */
  def appendToIndex(newEmb: DataFrame, indexDir: String): Unit = {
    val spark = newEmb.sparkSession
    val centroids = spark.read.parquet(s"$indexDir/centroids.parquet")
    val nlist = centroids.count().toInt
    assignCells(newEmb, centroids)
      // same one-file-per-cell co-location as buildIndex — an append that
      // skipped this would scatter tasks × nlist small files per batch and
      // erode probe-time file listing round over round
      .repartition(math.min(nlist, 1024), col("cell_id"))
      .write.mode("append").partitionBy("cell_id")
      .parquet(s"$indexDir/index.parquet")
  }

  /** Delta batch for the INCREMENTAL lifecycle ([[DeltaIndex]]): same
    * assignment semantics as [[appendToIndex]] (new vectors score against
    * the STANDING centroids — byte-identical rows to a combined-corpus
    * assignCells pass, the IvfAnnSpec contract), but the delta lands in
    * its OWN immutable batch dir instead of appending into the published
    * one, so publication stays a single ATOMIC_MOVE and live batches are
    * never mutated. Probe side: [[searchIndexedMulti]] over the union of
    * batch index paths. Centroid drift is the same documented story as
    * appendToIndex: retrain (full rebuild) when `graft.AnnScale` drift
    * mode says recall decayed past the trigger. */
  def buildDeltaIndex(newEmb: DataFrame, centroidsPath: String,
                      stagingDir: String): Unit = {
    val spark = newEmb.sparkSession
    val centroids = spark.read.parquet(centroidsPath)
    val nlist = centroids.count().toInt
    assignCells(newEmb, centroids)
      .repartition(math.min(nlist, 1024), col("cell_id"))
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$stagingDir/index.parquet")
  }

  /** [[searchIndexed]] over the UNION of several batch index partitions —
    * the probe side of the incremental lifecycle. All batches were
    * assigned against the SAME standing centroids (the initial batch's),
    * so the union is row-identical to one index built over the combined
    * corpus with those centroids (DeltaIndexSpec pins it). */
  def searchIndexedMulti(spark: org.apache.spark.sql.SparkSession,
                         centroidsPath: String, indexPaths: Seq[String],
                         queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val centroids = spark.read.parquet(centroidsPath)
    // One read PER batch root, then a union: a single multi-root read of
    // cell_id-partitioned datasets makes Spark hunt for a common partition
    // base across the batch dirs and throw CONFLICTING_DIRECTORY_STRUCTURES.
    // Per-root discovery keeps each batch's cell_id pruning intact, and
    // UNION is exactly the incremental artifact's semantics.
    val index = indexPaths.map(spark.read.parquet(_)).reduce(_ unionByName _)
    probeTopK(index, centroids, queries, k, nprobe)
  }

  /** Prefix of the incremental artifact root. v2 = carries `_trained.txt`
    * (the coverage the centroids were trained on) through compaction, the
    * state the post-compaction retrain guard depends on. */
  private[graft] val IncPrefix = "graft_ivf_inc_v2"

  /** PRODUCTION incremental maintenance ([[DeltaIndex]]): the initial
    * batch trains centroids and indexes its vectors; every later ingest
    * batch is one [[buildDeltaIndex]] pass over ONLY the new part files
    * (O(delta·nlist), vs the fingerprint-keyed artifact's O(corpus·nlist)
    * rebuild). Returns (centroids path, index paths) for
    * [[searchIndexedMulti]].
    *
    * `maxLiveBatches` > 0 makes the compaction cadence ENGINE-OWNED
    * (VERDICT r19 task 5): when a sync leaves more than that many live
    * batches, one [[compactIncremental]] rebase fires — the OPTIMIZE
    * analogue of the retrain guard's engine-owned decision, keeping the
    * probe's union fan-in (and its file-listing cost) bounded at
    * steady state instead of growing one batch per ingest forever.
    * `retainMillis` is the snapshot-GC retention window (see
    * [[DeltaIndex.sync]]). */
  def ensureIncremental(spark: org.apache.spark.sql.SparkSession,
                        sourceDir: String, table: String = "embeddings",
                        nlist: Int = 16, maxLiveBatches: Int = 0,
                        retainMillis: Long = 0L): (String, Seq[String]) = {
    val root = DeltaIndex.root(sourceDir, table, IncPrefix)
    var batches = DeltaIndex.sync(spark, sourceDir, table, root, retainMillis) {
      (delta, staging, initial) =>
        initial match {
          case None      => buildIndex(delta, nlist, staging)
          case Some(ini) =>
            buildDeltaIndex(delta, s"$ini/centroids.parquet", staging)
        }
    }.map(_.toString)
    if (maxLiveBatches > 0 && batches.size > maxLiveBatches)
      batches = compactBatches(spark, root, retainMillis)
    (s"${batches.head}/centroids.parquet", batches.map(b => s"$b/index.parquet"))
  }

  /** Sampled recall@k of a standing (centroids, index batches) artifact,
    * measured FROM THE ARTIFACT ITSELF: the `sampleN` lowest-vec_id
    * indexed vectors probe as queries, exact brute-force top-k over the
    * index relation is the truth, and recall is the hit fraction. One
    * O(n·sampleN) map-side scoring pass over the artifact (queries
    * broadcast, top-k through the bounded-heap operator) — the corpus
    * text/embedding source is never read, so the measurement runs at
    * OPTIMIZE cadence cost, not ingest cost. This is the measured-recall
    * retrain policy of BASELINE.md round 14 ("append freely, re-measure
    * recall per tranche, rebuild when it crosses the floor") as an
    * engine-owned primitive. */
  /** Deterministic, ingest-order-INDEPENDENT recall-sample queries
    * (VERDICT r19 task 2): a hash-mod filter over vec_id, thinned to
    * ~sampleN by stride n/sampleN, ordered by the hash for a reproducible
    * final cut. The previous `orderBy(vec_id).limit(sampleN)` took the
    * LOWEST ids — in production appends carry increasing ids, so that
    * sample over-represented the initial batch (exactly the vectors the
    * centroids fit best) and overestimated the drifted corpus's recall,
    * firing the retrain guard late or never. Hash-uniform selection reads
    * each batch in proportion to its size no matter the id order
    * (IvfGuardSpec pins the composition). */
  private[graft] def sampleRecallQueries(index: DataFrame,
                                         sampleN: Int): DataFrame = {
    val n = index.count()
    val stride = math.max(1L, n / math.max(1, sampleN))
    val h = abs(xxhash64(col("vec_id")))
    index.filter(pmod(h, lit(stride)) === 0)
      .orderBy(h, col("vec_id")).limit(sampleN)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
  }

  def recallOfIndex(spark: org.apache.spark.sql.SparkSession,
                    centroidsPath: String, indexPaths: Seq[String],
                    k: Int, nprobe: Int, sampleN: Int): Double = {
    val index = indexPaths.map(spark.read.parquet(_)).reduce(_ unionByName _)
    // Materialize the sampled queries as a LOCAL relation: the frame is
    // referenced twice (brute truth + artifact probe) and collapsing it to
    // sampleN in-memory rows makes both consumers read the identical set
    // by construction instead of by determinism of re-evaluation.
    val sampled = sampleRecallQueries(index, sampleN)
    val qs = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(sampled.collect(): _*)),
      sampled.schema)
    val scored = index.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cosine"))
    val brute = graft.plans.TopKPerGroup.topK(scored, Seq(col("query_id")),
        struct(col("cosine"), (-col("vec_id")).as("tb")), k)
      .select(col("query_id"), col("vec_id"))
    val nTruth = brute.count()
    if (nTruth == 0) return 1.0
    val got = searchIndexedMulti(spark, centroidsPath, indexPaths, qs, k, nprobe)
      .select(col("query_id"), col("vec_id"))
    got.join(brute, Seq("query_id", "vec_id")).count().toDouble / nTruth
  }

  /** [[ensureIncremental]] with the retrain decision ENGINE-OWNED: after
    * reconciling, measure sampled recall from the artifact
    * ([[recallOfIndex]]); if it has drifted below `recallFloor`, fire ONE
    * [[DeltaIndex.retrain]] — centroids re-trained over the full corpus
    * into a single full-trained batch, published as an atomic snapshot
    * swap (zero-downtime: a concurrent probe resolves the drifted snapshot
    * or the retrained one, never an empty artifact — the pre-r20
    * delete-root-and-re-sync path had a window where probes answered
    * empty) — and re-measure. A FULL-TRAINED artifact short-circuits:
    * retraining can only change the outcome when the centroids' training
    * coverage ([[DeltaIndex.trainedKeysOf]] of the initial batch) differs
    * from what the artifact currently covers. Comparing COVERAGE, not
    * batch count, is load-bearing (VERDICT r19 lead finding):
    * [[compactIncremental]] rebases N drifted batches into ONE that still
    * carries the original centroids, so a batch-count test would read the
    * compacted artifact as full-trained and freeze its drift below the
    * floor forever. An unreachable floor still degrades to one measurement
    * per sync once the artifact is full-trained — never a rebuild loop.
    * Returns (centroids path, index paths, measured recall). */
  def ensureIncrementalGuarded(spark: org.apache.spark.sql.SparkSession,
                               sourceDir: String, table: String = "embeddings",
                               nlist: Int = 16, k: Int = 5, nprobe: Int = 4,
                               recallFloor: Double = 0.95, sampleN: Int = 32,
                               maxLiveBatches: Int = 0, retainMillis: Long = 0L)
      : (String, Seq[String], Double) = {
    val (c1, i1) = ensureIncremental(spark, sourceDir, table, nlist,
      maxLiveBatches, retainMillis)
    val root = DeltaIndex.root(sourceDir, table, IncPrefix)
    val live = DeltaIndex.liveBatches(root)
    val fullTrained = live.nonEmpty &&
      DeltaIndex.trainedKeysOf(live.head) ==
        live.flatMap(DeltaIndex.coveredKeysOf).toSet
    val r1 = recallOfIndex(spark, c1, i1, k, nprobe, sampleN)
    if (r1 >= recallFloor || fullTrained) (c1, i1, r1)
    else {
      val batches = DeltaIndex.retrain(spark, sourceDir, table, root,
        retainMillis) { (full, staging) => buildIndex(full, nlist, staging) }
        .map(_.toString)
      val c2 = s"${batches.head}/centroids.parquet"
      val i2 = batches.map(b => s"$b/index.parquet")
      (c2, i2, recallOfIndex(spark, c2, i2, k, nprobe, sampleN))
    }
  }

  /** OPTIMIZE pass for the incremental IVF artifact ([[DeltaIndex.compact]]):
    * rebase the live batches into one — centroids (the INITIAL batch's
    * corpus-global standing state) copied forward, cell assignments
    * unioned and re-co-located one-file-per-cell. Every batch was assigned
    * against those same centroids, so the union IS the combined-corpus
    * assignment (the DeltaIndexSpec parity pin); probe output is
    * row-identical before and after. Reads only the artifact's own parquet
    * (never `embeddings`) — O(artifact), vs the O(corpus·nlist) rebuild
    * the root-deletion story paid. Centroid DRIFT is deliberately
    * untouched: compaction is a layout pass, retrain remains the
    * measured-recall-floor policy (BASELINE.md round 14). */
  def compactIncremental(spark: org.apache.spark.sql.SparkSession,
                         sourceDir: String, table: String = "embeddings",
                         retainMillis: Long = 0L)
      : (String, Seq[String]) = {
    val root = DeltaIndex.root(sourceDir, table, IncPrefix)
    val batches = compactBatches(spark, root, retainMillis)
    (s"${batches.head}/centroids.parquet", batches.map(b => s"$b/index.parquet"))
  }

  private def compactBatches(spark: org.apache.spark.sql.SparkSession,
                             root: java.nio.file.Path,
                             retainMillis: Long): Seq[String] =
    DeltaIndex.compact(spark, root, retainMillis) { (bs, staging) =>
      val centroids = spark.read.parquet(s"${bs.head}/centroids.parquet")
      val nlist = centroids.count().toInt
      centroids.write.mode("overwrite").parquet(s"$staging/centroids.parquet")
      // The replacement batch COVERS the rebased union but its centroids
      // were TRAINED on whatever the old initial batch trained on — carry
      // that training coverage forward, or the retrain guard would read
      // the compacted batch as full-trained and freeze post-compaction
      // drift forever (the VERDICT r19 lead finding).
      DeltaIndex.writeTrained(staging, DeltaIndex.trainedKeysOf(bs.head))
      bs.map(b => spark.read.parquet(s"$b/index.parquet"))
        .reduce(_ unionByName _)
        .repartition(math.min(nlist, 1024), col("cell_id"))
        .write.mode("overwrite").partitionBy("cell_id")
        .parquet(s"$staging/index.parquet")
    }.map(_.toString)

  /** Probe a standing [[buildIndex]] artifact with an external query frame
    * `(query_id, q_emb)`: same output, row-for-row, as [[search]] with the
    * same (nlist, nprobe) — pinned in IvfAnnSpec. The query frame comes
    * from the CALLER (the original corpus, a request batch, a file): the
    * index is partitioned by cell_id, so fetching queries by vec_id FROM
    * the index would prune nothing — a whole-index scan per probe batch,
    * exactly what the partitioned layout exists to avoid. */
  def searchIndexed(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                    queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val centroids = spark.read.parquet(s"$indexDir/centroids.parquet")
    val index = spark.read.parquet(s"$indexDir/index.parquet")
    probeTopK(index, centroids, queries, k, nprobe)
  }

  /** Convenience vec_id form of [[searchIndexed]] — fetches the query
    * vectors by scanning the index (no partition pruning on vec_id; fine
    * for fixtures/specs, use the query-frame overload for repeated
    * production probing). */
  def searchIndexed(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                    queryIds: Seq[Long], k: Int, nprobe: Int): DataFrame = {
    val centroids = spark.read.parquet(s"$indexDir/centroids.parquet")
    val index = spark.read.parquet(s"$indexDir/index.parquet")
    val queries = index.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    // Hand probeTopK the already-loaded frames rather than delegating to
    // the path-based overload, which would re-read index.parquet for the
    // probe side (one extra full listing+scan per call — ADVICE r13).
    probeTopK(index, centroids, queries, k, nprobe)
  }

  /** Same query/k shape as q_ann_brute / q_ann_lsh; rows-only (approximate
    * by design), invariants pinned in IvfAnnSpec. */
  val annIvf: QueryFn = (s, dir) =>
    search(t(s, dir, "embeddings"), queryIds = (0L until 10L),
      k = 5, nlist = 16, nprobe = 4)

  /** The PRODUCTION probe path as a registry entry (VERDICT r14/r15 #5):
    * [[buildIndex]] runs once per gate corpus (amortized across every
    * subsequent Verify/Bench invocation via the fingerprint-keyed standing
    * artifact — build-once lifecycle, atomic publish, and stale-debris
    * self-heal all in [[StandingIndex.ensure]]), then [[searchIndexed]]
    * probes it with a caller-provided query frame — the exact shape a
    * serving deployment runs. Same (nlist, nprobe, k) as q_ann_ivf, so the
    * same ivf_recall_min bound in tools/check.py applies against the
    * q_ann_brute ground truth. */
  val annIvfIndexed: QueryFn = (s, dir) => {
    val idxDir = StandingIndex.artifactDir(dir, "embeddings", "graft_ivf_idx")
    StandingIndex.ensure(idxDir) { staging =>
      buildIndex(t(s, dir, "embeddings"), nlist = 16, staging)
    }
    val queries = t(s, dir, "embeddings")
      .filter(col("vec_id") < 10L)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    searchIndexed(s, idxDir.toString, queries, k = 5, nprobe = 4)
  }

  /** Two-append REHEARSAL of the incremental IVF artifact on the gate
    * corpus (single-file table ⇒ the file-grained [[DeltaIndex]] lifecycle
    * is exercised in DeltaIndexSpec and measured by [[graft.DeltaBench]];
    * here the append is a deterministic ~1/3 slice): centroids train on
    * the standing 2/3, the delta third assigns against them into its own
    * batch partition, the probe unions both. Approximate by design like
    * the other IVF entries — recall vs q_ann_brute is gated in
    * tools/check.py (`ivf_recall_min`), with the extra teeth that the
    * centroids here never saw the delta vectors. */
  val annIvfDelta: QueryFn = (s, dir) => {
    val idxDir = StandingIndex.artifactDir(dir, "embeddings", "graft_ivf_delta_v1")
    StandingIndex.ensure(idxDir) { staging =>
      val emb = t(s, dir, "embeddings")
      val standing = col("vec_id") % 3 < 2
      buildIndex(emb.filter(standing), nlist = 16, s"$staging/batch_0")
      buildDeltaIndex(emb.filter(!standing),
        s"$staging/batch_0/centroids.parquet", s"$staging/batch_1")
    }
    val queries = t(s, dir, "embeddings")
      .filter(col("vec_id") < 10L)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    searchIndexedMulti(s, s"$idxDir/batch_0/centroids.parquet",
      Seq(s"$idxDir/batch_0/index.parquet", s"$idxDir/batch_1/index.parquet"),
      queries, k = 5, nprobe = 4)
  }

  /** The MEASURED-RECALL RETRAIN GUARD end-to-end on the gate corpus:
    * same two-append layout as [[annIvfDelta]] (centroids never saw the
    * delta third), then [[recallOfIndex]] prices the drift — at sf0.01
    * the delta artifact measures ~0.54 with the hash-uniform sample
    * (the pre-r20 lowest-id sample read ~0.74 — it over-weighted the
    * trained batch), below the 0.95 floor, so the guard retrains over
    * the full corpus and the probe answers from the retrained index.
    * The driver's gate then scores THIS entry at the full-trained
    * recall (~0.90) against a 0.80 bound set ABOVE the un-retrained
    * artifact's 0.74 gate recall — the gate doesn't just observe the
    * guard firing, it FAILS if the guard doesn't. The decision and
    * measured recall are recorded in the artifact (`_guard.txt`) for
    * post-hoc audit. */
  val annIvfGuarded: QueryFn = (s, dir) => {
    val idxDir = StandingIndex.artifactDir(dir, "embeddings", "graft_ivf_guard_v1")
    StandingIndex.ensure(idxDir) { staging =>
      val emb = t(s, dir, "embeddings")
      val standing = col("vec_id") % 3 < 2
      buildIndex(emb.filter(standing), nlist = 16, s"$staging/batch_0")
      buildDeltaIndex(emb.filter(!standing),
        s"$staging/batch_0/centroids.parquet", s"$staging/batch_1")
      val r = recallOfIndex(s, s"$staging/batch_0/centroids.parquet",
        Seq(s"$staging/batch_0/index.parquet", s"$staging/batch_1/index.parquet"),
        k = 5, nprobe = 4, sampleN = 10)
      val retrain = r < 0.95
      if (retrain) buildIndex(emb, nlist = 16, s"$staging/retrained")
      java.nio.file.Files.write(java.nio.file.Paths.get(staging, "_guard.txt"),
        f"recall=$r%.4f retrain=$retrain%n".getBytes("UTF-8"))
    }
    val queries = t(s, dir, "embeddings").filter(col("vec_id") < 10L)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    if (java.nio.file.Files.isDirectory(
          java.nio.file.Paths.get(idxDir.toString, "retrained")))
      searchIndexed(s, s"$idxDir/retrained", queries, k = 5, nprobe = 4)
    else searchIndexedMulti(s, s"$idxDir/batch_0/centroids.parquet",
      Seq(s"$idxDir/batch_0/index.parquet", s"$idxDir/batch_1/index.parquet"),
      queries, k = 5, nprobe = 4)
  }

  val all: Map[String, QueryFn] = Map(
    "q_ann_ivf" -> annIvf,
    "q_ann_ivf_indexed" -> annIvfIndexed,
    "q_ann_ivf_delta" -> annIvfDelta,
    "q_ann_ivf_guarded" -> annIvfGuarded)
  val oracle: Map[String, String] = Map.empty
}
