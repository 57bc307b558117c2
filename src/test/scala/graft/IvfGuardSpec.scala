package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The IVF retrain guard's POLICY correctness — the two round-19 verdict
  * leads plus the engine-owned compaction cadence:
  *
  *  1. recall sampling must be ingest-order-independent (the old
  *     lowest-vec_id sample over-represented the initial batch — exactly
  *     the vectors the centroids fit best — and overestimated drifted
  *     recall);
  *  2. the retrain short-circuit must compare TRAINING COVERAGE, not batch
  *     count: compaction rebases N drifted batches into ONE that still
  *     carries the original centroids, and a batch-count test would freeze
  *     that drift below the floor forever;
  *  3. `maxLiveBatches` auto-compaction must bound the live set at steady
  *     state with probe output unchanged.
  */
class IvfGuardSpec extends SparkSpec {

  private def freshSource(name: String, table: String): String = {
    val d = tmp(name)
    Files.createDirectories(Paths.get(d, s"$table.parquet"))
    d
  }

  private def ingest(sourceDir: String, table: String, part: DataFrame): Unit = {
    val staging = tmp("graft_guard_stage")
    part.coalesce(1).write.mode("overwrite").parquet(staging)
    val f = Files.list(Paths.get(staging)).filter(_.toString.endsWith(".parquet"))
      .findFirst.get
    val n = Files.list(Paths.get(sourceDir, s"$table.parquet")).count()
    Files.copy(f, Paths.get(sourceDir, s"$table.parquet", s"part-$n.parquet"))
  }

  test("recall sample is hash-uniform over ids, not lowest-id biased") {
    import spark.implicits._
    // An id-ORDERED two-batch shape: ids < 1000 are "the initial batch",
    // ids >= 1000 "the append" (production appends carry increasing ids).
    // The old orderBy(vec_id).limit(N) sampler reads 0% of the upper half.
    val idx = (0L until 2000L)
      .map(i => (i, Array.fill(4)(i.toFloat)))
      .toDF("vec_id", "embedding")
    val qs = pipeline.IvfAnn.sampleRecallQueries(idx, 40)
      .select(col("query_id")).as[Long].collect().toSeq
    assert(qs.size >= 15 && qs.size <= 40, s"sample size ${qs.size}")
    val upper = qs.count(_ >= 1000L)
    assert(upper >= qs.size / 4 && upper <= qs.size * 3 / 4,
      s"sample must read both batches in proportion to size: " +
        s"$upper of ${qs.size} from the appended half")
    // deterministic: the same index yields the same sample
    val again = pipeline.IvfAnn.sampleRecallQueries(idx, 40)
      .select(col("query_id")).as[Long].collect().toSeq
    assert(again == qs)
  }

  test("post-compaction drift is not frozen: guard compares training coverage, not batch count") {
    val emb = Tables.table(spark, sfDir, "embeddings")
    val src = freshSource("graft_ivf_guard_compact", "embeddings")
    ingest(src, "embeddings", emb.filter(col("vec_id") % 3 < 2))
    pipeline.IvfAnn.ensureIncremental(spark, src, "embeddings", nlist = 8)
    ingest(src, "embeddings", emb.filter(col("vec_id") % 3 === 2))
    pipeline.IvfAnn.ensureIncremental(spark, src, "embeddings", nlist = 8)

    // OPTIMIZE: one batch now, but its centroids only ever saw the first
    // ingest — the rebase must carry that training coverage forward.
    val (cCompact, iCompact) =
      pipeline.IvfAnn.compactIncremental(spark, src, "embeddings")
    assert(iCompact.size == 1)
    val root = pipeline.DeltaIndex.root(src, "embeddings", pipeline.IvfAnn.IncPrefix)
    val live1 = pipeline.DeltaIndex.liveBatches(root)
    assert(live1.size == 1)
    assert(pipeline.DeltaIndex.trainedKeysOf(live1.head) !=
             pipeline.DeltaIndex.coveredKeysOf(live1.head),
      "the compacted batch must record the ORIGINAL training coverage, " +
        "not claim its centroids saw the whole union")

    import spark.implicits._
    def centroidsOf(path: String): Seq[(Long, Seq[Float])] =
      spark.read.parquet(path).as[(Long, Array[Float])]
        .collect().sortBy(_._1).map(r => (r._1, r._2.toSeq)).toSeq
    val before = centroidsOf(cCompact)

    // Unreachable floor against the compacted single batch: the pre-fix
    // batch-count short-circuit (i1.size <= 1) provably could not retrain
    // here; the coverage-based guard MUST. The retrained batch lands at a
    // TRAINED-TAGGED name (it covers the same union as the compacted
    // batch, whose dir can survive under a retention window — an
    // equal-coverage name would let marker adoption mistake the stale
    // rebase for the retrained artifact; see the zero-downtime test).
    val (c2, i2, r2) = pipeline.IvfAnn.ensureIncrementalGuarded(
      spark, src, "embeddings", nlist = 8, recallFloor = 1.01, sampleN = 8)
    assert(i2.size == 1, "retrain rebuilds into a single full-trained batch")
    assert(centroidsOf(c2) != before,
      "retrain must replace the drifted initial-trained centroids with " +
        "full-corpus-trained ones")
    assert(r2 >= 0.0 && r2 <= 1.0)
    val live2 = pipeline.DeltaIndex.liveBatches(root)
    assert(pipeline.DeltaIndex.trainedKeysOf(live2.head) ==
             pipeline.DeltaIndex.coveredKeysOf(live2.head),
      "after retrain the artifact is full-trained")

    // ... and only now does the unreachable floor short-circuit: the
    // full-trained artifact measures once, never rebuild-loops.
    val (c3, i3, r3) = pipeline.IvfAnn.ensureIncrementalGuarded(
      spark, src, "embeddings", nlist = 8, recallFloor = 1.01, sampleN = 8)
    assert(c3 == c2 && i3 == i2 && r3 == r2)
  }

  test("retrain is zero-downtime: snapshot swap, retained old dirs, no equal-coverage adoption") {
    import spark.implicits._
    val emb = Tables.table(spark, sfDir, "embeddings")
    val src = freshSource("graft_ivf_zdt", "embeddings")
    val hour = 3600L * 1000

    ingest(src, "embeddings", emb.filter(col("vec_id") % 3 < 2))
    pipeline.IvfAnn.ensureIncremental(spark, src, "embeddings", nlist = 8)
    ingest(src, "embeddings", emb.filter(col("vec_id") % 3 === 2))
    pipeline.IvfAnn.ensureIncremental(spark, src, "embeddings", nlist = 8)
    // Compact under a retention window: the rebased single batch covers the
    // FULL key union but carries the initial-trained centroids — exactly
    // the dir an equal-coverage retrain name would wrongly adopt.
    val (cCompact, _) = pipeline.IvfAnn.compactIncremental(
      spark, src, "embeddings", retainMillis = hour)
    val root = pipeline.DeltaIndex.root(src, "embeddings", pipeline.IvfAnn.IncPrefix)
    val preRetrain = pipeline.DeltaIndex.liveBatches(root)
    assert(preRetrain.size == 1)

    def centroidsOf(path: String): Seq[(Long, Seq[Float])] =
      spark.read.parquet(path).as[(Long, Array[Float])]
        .collect().sortBy(_._1).map(r => (r._1, r._2.toSeq)).toSeq
    val drifted = centroidsOf(cCompact)

    val (c2, i2, _) = pipeline.IvfAnn.ensureIncrementalGuarded(
      spark, src, "embeddings", nlist = 8, recallFloor = 1.01, sampleN = 8,
      retainMillis = hour)
    val live2 = pipeline.DeltaIndex.liveBatches(root)
    assert(live2.size == 1 && i2.size == 1)
    // different dir than the compacted batch (trained-tagged name), new
    // full-corpus centroids — the stale equal-coverage rebase was NOT
    // adopted despite its ready marker
    assert(live2.head != preRetrain.head,
      "retrain must publish a distinct trained-tagged batch, not adopt " +
        "the retained equal-coverage compacted dir")
    assert(centroidsOf(c2) != drifted)
    // zero-downtime: the pre-retrain snapshot's files SURVIVE inside the
    // retention window (tombstoned, not live), so a reader that resolved
    // the old manifest keeps its open scans
    assert(preRetrain.forall(java.nio.file.Files.exists(_)),
      "retired pre-retrain dirs must survive inside the retention window")
    assert(spark.read.parquet(s"${preRetrain.head}/index.parquet").count() > 0,
      "the old snapshot must remain readable after the swap")
    // ... and the artifact is never empty at any resolvable point: the
    // published snapshot is the retrained batch, full-trained
    assert(pipeline.DeltaIndex.trainedKeysOf(live2.head) ==
             pipeline.DeltaIndex.coveredKeysOf(live2.head))
    // idempotent: a second guarded call measures and short-circuits on the
    // same snapshot
    val (c3, i3, _) = pipeline.IvfAnn.ensureIncrementalGuarded(
      spark, src, "embeddings", nlist = 8, recallFloor = 1.01, sampleN = 8,
      retainMillis = hour)
    assert(c3 == c2 && i3 == i2)
  }

  test("maxLiveBatches: the Nth append auto-compacts; assignment and probe unchanged") {
    import spark.implicits._
    val emb = Tables.table(spark, sfDir, "embeddings")
    val src = freshSource("graft_ivf_cadence", "embeddings")

    ingest(src, "embeddings", emb.filter(col("vec_id") % 3 === 0))
    val (_, i1) = pipeline.IvfAnn.ensureIncremental(
      spark, src, "embeddings", nlist = 8, maxLiveBatches = 2)
    assert(i1.size == 1)
    ingest(src, "embeddings", emb.filter(col("vec_id") % 3 === 1))
    val (_, iA) = pipeline.IvfAnn.ensureIncremental(
      spark, src, "embeddings", nlist = 8, maxLiveBatches = 2)
    assert(iA.size == 2, "at the threshold: no compaction yet")
    ingest(src, "embeddings", emb.filter(col("vec_id") % 3 === 2))
    val (c3, i3) = pipeline.IvfAnn.ensureIncremental(
      spark, src, "embeddings", nlist = 8, maxLiveBatches = 2)
    assert(i3.size == 1, "past the threshold: exactly one rebase back to 1")

    // probe-identical to the combined-corpus assignment against the same
    // (still initial-trained) centroids — compaction is a layout pass
    val centroids = spark.read.parquet(c3)
    val unioned = i3.map(spark.read.parquet(_)).reduce(_ unionByName _)
      .select(col("vec_id"), col("cell_id").cast("long"))
      .as[(Long, Long)].collect().sorted.toSeq
    val oneShot = pipeline.IvfAnn.assignCells(emb, centroids)
      .select(col("vec_id"), col("cell_id"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(unioned == oneShot)

    // the next append lands as a NEW delta batch on top of the rebase
    // (steady state: batch count oscillates in [1, maxLiveBatches+1))
    val more = emb.filter(col("vec_id") % 3 === 0)
      .withColumn("vec_id", col("vec_id") + lit(1000000L))
    ingest(src, "embeddings", more)
    val (_, i4) = pipeline.IvfAnn.ensureIncremental(
      spark, src, "embeddings", nlist = 8, maxLiveBatches = 2)
    assert(i4.size == 2 && i4.head == i3.head)
  }

  test("maxLiveBatches on the minhash artifact: probe equality through an auto-rebase") {
    import spark.implicits._
    val docs = Tables.table(spark, sfDir, "documents")
    val src = freshSource("graft_mh_cadence", "documents")
    for (m <- 0 to 2) {
      ingest(src, "documents", docs.filter(col("doc_id") % 3 === m))
      pipeline.MinhashIndex.ensureIncremental(spark, src, maxLiveBatches = 2)
    }
    val dirs = pipeline.MinhashIndex.ensureIncremental(spark, src, maxLiveBatches = 2)
    assert(dirs.size == 1, "third append must have auto-compacted to one batch")
    val probe = pipeline.MinhashIndex.pairsIndexedMulti(spark, dirs)
      .as[(Long, Long, Double)].collect().sorted.toSeq
    val inline = pipeline.DedupQueries.minhashPairs(docs)
      .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(probe == inline && inline.nonEmpty)
  }
}
