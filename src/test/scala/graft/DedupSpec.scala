package graft

import org.apache.spark.sql.functions._
import graft.functions.SimHash

class DedupSpec extends SparkSpec {

  private lazy val docsWithPlants = {
    import spark.implicits._
    val base = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    // Plant: 9001 = exact copy of doc 0; 9002 = near-copy of doc 1 (one
    // word changed); 9003 = unrelated.
    val r0 = base.filter($"doc_id" === 0).head()
    val r1 = base.filter($"doc_id" === 1).head()
    val d0 = r0.getAs[String]("text")
    val d1 = r1.getAs[String]("text")
    val near = d1.split(" ").zipWithIndex
      .map { case (w, i) => if (i == 3) "REPLACED" else w }.mkString(" ")
    // plants inherit the source doc's lang — the jaccard pipeline blocks
    // candidates by language, so a mismatched lang would hide the pair
    // 9004 = mid-similarity copy of doc 1: every 8th word replaced kills
    // ~3/8 of the shingles -> jaccard ≈ 0.45, between the 0.2 stress
    // threshold and the 0.8 production threshold
    val mid = d1.split(" ").zipWithIndex
      .map { case (w, i) => if (i % 8 == 0) s"MID$i" else w }.mkString(" ")
    val plants = Seq(
      (9001L, d0, r0.getAs[String]("lang"), "plant", d0.length.toLong),
      (9002L, near, r1.getAs[String]("lang"), "plant", near.length.toLong),
      (9003L, "completely different content with nothing shared at all zzz",
       "en", "plant", 60L),
      (9004L, mid, r1.getAs[String]("lang"), "plant", mid.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    base.union(plants)
  }

  /** docsWithPlants (ONE exact dup pair in ~504 docs — duplicate pair mass
    * 1, under the 1 % contraction floor ⇒ SKIP branch) plus seven more
    * identical copies of doc 0: the 9-copy group has mass C(9,2) = 36,
    * over the floor ⇒ CONTRACT branch. The contraction tests run the
    * pipelines over both corpora so BOTH regimes stay equality-pinned. */
  private lazy val docsWithHeavyPlants = {
    import spark.implicits._
    val r0 = docsWithPlants.filter($"doc_id" === 0).head()
    val d0 = r0.getAs[String]("text")
    val copies = (9301L to 9307L).map(id =>
      (id, d0, r0.getAs[String]("lang"), "plant", d0.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docsWithPlants.union(copies)
  }

  private def bothRegimes = Seq(
    ("skip", docsWithPlants), ("contract", docsWithHeavyPlants))

  test("contraction decision: duplicate pair mass vs the 1% floor") {
    val base = Tables.table(spark, sfDir, "documents")
    // organic: zero mass -> skip
    assert(!pipeline.DedupQueries.contractExact(base).contracted,
      "organic corpus must not contract")
    // trace duplication (mass 1 on ~504 docs) -> still skip: the
    // uncontracted pipeline's one extra verify row is cheaper than five
    // corpus-cardinality joins
    assert(!pipeline.DedupQueries.contractExact(docsWithPlants).contracted,
      "single dup pair must not trip the floor")
    // material duplication (mass 36) -> contract
    assert(pipeline.DedupQueries.contractExact(docsWithHeavyPlants).contracted,
      "9-copy group must contract")
    // skew-safety: ONE heavy group among otherwise-organic docs trips the
    // exact mass statistic even though it barely moves a distinct count
    import spark.implicits._
    val skew = base.select("doc_id", "text", "lang", "source", "n_chars")
      .union((1L to 30L).map(i =>
        (20000L + i, "the same pathological doc repeated many times over",
         "en", "plant", 50L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    assert(pipeline.DedupQueries.contractExact(skew).contracted,
      "one 30-copy group among organic docs must contract (mass 435)")
  }

  test("adaptive contraction: empty and all-ineligible corpora degrade to no pairs") {
    import spark.implicits._
    // Both degenerate corpora take the skip branch through a (0, 0.0)
    // detection statistic — the decision head() must not throw on an
    // empty aggregate, and every pipeline must plan and run to zero rows.
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    val ineligible = Seq((1L, "ab", "en"), (2L, null.asInstanceOf[String], "en"))
      .toDF("doc_id", "text", "lang") // "ab" is sub-shingle-floor; null text
    for ((label, df) <- Seq(("empty", empty), ("ineligible", ineligible))) {
      assert(pipeline.DedupQueries.minhashPairs(df).count() == 0, s"$label minhash")
      assert(pipeline.DedupQueries.simhashPairs(df).count() == 0, s"$label simhash")
      val cl = pipeline.CurationQueries.dedupClusterFrame(spark, df)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(cl.length == df.count() &&
             cl.forall { case (id, lbl, sz) => id == lbl && sz == 1 },
        s"$label cluster must self-label every doc: ${cl.toSeq}")
    }
  }

  test("skip branch plans no expansion machinery (no member-map attributes)") {
    // Below the floor the pipeline must BE the uncontracted one — not an
    // expansion over singleton groups. The member map's `rep` attribute
    // appearing anywhere in the optimized plan means the skip branch
    // regressed into planning contraction joins it doesn't need.
    for (df <- Seq(pipeline.DedupQueries.minhashPairs(docsWithPlants),
                   pipeline.DedupQueries.simhashPairs(docsWithPlants),
                   pipeline.DedupQueries.ngramPairs(spark, docsWithPlants, 0.8))) {
      val attrs = df.queryExecution.optimizedPlan.collect {
        case p => p.output.map(_.name)
      }.flatten.toSet
      assert(!attrs.contains("rep"),
        s"skip-branch plan carries expansion attributes: $attrs")
    }
  }

  test("planted exact duplicate collapses to one fingerprint group") {
    val groups = docsWithPlants
      .groupBy(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ").cast("binary")))
      .agg(collect_set(col("doc_id")).as("ids"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(col("ids"))
      .collect()
    assert(groups.exists(r => {
      val ids = r.getSeq[Long](0).toSet
      ids.contains(0L) && ids.contains(9001L)
    }), "exact dup (0, 9001) not grouped")
  }

  test("minhash LSH finds the planted exact and near duplicates") {
    val pairs = pipeline.DedupQueries.minhashPairs(docsWithPlants)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 9001L)), s"exact dup pair missing: $pairs")
    assert(pairs.contains((1L, 9002L)), s"near dup pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 9003L || p._2 == 9003L),
      "unrelated planted doc must not pair")
  }

  test("simhash of identical token streams is identical, near has small hamming") {
    import spark.implicits._
    val fp = docsWithPlants
      .select(col("doc_id"),
        SimHash(transform(split(trim(col("text")), "\\s+"), t => xxhash64(t)))
          .as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(fp(0L) == fp(9001L), "identical docs must have equal simhash")
    val hammingNear = java.lang.Long.bitCount(fp(1L) ^ fp(9002L))
    assert(hammingNear <= 12, s"near-dup hamming too large: $hammingNear")
  }

  test("distributed prefix-filter jaccard pairs == exact kernel oracle") {
    import spark.implicits._
    val docs = Tables.table(spark, sfDir, "documents")
    val sh = pipeline.DedupQueries.shingled(docs)
    val dist = pipeline.AllPairs.jaccardPairs(spark, sh, 20, 0.2)
      .as[(Long, Long, Double)].collect().toSeq
    val oracle = pipeline.AllPairs.jaccardPairsKernel(spark, sh, 20, 0.2)
    assert(dist == oracle,
      s"distributed=${dist.take(5)}... oracle=${oracle.take(5)}...")
    assert(oracle.nonEmpty, "corpus should contain at least one near-dup pair")
  }

  test("t=0.8 prefix filter keeps full recall and drops mid-similarity pairs") {
    import spark.implicits._
    // At the production threshold the prefix filter explodes only ~20% of
    // each shingle set — this pins that the aggressive prefix still finds
    // the planted near-exact pair (full recall) while the mid-similarity
    // plant (9004, j ≈ 0.45) appears only at the low threshold.
    val sh = pipeline.DedupQueries.shingled(docsWithPlants)
    val hi = pipeline.AllPairs.jaccardPairs(spark, sh, 20, 0.8)
      .as[(Long, Long, Double)].collect().toSeq
    val kernel = pipeline.AllPairs.jaccardPairsKernel(spark, sh, 20, 0.8)
    assert(hi == kernel, s"hi=${hi.take(5)}... kernel=${kernel.take(5)}...")
    val pairs = hi.map(p => (p._1, p._2)).toSet
    assert(pairs.contains((0L, 9001L)), s"exact pair must survive t=0.8: $pairs")
    assert(hi.forall(_._3 >= 0.8))
    val lo = pipeline.AllPairs.jaccardPairs(spark, sh, 20, 0.2)
      .as[(Long, Long, Double)].collect().toSeq
    val loPairs = lo.map(p => (p._1, p._2)).toSet
    assert(loPairs.contains((1L, 9004L)), "mid pair must appear at t=0.2")
    assert(!pairs.contains((1L, 9004L)), "mid pair must NOT survive t=0.8")
    assert(hi.size < lo.size, "t=0.8 must be strictly more selective here")
  }

  test("distributed block-pair cosine == exact kernel oracle") {
    import spark.implicits._
    val e = Tables.table(spark, sfDir, "embeddings")
    val dist = pipeline.AllPairs.embeddingPairs(spark, e, 0.4)
      .as[(Long, Long, Double)].collect().toSeq
    val oracle = pipeline.AllPairs.embeddingPairsKernel(spark, e, 0.4)
    assert(dist == oracle,
      s"distributed n=${dist.size} oracle n=${oracle.size}")
    assert(oracle.nonEmpty, "corpus should contain at least one similar pair")
  }

  test("block-pair cosine chunks by byte budget; results invariant to it") {
    import spark.implicits._
    val e = Tables.table(spark, sfDir, "embeddings")
    // a deliberately tiny budget forces many chunks — results must not move
    val tiny = pipeline.AllPairs.embeddingPairs(spark, e, 0.4,
        chunkBytes = 16L << 10)
      .as[(Long, Long, Double)].collect().toSeq
    val oracle = pipeline.AllPairs.embeddingPairsKernel(spark, e, 0.4)
    assert(tiny == oracle, s"chunked n=${tiny.size} oracle n=${oracle.size}")

    // the chunk-count rule itself: payload per chunk stays under budget
    // (64-byte row overhead + 4 bytes per float), and small corpora still
    // get enough chunks to parallelize
    val cb = 64L << 20
    for ((n, dim) <- Seq((1000000L, 128), (50000000L, 768), (123L, 4))) {
      val c = pipeline.AllPairs.chunkCount(n, dim, cb, parallelism = 32)
      val perChunkBytes = (n.toDouble / c) * (64L + 4L * dim)
      assert(perChunkBytes <= cb.toDouble,
        s"n=$n dim=$dim: $perChunkBytes bytes/chunk exceeds the budget")
      assert(c >= 32, s"n=$n dim=$dim: $c chunks under-parallelizes")
    }
    // 2 GB hazard case from the round-8 review: a billion 768-dim vectors
    // must spread over enough chunks that no single row approaches 2 GB
    val cBig = pipeline.AllPairs.chunkCount(1000000000L, 768, cb, 32)
    assert((1000000000.0 / cBig) * (64 + 4 * 768) <= cb.toDouble)

    // the width stat must survive null embeddings (size(NULL) = -1 would
    // shrink the assumed width dim-fold if a null row drove the stat)
    val withNull = e.limit(20).withColumn("embedding",
        when(col("vec_id") === e.select(min("vec_id")).head().getLong(0),
          lit(null)).otherwise(col("embedding")))
    val pairs = pipeline.AllPairs.embeddingPairs(spark, withNull, 0.99)
    pairs.collect() // must not throw; null rows simply produce no pairs

    // the quadratic contract is fenced: past maxRows the exact tier refuses
    val eFence = intercept[IllegalArgumentException](
      pipeline.AllPairs.embeddingPairs(spark, e, 0.4, maxRows = 3))
    assert(eFence.getMessage.contains("approximate tier"), eFence.getMessage)
  }

  test("minhash candidates cover all true jaccard>=0.5 pairs on real corpus") {
    // LSH with 8 bands x 4 rows has collision prob 1-(1-j^4)^8 ≈ 0.96 at
    // j=0.7, ≈0.70 at j=0.5. The corpus' near-dup pairs are j≈0.99 — all
    // must be found.
    val brute = pipeline.DedupQueries.ngramJaccard(spark, sfDir)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = pipeline.DedupQueries.minhashLsh(spark, sfDir)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.subsetOf(lsh), s"missed pairs: ${brute.diff(lsh)}")
  }

  test("minhash band self-join never broadcasts an array-payload side") {
    // At SF30 on the cluster the old array-carrying band join tricked the
    // planner into a BroadcastHashJoin whose build side OOMed the driver
    // (the compressed-scan size estimate is blind to the in-memory width
    // of repeated shingle arrays). The candidate join is id-only, and the
    // no-broadcast guarantee is engine-level (plans.CorpusBroadcastGuard
    // — the query itself carries NO hints). Assert on the EXECUTED plan:
    // at this corpus size broadcast would otherwise be the planner's
    // natural pick, so this test fails if the guard is ever lost. The
    // exact invariant: NO BroadcastHashJoin may build over a collection-
    // typed side (thin id-only sides — the contraction member map, the
    // representative-id fetch — are measured-size and legal to
    // broadcast); the band join and the shingle verify joins stay
    // sort-merge.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    import org.apache.spark.sql.types.{ArrayType, MapType}
    val df = pipeline.DedupQueries.minhashPairs(docsWithPlants)
    df.collect()
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val nested = p match {
        case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
        case q: QueryStageExec        => flatten(q.plan)
        case _                        => Seq.empty
      }
      p +: (p.children.flatMap(flatten) ++ nested)
    }
    val nodes = flatten(df.queryExecution.executedPlan)
    val arrayBuilds = nodes.collect {
      case j: BroadcastHashJoinExec =>
        val build = j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft  => j.left
          case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
        }
        (j, flatten(build).exists(_.output.exists(a =>
          a.dataType.isInstanceOf[ArrayType] || a.dataType.isInstanceOf[MapType])))
    }.collect { case (j, true) => j }
    assert(arrayBuilds.isEmpty,
      s"array-payload side chose broadcast:\n${df.queryExecution.executedPlan}")
    def onBandHash(keys: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
      keys.exists(_.references.exists(_.name == "band_hash"))
    val smjBand = nodes.collect {
      case j: SortMergeJoinExec if onBandHash(j.leftKeys) => j
    }
    assert(smjBand.nonEmpty,
      s"expected a sort-merge band join:\n${df.queryExecution.executedPlan}")
    val smjVerify = nodes.collect {
      case j: SortMergeJoinExec if j.left.output.exists(a =>
        a.dataType.isInstanceOf[ArrayType]) ||
        j.right.output.exists(a => a.dataType.isInstanceOf[ArrayType]) => j
    }
    assert(smjVerify.nonEmpty,
      s"expected sort-merge shingle verify joins:\n${df.queryExecution.executedPlan}")
  }

  test("exact-dup contraction: minhash pairs identical to the uncontracted pipeline") {
    import spark.implicits._
    // Both adaptive regimes: docsWithPlants SKIPS (mass 1 under the floor;
    // its exact pair 9001≡0 must still emerge organically from band
    // collisions), docsWithHeavyPlants CONTRACTS (intra-group j=1.0
    // expansion + cross-group rep-pair expansion must be byte-identical).
    for ((regime, docs) <- bothRegimes) {
      val got = pipeline.DedupQueries.minhashPairs(docs)
        .as[(Long, Long, Double)].collect().sorted.toSeq
      val want = pipeline.DedupQueries.minhashPairsUncontracted(docs)
        .as[(Long, Long, Double)].collect().sorted.toSeq
      assert(got == want,
        s"[$regime] diverged: extra=${got.filterNot(want.contains).take(5)} " +
          s"missing=${want.filterNot(got.contains).take(5)}")
      assert(want.contains((0L, 9001L, 1.0)), s"[$regime] exact pair at j=1.0")
    }
  }

  test("exact-dup contraction: ngram-jaccard pairs identical to uncontracted") {
    import spark.implicits._
    for ((regime, docs) <- bothRegimes; t <- Seq(0.2, 0.8)) {
      val got = pipeline.DedupQueries.ngramPairs(spark, docs, t)
        .as[(Long, Long, Double)].collect().sorted.toSeq
      val want = pipeline.AllPairs
        .jaccardPairs(spark, pipeline.DedupQueries.shingled(docs), 20, t)
        .as[(Long, Long, Double)].collect().sorted.toSeq
      assert(got == want,
        s"[$regime] t=$t diverged: extra=${got.filterNot(want.contains).take(5)} " +
          s"missing=${want.filterNot(got.contains).take(5)}")
    }
  }

  test("exact-dup contraction: simhash pairs identical to uncontracted") {
    import spark.implicits._
    // add short-text docs: identical 1-token texts DO pair under simhash
    // (hamming 0) and must survive contraction's simhash eligibility
    val shorties = Seq((9201L, "tok", "en", "plant", 3L),
                       (9202L, "tok", "en", "plant", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    for ((regime, base) <- bothRegimes) {
      val docs = base.union(shorties)
      val got = pipeline.DedupQueries.simhashPairs(docs)
        .as[(Long, Long, Int)].collect().sorted.toSeq
      val want = pipeline.DedupQueries.simhashPairsUncontracted(docs)
        .as[(Long, Long, Int)].collect().sorted.toSeq
      assert(got == want,
        s"[$regime] diverged: extra=${got.filterNot(want.contains).take(5)} " +
          s"missing=${want.filterNot(got.contains).take(5)}")
      assert(got.contains((9201L, 9202L, 0)),
        s"[$regime] identical short docs must pair at hamming 0")
    }
  }
}
