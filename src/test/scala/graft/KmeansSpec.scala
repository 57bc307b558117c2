package graft

import org.apache.spark.sql.functions._

class KmeansSpec extends SparkSpec {

  test("kmeans assigns every nonzero vector exactly once, to a seed id") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val rows = pipeline.Clustering.kmeans(spark, sfDir).collect()
    assert(rows.length == n, s"expected $n assignments, got ${rows.length}")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length,
      "a vector was assigned twice")
    // cluster ids are drawn from the 8 lowest vec_ids (the seeds)
    val seedIds = emb.select(col("vec_id")).orderBy(col("vec_id"))
      .limit(8).collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(1)).toSet.subsetOf(seedIds))
    // cosine to own centroid is a valid similarity
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.000001 && c <= 1.000001, s"cosine out of range: $c")
    }
  }

  test("kmeans is deterministic across runs and partitionings") {
    val a = pipeline.Clustering.kmeans(spark, sfDir).collect().toSeq
    val b = pipeline.Clustering.kmeans(spark, sfDir).collect().toSeq
    assert(a == b, "two runs diverged")
  }

  test("cluster sampler draws at most the quota per cluster, ranks dense") {
    val rows = pipeline.Clustering.clusterSample(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (c, rs) =>
      assert(rs.length <= 25, s"cluster $c exceeded quota: ${rs.length}")
      val ranks = rs.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to rs.length), s"cluster $c ranks not dense: $ranks")
    }
    // sampled ids are a subset of the full assignment, same cluster
    val assign = pipeline.Clustering.kmeans(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(assign.get(r.getLong(2)).contains(r.getLong(0)),
        s"sampled vec ${r.getLong(2)} not assigned to cluster ${r.getLong(0)}")
    }
  }

  test("kmeans plan: centroids broadcast, no sort-merge join anywhere") {
    // Both assignment passes must score against BROADCAST centroids (K×d —
    // kilobytes at any corpus scale); a sort-merge join would mean the
    // corpus is being shuffled against the centroid set.
    val plan = pipeline.Clustering.kmeans(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("semantic-blocked dedup pairs are a subset of the exact tier's") {
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val blocked = pipeline.Clustering.semanticPairs(spark, sfDir).collect()
    val exact = pipeline.DedupQueries.embeddingCosine(spark, sfDir).collect()
    val exactSet = exact.map(key).toSet
    assert(blocked.forall(r => exactSet.contains(key(r))),
      "blocking must never invent a pair the exact tier lacks")
    // identical cosine for the pairs both tiers emit
    val exactCos = exact.map(r => key(r) -> r.getDouble(2)).toMap
    blocked.foreach(r => assert(r.getDouble(2) == exactCos(key(r))))
    // recall of the high-similarity pairs dedup actually deletes: both
    // endpoints of a near-identical pair share the nearest centroid
    val hi = exact.filter(_.getDouble(2) >= 0.8).map(key)
    if (hi.nonEmpty) {
      val blockedSet = blocked.map(key).toSet
      val recall = hi.count(blockedSet.contains).toDouble / hi.length
      assert(recall == 1.0, s"high-similarity recall $recall < 1")
    }
  }

  test("iterated kmeans: spherical inertia is monotone over the FULL run") {
    // Lloyd's with cosine argmax + mean update is spherical k-means: the
    // inertia Σ(1−cosine) must not increase on ANY round of one training
    // run, observed through the onRound hook (one training, every round —
    // not a maxIters re-train sweep that samples only the first rounds).
    // Tolerance covers only the 6-dp cosine rounding (n · 2e-6).
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val inertias = scala.collection.mutable.ArrayBuffer.empty[Double]
    pipeline.Clustering.trainedCentroidsIter(raw, 8, 40,
      onRound = (_, cents) =>
        inertias += pipeline.Clustering.inertia(raw, cents))
    assert(inertias.size >= 2, s"run converged after ${inertias.size} rounds " +
      "— nothing to compare")
    val eps = raw.count() * 2e-6
    inertias.toSeq.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + eps, s"inertia rose mid-run: $inertias")
    }
  }

  test("iterated kmeans stops at an exact fixpoint, not the round cap") {
    // With a generous cap the loop must land on bit-identical centroids —
    // and adding more allowed rounds past the fixpoint changes nothing.
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def cents(cap: Int): Seq[(Long, Seq[Double])] =
      pipeline.Clustering.trainedCentroidsIter(raw, 8, cap)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    assert(cents(40) == cents(50), "fixpoint not reached or not stable")
  }

  test("kmeans K is a real parameter: k=4 trains at most 4 seed-id clusters") {
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = pipeline.Clustering.trainedCentroidsIter(raw, 4, 2).collect()
    assert(cents.length <= 4 && cents.nonEmpty)
    val seed4 = raw.select(col("vec_id")).orderBy(col("vec_id"))
      .limit(4).collect().map(_.getLong(0)).toSet
    assert(cents.map(_.getLong(0)).toSet.subsetOf(seed4))
  }

  test("kmeans recovers three planted well-separated groups") {
    import spark.implicits._
    val dim = 16
    // Three orthogonal-ish anchors; 30 members each = anchor + small noise.
    def anchor(g: Int): Array[Float] = {
      val a = Array.fill(dim)(0.01f)
      a(g) = 1.0f
      a
    }
    val r = new scala.util.Random(11)
    // id = i*10 + g, so the 8 lowest ids (the seeds) span all 3 groups —
    // each group then owns a same-group seed (cosine ≈ 1 to every member).
    val rows = for (g <- 0 until 3; i <- 0 until 30) yield {
      val v = anchor(g).map(x => x + (r.nextGaussian() * 0.02).toFloat)
      (i * 10L + g, v)
    }
    val dir = tmp("kmeans")
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = pipeline.Clustering.kmeans(spark, dir).collect()
    // With several same-group seeds a group may split among them (noise
    // decides between near-identical centroids) — the meaningful
    // separation property is PURITY: cross-group cosine ≈ 0, so no
    // cluster may ever mix members of different planted groups.
    out.groupBy(_.getLong(1)).foreach { case (c, rs) =>
      val groups = rs.map(r => r.getLong(0) % 10L).distinct
      assert(groups.length == 1,
        s"cluster $c mixes planted groups ${groups.mkString(",")}")
    }
    // and all three groups are represented (none was absorbed elsewhere)
    val groupsSeen = out.map(r => r.getLong(0) % 10L).distinct
    assert(groupsSeen.length == 3)
  }
}
