package graft

import org.apache.spark.sql.functions._
import graft.pipeline.CurationQueries

/** Pins the curation tier: connected-components transitive closure (the
  * fixture corpus only has diameter-1 dup clusters, so the chain case must
  * be planted), decontamination split discipline, PII known answers, and
  * TF-IDF identities. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents closes a chain transitively") {
    // 1-2-3-4 is a path: min-label needs >1 round to reach the far end.
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val got = CurationQueries.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
                       10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("connectedComponents converges on a 150-node path (pointer jumping)") {
    // Diameter 149: one-hop-per-round min-label alone would need 149
    // rounds and silently mislabel under the 64-round cap; the pointer
    // jump makes label reach double per round (~8 rounds here), and
    // non-convergence now throws instead of returning partial labels.
    val n = 150L
    val nodes = (1L to n).toDF("doc_id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = CurationQueries.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got.size == n)
    assert(got.values.forall(_ == 1L), s"stragglers: ${got.filter(_._2 != 1L)}")
  }

  test("planted 129-node chain converges within the doubling bound (round pin)") {
    // Diameter 128 = 2^7. Each round moves labels one hop (neighbour min)
    // and then composes the pointer function with itself (jump), so reach
    // grows ~2× per round: convergence must land in O(log d) rounds, never
    // O(d). The pin fails if a rewrite quietly degrades the jump back to
    // one-hop propagation (which would need ~128 rounds and trip the cap).
    val n = 129L
    val nodes = (1L to n).toDF("doc_id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) =
      CurationQueries.connectedComponentsCounted(nodes, edges)
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got.size == n)
    assert(got.values.forall(_ == 1L), s"stragglers: ${got.filter(_._2 != 1L)}")
    assert(rounds <= 9,
      s"chain of diameter ${n - 1} took $rounds rounds — doubling bound lost")
  }

  test("isolated nodes skip the iteration and still label themselves") {
    // Edge-incident restriction: only nodes that appear in an edge go
    // through the label loop; everything else must come back label = self.
    val nodes = (1L to 100L).toDF("doc_id")
    val edges = Seq((7L, 9L)).toDF("doc_a", "doc_b")
    val got = CurationQueries.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 100)
    assert(got(9L) == 7L)
    assert(got.filter(p => p._1 != 9L).forall(p => p._2 == p._1))
  }

  test("exact-dup contraction: clusters identical to the uncontracted pipeline") {
    val base = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "lang", "text")
    val r0 = base.filter($"doc_id" === 0).head()
    val t0 = r0.getAs[String]("text")
    val l0 = r0.getAs[String]("lang")
    val near = t0.split(" ").zipWithIndex
      .map { case (w, i) => if (i == 1) "SWAPPED" else w }.mkString(" ")
    val plants = Seq(
      // identical-copy group of doc 0 — must contract to one representative
      // (six copies: duplicate pair mass C(7,2)=21, comfortably over the
      // 1% adaptive floor, so this test pins the CONTRACT branch)
      (9001L, l0, t0), (9002L, l0, t0), (9003L, l0, t0),
      (9006L, l0, t0), (9007L, l0, t0), (9008L, l0, t0),
      // near-copy bridging INTO that group (tests group↔group edges)
      (9004L, l0, near),
      // identical text under a DIFFERENT lang — blocked from pairing with
      // doc 0's group (the fingerprint must include lang)
      (9005L, if (l0 == "en") "de" else "en", t0),
      // two identical sub-shingle-floor docs: both must stay singletons
      // (never contracted, never paired)
      (9101L, l0, "xy"), (9102L, l0, "xy"))
      .toDF("doc_id", "lang", "text")
    val docs = base.union(plants)

    // Uncontracted reference: the pre-round-18 shape, verbatim.
    val pairs = pipeline.AllPairs
      .jaccardPairs(spark, pipeline.DedupQueries.shingled(docs), 20, 0.8)
      .select(col("doc_a"), col("doc_b"))
    val labels = CurationQueries.connectedComponents(
      docs.select(col("doc_id")), pairs)
    val sizes = labels.groupBy(col("label"))
      .agg(count(lit(1)).as("cluster_size"))
    val expected = labels.join(sizes, "label")
      .select(col("doc_id"), col("label"), col("cluster_size"),
              (col("doc_id") === col("label")).as("c"))
      .as[(Long, Long, Long, Boolean)].collect().sorted.toSeq

    val got = CurationQueries.dedupClusterFrame(spark, docs)
      .as[(Long, Long, Long, Boolean)].collect().sorted.toSeq
    assert(got == expected,
      s"contraction diverged:\n got=${got.filterNot(expected.contains)}\n " +
        s"want=${expected.filterNot(got.contains)}")
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(9001L)._2 == 0L && byId(9004L)._2 == 0L,
      "identical copies and the bridging near-copy must join doc 0's cluster")
    assert(byId(9005L)._2 == 9005L, "different lang must not merge")
    assert(byId(9101L)._2 == 9101L && byId(9102L)._2 == 9102L &&
      byId(9101L)._3 == 1L,
      "sub-shingle-floor identical docs must stay singletons")
  }

  test("minhash grouped shape: contract branch and artifact probe equal the uncontracted pipeline") {
    // Same planted duplicate-heavy corpus shape as the PPJoin test above,
    // but over the MinHash edge relation (t = 0.2) and BOTH round-19
    // grouped forms: the inline clusterByEdges skeleton (contract branch —
    // dup mass is far over the floor) and the standing-artifact probe
    // (MinhashIndex.clusterIndexed). One deliberate semantic difference
    // from the PPJoin tier: minhash bands ignore lang, so the identical
    // text planted under a DIFFERENT lang is a separate contraction group
    // whose representative still band-collides at j = 1.0 with doc 0's —
    // this pins the split-groups-reconnect-through-reps argument.
    val base = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "lang", "text")
    val r0 = base.filter($"doc_id" === 0).head()
    val t0 = r0.getAs[String]("text")
    val l0 = r0.getAs[String]("lang")
    val plants = Seq(
      (9001L, l0, t0), (9002L, l0, t0), (9003L, l0, t0),
      (9006L, l0, t0), (9007L, l0, t0), (9008L, l0, t0),
      (9005L, if (l0 == "en") "de" else "en", t0),
      (9101L, l0, "xy"), (9102L, l0, "xy"))
      .toDF("doc_id", "lang", "text")
    val docs = base.union(plants)

    // Uncontracted reference: minhash pairs over the raw corpus.
    val pairs = pipeline.DedupQueries.minhashPairsUncontracted(docs)
      .select(col("doc_a"), col("doc_b"))
    val labels = CurationQueries.connectedComponents(
      docs.select(col("doc_id")), pairs)
    val sizes = labels.groupBy(col("label"))
      .agg(count(lit(1)).as("cluster_size"))
    val expected = labels.join(sizes, "label")
      .select(col("doc_id"), col("label"), col("cluster_size"),
              (col("doc_id") === col("label")).as("c"))
      .as[(Long, Long, Long, Boolean)].collect().sorted.toSeq

    val inline = CurationQueries.minhashClusterFrame(spark, docs)
      .as[(Long, Long, Long, Boolean)].collect().sorted.toSeq
    assert(inline == expected,
      s"contracted grouped sweep diverged:\n got=${inline.filterNot(expected.contains)}\n " +
        s"want=${expected.filterNot(inline.contains)}")

    val idxDir = tmp("graft_mh_cluster_idx")
    pipeline.MinhashIndex.buildSignatures(docs, idxDir)
    val probed = pipeline.MinhashIndex
      .clusterIndexed(spark, Seq(idxDir), docs)
      .as[(Long, Long, Long, Boolean)].collect().sorted.toSeq
    assert(probed == expected,
      s"artifact grouped probe diverged:\n got=${probed.filterNot(expected.contains)}\n " +
        s"want=${expected.filterNot(probed.contains)}")

    val byId = inline.map(r => r._1 -> r).toMap
    assert(byId(9001L)._2 == 0L, "identical copies must join doc 0's cluster")
    assert(byId(9005L)._2 == 0L,
      "minhash ignores lang: the cross-lang identical text must merge via its rep's band collision")
    assert(byId(9101L)._2 == 9101L && byId(9101L)._3 == 1L,
      "sub-shingle-floor docs must stay singletons")
  }

  test("adaptive skip branch: trace-dup corpus clusters identical to uncontracted") {
    // ONE exact dup pair (mass 1, under the 1% floor): the cluster
    // pipeline must take the SKIP branch — no member map planned — and
    // still produce the identical assignment, with the dup pair merging
    // ORGANICALLY through its PPJoin candidate (identical shingle sets
    // always pass the prefix filter at any threshold).
    val base = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "lang", "text")
    val r0 = base.filter($"doc_id" === 0).head()
    val docs = base.union(Seq(
      (9501L, r0.getAs[String]("lang"), r0.getAs[String]("text")))
      .toDF("doc_id", "lang", "text"))

    val pairs = pipeline.AllPairs
      .jaccardPairs(spark, pipeline.DedupQueries.shingled(docs), 20, 0.8)
      .select(col("doc_a"), col("doc_b"))
    val labels = CurationQueries.connectedComponents(
      docs.select(col("doc_id")), pairs)
    val sizes = labels.groupBy(col("label"))
      .agg(count(lit(1)).as("cluster_size"))
    val expected = labels.join(sizes, "label")
      .select(col("doc_id"), col("label"), col("cluster_size"),
              (col("doc_id") === col("label")).as("c"))
      .as[(Long, Long, Long, Boolean)].collect().sorted.toSeq

    val result = CurationQueries.dedupClusterFrame(spark, docs)
    val attrs = result.queryExecution.optimizedPlan.collect {
      case p => p.output.map(_.name)
    }.flatten.toSet
    assert(!attrs.contains("rep"),
      s"skip-branch cluster plan carries member-map attributes: $attrs")
    val got = result.as[(Long, Long, Long, Boolean)].collect().sorted.toSeq
    assert(got == expected,
      s"skip branch diverged:\n got=${got.filterNot(expected.contains)}\n " +
        s"want=${expected.filterNot(got.contains)}")
    assert(got.map(r => r._1 -> r).toMap.apply(9501L)._2 == 0L,
      "trace dup pair must still merge on the skip branch")
  }

  test("connectedComponents is orientation-independent") {
    val nodes = Seq(1L, 2L, 3L).toDF("doc_id")
    // Edges deliberately "backwards" (larger id first).
    val edges = Seq((3L, 2L), (2L, 1L)).toDF("doc_a", "doc_b")
    val got = CurationQueries.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("dedupCluster: one canonical per cluster, label is the min member") {
    val out = CurationQueries.dedupCluster(spark, sfDir)
      .select("doc_id", "cluster_id", "cluster_size", "is_canonical")
      .as[(Long, Long, Long, Boolean)].collect()
    val nDocs = Tables.table(spark, sfDir, "documents").count()
    assert(out.length === nDocs)
    out.groupBy(_._2).foreach { case (label, members) =>
      assert(members.count(_._4) === 1, s"cluster $label canonicals")
      assert(members.filter(_._4).head._1 === label)
      assert(members.map(_._1).min === label)
      assert(members.forall(_._3 === members.length))
    }
  }

  test("decontam: eval docs excluded, overlaps positive, rate bounded") {
    val out = CurationQueries.decontam(spark, sfDir)
      .select("doc_id", "n_overlap", "n_grams", "contamination_rate")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall(_._1 % 97 != 0), "eval split must not be scored")
    assert(out.forall(_._2 >= 1))
    assert(out.forall(r => r._4 > 0.0 && r._4 <= 1.0))
    assert(out.forall(r => r._2 <= r._3))
  }

  test("pii: known answers per doc_id residue; clean doc hash = raw hash") {
    val out = CurationQueries.pii(spark, sfDir)
      .select("doc_id", "n_emails", "n_ips", "n_phones", "redacted_md5")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // doc 0: 0 ≡ 0 mod 5, 7 and 11 → one of each.
    assert(out(0L)._2 === 1L); assert(out(0L)._3 === 1L)
    assert(out(0L)._4 === 1L)
    // doc 35: divisible by 5 and 7, not 11.
    assert(out(35L)._2 === 1L); assert(out(35L)._3 === 1L)
    assert(out(35L)._4 === 0L)
    // doc 1: no injection → redaction is the identity on word-soup text.
    assert(out(1L)._2 === 0L && out(1L)._3 === 0L && out(1L)._4 === 0L)
    val rawMd5 = Tables.table(spark, sfDir, "documents")
      .filter($"doc_id" === 1L)
      .select(md5($"text".cast("binary"))).as[String].head()
    assert(out(1L)._5 === rawMd5)
  }

  test("tfidf matches an independent recomputation; tf sums to doc length") {
    val out = CurationQueries.tfidf(spark, sfDir)
    // Independent oracle: plain Scala over the collected fixture corpus.
    val docs = Tables.table(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val toks = docs.map { case (id, txt) =>
      id -> txt.trim.split("\\s+").toSeq }.toMap
    val dfm = toks.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size }
    val n = docs.length.toDouble
    val expected = for {
      (id, ws) <- toks
      (term, cnt) <- ws.groupBy(identity).map { case (t, xs) => t -> xs.size }
    } yield (id, term) ->
      BigDecimal((cnt.toDouble / ws.size) * math.log(n / dfm(term)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = out.select($"doc_id", $"term", $"tfidf")
      .as[(Long, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - expected(k)) < 2e-6, s"$k: $v vs ${expected(k)}") }
    val sums = out.groupBy("doc_id").agg(sum($"tf_count").as("n"))
    val lens = Tables.table(spark, sfDir, "documents")
      .select($"doc_id", size(split(trim($"text"), "\\s+")).as("len"))
    assert(sums.join(lens, "doc_id").filter($"n" =!= $"len").count() === 0)
  }
}
