package graft

import org.apache.spark.sql.functions._

/** Pins the round-11b corpus-assembly tier: repetition filters, stratified
  * mixture sampling, BM25 retrieval, int8-quantized ANN. The DuckDB oracle
  * hash-checks full outputs; these tests pin the properties the oracle
  * can't see — planted-input exactness, determinism under repartitioning,
  * quantization bounds, and ranking agreement with the float baseline. */
class MixtureSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = tmp("mixture_docs")
    rows.map { case (id, text) => (id, text, "en", "src0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("repetition fractions are exact on planted documents") {
    val dir = writeDocs(Seq(
      (1L, "a a b a b c"), // 6 toks, 3 distinct; 2-grams: 'a b' twice of 5
      (2L, "x y z"),       // no 5-grams -> 0.0; unique 3-gram -> top3 = 1.0
      (3L, "q")))          // no 2-grams -> all gram fractions 0.0
    val out = pipeline.TextQueries.repetition(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) == ((0.5, 0.4, 0.25, 0.0)))
    assert(out(2L) == ((0.0, 0.5, 1.0, 0.0)))
    assert(out(3L) == ((0.0, 0.0, 0.0, 0.0)))
  }

  test("repetition flags a degenerate looping document") {
    val dir = writeDocs(Seq(
      (1L, Seq.fill(40)("buy now").mkString(" ")), // pure 2-token loop
      (2L, (1 to 80).map(i => s"w$i").mkString(" ")))) // all-distinct control
    val out = pipeline.TextQueries.repetition(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out(1L) > 0.9, s"looping doc dup_5gram_frac = ${out(1L)}")
    assert(out(2L) == 0.0)
  }

  test("repetition is a pure projection: no exchange in the plan") {
    val plan = pipeline.TextQueries.repetition(spark, sfDir)
      .queryExecution.executedPlan
    assert(!plan.toString.contains("Exchange"), plan.toString)
  }

  test("stratified sample honors the budget and is repartition-stable") {
    val df = pipeline.MixtureQueries.stratifiedSample(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val byRank = rs.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq == (1 to rs.length),
        s"$lang ranks not contiguous")
      assert(byRank.last.getLong(4) <= 10000L, s"$lang busts the budget")
      val cums = byRank.map(_.getLong(4)).toSeq
      assert(cums == cums.sorted, s"$lang cumsum not monotone")
    }
    // Determinism: the sample is a function of content, not of physical
    // layout — rerunning over a differently-partitioned copy of the table
    // must select the same (lang, doc_id) set.
    val dir2 = tmp("strat_copy")
    graft.Tables.table(spark, sfDir, "documents").repartition(7)
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val again = pipeline.MixtureQueries.stratifiedSample(spark, dir2)
      .select("lang", "doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == rows.map(r => (r.getString(0), r.getLong(2))).toSet)
  }

  test("threshold sampler: full keep under budget, adherence over it") {
    // Tiny corpus: total chars far below the 10000 budget -> rate 1.0,
    // every document kept.
    val dir = writeDocs((1L to 20L).map(i => (i, s"doc $i body text")))
    val all = pipeline.MixtureQueries.stratifiedSampleThreshold(spark, dir)
    assert(all.count() == 20)
    assert(all.select(min(col("keep_rate"))).collect()(0).getDouble(0) == 1.0)
    // sf0.01: every stratum exceeds the budget; expected kept bytes per
    // stratum = budget. Accept a generous stochastic band (the kept set is
    // ~20-40 docs per stratum; 3x covers >5 sigma of the binomial).
    val th = pipeline.MixtureQueries
      .stratifiedSampleThreshold(spark, "/root/testdata/sf0.01").collect()
    th.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val bytes = rs.map(_.getLong(2)).sum
      assert(bytes > 10000 / 3 && bytes < 10000 * 3,
        s"$lang kept $bytes chars vs budget 10000")
      assert(rs.forall(r => r.getDouble(3) < r.getDouble(4)))
    }
  }

  test("bm25 rows all match a query term, scores descend, top-k plan") {
    val df = pipeline.MixtureQueries.bm25(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length), "ranks")
    val scores = rows.map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse, "scores not descending")
    assert(scores.last > 0)
    val terms = Set("spark", "join", "window")
    val docs = graft.Tables.table(spark, sfDir, "documents")
      .filter(col("doc_id").isin(rows.map(_.getLong(1)): _*))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val txt = docs(r.getLong(1)).split("\\s+").toSet
      assert(terms.exists(txt.contains), s"doc ${r.getLong(1)} has no query term")
    }
  }

  test("scale plan shapes: top-k never global-sorts, threshold never sorts") {
    // bm25's final ordering must be TakeOrderedAndProject (bounded heap),
    // not a Sort over a range exchange.
    val bm25Plan = pipeline.MixtureQueries.bm25(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(bm25Plan.contains("TakeOrderedAndProject"), bm25Plan)
    // The threshold sampler is the documented no-sort scale path: its plan
    // may aggregate and broadcast but must contain no SortExec at all.
    val thPlan = pipeline.MixtureQueries.stratifiedSampleThreshold(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!thPlan.contains("Sort "), thPlan)
    assert(thPlan.contains("BroadcastHashJoin") || thPlan.contains("BroadcastExchange"),
      s"per-stratum totals must broadcast:\n$thPlan")
    // Winnow fingerprints fuse into the scan: projection + generate only.
    val wPlan = pipeline.TextQueries.winnowFp(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!wPlan.contains("Exchange"), wPlan)
  }

  test("int8 quantization maps the max-|x| lane to ±127 and stays in range") {
    val q = pipeline.SimilarityQueries
      .int8Quantized(graft.Tables.table(spark, sfDir, "embeddings"))
      .select(col("vec_id"),
        array_max(transform(col("qv"), x => abs(x))).as("amax"))
      .collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      assert(r.getLong(1) == 127L,
        s"vec ${r.getLong(0)} max |q| = ${r.getLong(1)}")
    }
  }

  test("int8 ANN ranking agrees with the float brute baseline") {
    val brute = pipeline.SimilarityQueries.annBrute(spark, sfDir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val int8 = pipeline.SimilarityQueries.annInt8(spark, sfDir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    assert(int8.keySet == brute.keySet)
    val overlaps = brute.keys.toSeq.map(q => (int8(q) & brute(q)).size)
    val mean = overlaps.sum.toDouble / overlaps.length / 5.0
    // 64-dim int8 keeps cosine ranks nearly intact; demand strong (not
    // perfect — quantization can swap near-tied neighbors) agreement.
    assert(mean >= 0.8, s"mean top-5 agreement $mean (overlaps $overlaps)")
  }
}
