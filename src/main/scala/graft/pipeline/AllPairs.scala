package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Broadcast-block all-pairs verification kernels.
  *
  * The straightforward formulation of an exact pair-similarity pass is a
  * self-join (`a CROSS JOIN b ON a.id < b.id`) with a codegen'd similarity
  * expression — correct, but the join *materializes a row per candidate
  * pair*, copying both payload arrays into each of the O(n²) rows. At
  * sf0.1 that is 12.5M rows × ~0.5 KB of array payload: the shuffle/copy
  * dominates, not the arithmetic.
  *
  * These kernels instead broadcast the full (id, payload) set once — the
  * same data movement a broadcast join would do — and enumerate pairs
  * inside `mapPartitions` with primitive-array loops, emitting only pairs
  * that pass the threshold. Work is distributed by row index, so every
  * executor core holds one copy of the broadcast set and streams through
  * its slice of left rows.
  *
  * Scale envelope: a broadcast set of 10⁶ × 64-dim floats is ~256 MB —
  * the practical ceiling of executor broadcast memory, and exactly the
  * regime where exact all-pairs (10¹² candidate pairs) stops being viable
  * no matter how it is executed. Beyond that these exact kernels are the
  * *verification tier* applied per candidate block from MinHash-LSH /
  * SimHash / IVF (see [[DedupQueries]], [[SimilarityQueries]]), never to
  * the whole corpus.
  *
  * Numeric parity: accumulation is index-order double arithmetic (identical
  * to [[graft.functions.VectorOps.dotF]] / `jaccardSorted`), and rounding
  * replicates Spark's `round()` on doubles (shortest-decimal BigDecimal,
  * HALF_UP) so results stay bit-identical to the join formulation and the
  * DuckDB oracle.
  */
object AllPairs {

  /** Hard ceiling on what these kernels may collect to the driver, matching
    * the documented broadcast envelope (~256 MB of payload). Beyond this the
    * exact all-pairs pass is the wrong tool at any execution strategy — the
    * caller must block first (LSH / SimHash / IVF) and verify per block. */
  val MaxCollectRows: Int = 1000000

  /** Collect at most [[MaxCollectRows]]+1 rows (the `limit` bounds driver
    * memory — no extra counting pass) and fail fast if the input exceeds the
    * envelope instead of OOM-ing the driver. */
  private def boundedCollect[T](ds: org.apache.spark.sql.Dataset[T],
                                kernel: String): Array[T] = {
    val rows = ds.limit(MaxCollectRows + 1).collect()
    require(rows.length <= MaxCollectRows,
      s"AllPairs.$kernel: input exceeds the $MaxCollectRows-row broadcast " +
      "envelope; block with MinHash-LSH/SimHash/IVF first and run the exact " +
      "kernel per candidate block")
    rows
  }

  /** Spark `round(x, 6)` semantics for doubles (NaN passes through — callers
    * threshold-filter, and `NaN >= t` is false, matching the old join
    * formulation where round(NaN, 6) stayed NaN and was dropped). */
  def round6(v: Double): Double =
    if (java.lang.Double.isNaN(v)) Double.NaN
    else java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def dotD(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0d
    var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  private def jaccardSorted(a: Array[Long], b: Array[Long]): Double = {
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (a.length + b.length - inter).toDouble
  }

  /** All vector pairs with round6(cosine) ≥ threshold, `vec_a < vec_b`.
    * Input frame must carry (vec_id: long, embedding: array<float>). */
  def embeddingPairs(spark: SparkSession, e: DataFrame, threshold: Double): DataFrame = {
    import spark.implicits._
    val rows = boundedCollect(
      e.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])],
      "embeddingPairs").sortBy(_._1)
    val ids = rows.map(_._1)
    val vecs = rows.map(_._2)
    val norms = vecs.map(v => math.sqrt(dotD(v, v)))
    val bc = spark.sparkContext.broadcast((ids, vecs, norms))
    val slices = math.max(spark.sparkContext.defaultParallelism, 1)
    spark.createDataset(ids.indices)
      .repartition(slices)
      .mapPartitions { it =>
        val (ids, vecs, norms) = bc.value
        it.flatMap { a =>
          val va = vecs(a); val na = norms(a); val ida = ids(a)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          var b = a + 1
          while (b < ids.length) {
            val c = round6(dotD(va, vecs(b)) / (na * norms(b)))
            if (c >= threshold) out += ((ida, ids(b), c))
            b += 1
          }
          out
        }
      }
      .toDF("vec_a", "vec_b", "cosine")
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** All document pairs in the same `lang` block within ±`lenWindow` tokens
    * whose round6(Jaccard) ≥ threshold, `doc_a < doc_b`. Input frame must
    * carry (doc_id: long, lang: string, n_toks: int, sh_sorted:
    * array<bigint>) — i.e. [[DedupQueries]]'s shingled form. Entries are
    * pre-sorted by token count per block, so the length window is a
    * binary-searched range instead of a full block scan. */
  def jaccardPairs(spark: SparkSession, shingled: DataFrame,
                   lenWindow: Int, threshold: Double): DataFrame = {
    import spark.implicits._
    val rows = boundedCollect(
      shingled.select(col("doc_id"), col("lang"), col("n_toks"), col("sh_sorted"))
        .as[(Long, String, Int, Array[Long])],
      "jaccardPairs")
    // Per-lang block, sorted by (n_toks, doc_id): window = contiguous range.
    val blocks: Map[String, Array[(Long, Int, Array[Long])]] =
      rows.groupBy(_._2).map { case (lang, rs) =>
        lang -> rs.map(r => (r._1, r._3, r._4)).sortBy(r => (r._2, r._1))
      }
    val bc = spark.sparkContext.broadcast(blocks)
    val slices = math.max(spark.sparkContext.defaultParallelism, 1)
    // Work items carry their own shingles; the broadcast serves the "other
    // side" lookups (same total volume either way).
    val work = rows.map(r => (r._2, r._1, r._3, r._4)).toSeq
    spark.createDataset(work)
      .repartition(slices)
      .mapPartitions { it =>
        val blocks = bc.value
        it.flatMap { case (lang, docId, nToks, mySh) =>
          val block = blocks(lang)
          // First block index with n_toks >= nToks - lenWindow.
          var lo = 0; var hi = block.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (block(mid)._2 < nToks - lenWindow) lo = mid + 1 else hi = mid
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          var k = lo
          while (k < block.length && block(k)._2 <= nToks + lenWindow) {
            val (otherId, _, otherSh) = block(k)
            if (otherId > docId) {
              val j = round6(jaccardSorted(mySh, otherSh))
              if (j >= threshold) out += ((docId, otherId, j))
            }
            k += 1
          }
          out
        }
      }
      .toDF("doc_a", "doc_b", "jaccard")
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
