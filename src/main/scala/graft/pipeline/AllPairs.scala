package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Exact all-pairs similarity joins, formulated as distributed pipelines.
  *
  * Both entry points are *exact* (full recall at the given threshold) and
  * *distributed* — the driver never materializes the corpus; candidate
  * reduction happens with the same bucket-join shapes the approximate
  * variants use ([[DedupQueries.minhashPairs]], [[SimilarityQueries]]):
  *
  *  - [[jaccardPairs]]: prefix-filter inverted index (Bayardo et al.,
  *    "Scaling Up All Pairs Similarity Search", WWW'07; the PPJoin family).
  *    A pair with Jaccard ≥ t must share a shingle within the first
  *    `|s| - ⌈t·|s|⌉ + 1` elements of each hash-sorted shingle set, so the
  *    candidate space is an equi-join on (lang, prefix-shingle) — a plain
  *    shuffle join whose skew is bounded by shingle document-frequency —
  *    followed by one exact merge-intersection verification per candidate.
  *
  *  - [[embeddingPairs]]: block-pair cartesian. The corpus is hashed into
  *    B blocks; each of the B(B+1)/2 block pairs is one work item carrying
  *    two chunks, and the O(n²) arithmetic runs in a primitive-array loop
  *    inside the executor. Payload movement is O(n·B) rows (each block is
  *    shipped once per partner block), NOT the O(n²)-row materialization a
  *    pair-level self-join would pay — the classic communication-optimal
  *    scheme for a distributed cartesian. Exact all-pairs cosine is
  *    inherently O(n²) compute; past the point where that is affordable the
  *    pipeline answer is the approximate tier (LSH / IVF in
  *    [[SimilarityQueries]]), with this exact join applied per candidate
  *    bucket, never to the whole corpus.
  *
  * Numeric parity: accumulation is index-order double arithmetic (identical
  * to [[graft.functions.VectorOps.dotF]] / `jaccardSorted`), and rounding
  * replicates Spark's `round()` on doubles (shortest-decimal BigDecimal,
  * HALF_UP) so results stay bit-identical to the join formulation and the
  * DuckDB oracle.
  */
object AllPairs {

  /** All document pairs in the same `lang` block within ±`lenWindow` tokens
    * whose round6(Jaccard) ≥ threshold, `doc_a < doc_b`. Input frame must
    * carry (doc_id: long, lang: string, n_toks: int, sh_sorted:
    * array<bigint>) — i.e. [[DedupQueries]]'s shingled form.
    *
    * Shape at scale: explode only the PREFIX of each shingle set (for
    * t = 0.2 that is ~83% of shingles; at the 0.8–0.9 thresholds real dedup
    * uses, 10–20%), equi-join on (lang, shingle) to get candidate id pairs
    * (no payload on this shuffle), then join the two sorted-shingle arrays
    * back by id for one codegen'd merge-intersection per candidate. */
  def jaccardPairs(spark: SparkSession, shingled: DataFrame,
                   lenWindow: Int, threshold: Double): DataFrame = {
    val sh = shingled.select(
      col("doc_id"), col("lang"), col("n_toks"), col("sh_sorted"))
    // Prefix-filter length p = n - ceil(t*n) + 1 over the hash-sorted set:
    // two sets with Jaccard >= t must both keep at least one shared element
    // inside their prefixes (dropping the last ceil(t*n)-1 elements removes
    // fewer than the guaranteed overlap).
    // nsh materializes in its OWN projection below the generator: aliased
    // next to posexplode, the optimizer inlines size(sh_sorted) ABOVE the
    // Generate, which then must carry the whole shingle array on every
    // exploded row — O(prefix × set) bytes per document (measured 4× the
    // query). Two-step select keeps the generate's output scalar-only.
    // coalesce makes nsh NON-NULLABLE (sh_sorted is never null for rows
    // that survive shingled()'s floor, so the branch is dead — values are
    // identical). Without it, the position filter's join condition makes
    // InferFiltersFromConstraints derive isnotnull(nsh) and push it to the
    // scan with nsh's DEFINITION inlined — the entire split/n-gram/
    // fnv/sort_array shingling pipeline re-evaluated per row inside the
    // scan filter (measured 4× this query). Non-nullable ⇒ no isnotnull
    // constraint ⇒ no pushed duplicate.
    val withNsh = sh.select(col("doc_id"), col("lang"), col("n_toks"),
      coalesce(size(col("sh_sorted")), lit(0)).as("nsh"), col("sh_sorted"))
    val prefLen = (col("nsh") - ceil(col("nsh") * lit(threshold)) + lit(1))
      .cast("int")
    val pref = withNsh.select(col("doc_id"), col("lang"), col("n_toks"),
      col("nsh"),
      posexplode(slice(col("sh_sorted"), lit(1), prefLen)))
      .withColumnRenamed("col", "shingle")
    val a = pref.select(col("lang"), col("shingle"),
      col("doc_id").as("doc_a"), col("n_toks").as("na"),
      col("nsh").as("nsha"), col("pos").as("pa"))
    val b = pref.select(col("lang"), col("shingle"),
      col("doc_id").as("doc_b"), col("n_toks").as("nb"),
      col("nsh").as("nshb"), col("pos").as("pb"))
    // PPJoin position filter (Xiao et al., "Efficient Similarity Joins for
    // Near Duplicate Detection", WWW'08), round 20 — exact-recall candidate
    // pruning BEFORE the distinct + verify joins. j(a,b) >= t requires
    // overlap o >= t/(1+t)·(|a|+|b|); a shared prefix element at 0-based
    // sorted positions (pa, pb) bounds o <= 1 + min(|a|-pa-1, |b|-pb-1)
    // (every other common element sorts after it in both sets). For a TRUE
    // pair the FIRST common element is a prefix collision (it is the
    // smallest common value, and prefixes hold the smallest values), and at
    // that witness the bound >= o — so keeping pairs where ANY witness
    // passes loses nothing, while candidates that cannot reach t die here
    // as id rows instead of riding the distinct and two array-fetch joins.
    // Threshold arithmetic: verification admits round6(j) >= t, i.e. true
    // j >= t − 5e-7, so the bound tests against that effective threshold,
    // minus a 1e-9 slack for double rounding — both relaxations only ADMIT
    // extra candidates (recall-safe; the exact merge-intersection decides).
    // The bound lives in ONE opaque codegen expression
    // ([[graft.functions.PpjoinPositionOk]]), not spelled out in column
    // arithmetic: as a raw `cast(least(...)+1)+ε >= t·(na+nb)/(1+t)`
    // comparison inside the join condition, Catalyst's constraint
    // propagation / canonicalization over the big expression tree added
    // ~4 s of PLANNING time per build of this query (measured; the
    // execution was unchanged). The opaque predicate contributes a single
    // small constraint and generates one static call.
    val posOk = graft.functions.PpjoinPositionOk(
      col("nsha"), col("pa"), col("nshb"), col("pb"), threshold)
    val cand = a.join(b, Seq("lang", "shingle"))
      .filter(col("doc_a") < col("doc_b") &&
              abs(col("na") - col("nb")) <= lenWindow &&
              posOk)
      .select("doc_a", "doc_b")
      .distinct()
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh_sorted").as("sh_a")),
            "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh_sorted").as("sh_b")),
            "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(VectorOps.jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Hard fence on the exact tier's quadratic contract: above this many
    * vectors the n² arithmetic is no longer an affordable "exact pass" and
    * callers must move to the approximate tier (LSH / IVF) or raise the
    * bound explicitly. 2M vectors ≈ 2·10¹² candidate pairs — the knee past
    * which even a 1000-executor cluster spends hours on arithmetic. */
  val DefaultMaxExactRows: Long = 2000000L

  /** Per-chunk byte budget for [[embeddingPairs]]. Each chunk travels as
    * ONE row, so this must sit far under Spark's 2 GB single-row limit
    * while staying large enough that the inner loop amortizes; 64 MB of
    * packed vectors per work item is both. */
  val DefaultChunkBytes: Long = 64L << 20

  /** Chunk count for n vectors of dim floats: enough chunks that a chunk's
    * packed payload stays under `chunkBytes` (the 2 GB row limit is the
    * hazard), and never fewer than the session can parallelize. Pure —
    * unit-tested directly. */
  private[graft] def chunkCount(n: Long, dim: Int, chunkBytes: Long,
                                parallelism: Int): Int = {
    val bytesPerRow = 64L + 4L * math.max(dim, 1) // id + object headers + floats
    val byteDriven = (n * bytesPerRow + chunkBytes - 1) / chunkBytes
    math.max(math.max(parallelism, 8), byteDriven).toInt
  }

  /** All vector pairs with round6(cosine) ≥ threshold, `vec_a < vec_b`.
    * Input frame must carry (vec_id: long, embedding: array<float>).
    *
    * The corpus is hashed into chunks sized by BYTES ([[chunkCount]]), not
    * by core count — a chunk is one shuffled row, so its payload must stay
    * far below the 2 GB row limit however large the corpus grows. Each
    * (chunk_i ≤ chunk_j) pair is one executor-side work item; no per-pair
    * row is ever shuffled and the driver holds only chunk *indices*. The
    * quadratic COMPUTE contract is fenced by `maxRows`
    * ([[DefaultMaxExactRows]]): past it, callers get an error pointing at
    * the approximate tier instead of a silent week-long job. */
  def embeddingPairs(spark: SparkSession, e: DataFrame,
                     threshold: Double,
                     chunkBytes: Long = DefaultChunkBytes,
                     maxRows: Long = DefaultMaxExactRows): DataFrame = {
    import spark.implicits._
    // a null vector belongs to no pair — and would NPE the dot kernel
    val typed = e.select(col("vec_id"), col("embedding"))
      .where(col("embedding").isNotNull)
      .as[(Long, Array[Float])]
    // one stat pass: corpus size + vector width size the chunking.
    // max(size(...)) rather than first(): size(NULL) is -1, and a null
    // first row would shrink the assumed width ~dim-fold — re-creating the
    // oversized-chunk-row hazard the byte budget exists to fence
    val stats = e.select(count(lit(1)), max(size(col("embedding"))))
      .head()
    val n = stats.getLong(0)
    val dim = if (stats.isNullAt(1)) 1 else math.max(1, stats.getInt(1))
    require(n <= maxRows,
      s"AllPairs.embeddingPairs: $n vectors exceed the exact tier's " +
      s"$maxRows-row fence (O(n²) compute); use the approximate tier " +
      "(SimilarityQueries LSH / IvfAnn) or raise maxRows explicitly")
    val nBlocks = chunkCount(n, dim, chunkBytes,
      spark.sparkContext.defaultParallelism)
    val blocked = typed
      // byteswap64 decorrelates patterned ids (all-even, strided) so chunk
      // payloads stay near the byte budget instead of doubling on a stride
      .groupByKey { case (id, _) =>
        math.floorMod(scala.util.hashing.byteswap64(id), nBlocks.toLong).toInt }
      .mapGroups { (b, it) => (b, it.toArray) }
    val pairIdx = spark.createDataset(
      for { i <- 0 until nBlocks; j <- i until nBlocks } yield (i, j))
      .toDF("bi", "bj")
    val work = pairIdx
      .join(blocked.toDF("bi", "xs"), "bi")
      .join(blocked.toDF("bj", "ys"), "bj")
      .select(col("bi"), col("bj"), col("xs"), col("ys"))
      .as[(Int, Int, Array[(Long, Array[Float])], Array[(Long, Array[Float])])]
    work
      .flatMap { case (bi, bj, xs, ys) =>
        val same = bi == bj
        val nx = xs.map(v => math.sqrt(dotD(v._2, v._2)))
        val ny = if (same) nx else ys.map(v => math.sqrt(dotD(v._2, v._2)))
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var i = 0
        while (i < xs.length) {
          val (ida, va) = xs(i); val na = nx(i)
          var j = if (same) i + 1 else 0
          while (j < ys.length) {
            val (idb, vb) = ys(j)
            val c = round6(dotD(va, vb) / (na * ny(j)))
            if (c >= threshold)
              out += (if (ida < idb) (ida, idb, c) else (idb, ida, c))
            j += 1
          }
          i += 1
        }
        out
      }
      .toDF("vec_a", "vec_b", "cosine")
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Spark `round(x, 6)` semantics for doubles (NaN passes through — callers
    * threshold-filter, and `NaN >= t` is false). */
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

  // --------------------------------------------------------------------
  // Driver-side reference kernels — spec-only cross-check oracles for the
  // distributed pipelines above. Bounded and fail-fast; never registered.
  // --------------------------------------------------------------------

  /** Hard ceiling on what the reference kernels may collect to the driver. */
  private[graft] val MaxCollectRows: Int = 1000000

  private def boundedCollect[T](ds: org.apache.spark.sql.Dataset[T],
                                kernel: String): Array[T] = {
    val rows = ds.limit(MaxCollectRows + 1).collect()
    require(rows.length <= MaxCollectRows,
      s"AllPairs.$kernel: input exceeds the $MaxCollectRows-row envelope; " +
      "this kernel is a test oracle — use the distributed entry point")
    rows
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

  /** Single-threaded all-pairs Jaccard over the same blocked space as
    * [[jaccardPairs]] — the spec oracle. */
  private[graft] def jaccardPairsKernel(
      spark: SparkSession, shingled: DataFrame,
      lenWindow: Int, threshold: Double): Seq[(Long, Long, Double)] = {
    import spark.implicits._
    val rows = boundedCollect(
      shingled.select(col("doc_id"), col("lang"), col("n_toks"), col("sh_sorted"))
        .as[(Long, String, Int, Array[Long])],
      "jaccardPairsKernel")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    for {
      Array(a, b) <- rows.sortBy(_._1).combinations(2)
      if a._2 == b._2 && math.abs(a._3 - b._3) <= lenWindow
    } {
      val j = round6(jaccardSorted(a._4, b._4))
      if (j >= threshold) out += ((a._1, b._1, j))
    }
    out.sortBy(p => (p._1, p._2)).toSeq
  }

  /** Single-threaded all-pairs cosine — the spec oracle for
    * [[embeddingPairs]]. */
  private[graft] def embeddingPairsKernel(
      spark: SparkSession, e: DataFrame,
      threshold: Double): Seq[(Long, Long, Double)] = {
    import spark.implicits._
    val rows = boundedCollect(
      e.select(col("vec_id"), col("embedding"))
        .where(col("embedding").isNotNull).as[(Long, Array[Float])],
      "embeddingPairsKernel").sortBy(_._1)
    val norms = rows.map(r => math.sqrt(dotD(r._2, r._2)))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var i = 0
    while (i < rows.length) {
      var j = i + 1
      while (j < rows.length) {
        val c = round6(dotD(rows(i)._2, rows(j)._2) / (norms(i) * norms(j)))
        if (c >= threshold) out += ((rows(i)._1, rows(j)._1, c))
        j += 1
      }
      i += 1
    }
    out.toSeq
  }
}
