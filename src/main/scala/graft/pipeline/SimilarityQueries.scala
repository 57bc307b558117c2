package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{t, QueryFn}

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  *  - [[annBrute]]: exact cosine top-k — the correctness baseline. A
  *    broadcast of the (small) query set against a full scan of the corpus:
  *    one pass, no shuffle of the corpus, per-partition top-k via window.
  *  - [[annLsh]]: random-hyperplane LSH (4 tables × 8 bits). Signatures are
  *    one projection pass; the candidate join keys on (table, bucket), so
  *    at 100 TB the corpus never cross-joins — cost is bucket-collision
  *    volume, tunable by bits/tables. This is the scale path; recall vs
  *    [[annBrute]] is measured in SimilaritySpec.
  *
  * Hyperplane weights are pseudo-random ±1 derived from integer mixing of
  * (table, plane, dim) — deterministic across engines and runs, no RNG
  * state, nothing to ship to executors.
  */
object SimilarityQueries {

  // Codegen'd single-call dot product (graft.functions.DotProductF): same
  // index-order double accumulation as the HOF formulation (bit-identical
  // results, DuckDB oracle unaffected), ~20x faster on all-pairs joins.
  private def dotD(a: Column, b: Column): Column =
    graft.functions.VectorOps.dot(a, b)

  private def normD(a: Column): Column =
    sqrt(graft.functions.VectorOps.dot(a, a))

  /** 8-bit bucket signature of an embedding under hash table `tbl` — the
    * codegen'd [[graft.functions.HyperplaneLsh]] expression (deterministic
    * ±1 hyperplanes from integer mixing of (table, plane, dim); bit-compatible
    * with the interpreted-HOF formulation it replaced, ~20× cheaper/row). */
  private def lshBucket(emb: Column, tbl: Column): Column =
    graft.functions.HyperplaneLsh(emb, tbl)

  private def withNorm(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("embedding"), normD(col("embedding")).as("norm"))
      // a zero-norm vector has no direction: its cosine is 0/0 = NaN, and
      // the two engines rank NaN differently (both sort it ABOVE real
      // similarities) — exclude it here and in the oracles' norm CTE
      .where(col("norm") > 0)

  /** Exact brute-force cosine top-5 for query vectors vec_id < 10. */
  val annBrute: QueryFn = (s, dir) => {
    val e = withNorm(t(s, dir, "embeddings"))
    val q = broadcast(
      e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
                col("norm").as("q_norm")))
    val scored = q.crossJoin(e)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dotD(col("q_emb"), col("embedding")) / (col("q_norm") * col("norm")), 6)
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("query_id"), col("rn"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("rn"))
  }
  val annBruteSql: String =
    """WITH n AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_aggregate(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS norm
      |  FROM embeddings WHERE norm > 0), -- NaN-cosine parity, see withNorm
      |scored AS (
      |  SELECT q.vec_id AS query_id, e.vec_id,
      |    ROUND(list_aggregate(list_transform(range(1, len(q.embedding) + 1),
      |            i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), 'sum')
      |          / (q.norm * e.norm), 6) AS cosine
      |  FROM n q JOIN n e ON q.vec_id < 10 AND e.vec_id != q.vec_id),
      |ranked AS (
      |  SELECT query_id, vec_id, cosine,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |                       ORDER BY cosine DESC, vec_id) AS rn
      |  FROM scored)
      |SELECT query_id, rn, vec_id, cosine FROM ranked WHERE rn <= 5
      |ORDER BY query_id, rn""".stripMargin

  /** LSH-bucketed ANN: same queries, candidates restricted to bucket
    * collisions in any of 4 hash tables, then exact cosine top-5 within
    * candidates. Rows-only for the driver; recall measured in the spec. */
  val annLsh: QueryFn = (s, dir) =>
    lshTopKFrame(t(s, dir, "embeddings"), (0L until 10L), 5)

  /** The LSH ANN pipeline over any (vec_id, embedding) frame —
    * parameterized so specs can measure recall on planted vectors. */
  def lshTopKFrame(embRaw: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val e = withNorm(embRaw)
    val tables = 4
    // array of per-table signatures (not transform-over-sequence: a lambda
    // would drop the codegen'd signature expression back to interpreted eval)
    val sigs = e.select(col("vec_id"), col("embedding"), col("norm"),
      posexplode(array((0 until tables).map(i =>
        lshBucket(col("embedding"), lit(i))): _*)))
      .withColumnRenamed("pos", "tbl")
      .withColumnRenamed("col", "bucket")
    val q = sigs.filter(col("vec_id").isin(queryIds: _*))
      .select(col("tbl"), col("bucket"), col("vec_id").as("query_id"),
              col("embedding").as("q_emb"), col("norm").as("q_norm"))
    val cands = q.join(sigs, Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("q_emb"), col("q_norm"),
              col("embedding"), col("norm"))
      .distinct()
    val scored = cands.select(col("query_id"), col("vec_id"),
      round(dotD(col("q_emb"), col("embedding")) / (col("q_norm") * col("norm")), 6)
        .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("rn"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("rn"))
  }

  val all: Map[String, QueryFn] = Map(
    "q_ann_brute" -> annBrute,
    "q_ann_lsh" -> annLsh)

  val oracle: Map[String, String] = Map(
    "q_ann_brute" -> annBruteSql)
}
