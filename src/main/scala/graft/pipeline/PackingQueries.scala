package graft.pipeline

import graft.operators.QueryFn
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing: assign documents to fixed-token-budget training bins.
  *
  * LLM training consumes fixed-length sequences; the standard "concat then
  * chunk" packing concatenates documents in a deterministic order and cuts
  * bins every `budget` tokens. Expressed relationally: a running token count
  * per language stream (window cumsum), and each document's bin is the
  * budget-quotient of the tokens *before* it — pure integer arithmetic, so
  * the layout is reproducible on any cluster.
  *
  * Scale notes: the cumsum partitions by `lang` — at 100 TB you'd partition
  * by (lang, shard) where shard = doc_id div N to bound each sorted run, and
  * bin ids become (shard, local_bin); the per-shard plan below is unchanged.
  * The aggregation on (lang, bin) is an ordinary 2-phase hash agg.
  */
object PackingQueries {

  private val Budget = 512 // tokens per training bin

  /** Bin layout summary: documents and token counts per (lang, bin). */
  val packBins: QueryFn = (s, dir) => {
    val d = graft.Tables.table(s, dir, "documents")
    val tok = size(split(trim(col("text")), "\\s+")).as("n_tokens")
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.select(col("lang"), col("doc_id"), tok)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("bin",
        floor((col("cum_tokens") - col("n_tokens")) / lit(Budget.toDouble))
          .cast(LongType))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tokens")).cast(LongType).as("bin_tokens"))
  }
  val packBinsSql: String =
    s"""SELECT lang, bin, count(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
       |FROM (
       |  SELECT lang, doc_id, n_tokens,
       |    CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |                - n_tokens) / $Budget.0) AS BIGINT) AS bin
       |  FROM (SELECT lang, doc_id,
       |          len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
       |        FROM documents))
       |GROUP BY lang, bin""".stripMargin

  val all: Map[String, QueryFn] = Map("q_pack_bins" -> packBins)
  val oracle: Map[String, String] = Map("q_pack_bins" -> packBinsSql)
}
