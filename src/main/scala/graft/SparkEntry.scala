package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator-inventory registry: one entry per implemented
  * operator/capability from SURVEY §2 (plus the training-pipeline extensions).
  * `oracleSql` carries a DuckDB-equivalent ANSI SQL statement for every query
  * whose semantics are SQL-expressible; the driver hash-compares both results.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.TpchQueries.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.TpchQueries.all ++
      operators.TpchMoreQueries.all ++
      operators.TpchWave3Queries.all ++
      operators.TpcdsQueries.all ++
      operators.TpcdsWave2Queries.all ++
      operators.PerfQueries.all ++
      operators.HiveBenchmarkQueries.all ++
      operators.AsOfJoin.all ++
      operators.JoinQueries.all ++
      operators.SortSetQueries.all ++
      operators.AggQueries.all ++
      operators.ExprQueries.all ++
      operators.WindowQueries.all ++
      operators.GroupingQueries.all ++
      pipeline.PackingQueries.all ++
      pipeline.MixtureQueries.all ++
      pipeline.TextQueries.all ++
      pipeline.DedupQueries.all ++
      pipeline.MinhashIndex.all ++
      pipeline.Utf8Queries.all ++
      pipeline.CurationQueries.all ++
      pipeline.SimilarityQueries.all ++
      pipeline.IvfAnn.all ++
      pipeline.Clustering.all ++
      pipeline.Multimodal.all ++
      sources.FormatQueries.all

  def oracleSql: Map[String, String] =
    operators.TpchQueries.oracle ++
      operators.TpchMoreQueries.oracle ++
      operators.TpchWave3Queries.oracle ++
      operators.TpcdsQueries.oracle ++
      operators.TpcdsWave2Queries.oracle ++
      operators.PerfQueries.oracle ++
      operators.HiveBenchmarkQueries.oracle ++
      operators.AsOfJoin.oracle ++
      operators.JoinQueries.oracle ++
      operators.SortSetQueries.oracle ++
      operators.AggQueries.oracle ++
      operators.ExprQueries.oracle ++
      operators.WindowQueries.oracle ++
      operators.GroupingQueries.oracle ++
      pipeline.PackingQueries.oracle ++
      pipeline.MixtureQueries.oracle ++
      pipeline.TextQueries.oracle ++
      pipeline.DedupQueries.oracle ++
      pipeline.MinhashIndex.oracle ++
      pipeline.Utf8Queries.oracle ++
      pipeline.CurationQueries.oracle ++
      pipeline.SimilarityQueries.oracle ++
      pipeline.Clustering.oracle ++
      pipeline.Multimodal.oracle ++
      sources.FormatQueries.oracle
}
