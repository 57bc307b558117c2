package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line.
  *
  * Methodology:
  *  - a warmup query first absorbs JVM/codegen/session start (otherwise the
  *    first timed query carries ~5s of one-time cost);
  *  - each query materializes through the `noop` sink — full computation of
  *    every output column, no driver collect, no disk write. `count()`
  *    would let Catalyst prune the projections being measured.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runNoop(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // Warmup: session + codegen + parquet footer caches.
    runNoop("q1_agg")

    val results = SparkEntry.queries.keys.toSeq.sorted.map(n => n -> runNoop(n))
    val total = results.map(_._2).filter(_ >= 0).sum
    spark.stop()

    // The driver keeps only the LAST ~2000 chars of output, and sbt flushes
    // stderr after stdout — so per-query timings must NOT go to the console at
    // all (round 2: the stderr dump displaced the JSON line out of the tail
    // window). Full timings go to a file; the compact JSON line is the only
    // thing printed.
    def f3(v: Double): String = f"$v%.3f"
    try {
      val report = results.map { case (k, v) => f"$k%-26s $v%8.3f s" }.mkString("\n")
      java.nio.file.Files.write(
        java.nio.file.Paths.get("/tmp/bench_timings.txt"),
        (report + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    val headline = Seq(
      "q1_agg", "q3_topn", "q5_join_agg", "q6_filter", "q10_agg_topn",
      "q13_dist", "q14_promo", "q15_top", "q17_avg", "q18_large",
      "q19_disjunct", "q22_anti", "q_join_inner", "q_agg_having",
      "q_topk_per_group", "q_window_rank", "q_events_sessionize",
      "q_dedup_exact", "q_dedup_minhash_lsh", "q_ann_brute", "q_ann_ivf",
      "q_text_quality", "q_doc_fingerprint")
    val byName = results.toMap
    val qs = headline.flatMap(n => byName.get(n).map(v => "\"" + n + "\":" + f3(v)))
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${results.size},"queries":$qs,"sf":"$sfDir"}""")
  }
}
