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
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
