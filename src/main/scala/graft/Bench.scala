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

    // The driver keeps only the LAST 2000 chars of output (measured: the r8
    // capture's tail is exactly 2000, and sbt appends a ~72-char "[success]"
    // line AFTER our JSON). A 95-query map at 3-decimal seconds is ~2400
    // chars — the head of the line would be truncated out of the tail window
    // and the driver's parse would fail. So the one-line JSON carries ALL
    // per-query timings as integer CENTISECONDS (qunit flags it; ~1950 chars
    // total), and the full 3-decimal record goes to BENCH_FULL.json in the
    // repo for attribution of round-over-round deltas.
    def f3(v: Double): String = f"$v%.3f"
    val fullJson = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${results.size},"queries":$qs,"sf":"$sfDir"}"""
    }
    // full record next to the checkout (cwd), not a hardcoded absolute
    // path — a silently-swallowed write failure elsewhere would lose the
    // per-query attribution record
    for (p <- Seq(
        java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "bench_timings.txt"),
        java.nio.file.Paths.get(sys.props("user.dir"), "BENCH_FULL.json")))
      try java.nio.file.Files.write(p, (fullJson + "\n").getBytes("UTF-8"))
      catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $p: ${e.getMessage}") }
    // Compact line: every query, centisecond ints (negative = query failed).
    val qsCs = results
      .map { case (k, v) => "\"" + k + "\":" + math.round(v * 100).toString }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","n":${results.size},"qunit":"centisec","queries":$qsCs,"sf":"${sfDir.split('/').last}"}""")
  }
}
