package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Batch SQL executor for the differential-testing harness
  * (tools/fuzz.py — the Spark half of the reference's random-query
  * discrepancy searcher, `tests/comparison/discrepancy_searcher.py`).
  *
  * Args: `<sfDir> <queryFile> <outDir>`; queryFile holds one query per
  * line as `name\tSQL`. Each result is written to `outDir/<name>` as
  * parquet; failures are recorded in `outDir/errors.txt` as `name\tmessage`
  * (a failure is a legitimate differential outcome, not a crash).
  */
object SqlRunner {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, queryFile, outDir) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ui.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // The dialect-function surface (strleft/nvl/zeroifnull/date-arith
    // families) is part of the fuzzed grammar — register it like any
    // engine-owned session would.
    functions.GraftFunctions.register(spark, overrideBuiltins = true)
    Engine.openCatalog(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    val errors = new StringBuilder
    Files.readAllLines(Paths.get(queryFile)).forEach { line =>
      val Array(name, sql) = line.split("\t", 2)
      try spark.sql(sql).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        errors.append(s"$name\t${Option(e.getMessage).getOrElse(e.toString).replaceAll("\\s+", " ").take(300)}\n")
      }
    }
    Files.writeString(Paths.get(s"$outDir/errors.txt"), errors.toString)
    spark.stop()
  }
}
