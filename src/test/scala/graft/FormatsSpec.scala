package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** File-format breadth — the Spark mapping of the reference's scanner/writer
  * matrix (`HdfsFileFormat.java`: TEXT/SEQ/RC/AVRO/PARQUET × compression;
  * scanners `be/src/exec/hdfs-*-scanner.cc`). Spark-native formats covered:
  * parquet (vectorized), csv/text with custom delimiters+escapes+compression
  * (the delimited-text scanner surface), json, orc. Sequence/RCFile remain
  * Hive-connector-level, Avro needs the external spark-avro package — both
  * documented out of the engine core.
  */
class FormatsSpec extends SparkSpec {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private lazy val nation = Tables.table(spark, sfDir, "nation")

  test("csv round-trip with pipe delimiter, escapes and gzip") {
    val dir = tmp("graft_csv")
    nation.write.mode("overwrite")
      .option("sep", "|").option("escape", "\\").option("compression", "gzip")
      .option("header", "true")
      .csv(dir)
    val back = spark.read
      .option("sep", "|").option("escape", "\\").option("header", "true")
      .schema(nation.schema)
      .csv(dir)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
           nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("json round-trip") {
    val dir = tmp("graft_json")
    nation.write.mode("overwrite").json(dir)
    val back = spark.read.schema(nation.schema).json(dir)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
           nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("orc round-trip") {
    val dir = tmp("graft_orc")
    nation.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
           nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("text (single-column line format) round-trip") {
    val dir = tmp("graft_text")
    nation.select(concat_ws("|", col("n_nationkey"), col("n_name"),
      col("n_regionkey")).as("value"))
      .write.mode("overwrite").text(dir)
    val back = spark.read.text(dir)
      .select(split(col("value"), "\\|").as("f"))
      .select(element_at(col("f"), 1).cast("int").as("n_nationkey"),
              element_at(col("f"), 2).as("n_name"),
              element_at(col("f"), 3).cast("int").as("n_regionkey"))
    assert(back.orderBy("n_nationkey").collect().toSeq ==
           nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("malformed csv rows: permissive mode nulls them, FAILFAST raises") {
    // Reference analogue: tests/data_errors/ (alltypeserror tables) — the
    // engine must survive dirty input and surface it, not crash the job.
    val dir = tmp("graft_badcsv")
    Files.write(java.nio.file.Paths.get(dir, "data.csv"),
      java.util.Arrays.asList(
        "1,alpha,10", "2,beta,not_an_int", "3,gamma,30", "junk-row"))
    val schema = "id INT, name STRING, v INT"

    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").csv(dir)
    assert(permissive.count() == 4)
    assert(permissive.filter(col("v").isNull).count() == 2,
      "bad cells/rows must become NULLs in permissive mode")

    intercept[org.apache.spark.SparkException] {
      spark.read.schema(schema).option("mode", "FAILFAST").csv(dir).collect()
    }
  }

  test("parquet filter + column pushdown reaches the scan") {
    val li = Tables.table(spark, sfDir, "lineitem")
      .filter(col("l_quantity") < 5.0)
      .select("l_orderkey", "l_quantity")
    val scanLine = li.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan parquet")).mkString
    assert(scanLine.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,5.0)]"),
      s"filters not pushed: $scanLine")
    assert(scanLine.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned: $scanLine")
  }
}
