package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.{ParquetSalvage, PositionalParquet}

/** Ordinal-position parquet resolution + the salvage tier for files whose
  * chunk metadata misstates its extent (reference:
  * hdfs-parquet-scanner.cc:985-996 positional mapping; parquet.test's
  * IMPALA-694/720 files). */
class PositionalParquetSpec extends SparkSpec {

  private def copyRes(dir: String, names: String*): Unit =
    names.foreach { n =>
      val in = getClass.getResourceAsStream(s"/data/bad_parquet/$n")
      try Files.copy(in, Paths.get(dir, n), StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
    }

  test("columns resolve by position across renamed generations") {
    // generation 1 names the columns (a, b); generation 2 renamed them
    // upstream to (x, y). A name-resolving scan reads NULL x/y for the old
    // files; the positional scan must see all rows under the TABLE names.
    val dir = tmp("graft_posgen")
    spark.createDataFrame(Seq((1, "one"), (2, "two")))
      .toDF("a", "b").repartition(1).write.mode("append").parquet(dir)
    spark.createDataFrame(Seq((3, "three")))
      .toDF("x", "y").repartition(1).write.mode("append").parquet(dir)
    val table = StructType.fromDDL("k INT, v STRING")
    val got = PositionalParquet.read(spark, dir, table)
      .orderBy("k").collect().toSeq
    assert(got == Seq(Row(1, "one"), Row(2, "two"), Row(3, "three")))
  }

  test("a file missing trailing table columns reads NULL for them") {
    // hdfs-parquet-scanner.cc:986 — a slot index past the file's last
    // physical column materializes NULL (schema grew after the file was
    // written).
    val dir = tmp("graft_poseof")
    spark.createDataFrame(Seq(Tuple1(7))).toDF("a")
      .repartition(1).write.mode("overwrite").parquet(dir)
    val table = StructType.fromDDL("k INT, added STRING")
    val got = PositionalParquet.read(spark, dir, table).collect().toSeq
    assert(got == Seq(Row(7, null)))
  }

  test("a file with more columns than the table reads the positional prefix") {
    // The dropped-column direction of positional evolution: the reference
    // scanner creates readers for the table's slots only and never touches
    // trailing file columns (hdfs-parquet-scanner.cc:983-997), so a file
    // carrying an extra (since-dropped) column must still read.
    val dir = tmp("graft_poswide")
    spark.createDataFrame(Seq((1, "x"), (2, "y"))).toDF("a", "b")
      .repartition(1).write.mode("overwrite").parquet(dir)
    val got = PositionalParquet.read(spark, dir, StructType.fromDDL("k INT"))
      .orderBy("k").collect().toSeq
    assert(got == Seq(Row(1), Row(2)))
  }

  test("short-written chunk metadata routes to the salvage reader") {
    // repeated_values.parquet declares total_compressed_size=36 while its
    // pages span 49 bytes — parquet-java's size-bounded stream dies in the
    // second page header, the salvage walk reads by value count like the
    // reference scanner. The healthy files in the same directory must keep
    // the stock scan and union in.
    val dir = tmp("graft_salvage")
    copyRes(dir, "repeated_values.parquet", "bad_parquet_data.parquet",
      "multiple_rowgroups.parquet")
    val df = PositionalParquet.read(spark, dir,
      StructType.fromDDL("field STRING"))
    assert(df.where("field = 'parquet'").count() == 4) // 3 salvaged + 1 stock
    assert(df.count() == 1006)
    assert(df.select("field").distinct().count() == 1003)
  }

  test("salvage decodes the 0-bit-width dictionary file exactly") {
    val dir = tmp("graft_salvage_unit")
    copyRes(dir, "repeated_values.parquet")
    val conf = spark.sessionState.newHadoopConf()
    val rows = ParquetSalvage
      .rows(conf, Paths.get(dir, "repeated_values.parquet").toString)
      .toSeq
    // 3 rows, all the single dictionary entry, physical type binary
    // (pre-UTF8-annotation writer)
    assert(rows.map(_.getAs[Array[Byte]](0).toSeq) ==
      Seq.fill(3)("parquet".getBytes("UTF-8").toSeq))
  }

  test("salvage agrees with the stock reader on a healthy file") {
    val dir = tmp("graft_salvage_parity")
    val src = spark.createDataFrame(
      Seq((1, 1.5, "a", true), (2, 2.5, "b", false), (3, 3.5, null, true)))
      .toDF("i", "d", "s", "f")
    src.repartition(1).write.mode("overwrite").option("compression", "none").parquet(dir)
    val file = new java.io.File(dir).listFiles
      .map(_.getPath).filter(_.endsWith(".parquet")).head
    val conf = spark.sessionState.newHadoopConf()
    val salvaged = ParquetSalvage.rows(conf, file).toSeq
    val stock = spark.read.parquet(file).collect().toSeq
    assert(salvaged.toSet == stock.toSet)
  }
}
