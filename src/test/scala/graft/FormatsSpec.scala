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

  test("text scanner saturates out-of-range integers (string-parser.h cap)") {
    // the reference's parser caps an overflowing integer at the type's
    // min/max (be/src/util/string-parser.h:43-44; overflow.test) while a
    // malformed field stays NULL and float overflow follows IEEE to ±inf
    import org.apache.spark.sql.types.StructType
    val schema = StructType.fromDDL(
      "t TINYINT, s SMALLINT, i INT, b BIGINT, f FLOAT, d DOUBLE")
    val df = sources.LegacyFormats.readDelimitedLines(spark, Seq(
      "1|2|3|4|5.5|6.6",
      "1000|100000|10000000000000000|10000000000000000000|1e1000000|1e10000",
      "-1000|-100000|-10000000000000000|-10000000000000000000" +
        "|-1e1000000|-1e10000",
      // 39+ digits overflow even DECIMAL(38,0): the sign still picks the
      // cap; non-numeric junk parses to NULL as before
      ("9" * 40) + "|junk|+7|-" + ("9" * 40) + "|nope|8.25"), schema)
    val rows = df.collect()
    assert(rows(0).toSeq == Seq(1.toByte, 2.toShort, 3, 4L, 5.5f, 6.6))
    assert(rows(1).toSeq == Seq(Byte.MaxValue, Short.MaxValue, Int.MaxValue,
      Long.MaxValue, Float.PositiveInfinity, Double.PositiveInfinity))
    assert(rows(2).toSeq == Seq(Byte.MinValue, Short.MinValue, Int.MinValue,
      Long.MinValue, Float.NegativeInfinity, Double.NegativeInfinity))
    assert(rows(3).toSeq == Seq(Byte.MaxValue, null, 7, Long.MinValue,
      null, 8.25))
  }

  test("sequencefile round-trip (delimited text payload)") {
    val dir = tmp("graft_seq") + "/data"
    sources.LegacyFormats.writeSequenceText(nation, dir)
    val back = sources.LegacyFormats.readSequenceText(spark, dir, nation.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
           nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("sequencefile round-trip preserves null mid-row fields and quote chars") {
    // Regression (round-3 advice): concat_ws SKIPS null columns, shifting
    // later fields left; and the CSV reader treated a leading '"' as a
    // quote. Both must round-trip verbatim.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("a", StringType),
      StructField("b", StringType)))
    val rows = Seq(
      Row(1, null, "after-null"),       // null mid-row: b must stay in column b
      Row(2, "\"quoted\" start", "x"),  // leading quote char passes through raw
      Row(3, "plain", null))            // trailing null
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val dir = tmp("graft_seq_nulls") + "/data"
    sources.LegacyFormats.writeSequenceText(df, dir)
    val back = sources.LegacyFormats.readSequenceText(spark, dir, schema)
    assert(back.orderBy("k").collect().toSeq == rows)
  }

  test("sequencefile round-trip: separator and backslash inside values, empty vs NULL") {
    // Regression (round-5 advice): a value containing the separator used to
    // shift all later columns on read, and empty string was conflated with
    // NULL. The writer now emits Hive-convention escapes (\| and \\) and the
    // \N null sentinel; the reader reverses both.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("a", StringType),
      StructField("b", StringType)))
    val rows = Seq(
      Row(1, "pipe|inside", "after"),        // separator inside a value
      Row(2, "back\\slash", "x"),            // literal backslash
      Row(3, "", "empty-a-not-null"),        // empty string stays ""
      Row(4, null, "after-null"),            // NULL stays NULL
      Row(5, "\\N", "literal-backslash-N"))  // the 2-char string "\N" is data
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val dir = tmp("graft_seq_esc") + "/data"
    sources.LegacyFormats.writeSequenceText(df, dir)
    val back = sources.LegacyFormats.readSequenceText(spark, dir, schema)
    assert(back.orderBy("k").collect().toSeq == rows)
  }

  test("csv round-trip with bzip2 compression (splittable codec)") {
    // Reference decompress matrix: be/src/util/decompress.cc (gzip, bzip2,
    // snappy, lzo). bzip2 is the splittable one — at 100 TB a non-splittable
    // codec serializes the scan, so this is the codec a large text load uses.
    val dir = tmp("graft_csv_bz2")
    nation.write.mode("overwrite")
      .option("sep", "|").option("compression", "bzip2").option("header", "true")
      .csv(dir)
    assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(".csv.bz2")))
    val back = spark.read
      .option("sep", "|").option("header", "true").schema(nation.schema).csv(dir)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
           nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("csv round-trip with snappy (hadoop codec) compression") {
    val dir = tmp("graft_csv_snappy")
    nation.write.mode("overwrite")
      .option("sep", "|")
      .option("compression", "org.apache.hadoop.io.compress.SnappyCodec")
      .option("header", "true")
      .csv(dir)
    assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(".snappy")))
    val back = spark.read
      .option("sep", "|").option("header", "true").schema(nation.schema).csv(dir)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
           nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("rcfile round-trip (columnar text payload)") {
    val dir = tmp("graft_rc")
    sources.LegacyFormats.writeRcfileText(spark, nation, dir)
    val back = sources.LegacyFormats.readRcfileText(spark, dir, nation.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
           nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("bare delimited-text round-trip (escapes, separator-in-value, NULL)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = tmp("graft_text")
    val schema = StructType(Seq(StructField("k", IntegerType),
      StructField("s", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, "plain"), Row(2, "with|pipe"), Row(3, "back\\slash"),
        Row(4, null), Row(5, ""))),
      schema)
    sources.LegacyFormats.writeDelimitedText(df, dir)
    val back = sources.LegacyFormats.readDelimitedText(spark, dir, schema)
    assert(back.orderBy("k").collect().toSeq == df.orderBy("k").collect().toSeq)
  }

  test("delimited-text custom escape char, record terminator and charset") {
    import org.apache.spark.sql.types._
    // The reference's ROW FORMAT parameterizes all three delimiters
    // (fields terminated by '$' escaped by '#' lines terminated by '|');
    // extended-ASCII delimiters arrive as ISO-8859-1 bytes
    // (delimited-text.test / delimited-latin-text.test).
    val schema =
      StructType.fromDDL("col1 STRING, col2 STRING, col3 INT, col4 INT")
    val dir = tmp("graft_dollar_hash_pipe")
    Files.createDirectories(java.nio.file.Paths.get(dir))
    Files.write(java.nio.file.Paths.get(dir, "data.txt"),
      "one$two$3$4|one#$one$two$3$4|one##$two$3$4|\\N$x$1$2|#N$y$5$6"
        .getBytes("UTF-8"))
    val got = sources.LegacyFormats
      .readDelimitedText(spark, dir, schema, "$", esc = '#', lineSep = "|")
      .collect().map(r => (r.get(0), r.get(1))).toSet
    // '#$' escapes the separator, '##' the escape char; the null sentinel
    // stays literal backslash-N under ANY escape char (Hive null format),
    // while an escaped '#N' decodes to the one-char string "N".
    assert(got == Set(("one", "two"), ("one$one", "two"), ("one#", "two"),
                      (null, "x"), ("N", "y")))

    val latinDir = tmp("graft_latin")
    Files.createDirectories(java.nio.file.Paths.get(latinDir))
    Files.write(java.nio.file.Paths.get(latinDir, "data.txt"),
      "aþbþ1þ2\naêþbþcþ3þ4\n".getBytes("ISO-8859-1"))
    val latin = sources.LegacyFormats
      .readDelimitedText(spark, latinDir, schema, "þ", esc = 'ê',
        charset = "ISO-8859-1")
      .collect().map(_.getString(0)).toSet
    assert(latin == Set("a", "aþb"))
  }

  test("custom record terminator stays splittable; records straddle splits") {
    import org.apache.spark.sql.types._
    // At 100 TB a text table must split per block; Hadoop's record-
    // delimiter reader guarantees a record straddling a split boundary is
    // read exactly once (by the split that contains its START). Force
    // many tiny splits over a '|'-terminated file and check no loss/dup.
    val dir = tmp("graft_split_pipe")
    Files.createDirectories(java.nio.file.Paths.get(dir))
    val n = 5000
    Files.write(java.nio.file.Paths.get(dir, "data.txt"),
      (0 until n).map(i => s"$i$$row_$i").mkString("|").getBytes("UTF-8"))
    val old = spark.sparkContext.hadoopConfiguration
      .get("mapreduce.input.fileinputformat.split.maxsize")
    spark.sparkContext.hadoopConfiguration
      .set("mapreduce.input.fileinputformat.split.maxsize", "4096")
    try {
      val df = sources.LegacyFormats.readDelimitedText(spark, dir,
        StructType.fromDDL("k INT, v STRING"), "$", lineSep = "|")
      assert(df.rdd.getNumPartitions > 1, "expected a multi-split read")
      assert(df.count() == n)
      val ks = df.collect().map(_.getInt(0)).sorted
      assert(ks.toSeq == (0 until n), "records lost or duplicated at split boundaries")
    } finally {
      if (old == null)
        spark.sparkContext.hadoopConfiguration
          .unset("mapreduce.input.fileinputformat.split.maxsize")
      else spark.sparkContext.hadoopConfiguration
        .set("mapreduce.input.fileinputformat.split.maxsize", old)
    }
  }

  test("avro round-trip with a nullable union field") {
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = tmp("graft_avro")
    val schema: Schema = SchemaBuilder.record("nation").fields()
      .requiredInt("n_nationkey")
      .optionalString("n_name") // union {null, string}
      .requiredInt("n_regionkey")
      .endRecord()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(dir, "part-00000.avro"))
    val src = nation.orderBy("n_nationkey").collect()
    src.foreach { r =>
      val rec = new GenericData.Record(schema)
      rec.put("n_nationkey", r.getInt(0))
      rec.put("n_name", if (r.getInt(0) % 2 == 0) r.getString(1) else null)
      rec.put("n_regionkey", r.getInt(2))
      w.append(rec)
    }
    w.close()

    val back = sources.LegacyFormats.readAvro(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.nullable)).toSeq ==
      Seq(("n_nationkey", false), ("n_name", true), ("n_regionkey", false)))
    val rows = back.orderBy("n_nationkey").collect()
    assert(rows.length == src.length)
    rows.zip(src).foreach { case (got, want) =>
      assert(got.getInt(0) == want.getInt(0))
      if (want.getInt(0) % 2 == 0) assert(got.getString(1) == want.getString(1))
      else assert(got.isNullAt(1))
    }
  }

  test("LOAD DATA: moves files into the table dir; OVERWRITE replaces") {
    spark.sql("DROP TABLE IF EXISTS ld_nation")
    nation.write.saveAsTable("ld_nation")
    val extra = tmp("graft_ld")
    nation.write.mode("overwrite").parquet(extra)
    val moved = sources.LoadData.loadData(spark, extra, "ld_nation").moved
    assert(moved > 0)
    assert(spark.table("ld_nation").count() == 2 * nation.count())
    // source files are gone (moved, not copied)
    assert(!new java.io.File(extra).listFiles().exists(_.getName.startsWith("part-")))

    val extra2 = tmp("graft_ld2")
    nation.write.mode("overwrite").parquet(extra2)
    sources.LoadData.loadData(spark, extra2, "ld_nation", overwrite = true)
    assert(spark.table("ld_nation").count() == nation.count())
    spark.sql("DROP TABLE ld_nation")
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
