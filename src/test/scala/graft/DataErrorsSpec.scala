package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.LegacyFormats

/** The reference's data-errors suite mapped to this engine
  * (`tests/data_errors/test_data_errors.py` over
  * the `testdata/workloads/functional-query/queries/DataErrorsTest`
  * fixtures):
  * a malformed cell becomes NULL on the permissive scan path while the
  * rest of the row survives, across the text, SequenceFile and RCFile
  * scanners. The reference also streams a per-record error LOG
  * (abort_on_error=0) — an Impala runtime feature with no analogue here;
  * its RESULTS sections (which cells survive) are the portable assertion
  * and are pinned verbatim.
  *
  * Test data is the reference's AllTypesError / AllTypesErrorNoNulls rows
  * verbatim (`testdata/AllTypesError*&#47;090{1,2,3}.txt`). The tables
  * declare no escape character, so the raw backslash in row 30's `t\rue`
  * is DATA (a boolean parse failure), not an escape — the text reads pass
  * an escape char that cannot occur.
  */
class DataErrorsSpec extends SparkSpec {

  private val schema = StructType.fromDDL(
    "id INT, bool_col BOOLEAN, tinyint_col TINYINT, smallint_col SMALLINT, " +
      "int_col INT, bigint_col BIGINT, float_col FLOAT, double_col DOUBLE, " +
      "date_string_col STRING, string_col STRING, timestamp_col TIMESTAMP")

  // testdata/AllTypesError/0901.txt + 0902.txt + 0903.txt, verbatim
  private val errorLines = Seq(
    "0,,,0,0,0,0.000000,0.000000,01/01/09,0,0",
    "1,errfalse,,1,1,10,1.000000,10.100000,01/01/09,1,1999-10-10",
    "2,true,err2,,2,20,2.000000,20.200000,01/01/09,2,1999-10-10 90:10:10",
    "3,false,3,err3,,30,3.000000,30.300000,01/01/09,3,2002-14-10 00:00:00",
    "4,true,4,4,err4,,4.000000,40.400000,01/01/09,4,1970-01-01 00:00:00",
    "5,false,5,5,5,err50,,50.500000,01/01/09,5,1970-01-01 00:00:00",
    "6,true,6,6,6,60,err6.000000,,01/01/09,6,1970-01-01 00:00:00",
    "7,,,7,7,70,7.000000,err70.700000,01/01/09,7,1970-01-01 00:00:00",
    "8,false,,,8,80,8.000000,80.800000,01/01/09,8,1970-01-01 00:00:00",
    "9,errtrue,err9,err9,err9,err90,err9.000000,err90.900000,01/01/09,9,0000-01-01 00:00:00",
    "10,,,,0,0,0.000000,0.000000,02/01/09,0,2009-01-01 00:00:00",
    "11,false,,,,10,1.000000,10.100000,02/01/09,1,2009-01-01 00:00:00",
    "12,true,2,,,,2.000000,20.200000,02/01/09,2,2009-01-01 00:00:00",
    "13,false,3,3,,,xyz3.000000,xyz30.300000,02/01/09,3,2009-01-01 00:00:00",
    "14,true,4,4,4,40,,,02/01/09,4,2009-01-01 00:00:00",
    "15,false,xyz5,5,5,50,5.000000,50.500000,02/01/09,5,0009-01-01 00:00:00",
    "16,,,,,,,,02/01/09,6,0",
    "17,false,7,7,7,70,7.000000,xyz70.700000,02/01/09,7,2009-01-01 00:00:00",
    "18,true,8,8,8,80,8.000000,80.800000,02/01/09,8,2009-01-01 00:00:00",
    "19,false,9,9,9,90,9.000000,90.900000,02/01/09,9,2009-01-01 00:00:00",
    "20,true,0,0,0,0,0.000000,0.000000,03/01/09,0,2020-10-10 10:10:10.123",
    "21,false,1,1,1,10,1.000000,10.100000,03/01/09,1,2020-20-10 10:10:10.123",
    "22,true,2,2,2,20,2.000000,20.200000,03/01/09,2,2020-10-40 10:10:10.123",
    "23,false,3,abc3,3,30,3.000000,30.300000,03/01/09,3,2020-10-10 60:10:10.123",
    "24,true,4,4,4,40,4.000000,40.400000,03/01/09,4,2020-10-10 10:70:10.123",
    "25,false,5,5,abc5,50,5.000000,50.500000,03/01/09,5,2020-10-10 10:10:10.123",
    "26,true,6,6,6,60,6.000000,60.600000,03/01/09,6,2020-10-10 10:10:10.123",
    "27,false,abc7,7,7,70,7.000000,70.700000,03/01/09,7,2020-10-10 10:10:10.123",
    "28,true,8,8,8,80,8.000000,80.800000,03/01/09,8,2020-10-10 10:10:10.123",
    "29,false,9,9,abc9,90,9.000000,90.900000,03/01/09,9,2020-10-10 10:10:10.123",
    "30,t\\rue,err30,err30,err30,err300,err30..000000,err300.900000,01/01/10,10,0000-01-01 00:00:00")

  /** `DataErrorsTest/hdfs-scan-node-errors.test` case 1 RESULTS, verbatim:
    * `select id, bool_col, tinyint_col, smallint_col from alltypeserror`. */
  private val expected4Col = Seq(
    "0,NULL,NULL,0", "1,NULL,NULL,1", "2,true,NULL,NULL", "3,false,3,NULL",
    "4,true,4,4", "5,false,5,5", "6,true,6,6", "7,NULL,NULL,7",
    "8,false,NULL,NULL", "9,NULL,NULL,NULL", "10,NULL,NULL,NULL",
    "11,false,NULL,NULL", "12,true,2,NULL", "13,false,3,3", "14,true,4,4",
    "15,false,NULL,5", "16,NULL,NULL,NULL", "17,false,7,7", "18,true,8,8",
    "19,false,9,9", "20,true,0,0", "21,false,1,1", "22,true,2,2",
    "23,false,3,NULL", "24,true,4,4", "25,false,5,5", "26,true,6,6",
    "27,false,NULL,7", "28,true,8,8", "29,false,9,9", "30,NULL,NULL,NULL")

  private def render4(r: Row): String =
    Seq(r.get(0), r.get(1), r.get(2), r.get(3))
      .map(v => if (v == null) "NULL" else v.toString).mkString(",")

  // escape '' never occurs in the data → backslashes are data
  private def errorDf = LegacyFormats.readDelimitedLines(
    spark, errorLines, schema, ",", '')

  test("text scanner: malformed cells null out, rows survive (4-col case)") {
    val got = errorDf
      .select("id", "bool_col", "tinyint_col", "smallint_col")
      .collect().sortBy(_.getInt(0)).map(render4).toSeq
    assert(got == expected4Col)
  }

  test("sequencefile scanner: same malformed-cell semantics through the container") {
    // hdfs-sequence-scan-errors.test runs the same workload through the
    // sequence container; build the container from the RAW lines so the
    // malformed text reaches the shared payload parser unmodified
    val dir = tmp("graft_dataerr_seq")
    // saveAsSequenceFile requires a nonexistent output directory
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.sparkContext.parallelize(errorLines)
      .map(l => (org.apache.hadoop.io.NullWritable.get(), l))
      .saveAsSequenceFile(dir)
    val got = LegacyFormats
      .readSequenceText(spark, dir, schema, ",", esc = '')
      .select("id", "bool_col", "tinyint_col", "smallint_col")
      .collect().sortBy(_.getInt(0)).map(render4).toSeq
    assert(got == expected4Col)
  }

  test("rcfile scanner: same malformed-cell semantics through the container") {
    // hdfs-rcfile-scan-node-errors.test: the raw cells ride the columnar
    // container (writeRcfileText escapes, the read unescapes — the
    // malformed text round-trips byte-identically into the cast)
    val dir = tmp("graft_dataerr_rc")
    val strSchema = StructType(schema.map(f =>
      StructField(f.name, StringType)))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(errorLines.map(l =>
        Row.fromSeq(l.split(",", -1).toIndexedSeq))),
      strSchema)
    LegacyFormats.writeRcfileText(spark, raw, dir, ",")
    val got = LegacyFormats.readRcfileText(spark, dir, schema, ",")
      .select("id", "bool_col", "tinyint_col", "smallint_col")
      .collect().sortBy(_.getInt(0)).map(render4).toSeq
    assert(got == expected4Col)
  }

  test("null-pattern matrix across all numeric/bool columns (nonulls rows)") {
    // hdfs-scan-node-errors.test case 2: each malformed cell from the
    // AllTypesErrorNoNulls matrix nulls exactly its own column
    val lines = Seq(
      "1,errfalse,1,1,1,10,1.000000,10.100000,01/01/09,1,1990-00-01 10:10:10",
      "2,true,err2,2,2,20,2.000000,20.200000,01/01/09,2,2012-03-22 11:20:01.123",
      "3,false,3,err3,3,30,3.000000,30.300000,01/01/09,3,2012-03-22 11:20:01.123",
      "4,true,4,4,err4,40,4.000000,40.400000,01/01/09,4,2012-03-22 11:20:01.123",
      "5,false,5,5,5,err50,5.000000,50.500000,01/01/09,5,2012-03-22 11:20:01.123",
      "6,true,6,6,6,60,err6.000000,60.600000,01/01/09,6,2012-03-22 11:20:01.123",
      "7,false,7,7,7,70,7.000000,err70.700000,01/01/09,7,2012-03-22 11:20:01.123",
      "9,errtrue,err9,err9,err9,err90,err9.000000,err90.900000,01/01/09,9,2012-03-22 11:20:01.123",
      "13,false,3,3,3,30,xyz3.000000,xyz30.300000,02/01/09,3,2012-03-22 11:20:01.123")
    val df = LegacyFormats.readDelimitedLines(spark, lines, schema, ",",
      '')
    val nullCols = df.collect().map { r =>
      r.getInt(0) -> schema.fieldNames.zipWithIndex
        .collect { case (n, i) if r.isNullAt(i) => n }.toSet
    }.toMap
    // the reference flags row 1's month-00 timestamp too (its ERRORS list)
    assert(nullCols(1) == Set("bool_col", "timestamp_col"))
    assert(nullCols(2) == Set("tinyint_col"))
    assert(nullCols(3) == Set("smallint_col"))
    assert(nullCols(4) == Set("int_col"))
    assert(nullCols(5) == Set("bigint_col"))
    assert(nullCols(6) == Set("float_col"))
    assert(nullCols(7) == Set("double_col"))
    assert(nullCols(9) == Set("bool_col", "tinyint_col", "smallint_col",
      "int_col", "bigint_col", "float_col", "double_col"))
    assert(nullCols(13) == Set("float_col", "double_col"))
    // surviving cells keep their values
    val r5 = df.filter("id = 5").head()
    assert(r5.getShort(3) == 5 && r5.getFloat(6) == 5.0f)
  }

  test("timestamp error matrix (nonulls rows): bad forms null, date-only is midnight") {
    val ts = Seq(
      "1,1990-00-01 10:10:10", // month 00 — reference flags TO TIMESTAMP
      "2,1999-10-10 90:10:10", // hour 90
      "3,2002-14-10 00:00:00", // month 14
      "4,2020-10-40 10:10:10.123", // day 40
      "5,2020-10-10 60:10:10.123", // hour 60
      "6,11:20:01.123 2012-03-22 ", // time-first — flagged by the reference
      "7,2012-03-22", // date-only — the reference accepts, midnight
      "8,2012-03-22 11:20:01.123") // well-formed
    val df = LegacyFormats.readDelimitedLines(spark, ts,
      StructType.fromDDL("id INT, t TIMESTAMP"), ",", '')
    val byId = df.collect().map(r => r.getInt(0) -> r.get(1)).toMap
    (1 to 6).foreach(i => assert(byId(i) == null, s"row $i should be NULL"))
    assert(byId(7) == java.sql.Timestamp.valueOf("2012-03-22 00:00:00"))
    assert(byId(8) == java.sql.Timestamp.valueOf("2012-03-22 11:20:01.123"))
  }

  test("ragged rows: short rows pad trailing NULLs, long rows drop extras") {
    // the reference scanner's column-count mismatch policy
    // (test-unmatched-schema.test / tblwithraggedcolumns): fewer fields
    // than columns → missing trailing columns are NULL; more → ignored
    val df = LegacyFormats.readDelimitedLines(spark,
      Seq("1,a,10", "2,b", "3", "4,d,40,EXTRA,EXTRA2"),
      StructType.fromDDL("id INT, s STRING, v INT"), ",", '')
    val got = df.collect().sortBy(_.getInt(0)).map(r =>
      (r.getInt(0), r.get(1), r.get(2))).toSeq
    assert(got == Seq((1, "a", 10), (2, "b", null), (3, null, null),
      (4, "d", 40)))
  }

  test("parse failure nulls, overflow saturates (string-parser.h split)") {
    // the reference distinguishes a malformed numeric (error + NULL) from
    // an out-of-range one (capped at the type bound, no error)
    val df = LegacyFormats.readDelimitedLines(spark,
      Seq("1,err30,1000", "2,30,-1000"),
      StructType.fromDDL("id INT, a TINYINT, b TINYINT"), ",", '')
    val got = df.collect().sortBy(_.getInt(0)).map(r =>
      (r.get(1), r.get(2))).toSeq
    assert(got == Seq((null, Byte.MaxValue), (30.toByte, Byte.MinValue)))
  }

  test("empty fields: NULL for numerics, empty string (not NULL) for strings") {
    // nulltable's convention (functional_schema_template): only the \N
    // sentinel means SQL NULL for a string column; an empty field is ''
    val df = LegacyFormats.readDelimitedLines(spark,
      Seq("1,,,\\N"),
      StructType.fromDDL("id INT, n INT, s STRING, z STRING"), ",")
    val r = df.head()
    assert(r.isNullAt(1), "empty numeric field is NULL")
    assert(r.getString(2) == "", "empty string field is '' not NULL")
    assert(r.isNullAt(3), "the \\N sentinel is NULL")
  }

  test("single-byte-charset bytes survive via charset; bad UTF-8 never kills the scan") {
    // data_errors' bad-encoding class: extended-ASCII bytes read with the
    // declared charset decode exactly; the same bytes read as UTF-8 are
    // replaced, never a crash (the reference logs and continues)
    val dir = tmp("graft_dataerr_enc")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val bytes = "1,café\n2,süd\n"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-00000.txt"), bytes)
    val s = StructType.fromDDL("id INT, s STRING")
    val latin = LegacyFormats.readDelimitedText(spark, dir, s, ",",
      charset = "ISO-8859-1", lineSep = "\n")
      .collect().sortBy(_.getInt(0)).map(_.getString(1)).toSeq
    assert(latin == Seq("café", "süd"))
    val utf8 = LegacyFormats.readDelimitedText(spark, dir, s, ",")
      .collect().sortBy(_.getInt(0))
    assert(utf8.length == 2, "undecodable bytes must not drop rows")
    assert(utf8.forall(!_.isNullAt(1)))
  }
}
