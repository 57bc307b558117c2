package graft.testing

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.sources.LegacyFormats

/** The reference's `functional` test dataset, regenerated.
  *
  * The reference's QueryTest fixtures run against a family of generated and
  * hand-written tables (`alltypes*`, `dimtbl`, `jointbl`, `nulltable`, …).
  * This is a clean-room Scala reimplementation of their generation rules —
  * `testdata/src/main/java/.../TestDataGenerator.java:24-97` for the
  * `alltypes` family and `testdata/datasets/functional/
  * functional_schema_template.sql` for schemas — so the reference's golden
  * fixtures run here verbatim with their original expected results.
  *
  * Tables (row counts match the reference exactly):
  *  - `alltypes` — 7300 rows, 24 monthly partitions 2009-01..2010-12,
  *    10 ids/day; no NULLs.
  *  - `alltypessmall` — 100 rows, 4 monthly partitions × 25.
  *  - `alltypestiny` — 8 rows, 4 monthly partitions × 2.
  *  - `alltypesagg` — 10000 rows, 10 daily partitions (2010-01-01..10) ×
  *    1000; NULL tinyint when int_col%10=0, NULL smallint when int_col%100=0,
  *    NULL int/bigint/float/double when int_col=0.
  *  - `alltypesaggnonulls` — same without the NULLs.
  *  - static tables `dimtbl`, `jointbl`, `tinytable`, `tinyinttable`,
  *    `liketbl`, `nulltable`, `nullescapedtable`, `overflow` — the
  *    reference's small CSV fixtures (`testdata/<Name>/data.csv`,
  *    `testdata/data/overflow.txt`), fed through [[LegacyFormats]]'s
  *    delimited-text parser so the text-scanner conventions (escapes, `\N`,
  *    empty-vs-NULL) are exercised from SQL.
  */
object FunctionalDataset {

  private val DateFmt = DateTimeFormatter.ofPattern("MM/dd/yy")

  private val allTypesSchema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("bool_col", BooleanType, nullable = false),
    StructField("tinyint_col", ByteType),
    StructField("smallint_col", ShortType),
    StructField("int_col", IntegerType),
    StructField("bigint_col", LongType),
    StructField("float_col", FloatType),
    StructField("double_col", DoubleType),
    StructField("date_string_col", StringType, nullable = false),
    StructField("string_col", StringType, nullable = false),
    StructField("timestamp_col", TimestampType, nullable = false),
    StructField("year", IntegerType, nullable = false),
    StructField("month", IntegerType, nullable = false)))

  private val aggSchema = StructType(
    allTypesSchema.fields :+ StructField("day", IntegerType, nullable = false))

  /** The reference data's timestamp-fraction quirk, reproduced faithfully:
    * the generator formats the working timestamp with
    * `SimpleDateFormat("....ss.S")`, which prints the MILLISECOND COUNT
    * unpadded — 10 ms renders ".10" — and the loader then re-parses those
    * digits as a decimal FRACTION (.10 s = 100 ms). The stored value is
    * therefore `seconds + 0.<msDigits>`, not `seconds + ms/1000`
    * (TestDataGenerator.java:66,79 + the text load; visible in
    * distinct.test's `2010-01-01 00:02:00.100000000` for a 10 ms offset). */
  private def quirkTimestamp(ts: java.time.LocalDateTime): java.sql.Timestamp = {
    val ms = ts.getNano / 1000000
    val fracNanos =
      if (ms == 0) 0L
      else (ms.toString + "0" * (9 - ms.toString.length)).toLong
    java.sql.Timestamp.valueOf(ts.withNano(0).plusNanos(fracNanos))
  }

  /** One partition of alltypes-shaped rows (TestDataGenerator.java:57-97):
    * `intsPerDay` tuples per day; the working timestamp advances 1 minute +
    * bigint_col milliseconds per tuple and 1 day per day-batch (keeping its
    * time-of-day drift); ids run on across partitions. */
  private def partitionRows(startDay: LocalDate, endExcl: LocalDate,
                            intsPerDay: Int, maxTuples: Int,
                            writeNulls: Boolean, firstId: Int,
                            partCols: Seq[Any]): (Vector[Row], Int) = {
    val rows = Vector.newBuilder[Row]
    var id = firstId
    var ts = startDay.atStartOfDay
    val end = endExcl.atStartOfDay
    var count = 0
    def v(x: Any, isNull: Boolean): Any = if (writeNulls && isNull) null else x
    while (ts.isBefore(end) && count < maxTuples) {
      var i = 0
      while (i < intsPerDay && count < maxTuples) {
        val big = i.toLong * 10
        // double_col is the DECIMAL 10.1*i (one fractional digit) parsed
        // back from text — the loaded tables hold the nearest double to
        // e.g. "60.6", not the binary product 10.1*6 (which is 1 ulp off);
        // visible in distinct.test's `select distinct *` golden rows.
        val tenths = i.toLong * 101
        val dbl = s"${tenths / 10}.${tenths % 10}".toDouble
        rows += Row.fromSeq(Seq(
          id, id % 2 == 0,
          v((i % 10).toByte, i % 10 == 0),
          v((i % 100).toShort, i % 100 == 0),
          v(i, i == 0), v(big, big == 0),
          v((1.1 * i).toFloat, i == 0), v(dbl, i == 0),
          ts.toLocalDate.format(DateFmt), i.toString,
          quirkTimestamp(ts)) ++ partCols)
        id += 1; count += 1
        ts = ts.plusMinutes(1).plusNanos(big * 1000000L)
        i += 1
      }
      ts = ts.plusDays(1)
    }
    (rows.result(), id)
  }

  /** alltypes family (TestDataGenerator.java:24-39): monthly partitions from
    * `2010 - max(numPartitions/12 - 1, 1)`, 10 ids/day. */
  private def allTypesRows(numPartitions: Int, maxTuples: Int): Vector[Row] = {
    val startYear = 2010 - math.max(numPartitions / 12 - 1, 1)
    var start = LocalDate.of(startYear, 1, 1)
    val endDate = LocalDate.of(2010, 12, 31)
    var id = 0
    var months = 0
    val out = Vector.newBuilder[Row]
    while (start.isBefore(endDate) && months < numPartitions) {
      val next = start.plusMonths(1)
      val (rows, nextId) = partitionRows(start, next, 10, maxTuples,
        writeNulls = false, id, Seq(start.getYear, start.getMonthValue))
      out ++= rows; id = nextId
      start = next; months += 1
    }
    out.result()
  }

  /** alltypesagg family (TestDataGenerator.java:41-55): 10 daily partitions
    * of 1000 from 2010-01-01. */
  private def allTypesAggRows(writeNulls: Boolean): Vector[Row] = {
    var day = LocalDate.of(2010, 1, 1)
    val endExcl = day.plusDays(10)
    var id = 0
    val out = Vector.newBuilder[Row]
    while (day.isBefore(endExcl)) {
      val next = day.plusDays(1)
      val (rows, nextId) = partitionRows(day, next, 1000, 1000, writeNulls,
        id, Seq(2010, 1, day.getDayOfMonth))
      out ++= rows; id = nextId
      day = next
    }
    out.result()
  }

  // ---- static fixture tables (testdata/<Name>/data.csv) ----

  private val dimTblLines = Seq(
    "1001,Name1,94611", "1002,Name2,94611", "1003,Name3,94612",
    "1004,Name4,94612", "1005,Name5,94613", "1006,Name6,94613",
    "1007,Name7,94614", "1008,Name8,94614", "1009,Name9,94615",
    "1010,Name10,94615")

  private val joinTblLines = Seq(
    "1001,Name1,94611,5000", "1002,Name2,94611,5000", "1003,Name3,94611,5000",
    "1004,Name4,94611,5000", "1005,Name5,94611,5000", "1106,Name6,94612,5000",
    "1006,Name16,94612,5000", "1006,Name6,94616,5000", "1106,Name16,94612,5000",
    "1106,Name6,94616,5000", "1006,Name16,94616,5000", "1106,Name16,94616,5000",
    "1106,Name6,94612,15000", "1006,Name16,94612,15000", "1006,Name6,94616,15000",
    "1106,Name16,94612,15000", "1106,Name6,94616,15000", "1006,Name16,94616,15000",
    "1106,Name16,94616,15000")

  private val tinyTableLines = Seq("aaaaaaa,bbbbbbb", "ccccc,dddd", "eeeeeeee,f")

  private val tinyIntTableLines = (0 to 9).map(_.toString)

  private val likeTblLines = Seq(
    "one,%one%,n%one%,.*one.*,n.*one.*",
    "two,%two%,n%two%,.*two.*,n.*two.*",
    "three,%three%,n%three%,.*three.*,n.*three.*",
    "four,%four%,n%four%,.*four.*,n.*four.*",
    "five,%five%,n%five%,.*five.*,n.*five.*",
    "six,%six%,n%six%,.*six.*,n.*six.*",
    "seven,%seven%,n%seven%,.*seven.*,n.*seven.*",
    "eight,%eight%,n%eight%,.*eight.*,n.*eight.*",
    "nine,%nine%,n%nine%,.*nine.*,n.*nine.*",
    "ten,%ten%,n%ten%,.*ten.*,n.*ten.*",
    "beginning of line,begin%,not begin%,^begin.*,^not begin.*",
    "end of line,%line,%line end,.*line$,.*line end$",
    "middle of line,%of%,%of,^.*of.*$,.*of$",
    ",%,,.*,X",
    "\\N,%,\\N,.*,X")

  // a='a', b='' (empty, NOT null), c..e=NULL (the \N sentinel); f and g
  // contain literal NUL bytes (testdata/NullTable/data.csv): f="a\0b", g="\0"
  private val nullTableLines = Seq("a,,\\N,\\N,\\N,a\u0000b,\u0000")

  private val overflowLines = Seq(
    "1,2,3,4,5.5,6.6",
    "1000,100000,10000000000000000,10000000000000000000,1e1000000,1e10000",
    "-1000,-100000,-10000000000000000,-10000000000000000000,-1e1000000,-1e10000")

  // decimal_tbl.txt verbatim (d6=1 partition value appended at registration)
  private val decimalTblLines = Seq(
    "1234,2222,1.23456789,.123456789,12345.7890",
    "2345,111,12.3456789,.123456789,3.141",
    "12345,333,123.456789,.123456789,11.22",
    "12345,333,1234.56789,.123456789,0.1",
    "132842,333,12345.6789,.123456789,0.77889")

  /** decimal-tiny.txt's generation rule: row i has c1=i*1.1111 (scale 4),
    * c2=100+i*1.22222 (scale 5), c3=(i%10)/10 (scale 1). */
  private val decimalTinyLines = (0 until 100).map { i =>
    val c1 = java.math.BigDecimal.valueOf(1111L * i, 4)
    val c2 = java.math.BigDecimal.valueOf(10000000L + 122222L * i, 5)
    val c3 = java.math.BigDecimal.valueOf(i % 10, 1)
    s"${c1.toPlainString},${c2.toPlainString},${c3.toPlainString}"
  }

  /** TblWithRaggedColumns/data.csv, pre-split into scanner rows exactly as
    * the reference's text scanner does (`\r`, `\n` and `\r\n` all end a row,
    * so the raw CR CR LF byte run yields one row break plus one empty row):
    * extra fields are dropped, missing fields read NULL, `\\` unescapes. */
  private val raggedLines = Seq(
    "hello,1", "\\\\r\\\\r\\\\n", "", "foo,2,bar", "a,3", "",
    "b,4,,5,6,random", "c", "d,", "ColumnWithCarriageReturn,123",
    "at16bytes", "NoDelimiter,0")

  // UnsupportedTypes/data.csv: the reference-era engine could scan past its
  // unsupported DECIMAL/BINARY columns; this dialect supports them outright.
  private val unsupportedTypesLines = Seq(
    "0,0,aaaa,a,0", "1,1.0,bbbb,b,10",
    "2,1111111111.12345678901234567890,cccc,cccccccccc,20",
    ",2222222222.1234567890,\\N,dddddddddd,,", "4,,eeee,,40")

  // ---- writable tables (the insert fixture family's targets) ----

  /** Shared location for the "text table" pair `nullinsert`/`nullinsert_alt`
    * (insert_null.test): both reference the SAME files — the 5-column table
    * writes them, the 1-column one re-reads the raw lines — so they must be
    * external (DROP keeps the data). Cleaned on JVM exit. */
  private lazy val externalDir: String = {
    val p = java.nio.file.Files.createTempDirectory("graft-functional-ext")
    sys.addShutdownHook {
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
    }
    p.toString
  }

  private val allTypesCols =
    "id INT, bool_col BOOLEAN, tinyint_col TINYINT, smallint_col SMALLINT, " +
      "int_col INT, bigint_col BIGINT, float_col FLOAT, double_col DOUBLE, " +
      "date_string_col STRING, string_col STRING, timestamp_col TIMESTAMP"

  /** Registry of the insert-fixture target tables (reference:
    * `testdata/datasets/functional/functional_schema_template.sql` declares
    * them; `tests/common/impala_test_suite.py:217-235` recreates them on the
    * SETUP `RESET <t>` / `DROP PARTITIONS <t>` rows). Keys are the names the
    * fixtures use (qualified where the fixture qualifies). "Text tables"
    * become CSV datasource tables — this engine's delimited-text surface —
    * with the `\N` null sentinel. */
  private[graft] val writableTables: Map[String, String] = Map(
    "alltypesnopart_insert" ->
      s"CREATE TABLE alltypesnopart_insert ($allTypesCols) USING PARQUET",
    "alltypesinsert" ->
      (s"CREATE TABLE alltypesinsert ($allTypesCols, year INT, month INT) " +
        "USING PARQUET PARTITIONED BY (year, month)"),
    "insert_string_partitioned" ->
      ("CREATE TABLE insert_string_partitioned (s1 STRING, s2 STRING) " +
        "USING PARQUET PARTITIONED BY (s2)"),
    "insert_overwrite_nopart" ->
      "CREATE TABLE insert_overwrite_nopart (col1 INT) USING PARQUET",
    "insert_overwrite_partitioned" ->
      ("CREATE TABLE insert_overwrite_partitioned (col1 INT, col2 INT) " +
        "USING PARQUET PARTITIONED BY (col2)"),
    "nullinsert" ->
      ("CREATE TABLE nullinsert (c1 STRING, c2 STRING, c3 STRING, " +
        "c4 STRING, c5 INT) USING CSV " +
        "OPTIONS (sep ',', nullValue '\\\\N') " +
        s"LOCATION '$externalDir/nullinsert'"),
    "nullinsert_alt" ->
      ("CREATE TABLE nullinsert_alt (line STRING) USING TEXT " +
        s"LOCATION '$externalDir/nullinsert'"),
    "nullformat_custom" ->
      ("CREATE TABLE nullformat_custom (id INT, a BOOLEAN, b STRING, " +
        "c INT, d DOUBLE) USING CSV OPTIONS (nullValue 'xyz')"),
    "jointbl_test" ->
      ("CREATE TABLE jointbl_test (test_id BIGINT, test_name STRING, " +
        "test_zip INT, alltypes_id INT) USING CSV " +
        "OPTIONS (sep ',', nullValue '\\\\N') " +
        s"LOCATION '$externalDir/jointbl_test'"),
    "insert_permutation_test.perm_nopart" ->
      ("CREATE TABLE insert_permutation_test.perm_nopart " +
        "(int_col1 INT, string_col STRING, int_col2 INT) USING PARQUET"),
    "insert_permutation_test.perm_part" ->
      ("CREATE TABLE insert_permutation_test.perm_part " +
        "(int_col1 INT, string_col STRING, p1 INT, p2 STRING) " +
        "USING PARQUET PARTITIONED BY (p1, p2)"),
    "insert_permutation_test.parquet_part" ->
      ("CREATE TABLE insert_permutation_test.parquet_part " +
        "(int_col1 INT, string_col STRING, p1 INT, p2 STRING) " +
        "USING PARQUET PARTITIONED BY (p1, p2)"),
    // load.test targets: external at FIXED locations so the fixture's
    // literal LOAD paths stay valid (the reference uses /test-warehouse).
    "functional.test_load" ->
      (s"CREATE TABLE functional.test_load ($allTypesCols, " +
        "year INT, month INT) USING PARQUET PARTITIONED BY (year, month) " +
        "LOCATION '/tmp/graft-load-fixture/test_load'"),
    "functional.test_load_nopart" ->
      (s"CREATE TABLE functional.test_load_nopart ($allTypesCols) " +
        "USING PARQUET LOCATION '/tmp/graft-load-fixture/test_load_nopart'"))

  /** External registry tables whose RESET also clears the files under their
    * LOCATION (load.test's tables accumulate moved-in files; a reference
    * RESET reloads base data from scratch). NOT the nullinsert pair: those
    * two tables deliberately share one location — RESETting one must not
    * destroy the files the other just wrote. */
  private val wipeLocationOnReset =
    Set("functional.test_load", "functional.test_load_nopart")

  /** Tables whose enclosing database is created by the fixture itself, so
    * they must NOT be pre-created at bootstrap (only recreated on RESET). */
  private val fixtureCreated = Set(
    "insert_permutation_test.perm_nopart",
    "insert_permutation_test.perm_part",
    "insert_permutation_test.parquet_part",
    "functional.test_load",
    "functional.test_load_nopart")

  /** SETUP `RESET t` / `DROP PARTITIONS t`: drop and recreate from the
    * registry. The reference distinguishes the two (recreate vs drop all
    * partitions), but every row of these partitioned tables lives in a
    * partition and external tables never receive DROP PARTITIONS, so
    * recreate is observationally equivalent for the fixture corpus. */
  def resetTable(spark: SparkSession, name: String): Unit = {
    val ddl = writableTables.getOrElse(name,
      throw new IllegalArgumentException(s"no writable table '$name' in registry"))
    spark.sql(s"DROP TABLE IF EXISTS $name")
    if (wipeLocationOnReset(name)) {
      val Loc = "(?s).*LOCATION '([^']+)'.*".r
      ddl match {
        case Loc(path) =>
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
        case _ => ()
      }
    }
    spark.sql(ddl)
  }

  /** `scale_db.num_partitions_1234_blocks_per_partition_1` — the
    * reference's many-partition stress table (IMPALA-887; PlannerTest
    * hdfs.test pruning counts, QueryTest
    * compute-stats-many-partitions.test): 1234 partitions of exactly one
    * 2-byte single-row file each (`1\n`), like the reference's loader. One
    * partition-shuffled insert registers all 1234 catalog partitions and
    * writes one file per directory. */
  def ensureScaleDb(spark: SparkSession): Unit = synchronized {
    if (spark.catalog.databaseExists("scale_db")) return
    spark.sql("CREATE DATABASE scale_db")
    spark.sql("CREATE TABLE scale_db.num_partitions_1234_blocks_per_partition_1 " +
      "(i INT) USING CSV PARTITIONED BY (j INT)")
    spark.range(1, 1235)
      .selectExpr("1 as i", "cast(id as int) as j")
      .repartition(org.apache.spark.sql.functions.col("j"))
      .write.insertInto("scale_db.num_partitions_1234_blocks_per_partition_1")
  }

  /** The `functional` catalog database: the QueryTest fixtures qualify some
    * references (`functional.alltypes`, `functional_parquet.alltypes`, the
    * view family of views.test). Temp views can't be database-qualified, so
    * the base tables are materialized once as managed parquet tables and the
    * reference's view DDL (functional_schema_template.sql:699-753) is
    * replayed over them. */
  def ensureFunctionalDb(spark: SparkSession): Unit = synchronized {
    registerViews(spark)
    if (spark.catalog.databaseExists("functional")) return
    spark.sql("CREATE DATABASE functional")
    // alltypes is partitioned by (year, month) like the reference's table
    // (functional_schema_template.sql:4-33) — CREATE TABLE LIKE must carry
    // the partitioning (load.test) and partition pruning applies.
    spark.table("alltypes").write.partitionBy("year", "month")
      .saveAsTable("functional.alltypes")
    // a partitioned catalog table has no cheap file-sum size — give the
    // CBO real stats so broadcast decisions stay the same as the
    // reference's planner expects (PlannerGoldenSpec)
    spark.sql("ANALYZE TABLE functional.alltypes COMPUTE STATISTICS")
    // the reference's schema template comments alltypes.id ('Add a
    // comment', functional_schema_template.sql) — describe.test pins it
    spark.sql("ALTER TABLE functional.alltypes " +
      "ALTER COLUMN id COMMENT 'Add a comment'")
    // The planner-test external data source (PlannerTest
    // data-source-tables.test): a catalog table whose provider is the DSv2
    // [[graft.sources.AllTypesDataSource]] — the Spark-native analogue of
    // the reference's CREATE TABLE ... PRODUCED BY DATA SOURCE registration
    // (testdata/bin/create-data-source-table.sql).
    spark.sql("CREATE TABLE functional.alltypes_datasource " +
      "USING graft.sources.AllTypesDataSource")
    Seq("alltypessmall", "alltypestiny", "alltypesagg",
        "alltypesaggnonulls", "dimtbl", "jointbl", "emptytable",
        "decimal_tbl", "decimal_tiny", "tinytable").foreach {
      t => spark.table(t).write.saveAsTable(s"functional.$t") }
    // Empty tables the planner fixtures scan; neither has a LOAD section in
    // the reference template (functional_schema_template.sql:528,83).
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType.fromDDL("id BIGINT, name STRING, zip INT"))
      .write.saveAsTable("functional.testtbl")
    spark.table("alltypes").drop("year", "month").limit(0)
      .write.saveAsTable("functional.alltypesnopart")
    // functional_parquet holds the same data in the same format here (this
    // engine's canonical storage IS parquet); views avoid a second copy.
    spark.sql("CREATE DATABASE functional_parquet")
    Seq("alltypes", "alltypesagg", "alltypessmall", "alltypestiny").foreach {
      t => spark.sql(
        s"CREATE VIEW functional_parquet.$t AS SELECT * FROM functional.$t") }
    // functional_avro: the explain-level fixtures scan its alltypes; a view
    // suffices — plan signatures strip the db qualifier, and the avro scan
    // path itself is pinned by FormatsSpec + the avro golden fixtures.
    spark.sql("CREATE DATABASE functional_avro")
    spark.sql(
      "CREATE VIEW functional_avro.alltypes AS SELECT * FROM functional.alltypes")
    // Multi-file non-partitioned alltypesagg (hdfs-scan-node.test scans it
    // both unqualified and as functional.*): 4 files, like the reference's
    // 4-way file split per load.
    spark.table("alltypesaggmultifilesnopart").repartition(4)
      .write.saveAsTable("functional.alltypesaggmultifilesnopart")
    // Partitioned multi-file variant (PlannerTest hdfs.test prunes it by
    // day): 10 day partitions, ~4 files each, like the reference's 4-way
    // per-partition load (functional_schema_template.sql alltypesaggmultifiles).
    spark.table("alltypesagg")
      .filter(org.apache.spark.sql.functions.col("day").isNotNull)
      .repartition(4)
      .write.partitionBy("year", "month", "day")
      .saveAsTable("functional.alltypesaggmultifiles")
    // functional_seq_snap (the seq/snap dimension of the format matrix,
    // use.test): alltypes round-tripped through the snappy-compressed
    // SequenceFile sink + scanner, then materialized so the table can live
    // db-qualified (persistent views cannot reference the scan's temp
    // lineage). The seq+snappy scan itself runs here, at bootstrap.
    spark.sql("CREATE DATABASE functional_seq_snap")
    val seqDir = s"$externalDir/seq_snap_alltypes"
    val at = spark.table("alltypes")
    LegacyFormats.writeSequenceText(at, seqDir, ",",
      codec = Some(classOf[org.apache.hadoop.io.compress.SnappyCodec]))
    LegacyFormats.readSequenceText(spark, seqDir, at.schema, ",")
      .write.partitionBy("year", "month") // partitioned in every format
      .saveAsTable("functional_seq_snap.alltypes") // dimension (PlannerTest insert.test prunes it)
    // functional_rc.old_rcfile_table (schema_template.sql:1178-1185,
    // data/oldrcfile.rc — a pre-Hive-0.9 RCFile): same rows written and
    // re-read through the RCFile text path, then materialized db-qualified.
    spark.sql("CREATE DATABASE functional_rc")
    val rcDir = s"$externalDir/old_rcfile_table"
    val rcSchema = StructType.fromDDL("key INT, value STRING")
    LegacyFormats.writeRcfileText(spark,
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(1, 3, 4, 5, 10).map(
          i => Row(i, s"val_$i")), 1), rcSchema), rcDir)
    LegacyFormats.readRcfileText(spark, rcDir, rcSchema)
      .write.saveAsTable("functional_rc.old_rcfile_table")
    spark.sql("CREATE VIEW functional.alltypes_view AS " +
      "SELECT * FROM functional.alltypes")
    // alltypes_hive_view: in the reference this view's metadata is written
    // by Hive with wrong column info (IMPALA-994); the engine-visible
    // behavior (reads like alltypes) is what the fixture checks.
    spark.sql("CREATE VIEW functional.alltypes_hive_view AS " +
      "SELECT * FROM functional.alltypes")
    spark.sql("CREATE VIEW functional.alltypes_view_sub (x, y, z) AS " +
      "SELECT int_col, string_col, timestamp_col FROM functional.alltypes")
    // view-on-view + parenthesized-predicate view
    // (functional_schema_template.sql:740-755)
    spark.sql("CREATE VIEW functional.view_view AS " +
      "SELECT * FROM functional.alltypes_view")
    spark.sql("CREATE VIEW functional.alltypes_parens AS " +
      "SELECT * FROM functional.alltypes " +
      "WHERE year = 2009 and (int_col < 100 OR bool_col = false) and month = 1")
    spark.sql(
      """CREATE VIEW functional.complex_view
        |(abc COMMENT 'agg', xyz COMMENT 'gby') AS
        |SELECT count(a.bigint_col) AS abc, b.string_col AS xyz
        |FROM functional.alltypesagg a INNER JOIN functional.alltypestiny b
        |ON a.id = b.id WHERE a.bigint_col < 50
        |GROUP BY b.string_col HAVING count(a.bigint_col) > 1
        |ORDER BY b.string_col LIMIT 100""".stripMargin)
  }

  /** Register every functional table as a temp view (idempotent). */
  def registerViews(spark: SparkSession): Unit = synchronized {
    if (spark.catalog.tableExists("alltypesagg")) {
      bootstrapWritables(spark); return
    }

    def reg(name: String, schema: StructType, rows: Seq[Row]): Unit =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
        .createOrReplaceTempView(name)
    def regText(name: String, ddl: String, lines: Seq[String]): Unit =
      LegacyFormats.readDelimitedLines(spark, lines,
        StructType.fromDDL(ddl), ",").createOrReplaceTempView(name)

    reg("alltypes", allTypesSchema, allTypesRows(24, 310))
    reg("alltypessmall", allTypesSchema, allTypesRows(4, 25))
    reg("alltypestiny", allTypesSchema, allTypesRows(4, 2))
    reg("alltypesagg", aggSchema, allTypesAggRows(writeNulls = true))
    reg("alltypesaggnonulls", aggSchema, allTypesAggRows(writeNulls = false))

    regText("dimtbl", "id BIGINT, name STRING, zip INT", dimTblLines)
    regText("jointbl",
      "test_id BIGINT, test_name STRING, test_zip INT, alltypes_id INT",
      joinTblLines)
    regText("tinytable", "a STRING, b STRING", tinyTableLines)
    // jointbl_test data file (test-unmatched-schema.test): the fixture's
    // python driver creates an EXTERNAL table over jointbl's own data file
    // and then evolves the table schema under it with ADD/DROP COLUMNS
    // (tests/query_test/test_scanners_all_table_formats.py:94-120). The
    // 4-field file is written once here; the external table over it lives
    // in [[writableTables]] so SETUP `RESET jointbl_test` restores the
    // original schema.
    val jtDir = java.nio.file.Paths.get(externalDir, "jointbl_test")
    if (!java.nio.file.Files.exists(jtDir)) {
      java.nio.file.Files.createDirectories(jtDir)
      java.nio.file.Files.write(jtDir.resolve("data.csv"),
        joinTblLines.mkString("\n").getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
    }
    regText("tinyinttable", "int_col INT", tinyIntTableLines)
    // zipcode_incomes (schema_template.sql:1129-1141; impala-demo.test):
    // the reference loads a census CSV absent from the tree; the fixture's
    // one query selects zip '59101' and expects ZERO rows, so any
    // deterministic rows with other zips reproduce the contract.
    regText("zipcode_incomes",
      "id STRING, zip STRING, description1 STRING, description2 STRING, " +
        "income INT",
      Seq("8600000US00601,00601,006HI,Puerto Rico,10566",
          "8600000US00602,00602,006HI,Puerto Rico,16800",
          "8600000US10001,10001,NYC,New York,88777"))
    regText("liketbl",
      "str_col STRING, match_like_col STRING, no_match_like_col STRING, " +
        "match_regex_col STRING, no_match_regex_col STRING", likeTblLines)
    val nullDdl = "a STRING, b STRING, c STRING, d INT, e DOUBLE, " +
      "f STRING, g STRING"
    regText("nulltable", nullDdl, nullTableLines)
    regText("nullescapedtable", nullDdl, nullTableLines)
    // emptytable: partitioned, zero rows (schema_template.sql:885-890);
    // greptiny: 100 opaque text lines (hive_benchmark/grepTiny; content is
    // irrelevant to the fixtures, which only count/join it against empties)
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType.fromDDL("field STRING, f2 INT"))
      .createOrReplaceTempView("emptytable")
    regText("greptiny", "field STRING",
      (0 until 100).map(i => s"grep_line_$i"))
    regText("overflow",
      "tinyint_col TINYINT, smallint_col SMALLINT, int_col INT, " +
        "bigint_col BIGINT, float_col FLOAT, double_col DOUBLE",
      overflowLines)

    regText("tblwithraggedcolumns", "str_col STRING, int_col INT", raggedLines)
    // decimal_tbl (schema_template.sql:1269-1287, data/decimal_tbl.txt):
    // 5 rows, single partition d6=1 (the partition value is appended here).
    regText("decimal_tbl",
      "d1 DECIMAL(9,0), d2 DECIMAL(10,0), d3 DECIMAL(20,10), " +
        "d4 DECIMAL(38,38), d5 DECIMAL(10,5), d6 DECIMAL(9,0)",
      decimalTblLines.map(_ + ",1"))
    // decimal_tiny (schema_template.sql:1328-1341, data/decimal-tiny.txt):
    // 100 rows c1=i*1.1111, c2=100+i*1.22222, c3=(i%10)/10.
    regText("decimal_tiny",
      "c1 DECIMAL(10,4), c2 DECIMAL(15,5), c3 DECIMAL(1,1)",
      decimalTinyLines)
    regText("unsupported_types",
      "int_col INT, dec_col DECIMAL(38,18), str_col STRING, " +
        "bin_col STRING, bigint_col BIGINT",
      unsupportedTypesLines)
    // escapechartesttable (schema_template.sql:1057-1075): bool_col data in
    // 10 single-row partitions id=0..9, value alternating true/false.
    spark.createDataFrame(
      spark.sparkContext.parallelize((0 until 10).map(i => Row(i % 2 == 0, i))),
      StructType.fromDDL("bool_col BOOLEAN, id INT"))
      .createOrReplaceTempView("escapechartesttable")
    // testtbl (schema_template.sql:526-534): declared, never loaded — empty.
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType.fromDDL("id BIGINT, name STRING, zip INT"))
      .createOrReplaceTempView("testtbl")
    // widerow (schema_template.sql:823-833, data/widerow.txt): one row whose
    // string_col is exactly 10 MiB; wide-row.test checks only the length,
    // so a deterministic payload is equivalent to the reference's file.
    reg("widerow", StructType(Seq(StructField("string_col", StringType))),
      Seq(Row("w" * 10485760)))
    // alltypesaggmultifiles(nopart): the reference loads alltypesagg's rows
    // split across 4 files per partition (schema_template.sql; generate-
    // schema-statements' multi-file load). The fixtures only aggregate, and
    // the 4-slice RDD behind alltypesagg already scans as multiple input
    // splits, so views carry the same observable semantics.
    spark.table("alltypesagg").createOrReplaceTempView("alltypesaggmultifiles")
    spark.table("alltypesagg").drop("year", "month", "day")
      .createOrReplaceTempView("alltypesaggmultifilesnopart")

    // schema_resolution_test (testdata/avro_schema_resolution/
    // create_table.sql + records{1,2}.avro, reconstructed): two avro files
    // with DIFFERENT writer schemas — one holding none of the table's
    // fields, one holding several in reverse order with int-typed values —
    // resolved against the table's reader schema (by-name matching,
    // reader defaults, int→long/float/double promotion): the reference's
    // hdfs-avro-scanner.cc schema-resolution path.
    val avroResDir = java.nio.file.Paths.get(externalDir,
      "schema_resolution_test")
    if (!java.nio.file.Files.exists(avroResDir)) {
      java.nio.file.Files.createDirectories(avroResDir)
      import org.apache.avro.Schema
      import org.apache.avro.file.DataFileWriter
      import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
      def writeOne(file: String, schemaJson: String,
                   fill: GenericData.Record => Unit): Unit = {
        val schema = new Schema.Parser().parse(schemaJson)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, avroResDir.resolve(file).toFile)
        val rec = new GenericData.Record(schema)
        fill(rec)
        w.append(rec)
        w.close()
      }
      // file_schema1.avsc: a field the table never declares, nothing else
      writeOne("records1.avro",
        """{"name":"a","type":"record","fields":[
          |{"name":"boolean2","type":"boolean"}]}""".stripMargin,
        r => r.put("boolean2", false))
      // file_schema2.avsc: several table fields, reverse order, int-typed
      writeOne("records2.avro",
        """{"name":"a","type":"record","fields":[
          |{"name":"boolean2","type":"boolean"},
          |{"name":"string1","type":"string"},
          |{"name":"double1","type":"int"},
          |{"name":"float1","type":"int"},
          |{"name":"long1","type":"int"},
          |{"name":"int1","type":"int"},
          |{"name":"boolean1","type":"boolean"}]}""".stripMargin,
        { r =>
          r.put("boolean2", false); r.put("string1", "serialized string")
          r.put("double1", 2); r.put("float1", 2); r.put("long1", 2)
          r.put("int1", 2); r.put("boolean1", false)
        })
    }
    // the table's avro reader schema (create_table.sql SERDEPROPERTIES)
    LegacyFormats.readAvro(spark, avroResDir.toString, Some(
      """{"name":"a","type":"record","fields":[
        |{"name":"boolean1","type":"boolean","default":true},
        |{"name":"int1","type":"int","default":1},
        |{"name":"long1","type":"long","default":1},
        |{"name":"float1","type":"float","default":1.0},
        |{"name":"double1","type":"double","default":1.0},
        |{"name":"string1","type":"string","default":"default string"},
        |{"name":"string2","type":["string","null"],"default":""},
        |{"name":"string3","type":["null","string"],"default":null}]}"""
        .stripMargin))
      .createOrReplaceTempView("schema_resolution_test")

    // avro_decimal_tbl (functional_schema_template.sql:1387-1393,
    // data/avro_decimal_tbl.avro reconstructed): name STRING, value
    // DECIMAL(5,2) as avro bytes + `decimal` logical type.
    val avroDecDir = java.nio.file.Paths.get(externalDir, "avro_decimal_tbl")
    if (!java.nio.file.Files.exists(avroDecDir)) {
      java.nio.file.Files.createDirectories(avroDecDir)
      import org.apache.avro.Schema
      import org.apache.avro.file.DataFileWriter
      import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
      val schema = new Schema.Parser().parse(
        """{"name":"a","type":"record","fields":[
          |{"name":"name","type":"string"},
          |{"name":"value","type":{"type":"bytes","logicalType":"decimal",
          |"precision":5,"scale":2}}]}""".stripMargin)
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, avroDecDir.resolve("data.avro").toFile)
      Seq("Tom" -> "234.79", "Beck" -> "77.34", "Snow" -> "55.71",
          "Mary" -> "4.33", "Cluck" -> "5.96", "Tom" -> "12.25",
          "Mary" -> "33.33", "Tom" -> "19.00", "Beck" -> "3.15",
          "Beck" -> "79.90").foreach { case (n, v) =>
        val rec = new GenericData.Record(schema)
        rec.put("name", n)
        rec.put("value", java.nio.ByteBuffer.wrap(
          new java.math.BigDecimal(v).unscaledValue.toByteArray))
        w.append(rec)
      }
      w.close()
    }
    LegacyFormats.readAvro(spark, avroDecDir.toString)
      .createOrReplaceTempView("avro_decimal_tbl")

    // bad_parquet (QueryTest/parquet.test; loaded by create-load-data.sh:
    // 167-178): the reference's three survivor files from old parquet-mr
    // writers — IMPALA-694's 1.2.5-cdh4.5.0 file, a 0-bit-width repeated-
    // values dictionary, and IMPALA-720's multi-row-group file — copied
    // byte-for-byte into test resources. Two of them name their only column
    // `x` where the table says `field`: the reference scanner doesn't care
    // (ordinal resolution, hdfs-parquet-scanner.cc:985) and neither does
    // [[graft.sources.PositionalParquet]], which scans here.
    val badParquetDir = java.nio.file.Paths.get(externalDir, "bad_parquet")
    val badParquetRes = Seq("bad_parquet_data.parquet",
      "repeated_values.parquet", "multiple_rowgroups.parquet")
    if (getClass.getResource(s"/data/bad_parquet/${badParquetRes.head}") != null) {
      if (!java.nio.file.Files.exists(badParquetDir)) {
        java.nio.file.Files.createDirectories(badParquetDir)
        badParquetRes.foreach { f =>
          val in = getClass.getResourceAsStream(s"/data/bad_parquet/$f")
          try java.nio.file.Files.copy(in, badParquetDir.resolve(f))
          finally in.close()
        }
      }
      graft.sources.PositionalParquet.read(spark, badParquetDir.toString,
          StructType.fromDDL("field STRING"))
        .createOrReplaceTempView("bad_parquet")
    }

    // Custom-delimiter text tables (functional_schema_template.sql:755-800;
    // raw files reconstructed byte-for-byte from testdata/data/text-{comma-
    // backslash-newline,dollar-hash-pipe,thorn-ecirc-newline}.txt), read
    // through the parameterized delimited-text scanner: escape char, record
    // terminator, and charset all vary. The thorn/ecirc pair are the
    // extended-ASCII (ISO-8859-1) bytes 0xFE/0xEA.
    val delimSchema =
      StructType.fromDDL("col1 STRING, col2 STRING, col3 INT, col4 INT")
    def rawTextTable(name: String, content: Array[Byte]): String = {
      val d = java.nio.file.Paths.get(externalDir, name)
      if (!java.nio.file.Files.exists(d)) {
        java.nio.file.Files.createDirectories(d)
        java.nio.file.Files.write(d.resolve("data.txt"), content)
      }
      d.toString
    }
    LegacyFormats.readDelimitedText(spark,
        rawTextTable("text_comma_backslash_newline",
          ("one,two,3,4\none\\,one,two,3,4\none\\\\,two,3,4\n" +
            "one\\\\\\,one,two,3,4\none\\\\\\\\,two,3,4\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)),
        delimSchema, ",")
      .createOrReplaceTempView("text_comma_backslash_newline")
    LegacyFormats.readDelimitedText(spark,
        rawTextTable("text_dollar_hash_pipe",
          ("one$two$3$4|one#$one$two$3$4|one##$two$3$4|" +
            "one###$one$two$3$4|one####$two$3$4")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)),
        delimSchema, "$", esc = '#', lineSep = "|")
      .createOrReplaceTempView("text_dollar_hash_pipe")
    LegacyFormats.readDelimitedText(spark,
        rawTextTable("text_thorn_ecirc_newline",
          ("oneþtwoþ3þ4\n" +
            "oneêþoneþtwoþ3þ4\n" +
            "oneêêþtwoþ3þ4\n" +
            "oneêêêþoneþtwoþ3þ4\n" +
            "oneêêêêþtwoþ3þ4\n")
            .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)),
        delimSchema, "þ", esc = 'ê', charset = "ISO-8859-1")
      .createOrReplaceTempView("text_thorn_ecirc_newline")

    // complex_view (functional_schema_template.sql:726-734): an agg-over-join
    // view with renamed columns, used by the with-clause/top-n fixtures.
    spark.sql(
      """SELECT COUNT(a.bigint_col) AS abc, b.string_col AS xyz
        |FROM alltypesagg a INNER JOIN alltypestiny b ON a.id = b.id
        |WHERE a.bigint_col < 50
        |GROUP BY b.string_col HAVING COUNT(a.bigint_col) > 1
        |ORDER BY b.string_col LIMIT 100""".stripMargin)
      .createOrReplaceTempView("complex_view")

    registerMixedFormat(spark)
    bootstrapWritables(spark)
  }

  /** `alltypesmixedformat` (functional_schema_template.sql + the reference's
    * data loading: alltypes year=2009 months 1-3, one file format PER
    * PARTITION — month=1 delimited text, month=2 SequenceFile, month=3
    * RCFile; `fe/.../catalog/HdfsFileFormat.java` models the per-partition
    * format). Spark datasource tables are single-format, so the per-format
    * partition reads are unioned under one view: each branch tags its
    * partition columns as literals, which Catalyst constant-folds against
    * partition predicates — pruning whole branches exactly like partition
    * pruning would. */
  private def registerMixedFormat(spark: SparkSession): Unit = {
    if (spark.catalog.tableExists("alltypesmixedformat")) return
    import org.apache.spark.sql.functions.{col, lit}
    val dir = s"$externalDir/alltypesmixedformat"
    val base = spark.table("alltypes")
      .filter(col("year") === 2009 && col("month").isin(1, 2, 3))
    def part(m: Int) =
      base.filter(col("month") === m).drop("year", "month")
    LegacyFormats.writeDelimitedText(part(1), s"$dir/month=1", ",")
    LegacyFormats.writeSequenceText(part(2), s"$dir/month=2", ",")
    LegacyFormats.writeRcfileText(spark, part(3), s"$dir/month=3", ",")
    val schema11 = StructType(allTypesSchema.fields.dropRight(2))
    def tag(df: org.apache.spark.sql.DataFrame, m: Int) =
      df.withColumn("year", lit(2009)).withColumn("month", lit(m))
    tag(LegacyFormats.readDelimitedText(spark, s"$dir/month=1", schema11, ","), 1)
      .unionByName(tag(LegacyFormats.readSequenceText(
        spark, s"$dir/month=2", schema11, ","), 2))
      .unionByName(tag(LegacyFormats.readRcfileText(
        spark, s"$dir/month=3", schema11, ","), 3))
      .createOrReplaceTempView("alltypesmixedformat")
  }

  /** Pre-create every registry table whose database already exists, so a
    * fixture case may reference one before any RESET ran (the reference's
    * schema template pre-creates them all). */
  private var writablesReady = false
  private def bootstrapWritables(spark: SparkSession): Unit = {
    if (writablesReady) return
    (writableTables.keySet -- fixtureCreated).toSeq.sorted.foreach { t =>
      if (!spark.catalog.tableExists(t)) spark.sql(writableTables(t))
    }
    writablesReady = true
  }
}
