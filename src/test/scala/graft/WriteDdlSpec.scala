package graft

import org.apache.spark.sql.functions._

/** INSERT / partitioned-write / CTAS / DDL surface — the Spark mapping of
  * the reference's `HdfsTableSink` (dynamic partitioning + overwrite,
  * `be/src/exec/hdfs-table-sink.h:30-65`) and DDL statements (SURVEY §2.11).
  */
class WriteDdlSpec extends SparkSpec {

  test("partitioned write + partition pruning on read") {
    val dir = tmp("graft_part")
    val li = Tables.table(spark, sfDir, "lineitem")
      .withColumn("ship_year", year(col("l_shipdate")))
    li.write.mode("overwrite").partitionBy("ship_year").parquet(dir)

    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    // partition pruning: the filter must land in PartitionFilters, not Data.
    val pruned = back.filter(col("ship_year") === 1996)
    val expected = li.filter(col("ship_year") === 1996).count()
    assert(pruned.count() == expected)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(ship_year"),
      s"partition filter not pushed:\n$plan")
  }

  test("dynamic partition overwrite replaces only touched partitions") {
    val dir = tmp("graft_dyn")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val df = spark.range(10)
      .select(col("id"), (col("id") % 2).as("p"))
    df.write.mode("overwrite").partitionBy("p").parquet(dir)
    // Overwrite only p=0 with a single row.
    spark.range(1).select(lit(100L).as("id"), lit(0L).as("p"))
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.filter(col("p") === 1).count() == 5, "untouched partition lost")
    assert(back.filter(col("p") === 0).count() == 1, "overwrite incomplete")
  }

  test("CTAS, INSERT INTO/OVERWRITE, and DDL statement surface") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_test")
    spark.sql("DROP TABLE IF EXISTS graft_test.nation_ctas")
    Tables.registerViews(spark, sfDir)

    // CTAS
    spark.sql(
      """CREATE TABLE graft_test.nation_ctas USING parquet AS
        |SELECT n_nationkey, n_name, n_regionkey FROM nation""".stripMargin)
    assert(spark.table("graft_test.nation_ctas").count() == 25)

    // INSERT INTO appends
    spark.sql(
      """INSERT INTO graft_test.nation_ctas
        |VALUES (99, 'ATLANTIS', 0)""".stripMargin)
    assert(spark.table("graft_test.nation_ctas").count() == 26)

    // INSERT OVERWRITE replaces
    spark.sql(
      """INSERT OVERWRITE TABLE graft_test.nation_ctas
        |SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_regionkey = 0""".stripMargin)
    assert(spark.table("graft_test.nation_ctas").count() == 5)

    // ALTER TABLE ADD COLUMNS
    spark.sql("ALTER TABLE graft_test.nation_ctas ADD COLUMNS (note STRING)")
    assert(spark.table("graft_test.nation_ctas").columns.contains("note"))

    // SHOW / DESCRIBE / EXPLAIN
    assert(spark.sql("SHOW TABLES IN graft_test").collect()
      .exists(_.getString(1) == "nation_ctas"))
    assert(spark.sql("DESCRIBE graft_test.nation_ctas").collect()
      .exists(_.getString(0) == "n_name"))
    assert(spark.sql("EXPLAIN SELECT * FROM graft_test.nation_ctas")
      .head().getString(0).contains("Scan"))

    // COMPUTE STATS analogue feeds the CBO (reference: ComputeStatsStmt)
    spark.sql("ANALYZE TABLE graft_test.nation_ctas COMPUTE STATISTICS")
    val stats = spark.table("graft_test.nation_ctas")
      .queryExecution.optimizedPlan.stats
    assert(stats.rowCount.exists(_.longValue == 5), s"stats: $stats")

    spark.sql("DROP TABLE graft_test.nation_ctas")
    spark.sql("DROP DATABASE graft_test")
  }

  /** The reference's tpch workload insert file
    * (`testdata/workloads/tpch/queries/insert_parquet.test`): INSERT
    * OVERWRITE the whole orders table into a parquet LIKE-table, then pin
    * that distinct/grouped aggregates over the COPY agree with the source
    * — a full write→read round trip at workload scale. The reference pins
    * absolute SF1 counts; this corpus is driver-generated, so the port
    * pins source↔copy parity (the actual invariant) plus the
    * OVERWRITE-idempotence and INSERT-INTO-doubling contracts. o_comment /
    * o_shippriority do not exist in this corpus; o_orderpriority and
    * o_orderstatus carry the distinct/group cases. */
  test("tpch insert_parquet: full-table INSERT OVERWRITE round-trips every aggregate") {
    Engine.openCatalog(spark, sfDir)
    spark.sql("DROP TABLE IF EXISTS orders_insert_test")
    // the reference spelling: LIKE <table> STORED AS <fmt> (lowered by the
    // dialect to LIKE .. USING parquet; the raw Spark parse would land on
    // the unwritable Hive-serde path)
    spark.sql("CREATE TABLE orders_insert_test LIKE orders STORED AS PARQUET")
    try {
      spark.sql("INSERT OVERWRITE TABLE orders_insert_test SELECT * FROM orders")
      def agg(table: String): Seq[Seq[Any]] = Seq(
        spark.sql(s"SELECT count(*), count(distinct o_orderkey), " +
          s"count(distinct o_orderstatus), count(distinct o_orderdate) FROM $table")
          .collect()(0).toSeq,
        spark.sql(s"SELECT o_orderpriority FROM $table GROUP BY 1 ORDER BY 1")
          .collect().map(_.getString(0)).toSeq,
        spark.sql(s"SELECT o_orderstatus, count(1) FROM $table GROUP BY 1 ORDER BY 1")
          .collect().map(_.toSeq).toSeq)
      val src = agg("orders")
      assert(agg("orders_insert_test") == src)
      // OVERWRITE again: idempotent, not additive
      spark.sql("INSERT OVERWRITE TABLE orders_insert_test SELECT * FROM orders")
      assert(agg("orders_insert_test") == src)
      // INSERT INTO: rows double, distincts do not
      spark.sql("INSERT INTO TABLE orders_insert_test SELECT * FROM orders")
      val doubled = agg("orders_insert_test")
      val srcCounts = src(0); val dblCounts = doubled(0)
      assert(dblCounts(0) == srcCounts(0).asInstanceOf[Long] * 2)
      assert(dblCounts.drop(1) == srcCounts.drop(1)) // distinct counts unchanged
      assert(doubled(1) == src(1))
    } finally spark.sql("DROP TABLE IF EXISTS orders_insert_test")
  }

  test("CTAS with STORED AS places the provider before AS, not in the query") {
    // regression: the dialect rewrite once located the 'column list' at the
    // first '(' of the statement, splicing USING into a parenthesized
    // select expression of a CTAS
    spark.sql("DROP TABLE IF EXISTS ctas_stored_as")
    spark.sql("CREATE TABLE ctas_stored_as STORED AS PARQUET AS " +
      "SELECT count(*) AS c, max(id) AS m FROM range(10)")
    val r = spark.table("ctas_stored_as").head()
    assert(r.getLong(0) > 0 && !r.isNullAt(1))
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("ctas_stored_as"))
    assert(meta.provider.exists(_.equalsIgnoreCase("parquet")))
    spark.sql("DROP TABLE ctas_stored_as")
  }

  test("SHOW TABLE STATS types date partitions and the null sentinel") {
    spark.sql("DROP TABLE IF EXISTS dated_parts")
    spark.sql("CREATE TABLE dated_parts (v INT, d DATE) USING parquet " +
      "PARTITIONED BY (d)")
    spark.sql("INSERT INTO dated_parts VALUES " +
      "(1, DATE'2024-01-01'), (2, DATE'2024-02-01'), (3, CAST(NULL AS DATE))")
    val rows = spark.sql("SHOW TABLE STATS dated_parts").collect()
    // 3 partitions + total row; date values typed, null partition NULL
    assert(rows.length == 4)
    val dates = rows.dropRight(1).map(r =>
      if (r.isNullAt(0)) null else r.getDate(0))
    assert(dates.contains(java.sql.Date.valueOf("2024-01-01")))
    assert(dates.contains(null))
    spark.sql("DROP TABLE dated_parts")
  }

  test("SHOW TABLE STATS on a missing table parses; the error is deferred") {
    // output resolution is lazy: parsePlan must not need the catalog (or
    // even an active session) — the missing-table error belongs to
    // analysis/execution, not parsing.
    val plan = spark.sessionState.sqlParser
      .parsePlan("SHOW TABLE STATS graft_no_such_table")
    assert(plan.isInstanceOf[graft.plans.GraftShowTableStatsCommand])
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SHOW TABLE STATS graft_no_such_table").collect()
    }
    assert(e.getMessage.toLowerCase.contains("table"))
  }

  test("CREATE TABLE LIKE <table> and LIKE parquet FILE (schema from footer)") {
    // Reference: CreateTableLikeStmt + CreateTableLikeFileStmt
    // (fe/src/main/cup/sql-parser.y:614-655).
    Tables.registerViews(spark, sfDir)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_ddl")
    spark.sql("DROP TABLE IF EXISTS graft_ddl.base")
    spark.sql("DROP TABLE IF EXISTS graft_ddl.like_tbl")
    spark.sql("DROP TABLE IF EXISTS graft_ddl.like_file")
    spark.sql(
      """CREATE TABLE graft_ddl.base USING parquet AS
        |SELECT n_nationkey, n_name, n_regionkey FROM nation""".stripMargin)

    spark.sql("CREATE TABLE graft_ddl.like_tbl LIKE graft_ddl.base")
    assert(spark.table("graft_ddl.like_tbl").schema ==
           spark.table("graft_ddl.base").schema)
    assert(spark.table("graft_ddl.like_tbl").count() == 0,
      "LIKE creates an empty table, data is not copied")

    val schema = sources.Ddl.createTableLikeFile(
      spark, "graft_ddl.like_file", s"$sfDir/nation.parquet")
    assert(spark.table("graft_ddl.like_file").schema.fieldNames.toSeq ==
           Tables.table(spark, sfDir, "nation").schema.fieldNames.toSeq)
    assert(schema.fieldNames.contains("n_nationkey"))
    assert(spark.table("graft_ddl.like_file").count() == 0)

    Seq("base", "like_tbl", "like_file").foreach(t =>
      spark.sql(s"DROP TABLE graft_ddl.$t"))
    spark.sql("DROP DATABASE graft_ddl")
  }

  test("ALTER TABLE ADD/DROP PARTITION, partition SET LOCATION, SHOW PARTITIONS") {
    // Reference: AlterTableAddPartitionStmt / AlterTableDropPartitionStmt /
    // AlterTableSetLocationStmt + SHOW PARTITIONS (sql-parser.y:549-607).
    spark.sql("DROP TABLE IF EXISTS graft_parts")
    spark.range(10).select(col("id"), (col("id") % 2).as("p"))
      .write.partitionBy("p").format("parquet").saveAsTable("graft_parts")

    assert(spark.sql("SHOW PARTITIONS graft_parts").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("p=0", "p=1"))

    // ADD PARTITION with an explicit LOCATION holding pre-existing files
    val extra = tmp("graft_addpart")
    spark.range(3).select(col("id")).write.mode("overwrite").parquet(extra)
    spark.sql(s"ALTER TABLE graft_parts ADD PARTITION (p=7) LOCATION '$extra'")
    assert(spark.sql("SHOW PARTITIONS graft_parts").count() == 3)
    assert(spark.table("graft_parts").filter(col("p") === 7).count() == 3)

    // PARTITION ... SET LOCATION re-points just that partition
    val moved = tmp("graft_movepart")
    spark.range(1).select(lit(42L).as("id")).write.mode("overwrite").parquet(moved)
    spark.sql(s"ALTER TABLE graft_parts PARTITION (p=7) SET LOCATION '$moved'")
    spark.catalog.refreshTable("graft_parts")
    val p7 = spark.table("graft_parts").filter(col("p") === 7)
    assert(p7.count() == 1 && p7.head().getLong(0) == 42L)

    // DROP PARTITION removes the rows from the table's view of the data
    spark.sql("ALTER TABLE graft_parts DROP PARTITION (p=0)")
    assert(spark.table("graft_parts").filter(col("p") === 0).count() == 0)
    assert(spark.sql("SHOW PARTITIONS graft_parts").count() == 2)

    spark.sql("DROP TABLE graft_parts")
  }

  test("DESCRIBE FORMATTED and ALTER TABLE SET FILEFORMAT / SET LOCATION") {
    // Reference: DESCRIBE FORMATTED (DescribeStmt) +
    // AlterTableSetFileFormatStmt (sql-parser.y:569-571; Spark spelling for
    // the latter is the catalog-provider swap in sources.Ddl).
    spark.sql("DROP TABLE IF EXISTS graft_fmt")
    spark.sql("CREATE TABLE graft_fmt (id BIGINT, name STRING) USING parquet")

    val desc = spark.sql("DESCRIBE FORMATTED graft_fmt").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(desc.exists(_._1 == "# Detailed Table Information"))
    assert(desc.exists { case (k, v) => k == "Provider" && v == "parquet" })
    assert(desc.exists(_._1 == "Location"))

    sources.Ddl.setFileFormat(spark, "graft_fmt", "csv")
    assert(spark.sql("DESCRIBE FORMATTED graft_fmt").collect()
      .exists(r => r.getString(0) == "Provider" && r.getString(1) == "csv"))
    // metadata-only swap: subsequent writes+reads go through the new format
    spark.sql("INSERT INTO graft_fmt VALUES (1, 'a'), (2, 'b')")
    assert(spark.table("graft_fmt").count() == 2)
    val loc = new java.net.URI(spark.sql("DESCRIBE FORMATTED graft_fmt")
      .collect().find(_.getString(0) == "Location").get.getString(1)).getPath
    assert(new java.io.File(loc).listFiles().exists(_.getName.endsWith(".csv")),
      "files written after SET FILEFORMAT csv must be csv")

    // whole-table SET LOCATION (AlterTableSetLocationStmt, no partition)
    val newLoc = tmp("graft_setloc")
    spark.sql(s"ALTER TABLE graft_fmt SET LOCATION '$newLoc'")
    spark.catalog.refreshTable("graft_fmt")
    assert(spark.table("graft_fmt").count() == 0, "new location starts empty")

    spark.sql("DROP TABLE graft_fmt")
  }

  test("ALTER TABLE DROP/RENAME COLUMN on v1 tables (metadata-only)") {
    // The reference's AlterTableDropColStmt/AlterTableChangeColStmt
    // (sql-parser.y:556-563) are catalog-metadata ops; Spark only offers
    // them for v2 catalogs, so GraftSqlParser lowers them (AlterColumns).
    spark.sql("DROP TABLE IF EXISTS graft_altcol")
    spark.sql("CREATE TABLE graft_altcol (a INT, b STRING, c DOUBLE, p INT) " +
      "USING PARQUET PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft_altcol PARTITION (p=1) VALUES (1, 'x', 2.5)")

    spark.sql("ALTER TABLE graft_altcol DROP COLUMN c")
    assert(spark.table("graft_altcol").columns.toSeq == Seq("a", "b", "p"))
    // data files still hold c; the scan just stops materializing it
    assert(spark.sql("SELECT a, b FROM graft_altcol WHERE p = 1")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "x")))

    // error paths mirror the reference's analyzer checks
    def failsWith(sql: String, msg: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.contains(msg), s"'$msg' not in: ${e.getMessage}")
    }
    // parquet resolves columns by NAME: a metadata-only rename would make
    // every existing file read NULL for the column, so it is refused (the
    // reference's scanners resolve positionally and keep the data)
    failsWith("ALTER TABLE graft_altcol RENAME COLUMN b TO b2",
      "resolves columns by name")
    failsWith("ALTER TABLE graft_altcol DROP COLUMN p",
      "cannot drop partition column")
    failsWith("ALTER TABLE graft_altcol DROP COLUMN nope",
      "does not exist")
    // IF EXISTS tolerates a missing column
    spark.sql("ALTER TABLE graft_altcol DROP COLUMN IF EXISTS nope")
    spark.sql("ALTER TABLE graft_altcol DROP COLUMN b")
    failsWith("ALTER TABLE graft_altcol DROP COLUMN a",
      "cannot drop the last data column")
    spark.sql("DROP TABLE graft_altcol")

    // on a positionally-resolved (CSV) table the rename IS offered, and —
    // the point of the restriction — pre-existing DATA survives it
    spark.sql("DROP TABLE IF EXISTS graft_rencol")
    spark.sql("CREATE TABLE graft_rencol (a INT, b STRING) USING CSV")
    spark.sql("INSERT INTO graft_rencol VALUES (1, 'x')")
    spark.sql("ALTER TABLE graft_rencol RENAME COLUMN b TO b2")
    assert(spark.table("graft_rencol").columns.toSeq == Seq("a", "b2"))
    assert(spark.sql("SELECT b2 FROM graft_rencol").head().getString(0) == "x",
      "data written before the rename must stay readable under the new name")
    failsWith("ALTER TABLE graft_rencol RENAME COLUMN a TO b2",
      "already exists")
    spark.sql("DROP TABLE graft_rencol")
  }

  test("ALTER TABLE CHANGE/REPLACE COLUMNS on v1 tables (metadata-only)") {
    // AlterTableChangeColStmt / AlterTableReplaceColsStmt
    // (sql-parser.y:561-563, 602) — rename+retype+recomment one column,
    // or swap the whole data schema, without touching files.
    spark.sql("DROP TABLE IF EXISTS graft_chgcol")
    spark.sql("CREATE TABLE graft_chgcol (a INT, b STRING, p INT) " +
      "USING CSV PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft_chgcol PARTITION (p=1) VALUES (7, '42')")

    spark.sql("ALTER TABLE graft_chgcol CHANGE COLUMN b b2 INT COMMENT 'now int'")
    val f = spark.table("graft_chgcol").schema("b2")
    assert(f.dataType == org.apache.spark.sql.types.IntegerType)
    assert(f.getComment().contains("now int"))
    // the text data re-parses under the new type
    assert(spark.sql("SELECT b2 FROM graft_chgcol").head().getInt(0) == 42)

    def failsWith(sql: String, msg: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.contains(msg), s"'$msg' not in: ${e.getMessage}")
    }
    failsWith("ALTER TABLE graft_chgcol CHANGE COLUMN p p2 INT",
      "cannot change partition column")
    failsWith("ALTER TABLE graft_chgcol CHANGE COLUMN nope x INT",
      "does not exist")
    failsWith("ALTER TABLE graft_chgcol CHANGE COLUMN a b2 INT",
      "already exists")

    spark.sql("ALTER TABLE graft_chgcol REPLACE COLUMNS " +
      "(c1 BIGINT COMMENT 'id col', c2 STRING)")
    assert(spark.table("graft_chgcol").columns.toSeq == Seq("c1", "c2", "p"))
    failsWith("ALTER TABLE graft_chgcol REPLACE COLUMNS (p INT)",
      "cannot replace partition column")
    // a case-colliding duplicate in the new list must not commit
    failsWith("ALTER TABLE graft_chgcol REPLACE COLUMNS (a INT, A STRING)",
      "duplicate column name")
    assert(spark.table("graft_chgcol").columns.toSeq == Seq("c1", "c2", "p"),
      "failed REPLACE must leave the schema untouched")
    spark.sql("DROP TABLE graft_chgcol")

    // rename/retype via CHANGE is refused on name-resolved formats
    // (comment-only CHANGE stays allowed — it never touches resolution)
    spark.sql("DROP TABLE IF EXISTS graft_chgpq")
    spark.sql("CREATE TABLE graft_chgpq (a INT, b STRING) USING PARQUET")
    failsWith("ALTER TABLE graft_chgpq CHANGE COLUMN b b2 STRING",
      "resolves columns by name")
    failsWith("ALTER TABLE graft_chgpq CHANGE COLUMN b b BIGINT",
      "resolves columns by name")
    spark.sql("ALTER TABLE graft_chgpq CHANGE COLUMN b b STRING COMMENT 'ok'")
    assert(spark.table("graft_chgpq").schema("b").getComment().contains("ok"))
    spark.sql("DROP TABLE graft_chgpq")
  }

  test("LOAD DATA validates the partition spec and escapes values") {
    spark.sql("DROP TABLE IF EXISTS graft_loadval")
    spark.sql("CREATE TABLE graft_loadval (i INT) USING PARQUET " +
      "PARTITIONED BY (p STRING)")
    val src = tmp("graft_loadval_src")
    spark.range(3).selectExpr("cast(id as int) i")
      .write.mode("overwrite").parquet(src)
    // misspelled / non-partition column must error, not drop files into
    // the table root (the reference's LoadDataStmt analyzer check)
    val e1 = intercept[Exception](spark.sql(
      s"LOAD DATA INPATH '$src' INTO TABLE graft_loadval PARTITION (q='x')"))
    assert(e1.getMessage.contains("not a partition column"),
      e1.getMessage)
    // slash in a partition value lands in the Hive-escaped directory the
    // catalog partition points at
    spark.sql("ALTER TABLE graft_loadval ADD PARTITION (p='a/b')")
    spark.sql(s"LOAD DATA INPATH '$src' INTO TABLE graft_loadval " +
      "PARTITION (p='a/b')")
    assert(spark.sql("SELECT count(*) FROM graft_loadval WHERE p = 'a/b'")
      .head().getLong(0) == 3)
    // a partitioned target without a PARTITION clause must error too —
    // the files would land in the table root, invisible to every scan
    spark.range(3).selectExpr("cast(id as int) i")
      .write.mode("overwrite").parquet(src)
    val e2 = intercept[Exception](spark.sql(
      s"LOAD DATA INPATH '$src' INTO TABLE graft_loadval"))
    assert(e2.getMessage.contains("requires a PARTITION clause"),
      e2.getMessage)
    spark.sql("DROP TABLE graft_loadval")
  }

  test("CREATE FUNCTION dialect: duplicate errors, IF NOT EXISTS no-ops") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_fn_db")
    spark.sql("DROP FUNCTION IF EXISTS graft_fn_db.dup_fn()")
    spark.sql("CREATE FUNCTION graft_fn_db.dup_fn() RETURNS double " +
      "LOCATION '/nowhere.jar' SYMBOL='org.apache.hadoop.hive.ql.udf.UDFPI'")
    val e = intercept[Exception](spark.sql(
      "CREATE FUNCTION graft_fn_db.dup_fn() RETURNS double " +
        "LOCATION '/nowhere.jar' SYMBOL='org.apache.hadoop.hive.ql.udf.UDFPI'"))
    assert(e.getMessage.contains("already exists"), e.getMessage)
    // IF NOT EXISTS: silently keeps the existing registration
    spark.sql("CREATE FUNCTION IF NOT EXISTS graft_fn_db.dup_fn() " +
      "RETURNS double LOCATION '/nowhere.jar' SYMBOL='java.lang.String'")
    assert(spark.sql("SELECT graft_fn_db.dup_fn()").head().getDouble(0) ==
      math.Pi)
    spark.sql("DROP FUNCTION graft_fn_db.dup_fn()")

    // the signature-suffixed DROP must never remove a BUILTIN: the session
    // registry is a clone of the builtin registry, so an unguarded
    // dropTempFunction('abs') would delete the builtin itself
    val eAbs = intercept[Exception](spark.sql("DROP FUNCTION abs(double)"))
    assert(eAbs.getMessage.contains("does not exist"), eAbs.getMessage)
    assert(spark.sql("SELECT abs(cast(-1.5 as double))").head().getDouble(0)
      == 1.5, "builtin abs must survive the drop attempt")
    spark.sql("DROP FUNCTION IF EXISTS abs(double)") // no-op, not a removal
    assert(spark.sql("SELECT abs(cast(-2.5 as double))").head().getDouble(0)
      == 2.5)

    // native symbols: db-qualified registration is refused (they live in
    // the session registry only), duplicates error like the catalog path
    val eq = intercept[Exception](spark.sql(
      "CREATE FUNCTION graft_fn_db.native_id(int) RETURNS int " +
        "LOCATION '/test-warehouse/libTestUdfs.so' SYMBOL='Identity'"))
    assert(eq.getMessage.contains("cannot be db-qualified"), eq.getMessage)
    spark.sql("DROP FUNCTION IF EXISTS native_id(int)")
    spark.sql("CREATE FUNCTION native_id(int) RETURNS int " +
      "LOCATION '/test-warehouse/libTestUdfs.so' SYMBOL='Identity'")
    val edup = intercept[Exception](spark.sql(
      "CREATE FUNCTION native_id(int) RETURNS int " +
        "LOCATION '/test-warehouse/libTestUdfs.so' SYMBOL='Identity'"))
    assert(edup.getMessage.contains("already exists"), edup.getMessage)
    spark.sql("CREATE FUNCTION IF NOT EXISTS native_id(int) RETURNS int " +
      "LOCATION '/test-warehouse/libTestUdfs.so' SYMBOL='Identity'") // no-op
    assert(spark.sql("SELECT native_id(7)").head().getInt(0) == 7)
    spark.sql("DROP FUNCTION native_id(int)")
  }

  test("cached CTAS: directive before AS SELECT lands on the catalog, not the parser floor") {
    Tables.registerViews(spark, sfDir)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_test")
    spark.sql("DROP TABLE IF EXISTS graft_test.cached_ctas")
    // reference grammar places CACHED IN before the AS-query tail
    // (sql-parser.y cache_op_val before the CTAS query) — r16 only matched
    // the directive at end-of-statement, so a cached CTAS fell through to
    // the delegate parser and failed
    spark.sql("CREATE TABLE graft_test.cached_ctas CACHED IN 'testPool' " +
      "AS SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 1")
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("cached_ctas", Some("graft_test")))
    assert(meta.properties.get(graft.plans.TableCache.TablePoolProp)
      .contains("testPool"))
    assert(spark.table("graft_test.cached_ctas").count() == 5)
    // a trailing string literal that happens to END with "cached in 'x'"
    // must NOT be rewritten — the quote-aware prefix keeps it intact
    spark.sql("DROP TABLE IF EXISTS graft_test.cached_lit")
    spark.sql("CREATE TABLE graft_test.cached_lit AS " +
      "SELECT 'data cached in ''poolX''' AS note")
    val litMeta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("cached_lit", Some("graft_test")))
    assert(!litMeta.properties.contains(graft.plans.TableCache.TablePoolProp))
    assert(spark.table("graft_test.cached_lit").head().getString(0)
      == "data cached in 'poolX'")
    // parenthesized CTAS query — the delegate parser accepts
    // AS (SELECT ...), so the directive rewrite must too (ADVICE r17)
    spark.sql("DROP TABLE IF EXISTS graft_test.cached_paren")
    spark.sql("CREATE TABLE graft_test.cached_paren CACHED IN 'testPool' " +
      "AS (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)")
    val parenMeta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("cached_paren", Some("graft_test")))
    assert(parenMeta.properties.get(graft.plans.TableCache.TablePoolProp)
      .contains("testPool"))
    assert(spark.table("graft_test.cached_paren").count() == 5)
    spark.sql("DROP TABLE graft_test.cached_ctas")
    spark.sql("DROP TABLE graft_test.cached_lit")
    spark.sql("DROP TABLE graft_test.cached_paren")
  }

  test("CREATE/DROP VIEW and WITH-clause queries") {
    Tables.registerViews(spark, sfDir)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW big_nations AS " +
      "SELECT * FROM nation WHERE n_regionkey >= 3")
    val n = spark.sql(
      """WITH r AS (SELECT n_regionkey, count(*) AS c FROM big_nations
        |           GROUP BY n_regionkey)
        |SELECT sum(c) FROM r""".stripMargin).head().getLong(0)
    assert(n == spark.table("big_nations").count())
    spark.sql("DROP VIEW big_nations")
  }
}
