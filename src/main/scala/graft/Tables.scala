package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-corpus table access.
  *
  * The reference resolves tables through a metastore-backed catalog
  * (`fe/.../catalog/HdfsTable.java`); here the driver hands us a directory of
  * parquet tables per scale factor (TESTDATA.md), so "catalog" = parquet
  * paths + optional temp views for the SQL surface. Scans go through Spark's
  * vectorized parquet source — the equivalent of the reference's
  * `HdfsScanNode` + parquet scanner (`be/src/exec/hdfs-parquet-scanner.cc`)
  * with pushdown/pruning handled by Catalyst.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val pipeline: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ pipeline

  /** Dimension tables small enough to broadcast at any scale factor. */
  val broadcastable: Set[String] = Set("region", "nation")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    GraftFunctions.registered(spark)
    // Memoized per (session, dir, name) — a PLAN handle, not data: every
    // action still scans the parquet. `spark.read.parquet` pays schema
    // inference (footer read) + a fresh InMemoryFileIndex listing on every
    // call, and the registry's 175 queries × 3 bench passes re-derive the
    // same ten immutable corpus tables hundreds of times per run — pure
    // fixed overhead, same rationale as the registerViews cache below.
    // Correctness note: the cached frame freezes the FILE LISTING, which is
    // exactly right for the driver-contract corpora (immutable per sfDir);
    // everything that mutates and re-reads its own parquet in one session
    // (DeltaIndex batches, fuzzers, staging dirs) goes through
    // spark.read.parquet directly, never through here.
    tableCache.computeIfAbsent((spark, dir, name), _ =>
      if (name == "events") events(spark, dir)
      else {
        val path = s"$dir/$name.parquet"
        if (new java.io.File(path, BucketMarker).isFile)
          bucketedTable(spark, path, name)
        else spark.read.parquet(path)
      })
  }

  private val tableCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** Marker file a bucketed-layout generator (ScaleData `bucketed`) drops
    * inside a table directory: Spark's bucket spec lives in the CATALOG,
    * not in the parquet files, so a plain `read.parquet` of bucketed files
    * silently discards the co-location the write-time shuffle paid for.
    * Properties format: `key=o_custkey`, `buckets=N`, `sort=o_custkey`. */
  val BucketMarker = "_graft_buckets"

  /** Register (once per session+path) an external bucketed table over the
    * marker-described files and return it through the catalog, so every
    * downstream join/agg on the bucket key plans WITHOUT an Exchange —
    * the whole point of the layout at 100 TB: one write-time shuffle
    * amortized over every subsequent read. Underscore-prefixed marker
    * files are invisible to Spark's file listing, so the same directory
    * still reads as plain parquet anywhere else. */
  private def bucketedTable(spark: SparkSession, path: String,
                            name: String): DataFrame = {
    val abs = new java.io.File(path).getAbsolutePath
    val tbl = s"graft_bkt_${name}_${Integer.toHexString(abs.hashCode)}"
    registeredDirs.synchronized {
      if (!spark.catalog.tableExists(tbl)) {
        val props = new java.util.Properties()
        val in = new java.io.FileInputStream(new java.io.File(path, BucketMarker))
        try props.load(in) finally in.close()
        val key = props.getProperty("key")
        val n = props.getProperty("buckets").toInt
        val sort = props.getProperty("sort", key)
        require(key != null && n > 0, s"malformed $BucketMarker in $path")
        val ddl = spark.read.parquet(abs).schema.toDDL
        spark.sql(s"""CREATE TABLE `$tbl` ($ddl) USING parquet
                     |CLUSTERED BY ($key) SORTED BY ($sort) INTO $n BUCKETS
                     |LOCATION '$abs'""".stripMargin)
      }
    }
    spark.table(tbl)
  }

  /** The driver has shipped `events.ts` in two parquet encodings across
    * rounds: TIMESTAMP(NANOS) — which Spark's reader rejects outright
    * (PARQUET_TYPE_ILLEGAL) unless read as raw int64 via the legacy conf —
    * and, since the round-10 regeneration, µs TIMESTAMP with
    * `isAdjustedToUTC=false`, which Spark reads as TIMESTAMP_NTZ. The
    * engine-wide convention is µs `TimestampType` (Impala's TIMESTAMP is
    * ns-resolution wall-clock, `be/src/runtime/timestamp-value.h`; we
    * standardize on Spark µs in a UTC session), so [[normalizeEventsTs]]
    * maps BOTH encodings there. Queries over `ts` (`unix_micros`,
    * `window()`, watermarking) all assume the normalized type. */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Normalize an events frame's `ts` to µs TimestampType, whatever the
    * parquet encoding delivered (shared with the streaming read path, which
    * must declare an explicit schema and re-apply the same conversion). */
  def normalizeEventsTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        // int64 nanos under the legacy conf. Integer division: `/` casts
        // both sides to Double, and epoch nanos (~1.7e18) exceed a double's
        // 2^53 exact range — the rounded quotient would drift by 1µs on
        // roughly half of all values.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // µs wall-clock meant as UTC. The bare NTZ→LTZ cast interprets the
        // wall-clock in the SESSION zone — overwriting the session zone here
        // (the old fix) silently changed timestamp semantics for every later
        // query of an externally-created non-UTC session. And the previous
        // zone-free fix (rebase UTC→session-zone wall, then cast) was not
        // instant-preserving under a DST session zone: the session-local
        // wall-clock is not injective over instants, so fall-back-overlap
        // instants round-tripped an hour off. Construct the instant with NO
        // session-zone round-trip at all: every field extraction below is
        // defined directly on the NTZ wall-clock, and make_timestamp's
        // explicit 'UTC' zone argument anchors them zone-freely (UTC has no
        // DST, so every wall-clock is unambiguous).
        raw.withColumn("ts",
          expr("""make_timestamp(year(ts), month(ts), day(ts), hour(ts),
                 minute(ts), extract(SECOND FROM ts), 'UTC')""")
            .cast(TimestampType))
      case _ => raw // already µs TimestampType (e.g. a ScaleSmoke rewrite)
    }
  }

  /** Registers every table as a temp view so `spark.sql` works (the SQL
    * statement surface of SURVEY §2.11). Idempotent and cached per
    * (session, dir) — several query builders call this per invocation, and
    * re-reading ten parquet schemas per statement is pure fixed overhead. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    // mark AFTER success, under a lock: marking first would turn every
    // retry after a partial failure (one missing parquet path) into a
    // silent no-op, and a concurrent caller could query half-registered
    // views
    registeredDirs.synchronized {
      if (!registeredDirs.contains((spark, dir))) {
        all.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
        registeredDirs.add((spark, dir))
      }
    }

  private val registeredDirs = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), java.lang.Boolean]())

  private object GraftFunctions {
    private val done = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())
    def registered(spark: SparkSession): Unit =
      if (done.add(spark)) graft.functions.GraftFunctions.register(spark)
  }
}
