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
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * (PARQUET_TYPE_ILLEGAL). Read it as raw int64 nanos (legacy conf) and
    * convert to a µs TimestampType column — the engine-wide convention
    * (Impala's TIMESTAMP is ns-resolution, `be/src/runtime/timestamp-value.h`;
    * we standardize on Spark µs and truncate). */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    // Convert only when ts actually arrived as int64 nanos (the driver's
    // TIMESTAMP(NANOS) parquet). A re-written events table (e.g. ScaleSmoke
    // output) already carries a µs TimestampType column — converting twice
    // would corrupt it.
    raw.schema("ts").dataType match {
      case LongType =>
        // integer division: `/` casts both sides to Double, and epoch nanos
        // (~1.7e18) exceed a double's 2^53 exact range — the rounded
        // quotient would drift by 1µs on roughly half of all values
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
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
