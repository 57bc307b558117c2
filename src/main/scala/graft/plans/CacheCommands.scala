package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StringType

/** The reference's HDFS cache-directive DDL (sql-parser.y cache_op_val;
  * CREATE TABLE ... CACHED IN 'pool', ALTER TABLE [PARTITION] SET
  * CACHED/UNCACHED, ADD PARTITION ... CACHED/UNCACHED —
  * QueryTest/hdfs-caching.test) mapped onto catalog metadata.
  *
  * Spark has no HDFS cache-pool RPC — block pinning is storage-layer
  * infrastructure the reference drives through the NameNode — so what this
  * engine implements (and what the fixture actually tests) is the DIRECTIVE
  * LIFECYCLE: pool bookkeeping, inheritance of the table's directive by new
  * partitions (explicit ADD PARTITION and dynamic-insert partitions alike),
  * per-partition overrides, idempotent re-issue, and the stats rendering
  * ('Bytes Cached' in SHOW TABLE STATS).
  *
  * Model: the table carries `graft.cache.pool` in its properties; a
  * partition carries `graft.cache = pool:<name> | uncached` ONLY as an
  * explicit override. Resolution happens at render time — absent override
  * means "inherit the table directive", which makes dynamic-partition
  * inserts inherit with no insert-path interception at all (the partition
  * simply has no override). Table-level SET CACHED/UNCACHED clears every
  * partition override (the reference semantics: "set uncached clears all
  * cache requests", and table-level SET CACHED re-caches explicitly
  * uncached partitions). */
object TableCache {
  val TablePoolProp = "graft.cache.pool"
  val PartParam = "graft.cache"

  def partValue(pool: Option[String]): String =
    pool.map("pool:" + _).getOrElse("uncached")

  /** Is this (partition-override, table-pool) pair cached? */
  def resolve(tablePool: Option[String], partOverride: Option[String]): Boolean =
    partOverride match {
      case Some("uncached") => false
      case Some(v) if v.startsWith("pool:") => true
      case _ => tablePool.isDefined
    }

  /** `(j=2, k='x')` → ordered (name, value) pairs, quotes stripped. */
  def parseSpec(spec: String): Seq[(String, String)] =
    spec.split(",").toIndexedSeq.map(_.trim).filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      (k.trim, v.trim.stripPrefix("'").stripSuffix("'"))
    }

  private[plans] def setPartitionOverride(session: SparkSession,
      ident: Seq[String], spec: Seq[(String, String)],
      pool: Option[String]): Unit = {
    val (ti, _) = StatsCommands.metadata(session, ident)
    val catalog = session.sessionState.catalog
    val p = catalog.getPartition(ti, spec.toMap)
    catalog.alterPartitions(ti, Seq(
      p.copy(parameters = p.parameters + (PartParam -> partValue(pool)))))
  }
}

/** ALTER TABLE t SET CACHED IN 'pool' / SET UNCACHED (table level) and
  * ALTER TABLE t PARTITION (spec) SET CACHED/UNCACHED (partition level). */
case class GraftSetCachedCommand(ident: Seq[String],
    partSpec: Option[Seq[(String, String)]],
    pool: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(session: SparkSession): Seq[Row] = {
    partSpec match {
      case Some(spec) =>
        TableCache.setPartitionOverride(session, ident, spec, pool)
      case None =>
        val (ti, meta) = StatsCommands.metadata(session, ident)
        val catalog = session.sessionState.catalog
        val props = pool match {
          case Some(p) => meta.properties + (TableCache.TablePoolProp -> p)
          case None => meta.properties - TableCache.TablePoolProp
        }
        catalog.alterTable(meta.copy(properties = props))
        // table-level directive resets every partition override, in BOTH
        // directions: SET UNCACHED "clears all cache requests" (incl.
        // explicitly cached partitions) and SET CACHED re-caches
        // explicitly uncached ones
        if (meta.partitionColumnNames.nonEmpty) {
          val overridden = catalog.listPartitions(ti)
            .filter(_.parameters.contains(TableCache.PartParam))
          if (overridden.nonEmpty) catalog.alterPartitions(ti,
            overridden.map(p =>
              p.copy(parameters = p.parameters - TableCache.PartParam)))
        }
    }
    Nil
  }
}

/** Wrapper for CREATE TABLE / ADD PARTITION statements that carried a cache
  * directive: runs the directive-stripped statement (re-entering the
  * session parser — the stripped text no longer matches any cache regex,
  * so it lands on the native path), then applies the directive. */
case class GraftCachedDdlCommand(innerSql: String, ident: Seq[String],
    partSpec: Option[Seq[(String, String)]],
    pool: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("result", StringType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    session.sql(innerSql)
    partSpec match {
      case Some(spec) =>
        TableCache.setPartitionOverride(session, ident, spec, pool)
      case None =>
        // CREATE TABLE ... CACHED IN 'pool'
        val (_, meta) = StatsCommands.metadata(session, ident)
        session.sessionState.catalog.alterTable(meta.copy(properties =
          meta.properties + (TableCache.TablePoolProp -> pool.getOrElse(
            sys.error("CREATE ... CACHED requires a pool")))))
    }
    Nil
  }
}
