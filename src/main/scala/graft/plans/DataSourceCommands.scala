package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{AnalysisException, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StringType

/** The reference's external-data-source DDL surface:
  * `CREATE DATASOURCE name LOCATION '..' CLASS '..' API_VERSION '..'`,
  * `DROP DATASOURCE [IF EXISTS] name`, `SHOW DATASOURCES [LIKE 'pat']`
  * (`fe/src/main/cup/sql-parser.y` create_data_src_stmt /
  * drop_data_src_stmt / show_data_srcs_stmt;
  * `fe/.../analysis/CreateDataSrcStmt.java`).
  *
  * The reference stores data-source definitions in its catalog and binds
  * tables to them via `CREATE TABLE .. PRODUCED BY DATASOURCE name`; the
  * Spark-native analogue of the *binding* is a DSv2 provider class
  * (`graft.sources.AllTypesDataSource`, used by the planner port), so the
  * definition registry here is session-scoped metadata only — exactly what
  * `QueryTest/show-data-sources.test` exercises. Pattern semantics follow
  * the reference's Hive matcher (`fe/.../util/PatternMatcher.java`): `*`
  * matches any string, `|` separates alternatives, everything else is
  * literal.
  */
object DataSourceRegistry {
  /** name → (location, className, apiVersion); names are case-insensitive
    * identifiers, stored lowercased like the reference catalog's. WEAK keys:
    * a strong map would pin every session that ever ran a DATASOURCE
    * command (and its sessionState/caches) for the JVM lifetime — a real
    * leak in long-lived drivers that mint per-request `newSession()`s. */
  private val bySession = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, TrieMap[String, (String, String, String)]]())

  def forSession(spark: SparkSession): TrieMap[String, (String, String, String)] =
    bySession.synchronized {
      var m = bySession.get(spark)
      if (m == null) { m = TrieMap.empty; bySession.put(spark, m) }
      m
    }

  /** Hive SHOW-pattern match: `*` wildcard, `|` alternation, rest literal. */
  def matchesHivePattern(pattern: String, candidate: String): Boolean =
    pattern.split('|').exists { alt =>
      val regex = alt.split("\\*", -1).map(java.util.regex.Pattern.quote)
        .mkString(".*")
      candidate.matches(regex)
    }
}

case class CreateDataSourceCommand(name: String, location: String,
    className: String, apiVersion: String, ifNotExists: Boolean)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val reg = DataSourceRegistry.forSession(session)
    val key = name.toLowerCase
    if (reg.putIfAbsent(key, (location, className, apiVersion)).isDefined
        && !ifNotExists)
      throw new AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3103",
        messageParameters = Map("msg" -> s"Data source already exists: $name"))
    Nil
  }
}

case class DropDataSourceCommand(name: String, ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val reg = DataSourceRegistry.forSession(session)
    if (reg.remove(name.toLowerCase).isEmpty && !ifExists)
      throw new AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3103",
        messageParameters = Map("msg" -> s"Data source does not exist: $name"))
    Nil
  }
}

case class ShowDataSourcesCommand(pattern: Option[String])
    extends LeafRunnableCommand {
  // The reference's result-set labels (ShowDataSrcsStmt metadata):
  // NAME, LOCATION, CLASS NAME, API VERSION — all strings.
  override val output: Seq[Attribute] = Seq("NAME", "LOCATION", "CLASS NAME",
    "API VERSION").map(n => AttributeReference(n, StringType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val reg = DataSourceRegistry.forSession(session)
    reg.toSeq
      .filter { case (n, _) =>
        pattern.forall(DataSourceRegistry.matchesHivePattern(_, n)) }
      .sortBy(_._1)
      .map { case (n, (loc, cls, api)) => Row(n, loc, cls, api) }
  }
}
