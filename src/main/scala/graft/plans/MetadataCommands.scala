package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** The reference's metadata-invalidation statements
  * (`fe/src/main/cup/sql-parser.y` reset_metadata_stmt: `INVALIDATE
  * METADATA [table]` and `REFRESH table`), the churn half of its
  * targeted-stress workload (`stress-with-invalidate-refresh.test`).
  *
  * The reference discards/reloads catalog-server metadata; the Spark-native
  * equivalents are relation-cache invalidation and file-listing refresh:
  *  - `INVALIDATE METADATA t` / `REFRESH t` → `catalog.refreshTable` —
  *    drops the cached logical plan + file index so the next query re-lists
  *    and re-reads the footer metadata (for this engine's path-backed
  *    views, exactly what the reference's per-table reload re-derives);
  *  - bare `INVALIDATE METADATA` → clear the data cache and refresh every
  *    table and view the session knows, the analogue of a full catalog
  *    reset that does NOT drop the definitions themselves (the reference
  *    keeps definitions in the metastore; ours live in the session
  *    catalog, so dropping them would be semantically stronger than the
  *    reference's statement).
  *
  * Spark's own parser handles `REFRESH TABLE t` natively; the graft parser
  * only lowers the reference's bare one-token `REFRESH t` spelling.
  */
case class InvalidateMetadataCommand(ident: Option[String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    ident match {
      case Some(name) => session.catalog.refreshTable(name)
      case None =>
        session.catalog.clearCache()
        val cat = session.sessionState.catalog
        // every temp view + every table in every database; a concurrently
        // dropped table between list and refresh is not an error (the
        // reference's invalidate tolerates races the same way)
        val names =
          cat.getTempViewNames().map(Seq(_)) ++
          cat.listDatabases().flatMap(db =>
            cat.listTables(db).map(ti => Seq(ti.database.getOrElse(db), ti.table)))
        names.foreach { parts =>
          try session.catalog.refreshTable(parts.mkString("."))
          catch { case _: Exception => () }
        }
    }
    Nil
  }
}
