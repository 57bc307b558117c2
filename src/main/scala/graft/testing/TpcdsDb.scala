package graft.testing

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Materializes the `tpcds` database the reference's TPC-DS planner
  * fixture scans (`functional-planner/queries/PlannerTest/tpcds-all.test`:
  * store_sales star schema over 10 dimension/fact tables).
  *
  * Schemas come from the reference's own dataset template
  * (`testdata/datasets/tpcds/tpcds_schema_template.sql`, copied verbatim
  * into test resources) — parsed here rather than hard-coded so the column
  * lists stay reference-exact. The reference loads ~1GB of dsdgen output;
  * plan-shape parity needs only the planning inputs (schemas, nonzero file
  * sizes, store_sales's ss_date partitioning), so each table gets a few
  * dozen deterministic rows generated per column type. Values never matter:
  * the fixture pins scans/joins/broadcasts/aggregates, and the harness does
  * not compare partition counts for this file (the reference's
  * `partitions=K/N` annotations encode its loader's dynamic date
  * partitions, which are data, not plan, artifacts).
  *
  * Tables are managed parquet tables (not views) so plans show real
  * `FileSourceScanExec` nodes with size statistics — the same planning
  * inputs the reference's planner had.
  */
object TpcdsDb {

  private case class Table(name: String, cols: Seq[(String, String)],
                           partCols: Seq[(String, String)])

  /** Parse the dataset template's `---- BASE_TABLE_NAME / ---- COLUMNS /
    * ---- PARTITION_COLUMNS` sections. */
  private def parseTemplate(): Seq[Table] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/data/tpcds_schema_template.sql"), "UTF-8")
    val lines = try src.getLines().toVector finally src.close()
    val tables = Vector.newBuilder[Table]
    var name = ""
    var section = ""
    var cols = Vector.empty[(String, String)]
    var parts = Vector.empty[(String, String)]
    def flush(): Unit = {
      if (name.nonEmpty) tables += Table(name, cols, parts)
      name = ""; cols = Vector.empty; parts = Vector.empty
    }
    lines.foreach {
      case l if l.startsWith("====") => flush()
      case l if l.startsWith("---- ") => section = l.drop(5).trim
      case l if l.trim.nonEmpty => section match {
        case "BASE_TABLE_NAME" => name = l.trim
        case "COLUMNS" | "PARTITION_COLUMNS" =>
          l.trim.split("\\s+") match {
            case Array(c, t) =>
              if (section == "COLUMNS") cols :+= ((c, t)) else parts :+= ((c, t))
            case _ => ()
          }
        case _ => ()
      }
      case _ => ()
    }
    flush()
    tables.result()
  }

  /** Deterministic value per column type; shared modulus on integer keys so
    * fact foreign keys land on dimension primary keys. Date-named string
    * columns get real date text spanning the fixture's BETWEEN predicates
    * (and store_sales's dynamic ss_date partitions). */
  private def gen(name: String, typ: String) = {
    val id = col("id")
    typ.toLowerCase match {
      case _ if name == "ss_date" || name == "d_date" =>
        date_add(lit(java.sql.Date.valueOf("1999-10-20")),
          (id % 8).cast("int") * lit(40)).cast("string").as(name)
      case "bigint" => (id % 19).cast("bigint").as(name)
      case "int" => (id % 11).cast("int").as(name)
      case "float" => ((id % 13).cast("float") / lit(4.0f)).as(name)
      case "string" => concat(lit(name + "_"), (id % 7).cast("string")).as(name)
      case other =>
        throw new IllegalArgumentException(s"template type $other")
    }
  }

  private def rowsFor(table: String): Int =
    if (table.startsWith("store_sales")) 200 else 50

  def ensure(spark: SparkSession): Unit = synchronized {
    if (spark.catalog.databaseExists("tpcds")) return
    spark.sql("CREATE DATABASE tpcds")
    parseTemplate().foreach { t =>
      val all = t.cols ++ t.partCols
      val df = spark.range(rowsFor(t.name))
        .select(all.map { case (c, ty) => gen(c, ty) }: _*)
      val w = df.write.format("parquet")
      (if (t.partCols.nonEmpty) w.partitionBy(t.partCols.map(_._1): _*) else w)
        .saveAsTable(s"tpcds.${t.name}")
    }
  }
}
