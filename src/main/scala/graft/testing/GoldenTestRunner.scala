package graft.testing

import scala.io.Source

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Golden-file query harness in the reference's `.test` format.
  *
  * The reference's end-to-end correctness net is files of
  * `---- QUERY / ---- TYPES / ---- RESULTS` sections executed by a Python
  * driver (`tests/util/test_file_parser.py`,
  * `tests/common/test_result_verifier.py`, fixtures under
  * `testdata/workloads/&#47;*&#47;queries/`). This is a clean-room Scala
  * implementation of the same format so reference-shaped fixtures can run
  * against the Spark engine verbatim.
  *
  * Supported sections: QUERY (required), TYPES (comma-separated Impala type
  * names), RESULTS (one comma-separated row per line, strings in single
  * quotes, `NULL` for nulls), CATCH (expected error substring), LABELS
  * (ignored), `====` separates cases. `row_regex:` result lines and
  * `$DATABASE` substitution are not needed by our fixtures and unsupported.
  */
object GoldenTestRunner {

  case class GoldenCase(query: String, types: Option[Seq[String]],
                        results: Option[Seq[String]], catchErr: Option[String],
                        ordered: Boolean)

  def parseFile(path: String): Seq[GoldenCase] = {
    val src = Source.fromFile(path)
    try parse(src.getLines().toSeq) finally src.close()
  }

  def parse(lines: Seq[String]): Seq[GoldenCase] = {
    val cases = collection.mutable.ListBuffer.empty[GoldenCase]
    var section: String = ""
    var sections = collection.mutable.Map.empty[String, Vector[String]]
    def flush(): Unit = {
      if (sections.contains("QUERY")) {
        val query = sections("QUERY").mkString("\n").trim
        cases += GoldenCase(
          query,
          sections.get("TYPES").map(_.mkString(",").split(",").map(_.trim).toSeq),
          sections.get("RESULTS").map(_.filter(_.nonEmpty)),
          sections.get("CATCH").map(_.mkString("\n").trim),
          ordered = query.toUpperCase.contains("ORDER BY"))
      }
      sections = collection.mutable.Map.empty
      section = ""
    }
    lines.foreach {
      case l if l.startsWith("====") => flush()
      case l if l.startsWith("---- ") =>
        section = l.drop(5).trim.toUpperCase
        sections(section) = Vector.empty
      case l if section.nonEmpty =>
        sections(section) = sections(section) :+ l
      case _ => ()
    }
    flush()
    cases.toList
  }

  /** Impala type name for a Spark type (reference: `ColumnType.java`). */
  def typeName(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case ByteType => "tinyint"
    case ShortType => "smallint"
    case IntegerType => "int"
    case LongType => "bigint"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case TimestampType | TimestampNTZType => "timestamp"
    case DateType => "date"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case other => other.simpleString
  }

  /** Render a row in the golden format: 'str' quoting, NULL, raw numerics. */
  def renderRow(row: Row): String =
    row.toSeq.map {
      case null => "NULL"
      case s: String => "'" + s + "'"
      case t: java.sql.Timestamp => t.toString
      case d: java.math.BigDecimal => d.toPlainString
      case other => other.toString
    }.mkString(",")

  sealed trait Outcome
  case object Pass extends Outcome
  case class Fail(reason: String) extends Outcome

  def run(spark: SparkSession, c: GoldenCase): Outcome = {
    val result: Either[Throwable, DataFrame] =
      try Right(spark.sql(c.query)) catch { case e: Throwable => Left(e) }
    (result, c.catchErr) match {
      case (Left(e), Some(expected)) =>
        if (e.getMessage != null && e.getMessage.contains(expected)) Pass
        else Fail(s"error mismatch: expected '$expected', got '${e.getMessage}'")
      case (Left(e), None) => Fail(s"query failed: ${e.getMessage}")
      case (Right(_), Some(expected)) =>
        // analysis succeeded; error may surface at execution
        try { result.toOption.get.collect(); Fail(s"expected error '$expected'") }
        catch {
          case e: Throwable if e.getMessage != null && e.getMessage.contains(expected) => Pass
          case e: Throwable => Fail(s"error mismatch: '$expected' vs '${e.getMessage}'")
        }
      case (Right(df), None) =>
        val rows = df.collect()
        c.types.foreach { expected =>
          val got = df.schema.fields.map(f => typeName(f.dataType)).toSeq
          if (got != expected.map(_.toLowerCase))
            return Fail(s"types mismatch: expected $expected, got $got")
        }
        c.results.foreach { expected =>
          val got = rows.map(renderRow).toSeq
          val (g, e) = if (c.ordered) (got, expected)
                       else (got.sorted, expected.sorted)
          if (g != e)
            return Fail(s"results mismatch:\n expected: $e\n got:      $g")
        }
        Pass
    }
  }
}
