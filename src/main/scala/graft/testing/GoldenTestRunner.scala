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
  * Supported sections: QUERY (required; `#` comment lines stripped and
  * trailing `;` dropped, as `test_file_parser.py:26,66` does), TYPES
  * (comma-separated Impala type names), RESULTS (one comma-separated row per
  * line, strings in single quotes, `NULL` for nulls — rendered as `'NULL'`
  * in string-typed columns, matching `test_result_verifier.py`), CATCH
  * (expected error substring), SETUP (`RESET t` / `DROP PARTITIONS t`,
  * executed via [[FunctionalDataset.resetTable]] as
  * `impala_test_suite.py:217-235` does), LABELS (ignored), `====` separates
  * cases. INSERT cases verify RESULTS as per-partition written-row counts
  * (see [[runInsertCase]]). A subsection tag after `:` (e.g.
  * `---- RESULTS: VERIFY...`) is
  * accepted and ignored, with one local extension: `---- RESULTS:
  * MULTISET_CELLS(sep)` compares string cells that differ textually as
  * multisets of tokens split on `sep` — for group_concat cases, whose
  * within-group arrival order is engine-undefined across partitionings.
  * `row_regex: <pattern>` result lines (the reference verifier's
  * environment-independent row escape, `test_result_verifier.py`) match a
  * whole rendered row against the regex — used by the stats fixtures where
  * file sizes/counts and NDV estimates are environment-specific. Literal
  * lines claim rows first in the unordered compare, so a broad regex can't
  * steal a row a literal needs. `$DATABASE` substitution is not needed by
  * our fixtures and unsupported.
  */
object GoldenTestRunner {

  case class GoldenCase(query: String, types: Option[Seq[String]],
                        results: Option[Seq[String]], catchErr: Option[String],
                        ordered: Boolean,
                        multisetSep: Option[String] = None,
                        subset: Boolean = false,
                        setup: Seq[String] = Nil,
                        createTable: Boolean = false)

  def parseFile(path: String): Seq[GoldenCase] = {
    val src = Source.fromFile(path)(scala.io.Codec.UTF8)
    try parse(src.getLines().toSeq) finally src.close()
  }

  def parse(lines: Seq[String]): Seq[GoldenCase] = {
    val cases = collection.mutable.ListBuffer.empty[GoldenCase]
    var section: String = ""
    var sections = collection.mutable.Map.empty[String, Vector[String]]
    var tags = collection.mutable.Map.empty[String, String]
    def flush(): Unit = {
      // CREATE_TABLE is the reference's SHOW CREATE TABLE round-trip
      // section (test_show_create_table.py): the text is a CREATE
      // statement to execute, RESULTS the expected SHOW CREATE rendering.
      val querySection =
        if (sections.contains("QUERY")) Some("QUERY")
        else if (sections.contains("CREATE_TABLE")) Some("CREATE_TABLE")
        else None
      querySection.foreach { qs =>
        val query = sections(qs)
          .filterNot(_.trim.startsWith("#")) // comment lines (parser:66)
          .mkString("\n").trim.stripSuffix(";")
        val MultisetTag = """MULTISET_CELLS\((.*)\)""".r
        cases += GoldenCase(
          query,
          // `#` comment lines are legal inside any section (the reference
          // parser strips them globally; aggregation.test has a commented-out
          // case nested in a RESULTS block). Rendered strings are quoted, so
          // a leading # is unambiguous.
          sections.get("TYPES").map(t =>
            splitTypes(t.filterNot(_.trim.startsWith("#")).mkString(","))),
          sections.get("RESULTS").map(
            _.filterNot(_.trim.startsWith("#")).filter(_.nonEmpty)),
          sections.get("CATCH").map(_.mkString("\n").trim),
          ordered = hasTopLevelOrderBy(query),
          multisetSep = tags.get("RESULTS").collect {
            case MultisetTag(sep) => sep },
          // the reference verifier's VERIFY_IS_SUBSET: every expected row
          // must appear in the actual results (used where the full listing
          // is environment-dependent, e.g. SHOW TABLES '*')
          subset = tags.get("RESULTS").exists(_.contains("VERIFY_IS_SUBSET")),
          setup = sections.get("SETUP")
            .map(_.map(_.trim).filter(_.nonEmpty)
              .filterNot(_.startsWith("#"))).getOrElse(Nil),
          createTable = qs == "CREATE_TABLE")
      }
      sections = collection.mutable.Map.empty
      tags = collection.mutable.Map.empty
      section = ""
    }
    lines.foreach {
      case l if l.startsWith("====") => flush()
      case l if l.startsWith("---- ") =>
        val header = l.drop(5).trim
        section = header.toUpperCase.split(':').head.trim
        header.split(":", 2) match {
          case Array(_, tag) => tags(section) = tag.trim
          case _ => ()
        }
        sections(section) = Vector.empty
      case l if section.nonEmpty =>
        sections(section) = sections(section) :+ l
      case _ => ()
    }
    flush()
    cases.toList
  }

  /** Split a multi-statement QUERY blob on semicolons outside single-quoted
    * string literals (backslash escapes respected, so `';'` or `'don\'t;'`
    * never splits). Used both for execution and for deciding which statement
    * defines result order. */
  private[testing] def splitStatements(query: String): Seq[String] = {
    val out = collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQ = false
    var i = 0
    while (i < query.length) {
      val ch = query.charAt(i)
      if (ch == '\\' && inQ && i + 1 < query.length) {
        sb += ch; sb += query.charAt(i + 1); i += 2
      } else {
        if (ch == '\'') inQ = !inQ
        if (ch == ';' && !inQ) { out += sb.toString; sb.clear() }
        else sb += ch
        i += 1
      }
    }
    out += sb.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** A result is order-sensitive only when the outermost block of the FINAL
    * statement has an ORDER BY — one at paren depth 0, outside string
    * literals. An ORDER BY inside a subquery, a quoted literal, or an
    * earlier setup statement does not define the output order (the
    * reference verifier makes the same distinction via VERIFY_IS_EQUAL vs
    * VERIFY_IS_EQUAL_SORTED tags; our fixtures rely on the query shape). */
  private def hasTopLevelOrderBy(query: String): Boolean = {
    val q = splitStatements(query).lastOption.getOrElse("").toUpperCase
    var depth = 0
    var i = 0
    var inQ = false
    var found = false
    while (i < q.length) {
      q.charAt(i) match {
        case '\\' if inQ && i + 1 < q.length => i += 1
        case '\'' => inQ = !inQ
        case '(' if !inQ => depth += 1
        case ')' if !inQ => depth -= 1
        case 'O' if !inQ && depth == 0 && q.regionMatches(i, "ORDER", 0, 5) &&
          q.drop(i + 5).dropWhile(_.isWhitespace).startsWith("BY") => found = true
        case _ => ()
      }
      i += 1
    }
    found
  }

  /** Split a TYPES line on commas outside parentheses, so
    * `decimal(20, 4)` stays one type name; whitespace normalized. */
  private def splitTypes(line: String): Seq[String] = {
    val out = collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    line.foreach {
      case '(' => depth += 1; sb += '('
      case ')' => depth -= 1; sb += ')'
      case ',' if depth == 0 => out += sb.toString; sb.clear()
      case ch => sb += ch
    }
    out += sb.toString
    out.toSeq.map(_.trim.replaceAll("\\s+", "")).filter(_.nonEmpty)
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

  /** Impala's floating-point text rendering: C `%.16g` with trailing zeros
    * stripped (the reference streams values at `std::setprecision(16)`,
    * `be/src/runtime/raw-value.cc`), `inf`/`nan` spellings. BigDecimal over
    * the EXACT binary value with HALF_EVEN reproduces glibc's
    * correctly-rounded conversion, ties-to-even included. */
  def renderFloating(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d.isPosInfinity) "inf"
    else if (d.isNegInfinity) "-inf"
    else if (d == 0.0) "0"
    else new java.math.BigDecimal(d)
      .round(new java.math.MathContext(16, java.math.RoundingMode.HALF_EVEN))
      .stripTrailingZeros.toPlainString

  /** Impala's timestamp rendering: no fraction when nanos are zero,
    * 9-digit fraction otherwise (`be/src/runtime/timestamp-value.cc`). */
  def renderTimestamp(t: java.sql.Timestamp): String = {
    val base = t.toLocalDateTime.format(
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    if (t.getNanos == 0) base else f"$base.${t.getNanos}%09d"
  }

  /** Render a row in the golden format: 'str' quoting, NULL, raw numerics.
    * A NULL in a string-typed column renders as `'NULL'` — the reference's
    * result verifier prints string columns through its str() path
    * (`tests/common/test_result_verifier.py`), and its fixtures encode
    * string nulls that way (e.g. outer-joins.test). */
  def renderRow(row: Row, schema: StructType): String =
    row.toSeq.zip(schema.fields).map {
      case (null, f) if f.dataType == StringType => "'NULL'"
      case (null, _) => "NULL"
      case (s: String, _) => "'" + s + "'"
      case (t: java.sql.Timestamp, _) => renderTimestamp(t)
      case (f: java.lang.Float, _) => renderFloating(f.toDouble)
      case (d: java.lang.Double, _) => renderFloating(d)
      case (d: java.math.BigDecimal, _) => d.toPlainString
      case (other, _) => other.toString
    }.mkString(",")

  /** Split a rendered/expected row on commas outside single quotes. */
  private def splitRow(line: String): Seq[String] = {
    val out = collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQ = false
    line.foreach {
      case '\'' => inQ = !inQ; sb += '\''
      case ',' if !inQ => out += sb.toString; sb.clear()
      case ch => sb += ch
    }
    out += sb.toString
    out.toSeq
  }

  /** Column-wise row comparison with the reference verifier's float policy
    * (`test_result_verifier.py:127-171`): float columns compare within 1e-4
    * absolute, double within 1e-9; everything else is exact text. A cell
    * spelled `regex:<pattern>` (the reference fixtures' cell-level escape,
    * e.g. `regex:.+KB` for file sizes) full-matches the rendered cell with
    * surrounding quotes stripped. */
  private def rowMatches(expected: String, got: String, schema: StructType,
                         multisetSep: Option[String] = None): Boolean = {
    val e = splitRow(expected); val g = splitRow(got)
    e.length == g.length && e.length == schema.length &&
      e.indices.forall { i =>
        val (ev, gv) = (e(i).trim, g(i).trim)
        if (ev.startsWith("regex:")) {
          val unquoted =
            if (gv.length >= 2 && gv.startsWith("'") && gv.endsWith("'"))
              gv.substring(1, gv.length - 1)
            else gv
          ev.stripPrefix("regex:").trim.r.matches(unquoted)
        } else schema(i).dataType match {
          case FloatType | DoubleType if ev != "NULL" && gv != "NULL" =>
            val eps = if (schema(i).dataType == FloatType) 1e-4 else 1e-9
            try {
              val (ed, gd) = (ev.toDouble, gv.toDouble)
              (ed.isNaN && gd.isNaN) || math.abs(ed - gd) <= eps
            } catch { case _: NumberFormatException => ev == gv }
          case StringType if ev != gv && multisetSep.isDefined &&
              ev.length >= 2 && ev.startsWith("'") && ev.endsWith("'") &&
              gv.length >= 2 && gv.startsWith("'") && gv.endsWith("'") =>
            // MULTISET_CELLS(sep): aggregation arrival order is
            // engine-undefined (group_concat), so an order-insensitive cell
            // compares as a multiset of tokens split on the separator.
            val sep = java.util.regex.Pattern.quote(multisetSep.get)
            def toks(s: String) =
              s.substring(1, s.length - 1).split(sep, -1).sorted.toSeq
            toks(ev) == toks(gv)
          case _ => ev == gv
        }
      }
  }

  /** `row_regex: <pattern>` — the reference verifier's escape hatch for
    * environment-specific cells (file sizes, NDV estimates). Matches the
    * WHOLE rendered row (the reference's `re.match` is start-anchored only;
    * full-match is the stricter choice and our fixtures are written for it). */
  private def isRowRegex(line: String): Boolean =
    line.trim.startsWith("row_regex:")
  private def rowRegexOf(line: String): scala.util.matching.Regex =
    line.trim.stripPrefix("row_regex:").trim.r

  sealed trait Outcome
  case object Pass extends Outcome
  case class Fail(reason: String) extends Outcome

  /** SETUP rows the reference's driver executes before the query
    * (`tests/common/impala_test_suite.py:217-235`): `RESET <t>` and
    * `DROP PARTITIONS <t>` both land on [[FunctionalDataset.resetTable]]. */
  private def runSetup(spark: SparkSession, rows: Seq[String]): Unit =
    rows.foreach { row =>
      if (row.startsWith("RESET"))
        FunctionalDataset.resetTable(spark, row.stripPrefix("RESET").trim)
      else if (row.startsWith("DROP PARTITIONS"))
        FunctionalDataset.resetTable(
          spark, row.stripPrefix("DROP PARTITIONS").trim)
      else throw new IllegalArgumentException(s"unsupported SETUP row: $row")
    }

  private val InsertRe =
    """(?is)\binsert\s+(into|overwrite)\s+(?:table\s+)?(?!directory\b)([A-Za-z_][\w.]*)""".r

  private val CreateNameRe =
    """(?is)\s*create\s+(?:external\s+)?table\s+(?:if\s+not\s+exists\s+)?([\w.]+)""".r

  /** CREATE_TABLE round-trip (the reference's
    * `tests/query_test/test_show_create_table.py`): execute the CREATE in
    * the fixture db, SHOW CREATE TABLE it, compare text with the location
    * URI replaced by the `$$location_uri$$` placeholder. */
  private def runCreateTableCase(spark: SparkSession,
                                 c: GoldenCase): Outcome = {
    val db = "show_create_table_test_db"
    try {
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
      val nameMatch = CreateNameRe.findFirstMatchIn(c.query)
        .getOrElse(return Fail("CREATE_TABLE: no table name in statement"))
      val name = nameMatch.group(1)
      val qualified = if (name.contains('.')) name else s"$db.$name"
      spark.sql(s"DROP TABLE IF EXISTS $qualified")
      // splice at the matched name's own span — an unanchored replaceFirst
      // would hit the name's text anywhere earlier in the statement
      spark.sql(c.query.substring(0, nameMatch.start(1)) + qualified +
        c.query.substring(nameMatch.end(1)))
      val actual = spark.sql(s"SHOW CREATE TABLE $qualified")
        .head().getString(0)
        .replaceAll("LOCATION '[^']*'", "LOCATION '\\$\\$location_uri\\$\\$'")
        .trim
      val expected = c.results.getOrElse(Nil).mkString("\n").trim
      if (actual == expected) Pass
      else Fail(
        s"SHOW CREATE TABLE mismatch:\nexpected:\n$expected\ngot:\n$actual")
    } catch { case e: Throwable =>
      Fail(s"CREATE_TABLE case failed: ${e.getMessage}")
    }
  }

  def run(spark: SparkSession, c: GoldenCase): Outcome = {
    if (c.createTable) return runCreateTableCase(spark, c)
    try runSetup(spark, c.setup)
    catch { case e: Throwable => return Fail(s"SETUP failed: ${e.getMessage}") }
    // `$TABLE` is the reference driver's format-dimension suffix (empty for
    // the canonical text/parquet dimension this corpus runs).
    val stmts = splitStatements(c.query.replace("$TABLE", ""))
    val ins = InsertRe.findFirstMatchIn(stmts.last)
    if (ins.isDefined && c.catchErr.isEmpty &&
        c.results.exists(rs => rs.forall(_.matches(""".*: \d+"""))))
      return runInsertCase(spark, c, stmts,
        overwrite = ins.get.group(1).equalsIgnoreCase("overwrite"),
        table = ins.get.group(2))
    // Multi-statement cases (DDL setup + final query) run sequentially; the
    // last statement's result is verified, as the reference driver does.
    val result: Either[Throwable, DataFrame] =
      try Right(stmts.map(spark.sql).last)
      catch { case e: Throwable => Left(e) }
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
        val rows =
          try df.collect()
          catch { case e: Throwable =>
            return Fail(s"execution failed: ${e.getMessage}") }
        c.types.foreach { expected =>
          val got = df.schema.fields.map(f => typeName(f.dataType)).toSeq
          if (got != expected.map(_.toLowerCase))
            return Fail(s"types mismatch: expected $expected, got $got")
        }
        c.results.foreach { expected =>
          val got = rows.map(renderRow(_, df.schema)).toSeq
          def lineMatches(er: String, gr: String): Boolean =
            if (isRowRegex(er)) rowRegexOf(er).matches(gr)
            else rowMatches(er, gr, df.schema, c.multisetSep)
          if (c.subset) {
            val missing = expected.filterNot(er =>
              got.exists(gr => lineMatches(er, gr)))
            if (missing.nonEmpty)
              return Fail(s"subset rows missing:\n missing: $missing\n " +
                s"got: ${got.sorted}")
          } else if (expected.exists(isRowRegex)) {
            if (got.length != expected.length)
              return Fail(s"results mismatch: expected ${expected.length} " +
                s"rows, got ${got.length}:\n got: ${got.sorted}")
            if (c.ordered) {
              val bad = expected.zip(got).filterNot {
                case (er, gr) => lineMatches(er, gr) }
              if (bad.nonEmpty)
                return Fail(s"results mismatch (ordered):\n $bad")
            } else {
              // literal lines claim their rows first; each row_regex then
              // consumes one distinct remaining row
              val remaining = scala.collection.mutable.ArrayBuffer(
                got.sorted: _*)
              val (regexes, literals) = expected.partition(isRowRegex)
              for (er <- literals.sorted) {
                val i = remaining.indexWhere(gr =>
                  rowMatches(er, gr, df.schema, c.multisetSep))
                if (i < 0) return Fail(s"results mismatch: no row for " +
                  s"'$er'\n unmatched: $remaining")
                remaining.remove(i)
              }
              // each row_regex must claim a DISTINCT remaining row, but a
              // greedy first-match lets a broad pattern steal the only row
              // a narrower one accepts — run an augmenting-path bipartite
              // matching over (regex, row) instead (fixture counts are tiny)
              val rs = regexes.toIndexedSeq
              val pats = rs.map(rowRegexOf)
              val rowOwner = Array.fill(remaining.length)(-1)
              def claim(ri: Int, seen: Array[Boolean]): Boolean =
                remaining.indices.exists { i =>
                  !seen(i) && pats(ri).matches(remaining(i)) && {
                    seen(i) = true
                    (rowOwner(i) < 0 || claim(rowOwner(i), seen)) && {
                      rowOwner(i) = ri; true
                    }
                  }
                }
              for (ri <- rs.indices)
                if (!claim(ri, Array.fill(remaining.length)(false)))
                  return Fail(s"results mismatch: no row for " +
                    s"'${rs(ri)}'\n unmatched: ${remaining.zipWithIndex
                      .collect { case (g, i) if rowOwner(i) < 0 => g }}")
              for (i <- remaining.indices.reverse if rowOwner(i) >= 0)
                remaining.remove(i)
            }
          } else {
            val (g, e) = if (c.ordered) (got, expected)
                         else (got.sorted, expected.sorted)
            if (g.length != e.length ||
                !g.zip(e).forall { case (gr, er) =>
                  rowMatches(er, gr, df.schema, c.multisetSep) })
              return Fail(s"results mismatch:\n expected: $e\n got:      $g")
          }
        }
        Pass
    }
  }

  /** Verify an INSERT case: RESULTS lines are `<partition-path>: <n>` — the
    * per-partition row counts the statement wrote, in the reference's
    * Hive-escaped path spelling (`year=2009/month=4/: 25`; empty for the
    * table root when unpartitioned). The reference driver reads these counts
    * from the insert response; here they are recovered from catalog state —
    * per-partition (count, content-hash) snapshots before/after:
    *  - INTO appends, so written = positive count delta per partition;
    *  - OVERWRITE replaces whole partitions, so written = partitions whose
    *    (count, hash) changed, reported at their AFTER count (an overwrite
    *    that rewrites byte-identical content is invisible to this check —
    *    no fixture does that, it would assert nothing).
    * The content hash is an order-insensitive sum of per-row xxhash64 over
    * the non-partition columns. */
  private def runInsertCase(spark: SparkSession, c: GoldenCase,
                            stmts: Seq[String], overwrite: Boolean,
                            table: String): Outcome = {
    import org.apache.spark.sql.functions._
    try {
      stmts.init.foreach(spark.sql)
      val cols = spark.catalog.listColumns(table).collect()
      val partCols = cols.filter(_.isPartition).map(_.name).toSeq
      val dataCols = cols.filterNot(_.isPartition).map(_.name).toSeq
      def snap(): Map[Seq[Any], (Long, Long)] = {
        val df = spark.table(table)
        val h = if (dataCols.isEmpty) lit(0L) else xxhash64(dataCols.map(col): _*)
        if (partCols.isEmpty) {
          val r = df.agg(count(lit(1)), coalesce(sum(h), lit(0L))).collect().head
          Map(Seq.empty[Any] -> ((r.getLong(0), r.getLong(1))))
        } else
          df.groupBy(partCols.map(col): _*)
            .agg(count(lit(1)), coalesce(sum(h), lit(0L)))
            .collect().map { r =>
              partCols.indices.map(r.get) ->
                ((r.getLong(partCols.length), r.getLong(partCols.length + 1)))
            }.toMap
      }
      val before = snap()
      spark.sql(stmts.last)
      val after = snap()
      def path(k: Seq[Any]): String = partCols.zip(k).map { case (n, v) =>
        val token = v match {
          case null | "" => "__HIVE_DEFAULT_PARTITION__"
          case other => escapePathName(other.toString)
        }
        s"$n=$token/"
      }.mkString
      val actual: Seq[String] =
        if (partCols.isEmpty) {
          val a = after(Nil)._1
          val b = before.getOrElse(Nil, (0L, 0L))._1
          Seq(s": ${if (overwrite) a else a - b}")
        } else if (overwrite)
          after.collect {
            case (k, v) if !before.get(k).contains(v) => s"${path(k)}: ${v._1}"
          }.toSeq
        else
          after.flatMap { case (k, (cnt, _)) =>
            val d = cnt - before.get(k).map(_._1).getOrElse(0L)
            if (d > 0) Some(s"${path(k)}: $d") else None
          }.toSeq
      val expected = c.results.getOrElse(Nil)
      if (actual.sorted == expected.sorted) Pass
      else Fail("insert results mismatch:\n expected: " +
        s"${expected.sorted}\n got:      ${actual.sorted}")
    } catch {
      case e: Throwable => Fail(s"insert case failed: ${e.getMessage}")
    }
  }

  /** Hive's partition-path escaping as the reference fixtures spell it
    * (`s2=%2F%5C%25./`): control chars and the reserved set below become
    * uppercase `%XX`; space, `+`, `_`, `.`, `~` pass through. */
  private val PathEscapeChars = "\"#%'*/:=?\\{[]^".toSet
  private[testing] def escapePathName(s: String): String = s.flatMap { ch =>
    if (ch < ' ' || PathEscapeChars(ch)) f"%%${ch.toInt}%02X" else ch.toString
  }
}
