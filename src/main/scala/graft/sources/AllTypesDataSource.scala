package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The planner-test external data source — Spark-native analogue of the
  * reference's `ext-data-source/test/.../AllTypesDataSource.java`, the
  * pluggable source its PlannerTest `data-source-tables.test` plans
  * against. Two reference behaviors are mirrored through Spark's native
  * connector contract:
  *
  *  - *partial conjunct acceptance*: the reference source accepts every
  *    other offered conjunct "for testing planning"
  *    (AllTypesDataSource.java:101-104); [[AllTypesScanBuilder.pushFilters]]
  *    does the same with the filters Spark offers — even-indexed
  *    evaluable filters are consumed, the rest return to Spark. Unlike the
  *    reference (which never evaluates them, a fixture-only artifact), the
  *    accepted filters ARE applied to the generated rows — Spark's
  *    contract trusts the source for what it does not get back.
  *  - *trivial deterministic rows of all supported types*: 5000 rows with
  *    the reference generator's per-type value pattern
  *    (AllTypesDataSource.java:231-287 `addRow`: integral types are the row
  *    index mod a type-sized base, string is the row index with every 5th
  *    row NULL), split over 4 input partitions to keep the parallel-scan
  *    path honest.
  *
  * Registered in the session catalog as `functional.alltypes_datasource`
  * (`CREATE TABLE ... USING graft.sources.AllTypesDataSource`), which is
  * how the PlannerTest fixture's queries reach it.
  */
class AllTypesDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AllTypesDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new AllTypesTable(
      properties.asScala.getOrElse("n", "5000").toInt)
}

object AllTypesDataSource {
  /** The full fixture schema (`testdata/bin/create-data-source-table.sql`):
    * the 9 columns the planner fixture predicates touch plus the
    * timestamp/decimal tail the QueryTest fixture scans. */
  val schema: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = true),
    StructField("bool_col", BooleanType, nullable = true),
    StructField("tinyint_col", ByteType, nullable = true),
    StructField("smallint_col", ShortType, nullable = true),
    StructField("int_col", IntegerType, nullable = true),
    StructField("bigint_col", LongType, nullable = true),
    StructField("float_col", FloatType, nullable = true),
    StructField("double_col", DoubleType, nullable = true),
    StructField("timestamp_col", TimestampType, nullable = true),
    StructField("string_col", StringType, nullable = true),
    StructField("dec_col1", DecimalType(9, 0), nullable = true),
    StructField("dec_col2", DecimalType(10, 0), nullable = true),
    StructField("dec_col3", DecimalType(20, 10), nullable = true),
    StructField("dec_col4", DecimalType(38, 37), nullable = true),
    StructField("dec_col5", DecimalType(10, 5), nullable = true)))

  /** The reference generator's DECIMAL pattern
    * (AllTypesDataSource.java:281-287): unscaled = (10^p - (i+1)) mod 10^p,
    * negated on even rows, at the column's scale. */
  private def dec(i: Int, precision: Int, scale: Int): Decimal = {
    val maxUnscaled = java.math.BigInteger.TEN.pow(precision)
    var v = maxUnscaled.subtract(java.math.BigInteger.valueOf(i + 1L))
      .mod(maxUnscaled)
    if (i % 2 == 0) v = v.negate()
    Decimal(new java.math.BigDecimal(v, scale), precision, scale)
  }

  /** Column value for row i — the reference generator's pattern
    * (AllTypesDataSource.java:231-287). `null` for string_col on every 5th
    * row, like the reference's; TIMESTAMP is `new Timestamp(i)` (epoch
    * millis = i, returned here as catalyst micros). NOTE the reference's
    * own QueryTest expectations are internally inconsistent on bigint_col
    * (its `select *` case shows 4294967295/0 by row parity, which no
    * generator in the tree produces; its projection case shows i*10,
    * which is what AllTypesDataSource.java:249-252 computes) — this port
    * follows the in-tree generator consistently. */
  def value(colName: String, i: Int): Any = colName match {
    case "id" => i
    case "bool_col" => i % 2 == 0
    case "tinyint_col" => (i % 10).toByte
    case "smallint_col" => (i % 100).toShort
    case "int_col" => i
    case "bigint_col" => i.toLong * 10L
    case "float_col" => (1.1d * i).toFloat // (float)(1.1 * currRow_), .java:258
    case "double_col" => i.toDouble
    case "timestamp_col" => i.toLong * 1000L // epoch millis i, as micros
    case "string_col" => if (i % 5 == 0) null else i.toString
    case "dec_col1" => dec(i, 9, 0)
    case "dec_col2" => dec(i, 10, 0)
    case "dec_col3" => dec(i, 20, 10)
    case "dec_col4" => dec(i, 38, 37)
    case "dec_col5" => dec(i, 10, 5)
    case other => throw new IllegalArgumentException(other)
  }

  /** Can [[eval]] decide this filter? (the source must never accept a
    * filter it cannot apply — Spark will not re-check it). */
  def evaluable(f: Filter): Boolean = f match {
    case EqualTo(c, v) => scalar(c, v)
    case GreaterThan(c, v) => scalar(c, v)
    case GreaterThanOrEqual(c, v) => scalar(c, v)
    case LessThan(c, v) => scalar(c, v)
    case LessThanOrEqual(c, v) => scalar(c, v)
    case In(c, vs) => vs.forall(scalar(c, _))
    case IsNull(c) => known(c)
    case IsNotNull(c) => known(c)
    case Not(child) => evaluable(child)
    case And(l, r) => evaluable(l) && evaluable(r)
    case Or(l, r) => evaluable(l) && evaluable(r)
    case _ => false
  }

  private def known(c: String): Boolean =
    schema.fieldNames.contains(c)
  private def scalar(c: String, v: Any): Boolean =
    known(c) && (v match {
      case null => false
      case _: Number | _: String | _: Boolean => true
      case _ => false
    })

  /** Evaluate a filter against row i with SQL three-valued logic (the
    * generated string_col is NULL on every 5th row): a comparison against a
    * NULL cell is UNKNOWN, which the row-emission boundary treats as false.
    * Numeric comparisons go through double (every generated value fits
    * exactly or compares consistently on both sides); strings compare
    * lexicographically. */
  def eval(f: Filter, i: Int): Boolean = eval3(f, i).contains(true)

  /** None = UNKNOWN (a NULL operand below a comparison). */
  private def eval3(f: Filter, i: Int): Option[Boolean] = f match {
    case EqualTo(c, v) => cmp(c, v, i).map(_ == 0)
    case GreaterThan(c, v) => cmp(c, v, i).map(_ > 0)
    case GreaterThanOrEqual(c, v) => cmp(c, v, i).map(_ >= 0)
    case LessThan(c, v) => cmp(c, v, i).map(_ < 0)
    case LessThanOrEqual(c, v) => cmp(c, v, i).map(_ <= 0)
    case In(c, vs) =>
      val hits = vs.map(v => cmp(c, v, i).map(_ == 0))
      if (hits.exists(_.contains(true))) Some(true)
      else if (hits.contains(None)) None
      else Some(false)
    case IsNull(c) => Some(value(c, i) == null)
    case IsNotNull(c) => Some(value(c, i) != null)
    case Not(child) => eval3(child, i).map(!_)
    case And(l, r) => (eval3(l, i), eval3(r, i)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Or(l, r) => (eval3(l, i), eval3(r, i)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case other => throw new IllegalStateException(s"accepted unevaluable $other")
  }

  private def cmp(colName: String, v: Any, i: Int): Option[Int] = {
    val cell = value(colName, i)
    if (cell == null || v == null) None
    else Some((cell, v) match {
      case (a: String, b: String) => a.compareTo(b)
      case (a: Boolean, b: Boolean) => java.lang.Boolean.compare(a, b)
      case (a, b: Number) =>
        java.lang.Double.compare(toD(a), b.doubleValue())
      case (a, b) => a.toString.compareTo(b.toString)
    })
  }
  private def toD(a: Any): Double = a match {
    case n: Number => n.doubleValue()
    case d: Decimal => d.toDouble
    case b: Boolean => if (b) 1d else 0d
    case s: String => s.toDouble
  }

  /** The VALIDATE_PREDICATES## protocol
    * (AllTypesDataSource.java:115-163): when the first string_col equality
    * carries a `VALIDATE_PREDICATES##slot OP val && ...` spec, the source
    * accepts EVERY offered conjunct (so the engine does not re-apply them
    * to the dummy row), validates the remaining pushed predicates against
    * the spec, and returns exactly one row whose string_col is 'SUCCESS'
    * or a failure description. Adaptations for the Spark contract:
    * IsNotNull conjuncts (Spark-added constraints the reference's thrift
    * predicate list never contains) are dropped before matching, and the
    * comparison is order-insensitive (a multiset) — the reference matches
    * positionally, but Spark's optimizer does not guarantee conjunct order
    * across versions, and the protocol's intent is "exactly these
    * predicates arrived", which the multiset captures. */
  def validateSpec(filters: Array[Filter]): Option[String] =
    filters.collectFirst {
      case EqualTo("string_col", s: String)
          if s.toUpperCase.startsWith("VALIDATE_PREDICATES##") =>
        s.split("##", 2)(1)
    }

  def validateResult(spec: String, filters: Array[Filter]): String = {
    def render(f: Filter): Option[String] = f match {
      case EqualTo(c, v: Number) => Some(s"${c.toUpperCase} EQ $v")
      case LessThan(c, v: Number) => Some(s"${c.toUpperCase} LT $v")
      case GreaterThan(c, v: Number) => Some(s"${c.toUpperCase} GT $v")
      case LessThanOrEqual(c, v: Number) => Some(s"${c.toUpperCase} LE $v")
      case GreaterThanOrEqual(c, v: Number) => Some(s"${c.toUpperCase} GE $v")
      case Not(EqualTo(c, v: Number)) => Some(s"${c.toUpperCase} NE $v")
      case _ => None
    }
    val actual = filters.toSeq
      .filter {
        case EqualTo("string_col", s: String) =>
          !s.toUpperCase.startsWith("VALIDATE_PREDICATES##")
        case _: IsNotNull => false
        case _ => true
      }
    val actualRendered = actual.map(f => render(f).getOrElse(f.toString))
    val expected = spec.split("&&").map(_.trim.split("\\s+")
      .map(_.toUpperCase).mkString(" ")).toSeq
    if (expected.sorted == actualRendered.sorted) "SUCCESS"
    else s"Failed predicate, expected=${expected.mkString(" && ")} " +
      s"actual=${actualRendered.mkString(" && ")}"
  }
}

class AllTypesTable(n: Int) extends Table with SupportsRead {
  override def name(): String = "alltypes_datasource"
  override def schema(): StructType = AllTypesDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AllTypesScanBuilder(n)
}

class AllTypesScanBuilder(n: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var accepted: Array[Filter] = Array.empty
  private var projected: StructType = AllTypesDataSource.schema

  private var validate: Option[String] = None

  /** The reference's rule (AllTypesDataSource.java:101-104): accept every
    * other offered conjunct — restricted here to filters the source can
    * actually evaluate, since Spark will not re-check accepted ones. In
    * VALIDATE_PREDICATES mode (AllTypesDataSource.java:91-105) every
    * conjunct is accepted instead, so the engine cannot re-apply them to
    * the dummy result row. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    AllTypesDataSource.validateSpec(filters) match {
      case Some(spec) =>
        validate = Some(AllTypesDataSource.validateResult(spec, filters))
        accepted = filters
        Array.empty
      case None =>
        val (candidates, unevaluable) =
          filters.partition(AllTypesDataSource.evaluable)
        val (takeIdx, restIdx) =
          candidates.zipWithIndex.partition(_._2 % 2 == 0)
        accepted = takeIdx.map(_._1)
        restIdx.map(_._1) ++ unevaluable
    }
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    projected = StructType(
      AllTypesDataSource.schema.fields.filter(f =>
        requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new AllTypesScan(n, accepted, projected, validate)
}

case class AllTypesInputPartition(start: Int, end: Int) extends InputPartition

class AllTypesScan(n: Int, accepted: Array[Filter], projected: StructType,
                   validate: Option[String] = None)
    extends Scan with Batch {
  /** Runner hook: plan-shape parity reads the pushed set from here. */
  def pushedFilterSeq: Seq[Filter] = accepted.toSeq
  def dsTableName: String = "alltypes_datasource"

  override def readSchema(): StructType = projected
  override def toBatch: Batch = this
  override def description(): String =
    s"alltypes_datasource pushed=[${accepted.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    // validate mode: one dummy row, one partition
    if (validate.isDefined) return Array(AllTypesInputPartition(0, 1))
    val parts = 4
    val step = math.max(1, (n + parts - 1) / parts)
    (0 until n by step)
      .map(s => AllTypesInputPartition(s, math.min(s + step, n)))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val filters = accepted
    val cols = projected.fieldNames
    val validateRow = validate
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[AllTypesInputPartition]
      validateRow match {
        case Some(result) => new PartitionReader[InternalRow] {
          // the single validation-result row: only string_col may be
          // projected (the reference asserts the same, .java:178-181)
          private var emitted = false
          override def next(): Boolean = !emitted && { emitted = true; true }
          override def get(): InternalRow = InternalRow.fromSeq(
            cols.toIndexedSeq.map {
              case "string_col" => UTF8String.fromString(result)
              case _ => null
            })
          override def close(): Unit = ()
        }
        case None => new PartitionReader[InternalRow] {
          private var cur = p.start - 1
          override def next(): Boolean = {
            cur += 1
            while (cur < p.end && !filters.forall(AllTypesDataSource.eval(_, cur)))
              cur += 1
            cur < p.end
          }
          override def get(): InternalRow = InternalRow.fromSeq(
            cols.toIndexedSeq.map { c =>
              AllTypesDataSource.value(c, cur) match {
                case s: String => UTF8String.fromString(s)
                case other => other
              }
            })
          override def close(): Unit = ()
        }
      }
    }
  }
}
