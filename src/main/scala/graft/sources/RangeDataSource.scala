package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal DataSource V2 source with predicate pushdown — the Spark-native
  * equivalent of the reference's external-data-source API
  * (`common/thrift/ExternalDataSource.thrift`, `ext-data-source/`,
  * `be/src/exec/data-source-scan-node.cc`): a pluggable scan that receives
  * serialized predicates and returns batches.
  *
  * The source synthesizes rows `(id bigint, tag string)` for id in
  * [0, n); range predicates on `id` are consumed at planning time
  * (SupportsPushDownFilters) and shrink the generated split ranges — the
  * same contract as the reference's `prepare()/open()/getNext()` with
  * pushed `TComparisonOp` predicates, expressed through Spark's native
  * connector API. Splits into `partitions` input partitions to prove the
  * parallel-scan path.
  */
class RangeDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RangeTable(
      properties.asScala.getOrElse("n", "1000").toLong,
      properties.asScala.getOrElse("partitions", "4").toInt)
}

object RangeDataSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("tag", StringType, nullable = false)))
}

class RangeTable(n: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_range($n)"
  override def schema(): StructType = RangeDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeScanBuilder(n, partitions)
}

class RangeScanBuilder(n: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownFilters {

  private var lo = 0L
  private var hi = n // exclusive
  private var pushed: Array[Filter] = Array.empty

  /** Consume id-range filters; everything else stays with Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (consumed, rest) = filters.partition {
      case GreaterThan("id", _: java.lang.Long) => true
      case GreaterThanOrEqual("id", _: java.lang.Long) => true
      case LessThan("id", _: java.lang.Long) => true
      case LessThanOrEqual("id", _: java.lang.Long) => true
      case _ => false
    }
    consumed.foreach {
      case GreaterThan("id", v: java.lang.Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: java.lang.Long) => lo = math.max(lo, v)
      case LessThan("id", v: java.lang.Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: java.lang.Long) => hi = math.min(hi, v + 1)
      case _ => ()
    }
    pushed = consumed
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new RangeScan(lo, hi, partitions)
}

case class RangeInputPartition(start: Long, end: Long) extends InputPartition

class RangeScan(lo: Long, hi: Long, partitions: Int) extends Scan with Batch {
  override def readSchema(): StructType = RangeDataSource.schema
  override def toBatch: Batch = this
  override def description(): String = s"graft_range[$lo,$hi)"

  override def planInputPartitions(): Array[InputPartition] = {
    val span = math.max(0L, hi - lo)
    val step = math.max(1L, (span + partitions - 1) / partitions)
    (lo until hi by step)
      .map(s => RangeInputPartition(s, math.min(s + step, hi)))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[RangeInputPartition]
      new PartitionReader[InternalRow] {
        private var cur = p.start - 1
        override def next(): Boolean = { cur += 1; cur < p.end }
        override def get(): InternalRow =
          InternalRow(cur, UTF8String.fromString(if (cur % 2 == 0) "even" else "odd"))
        override def close(): Unit = ()
      }
    }
}
