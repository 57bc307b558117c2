package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Flajolet–Martin probabilistic distinct counting — the Spark-native
  * equivalent of Impala's `distinctpc` / `distinctpcsa` builtins
  * (`be/src/exprs/aggregate-functions.h:70-82`: NUM_PC_BITMAPS=64 bitmaps
  * of PC_BITMAP_LENGTH=32 bits, φ=0.77351, per the 1985 FM paper).
  *
  * Implemented from the published algorithm (Flajolet & Martin,
  * "Probabilistic Counting Algorithms for Data Base Applications"):
  *
  *  - PC (direct probabilistic counting): every value updates all 64
  *    bitmaps, each with an independent hash; estimate = 2^(mean R) / φ
  *    where R is each bitmap's first-zero-bit index.
  *  - PCSA (stochastic averaging): one hash per value; low bits select the
  *    bitmap, remaining bits give the geometric position; estimate =
  *    m·2^(mean R)/φ. ~64× cheaper per row — the variant you'd run at
  *    100 TB (one hash + one bit-set per value, 256-byte state).
  *
  * The buffer is a flat 64×int bitmap array (256 bytes), fixed-size and
  * merge-by-OR — exactly the shape partial aggregation wants: map-side
  * partials reduce a shuffle to 256 bytes per group per partition.
  */
abstract class FlajoletMartinBase
    extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  protected final val NumBitmaps = 64
  protected final val BitmapLength = 32
  protected final val Phi = 0.77351d

  override def createAggregationBuffer(): Array[Int] = new Array[Int](NumBitmaps)

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < NumBitmaps) { b1(i) |= b2(i); i += 1 }
    b1
  }

  /** Index of the lowest zero bit of the 32-bit bitmap. */
  private def firstZero(bm: Int): Int = {
    val inv = ~bm
    if (inv == 0) BitmapLength else java.lang.Integer.numberOfTrailingZeros(inv)
  }

  protected def meanFirstZero(buf: Array[Int]): Double = {
    var sum = 0L
    var i = 0
    while (i < NumBitmaps) { sum += firstZero(buf(i)); i += 1 }
    sum.toDouble / NumBitmaps
  }

  /** Zero observed values (all bitmaps empty) estimates 0, not 2^0/φ —
    * matching the reference's empty-input result (distinct-estimate.test:
    * `distinctpc(field) from EmptyTable` → 0). The double estimate
    * truncates toward zero, as the reference's PcFinalize/PcsaFinalize
    * int64_t cast does (`aggregate-functions.cc`), not round-to-nearest. */
  protected def estimate(buf: Array[Int], scale: Double): Long =
    if (buf.forall(_ == 0)) 0L
    else (scale * math.pow(2.0, meanFirstZero(buf)) / Phi).toLong

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(NumBitmaps * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(NumBitmaps)(bb.getInt)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  /** Murmur3 fmix64 avalanche finalizer: FNV's low bits are weakly mixed
    * (multiply only propagates upward), but FM reads trailing zeros —
    * without this the geometric positions skew and PCSA overestimates ~50%. */
  protected def fmix64(v: Long): Long = {
    var h = v
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** Value → 64-bit hash. Fixed-width numerics go through the
    * allocation-free byte-iterating FNV (native little-endian slot layout,
    * like the reference's RawValue::GetHashValue) — the per-row ByteBuffer
    * round-trip showed up as the aggregate's hot allocation site. */
  protected def valueHash(input: Any): Long = {
    val raw = input match {
      case s: UTF8String => FnvHash.hashBytes(s.getBytes)
      case b: Array[Byte] => FnvHash.hashBytes(b)
      case i: java.lang.Integer => FnvHash.hashLong(i.toLong, 4)
      case l: java.lang.Long => FnvHash.hashLong(l, 8)
      case other =>
        FnvHash.hashBytes(UTF8String.fromString(String.valueOf(other)).getBytes)
    }
    fmix64(raw)
  }
}

/** distinctpc: all-bitmaps probabilistic counting (`BuiltinsDb.java:252-262`). */
case class DistinctPc(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends FlajoletMartinBase {

  override def update(buf: Array[Int], row: InternalRow): Array[Int] = {
    val v = child.eval(row)
    if (v != null) {
      val h = valueHash(v)
      var i = 0
      while (i < NumBitmaps) {
        // Independent per-bitmap hash: remix with the bitmap index.
        val hi = fmix64(h ^ (i.toLong * 0x9e3779b97f4a7c15L))
        val pos = java.lang.Long.numberOfTrailingZeros(hi | (1L << (BitmapLength - 1)))
        buf(i) |= (1 << pos)
        i += 1
      }
    }
    buf
  }

  override def eval(buf: Array[Int]): Any = estimate(buf, 1.0)

  override def withNewMutableAggBufferOffset(o: Int): DistinctPc =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DistinctPc =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): DistinctPc =
    copy(child = c)
  override def prettyName: String = "distinctpc"
}

/** distinctpcsa: stochastic-averaging variant (`BuiltinsDb.java:263-272`). */
case class DistinctPcsa(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends FlajoletMartinBase {

  override def update(buf: Array[Int], row: InternalRow): Array[Int] = {
    val v = child.eval(row)
    if (v != null) {
      val h = valueHash(v)
      val idx = (h & (NumBitmaps - 1)).toInt
      val rest = h >>> 6
      val pos = java.lang.Long.numberOfTrailingZeros(rest | (1L << (BitmapLength - 1)))
      buf(idx) |= (1 << pos)
    }
    buf
  }

  override def eval(buf: Array[Int]): Any = estimate(buf, NumBitmaps.toDouble)

  override def withNewMutableAggBufferOffset(o: Int): DistinctPcsa =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DistinctPcsa =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): DistinctPcsa =
    copy(child = c)
  override def prettyName: String = "distinctpcsa"
}
