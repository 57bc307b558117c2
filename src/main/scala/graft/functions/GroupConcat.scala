package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact streaming `group_concat(expr[, separator])` — Impala semantics
  * (`be/src/exprs/aggregate-functions.cc:220-239` StringConcat, registered
  * `fe/.../catalog/BuiltinsDb.java:359-374`): concatenate non-null values in
  * arrival order (engine-undefined across parallel plans, exactly as in the
  * reference's distributed merge). The separator is a per-ROW expression —
  * each appended value is preceded by ITS row's separator value — and a NULL
  * separator falls back to the default `", "`
  * (DEFAULT_STRING_CONCAT_DELIM), so `group_concat(c, NULL)` behaves like
  * the one-argument form, and non-constant separators are legal
  * (aggregation.test's `group_concat(trim(c), trim(c))`).
  *
  * The buffer carries (value, separator) pairs so partial aggregation
  * stays exact: merge concatenates pair lists, and the final render drops
  * only the FIRST value's separator — the same string the reference's
  * single stream of updates produces, modulo arrival order.
  *
  * The composable alternative `array_join(array_sort(collect_list(x)), sep)`
  * gives deterministic output and is what our oracle-checked query uses
  * (q_group_concat); this aggregate exists for dialect-level parity with
  * queries that call group_concat directly.
  */
case class GroupConcat(
    child: Expression,
    sepExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(UTF8String, UTF8String)]]
  with BinaryLike[Expression] {

  private val DefaultSep = UTF8String.fromString(", ")

  override def left: Expression = child
  override def right: Expression = sepExpr

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // the reference's group_concat takes STRING only (BuiltinsDb) — a
    // non-string child would otherwise ClassCastException mid-execution
    if (child.dataType != StringType && child.dataType != NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"group_concat input must be a string, got ${child.dataType}")
    else if (sepExpr.dataType != StringType && sepExpr.dataType != NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"group_concat separator must be a string, got ${sepExpr.dataType}")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): ArrayBuffer[(UTF8String, UTF8String)] =
    ArrayBuffer.empty[(UTF8String, UTF8String)]

  override def update(buf: ArrayBuffer[(UTF8String, UTF8String)],
                      row: InternalRow): ArrayBuffer[(UTF8String, UTF8String)] = {
    val v = child.eval(row)
    if (v != null) {
      val sep = sepExpr.eval(row) match {
        case null => DefaultSep
        case s => s.asInstanceOf[UTF8String].clone()
      }
      buf += ((v.asInstanceOf[UTF8String].clone(), sep))
    }
    buf
  }

  override def merge(b1: ArrayBuffer[(UTF8String, UTF8String)],
                     b2: ArrayBuffer[(UTF8String, UTF8String)]): ArrayBuffer[(UTF8String, UTF8String)] =
    b1 ++= b2

  override def eval(buf: ArrayBuffer[(UTF8String, UTF8String)]): Any =
    if (buf.isEmpty) null
    else {
      val sb = new java.lang.StringBuilder
      var first = true
      buf.foreach { case (v, sep) =>
        if (!first) sb.append(sep.toString)
        sb.append(v.toString)
        first = false
      }
      UTF8String.fromString(sb.toString)
    }

  override def serialize(buf: ArrayBuffer[(UTF8String, UTF8String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (v, sep) =>
      val vb = v.getBytes; val sb = sep.getBytes
      out.writeInt(vb.length); out.write(vb)
      out.writeInt(sb.length); out.write(sb)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(UTF8String, UTF8String)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(UTF8String, UTF8String)](n)
    var i = 0
    while (i < n) {
      val vlen = bb.getInt; val v = new Array[Byte](vlen); bb.get(v)
      val slen = bb.getInt; val s = new Array[Byte](slen); bb.get(s)
      buf += ((UTF8String.fromBytes(v), UTF8String.fromBytes(s)))
      i += 1
    }
    buf
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(o: Int): GroupConcat =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GroupConcat =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GroupConcat =
    copy(child = l, sepExpr = r)
  override def prettyName: String = "group_concat"
}
