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
  * (`be/src/exprs/aggregate-functions.h:65-68`, registered
  * `fe/.../catalog/BuiltinsDb.java:359-374`): concatenate non-null values
  * with the separator, arrival order (engine-undefined across parallel
  * plans, exactly as in the reference's distributed merge).
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
  extends TypedImperativeAggregate[ArrayBuffer[UTF8String]]
  with BinaryLike[Expression] {

  override def left: Expression = child
  override def right: Expression = sepExpr

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (!sepExpr.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "group_concat separator must be a constant")
    else if (sepExpr.dataType != StringType && sepExpr.dataType != NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"group_concat separator must be a string, got ${sepExpr.dataType}")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  /** Constant separator (sepExpr is checked foldable); NULL separator makes
    * the whole result NULL (Impala's NULL-propagating behavior). */
  private lazy val separator: Option[String] =
    Option(sepExpr.eval(InternalRow.empty)).map(_.asInstanceOf[UTF8String].toString)

  override def createAggregationBuffer(): ArrayBuffer[UTF8String] =
    ArrayBuffer.empty[UTF8String]

  override def update(buf: ArrayBuffer[UTF8String], row: InternalRow): ArrayBuffer[UTF8String] = {
    val v = child.eval(row)
    if (v != null) buf += v.asInstanceOf[UTF8String].clone()
    buf
  }

  override def merge(b1: ArrayBuffer[UTF8String], b2: ArrayBuffer[UTF8String]): ArrayBuffer[UTF8String] =
    b1 ++= b2

  override def eval(buf: ArrayBuffer[UTF8String]): Any =
    separator match {
      case None => null // NULL separator propagates
      case Some(sep) =>
        if (buf.isEmpty) null
        else UTF8String.fromString(buf.map(_.toString).mkString(sep))
    }

  override def serialize(buf: ArrayBuffer[UTF8String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { s =>
      val b = s.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[UTF8String] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[UTF8String](n)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf += UTF8String.fromBytes(arr)
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
