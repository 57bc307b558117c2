package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}

/** `sleep(ms)` — blocks the calling thread for `ms` milliseconds and returns
  * true (reference: `be/src/exprs/utility-functions.cc` Sleep). Marked
  * [[Nondeterministic]] so constant folding cannot collapse the per-row
  * evaluation into a single plan-time nap; a throttling/test utility, never
  * a hot-path expression, so interpreted eval (CodegenFallback) is fine.
  */
case class Sleep(child: Expression)
    extends UnaryExpression with Nondeterministic with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "sleep"

  override protected def initializeInternal(partitionIndex: Int): Unit = {}

  override protected def evalInternal(input: InternalRow): Any = {
    val ms = child.eval(input)
    if (ms != null) Thread.sleep(ms.asInstanceOf[Number].longValue())
    true
  }

  override protected def withNewChildInternal(newChild: Expression): Sleep =
    copy(child = newChild)
}
