package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.HyperLogLogPlusPlus
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Impala-dialect function pack.
  *
  * The reference's builtin catalog is 275 signatures registered in
  * `fe/src/main/java/com/cloudera/impala/catalog/BuiltinsDb.java` and
  * `common/function-registry/impala_functions.py:55-489`. Most are 1:1 with
  * `org.apache.spark.sql.functions`; this object registers the names Spark
  * lacks, each as a *builder of stock Catalyst expressions* (or our own
  * codegen'd expressions) so nothing here leaves whole-stage codegen.
  *
  * Registration is idempotent and works both via [[graft.GraftExtensions]]
  * (sessions we build) and [[register]] (sessions built by an external
  * harness).
  */
object GraftFunctions {

  private[graft] def toCol(e: Expression): Column = ColumnBridge.column(e)
  private[graft] def toExpr(c: Column): Expression = ColumnBridge.expression(c)

  /** name -> Catalyst expression builder (arity-checked at build time). */
  val injections: Seq[(String, FunctionBuilder)] = Seq(
    // --- utility: fnv_hash (be/src/exprs/utility-functions.cc) ---
    "fnv_hash" -> ((args: Seq[Expression]) => FnvHashExpression(args.head)),

    // --- string aliases (impala_functions.py:149-212) ---
    "strleft" -> ((args: Seq[Expression]) => Left(args(0), args(1))),
    "strright" -> ((args: Seq[Expression]) => Right(args(0), args(1))),

    // --- conditional (be/src/exprs/conditional-functions.cc) ---
    // Impala's isnull(a,b) is 2-ary ifnull; Spark's isnull(a) is the unary
    // predicate — support both arities under one name.
    "isnull" -> ((args: Seq[Expression]) =>
      if (args.length == 1) IsNull(args.head) else Coalesce(args)),
    "zeroifnull" -> ((args: Seq[Expression]) =>
      Coalesce(Seq(args.head, Cast(Literal(0), args.head.dataType)))),
    "nullifzero" -> ((args: Seq[Expression]) =>
      If(EqualTo(args.head, Cast(Literal(0), args.head.dataType)),
         Literal.create(null, args.head.dataType), args.head)),

    // --- math (impala_functions.py:56-147) ---
    "quotient" -> ((args: Seq[Expression]) =>
      IntegralDivide(Cast(args(0), LongType), Cast(args(1), LongType))),
    "fmod" -> ((args: Seq[Expression]) => Remainder(args(0), args(1))),
    "is_inf" -> ((args: Seq[Expression]) =>
      EqualTo(Abs(Cast(args.head, DoubleType)), Literal(Double.PositiveInfinity))),
    "is_nan" -> ((args: Seq[Expression]) => IsNaN(args.head)),

    // --- timestamp (be/src/exprs/timestamp-functions.cc) ---
    "dayname" -> ((args: Seq[Expression]) =>
      DateFormatClass(args.head, Literal("EEEE"))),

    // --- aggregates (BuiltinsDb.java:241-251): ndv = HLL estimate ---
    "ndv" -> ((args: Seq[Expression]) =>
      HyperLogLogPlusPlus(args.head).toAggregateExpression())
  )

  /** Idempotent per-session registration (for externally built sessions). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    injections.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }

  // ---- Column-level API (usable without any registration) ----
  def fnv_hash(c: Column): Column = FnvHash(c)
  def is_inf(c: Column): Column =
    toCol(EqualTo(Abs(Cast(toExpr(c), DoubleType)), Literal(Double.PositiveInfinity)))
  def strleft(c: Column, n: Column): Column = toCol(Left(toExpr(c), toExpr(n)))
  def strright(c: Column, n: Column): Column = toCol(Right(toExpr(c), toExpr(n)))
  def zeroifnull(c: Column): Column = {
    val e = toExpr(c)
    toCol(Coalesce(Seq(e, Cast(Literal(0), e.dataType))))
  }
  def nullifzero(c: Column): Column = {
    val e = toExpr(c)
    toCol(If(EqualTo(e, Cast(Literal(0), e.dataType)), Literal.create(null, e.dataType), e))
  }
}
