package org.apache.spark.sql.hive.graft

import org.apache.hadoop.hive.ql.exec.UDF
import org.apache.hadoop.hive.ql.udf.generic.GenericUDF
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.hive.{HiveGenericUDF, HiveSimpleUDF}
import org.apache.spark.sql.hive.HiveShim.HiveFunctionWrapper

/** Builds spark-hive's Hive-UDF call expressions for a compiled Hive UDF
  * class — the Spark analogue of the reference's Hive-UDF executor
  * (`be/src/exprs/hive-udf-call.cc:217`, `fe/.../hive/executor/`).
  *
  * Spark's stock wiring for these expressions (`HiveUDFExpressionBuilder`)
  * only activates under the Hive catalog; graft sessions run the in-memory
  * catalog, so this bridge (package-located for `private[hive]` access, like
  * [[org.apache.spark.sql.graft.ColumnBridge]]) constructs the same
  * `HiveSimpleUDF` / `HiveGenericUDF` expressions directly. Execution,
  * ObjectInspector marshalling, and deterministic/foldable handling are all
  * spark-hive's own.
  */
object HiveUdfBridge {
  def hiveUdf(name: String, className: String,
              children: Seq[Expression]): Expression = {
    val clazz = org.apache.spark.util.Utils
      .getContextOrSparkClassLoader.loadClass(className)
    if (classOf[GenericUDF].isAssignableFrom(clazz))
      HiveGenericUDF(name, HiveFunctionWrapper(className), children)
    else if (classOf[UDF].isAssignableFrom(clazz))
      HiveSimpleUDF(name, HiveFunctionWrapper(className), children)
    else throw new IllegalArgumentException(
      s"$className implements neither o.a.h.hive.ql.exec.UDF nor GenericUDF")
  }
}
