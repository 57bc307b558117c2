package graft.functions

import org.apache.spark.sql.SparkSession

/** `CREATE FUNCTION <name> AS '<Hive UDF class>'` for graft sessions —
  * registers a compiled Hive `UDF`/`GenericUDF` class under a SQL name
  * (reference: `be/src/exprs/hive-udf-call.cc:217` + CreateUdfStmt,
  * `fe/src/main/cup/sql-parser.y:694-704`).
  *
  * The jar carrying the class is added the Spark way
  * (`spark.sql("ADD JAR ...")` or `--jars`); this covers the resolution step
  * Spark's parser only performs under the Hive catalog. The constructed
  * expression is spark-hive's own Hive-UDF call, so evaluation semantics
  * (ObjectInspectors, type coercion, null handling) match a Hive deployment.
  */
object HiveUdf {
  def register(spark: SparkSession, name: String, className: String): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      args => org.apache.spark.sql.hive.graft.HiveUdfBridge
        .hiveUdf(name, className, args),
      "scala_udf")
}
