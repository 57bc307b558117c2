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

  /** Db-qualified (persistent-style) registration — the reference's
    * `CREATE FUNCTION db.name(...) RETURNS t LOCATION '<jar>'
    * SYMBOL='<class>'` surface (CreateUdfStmt, `sql-parser.y:694-704`):
    * the function resolves as `db.name` in SQL. Overloads per signature
    * collapse onto one registry entry (Hive's own reflection picks the
    * evaluate method by argument types at call sites). */
  def registerQualified(spark: SparkSession, db: String, name: String,
                        className: String): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.catalog.CatalogFunction
    val (dbL, nameL) = (db.toLowerCase, name.toLowerCase)
    // Two registrations, both load-bearing:
    //  1. the EXTERNAL catalog entry — the analyzer's LookupFunctions
    //     existence check goes through the v2 session catalog, which
    //     consults only the external catalog (must land first: the
    //     catalog-level createFunction no-ops once the registry has the
    //     name);
    //  2. the function-registry builder under the fully qualified
    //     (catalog.db.name) key resolvePersistentFunction builds at call
    //     sites — carrying the Hive-UDF bridge expression the in-memory
    //     catalog's own class loader cannot construct.
    val external = spark.sessionState.catalog.externalCatalog
    if (!external.functionExists(dbL, nameL))
      external.createFunction(dbL,
        CatalogFunction(FunctionIdentifier(nameL, Some(dbL)), className, Nil))
    else if (external.getFunction(dbL, nameL).className != className) {
      // re-registration with a different class must not leave the catalog
      // recording the old one (a registry rebuilt from the external
      // catalog would resolve the stale UDF)
      external.dropFunction(dbL, nameL)
      external.createFunction(dbL,
        CatalogFunction(FunctionIdentifier(nameL, Some(dbL)), className, Nil))
    }
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(nameL, Some(dbL), Some("spark_catalog")),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        className, db, name),
      args => org.apache.spark.sql.hive.graft.HiveUdfBridge
        .hiveUdf(name, className, args))
  }

  /** DROP FUNCTION counterpart; returns whether the name was registered. */
  def unregister(spark: SparkSession, db: Option[String],
                 name: String): Boolean = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val dbL = db.getOrElse(spark.catalog.currentDatabase).toLowerCase
    val nameL = name.toLowerCase
    // unqualified drops also cover temp-registered functions (the
    // aggregate test functions register unqualified) — but never a
    // BUILTIN: the session registry is a clone of the builtin registry,
    // so dropTempFunction on e.g. `abs` would remove the builtin itself
    val isBuiltin = org.apache.spark.sql.catalyst.analysis.FunctionRegistry
      .builtin.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(nameL))
    val wasTemp = db.isEmpty && !isBuiltin && {
      val had = spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(nameL))
      spark.sessionState.catalog.dropTempFunction(nameL,
        ignoreIfNotExists = true)
      had
    }
    val external = spark.sessionState.catalog.externalCatalog
    val inExternal = spark.catalog.databaseExists(dbL) &&
      external.functionExists(dbL, nameL)
    if (inExternal) external.dropFunction(dbL, nameL)
    val inRegistry = spark.sessionState.functionRegistry.dropFunction(
      FunctionIdentifier(nameL, Some(dbL), Some("spark_catalog")))
    wasTemp || inExternal || inRegistry
  }
}
