package graft

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** UDF/UDA surface (SURVEY §2.10) — the reference loads native `.so` UDFs
  * via LibCache and UDAs with Init/Update/Merge/Serialize/Finalize
  * (`be/src/udf/udf.h`); on the JVM the equivalents are
  * `spark.udf.register` (scalar) and `Aggregator` + `functions.udaf`
  * (aggregate), both usable from SQL after registration.
  */
class UdfSpec extends SparkSpec {

  test("scalar Scala UDF registers and runs from SQL") {
    spark.udf.register("graft_double_it", (x: Long) => x * 2)
    Tables.registerViews(spark, sfDir)
    val r = spark.sql(
      "SELECT graft_double_it(n_nationkey) FROM nation WHERE n_nationkey = 21")
      .head().getLong(0)
    assert(r == 42)
  }

  /** Geometric-mean UDA: Init/Update/Merge/Finish lifecycle, like the
    * reference's UDA contract (`aggregate-functions.h:25-30`). */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), x: Double): (Double, Long) =
      (b._1 + math.log(x), b._2 + 1)
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  test("Aggregator UDA registers via udaf() and matches a direct computation") {
    spark.udf.register("geo_mean", udaf(GeoMean))
    Tables.registerViews(spark, sfDir)
    val got = spark.sql(
      "SELECT geo_mean(l_quantity) FROM lineitem WHERE l_orderkey < 100")
      .head().getDouble(0)
    val vals = Tables.table(spark, sfDir, "lineitem")
      .filter(col("l_orderkey") < 100).select("l_quantity")
      .collect().map(_.getDouble(0))
    val expected = math.exp(vals.map(math.log).sum / vals.length)
    assert(math.abs(got - expected) / expected < 1e-12, s"$got vs $expected")
  }

  test("UDA participates in grouped aggregation with partial merge") {
    spark.udf.register("geo_mean2", udaf(GeoMean))
    Tables.registerViews(spark, sfDir)
    val rows = spark.sql(
      """SELECT l_returnflag, geo_mean2(l_quantity) FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin).collect()
    assert(rows.length == 3)
    rows.foreach(r => assert(r.getDouble(1) > 0 && r.getDouble(1) < 51))
  }

  test("Hive Java UDF passthrough: GenericUDF and simple UDF classes from SQL") {
    // Reference surface: be/src/exprs/hive-udf-call.cc:217 +
    // fe/.../hive/executor/ — calling a compiled Hive UDF class from SQL.
    // The classes come from a jar on the session classpath (hive-exec),
    // registered via functions.HiveUdf (Spark's own CREATE FUNCTION AS
    // resolves Hive classes only under the Hive catalog; the expression
    // built here is spark-hive's, so evaluation semantics are identical).
    functions.HiveUdf.register(spark, "hive_upper",
      "org.apache.hadoop.hive.ql.udf.generic.GenericUDFUpper")
    assert(spark.sql("SELECT hive_upper('impala')").head().getString(0) == "IMPALA")

    functions.HiveUdf.register(spark, "hive_ascii",
      "org.apache.hadoop.hive.ql.udf.UDFAscii")
    assert(spark.sql("SELECT hive_ascii('A')").head().getInt(0) == 65)

    // a non-UDF class is rejected with a clear error
    intercept[IllegalArgumentException] {
      functions.HiveUdf.register(spark, "bad_udf", "java.lang.String")
      spark.sql("SELECT bad_udf('x')").head()
    }

    // and over real table data in a projection
    Tables.registerViews(spark, sfDir)
    val got = spark.sql(
      "SELECT hive_upper(n_name) FROM nation WHERE n_nationkey = 0")
      .head().getString(0)
    val want = Tables.table(spark, sfDir, "nation")
      .filter(col("n_nationkey") === 0).head().getAs[String]("n_name")
      .toUpperCase
    assert(got == want)
  }
}
