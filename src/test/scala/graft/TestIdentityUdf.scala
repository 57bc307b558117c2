package graft

import org.apache.hadoop.hive.ql.exec.UDF

/** Clean-room equivalent of the reference test jar's identity UDF
  * (`testdata/udfs`' com.cloudera.impala.TestUdf, referenced by
  * load-hive-udfs.test): one evaluate overload per primitive SQL type;
  * Hive's method resolver picks the overload from the call site's
  * argument type. Used by the ported hive-udf.test golden fixture. */
class TestIdentityUdf extends UDF {
  def evaluate(v: java.lang.Boolean): java.lang.Boolean = v
  def evaluate(v: java.lang.Byte): java.lang.Byte = v
  def evaluate(v: java.lang.Short): java.lang.Short = v
  def evaluate(v: java.lang.Integer): java.lang.Integer = v
  def evaluate(v: java.lang.Long): java.lang.Long = v
  def evaluate(v: java.lang.Float): java.lang.Float = v
  def evaluate(v: java.lang.Double): java.lang.Double = v
  def evaluate(v: String): String = v
  def evaluate(v: java.sql.Timestamp): java.sql.Timestamp = v
}

/** Stand-ins for the reference-era hive-exec simple UDFs whose successors
  * in this hive-exec-core build cannot initialize (GenericUDFFloor /
  * GenericUDFPosMod / GenericUDFRound touch Hive's FunctionRegistry, whose
  * static init needs LLAP classes the core jar does not carry). Identical
  * evaluate contracts to UDFFloor / UDFPosMod / UDFRound. */
class TestFloorUdf extends UDF {
  def evaluate(v: java.lang.Double): java.lang.Long =
    if (v == null) null else Long.box(math.floor(v).toLong)
}

class TestPosModUdf extends UDF {
  def evaluate(a: java.lang.Integer, b: java.lang.Integer): java.lang.Integer =
    if (a == null || b == null) null else Int.box(((a % b) + b) % b)
}

class TestRoundUdf extends UDF {
  def evaluate(v: java.lang.Double): java.lang.Double =
    if (v == null) null
    else Double.box(java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue)
}
