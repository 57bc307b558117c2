package graft

import org.apache.spark.sql.functions._
import graft.functions.{FnvHash, GraftFunctions}

class FnvHashSpec extends SparkSpec {

  test("fnv-1a 64 known-answer vectors (strings)") {
    // Public FNV-1a 64-bit test vectors (offset basis / standard examples).
    assert(FnvHash.hashBytes(Array.emptyByteArray) == 0xcbf29ce484222325L)
    assert(FnvHash.hashBytes("a".getBytes("UTF-8")) == 0xaf63dc4c8601ec8cL)
    assert(FnvHash.hashBytes("foobar".getBytes("UTF-8")) == 0x85944171f73967e8L)
  }

  test("expression evaluates via codegen identically to the static impl") {
    import spark.implicits._
    val df = Seq("", "a", "foobar", "graft engine").toDF("s")
    val got = df.select(GraftFunctions.fnv_hash(col("s")).as("h"))
      .as[Long].collect().toSeq
    val want = Seq("", "a", "foobar", "graft engine")
      .map(s => FnvHash.hashBytes(s.getBytes("UTF-8")))
    assert(got == want)
  }

  test("numeric types hash their little-endian slot bytes") {
    import spark.implicits._
    val df = Seq((42, 42L, 42.0)).toDF("i", "l", "d")
    val r = df.select(
      GraftFunctions.fnv_hash(col("i")).as("hi"),
      GraftFunctions.fnv_hash(col("l")).as("hl"),
      GraftFunctions.fnv_hash(col("d")).as("hd")).head()
    assert(r.getLong(0) == FnvHash.hashLong(42L, 4))
    assert(r.getLong(1) == FnvHash.hashLong(42L, 8))
    assert(r.getLong(2) == FnvHash.hashDouble(42.0))
    // int(42) and bigint(42) must differ (different widths), as in Impala's
    // slot-byte hashing.
    assert(r.getLong(0) != r.getLong(1))
  }

  test("sql registration works in an externally built session") {
    Tables.table(spark, sfDir, "nation").createOrReplaceTempView("nation_fnv")
    val n = spark.sql("SELECT fnv_hash(n_name) AS h FROM nation_fnv").count()
    assert(n == 25)
  }
}
