package graft

import org.apache.spark.sql.Row

/** Expression edge semantics — the Scala port of the reference's
  * `be/src/exprs/expr-test.cc` coverage classes (NULL propagation, overflow
  * behavior, cast edges, decimal arithmetic scale rules). These pin the
  * engine's dialect semantics (non-ANSI / Impala-permissive) so a Spark
  * upgrade or config drift can't silently change them.
  */
class ExprEdgeSpec extends SparkSpec {

  private def one(q: String): Row = spark.sql(s"SELECT $q").head()

  test("NULL propagates through scalar functions, Kleene logic holds") {
    val r = one(
      """1 + CAST(NULL AS INT), concat('a', CAST(NULL AS STRING)),
        |length(CAST(NULL AS STRING)), NULL AND false, NULL AND true,
        |NULL OR true, NULL OR false, NOT NULL""".stripMargin)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getBoolean(3) == false, "NULL AND false = false")
    assert(r.isNullAt(4), "NULL AND true = NULL")
    assert(r.getBoolean(5) == true, "NULL OR true = true")
    assert(r.isNullAt(6), "NULL OR false = NULL")
    assert(r.isNullAt(7), "NOT NULL = NULL")
  }

  test("integer overflow wraps (Impala C++ semantics, non-ANSI)") {
    val r = one(
      """CAST(2147483647 AS INT) + 1, CAST(9223372036854775807 AS BIGINT) + 1,
        |CAST(127 AS TINYINT) + CAST(1 AS TINYINT)""".stripMargin)
    assert(r.getInt(0) == Int.MinValue)
    assert(r.getLong(1) == Long.MinValue)
    assert(r.getByte(2) == Byte.MinValue)
  }

  test("invalid casts return NULL, not errors") {
    val r = one(
      """CAST('abc' AS INT), CAST('12.5.3' AS DOUBLE),
        |CAST('not-a-date' AS TIMESTAMP), CAST('' AS INT)""".stripMargin)
    (0 to 3).foreach(i => assert(r.isNullAt(i), s"col $i should be NULL"))
  }

  test("division semantics: int / int is double; x / 0 is NULL; div is integral") {
    val r = one("7 / 2, 7 div 2, 1 / 0, 1.0 / 0, CAST(1 AS DOUBLE) / 0")
    assert(r.getDouble(0) == 3.5)
    assert(r.getLong(1) == 3L)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("string to timestamp accepts date-only and datetime forms") {
    val r = one(
      """CAST('2009-01-01' AS TIMESTAMP),
        |CAST('2009-01-01 01:02:03' AS TIMESTAMP),
        |CAST('2009-01-01 01:02:03.999' AS TIMESTAMP)""".stripMargin)
    assert(r.getTimestamp(0).toString == "2009-01-01 00:00:00.0")
    assert(r.getTimestamp(1).toString == "2009-01-01 01:02:03.0")
    assert(r.getTimestamp(2).toString == "2009-01-01 01:02:03.999")
  }

  test("decimal arithmetic: precision/scale propagation and division rules") {
    // SURVEY flags decimal division result-scale as the highest-risk
    // exactness item — pin Spark's rules explicitly.
    val df = spark.sql(
      """SELECT CAST(1.5 AS DECIMAL(5,2)) + CAST(2.25 AS DECIMAL(5,2)) AS add_v,
        |       CAST(1.5 AS DECIMAL(5,2)) * CAST(2.25 AS DECIMAL(5,2)) AS mul_v,
        |       CAST(7 AS DECIMAL(10,0)) / CAST(2 AS DECIMAL(10,0)) AS div_v""".stripMargin)
    val schema = df.schema
    assert(schema("add_v").dataType.simpleString == "decimal(6,2)")
    assert(schema("mul_v").dataType.simpleString == "decimal(11,4)")
    // Spark division: scale = max(6, s1 + p2 + 1) capped by precision rules
    assert(schema("div_v").dataType.simpleString == "decimal(21,11)")
    val r = df.head()
    assert(r.getDecimal(0).toPlainString == "3.75")
    assert(r.getDecimal(1).toPlainString == "3.3750")
    assert(r.getDecimal(2).toPlainString == "3.50000000000")
  }

  test("decimal overflow yields NULL (permissive mode), max precision 38") {
    val r = one(
      "CAST(99999999999999999999 AS DECIMAL(20,0)) * CAST(99999999999999999999 AS DECIMAL(20,0))")
    assert(r.isNullAt(0), "38-digit overflow must be NULL, not error")
  }

  test("timestamp arithmetic is timezone-free under UTC session") {
    // Impala TIMESTAMP has no timezone (timestamp-value.h); our convention
    // is TimestampType + UTC session, which must behave identically across
    // DST boundaries of any local zone.
    val r = one(
      """CAST('2021-03-14 02:30:00' AS TIMESTAMP),
        |days_add(CAST('2021-03-13 02:30:00' AS TIMESTAMP), 1)""".stripMargin)
    assert(r.getTimestamp(0).toString == "2021-03-14 02:30:00.0")
    assert(r.getTimestamp(1).toString == "2021-03-14 02:30:00.0")
  }

  test("float special values: NaN/Infinity comparisons and aggregation") {
    val r = one(
      """CAST('NaN' AS DOUBLE) = CAST('NaN' AS DOUBLE),
        |CAST('Infinity' AS DOUBLE) > 1e308,
        |is_nan(CAST('NaN' AS DOUBLE) + 1)""".stripMargin)
    // Spark (like Impala's sorting semantics): NaN == NaN is true in SQL
    assert(r.getBoolean(0))
    assert(r.getBoolean(1))
    assert(r.getBoolean(2))
  }
}
