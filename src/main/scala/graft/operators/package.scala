package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Shared helpers for the operator-inventory query modules.
  *
  * Oracle-exactness convention: monetary/quantity columns in the test corpus
  * are doubles (mirroring the reference's TPC-H schema,
  * `testdata/datasets/tpch/tpch_schema_template.sql` — DOUBLE in this era).
  * Cross-engine float aggregation order differs, so any *aggregated* numeric
  * is computed in DECIMAL (exact, order-independent) and cast back to DOUBLE
  * at the end; the DuckDB oracle mirrors the same casts, making the result
  * bit-identical. This costs a widening cast at scan time but keeps the
  * aggregation hash-stable on any cluster size / partitioning — important
  * because at 100 TB the plan's reduction tree shape is nondeterministic.
  */
package object operators {
  type QueryFn = (SparkSession, String) => DataFrame

  /** Exact 2-decimal view of a double column (see note above). */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact decimal sum surfaced as double. */
  def sumd(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(spark, dir, name)
}
