package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows on skewed data") {
    import spark.implicits._
    // 90% of fact rows share one hot key.
    val fact = spark.range(10000)
      .select(col("id"),
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"))
    val dim = spark.range(100).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("name"))

    val plain = fact.join(dim, fact("k") === dim("k")).drop(dim("k"))
      .select("id", "k", "name")
    val salted = SkewJoin.saltedEquiJoin(
        fact, dim, fact("k"), dim("k"),
        saltSource = fact("id"), saltBuckets = 8)
      .drop(dim("k"))
      .select("id", "k", "name")

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salting spreads the hot key across buckets") {
    import spark.implicits._
    val fact = spark.range(1000).select(col("id"), lit(7L).as("k"))
    val salted = fact.withColumn("salt", pmod(hash(col("id")), lit(8)))
    val perBucket = salted.groupBy("salt").count().collect().map(_.getLong(1))
    assert(perBucket.length == 8, "all 8 buckets should be populated")
    assert(perBucket.max < 1000 * 0.3, s"bucket sizes: ${perBucket.toSeq}")
  }
}
