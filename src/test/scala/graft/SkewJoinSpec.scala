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

  test("skewed amplifier produces a zipfian key distribution and AQE " +
      "skew-split handles the resulting hot-partition join correctly") {
    val dir = tmp("skewcorpus")
    ScaleData.amplify(spark, sfDir, dir, factor = 20, layout = "skewed")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    val base = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    assert(li.count() == base * 20, "amplification must preserve row count")

    // Zipf shape: universe 0 (the original keys) absorbs the copies whose
    // t(c)=0 — exactly half of the 20 copies — so ~50% of all fact rows.
    val hotShare = li
      .groupBy(floor(col("l_orderkey") / 1000000000L).as("universe"))
      .count().filter(col("universe") === 0).head().getLong(1).toDouble /
      (base * 20)
    assert(hotShare > 0.4 && hotShare < 0.6,
      f"universe-0 share $hotShare%.2f not zipf-collapsed")

    // Every collapsed FK must still resolve (referential integrity): the
    // orderkey join loses no rows, and AQE's skew handling — forced live
    // at fixture scale by shrinking its thresholds — must not change that.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // fixture-scale shuffles are a few hundred KB total (the count plan
      // prunes to the 8-byte key column), so the "oversized partition" bar
      // must drop to single-digit KB for the split to be observable
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4096",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4096",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // Count through the SAME Dataset whose execution we assert on:
      // df.count() spins up its own QueryExecution, and an un-executed
      // plan has no AQE final state to carry skew markers.
      val okJoin = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy().count()
      assert(okJoin.collect()(0).getLong(0) == base * 20,
        "collapsed FKs must all resolve against their target universe PKs")
      // The mega-key collapse (half of orders on 8 custkeys) is what makes
      // a hash PARTITION oversized — that join is where AQE must split.
      val cust = spark.read.parquet(s"$dir/customer.parquet")
      val hotJoin = ord.join(cust, ord("o_custkey") === cust("c_custkey"))
        .groupBy().count()
      val ordRows = ord.count()
      assert(hotJoin.collect()(0).getLong(0) == ordRows,
        "hot mega-keys must resolve against universe-0 customers")
      val plan = hotJoin.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the hot-universe join skewed:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
