package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual salted join for skewed keys.
  *
  * AQE's skew-join splitting (enabled in [[graft.Engine]]) handles most
  * skew at runtime; salting remains the explicit tool when one join key
  * carries an unsplittable hot partition (e.g. a single null-like sentinel
  * key holding 30% of a 100 TB fact table) or when AQE is unavailable
  * (streaming joins, some shuffled-hash paths).
  *
  * Mechanics: the fact side spreads each hot key across `saltBuckets`
  * synthetic sub-keys (deterministically, from a hash of a fact-side
  * column, so results are reproducible); the dimension side is replicated
  * `saltBuckets` times so each sub-key still finds its match. Correctness
  * is unchanged — the join condition gains a salt-equality conjunct that is
  * satisfied exactly once per original matching pair.
  */
object SkewJoin {

  /** Inner/left equi-join `fact.key == dim.key` with fact-side salting.
    *
    * @param saltSource fact-side column whose hash spreads the hot keys —
    *                   pick a high-cardinality column (row id, line number).
    */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame,
                     factKey: Column, dimKey: Column,
                     saltSource: Column, saltBuckets: Int,
                     joinType: String = "inner"): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(hash(saltSource), lit(saltBuckets)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated,
        factKey === dimKey && salted("__salt") === replicated("__salt"),
        joinType)
      .drop("__salt")
  }
}
