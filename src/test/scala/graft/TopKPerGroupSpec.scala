package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopKPerGroup

class TopKPerGroupSpec extends SparkSpec {

  private def canonical(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("matches the window-function formulation on lineitem") {
    val li = Tables.table(spark, sfDir, "lineitem")
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    // Unique tiebreak via a struct order key so top-k is well-defined.
    val orderKey = struct(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))

    val custom = TopKPerGroup.topK(
      li, Seq(col("l_returnflag")), orderKey, k = 7)

    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").desc,
               col("l_linenumber").desc)
    val viaWindow = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7).drop("rn")

    assert(canonical(custom) == canonical(viaWindow))
  }

  test("ascending variant and k larger than group size") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 10))
      .toDF("g", "v")
    val bottom2 = TopKPerGroup.topK(df, Seq(col("g")), col("v"), 2,
      descending = false)
    assert(canonical(bottom2) == Seq("a|1", "a|2", "b|10"))
  }

  test("plan contains partial and final TopKPerGroupExec with one exchange") {
    val li = Tables.table(spark, sfDir, "lineitem")
    val custom = TopKPerGroup.topK(
      li, Seq(col("l_returnflag")), col("l_extendedprice"), 3)
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("TopKPerGroup ")) == 2,
      s"expected partial+final execs:\n$plan")
    assert(!plan.contains("WindowExec"), "must not fall back to window")
    assert(!plan.contains("Sort "), "must not full-sort groups")
  }

  test("null order values sort last; null group keys form their own group") {
    import spark.implicits._
    val df = Seq((Some("a"), Some(1)), (Some("a"), None),
                 (None, Some(5)), (None, Some(6))).toDF("g", "v")
    // k=1: the non-null row always beats the null-ordered row.
    val top1 = TopKPerGroup.topK(df, Seq(col("g")), col("v"), 1)
    assert(canonical(top1) == Seq("a|1", "null|6"))
    // k=2: null-ordered rows fill the remaining slots (SQL NULLS LAST),
    // matching the ROW_NUMBER oracle formulation.
    val top2 = TopKPerGroup.topK(df, Seq(col("g")), col("v"), 2)
    assert(canonical(top2) == Seq("a|1", "a|null", "null|5", "null|6"))
  }
}
