package graft

import org.apache.spark.sql.functions._

/** Focused pins for the round-20 optimization kernels: the codegen'd
  * max-multiplicity fraction ([[graft.functions.TopRunFrac]], replacing the
  * sorted longest-run HOF fold in q_text_repetition) and the PPJoin
  * position-filter bound ([[graft.functions.PpjoinPositionOk]], candidate
  * pruning in AllPairs.jaccardPairs). Both are oracle-covered end to end;
  * these tests pin the edge semantics the oracle corpus may not exercise. */
class Round20KernelsSpec extends SparkSpec {

  test("TopRunFrac matches the sorted longest-equal-run fold semantics") {
    import spark.implicits._
    val rows = Seq(
      Seq("a", "b", "a", "c", "a"), // top multiplicity 3/5
      Seq("x"),                     // single element -> 1/1
      Seq("q", "q", "q"),           // all equal -> 1.0
      Seq.empty[String]             // empty -> 0.0
    ).toDF("g")
    // reference: the pre-round-20 formulation (sorted fold)
    def oldTopFrac(g: org.apache.spark.sql.Column) = {
      val best = aggregate(
        array_sort(g),
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (acc, x) => {
          val newRun = when(acc.getField("prev") === x, acc.getField("run") + 1L)
            .otherwise(lit(1L))
          struct(x.as("prev"), newRun.as("run"),
                 greatest(acc.getField("best"), newRun).as("best"))
        },
        acc => acc.getField("best"))
      when(size(g) === 0, lit(0.0)).otherwise(best.cast("double") / size(g))
    }
    val got = rows.select(
      graft.functions.TopRunFrac(col("g")).as("nw"),
      oldTopFrac(col("g")).as("old")).collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"kernel ${r.getDouble(0)} != fold ${r.getDouble(1)}"))
    // null input -> null (the old when/otherwise chain also yielded null)
    val nullRow = Seq(Tuple1[Seq[String]](null)).toDF("g")
      .select(graft.functions.TopRunFrac(col("g"))).collect()
    assert(nullRow.head.isNullAt(0))
  }

  test("PpjoinPositionOk never rejects a pair the verifier would keep") {
    // exhaustive small-universe check: all set pairs over universe 0..7,
    // sizes 3..6; for every pair with round6(jaccard) >= t the bound must
    // pass at the pair's FIRST common element's positions.
    for (t <- Seq(0.2, 0.5, 0.8)) {
      val sets = (0 to 7).toSet.subsets.filter(s => s.size >= 3 && s.size <= 6)
        .map(_.toSeq.sorted).toSeq
      for (a <- sets; b <- sets) {
        val inter = a.intersect(b)
        if (inter.nonEmpty) {
          val j = inter.size.toDouble / (a.size + b.size - inter.size)
          if (graft.pipeline.AllPairs.round6(j) >= t) {
            val c = inter.min
            val pa = a.indexOf(c); val pb = b.indexOf(c)
            assert(graft.functions.PpjoinPositionOk.ok(
              a.size, pa, b.size, pb, t - 5e-7),
              s"t=$t a=$a b=$b j=$j rejected at first common element")
          }
        }
      }
    }
  }
}
