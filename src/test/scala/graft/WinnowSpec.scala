package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins [[graft.functions.Winnow]] — the rolling-hash winnowing
  * fingerprinter — against an independent naive reimplementation (direct
  * per-gram hashing + brute-force window minima, no rolling, no deque),
  * plus the SIGMOD'03 coverage guarantee the dedup index relies on. */
class WinnowSpec extends SparkSpec {

  import graft.functions.Winnow.{Base, K, Mod, W}

  /** Naive oracle: hash every k-gram from scratch, min per window. */
  private def naive(s: String): Seq[Long] = {
    val b = UTF8String.fromString(s).getBytes
    if (b.length < K) return Seq.empty
    val hs = b.sliding(K).map(g =>
      g.foldLeft(0L)((acc, c) => (acc * Base + (c & 0xffL)) % Mod)).toArray
    val mins =
      if (hs.length <= W) Seq(hs.min)
      else hs.sliding(W).map(_.min).toSeq
    mins.distinct.sorted
  }

  private def viaExpr(s: String): Seq[Long] = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(graft.functions.Winnow(col("t")).as("fp"))
      .collect()(0).getSeq[Long](0)
  }

  test("expression matches the naive reimplementation on random strings") {
    val rng = new scala.util.Random(42)
    val alphabet = "abcdefg h."
    for (len <- Seq(0, 3, 7, 8, 9, 11, 12, 40, 200, 1000)) {
      val s = Seq.fill(len)(alphabet(rng.nextInt(alphabet.length))).mkString
      assert(viaExpr(s) == naive(s), s"len=$len s='${s.take(30)}...'")
    }
  }

  test("coverage guarantee: shared substring >= k+w-1 shares a fingerprint") {
    val rng = new scala.util.Random(7)
    def rand(n: Int) = Seq.fill(n)(('a' + rng.nextInt(26)).toChar).mkString
    val shared = rand(K + W - 1) // 11 chars — the minimum guaranteed span
    val a = rand(50) + shared + rand(50)
    val b = rand(80) + shared + rand(20)
    val common = viaExpr(a).toSet & viaExpr(b).toSet
    assert(common.nonEmpty, "guaranteed shared fingerprint missing")
  }

  test("short and empty inputs") {
    assert(viaExpr("") == Seq.empty)
    assert(viaExpr("abcdefg") == Seq.empty) // 7 chars < k
    assert(viaExpr("abcdefgh").length == 1) // exactly one k-gram
  }

  test("fingerprints are deterministic, sorted, distinct") {
    val fp = viaExpr("the quick brown fox jumps over the lazy dog " * 5)
    assert(fp == fp.sorted)
    assert(fp == fp.distinct)
    assert(fp == viaExpr("the quick brown fox jumps over the lazy dog " * 5))
  }
}
