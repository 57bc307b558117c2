package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.DocumentsStreaming

/** Pins the streaming face of the curation tier: the text-pipeline
  * expressions (shared with the batch tier) run inside microbatches, the
  * degenerate-document filter and watermarked content dedup behave
  * incrementally, and the banded-MinHash stream-static candidate join
  * finds planted near-dups against a static corpus index. */
class StreamingCurationSpec extends SparkSpec {

  import StreamingCurationSpec.{Doc, SDoc}
  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("curation stream filters looping docs and dedups within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val query = DocumentsStreaming.curationStream(input.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("cur_out").start()
    val loop = Seq.fill(40)("buy now").mkString(" ")
    input.addData(
      Doc(1, "alpha beta gamma delta epsilon zeta", ts("2024-01-01 10:00:00")),
      Doc(2, loop, ts("2024-01-01 10:00:10")), // degenerate: filtered
      Doc(3, "Alpha  beta GAMMA delta epsilon zeta", // content dup of 1
          ts("2024-01-01 10:00:20")))
    query.processAllAvailable()
    // Second batch: another copy of doc 1's content inside the horizon —
    // still deduped — plus genuinely new content.
    input.addData(
      Doc(4, "alpha beta gamma delta epsilon zeta", ts("2024-01-01 10:05:00")),
      Doc(5, "totally different words entirely here", ts("2024-01-01 10:05:10")))
    query.processAllAvailable()
    query.stop()
    val out = spark.table("cur_out").collect()
      .map(r => r.getLong(0)).toSet
    assert(out == Set(1L, 5L),
      s"expected only first-seen distinct survivors, got $out")
  }

  test("stream-static near-dup candidates probe the corpus index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Static corpus: two documents; the stream sends a near-copy of one.
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val other = (100 to 130).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (100L, base, "en"), (200L, other, "en"))
      .toDF("doc_id", "text", "lang")
    val input = MemoryStream[SDoc]
    val query = DocumentsStreaming.nearDupCandidates(input.toDF(), corpus)
      .writeStream.outputMode("append")
      .format("memory").queryName("cand_out").start()
    // Near-copy of corpus doc 100 (one token swapped) + unrelated text.
    input.addData(
      SDoc(9000L, base.replace("tok7", "changed"), "en"),
      SDoc(9001L, "nothing in common with anything at all", "en"))
    query.processAllAvailable()
    query.stop()
    val cands = spark.table("cand_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cands.exists { case (s, c, j) => s == 9000L && c == 100L && j > 0.8 },
      s"planted near-dup not found: ${cands.toSeq}")
    assert(!cands.exists(_._1 == 9001L), "unrelated doc must not collide")
  }
}

object StreamingCurationSpec {
  case class Doc(doc_id: Long, text: String, ingest_ts: Timestamp)
  case class SDoc(doc_id: Long, text: String, lang: String)
}
