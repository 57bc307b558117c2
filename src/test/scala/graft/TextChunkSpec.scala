package graft

import graft.pipeline.TextQueries

/** Invariants of the document chunker (q_text_chunk) that the DuckDB
  * oracle's hash equality cannot express directly: full coverage, bounded
  * windows, exact overlap. */
class TextChunkSpec extends SparkSpec {

  test("chunking covers every token with bounded windows and exact stride overlap") {
    val chunks = TextQueries.chunk(spark, sfDir)
      .collect()
      .groupBy(_.getLong(0))
    val docs = Tables.table(spark, sfDir, "documents")
      .selectExpr("doc_id",
        "size(filter(split(trim(text), '\\\\s+'), x -> x != '')) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    assert(chunks.keySet == docs.keySet, "every document must chunk")
    val (w, s) = (TextQueries.ChunkW, TextQueries.ChunkStride)
    chunks.foreach { case (docId, rows) =>
      val n = docs(docId)
      val expected =
        if (n <= w) 1 else 1 + math.ceil((n - w).toDouble / s).toInt
      assert(rows.length == expected, s"doc $docId: ${rows.length} != $expected chunks for $n tokens")
      val byId = rows.sortBy(_.getInt(1))
      assert(byId.map(_.getInt(1)).toSeq == (0 until expected), s"doc $docId: chunk ids not dense")
      byId.zipWithIndex.foreach { case (r, k) =>
        val len = r.getInt(2)
        assert(len > 0 && len <= w, s"doc $docId chunk $k: bad window $len")
        // every chunk but the last is full; the last covers to exactly n
        if (k < expected - 1) assert(len == w, s"doc $docId chunk $k short")
        else assert(k * s + len == n, s"doc $docId: tail must end at $n")
      }
    }
  }
}
