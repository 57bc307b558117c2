package graft

import graft.pipeline.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media table carries binary payloads with typed metadata") {
    val media = Multimodal.asMediaTable(spark, sfDir)
    val r = media.head()
    assert(r.payload.nonEmpty)
    assert(Set("image/png", "audio/wav", "video/mp4").contains(r.mime))
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
  }

  test("batched decode stage is deterministic and partition-preserving") {
    val media = Multimodal.asMediaTable(spark, sfDir)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect().sortBy(_.doc_id)
    assert(f1.toSeq == f2.toSeq, "decode must not depend on partitioning")
    assert(f1.forall(f => f.width >= 16 && f.height >= 16 && f.n_frames >= 1))
    // video rows get multi-frame sampling, audio/image exactly one frame
    assert(f1.filter(_.mime == "video/mp4").forall(_.n_frames >= 1))
    assert(f1.filter(_.mime != "video/mp4").forall(_.n_frames == 1))
  }

  test("decode stub matches the SQL-side fake dimensions where shared") {
    // The n_bytes/checksum path is the contract: same bytes in SQL binary
    // column and in the typed Dataset row.
    import org.apache.spark.sql.functions._
    val viaSql = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), length(encode(col("text"), "UTF-8")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaDs = Multimodal.extractFeatures(Multimodal.asMediaTable(spark, sfDir))
      .collect().map(f => f.doc_id -> f.n_bytes).toMap
    assert(viaSql == viaDs)
  }
}
