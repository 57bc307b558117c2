package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{t, QueryFn}
import MediaCodec.MediaInfo

/** Multimodal-column pipeline: media as opaque `binary` columns with typed
  * metadata, a batched decode/feature-extract stage, and downstream
  * aggregation over the extracted features.
  *
  * The payloads are REAL encoded files — BMP images, RIFF/WAVE PCM audio,
  * and concatenated-P6-PPM frame streams (raw "video") — built by
  * [[MediaCodec]]'s spec-compliant encoders, and the decode stage parses the
  * genuine container headers (magic bytes, RIFF chunk walk, PPM token scan).
  * Nothing in the decode path replays the generation formulas: dimensions
  * come off the wire, so a header-offset or endianness bug in either codec
  * half is hash-visible in the DuckDB oracle, which derives the expected
  * values independently from the corpus spec + the published size formulas
  * of each format ([[mediaMetaSql]]).
  *
  * Scale notes: media payloads dominate row size, so the encode and decode
  * stages key nothing and shuffle nothing — they run scan-side with
  * per-partition parallelism (batched mapPartitions, the Scala analogue of
  * `mapInPandas`). Feature rows (small) are what flow into joins/aggs.
  *
  * Reference analogue: scanner-batch decode in be/src/exec/hdfs-scan-node.cc;
  * opaque-binary column handling in be/src/runtime/string-value.h.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
                           width: Int, height: Int, n_frames: Int,
                           sample_rate: Int, checksum: Long)

  /** Corpus spec: deterministic media parameters per document. These are the
    * FIXTURE-GENERATION rules (what the encoder is told to write), mirrored
    * verbatim in the DuckDB oracle; the engine's decode path never sees them.
    *   doc_id%3=0 → BMP   (4+n_chars%61) × (4+n_chars*7%47), 24bpp
    *   doc_id%3=1 → WAV   mono 16-bit, 8000+4000*((doc_id%9)/3) Hz,
    *                      64+n_chars%1901 samples
    *   doc_id%3=2 → PPM   (4+n_chars%29) × (4+n_chars*3%23), 2+doc_id%7 frames
    */
  def encodeFor(docId: Long, nChars: Long): (String, Array[Byte]) =
    (docId % 3) match {
      case 0 => ("image/bmp", MediaCodec.encodeBmp(
        (4 + nChars % 61).toInt, (4 + nChars * 7 % 47).toInt, docId))
      case 1 => ("audio/wav", MediaCodec.encodeWav(
        (8000 + 4000 * ((docId % 9) / 3)).toInt, (64 + nChars % 1901).toInt, docId))
      case _ => ("video/x-ppm", MediaCodec.encodePpmStream(
        (4 + nChars % 29).toInt, (4 + nChars * 3 % 23).toInt,
        (2 + docId % 7).toInt, docId))
    }

  /** Documents → media table with real encoded payloads. Batched
    * partition-preserving encode, no shuffle. */
  def asMediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, nc) =>
          val (mime, payload) = encodeFor(id, nc)
          MediaRow(id, mime, payload)
        }
      }
  }

  /** Batched decode/feature-extract stage: parses each payload's real
    * container header via [[MediaCodec.decode]]. Partition-preserving, one
    * iterator pass, no shuffle — the `mapInPandas` shape in Scala. Throws on
    * malformed payloads (fail loud, not fake-a-row). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val MediaInfo(w, h, frames, sr) = MediaCodec.decode(r.mime, r.payload)
        MediaFeatures(r.doc_id, r.mime, r.payload.length, w, h, frames, sr,
          graft.functions.FnvHash.hashBytes(r.payload))
      }
    }
  }

  /** Per-document media metadata, every column read back off the encoded
    * bytes (encode → binary → header parse). Oracle-checked row-by-row. */
  val mediaMeta: QueryFn = (s, dir) =>
    extractFeatures(asMediaTable(s, dir))
      .toDF()
      .select("doc_id", "mime", "n_bytes", "width", "height", "n_frames", "sample_rate")
  // no global sort: per-doc metadata is a set, and a total order over the
  // whole corpus is a needless range-exchange at scale

  /** DuckDB twin: re-derives each column from the corpus spec
    * ([[encodeFor]]'s scaladoc) plus the container size formulas —
    * BMP = 54 + height·stride with stride = 3·width padded to 4 bytes;
    * WAV = 44-byte canonical header + 2 bytes/sample;
    * PPM stream = frames · (header "P6\\n{w} {h}\\n255\\n" + 3·w·h).
    * Independent of the engine's parser: a decode bug cannot cancel out. */
  val mediaMetaSql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image/bmp'
      |         WHEN doc_id % 3 = 1 THEN 'audio/wav'
      |         ELSE 'video/x-ppm' END AS mime,
      |    4 + n_chars % 61 AS iw, 4 + n_chars * 7 % 47 AS ih,
      |    64 + n_chars % 1901 AS ns, 8000 + 4000 * ((doc_id % 9) // 3) AS sr,
      |    4 + n_chars % 29 AS vw, 4 + n_chars * 3 % 23 AS vh,
      |    2 + doc_id % 7 AS vf
      |  FROM documents
      |)
      |SELECT doc_id, mime,
      |  CAST(CASE WHEN mime = 'image/bmp' THEN 54 + ih * (((3*iw + 3) // 4) * 4)
      |            WHEN mime = 'audio/wav' THEN 44 + 2 * ns
      |            ELSE vf * (9 + length(CAST(vw AS VARCHAR))
      |                         + length(CAST(vh AS VARCHAR)) + 3 * vw * vh)
      |       END AS INT) AS n_bytes,
      |  CAST(CASE WHEN mime = 'image/bmp' THEN iw
      |            WHEN mime = 'audio/wav' THEN 0 ELSE vw END AS INT) AS width,
      |  CAST(CASE WHEN mime = 'image/bmp' THEN ih
      |            WHEN mime = 'audio/wav' THEN 0 ELSE vh END AS INT) AS height,
      |  CAST(CASE WHEN mime = 'image/bmp' THEN 1
      |            WHEN mime = 'audio/wav' THEN ns ELSE vf END AS INT) AS n_frames,
      |  CAST(CASE WHEN mime = 'audio/wav' THEN sr ELSE 0 END AS INT) AS sample_rate
      |FROM p""".stripMargin

  /** Feature aggregation over the decoded features — exercises the full
    * media → encode → decode → analyze pipeline as one query. */
  val mediaFeatureAgg: QueryFn = (s, dir) => {
    extractFeatures(asMediaTable(s, dir))
      .toDF()
      .groupBy(col("mime"))
      .agg(count(lit(1)).as("n_media"),
           sum(col("n_bytes")).as("total_bytes"),
           min(col("width")).as("min_width"),
           max(col("width")).as("max_width"),
           max(col("height")).as("max_height"),
           sum(col("n_frames")).as("total_frames"),
           max(col("sample_rate")).as("max_sample_rate"))
      .orderBy(col("mime"))
  }

  /** DuckDB twin of the aggregate — same independent derivation as
    * [[mediaMetaSql]], aggregated. */
  val mediaFeatureAggSql: String =
    s"""WITH meta AS (${mediaMetaSql.replace("\n", "\n  ")})
      |SELECT mime,
      |  count(*) AS n_media,
      |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |  min(width) AS min_width,
      |  max(width) AS max_width,
      |  max(height) AS max_height,
      |  CAST(sum(n_frames) AS BIGINT) AS total_frames,
      |  max(sample_rate) AS max_sample_rate
      |FROM meta
      |GROUP BY mime
      |ORDER BY mime""".stripMargin

  val all: Map[String, QueryFn] = Map(
    "q_media_meta" -> mediaMeta,
    "q_media_feature_agg" -> mediaFeatureAgg)

  val oracle: Map[String, String] = Map(
    "q_media_meta" -> mediaMetaSql,
    "q_media_feature_agg" -> mediaFeatureAggSql)
}
