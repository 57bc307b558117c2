package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{t, QueryFn}

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, and a batched decode/feature-extract stage.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * DETERMINISTIC FAKE (clearly marked below) — what is real and tested is
  * everything Spark-side: the schema convention (binary payload + mime +
  * metadata struct), the partition-preserving batched `mapPartitions`
  * decode stage (the Scala analogue of `mapInPandas` — one buffer reused
  * per batch, no per-row setup cost), and the downstream aggregation over
  * extracted features.
  *
  * Scale notes: media payloads dominate row size, so the decode stage keys
  * nothing and shuffles nothing — it runs scan-side with per-partition
  * parallelism. Feature rows (small) are what flow into joins/aggs.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
                           width: Int, height: Int, n_frames: Int,
                           checksum: Long)

  /** Wrap documents as a media table: payload = utf8 bytes standing in for
    * an encoded image/audio blob. */
  def asMediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** === STUBBED DECODE ===
    * Stands in for an image/audio/video decoder (not present in this
    * container). Deterministic fake: dimensions and frame count derived
    * from the payload bytes via FNV — stable across runs/engines, so specs
    * can assert on it. A real deployment swaps only this function body. */
  def decodeStub(mime: String, payload: Array[Byte]): (Int, Int, Int) = {
    val h = graft.functions.FnvHash.hashBytes(payload)
    val w = 16 + (((h & 0x7fffffffL) % 2033L).toInt)
    val ht = 16 + ((((h >>> 32) & 0x7fffffffL) % 1017L).toInt)
    val frames = mime match {
      case m if m.startsWith("video") => 1 + ((h >>> 17) & 0xffL).toInt
      case m if m.startsWith("audio") => 1
      case _ => 1
    }
    (w, ht, frames)
  }

  /** Batched decode/feature-extract stage: partition-preserving, one
    * iterator pass, no shuffle — the `mapInPandas` shape in Scala. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, frames) = decodeStub(r.mime, r.payload)
        MediaFeatures(r.doc_id, r.mime, r.payload.length, w, h, frames,
          graft.functions.FnvHash.hashBytes(r.payload))
      }
    }
  }

  /** Media metadata projection — the SQL-expressible half (byte length,
    * content hashes, deterministic fake dims from n_chars), oracle-checked. */
  val mediaMeta: QueryFn = (s, dir) => {
    val d = t(s, dir, "documents")
    val payload = encode(col("text"), "UTF-8")
    d.select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"),
        length(payload).as("n_bytes"),
        md5(payload).as("content_md5"),
        sha2(payload, 256).as("content_sha256"),
        (lit(16) + pmod(col("n_chars"), lit(2033))).as("fake_width"),
        (lit(16) + pmod(col("n_chars") * 7, lit(1017))).as("fake_height"))
    // no global sort: per-doc metadata is a set, and a total order over the
    // whole corpus is a needless range-exchange at scale
  }
  val mediaMetaSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
      |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
      |       ELSE 'video/mp4' END AS mime,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS content_md5,
      |  sha256(text) AS content_sha256,
      |  16 + (n_chars % 2033) AS fake_width,
      |  16 + ((n_chars * 7) % 1017) AS fake_height
      |FROM documents""".stripMargin

  /** Feature aggregation over the decoded (stubbed) features — exercises
    * the full media → decode → analyze pipeline as one query. Oracle-checked:
    * the stub's feature math is FNV-1a over the payload bytes plus modular
    * arithmetic, all SQL-expressible — [[mediaFeatureAggSql]] re-derives it
    * in DuckDB (FNV loop via list_reduce over the hex-encoded payload with
    * HUGEINT mod-2^64 arithmetic), so a drift in the decode stage, the
    * mapPartitions plumbing, or the aggregation is hash-visible. */
  val mediaFeatureAgg: QueryFn = (s, dir) => {
    extractFeatures(asMediaTable(s, dir))
      .toDF()
      .groupBy(col("mime"))
      .agg(count(lit(1)).as("n_media"),
           sum(col("n_bytes")).as("total_bytes"),
           min(col("width")).as("min_width"),
           max(col("width")).as("max_width"),
           sum(col("n_frames")).as("total_frames"))
      .orderBy(col("mime"))
  }

  /** DuckDB twin of media → [[decodeStub]] → aggregate. The unsigned FNV
    * state lives in HUGEINT (the 64-bit multiply overflows BIGINT; DuckDB
    * raises on overflow rather than wrapping), reduced mod 2^64 per step;
    * the stub's masks/shifts become mod/div on the unsigned value:
    * `h & 0x7fffffff` = `uh % 2^31`, `(h >>> 32) & 0x7fffffff` =
    * `(uh // 2^32) % 2^31`, `(h >>> 17) & 0xff` = `(uh // 2^17) % 256`. */
  val mediaFeatureAggSql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image/png'
      |         WHEN doc_id % 3 = 1 THEN 'audio/wav'
      |         ELSE 'video/mp4' END AS mime,
      |    octet_length(encode(text)) AS n_bytes,
      |    hex(encode(text)) AS hx
      |  FROM documents
      |), h AS (
      |  SELECT mime, n_bytes,
      |    list_reduce(
      |      list_prepend(14695981039346656037::HUGEINT,
      |        list_transform(range(0, n_bytes),
      |          i -> ('0x' || hx[1+2*i:2+2*i])::INT::HUGEINT)),
      |      (a, b) -> (xor(a, b) * 1099511628211::HUGEINT)
      |                  % 18446744073709551616::HUGEINT) AS uh
      |  FROM f
      |)
      |SELECT mime,
      |  count(*) AS n_media,
      |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |  CAST(min(16 + (uh % 2147483648) % 2033) AS INT) AS min_width,
      |  CAST(max(16 + (uh % 2147483648) % 2033) AS INT) AS max_width,
      |  CAST(sum(CASE WHEN mime = 'video/mp4'
      |                THEN 1 + ((uh // 131072) % 256)
      |                ELSE 1 END) AS BIGINT) AS total_frames
      |FROM h
      |GROUP BY mime
      |ORDER BY mime""".stripMargin

  val all: Map[String, QueryFn] = Map(
    "q_media_meta" -> mediaMeta,
    "q_media_feature_agg" -> mediaFeatureAgg)

  val oracle: Map[String, String] = Map(
    "q_media_meta" -> mediaMetaSql,
    "q_media_feature_agg" -> mediaFeatureAggSql)
}
