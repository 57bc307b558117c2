package graft

import java.nio.file.{Files, Paths}
import graft.pipeline.{MediaCodec, Multimodal}
import graft.pipeline.MediaCodec.MediaInfo

class MultimodalSpec extends SparkSpec {

  private def fixture(name: String): Array[Byte] = {
    val url = getClass.getResource(s"/media/$name")
    assert(url != null, s"missing fixture $name")
    Files.readAllBytes(Paths.get(url.toURI))
  }

  // The fixture files were written by an INDEPENDENT implementation
  // (src/test/resources/media/gen_fixtures.py, pure Python struct-pack —
  // rerunning it reproduces the committed bytes exactly), so these
  // assertions validate the decoder against the format spec, not against
  // our own encoder.
  test("decoder parses independently-written BMP/WAV/PPM fixture files") {
    assert(MediaCodec.decodeBmp(fixture("fixture_5x3.bmp")) == MediaInfo(5, 3, 1, 0))
    assert(MediaCodec.decodeWav(fixture("fixture_8k_100.wav")) == MediaInfo(0, 0, 100, 8000))
    // non-canonical layout: LIST chunk (odd-size payload + pad byte) between
    // fmt and data — exercises the RIFF chunk walk, not just offset 44
    assert(MediaCodec.decodeWav(fixture("fixture_list_22050_37.wav")) == MediaInfo(0, 0, 37, 22050))
    assert(MediaCodec.decodePpmStream(fixture("fixture_4x2x3.ppm")) == MediaInfo(4, 2, 3, 0))
  }

  test("encoders round-trip through the decoder at awkward sizes") {
    // widths 1..9 cross every BMP stride-padding residue
    for (w <- 1 to 9; h <- Seq(1, 3)) {
      assert(MediaCodec.decodeBmp(MediaCodec.encodeBmp(w, h, seed = w * 31 + h)) ==
        MediaInfo(w, h, 1, 0))
      assert(MediaCodec.encodeBmp(w, h, 0).length == MediaCodec.bmpSize(w, h))
    }
    assert(MediaCodec.decodeWav(MediaCodec.encodeWav(44100, 1, 7L)) == MediaInfo(0, 0, 1, 44100))
    assert(MediaCodec.decodePpmStream(MediaCodec.encodePpmStream(10, 12, 1, 3L)) ==
      MediaInfo(10, 12, 1, 0))
    // 2-digit vs 3-digit header widths change the PPM header length
    assert(MediaCodec.encodePpmStream(100, 9, 2, 1L).length ==
      MediaCodec.ppmStreamSize(100, 9, 2))
  }

  test("malformed payloads fail loud, not fake-a-row") {
    intercept[IllegalArgumentException](MediaCodec.decodeBmp("notabmp".getBytes))
    intercept[IllegalArgumentException](
      MediaCodec.decodeBmp(MediaCodec.encodeBmp(5, 3, 1L).dropRight(1))) // truncated pixels
    val wav = MediaCodec.encodeWav(8000, 10, 1L)
    wav(0) = 'X'.toByte
    intercept[IllegalArgumentException](MediaCodec.decodeWav(wav))
    intercept[IllegalArgumentException](
      MediaCodec.decodePpmStream("P5\n4 2\n255\n".getBytes)) // greyscale magic
    intercept[IllegalArgumentException](MediaCodec.decode("text/plain", Array[Byte](1)))
    // crafted headers whose Int math would wrap (3*w*h overflow → small or
    // negative pix passing the bounds check) must be rejected, and an
    // absurd digit run must terminate instead of accumulating forever
    intercept[IllegalArgumentException](
      MediaCodec.decodePpmStream("P6\n65536 65536\n255\n".getBytes)) // 3wh > Int.Max
    intercept[IllegalArgumentException](
      MediaCodec.decodePpmStream("P6\n37838 37838\n255\n".getBytes)) // wraps negative
    intercept[IllegalArgumentException](
      MediaCodec.decodePpmStream(("P6\n" + "9" * 40 + " 2\n255\n").getBytes))
  }

  test("media table carries real encoded binary payloads with typed metadata") {
    val media = Multimodal.asMediaTable(spark, sfDir)
    assert(media.schema("payload").dataType.typeName == "binary")
    val rows = media.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      r.mime match {
        case "image/bmp"   => assert(r.payload(0) == 'B' && r.payload(1) == 'M')
        case "audio/wav"   => assert(new String(r.payload, 0, 4, "US-ASCII") == "RIFF")
        case "video/x-ppm" => assert(r.payload(0) == 'P' && r.payload(1) == '6')
        case m             => fail(s"unexpected mime $m")
      }
    }
  }

  test("batched decode stage is deterministic and partition-preserving") {
    val media = Multimodal.asMediaTable(spark, sfDir)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect().sortBy(_.doc_id)
    assert(f1.toSeq == f2.toSeq, "decode must not depend on partitioning")
    // parsed facts honor each container's semantics
    assert(f1.filter(_.mime == "image/bmp").forall(f =>
      f.width >= 4 && f.height >= 4 && f.n_frames == 1 && f.sample_rate == 0))
    assert(f1.filter(_.mime == "audio/wav").forall(f =>
      f.width == 0 && f.n_frames >= 64 && Set(8000, 12000, 16000).contains(f.sample_rate)))
    assert(f1.filter(_.mime == "video/x-ppm").forall(f =>
      f.width >= 4 && f.n_frames >= 2 && f.n_frames <= 8))
  }

  test("decoded dimensions equal the corpus spec (wire round-trip)") {
    import org.apache.spark.sql.functions._
    val spec = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val decoded = Multimodal.extractFeatures(Multimodal.asMediaTable(spark, sfDir)).collect()
    decoded.foreach { f =>
      val nc = spec(f.doc_id)
      f.mime match {
        case "image/bmp" =>
          assert(f.width == 4 + nc % 61 && f.height == 4 + nc * 7 % 47)
          assert(f.n_bytes == MediaCodec.bmpSize(f.width, f.height))
        case "audio/wav" =>
          assert(f.n_frames == 64 + nc % 1901)
          assert(f.n_bytes == MediaCodec.wavSize(f.n_frames))
        case "video/x-ppm" =>
          assert(f.width == 4 + nc % 29 && f.height == 4 + nc * 3 % 23)
          assert(f.n_frames == 2 + f.doc_id % 7)
          assert(f.n_bytes == MediaCodec.ppmStreamSize(f.width, f.height, f.n_frames))
      }
    }
  }
}
