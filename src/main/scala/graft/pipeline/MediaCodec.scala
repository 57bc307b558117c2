package graft.pipeline

/** Real (pure-JVM, no-library) codecs for the three media container formats
  * the multimodal tier carries: BMP images, RIFF/WAVE PCM audio, and a
  * concatenated-P6-PPM frame stream standing in for raw video.
  *
  * Reference analogue: the reference treats media as opaque byte columns and
  * runs decode/feature-extract in the scan pipeline
  * (be/src/exec/hdfs-scan-node.cc's scanner-batch shape); the formats here
  * are the simplest fully-real containers that need no codec library, so the
  * decode stage parses genuine headers instead of replaying a hash fake.
  *
  * Encoders write spec-compliant files; decoders parse ONLY the bytes
  * (magic, chunk walks, little-endian fields) and throw on malformation —
  * they share no arithmetic with the encoders beyond the file-format spec
  * itself, so an offset/endianness bug in either side is caught by the
  * round-trip oracle and by the independently-written fixture files under
  * src/test/resources/media/.
  */
object MediaCodec {

  /** Decoded container facts. For images: width/height in px, nFrames=1,
    * sampleRate=0. For audio: width=height=0, nFrames=PCM frame count,
    * sampleRate in Hz. For video streams: per-frame width/height, nFrames =
    * frame count, sampleRate=0. */
  final case class MediaInfo(width: Int, height: Int, nFrames: Int, sampleRate: Int)

  // ---- little-endian helpers ----------------------------------------------
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
  }
  /** Deterministic pixel/sample content: 64-bit LCG (Knuth MMIX constants). */
  private def nextSeed(s: Long): Long = s * 6364136223846793005L + 1442695040888963407L

  // ---- BMP (Windows V3, 24bpp bottom-up) ----------------------------------

  /** Row stride padded to a 4-byte boundary, per the BMP spec. */
  def bmpStride(width: Int): Int = ((3 * width + 3) / 4) * 4

  def bmpSize(width: Int, height: Int): Int = 54 + height * bmpStride(width)

  def encodeBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0, s"bad bmp dims ${width}x$height")
    val stride = bmpStride(width)
    val size = 54 + height * stride
    val b = new Array[Byte](size)
    b(0) = 'B'; b(1) = 'M'
    putLe32(b, 2, size)          // bfSize
    putLe32(b, 10, 54)           // bfOffBits
    putLe32(b, 14, 40)           // biSize (BITMAPINFOHEADER)
    putLe32(b, 18, width)
    putLe32(b, 22, height)       // positive = bottom-up
    putLe16(b, 26, 1)            // biPlanes
    putLe16(b, 28, 24)           // biBitCount
    putLe32(b, 30, 0)            // BI_RGB
    putLe32(b, 34, height * stride) // biSizeImage
    putLe32(b, 38, 2835); putLe32(b, 42, 2835) // 72 DPI
    var s = seed
    var off = 54
    var i = 0
    val n = height * stride
    while (i < n) {
      s = nextSeed(s)
      b(off) = (s >>> 56).toByte
      off += 1; i += 1
    }
    b
  }

  /** Parse a BMP header: magic, 40-byte info header, 24bpp uncompressed,
    * and a payload exactly as long as the header claims. */
  def decodeBmp(b: Array[Byte]): MediaInfo = {
    require(b.length >= 54, s"bmp truncated: ${b.length} bytes")
    require(b(0) == 'B' && b(1) == 'M', "bad bmp magic")
    require(le32(b, 14) == 40, s"unsupported bmp info header size ${le32(b, 14)}")
    val w = le32(b, 18)
    val h = le32(b, 22)
    require(w > 0 && h > 0, s"bad bmp dims ${w}x$h")
    require(le16(b, 28) == 24, s"unsupported bpp ${le16(b, 28)}")
    require(le32(b, 30) == 0, "compressed bmp unsupported")
    val expect = 54 + h.toLong * bmpStride(w)
    require(b.length == expect, s"bmp size mismatch: ${b.length} vs $expect")
    MediaInfo(w, h, nFrames = 1, sampleRate = 0)
  }

  // ---- WAV (RIFF/WAVE, mono 16-bit PCM) ------------------------------------

  def wavSize(nSamples: Int): Int = 44 + 2 * nSamples

  def encodeWav(sampleRate: Int, nSamples: Int, seed: Long): Array[Byte] = {
    require(sampleRate > 0 && nSamples > 0)
    val dataSize = 2 * nSamples
    val b = new Array[Byte](44 + dataSize)
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    putLe32(b, 4, 36 + dataSize)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
    putLe32(b, 16, 16)           // fmt chunk size
    putLe16(b, 20, 1)            // PCM
    putLe16(b, 22, 1)            // mono
    putLe32(b, 24, sampleRate)
    putLe32(b, 28, sampleRate * 2) // byte rate
    putLe16(b, 32, 2)            // block align
    putLe16(b, 34, 16)           // bits per sample
    b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
    putLe32(b, 40, dataSize)
    var s = seed
    var i = 0
    while (i < nSamples) {
      s = nextSeed(s)
      putLe16(b, 44 + 2 * i, ((s >>> 48) & 0xffff).toInt)
      i += 1
    }
    b
  }

  /** Walk RIFF chunks (handles extra chunks and fmt extensions, not just the
    * canonical 44-byte layout): find fmt + data, return PCM frame facts. */
  def decodeWav(b: Array[Byte]): MediaInfo = {
    require(b.length >= 44, s"wav truncated: ${b.length} bytes")
    require(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F', "bad riff magic")
    require(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E', "not a wave file")
    var off = 12
    var sampleRate = -1
    var blockAlign = -1
    var dataSize = -1
    while (off + 8 <= b.length && (sampleRate < 0 || dataSize < 0)) {
      val id = new String(b, off, 4, "US-ASCII")
      val sz = le32(b, off + 4)
      require(sz >= 0 && off + 8 + sz <= b.length, s"chunk '$id' overruns file")
      id match {
        case "fmt " =>
          require(sz >= 16, s"fmt chunk too short: $sz")
          require(le16(b, off + 8) == 1, "non-PCM wav unsupported")
          sampleRate = le32(b, off + 12)
          blockAlign = le16(b, off + 20)
        case "data" => dataSize = sz
        case _      => // skip unknown chunk
      }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(dataSize >= 0, "missing data chunk")
    require(blockAlign > 0, "bad block align")
    require(dataSize % blockAlign == 0, s"data size $dataSize not a multiple of block align $blockAlign")
    MediaInfo(width = 0, height = 0, nFrames = dataSize / blockAlign, sampleRate = sampleRate)
  }

  // ---- PPM frame stream (concatenated binary P6 images = raw "video") -----

  private def ppmHeader(width: Int, height: Int): Array[Byte] =
    s"P6\n$width $height\n255\n".getBytes("US-ASCII")

  def ppmStreamSize(width: Int, height: Int, nFrames: Int): Int =
    nFrames * (ppmHeader(width, height).length + 3 * width * height)

  def encodePpmStream(width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0)
    val hdr = ppmHeader(width, height)
    val frame = hdr.length + 3 * width * height
    val b = new Array[Byte](nFrames * frame)
    var s = seed
    var f = 0
    while (f < nFrames) {
      val base = f * frame
      System.arraycopy(hdr, 0, b, base, hdr.length)
      var i = base + hdr.length
      val end = base + frame
      while (i < end) {
        s = nextSeed(s)
        b(i) = (s >>> 56).toByte
        i += 1
      }
      f += 1
    }
    b
  }

  /** Parse consecutive P6 frames: each header is read with a real
    * token-scanner (magic, whitespace-separated width/height/maxval), frames
    * must agree on dimensions, and the stream must end exactly on a frame
    * boundary. */
  def decodePpmStream(b: Array[Byte]): MediaInfo = {
    var off = 0
    var w = -1
    var h = -1
    var frames = 0
    while (off < b.length) {
      require(off + 2 <= b.length && b(off) == 'P' && b(off + 1) == '6',
        s"bad ppm magic at offset $off")
      off += 2
      var fields = 0
      val v = new Array[Int](3)
      while (fields < 3) {
        while (off < b.length && (b(off) == ' ' || b(off) == '\n' || b(off) == '\r' || b(off) == '\t')) off += 1
        require(off < b.length && b(off) >= '0' && b(off) <= '9', s"expected digit at offset $off")
        // Accumulate in Long with a hard ceiling: an unbounded Int
        // accumulation can wrap to a small/negative value that passes the
        // > 0 checks and walks `off` backwards (ADVICE r16). 1e6 px/side is
        // far above any real frame and far below Int overflow.
        var x = 0L
        while (off < b.length && b(off) >= '0' && b(off) <= '9') {
          x = x * 10 + (b(off) - '0'); off += 1
          require(x <= 1000000L, s"ppm header field overflow at offset $off")
        }
        v(fields) = x.toInt
        fields += 1
      }
      require(off < b.length, "ppm header truncated")
      off += 1 // single whitespace byte after maxval, per spec
      require(v(0) > 0 && v(1) > 0, s"bad ppm dims ${v(0)}x${v(1)}")
      require(v(2) == 255, s"unsupported maxval ${v(2)}")
      if (frames == 0) { w = v(0); h = v(1) }
      else require(w == v(0) && h == v(1), s"frame $frames dims ${v(0)}x${v(1)} != ${w}x$h")
      val pixL = 3L * v(0) * v(1)
      require(off + pixL <= b.length, s"frame $frames pixel data truncated")
      off += pixL.toInt
      frames += 1
    }
    require(frames > 0, "empty ppm stream")
    MediaInfo(w, h, frames, sampleRate = 0)
  }

  // ---- dispatch ------------------------------------------------------------

  def decode(mime: String, payload: Array[Byte]): MediaInfo = mime match {
    case "image/bmp"   => decodeBmp(payload)
    case "audio/wav"   => decodeWav(payload)
    case "video/x-ppm" => decodePpmStream(payload)
    case other         => throw new IllegalArgumentException(s"unsupported mime: $other")
  }
}
