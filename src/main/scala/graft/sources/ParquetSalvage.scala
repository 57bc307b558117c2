package graft.sources

import java.io.EOFException

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.format.{PageHeader, PageType, Util}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Row-salvage reader for parquet files whose column-chunk metadata
  * misstates its own extent — the IMPALA-694 era of parquet-mr wrote
  * `total_compressed_size` smaller than the pages it actually emitted, so
  * parquet-java (and therefore Spark's scan) bounds the chunk stream at the
  * declared size and dies mid-page-header with a thrift EOF. The reference
  * scanner never trusts chunk sizes: it walks page headers and stops when
  * the chunk's VALUE COUNT is satisfied (`be/src/exec/hdfs-parquet-scanner
  * .cc` ReadDataPage's `num_buffered_values_` loop), which is what this
  * reader does with the public parquet-format API (`Util.readPageHeader`).
  *
  * Scope matches that writer generation: flat schemas, v1 data pages,
  * uncompressed, PLAIN or dictionary encodings — anything else throws
  * rather than guessing. Used by [[PositionalParquet]], which detects the
  * extent mismatch from the footer alone and routes only the damaged files
  * here (one executor task per file); healthy files keep the stock
  * vectorized scan.
  */
object ParquetSalvage {

  /** The Spark schema `spark.read.parquet` would derive for `mt`, so
    * salvaged rows union cleanly with stock-scanned files. */
  def sparkSchema(mt: MessageType): StructType =
    StructType(mt.getFields.asScala.map { f =>
      require(f.isPrimitive, s"ParquetSalvage: nested field ${f.getName}")
      val p = f.asPrimitiveType()
      val isString =
        p.getLogicalTypeAnnotation == LogicalTypeAnnotation.stringType()
      val t = p.getPrimitiveTypeName match {
        case BINARY => if (isString) StringType else BinaryType
        case INT32 => IntegerType
        case INT64 => LongType
        case FLOAT => FloatType
        case DOUBLE => DoubleType
        case BOOLEAN => BooleanType
        case other =>
          throw new IllegalArgumentException(
            s"ParquetSalvage: unsupported physical type $other")
      }
      StructField(f.getName, t, nullable = true)
    }.toSeq)

  /** All rows of one damaged file. Runs on an executor. */
  def rows(conf: Configuration, path: String): Iterator[Row] = {
    val in = HadoopInputFile.fromPath(new Path(path), conf)
    val footer = {
      val r = ParquetFileReader.open(in)
      try r.getFooter finally r.close()
    }
    val mt = footer.getFileMetaData.getSchema
    val schema = sparkSchema(mt)
    val out = ArrayBuffer.empty[Row]
    val stream = in.newStream()
    try {
      footer.getBlocks.asScala.foreach { block =>
        val nRows = block.getRowCount.toInt
        val cols = block.getColumns.asScala.toSeq.zipWithIndex.map {
          case (chunk, i) =>
            require(chunk.getCodec.getParquetCompressionCodec
                      == org.apache.parquet.format.CompressionCodec.UNCOMPRESSED,
              s"ParquetSalvage: compressed chunk in $path (${chunk.getCodec})")
            stream.seek(chunk.getStartingPos)
            val prim = mt.getType(i).asPrimitiveType()
            val maxDef = mt.getMaxDefinitionLevel(Array(mt.getFieldName(i)): _*)
            readChunk(stream, prim.getPrimitiveTypeName,
              schema.fields(i).dataType == StringType,
              chunk.getValueCount.toInt, maxDef)
        }
        var r = 0
        while (r < nRows) {
          out += Row.fromSeq(cols.map(_(r)))
          r += 1
        }
      }
    } finally stream.close()
    out.iterator
  }

  /** Walk one column chunk's pages until its value count is satisfied. */
  private def readChunk(in: org.apache.parquet.io.SeekableInputStream,
                        ptype: PrimitiveTypeName, asString: Boolean,
                        valueCount: Int, maxDef: Int): Array[Any] = {
    val out = new Array[Any](valueCount)
    var dict: Array[Any] = null
    var filled = 0
    while (filled < valueCount) {
      val h: PageHeader = Util.readPageHeader(in)
      val payload = new Array[Byte](h.getCompressed_page_size)
      in.readFully(payload)
      h.getType match {
        case PageType.DICTIONARY_PAGE =>
          dict = decodePlain(payload, 0, payload.length,
            h.getDictionary_page_header.getNum_values, ptype, asString)._1
        case PageType.DATA_PAGE =>
          val dph = h.getData_page_header
          val n = dph.getNum_values
          var pos = 0
          // flat schema: max repetition level 0 → BIT_PACKED writes nothing
          val defs =
            if (maxDef > 0) {
              // the 4-byte length prefix + hybrid decode below is the RLE
              // layout; a BIT_PACKED page (legal v1) would decode garbage
              // silently — throw instead, per this class's contract
              require(dph.getDefinition_level_encoding ==
                  org.apache.parquet.format.Encoding.RLE,
                s"ParquetSalvage: unsupported definition-level encoding " +
                  s"${dph.getDefinition_level_encoding}")
              val len = intLE(payload, pos); pos += 4
              val d = decodeHybrid(payload, pos, bitsFor(maxDef), n)
              pos += len
              d
            } else Array.fill(n)(0)
          val nPresent = defs.count(_ == maxDef)
          val values: Array[Any] = dph.getEncoding match {
            case org.apache.parquet.format.Encoding.PLAIN_DICTIONARY |
                 org.apache.parquet.format.Encoding.RLE_DICTIONARY =>
              require(dict != null, "ParquetSalvage: dictionary page missing")
              val bw = payload(pos) & 0xff; pos += 1
              decodeHybrid(payload, pos, bw, nPresent).map(dict(_))
            case org.apache.parquet.format.Encoding.PLAIN =>
              decodePlain(payload, pos, payload.length, nPresent,
                ptype, asString)._1
            case e =>
              throw new IllegalArgumentException(
                s"ParquetSalvage: unsupported data encoding $e")
          }
          var i = 0; var v = 0
          while (i < n) {
            if (defs(i) == maxDef) { out(filled + i) = values(v); v += 1 }
            i += 1
          }
          filled += n
        case t =>
          throw new IllegalArgumentException(
            s"ParquetSalvage: unsupported page type $t")
      }
    }
    out
  }

  private def bitsFor(max: Int): Int = 32 - Integer.numberOfLeadingZeros(max)

  private def intLE(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | (b(p + 1) & 0xff) << 8 |
      (b(p + 2) & 0xff) << 16 | (b(p + 3) & 0xff) << 24

  /** PLAIN-encoded values (parquet-format Encodings.md). */
  private def decodePlain(b: Array[Byte], start: Int, end: Int, n: Int,
                          ptype: PrimitiveTypeName,
                          asString: Boolean): (Array[Any], Int) = {
    val out = new Array[Any](n)
    var pos = start
    var i = 0
    ptype match {
      case BINARY =>
        while (i < n) {
          val len = intLE(b, pos); pos += 4
          val bytes = java.util.Arrays.copyOfRange(b, pos, pos + len)
          out(i) = if (asString) new String(bytes, "UTF-8") else bytes
          pos += len; i += 1
        }
      case INT32 =>
        while (i < n) { out(i) = intLE(b, pos); pos += 4; i += 1 }
      case INT64 =>
        while (i < n) {
          out(i) = (intLE(b, pos) & 0xffffffffL) |
            intLE(b, pos + 4).toLong << 32
          pos += 8; i += 1
        }
      case FLOAT =>
        while (i < n) {
          out(i) = java.lang.Float.intBitsToFloat(intLE(b, pos))
          pos += 4; i += 1
        }
      case DOUBLE =>
        while (i < n) {
          val lo = intLE(b, pos) & 0xffffffffL
          val hi = intLE(b, pos + 4).toLong << 32
          out(i) = java.lang.Double.longBitsToDouble(lo | hi)
          pos += 8; i += 1
        }
      case BOOLEAN => // bit-packed, LSB first
        while (i < n) {
          out(i) = (b(pos + (i >> 3)) >> (i & 7) & 1) == 1
          i += 1
        }
        pos += (n + 7) / 8
      case other =>
        throw new IllegalArgumentException(
          s"ParquetSalvage: unsupported PLAIN type $other")
    }
    if (pos > end) throw new EOFException("ParquetSalvage: page underflow")
    (out, pos)
  }

  /** The RLE / bit-packed hybrid (parquet-format Encodings.md §RLE):
    * ULEB128 header, even → RLE run of `header>>1` copies of a
    * byte-aligned value, odd → `header>>1` groups of 8 values packed
    * LSB-first at `bitWidth` bits. Written here rather than through
    * parquet-column's decoder so a 0-bit-width dictionary (this file
    * family's signature quirk) has one obvious code path. */
  private def decodeHybrid(b: Array[Byte], start: Int, bitWidth: Int,
                           n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var pos = start
    var got = 0
    while (got < n) {
      var header = 0; var shift = 0
      var more = true
      while (more) { // ULEB128
        val byte = b(pos) & 0xff; pos += 1
        header |= (byte & 0x7f) << shift; shift += 7
        more = (byte & 0x80) != 0
      }
      if ((header & 1) == 0) { // RLE run
        val run = header >>> 1
        val w = (bitWidth + 7) / 8
        var v = 0; var i = 0
        while (i < w) { v |= (b(pos + i) & 0xff) << (8 * i); i += 1 }
        pos += w
        i = 0
        while (i < run && got < n) { out(got) = v; got += 1; i += 1 }
      } else { // bit-packed groups of 8
        val groups = header >>> 1
        val total = groups * 8
        var i = 0
        while (i < total && got < n) {
          val bit = i * bitWidth
          var v = 0; var j = 0
          while (j < bitWidth) {
            val bi = bit + j
            v |= (b(pos + (bi >> 3)) >> (bi & 7) & 1) << j
            j += 1
          }
          out(got) = v; got += 1; i += 1
        }
        pos += (total * bitWidth + 7) / 8
      }
    }
    out
  }
}
