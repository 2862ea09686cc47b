package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque binary
  * columns + typed metadata structs.
  *
  * Image metadata extraction parses REAL container headers from the
  * bytes (PNG IHDR, JPEG SOF segment scan, GIF logical screen
  * descriptor, WebP VP8X) with zero dependencies — full pixel decode
  * would need image libraries this container doesn't ship, but header
  * geometry is what a pipeline filters on before batch-decoding.
  * Everything Spark-side — schema, batching, partition sizing,
  * mapPartitions signature — is the real shape for swapping in a full
  * decoder.
  */
object Multimodal {

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("n_bytes", IntegerType)))

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le24(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16)

  /** Parse (width, height, format, n_bytes) from an image header.
    * Unknown/truncated payloads yield format "unknown" and 0x0.
    */
  def decodeImageMeta(b: Array[Byte]): (Int, Int, String, Int) = {
    if (b == null || b.length < 10) return (0, 0, "unknown", if (b == null) 0 else b.length)
    // PNG: 8-byte signature, then IHDR chunk: len(4) "IHDR" w(4 BE) h(4 BE)
    if (b.length >= 24 &&
        (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return (be32(b, 16), be32(b, 20), "png", b.length)
    // JPEG: FFD8, then marker segments; SOF0/1/2 carries h(BE16)@+5, w@+7
    if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) {
      var i = 2
      while (i + 9 < b.length && (b(i) & 0xFF) == 0xFF) {
        val m = b(i + 1) & 0xFF
        if (m == 0xC0 || m == 0xC1 || m == 0xC2)
          return (be16(b, i + 7), be16(b, i + 5), "jpeg", b.length)
        if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7)) i += 2 // standalone markers
        else if (m == 0xD9) return (0, 0, "jpeg", b.length) // EOI before SOF
        else i += 2 + be16(b, i + 2)
      }
      return (0, 0, "jpeg", b.length)
    }
    // GIF: "GIF87a"/"GIF89a", then w(LE16) h(LE16)
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return (le16(b, 6), le16(b, 8), "gif", b.length)
    // WebP: RIFF....WEBP VP8X: canvas w-1 (LE24)@24, h-1 (LE24)@27
    if (b.length >= 30 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P' &&
        b(12) == 'V' && b(13) == 'P' && b(14) == '8' && b(15) == 'X')
      return (le24(b, 24) + 1, le24(b, 27) + 1, "webp", b.length)
    (0, 0, "unknown", b.length)
  }

  /** Batch image-metadata extraction via mapPartitions (the Scala
    * analogue of mapInPandas batching: one decoder init per partition,
    * streaming rows through it).
    */
  def withImageMeta(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("image_meta", imageMetaSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { iter =>
      // a full pixel decoder would be initialized ONCE here, per partition
      iter.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        val (w, h, fmt, n) = decodeImageMeta(bytes)
        Row.fromSeq(r.toSeq :+ Row(w, h, fmt, n))
      }
    }
  }

  val audioMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType),
    StructField("duration_ms", LongType)))

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  /** Parse (format, channels, sample_rate, bits, duration_ms) from an
    * audio container header — REAL decoders for the header structures
    * (WAV RIFF fmt/data chunk walk, FLAC STREAMINFO bit fields, Ogg
    * Vorbis identification header), zero dependencies. Unknown or
    * truncated payloads yield format "unknown".
    */
  def decodeAudioMeta(b: Array[Byte]): (String, Int, Int, Int, Long) = {
    val unknown = ("unknown", 0, 0, 0, 0L)
    if (b == null || b.length < 16) return unknown
    // WAV: "RIFF" size "WAVE", then chunk walk; "fmt " carries
    // channels(LE16)@+10, sampleRate(LE32)@+12, byteRate(LE32)@+16,
    // bitsPerSample(LE16)@+22; "data" size gives duration
    if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      var i = 12
      var ch = 0; var sr = 0; var bits = 0; var byteRate = 0L; var dataLen = -1L
      while (i + 8 <= b.length && (ch == 0 || dataLen < 0)) {
        val len = le32(b, i + 4)
        if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' ' &&
            i + 24 <= b.length) {
          ch = le16(b, i + 10); sr = le32(b, i + 12).toInt
          byteRate = le32(b, i + 16); bits = le16(b, i + 22)
        } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a')
          dataLen = len
        i += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
        if (len < 0) return unknown
      }
      if (ch == 0) return unknown
      val dur = if (byteRate > 0 && dataLen >= 0) dataLen * 1000L / byteRate else 0L
      return ("wav", ch, sr, bits, dur)
    }
    // FLAC: "fLaC", then STREAMINFO (block type 0, 34 bytes): after
    // 10 bytes of block/frame sizes, a packed field —
    // sampleRate(20 bits) channels-1(3) bps-1(5) totalSamples(36)
    if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C' &&
        (b(4) & 0x7F) == 0 && b.length >= 8 + 34) {
      val o = 8 + 10
      val sr = ((b(o) & 0xFF) << 12) | ((b(o + 1) & 0xFF) << 4) | ((b(o + 2) & 0xFF) >>> 4)
      val ch = ((b(o + 2) & 0x0E) >>> 1) + 1
      val bits = (((b(o + 2) & 0x01) << 4) | ((b(o + 3) & 0xF0) >>> 4)) + 1
      val total = ((b(o + 3) & 0x0FL) << 32) | ((b(o + 4) & 0xFFL) << 24) |
        ((b(o + 5) & 0xFFL) << 16) | ((b(o + 6) & 0xFFL) << 8) | (b(o + 7) & 0xFFL)
      val dur = if (sr > 0) total * 1000L / sr else 0L
      return ("flac", ch, sr, bits, dur)
    }
    // Ogg Vorbis: "OggS" page header (27 bytes + segment table), first
    // packet = "\x01vorbis" id header: channels u8@+11, rate LE32@+12
    if (b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S' && b.length > 27) {
      val nSegs = b(26) & 0xFF
      val p = 27 + nSegs
      if (p + 16 <= b.length && (b(p) & 0xFF) == 0x01 &&
          b(p + 1) == 'v' && b(p + 2) == 'o' && b(p + 3) == 'r' &&
          b(p + 4) == 'b' && b(p + 5) == 'i' && b(p + 6) == 's') {
        val ch = b(p + 11) & 0xFF
        val sr = le32(b, p + 12).toInt
        return ("ogg", ch, sr, 0, 0L)
      }
      return unknown
    }
    unknown
  }

  /** Batch audio-metadata extraction via mapPartitions — same
    * decoder-per-partition shape as withImageMeta.
    */
  def withAudioMeta(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("audio_meta", audioMetaSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { iter =>
      iter.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        val (fmt, ch, sr, bits, dur) = decodeAudioMeta(bytes)
        Row.fromSeq(r.toSeq :+ Row(fmt, ch, sr, bits, dur))
      }
    }
  }

  /** Deterministic frame sampling plan for video payloads: emits
    * (frame_idx, byte_offset) rows without decoding — the shuffle-free
    * explode pattern a real pipeline would use before batch-decoding
    * frames.
    */
  def frameSamplePlan(df: DataFrame, binCol: String, everyN: Int): DataFrame =
    df.withColumn("n_frames",
        greatest(lit(1), (length(col(binCol)) / lit(1024)).cast("int")))
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(lit(0), col("n_frames") - 1), lit(everyN))))
      .withColumn("byte_offset", col("frame_idx") * lit(1024))
      .drop("n_frames")
}
