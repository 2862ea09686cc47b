package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ISO Base Media File Format (MP4) container metadata — REAL, zero
  * dependencies. Upgrades the video leg of the multimodal pipeline
  * from the byte-length heuristic to the actual structures a crawl
  * pipeline filters and samples on: the ISO-BMFF box tree.
  *
  * Decoder: recursive box walk (32-bit and 64-bit largesize lengths,
  * unknown boxes skipped structurally), ftyp major brand, moov/mvhd
  * version 0/1 (movie timescale + duration), per-trak tkhd (16.16
  * fixed-point visual dimensions), mdia/hdlr (vide/soun handler),
  * stbl/stsd (first sample-entry fourcc; audio entries carry channel
  * count + 16.16 sample rate), stts (total frame count = sum of
  * sample-table run lengths) and stss (sync-sample == keyframe table).
  * Hostile-input-safe: every loop is bounded by the enclosing box
  * extent, malformed bytes yield nulls (never throws, never hangs) —
  * the same 10^12-row quarantine contract as the image/audio decoders.
  *
  * Encoder: `encodeMp4` assembles a minimal VALID box tree (ftyp,
  * moov{mvhd, trak{tkhd, mdia{mdhd, hdlr, minf{stbl{stsd, stts,
  * stss}}}}, trak{... soun ...}}) so specs and the q97 oracle exercise
  * the real parser against real structures, deterministically.
  */
object Mp4 {

  val videoMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("brand", StringType),
    StructField("duration_ms", LongType),
    StructField("video_codec", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("n_keyframes", IntegerType),
    StructField("audio_codec", StringType),
    StructField("audio_channels", IntegerType),
    StructField("audio_rate", IntegerType)))

  final case class TrackMeta(handler: String, codec: String,
                             width: Int, height: Int, nFrames: Int,
                             keyframes: Array[Int], channels: Int, rate: Int,
                             sampleSizes: Array[Int] = Array.emptyIntArray,
                             sampleOffsets: Array[Long] = Array.emptyLongArray)
  final case class VideoMeta(brand: String, durationMs: Long,
                             tracks: List[TrackMeta])

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the children of [start, end), invoking f(type, payloadStart,
    * payloadEnd). Returns false on a structurally invalid child (which
    * aborts the whole parse — hostile sizes must not loop).
    */
  private def walk(b: Array[Byte], start: Long, end: Long)
                  (f: (String, Long, Long) => Boolean): Boolean = {
    var p = start
    while (p + 8 <= end) {
      val size0 = be32(b, p.toInt)
      val typ = fourcc(b, p.toInt + 4)
      var payload = p + 8
      val boxEnd = size0 match {
        case 0 => end // box extends to the end of the enclosing scope
        case 1 =>
          if (p + 16 > end) return false
          payload = p + 16
          p + be64(b, p.toInt + 8)
        case s => p + s
      }
      if (boxEnd < payload || boxEnd > end) return false
      if (!f(typ, payload, boxEnd)) return false
      p = boxEnd
    }
    true
  }

  /** Parse container metadata from MP4 bytes; null if not ISO-BMFF or
    * structurally invalid. Never throws.
    */
  def decodeVideoMeta(b: Array[Byte]): VideoMeta = {
    try {
      if (b == null || b.length < 16) return null
      if (fourcc(b, 4) != "ftyp") return null
      var brand: String = null
      var mvTimescale = 0L
      var mvDuration = 0L
      val tracks = List.newBuilder[TrackMeta]

      def parseStbl(s: Long, e: Long, t: TrackBuf): Boolean =
        walk(b, s, e) { (typ, ps, pe) =>
          typ match {
            case "stsd" =>
              // version/flags(4) entryCount(4), then sample entries
              if (ps + 16 > pe) return false
              val i = (ps + 8).toInt
              t.codec = fourcc(b, i + 4)
              if (t.handler == "soun" && ps + 8 + 36 <= pe) {
                // AudioSampleEntry: 8 hdr + 8 reserved + ch(2) bits(2)
                // + predef(2) + reserved(2) + rate(16.16)
                t.channels = be16(b, i + 24)
                t.rate = (be32(b, i + 32) >>> 16).toInt
              }
            case "stts" =>
              if (ps + 8 > pe) return false
              val n = be32(b, (ps + 4).toInt)
              if (n < 0 || ps + 8 + 8 * n > pe) return false
              var total = 0L
              var k = 0
              while (k < n) {
                total += be32(b, (ps + 8 + 8 * k).toInt)
                k += 1
              }
              t.nFrames = math.min(total, Int.MaxValue).toInt
            case "stss" =>
              if (ps + 8 > pe) return false
              val n = be32(b, (ps + 4).toInt)
              if (n < 0 || n > (1 << 24) || ps + 8 + 4 * n > pe) return false
              t.keyframes = Array.tabulate(n.toInt)(k =>
                be32(b, (ps + 8 + 4 * k).toInt).toInt)
            case "stsz" =>
              // version/flags(4) uniform_size(4) sample_count(4)
              if (ps + 12 > pe) return false
              val uniform = be32(b, (ps + 4).toInt)
              val n = be32(b, (ps + 8).toInt)
              if (n < 0 || n > (1 << 24)) return false
              if (uniform != 0L)
                t.sampleSizes = Array.fill(n.toInt)(uniform.toInt)
              else {
                if (ps + 12 + 4 * n > pe) return false
                t.sampleSizes = Array.tabulate(n.toInt)(k =>
                  be32(b, (ps + 12 + 4 * k).toInt).toInt)
              }
            case "stsc" =>
              // (first_chunk, samples_per_chunk, sample_desc_idx) runs
              if (ps + 8 > pe) return false
              val n = be32(b, (ps + 4).toInt)
              if (n < 0 || n > (1 << 20) || ps + 8 + 12 * n > pe) return false
              t.stscRuns = Array.tabulate(n.toInt)(k => (
                be32(b, (ps + 8 + 12 * k).toInt).toInt,
                be32(b, (ps + 12 + 12 * k).toInt).toInt))
            case "stco" =>
              if (ps + 8 > pe) return false
              val n = be32(b, (ps + 4).toInt)
              if (n < 0 || n > (1 << 24) || ps + 8 + 4 * n > pe) return false
              t.chunkOffsets = Array.tabulate(n.toInt)(k =>
                be32(b, (ps + 8 + 4 * k).toInt))
            case _ => ()
          }
          true
        }

      def parseTrak(s: Long, e: Long): Boolean = {
        val t = new TrackBuf
        var mdiaOk = true // inner mdia/stbl corruption nulls the parse
        val ok = walk(b, s, e) { (typ, ps, pe) =>
          typ match {
            case "tkhd" =>
              val v = b(ps.toInt) & 0xFF
              val base = if (v == 1) ps + 4 + 32 else ps + 4 + 20
              // ... reserved(8) layer(2) altgroup(2) volume(2) rsvd(2)
              // matrix(36) width(4 16.16) height(4 16.16)
              val wOff = base + 16 + 36
              if (wOff + 8 <= pe) {
                t.width = (be32(b, wOff.toInt) >>> 16).toInt
                t.height = (be32(b, (wOff + 4).toInt) >>> 16).toInt
              }
            case "mdia" =>
              mdiaOk = mdiaOk && walk(b, ps, pe) { (t2, p2, e2) =>
                t2 match {
                  case "hdlr" =>
                    if (p2 + 12 <= e2) t.handler = fourcc(b, (p2 + 8).toInt)
                    true
                  case "minf" =>
                    walk(b, p2, e2) { (t3, p3, e3) =>
                      if (t3 == "stbl") parseStbl(p3, e3, t) else true
                    }
                  case _ => true
                }
              }
            case _ => ()
          }
          true
        } && mdiaOk
        if (ok) tracks += TrackMeta(t.handler, t.codec, t.width, t.height,
          t.nFrames, t.keyframes, t.channels, t.rate,
          t.sampleSizes, resolveSampleOffsets(t))
        ok
      }

      val ok = walk(b, 0, b.length.toLong) { (typ, ps, pe) =>
        typ match {
          case "ftyp" =>
            if (ps + 4 <= pe) brand = fourcc(b, ps.toInt)
            true
          case "moov" =>
            walk(b, ps, pe) { (t, p2, e2) =>
              t match {
                case "mvhd" =>
                  val v = b(p2.toInt) & 0xFF
                  if (v == 1) {
                    if (p2 + 4 + 28 > e2) return null
                    mvTimescale = be32(b, (p2 + 4 + 16).toInt)
                    mvDuration = be64(b, (p2 + 4 + 20).toInt)
                  } else {
                    if (p2 + 4 + 16 > e2) return null
                    mvTimescale = be32(b, (p2 + 4 + 8).toInt)
                    mvDuration = be32(b, (p2 + 4 + 12).toInt)
                  }
                case "trak" => if (!parseTrak(p2, e2)) return null
                case _ => ()
              }
              true
            }
          case _ => true // mdat / free / unknown: skipped structurally
        }
      }
      if (!ok || brand == null) return null
      val durMs = if (mvTimescale > 0) mvDuration * 1000L / mvTimescale else 0L
      VideoMeta(brand, durMs, tracks.result())
    } catch { case _: Exception => null }
  }

  private final class TrackBuf {
    var handler = ""
    var codec = ""
    var width = 0
    var height = 0
    var nFrames = 0
    var keyframes: Array[Int] = Array.emptyIntArray
    var channels = 0
    var rate = 0
    var sampleSizes: Array[Int] = Array.emptyIntArray
    var stscRuns: Array[(Int, Int)] = Array.empty
    var chunkOffsets: Array[Long] = Array.emptyLongArray
  }

  /** Per-sample file offsets from the stsz/stsc/stco tables (the
    * standard ISO-BMFF resolution: for each chunk, its samples lie
    * consecutively from the chunk offset). Returns only the samples
    * the tables can resolve — a hostile/truncated table yields a
    * shorter array, never an exception.
    */
  private def resolveSampleOffsets(t: TrackBuf): Array[Long] = {
    val sizes = t.sampleSizes
    if (sizes.isEmpty || t.stscRuns.isEmpty || t.chunkOffsets.isEmpty)
      return Array.emptyLongArray
    val out = new Array[Long](sizes.length)
    var s = 0
    var run = 0
    var c = 1
    while (s < sizes.length && c <= t.chunkOffsets.length) {
      while (run + 1 < t.stscRuns.length && t.stscRuns(run + 1)._1 <= c) run += 1
      val spc = t.stscRuns(run)._2
      if (spc <= 0) return java.util.Arrays.copyOf(out, s)
      var off = t.chunkOffsets(c - 1)
      var j = 0
      while (j < spc && s < sizes.length) {
        if (sizes(s) < 0) return java.util.Arrays.copyOf(out, s)
        out(s) = off
        off += sizes(s)
        s += 1
        j += 1
      }
      c += 1
    }
    if (s < sizes.length) java.util.Arrays.copyOf(out, s) else out
  }

  /** Batch video-metadata extraction via mapPartitions — the same
    * decoder-per-partition batch shape as the image/audio extractors.
    */
  def withVideoMeta(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("video_meta", videoMetaSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { iter =>
      iter.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        val m = decodeVideoMeta(bytes)
        val struct = if (m == null) null else {
          val v = m.tracks.find(_.handler == "vide")
          val a = m.tracks.find(_.handler == "soun")
          Row("mp4", m.brand, m.durationMs,
            v.map(_.codec).orNull,
            v.map(_.width).map(Int.box).orNull,
            v.map(_.height).map(Int.box).orNull,
            v.map(_.nFrames).map(Int.box).orNull,
            v.map(_.keyframes.length).map(Int.box).orNull,
            a.map(_.codec).orNull,
            a.map(_.channels).map(Int.box).orNull,
            a.map(_.rate).map(Int.box).orNull)
        }
        Row.fromSeq(r.toSeq :+ struct)
      }
    }
  }

  /** REAL frame-sample plan: one row per keyframe (the stss sync
    * table), the decode-cheap sampling a video pipeline actually uses
    * (seeking to non-sync frames requires decoding the whole GOP).
    * Emits (.., frame_idx) with frame_idx 1-based as in stss.
    */
  def keyframeSamplePlan(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("frame_idx", IntegerType))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { iter =>
      iter.flatMap { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        val m = decodeVideoMeta(bytes)
        m match {
          case null => Iterator.empty
          case meta => meta.tracks.find(_.handler == "vide") match {
            case None => Iterator.empty
            case Some(v) => v.keyframes.iterator.map(k => Row.fromSeq(r.toSeq :+ k))
          }
        }
      }
    }
  }

  // ------------------------------------------------------------ encode

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val n = 8 + payload.map(_.length).sum
    val out = java.nio.ByteBuffer.allocate(n)
    out.putInt(n)
    out.put(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    payload.foreach(out.put)
    out.array()
  }

  private def u32(vs: Long*): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 * vs.length)
    vs.foreach(v => out.putInt(v.toInt))
    out.array()
  }

  /** Assemble a minimal valid MP4: one video track (avc1, stts run
    * table, stss keyframes every `keyInterval` starting at 1) and one
    * audio track (mp4a). Deterministic; parseable by the decoder above
    * and structured exactly as real muxers lay it out.
    */
  def encodeMp4(brand: String, timescale: Int, duration: Long,
                width: Int, height: Int, nFrames: Int, keyInterval: Int,
                audioChannels: Int, audioRate: Int): Array[Byte] = {
    require(timescale > 0 && nFrames >= 0 && keyInterval > 0)
    val ftyp = box("ftyp",
      brand.getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      u32(0), "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val mvhd = box("mvhd", u32(0, 0, 0, timescale, duration),
      u32(0x00010000, 0x01000000), // rate 1.0, volume 1.0 + reserved
      u32(0, 0), // reserved
      u32(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000), // unity matrix
      u32(0, 0, 0, 0, 0, 0), // predefined
      u32(3)) // next track id

    def tkhd(trackId: Int, w: Int, h: Int) = box("tkhd",
      u32(7, 0, 0, trackId, 0, duration), // v0 flags=7, ctime mtime id rsvd dur
      u32(0, 0), // reserved
      u32(0, 0), // layer/altgroup, volume/reserved
      u32(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000),
      u32(w.toLong << 16, h.toLong << 16))

    def mdhd = box("mdhd", u32(0, 0, 0, timescale, duration), u32(0x55C40000L))

    def hdlr(handler: String, name: String) = box("hdlr",
      u32(0, 0),
      handler.getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      u32(0, 0, 0),
      (name + "\u0000").getBytes(java.nio.charset.StandardCharsets.US_ASCII))

    // video sample entry: 8 hdr handled by box(); 78-byte avc1 body
    val avc1Body = java.nio.ByteBuffer.allocate(78)
    avc1Body.putInt(0).putInt(1) // reserved + data_reference_index
    avc1Body.putShort(0).putShort(0).putInt(0).putInt(0).putInt(0) // predefs
    avc1Body.putShort(width.toShort).putShort(height.toShort)
    avc1Body.putInt(0x00480000).putInt(0x00480000) // 72 dpi
    avc1Body.putInt(0).putShort(1)                 // reserved, frame_count
    avc1Body.put(new Array[Byte](32))              // compressor name
    avc1Body.putShort(24).putShort(-1)             // depth, predefined
    val stsdV = box("stsd", u32(0, 1), box("avc1", avc1Body.array()))

    val audBody = java.nio.ByteBuffer.allocate(28)
    audBody.putInt(0).putInt(1)                   // reserved + dref index
    audBody.putInt(0).putInt(0)                   // reserved
    audBody.putShort(audioChannels.toShort).putShort(16) // channels, bits
    audBody.putInt(0)                             // predefined/reserved
    audBody.putInt(audioRate << 16)               // 16.16 rate
    val stsdA = box("stsd", u32(0, 1), box("mp4a", audBody.array()))

    // stts: two runs so the decoder must SUM them (catches first-run-
    // only parsing): nFrames-1 frames of delta 100, then 1 of delta 200
    val stts =
      if (nFrames >= 2) box("stts", u32(0, 2, nFrames - 1, 100, 1, 200))
      else box("stts", u32(0, 1, nFrames, 100))
    val keyframes = 1.to(nFrames, keyInterval).toArray
    val stss = box("stss",
      u32(0L, keyframes.length.toLong), u32(keyframes.map(_.toLong).toSeq: _*))

    val stblV = box("stbl", stsdV, stts, stss)
    val stblA = box("stbl", stsdA, box("stts", u32(0, 0)))
    def minf(stbl: Array[Byte]) = box("minf", stbl)

    val trakV = box("trak", tkhd(1, width, height),
      box("mdia", mdhd, hdlr("vide", "VideoHandler"), minf(stblV)))
    val trakA = box("trak", tkhd(2, 0, 0),
      box("mdia", mdhd, hdlr("soun", "SoundHandler"), minf(stblA)))
    val moov = box("moov", mvhd, trakV, trakA)
    val mdat = box("mdat", new Array[Byte](16))
    ftyp ++ moov ++ mdat
  }

  /** Assemble an MJPEG-in-MP4: one video track whose sample entry is
    * the QuickTime/ISO "jpeg" fourcc and whose mdat carries the given
    * JPEG byte streams as the samples, with REAL stsz/stsc/stco sample
    * tables (one chunk; stco patched after the moov size is known) and
    * stss keyframes every `keyInterval`. This is the decodable-video
    * shape a crawl actually meets without shipping an H.264 decoder:
    * the frame-sample plan seeks keyframes and Jpeg.decode yields real
    * pixels.
    */
  def encodeMjpegMp4(timescale: Int, duration: Long,
                     width: Int, height: Int,
                     samples: Array[Array[Byte]], keyInterval: Int): Array[Byte] = {
    require(timescale > 0 && keyInterval > 0 && samples.nonEmpty)
    val nFrames = samples.length
    val ftyp = box("ftyp",
      "mp42".getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      u32(0), "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val mvhd = box("mvhd", u32(0, 0, 0, timescale, duration),
      u32(0x00010000, 0x01000000), u32(0, 0),
      u32(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000),
      u32(0, 0, 0, 0, 0, 0), u32(2))
    val tkhd = box("tkhd",
      u32(7, 0, 0, 1, 0, duration), u32(0, 0), u32(0, 0),
      u32(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000),
      u32(width.toLong << 16, height.toLong << 16))
    val mdhd = box("mdhd", u32(0, 0, 0, timescale, duration), u32(0x55C40000L))
    val hdlr = box("hdlr", u32(0, 0),
      "vide".getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      u32(0, 0, 0),
      "VideoHandler\u0000".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val entryBody = java.nio.ByteBuffer.allocate(78)
    entryBody.putInt(0).putInt(1)
    entryBody.putShort(0).putShort(0).putInt(0).putInt(0).putInt(0)
    entryBody.putShort(width.toShort).putShort(height.toShort)
    entryBody.putInt(0x00480000).putInt(0x00480000)
    entryBody.putInt(0).putShort(1)
    entryBody.put(new Array[Byte](32))
    entryBody.putShort(24).putShort(-1)
    val stsd = box("stsd", u32(0, 1), box("jpeg", entryBody.array()))
    val stts = box("stts", u32(0, 1, nFrames, 100))
    val keyframes = 1.to(nFrames, keyInterval).toArray
    val stss = box("stss",
      u32(0L, keyframes.length.toLong), u32(keyframes.map(_.toLong).toSeq: _*))
    val stsz = box("stsz",
      u32(0, 0, nFrames), u32(samples.map(_.length.toLong).toSeq: _*))
    val stsc = box("stsc", u32(0, 1, 1, nFrames, 1))
    def moovWith(mdatOff: Long): Array[Byte] = {
      val stco = box("stco", u32(0, 1, mdatOff))
      val stbl = box("stbl", stsd, stts, stss, stsz, stsc, stco)
      val trak = box("trak", tkhd, box("mdia", mdhd, hdlr, box("minf", stbl)))
      box("moov", mvhd, trak)
    }
    // stco points into mdat, whose position depends on moov's size —
    // build once with a placeholder (sizes are offset-independent),
    // then rebuild with the real offset
    val mdatPayloadOff = ftyp.length.toLong + moovWith(0L).length + 8L
    val moov = moovWith(mdatPayloadOff)
    val payload = new Array[Byte](samples.map(_.length).sum)
    var p = 0
    samples.foreach { sb =>
      System.arraycopy(sb, 0, payload, p, sb.length); p += sb.length
    }
    ftyp ++ moov ++ box("mdat", payload)
  }

  /** REAL video frame pixel decode over the keyframe sample plan:
    * resolve each stss keyframe through the stsz/stsc/stco tables,
    * slice its bytes out of mdat, decode with the JPEG pixel decoder,
    * and emit (frame_idx, width, height, mean_gray) per keyframe. One
    * mapPartitions over the binary column — the decode-cheap sampling
    * shape a 100 TB video corpus needs (no GOP reconstruction; only
    * sync samples are touched). Rows whose container or frame fails to
    * decode emit nulls rather than throwing.
    */
  def keyframeJpegFrames(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType),
      StructField("frame_w", IntegerType),
      StructField("frame_h", IntegerType),
      StructField("mean_gray", DoubleType)))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { iter =>
      iter.flatMap { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        val m = decodeVideoMeta(bytes)
        val v = if (m == null) None
          else m.tracks.find(t => t.handler == "vide" && t.codec == "jpeg")
        v match {
          case None => Iterator.empty
          case Some(t) => t.keyframes.iterator.map { k =>
            val i = k - 1
            val img =
              if (i < 0 || i >= t.sampleOffsets.length) null
              else {
                val off = t.sampleOffsets(i)
                val len = t.sampleSizes(i)
                if (off < 0 || len <= 0 || off + len > bytes.length) null
                else Jpeg.decode(java.util.Arrays.copyOfRange(
                  bytes, off.toInt, (off + len).toInt))
              }
            if (img == null) Row.fromSeq(r.toSeq ++ Seq[Any](k, null, null, null))
            else {
              var sum = 0L
              var j = 0
              while (j < img.pixels.length) { sum += img.pixels(j) & 0xFF; j += 1 }
              val mean =
                math.floor(sum.toDouble / img.pixels.length * 1e6) / 1e6
              Row.fromSeq(r.toSeq ++ Seq[Any](k, img.width, img.height, mean))
            }
          }
        }
      }
    }
  }
}
