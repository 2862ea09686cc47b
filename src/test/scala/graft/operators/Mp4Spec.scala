package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** ISO-BMFF box-tree parser: round-trips against the assembler,
  * 64-bit largesize and run-to-end boxes, version-1 mvhd, unknown-box
  * skipping, multi-run stts summation, hostile fuzz.
  */
class Mp4Spec extends AnyFunSuite {

  test("round-trips every field the assembler wrote") {
    val bytes = Mp4.encodeMp4(brand = "mp42", timescale = 600, duration = 7200,
      width = 640, height = 360, nFrames = 100, keyInterval = 12,
      audioChannels = 2, audioRate = 48000)
    val m = Mp4.decodeVideoMeta(bytes)
    assert(m != null)
    assert(m.brand === "mp42")
    assert(m.durationMs === 7200L * 1000 / 600)
    val v = m.tracks.find(_.handler == "vide").get
    assert(v.codec === "avc1")
    assert(v.width === 640 && v.height === 360)
    assert(v.nFrames === 100) // stts has TWO runs (99 + 1): must sum
    assert(v.keyframes.toSeq === 1.to(100, 12))
    val a = m.tracks.find(_.handler == "soun").get
    assert(a.codec === "mp4a" && a.channels === 2 && a.rate === 48000)
  }

  test("64-bit largesize boxes and run-to-end boxes parse") {
    val inner = Mp4.encodeMp4("isom", 1000, 5000, 320, 240, 10, 3, 1, 44100)
    // re-wrap the moov box with size=1 + 64-bit largesize
    val moovStart = {
      var p = 0
      while (new String(inner, p + 4, 4, "US-ASCII") != "moov")
        p += java.nio.ByteBuffer.wrap(inner, p, 4).getInt
      p
    }
    val moovLen = java.nio.ByteBuffer.wrap(inner, moovStart, 4).getInt
    val out = new java.io.ByteArrayOutputStream()
    out.write(inner, 0, moovStart) // ftyp
    val hdr = java.nio.ByteBuffer.allocate(16)
    hdr.putInt(1).put("moov".getBytes("US-ASCII")).putLong(moovLen + 8L)
    out.write(hdr.array())
    out.write(inner, moovStart + 8, moovLen - 8)
    // trailing run-to-end box (size 0)
    val tail = java.nio.ByteBuffer.allocate(12)
    tail.putInt(0).put("free".getBytes("US-ASCII")).putInt(0)
    out.write(tail.array())
    val m = Mp4.decodeVideoMeta(out.toByteArray)
    assert(m != null && m.brand === "isom")
    assert(m.tracks.find(_.handler == "vide").get.nFrames === 10)
  }

  test("version-1 mvhd (64-bit times) parses") {
    val base = Mp4.encodeMp4("isom", 90000, 90000L * 42, 1280, 720, 60, 10, 2, 44100)
    // build a v1 mvhd: version 1, ctime/mtime 8 bytes, timescale 4, duration 8
    val v1 = java.nio.ByteBuffer.allocate(8 + 4 + 28)
    v1.putInt(8 + 4 + 28).put("mvhd".getBytes("US-ASCII"))
    v1.putInt(0x01000000) // version 1
    v1.putLong(0).putLong(0).putInt(90000).putLong(90000L * 42)
    // splice: replace the original mvhd inside moov
    def findBox(b: Array[Byte], start: Int, end: Int, typ: String): (Int, Int) = {
      var p = start
      while (p + 8 <= end) {
        val sz = java.nio.ByteBuffer.wrap(b, p, 4).getInt
        if (new String(b, p + 4, 4, "US-ASCII") == typ) return (p, p + sz)
        p += sz
      }
      fail(s"$typ not found")
    }
    val (moovS, moovE) = findBox(base, 0, base.length, "moov")
    val (mvhdS, mvhdE) = findBox(base, moovS + 8, moovE, "mvhd")
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, mvhdS)
    out.write(v1.array())
    out.write(base, mvhdE, base.length - mvhdE)
    val patched = out.toByteArray
    // fix the enclosing moov size for the delta
    val delta = v1.capacity() - (mvhdE - mvhdS)
    val moovSz = java.nio.ByteBuffer.wrap(patched, moovS, 4).getInt
    java.nio.ByteBuffer.wrap(patched, moovS, 4).putInt(moovSz + delta)
    val m = Mp4.decodeVideoMeta(patched)
    assert(m != null && m.durationMs === 42000L)
  }

  test("unknown boxes are skipped structurally, not scanned") {
    val base = Mp4.encodeMp4("isom", 1000, 1000, 160, 90, 5, 2, 1, 8000)
    // insert a junk box between ftyp and moov whose payload contains
    // fake 'moov'/'trak' fourccs — a scanner would trip, a walker skips
    val junkPayload = ("moovtrakmvhd" * 4).getBytes("US-ASCII")
    val junk = java.nio.ByteBuffer.allocate(8 + junkPayload.length)
    junk.putInt(8 + junkPayload.length).put("skip".getBytes("US-ASCII")).put(junkPayload)
    val ftypLen = java.nio.ByteBuffer.wrap(base, 0, 4).getInt
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, ftypLen)
    out.write(junk.array())
    out.write(base, ftypLen, base.length - ftypLen)
    val m = Mp4.decodeVideoMeta(out.toByteArray)
    assert(m != null && m.tracks.size === 2)
    assert(m.tracks.find(_.handler == "vide").get.nFrames === 5)
  }

  test("hostile bytes never throw or hang: fuzz, truncations, size bombs") {
    val rnd = new scala.util.Random(77)
    for (_ <- 0 until 300) {
      val junk = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(junk)
      Mp4.decodeVideoMeta(junk)
      if (junk.length >= 8) { // force the ftyp gate open
        "????ftyp".getBytes("US-ASCII").copyToArray(junk, 0)
        Mp4.decodeVideoMeta(junk)
      }
    }
    val valid = Mp4.encodeMp4("isom", 600, 600, 320, 240, 20, 4, 2, 44100)
    for (n <- 0 until valid.length) // every truncation point
      Mp4.decodeVideoMeta(java.util.Arrays.copyOf(valid, n))
    // zero-size inner box (would never advance a naive walker)
    val bomb = valid.clone()
    val moovOff = {
      var p = 0
      while (new String(bomb, p + 4, 4, "US-ASCII") != "moov")
        p += java.nio.ByteBuffer.wrap(bomb, p, 4).getInt
      p
    }
    java.nio.ByteBuffer.wrap(bomb, moovOff + 8, 4).putInt(0) // first child size = 0
    Mp4.decodeVideoMeta(bomb) // must terminate (run-to-end semantics)
    // negative / overflowing sizes
    java.nio.ByteBuffer.wrap(bomb, moovOff + 8, 4).putInt(-5)
    assert(Mp4.decodeVideoMeta(bomb) === null)
    for (_ <- 0 until 300) { // bit flips
      val mut = valid.clone()
      for (_ <- 0 to rnd.nextInt(4)) {
        val i = rnd.nextInt(mut.length)
        mut(i) = (mut(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      Mp4.decodeVideoMeta(mut)
    }
  }

  test("MJPEG-in-MP4: sample tables resolve and keyframe pixels decode") {
    // three 16x8 gray frames with distinct flat block values
    val w = 16; val h = 8
    def frame(k: Int): Array[Byte] = {
      val raw = Array.tabulate(w * h) { i =>
        val bx = (i % w) / 8
        ((40 + k * 50 + bx * 10) % 256).toByte
      }
      Jpeg.encodeGray(w, h, raw, restartInterval = 0)
    }
    val samples = Array(frame(0), frame(1), frame(2))
    val mp4 = Mp4.encodeMjpegMp4(1000, 300, w, h, samples, keyInterval = 2)

    val m = Mp4.decodeVideoMeta(mp4)
    assert(m != null && m.brand === "mp42")
    val v = m.tracks.find(_.handler == "vide").get
    assert(v.codec === "jpeg" && v.nFrames === 3)
    assert(v.keyframes.toSeq === Seq(1, 3))
    assert(v.sampleSizes.toSeq === samples.map(_.length).toSeq)
    // offsets point at the actual JPEG bytes in mdat
    v.sampleOffsets.zip(v.sampleSizes).zip(samples).foreach {
      case ((off, len), s) =>
        assert(java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(mp4, off.toInt, off.toInt + len), s))
    }

    val spark = graft.functions.SparkTestSession.spark
    import spark.implicits._
    val df = Seq((1L, mp4), (2L, Array[Byte](9, 9, 9))).toDF("id", "vid")
    val rows = Mp4.keyframeJpegFrames(df, "vid")
      .select("id", "frame_idx", "frame_w", "frame_h", "mean_gray")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getDouble(4))).sortBy(x => (x._1, x._2))
    // frame k mean = avg of flat block values (40 + 50k, 50 + 50k)
    assert(rows.toSeq === Seq(
      (1L, 1, w, h, 45.0),   // k=0: (40+50)/2
      (1L, 3, w, h, 145.0))) // k=2: (140+150)/2

    // hostile sample tables: truncations of the MJPEG container never
    // throw, and decode quarantines to empty/null output
    for (n <- 0 until mp4.length by 7)
      Mp4.decodeVideoMeta(java.util.Arrays.copyOf(mp4, n))
  }

  test("keyframe sample plan explodes exactly the stss table") {
    val spark = graft.functions.SparkTestSession.spark
    import spark.implicits._
    val df = Seq(
      (1L, Mp4.encodeMp4("isom", 600, 600, 320, 240, 10, 3, 1, 8000)),
      (2L, Mp4.encodeMp4("isom", 600, 600, 320, 240, 7, 2, 1, 8000)),
      (3L, Array[Byte](1, 2, 3)) // undecodable: contributes no rows
    ).toDF("id", "vid")
    val plan = Mp4.keyframeSamplePlan(df, "vid")
      .select("id", "frame_idx").as[(Long, Int)].collect().sorted
    assert(plan.toSeq === Seq((1L, 1), (1L, 4), (1L, 7), (1L, 10),
      (2L, 1), (2L, 3), (2L, 5), (2L, 7)))
  }
}
