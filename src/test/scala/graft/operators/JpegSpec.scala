package graft.operators

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG codec: bit-exact flat-block round-trips (the q96
  * oracle contract), near-lossless generic content at quant=1,
  * cross-validation against the JDK's own ImageIO JPEG codec in both
  * directions, restart-marker resync, 4:2:0 upsampling, hostile fuzz.
  */
class JpegSpec extends AnyFunSuite {

  /** image that is CONSTANT per 8x8 block — survives DCT exactly */
  private def blockFlatGray(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((seed * 31 + (x / 8) * 7 + (y / 8) * 13) % 256).toByte
    }

  private def gradientGray(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((seed + x * 3 + y * 2) % 256).toByte
    }

  private def smoothRgb(w: Int, h: Int, seed: Int): Array[Byte] = {
    val raw = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      raw(o) = (64 + ((seed + x * 2 + y) % 128)).toByte
      raw(o + 1) = (32 + ((seed * 2 + x + y * 2) % 160)).toByte
      raw(o + 2) = (16 + ((seed * 3 + x + y) % 192)).toByte
    }
    raw
  }

  // the decoder's inverse color transform, for computing expected RGB
  private def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def c(v: Long): Int = math.max(0, math.min(255, v)).toInt
    def r(d: Double): Long = math.round(d)
    (c(r(y + 1.402 * (cr - 128))),
      c(r(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))),
      c(r(y + 1.772 * (cb - 128))))
  }

  private def maxAbsDiff(a: Array[Byte], b: Array[Byte]): Int = {
    require(a.length == b.length)
    var m = 0
    for (i <- a.indices) m = math.max(m, math.abs((a(i) & 0xFF) - (b(i) & 0xFF)))
    m
  }

  test("flat 8x8 blocks round-trip BIT-EXACTLY through gray JPEG (quant=1)") {
    for ((w, h, seed) <- Seq((8, 8, 1), (16, 24, 2), (24, 16, 3), (19, 13, 4), (33, 9, 5))) {
      val raw = blockFlatGray(w, h, seed)
      val img = Jpeg.decode(Jpeg.encodeGray(w, h, raw))
      assert(img != null, s"${w}x$h decode failed")
      assert(img.width === w && img.height === h && img.channels === 1)
      assert(java.util.Arrays.equals(img.pixels, raw), s"${w}x$h seed=$seed not exact")
    }
  }

  test("flat-block RGB 4:4:4 round-trips exactly modulo the YCbCr integer transform") {
    val w = 24; val h = 16
    val raw = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      raw(o) = (((x / 8) * 40 + (y / 8) * 10 + 30) % 256).toByte
      raw(o + 1) = (((x / 8) * 20 + (y / 8) * 50 + 60) % 256).toByte
      raw(o + 2) = (((x / 8) * 70 + (y / 8) * 30 + 90) % 256).toByte
    }
    val img = Jpeg.decode(Jpeg.encodeRgb444(w, h, raw))
    assert(img != null && img.width === w && img.height === h && img.channels === 3)
    for (i <- 0 until w * h) {
      val (yv, cb, cr) = Jpeg.rgbToYcc(raw(3 * i) & 0xFF, raw(3 * i + 1) & 0xFF, raw(3 * i + 2) & 0xFF)
      val (er, eg, eb) = yccToRgb(yv, cb, cr)
      assert((img.pixels(3 * i) & 0xFF) === er, s"r @$i")
      assert((img.pixels(3 * i + 1) & 0xFF) === eg, s"g @$i")
      assert((img.pixels(3 * i + 2) & 0xFF) === eb, s"b @$i")
    }
  }

  test("generic gradients at quant=1 are near-lossless (AC rounding only)") {
    val w = 29; val h = 21
    val raw = gradientGray(w, h, 7)
    val img = Jpeg.decode(Jpeg.encodeGray(w, h, raw))
    assert(img != null)
    assert(maxAbsDiff(img.pixels, raw) <= 1, "quant=1 gray drift")
  }

  test("restart intervals: encoder emits RSTn, decoder resyncs and resets predictors") {
    val w = 40; val h = 24 // 5x3 = 15 MCUs, interval 2 -> 7 restarts
    val raw = blockFlatGray(w, h, 9)
    val bytes = Jpeg.encodeGray(w, h, raw, restartInterval = 2)
    // the stream really contains RSTn markers
    assert((0 until bytes.length - 1).exists(i =>
      (bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) >= 0xD0 && (bytes(i + 1) & 0xFF) <= 0xD7))
    val img = Jpeg.decode(bytes)
    assert(img != null && java.util.Arrays.equals(img.pixels, raw))
    // and the JDK's decoder agrees on the same bytes
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(jdk != null && jdk.getWidth === w && jdk.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) // raster samples: getRGB gamma-converts gray->sRGB
      assert(math.abs(jdk.getRaster.getSample(x, y, 0) - (raw(y * w + x) & 0xFF)) <= 1,
        s"jdk-vs-raw @($x,$y)")
  }

  test("our gray streams decode identically in the JDK's ImageIO (+-1 IDCT rounding)") {
    val w = 31; val h = 18
    val raw = gradientGray(w, h, 11)
    val bytes = Jpeg.encodeGray(w, h, raw)
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(jdk != null && jdk.getWidth === w && jdk.getHeight === h)
    val ours = Jpeg.decode(bytes)
    assert(ours != null)
    for (y <- 0 until h; x <- 0 until w) {
      val j = jdk.getRaster.getSample(x, y, 0) // getRGB gamma-converts gray
      val o = ours.pixels(y * w + x) & 0xFF
      assert(math.abs(j - o) <= 1, s"jdk=$j ours=$o @($x,$y)")
    }
  }

  test("our RGB 4:4:4 streams decode identically in the JDK's ImageIO") {
    val w = 20; val h = 14
    val raw = smoothRgb(w, h, 3)
    val bytes = Jpeg.encodeRgb444(w, h, raw)
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(jdk != null && jdk.getWidth === w && jdk.getHeight === h)
    val ours = Jpeg.decode(bytes)
    assert(ours != null && ours.channels === 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val j = (jdk.getRGB(x, y) >> (16 - 8 * c)) & 0xFF
      val o = ours.pixels((y * w + x) * 3 + c) & 0xFF
      assert(math.abs(j - o) <= 2, s"jdk=$j ours=$o @($x,$y,c$c)")
    }
  }

  private def imageIoJpeg(bi: java.awt.image.BufferedImage, quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val buf = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), p)
    writer.dispose(); ios.close()
    buf.toByteArray
  }

  test("ImageIO-encoded GRAY decodes to the JDK's own pixels (real Annex-K stream inbound)") {
    val w = 26; val h = 22
    val raw = gradientGray(w, h, 13)
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, raw(y * w + x) & 0xFF)
    val bytes = imageIoJpeg(bi, 0.95f)
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val ours = Jpeg.decode(bytes)
    assert(ours != null && ours.width === w && ours.height === h && ours.channels === 1)
    for (y <- 0 until h; x <- 0 until w) {
      val j = jdk.getRaster.getSample(x, y, 0) // getRGB gamma-converts gray
      val o = ours.pixels(y * w + x) & 0xFF
      assert(math.abs(j - o) <= 1, s"jdk=$j ours=$o @($x,$y)")
    }
  }

  test("ImageIO-encoded COLOR (subsampled chroma) decodes within upsampling tolerance") {
    val w = 37; val h = 25 // odd dims force partial chroma blocks
    val raw = smoothRgb(w, h, 17)
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      bi.setRGB(x, y, ((raw(o) & 0xFF) << 16) | ((raw(o + 1) & 0xFF) << 8) | (raw(o + 2) & 0xFF))
    }
    val bytes = imageIoJpeg(bi, 0.97f)
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val ours = Jpeg.decode(bytes)
    assert(ours != null && ours.width === w && ours.height === h && ours.channels === 3)
    // the JDK upsamples chroma with a triangle filter, we replicate —
    // on smooth content the methods differ by at most the local chroma
    // slope; the luma channel dominates so the bound stays tight
    var worst = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val j = (jdk.getRGB(x, y) >> (16 - 8 * c)) & 0xFF
      val o = ours.pixels((y * w + x) * 3 + c) & 0xFF
      worst = math.max(worst, math.abs(j - o))
    }
    assert(worst <= 6, s"worst channel diff $worst vs JDK fancy upsampling")
  }

  test("image meta header scan agrees with the full decode") {
    val w = 24; val h = 16
    val bytes = Jpeg.encodeRgb444(w, h, smoothRgb(w, h, 23))
    val (mw, mh, fmt, _) = Multimodal.decodeImageMeta(bytes)
    assert((mw, mh, fmt) === ((w, h, "jpeg")))
  }

  test("hostile bytes never throw or hang: fuzz, truncations, bit flips") {
    val rnd = new scala.util.Random(424242)
    for (_ <- 0 until 300) {
      val junk = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(junk)
      Jpeg.decode(junk) // must not throw
      if (junk.length >= 2) { junk(0) = 0xFF.toByte; junk(1) = 0xD8.toByte }
      Jpeg.decode(junk)
    }
    val valid = Jpeg.encodeGray(24, 24, blockFlatGray(24, 24, 1), restartInterval = 3)
    for (_ <- 0 until 300) { // truncations
      Jpeg.decode(java.util.Arrays.copyOf(valid, rnd.nextInt(valid.length)))
    }
    for (_ <- 0 until 300) { // bit flips
      val mut = valid.clone()
      for (_ <- 0 to rnd.nextInt(4)) {
        val i = rnd.nextInt(mut.length)
        mut(i) = (mut(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      Jpeg.decode(mut) // may null, must not throw
    }
  }

  test("unsupported shapes are rejected cleanly (progressive, CMYK markers)") {
    // progressive: flip SOF0 -> SOF2 in one of our streams
    val bytes = Jpeg.encodeGray(16, 16, blockFlatGray(16, 16, 2))
    val prog = bytes.clone()
    val sof = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    assert(Jpeg.decode(prog) === null)
    assert(Jpeg.decode(null) === null)
    assert(Jpeg.decode(Array[Byte](0xFF.toByte, 0xD8.toByte)) === null)
  }
}
