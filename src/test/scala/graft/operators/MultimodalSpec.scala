package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** Header decoders against hand-assembled real container bytes. */
class MultimodalSpec extends AnyFunSuite {

  private def wav(ch: Int, sr: Int, bits: Int, dataLen: Int,
                  junkChunk: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Long): Unit =
      out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(v.toInt).array())
    out.write("RIFF".getBytes); le32(36L + dataLen); out.write("WAVE".getBytes)
    if (junkChunk) { // a LIST chunk before fmt — the walk must skip it
      out.write("LIST".getBytes); le32(4); out.write("INFO".getBytes)
    }
    out.write("fmt ".getBytes); le32(16); le16(1); le16(ch); le32(sr)
    val byteRate = sr.toLong * ch * bits / 8
    le32(byteRate); le16(ch * bits / 8); le16(bits)
    out.write("data".getBytes); le32(dataLen)
    out.toByteArray
  }

  private def flac(ch: Int, sr: Int, bits: Int, total: Long): Array[Byte] = {
    val b = new Array[Byte](42)
    "fLaC".getBytes.copyToArray(b, 0)
    b(4) = 0x80.toByte; b(7) = 0x22
    b(8) = 0x10; b(10) = 0x10 // min/max block 4096
    val o = 18
    b(o) = (sr >> 12).toByte
    b(o + 1) = ((sr >> 4) & 0xFF).toByte
    b(o + 2) = (((sr & 0xF) << 4) | ((ch - 1) << 1) | ((bits - 1) >> 4)).toByte
    b(o + 3) = ((((bits - 1) & 0xF) << 4) | ((total >> 32) & 0xF).toInt).toByte
    b(o + 4) = ((total >> 24) & 0xFF).toByte
    b(o + 5) = ((total >> 16) & 0xFF).toByte
    b(o + 6) = ((total >> 8) & 0xFF).toByte
    b(o + 7) = (total & 0xFF).toByte
    b
  }

  private def ogg(ch: Int, sr: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("OggS".getBytes); out.write(0); out.write(2)
    out.write(new Array[Byte](20)) // granule + serial + seq + crc
    out.write(1); out.write(30)    // one segment
    out.write(1); out.write("vorbis".getBytes)
    out.write(new Array[Byte](4))  // version
    out.write(ch)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(sr).array())
    out.toByteArray
  }

  test("WAV fmt/data chunk walk") {
    assert(Multimodal.decodeAudioMeta(wav(2, 44100, 16, 44100 * 4 * 3)) ===
      (("wav", 2, 44100, 16, 3000L)))
    // extra chunk before fmt
    assert(Multimodal.decodeAudioMeta(wav(1, 8000, 8, 8000, junkChunk = true)) ===
      (("wav", 1, 8000, 8, 1000L)))
  }

  test("FLAC STREAMINFO bit fields") {
    assert(Multimodal.decodeAudioMeta(flac(2, 48000, 24, 48000L * 7)) ===
      (("flac", 2, 48000, 24, 7000L)))
    assert(Multimodal.decodeAudioMeta(flac(1, 22050, 16, 11025L)) ===
      (("flac", 1, 22050, 16, 500L)))
  }

  test("Ogg Vorbis identification header") {
    assert(Multimodal.decodeAudioMeta(ogg(2, 44100)) === (("ogg", 2, 44100, 0, 0L)))
  }

  test("hostile/truncated audio payloads degrade to unknown") {
    assert(Multimodal.decodeAudioMeta(null)._1 === "unknown")
    assert(Multimodal.decodeAudioMeta(Array.empty[Byte])._1 === "unknown")
    assert(Multimodal.decodeAudioMeta("RIFFxxxxWAVE".getBytes)._1 === "unknown")
    assert(Multimodal.decodeAudioMeta("fLaC then junk that is far too short".getBytes.take(20))._1 === "unknown")
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val b = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(b)
      Multimodal.decodeAudioMeta(b) // must not throw
    }
    // truncating real payloads anywhere must not throw
    for (full <- Seq(wav(2, 44100, 16, 1000), flac(2, 48000, 16, 480L), ogg(1, 8000));
         n <- 0 to full.length)
      Multimodal.decodeAudioMeta(full.take(n))
  }

  test("image header decode (PNG/JPEG/GIF/WebP)") {
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val png = hex("89504E470D0A1A0A0000000D49484452" + "00000280" + "000001E0" + "0806000000")
    assert(Multimodal.decodeImageMeta(png) === ((640, 480, "png", png.length)))
    val gif = hex("474946383961" + "8002" + "E001" + "F70000")
    assert(Multimodal.decodeImageMeta(gif) === ((640, 480, "gif", gif.length)))
  }

  private def gradient(w: Int, h: Int, ch: Int, seed: Int): Array[Byte] = {
    val raw = new Array[Byte](w * h * ch)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
      raw((y * w + x) * ch + c) = ((seed + x * (7 + c) + y * (11 + 2 * c)) % 256).toByte
    raw
  }

  test("PNG pixel round-trip: all channel counts, all filter types, degenerate sizes") {
    for (ch <- Seq(1, 2, 3, 4); (w, h) <- Seq((1, 1), (1, 7), (5, 1), (13, 9), (32, 32))) {
      val raw = gradient(w, h, ch, seed = 37 * ch + w)
      // vary the filter per row: every scanline filter 0..4 appears
      val png = Multimodal.encodePng(w, h, ch, raw, y => y % 5)
      val img = Multimodal.decodePngPixels(png)
      assert(img != null, s"ch=$ch ${w}x$h")
      assert((img.width, img.height, img.channels) === ((w, h, ch)))
      assert(java.util.Arrays.equals(img.pixels, raw), s"ch=$ch ${w}x$h")
      // each fixed filter type alone must also invert correctly
      for (f <- 0 to 4) {
        val one = Multimodal.decodePngPixels(Multimodal.encodePng(w, h, ch, raw, _ => f))
        assert(one != null && java.util.Arrays.equals(one.pixels, raw), s"filter $f")
      }
    }
  }

  test("PNG palette decode expands PLTE to RGB") {
    val w = 6; val h = 4
    val indices = Array.tabulate(w * h)(i => (i % 3).toByte)
    val palette = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90)
    val img = Multimodal.decodePngPixels(
      Multimodal.encodePngPalette(w, h, indices, palette, y => (y + 2) % 5))
    assert(img != null && img.channels === 3)
    for (i <- 0 until w * h; c <- 0 until 3)
      assert(img.pixels(3 * i + c) === palette(3 * (i % 3) + c))
  }

  test("PNG decoder vs the JDK's own ImageIO codec (independent oracle, both directions)") {
    val w = 23; val h = 17
    val raw = gradient(w, h, 3, seed = 5)
    // our encoder -> ImageIO decoder
    val viaImageIO = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.encodePng(w, h, 3, raw, y => y % 5)))
    assert(viaImageIO.getWidth === w && viaImageIO.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = viaImageIO.getRGB(x, y)
      val o = (y * w + x) * 3
      assert(((rgb >> 16) & 0xFF) === (raw(o) & 0xFF), s"r @($x,$y)")
      assert(((rgb >> 8) & 0xFF) === (raw(o + 1) & 0xFF), s"g @($x,$y)")
      assert((rgb & 0xFF) === (raw(o + 2) & 0xFF), s"b @($x,$y)")
    }
    // ImageIO encoder -> our decoder
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      bi.setRGB(x, y, ((raw(o) & 0xFF) << 16) | ((raw(o + 1) & 0xFF) << 8) | (raw(o + 2) & 0xFF))
    }
    val buf = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "png", buf))
    val ours = Multimodal.decodePngPixels(buf.toByteArray)
    assert(ours != null && ours.width === w && ours.height === h && ours.channels === 3)
    assert(java.util.Arrays.equals(ours.pixels, raw))
  }

  test("WAV chunk walk terminates on hostile chunk lengths") {
    // a JUNK chunk whose length 0xFFFFFFF8 made `8 + len.toInt` zero —
    // the walk never advanced (infinite loop); other high-bit lengths
    // drove the index negative (AIOOBE)
    for (evil <- Seq(0xFFFFFFF8L, 0xFFFFFFFFL, 0x7FFFFFFFL, 0x80000000L)) {
      val out = new ByteArrayOutputStream()
      def le32(v: Long): Unit =
        out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
          .putInt(v.toInt).array())
      out.write("RIFF".getBytes); le32(100); out.write("WAVE".getBytes)
      out.write("JUNK".getBytes); le32(evil)
      out.write(new Array[Byte](32))
      assert(Multimodal.decodeAudioMeta(out.toByteArray) === (("unknown", 0, 0, 0, 0L)))
    }
  }

  test("PNG decoder rejects a zlib FDICT stream instead of spinning") {
    // zlib header 0x78 0x20: FDICT set, checksum valid — Inflater then
    // returns 0 with needsDictionary()=true forever; the decoder must
    // return null, not hang
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(ByteBuffer.allocate(4).putInt(data.length).array())
      val tb = typ.getBytes
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
      out.write(tb); out.write(data)
      out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    chunk("IHDR", ByteBuffer.allocate(13).putInt(4).putInt(4)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array())
    chunk("IDAT", Array[Byte](0x78, 0x20, 0, 0, 0, 1, 0, 0))
    chunk("IEND", Array.emptyByteArray)
    assert(Multimodal.decodePngPixels(out.toByteArray) === null)
  }

  test("GIF pixel round-trip: literal-LZW encoder -> full LZW decoder") {
    val palette = Array.tabulate(768)(i => ((i / 3 * (1 + i % 3 * 2)) % 256).toByte)
    for ((w, h) <- Seq((1, 1), (7, 3), (40, 25), (64, 64))) {
      // > 253 pixels exercises the encoder's CLEAR-reset cadence and
      // the decoder's dictionary growth/reset
      val indices = Array.tabulate(w * h)(i => ((i * 31 + 7) % 256).toByte)
      val img = Multimodal.decodeGifPixels(Multimodal.encodeGif(w, h, indices, palette))
      assert(img != null, s"${w}x$h")
      assert((img.width, img.height, img.channels) === ((w, h, 3)))
      for (k <- 0 until w * h; c <- 0 until 3)
        assert(img.pixels(3 * k + c) === palette(3 * (indices(k) & 0xFF) + c), s"px $k ch $c")
    }
  }

  test("GIF decoder vs the JDK's own ImageIO codec (real compressed LZW, both directions)") {
    val w = 37; val h = 23
    def rgbAt(x: Int, y: Int): Int = { // few distinct colors -> GIF-safe
      val v = ((x / 5 + y / 3) % 8) * 32
      (v << 16) | (((v + 64) % 256) << 8) | ((v + 128) % 256)
    }
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) bi.setRGB(x, y, rgbAt(x, y))
    val buf = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "gif", buf)) // real LZW compression
    val ours = Multimodal.decodeGifPixels(buf.toByteArray)
    assert(ours != null && ours.width === w && ours.height === h)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      val exp = rgbAt(x, y)
      assert((ours.pixels(o) & 0xFF) === ((exp >> 16) & 0xFF), s"r @($x,$y)")
      assert((ours.pixels(o + 1) & 0xFF) === ((exp >> 8) & 0xFF), s"g @($x,$y)")
      assert((ours.pixels(o + 2) & 0xFF) === (exp & 0xFF), s"b @($x,$y)")
    }
    // our encoder -> ImageIO decoder
    val palette = Array.tabulate(768)(i => ((i / 3) ^ (i % 3 * 85)).toByte)
    val indices = Array.tabulate(w * h)(i => ((i * 13) % 256).toByte)
    val viaImageIO = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.encodeGif(w, h, indices, palette)))
    assert(viaImageIO.getWidth === w && viaImageIO.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val idx = indices(y * w + x) & 0xFF
      val rgb = viaImageIO.getRGB(x, y)
      assert(((rgb >> 16) & 0xFF) === (palette(3 * idx) & 0xFF), s"r @($x,$y)")
      assert(((rgb >> 8) & 0xFF) === (palette(3 * idx + 1) & 0xFF), s"g @($x,$y)")
      assert((rgb & 0xFF) === (palette(3 * idx + 2) & 0xFF), s"b @($x,$y)")
    }
  }

  test("GIF interlace: 4-pass row reordering decodes to natural order") {
    val w = 5; val h = 10
    val palette = Array.tabulate(768)(_.toByte)
    val natural = Array.tabulate(w * h)(i => (i % 256).toByte)
    // stream rows in interlace pass order (0,8 / 4 / 2,6 / 1,3,5,7,9)
    val passRows = Seq(0 until h by 8, 4 until h by 8, 2 until h by 4, 1 until h by 2).flatten
    val streamed = new Array[Byte](w * h)
    for ((destRow, srcPos) <- passRows.zipWithIndex)
      System.arraycopy(natural, destRow * w, streamed, srcPos * w, w)
    val gif = Multimodal.encodeGif(w, h, streamed, palette)
    // set the interlace flag (bit 6 of the image-descriptor packed byte,
    // 9 bytes past the 0x2C separator)
    var sep = 13 + 768 // header+LSD+GCT
    assert((gif(sep) & 0xFF) === 0x2C)
    gif(sep + 9) = (gif(sep + 9) | 0x40).toByte
    val img = Multimodal.decodeGifPixels(gif)
    assert(img != null)
    for (k <- 0 until w * h)
      assert(img.pixels(3 * k) === palette(3 * (natural(k) & 0xFF)), s"px $k")
  }

  test("GIF decoder never throws or hangs on hostile bytes") {
    val rnd = new scala.util.Random(777)
    for (_ <- 0 until 300) {
      val b = new Array[Byte](rnd.nextInt(256))
      rnd.nextBytes(b)
      Multimodal.decodeGifPixels(b)
    }
    val palette = Array.tabulate(768)(_.toByte)
    val full = Multimodal.encodeGif(20, 10, Array.tabulate(200)(_.toByte), palette)
    for (n <- 0 to full.length) Multimodal.decodeGifPixels(full.take(n))
    for (i <- full.indices) {
      val mut = full.clone(); mut(i) = (mut(i) ^ 0x11).toByte
      Multimodal.decodeGifPixels(mut)
    }
  }

  test("resizeBox: identity, exact block averages, non-divisible sizes") {
    // identity
    val img = Multimodal.PngImage(4, 2, 1, Array[Byte](10, 20, 30, 40, 50, 60, 70, 80))
    val same = Multimodal.resizeBox(img, 4, 2)
    assert(java.util.Arrays.equals(same.pixels, img.pixels))
    // 4x2 -> 2x1: each output = floor-average of a 2x2 block
    val half = Multimodal.resizeBox(img, 2, 1)
    assert(half.width === 2 && half.height === 1)
    assert(half.pixels.toSeq === Seq[Byte](
      ((10 + 20 + 50 + 60) / 4).toByte, ((30 + 40 + 70 + 80) / 4).toByte))
    // non-divisible: 5 -> 2 partitions inputs by x*2/5 = [0,0,0,1,1]
    val row5 = Multimodal.PngImage(5, 1, 1, Array[Byte](0, 10, 20, 30, 40))
    val two = Multimodal.resizeBox(row5, 2, 1)
    assert(two.pixels.toSeq === Seq[Byte](((0 + 10 + 20) / 3).toByte, ((30 + 40) / 2).toByte))
    // multi-channel + values above 127 (signed-byte handling)
    val rgb = Multimodal.PngImage(2, 1, 3,
      Array(200, 210, 220, 250, 240, 230).map(_.toByte))
    val one = Multimodal.resizeBox(rgb, 1, 1)
    assert(one.pixels.map(_ & 0xFF).toSeq === Seq((200 + 250) / 2, (210 + 240) / 2, (220 + 230) / 2))
  }

  test("PNG decoder never throws on hostile bytes") {
    val rnd = new scala.util.Random(4242)
    for (_ <- 0 until 300) {
      val b = new Array[Byte](rnd.nextInt(256))
      rnd.nextBytes(b)
      Multimodal.decodePngPixels(b) // must not throw
    }
    val full = Multimodal.encodePng(9, 7, 3, gradient(9, 7, 3, 1), y => y % 5)
    for (n <- 0 to full.length)
      Multimodal.decodePngPixels(full.take(n)) // truncations must not throw
    // bit flips: either null or a decoded image, never an exception
    for (i <- full.indices) {
      val mut = full.clone(); mut(i) = (mut(i) ^ 0x40).toByte
      Multimodal.decodePngPixels(mut)
    }
  }
}
