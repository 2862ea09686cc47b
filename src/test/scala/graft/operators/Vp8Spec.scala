package graft.operators

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** VP8 (lossy WebP) decoder gates.
  *
  * The core gate is BIT-EXACT YUV equality against the system
  * libwebp's own normative decode (WebPDecodeYUV) of REAL
  * libwebp-encoded lossy streams — VP8 reconstruction (boolean
  * decoder, dequant, IDCT/WHT, intra prediction, loop filter) is
  * exactly specified integer math, so any decoder error corrupts
  * pixels. Fixtures: tools/gen_vp8_fixtures.py.
  */
class Vp8Spec extends AnyFunSuite {

  private val dir = Paths.get("src/test/resources/vp8")

  private def fixtures: Seq[String] =
    Files.list(dir).toArray.map(_.toString).filter(_.endsWith(".webp"))
      .map(p => Paths.get(p).getFileName.toString.stripSuffix(".webp"))
      .sorted.toSeq

  private def readYuv(base: String): (Int, Int, Array[Byte], Array[Byte], Array[Byte]) = {
    val b = Files.readAllBytes(dir.resolve(base + ".yuv"))
    val w = (b(0) & 0xFF) | ((b(1) & 0xFF) << 8) | ((b(2) & 0xFF) << 16) | ((b(3) & 0xFF) << 24)
    val h = (b(4) & 0xFF) | ((b(5) & 0xFF) << 8) | ((b(6) & 0xFF) << 16) | ((b(7) & 0xFF) << 24)
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val y = java.util.Arrays.copyOfRange(b, 8, 8 + w * h)
    val u = java.util.Arrays.copyOfRange(b, 8 + w * h, 8 + w * h + cw * ch)
    val v = java.util.Arrays.copyOfRange(b, 8 + w * h + cw * ch, 8 + w * h + 2 * cw * ch)
    (w, h, y, u, v)
  }

  private def diff(name: String, plane: String, w: Int,
                   got: Array[Byte], exp: Array[Byte]): String = {
    var n = 0; var first = ""
    var i = 0
    while (i < exp.length) {
      if (got(i) != exp(i)) {
        n += 1
        if (n == 1) first = s"first at (${i % w},${i / w}): got ${got(i) & 0xFF} want ${exp(i) & 0xFF}"
      }
      i += 1
    }
    if (n == 0) "" else s"$name $plane: $n/${exp.length} mismatches, $first; "
  }

  test("bit-exact YUV decode of every real libwebp lossy fixture") {
    assert(fixtures.nonEmpty)
    var report = ""
    for (base <- fixtures) {
      val webp = Files.readAllBytes(dir.resolve(base + ".webp"))
      val (w, h, ey, eu, ev) = readYuv(base)
      val img = Vp8.decodeLossyYuv(webp)
      if (img == null) report += s"$base: decode returned null; "
      else {
        assert(img.width === w && img.height === h, base)
        report += diff(base, "Y", w, img.y, ey)
        report += diff(base, "U", (w + 1) / 2, img.u, eu)
        report += diff(base, "V", (w + 1) / 2, img.v, ev)
      }
    }
    assert(report.isEmpty, report)
  }

  test("bit-exact pre-filter reconstruction (bypass_filtering ground truth)") {
    // isolates the reconstruction pipeline from the loop filter: the
    // .nflt.yuv files are libwebp's own decode with bypass_filtering=1
    // (tools/gen_vp8_nofilter.py)
    var report = ""
    for (base <- fixtures if Files.exists(dir.resolve(base + ".nflt.yuv"))) {
      val webp = Files.readAllBytes(dir.resolve(base + ".webp"))
      val b = Files.readAllBytes(dir.resolve(base + ".nflt.yuv"))
      val w = (b(0) & 0xFF) | ((b(1) & 0xFF) << 8)
      val img = Vp8.decodeLossyYuvNoFilter(webp)
      assert(img != null, base)
      val exp = java.util.Arrays.copyOfRange(b, 8, 8 + img.y.length)
      report += diff(base, "Y-nflt", w, img.y, exp)
    }
    assert(report.isEmpty, report)
  }

  test("hostile bytes: never throws, never hangs") {
    val rnd = new scala.util.Random(20260818L)
    val real = Files.readAllBytes(dir.resolve(fixtures.head + ".webp"))
    val t0 = System.nanoTime()
    // truncations at every point
    for (n <- 0 until real.length)
      Vp8.decodeLossyYuv(java.util.Arrays.copyOf(real, n))
    // bit flips
    for (_ <- 0 until 2000) {
      val b = real.clone()
      val k = 1 + rnd.nextInt(4)
      for (_ <- 0 until k) b(rnd.nextInt(b.length)) =
        (rnd.nextInt(256) & 0xFF).toByte
      Vp8.decodeLossyYuv(b)
    }
    // pure garbage with a valid-ish RIFF prelude
    for (_ <- 0 until 500) {
      val b = new Array[Byte](64 + rnd.nextInt(512))
      rnd.nextBytes(b)
      System.arraycopy("RIFF".getBytes, 0, b, 0, 4)
      System.arraycopy("WEBPVP8 ".getBytes, 0, b, 8, 8)
      Vp8.decodeLossyYuv(b)
    }
    assert((System.nanoTime() - t0) / 1e9 < 120.0, "hostile fuzz too slow")
  }

  test("bit-exact alpha plane on real libwebp lossy+alpha fixtures") {
    // VP8X + ALPH + VP8 containers; ground truth is libwebp's own
    // RGBA decode's alpha channel (alpha decode is lossless)
    val bases = fixtures.filter(b => Files.exists(dir.resolve(b + ".alpha")))
    assert(bases.nonEmpty)
    var report = ""
    for (base <- bases) {
      val webp = Files.readAllBytes(dir.resolve(base + ".webp"))
      val b = Files.readAllBytes(dir.resolve(base + ".alpha"))
      val w = (b(0) & 0xFF) | ((b(1) & 0xFF) << 8)
      val h = (b(4) & 0xFF) | ((b(5) & 0xFF) << 8)
      val img = Vp8.decodeLossy(webp)
      if (img == null) report += s"$base: null; "
      else if (img.channels != 4) report += s"$base: channels=${img.channels}; "
      else {
        val got = new Array[Byte](w * h)
        var i = 0
        while (i < w * h) { got(i) = img.pixels(i * 4 + 3); i += 1 }
        val exp = java.util.Arrays.copyOfRange(b, 8, 8 + w * h)
        report += diff(base, "A", w, got, exp)
      }
    }
    assert(report.isEmpty, report)
  }

  test("encodeMinimal round-trips through the full decoder to the closed form") {
    for ((w, h) <- Seq((16, 16), (32, 16), (48, 32), (16, 48));
         qi <- Seq(0, 13, 26, 60, 100); dc <- Seq(1, 2, 3, 4, 6, 9)) {
      val bytes = Vp8.encodeMinimal(w, h, qi, dc)
      val img = Vp8.decodeLossyYuv(bytes)
      assert(img != null, s"$w x $h qi=$qi dc=$dc")
      assert(img.width === w && img.height === h)
      val exp = Vp8.minimalExpected(w, h, qi, dc)
      var bad = 0
      for (by <- 0 until h / 4; bx <- 0 until w / 4; r <- 0 until 4; c <- 0 until 4)
        if ((img.y((by * 4 + r) * w + bx * 4 + c) & 0xFF) != exp(by)(bx)) bad += 1
      assert(bad === 0, s"$w x $h qi=$qi dc=$dc: $bad luma mismatches")
      // chroma: zero residual, DC prediction cascading from the
      // 127/129 borders — top chroma-MB row lands on exactly 128, and
      // deeper rows can only drift to 129 via the left-border average
      val cw = w / 2
      assert(img.u.take(cw * 8).forall(v => (v & 0xFF) == 128), s"$w x $h U row0")
      assert(img.u.forall(v => (v & 0xFF) == 128 || (v & 0xFF) == 129),
        s"$w x $h qi=$qi dc=$dc U")
      assert(img.v.forall(v => (v & 0xFF) == 128 || (v & 0xFF) == 129),
        s"$w x $h qi=$qi dc=$dc V")
    }
  }

  test("encodeMinimal streams decode identically under the system libwebp") {
    // independent-implementation cross-check; skipped when python3 or
    // libwebp is unavailable (e.g. a bare CI container)
    val probe = try {
      new ProcessBuilder("python3", "-c", "import ctypes; ctypes.CDLL('libwebp.so.7')")
        .start().waitFor() == 0
    } catch { case _: Exception => false }
    assume(probe, "python3 + libwebp not available")
    val tmp = Files.createTempDirectory("vp8enc")
    val script = tmp.resolve("chk.py")
    Files.write(script,
      """import ctypes, struct, sys
        |lw = ctypes.CDLL("libwebp.so.7")
        |lw.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
        |lw.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
        |    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        |    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        |    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        |    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        |data = open(sys.argv[1], 'rb').read()
        |w, h = ctypes.c_int(), ctypes.c_int()
        |u = ctypes.POINTER(ctypes.c_uint8)(); v = ctypes.POINTER(ctypes.c_uint8)()
        |ys, uvs = ctypes.c_int(), ctypes.c_int()
        |y = lw.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
        |    ctypes.byref(u), ctypes.byref(v), ctypes.byref(ys), ctypes.byref(uvs))
        |if not y: sys.exit(3)
        |out = b"".join(bytes(y[r*ys.value:r*ys.value+w.value]) for r in range(h.value))
        |sys.stdout.buffer.write(struct.pack('<II', w.value, h.value) + out)
        |""".stripMargin.getBytes)
    for ((w, h, qi, dc, np) <- Seq((16, 16, 26, 1, 1), (32, 32, 60, 3, 1),
        (48, 16, 0, 9, 1), (32, 48, 26, 2, 2), (48, 80, 40, 5, 4))) {
      val bytes = Vp8.encodeMinimal(w, h, qi, dc, np)
      val f = tmp.resolve(s"t_${w}x${h}_$qi-$dc.webp")
      Files.write(f, bytes)
      val pr = new ProcessBuilder("python3", script.toString, f.toString).start()
      val out = pr.getInputStream.readAllBytes()
      assert(pr.waitFor() === 0, s"libwebp rejected $w x $h qi=$qi dc=$dc")
      val dw = (out(0) & 0xFF) | ((out(1) & 0xFF) << 8)
      assert(dw === w)
      val mine = Vp8.decodeLossyYuv(bytes)
      val libY = java.util.Arrays.copyOfRange(out, 8, 8 + w * h)
      assert(java.util.Arrays.equals(mine.y, libY),
        s"libwebp and our decoder disagree on our own stream $w x $h qi=$qi dc=$dc np=$np")
    }
  }

  test("multi-partition token streams decode to the same closed form") {
    for (np <- Seq(2, 4, 8); (w, h) <- Seq((32, 64), (48, 128))) {
      val one = Vp8.decodeLossyYuv(Vp8.encodeMinimal(w, h, 26, 3, 1))
      val many = Vp8.decodeLossyYuv(Vp8.encodeMinimal(w, h, 26, 3, np))
      assert(many != null, s"np=$np $w x $h")
      assert(java.util.Arrays.equals(one.y, many.y), s"np=$np $w x $h")
    }
  }

  test("VP8X-wrapped lossy payloads decode via the chunk walk") {
    val inner = Vp8.encodeMinimal(16, 16, 26, 2)
    // strip RIFF, rewrap with a VP8X chunk before the VP8 chunk
    val frame = java.util.Arrays.copyOfRange(inner, 20, inner.length)
    val vp8x = Array[Byte]('V', 'P', '8', 'X', 10, 0, 0, 0,
      0, 0, 0, 0, 15, 0, 0, 15, 0, 0) // canvas 16x16 (w-1/h-1 LE24)
    val riffLen = 4 + vp8x.length + 8 + frame.length
    val bb = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(riffLen); bb.put("WEBP".getBytes)
    bb.put(vp8x)
    bb.put("VP8 ".getBytes); bb.putInt(frame.length); bb.put(frame)
    val img = Vp8.decodeLossyYuv(bb.array())
    assert(img != null && img.width === 16 && img.height === 16)
    val direct = Vp8.decodeLossyYuv(inner)
    assert(java.util.Arrays.equals(img.y, direct.y))
  }

  test("lossless payloads and non-webp bytes return null") {
    assert(Vp8.decodeLossyYuv(Array[Byte](1, 2, 3)) === null)
    val ll = Files.readAllBytes(
      Paths.get("src/test/resources/webp").resolve("flat_16x16.webp"))
    assert(Vp8.decodeLossyYuv(ll) === null)
  }
}
