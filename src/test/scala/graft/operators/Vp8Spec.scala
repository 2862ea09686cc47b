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

  test("lossless payloads and non-webp bytes return null") {
    assert(Vp8.decodeLossyYuv(Array[Byte](1, 2, 3)) === null)
    val ll = Files.readAllBytes(
      Paths.get("src/test/resources/webp").resolve("flat_16x16.webp"))
    assert(Vp8.decodeLossyYuv(ll) === null)
  }
}
