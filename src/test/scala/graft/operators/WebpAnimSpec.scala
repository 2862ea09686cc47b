package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Animated-WebP demux + canvas compositor gates: structure
  * round-trip through the assembler, overwrite/blend/dispose
  * semantics, lossy ANMF payloads, hostile truncations. */
class WebpAnimSpec extends AnyFunSuite {

  private def solid(w: Int, h: Int, r: Int, g: Int, b: Int, a: Int = 255) = {
    val px = new Array[Byte](w * h * 4)
    var i = 0
    while (i < w * h) {
      px(i * 4) = r.toByte; px(i * 4 + 1) = g.toByte
      px(i * 4 + 2) = b.toByte; px(i * 4 + 3) = a.toByte
      i += 1
    }
    Webp.encodeLossless(w, h, px)
  }

  test("structure round-trip through the assembler") {
    val anim = Webp.encodeAnim(64, 32, 0xFF102030, 3, Seq(
      (0, 0, solid(8, 8, 1, 2, 3), 40, true, false),
      (16, 8, solid(8, 16, 4, 5, 6), 80, false, true)))
    val m = Webp.decodeAnim(anim)
    assert(m != null)
    assert(m.canvasW === 64 && m.canvasH === 32)
    assert(m.bgColor === 0xFF102030 && m.loopCount === 3)
    assert(m.frames.length === 2)
    assert(m.frames(0).x === 0 && m.frames(0).durationMs === 40 &&
      m.frames(0).blend && !m.frames(0).disposeToBg)
    assert(m.frames(1).x === 16 && m.frames(1).y === 8 &&
      m.frames(1).width === 8 && m.frames(1).height === 16 &&
      !m.frames(1).blend && m.frames(1).disposeToBg)
  }

  test("compositing: overwrite, dispose-to-background, placement") {
    val anim = Webp.encodeAnim(16, 16, 0xFF000000 | (9 << 16) | (8 << 8) | 7, 0, Seq(
      (0, 0, solid(8, 8, 100, 110, 120), 10, false, true),  // disposed later
      (8, 8, solid(8, 8, 200, 210, 220), 10, false, false)))
    val f0 = Webp.renderAnimFrame(anim, 0)
    assert(f0 != null)
    def px(img: Multimodal.PngImage, x: Int, y: Int) = {
      val o = (y * img.width + x) * 4
      ((img.pixels(o) & 0xFF), (img.pixels(o + 1) & 0xFF),
        (img.pixels(o + 2) & 0xFF), (img.pixels(o + 3) & 0xFF))
    }
    assert(px(f0, 0, 0) === ((100, 110, 120, 255)))
    assert(px(f0, 12, 12) === ((9, 8, 7, 255))) // background
    val f1 = Webp.renderAnimFrame(anim, 1)
    // frame 0's region disposed to background before frame 1
    assert(px(f1, 0, 0) === ((9, 8, 7, 255)))
    assert(px(f1, 12, 12) === ((200, 210, 220, 255)))
  }

  test("alpha blending follows the container-spec integer formula") {
    // 50%-alpha tile blended over an opaque background
    val anim = Webp.encodeAnim(8, 8, 0xFF000000 | (40 << 16) | (60 << 8) | 80, 0,
      Seq((0, 0, solid(8, 8, 200, 100, 0, 128), 10, true, false)))
    val f = Webp.renderAnimFrame(anim, 0)
    val o = 0
    val sa = 128; val da = 255
    val oa = sa + da * (255 - sa) / 255
    def mix(sc: Int, dc: Int) = (sc * sa + dc * da * (255 - sa) / 255) / oa
    assert((f.pixels(o) & 0xFF) === mix(200, 40))
    assert((f.pixels(o + 1) & 0xFF) === mix(100, 60))
    assert((f.pixels(o + 2) & 0xFF) === mix(0, 80))
    assert((f.pixels(o + 3) & 0xFF) === oa)
  }

  test("lossy (VP8) ANMF payloads decode through the same path") {
    val lossy = Vp8.encodeMinimal(16, 16, 26, 2)
    val anim = Webp.encodeAnim(16, 16, 0xFF000000, 0,
      Seq((0, 0, lossy, 25, false, false)))
    val m = Webp.decodeAnim(anim)
    assert(m != null && m.frames.length === 1 && m.frames(0).width === 16)
    val f = Webp.renderAnimFrame(anim, 0)
    assert(f != null)
    // same pixels as decoding the standalone lossy container
    val direct = Vp8.decodeLossy(lossy)
    for (i <- 0 until 16 * 16) {
      assert((f.pixels(i * 4) & 0xFF) === (direct.pixels(i * 3) & 0xFF))
      assert((f.pixels(i * 4 + 3) & 0xFF) === 255)
    }
  }

  test("withAnimFrames explodes one row per ANMF frame, demux-only") {
    val spark = graft.functions.SparkTestSession.spark
    locally {
      val anim = Webp.encodeAnim(32, 32, 0xFF000000, 2, Seq(
        (0, 0, solid(8, 8, 1, 2, 3), 40, true, false),
        (8, 16, solid(8, 8, 4, 5, 6), 70, false, true)))
      import scala.jdk.CollectionConverters._
      val df = spark.createDataFrame(
        Seq(org.apache.spark.sql.Row(1L, anim),
          org.apache.spark.sql.Row(2L, Array[Byte](1, 2, 3))).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("payload",
            org.apache.spark.sql.types.BinaryType))))
      val rows = Multimodal.withAnimFrames(df, "payload")
        .selectExpr("id", "anim_frame.frame_idx", "anim_frame.x",
          "anim_frame.y", "anim_frame.duration_ms", "anim_frame.dispose_bg")
        .collect().sortBy(r => (r.getLong(0), r.getInt(1)))
      assert(rows.length === 2) // bad payload contributes zero rows
      assert(rows(0).getInt(1) === 0 && rows(0).getInt(4) === 40)
      assert(rows(1).getInt(2) === 8 && rows(1).getInt(3) === 16 &&
        rows(1).getBoolean(5))
    }
  }

  test("hostile truncations never throw or hang") {
    val anim = Webp.encodeAnim(32, 32, 0xFFFFFFFF, 1, Seq(
      (0, 0, solid(8, 8, 1, 2, 3), 40, true, false),
      (8, 0, solid(8, 8, 4, 5, 6), 40, false, true)))
    val t0 = System.nanoTime()
    for (n <- 0 until anim.length) {
      val cut = java.util.Arrays.copyOf(anim, n)
      Webp.decodeAnim(cut)
      Webp.renderAnimFrame(cut, 0)
      Webp.renderAnimFrame(cut, 5)
    }
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 500) {
      val b = anim.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Webp.decodeAnim(b)
      Webp.renderAnimFrame(b, 1)
    }
    assert((System.nanoTime() - t0) / 1e9 < 60.0)
    assert(Webp.decodeAnim(solid(8, 8, 1, 2, 3)) === null) // non-animated
  }
}
