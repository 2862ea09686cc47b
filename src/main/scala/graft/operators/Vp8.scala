package graft.operators

/** VP8 (lossy WebP) keyframe pixel decoder — REAL, zero dependencies.
  *
  * Implements RFC 6386's normative integer reconstruction end-to-end:
  * boolean (range) decoder, keyframe headers (segmentation, loop
  * filter deltas, token partitions, quantizer indices), per-MB intra
  * mode parsing (keyframe trees with above/left subblock-mode
  * contexts), coefficient token decoding (band/context probability
  * tables, category extra bits, no-EOB-after-ZERO rule), per-segment
  * dequantization, inverse WHT (Y2 DC scatter) and inverse DCT
  * (20091/35468 fixed-point rotations), all 4x4/16x16/chroma intra
  * predictors with the spec's 127/129 frame-border conventions, and
  * the full normal + simple loop filters (interior limits, high-edge-
  * variance thresholds, MB vs subblock edge variants).
  *
  * VP8 reconstruction is exactly specified integer math, so the gate
  * is BIT-EXACT equality with the system libwebp's own normative YUV
  * output (WebPDecodeYUV) on real libwebp-encoded lossy fixtures —
  * see Vp8Spec and tools/gen_vp8_fixtures.py. RGB conversion is NOT
  * normative (libwebp's fancy upsampler is its own choice); toRgb
  * uses documented BT.601 limited-range with nearest chroma.
  *
  * The spec's large empirically-derived probability/dequant tables
  * live in Vp8Tables.scala (provenance:
  * tools/extract_vp8_tables.py). Never throws and never hangs on
  * hostile bytes — nulls quarantine, the same contract as the
  * PNG/GIF/JPEG/VP8L decoders.
  */
object Vp8 {

  import Multimodal.PngImage
  import Vp8Tables._

  /** Cropped planar 4:2:0 frame: y is width*height, u/v are
    * ceil(width/2)*ceil(height/2), all row-major. */
  final case class YuvImage(width: Int, height: Int,
                            y: Array[Byte], u: Array[Byte], v: Array[Byte])

  private final class Fail extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Fail

  /** test-only: when non-null, decode0 appends per-MB header/mode
    * diagnostics (segment, skip, Y/UV modes, subblock modes) */
  private[operators] var debugLog: StringBuilder = null

  /** RFC 6386 7.2 boolean decoder. Reads past the partition end feed
    * zero bytes (the spec's convention for well-formed streams that
    * end mid-symbol); a hostile stream that keeps pulling virtual
    * zeros is cut off by the work bound in the MB loop, and gross
    * overruns fail() out. */
  private final class Bd(data: Array[Byte], start: Int, endExcl: Int) {
    private var pos = start
    private val end = math.min(endExcl, data.length)
    private var range = 255
    private var value = (nextByte() << 8) | nextByte()
    private var bitCount = 0
    private var virt = 0
    private def nextByte(): Int =
      if (pos < end) { val b = data(pos) & 0xFF; pos += 1; b }
      else { virt += 1; if (virt > (1 << 20)) fail(); 0 }
    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val big = split << 8
      var ret = 0
      if (value >= big) { ret = 1; range -= split; value -= big }
      else range = split
      while (range < 128) {
        value <<= 1; range <<= 1
        bitCount += 1
        if (bitCount == 8) { bitCount = 0; value |= nextByte() }
      }
      ret
    }
    def bit(): Int = bool(128)
    def literal(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def signed(n: Int): Int = { val v = literal(n); if (bit() == 1) -v else v }
    /** walk a token tree; probs indexed at pOff + node/2 */
    def tree(t: Array[Int], p: Array[Int], pOff: Int): Int = {
      var i = t(bool(p(pOff)))
      while (i > 0) i = t(i + bool(p(pOff + (i >> 1))))
      -i
    }
  }

  // ---------------------------------------------------------------
  // container walk: find the "VP8 " chunk payload in a RIFF WebP file
  private def findVp8(b: Array[Byte]): (Int, Int) =
    findChunk(b, 'V', 'P', '8', ' ')

  private def findChunk(b: Array[Byte], c0: Char, c1: Char, c2: Char,
                        c3: Char): (Int, Int) = {
    if (b.length < 20 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P') return (-1, 0)
    var p = 12L // Long: a hostile chunk size near 2^31 must not wrap
    while (p + 8 <= b.length) {
      val i = p.toInt
      val size = (b(i + 4) & 0xFFL) | ((b(i + 5) & 0xFFL) << 8) |
        ((b(i + 6) & 0xFFL) << 16) | ((b(i + 7) & 0xFFL) << 24)
      if (b(i) == c0 && b(i + 1) == c1 && b(i + 2) == c2 && b(i + 3) == c3)
        return (i + 8, math.min(size, (b.length - i - 8).toLong).toInt)
      p += 8 + size + (size & 1)
    }
    (-1, 0)
  }

  /** Decode a lossy (VP8 keyframe) WebP to planar YUV 4:2:0.
    * Null on lossless payloads, interframes, malformed or hostile
    * bytes — never throws, never hangs. */
  def decodeLossyYuv(bytes: Array[Byte]): YuvImage =
    try decode0(bytes, applyFilter = true) catch { case _: Exception => null }

  /** test hook: reconstruction without the loop filter, for bisecting
    * against libwebp's bypass_filtering output */
  private[operators] def decodeLossyYuvNoFilter(bytes: Array[Byte]): YuvImage =
    try decode0(bytes, applyFilter = false) catch { case _: Exception => null }

  /** Decode a lossy WebP to RGB — or RGBA when the container carries
    * an ALPH chunk (VP8X alpha: raw or headerless-VP8L-compressed
    * plane with the spec's horizontal/vertical/gradient inverse
    * filters). Color is BT.601 limited-range with nearest-neighbor
    * chroma upsampling (documented non-normative conversion; the
    * normative surfaces are decodeLossyYuv and the alpha plane). */
  def decodeLossy(bytes: Array[Byte]): PngImage = {
    val yuv = decodeLossyYuv(bytes)
    if (yuv == null) return null
    val alpha = try decodeAlpha(bytes, yuv.width, yuv.height)
    catch { case _: Exception => null }
    if (alpha == null) toRgb(yuv) else toRgba(yuv, alpha)
  }

  /** The decoded ALPH plane (w*h bytes), or null when absent/bad. */
  private[operators] def decodeAlpha(b: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val (off, size) = findChunk(b, 'A', 'L', 'P', 'H')
    if (off < 0 || size < 1) return null
    val hdr = b(off) & 0xFF
    val compression = hdr & 3
    val filter = (hdr >> 2) & 3
    // bits 4-5: preprocessing (encode-side level reduction; no
    // decode-side action), bits 6-7 reserved
    val plane: Array[Byte] =
      if (compression == 0) {
        if (size - 1 < w * h) return null
        java.util.Arrays.copyOfRange(b, off + 1, off + 1 + w * h)
      } else if (compression == 1) {
        Webp.decodeAlphaLossless(b, off + 1, off + size, w, h)
      } else return null
    if (plane == null) return null
    // inverse filtering (container spec; libwebp dsp/filters.c): the
    // first pixel of each row predicts from the pixel ABOVE it, the
    // rest from their LEFT neighbor (horizontal); vertical rows 1+
    // predict from above, row 0 horizontally; gradient rows 1+ use
    // clip(left + above - above-left), row 0 horizontally.
    def clip(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    filter match {
      case 0 => ()
      case 1 => // horizontal
        var y = 0
        while (y < h) {
          var pred = if (y == 0) 0 else plane((y - 1) * w) & 0xFF
          var x = 0
          while (x < w) {
            pred = (pred + (plane(y * w + x) & 0xFF)) & 0xFF
            plane(y * w + x) = pred.toByte
            x += 1
          }
          y += 1
        }
      case 2 => // vertical
        var pred = 0
        var x = 0
        while (x < w) { // row 0: horizontal chain from 0
          pred = (pred + (plane(x) & 0xFF)) & 0xFF
          plane(x) = pred.toByte
          x += 1
        }
        var y = 1
        while (y < h) {
          x = 0
          while (x < w) {
            plane(y * w + x) =
              (((plane((y - 1) * w + x) & 0xFF) + (plane(y * w + x) & 0xFF)) & 0xFF).toByte
            x += 1
          }
          y += 1
        }
      case _ => // gradient
        var pred = 0
        var x = 0
        while (x < w) { // row 0: horizontal chain from 0
          pred = (pred + (plane(x) & 0xFF)) & 0xFF
          plane(x) = pred.toByte
          x += 1
        }
        var y = 1
        while (y < h) {
          // first pixel of the row: predict from above
          plane(y * w) =
            (((plane((y - 1) * w) & 0xFF) + (plane(y * w) & 0xFF)) & 0xFF).toByte
          x = 1
          while (x < w) {
            val g = clip((plane(y * w + x - 1) & 0xFF) +
              (plane((y - 1) * w + x) & 0xFF) - (plane((y - 1) * w + x - 1) & 0xFF))
            plane(y * w + x) = ((g + (plane(y * w + x) & 0xFF)) & 0xFF).toByte
            x += 1
          }
          y += 1
        }
    }
    plane
  }

  private def toRgba(img: YuvImage, alpha: Array[Byte]): PngImage = {
    val rgb = toRgb(img)
    val w = img.width; val h = img.height
    val out = new Array[Byte](w * h * 4)
    var i = 0
    while (i < w * h) {
      out(i * 4) = rgb.pixels(i * 3)
      out(i * 4 + 1) = rgb.pixels(i * 3 + 1)
      out(i * 4 + 2) = rgb.pixels(i * 3 + 2)
      out(i * 4 + 3) = alpha(i)
      i += 1
    }
    PngImage(w, h, 4, out)
  }

  def toRgb(img: YuvImage): PngImage = {
    val w = img.width; val h = img.height; val cw = (w + 1) >> 1
    val out = new Array[Byte](w * h * 3)
    var yy = 0
    while (yy < h) {
      var x = 0
      val crow = (yy >> 1) * cw
      while (x < w) {
        val c = 298 * ((img.y(yy * w + x) & 0xFF) - 16)
        val d = (img.u(crow + (x >> 1)) & 0xFF) - 128
        val e = (img.v(crow + (x >> 1)) & 0xFF) - 128
        val o = (yy * w + x) * 3
        out(o) = clip8((c + 409 * e + 128) >> 8)
        out(o + 1) = clip8((c - 100 * d - 208 * e + 128) >> 8)
        out(o + 2) = clip8((c + 516 * d + 128) >> 8)
        x += 1
      }
      yy += 1
    }
    PngImage(w, h, 3, out)
  }

  private def clip8(v: Int): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  // ---------------------------------------------------------------
  private def decode0(bytes: Array[Byte], applyFilter: Boolean): YuvImage = {
    val (off, size) = findVp8(bytes)
    if (off < 0 || size < 10) return null
    val tag = (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8) |
      ((bytes(off + 2) & 0xFF) << 16)
    if ((tag & 1) != 0) return null // interframe: needs a reference
    val firstPartSize = tag >>> 5
    if ((bytes(off + 3) & 0xFF) != 0x9D || (bytes(off + 4) & 0xFF) != 0x01 ||
        (bytes(off + 5) & 0xFF) != 0x2A) return null
    val w = ((bytes(off + 6) & 0xFF) | ((bytes(off + 7) & 0xFF) << 8)) & 0x3FFF
    val h = ((bytes(off + 8) & 0xFF) | ((bytes(off + 9) & 0xFF) << 8)) & 0x3FFF
    if (w == 0 || h == 0 || w.toLong * h > (1L << 24)) return null
    val dataStart = off + 10
    if (firstPartSize <= 0 || dataStart + firstPartSize > off + size) return null
    val bd = new Bd(bytes, dataStart, dataStart + firstPartSize)

    // ---- frame header (RFC 9) ----
    bd.bit() // color space
    bd.bit() // clamping type (we always clamp; identity when promised)
    // segmentation (RFC 9.3)
    val segEnabled = bd.bit() == 1
    var segUpdateMap = false
    var segAbs = false
    val segTreeProbs = Array(255, 255, 255)
    val segQuant = new Array[Int](4)
    val segLf = new Array[Int](4)
    if (segEnabled) {
      segUpdateMap = bd.bit() == 1
      val updateData = bd.bit() == 1
      if (updateData) {
        segAbs = bd.bit() == 1
        var i = 0
        while (i < 4) { if (bd.bit() == 1) segQuant(i) = bd.signed(7); i += 1 }
        i = 0
        while (i < 4) { if (bd.bit() == 1) segLf(i) = bd.signed(6); i += 1 }
      }
      if (segUpdateMap) {
        var i = 0
        while (i < 3) { if (bd.bit() == 1) segTreeProbs(i) = bd.literal(8); i += 1 }
      }
    }
    // loop filter (RFC 9.4)
    val simpleFilter = bd.bit() == 1
    val filterLevel = bd.literal(6)
    val sharpness = bd.literal(3)
    val refLfDeltas = new Array[Int](4)
    val modeLfDeltas = new Array[Int](4)
    val lfDeltaEnabled = bd.bit() == 1
    if (lfDeltaEnabled && bd.bit() == 1) {
      var i = 0
      while (i < 4) { if (bd.bit() == 1) refLfDeltas(i) = bd.signed(6); i += 1 }
      i = 0
      while (i < 4) { if (bd.bit() == 1) modeLfDeltas(i) = bd.signed(6); i += 1 }
    }
    // token partitions (RFC 9.5)
    val nparts = 1 << bd.literal(2)
    // quantizer (RFC 9.6)
    val yacQi = bd.literal(7)
    def qDelta(): Int = if (bd.bit() == 1) bd.signed(4) else 0
    val y1dcD = qDelta(); val y2dcD = qDelta(); val y2acD = qDelta()
    val uvdcD = qDelta(); val uvacD = qDelta()
    bd.bit() // refresh entropy probs (irrelevant: single frame)
    // coefficient probability updates (RFC 9.9 / 13.4)
    val probs = new Array[Int](4 * 8 * 3 * 11)
    System.arraycopy(CoeffProbs, 0, probs, 0, probs.length)
    var pi = 0
    while (pi < probs.length) {
      if (bd.bool(CoeffUpdateProbs(pi)) == 1) probs(pi) = bd.literal(8)
      pi += 1
    }
    val skipEnabled = bd.bit() == 1
    val probSkip = if (skipEnabled) bd.literal(8) else 0
    if (debugLog != null)
      debugLog.append(s"hdr seg=$segEnabled upMap=$segUpdateMap abs=$segAbs " +
        s"segQ=${segQuant.mkString(",")} segLf=${segLf.mkString(",")} " +
        s"simple=$simpleFilter lvl=$filterLevel sharp=$sharpness " +
        s"parts=$nparts yac=$yacQi d=[$y1dcD,$y2dcD,$y2acD,$uvdcD,$uvacD] " +
        s"skipEn=$skipEnabled probSkip=$probSkip\n")

    // ---- token partitions ----
    val mbW = (w + 15) >> 4
    val mbH = (h + 15) >> 4
    val parts = new Array[Bd](nparts)
    var pStart = dataStart + firstPartSize + (nparts - 1) * 3
    if (pStart > off + size) return null
    var sizeBase = dataStart + firstPartSize
    var k = 0
    while (k < nparts) {
      val pEnd =
        if (k == nparts - 1) off + size
        else {
          val s = (bytes(sizeBase) & 0xFF) | ((bytes(sizeBase + 1) & 0xFF) << 8) |
            ((bytes(sizeBase + 2) & 0xFF) << 16)
          sizeBase += 3
          pStart + s
        }
      if (pEnd < pStart || pEnd > off + size) return null
      parts(k) = new Bd(bytes, pStart, pEnd)
      pStart = pEnd
      k += 1
    }

    // ---- per-segment dequant factors (RFC 9.6 / 14.1) ----
    def cl127(v: Int): Int = if (v < 0) 0 else if (v > 127) 127 else v
    val qY1dc = new Array[Int](4); val qY1ac = new Array[Int](4)
    val qY2dc = new Array[Int](4); val qY2ac = new Array[Int](4)
    val qUVdc = new Array[Int](4); val qUVac = new Array[Int](4)
    val segLevel = new Array[Int](4)
    var s = 0
    while (s < 4) {
      val qi = if (segEnabled) {
        if (segAbs) segQuant(s) else yacQi + segQuant(s)
      } else yacQi
      qY1dc(s) = DcQ(cl127(qi + y1dcD))
      qY1ac(s) = AcQ(cl127(qi))
      qY2dc(s) = DcQ(cl127(qi + y2dcD)) * 2
      qY2ac(s) = { val v = AcQ(cl127(qi + y2acD)) * 155 / 100; if (v < 8) 8 else v }
      qUVdc(s) = DcQ(math.min(cl127(qi + uvdcD), 117))
      qUVac(s) = AcQ(cl127(qi + uvacD))
      val lvl = if (segEnabled) {
        if (segAbs) segLf(s) else filterLevel + segLf(s)
      } else filterLevel
      segLevel(s) = if (lvl < 0) 0 else if (lvl > 63) 63 else lvl
      s += 1
    }

    // ---- planes (MB-padded) ----
    val yW = mbW * 16; val yH = mbH * 16
    val cW = mbW * 8; val cH = mbH * 8
    val py = new Array[Byte](yW * yH)
    val pu = new Array[Byte](cW * cH)
    val pv = new Array[Byte](cW * cH)

    // ---- per-MB state ----
    val aboveModes = new Array[Byte](mbW * 4) // keyframe submode ctx, B_DC=0
    val leftModes = new Array[Byte](4)
    val aboveNzY = new Array[Int](mbW * 4)
    val aboveNzU = new Array[Int](mbW * 2)
    val aboveNzV = new Array[Int](mbW * 2)
    val aboveNzY2 = new Array[Int](mbW)
    val leftNzY = new Array[Int](4)
    val leftNzU = new Array[Int](2)
    val leftNzV = new Array[Int](2)
    var leftNzY2 = 0
    // loop-filter metadata
    val lfLevel = new Array[Int](mbW * mbH)
    val lfInner = new Array[Boolean](mbW * mbH)

    val coeffs = new Array[Int](25 * 16)
    val bmodes = new Array[Int](16)
    val dcs = new Array[Int](16)

    // implied subblock mode (for context) per 16x16 ymode: DC->B_DC,
    // V->B_VE, H->B_HE, TM->B_TM  (ymode ids: 1,2,3,4 here)
    val impliedSub = Array(0, 0, 2, 3, 1)
    // KfBModeProbs was extracted from libwebp, whose internal B-mode
    // enum orders RD=4, VR=5, LD=6 where the RFC has LD=4, RD=5,
    // VR=6 — so context ids must be mapped to the table's numbering.
    // Derived empirically: crafted streams exercising ctx row
    // (TM, LD) decode as TM under RFC-order indexing but reproduce
    // libwebp bit-exactly under this permutation (see Vp8Spec).
    val ctxId = Array(0, 1, 2, 3, 6, 4, 5, 7, 8, 9)

    var mby = 0
    while (mby < mbH) {
      val bdT = parts(mby % nparts)
      java.util.Arrays.fill(leftModes, 0.toByte)
      java.util.Arrays.fill(leftNzY, 0)
      java.util.Arrays.fill(leftNzU, 0)
      java.util.Arrays.fill(leftNzV, 0)
      leftNzY2 = 0
      var mbx = 0
      while (mbx < mbW) {
        // ---- mode parsing (first partition) ----
        val seg =
          if (segEnabled && segUpdateMap) bd.tree(SegTree, segTreeProbs, 0)
          else 0
        val skipFlag = if (skipEnabled) bd.bool(probSkip) == 1 else false
        val ymode = bd.tree(KfYModeTree, KfYModeProbs, 0) // 0=B_PRED
        val isB = ymode == 0
        if (isB) {
          var i = 0
          while (i < 16) {
            val sbx = i & 3; val sby = i >> 2
            val a = if (sby == 0) aboveModes(mbx * 4 + sbx) else bmodes(i - 4)
            val l = if (sbx == 0) leftModes(sby) else bmodes(i - 1)
            bmodes(i) = bd.tree(BModeTree, KfBModeProbs,
              (ctxId(a) * 10 + ctxId(l)) * 9)
            i += 1
          }
        } else {
          val m = impliedSub(ymode)
          var i = 0
          while (i < 16) { bmodes(i) = m; i += 1 }
        }
        val uvmode = bd.tree(UvModeTree, KfUvModeProbs, 0)
        if (debugLog != null)
          debugLog.append(s"mb($mbx,$mby) seg=$seg skip=$skipFlag y=$ymode " +
            s"uv=$uvmode b=${if (isB) bmodes.mkString(",") else "-"}\n")
        // context update for next MBs
        var i = 0
        while (i < 4) {
          aboveModes(mbx * 4 + i) = bmodes(12 + i).toByte
          leftModes(i) = bmodes(i * 4 + 3).toByte
          i += 1
        }

        // ---- residuals (row's token partition) ----
        java.util.Arrays.fill(coeffs, 0)
        var anyTokens = false
        if (skipFlag) {
          java.util.Arrays.fill(leftNzY, 0)
          java.util.Arrays.fill(leftNzU, 0)
          java.util.Arrays.fill(leftNzV, 0)
          i = 0
          while (i < 4) {
            aboveNzY(mbx * 4 + i) = 0
            if (i < 2) { aboveNzU(mbx * 2 + i) = 0; aboveNzV(mbx * 2 + i) = 0 }
            i += 1
          }
          if (!isB) { aboveNzY2(mbx) = 0; leftNzY2 = 0 }
        } else {
          if (!isB) {
            val ctx = aboveNzY2(mbx) + leftNzY2
            val pos = readCoeffs(bdT, probs, 1, 0, ctx, qY2dc(seg), qY2ac(seg),
              coeffs, 24 * 16)
            val f = if (pos > 0) 1 else 0
            aboveNzY2(mbx) = f; leftNzY2 = f
            if (f == 1) anyTokens = true
          }
          val (typ, first) = if (isB) (3, 0) else (0, 1)
          i = 0
          while (i < 16) {
            val sbx = i & 3; val sby = i >> 2
            val ctx = aboveNzY(mbx * 4 + sbx) + leftNzY(sby)
            if (debugLog != null) debugLog.append(s"\nY$i ctx=$ctx:")
            val pos = readCoeffs(bdT, probs, typ, first, ctx,
              qY1dc(seg), qY1ac(seg), coeffs, i * 16)
            val f = if (pos > first) 1 else 0
            aboveNzY(mbx * 4 + sbx) = f; leftNzY(sby) = f
            if (f == 1) anyTokens = true
            i += 1
          }
          i = 0
          while (i < 4) {
            val sbx = i & 1; val sby = i >> 1
            val ctx = aboveNzU(mbx * 2 + sbx) + leftNzU(sby)
            val pos = readCoeffs(bdT, probs, 2, 0, ctx,
              qUVdc(seg), qUVac(seg), coeffs, (16 + i) * 16)
            val f = if (pos > 0) 1 else 0
            aboveNzU(mbx * 2 + sbx) = f; leftNzU(sby) = f
            if (f == 1) anyTokens = true
            i += 1
          }
          i = 0
          while (i < 4) {
            val sbx = i & 1; val sby = i >> 1
            val ctx = aboveNzV(mbx * 2 + sbx) + leftNzV(sby)
            val pos = readCoeffs(bdT, probs, 2, 0, ctx,
              qUVdc(seg), qUVac(seg), coeffs, (20 + i) * 16)
            val f = if (pos > 0) 1 else 0
            aboveNzV(mbx * 2 + sbx) = f; leftNzV(sby) = f
            if (f == 1) anyTokens = true
            i += 1
          }
        }

        // ---- loop-filter metadata ----
        var lvl = segLevel(seg)
        if (lfDeltaEnabled) {
          lvl += refLfDeltas(0) // all keyframe MBs are intra
          if (isB) lvl += modeLfDeltas(0)
          if (lvl < 0) lvl = 0; if (lvl > 63) lvl = 63
        }
        lfLevel(mby * mbW + mbx) = lvl
        lfInner(mby * mbW + mbx) = isB || anyTokens

        // ---- reconstruction ----
        if (!isB) {
          // Y2: inverse WHT scatters DCs into the 16 Y blocks
          iwht(coeffs, 24 * 16, dcs)
          i = 0
          while (i < 16) { coeffs(i * 16) = dcs(i); i += 1 }
          pred16(py, yW, mbx * 16, mby * 16, ymode)
          i = 0
          while (i < 16) {
            idctAdd(coeffs, i * 16, py, yW,
              (mby * 16 + (i >> 2) * 4) * yW + mbx * 16 + (i & 3) * 4)
            i += 1
          }
        } else {
          i = 0
          while (i < 16) {
            val sbx = i & 3; val sby = i >> 2
            val bx = mbx * 16 + sbx * 4; val by = mby * 16 + sby * 4
            pred4(py, yW, bx, by, bmodes(i), sbx == 3, mby * 16)
            idctAdd(coeffs, i * 16, py, yW, by * yW + bx)
            i += 1
          }
        }
        pred8(pu, cW, mbx * 8, mby * 8, uvmode)
        pred8(pv, cW, mbx * 8, mby * 8, uvmode)
        i = 0
        while (i < 4) {
          val o = (mby * 8 + (i >> 1) * 4) * cW + mbx * 8 + (i & 1) * 4
          idctAdd(coeffs, (16 + i) * 16, pu, cW, o)
          idctAdd(coeffs, (20 + i) * 16, pv, cW, o)
          i += 1
        }
        mbx += 1
      }
      mby += 1
    }

    // ---- loop filter (RFC 15) ----
    if (applyFilter && filterLevel > 0) {
      mby = 0
      while (mby < mbH) {
        var mbx = 0
        while (mbx < mbW) {
          val lvl = lfLevel(mby * mbW + mbx)
          if (lvl > 0) {
            var ilim = lvl
            if (sharpness > 0) {
              ilim >>= (if (sharpness > 4) 2 else 1)
              if (ilim > 9 - sharpness) ilim = 9 - sharpness
            }
            if (ilim < 1) ilim = 1
            val hevT = if (lvl >= 40) 2 else if (lvl >= 15) 1 else 0
            val mbLim = (lvl + 2) * 2 + ilim
            val subLim = lvl * 2 + ilim
            val inner = lfInner(mby * mbW + mbx)
            val x0 = mbx * 16; val y0 = mby * 16
            val cx0 = mbx * 8; val cy0 = mby * 8
            if (simpleFilter) {
              if (mbx > 0) simpleEdge(py, yW, x0, y0, vert = true, 16, mbLim)
              if (inner) {
                var e = 4
                while (e < 16) {
                  simpleEdge(py, yW, x0 + e, y0, vert = true, 16, subLim); e += 4
                }
              }
              if (mby > 0) simpleEdge(py, yW, x0, y0, vert = false, 16, mbLim)
              if (inner) {
                var e = 4
                while (e < 16) {
                  simpleEdge(py, yW, x0, y0 + e, vert = false, 16, subLim); e += 4
                }
              }
            } else {
              if (mbx > 0) {
                mbEdge(py, yW, x0, y0, vert = true, 16, mbLim, ilim, hevT)
                mbEdge(pu, cW, cx0, cy0, vert = true, 8, mbLim, ilim, hevT)
                mbEdge(pv, cW, cx0, cy0, vert = true, 8, mbLim, ilim, hevT)
              }
              if (inner) {
                var e = 4
                while (e < 16) {
                  subEdge(py, yW, x0 + e, y0, vert = true, 16, subLim, ilim, hevT)
                  e += 4
                }
                subEdge(pu, cW, cx0 + 4, cy0, vert = true, 8, subLim, ilim, hevT)
                subEdge(pv, cW, cx0 + 4, cy0, vert = true, 8, subLim, ilim, hevT)
              }
              if (mby > 0) {
                mbEdge(py, yW, x0, y0, vert = false, 16, mbLim, ilim, hevT)
                mbEdge(pu, cW, cx0, cy0, vert = false, 8, mbLim, ilim, hevT)
                mbEdge(pv, cW, cx0, cy0, vert = false, 8, mbLim, ilim, hevT)
              }
              if (inner) {
                var e = 4
                while (e < 16) {
                  subEdge(py, yW, x0, y0 + e, vert = false, 16, subLim, ilim, hevT)
                  e += 4
                }
                subEdge(pu, cW, cx0, cy0 + 4, vert = false, 8, subLim, ilim, hevT)
                subEdge(pv, cW, cx0, cy0 + 4, vert = false, 8, subLim, ilim, hevT)
              }
            }
          }
          mbx += 1
        }
        mby += 1
      }
    }

    // ---- crop ----
    val cw = (w + 1) >> 1; val ch = (h + 1) >> 1
    val oy = new Array[Byte](w * h)
    val ou = new Array[Byte](cw * ch)
    val ov = new Array[Byte](cw * ch)
    var r = 0
    while (r < h) { System.arraycopy(py, r * yW, oy, r * w, w); r += 1 }
    r = 0
    while (r < ch) {
      System.arraycopy(pu, r * cW, ou, r * cw, cw)
      System.arraycopy(pv, r * cW, ov, r * cw, cw)
      r += 1
    }
    YuvImage(w, h, oy, ou, ov)
  }

  // ---------------------------------------------------------------
  /** RFC 13.2/13.3 coefficient token decoding for one block. Writes
    * DEQUANTIZED coefficients (zigzag applied) into out[outOff..+16].
    * Returns the scan position where EOB occurred (16 if none) — the
    * above/left context flag is (pos > first). */
  private def readCoeffs(bd: Bd, probs: Array[Int], typ: Int, first: Int,
                         ctx0: Int, dqDC: Int, dqAC: Int,
                         out: Array[Int], outOff: Int): Int = {
    var n = first
    var ctx = ctx0
    var prevZero = false
    while (n < 16) {
      val pOff = ((typ * 8 + Bands(n)) * 3 + ctx) * 11
      if (!prevZero && bd.bool(probs(pOff)) == 0) return n // EOB
      if (bd.bool(probs(pOff + 1)) == 0) { // ZERO token
        ctx = 0; prevZero = true; n += 1
      } else {
        prevZero = false
        var v = 0
        if (bd.bool(probs(pOff + 2)) == 0) { v = 1; ctx = 1 }
        else {
          ctx = 2
          if (bd.bool(probs(pOff + 3)) == 0) {
            v = if (bd.bool(probs(pOff + 4)) == 0) 2
            else 3 + bd.bool(probs(pOff + 5))
          } else {
            val cat =
              if (bd.bool(probs(pOff + 6)) == 0) bd.bool(probs(pOff + 7))
              else if (bd.bool(probs(pOff + 8)) == 0) 2 + bd.bool(probs(pOff + 9))
              else 4 + bd.bool(probs(pOff + 10))
            val cp = CatProbs(cat)
            var extra = 0
            var i = 0
            while (i < cp.length) { extra = (extra << 1) | bd.bool(cp(i)); i += 1 }
            v = CatBase(cat) + extra
          }
        }
        if (bd.bit() == 1) v = -v
        if (debugLog != null) debugLog.append(s" $n:$v")
        out(outOff + Zigzag(n)) = v * (if (n == 0) dqDC else dqAC)
        n += 1
      }
    }
    16
  }

  // ---------------------------------------------------------------
  // per-call transform scratch (decode0 is single-threaded per
  // invocation; a thread-local avoids ~1.6M short-lived Array[Int](16)
  // allocations on a 16M-pixel frame)
  private val scratch16 = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](16)
  }

  /** RFC 14.3 inverse WHT: 16 dequantized Y2 coefficients -> the 16
    * Y-subblock DC values. */
  private def iwht(c: Array[Int], off: Int, out: Array[Int]): Unit = {
    val t = scratch16.get()
    var i = 0
    while (i < 4) {
      val a1 = c(off + i) + c(off + i + 12)
      val b1 = c(off + i + 4) + c(off + i + 8)
      val c1 = c(off + i + 4) - c(off + i + 8)
      val d1 = c(off + i) - c(off + i + 12)
      t(i) = a1 + b1; t(i + 4) = c1 + d1; t(i + 8) = a1 - b1; t(i + 12) = d1 - c1
      i += 1
    }
    i = 0
    while (i < 4) {
      val o = i * 4
      val a1 = t(o) + t(o + 3); val b1 = t(o + 1) + t(o + 2)
      val c1 = t(o + 1) - t(o + 2); val d1 = t(o) - t(o + 3)
      out(o) = (a1 + b1 + 3) >> 3
      out(o + 1) = (c1 + d1 + 3) >> 3
      out(o + 2) = (a1 - b1 + 3) >> 3
      out(o + 3) = (d1 - c1 + 3) >> 3
      i += 1
    }
  }

  /** RFC 14.4 inverse DCT (fixed-point 20091/35468 rotations), added
    * onto the prediction already in dst. Long intermediates: hostile
    * cat6 coefficients times max dequant overflow 32 bits. */
  private def idctAdd(c: Array[Int], off: Int, dst: Array[Byte],
                      stride: Int, dOff: Int): Unit = {
    val t = scratch16.get()
    var i = 0
    while (i < 4) {
      val c0 = c(off + i); val c1 = c(off + i + 4)
      val c2 = c(off + i + 8); val c3 = c(off + i + 12)
      val a1 = c0 + c2
      val b1 = c0 - c2
      val x1 = ((c1 * 35468L) >> 16).toInt - (c3 + ((c3 * 20091L) >> 16).toInt)
      val d1 = (c1 + ((c1 * 20091L) >> 16).toInt) + ((c3 * 35468L) >> 16).toInt
      t(i) = a1 + d1; t(i + 12) = a1 - d1; t(i + 4) = b1 + x1; t(i + 8) = b1 - x1
      i += 1
    }
    i = 0
    while (i < 4) {
      val o = i * 4
      val c0 = t(o); val c1 = t(o + 1); val c2 = t(o + 2); val c3 = t(o + 3)
      val a1 = c0 + c2
      val b1 = c0 - c2
      val x1 = ((c1 * 35468L) >> 16).toInt - (c3 + ((c3 * 20091L) >> 16).toInt)
      val d1 = (c1 + ((c1 * 20091L) >> 16).toInt) + ((c3 * 35468L) >> 16).toInt
      val row = dOff + i * stride
      addClip(dst, row, (a1 + d1 + 4) >> 3)
      addClip(dst, row + 1, (b1 + x1 + 4) >> 3)
      addClip(dst, row + 2, (b1 - x1 + 4) >> 3)
      addClip(dst, row + 3, (a1 - d1 + 4) >> 3)
      i += 1
    }
  }

  private def addClip(dst: Array[Byte], i: Int, d: Int): Unit = {
    val v = (dst(i) & 0xFF) + d
    dst(i) = (if (v < 0) 0 else if (v > 255) 255 else v).toByte
  }

  // ---------------------------------------------------------------
  // intra prediction. Frame borders (RFC 12.2): row above the frame
  // reads 127, column left of the frame reads 129; the above-left
  // corner on the top row is 127, on the left column 129.
  private def pix(p: Array[Byte], stride: Int, x: Int, y: Int): Int =
    if (y < 0) 127
    else if (x < 0) 129
    else p(y * stride + x) & 0xFF

  /** 16x16 prediction (modes 1=DC 2=V 3=H 4=TM) at (px0,py0). */
  private def pred16(p: Array[Byte], stride: Int, px0: Int, py0: Int,
                     mode: Int): Unit =
    predNxN(p, stride, px0, py0, mode, 16)

  /** 8x8 chroma prediction (modes 0=DC 1=V 2=H 3=TM). */
  private def pred8(p: Array[Byte], stride: Int, px0: Int, py0: Int,
                    mode: Int): Unit =
    predNxN(p, stride, px0, py0, mode + 1, 8)

  private def predNxN(p: Array[Byte], stride: Int, px0: Int, py0: Int,
                      mode: Int, n: Int): Unit = {
    val hasA = py0 > 0
    val hasL = px0 > 0
    mode match {
      case 1 => // DC
        var dc = 0
        if (hasA && hasL) {
          var i = 0
          while (i < n) { dc += pix(p, stride, px0 + i, py0 - 1) +
            pix(p, stride, px0 - 1, py0 + i); i += 1 }
          dc = (dc + n) >> (if (n == 16) 5 else 4)
        } else if (hasA) {
          var i = 0
          while (i < n) { dc += pix(p, stride, px0 + i, py0 - 1); i += 1 }
          dc = (dc + (n >> 1)) >> (if (n == 16) 4 else 3)
        } else if (hasL) {
          var i = 0
          while (i < n) { dc += pix(p, stride, px0 - 1, py0 + i); i += 1 }
          dc = (dc + (n >> 1)) >> (if (n == 16) 4 else 3)
        } else dc = 128
        fillN(p, stride, px0, py0, n, dc)
      case 2 => // V
        var r = 0
        while (r < n) {
          var cidx = 0
          while (cidx < n) {
            p((py0 + r) * stride + px0 + cidx) =
              pix(p, stride, px0 + cidx, py0 - 1).toByte
            cidx += 1
          }
          r += 1
        }
      case 3 => // H
        var r = 0
        while (r < n) {
          val v = pix(p, stride, px0 - 1, py0 + r).toByte
          var cidx = 0
          while (cidx < n) { p((py0 + r) * stride + px0 + cidx) = v; cidx += 1 }
          r += 1
        }
      case 4 => // TM
        val tl = if (py0 > 0) pix(p, stride, px0 - 1, py0 - 1)
        else 127 // top row: corner reads the 127 border
        var r = 0
        while (r < n) {
          val l = pix(p, stride, px0 - 1, py0 + r)
          var cidx = 0
          while (cidx < n) {
            val v = l + pix(p, stride, px0 + cidx, py0 - 1) - tl
            p((py0 + r) * stride + px0 + cidx) =
              (if (v < 0) 0 else if (v > 255) 255 else v).toByte
            cidx += 1
          }
          r += 1
        }
      case _ =>
        fillN(p, stride, px0, py0, n, 128)
    }
  }

  private def fillN(p: Array[Byte], stride: Int, px0: Int, py0: Int,
                    n: Int, v: Int): Unit = {
    var r = 0
    while (r < n) {
      java.util.Arrays.fill(p, (py0 + r) * stride + px0,
        (py0 + r) * stride + px0 + n, v.toByte)
      r += 1
    }
  }

  /** 4x4 subblock prediction (RFC 12.3). rightEdge: the subblock is
    * in the MB's rightmost column, so its above-right pixels come
    * from the row above the ENTIRE macroblock (mbTop-1), not from
    * this MB's partially reconstructed interior. */
  private def pred4(p: Array[Byte], stride: Int, bx: Int, by: Int,
                    mode: Int, rightEdge: Boolean, mbTop: Int): Unit = {
    val a = new Array[Int](8) // above 0..3 + above-right 4..7
    val l = new Array[Int](4)
    var i = 0
    while (i < 4) {
      a(i) = pix(p, stride, bx + i, by - 1)
      l(i) = pix(p, stride, bx - 1, by + i)
      i += 1
    }
    // above-right: for right-edge subblocks the pixels belong to the
    // next MB (not yet decoded) — the spec substitutes the row above
    // the macroblock; beyond the frame's right edge the above row's
    // last pixel is replicated (verified against libwebp with a
    // crafted rightmost-MB B_LD stream — NOT the 127 border).
    val arY = if (rightEdge) mbTop - 1 else by - 1
    i = 0
    while (i < 4) {
      val x = bx + 4 + i
      a(4 + i) =
        if (arY < 0) 127
        else if (x >= stride) p(arY * stride + stride - 1) & 0xFF
        else p(arY * stride + x) & 0xFF
      i += 1
    }
    val tl =
      if (by == 0) 127
      else if (bx == 0) 129
      else p((by - 1) * stride + bx - 1) & 0xFF

    def avg2(x: Int, y: Int): Int = (x + y + 1) >> 1
    def avg3(x: Int, y: Int, z: Int): Int = (x + 2 * y + z + 2) >> 2
    def set(r: Int, c: Int, v: Int): Unit =
      p((by + r) * stride + bx + c) =
        (if (v < 0) 0 else if (v > 255) 255 else v).toByte

    mode match {
      case 0 => // B_DC
        var dc = 4
        i = 0
        while (i < 4) { dc += a(i) + l(i); i += 1 }
        dc >>= 3
        var r = 0
        while (r < 4) { var c = 0; while (c < 4) { set(r, c, dc); c += 1 }; r += 1 }
      case 1 => // B_TM
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) { set(r, c, l(r) + a(c) - tl); c += 1 }
          r += 1
        }
      case 2 => // B_VE
        val v0 = avg3(tl, a(0), a(1)); val v1 = avg3(a(0), a(1), a(2))
        val v2 = avg3(a(1), a(2), a(3)); val v3 = avg3(a(2), a(3), a(4))
        var r = 0
        while (r < 4) { set(r, 0, v0); set(r, 1, v1); set(r, 2, v2); set(r, 3, v3); r += 1 }
      case 3 => // B_HE
        val h0 = avg3(tl, l(0), l(1)); val h1 = avg3(l(0), l(1), l(2))
        val h2 = avg3(l(1), l(2), l(3)); val h3 = avg3(l(2), l(3), l(3))
        var c = 0
        while (c < 4) { set(0, c, h0); set(1, c, h1); set(2, c, h2); set(3, c, h3); c += 1 }
      case 4 => // B_LD
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val d = r + c
            set(r, c, if (d < 6) avg3(a(d), a(d + 1), a(d + 2))
            else avg3(a(6), a(7), a(7)))
            c += 1
          }
          r += 1
        }
      case 5 => // B_RD
        val e = Array(l(3), l(2), l(1), l(0), tl, a(0), a(1), a(2), a(3))
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) { set(r, c, avg3(e(c - r + 3), e(c - r + 4),
            e(c - r + 5))); c += 1 }
          r += 1
        }
      case 6 => // B_VR
        val e = Array(l(3), l(2), l(1), l(0), tl, a(0), a(1), a(2), a(3))
        set(3, 0, avg3(e(1), e(2), e(3)))
        set(2, 0, avg3(e(2), e(3), e(4)))
        set(3, 1, avg3(e(3), e(4), e(5))); set(1, 0, avg3(e(3), e(4), e(5)))
        set(2, 1, avg2(e(4), e(5))); set(0, 0, avg2(e(4), e(5)))
        set(3, 2, avg3(e(4), e(5), e(6))); set(1, 1, avg3(e(4), e(5), e(6)))
        set(2, 2, avg2(e(5), e(6))); set(0, 1, avg2(e(5), e(6)))
        set(3, 3, avg3(e(5), e(6), e(7))); set(1, 2, avg3(e(5), e(6), e(7)))
        set(2, 3, avg2(e(6), e(7))); set(0, 2, avg2(e(6), e(7)))
        set(1, 3, avg3(e(6), e(7), e(8)))
        set(0, 3, avg2(e(7), e(8)))
      case 7 => // B_VL
        set(0, 0, avg2(a(0), a(1)))
        set(1, 0, avg3(a(0), a(1), a(2)))
        set(2, 0, avg2(a(1), a(2))); set(0, 1, avg2(a(1), a(2)))
        set(1, 1, avg3(a(1), a(2), a(3))); set(3, 0, avg3(a(1), a(2), a(3)))
        set(2, 1, avg2(a(2), a(3))); set(0, 2, avg2(a(2), a(3)))
        set(3, 1, avg3(a(2), a(3), a(4))); set(1, 2, avg3(a(2), a(3), a(4)))
        set(2, 2, avg2(a(3), a(4))); set(0, 3, avg2(a(3), a(4)))
        set(3, 2, avg3(a(3), a(4), a(5))); set(1, 3, avg3(a(3), a(4), a(5)))
        set(2, 3, avg3(a(4), a(5), a(6)))
        set(3, 3, avg3(a(5), a(6), a(7)))
      case 8 => // B_HD
        set(3, 0, avg2(l(3), l(2)))
        set(3, 1, avg3(l(3), l(2), l(1)))
        set(2, 0, avg2(l(2), l(1))); set(3, 2, avg2(l(2), l(1)))
        set(2, 1, avg3(l(2), l(1), l(0))); set(3, 3, avg3(l(2), l(1), l(0)))
        set(1, 0, avg2(l(1), l(0))); set(2, 2, avg2(l(1), l(0)))
        set(1, 1, avg3(l(1), l(0), tl)); set(2, 3, avg3(l(1), l(0), tl))
        set(0, 0, avg2(l(0), tl)); set(1, 2, avg2(l(0), tl))
        set(0, 1, avg3(l(0), tl, a(0))); set(1, 3, avg3(l(0), tl, a(0)))
        set(0, 2, avg3(tl, a(0), a(1)))
        set(0, 3, avg3(a(0), a(1), a(2)))
      case _ => // B_HU
        set(0, 0, avg2(l(0), l(1)))
        set(0, 1, avg3(l(0), l(1), l(2)))
        set(0, 2, avg2(l(1), l(2))); set(1, 0, avg2(l(1), l(2)))
        set(0, 3, avg3(l(1), l(2), l(3))); set(1, 1, avg3(l(1), l(2), l(3)))
        set(1, 2, avg2(l(2), l(3))); set(2, 0, avg2(l(2), l(3)))
        set(1, 3, avg3(l(2), l(3), l(3))); set(2, 1, avg3(l(2), l(3), l(3)))
        set(2, 2, l(3)); set(2, 3, l(3))
        set(3, 0, l(3)); set(3, 1, l(3)); set(3, 2, l(3)); set(3, 3, l(3))
    }
  }

  // ---------------------------------------------------------------
  // Minimal spec-valid VP8 keyframe ENCODER (the GIF/JPEG/VP8L
  // fixed-code spirit): every MB is B_PRED with all-B_DC subblock
  // modes, loop filter 0, one partition, no segmentation, and each
  // luma block carries a single DC coefficient — so the decoded frame
  // is a closed-form 2-D recursion v(bx,by) = clip(((4*A + 4*L + 4)
  // >> 3) + (dq*dc + 4 >> 3)) over the 4x4 block grid (A/L = flat
  // neighbor values, 127/129 at the frame borders) that a SQL
  // recursive CTE replays exactly (the q101 oracle). The byte-level
  // encoding was cross-validated against the system libwebp decoder
  // during development (tools/gen_vp8_fixtures.py provenance notes).
  private final class BoolEnc {
    private val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var range = 255
    private var bottom = 0L
    private var cnt = 24
    private def carry(): Unit = {
      var i = out.length - 1
      var done = false
      while (i >= 0 && !done) {
        if (out(i) == 0xFF.toByte) { out(i) = 0; i -= 1 }
        else { out(i) = (out(i) + 1).toByte; done = true }
      }
    }
    def put(bit: Int, prob: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (bit == 1) { bottom += split; range -= split }
      else range = split
      while (range < 128) {
        range <<= 1
        if ((bottom & (1L << 31)) != 0) carry()
        bottom = (bottom << 1) & 0xFFFFFFFFL
        cnt -= 1
        if (cnt == 0) {
          out += ((bottom >> 24) & 0xFF).toByte
          bottom &= 0xFFFFFF
          cnt = 8
        }
      }
    }
    def bit(v: Int): Unit = put(v, 128)
    def literal(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { bit((v >> k) & 1); k -= 1 }
    }
    def flush(): Array[Byte] = {
      var k = 0
      while (k < 32) {
        if ((bottom & (1L << 31)) != 0) carry()
        bottom = (bottom << 1) & 0xFFFFFFFFL
        cnt -= 1
        if (cnt == 0) {
          out += ((bottom >> 24) & 0xFF).toByte
          bottom &= 0xFFFFFF
          cnt = 8
        }
        k += 1
      }
      out.toArray
    }
  }

  /** Encode a w x h (multiples of 16) lossy WebP whose every luma
    * block is B_DC-predicted with one DC coefficient `dc` (1..10),
    * quantizer index `qi`, chroma all-zero, loop filter off.
    * `nparts` (1/2/4/8) splits token data across partitions by MB
    * row — exercises the decoder's partition-table path, which real
    * libwebp encodes only with its advanced API. */
  def encodeMinimal(w: Int, h: Int, qi: Int, dc: Int,
                    nparts: Int = 1): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0 && w > 0 && h > 0)
    require(dc >= 1 && dc <= 10 && qi >= 0 && qi <= 127)
    require(nparts == 1 || nparts == 2 || nparts == 4 || nparts == 8)
    val mbW = w / 16; val mbH = h / 16
    // first partition: header + modes
    val e1 = new BoolEnc
    e1.bit(0); e1.bit(0) // color space, clamp
    e1.bit(0)            // segmentation off
    e1.bit(0); e1.literal(0, 6); e1.literal(0, 3) // normal filter, level 0
    e1.bit(0)            // lf deltas off
    e1.literal(Integer.numberOfTrailingZeros(nparts), 2)
    e1.literal(qi, 7)
    var i = 0
    while (i < 5) { e1.bit(0); i += 1 } // no quant deltas
    e1.bit(0)            // refresh entropy
    i = 0
    while (i < CoeffUpdateProbs.length) { e1.put(0, CoeffUpdateProbs(i)); i += 1 }
    e1.bit(0)            // mb_no_coeff_skip off
    var mb = 0
    while (mb < mbW * mbH) {
      e1.put(0, KfYModeProbs(0)) // ymode = B_PRED
      i = 0
      while (i < 16) { e1.put(0, KfBModeProbs(0)); i += 1 } // B_DC (ctx 0,0)
      e1.put(0, KfUvModeProbs(0)) // uv DC
      mb += 1
    }
    val p1 = e1.flush()
    // token partitions (MB row r -> partition r % nparts); the nz
    // contexts span partitions exactly as the decoder tracks them
    val tokEnc = Array.fill(nparts)(new BoolEnc)
    var e2: BoolEnc = tokEnc(0)
    def dcToken(ctx: Int): Unit = {
      val po = ((3 * 8 + Bands(0)) * 3 + ctx) * 11
      e2.put(1, probsAt(po)); e2.put(1, probsAt(po + 1))
      var nc = 0
      if (dc == 1) { e2.put(0, probsAt(po + 2)); nc = 1 }
      else {
        e2.put(1, probsAt(po + 2)); nc = 2
        if (dc <= 4) {
          e2.put(0, probsAt(po + 3))
          if (dc == 2) e2.put(0, probsAt(po + 4))
          else { e2.put(1, probsAt(po + 4)); e2.put(if (dc == 4) 1 else 0, probsAt(po + 5)) }
        } else {
          e2.put(1, probsAt(po + 3))
          val cat = if (dc < 7) 0 else 1
          e2.put(0, probsAt(po + 6)); e2.put(cat, probsAt(po + 7))
          val extra = dc - CatBase(cat); val cp = CatProbs(cat)
          var k = 0
          while (k < cp.length) {
            e2.put((extra >> (cp.length - 1 - k)) & 1, cp(k)); k += 1
          }
        }
      }
      e2.put(0, 128) // sign +
      val po2 = ((3 * 8 + Bands(1)) * 3 + nc) * 11
      e2.put(0, probsAt(po2)) // EOB
    }
    val aNzY = new Array[Int](mbW * 4)
    var mby = 0
    while (mby < mbH) {
      e2 = tokEnc(mby % nparts)
      var mbx = 0
      val lNzY = new Array[Int](4)
      while (mbx < mbW) {
        i = 0
        while (i < 16) {
          val sbx = i & 3; val sby = i >> 2
          dcToken(aNzY(mbx * 4 + sbx) + lNzY(sby))
          aNzY(mbx * 4 + sbx) = 1; lNzY(sby) = 1
          i += 1
        }
        var p = 0
        while (p < 2) { // U then V: all-zero blocks, ctx stays 0
          i = 0
          while (i < 4) {
            e2.put(0, probsAt(((2 * 8 + Bands(0)) * 3 + 0) * 11))
            i += 1
          }
          p += 1
        }
        mbx += 1
      }
      mby += 1
    }
    val toks = tokEnc.map(_.flush())
    // partition size table: (nparts-1) LE24 sizes, then the partitions
    val sizeTable = new Array[Byte]((nparts - 1) * 3)
    var pi2 = 0
    while (pi2 < nparts - 1) {
      val s = toks(pi2).length
      sizeTable(pi2 * 3) = (s & 0xFF).toByte
      sizeTable(pi2 * 3 + 1) = ((s >> 8) & 0xFF).toByte
      sizeTable(pi2 * 3 + 2) = ((s >> 16) & 0xFF).toByte
      pi2 += 1
    }
    val p2 = sizeTable ++ toks.flatten
    val fps = p1.length
    val tag = (3 << 1) | (1 << 4) | (fps << 5)
    val frame = Array[Byte]((tag & 0xFF).toByte, ((tag >> 8) & 0xFF).toByte,
      ((tag >> 16) & 0xFF).toByte, 0x9D.toByte, 0x01, 0x2A,
      (w & 0xFF).toByte, ((w >> 8) & 0x3F).toByte,
      (h & 0xFF).toByte, ((h >> 8) & 0x3F).toByte) ++ p1 ++ p2
    val sz = frame.length
    val riffLen = 12 + sz + (sz & 1)
    val bb = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(riffLen)
    bb.put("WEBP".getBytes); bb.put("VP8 ".getBytes); bb.putInt(sz)
    bb.put(frame)
    if ((sz & 1) == 1) bb.put(0.toByte)
    bb.array()
  }

  private def probsAt(i: Int): Int = CoeffProbs(i)

  /** The closed-form expected luma block value of encodeMinimal's
    * output: the same 2-D recursion the q101 DuckDB oracle replays. */
  def minimalExpected(w: Int, h: Int, qi: Int, dc: Int): Array[Array[Int]] = {
    val bW = w / 4; val bH = h / 4
    val r = (DcQ(qi) * dc + 4) >> 3
    val v = Array.ofDim[Int](bH, bW)
    var by = 0
    while (by < bH) {
      var bx = 0
      while (bx < bW) {
        val a = if (by == 0) 127 else v(by - 1)(bx)
        val l = if (bx == 0) 129 else v(by)(bx - 1)
        val p = (4 * a + 4 * l + 4) >> 3
        val x = p + r
        v(by)(bx) = if (x < 0) 0 else if (x > 255) 255 else x
        bx += 1
      }
      by += 1
    }
    v
  }

  // ---------------------------------------------------------------
  // loop filters (RFC 15). A VERTICAL edge at column x0 filters the
  // horizontally adjacent pixels p3..q3 = p(base-4)..p(base+3) on
  // each of `count` rows starting at y0; a horizontal edge at row y0
  // does the same with step=stride down each of `count` columns.
  private def sgn(v: Int): Int = if (v < -128) -128 else if (v > 127) 127 else v

  /** simple filter (luma only) */
  private def simpleEdge(p: Array[Byte], stride: Int, x0: Int, y0: Int,
                         vert: Boolean, count: Int, lim: Int): Unit = {
    val step = if (vert) 1 else stride
    var k = 0
    while (k < count) {
      val base = if (vert) (y0 + k) * stride + x0 else y0 * stride + x0 + k
      val p1 = (p(base - 2 * step) & 0xFF) - 128
      val p0 = (p(base - step) & 0xFF) - 128
      val q0 = (p(base) & 0xFF) - 128
      val q1 = (p(base + step) & 0xFF) - 128
      if (math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 <= lim) {
        val a = sgn(sgn(p1 - q1) + 3 * (q0 - p0))
        val f1 = sgn(a + 4) >> 3
        val f2 = sgn(a + 3) >> 3
        p(base) = (sgn(q0 - f1) + 128).toByte
        p(base - step) = (sgn(p0 + f2) + 128).toByte
      }
      k += 1
    }
  }

  private def filterMask(p: Array[Byte], base: Int, step: Int,
                         ilim: Int, elim: Int): Boolean = {
    def v(k: Int): Int = p(base + k * step) & 0xFF
    math.abs(v(-4) - v(-3)) <= ilim && math.abs(v(-3) - v(-2)) <= ilim &&
    math.abs(v(-2) - v(-1)) <= ilim && math.abs(v(1) - v(0)) <= ilim &&
    math.abs(v(2) - v(1)) <= ilim && math.abs(v(3) - v(2)) <= ilim &&
    math.abs(v(-1) - v(0)) * 2 + math.abs(v(-2) - v(1)) / 2 <= elim
  }

  private def hev(p: Array[Byte], base: Int, step: Int, t: Int): Boolean =
    math.abs((p(base - 2 * step) & 0xFF) - (p(base - step) & 0xFF)) > t ||
    math.abs((p(base + step) & 0xFF) - (p(base) & 0xFF)) > t

  /** common adjust on p0/q0; returns F1 for the subblock outer taps */
  private def adjust(p: Array[Byte], base: Int, step: Int,
                     useOuter: Boolean): Int = {
    val p1 = (p(base - 2 * step) & 0xFF) - 128
    val p0 = (p(base - step) & 0xFF) - 128
    val q0 = (p(base) & 0xFF) - 128
    val q1 = (p(base + step) & 0xFF) - 128
    val a = sgn((if (useOuter) sgn(p1 - q1) else 0) + 3 * (q0 - p0))
    val f1 = sgn(a + 4) >> 3
    val f2 = sgn(a + 3) >> 3
    p(base) = (sgn(q0 - f1) + 128).toByte
    p(base - step) = (sgn(p0 + f2) + 128).toByte
    f1
  }

  private def subEdge(p: Array[Byte], stride: Int, x0: Int, y0: Int,
                      vert: Boolean, count: Int, elim: Int, ilim: Int,
                      hevT: Int): Unit = {
    val step = if (vert) 1 else stride
    var k = 0
    while (k < count) {
      val base = if (vert) (y0 + k) * stride + x0 else y0 * stride + x0 + k
      if (filterMask(p, base, step, ilim, elim)) {
        val hv = hev(p, base, step, hevT)
        val f1 = adjust(p, base, step, hv)
        if (!hv) {
          val a = (f1 + 1) >> 1
          val q1 = (p(base + step) & 0xFF) - 128
          val p1 = (p(base - 2 * step) & 0xFF) - 128
          p(base + step) = (sgn(q1 - a) + 128).toByte
          p(base - 2 * step) = (sgn(p1 + a) + 128).toByte
        }
      }
      k += 1
    }
  }

  private def mbEdge(p: Array[Byte], stride: Int, x0: Int, y0: Int,
                     vert: Boolean, count: Int, elim: Int, ilim: Int,
                     hevT: Int): Unit = {
    val step = if (vert) 1 else stride
    var k = 0
    while (k < count) {
      val base = if (vert) (y0 + k) * stride + x0 else y0 * stride + x0 + k
      if (filterMask(p, base, step, ilim, elim)) {
        if (hev(p, base, step, hevT)) adjust(p, base, step, useOuter = true)
        else {
          def g(i: Int): Int = (p(base + i * step) & 0xFF) - 128
          def put(i: Int, v: Int): Unit =
            p(base + i * step) = (sgn(v) + 128).toByte
          val w = sgn(sgn(g(-2) - g(1)) + 3 * (g(0) - g(-1)))
          var a = (27 * w + 63) >> 7
          put(0, g(0) - a); put(-1, g(-1) + a)
          a = (18 * w + 63) >> 7
          put(1, g(1) - a); put(-2, g(-2) + a)
          a = (9 * w + 63) >> 7
          put(2, g(2) - a); put(-3, g(-3) + a)
        }
      }
      k += 1
    }
  }
}
