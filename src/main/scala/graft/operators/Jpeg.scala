package graft.operators

/** Baseline JPEG (ITU T.81) pixel codec — REAL, zero dependencies.
  *
  * The third full image pixel path (after PNG's zlib+filters and GIF's
  * LZW): baseline sequential JPEG is canonical-Huffman entropy coding
  * plus an 8x8 DCT, both implementable on the bare JVM.
  *
  * Decoder: marker walk (DQT 8/16-bit, DHT, SOF0/SOF1, DRI, SOS),
  * canonical Huffman decode (mincode/maxcode/valptr), dequantize,
  * de-zigzag, double-precision separable IDCT, restart-marker resync,
  * chroma upsampling by sample replication, JFIF YCbCr->RGB. Grayscale
  * (1 component) and YCbCr (3 components, any sampling factors up to
  * 4) are supported; progressive (SOF2), arithmetic coding, 12-bit
  * precision and CMYK return null. Never throws and never hangs on
  * hostile bytes — every loop is bounded by the buffer length and
  * decode errors surface as null (the 10^12-row quarantine contract
  * shared with decodePngPixels/decodeGifPixels).
  *
  * Encoder: spec-conformant baseline streams (SOI/DQT/SOF0/DHT/SOS/
  * EOI, byte stuffing, optional restart intervals) for grayscale and
  * 4:4:4 RGB, with FIXED-LENGTH canonical Huffman tables (12 DC
  * categories at 4 bits, 162 AC run/size symbols at 8 bits — valid
  * prefix codes, no compression ambition) in the same spirit as the
  * GIF encoder's literal-coded LZW. The quant table is a parameter;
  * with an all-ones table, images that are CONSTANT per 8x8 block
  * round-trip BIT-EXACTLY (a flat block's DCT is a lone DC term 8*(v
  * -128), exactly representable and exactly inverted), which is what
  * the q96 oracle gates. Generic content at quant=1 is near-lossless
  * (AC rounding only); both are spec-tested, plus cross-validation
  * against the JDK's own ImageIO JPEG codec in both directions.
  */
object Jpeg {

  import Multimodal.PngImage

  // zigzag scan order: zigzag(k) = raster index of the k-th coefficient
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // InvZigzag(raster index) = zigzag position
  private val InvZigzag: Array[Int] = {
    val inv = new Array[Int](64)
    for (k <- 0 until 64) inv(Zigzag(k)) = k
    inv
  }

  // IDCT/FDCT basis: cs(u)(x) = C(u)/2 * cos((2x+1) u pi / 16)
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // ------------------------------------------------------------ decode

  private final class Huff(counts: Array[Int], symbols: Array[Byte]) {
    // canonical code reconstruction (T.81 F.2.2.3): for each length l,
    // codes are consecutive starting from (prev+1)<<1
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    /** next Huffman symbol, or -1 on exhausted input / invalid code */
    def decode(in: BitReader): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        val b = in.readBit()
        if (b < 0) return -1
        code = (code << 1) | b
        if (maxCode(l) >= 0 && code <= maxCode(l)) {
          val idx = valPtr(l) + code - minCode(l)
          if (idx >= symbols.length) return -1
          return symbols(idx) & 0xFF
        }
        l += 1
      }
      -1
    }
  }

  /** Entropy-segment bit reader: 0xFF00 destuffing; any other marker
    * (RSTn, EOI, ...) ends the current segment (readBit -> -1) with
    * `pos` left ON the 0xFF so the MCU loop can consume the RSTn.
    */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    def readBit(): Int = {
      if (nBits == 0) {
        if (pos >= data.length) return -1
        var byte = data(pos) & 0xFF
        pos += 1
        if (byte == 0xFF) {
          if (pos >= data.length) { pos -= 1; return -1 }
          if ((data(pos) & 0xFF) == 0x00) pos += 1 // stuffed FF
          else { pos -= 1; return -1 }             // real marker
        }
        acc = byte; nBits = 8
      }
      nBits -= 1
      (acc >>> nBits) & 1
    }
    /** n raw bits big-endian, Int.MinValue on exhaustion */
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = readBit()
        if (b < 0) return Int.MinValue
        v = (v << 1) | b
        i += 1
      }
      v
    }
    /** byte-align and consume an expected RSTn marker; false if absent */
    def consumeRestart(): Boolean = {
      nBits = 0
      if (pos + 1 >= data.length || (data(pos) & 0xFF) != 0xFF) return false
      val m = data(pos + 1) & 0xFF
      if (m < 0xD0 || m > 0xD7) return false
      pos += 2
      true
    }
  }

  // T.81 F.2.2.1: sign-extend an s-bit DIFF/coefficient magnitude
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final class Component {
    var id = 0
    var h = 0
    var v = 0
    var tq = 0    // quant table id
    var dcTbl = 0 // from SOS
    var acTbl = 0
    var pred = 0  // DC predictor
    var planeW = 0
    var planeH = 0
    var plane: Array[Byte] = null
  }

  /** Decode a baseline JPEG to gray (1 channel) or RGB (3). Null on
    * malformed, truncated, progressive, arithmetic, 12-bit or CMYK
    * input — never throws.
    */
  def decode(b: Array[Byte]): PngImage = {
    try {
      if (b == null || b.length < 4 ||
          (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return null
      val quant = new Array[Array[Int]](4)
      val dcTabs = new Array[Huff](4)
      val acTabs = new Array[Huff](4)
      var width = 0
      var height = 0
      var comps: Array[Component] = null
      var restartInterval = 0
      var i = 2
      def be16(p: Int): Int = ((b(p) & 0xFF) << 8) | (b(p + 1) & 0xFF)

      while (i + 4 <= b.length) {
        if ((b(i) & 0xFF) != 0xFF) return null
        var m = b(i + 1) & 0xFF
        // fill bytes: any number of 0xFF may precede a marker
        while (m == 0xFF && i + 2 < b.length) { i += 1; m = b(i + 1) & 0xFF }
        if (m == 0xD9) return null // EOI before SOS
        if (i + 4 > b.length) return null // fill walk ran off the buffer
        val len = be16(i + 2)
        if (len < 2 || i + 2 + len > b.length) return null
        val seg = i + 4       // segment payload
        val segEnd = i + 2 + len

        m match {
          case 0xDB => // DQT: one or more (Pq Tq, 64 entries) sub-tables
            var p = seg
            while (p < segEnd) {
              val pq = (b(p) & 0xFF) >>> 4
              val tq = b(p) & 0x0F
              if (tq > 3 || pq > 1) return null
              val tab = new Array[Int](64)
              p += 1
              var k = 0
              while (k < 64) {
                if (pq == 1) { if (p + 1 >= segEnd) return null; tab(k) = be16(p); p += 2 }
                else { if (p >= segEnd) return null; tab(k) = b(p) & 0xFF; p += 1 }
                if (tab(k) == 0) return null
                k += 1
              }
              quant(tq) = tab
            }

          case 0xC4 => // DHT: one or more (Tc Th, 16 counts, symbols)
            var p = seg
            while (p < segEnd) {
              val tc = (b(p) & 0xFF) >>> 4
              val th = b(p) & 0x0F
              if (tc > 1 || th > 3) return null
              if (p + 17 > segEnd) return null
              val counts = Array.tabulate(16)(j => b(p + 1 + j) & 0xFF)
              val n = counts.sum
              if (n > 256 || p + 17 + n > segEnd) return null
              val syms = java.util.Arrays.copyOfRange(b, p + 17, p + 17 + n)
              val tbl = new Huff(counts, syms)
              if (tc == 0) dcTabs(th) = tbl else acTabs(th) = tbl
              p += 17 + n
            }

          case 0xC0 | 0xC1 => // SOF0 baseline / SOF1 extended sequential
            if (comps != null) return null
            if ((b(seg) & 0xFF) != 8) return null // 8-bit precision only
            height = be16(seg + 1); width = be16(seg + 3)
            val nc = b(seg + 5) & 0xFF
            if (nc != 1 && nc != 3) return null // gray or YCbCr
            if (width <= 0 || height <= 0 || width.toLong * height > (1L << 26)) return null
            if (seg + 6 + 3 * nc > segEnd) return null
            comps = Array.fill(nc)(new Component)
            var c = 0
            while (c < nc) {
              val cc = comps(c)
              cc.id = b(seg + 6 + 3 * c) & 0xFF
              cc.h = (b(seg + 7 + 3 * c) & 0xFF) >>> 4
              cc.v = b(seg + 7 + 3 * c) & 0x0F
              cc.tq = b(seg + 8 + 3 * c) & 0xFF
              if (cc.h < 1 || cc.h > 4 || cc.v < 1 || cc.v > 4 || cc.tq > 3) return null
              c += 1
            }

          case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
               0xCD | 0xCE | 0xCF =>
            return null // progressive / lossless / arithmetic: unsupported

          case 0xDD => // DRI
            if (len != 4) return null
            restartInterval = be16(seg)

          case 0xDA => // SOS: scan header then entropy-coded data
            if (comps == null) return null
            val ns = b(seg) & 0xFF
            if (ns != comps.length || seg + 1 + 2 * ns + 3 > segEnd) return null
            var j = 0
            while (j < ns) {
              val cid = b(seg + 1 + 2 * j) & 0xFF
              val cc = comps.find(_.id == cid).getOrElse(return null)
              cc.dcTbl = (b(seg + 2 + 2 * j) & 0xFF) >>> 4
              cc.acTbl = b(seg + 2 + 2 * j) & 0x0F
              if (cc.dcTbl > 3 || cc.acTbl > 3) return null
              j += 1
            }
            return decodeScan(b, segEnd, width, height, comps, quant,
              dcTabs, acTabs, restartInterval)

          case _ => () // APPn / COM / others: skip
        }
        i = segEnd
      }
      null // no SOS reached
    } catch { case _: Exception => null }
  }

  private def decodeScan(b: Array[Byte], dataStart: Int, width: Int, height: Int,
                         comps: Array[Component], quant: Array[Array[Int]],
                         dcTabs: Array[Huff], acTabs: Array[Huff],
                         restartInterval: Int): PngImage = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcuCols = (width + 8 * hMax - 1) / (8 * hMax)
    val mcuRows = (height + 8 * vMax - 1) / (8 * vMax)
    for (cc <- comps) {
      cc.planeW = mcuCols * cc.h * 8
      cc.planeH = mcuRows * cc.v * 8
      if (cc.planeW.toLong * cc.planeH > (1L << 28)) return null
      cc.plane = new Array[Byte](cc.planeW * cc.planeH)
      if (quant(cc.tq) == null) return null
    }
    val in = new BitReader(b, dataStart)
    val coef = new Array[Int](64)
    val tmp = Array.ofDim[Double](8, 8)

    var mcu = 0
    val nMcu = mcuCols * mcuRows
    while (mcu < nMcu) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!in.consumeRestart()) return null
        for (cc <- comps) cc.pred = 0
      }
      val my = mcu / mcuCols
      val mx = mcu % mcuCols
      var c = 0
      while (c < comps.length) {
        val cc = comps(c)
        val dcT = dcTabs(cc.dcTbl)
        val acT = acTabs(cc.acTbl)
        if (dcT == null || acT == null) return null
        val qt = quant(cc.tq)
        var by = 0
        while (by < cc.v) {
          var bx = 0
          while (bx < cc.h) {
            java.util.Arrays.fill(coef, 0)
            // DC
            val t = dcT.decode(in)
            if (t < 0 || t > 11) return null
            val diffBits = if (t == 0) 0 else in.receive(t)
            if (diffBits == Int.MinValue) return null
            cc.pred += extend(diffBits, t)
            coef(0) = cc.pred * qt(0)
            // AC
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = acT.decode(in)
              if (rs < 0) return null
              val r = rs >>> 4
              val s = rs & 0x0F
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else eob = true      // EOB
              } else {
                k += r
                if (k > 63) return null
                val vb = in.receive(s)
                if (vb == Int.MinValue) return null
                coef(Zigzag(k)) = extend(vb, s) * qt(k)
                k += 1
              }
            }
            idctBlock(coef, tmp, cc.plane, cc.planeW,
              (mx * cc.h + bx) * 8, (my * cc.v + by) * 8)
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }

    if (comps.length == 1) {
      val cc = comps(0)
      val out = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        System.arraycopy(cc.plane, y * cc.planeW, out, y * width, width)
        y += 1
      }
      PngImage(width, height, 1, out)
    } else {
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val yy = y * width * 3
        var x = 0
        while (x < width) {
          val lum = cy.plane((y * cy.v / vMax) * cy.planeW + (x * cy.h / hMax)) & 0xFF
          val pb = (cb.plane((y * cb.v / vMax) * cb.planeW + (x * cb.h / hMax)) & 0xFF) - 128
          val pr = (cr.plane((y * cr.v / vMax) * cr.planeW + (x * cr.h / hMax)) & 0xFF) - 128
          out(yy + 3 * x) = clamp8(math.round(lum + 1.402 * pr).toInt)
          out(yy + 3 * x + 1) = clamp8(math.round(lum - 0.344136 * pb - 0.714136 * pr).toInt)
          out(yy + 3 * x + 2) = clamp8(math.round(lum + 1.772 * pb).toInt)
          x += 1
        }
        y += 1
      }
      PngImage(width, height, 3, out)
    }
  }

  private def clamp8(v: Int): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  /** f(x,y) = sum_u sum_v F(u,v) cs(u)(x) cs(v)(y), +128 level shift */
  private def idctBlock(coef: Array[Int], tmp: Array[Array[Double]],
                        plane: Array[Byte], planeW: Int, px: Int, py: Int): Unit = {
    // rows: tmp(v)(x) = sum_u F(u,v) cs(u)(x)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += coef(v * 8 + u) * Basis(u)(x); u += 1 }
        tmp(v)(x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      val row = (py + y) * planeW + px
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += tmp(vv)(x) * Basis(vv)(y); vv += 1 }
        plane(row + x) = clamp8(math.round(s + 128.0).toInt)
        x += 1
      }
      y += 1
    }
  }

  // ------------------------------------------------------------ encode

  // fixed-length canonical tables: valid prefix codes, zero compression
  // cleverness. DC: categories 0..11 at 4 bits (codes 0000..1011; the
  // all-ones code 1111 stays unused as T.81 requires). AC: the 162
  // baseline run/size symbols at 8 bits (codes 0..161 < 0xFF).
  private val DcCounts: Array[Int] = { val a = new Array[Int](16); a(3) = 12; a }
  private val DcSyms: Array[Byte] = Array.tabulate(12)(_.toByte)
  private val AcCounts: Array[Int] = { val a = new Array[Int](16); a(7) = 162; a }
  private val AcSyms: Array[Byte] = {
    val syms = Array.newBuilder[Byte]
    syms += 0x00.toByte // EOB
    for (r <- 0 to 15; s <- 1 to 10) syms += ((r << 4) | s).toByte
    syms += 0xF0.toByte // ZRL
    syms.result()
  }
  // encode-side code assignment mirrors the canonical reconstruction
  private val DcCode: Array[Int] = Array.tabulate(12)(identity) // 4-bit
  private val AcCode: Array[Int] = {
    val m = new Array[Int](256)
    java.util.Arrays.fill(m, -1)
    for ((sym, idx) <- AcSyms.zipWithIndex) m(sym & 0xFF) = idx
    m
  }

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>>= 1; s += 1 }
    s
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var n = 0
    def put(code: Int, bits: Int): Unit = {
      acc = (acc << bits) | (code & ((1L << bits) - 1))
      n += bits
      while (n >= 8) {
        val byte = ((acc >>> (n - 8)) & 0xFF).toInt
        out.write(byte)
        if (byte == 0xFF) out.write(0x00) // byte stuffing
        n -= 8
      }
    }
    def flush(): Unit = if (n > 0) { put(0x7F, 8 - n) } // pad with 1s
  }

  /** Encode one 8x8 block (already level-shiftable 0..255 samples read
    * from `samples` with edge replication), returning the new DC pred.
    */
  private def encodeBlock(samples: (Int, Int) => Int, qt: Array[Int],
                          pred: Int, w: BitWriter): Int = {
    // FDCT: F(u,v) = sum_x sum_y f(x,y) cs(u)(x) cs(v)(y)
    val tmp = Array.ofDim[Double](8, 8)
    var u = 0
    while (u < 8) { // rows: tmp(y)(u) = sum_x f(x,y) cs(u)(x)
      var y = 0
      while (y < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += (samples(x, y) - 128) * Basis(u)(x); x += 1 }
        tmp(y)(u) = s
        y += 1
      }
      u += 1
    }
    val zz = new Array[Int](64)
    var v = 0
    while (v < 8) {
      var uu = 0
      while (uu < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) { s += tmp(y)(uu) * Basis(v)(y); y += 1 }
        val k = InvZigzag(v * 8 + uu)
        zz(k) = math.round(s / qt(k)).toInt
        uu += 1
      }
      v += 1
    }
    // DC
    val diff = zz(0) - pred
    val s0 = category(diff)
    w.put(DcCode(s0), 4)
    if (s0 > 0) w.put(if (diff >= 0) diff else diff + (1 << s0) - 1, s0)
    // AC
    var run = 0
    var k = 1
    while (k < 64) {
      if (zz(k) == 0) run += 1
      else {
        while (run > 15) { w.put(AcCode(0xF0), 8); run -= 16 }
        val s = category(zz(k))
        w.put(AcCode((run << 4) | s), 8)
        w.put(if (zz(k) >= 0) zz(k) else zz(k) + (1 << s) - 1, s)
        run = 0
      }
      k += 1
    }
    if (run > 0) w.put(AcCode(0x00), 8) // EOB
    zz(0)
  }

  private def writeSeg(out: java.io.ByteArrayOutputStream, marker: Int,
                       payload: Array[Byte]): Unit = {
    out.write(0xFF); out.write(marker)
    val len = payload.length + 2
    out.write((len >>> 8) & 0xFF); out.write(len & 0xFF)
    out.write(payload, 0, payload.length)
  }

  private def headerSegs(out: java.io.ByteArrayOutputStream, width: Int,
                         height: Int, nc: Int, qt: Array[Int],
                         restartInterval: Int): Unit = {
    out.write(0xFF); out.write(0xD8) // SOI
    // DQT table 0, 8-bit, zigzag order (qt is already in zigzag order)
    writeSeg(out, 0xDB, (0.toByte +: qt.map(_.toByte)).toArray)
    // SOF0
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8) // precision
    sof.write((height >>> 8) & 0xFF); sof.write(height & 0xFF)
    sof.write((width >>> 8) & 0xFF); sof.write(width & 0xFF)
    sof.write(nc)
    var c = 0
    while (c < nc) {
      sof.write(c + 1)  // component id
      sof.write(0x11)   // 1x1 sampling: gray or 4:4:4
      sof.write(0)      // quant table 0
      c += 1
    }
    writeSeg(out, 0xC0, sof.toByteArray)
    // DHT: DC table 0 and AC table 0 (shared by all components)
    writeSeg(out, 0xC4,
      (0x00.toByte +: (DcCounts.map(_.toByte) ++ DcSyms)).toArray)
    writeSeg(out, 0xC4,
      (0x10.toByte +: (AcCounts.map(_.toByte) ++ AcSyms)).toArray)
    if (restartInterval > 0)
      writeSeg(out, 0xDD, Array(((restartInterval >>> 8) & 0xFF).toByte,
        (restartInterval & 0xFF).toByte))
    // SOS
    val sos = new java.io.ByteArrayOutputStream()
    sos.write(nc)
    c = 0
    while (c < nc) { sos.write(c + 1); sos.write(0x00); c += 1 }
    sos.write(0); sos.write(63); sos.write(0) // Ss/Se/AhAl (baseline fixed)
    writeSeg(out, 0xDA, sos.toByteArray)
  }

  /** All-ones quant table: flat 8x8 blocks round-trip bit-exactly. */
  val QuantOnes: Array[Int] = Array.fill(64)(1)

  /** Encode 8-bit grayscale as a baseline JPEG. `quant` is a 64-entry
    * zigzag-order table (default all ones — near-lossless).
    */
  def encodeGray(width: Int, height: Int, pixels: Array[Byte],
                 quant: Array[Int] = QuantOnes, restartInterval: Int = 0): Array[Byte] = {
    require(pixels.length == width * height, "pixel size mismatch")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255), "quant")
    val out = new java.io.ByteArrayOutputStream()
    headerSegs(out, width, height, 1, quant, restartInterval)
    val w = new BitWriter(out)
    val mcuCols = (width + 7) / 8
    val mcuRows = (height + 7) / 8
    var pred = 0
    var mcu = 0
    while (mcu < mcuCols * mcuRows) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        w.flush()
        out.write(0xFF); out.write(0xD0 + ((mcu / restartInterval - 1) % 8))
        pred = 0
      }
      val bx = (mcu % mcuCols) * 8
      val by = (mcu / mcuCols) * 8
      pred = encodeBlock((x, y) => {
        val xx = math.min(bx + x, width - 1)   // edge replication
        val yy = math.min(by + y, height - 1)
        pixels(yy * width + xx) & 0xFF
      }, quant, pred, w)
      mcu += 1
    }
    w.flush()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** JFIF forward color transform, Math.round semantics (floor(x+.5)). */
  def rgbToYcc(r: Int, g: Int, b: Int): (Int, Int, Int) = (
    clamp8i(math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt),
    clamp8i(math.round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0).toInt),
    clamp8i(math.round(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0).toInt))

  private def clamp8i(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Encode packed RGB as a 4:4:4 baseline JPEG (one block per
    * component per MCU, no subsampling loss; quant=ones keeps
    * block-flat content exact modulo the YCbCr integer round-trip).
    */
  def encodeRgb444(width: Int, height: Int, rgb: Array[Byte],
                   quant: Array[Int] = QuantOnes, restartInterval: Int = 0): Array[Byte] = {
    require(rgb.length == width * height * 3, "pixel size mismatch")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255), "quant")
    // precompute the three planes
    val n = width * height
    val py = new Array[Byte](n); val pb = new Array[Byte](n); val pr = new Array[Byte](n)
    var k = 0
    while (k < n) {
      val (yv, cbv, crv) = rgbToYcc(rgb(3 * k) & 0xFF, rgb(3 * k + 1) & 0xFF, rgb(3 * k + 2) & 0xFF)
      py(k) = yv.toByte; pb(k) = cbv.toByte; pr(k) = crv.toByte
      k += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    headerSegs(out, width, height, 3, quant, restartInterval)
    val w = new BitWriter(out)
    val mcuCols = (width + 7) / 8
    val mcuRows = (height + 7) / 8
    val preds = new Array[Int](3)
    val planes = Array(py, pb, pr)
    var mcu = 0
    while (mcu < mcuCols * mcuRows) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        w.flush()
        out.write(0xFF); out.write(0xD0 + ((mcu / restartInterval - 1) % 8))
        preds(0) = 0; preds(1) = 0; preds(2) = 0
      }
      val bx = (mcu % mcuCols) * 8
      val by = (mcu / mcuCols) * 8
      var c = 0
      while (c < 3) {
        val plane = planes(c)
        preds(c) = encodeBlock((x, y) => {
          val xx = math.min(bx + x, width - 1)
          val yy = math.min(by + y, height - 1)
          plane(yy * width + xx) & 0xFF
        }, quant, preds(c), w)
        c += 1
      }
      mcu += 1
    }
    w.flush()
    out.write(0xFF); out.write(0xD9)
    out.toByteArray
  }
}
