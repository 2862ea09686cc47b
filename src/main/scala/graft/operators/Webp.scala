package graft.operators

/** WebP lossless (VP8L) pixel codec — REAL, zero dependencies.
  *
  * The fourth image pixel path: VP8L is DEFLATE-family entropy coding
  * (canonical Huffman, LSB-first bitstream, LZ77 backward references)
  * plus four reversible pixel transforms, all implementable on the
  * bare JVM.
  *
  * Decoder: full lossless bitstream — 14-bit header dims, the four
  * transforms (predictor with all 14 modes and edge rules, color
  * transform with signed 3.5 fixed-point deltas, subtract-green,
  * color-indexing with sub-byte pixel bundling), meta-Huffman entropy
  * images, per-group 5-code Huffman sets (simple 1/2-symbol codes and
  * code-length-coded normal codes with 16/17/18 repeats and the
  * max_symbol budget), color cache (multiplicative hash insert on
  * every emitted pixel), and LZ77 copies whose short distances go
  * through the 120-entry 2-D neighbor map. Never throws and never
  * hangs on hostile bytes — nulls quarantine, the same contract as the
  * PNG/GIF/JPEG decoders. Cross-validated bit-exactly against real
  * libwebp-encoded fixtures (lossless: decoded pixels MUST equal the
  * encoder's input exactly).
  *
  * Encoder: minimal spec-valid literal-only streams (no transforms, no
  * cache, one Huffman group, complete flat 8-bit codes written through
  * the real code-length coding path) — same fixed-code spirit as the
  * GIF and JPEG encoders; used for the deterministic q98 corpus.
  */
object Webp {

  import Multimodal.PngImage

  // code-length code symbol order (spec: kCodeLengthCodeOrder)
  private val ClOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** The spec's 120-entry short-distance neighbor map (plane codes
    * 1..120 -> (dx, dy) offsets above/left of the current pixel).
    * Verified entry-by-entry against the system libwebp by crafting
    * single-copy streams per plane code and reading back the copied
    * source pixel (see tools/gen_webp_fixtures.py provenance note).
    */
  private val DistMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  private final class Fail extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Fail

  /** LSB-first bit reader (DEFLATE convention). Over-reads fail().
    * endByteExcl bounds embedded sub-streams (e.g. ALPH payloads) so
    * they cannot read into the following chunk's bytes. */
  private final class Br(data: Array[Byte], startByte: Int,
                         endByteExcl: Int = -1) {
    private var pos = startByte.toLong * 8
    private val end =
      (if (endByteExcl < 0) data.length.toLong
       else math.min(endByteExcl.toLong, data.length.toLong)) * 8
    def bits(n: Int): Int = {
      if (pos + n > end) fail()
      var v = 0
      var i = 0
      while (i < n) {
        val p = pos + i
        if ((data((p >> 3).toInt) & (1 << (p & 7).toInt)) != 0) v |= 1 << i
        i += 1
      }
      pos += n
      v
    }
  }

  /** Canonical-Huffman decode tree (bit-by-bit walk, code bits
    * MSB-first per DEFLATE). Array of nodes; leaf = -(symbol+1).
    */
  private final class HTree(lengths: Array[Int]) {
    private val nodes = new Array[Int](math.max(2, 2 * lengths.count(_ > 0)) * 2 + 2)
    java.util.Arrays.fill(nodes, 0) // 0 = unset (node 0 is the root)
    private var nNodes = 1
    private var single = -1 // exactly-one-symbol code: zero bits per symbol

    locally {
      val present = (0 until lengths.length).filter(lengths(_) > 0)
      if (present.isEmpty) fail()
      if (present.length == 1) single = present.head
      else {
        // prefix-free check: over-subscribed codes are invalid. Under-
        // subscribed codes are tolerated (a stream using a missing code
        // hits an unset tree slot and fails cleanly) — slightly more
        // permissive than libwebp, never less correct on valid streams.
        var kraft = 0L
        present.foreach { s => if (lengths(s) > 15) fail(); kraft += 1L << (15 - lengths(s)) }
        if (kraft > (1L << 15)) fail()
        // DEFLATE canonical assignment
        val blCount = new Array[Int](16)
        present.foreach(s => blCount(lengths(s)) += 1)
        val nextCode = new Array[Int](16)
        var code = 0
        for (l <- 1 to 15) { code = (code + blCount(l - 1)) << 1; nextCode(l) = code }
        present.foreach { s =>
          val len = lengths(s)
          insert(nextCode(len), len, s)
          nextCode(len) += 1
        }
      }
    }

    private def insert(code: Int, len: Int, sym: Int): Unit = {
      var node = 0
      var i = len - 1
      while (i >= 0) {
        val bit = (code >>> i) & 1
        val slot = 2 * node + bit
        if (i == 0) {
          if (nodes(slot) != 0) fail()
          nodes(slot) = -(sym + 1)
        } else {
          if (nodes(slot) < 0) fail()
          if (nodes(slot) == 0) { nodes(slot) = nNodes; nNodes += 1 }
          node = nodes(slot)
        }
        i -= 1
      }
    }

    def decode(br: Br): Int = {
      if (single >= 0) return single
      var node = 0
      var depth = 0
      while (depth <= 15) {
        val slot = 2 * node + br.bits(1)
        val v = nodes(slot)
        if (v < 0) return -v - 1
        if (v == 0) fail()
        node = v
        depth += 1
      }
      fail()
    }
  }

  /** Read one Huffman code definition (simple or code-length-coded). */
  private def readCode(br: Br, alphabetSize: Int): HTree = {
    val lengths = new Array[Int](alphabetSize)
    if (br.bits(1) == 1) { // simple code: 1 or 2 symbols
      val numSym = br.bits(1) + 1
      val is8 = br.bits(1)
      val s0 = br.bits(if (is8 == 1) 8 else 1)
      if (s0 >= alphabetSize) fail()
      lengths(s0) = 1
      if (numSym == 2) {
        val s1 = br.bits(8)
        if (s1 >= alphabetSize || s1 == s0) fail()
        lengths(s1) = 1
      } else return new HTree(lengths) // single symbol: zero-bit code
      new HTree(lengths)
    } else {
      // code-length code: 3-bit lengths in ClOrder for the first n
      val n = 4 + br.bits(4)
      if (n > ClOrder.length) fail()
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < n) { clLengths(ClOrder(i)) = br.bits(3); i += 1 }
      val clTree = new HTree(clLengths)
      // optional symbol budget
      var maxSymbol =
        if (br.bits(1) == 1) {
          val nbits = 2 + 2 * br.bits(3)
          val m = 2 + br.bits(nbits)
          if (m > alphabetSize) fail()
          m
        } else alphabetSize
      var prev = 8
      var sym = 0
      while (sym < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clTree.decode(br)
        if (cl < 16) {
          lengths(sym) = cl
          sym += 1
          if (cl != 0) prev = cl
        } else if (cl == 16) {
          var rep = 3 + br.bits(2)
          if (sym + rep > alphabetSize) fail()
          while (rep > 0) { lengths(sym) = prev; sym += 1; rep -= 1 }
        } else if (cl == 17) {
          val rep = 3 + br.bits(3)
          if (sym + rep > alphabetSize) fail()
          sym += rep
        } else {
          val rep = 11 + br.bits(7)
          if (sym + rep > alphabetSize) fail()
          sym += rep
        }
      }
      new HTree(lengths)
    }
  }

  private def prefixVal(br: Br, code: Int): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.bits(extra) + 1
    }

  private final class Group(br: Br, cacheSize: Int) {
    val green = readCode(br, 256 + 24 + cacheSize)
    val red = readCode(br, 256)
    val blue = readCode(br, 256)
    val alpha = readCode(br, 256)
    val dist = readCode(br, 40)
  }

  /** The spatially-coded image: color cache, optional meta-Huffman
    * (main image only), Huffman groups, LZ77 + cache pixel stream.
    * Returns ARGB ints in scan order.
    */
  private def readImage(br: Br, w: Int, h: Int, allowMeta: Boolean): Array[Int] = {
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) fail()
    val cacheBits = if (br.bits(1) == 1) br.bits(4) else 0
    if (cacheBits > 11) fail()
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null

    var metaPixels: Array[Int] = null
    var metaW = 0
    var metaBits = 0
    var nGroups = 1
    if (allowMeta && br.bits(1) == 1) {
      metaBits = br.bits(3) + 2
      metaW = (w + (1 << metaBits) - 1) >> metaBits
      val metaH = (h + (1 << metaBits) - 1) >> metaBits
      metaPixels = readImage(br, metaW, metaH, allowMeta = false)
      var mx = 0
      metaPixels.foreach { p =>
        val idx = ((p >>> 16) & 0xFF) << 8 | ((p >>> 8) & 0xFF)
        if (idx > mx) mx = idx
      }
      nGroups = mx + 1
      if (nGroups > 65536) fail() // sanity cap (each group still costs stream bits)
    }
    val groups = Array.fill(nGroups)(new Group(br, cacheSize))

    val n = w * h
    val px = new Array[Int](n)
    var pos = 0
    def insertCache(argb: Int): Unit =
      if (cache != null) cache(((0x1E35A7BD * argb) >>> (32 - cacheBits))) = argb
    while (pos < n) {
      val g =
        if (metaPixels == null) groups(0)
        else {
          val x = pos % w; val y = pos / w
          val mp = metaPixels((y >> metaBits) * metaW + (x >> metaBits))
          val idx = ((mp >>> 16) & 0xFF) << 8 | ((mp >>> 8) & 0xFF)
          if (idx >= nGroups) fail()
          groups(idx)
        }
      val s = g.green.decode(br)
      if (s < 256) {
        val r = g.red.decode(br)
        val b = g.blue.decode(br)
        val a = g.alpha.decode(br)
        val argb = (a << 24) | (r << 16) | (s << 8) | b
        px(pos) = argb
        insertCache(argb)
        pos += 1
      } else if (s < 256 + 24) {
        val len = prefixVal(br, s - 256)
        val dcode = g.dist.decode(br)
        val plane = prefixVal(br, dcode)
        val dist0 =
          if (plane > 120) plane - 120
          else {
            val (dx, dy) = DistMap(plane - 1)
            val d = dy * w + dx
            if (d < 1) 1 else d
          }
        if (dist0 > pos || len > n - pos) fail()
        var k = 0
        while (k < len) {
          px(pos) = px(pos - dist0)
          insertCache(px(pos))
          pos += 1
          k += 1
        }
      } else {
        val idx = s - 256 - 24
        if (cache == null || idx >= cacheSize) fail()
        px(pos) = cache(idx)
        pos += 1
      }
    }
    px
  }

  private def avg2(a: Int, b: Int): Int = {
    // per-channel (a+b)/2 without overflow between channels
    (((a ^ b) & 0xFEFEFEFE) >>> 1) + (a & b)
  }
  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  private def addPixels(a: Int, b: Int): Int = { // per-channel mod-256 sum
    var out = 0
    var sh = 0
    while (sh < 32) {
      out |= (((a >>> sh) + (b >>> sh)) & 0xFF) << sh
      sh += 8
    }
    out
  }

  private def select(l: Int, t: Int, tl: Int): Int = {
    var pl = 0; var pt = 0
    var sh = 0
    while (sh < 32) {
      val cl = (l >>> sh) & 0xFF; val ct = (t >>> sh) & 0xFF; val ctl = (tl >>> sh) & 0xFF
      val p = cl + ct - ctl
      pl += math.abs(p - cl); pt += math.abs(p - ct)
      sh += 8
    }
    if (pl < pt) l else t
  }
  private def clampAddSubFull(a: Int, b: Int, c: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      out |= clamp255(((a >>> sh) & 0xFF) + ((b >>> sh) & 0xFF) - ((c >>> sh) & 0xFF)) << sh
      sh += 8
    }
    out
  }
  private def clampAddSubHalf(a: Int, c: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val av = (a >>> sh) & 0xFF; val cv = (c >>> sh) & 0xFF
      out |= clamp255(av + (av - cv) / 2) << sh
      sh += 8
    }
    out
  }

  /** In-place inverse predictor transform (spec: 14 modes; top row
    * forces L, left column forces T, first pixel is opaque black).
    */
  private def inversePredictor(px: Array[Int], w: Int, h: Int,
                               modes: Array[Int], bits: Int): Unit = {
    val mw = (w + (1 << bits) - 1) >> bits
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (x == 0 && y == 0) 0xFF000000
          else if (y == 0) px(pos - 1)          // top row: L
          else if (x == 0) px(pos - w)          // left column: T
          else {
            val mode = (modes((y >> bits) * mw + (x >> bits)) >>> 8) & 0xFF
            val l = px(pos - 1); val t = px(pos - w)
            val tl = px(pos - w - 1); val tr = px(pos - w + 1)
            mode match {
              case 0 => 0xFF000000
              case 1 => l
              case 2 => t
              case 3 => tr
              case 4 => tl
              case 5 => avg2(avg2(l, tr), t)
              case 6 => avg2(l, tl)
              case 7 => avg2(l, t)
              case 8 => avg2(tl, t)
              case 9 => avg2(t, tr)
              case 10 => avg2(avg2(l, tl), avg2(t, tr))
              case 11 => select(l, t, tl)
              case 12 => clampAddSubFull(l, t, tl)
              case 13 => clampAddSubHalf(avg2(l, t), tl)
              case _ => fail()
            }
          }
        px(pos) = addPixels(px(pos), pred)
        pos += 1
        x += 1
      }
      y += 1
    }
  }

  private def inverseColorTransform(px: Array[Int], w: Int, h: Int,
                                    ctes: Array[Int], bits: Int): Unit = {
    val mw = (w + (1 << bits) - 1) >> bits
    def delta(t: Int, c: Int): Int = ((t.toByte.toInt * c.toByte.toInt) >> 5)
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cte = ctes((y >> bits) * mw + (x >> bits))
        val g2r = cte & 0xFF            // blue channel of the CTE pixel
        val g2b = (cte >>> 8) & 0xFF    // green channel
        val r2b = (cte >>> 16) & 0xFF   // red channel
        val p = px(pos)
        val green = (p >>> 8) & 0xFF
        val red = (((p >>> 16) & 0xFF) + delta(g2r, green)) & 0xFF
        val blue = (((p & 0xFF) + delta(g2b, green) + delta(r2b, red))) & 0xFF
        px(pos) = (p & 0xFF00FF00) | (red << 16) | blue
        pos += 1
        x += 1
      }
      y += 1
    }
  }

  private def inverseSubtractGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = (p >>> 8) & 0xFF
      val r = (((p >>> 16) & 0xFF) + g) & 0xFF
      val b = ((p & 0xFF) + g) & 0xFF
      px(i) = (p & 0xFF00FF00) | (r << 16) | b
      i += 1
    }
  }

  private def paletteWidthBits(n: Int): Int =
    if (n <= 2) 3 else if (n <= 4) 2 else if (n <= 16) 1 else 0

  /** Decode a lossless WebP (the VP8L chunk, found through the RIFF
    * walk, including inside an extended VP8X container) to RGBA.
    * Null on lossy VP8 payloads, malformed or hostile bytes — never
    * throws, never hangs.
    */
  def decodeLossless(bytes: Array[Byte]): PngImage =
    try decode0(bytes) catch { case _: Exception => null }

  private def decode0(bytes: Array[Byte]): PngImage = {
      val payload = findVp8l(bytes)
      if (payload < 0) return null
      if ((bytes(payload) & 0xFF) != 0x2F) return null
      val br = new Br(bytes, payload + 1)
      val w = br.bits(14) + 1
      val h = br.bits(14) + 1
      br.bits(1) // alpha hint
      if (br.bits(3) != 0) return null // version
      if (w.toLong * h > (1L << 26)) return null
      val px = decodeBody(br, w, h)
      if (px == null) return null

      val rgba = new Array[Byte](w * h * 4)
      var i = 0
      while (i < w * h) {
        val p = px(i)
        rgba(4 * i) = ((p >>> 16) & 0xFF).toByte
        rgba(4 * i + 1) = ((p >>> 8) & 0xFF).toByte
        rgba(4 * i + 2) = (p & 0xFF).toByte
        rgba(4 * i + 3) = ((p >>> 24) & 0xFF).toByte
        i += 1
      }
      PngImage(w, h, 4, rgba)
  }

  /** Decode the ALPH chunk's compression-method-1 payload: a
    * HEADERLESS VP8L stream (transform bits onward, dims implied by
    * the frame) whose GREEN channel carries the alpha plane
    * (container spec "Alpha"). Null on any failure. */
  private[operators] def decodeAlphaLossless(bytes: Array[Byte], off: Int,
                                             endExcl: Int, w: Int, h: Int): Array[Byte] =
    try {
      val br = new Br(bytes, off, endExcl)
      val px = decodeBody(br, w, h)
      if (px == null) null
      else {
        val out = new Array[Byte](w * h)
        var i = 0
        while (i < out.length) { out(i) = ((px(i) >>> 8) & 0xFF).toByte; i += 1 }
        out
      }
    } catch { case _: Exception => null }

  /** The VP8L frame body shared by the main stream and ALPH alpha
    * streams: transform declarations + entropy-coded image + inverse
    * transforms. Returns ARGB ints, or null on malformed input. */
  private def decodeBody(br: Br, w: Int, h: Int): Array[Int] = {
      // transforms (each at most once), tracking the active width
      var xsize = w
      var palette: Array[Int] = null
      var palWidthBits = 0
      final case class Tf(kind: Int, data: Array[Int], bits: Int, atWidth: Int)
      var tfs: List[Tf] = Nil
      val seen = new Array[Boolean](4)
      while (br.bits(1) == 1) {
        val kind = br.bits(2)
        if (seen(kind)) return null
        seen(kind) = true
        kind match {
          case 0 | 1 =>
            val bits = br.bits(3) + 2
            val sub = readImage(br, (xsize + (1 << bits) - 1) >> bits,
              (h + (1 << bits) - 1) >> bits, allowMeta = false)
            tfs = Tf(kind, sub, bits, xsize) :: tfs
          case 2 =>
            tfs = Tf(2, null, 0, xsize) :: tfs
          case 3 =>
            val n = br.bits(8) + 1
            val raw = readImage(br, n, 1, allowMeta = false)
            palette = new Array[Int](n)
            var acc = 0
            var i = 0
            while (i < n) { acc = addPixels(acc, raw(i)); palette(i) = acc; i += 1 }
            palWidthBits = paletteWidthBits(n)
            xsize = (w + (1 << palWidthBits) - 1) >> palWidthBits
            tfs = Tf(3, palette, palWidthBits, xsize) :: tfs
        }
      }

      var px = readImage(br, xsize, h, allowMeta = true)
      var curW = xsize
      // inverse transforms in reverse stream order (tfs is already
      // reversed by the prepends above)
      tfs.foreach { tf =>
        tf.kind match {
          case 0 => inversePredictor(px, curW, h, tf.data, tf.bits)
          case 1 => inverseColorTransform(px, curW, h, tf.data, tf.bits)
          case 2 => inverseSubtractGreen(px)
          case 3 =>
            val out = new Array[Int](w * h)
            val bitsPerIdx = 8 >> tf.bits
            val mask = (1 << bitsPerIdx) - 1
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val packed = px(y * curW + (x >> tf.bits))
                val idx = ((packed >>> 8) & 0xFF) >>> ((x & ((1 << tf.bits) - 1)) * bitsPerIdx) & mask
                out(y * w + x) = if (idx < tf.data.length) tf.data(idx) else 0
                x += 1
              }
              y += 1
            }
            px = out
            curW = w
        }
      }
      if (curW != w) return null
      px
  }

  /** Offset of the VP8L chunk payload inside the RIFF container, or -1. */
  private def findVp8l(b: Array[Byte]): Int = {
    if (b == null || b.length < 21) return -1
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P') return -1
    var i = 12
    while (i + 8 <= b.length) {
      val len = (b(i + 4) & 0xFFL) | ((b(i + 5) & 0xFFL) << 8) |
        ((b(i + 6) & 0xFFL) << 16) | ((b(i + 7) & 0xFFL) << 24)
      if (b(i) == 'V' && b(i + 1) == 'P' && b(i + 2) == '8' && b(i + 3) == 'L')
        return if (len >= 1 && i + 8 + len <= b.length) i + 8 else -1
      val next = i.toLong + 8 + len + (len & 1)
      if (next <= i || next > b.length) return -1
      i = next.toInt
    }
    -1
  }

  // ------------------------------------------------------------ encode

  private final class Bw {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var n = 0
    def put(v: Int, bits: Int): Unit = { // LSB-first
      acc |= (v.toLong & ((1L << bits) - 1)) << n
      n += bits
      while (n >= 8) { out.write((acc & 0xFF).toInt); acc >>>= 8; n -= 8 }
    }
    def putCode(code: Int, len: Int): Unit = { // Huffman: MSB-first
      var i = len - 1
      while (i >= 0) { put((code >>> i) & 1, 1); i -= 1 }
    }
    def bytes(): Array[Byte] = {
      if (n > 0) { out.write((acc & 0xFF).toInt); acc = 0; n = 0 }
      out.toByteArray
    }
  }

  /** Emit a complete flat 8-bit code over symbols 0..255 (+ trailing
    * zero-length symbols) through the normal code-length-coded path:
    * code-length code = {0 -> len 1 (code 0), 8 -> len 1 (code 1)}.
    */
  private def writeFlat8Code(bw: Bw, alphabetSize: Int): Unit = {
    bw.put(0, 1)  // not simple
    bw.put(8, 4)  // num_code_lengths = 12 (covers order idx of syms 0 and 8)
    var i = 0
    while (i < 12) {
      val sym = ClOrder(i)
      bw.put(if (sym == 0 || sym == 8) 1 else 0, 3)
      i += 1
    }
    bw.put(0, 1) // no max_symbol budget
    var s = 0
    while (s < alphabetSize) {
      bw.put(if (s < 256) 1 else 0, 1) // cl-code: "8" = code 1, "0" = code 0
      s += 1
    }
  }

  /** Encode RGBA as a literal-only lossless WebP: no transforms, no
    * color cache, one Huffman group, flat 8-bit literal codes.
    */
  def encodeLossless(width: Int, height: Int, rgba: Array[Byte]): Array[Byte] = {
    require(rgba.length == width * height * 4, "pixel size mismatch")
    require(width >= 1 && width <= 16384 && height >= 1 && height <= 16384, "dims")
    val bw = new Bw
    bw.put(width - 1, 14)
    bw.put(height - 1, 14)
    bw.put(1, 1) // alpha used
    bw.put(0, 3) // version
    bw.put(0, 1) // no transforms
    bw.put(0, 1) // no color cache
    bw.put(0, 1) // no meta-huffman
    writeFlat8Code(bw, 256 + 24) // green: literals only
    writeFlat8Code(bw, 256)      // red
    writeFlat8Code(bw, 256)      // blue
    writeFlat8Code(bw, 256)      // alpha
    // distance: simple code, single symbol 0 (zero-bit, never used)
    bw.put(1, 1); bw.put(0, 1); bw.put(0, 1); bw.put(0, 1)
    var i = 0
    while (i < width * height) {
      bw.putCode(rgba(4 * i + 1) & 0xFF, 8) // green first
      bw.putCode(rgba(4 * i) & 0xFF, 8)     // red
      bw.putCode(rgba(4 * i + 2) & 0xFF, 8) // blue
      bw.putCode(rgba(4 * i + 3) & 0xFF, 8) // alpha
      i += 1
    }
    val payload = (0x2F.toByte +: bw.bytes()).toArray
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
      out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
    }
    out.write("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val chunkLen = payload.length
    le32(4 + 8 + chunkLen + (chunkLen & 1))
    out.write("WEBP".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write("VP8L".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    le32(chunkLen)
    out.write(payload, 0, payload.length)
    if ((chunkLen & 1) == 1) out.write(0)
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Animated WebP (container spec "Animation": VP8X anim flag, ANIM
  // global parameters, ANMF frames with even x/y offsets, per-frame
  // duration, blend and dispose-to-background flags). The per-frame
  // payloads are ordinary VP8/VP8L (+ALPH) bitstreams decoded by the
  // libwebp-gated codecs above; this layer is the demux + canvas
  // compositor a pipeline needs to frame-sample animations.

  /** One ANMF frame: placement, timing, compositing flags, and the
    * byte range of its sub-chunk payload inside the container. */
  final case class AnimFrame(x: Int, y: Int, width: Int, height: Int,
                             durationMs: Int, blend: Boolean,
                             disposeToBg: Boolean, dataOff: Int, dataLen: Int)

  /** Animation-level metadata. bgColor is ARGB. */
  final case class AnimMeta(canvasW: Int, canvasH: Int, bgColor: Int,
                            loopCount: Int, frames: Array[AnimFrame])

  /** Parse an animated WebP's structure. Null for non-animated or
    * malformed containers — never throws, never hangs. */
  def decodeAnim(b: Array[Byte]): AnimMeta =
    try decodeAnim0(b) catch { case _: Exception => null }

  private def decodeAnim0(b: Array[Byte]): AnimMeta = {
    if (b == null || b.length < 30 || b(0) != 'R' || b(1) != 'I' ||
        b(2) != 'F' || b(3) != 'F' || b(8) != 'W' || b(9) != 'E' ||
        b(10) != 'B' || b(11) != 'P') return null
    def le24(i: Int): Int =
      (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16)
    var canvasW = 0; var canvasH = 0
    var bg = 0; var loop = 0
    var animFlag = false; var sawAnim = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[AnimFrame]
    var p = 12L
    while (p + 8 <= b.length) {
      val i = p.toInt
      val size = (b(i + 4) & 0xFFL) | ((b(i + 5) & 0xFFL) << 8) |
        ((b(i + 6) & 0xFFL) << 16) | ((b(i + 7) & 0xFFL) << 24)
      val body = i + 8
      val bodyLen = math.min(size, (b.length - body).toLong).toInt
      def tagIs(c0: Char, c1: Char, c2: Char, c3: Char): Boolean =
        b(i) == c0 && b(i + 1) == c1 && b(i + 2) == c2 && b(i + 3) == c3
      if (tagIs('V', 'P', '8', 'X') && bodyLen >= 10) {
        animFlag = (b(body) & 0x02) != 0
        canvasW = le24(body + 4) + 1
        canvasH = le24(body + 7) + 1
      } else if (tagIs('A', 'N', 'I', 'M') && bodyLen >= 6) {
        sawAnim = true
        // background color stored B,G,R,A
        bg = ((b(body + 3) & 0xFF) << 24) | ((b(body + 2) & 0xFF) << 16) |
          ((b(body + 1) & 0xFF) << 8) | (b(body) & 0xFF)
        loop = (b(body + 4) & 0xFF) | ((b(body + 5) & 0xFF) << 8)
      } else if (tagIs('A', 'N', 'M', 'F') && bodyLen >= 16) {
        val fx = le24(body) * 2
        val fy = le24(body + 3) * 2
        val fw = le24(body + 6) + 1
        val fh = le24(body + 9) + 1
        val dur = le24(body + 12)
        val fl = b(body + 15) & 0xFF
        frames += AnimFrame(fx, fy, fw, fh, dur,
          blend = (fl & 0x02) == 0,       // B=1 means "do not blend"
          disposeToBg = (fl & 0x01) != 0, // D=1: dispose to background
          dataOff = body + 16, dataLen = bodyLen - 16)
      }
      p += 8 + size + (size & 1)
    }
    if (!animFlag || !sawAnim || frames.isEmpty || canvasW <= 0 || canvasH <= 0)
      return null
    // demux-only guard: the format's own invariant (canvas area fits
    // 32 bits); the renderer applies its own allocation cap
    if (canvasW.toLong * canvasH > (1L << 32)) return null
    AnimMeta(canvasW, canvasH, bg, loop, frames.toArray)
  }

  /** Composite the canvas through frame `upTo` (inclusive): init to
    * the background color, then per frame decode its sub-bitstream
    * (any of the libwebp-gated codecs), place it at (x,y) with the
    * spec's blend-or-overwrite rule, and apply dispose-to-background
    * BEFORE the next frame. Returns 4-channel RGBA, or null. */
  def renderAnimFrame(b: Array[Byte], upTo: Int): PngImage = try {
    renderAnimFrame(decodeAnim0(b), b, upTo)
  } catch { case _: Exception => null }

  /** As above with a pre-parsed AnimMeta (avoids re-demuxing when the
    * caller already holds it). */
  def renderAnimFrame(meta: AnimMeta, b: Array[Byte], upTo: Int): PngImage = try {
    if (meta == null || upTo < 0 || upTo >= meta.frames.length) return null
    var out: PngImage = null
    compositeFrames(meta, b, upTo) { (k, img) =>
      if (k == upTo) out = img
    }
    out
  } catch { case _: Exception => null }

  /** All composited frames in one incremental pass (one decode per
    * frame, not the O(N^2) of calling renderAnimFrame per index).
    * Null on any failure. */
  def renderAnimFrames(b: Array[Byte]): Array[PngImage] = try {
    val meta = decodeAnim0(b)
    if (meta == null) return null
    val out = new Array[PngImage](meta.frames.length)
    if (!compositeFrames(meta, b, meta.frames.length - 1) { (k, img) =>
      out(k) = img
    }) return null
    out
  } catch { case _: Exception => null }

  /** Incremental compositor: yields the canvas AFTER each frame k
    * (a fresh copy), applying dispose before the next. False on
    * decode failure. */
  private def compositeFrames(meta: AnimMeta, b: Array[Byte], upTo: Int)
                             (emit: (Int, PngImage) => Unit): Boolean = {
    val w = meta.canvasW; val h = meta.canvasH
    if (w.toLong * h > (1L << 24)) return false // renderer allocation cap
    val canvas = new Array[Byte](w * h * 4)
    val bgB = Array[Byte](((meta.bgColor >>> 16) & 0xFF).toByte,
      ((meta.bgColor >>> 8) & 0xFF).toByte, (meta.bgColor & 0xFF).toByte,
      ((meta.bgColor >>> 24) & 0xFF).toByte)
    def fillBg(x0: Int, y0: Int, fw: Int, fh: Int): Unit = {
      var y = y0
      while (y < math.min(y0 + fh, h)) {
        var x = x0
        while (x < math.min(x0 + fw, w)) {
          val o = (y * w + x) * 4
          canvas(o) = bgB(0); canvas(o + 1) = bgB(1)
          canvas(o + 2) = bgB(2); canvas(o + 3) = bgB(3)
          x += 1
        }
        y += 1
      }
    }
    fillBg(0, 0, w, h)
    var k = 0
    while (k <= upTo) {
      val f = meta.frames(k)
      // rebuild a standalone container from the frame's sub-chunks so
      // the ordinary dispatch path decodes it
      val inner = java.util.Arrays.copyOfRange(b, f.dataOff, f.dataOff + f.dataLen)
      val riffLen = 4 + inner.length
      val bb = java.nio.ByteBuffer.allocate(8 + riffLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(riffLen); bb.put("WEBP".getBytes)
      bb.put(inner)
      val img = Multimodal.decodeImagePixels(bb.array())
      if (img == null || img.width != f.width || img.height != f.height)
        return false
      val ch = img.channels
      var fy = 0
      while (fy < f.height && f.y + fy < h) {
        var fx = 0
        while (fx < f.width && f.x + fx < w) {
          val s = (fy * f.width + fx) * ch
          val d = ((f.y + fy) * w + f.x + fx) * 4
          val sr = img.pixels(s) & 0xFF
          val sg = img.pixels(s + (if (ch >= 3) 1 else 0)) & 0xFF
          val sb = img.pixels(s + (if (ch >= 3) 2 else 0)) & 0xFF
          val sa = if (ch == 4) img.pixels(s + 3) & 0xFF else 255
          if (!f.blend || sa == 255) {
            canvas(d) = sr.toByte; canvas(d + 1) = sg.toByte
            canvas(d + 2) = sb.toByte; canvas(d + 3) = sa.toByte
          } else if (sa > 0) {
            // container-spec alpha blending, integer floors
            val da = canvas(d + 3) & 0xFF
            val oa = sa + da * (255 - sa) / 255
            def mix(sc: Int, dc: Int): Int =
              if (oa == 0) 0
              else (sc * sa + dc * da * (255 - sa) / 255) / oa
            canvas(d) = mix(sr, canvas(d) & 0xFF).toByte
            canvas(d + 1) = mix(sg, canvas(d + 1) & 0xFF).toByte
            canvas(d + 2) = mix(sb, canvas(d + 2) & 0xFF).toByte
            canvas(d + 3) = oa.toByte
          }
          fx += 1
        }
        fy += 1
      }
      emit(k, PngImage(w, h, 4, canvas.clone()))
      if (k < upTo && f.disposeToBg) fillBg(f.x, f.y, f.width, f.height)
      k += 1
    }
    true
  }

  /** Assemble an animated WebP from already-encoded frame containers
    * (encodeLossless / Vp8.encodeMinimal output): test/corpus-side
    * counterpart of decodeAnim, same spirit as the MP4 assembler.
    * bgColor ARGB; frame x/y must be even (stored /2 per spec). */
  def encodeAnim(canvasW: Int, canvasH: Int, bgColor: Int, loopCount: Int,
                 frames: Seq[(Int, Int, Array[Byte], Int, Boolean, Boolean)])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le24(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte)
    def chunk(tag: String, body: Array[Byte]): Unit = {
      out.write(tag.getBytes)
      out.write(Array[Byte]((body.length & 0xFF).toByte,
        ((body.length >> 8) & 0xFF).toByte, ((body.length >> 16) & 0xFF).toByte,
        ((body.length >> 24) & 0xFF).toByte))
      out.write(body)
      if ((body.length & 1) == 1) out.write(0)
    }
    val vp8x = new Array[Byte](10)
    vp8x(0) = 0x02 // animation flag
    System.arraycopy(le24(canvasW - 1), 0, vp8x, 4, 3)
    System.arraycopy(le24(canvasH - 1), 0, vp8x, 7, 3)
    chunk("VP8X", vp8x)
    chunk("ANIM", Array[Byte]((bgColor & 0xFF).toByte,
      ((bgColor >>> 8) & 0xFF).toByte, ((bgColor >>> 16) & 0xFF).toByte,
      ((bgColor >>> 24) & 0xFF).toByte,
      (loopCount & 0xFF).toByte, ((loopCount >> 8) & 0xFF).toByte))
    for ((x, y, enc, dur, blend, dispose) <- frames) {
      require(x % 2 == 0 && y % 2 == 0, "frame offsets must be even")
      val inner = java.util.Arrays.copyOfRange(enc, 12, enc.length) // strip RIFF hdr
      val meta = Multimodal.decodeImageMeta(enc)
      val body = new java.io.ByteArrayOutputStream()
      body.write(le24(x / 2)); body.write(le24(y / 2))
      body.write(le24(meta._1 - 1)); body.write(le24(meta._2 - 1))
      body.write(le24(dur))
      body.write((if (blend) 0 else 2) | (if (dispose) 1 else 0))
      body.write(inner)
      chunk("ANMF", body.toByteArray)
    }
    val payload = out.toByteArray
    val bb = java.nio.ByteBuffer.allocate(12 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(4 + payload.length)
    bb.put("WEBP".getBytes); bb.put(payload)
    bb.array()
  }
}
