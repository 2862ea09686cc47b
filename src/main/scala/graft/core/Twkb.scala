package graft.core

import scala.collection.mutable.ArrayBuffer

/** TWKB codec (Tiny WKB: zigzag-varint delta-encoded, quantized).
  *
  * Follows the public TWKB spec as implemented by the reference
  * (geom/twkb_parser.go:17-82, geom/twkb_write.go:17-100): precision
  * -8..+7 zigzag-encoded in the type byte, optional bbox / size /
  * idlist headers, per-dimension running delta encoding, rings stored
  * without the duplicate closing point. Z/M are carried via the
  * extended-precision byte (bit0=Z, bit1=M, bits2-4=precZ,
  * bits5-7=precM — twkb_write.go:498-508) with their own scales and
  * running deltas; the bbox header covers every dimension; empties
  * write ONLY the isEmpty bit (no ext/size/bbox/ids even when
  * requested — twkb_write.go:461-467); collection children inherit
  * dims/precisions and the size header but never bbox/ids
  * (twkb_write.go:193-205).
  */
object Twkb {

  final class ParseException(msg: String) extends RuntimeException(msg)

  // ------------------------------------------------------------ varint

  private def writeUnsigned(buf: ArrayBuffer[Byte], v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) {
      buf += ((v & 0x7F) | 0x80).toByte
      v >>>= 7
    }
    buf += (v & 0x7F).toByte
  }

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private def writeSigned(buf: ArrayBuffer[Byte], v: Long): Unit =
    writeUnsigned(buf, zigzag(v))

  private final class Reader(bytes: Array[Byte]) {
    var pos = 0
    def byte(): Int = {
      if (pos >= bytes.length) throw new ParseException("truncated header")
      val b = bytes(pos) & 0xFF; pos += 1; b
    }
    def unsigned(): Long = {
      var shift = 0
      var out = 0L
      var more = true
      while (more) {
        if (pos >= bytes.length) throw new ParseException("truncated varint")
        val b = bytes(pos); pos += 1
        out |= (b & 0x7FL) << shift
        shift += 7
        more = (b & 0x80) != 0
        if (shift > 63) throw new ParseException("varint too long")
      }
      out
    }
    def signed(): Long = unzigzag(unsigned())
    /** Element count validated against remaining input: each element
      * consumes at least `minBytesPerItem` bytes, so a count exceeding
      * remaining/min is corrupt — reject BEFORE any allocation sized
      * by it (hostile input could otherwise demand a multi-GB array).
      */
    def boundedCount(minBytesPerItem: Int): Int = {
      val n = unsigned()
      val remaining = (bytes.length - pos).toLong
      if (n < 0 || n > remaining / math.max(1, minBytesPerItem))
        throw new ParseException(
          s"TWKB element count $n exceeds remaining input ($remaining bytes)")
      n.toInt
    }
  }

  // ------------------------------------------------------------- write

  /** Marshal with XY precision (-8..7 decimal digits). Options mirror
    * the reference's (twkb_write.go:17-52): include bbox and/or size
    * headers; Z/M precisions default to precXY clamped into the 0..7
    * the ext byte can carry (callers can override).
    */
  def write(g: Geom, precXY: Int, withBBox: Boolean = false,
            withSize: Boolean = false, ids: Array[Long] = null,
            precZIn: Int = Int.MinValue, precMIn: Int = Int.MinValue): Array[Byte] = {
    require(precXY >= -8 && precXY <= 7, "twkb precision must be in [-8, 7]")
    val scale = math.pow(10, precXY)
    // force collection children to the root's coordinate type so the
    // whole TWKB is dimensionally uniform (reference copytwkbWriter
    // assumes child dims == parent dims)
    val g2 = Geom.forceCT(g, g.ct)
    val hasZ = CT.hasZ(g2.ct)
    val hasM = CT.hasM(g2.ct)
    val precZ = if (!hasZ) 0 else if (precZIn == Int.MinValue) math.max(0, math.min(7, precXY)) else precZIn
    val precM = if (!hasM) 0 else if (precMIn == Int.MinValue) math.max(0, math.min(7, precXY)) else precMIn
    require(precZ >= 0 && precZ <= 7, "twkb Z precision must be in [0, 7]")
    require(precM >= 0 && precM <= 7, "twkb M precision must be in [0, 7]")
    val scaleZ = math.pow(10, precZ)
    val scaleM = math.pow(10, precM)
    if (ids != null) {
      require(g2.typeCode >= 4 && g2.typeCode <= 7,
        "TWKB ID lists require a Multi/Collection type (twkb spec)")
      val nItems = g2 match {
        case GMPoint(ps, _) => ps.count(!_.isEmpty)
        case GMLine(ls, _) => ls.length
        case GMPoly(ps, _) => ps.length
        case GColl(gs, _) => gs.length
        case _ => 0
      }
      require(ids.length == nItems, s"ids.length=${ids.length} != items=$nItems")
    }

    val body = new ArrayBuffer[Byte]()
    var lastX = 0L; var lastY = 0L; var lastZ = 0L; var lastM = 0L
    def q(v: Double): Long = math.round(v * scale)
    def qZ(v: Double): Long = math.round(v * scaleZ)
    def qM(v: Double): Long = math.round(v * scaleM)
    // the optional ID list sits between the top-level item count and
    // the items (twkb spec; reference twkb_parser.go:43-54) — consumed
    // exactly once by the outermost multi/collection count
    var pendingIds: Array[Long] = ids
    def writeIdsIfPending(): Unit = if (pendingIds != null) {
      pendingIds.foreach(writeSigned(body, _))
      pendingIds = null
    }

    // per-point ordinates in TWKB order x,y[,z][,m] with per-dimension
    // running deltas and scales (reference twkb_write.go:518-560)
    def writePtOrds(s: Seqn, i: Int): Unit = {
      val qx = q(s.x(i)); val qy = q(s.y(i))
      writeSigned(body, qx - lastX); writeSigned(body, qy - lastY)
      lastX = qx; lastY = qy
      val sct = s.ct
      if (CT.hasZ(sct)) {
        val qz = qZ(s.ord(i, 2))
        writeSigned(body, qz - lastZ); lastZ = qz
      }
      if (CT.hasM(sct)) {
        val qm = qM(s.ord(i, if (CT.hasZ(sct)) 3 else 2))
        writeSigned(body, qm - lastM); lastM = qm
      }
    }

    def writeSeqPts(s0: Seqn, dropClosing: Boolean): Unit = {
      val s = s0.forceCT(g2.ct) // uniform dims across the whole TWKB
      val n = if (dropClosing && s.n > 1 &&
        s.x(0) == s.x(s.n - 1) && s.y(0) == s.y(s.n - 1)) s.n - 1 else s.n
      writeUnsigned(body, n.toLong)
      var i = 0
      while (i < n) { writePtOrds(s, i); i += 1 }
    }

    def writeBody(g: Geom): Unit = g match {
      case p: GPoint =>
        writePtOrds(new Seqn(p.coords, p.ct).forceCT(g2.ct), 0)
      case GLine(s) => writeSeqPts(s, dropClosing = false)
      case GPoly(rs, _) =>
        writeUnsigned(body, rs.length.toLong)
        rs.foreach(writeSeqPts(_, dropClosing = true))
      case GMPoint(pts, _) =>
        val full = pts.filter(!_.isEmpty)
        writeUnsigned(body, full.length.toLong)
        writeIdsIfPending()
        full.foreach(writeBody)
      case GMLine(ls, _) =>
        writeUnsigned(body, ls.length.toLong)
        writeIdsIfPending()
        ls.foreach(writeSeqPts(_, dropClosing = false))
      case GMPoly(ps, _) =>
        writeUnsigned(body, ps.length.toLong)
        writeIdsIfPending()
        ps.foreach { rs =>
          writeUnsigned(body, rs.length.toLong)
          rs.foreach(writeSeqPts(_, dropClosing = true))
        }
      case GColl(gs, _) =>
        writeUnsigned(body, gs.length.toLong)
        writeIdsIfPending()
        gs.foreach { child =>
          // children inherit dims/precisions and the size header, never
          // bbox/ids (reference copytwkbWriter, twkb_write.go:193-205)
          val sub = write(Geom.forceCT(child, g2.ct), precXY,
            withBBox = false, withSize = withSize, ids = null,
            precZIn = precZ, precMIn = precM)
          body ++= sub
        }
    }

    val isEmpty = g2.isEmpty
    if (!isEmpty) writeBody(g2)

    val out = new ArrayBuffer[Byte]()
    out += ((g2.typeCode & 0x0F) | ((zigzag(precXY.toLong) & 0x0F) << 4).toInt).toByte
    if (isEmpty) {
      // empties carry ONLY the isEmpty bit — no ext/size/bbox/ids even
      // when requested (reference twkb_write.go:461-467)
      out += 0x10.toByte
      return out.toArray
    }
    val hasExt = hasZ || hasM
    var meta = 0
    if (withBBox) meta |= 0x01
    if (withSize) meta |= 0x02
    if (ids != null) meta |= 0x04
    if (hasExt) meta |= 0x08
    out += meta.toByte
    if (hasExt) {
      var ext = 0
      if (hasZ) ext |= 0x01 | (precZ << 2)
      if (hasM) ext |= 0x02 | (precM << 5)
      out += ext.toByte
    }

    val tail = new ArrayBuffer[Byte]()
    if (withBBox) {
      // per-dimension (min, delta) across ALL dims incl. Z/M
      // (reference twkb_write.go writeBBoxHeader)
      val e = g2.envelope
      val qx0 = math.round(e.xmin * scale); val qx1 = math.round(e.xmax * scale)
      val qy0 = math.round(e.ymin * scale); val qy1 = math.round(e.ymax * scale)
      writeSigned(tail, qx0); writeSigned(tail, qx1 - qx0)
      writeSigned(tail, qy0); writeSigned(tail, qy1 - qy0)
      if (hasZ) {
        val (z0, z1) = Geom.ordRange(g2, 2)
        val qz0 = math.round(z0 * scaleZ); val qz1 = math.round(z1 * scaleZ)
        writeSigned(tail, qz0); writeSigned(tail, qz1 - qz0)
      }
      if (hasM) {
        val mj = if (hasZ) 3 else 2
        val (m0, m1) = Geom.ordRange(g2, mj)
        val qm0 = math.round(m0 * scaleM); val qm1 = math.round(m1 * scaleM)
        writeSigned(tail, qm0); writeSigned(tail, qm1 - qm0)
      }
    }
    tail ++= body
    if (withSize) writeUnsigned(out, tail.length.toLong)
    out ++= tail
    out.toArray
  }

  // -------------------------------------------------------------- read

  def read(bytes: Array[Byte]): Geom = {
    val r = new Reader(bytes)
    readGeom(r)
  }

  private def readGeom(r: Reader): Geom = {
    val typePrec = r.byte()
    val typ = typePrec & 0x0F
    val prec = unzigzag((typePrec >> 4) & 0x0FL).toInt
    val scale = math.pow(10, prec)
    val metaHdr = r.byte()
    val hasBBox = (metaHdr & 0x01) != 0
    val hasSize = (metaHdr & 0x02) != 0
    val hasIds = (metaHdr & 0x04) != 0
    val hasExt = (metaHdr & 0x08) != 0
    val isEmpty = (metaHdr & 0x10) != 0
    var hasZ = false; var hasM = false
    var scaleZ = 1.0; var scaleM = 1.0
    if (hasExt) {
      val ext = r.byte()
      hasZ = (ext & 0x01) != 0
      hasM = (ext & 0x02) != 0
      scaleZ = math.pow(10, (ext >> 2) & 0x07)
      scaleM = math.pow(10, (ext >> 5) & 0x07)
    }
    val ct = (if (hasZ) 1 else 0) | (if (hasM) 2 else 0)
    val stride = CT.stride(ct)
    if (hasSize) r.unsigned() // remaining byte length (unused here)
    if (hasBBox) {
      var d = 0
      while (d < stride) { r.signed(); r.signed(); d += 1 }
    }

    var lastX = 0L; var lastY = 0L; var lastZ = 0L; var lastM = 0L
    def readPt(out: ArrayBuffer[Double]): Unit = {
      lastX += r.signed(); lastY += r.signed()
      out += lastX / scale; out += lastY / scale
      if (hasZ) { lastZ += r.signed(); out += lastZ / scaleZ }
      if (hasM) { lastM += r.signed(); out += lastM / scaleM }
    }
    def readSeq(closeRing: Boolean): Seqn = {
      val n = r.boundedCount(stride) // >= 1 varint byte per ordinate
      val out = new ArrayBuffer[Double](stride * (n + 1))
      var i = 0
      while (i < n) { readPt(out); i += 1 }
      if (closeRing && n > 0) {
        val first = out.take(stride)
        val last = out.takeRight(stride)
        if (first != last) out ++= first
      }
      new Seqn(out.toArray, ct)
    }
    def readPoint(): GPoint = {
      val out = new ArrayBuffer[Double](stride)
      readPt(out)
      GPoint(out.toArray, ct)
    }

    typ match {
      case 1 =>
        if (isEmpty) GPoint(Array.emptyDoubleArray, ct) else readPoint()
      case 2 =>
        if (isEmpty) GLine(new Seqn(Array.emptyDoubleArray, ct))
        else GLine(readSeq(closeRing = false))
      case 3 =>
        if (isEmpty) GPoly(Array.empty, ct)
        else {
          val nr = r.boundedCount(1)
          GPoly(Array.fill(nr)(readSeq(closeRing = true)), ct)
        }
      case 4 =>
        if (isEmpty) GMPoint(Array.empty, ct)
        else {
          val n = r.boundedCount(1)
          if (hasIds) (0 until n).foreach(_ => r.signed())
          GMPoint(Array.fill(n)(readPoint()), ct)
        }
      case 5 =>
        if (isEmpty) GMLine(Array.empty, ct)
        else {
          val n = r.boundedCount(1)
          if (hasIds) (0 until n).foreach(_ => r.signed())
          GMLine(Array.fill(n)(readSeq(closeRing = false)), ct)
        }
      case 6 =>
        if (isEmpty) GMPoly(Array.empty, ct)
        else {
          val n = r.boundedCount(1)
          if (hasIds) (0 until n).foreach(_ => r.signed())
          GMPoly(Array.fill(n) {
            val nr = r.boundedCount(1)
            Array.fill(nr)(readSeq(closeRing = true))
          }, ct)
        }
      case 7 =>
        if (isEmpty) GColl(Array.empty, ct)
        else {
          val n = r.boundedCount(1)
          if (hasIds) (0 until n).foreach(_ => r.signed())
          val children = Array.fill[Geom](n)(readGeom(r))
          val cct = children.map(_.ct).reduceOption { (a, b) =>
            (if (CT.hasZ(a) && CT.hasZ(b)) 1 else 0) |
              (if (CT.hasM(a) && CT.hasM(b)) 2 else 0)
          }.getOrElse(CT.XY)
          GColl(children, cct)
        }
      case other => throw new ParseException(s"invalid twkb type $other")
    }
  }

  /** Header-only envelope scan: when a bbox header is present, decode
    * just it without touching the body — the cheap pre-filter for
    * petabyte scans (reference: geom/twkb_parser.go:34 UnmarshalTWKBEnvelope).
    */
  def readEnvelope(bytes: Array[Byte]): Option[Env] = {
    val r = new Reader(bytes)
    val typePrec = r.byte()
    val prec = unzigzag((typePrec >> 4) & 0x0FL).toInt
    val scale = math.pow(10, prec)
    val metaHdr = r.byte()
    if ((metaHdr & 0x10) != 0) return Some(Env.empty)
    if ((metaHdr & 0x01) == 0) return None
    var zCount = 0
    if ((metaHdr & 0x08) != 0) {
      val ext = r.byte()
      zCount = (if ((ext & 0x01) != 0) 1 else 0) + (if ((ext & 0x02) != 0) 1 else 0)
    }
    if ((metaHdr & 0x02) != 0) r.unsigned()
    val x0 = r.signed(); val dx = r.signed()
    val y0 = r.signed(); val dy = r.signed()
    Some(Env(x0 / scale, y0 / scale, (x0 + dx) / scale, (y0 + dy) / scale))
  }

  /** Shared header walk for the partial readers: consumes type, meta,
    * ext, size, bbox; returns (hasIds, hasSize, totalSizeFromStart).
    */
  private def skipHeaders(r: Reader): (Boolean, Boolean, Long) = {
    r.byte() // type + precision
    val metaHdr = r.byte()
    var zCount = 0
    if ((metaHdr & 0x08) != 0) {
      val ext = r.byte()
      zCount = (if ((ext & 0x01) != 0) 1 else 0) + (if ((ext & 0x02) != 0) 1 else 0)
    }
    var total = -1L
    if ((metaHdr & 0x02) != 0) {
      val rest = r.unsigned()
      total = r.pos + rest // size counts the bytes AFTER the size varint
    }
    if ((metaHdr & 0x01) != 0) {
      var d = 0
      while (d < 2 + zCount) { r.signed(); r.signed(); d += 1 }
    }
    ((metaHdr & 0x04) != 0, (metaHdr & 0x02) != 0, total)
  }

  /** Parse just the optional ID list without decoding coordinates
    * (reference: geom/twkb_parser.go:30-55 UnmarshalTWKBIDList). The
    * list sits between the top-level item count and the items; None if
    * the TWKB carries no ID list.
    */
  def readIdList(bytes: Array[Byte]): Option[Array[Long]] = {
    val r = new Reader(bytes)
    val (hasIds, _, _) = skipHeaders(r)
    if (!hasIds) return None
    val n = r.unsigned().toInt
    // hostile-input guard (same class as Wkb.readCoords): each id varint
    // is at least 1 byte, so a count beyond the remaining bytes — or a
    // negative one from a truncated-to-int varint — cannot be honest
    if (n < 0 || n > bytes.length - r.pos)
      throw new ParseException(s"TWKB id list count $n exceeds remaining bytes")
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = r.signed(); i += 1 }
    Some(out)
  }

  /** Parse just the size header: total TWKB byte length from its
    * start, for scanning concatenated TWKBs or distributing full
    * parses (reference: geom/twkb_parser.go:76-91 UnmarshalTWKBSize).
    * None if the TWKB carries no size header.
    */
  def readSize(bytes: Array[Byte]): Option[Long] = {
    val r = new Reader(bytes)
    val (_, hasSize, total) = skipHeaders(r)
    if (hasSize) Some(total) else None
  }
}
