package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** WKB reader/writer.
  *
  * Semantics mirror the reference parser (geom/wkb_parser.go:14-258):
  * both endiannesses, ISO geometry codes (base + 1000*ctype), tolerant
  * of EWKB Z/M/SRID flag bits, empty point encoded as (NaN,NaN)
  * (wkb_parser.go:213-216). Writer emits little-endian ISO WKB like the
  * reference's AppendWKB (geom/wkb_marshal.go).
  */
object Wkb {

  final class ParseException(msg: String) extends RuntimeException(msg)

  private val EwkbZ = 0x80000000
  private val EwkbM = 0x40000000
  private val EwkbSrid = 0x20000000

  def read(bytes: Array[Byte]): Geom = {
    val buf = ByteBuffer.wrap(bytes)
    val g = readGeom(buf)
    g
  }

  private def readGeom(buf: ByteBuffer): Geom = {
    if (buf.remaining() < 5) throw new ParseException("truncated WKB header")
    val bo = buf.get()
    buf.order(bo match {
      case 0 => ByteOrder.BIG_ENDIAN
      case 1 => ByteOrder.LITTLE_ENDIAN
      case other => throw new ParseException(s"invalid byte order marker $other")
    })
    var code = buf.getInt()
    var ct = CT.XY
    // EWKB flag bits (PostGIS dialect), tolerated like the reference.
    if ((code & EwkbSrid) != 0) { code &= ~EwkbSrid; buf.getInt() /* discard SRID */ }
    val hasZ = (code & EwkbZ) != 0
    val hasM = (code & EwkbM) != 0
    code &= ~(EwkbZ | EwkbM)
    if (hasZ || hasM) {
      ct = (if (hasZ) 1 else 0) | (if (hasM) 2 else 0)
    } else {
      // ISO: code = base + 1000 * ctype (geom/wkb_parser.go:102-142)
      ct = code / 1000 match {
        case 0 => CT.XY
        case 1 => CT.XYZ
        case 2 => CT.XYM
        case 3 => CT.XYZM
        case other => throw new ParseException(s"invalid wkb type prefix $other")
      }
      code = code % 1000
    }
    val stride = CT.stride(ct)

    def readCount(): Int = {
      val n = buf.getInt()
      if (n < 0) throw new ParseException("negative count")
      // OOM guard against hostile counts (geom/wkb_parser.go:229-233):
      // each element needs at least 1 byte remaining.
      if (n > buf.remaining()) throw new ParseException("count exceeds remaining bytes")
      n
    }

    def readCoords(n: Int): Array[Double] = {
      // Long arithmetic: n can be up to buf.remaining() (~2^31) for
      // hostile inputs, so an Int multiply would overflow negative and
      // slip past this guard into a NegativeArraySizeException/OOM.
      val need = n.toLong * stride * 8
      if (buf.remaining() < need) throw new ParseException("truncated coordinates")
      val out = new Array[Double](n * stride)
      var i = 0
      while (i < out.length) { out(i) = buf.getDouble(); i += 1 }
      out
    }

    def readRing(): Seqn = new Seqn(readCoords(readCount()), ct)

    code match {
      case 1 =>
        val c = readCoords(1)
        // empty point = all-NaN coords (geom/wkb_parser.go:213-216)
        if (java.lang.Double.isNaN(c(0)) && java.lang.Double.isNaN(c(1)))
          GPoint(Array.emptyDoubleArray, ct)
        else GPoint(c, ct)
      case 2 => GLine(readRing())
      case 3 =>
        val nr = readCount()
        val rs = new Array[Seqn](nr)
        var i = 0
        while (i < nr) { rs(i) = readRing(); i += 1 }
        GPoly(rs, ct)
      case 4 =>
        val n = readCount()
        val pts = new Array[GPoint](n)
        var i = 0
        while (i < n) {
          pts(i) = readGeom(buf) match {
            case p: GPoint => p
            case other => throw new ParseException(s"expected Point in MultiPoint, got ${other.typeName}")
          }
          i += 1
        }
        GMPoint(pts, ct)
      case 5 =>
        val n = readCount()
        val ls = new Array[Seqn](n)
        var i = 0
        while (i < n) {
          ls(i) = readGeom(buf) match {
            case GLine(s) => s
            case other => throw new ParseException(s"expected LineString in MultiLineString, got ${other.typeName}")
          }
          i += 1
        }
        GMLine(ls, ct)
      case 6 =>
        val n = readCount()
        val ps = new Array[Array[Seqn]](n)
        var i = 0
        while (i < n) {
          ps(i) = readGeom(buf) match {
            case GPoly(rs, _) => rs
            case other => throw new ParseException(s"expected Polygon in MultiPolygon, got ${other.typeName}")
          }
          i += 1
        }
        GMPoly(ps, ct)
      case 7 =>
        val n = readCount()
        val gs = new Array[Geom](n)
        var i = 0
        while (i < n) { gs(i) = readGeom(buf); i += 1 }
        GColl(gs, ct)
      case other => throw new ParseException(s"invalid geometry type code $other")
    }
  }

  // ---------------------------------------------------------------- writer

  def write(g: Geom): Array[Byte] = {
    val size = sizeOf(g)
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    writeGeom(buf, g)
    buf.array()
  }

  private def sizeOf(g: Geom): Int = g match {
    case p: GPoint  => 5 + CT.stride(p.ct) * 8
    case GLine(s)   => 9 + s.floats.length * 8
    case GPoly(rs, _) => 9 + rs.map(r => 4 + r.floats.length * 8).sum
    case GMPoint(pts, _) => 9 + pts.map(sizeOf).sum
    case GMLine(ls, ct)  => 9 + ls.map(s => 9 + s.floats.length * 8).sum
    case GMPoly(ps, ct)  => 9 + ps.map(rs => 9 + rs.map(r => 4 + r.floats.length * 8).sum).sum
    case GColl(gs, _)    => 9 + gs.map(sizeOf).sum
  }

  private def codeOf(g: Geom): Int = g.typeCode + 1000 * g.ct

  private def writeSeq(buf: ByteBuffer, s: Seqn): Unit = {
    buf.putInt(s.n)
    var i = 0
    while (i < s.floats.length) { buf.putDouble(s.floats(i)); i += 1 }
  }

  private def writeGeom(buf: ByteBuffer, g: Geom): Unit = {
    buf.put(1.toByte) // little endian
    buf.putInt(codeOf(g))
    g match {
      case p @ GPoint(c, ct) =>
        if (p.isEmpty) {
          var i = 0
          while (i < CT.stride(ct)) { buf.putDouble(Double.NaN); i += 1 }
        } else {
          var i = 0
          while (i < c.length) { buf.putDouble(c(i)); i += 1 }
        }
      case GLine(s) => writeSeq(buf, s)
      case GPoly(rs, _) =>
        buf.putInt(rs.length)
        rs.foreach(writeSeq(buf, _))
      case GMPoint(pts, _) =>
        buf.putInt(pts.length)
        pts.foreach(writeGeom(buf, _))
      case GMLine(ls, ct) =>
        buf.putInt(ls.length)
        ls.foreach { s => buf.put(1.toByte); buf.putInt(2 + 1000 * ct); writeSeq(buf, s) }
      case GMPoly(ps, ct) =>
        buf.putInt(ps.length)
        ps.foreach { rs =>
          buf.put(1.toByte); buf.putInt(3 + 1000 * ct)
          buf.putInt(rs.length)
          rs.foreach(writeSeq(buf, _))
        }
      case GColl(gs, _) =>
        buf.putInt(gs.length)
        gs.foreach(writeGeom(buf, _))
    }
  }
}
