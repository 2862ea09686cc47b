package graft.core

/** WKT lexer/parser/writer.
  *
  * Semantics mirror the reference's recursive-descent parser
  * (reference: geom/wkt_parser.go:21-122, geom/wkt_lexer.go) including
  * the PostGIS-compatible parenless MULTIPOINT extension
  * (wkt_parser.go:355-387) and Z/M/ZM dimension tags. Implementation
  * is original Scala.
  */
object Wkt {

  final class ParseException(msg: String) extends RuntimeException(msg)

  def parse(wkt: String): Geom = {
    val p = new Parser(wkt)
    val g = p.geometry()
    p.expectEOF()
    g
  }

  private final class Parser(s: String) {
    private var pos = 0

    private def skipWs(): Unit =
      while (pos < s.length && Character.isWhitespace(s.charAt(pos))) pos += 1

    private def err(msg: String): Nothing =
      throw new ParseException(s"wkt parse error at $pos: $msg")

    private def peekWord(): String = {
      skipWs()
      val start = pos
      var i = pos
      while (i < s.length && (Character.isLetter(s.charAt(i)))) i += 1
      s.substring(start, i).toUpperCase
    }

    private def takeWord(): String = {
      skipWs()
      val start = pos
      while (pos < s.length && Character.isLetter(s.charAt(pos))) pos += 1
      if (pos == start) err("expected word")
      s.substring(start, pos).toUpperCase
    }

    private def tryChar(c: Char): Boolean = {
      skipWs()
      if (pos < s.length && s.charAt(pos) == c) { pos += 1; true } else false
    }

    private def expectChar(c: Char): Unit =
      if (!tryChar(c)) err(s"expected '$c'")

    private def number(): Double = {
      skipWs()
      val start = pos
      if (pos < s.length && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      var seen = false
      while (pos < s.length && (Character.isDigit(s.charAt(pos)) || s.charAt(pos) == '.')) {
        pos += 1; seen = true
      }
      if (pos < s.length && (s.charAt(pos) == 'e' || s.charAt(pos) == 'E')) {
        pos += 1
        if (pos < s.length && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
        while (pos < s.length && Character.isDigit(s.charAt(pos))) pos += 1
      }
      if (!seen) err("expected number")
      try java.lang.Double.parseDouble(s.substring(start, pos))
      catch { case _: NumberFormatException => err("bad number") }
    }

    def expectEOF(): Unit = {
      skipWs()
      if (pos != s.length) err(s"unexpected trailing input '${s.substring(pos)}'")
    }

    /** Optional Z / M / ZM tag after the geometry keyword
      * (reference: geom/wkt_parser.go:57-122).
      */
    private def ctype(): Int = peekWord() match {
      case "ZM" => takeWord(); CT.XYZM
      case "Z"  => takeWord(); CT.XYZ
      case "M"  => takeWord(); CT.XYM
      case _    => CT.XY
    }

    private def isEmptyTag(): Boolean =
      if (peekWord() == "EMPTY") { takeWord(); true } else false

    private def point(ct: Int): Array[Double] = {
      val st = CT.stride(ct)
      val out = new Array[Double](st)
      var i = 0
      while (i < st) { out(i) = number(); i += 1 }
      out
    }

    private def seq(ct: Int): Seqn = {
      expectChar('(')
      val buf = new scala.collection.mutable.ArrayBuilder.ofDouble
      buf ++= point(ct)
      while (tryChar(',')) buf ++= point(ct)
      expectChar(')')
      new Seqn(buf.result(), ct)
    }

    def geometry(): Geom = {
      val tag = takeWord()
      val ct = ctype()
      tag match {
        case "POINT" =>
          if (isEmptyTag()) GPoint(Array.emptyDoubleArray, ct)
          else { expectChar('('); val c = point(ct); expectChar(')'); GPoint(c, ct) }
        case "LINESTRING" =>
          if (isEmptyTag()) GLine(new Seqn(Array.emptyDoubleArray, ct))
          else GLine(seq(ct))
        case "POLYGON" =>
          if (isEmptyTag()) GPoly(Array.empty, ct) else GPoly(rings(ct), ct)
        case "MULTIPOINT" =>
          if (isEmptyTag()) GMPoint(Array.empty, ct)
          else {
            expectChar('(')
            val pts = scala.collection.mutable.ArrayBuffer.empty[GPoint]
            pts += multiPointElem(ct)
            while (tryChar(',')) pts += multiPointElem(ct)
            expectChar(')')
            GMPoint(pts.toArray, ct)
          }
        case "MULTILINESTRING" =>
          if (isEmptyTag()) GMLine(Array.empty, ct)
          else {
            expectChar('(')
            val ls = scala.collection.mutable.ArrayBuffer.empty[Seqn]
            ls += lineElem(ct)
            while (tryChar(',')) ls += lineElem(ct)
            expectChar(')')
            GMLine(ls.toArray, ct)
          }
        case "MULTIPOLYGON" =>
          if (isEmptyTag()) GMPoly(Array.empty, ct)
          else {
            expectChar('(')
            val ps = scala.collection.mutable.ArrayBuffer.empty[Array[Seqn]]
            ps += polyElem(ct)
            while (tryChar(',')) ps += polyElem(ct)
            expectChar(')')
            GMPoly(ps.toArray, ct)
          }
        case "GEOMETRYCOLLECTION" =>
          if (isEmptyTag()) GColl(Array.empty, ct)
          else {
            expectChar('(')
            val gs = scala.collection.mutable.ArrayBuffer.empty[Geom]
            gs += geometry()
            while (tryChar(',')) gs += geometry()
            expectChar(')')
            GColl(gs.toArray, ct)
          }
        case other => err(s"unknown geometry tag '$other'")
      }
    }

    private def rings(ct: Int): Array[Seqn] = {
      expectChar('(')
      val rs = scala.collection.mutable.ArrayBuffer.empty[Seqn]
      rs += seq(ct)
      while (tryChar(',')) rs += seq(ct)
      expectChar(')')
      rs.toArray
    }

    /** MULTIPOINT elements: `(1 2)`, bare `1 2` (PostGIS extension,
      * reference wkt_parser.go:355-387), or EMPTY.
      */
    private def multiPointElem(ct: Int): GPoint = {
      if (peekWord() == "EMPTY") { takeWord(); return GPoint(Array.emptyDoubleArray, ct) }
      if (tryChar('(')) {
        val c = point(ct); expectChar(')'); GPoint(c, ct)
      } else GPoint(point(ct), ct)
    }

    private def lineElem(ct: Int): Seqn =
      if (peekWord() == "EMPTY") { takeWord(); new Seqn(Array.emptyDoubleArray, ct) }
      else seq(ct)

    private def polyElem(ct: Int): Array[Seqn] =
      if (peekWord() == "EMPTY") { takeWord(); Array.empty }
      else rings(ct)
  }

  // ---------------------------------------------------------------- writer

  /** Format a double exactly like Go's `strconv.AppendFloat(f,'f',-1,64)`
    * (reference: geom/float_helpers.go:9-11): shortest round-trip digits,
    * plain decimal notation, no exponent, integral values without ".0".
    * Java's Double.toString computes the same shortest digit string
    * (both are Ryu-style); we expand its scientific notation to plain
    * decimal.
    */
  def fmt(d: Double): String = {
    if (d.isNaN) return "NaN"
    if (d.isInfinite) return if (d > 0) "+Inf" else "-Inf"
    val s = java.lang.Double.toString(d)
    val neg = s.startsWith("-")
    val body = if (neg) s.substring(1) else s
    val e = body.indexOf('E')
    val sb = new java.lang.StringBuilder
    if (neg && d != 0.0) sb.append('-')
    if (e < 0) {
      // forms like "1.0", "0.1", "123.456"
      var t = body
      if (t.endsWith(".0")) t = t.substring(0, t.length - 2)
      if (t == "0" || t == "-0") return "0"
      sb.append(t)
    } else {
      val mant = body.substring(0, e)
      val exp = Integer.parseInt(body.substring(e + 1))
      val dot = mant.indexOf('.')
      var digits = (mant.substring(0, dot) + mant.substring(dot + 1))
      // strip trailing zeros of the digit string (Java prints "1.0E10")
      var end = digits.length
      while (end > 1 && digits.charAt(end - 1) == '0') end -= 1
      digits = digits.substring(0, end)
      val pointPos = dot + exp // digits before the decimal point
      if (pointPos <= 0) {
        sb.append("0.")
        var i = 0
        while (i < -pointPos) { sb.append('0'); i += 1 }
        sb.append(digits)
      } else if (pointPos >= digits.length) {
        sb.append(digits)
        var i = digits.length
        while (i < pointPos) { sb.append('0'); i += 1 }
      } else {
        sb.append(digits, 0, pointPos).append('.').append(digits, pointPos, digits.length)
      }
    }
    sb.toString
  }

  def write(g: Geom): String = {
    val sb = new java.lang.StringBuilder
    append(sb, g)
    sb.toString
  }

  /** Header exactly as the reference writes it: tag plus one of
    * "", " Z ", " M ", " ZM " (reference: geom/wkt_write.go:3-7).
    */
  private def header(sb: java.lang.StringBuilder, tag: String, ct: Int): Unit = {
    sb.append(tag)
    ct match {
      case CT.XYZ  => sb.append(" Z ")
      case CT.XYM  => sb.append(" M ")
      case CT.XYZM => sb.append(" ZM ")
      case _       =>
    }
  }

  /** EMPTY with the reference's space rule (geom/wkt_write.go:30-38). */
  private def appendEmpty(sb: java.lang.StringBuilder): Unit = {
    if (sb.length > 0) {
      val last = sb.charAt(sb.length - 1)
      if (last != '(' && last != ',' && last != ' ') sb.append(' ')
    }
    sb.append("EMPTY")
  }

  private def appendSeq(sb: java.lang.StringBuilder, s: Seqn): Unit = {
    sb.append('(')
    var i = 0
    while (i < s.n) {
      if (i > 0) sb.append(',')
      var j = 0
      while (j < s.stride) {
        if (j > 0) sb.append(' ')
        sb.append(fmt(s.ord(i, j)))
        j += 1
      }
      i += 1
    }
    sb.append(')')
  }

  private def appendRings(sb: java.lang.StringBuilder, rs: Array[Seqn]): Unit = {
    sb.append('(')
    var i = 0
    while (i < rs.length) {
      if (i > 0) sb.append(',')
      appendSeq(sb, rs(i))
      i += 1
    }
    sb.append(')')
  }

  def append(sb: java.lang.StringBuilder, g: Geom): Unit = g match {
    case p @ GPoint(c, ct) =>
      header(sb, "POINT", ct)
      if (p.isEmpty) appendEmpty(sb)
      else appendSeq(sb, new Seqn(c, ct))
    case GLine(s) =>
      header(sb, "LINESTRING", s.ct)
      if (s.isEmpty) appendEmpty(sb) else appendSeq(sb, s)
    case GPoly(rs, ct) =>
      header(sb, "POLYGON", ct)
      if (rs.isEmpty) appendEmpty(sb) else appendRings(sb, rs)
    case GMPoint(pts, ct) =>
      header(sb, "MULTIPOINT", ct)
      if (pts.isEmpty) appendEmpty(sb)
      else {
        sb.append('(')
        var i = 0
        while (i < pts.length) {
          if (i > 0) sb.append(',')
          if (pts(i).isEmpty) appendEmpty(sb)
          else appendSeq(sb, new Seqn(pts(i).coords, pts(i).ct))
          i += 1
        }
        sb.append(')')
      }
    case GMLine(ls, ct) =>
      header(sb, "MULTILINESTRING", ct)
      if (ls.isEmpty) appendEmpty(sb)
      else {
        sb.append('(')
        var i = 0
        while (i < ls.length) {
          if (i > 0) sb.append(',')
          if (ls(i).isEmpty) appendEmpty(sb) else appendSeq(sb, ls(i))
          i += 1
        }
        sb.append(')')
      }
    case GMPoly(ps, ct) =>
      header(sb, "MULTIPOLYGON", ct)
      if (ps.isEmpty) appendEmpty(sb)
      else {
        sb.append('(')
        var i = 0
        while (i < ps.length) {
          if (i > 0) sb.append(',')
          if (ps(i).isEmpty) appendEmpty(sb) else appendRings(sb, ps(i))
          i += 1
        }
        sb.append(')')
      }
    case GColl(gs, ct) =>
      header(sb, "GEOMETRYCOLLECTION", ct)
      if (gs.isEmpty) appendEmpty(sb)
      else {
        sb.append('(')
        var i = 0
        while (i < gs.length) {
          if (i > 0) sb.append(',')
          append(sb, gs(i))
          i += 1
        }
        sb.append(')')
      }
  }
}
