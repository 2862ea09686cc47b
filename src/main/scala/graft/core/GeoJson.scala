package graft.core

import scala.collection.mutable

/** GeoJSON geometry codec with a tiny hand-rolled JSON walker (zero
  * external deps). Coordinate dimensionality XY/XYZ inferred from
  * coordinate array lengths, like the reference
  * (geom/geojson_unmarshal.go:11-45; geom/geojson_marshal.go).
  * GeoJSON has no M, so only XY and XYZ occur.
  */
object GeoJson {

  final class ParseException(msg: String) extends RuntimeException(msg)

  // ------------------------------------------------------- JSON walker

  sealed trait J
  final case class JObj(fields: Map[String, J]) extends J
  final case class JArr(items: Vector[J]) extends J
  /** Specialized all-numeric array (coordinate positions): parsed
    * straight into a double array with no per-number JNum boxes or
    * Vector cells — geometry coordinates dominate GeoJSON ingest cost.
    */
  final case class JNumArr(xs: Array[Double]) extends J
  final case class JStr(s: String) extends J
  final case class JNum(d: Double) extends J
  final case class JBool(b: Boolean) extends J
  case object JNull extends J

  def parseJson(s: String): J = {
    val p = new P(s)
    val v = p.value()
    p.skipWs()
    if (!p.eof) throw new ParseException("trailing JSON content")
    v
  }

  private final class P(s: String) {
    var i = 0
    def eof: Boolean = i >= s.length
    def skipWs(): Unit = while (!eof && Character.isWhitespace(s.charAt(i))) i += 1
    private def err(m: String): Nothing = throw new ParseException(s"json error at $i: $m")
    private def expect(c: Char): Unit = {
      skipWs()
      if (eof || s.charAt(i) != c) err(s"expected '$c'")
      i += 1
    }
    def value(): J = {
      skipWs()
      if (eof) err("unexpected end")
      s.charAt(i) match {
        case '{' =>
          i += 1
          val m = mutable.LinkedHashMap.empty[String, J]
          skipWs()
          if (!eof && s.charAt(i) == '}') { i += 1; return JObj(m.toMap) }
          var done = false
          while (!done) {
            skipWs()
            val k = str()
            expect(':')
            m(k) = value()
            skipWs()
            if (!eof && s.charAt(i) == ',') i += 1
            else { expect('}'); done = true }
          }
          JObj(m.toMap)
        case '[' =>
          i += 1
          skipWs()
          if (!eof && s.charAt(i) == ']') { i += 1; return JArr(Vector.empty) }
          val c0 = if (eof) ' ' else s.charAt(i)
          if (c0 == '-' || c0 == '+' || c0 == '.' || (c0 >= '0' && c0 <= '9')) {
            // numeric fast path; degrades to the generic loop if a
            // non-number element appears (legal in properties/foreign
            // members, never in coordinates)
            val nb = new mutable.ArrayBuilder.ofDouble
            while (true) {
              skipWs()
              val c = if (eof) ' ' else s.charAt(i)
              if (c == '-' || c == '+' || c == '.' || (c >= '0' && c <= '9')) {
                nb += number()
                skipWs()
                if (!eof && s.charAt(i) == ',') i += 1
                else { expect(']'); return JNumArr(nb.result()) }
              } else {
                val vb = Vector.newBuilder[J]
                nb.result().foreach(d => vb += JNum(d))
                var gdone = false
                while (!gdone) {
                  vb += value()
                  skipWs()
                  if (!eof && s.charAt(i) == ',') i += 1
                  else { expect(']'); gdone = true }
                }
                return JArr(vb.result())
              }
            }
            JNumArr(nb.result()) // unreachable
          } else {
            val b = Vector.newBuilder[J]
            var done = false
            while (!done) {
              b += value()
              skipWs()
              if (!eof && s.charAt(i) == ',') i += 1
              else { expect(']'); done = true }
            }
            JArr(b.result())
          }
        case '"' => JStr(str())
        case 't' => if (s.startsWith("true", i)) { i += 4; JBool(true) } else err("bad literal")
        case 'f' => if (s.startsWith("false", i)) { i += 5; JBool(false) } else err("bad literal")
        case 'n' => if (s.startsWith("null", i)) { i += 4; JNull } else err("bad literal")
        case _ => JNum(number())
      }
    }
    private def number(): Double = {
      val st = i
      if (s.charAt(i) == '-') i += 1
      while (!eof && (Character.isDigit(s.charAt(i)) || "+-.eE".indexOf(s.charAt(i)) >= 0)) i += 1
      try java.lang.Double.parseDouble(s.substring(st, i))
      catch { case _: NumberFormatException => err("bad number") }
    }
    private def str(): String = {
      skipWs()
      if (eof || s.charAt(i) != '"') err("expected string")
      i += 1
      val sb = new java.lang.StringBuilder
      while (!eof && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (eof) err("bad escape")
          s.charAt(i) match {
            case '"' => sb.append('"'); case '\\' => sb.append('\\')
            case '/' => sb.append('/'); case 'b' => sb.append('\b')
            case 'f' => sb.append('\f'); case 'n' => sb.append('\n')
            case 'r' => sb.append('\r'); case 't' => sb.append('\t')
            case 'u' =>
              if (i + 4 >= s.length) err("bad unicode escape")
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case other => err(s"bad escape '\\$other'")
          }
        } else sb.append(c)
        i += 1
      }
      if (eof) err("unterminated string")
      i += 1
      sb.toString
    }
  }

  // -------------------------------------------------------- geometry IO

  def parse(json: String): Geom = fromJson(parseJson(json))

  def fromJson(j: J): Geom = {
    val obj = j match {
      case o: JObj => o
      case _ => throw new ParseException("GeoJSON geometry must be an object")
    }
    val typ = obj.fields.get("type") match {
      case Some(JStr(t)) => t
      case _ => throw new ParseException("missing GeoJSON type")
    }
    def coords: J = obj.fields.getOrElse("coordinates",
      throw new ParseException("missing coordinates"))
    typ match {
      case "Point" => pointFrom(coords)
      case "LineString" => GLine(seqFrom(coords))
      case "Polygon" => polyFrom(coords)
      case "MultiPoint" =>
        val arr = asArr(coords)
        val pts = arr.items.map(p => pointFrom(p)).toArray
        val ct = lubCt(pts.map(_.ct))
        GMPoint(pts.map(p => Geom.forceCT(p, ct).asInstanceOf[GPoint]), ct)
      case "MultiLineString" =>
        val ls = asArr(coords).items.map(seqFrom).toArray
        val ct = lubCt(ls.map(_.ct))
        GMLine(ls.map(_.forceCT(ct)), ct)
      case "MultiPolygon" =>
        val ps = asArr(coords).items.map(p => polyFrom(p)).toArray
        val ct = lubCt(ps.map(_.ct))
        GMPoly(ps.map(p => Geom.forceCT(p, ct).asInstanceOf[GPoly].rings), ct)
      case "GeometryCollection" =>
        val gs = obj.fields.get("geometries") match {
          case Some(JArr(items)) => items.map(fromJson).toArray
          case _ => throw new ParseException("missing geometries")
        }
        GColl(gs, if (gs.isEmpty) CT.XY else lubCt(gs.map(_.ct)))
      case other => throw new ParseException(s"unknown GeoJSON type '$other'")
    }
  }

  // GeoJSON: conflicting dims normalize to the narrower (XY wins)
  private def lubCt(cts: Array[Int]): Int =
    if (cts.isEmpty) CT.XY
    else if (cts.forall(_ == CT.XYZ)) CT.XYZ
    else CT.XY

  private def asArr(j: J): JArr = j match {
    case a: JArr => a
    case JNumArr(xs) => JArr(xs.toVector.map(JNum(_)))
    case _ => throw new ParseException("expected array")
  }

  private def posFrom(j: J): Array[Double] = j match {
    case JNumArr(xs) =>
      if (xs.length < 2) throw new ParseException("position needs >=2 ordinates")
      if (xs.length <= 3) xs else xs.take(3)
    case _ =>
      val a = asArr(j)
      if (a.items.length < 2) throw new ParseException("position needs >=2 ordinates")
      a.items.take(3).map {
        case JNum(d) => d
        case _ => throw new ParseException("position ordinates must be numbers")
      }.toArray
  }

  private def pointFrom(j: J): GPoint = {
    val a = asArr(j)
    if (a.items.isEmpty) GPoint(Array.emptyDoubleArray, CT.XY)
    else {
      val c = posFrom(j)
      GPoint(c, if (c.length >= 3) CT.XYZ else CT.XY)
    }
  }

  private def seqFrom(j: J): Seqn = {
    val a = asArr(j)
    if (a.items.isEmpty) return new Seqn(Array.emptyDoubleArray, CT.XY)
    val poss = a.items.map(posFrom)
    val ct = if (poss.forall(_.length >= 3)) CT.XYZ else CT.XY
    val st = CT.stride(ct)
    val out = new Array[Double](poss.length * st)
    var i = 0
    while (i < poss.length) {
      out(i * st) = poss(i)(0); out(i * st + 1) = poss(i)(1)
      if (st == 3) out(i * st + 2) = if (poss(i).length >= 3) poss(i)(2) else 0.0
      i += 1
    }
    new Seqn(out, ct)
  }

  private def polyFrom(j: J): GPoly = {
    val rings = asArr(j).items.map(seqFrom).toArray
    if (rings.isEmpty) GPoly(Array.empty, CT.XY)
    else {
      val ct = lubCt(rings.map(_.ct))
      GPoly(rings.map(_.forceCT(ct)), ct)
    }
  }

  // ----------------------------------------------------------- writer

  def write(g: Geom): String = {
    val sb = new java.lang.StringBuilder
    append(sb, g)
    sb.toString
  }

  private def num(sb: java.lang.StringBuilder, d: Double): Unit =
    sb.append(Wkt.fmt(d))

  private def appendPos(sb: java.lang.StringBuilder, s: Seqn, i: Int): Unit = {
    sb.append('[')
    num(sb, s.x(i)); sb.append(',')
    num(sb, s.y(i))
    if (CT.hasZ(s.ct)) { sb.append(','); num(sb, s.ord(i, 2)) }
    sb.append(']')
  }

  private def appendSeq(sb: java.lang.StringBuilder, s: Seqn): Unit = {
    sb.append('[')
    var i = 0
    while (i < s.n) {
      if (i > 0) sb.append(',')
      appendPos(sb, s, i)
      i += 1
    }
    sb.append(']')
  }

  private def appendRings(sb: java.lang.StringBuilder, rs: Array[Seqn]): Unit = {
    sb.append('[')
    var i = 0
    while (i < rs.length) {
      if (i > 0) sb.append(',')
      appendSeq(sb, rs(i))
      i += 1
    }
    sb.append(']')
  }

  def append(sb: java.lang.StringBuilder, g: Geom): Unit = g match {
    case p @ GPoint(c, ct) =>
      sb.append("""{"type":"Point","coordinates":""")
      if (p.isEmpty) sb.append("[]") else appendPos(sb, new Seqn(c, ct), 0)
      sb.append('}')
    case GLine(s) =>
      sb.append("""{"type":"LineString","coordinates":""")
      appendSeq(sb, s)
      sb.append('}')
    case GPoly(rs, _) =>
      sb.append("""{"type":"Polygon","coordinates":""")
      appendRings(sb, rs)
      sb.append('}')
    case GMPoint(pts, _) =>
      sb.append("""{"type":"MultiPoint","coordinates":[""")
      var first = true
      for (p <- pts if !p.isEmpty) {
        if (!first) sb.append(',')
        appendPos(sb, new Seqn(p.coords, p.ct), 0)
        first = false
      }
      sb.append("]}")
    case GMLine(ls, _) =>
      sb.append("""{"type":"MultiLineString","coordinates":[""")
      var i = 0
      while (i < ls.length) {
        if (i > 0) sb.append(',')
        appendSeq(sb, ls(i))
        i += 1
      }
      sb.append("]}")
    case GMPoly(ps, _) =>
      sb.append("""{"type":"MultiPolygon","coordinates":[""")
      var i = 0
      while (i < ps.length) {
        if (i > 0) sb.append(',')
        appendRings(sb, ps(i))
        i += 1
      }
      sb.append("]}")
    case GColl(gs, _) =>
      sb.append("""{"type":"GeometryCollection","geometries":[""")
      var i = 0
      while (i < gs.length) {
        if (i > 0) sb.append(',')
        append(sb, gs(i))
        i += 1
      }
      sb.append("]}")
  }

  // -------------------------------------------- Feature(Collection)s

  /** One GeoJSON Feature: geometry + raw re-serialized properties JSON
    * + optional id + foreign members — every top-level field other
    * than type/geometry/id/properties, kept as a re-serialized JSON
    * object (reference: geom/geojson_feature_collection.go:11-29,76-94;
    * field order is not preserved, values are).
    */
  final case class Feature(geom: Geom, id: Option[String], properties: String,
                           foreignMembers: String = "{}")

  def writeJson(j: J): String = {
    val sb = new java.lang.StringBuilder
    def esc(x: String): Unit = {
      sb.append('"')
      x.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append('"')
    }
    def go(v: J): Unit = v match {
      case JNull => sb.append("null")
      case JBool(b) => sb.append(b)
      case JNum(d) => sb.append(Wkt.fmt(d))
      case JNumArr(xs) =>
        sb.append('[')
        var first = true
        xs.foreach { d => if (!first) sb.append(','); first = false; sb.append(Wkt.fmt(d)) }
        sb.append(']')
      case JStr(x) => esc(x)
      case JArr(items) =>
        sb.append('[')
        var first = true
        items.foreach { it => if (!first) sb.append(','); first = false; go(it) }
        sb.append(']')
      case JObj(fields) =>
        sb.append('{')
        var first = true
        fields.toSeq.sortBy(_._1).foreach { case (k, v2) =>
          if (!first) sb.append(','); first = false
          esc(k); sb.append(':'); go(v2)
        }
        sb.append('}')
    }
    go(j)
    sb.toString
  }

  def parseFeature(json: String): Feature = featureFrom(parseJson(json))

  private def featureFrom(j: J): Feature = {
    val obj = j match {
      case o: JObj => o
      case _ => throw new ParseException("GeoJSON Feature must be an object")
    }
    obj.fields.get("type") match {
      case Some(JStr("Feature")) => ()
      case _ => throw new ParseException("not a GeoJSON Feature")
    }
    val geom = obj.fields.get("geometry") match {
      case Some(JNull) | None => Geom.emptyGC
      case Some(g) => fromJson(g)
    }
    val id = obj.fields.get("id").map {
      case JStr(x) => x
      case JNum(d) => Wkt.fmt(d)
      case other => writeJson(other)
    }
    val props = obj.fields.getOrElse("properties", JNull) match {
      case JNull => "{}"
      case p => writeJson(p)
    }
    val foreign = obj.fields.view
      .filterKeys(k => k != "type" && k != "geometry" && k != "id" && k != "properties")
      .toMap
    val fm = if (foreign.isEmpty) "{}" else writeJson(JObj(foreign))
    Feature(geom, id, props, fm)
  }

  def parseFeatureCollection(json: String): Array[Feature] =
    parseJson(json) match {
      case JObj(fields) if fields.get("type").contains(JStr("FeatureCollection")) =>
        fields.get("features") match {
          case Some(JArr(items)) => items.map(featureFrom).toArray
          case _ => throw new ParseException("missing features array")
        }
      case o: JObj if o.fields.get("type").contains(JStr("Feature")) =>
        Array(featureFrom(o))
      case _ => throw new ParseException("not a GeoJSON FeatureCollection")
    }

  def writeFeature(f: Feature): String = {
    val sb = new java.lang.StringBuilder
    sb.append("{\"type\":\"Feature\"")
    f.id.foreach { id => sb.append(",\"id\":").append(writeJson(JStr(id))) }
    sb.append(",\"geometry\":").append(write(f.geom))
    sb.append(",\"properties\":").append(f.properties)
    val fm = f.foreignMembers.trim
    if (fm.nonEmpty && fm != "{}") {
      // foreign members may not shadow the standard fields
      // (reference: geojson_feature_collection.go:126-130)
      parseJson(fm) match {
        case JObj(fields) =>
          for (forbidden <- Seq("type", "geometry", "id", "properties"))
            if (fields.contains(forbidden))
              throw new ParseException(s"forbidden foreign member '$forbidden'")
          if (fields.nonEmpty) sb.append(',').append(writeJson(JObj(fields)).drop(1).dropRight(1))
        case _ => throw new ParseException("foreign members must be a JSON object")
      }
    }
    sb.append('}')
    sb.toString
  }
}
