package graft.core

/** Coordinate types, mirroring the reference's 2-bit flag encoding
  * (reference: geom/coordinate_type.go:10-38).
  */
object CT {
  val XY = 0; val XYZ = 1; val XYM = 2; val XYZM = 3
  def stride(ct: Int): Int = 2 + (ct & 1) + ((ct >> 1) & 1)
  def hasZ(ct: Int): Boolean = (ct & 1) == 1
  def hasM(ct: Int): Boolean = (ct & 2) == 2
  /** Coordinate dimension: XY=2, XYZ=3, XYM=3, XYZM=4. */
  def dim(ct: Int): Int = stride(ct)
  def name(ct: Int): String = ct match {
    case XY => "XY"; case XYZ => "XYZ"; case XYM => "XYM"; case _ => "XYZM"
  }
  /** WKT dimension tag ("", "Z", "M", "ZM"). */
  def wktTag(ct: Int): String = ct match {
    case XY => ""; case XYZ => "Z"; case XYM => "M"; case _ => "ZM"
  }
}

/** Immutable flat interleaved coordinate sequence — the column-friendly
  * representation (reference: geom/type_sequence.go:10-97). Length =
  * floats.length / stride.
  */
final class Seqn(val floats: Array[Double], val ct: Int) {
  val stride: Int = CT.stride(ct)
  def n: Int = floats.length / stride
  def isEmpty: Boolean = floats.length == 0
  def x(i: Int): Double = floats(i * stride)
  def y(i: Int): Double = floats(i * stride + 1)
  /** j-th ordinate of point i (0=x,1=y,2=z-or-m,...). */
  def ord(i: Int, j: Int): Double = floats(i * stride + j)

  // memoized: callers (PIP envelope gates, R-tree loads, relate) ask
  // repeatedly and the sequence is immutable; recomputing was an O(n)
  // tax on every single point location
  @volatile private[this] var envCache: Env = null
  def envelope: Env = {
    val c = envCache
    if (c != null) return c
    val e = computeEnvelope()
    envCache = e
    e
  }
  private def computeEnvelope(): Env = {
    if (isEmpty) return Env.empty
    var xmin = Double.PositiveInfinity; var ymin = Double.PositiveInfinity
    var xmax = Double.NegativeInfinity; var ymax = Double.NegativeInfinity
    var i = 0
    while (i < floats.length) {
      val xx = floats(i); val yy = floats(i + 1)
      if (xx < xmin) xmin = xx; if (xx > xmax) xmax = xx
      if (yy < ymin) ymin = yy; if (yy > ymax) ymax = yy
      i += stride
    }
    Env(xmin, ymin, xmax, ymax)
  }

  def reversed: Seqn = {
    val out = new Array[Double](floats.length)
    val m = n
    var i = 0
    while (i < m) {
      var j = 0
      while (j < stride) { out(i * stride + j) = floats((m - 1 - i) * stride + j); j += 1 }
      i += 1
    }
    new Seqn(out, ct)
  }

  /** Project to a new coordinate type; missing Z/M filled with 0
    * (reference: geom/type_sequence.go:125-151).
    */
  def forceCT(nct: Int): Seqn = {
    if (nct == ct) return this
    val m = n
    val ns = CT.stride(nct)
    val out = new Array[Double](m * ns)
    var i = 0
    while (i < m) {
      out(i * ns) = x(i); out(i * ns + 1) = y(i)
      var o = 2
      if (CT.hasZ(nct)) { out(i * ns + o) = if (CT.hasZ(ct)) ord(i, 2) else 0.0; o += 1 }
      if (CT.hasM(nct)) {
        val mj = if (CT.hasZ(ct)) 3 else 2
        out(i * ns + o) = if (CT.hasM(ct)) ord(i, mj) else 0.0
      }
      i += 1
    }
    new Seqn(out, nct)
  }

  /** Structural equality on floats and ctype (NaN == NaN). */
  def sameAs(o: Seqn): Boolean =
    ct == o.ct && java.util.Arrays.equals(floats, o.floats)
}

object Seqn {
  val empty2D = new Seqn(Array.emptyDoubleArray, CT.XY)
  def xy(coords: Array[Double]): Seqn = new Seqn(coords, CT.XY)
  def of(coords: Double*): Seqn = new Seqn(coords.toArray, CT.XY)
}

/** Axis-aligned bounding box; empty is encoded by min > max
  * (reference: geom/type_envelope.go:23-26).
  */
final case class Env(xmin: Double, ymin: Double, xmax: Double, ymax: Double) {
  def isEmpty: Boolean = xmin > xmax || ymin > ymax
  def width: Double = if (isEmpty) 0 else xmax - xmin
  def height: Double = if (isEmpty) 0 else ymax - ymin
  def area: Double = width * height
  def merge(o: Env): Env =
    if (isEmpty) o else if (o.isEmpty) this
    else Env(math.min(xmin, o.xmin), math.min(ymin, o.ymin),
             math.max(xmax, o.xmax), math.max(ymax, o.ymax))
  def expandPt(x: Double, y: Double): Env =
    if (isEmpty) Env(x, y, x, y)
    else Env(math.min(xmin, x), math.min(ymin, y), math.max(xmax, x), math.max(ymax, y))
  def intersects(o: Env): Boolean =
    !isEmpty && !o.isEmpty &&
      xmin <= o.xmax && o.xmin <= xmax && ymin <= o.ymax && o.ymin <= ymax
  def containsPt(x: Double, y: Double): Boolean =
    !isEmpty && x >= xmin && x <= xmax && y >= ymin && y <= ymax
  def contains(o: Env): Boolean =
    !isEmpty && !o.isEmpty &&
      o.xmin >= xmin && o.xmax <= xmax && o.ymin >= ymin && o.ymax <= ymax
  def intersection(o: Env): Env = {
    val e = Env(math.max(xmin, o.xmin), math.max(ymin, o.ymin),
                math.min(xmax, o.xmax), math.min(ymax, o.ymax))
    if (e.isEmpty) Env.empty else e
  }
  /** Min distance between boxes; 0 if intersecting
    * (reference: geom/type_envelope.go:227-246).
    */
  def distance(o: Env): Double = {
    if (intersects(o)) return 0.0
    val dx = math.max(0.0, math.max(o.xmin - xmax, xmin - o.xmax))
    val dy = math.max(0.0, math.max(o.ymin - ymax, ymin - o.ymax))
    math.sqrt(dx * dx + dy * dy)
  }
  def centerX: Double = (xmin + xmax) / 2
  def centerY: Double = (ymin + ymax) / 2
  /** Envelope as a Geom: empty → empty Polygon, point → Point,
    * degenerate line → LineString, else ccw rectangle Polygon
    * (reference: geom/type_envelope.go:59-79).
    */
  def toGeom: Geom =
    if (isEmpty) GPoly(Array.empty, CT.XY)
    else if (xmin == xmax && ymin == ymax) GPoint.xy(xmin, ymin)
    else if (xmin == xmax || ymin == ymax)
      GLine(Seqn.of(xmin, ymin, xmax, ymax))
    else GPoly(Array(Seqn.of(xmin, ymin, xmax, ymin, xmax, ymax, xmin, ymax, xmin, ymin)), CT.XY)
}

object Env {
  val empty = Env(Double.PositiveInfinity, Double.PositiveInfinity,
                  Double.NegativeInfinity, Double.NegativeInfinity)
  def ofPt(x: Double, y: Double) = Env(x, y, x, y)
}

/** Geometry ADT — tagged union over the 7 OGC types
  * (reference: geom/type_geometry.go:13-47). Coordinates are flat
  * interleaved doubles; all computation is 2D (Z/M carried through
  * codecs only, like RelateNG: jtsport relate_ng "operates in 2D").
  */
sealed trait Geom {
  def ct: Int
  /** WKB base type code 1..7. */
  def typeCode: Int
  def typeName: String
  def isEmpty: Boolean
  def envelope: Env
  /** Topological dimension 0/1/2; -1 for empty GC (reference CHANGELOG v0.58). */
  def dimension: Int
  def numPoints: Int
}

final case class GPoint(coords: Array[Double], ct: Int) extends Geom {
  // coords empty => empty point
  def typeCode = 1; def typeName = "Point"
  def isEmpty: Boolean = coords.length == 0
  def x: Double = coords(0)
  def y: Double = coords(1)
  def envelope: Env = if (isEmpty) Env.empty else Env.ofPt(x, y)
  def dimension = 0
  def numPoints: Int = if (isEmpty) 0 else 1
}
object GPoint {
  def xy(x: Double, y: Double): GPoint = GPoint(Array(x, y), CT.XY)
  def empty: GPoint = GPoint(Array.emptyDoubleArray, CT.XY)
}

final case class GLine(seq: Seqn) extends Geom {
  def ct: Int = seq.ct
  def typeCode = 2; def typeName = "LineString"
  def isEmpty: Boolean = seq.isEmpty
  def envelope: Env = seq.envelope
  def dimension = 1
  def numPoints: Int = seq.n
  def isClosed: Boolean = !isEmpty &&
    seq.x(0) == seq.x(seq.n - 1) && seq.y(0) == seq.y(seq.n - 1)
}

/** rings(0) = exterior shell; rest = holes (reference: geom/type_polygon.go:27). */
final case class GPoly(rings: Array[Seqn], ct: Int) extends Geom {
  def typeCode = 3; def typeName = "Polygon"
  def isEmpty: Boolean = rings.length == 0
  def shell: Seqn = rings(0)
  def envelope: Env = if (isEmpty) Env.empty else rings(0).envelope
  def dimension = 2
  def numPoints: Int = rings.iterator.map(_.n).sum
}

final case class GMPoint(pts: Array[GPoint], ct: Int) extends Geom {
  def typeCode = 4; def typeName = "MultiPoint"
  def isEmpty: Boolean = pts.forall(_.isEmpty)
  def envelope: Env = pts.foldLeft(Env.empty)((e, p) => e.merge(p.envelope))
  def dimension = 0
  def numPoints: Int = pts.count(!_.isEmpty)
}

final case class GMLine(lines: Array[Seqn], ct: Int) extends Geom {
  def typeCode = 5; def typeName = "MultiLineString"
  def isEmpty: Boolean = lines.forall(_.isEmpty)
  def envelope: Env = lines.foldLeft(Env.empty)((e, l) => e.merge(l.envelope))
  def dimension = 1
  def numPoints: Int = lines.iterator.map(_.n).sum
}

final case class GMPoly(polys: Array[Array[Seqn]], ct: Int) extends Geom {
  def typeCode = 6; def typeName = "MultiPolygon"
  def isEmpty: Boolean = polys.forall(_.isEmpty)
  def envelope: Env =
    polys.foldLeft(Env.empty)((e, p) => if (p.isEmpty) e else e.merge(p(0).envelope))
  def dimension = 2
  def numPoints: Int = polys.iterator.flatMap(_.iterator.map(_.n)).sum
}

final case class GColl(geoms: Array[Geom], ct: Int) extends Geom {
  def typeCode = 7; def typeName = "GeometryCollection"
  def isEmpty: Boolean = geoms.forall(_.isEmpty)
  def envelope: Env = geoms.foldLeft(Env.empty)((e, g) => e.merge(g.envelope))
  def dimension: Int = if (geoms.isEmpty) -1 else geoms.iterator.map(_.dimension).max
  def numPoints: Int = geoms.iterator.map(_.numPoints).sum
}

object Geom {
  val emptyGC: Geom = GColl(Array.empty, CT.XY)

  /** Flatten multi/collection geometries into atomic parts
    * (reference: geom/type_geometry.go:770-814 Dump).
    */
  def dump(g: Geom): Array[Geom] = g match {
    case GMPoint(pts, _)  => pts.filter(!_.isEmpty).map(p => p: Geom)
    case GMLine(ls, ct)   => ls.filter(!_.isEmpty).map(s => GLine(s): Geom)
    case GMPoly(ps, ct)   => ps.filter(_.nonEmpty).map(p => GPoly(p, ct): Geom)
    case GColl(gs, _)     => gs.flatMap(dump)
    case _ if g.isEmpty   => Array.empty
    case _                => Array(g)
  }

  def numGeometries(g: Geom): Int = g match {
    case GMPoint(pts, _) => pts.length
    case GMLine(ls, _)   => ls.length
    case GMPoly(ps, _)   => ps.length
    case GColl(gs, _)    => gs.length
    case _               => 1
  }

  def geometryN(g: Geom, n: Int): Option[Geom] = g match {
    case GMPoint(pts, _) if n >= 0 && n < pts.length => Some(pts(n))
    case GMLine(ls, ct)  if n >= 0 && n < ls.length  => Some(GLine(ls(n)))
    case GMPoly(ps, ct)  if n >= 0 && n < ps.length  => Some(GPoly(ps(n), ct))
    case GColl(gs, _)    if n >= 0 && n < gs.length  => Some(gs(n))
    case _ if n == 0 => Some(g)
    case _ => None
  }

  /** Boundary under the mod-2 rule (reference: geom/type_geometry.go:418-446;
    * per-type: type_point.go:106 empty GC, type_line_string.go:222
    * endpoints as MultiPoint, type_polygon.go:260 rings with the
    * holeless-polygon LineString special case,
    * type_multi_line_string.go:221 odd-degree endpoints).
    */
  def boundary(g: Geom): Geom = g match {
    case _: GPoint | _: GMPoint => GColl(Array.empty, CT.XY)
    case GLine(s) =>
      if (s.isEmpty || (s.x(0) == s.x(s.n - 1) && s.y(0) == s.y(s.n - 1)))
        GMPoint(Array.empty, CT.XY)
      else GMPoint(Array(
        GPoint(Array(s.x(0), s.y(0)), CT.XY),
        GPoint(Array(s.x(s.n - 1), s.y(s.n - 1)), CT.XY)), CT.XY)
    case GPoly(rings, _) =>
      if (rings.isEmpty) GLine(Seqn.empty2D)
      else if (rings.length == 1) GLine(rings(0).forceCT(CT.XY))
      else GMLine(rings.map(_.forceCT(CT.XY)), CT.XY)
    case GMLine(ls, _) =>
      // mod-2 rule: endpoints appearing an odd number of times
      val counts = scala.collection.mutable.LinkedHashMap.empty[(Double, Double), Int]
      for (s <- ls if s.n >= 2) {
        val a = (s.x(0), s.y(0)); val b = (s.x(s.n - 1), s.y(s.n - 1))
        if (a != b) {
          counts(a) = counts.getOrElse(a, 0) + 1
          counts(b) = counts.getOrElse(b, 0) + 1
        }
      }
      GMPoint(counts.iterator.collect { case ((x, y), c) if c % 2 == 1 =>
        GPoint(Array(x, y), CT.XY) }.toArray, CT.XY)
    case GMPoly(ps, _) =>
      GMLine(ps.flatten.map(_.forceCT(CT.XY)), CT.XY)
    case GColl(gs, _) => GColl(gs.map(boundary), CT.XY)
  }

  /** Strip Z/M, force 2D (reference: geom/type_geometry.go:632-658). */
  def force2D(g: Geom): Geom = forceCT(g, CT.XY)

  /** (min, max) of ordinate j (2=z-or-m, 3=m) across every coordinate;
    * (0,0) when there are none. Callers must pass a geometry whose
    * every sequence carries ordinate j (e.g. after forceCT).
    */
  def ordRange(g: Geom, j: Int): (Double, Double) = {
    var lo = Double.PositiveInfinity; var hi = Double.NegativeInfinity
    def seq(s: Seqn): Unit = {
      var i = 0
      while (i < s.n) {
        val v = s.ord(i, j)
        if (v < lo) lo = v; if (v > hi) hi = v
        i += 1
      }
    }
    def go(g: Geom): Unit = g match {
      case GPoint(c, ct)  => if (c.nonEmpty) seq(new Seqn(c, ct))
      case GLine(s)       => seq(s)
      case GPoly(rs, _)   => rs.foreach(seq)
      case GMPoint(ps, _) => ps.foreach(go)
      case GMLine(ls, _)  => ls.foreach(seq)
      case GMPoly(ps, _)  => ps.foreach(_.foreach(seq))
      case GColl(gs, _)   => gs.foreach(go)
    }
    go(g)
    if (lo > hi) (0.0, 0.0) else (lo, hi)
  }

  def forceCT(g: Geom, nct: Int): Geom = g match {
    case GPoint(c, ct) =>
      if (c.isEmpty) GPoint(c, nct)
      else {
        val s = new Seqn(c, ct).forceCT(nct)
        GPoint(s.floats, nct)
      }
    case GLine(s)        => GLine(s.forceCT(nct))
    case GPoly(rs, _)    => GPoly(rs.map(_.forceCT(nct)), nct)
    case GMPoint(ps, _)  => GMPoint(ps.map(p => forceCT(p, nct).asInstanceOf[GPoint]), nct)
    case GMLine(ls, _)   => GMLine(ls.map(_.forceCT(nct)), nct)
    case GMPoly(ps, _)   => GMPoly(ps.map(_.map(_.forceCT(nct))), nct)
    case GColl(gs, _)    => GColl(gs.map(forceCT(_, nct)), nct)
  }

  /** Reverse coordinate order of curves (reference: geom/type_geometry.go:599-621). */
  def reverse(g: Geom): Geom = g match {
    case GLine(s)       => GLine(s.reversed)
    case GPoly(rs, ct)  => GPoly(rs.map(_.reversed), ct)
    case GMLine(ls, ct) => GMLine(ls.map(_.reversed), ct)
    case GMPoly(ps, ct) => GMPoly(ps.map(_.map(_.reversed)), ct)
    case GColl(gs, ct)  => GColl(gs.map(reverse), ct)
    case other          => other
  }

  /** Swap X and Y ordinates (reference: geom/type_geometry.go FlipCoordinates). */
  def flip(g: Geom): Geom = transformSeq(g, s => {
    val out = s.floats.clone()
    var i = 0
    while (i < out.length) {
      val t = out(i); out(i) = out(i + 1); out(i + 1) = t
      i += s.stride
    }
    new Seqn(out, s.ct)
  })

  /** Round to grid with half-up ties (JTS `PrecisionModel.makePrecise`
    * / `Math.round` semantics, which the reference's fixed-precision
    * corpus expectations are computed with; `math.rint`'s half-even
    * ties diverge on exact .5 coordinates).
    */
  @inline def gridRound(v: Double, sc: Double): Double =
    math.floor(v * sc + 0.5) / sc

  /** Snap XY to a base-10 grid with `dp` decimal places
    * (reference: geom/snap_to_grid.go:5-52).
    */
  def snapToGrid(g: Geom, dp: Int): Geom = {
    val sc = math.pow(10, dp)
    transformSeq(g, s => {
      val out = s.floats.clone()
      var i = 0
      while (i < out.length) {
        out(i) = gridRound(out(i), sc)
        out(i + 1) = gridRound(out(i + 1), sc)
        i += s.stride
      }
      new Seqn(out, s.ct)
    })
  }

  /** Apply a per-point XY transform fn(x,y)->(x',y') keeping Z/M. */
  def transformXY(g: Geom, fn: (Double, Double) => (Double, Double)): Geom =
    transformSeq(g, s => {
      val out = s.floats.clone()
      var i = 0
      while (i < out.length) {
        val (nx, ny) = fn(out(i), out(i + 1))
        out(i) = nx; out(i + 1) = ny
        i += s.stride
      }
      new Seqn(out, s.ct)
    })

  def transformSeq(g: Geom, fn: Seqn => Seqn): Geom = g match {
    case GPoint(c, ct) =>
      if (c.isEmpty) g else { val s = fn(new Seqn(c, ct)); GPoint(s.floats, s.ct) }
    case GLine(s)       => GLine(fn(s))
    case GPoly(rs, ct)  => GPoly(rs.map(fn), ct)
    case GMPoint(ps, ct)=> GMPoint(ps.map(p => transformSeq(p, fn).asInstanceOf[GPoint]), ct)
    case GMLine(ls, ct) => GMLine(ls.map(fn), ct)
    case GMPoly(ps, ct) => GMPoly(ps.map(_.map(fn)), ct)
    case GColl(gs, ct)  => GColl(gs.map(transformSeq(_, fn)), ct)
  }
}
