package graft.core

import scala.collection.mutable.ArrayBuffer

/** Geometric set operations, phase 1.
  *
  * Scope: intersection where at least one operand is convex areal (or
  * either is puntal/lineal vs areal), via half-plane clipping — the
  * Sutherland–Hodgman path the north rule names. Envelope-disjoint
  * short-circuits return dim-typed empties exactly like the reference
  * (geom/alg_overlay.go:29-44,74-77: dim 0 = POINT EMPTY, 1 =
  * LINESTRING EMPTY, 2 = POLYGON EMPTY; intersection dim =
  * min(dimA, dimB)). The general concave-vs-concave overlay (OverlayNG
  * noding ladder) is scheduled for a later phase.
  */
object Overlay {

  def emptyOfDim(dim: Int): Geom = dim match {
    case 0 => GPoint.empty
    case 1 => GLine(Seqn.empty2D)
    case 2 => GPoly(Array.empty, CT.XY)
    case _ => Geom.emptyGC
  }

  def intersection(a: Geom, b: Geom): Geom = {
    val outDim = math.min(a.dimension, b.dimension)
    if (a.isEmpty || b.isEmpty || !a.envelope.intersects(b.envelope))
      return emptyOfDim(outDim)

    // puntal cases: filter points by containment in the other geometry
    if (a.dimension == 0) return pointIntersection(a, b)
    if (b.dimension == 0) return pointIntersection(b, a)

    // axis-box fast path (the overlay envelope clip)
    asAxisBox(b) match {
      case Some(box) => return Algos.clipToBox(a, box)
      case None =>
    }
    asAxisBox(a) match {
      case Some(box) => return Algos.clipToBox(b, box)
      case None =>
    }

    // convex clip: clip A against B's half-planes (or B against A's)
    asConvexRing(b) match {
      case Some(ring) => return clipToConvex(a, ring)
      case None =>
    }
    asConvexRing(a) match {
      case Some(ring) => return clipToConvex(b, ring)
      case None =>
    }

    // general case: arrangement overlay (SetOps)
    SetOps.intersection(a, b)
  }

  private def pointIntersection(pts: Geom, other: Geom): Geom = {
    val hits = ArrayBuffer.empty[(Double, Double)]
    Geom.dump(pts).foreach {
      case p: GPoint if !p.isEmpty =>
        if (Intersects.intersects(p, other)) hits += ((p.x, p.y))
      case _ =>
    }
    if (hits.isEmpty) GPoint.empty
    else if (hits.length == 1) GPoint.xy(hits(0)._1, hits(0)._2)
    else GMPoint(hits.map(p => GPoint.xy(p._1, p._2)).toArray, CT.XY)
  }

  /** If g is a single-ring polygon that is an axis-aligned rectangle,
    * return its envelope.
    */
  def asAxisBox(g: Geom): Option[Env] = g match {
    case GPoly(rings, _) if rings.length == 1 =>
      val r = rings(0)
      val e = r.envelope
      // every vertex on a corner, and exactly the 4 corners present
      val n = r.n
      if (n < 5) return None
      var ok = true
      var i = 0
      while (i < n && ok) {
        val x = r.x(i); val y = r.y(i)
        if ((x != e.xmin && x != e.xmax) || (y != e.ymin && y != e.ymax)) ok = false
        i += 1
      }
      if (ok && math.abs(Alg.signedRingArea(r)) == e.area && e.area > 0) Some(e) else None
    case _ => None
  }

  /** If g is a single convex ring polygon (no holes), return the ring
    * vertices in CCW open form.
    */
  def asConvexRing(g: Geom): Option[Array[Double]] = g match {
    case GPoly(rings, _) if rings.length == 1 =>
      val r0 = rings(0)
      val r = if (Alg.signedRingArea(r0) < 0) r0.reversed else r0
      val n = r.n - 1 // drop closing point
      if (n < 3) return None
      var i = 0
      while (i < n) {
        val o = Alg.orient(r.x(i), r.y(i), r.x((i + 1) % n), r.y((i + 1) % n),
          r.x((i + 2) % n), r.y((i + 2) % n))
        if (o < 0) return None // reflex corner: not convex
        i += 1
      }
      val out = new Array[Double](n * 2)
      i = 0
      while (i < n) { out(2 * i) = r.x(i); out(2 * i + 1) = r.y(i); i += 1 }
      Some(out)
    case _ => None
  }

  /** Clip any geometry against a convex CCW ring by successive
    * half-plane clips (Sutherland–Hodgman for rings, Cyrus–Beck-style
    * parametric clipping for segments).
    */
  def clipToConvex(g: Geom, ring: Array[Double]): Geom = {
    val nv = ring.length / 2
    def edges: Iterator[(Double, Double, Double, Double)] =
      (0 until nv).iterator.map { i =>
        val j = (i + 1) % nv
        (ring(2 * i), ring(2 * i + 1), ring(2 * j), ring(2 * j + 1))
      }

    g match {
      case GPoly(rings, _) =>
        var cur: Array[Array[Double]] =
          rings.map { r =>
            val n0 = if (r.n > 1) r.n - 1 else r.n
            val xs = new Array[Double](n0 * 2)
            var i = 0
            while (i < n0) { xs(2 * i) = r.x(i); xs(2 * i + 1) = r.y(i); i += 1 }
            xs
          }
        for ((ex1, ey1, ex2, ey2) <- edges) {
          cur = cur.map(clipOpenRingHalfPlane(_, ex1, ey1, ex2, ey2))
        }
        val shells = cur.filter(_.length >= 6)
        if (shells.isEmpty || cur(0).length < 6) GPoly(Array.empty, CT.XY)
        else GPoly(shells.map(closeRing).map(Seqn.xy), CT.XY)
      case GMPoly(ps, ct) =>
        val out = ps.flatMap { rs =>
          clipToConvex(GPoly(rs, ct), ring) match {
            case GPoly(rr, _) if rr.nonEmpty => Some(rr)
            case _ => None
          }
        }
        if (out.isEmpty) GPoly(Array.empty, CT.XY) else GMPoly(out, CT.XY)
      case GLine(s) =>
        val parts = clipSeqToConvex(s, ring)
        if (parts.isEmpty) GLine(Seqn.empty2D)
        else if (parts.length == 1) GLine(Seqn.xy(parts(0)))
        else GMLine(parts.map(Seqn.xy), CT.XY)
      case GMLine(ls, _) =>
        val parts = ls.flatMap(clipSeqToConvex(_, ring))
        if (parts.isEmpty) GLine(Seqn.empty2D) else GMLine(parts.map(Seqn.xy), CT.XY)
      case GColl(gs, _) => GColl(gs.map(clipToConvex(_, ring)), CT.XY)
      case other => other
    }
  }

  private def closeRing(xs: Array[Double]): Array[Double] = {
    val out = java.util.Arrays.copyOf(xs, xs.length + 2)
    out(xs.length) = xs(0); out(xs.length + 1) = xs(1)
    out
  }

  private def clipOpenRingHalfPlane(xs: Array[Double], ex1: Double, ey1: Double,
                                    ex2: Double, ey2: Double): Array[Double] = {
    val m = xs.length / 2
    if (m == 0) return xs
    val out = new ArrayBuffer[Double](xs.length + 8)
    def inside(x: Double, y: Double): Boolean =
      Alg.orient(ex1, ey1, ex2, ey2, x, y) >= 0
    def isect(px: Double, py: Double, cx: Double, cy: Double): (Double, Double) = {
      val rx = cx - px; val ry = cy - py
      val sx = ex2 - ex1; val sy = ey2 - ey1
      val denom = rx * sy - ry * sx
      val t = ((ex1 - px) * sy - (ey1 - py) * sx) / denom
      (px + t * rx, py + t * ry)
    }
    var i = 0
    while (i < m) {
      val cx = xs(2 * i); val cy = xs(2 * i + 1)
      val pi = (i + m - 1) % m
      val px = xs(2 * pi); val py = xs(2 * pi + 1)
      val cIn = inside(cx, cy); val pIn = inside(px, py)
      if (cIn) {
        if (!pIn) { val (ix, iy) = isect(px, py, cx, cy); out += ix += iy }
        out += cx += cy
      } else if (pIn) {
        val (ix, iy) = isect(px, py, cx, cy); out += ix += iy
      }
      i += 1
    }
    out.toArray
  }

  private def clipSeqToConvex(s: Seqn, ring: Array[Double]): Array[Array[Double]] = {
    val nv = ring.length / 2
    val out = ArrayBuffer.empty[Array[Double]]
    var cur = new ArrayBuffer[Double]()
    def flush(): Unit = {
      if (cur.length >= 4) out += cur.toArray
      cur = new ArrayBuffer[Double]()
    }
    var i = 0
    while (i < s.n - 1) {
      // parametric clip of one segment against all half planes
      var t0 = 0.0; var t1 = 1.0
      val x1 = s.x(i); val y1 = s.y(i)
      val dx = s.x(i + 1) - x1; val dy = s.y(i + 1) - y1
      var ok = true
      var e = 0
      while (e < nv && ok) {
        val j = (e + 1) % nv
        val ex = ring(2 * j) - ring(2 * e); val ey = ring(2 * j + 1) - ring(2 * e + 1)
        // inside = left of edge; n = inward normal (-ey? for CCW left is inside)
        val nx = -ey; val ny = ex
        val denom = nx * dx + ny * dy
        val num = nx * (ring(2 * e) - x1) + ny * (ring(2 * e + 1) - y1)
        if (denom == 0) { if (num > 0) ok = false }
        else {
          val t = num / denom
          if (denom < 0) { if (t < t1) t1 = t } else { if (t > t0) t0 = t }
          if (t0 > t1) ok = false
        }
        e += 1
      }
      if (ok && t0 <= t1) {
        val ax = x1 + t0 * dx; val ay = y1 + t0 * dy
        val bx = x1 + t1 * dx; val by = y1 + t1 * dy
        if (ax != bx || ay != by) {
          if (cur.isEmpty) { cur += ax += ay }
          else if (cur(cur.length - 2) != ax || cur(cur.length - 1) != ay) {
            flush(); cur += ax += ay
          }
          cur += bx += by
        }
      } else flush()
      i += 1
    }
    flush()
    out.toArray
  }
}

/** Structural equality with per-ordinate tolerance and the reference's
  * IgnoreOrder option (reference: geom/alg_exact_equals.go:72-96 —
  * ignores line direction, ring start-point rotation, interior-ring
  * order, and collection element order; alg_exact_equals.go:278-306
  * validPermutation for the element matching).
  */
object ExactEquals {
  def equalsWithTolerance(a: Geom, b: Geom, tol: Double,
                          ignoreOrder: Boolean = false): Boolean = {
    if (a.typeCode != b.typeCode || a.ct != b.ct) return false
    def eq(x: Double, y: Double): Boolean =
      x == y || math.abs(x - y) <= tol || (x.isNaN && y.isNaN)
    // XY tolerance is EUCLIDEAN (reference ToleranceXY: lengthSq of the
    // XY delta vs tol^2 — alg_exact_equals.go:54-60); Z/M per-ordinate
    def xyEq(x1: Double, y1: Double, x2: Double, y2: Double): Boolean = {
      if (x1 == x2 && y1 == y2) return true
      val dx = x1 - x2; val dy = y1 - y2
      dx * dx + dy * dy <= tol * tol
    }

    /** Curve comparison under the optional index mappings the
      * reference uses: identity, reversal, and (for rings) rotation —
      * alg_exact_equals.go:127-178.
      */
    def seqEq(s1: Seqn, s2: Seqn, allowRotation: Boolean): Boolean = {
      if (s1.n != s2.n || s1.ct != s2.ct) return false
      val n = s1.n
      val stride = CT.stride(s1.ct)
      def ptEq(i: Int, j: Int): Boolean = {
        if (!xyEq(s1.floats(i * stride), s1.floats(i * stride + 1),
          s2.floats(j * stride), s2.floats(j * stride + 1))) return false
        var k = 2
        while (k < stride) {
          if (!eq(s1.floats(i * stride + k), s2.floats(j * stride + k))) return false
          k += 1
        }
        true
      }
      def sameCurve(m1: Int => Int, m2: Int => Int): Boolean = {
        var i = 0
        while (i < n) { if (!ptEq(m1(i), m2(i))) return false; i += 1 }
        true
      }
      val ident = (i: Int) => i
      if (sameCurve(ident, ident)) return true
      if (!ignoreOrder || n == 0) return false
      val rev = (i: Int) => n - i - 1
      val closed = n >= 2 &&
        s1.x(0) == s1.x(n - 1) && s1.y(0) == s1.y(n - 1) &&
        s2.x(0) == s2.x(n - 1) && s2.y(0) == s2.y(n - 1)
      if (sameCurve(ident, rev)) return true
      if (!(allowRotation && closed) || n < 2) return false
      // ring rotation: the duplicated closing point folds into index 0
      var o = 1
      while (o < n) {
        val off = (i: Int) => (i + o) % (n - 1)
        if (sameCurve(ident, off) || sameCurve(rev, off)) return true
        o += 1
      }
      false
    }

    /** Permutation matching for collection elements
      * (alg_exact_equals.go:278-306): identity order unless
      * ignoreOrder, then backtracking over valid assignments.
      */
    def structureEq(n: Int, elemEq: (Int, Int) => Boolean): Boolean = {
      if (!ignoreOrder) return (0 until n).forall(i => elemEq(i, i))
      val choices = scala.collection.mutable.ArrayBuffer.range(0, n)
      def recurse(level: Int): Boolean = {
        if (choices.isEmpty) return true
        var i = 0
        while (i < choices.length) {
          val c = choices(i)
          if (elemEq(level, c)) {
            val lastIdx = choices.length - 1
            choices(i) = choices(lastIdx); choices(lastIdx) = c
            choices.remove(lastIdx)
            if (recurse(level + 1)) return true
            choices += c
            val tmp = choices(i); choices(i) = choices(choices.length - 1)
            choices(choices.length - 1) = tmp
          }
          i += 1
        }
        false
      }
      recurse(0)
    }

    def polyEq(r1: Array[Seqn], r2: Array[Seqn]): Boolean =
      r1.length == r2.length && (r1.isEmpty ||
        (seqEq(r1(0), r2(0), allowRotation = true) &&
          structureEq(r1.length - 1, (i, j) =>
            seqEq(r1(i + 1), r2(j + 1), allowRotation = true))))

    (a, b) match {
      case (p1: GPoint, p2: GPoint) =>
        p1.isEmpty == p2.isEmpty &&
          (p1.isEmpty ||
            (xyEq(p1.coords(0), p1.coords(1), p2.coords(0), p2.coords(1)) &&
              (2 until p1.coords.length).forall(i => eq(p1.coords(i), p2.coords(i)))))
      case (GLine(s1), GLine(s2)) => seqEq(s1, s2, allowRotation = false)
      case (GPoly(r1, _), GPoly(r2, _)) => polyEq(r1, r2)
      case (GMPoint(p1, _), GMPoint(p2, _)) =>
        p1.length == p2.length && structureEq(p1.length, (i, j) =>
          equalsWithTolerance(p1(i), p2(j), tol, ignoreOrder))
      case (GMLine(l1, _), GMLine(l2, _)) =>
        l1.length == l2.length && structureEq(l1.length, (i, j) =>
          seqEq(l1(i), l2(j), allowRotation = false))
      case (GMPoly(p1, _), GMPoly(p2, _)) =>
        p1.length == p2.length && structureEq(p1.length, (i, j) => polyEq(p1(i), p2(j)))
      case (GColl(g1, _), GColl(g2, _)) =>
        g1.length == g2.length && structureEq(g1.length, (i, j) =>
          equalsWithTolerance(g1(i), g2(j), tol, ignoreOrder))
      case _ => false
    }
  }
}

/** PointOnSurface (reference: geom/alg_point_on_surface.go): areal
  * geometries use the adjusted-Y horizontal bisector and return the
  * midpoint of the widest interior run; linear/puntal pick the
  * vertex nearest the centroid.
  */
object PointOnSurface {
  def compute(g: Geom): Geom = {
    if (g.isEmpty) return GPoint.empty
    if (g.dimension == 2) {
      arealPOS(g) match {
        case Some((x, y)) => return GPoint.xy(x, y)
        case None => () // zero-area areal (degenerate/empty polygons):
                        // fall through to the vertex-based lower-dim path
      }
    }
    // lineal/puntal (and degenerate-areal fallback): vertex nearest the
    // centroid; the reference uses a nearest-to-centroid accumulator
    // over vertices (alg_point_on_surface.go:8-37)
    val candidates = Algos.collectXYs(g)
    if (candidates.isEmpty) return GPoint.empty
    val c = Measure.centroid(g)
      .filter(p => !p._1.isNaN && !p._2.isNaN)
      .getOrElse(candidates.head)
    var best: (Double, Double) = null
    var bestD = Double.PositiveInfinity
    for ((x, y) <- candidates) {
      val d = Alg.distPointPoint(x, y, c._1, c._2)
      if (d < bestD) { bestD = d; best = (x, y) }
    }
    GPoint.xy(best._1, best._2)
  }

  private def arealPOS(g: Geom): Option[(Double, Double)] = {
    val env = g.envelope
    if (env.isEmpty) return None
    // adjusted bisector Y: nudge off vertex rows to avoid degeneracy
    var y = (env.ymin + env.ymax) / 2
    val ys = scala.collection.mutable.SortedSet.empty[Double]
    Geom.transformSeq(g, s => { var i = 0; while (i < s.n) { ys += s.y(i); i += 1 }; s })
    if (ys.contains(y)) {
      val lower = ys.rangeUntil(y).lastOption.getOrElse(env.ymin)
      val higher = ys.rangeFrom(y).headOption.getOrElse(env.ymax)
      val cand = (lower + higher) / 2
      if (cand != y) y = cand
    }
    // intersect horizontal line with all areal rings; collect xs
    val xs = scala.collection.mutable.ArrayBuffer.empty[Double]
    def ringXs(r: Seqn): Unit = {
      var i = 0
      while (i < r.n - 1) {
        val y1 = r.y(i); val y2 = r.y(i + 1)
        if ((y1 > y) != (y2 > y)) {
          val t = (y - y1) / (y2 - y1)
          xs += r.x(i) + t * (r.x(i + 1) - r.x(i))
        }
        i += 1
      }
    }
    def walk(g: Geom): Unit = g match {
      case GPoly(rs, _) => rs.foreach(ringXs)
      case GMPoly(ps, _) => ps.foreach(_.foreach(ringXs))
      case GColl(gs, _) => gs.foreach(walk)
      case _ =>
    }
    walk(g)
    val sorted = xs.sorted
    var best: Option[(Double, Double)] = None
    var bestW = -1.0
    var i = 0
    while (i + 1 < sorted.length) {
      val w = sorted(i + 1) - sorted(i)
      val mx = (sorted(i) + sorted(i + 1)) / 2
      if (w > bestW && Alg.pointInAreal(g, mx, y) == 1) {
        bestW = w; best = Some((mx, y))
      }
      i += 2
    }
    best
  }
}

/** Cartographic projections as pure XY->XY maps
  * (reference: carto/proj_web_mercator.go:30-57,
  * carto/proj_sinusoidal.go:37-63,
  * carto/proj_lambert_cylindrical_equal_area.go:37-63,
  * carto/proj_equirectangular.go:46-74). Spec strings:
  * "webmercator" (zoom 0), "webmercator:z", "sinusoidal",
  * "lambertcyl", "equirect". Suffix ":inv" applies the reverse map.
  */
object Projections {
  /** WGS84 ellipsoid mean radius, matching the reference's carto
    * constant (reference: carto/radius.go WGS84EllipsoidMeanRadiusM).
    */
  private final val R = (2 * 6378137.0 + 6356752.314245) / 3

  def forward(g: Geom, spec0: String): Geom = {
    val inv = spec0.endsWith(":inv")
    val spec = if (inv) spec0.dropRight(4) else spec0
    val fn: (Double, Double) => (Double, Double) = spec match {
      case s if s.startsWith("webmercator") =>
        val zoom = s.split(':') match {
          case Array(_, z) => z.toInt
          case _ => 0
        }
        val p = (1L << zoom).toDouble
        if (!inv) (lon, lat) => {
          val phi = math.toRadians(lat)
          ((lon + 180) / 360 * p,
            (math.Pi - math.log(math.tan(math.Pi / 4 + phi / 2))) * p / (2 * math.Pi))
        } else (x, y) => {
          (x / p * 360 - 180,
            math.toDegrees(2 * (math.atan(math.exp(math.Pi - 2 * math.Pi * y / p)) - math.Pi / 4)))
        }
      case "sinusoidal" =>
        if (!inv) (lon, lat) => {
          val phi = math.toRadians(lat)
          (R * math.toRadians(lon) * math.cos(phi), R * phi)
        } else (x, y) => {
          val phi = y / R
          (math.toDegrees(x / (R * math.cos(phi))), math.toDegrees(phi))
        }
      case "lambertcyl" =>
        if (!inv) (lon, lat) =>
          (R * math.toRadians(lon), R * math.sin(math.toRadians(lat)))
        else (x, y) =>
          (math.toDegrees(x / R), math.toDegrees(math.asin(y / R)))
      case "equirect" =>
        if (!inv) (lon, lat) => (R * math.toRadians(lon), R * math.toRadians(lat))
        else (x, y) => (math.toDegrees(x / R), math.toDegrees(y / R))

      // conic / azimuthal projections, spherical Snyder forms
      // (reference: carto/proj_lambert_conformal_conic.go:45-92,
      //  proj_albers_equal_area_conic.go:43-102,
      //  proj_equidistant_conic.go:48-113, proj_orthographic.go:46-78,
      //  proj_azimuthal_equidistant.go:39-76 — all "Map Projections: A
      //  Working Manual", Snyder, USGS PP 1395)
      case s if s.startsWith("lcc") =>
        val Array(_, a1, a2, a3, a4) = padSpec(s, 5)
        val phi1 = math.toRadians(a1.toDouble); val phi2 = math.toRadians(a2.toDouble)
        val lam0 = math.toRadians(a3.toDouble); val phi0 = math.toRadians(a4.toDouble)
        val n =
          if (phi1 == phi2) math.sin(phi1)
          else math.log(math.cos(phi1) / math.cos(phi2)) /
            math.log(math.tan(math.Pi / 4 + phi2 / 2) / math.tan(math.Pi / 4 + phi1 / 2))
        val F = math.cos(phi1) * math.pow(math.tan(math.Pi / 4 + phi1 / 2), n) / n
        val rho0 = R * F / math.pow(math.tan(math.Pi / 4 + phi0 / 2), n)
        if (!inv) (lon, lat) => {
          val phi = math.toRadians(lat); val lam = math.toRadians(lon)
          val rho = R * F / math.pow(math.tan(math.Pi / 4 + phi / 2), n)
          (rho * math.sin(n * (lam - lam0)), rho0 - rho * math.cos(n * (lam - lam0)))
        } else (x, y) => {
          val rho = math.signum(n) * math.sqrt(x * x + (rho0 - y) * (rho0 - y))
          val theta = math.atan2(x, rho0 - y)
          val phi = 2 * math.atan(math.pow(R * F / rho, 1 / n)) - math.Pi / 2
          (math.toDegrees(lam0 + theta / n), math.toDegrees(phi))
        }
      case s if s.startsWith("albers") =>
        val Array(_, a1, a2, a3, a4) = padSpec(s, 5)
        val phi1 = math.toRadians(a1.toDouble); val phi2 = math.toRadians(a2.toDouble)
        val lam0 = math.toRadians(a3.toDouble); val phi0 = math.toRadians(a4.toDouble)
        val n = (math.sin(phi1) + math.sin(phi2)) / 2
        val c = math.cos(phi1) * math.cos(phi1) + 2 * n * math.sin(phi1)
        val rho0 = R * math.sqrt(c - 2 * n * math.sin(phi0)) / n
        if (!inv) (lon, lat) => {
          val phi = math.toRadians(lat); val lam = math.toRadians(lon)
          val rho = R * math.sqrt(c - 2 * n * math.sin(phi)) / n
          val theta = n * (lam - lam0)
          (rho * math.sin(theta), rho0 - rho * math.cos(theta))
        } else (x, y) => {
          val rho = math.sqrt(x * x + (rho0 - y) * (rho0 - y))
          val theta = math.atan2(x, rho0 - y)
          val phi = math.asin((c - (rho * n / R) * (rho * n / R)) / (2 * n))
          (math.toDegrees(lam0 + theta / n), math.toDegrees(phi))
        }
      case s if s.startsWith("eqdc") =>
        val Array(_, a1, a2, a3, a4) = padSpec(s, 5)
        val phi1 = math.toRadians(a1.toDouble); val phi2 = math.toRadians(a2.toDouble)
        val lam0 = math.toRadians(a3.toDouble); val phi0 = math.toRadians(a4.toDouble)
        val n =
          if (phi1 == phi2) math.sin(phi1)
          else (math.cos(phi1) - math.cos(phi2)) / (phi2 - phi1)
        val gg = math.cos(phi1) / n + phi1
        val rho0 = R * (gg - phi0)
        if (!inv) (lon, lat) => {
          val phi = math.toRadians(lat); val lam = math.toRadians(lon)
          val rho = R * (gg - phi)
          val theta = n * (lam - lam0)
          (rho * math.sin(theta), rho0 - rho * math.cos(theta))
        } else (x, y) => {
          val rho = math.signum(n) * math.sqrt(x * x + (rho0 - y) * (rho0 - y))
          val theta = math.atan2(x, rho0 - y)
          (math.toDegrees(lam0 + theta / n), math.toDegrees(gg - rho / R))
        }
      case s if s.startsWith("ortho") =>
        val Array(_, a1, a2) = padSpec(s, 3)
        val lam0 = math.toRadians(a1.toDouble); val phi0 = math.toRadians(a2.toDouble)
        if (!inv) (lon, lat) => {
          val phi = math.toRadians(lat); val lam = math.toRadians(lon)
          (R * math.cos(phi) * math.sin(lam - lam0),
            R * (math.cos(phi0) * math.sin(phi) -
              math.sin(phi0) * math.cos(phi) * math.cos(lam - lam0)))
        } else (x, y) => {
          val rho = math.sqrt(x * x + y * y)
          if (rho == 0) (math.toDegrees(lam0), math.toDegrees(phi0))
          else {
            val cc = math.asin(math.min(1.0, rho / R))
            val phi = math.asin(math.cos(cc) * math.sin(phi0) +
              y * math.sin(cc) * math.cos(phi0) / rho)
            val lam = lam0 + math.atan2(x * math.sin(cc),
              rho * math.cos(cc) * math.cos(phi0) - y * math.sin(cc) * math.sin(phi0))
            (math.toDegrees(lam), math.toDegrees(phi))
          }
        }
      case s if s.startsWith("aeqd") =>
        val Array(_, a1, a2) = padSpec(s, 3)
        val lam0 = math.toRadians(a1.toDouble); val phi0 = math.toRadians(a2.toDouble)
        if (!inv) (lon, lat) => {
          val phi = math.toRadians(lat); val lam = math.toRadians(lon)
          val cosc = math.sin(phi0) * math.sin(phi) +
            math.cos(phi0) * math.cos(phi) * math.cos(lam - lam0)
          val cc = math.acos(math.max(-1.0, math.min(1.0, cosc)))
          val kp = if (cc == 0) 1.0 else cc / math.sin(cc)
          (R * kp * math.cos(phi) * math.sin(lam - lam0),
            R * kp * (math.cos(phi0) * math.sin(phi) -
              math.sin(phi0) * math.cos(phi) * math.cos(lam - lam0)))
        } else (x, y) => {
          val rho = math.sqrt(x * x + y * y)
          if (rho == 0) (math.toDegrees(lam0), math.toDegrees(phi0))
          else {
            val cc = rho / R
            val phi = math.asin(math.cos(cc) * math.sin(phi0) +
              y * math.sin(cc) * math.cos(phi0) / rho)
            val lam = lam0 + math.atan2(x * math.sin(cc),
              rho * math.cos(cc) * math.cos(phi0) - y * math.sin(cc) * math.sin(phi0))
            (math.toDegrees(lam), math.toDegrees(phi))
          }
        }
      case s if s.startsWith("utm") =>
        // Snyder ellipsoidal transverse Mercator, WGS84 constants
        // (reference: carto/proj_utm.go:133-230)
        val code = s.split(':')(1)
        require(code.length == 3, s"bad UTM code '$code' (e.g. 56S)")
        val zone = code.take(2).toInt
        require(zone >= 1 && zone <= 60, s"UTM zone $zone out of range")
        val north = code(2) == 'N' || code(2) == 'n'
        val lam0 = math.toRadians((zone - 1) * 6 - 180 + 3.0)
        val n0 = if (north) 0.0 else 10e6
        val aa = 6378137.0; val k0 = 0.9996; val e2 = 0.00669438; val e0 = 500e3
        val ep2 = e2 / (1 - e2)
        val e4 = e2 * e2; val e6 = e4 * e2
        if (!inv) (lon, lat) => {
          val phi = math.toRadians(lat); val lam = math.toRadians(lon)
          val nN = aa / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
          val t = math.tan(phi) * math.tan(phi)
          val c = ep2 * math.cos(phi) * math.cos(phi)
          val a1 = (lam - lam0) * math.cos(phi)
          val m = aa * ((1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi -
            (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi) +
            (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi) -
            (35 * e6 / 3072) * math.sin(6 * phi))
          val a2 = a1 * a1; val a3 = a2 * a1; val a4 = a3 * a1
          val a5 = a4 * a1; val a6 = a5 * a1
          val x = e0 + k0 * nN * (a1 + (1 - t + c) * a3 / 6 +
            (5 - 18 * t + t * t + 72 * c - 58 * ep2) * a5 / 120)
          val y = n0 + k0 * (m + nN * math.tan(phi) * (a2 / 2 +
            (5 - t + 9 * c + 4 * c * c) * a4 / 24 +
            (61 - 58 * t + t * t + 600 * c - 330 * ep2) * a6 / 720))
          (x, y)
        } else (x0, y0) => {
          val x = x0 - e0; val y = y0 - n0
          val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
          val m = y / k0
          val mu = m / (aa * (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
          val e12 = e1 * e1; val e13 = e12 * e1; val e14 = e13 * e1
          val phi1 = mu + (3 * e1 / 2 - 27 * e13 / 32) * math.sin(2 * mu) +
            (21 * e12 / 16 - 55 * e14 / 32) * math.sin(4 * mu) +
            (151 * e13 / 96) * math.sin(6 * mu) +
            (1097 * e14 / 512) * math.sin(8 * mu)
          val c1 = ep2 * math.cos(phi1) * math.cos(phi1)
          val t1 = math.tan(phi1) * math.tan(phi1)
          val n1 = aa / math.sqrt(1 - e2 * math.sin(phi1) * math.sin(phi1))
          val r1 = aa * (1 - e2) / math.pow(1 - e2 * math.sin(phi1) * math.sin(phi1), 1.5)
          val d = x / (n1 * k0)
          val d2 = d * d; val d3 = d2 * d; val d4 = d3 * d; val d5 = d4 * d; val d6 = d5 * d
          val phi = phi1 - (n1 * math.tan(phi1) / r1) * (d2 / 2 -
            (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * d4 / 24 +
            (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) * d6 / 720)
          val lam = lam0 + (d - (1 + 2 * t1 + c1) * d3 / 6 +
            (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) * d5 / 120) /
            math.cos(phi1)
          (math.toDegrees(lam), math.toDegrees(phi))
        }
      case other => throw new IllegalArgumentException(s"unknown projection '$other'")
    }
    Geom.transformXY(g, fn)
  }

  /** Split a spec like "lcc:33:45:-96:23" into exactly n fields,
    * padding missing numeric parameters with "0".
    */
  private def padSpec(s: String, n: Int): Array[String] = {
    val parts = s.split(':')
    (parts ++ Array.fill(math.max(0, n - parts.length))("0")).take(n)
  }
}
