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

    throw new UnsupportedOperationException(
      "st_intersection currently requires at least one convex areal operand " +
        "(general OverlayNG-style noding lands in a later phase)")
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

/** Structural equality with per-ordinate tolerance
  * (reference: geom/alg_exact_equals.go:98; the IgnoreOrder option is
  * not yet implemented).
  */
object ExactEquals {
  def equalsWithTolerance(a: Geom, b: Geom, tol: Double): Boolean = {
    if (a.typeCode != b.typeCode || a.ct != b.ct) return false
    def eq(x: Double, y: Double): Boolean =
      x == y || math.abs(x - y) <= tol || (x.isNaN && y.isNaN)
    def seqEq(s1: Seqn, s2: Seqn): Boolean =
      s1.n == s2.n && s1.ct == s2.ct &&
        s1.floats.indices.forall(i => eq(s1.floats(i), s2.floats(i)))
    (a, b) match {
      case (p1: GPoint, p2: GPoint) =>
        p1.isEmpty == p2.isEmpty &&
          (p1.isEmpty || p1.coords.indices.forall(i => eq(p1.coords(i), p2.coords(i))))
      case (GLine(s1), GLine(s2)) => seqEq(s1, s2)
      case (GPoly(r1, _), GPoly(r2, _)) =>
        r1.length == r2.length && r1.indices.forall(i => seqEq(r1(i), r2(i)))
      case (GMPoint(p1, _), GMPoint(p2, _)) =>
        p1.length == p2.length && p1.indices.forall(i => equalsWithTolerance(p1(i), p2(i), tol))
      case (GMLine(l1, _), GMLine(l2, _)) =>
        l1.length == l2.length && l1.indices.forall(i => seqEq(l1(i), l2(i)))
      case (GMPoly(p1, ct1), GMPoly(p2, ct2)) =>
        p1.length == p2.length && p1.indices.forall(i =>
          equalsWithTolerance(GPoly(p1(i), ct1), GPoly(p2(i), ct2), tol))
      case (GColl(g1, _), GColl(g2, _)) =>
        g1.length == g2.length && g1.indices.forall(i => equalsWithTolerance(g1(i), g2(i), tol))
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
    if (g.dimension == 2) arealPOS(g).map { case (x, y) => GPoint.xy(x, y) }
      .getOrElse(GPoint.empty)
    else {
      val c = Measure.centroid(g).getOrElse(return GPoint.empty)
      var best: (Double, Double) = null
      var bestD = Double.PositiveInfinity
      val candidates = g.dimension match {
        case 0 => Algos.collectXYs(g)
        case _ =>
          // linear: midpoints of segments and vertices are candidates;
          // the reference uses a nearest-to-centroid accumulator over
          // vertices (alg_point_on_surface.go:8-37)
          Algos.collectXYs(g)
      }
      for ((x, y) <- candidates) {
        val d = Alg.distPointPoint(x, y, c._1, c._2)
        if (d < bestD) { bestD = d; best = (x, y) }
      }
      if (best == null) GPoint.empty else GPoint.xy(best._1, best._2)
    }
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
  private final val R = 6371000.0 // reference carto uses earth radius for the non-tile projections

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
      case other => throw new IllegalArgumentException(s"unknown projection '$other'")
    }
    Geom.transformXY(g, fn)
  }
}
