package graft.core

/** Area / length / centroid (reference: geom/type_polygon.go:398-502,
  * geom/type_line_string.go:314-351, geom/type_geometry.go:515-571,
  * geom/type_geometry_collection.go:319-416).
  */
object Measure {

  /** Area of areal components; 0 for points/lines
    * (reference: geom/type_geometry.go:550-571). Holes subtract.
    */
  def area(g: Geom): Double = g match {
    case GPoly(rings, _) =>
      if (rings.isEmpty) 0.0
      else {
        var a = math.abs(Alg.signedRingArea(rings(0)))
        var i = 1
        while (i < rings.length) { a -= math.abs(Alg.signedRingArea(rings(i))); i += 1 }
        a
      }
    case GMPoly(ps, ct) => ps.iterator.map(rs => area(GPoly(rs, ct))).sum
    case GColl(gs, _)   => gs.iterator.map(area).sum
    case _ => 0.0
  }

  /** Signed area (reference: geom/type_polygon.go:388-414 SignedArea
    * option): positive for CCW shells with CW holes, negative for the
    * opposite winding; ring areas SUM without abs, so consistent
    * windings cancel holes correctly. Non-areal inputs contribute 0.
    */
  def signedArea(g: Geom): Double = g match {
    case GPoly(rings, _) =>
      var a = 0.0
      var i = 0
      while (i < rings.length) { a += Alg.signedRingArea(rings(i)); i += 1 }
      a
    case GMPoly(ps, ct) => ps.iterator.map(rs => signedArea(GPoly(rs, ct))).sum
    case GColl(gs, _)   => gs.iterator.map(signedArea).sum
    case _ => 0.0
  }

  /** Sum of segment lengths of 1-D components
    * (reference: geom/type_geometry.go:515-539 — areal/point types
    * contribute 0; only LineString lengths count).
    */
  def length(g: Geom): Double = g match {
    case GLine(s) => seqLength(s)
    case GMLine(ls, _) => ls.iterator.map(seqLength).sum
    case GColl(gs, _) => gs.iterator.map(length).sum
    case _ => 0.0
  }

  def seqLength(s: Seqn): Double = {
    var sum = 0.0
    var i = 0
    while (i < s.n - 1) {
      sum += Alg.distPointPoint(s.x(i), s.y(i), s.x(i + 1), s.y(i + 1))
      i += 1
    }
    sum
  }

  /** Centroid; empty input -> None.
    * Type-weighted like the reference: areal parts dominate linear parts
    * dominate puntal parts (geom/type_geometry_collection.go:319-416).
    */
  def centroid(g: Geom): Option[(Double, Double)] = {
    val (sx2, sy2, w2) = arealCentroidSum(g)
    if (w2 > 0) return Some((sx2 / w2, sy2 / w2))
    // zero-area degenerate areal input: fall back to the length-weighted
    // centroid over lines INCLUDING polygon rings treated as lines
    // (JTS-compatible degenerate behavior; see TestCentroid.xml
    // "invalid box" / "degenerate box" cases)
    val (sx1, sy1, w1) = linearCentroidSum(withRingsAsLines(g))
    if (w1 > 0) return Some((sx1 / w1, sy1 / w1))
    // fully degenerate: average of point components plus the FIRST
    // vertex of each zero-length line / ring (JTS Centroid's
    // addLineSegments degenerate fallback)
    var sx0 = 0.0; var sy0 = 0.0; var n0 = 0
    def addPt(x: Double, y: Double): Unit = { sx0 += x; sy0 += y; n0 += 1 }
    def walk(gg: Geom): Unit = gg match {
      case p: GPoint => if (!p.isEmpty) addPt(p.x, p.y)
      case GMPoint(ps, _) => ps.foreach(walk)
      case GLine(s) => if (s.n > 0) addPt(s.x(0), s.y(0))
      case GMLine(ls, _) => ls.foreach(s => if (s.n > 0) addPt(s.x(0), s.y(0)))
      case GPoly(rs, _) => rs.foreach(r => if (r.n > 0) addPt(r.x(0), r.y(0)))
      case GMPoly(ps, _) => ps.foreach(_.foreach(r => if (r.n > 0) addPt(r.x(0), r.y(0))))
      case GColl(gs, _) => gs.foreach(walk)
    }
    walk(g)
    if (n0 > 0) Some((sx0 / n0, sy0 / n0)) else None
  }

  /** Rewrites areal parts as their rings-as-lines, keeping other parts. */
  private def withRingsAsLines(g: Geom): Geom = g match {
    case GPoly(rings, ct) => GMLine(rings, ct)
    case GMPoly(ps, ct) => GMLine(ps.flatten, ct)
    case GColl(gs, ct) => GColl(gs.map(withRingsAsLines), ct)
    case other => other
  }

  /** (sum(cx*area), sum(cy*area), sum(area)) over areal parts using the
    * shoelace centroid (reference: geom/type_polygon.go:444-502).
    */
  private def arealCentroidSum(g: Geom): (Double, Double, Double) = g match {
    case GPoly(rings, _) =>
      var sx = 0.0; var sy = 0.0; var sa = 0.0
      // offset origin to the polygon's first vertex before the shoelace
      // sums — the standard numerical-stability trick for thin/remote
      // polygons (matches JTS Centroid's setAreaBasePoint behavior)
      val bx = if (rings.nonEmpty && rings(0).n > 0) rings(0).x(0) else 0.0
      val by = if (rings.nonEmpty && rings(0).n > 0) rings(0).y(0) else 0.0
      var i = 0
      while (i < rings.length) {
        val r = rings(i)
        var cx = 0.0; var cy = 0.0; var a2 = 0.0
        var j = 0
        while (j < r.n - 1) {
          val x1 = r.x(j) - bx; val y1 = r.y(j) - by
          val x2 = r.x(j + 1) - bx; val y2 = r.y(j + 1) - by
          val cross = x1 * y2 - x2 * y1
          a2 += cross
          cx += (x1 + x2) * cross
          cy += (y1 + y2) * cross
          j += 1
        }
        val a = a2 / 2.0
        // ring centroid * ring area, sign-corrected: shell positive,
        // holes negative regardless of stored winding
        val aAbs = math.abs(a)
        val sign = if (i == 0) 1.0 else -1.0
        if (a != 0) {
          sx += sign * (bx + cx / (6.0 * a)) * aAbs
          sy += sign * (by + cy / (6.0 * a)) * aAbs
          sa += sign * aAbs
        }
        i += 1
      }
      (sx, sy, sa)
    case GMPoly(ps, ct) =>
      var sx = 0.0; var sy = 0.0; var sa = 0.0
      ps.foreach { rs =>
        val (x, y, a) = arealCentroidSum(GPoly(rs, ct))
        sx += x; sy += y; sa += a
      }
      (sx, sy, sa)
    case GColl(gs, _) =>
      var sx = 0.0; var sy = 0.0; var sa = 0.0
      gs.foreach { gg =>
        val (x, y, a) = arealCentroidSum(gg)
        sx += x; sy += y; sa += a
      }
      (sx, sy, sa)
    case _ => (0.0, 0.0, 0.0)
  }

  /** Length-weighted segment midpoints
    * (reference: geom/type_line_string.go:327-351).
    */
  private def linearCentroidSum(g: Geom): (Double, Double, Double) = g match {
    case GLine(s) =>
      var sx = 0.0; var sy = 0.0; var sl = 0.0
      var i = 0
      while (i < s.n - 1) {
        val len = Alg.distPointPoint(s.x(i), s.y(i), s.x(i + 1), s.y(i + 1))
        sx += (s.x(i) + s.x(i + 1)) / 2 * len
        sy += (s.y(i) + s.y(i + 1)) / 2 * len
        sl += len
        i += 1
      }
      (sx, sy, sl)
    case GMLine(ls, _) =>
      var sx = 0.0; var sy = 0.0; var sl = 0.0
      ls.foreach { s =>
        val (x, y, l) = linearCentroidSum(GLine(s))
        sx += x; sy += y; sl += l
      }
      (sx, sy, sl)
    case GColl(gs, _) =>
      var sx = 0.0; var sy = 0.0; var sl = 0.0
      gs.foreach { gg =>
        val (x, y, l) = linearCentroidSum(gg)
        sx += x; sy += y; sl += l
      }
      (sx, sy, sl)
    case _ => (0.0, 0.0, 0.0)
  }

  private def pointCentroidSum(g: Geom): (Double, Double, Int) = g match {
    case p: GPoint if !p.isEmpty => (p.x, p.y, 1)
    case GMPoint(pts, _) =>
      var sx = 0.0; var sy = 0.0; var n = 0
      pts.foreach { p => if (!p.isEmpty) { sx += p.x; sy += p.y; n += 1 } }
      (sx, sy, n)
    case GColl(gs, _) =>
      var sx = 0.0; var sy = 0.0; var n = 0
      gs.foreach { gg =>
        val (x, y, m) = pointCentroidSum(gg)
        sx += x; sy += y; n += m
      }
      (sx, sy, n)
    case _ => (0.0, 0.0, 0)
  }

  private def vertexSum(g: Geom): (Double, Double, Int) = {
    var sx = 0.0; var sy = 0.0; var n = 0
    Geom.transformSeq(g, s => {
      var i = 0
      while (i < s.n) { sx += s.x(i); sy += s.y(i); n += 1; i += 1 }
      s
    })
    (sx, sy, n)
  }
}
