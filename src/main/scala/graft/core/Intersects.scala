package graft.core

import scala.collection.mutable

/** Fast Intersects + Distance, mirroring the reference's native fast
  * paths (geom/alg_intersects.go: full type dispatch, R-tree on the
  * smaller side for line-vs-line; geom/alg_distance.go:13-101: index the
  * larger side, best-first search with bound pruning).
  */
object Intersects {

  private final case class Flat(
      pts: Array[Double],          // xy pairs
      segs: Array[Double],         // x1,y1,x2,y2 quads (lines + rings)
      polys: Array[GPoly],
      lineStarts: Array[Double])   // representative xy per lineal part (for containment tests)

  private def flatten(g: Geom): Flat = {
    val pts = new mutable.ArrayBuilder.ofDouble
    val segs = new mutable.ArrayBuilder.ofDouble
    val reps = new mutable.ArrayBuilder.ofDouble
    val polys = mutable.ArrayBuffer.empty[GPoly]
    def seqSegs(s: Seqn): Unit = {
      var i = 0
      while (i < s.n - 1) {
        segs += s.x(i) += s.y(i) += s.x(i + 1) += s.y(i + 1)
        i += 1
      }
      if (s.n == 1) { pts += s.x(0) += s.y(0) }
      if (s.n > 0) { reps += s.x(0) += s.y(0) }
    }
    def walk(g: Geom): Unit = g match {
      case p: GPoint => if (!p.isEmpty) { pts += p.x += p.y }
      case GLine(s) => seqSegs(s)
      case gp @ GPoly(rs, _) =>
        if (rs.nonEmpty) { polys += gp; rs.foreach(seqSegs) }
      case GMPoint(ps, _) => ps.foreach(walk)
      case GMLine(ls, _) => ls.foreach(s => seqSegs(s))
      case GMPoly(ps, ct) => ps.foreach(rs => walk(GPoly(rs, ct)))
      case GColl(gs, _) => gs.foreach(walk)
    }
    walk(g)
    Flat(pts.result(), segs.result(), polys.toArray, reps.result())
  }

  def intersects(a: Geom, b: Geom): Boolean = {
    if (a.isEmpty || b.isEmpty) return false
    if (!a.envelope.intersects(b.envelope)) return false
    // single-point fast path (the dominant join probe shape)
    (a, b) match {
      case (p: GPoint, other @ (_: GPoly | _: GMPoly)) =>
        return Alg.pointInAreal(other, p.x, p.y) >= 0
      case (other @ (_: GPoly | _: GMPoly), p: GPoint) =>
        return Alg.pointInAreal(other, p.x, p.y) >= 0
      case _ =>
    }
    val fa = flatten(a)
    val fb = flatten(b)

    // point of A on B / inside B's areal parts (and vice versa)
    if (anyPointTouches(fa.pts, fb)) return true
    if (anyPointTouches(fb.pts, fa)) return true

    // segment-segment intersection: index the smaller side
    // (reference: geom/alg_intersects.go:188-205)
    if (fa.segs.nonEmpty && fb.segs.nonEmpty) {
      val (small, large) =
        if (fa.segs.length <= fb.segs.length) (fa.segs, fb.segs) else (fb.segs, fa.segs)
      val nSmall = small.length / 4
      if (nSmall > 8) {
        val envs = new Array[Env](nSmall)
        var i = 0
        while (i < nSmall) {
          val o = i * 4
          envs(i) = Env(math.min(small(o), small(o + 2)), math.min(small(o + 1), small(o + 3)),
            math.max(small(o), small(o + 2)), math.max(small(o + 1), small(o + 3)))
          i += 1
        }
        val tree = RTree.bulkLoad(envs)
        var j = 0
        while (j < large.length) {
          val e = Env(math.min(large(j), large(j + 2)), math.min(large(j + 1), large(j + 3)),
            math.max(large(j), large(j + 2)), math.max(large(j + 1), large(j + 3)))
          var hit = false
          tree.rangeSearch(e) { i =>
            val o = i * 4
            if (Alg.segmentsIntersect(small(o), small(o + 1), small(o + 2), small(o + 3),
              large(j), large(j + 1), large(j + 2), large(j + 3))) { hit = true; false }
            else true
          }
          if (hit) return true
          j += 4
        }
      } else {
        var i = 0
        while (i < small.length) {
          var j = 0
          while (j < large.length) {
            if (Alg.segmentsIntersect(small(i), small(i + 1), small(i + 2), small(i + 3),
              large(j), large(j + 1), large(j + 2), large(j + 3))) return true
            j += 4
          }
          i += 4
        }
      }
    }

    // containment without boundary contact: representative vertex of each
    // lineal/areal part of A inside B's areal parts, and vice versa
    if (fb.polys.nonEmpty) {
      var i = 0
      while (i < fa.lineStarts.length) {
        if (locInPolys(fb.polys, fa.lineStarts(i), fa.lineStarts(i + 1)) >= 0) return true
        i += 2
      }
    }
    if (fa.polys.nonEmpty) {
      var i = 0
      while (i < fb.lineStarts.length) {
        if (locInPolys(fa.polys, fb.lineStarts(i), fb.lineStarts(i + 1)) >= 0) return true
        i += 2
      }
    }
    false
  }

  private def locInPolys(polys: Array[GPoly], x: Double, y: Double): Int = {
    var best = -1
    var i = 0
    while (i < polys.length && best != 1) {
      val l = Alg.pointInPolygon(polys(i), x, y)
      if (l > best) best = l
      i += 1
    }
    best
  }

  private def anyPointTouches(pts: Array[Double], other: Flat): Boolean = {
    var i = 0
    while (i < pts.length) {
      val x = pts(i); val y = pts(i + 1)
      if (locInPolys(other.polys, x, y) >= 0) return true
      var j = 0
      while (j < other.segs.length) {
        if (Alg.onSegment(other.segs(j), other.segs(j + 1), other.segs(j + 2), other.segs(j + 3), x, y))
          return true
        j += 4
      }
      var k = 0
      while (k < other.pts.length) {
        if (other.pts(k) == x && other.pts(k + 1) == y) return true
        k += 2
      }
      i += 2
    }
    false
  }

  // ------------------------------------------------------------ distance

  /** Min Euclidean distance between geometries; None if either empty
    * (reference: geom/alg_distance.go:13-101).
    */
  def distance(a: Geom, b: Geom): Option[Double] = {
    if (a.isEmpty || b.isEmpty) return None
    if (intersects(a, b)) return Some(0.0)
    Some(nearestWitness(a, b)._1)
  }

  /** The closest pair of points (p on a, q on b) realizing
    * distance(a, b). Intersecting inputs yield one deterministic
    * shared point at both ends (point-on-surface of the overlay
    * intersection); None if either input is empty. PostGIS
    * ST_ClosestPoint / ST_ShortestLine semantics.
    */
  def closestPoints(a: Geom, b: Geom): Option[(Double, Double, Double, Double)] = {
    if (a.isEmpty || b.isEmpty) return None
    if (intersects(a, b)) {
      val shared = SetOps.intersection(a, b) match {
        case g if !g.isEmpty => PointOnSurface.compute(g)
        case _ => PointOnSurface.compute(a) // snap-collapsed: any point of a
      }
      shared match {
        case p: GPoint if !p.isEmpty =>
          return Some((p.coords(0), p.coords(1), p.coords(0), p.coords(1)))
        case _ => // fall through to the witness search (degenerate)
      }
    }
    val w = nearestWitness(a, b)
    Some((w._2, w._3, w._4, w._5))
  }

  /** Discrete symmetric Hausdorff distance: max over control vertices
    * of each side of the exact point-to-geometry distance to the other
    * (GEOS DiscreteHausdorffDistance without densification). None if
    * either side is empty.
    */
  def hausdorff(a: Geom, b: Geom): Option[Double] = {
    if (a.isEmpty || b.isEmpty) return None
    def directed(from: Geom, to: Geom): Double = {
      var worst = 0.0
      Geom.transformSeq(from, s => {
        var i = 0
        while (i < s.n) {
          val d = distance(GPoint(Array(s.x(i), s.y(i)), CT.XY), to).getOrElse(0.0)
          if (d > worst) worst = d
          i += 1
        }
        s
      })
      worst
    }
    Some(math.max(directed(a, b), directed(b, a)))
  }

  /** (dist, px, py, qx, qy) with p on a and q on b — requires both
    * non-empty and non-intersecting.
    */
  private def nearestWitness(a: Geom, b: Geom): (Double, Double, Double, Double, Double) = {
    val fa = flatten(a)
    val fb = flatten(b)
    // items: points and segments; index the larger side
    val na = fa.pts.length / 2 + fa.segs.length / 4
    val nb = fb.pts.length / 2 + fb.segs.length / 4
    val (probe, build) = if (na <= nb) (fa, fb) else (fb, fa)

    val nPts = build.pts.length / 2
    val nSegs = build.segs.length / 4
    val envs = new Array[Env](nPts + nSegs)
    var i = 0
    while (i < nPts) { envs(i) = Env.ofPt(build.pts(2 * i), build.pts(2 * i + 1)); i += 1 }
    i = 0
    while (i < nSegs) {
      val o = i * 4
      envs(nPts + i) = Env(
        math.min(build.segs(o), build.segs(o + 2)), math.min(build.segs(o + 1), build.segs(o + 3)),
        math.max(build.segs(o), build.segs(o + 2)), math.max(build.segs(o + 1), build.segs(o + 3)))
      i += 1
    }
    val tree = RTree.bulkLoad(envs)

    val pPts = probe.pts.length / 2
    val pSegs = probe.segs.length / 4
    val penvs = new Array[Env](pPts + pSegs)
    i = 0
    while (i < pPts) { penvs(i) = Env.ofPt(probe.pts(2 * i), probe.pts(2 * i + 1)); i += 1 }
    i = 0
    while (i < pSegs) {
      val o = i * 4
      penvs(pPts + i) = Env(
        math.min(probe.segs(o), probe.segs(o + 2)), math.min(probe.segs(o + 1), probe.segs(o + 3)),
        math.max(probe.segs(o), probe.segs(o + 2)), math.max(probe.segs(o + 1), probe.segs(o + 3)))
      i += 1
    }
    val ptree = RTree.bulkLoad(penvs)

    var best = Double.PositiveInfinity
    def pairDist(pid: Int, rid: Int): Double = {
      val pIsSeg = pid >= pPts
      val px = if (pIsSeg) probe.segs((pid - pPts) * 4) else probe.pts(2 * pid)
      val py = if (pIsSeg) probe.segs((pid - pPts) * 4 + 1) else probe.pts(2 * pid + 1)
      val qx2 = if (pIsSeg) probe.segs((pid - pPts) * 4 + 2) else 0.0
      val qy2 = if (pIsSeg) probe.segs((pid - pPts) * 4 + 3) else 0.0
      if (rid < nPts) {
        val bx = build.pts(2 * rid); val by = build.pts(2 * rid + 1)
        if (pIsSeg) Alg.distPointSeg(bx, by, px, py, qx2, qy2)
        else Alg.distPointPoint(px, py, bx, by)
      } else {
        val o = (rid - nPts) * 4
        if (pIsSeg)
          Alg.distSegSeg(px, py, qx2, qy2,
            build.segs(o), build.segs(o + 1), build.segs(o + 2), build.segs(o + 3))
        else
          Alg.distPointSeg(px, py,
            build.segs(o), build.segs(o + 1), build.segs(o + 2), build.segs(o + 3))
      }
    }
    // dual-tree best-first: item pairs arrive by increasing envelope
    // distance; once that lower bound reaches best, nothing closer
    // remains anywhere in either tree
    var bestPid = -1; var bestRid = -1
    ptree.nearestPairSearch(tree) { (pid, rid, d2) =>
      if (math.sqrt(d2) >= best) false
      else {
        val d = pairDist(pid, rid)
        if (d < best) { best = d; bestPid = pid; bestRid = rid }
        true
      }
    }
    // witness of the winning pair (probe point p*, build point q*)
    val pIsSeg = bestPid >= pPts
    val po = (bestPid - pPts) * 4
    val rIsSeg = bestRid >= nPts
    val ro = (bestRid - nPts) * 4
    val w: Array[Double] =
      if (!pIsSeg && !rIsSeg)
        Array(probe.pts(2 * bestPid), probe.pts(2 * bestPid + 1),
          build.pts(2 * bestRid), build.pts(2 * bestRid + 1))
      else if (!pIsSeg && rIsSeg) {
        val px = probe.pts(2 * bestPid); val py = probe.pts(2 * bestPid + 1)
        val c = Alg.closestOnSeg(px, py,
          build.segs(ro), build.segs(ro + 1), build.segs(ro + 2), build.segs(ro + 3))
        Array(px, py, c(0), c(1))
      } else if (pIsSeg && !rIsSeg) {
        val qx = build.pts(2 * bestRid); val qy = build.pts(2 * bestRid + 1)
        val c = Alg.closestOnSeg(qx, qy,
          probe.segs(po), probe.segs(po + 1), probe.segs(po + 2), probe.segs(po + 3))
        Array(c(0), c(1), qx, qy)
      } else
        Alg.closestSegSeg(
          probe.segs(po), probe.segs(po + 1), probe.segs(po + 2), probe.segs(po + 3),
          build.segs(ro), build.segs(ro + 1), build.segs(ro + 2), build.segs(ro + 3))
    // orient so p is on a, q on b
    val probeIsA = (fa.pts.length / 2 + fa.segs.length / 4) <=
                   (fb.pts.length / 2 + fb.segs.length / 4)
    if (probeIsA) (best, w(0), w(1), w(2), w(3))
    else (best, w(2), w(3), w(0), w(1))
  }
}
