package graft.core

import scala.collection.mutable

/** Concave hull of a geometry's vertices (GEOS wrapper analogue —
  * reference geos/entrypoints.go:324-333: `concavenessRatio` of 1
  * yields the convex hull, 0 the maximally concave hull; `allowHoles`
  * permits interior holes). Re-derived from the published JTS
  * ConcaveHull algorithm (edge-length-ratio border peel over the
  * Delaunay triangulation), not ported:
  *
  *  1. Delaunay-triangulate the distinct input vertices
  *     ([[Delaunay]]); the triangle union starts as the convex hull.
  *  2. target edge length = shortest + ratio * (longest - shortest)
  *     over all triangulation edges.
  *  3. Peel border triangles in order of their longest border edge
  *     while that edge is longer than the target. Only triangles with
  *     EXACTLY one border edge are removable, and only if the vertex
  *     opposite that edge is not already on the boundary — together
  *     these prevent pinches, disconnection, and orphaned points
  *     (every input point stays covered, the reference's contract;
  *     removing a two-border-edge "ear" would drop its apex). With
  *     allowHoles, an interior triangle whose longest edge exceeds
  *     the target and whose three vertices are all interior may be
  *     removed too (seeding a hole); hole growth then follows the
  *     same border rules, and the vertex-safety rule keeps hole
  *     boundaries disjoint from the outer boundary and each other.
  *  4. Boundary edges of the kept set are walked into rings (kept
  *     side on the left) and reassembled into a polygon (shells CCW,
  *     holes CW) via [[SetOps.assembleRings]].
  *
  * Degenerate inputs (fewer than 3 distinct points, or all collinear)
  * return the convex hull (point / 2-point line), matching the
  * reference's documented behaviour.
  */
object ConcaveHull {

  def hull(g: Geom, concavenessRatio: Double, allowHoles: Boolean): Geom = {
    val ratio = math.max(0.0, math.min(1.0, concavenessRatio))
    val (xs, ys) = collectPoints(g)
    Delaunay.triangulate(xs, ys) match {
      case None => Algos.convexHull(g) // degenerate: point / line / empty
      case Some(tr) => peel(tr, ratio, allowHoles)
    }
  }

  private def collectPoints(g: Geom): (Array[Double], Array[Double]) = {
    val xs = mutable.ArrayBuilder.make[Double]
    val ys = mutable.ArrayBuilder.make[Double]
    def seq(s: Seqn): Unit = {
      var i = 0
      while (i < s.n) { xs += s.x(i); ys += s.y(i); i += 1 }
    }
    def walk(x: Geom): Unit = x match {
      case p: GPoint if !p.isEmpty => xs += p.x; ys += p.y
      case _: GPoint => ()
      case GLine(s) => seq(s)
      case GPoly(rs, _) => rs.foreach(seq)
      case GMPoint(ps, _) => ps.foreach(walk)
      case GMLine(ls, _) => ls.foreach(seq)
      case GMPoly(ps, _) => ps.foreach(_.foreach(seq))
      case GColl(cs, _) => cs.foreach(walk)
    }
    walk(g)
    (xs.result(), ys.result())
  }

  private def peel(tr: Delaunay.Triangulation, ratio: Double,
                   allowHoles: Boolean): Geom = {
    val nT = tr.nTriangles
    val t = tr.tri; val adj = tr.adj
    val xs = tr.xs; val ys = tr.ys
    @inline def edgeLen(u: Int, w: Int): Double =
      math.hypot(xs(u) - xs(w), ys(u) - ys(w))
    @inline def edgeOf(ti: Int, e: Int): (Int, Int) =
      (t(3 * ti + (e + 1) % 3), t(3 * ti + (e + 2) % 3))

    // target edge length over ALL triangulation edges
    var minLen = Double.MaxValue; var maxLen = 0.0
    for (i <- 0 until nT; e <- 0 until 3) {
      val (u, w) = edgeOf(i, e)
      if (u < w || adj(3 * i + e) < 0) { // visit each edge once
        val l = edgeLen(u, w)
        if (l < minLen) minLen = l
        if (l > maxLen) maxLen = l
      }
    }
    val target = minLen + ratio * (maxLen - minLen)

    val removed = new Array[Boolean](nT)
    var keptCount = nT
    val nPts = xs.length
    val boundaryVertex = new Array[Boolean](nPts)
    for (i <- 0 until nT; e <- 0 until 3; if adj(3 * i + e) < 0) {
      val (u, w) = edgeOf(i, e)
      boundaryVertex(u) = true; boundaryVertex(w) = true
    }

    @inline def isBorderEdge(ti: Int, e: Int): Boolean = {
      val o = adj(3 * ti + e); o < 0 || removed(o)
    }
    /** longest CURRENT border edge of ti, or 0 if none; and count */
    def borderInfo(ti: Int): (Double, Int, Int) = { // (len, count, slotOfLongest)
      var best = 0.0; var cnt = 0; var slot = -1
      var e = 0
      while (e < 3) {
        if (isBorderEdge(ti, e)) {
          cnt += 1
          val (u, w) = edgeOf(ti, e)
          val l = edgeLen(u, w)
          if (l > best) { best = l; slot = e }
        }
        e += 1
      }
      (best, cnt, slot)
    }
    def longestEdge(ti: Int): Double = {
      var best = 0.0
      var e = 0
      while (e < 3) {
        val (u, w) = edgeOf(ti, e)
        val l = edgeLen(u, w)
        if (l > best) best = l
        e += 1
      }
      best
    }

    // max-heap of (key, triangle); stale entries re-validated on pop
    val pq = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by(_._1))
    for (i <- 0 until nT) {
      val (len, cnt, _) = borderInfo(i)
      if (cnt > 0) { if (len > target) pq.enqueue((len, i)) }
      else if (allowHoles) {
        val l = longestEdge(i)
        if (l > target) pq.enqueue((l, i))
      }
    }

    while (pq.nonEmpty) {
      val (_, ti) = pq.dequeue()
      if (!removed(ti) && keptCount > 1) {
        val (len, cnt, _) = borderInfo(ti)
        val doRemove =
          if (cnt == 0) {
            // hole seed: interior triangle, long edge, fully interior verts
            allowHoles && longestEdge(ti) > target &&
              !boundaryVertex(t(3 * ti)) && !boundaryVertex(t(3 * ti + 1)) &&
              !boundaryVertex(t(3 * ti + 2))
          } else if (len <= target) false
          else if (cnt >= 2) false // removing an ear would orphan its
                                   // apex point — every input point
                                   // must stay covered by the hull
          else { // single border edge: opposite vertex must be interior
            var slot = -1
            var e = 0
            while (e < 3) { if (isBorderEdge(ti, e)) slot = e; e += 1 }
            !boundaryVertex(t(3 * ti + slot))
          }
        if (doRemove) {
          removed(ti) = true
          keptCount -= 1
          // every vertex of a removed triangle is (now) on a boundary
          boundaryVertex(t(3 * ti)) = true
          boundaryVertex(t(3 * ti + 1)) = true
          boundaryVertex(t(3 * ti + 2)) = true
          // newly exposed neighbors re-enter the queue with fresh keys
          var e = 0
          while (e < 3) {
            val o = adj(3 * ti + e)
            if (o >= 0 && !removed(o)) {
              val (l2, c2, _) = borderInfo(o)
              if (c2 > 0 && l2 > target) pq.enqueue((l2, o))
            }
            e += 1
          }
        }
      }
    }

    // ---- assemble boundary rings: kept triangle on the LEFT of each
    // directed border edge (CCW triangles => edge (v(e+1), v(e+2))).
    // A boundary vertex can be shared by two rims (e.g. two holes
    // grown until they touch), so out-degree may exceed 1: walk a
    // directed-edge multimap into closed walks, then normalize any
    // self-touching walk through the same split-at-repeated-vertex +
    // even-odd reassembly used by makeValid.
    val outgoing = mutable.HashMap.empty[Int, mutable.ArrayBuffer[Int]]
    var nEdges = 0
    for (i <- 0 until nT; if !removed(i); e <- 0 until 3; if isBorderEdge(i, e)) {
      val (u, w) = edgeOf(i, e)
      outgoing.getOrElseUpdate(u, mutable.ArrayBuffer.empty) += w
      nEdges += 1
    }
    if (nEdges == 0) return GPoly(Array.empty[Seqn], CT.XY)
    val walks = mutable.ArrayBuffer.empty[Seqn]
    for (startV <- outgoing.keys.toSeq) {
      while (outgoing(startV).nonEmpty) {
        val pts = mutable.ArrayBuffer.empty[(Double, Double)]
        var v = startV
        var guard = 0
        do {
          pts += ((xs(v), ys(v)))
          val outs = outgoing(v)
          v = outs.remove(outs.length - 1)
          guard += 1
        } while (v != startV && guard <= nEdges)
        pts += ((xs(startV), ys(startV))) // close
        if (pts.length >= 4) walks += seqnOfPts(pts.toSeq)
      }
    }
    SetOps.assembleRings(walks.toSeq.flatMap(SetOps.splitSimpleRings))
  }

  private def seqnOfPts(pts: Seq[(Double, Double)]): Seqn = {
    val arr = new Array[Double](pts.length * 2)
    var i = 0
    for ((x, y) <- pts) { arr(2 * i) = x; arr(2 * i + 1) = y; i += 1 }
    new Seqn(arr, CT.XY)
  }
}
