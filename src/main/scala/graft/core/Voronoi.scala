package graft.core

import scala.collection.mutable

/** Voronoi diagram of a 2D point set, clipped to a rectangle.
  *
  * Construction: a site's Voronoi cell is exactly the intersection of
  * the perpendicular-bisector half-planes against its Delaunay
  * neighbours (Aurenhammer, "Voronoi diagrams", ACM Comp. Surveys
  * 1991, §2.2 duality), so each cell is built by Sutherland–Hodgman
  * clipping the clip rectangle by those O(1)-average half-planes —
  * O(n) cells total over the [[Delaunay]] triangulation, no dual
  * edge-walk and no unbounded-ray bookkeeping (the rectangle bounds
  * every cell up front). Degenerate inputs (fewer than 3 distinct
  * sites, or all sites collinear) fall back to all-pairs bisectors:
  * the same intersection with redundant half-planes, still exact.
  *
  * Reference analogue: the GEOS VoronoiDiagram surface that the
  * reference wraps (geos/entrypoints.go exposes the GEOS C API
  * family); algorithm re-derived from the published duality, not a
  * port.
  */
object Voronoi {

  /** Deduped, lexicographically (x, y)-sorted sites and their cells:
    * `cell(i)` is the Voronoi cell of site `(sx(i), sy(i))` clipped to
    * the construction rectangle — an empty polygon when the cell
    * misses the rectangle entirely.
    */
  final class Diagram(val sx: Array[Double], val sy: Array[Double],
                      val cell: Array[GPoly])

  /** Voronoi diagram of (xs, ys) clipped to [x0,x1]×[y0,y1]. Sites are
    * deduped and sorted, so the result is independent of input order.
    */
  def diagram(xs: Array[Double], ys: Array[Double],
              x0: Double, y0: Double, x1: Double, y1: Double): Diagram = {
    require(x0 <= x1 && y0 <= y1, "voronoi: empty clip rectangle")
    // dedup + lex sort (the same normalization Delaunay.triangulate
    // applies internally, re-done here so indices line up)
    val n0 = xs.length
    val order = (0 until n0).sortBy(i => (xs(i), ys(i)))
    val dx = new Array[Double](n0); val dy = new Array[Double](n0)
    var n = 0
    for (i <- order) {
      if (n == 0 || dx(n - 1) != xs(i) || dy(n - 1) != ys(i)) {
        dx(n) = xs(i); dy(n) = ys(i); n += 1
      }
    }
    val sx = java.util.Arrays.copyOf(dx, n)
    val sy = java.util.Arrays.copyOf(dy, n)

    val rect = Array(x0, y0, x1, y0, x1, y1, x0, y1)
    if (n == 0) return new Diagram(sx, sy, Array.empty)
    if (n == 1) return new Diagram(sx, sy, Array(toPoly(rect)))

    // neighbour lists: Delaunay edges when a triangulation exists,
    // all-pairs otherwise (collinear sites — redundant half-planes
    // leave the intersection unchanged)
    val nbr = Array.fill(n)(new mutable.ArrayBuffer[Int](8))
    Delaunay.triangulate(sx, sy) match {
      case Some(t) =>
        val seen = new mutable.HashSet[Long]
        var tIdx = 0
        while (tIdx < t.nTriangles) {
          var k = 0
          while (k < 3) {
            val a = t.tri(3 * tIdx + k)
            val b = t.tri(3 * tIdx + (k + 1) % 3)
            val key = (math.min(a, b).toLong << 32) | math.max(a, b).toLong
            if (seen.add(key)) { nbr(a) += b; nbr(b) += a }
            k += 1
          }
          tIdx += 1
        }
      case None =>
        var i = 0
        while (i < n) {
          var j = 0
          while (j < n) { if (j != i) nbr(i) += j; j += 1 }
          i += 1
        }
    }

    val cells = new Array[GPoly](n)
    var i = 0
    while (i < n) {
      var poly = rect
      val xi = sx(i); val yi = sy(i)
      val it = nbr(i).iterator
      while (it.hasNext && poly.length >= 6) {
        val j = it.next()
        val xj = sx(j); val yj = sy(j)
        // keep the site's side of the bisector: 2(xj-xi)x + 2(yj-yi)y
        // <= xj^2 - xi^2 + yj^2 - yi^2
        poly = clipHalfPlane(poly, 2.0 * (xj - xi), 2.0 * (yj - yi),
          (xj - xi) * (xj + xi) + (yj - yi) * (yj + yi))
      }
      cells(i) = toPoly(poly)
      i += 1
    }
    new Diagram(sx, sy, cells)
  }

  /** Sutherland–Hodgman clip of an open ring (x,y pairs, CCW) by the
    * half-plane a·x + b·y <= c.
    */
  private def clipHalfPlane(poly: Array[Double], a: Double, b: Double,
                            c: Double): Array[Double] = {
    val n = poly.length / 2
    if (n == 0) return poly
    val out = new mutable.ArrayBuilder.ofDouble
    out.sizeHint(poly.length + 4)
    var px = poly(2 * n - 2); var py = poly(2 * n - 1)
    var pf = a * px + b * py - c
    var i = 0
    while (i < n) {
      val cx = poly(2 * i); val cy = poly(2 * i + 1)
      val cf = a * cx + b * cy - c
      if (cf <= 0) {
        if (pf > 0) {
          val t = pf / (pf - cf)
          out += px + t * (cx - px); out += py + t * (cy - py)
        }
        out += cx; out += cy
      } else if (pf <= 0) {
        val t = pf / (pf - cf)
        out += px + t * (cx - px); out += py + t * (cy - py)
      }
      px = cx; py = cy; pf = cf
      i += 1
    }
    out.result()
  }

  /** Open ring -> closed polygon; collapses degenerate (<3 distinct
    * vertex) output to the empty polygon.
    */
  private def toPoly(open: Array[Double]): GPoly = {
    // drop consecutive duplicates the clipper can emit at tangencies
    val n = open.length / 2
    val tmp = new Array[Double](open.length)
    var m = 0
    var i = 0
    while (i < n) {
      val x = open(2 * i); val y = open(2 * i + 1)
      if (m < 2 || tmp(m - 2) != x || tmp(m - 1) != y) {
        tmp(m) = x; tmp(m + 1) = y; m += 2
      }
      i += 1
    }
    var ring = java.util.Arrays.copyOf(tmp, m)
    // also drop a trailing vertex equal to the first
    while (ring.length >= 4 && ring(0) == ring(ring.length - 2) &&
           ring(1) == ring(ring.length - 1))
      ring = java.util.Arrays.copyOf(ring, ring.length - 2)
    if (ring.length < 6) return GPoly(Array.empty, CT.XY)
    val closed = new Array[Double](ring.length + 2)
    System.arraycopy(ring, 0, closed, 0, ring.length)
    closed(ring.length) = ring(0); closed(ring.length + 1) = ring(1)
    GPoly(Array(Seqn.xy(closed)), CT.XY)
  }
}
