package graft.core

import scala.collection.mutable

/** Delaunay triangulation of a 2D point set — the substrate for
  * concave hulls (reference geos/entrypoints.go:324-333 exposes GEOS's
  * ConcaveHull; the triangulation itself is re-derived from the
  * classic incremental algorithm, not ported).
  *
  * Algorithm: lexicographic sweep insertion (Sloan-style). Points are
  * sorted by (x, y); every new point is strictly outside the current
  * hull, so it is attached by fanning triangles over the strictly
  * visible hull chain and the new edges are legalized by recursive
  * Lawson flips. No super-triangle: the triangulation's union is the
  * exact convex hull of the input at every step.
  *
  * Predicates: orientation via [[Alg.orient]] (float filter + exact
  * double-double fallback); incircle via a Shewchuk-style float filter
  * with a ~106-bit double-double fallback (FMA two-products). The DD
  * fallback is not fully exact — ties within ~2^-100 relative pick an
  * arbitrary (still valid) triangulation, which only matters for the
  * diagonal choice in exactly-cocircular quads.
  */
object Delaunay {

  /** Triangulation result over the DEDUPED point array (xs, ys):
    * tri = vertex index triples (CCW), 3 ints per triangle;
    * adj(3t+i) = triangle across the edge opposite vertex i of
    * triangle t (the edge (tri(3t+(i+1)%3), tri(3t+(i+2)%3))), or -1
    * on the convex hull boundary.
    */
  final class Triangulation(val xs: Array[Double], val ys: Array[Double],
                            val tri: Array[Int], val adj: Array[Int]) {
    def nTriangles: Int = tri.length / 3
  }

  /** Triangulate; duplicate input points are deduped. Returns None if
    * fewer than 3 distinct points or all points collinear.
    */
  def triangulate(xsIn: Array[Double], ysIn: Array[Double]): Option[Triangulation] = {
    // dedup + lexicographic sort
    val n0 = xsIn.length
    val order = (0 until n0).sortBy(i => (xsIn(i), ysIn(i)))
    val xs = new Array[Double](n0); val ys = new Array[Double](n0)
    var n = 0
    for (i <- order) {
      if (n == 0 || xs(n - 1) != xsIn(i) || ys(n - 1) != ysIn(i)) {
        xs(n) = xsIn(i); ys(n) = ysIn(i); n += 1
      }
    }
    if (n < 3) return None

    // skip the collinear prefix: find first k with a non-degenerate triple
    var k = 2
    while (k < n && collinearPrefix(xs, ys, k)) k += 1
    if (k == n) return None // all collinear

    val b = new Builder(xs, ys, n)
    b.seed(k) // fan-triangulate points 0..k (prefix 0..k-1 collinear)
    var i = k + 1
    while (i < n) { b.insert(i); i += 1 }
    val (tris, adjs) = b.result()
    Some(new Triangulation(java.util.Arrays.copyOf(xs, n),
      java.util.Arrays.copyOf(ys, n), tris, adjs))
  }

  private def collinearPrefix(xs: Array[Double], ys: Array[Double], k: Int): Boolean =
    Alg.orient(xs(0), ys(0), xs(k - 1), ys(k - 1), xs(k), ys(k)) == 0

  // ------------------------------------------------------------ builder

  /** Flat-array half-edge-free triangle soup with adjacency:
    * v(3t+i) = vertex i of triangle t (CCW);
    * adj(3t+i) = triangle adjacent across the edge OPPOSITE vertex i
    * (edge v(i+1), v(i+2) mod 3), or -1 on the hull.
    */
  private final class Builder(xs: Array[Double], ys: Array[Double], n: Int) {
    private val vArr = new mutable.ArrayBuffer[Int]
    private val adjArr = new mutable.ArrayBuffer[Int]
    // convex hull as a doubly-linked list over vertex ids
    private val nextH = new Array[Int](n)
    private val prevH = new Array[Int](n)
    // for hull edge (u -> nextH(u)): the inside triangle and its slot
    private val edgeTriT = new Array[Int](n)
    private val edgeTriS = new Array[Int](n)
    private var rightmost = 0 // lexicographically largest inserted point

    private def newTriangle(a: Int, b: Int, c: Int): Int = {
      val t = vArr.length / 3
      vArr += a; vArr += b; vArr += c
      adjArr += -1; adjArr += -1; adjArr += -1
      t
    }
    @inline private def vert(t: Int, i: Int): Int = vArr(3 * t + i)
    @inline private def adj(t: Int, i: Int): Int = adjArr(3 * t + i)
    @inline private def setAdj(t: Int, i: Int, o: Int): Unit = adjArr(3 * t + i) = o
    /** slot of vertex p in triangle t */
    private def slotOf(t: Int, p: Int): Int = {
      if (vArr(3 * t) == p) 0 else if (vArr(3 * t + 1) == p) 1 else 2
    }
    /** link triangles t (slot i) and o (slot j) as mutual neighbors */
    private def link(t: Int, i: Int, o: Int, j: Int): Unit = {
      if (t >= 0) setAdj(t, i, o)
      if (o >= 0) setAdj(o, j, t)
    }

    /** Seed with points 0..k: 0..k-1 are collinear, k is not. Fan
      * triangles from k over consecutive collinear pairs, oriented CCW.
      */
    def seed(k: Int): Unit = {
      // order the collinear prefix along the line = already sorted
      val ccw = Alg.orient(xs(0), ys(0), xs(1), ys(1), xs(k), ys(k)) > 0
      var prev = -1
      var j = 0
      while (j < k - 1) {
        val (a, b) = if (ccw) (j, j + 1) else (j + 1, j)
        val t = newTriangle(a, b, k)
        // neighbor across edge (b,k)/(k,a) chains with prev/next fan step
        if (prev >= 0) {
          // shared edge between fan steps: prev's edge opposite its
          // first-vertex-side — resolve by shared vertices
          linkShared(prev, t)
        }
        prev = t
        j += 1
      }
      // hull = 0 .. k-1 .. k .. back to 0 (CCW polygon)
      // CCW hull ring: if ccw: 0,1,..,k-1,k ; else 0,k,k-1? Build from
      // triangle orientation: collect boundary edges and chain them.
      rebuildHull()
      rightmost = k
    }

    /** link two triangles that share exactly one edge */
    private def linkShared(t1: Int, t2: Int): Unit = {
      var i = 0
      while (i < 3) {
        val a = vert(t1, (i + 1) % 3); val b = vert(t1, (i + 2) % 3)
        var j = 0
        while (j < 3) {
          val c = vert(t2, (j + 1) % 3); val d = vert(t2, (j + 2) % 3)
          if ((a == c && b == d) || (a == d && b == c)) { link(t1, i, t2, j); return }
          j += 1
        }
        i += 1
      }
    }

    /** O(T) hull rebuild — used once at seed time only. */
    private def rebuildHull(): Unit = {
      val m = vArr.length / 3
      var t = 0
      while (t < m) {
        var i = 0
        while (i < 3) {
          if (adj(t, i) == -1) {
            val a = vert(t, (i + 1) % 3); val b = vert(t, (i + 2) % 3)
            nextH(a) = b; prevH(b) = a
            edgeTriT(a) = t; edgeTriS(a) = i
          }
          i += 1
        }
        t += 1
      }
    }

    private val flipStack = mutable.ArrayBuffer.empty[Long]

    /** Insert point p, strictly outside the current hull (guaranteed by
      * lexicographic order): fan over the strictly visible hull chain.
      */
    def insert(p: Int): Unit = {
      // find the strictly visible chain around `rightmost`
      var start = rightmost
      // back up while the edge ENDING at start is visible
      var guard = 0
      while (visible(prevH(start), start, p) && guard < n) { start = prevH(start); guard += 1 }
      // if the edge starting at start is not visible, walk forward
      guard = 0
      while (!visible(start, nextH(start), p) && guard < n) { start = nextH(start); guard += 1 }
      // fan over visible edges start -> ... -> stop
      var u = start
      var prevT = -1
      var firstT = -1
      while (visible(u, nextH(u), p)) {
        val w = nextH(u)
        // visible means p is strictly RIGHT of hull edge u->w, so the
        // CCW triangle is (w, u, p); its edge opposite slot 2 (the
        // pair v0,v1 = w,u) is the old hull edge
        val t = newTriangle(w, u, p)
        val ht = edgeTriT(u); val hs = edgeTriS(u)
        link(t, 2, ht, hs)
        // chain with previous fan triangle: shared edge (u, p): in t it
        // is opposite slot0 (v1,v2)=(u,p); in prevT it was (p, w_prev=u)
        // opposite its slot1 (v2,v0)=(p, w_prev)
        if (prevT >= 0) link(t, 0, prevT, 1) else firstT = t
        flipStack += (t.toLong << 2) | 2L // legalize base edge later
        prevT = t
        u = w
      }
      val stop = u
      // update hull: start -> p -> stop
      nextH(start) = p; prevH(p) = start
      nextH(p) = stop; prevH(stop) = p
      // hull edge (start,p): inside triangle firstT, edge opposite its
      // slot? firstT = (w,u=start,p): edge (start,p)=(v1,v2) opposite
      // slot0. hull edge (p,stop): last fan triangle prevT=(w=stop,u,p):
      // edge (p,stop)=(v2,v0) opposite slot1.
      edgeTriT(start) = firstT; edgeTriS(start) = 0
      edgeTriT(p) = prevT; edgeTriS(p) = 1
      rightmost = p
      legalizeAll()
    }

    /** strict visibility: p strictly right of directed hull edge a->b */
    private def visible(a: Int, b: Int, p: Int): Boolean =
      Alg.orient(xs(a), ys(a), xs(b), ys(b), xs(p), ys(p)) < 0

    private def legalizeAll(): Unit = {
      while (flipStack.nonEmpty) {
        val e = flipStack.remove(flipStack.length - 1)
        val t = (e >>> 2).toInt; val i = (e & 3L).toInt
        legalize(t, i)
      }
    }

    /** Lawson flip of edge opposite slot i of t, if illegal. */
    private def legalize(t: Int, i: Int): Unit = {
      val o = adj(t, i)
      if (o < 0) return
      val p = vert(t, i) // apex of t
      val j = oppositeSlot(o, t)
      val q = vert(o, j) // apex of o
      // illegal iff q strictly inside circumcircle of t
      if (inCircle(vert(t, 0), vert(t, 1), vert(t, 2), q) <= 0) return
      // flip the shared edge (a,b): a=vert(t,i+1), b=vert(t,i+2).
      // New CCW triangles: t := (p, a, q), o := (p, q, b).
      // adj(t, i+1) is across edge (v(i+2), v(i)) = (b, p);
      // adj(t, i+2) is across (p, a).
      val a = vert(t, (i + 1) % 3); val b = vert(t, (i + 2) % 3)
      val tBP = adj(t, (i + 1) % 3) // edge (b,p)
      val tPA = adj(t, (i + 2) % 3) // edge (p,a)
      val oQA = neighborAcross(o, q, a)
      val oBQ = neighborAcross(o, b, q)
      // rewrite t := (p, a, q): slots v0=p v1=a v2=q
      vArr(3 * t) = p; vArr(3 * t + 1) = a; vArr(3 * t + 2) = q
      // rewrite o := (p, q, b)
      vArr(3 * o) = p; vArr(3 * o + 1) = q; vArr(3 * o + 2) = b
      // t edges: opp v0=(a,q) -> oQA ; opp v1=(q,p) -> o ; opp v2=(p,a) -> tPA
      setAdj(t, 0, oQA); if (oQA >= 0) setAdj(oQA, slotOfEdge(oQA, a, q), t)
      setAdj(t, 1, o)
      setAdj(t, 2, tPA); if (tPA >= 0) setAdj(tPA, slotOfEdge(tPA, p, a), t)
      // o edges: opp v0=(q,b) -> oBQ ; opp v1=(b,p) -> tBP ; opp v2=(p,q) -> t
      setAdj(o, 0, oBQ); if (oBQ >= 0) setAdj(oBQ, slotOfEdge(oBQ, b, q), o)
      setAdj(o, 1, tBP); if (tBP >= 0) setAdj(tBP, slotOfEdge(tBP, b, p), o)
      setAdj(o, 2, t)
      // hull edge registry: flipped edge was interior; boundary edges of
      // t/o may have moved between the two triangles — refresh any hull
      // edges among (a,q),(p,a),(q,b),(b,p)
      refreshHullEdge(t, 2, p, a)
      refreshHullEdge(t, 0, a, q)
      refreshHullEdge(o, 0, q, b)
      refreshHullEdge(o, 1, b, p)
      // recheck the two edges now opposite p
      flipStack += (t.toLong << 2) | 0L // edge (a,q)
      flipStack += (o.toLong << 2) | 0L // edge (q,b)
    }

    /** if (u,w) (in hull direction u->w with nextH(u)==w) is a hull
      * edge, update its inside-triangle registry to (t, slot).
      */
    private def refreshHullEdge(t: Int, slot: Int, x1: Int, x2: Int): Unit = {
      if (adj(t, slot) == -1) {
        if (nextH(x1) == x2 && edgeTriValid(x1)) { edgeTriT(x1) = t; edgeTriS(x1) = slot }
        else if (nextH(x2) == x1 && edgeTriValid(x2)) { edgeTriT(x2) = t; edgeTriS(x2) = slot }
      }
    }
    private def edgeTriValid(u: Int): Boolean = true

    private def oppositeSlot(o: Int, t: Int): Int = {
      var j = 0
      while (j < 3) { if (adj(o, j) == t) return j; j += 1 }
      -1
    }
    private def neighborAcross(t: Int, a: Int, b: Int): Int = {
      var i = 0
      while (i < 3) {
        val u = vert(t, (i + 1) % 3); val w = vert(t, (i + 2) % 3)
        if ((u == a && w == b) || (u == b && w == a)) return adj(t, i)
        i += 1
      }
      -1
    }
    private def slotOfEdge(t: Int, a: Int, b: Int): Int = {
      var i = 0
      while (i < 3) {
        val u = vert(t, (i + 1) % 3); val w = vert(t, (i + 2) % 3)
        if ((u == a && w == b) || (u == b && w == a)) return i
        i += 1
      }
      -1
    }

    /** incircle(a,b,c CCW; d): >0 inside, 0 on, <0 outside. */
    private def inCircle(a: Int, b: Int, c: Int, d: Int): Int =
      Delaunay.inCircle(xs(a), ys(a), xs(b), ys(b), xs(c), ys(c), xs(d), ys(d))

    def result(): (Array[Int], Array[Int]) = (vArr.toArray, adjArr.toArray)
  }

  // ----------------------------------------------- robust incircle

  private val IccErrBound = 1.1125369292536007e-14 // ~(10+96eps)eps

  /** Shewchuk-filtered incircle with double-double fallback.
    * Sign of | ax-dx  ay-dy  (ax-dx)^2+(ay-dy)^2 | etc. (CCW abc).
    */
  def inCircle(ax: Double, ay: Double, bx: Double, by: Double,
               cx: Double, cy: Double, dx: Double, dy: Double): Int = {
    val adx = ax - dx; val ady = ay - dy
    val bdx = bx - dx; val bdy = by - dy
    val cdx = cx - dx; val cdy = cy - dy
    val bdxcdy = bdx * cdy; val cdxbdy = cdx * bdy
    val alift = adx * adx + ady * ady
    val cdxady = cdx * ady; val adxcdy = adx * cdy
    val blift = bdx * bdx + bdy * bdy
    val adxbdy = adx * bdy; val bdxady = bdx * ady
    val clift = cdx * cdx + cdy * cdy
    val det = alift * (bdxcdy - cdxbdy) + blift * (cdxady - adxcdy) +
      clift * (adxbdy - bdxady)
    val permanent = (math.abs(bdxcdy) + math.abs(cdxbdy)) * alift +
      (math.abs(cdxady) + math.abs(adxcdy)) * blift +
      (math.abs(adxbdy) + math.abs(bdxady)) * clift
    val errBound = IccErrBound * permanent
    if (det > errBound) 1
    else if (det < -errBound) -1
    else inCircleDD(ax, ay, bx, by, cx, cy, dx, dy)
  }

  // --- minimal double-double arithmetic (hi + lo, |lo| <= ulp(hi)/2) --

  private def ddAdd(ah: Double, al: Double, bh: Double, bl: Double,
                    out: Array[Double]): Unit = {
    val s = ah + bh
    val bb = s - ah
    val err = (ah - (s - bb)) + (bh - bb) + al + bl
    val hi = s + err
    out(0) = hi; out(1) = err - (hi - s)
  }
  private def ddMul(ah: Double, al: Double, bh: Double, bl: Double,
                    out: Array[Double]): Unit = {
    val p = ah * bh
    val e = Math.fma(ah, bh, -p) + ah * bl + al * bh
    val hi = p + e
    out(0) = hi; out(1) = e - (hi - p)
  }
  private def ddDiffExact(a: Double, b: Double, out: Array[Double]): Unit = {
    val s = a - b
    val bb = s - a
    out(0) = s; out(1) = (a - (s - bb)) - (b + bb)
  }

  /** ~106-bit incircle. Not fully exact: ties below ~2^-100 relative
    * resolve arbitrarily — only the diagonal choice in exactly
    * cocircular quads is affected, never triangulation validity.
    */
  private def inCircleDD(ax: Double, ay: Double, bx: Double, by: Double,
                         cx: Double, cy: Double, dx: Double, dy: Double): Int = {
    val t = new Array[Double](2); val u = new Array[Double](2)
    val acc = new Array[Double](2)
    val adx = new Array[Double](2); val ady = new Array[Double](2)
    val bdx = new Array[Double](2); val bdy = new Array[Double](2)
    val cdx = new Array[Double](2); val cdy = new Array[Double](2)
    ddDiffExact(ax, dx, adx); ddDiffExact(ay, dy, ady)
    ddDiffExact(bx, dx, bdx); ddDiffExact(by, dy, bdy)
    ddDiffExact(cx, dx, cdx); ddDiffExact(cy, dy, cdy)
    def lift(px: Array[Double], py: Array[Double], out: Array[Double]): Unit = {
      ddMul(px(0), px(1), px(0), px(1), t)
      ddMul(py(0), py(1), py(0), py(1), u)
      ddAdd(t(0), t(1), u(0), u(1), out)
    }
    def cross(p1: Array[Double], p2: Array[Double],
              q1: Array[Double], q2: Array[Double], out: Array[Double]): Unit = {
      ddMul(p1(0), p1(1), p2(0), p2(1), t)
      ddMul(q1(0), q1(1), q2(0), q2(1), u)
      ddAdd(t(0), t(1), -u(0), -u(1), out)
    }
    val la = new Array[Double](2); val lb = new Array[Double](2)
    val lc = new Array[Double](2)
    lift(adx, ady, la); lift(bdx, bdy, lb); lift(cdx, cdy, lc)
    val xbc = new Array[Double](2); val xca = new Array[Double](2)
    val xab = new Array[Double](2)
    cross(bdx, cdy, cdx, bdy, xbc)
    cross(cdx, ady, adx, cdy, xca)
    cross(adx, bdy, bdx, ady, xab)
    val s1 = new Array[Double](2); val s2 = new Array[Double](2)
    val s3 = new Array[Double](2)
    ddMul(la(0), la(1), xbc(0), xbc(1), s1)
    ddMul(lb(0), lb(1), xca(0), xca(1), s2)
    ddMul(lc(0), lc(1), xab(0), xab(1), s3)
    ddAdd(s1(0), s1(1), s2(0), s2(1), acc)
    ddAdd(acc(0), acc(1), s3(0), s3(1), acc)
    if (acc(0) > 0) 1 else if (acc(0) < 0) -1 else 0
  }
}
