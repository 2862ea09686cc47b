package graft.core

import scala.collection.mutable

/** In-memory bulk-loaded R-tree over (Env, recordID) pairs — records
  * live outside the tree, same design as the reference
  * (reference: rtree/rtree.go:29-36, rtree/bulk.go:12). This is an STR
  * (sort-tile-recursive) bulk load rather than the reference's
  * quickselect 2-way split; same asymptotics, simpler code, and it
  * builds once per partition / broadcast so build cost is amortized.
  */
final class RTree private (
    private val boxes: Array[Double], // minX,minY,maxX,maxY per node
    private val firstChild: Array[Int], // index of first child, or -(recordStart+1) for leaves
    private val childCount: Array[Int],
    private val recIds: Array[Int],
    private val leafBoxes: Array[Double], // per-record boxes, parallel to recIds
    val root: Int,
    val count: Int) {

  def isEmpty: Boolean = count == 0

  def extent: Env =
    if (isEmpty) Env.empty
    else Env(boxes(root * 4), boxes(root * 4 + 1), boxes(root * 4 + 2), boxes(root * 4 + 3))

  @inline private def nodeIntersects(n: Int, e: Env): Boolean =
    boxes(n * 4) <= e.xmax && e.xmin <= boxes(n * 4 + 2) &&
      boxes(n * 4 + 1) <= e.ymax && e.ymin <= boxes(n * 4 + 3)

  /** DFS range query; callback returns false to stop early
    * (reference: rtree/rtree.go:48-74 RangeSearch with Stop sentinel).
    */
  def rangeSearch(e: Env)(cb: Int => Boolean): Boolean = {
    if (isEmpty || e.isEmpty) return true
    search(root, e, cb)
  }

  private def search(n: Int, e: Env, cb: Int => Boolean): Boolean = {
    if (!nodeIntersects(n, e)) return true
    val fc = firstChild(n)
    if (fc < 0) {
      val start = -fc - 1
      var i = 0
      while (i < childCount(n)) {
        val rid = recIds(start + i)
        val b = (start + i) * 4
        if (leafBoxes(b) <= e.xmax && e.xmin <= leafBoxes(b + 2) &&
            leafBoxes(b + 1) <= e.ymax && e.ymin <= leafBoxes(b + 3)) {
          if (!cb(rid)) return false
        }
        i += 1
      }
      true
    } else {
      var i = 0
      while (i < childCount(n)) {
        if (!search(fc + i, e, cb)) return false
        i += 1
      }
      true
    }
  }

  /** Point query without the Env wrapper — the per-row hot path of the
    * fused PIP-count aggregate calls this 10^12 times at scale, so it
    * must not allocate.
    */
  def pointSearch(x: Double, y: Double)(cb: Int => Boolean): Boolean = {
    if (isEmpty) return true
    searchPt(root, x, y, cb)
  }

  private def searchPt(n: Int, x: Double, y: Double, cb: Int => Boolean): Boolean = {
    if (!(boxes(n * 4) <= x && x <= boxes(n * 4 + 2) &&
          boxes(n * 4 + 1) <= y && y <= boxes(n * 4 + 3))) return true
    val fc = firstChild(n)
    if (fc < 0) {
      val start = -fc - 1
      var i = 0
      while (i < childCount(n)) {
        val rid = recIds(start + i)
        val b = (start + i) * 4
        if (leafBoxes(b) <= x && x <= leafBoxes(b + 2) &&
            leafBoxes(b + 1) <= y && y <= leafBoxes(b + 3)) {
          if (!cb(rid)) return false
        }
        i += 1
      }
      true
    } else {
      var i = 0
      while (i < childCount(n)) {
        if (!searchPt(fc + i, x, y, cb)) return false
        i += 1
      }
      true
    }
  }

  private def boxBoxDist(b: Int, e: Env, arr: Array[Double]): Double = {
    val dx = math.max(0.0, math.max(arr(b) - e.xmax, e.xmin - arr(b + 2)))
    val dy = math.max(0.0, math.max(arr(b + 1) - e.ymax, e.ymin - arr(b + 3)))
    dx * dx + dy * dy
  }

  /** Best-first traversal ordered by squared box distance to `e`; the
    * callback receives (recordId, squaredBoxDistance) and returns false
    * to stop (reference: rtree/nearest.go:28-55 PrioritySearch).
    */
  def prioritySearch(e: Env)(cb: (Int, Double) => Boolean): Unit = {
    if (isEmpty) return
    // primitive min-heap: dists + packed ids (leaf records encoded as
    // ~idx). A boxed PriorityQueue[Entry] here allocated per enqueue
    // and dominated wall time when callers probe once per row/segment.
    var cap = 64
    var hd = new Array[Double](cap)
    var hi = new Array[Int](cap)
    var hn = 0
    def push(d: Double, id: Int): Unit = {
      if (hn == cap) {
        cap *= 2
        hd = java.util.Arrays.copyOf(hd, cap)
        hi = java.util.Arrays.copyOf(hi, cap)
      }
      var c = hn; hn += 1
      hd(c) = d; hi(c) = id
      while (c > 0) {
        val p = (c - 1) >> 1
        if (hd(p) <= hd(c)) return
        val td = hd(p); hd(p) = hd(c); hd(c) = td
        val ti = hi(p); hi(p) = hi(c); hi(c) = ti
        c = p
      }
    }
    def pop(): Unit = {
      hn -= 1
      hd(0) = hd(hn); hi(0) = hi(hn)
      var c = 0
      while (true) {
        val l = 2 * c + 1; val r = l + 1
        var m = c
        if (l < hn && hd(l) < hd(m)) m = l
        if (r < hn && hd(r) < hd(m)) m = r
        if (m == c) return
        val td = hd(m); hd(m) = hd(c); hd(c) = td
        val ti = hi(m); hi(m) = hi(c); hi(c) = ti
        c = m
      }
    }
    push(boxBoxDist(root * 4, e, boxes), root)
    while (hn > 0) {
      val dist = hd(0); val id = hi(0)
      pop()
      if (id < 0) {
        if (!cb(recIds(~id), dist)) return
      } else {
        val fc = firstChild(id)
        if (fc < 0) {
          val start = -fc - 1
          var i = 0
          while (i < childCount(id)) {
            push(boxBoxDist((start + i) * 4, e, leafBoxes), ~(start + i))
            i += 1
          }
        } else {
          var i = 0
          while (i < childCount(id)) {
            push(boxBoxDist((fc + i) * 4, e, boxes), fc + i)
            i += 1
          }
        }
      }
    }
  }
  /** Dual-tree best-first nearest-pair traversal: visits record pairs
    * (thisRec, otherRec) in nondecreasing order of squared box-to-box
    * distance. Callback returns false to stop. O(log) node-pair
    * expansions to reach the closest pair — the per-probe loop this
    * replaces in distance() was O(n log m).
    */
  def nearestPairSearch(other: RTree)(cb: (Int, Int, Double) => Boolean): Unit = {
    if (isEmpty || other.isEmpty) return
    def box(t: RTree, id: Int): (Array[Double], Int) =
      if (id < 0) (t.leafBoxes, (~id) * 4) else (t.boxes, id * 4)
    def dist2(idA: Int, idB: Int): Double = {
      val (aArr, a) = box(this, idA)
      val (bArr, b) = box(other, idB)
      val dx = math.max(0.0, math.max(aArr(a) - bArr(b + 2), bArr(b) - aArr(a + 2)))
      val dy = math.max(0.0, math.max(aArr(a + 1) - bArr(b + 3), bArr(b + 1) - aArr(a + 3)))
      dx * dx + dy * dy
    }
    var cap = 64
    var hd = new Array[Double](cap)
    var ha = new Array[Int](cap)
    var hb = new Array[Int](cap)
    var hn = 0
    def push(d: Double, ia: Int, ib: Int): Unit = {
      if (hn == cap) {
        cap *= 2
        hd = java.util.Arrays.copyOf(hd, cap)
        ha = java.util.Arrays.copyOf(ha, cap)
        hb = java.util.Arrays.copyOf(hb, cap)
      }
      var c = hn; hn += 1
      hd(c) = d; ha(c) = ia; hb(c) = ib
      while (c > 0) {
        val p = (c - 1) >> 1
        if (hd(p) <= hd(c)) return
        val td = hd(p); hd(p) = hd(c); hd(c) = td
        var t = ha(p); ha(p) = ha(c); ha(c) = t
        t = hb(p); hb(p) = hb(c); hb(c) = t
        c = p
      }
    }
    def pop(): Unit = {
      hn -= 1
      hd(0) = hd(hn); ha(0) = ha(hn); hb(0) = hb(hn)
      var c = 0
      while (true) {
        val l = 2 * c + 1; val r = l + 1
        var m = c
        if (l < hn && hd(l) < hd(m)) m = l
        if (r < hn && hd(r) < hd(m)) m = r
        if (m == c) return
        val td = hd(m); hd(m) = hd(c); hd(c) = td
        var t = ha(m); ha(m) = ha(c); ha(c) = t
        t = hb(m); hb(m) = hb(c); hb(c) = t
        c = m
      }
    }
    def children(t: RTree, id: Int)(f: Int => Unit): Unit = {
      val fc = t.firstChild(id)
      if (fc < 0) {
        val start = -fc - 1
        var i = 0
        while (i < t.childCount(id)) { f(~(start + i)); i += 1 }
      } else {
        var i = 0
        while (i < t.childCount(id)) { f(fc + i); i += 1 }
      }
    }
    def area(t: RTree, id: Int): Double = {
      val (arr, b) = box(t, id)
      (arr(b + 2) - arr(b)) * (arr(b + 3) - arr(b + 1))
    }
    push(dist2(root, other.root), root, other.root)
    while (hn > 0) {
      val d = hd(0); val ia = ha(0); val ib = hb(0)
      pop()
      if (ia < 0 && ib < 0) {
        if (!cb(recIds(~ia), other.recIds(~ib), d)) return
      } else {
        // expand the non-leaf side with the larger box
        val expandA =
          if (ib < 0) true
          else if (ia < 0) false
          else area(this, ia) >= area(other, ib)
        if (expandA) children(this, ia)(c => push(dist2(c, ib), c, ib))
        else children(other, ib)(c => push(dist2(ia, c), ia, c))
      }
    }
  }
}

object RTree {
  private final val Fanout = 8

  val empty: RTree =
    new RTree(Array.empty, Array.empty, Array.empty, Array.empty, Array.empty, 0, 0)

  /** Bulk load from record envelopes; recordId = index into `envs`. */
  def bulkLoad(envs: Array[Env]): RTree = {
    val n = envs.length
    if (n == 0) return empty
    // sort record ids by STR tiles: primary X-center slabs, secondary Y-center
    val ids = Array.range(0, n)
    val cx = new Array[Double](n); val cy = new Array[Double](n)
    var i = 0
    while (i < n) { cx(i) = envs(i).centerX; cy(i) = envs(i).centerY; i += 1 }
    val idsBoxed = ids.map(Integer.valueOf)
    java.util.Arrays.sort(idsBoxed, (a: Integer, b: Integer) => java.lang.Double.compare(cx(a), cx(b)))
    val leafCount = (n + Fanout - 1) / Fanout
    val slices = math.max(1, math.ceil(math.sqrt(leafCount.toDouble)).toInt)
    val perSlice = (n + slices - 1) / slices
    var s = 0
    while (s < slices) {
      val from = s * perSlice
      val to = math.min(n, from + perSlice)
      if (from < to)
        java.util.Arrays.sort(idsBoxed, from, to,
          (a: Integer, b: Integer) => java.lang.Double.compare(cy(a), cy(b)))
      s += 1
    }
    val order = idsBoxed.map(_.intValue())

    // leaf record arrays in STR order
    val leafBoxesArr = new Array[Double](n * 4)
    val recIds = new Array[Int](n)
    i = 0
    while (i < n) {
      val e = envs(order(i))
      leafBoxesArr(i * 4) = e.xmin; leafBoxesArr(i * 4 + 1) = e.ymin
      leafBoxesArr(i * 4 + 2) = e.xmax; leafBoxesArr(i * 4 + 3) = e.ymax
      recIds(i) = order(i)
      i += 1
    }

    // build levels bottom-up
    val boxes = mutable.ArrayBuilder.make[Double]
    val firstChild = mutable.ArrayBuilder.make[Int]
    val childCount = mutable.ArrayBuilder.make[Int]
    var nodeCount = 0

    // leaves
    var levelStart = 0
    var levelSize = 0
    i = 0
    while (i < n) {
      val cnt = math.min(Fanout, n - i)
      var xmin = Double.PositiveInfinity; var ymin = Double.PositiveInfinity
      var xmax = Double.NegativeInfinity; var ymax = Double.NegativeInfinity
      var j = 0
      while (j < cnt) {
        val b = (i + j) * 4
        if (leafBoxesArr(b) < xmin) xmin = leafBoxesArr(b)
        if (leafBoxesArr(b + 1) < ymin) ymin = leafBoxesArr(b + 1)
        if (leafBoxesArr(b + 2) > xmax) xmax = leafBoxesArr(b + 2)
        if (leafBoxesArr(b + 3) > ymax) ymax = leafBoxesArr(b + 3)
        j += 1
      }
      boxes += xmin += ymin += xmax += ymax
      firstChild += -(i + 1)
      childCount += cnt
      nodeCount += 1
      levelSize += 1
      i += cnt
    }

    var bArr = boxes.result(); var fArr = firstChild.result(); var cArr = childCount.result()

    while (levelSize > 1) {
      val nextStart = nodeCount
      val parents = (levelSize + Fanout - 1) / Fanout
      val nb = new Array[Double]((nodeCount + parents) * 4)
      System.arraycopy(bArr, 0, nb, 0, bArr.length)
      val nf = java.util.Arrays.copyOf(fArr, nodeCount + parents)
      val nc = java.util.Arrays.copyOf(cArr, nodeCount + parents)
      var p = 0
      var child = levelStart
      while (p < parents) {
        val cnt = math.min(Fanout, levelStart + levelSize - child)
        var xmin = Double.PositiveInfinity; var ymin = Double.PositiveInfinity
        var xmax = Double.NegativeInfinity; var ymax = Double.NegativeInfinity
        var j = 0
        while (j < cnt) {
          val b = (child + j) * 4
          if (nb(b) < xmin) xmin = nb(b)
          if (nb(b + 1) < ymin) ymin = nb(b + 1)
          if (nb(b + 2) > xmax) xmax = nb(b + 2)
          if (nb(b + 3) > ymax) ymax = nb(b + 3)
          j += 1
        }
        val ni = nodeCount + p
        nb(ni * 4) = xmin; nb(ni * 4 + 1) = ymin; nb(ni * 4 + 2) = xmax; nb(ni * 4 + 3) = ymax
        nf(ni) = child
        nc(ni) = cnt
        child += cnt
        p += 1
      }
      bArr = nb; fArr = nf; cArr = nc
      levelStart = nextStart
      levelSize = parents
      nodeCount += parents
    }

    new RTree(bArr, fArr, cArr, recIds, leafBoxesArr, nodeCount - 1, n)
  }
}
