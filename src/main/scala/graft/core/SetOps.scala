package graft.core

import scala.collection.mutable

/** General geometric set operations (union / intersection / difference /
  * symmetric difference / unary union) over arbitrary geometry pairs.
  *
  * Reference semantics: geom/alg_overlay.go (empty-result typing at
  * lines 29-44, GC-aware pairwise plans at 84-220) with the overlay
  * engine itself re-derived Spark-side as an arrangement overlay
  * instead of a port of OverlayNG's noding ladder
  * (jts/operation_overlayng_*):
  *
  *  1. NODE: all input segments are split at mutual intersections
  *     (R-tree candidate pairs, DD-robust orientation tests, one
  *     crossing point computed per pair so both segments split at the
  *     identical coordinate).
  *  2. ARRANGE: the noded edges form a planar subdivision; faces are
  *     extracted by left-face half-edge traversal with hole-contour
  *     nesting.
  *  3. CLASSIFY: each face takes one strictly-interior point, located
  *     against both inputs (ray-casting), giving (inA, inB).
  *  4. KEEP + DISSOLVE: faces are kept per the boolean op; edges
  *     between a kept and an unkept face are walked into shells and
  *     holes (the union of kept faces).
  *
  * Lower-dimensional intersection output (collinear boundary pieces,
  * isolated touch points) is collected from the same noded graph.
  */
object SetOps {

  private final val OpInt = 0
  private final val OpUnion = 1
  private final val OpDiff = 2
  private final val OpSym = 3

  // ------------------------------------------------------------ public

  def union(a: Geom, b: Geom): Geom = {
    if (a.isEmpty && b.isEmpty)
      return Overlay.emptyOfDim(math.max(a.dimension, b.dimension))
    if (isGC(a) || isGC(b)) return unionMany(Seq(a, b))
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    overlay(a, b, OpUnion)
  }

  def intersection(a: Geom, b: Geom): Geom = {
    val outDim = math.min(a.dimension, b.dimension)
    if (a.isEmpty || b.isEmpty || !a.envelope.intersects(b.envelope))
      return Overlay.emptyOfDim(outDim)
    if (isGC(a) || isGC(b)) return gcIntersection(a, b)
    overlay(a, b, OpInt)
  }

  def difference(a: Geom, b: Geom): Geom = {
    if (a.isEmpty) return Overlay.emptyOfDim(a.dimension)
    if (b.isEmpty) return a
    if (isGC(a) || isGC(b)) return gcDifference(a, b)
    if (!a.envelope.intersects(b.envelope)) return a
    overlay(a, b, OpDiff)
  }

  def symDifference(a: Geom, b: Geom): Geom = {
    if (a.isEmpty && b.isEmpty)
      return Overlay.emptyOfDim(math.max(a.dimension, b.dimension))
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    if (isGC(a) || isGC(b)) return union(difference(a, b), difference(b, a))
    overlay(a, b, OpSym)
  }

  /** Union of all components of g (reference: alg_overlay.go:274-286). */
  def unaryUnion(g: Geom): Geom = {
    if (g.isEmpty) return Overlay.emptyOfDim(g.dimension)
    unionMany(Seq(g))
  }

  def unionMany(gs: Seq[Geom]): Geom = {
    val parts = mutable.ArrayBuffer.empty[Geom]
    def walk(g: Geom): Unit = g match {
      case GColl(cs, _) => cs.foreach(walk)
      case g if g.isEmpty => ()
      case GMPoint(ps, _) => ps.filter(!_.isEmpty).foreach(parts += _)
      case GMLine(ls, ct) => ls.filter(!_.isEmpty).foreach(s => parts += GLine(s))
      case GMPoly(ps, ct) => ps.filter(_.nonEmpty).foreach(p => parts += GPoly(p, ct))
      case g => parts += g
    }
    gs.foreach(walk)
    if (parts.isEmpty) return Geom.emptyGC
    nAryUnion(parts.toSeq)
  }

  /** Repair an invalid geometry (GEOS wrapper analogue — reference
    * geos/entrypoints.go:259-267; the bowtie case is pinned by the
    * reference's own test, geos/entrypoints_test.go:843-857).
    *
    * Areal inputs use the EVEN-ODD (alternate) fill rule over the
    * noded ring linework — the classic linework / buffer(0) repair:
    * all ring segments are noded into a planar arrangement and a face
    * is kept iff its interior is covered by an ODD number of input
    * rings. Consequences: a self-crossing bowtie keeps both lobes, a
    * hole inside a shell stays a hole, a duplicated ring cancels to
    * empty, and the part of a "hole" extending outside its shell
    * becomes area (it is covered by exactly one ring). This is the
    * even-odd linework semantic, not GEOS's newer "structure" method
    * (which unions shells and subtracts hole unions; the two differ
    * when holes overlap each other).
    *
    * Valid inputs are detected first and returned UNCHANGED
    * (idempotent; never perturbs already-valid data — the dominant
    * case when used as a cleaning pass over web-extracted geometry).
    * Degenerate lines (fewer than 2 distinct points) collapse to
    * POINT, matching GEOS. Empties pass through. Repaired areal
    * output is 2D (the repair plane drops Z/M, like overlay).
    */
  def makeValid(g: Geom): Geom = g match {
    case _ if g.isEmpty => g
    case _: GPoint | _: GMPoint => g
    case l: GLine =>
      if (hasTwoDistinctPoints(l.seq)) l
      else GPoint(Array(l.seq.x(0), l.seq.y(0)), CT.XY)
    case ml: GMLine =>
      if (ml.lines.forall(s => s.isEmpty || hasTwoDistinctPoints(s))) ml
      else {
        val fixed = ml.lines.filter(!_.isEmpty).map(s => makeValid(GLine(s)))
        val (lines, pts) = fixed.partition(_.isInstanceOf[GLine])
        if (lines.isEmpty) GMPoint(pts.map(_.asInstanceOf[GPoint]), CT.XY)
        else if (pts.isEmpty) GMLine(lines.map(_.asInstanceOf[GLine].seq), ml.ct)
        else GColl(lines ++ pts, CT.XY)
      }
    case _: GPoly | _: GMPoly =>
      if (Validate.isValid(g)) g else arealMakeValidRobust(g)
    case GColl(cs, ct) => GColl(cs.map(makeValid), ct)
  }

  private def hasTwoDistinctPoints(s: Seqn): Boolean = {
    val n = s.n
    var i = 1
    while (i < n) {
      if (s.x(i) != s.x(0) || s.y(i) != s.y(0)) return true
      i += 1
    }
    false
  }

  /** All rings of an areal geometry, defensively closed (the parser
    * stores rings as given; pointInRing and the noder both need the
    * closing segment explicit).
    */
  private def collectRings(g: Geom): IndexedSeq[Seqn] = {
    val out = mutable.ArrayBuffer.empty[Seqn]
    def add(r: Seqn): Unit = if (r.n >= 2) {
      val closed =
        if (r.x(0) == r.x(r.n - 1) && r.y(0) == r.y(r.n - 1)) r
        else {
          val pts = (0 until r.n).map(i => (r.x(i), r.y(i))) :+ (r.x(0), r.y(0))
          seqnOf(pts)
        }
      out += closed
    }
    g match {
      case GPoly(rings, _) => rings.foreach(add)
      case GMPoly(ps, _) => ps.foreach(_.foreach(add))
      case _ => ()
    }
    out.toIndexedSeq
  }

  private def arealMakeValid(g: Geom, epsFactor: Double): Geom = {
    val rings = collectRings(g)
    val noder = new Noder(epsFactor)
    rings.foreach(r => noder.addLine(r, srcA = true))
    noder.node()
    if (noder.edges.isEmpty) return GPoly(Array.empty[Seqn], CT.XY)
    val arr = new Arrangement(noder.edges)
    arr.build()
    val kept = new Array[Boolean](arr.nFaces)
    var f = 0
    while (f < arr.nFaces) {
      if (!arr.faceUnbounded(f)) {
        val (px, py) = arr.faceInteriorPoint(f)
        var odd = false
        var i = 0
        while (i < rings.length) {
          if (Alg.pointInRing(rings(i), px, py) > 0) odd = !odd
          i += 1
        }
        kept(f) = odd
      }
      f += 1
    }
    normalizePinches(arr.dissolve(kept))
  }

  /** Dissolve can emit a pinched kept-region (two lobes sharing one
    * vertex) as a single self-touching ring — invalid as a polygon
    * ring. Normalize: split every ring at repeated vertices into
    * simple rings, then reassemble shells/holes by even-odd
    * containment nesting. Arrangement output rings are edge-disjoint
    * and never cross (they can only share vertices), so the nesting
    * is well-defined. No-op (input returned as-is) when no ring has a
    * repeated vertex — the overwhelmingly common case.
    */
  private def normalizePinches(g: Geom): Geom = {
    def ringsOf(x: Geom): IndexedSeq[Seqn] = x match {
      case GPoly(rs, _) => rs.toIndexedSeq
      case GMPoly(ps, _) => ps.toIndexedSeq.flatten
      case _ => IndexedSeq.empty
    }
    val rings = ringsOf(g)
    if (rings.isEmpty || !rings.exists(hasRepeatedVertex)) return g
    assembleRings(rings.flatMap(splitSimpleRings))
  }

  private def hasRepeatedVertex(r: Seqn): Boolean = {
    val seen = mutable.HashSet.empty[(Double, Double)]
    var i = 0
    while (i < r.n - 1) { // skip the closing duplicate of vertex 0
      if (!seen.add((r.x(i), r.y(i)))) return true
      i += 1
    }
    false
  }

  /** Split a closed ring at repeated vertices until every piece is a
    * simple closed ring; zero-area pieces are dropped.
    */
  private[core] def splitSimpleRings(r0: Seqn): Seq[Seqn] = {
    val out = mutable.ArrayBuffer.empty[Seqn]
    val stack = mutable.ArrayBuffer(r0)
    while (stack.nonEmpty) {
      val s = stack.remove(stack.length - 1)
      val n = s.n
      var dupA = -1; var dupB = -1
      val seen = mutable.HashMap.empty[(Double, Double), Int]
      var i = 0
      while (dupA < 0 && i < n - 1) {
        seen.get((s.x(i), s.y(i))) match {
          case Some(j) => dupA = j; dupB = i
          case None => seen((s.x(i), s.y(i))) = i
        }
        i += 1
      }
      if (dupA < 0) {
        if (n >= 4 && Alg.signedRingArea(s) != 0.0) out += s
      } else {
        // piece 1: vertices dupA..dupB (s(dupB) == s(dupA) closes it);
        // piece 2: the remainder with the loop excised
        stack += seqnOf((dupA to dupB).map(k => (s.x(k), s.y(k))))
        stack += seqnOf(((0 to dupA) ++ (dupB + 1 until n)).map(k => (s.x(k), s.y(k))))
      }
    }
    out.toSeq
  }

  /** Does ring S properly contain ring R's CURVE? Valid only for
    * edge-disjoint, non-crossing rings (arrangement / triangulation
    * boundaries): the first R vertex strictly inside or outside S
    * decides; if every vertex lies ON S (shared nodes), an R edge
    * midpoint decides (distinct edges cannot overlap collinearly in
    * an arrangement, so the midpoint is never on S).
    */
  private def ringContainsRing(s: Seqn, r: Seqn): Boolean = {
    var i = 0
    while (i < r.n - 1) {
      val loc = Alg.pointInRing(s, r.x(i), r.y(i))
      if (loc > 0) return true
      if (loc < 0) return false
      i += 1
    }
    Alg.pointInRing(s, (r.x(0) + r.x(1)) / 2, (r.y(0) + r.y(1)) / 2) > 0
  }

  /** Reassemble simple, non-crossing, edge-disjoint rings into
    * polygons: a ring properly contained in an EVEN number of others
    * is a shell, odd is a hole of its smallest containing shell.
    * Shells come out CCW, holes CW. (Containment is tested on the
    * ring CURVE, not on a disk-interior probe — a probe can land
    * inside a sibling hole and misclassify, e.g. an annulus.)
    */
  private[core] def assembleRings(ringsIn: Seq[Seqn]): Geom = {
    val rings = ringsIn.toIndexedSeq
    if (rings.isEmpty) return GPoly(Array.empty[Seqn], CT.XY)
    val absArea = rings.map(r => math.abs(Alg.signedRingArea(r)))
    val n = rings.length
    val contains = Array.ofDim[Boolean](n, n)
    for (j <- 0 until n; i <- 0 until n; if j != i)
      contains(j)(i) = ringContainsRing(rings(j), rings(i))
    val depth = Array.tabulate(n)(i => (0 until n).count(j => j != i && contains(j)(i)))
    def oriented(r: Seqn, ccw: Boolean): Seqn =
      if ((Alg.signedRingArea(r) > 0) == ccw) r else r.reversed
    val shellIdx = (0 until n).filter(depth(_) % 2 == 0)
    val holeIdx = (0 until n).filter(depth(_) % 2 == 1)
    val polyRings = shellIdx.map(si => mutable.ArrayBuffer(oriented(rings(si), ccw = true)))
    for (hi <- holeIdx) {
      var best = -1; var bestArea = Double.MaxValue
      var k = 0
      while (k < shellIdx.length) {
        val si = shellIdx(k)
        if (absArea(si) < bestArea && contains(si)(hi)) {
          best = k; bestArea = absArea(si)
        }
        k += 1
      }
      if (best >= 0) polyRings(best) += oriented(rings(hi), ccw = false)
    }
    if (polyRings.length == 1) GPoly(polyRings.head.toArray, CT.XY)
    else GMPoly(polyRings.map(_.toArray).toArray, CT.XY)
  }

  /** makeValid with the same escalation ladder as overlay: base
    * tolerance first, widening snap eps on exception/invalid output,
    * finally snap-rounding the input coordinates to a shared grid.
    * The acceptance test IS validity — that is the operator's
    * postcondition.
    */
  private def arealMakeValidRobust(g: Geom): Geom = {
    var lastEx: Throwable = null
    var i = 0
    while (i < SnapLadder.length) {
      try {
        val f = Noder.BaseEpsFactor * SnapLadder(i)
        val r = arealMakeValid(g, f)
        if (r.isEmpty || Validate.isValid(r)) return r
      } catch { case e: Exception => lastEx = e }
      i += 1
    }
    try {
      val e = g.envelope
      val scale =
        if (e.isEmpty) 0.0
        else math.max(math.max(math.abs(e.xmin), math.abs(e.xmax)),
          math.max(math.abs(e.ymin), math.abs(e.ymax)))
      val decimals = math.max(0, math.min(12,
        9 - math.ceil(math.log10(math.max(scale, 1e-30))).toInt))
      val r = arealMakeValid(Geom.snapToGrid(g, decimals), Noder.BaseEpsFactor)
      if (r.isEmpty || Validate.isValid(r)) return r
    } catch { case e: Exception => lastEx = e }
    if (lastEx != null) throw lastEx
    throw new IllegalStateException(
      "makeValid produced an invalid result at every snap-ladder rung")
  }

  // --------------------------------------------------- GC-aware plans

  private def isGC(g: Geom): Boolean = g.isInstanceOf[GColl]

  private def atomicParts(g: Geom): Seq[Geom] = {
    val out = mutable.ArrayBuffer.empty[Geom]
    def walk(x: Geom): Unit = x match {
      case GColl(cs, _) => cs.foreach(walk)
      case GMPoint(ps, _) => ps.filter(!_.isEmpty).foreach(out += _)
      case GMLine(ls, _) => ls.filter(!_.isEmpty).foreach(s => out += GLine(s))
      case GMPoly(ps, ct) => ps.filter(_.nonEmpty).foreach(p => out += GPoly(p, ct))
      case x if !x.isEmpty => out += x
      case _ => ()
    }
    walk(x = g)
    out.toSeq
  }

  /** Pairwise intersections across parts, unioned
    * (reference: alg_overlay.go:84-120 incl. the R-tree over parts).
    */
  private def gcIntersection(a: Geom, b: Geom): Geom = {
    val pa = atomicParts(if (isGC(a)) unaryUnion(a) else a)
    val pb = atomicParts(if (isGC(b)) unaryUnion(b) else b)
    if (pa.isEmpty || pb.isEmpty)
      return Overlay.emptyOfDim(math.min(a.dimension, b.dimension))
    val tree = RTree.bulkLoad(pb.map(_.envelope).toArray)
    val results = mutable.ArrayBuffer.empty[Geom]
    for (x <- pa; e = x.envelope; if !e.isEmpty) {
      tree.rangeSearch(e) { i =>
        val r = intersection(x, pb(i))
        if (!r.isEmpty) results += r
        true
      }
    }
    if (results.isEmpty) Overlay.emptyOfDim(math.min(a.dimension, b.dimension))
    else unionMany(results.toSeq)
  }

  /** Sequential subtraction per part (reference: alg_overlay.go:158-220). */
  private def gcDifference(a: Geom, b: Geom): Geom = {
    val pa = atomicParts(if (isGC(a)) unaryUnion(a) else a)
    val pb = atomicParts(if (isGC(b)) unaryUnion(b) else b)
    if (pb.isEmpty) return unionMany(pa)
    val tree = RTree.bulkLoad(pb.map(_.envelope).toArray)
    val results = mutable.ArrayBuffer.empty[Geom]
    for (x <- pa) {
      var cur = x
      tree.rangeSearch(x.envelope) { i =>
        if (!cur.isEmpty && cur.envelope.intersects(pb(i).envelope))
          cur = difference(cur, pb(i))
        !cur.isEmpty
      }
      if (!cur.isEmpty) results += cur
    }
    if (results.isEmpty) Overlay.emptyOfDim(a.dimension)
    else unionMany(results.toSeq)
  }

  /** n-ary union of atomic parts, by dimension: areal parts go through
    * ONE shared arrangement (kept face = inside any part); line parts
    * are noded and deduped, dropping pieces covered by the areal
    * result; points are deduped and dropped if covered.
    */
  private def nAryUnion(parts: Seq[Geom]): Geom = {
    val polys = parts.filter(_.dimension == 2)
    val lines = parts.collect { case l: GLine => l }
    val points = parts.collect { case p: GPoint if !p.isEmpty => p }

    val arealResult: Geom =
      if (polys.isEmpty) GPoly(Array.empty, CT.XY)
      else if (polys.size == 1) polys.head
      else nAryArealUnionRobust(polys.toIndexedSeq)

    val lineResult: Geom =
      if (lines.isEmpty) GLine(Seqn.empty2D)
      else {
        // dedupe/merge the lines among themselves, then subtract the
        // areal closure via the line-areal overlay (which nodes line
        // segments at areal boundary crossings — a piece-midpoint test
        // without that noding misses partially-covered segments)
        val noder = new Noder
        lines.foreach(l => noder.addLine(l.seq, srcA = true))
        noder.node()
        val merged = linesFromEdges(noder.edges)
        if (arealResult.isEmpty || merged.isEmpty) merged
        else lineArealOverlay(merged, arealResult, OpDiff, lineIsA = true)
      }

    val pointResult: Geom = {
      val kept = points.filter { p =>
        (arealResult.isEmpty || Alg.pointInAreal(arealResult, p.x, p.y) < 0) &&
          (lineResult.isEmpty || !Intersects.intersects(p, lineResult))
      }
      dedupPoints(kept.map(p => (p.x, p.y)))
    }

    assembleMixed(arealResult, lineResult, pointResult)
  }

  private[core] def debugNaryRung(polys: IndexedSeq[Geom], f: Double): Geom =
    nAryArealUnionRung(polys, f)
  private[core] def debugNarySane(polys: IndexedSeq[Geom], r: Geom, f: Double): Boolean =
    nAryUnionSane(polys, r, f)

  /** Single-pass n-ary areal union: node ALL input boundaries in one
    * arrangement and keep the faces covered by at least one input
    * (inputs located per face interior point through an R-tree over
    * input envelopes). Each input vertex participates in ONE noding
    * pass instead of the O(log n) cascaded pairwise overlays — this is
    * what makes buffer (union of ~2 pieces per input vertex) and large
    * st_union_agg groups near-linear.
    */
  private def nAryArealUnionRung(polys: IndexedSeq[Geom],
                                 epsFactor: Double): Geom = {
    val noder = new Noder(epsFactor)
    polys.foreach(p => addRingsOf(noder, p, srcA = true))
    noder.node()
    val arr = new Arrangement(noder.edges)
    arr.build()
    val envs = new Array[Env](polys.length)
    val locs = new Array[ArealLocator](polys.length)
    var i = 0
    while (i < polys.length) {
      envs(i) = polys(i).envelope
      // prepared locator for big inputs only: tiny capsule pieces are
      // cheaper to ray-cast directly than to index
      if (ArealLocator.edgeCount(polys(i)) >= 32)
        locs(i) = ArealLocator.build(polys(i))
      i += 1
    }
    val tree = RTree.bulkLoad(envs)
    val kept = new Array[Boolean](arr.nFaces)
    var f = 0
    while (f < arr.nFaces) {
      if (!arr.faceUnbounded(f)) {
        val (px, py) = arr.faceInteriorPoint(f)
        var in = false
        tree.rangeSearch(Env(px, py, px, py)) { pi =>
          val loc =
            if (locs(pi) != null) locs(pi).locate(px, py)
            else Alg.pointInAreal(polys(pi), px, py)
          if (loc > 0) { in = true; false }
          else true
        }
        kept(f) = in
      }
      f += 1
    }
    arr.dissolve(kept)
  }

  private def nAryUnionSane(polys: IndexedSeq[Geom], r: Geom,
                            epsFactor: Double): Boolean = {
    var sumA = 0.0; var maxA = 0.0; var sumP = 0.0; var scale = 0.0
    def perimeter(g: Geom): Double = g match {
      case GPoly(rs, _) => rs.iterator.map(Measure.seqLength).sum
      case GMPoly(ps, _) => ps.iterator.map(_.iterator.map(Measure.seqLength).sum).sum
      case GColl(cs, _) => cs.iterator.map(perimeter).sum
      case _ => 0.0
    }
    polys.foreach { p =>
      val a = Measure.area(p)
      sumA += a; if (a > maxA) maxA = a
      sumP += perimeter(p)
      val e = p.envelope
      if (!e.isEmpty) {
        scale = math.max(scale, math.max(math.max(math.abs(e.xmin), math.abs(e.xmax)),
          math.max(math.abs(e.ymin), math.abs(e.ymax))))
      }
    }
    val rA = Measure.area(r)
    val tol = 4 * epsFactor * scale * sumP + 1e-9 * maxA + java.lang.Double.MIN_NORMAL
    rA >= maxA - tol && rA <= sumA + tol
  }

  /** n-ary areal union with the same escalation ladder as the binary
    * overlay; falls back to the cascaded pairwise union (whose
    * per-pair ladders localize hard cases) if every rung fails.
    *
    * The single-arrangement pass wins when inputs are mostly disjoint
    * (each vertex noded once instead of O(log n) times) but loses
    * badly when inputs overlap densely — the shared arrangement then
    * carries every pairwise crossing at once (O(n * overlap) edges)
    * where cascaded union dissolves interior detail early. Choose by
    * envelope-overlap ratio: sum of input envelope areas over the
    * union envelope's area approximates the mean overlap multiplicity.
    */
  private def nAryArealUnionRobust(polys: IndexedSeq[Geom]): Geom = {
    var sumEnvA = 0.0
    var uxmin = Double.PositiveInfinity; var uymin = Double.PositiveInfinity
    var uxmax = Double.NegativeInfinity; var uymax = Double.NegativeInfinity
    polys.foreach { p =>
      val e = p.envelope
      if (!e.isEmpty) {
        sumEnvA += (e.xmax - e.xmin) * (e.ymax - e.ymin)
        if (e.xmin < uxmin) uxmin = e.xmin
        if (e.ymin < uymin) uymin = e.ymin
        if (e.xmax > uxmax) uxmax = e.xmax
        if (e.ymax > uymax) uymax = e.ymax
      }
    }
    val unionEnvA = math.max(uxmax - uxmin, 0.0) * math.max(uymax - uymin, 0.0)
    if (unionEnvA > 0 && sumEnvA > 4.0 * unionEnvA)
      return cascadedArealUnion(polys)
    var i = 0
    while (i < SnapLadder.length) {
      try {
        val f = Noder.BaseEpsFactor * SnapLadder(i)
        val r = nAryArealUnionRung(polys, f)
        val ok = nAryUnionSane(polys, r, f) &&
          (i == 0 || r.isEmpty || r.dimension < 2 || Validate.isValid(r))
        if (ok) return r
      } catch { case _: Exception => () }
      i += 1
    }
    cascadedArealUnion(polys)
  }

  /** Cascaded (balanced-tree) pairwise union in envelope-sorted order —
    * the reference's cascaded-union shape (OverlayNGRobust_Union);
    * fallback when the single-pass n-ary rung fails sanity.
    */
  private def cascadedArealUnion(polys: IndexedSeq[Geom]): Geom = {
    var level = polys.sortBy { p =>
      val e = p.envelope; (e.xmin, e.ymin)
    }.toIndexedSeq
    while (level.size > 1) {
      level = level.grouped(2).map {
        case Seq(x, y) =>
          if (!x.envelope.intersects(y.envelope)) mergeDisjointAreal(x, y)
          else overlay(x, y, OpUnion)
        case Seq(x) => x
      }.toIndexedSeq
    }
    level.head
  }

  /** Concatenate two areal geoms with disjoint envelopes into one
    * MultiPolygon — no overlay needed.
    */
  private def mergeDisjointAreal(a: Geom, b: Geom): Geom = {
    val parts = mutable.ArrayBuffer.empty[Array[Seqn]]
    def add(g: Geom): Unit = g match {
      case GPoly(rs, _) if rs.nonEmpty => parts += rs
      case GMPoly(ps, _) => ps.filter(_.nonEmpty).foreach(parts += _)
      case _ => ()
    }
    add(a); add(b)
    if (parts.isEmpty) GPoly(Array.empty, CT.XY)
    else if (parts.length == 1) GPoly(parts.head, CT.XY)
    else GMPoly(parts.toArray, CT.XY)
  }

  // ------------------------------------------------ binary dispatcher

  private def overlay(a: Geom, b: Geom, op: Int): Geom = {
    val da = a.dimension; val db = b.dimension
    (da, db) match {
      case (2, 2) => arealOverlayRobust(a, b, op)
      case (0, _) | (_, 0) => pointOverlay(a, b, op)
      case (1, 1) => lineLineOverlay(a, b, op)
      case (1, 2) => lineArealOverlay(a, b, op, lineIsA = true)
      case (2, 1) => lineArealOverlay(b, a, swapDiffOp(op), lineIsA = false)
      case _ => throw new UnsupportedOperationException(
        s"overlay for dims ($da,$db) not supported")
    }
  }

  // ------------------------------------- robustness escalation ladder

  /** Snap-tolerance ladder, as a multiple of the base eps factor
    * (reference: operation_overlayng_overlay_ng_robust.go:5-34 — float
    * noder, then snapping at escalating tolerance, then snap-rounding).
    * Our base attempt already IS an eps-snapping noder, so the ladder
    * is: base eps -> x5 -> x25 -> x125 -> x625 -> grid snap-rounding.
    */
  private val SnapLadder = Seq(1.0, 5.0, 25.0, 125.0, 625.0)

  /** Cheap result invariants that a broken arrangement violates: the
    * output area must be consistent with the inputs' areas up to the
    * snapping budget (a face misclassification or dropped face moves
    * area by whole-face amounts, far beyond it). Legitimate snapping
    * at tolerance eps moves each boundary point by <= ~eps, so the
    * area can shift by at most ~eps x total boundary length — that,
    * not a fixed relative factor, is the honest tolerance: extreme
    * slivers (perimeter >> sqrt(area)) legitimately lose a larger
    * area fraction to snapping.
    */
  private def arealSane(a: Geom, b: Geom, op: Int, r: Geom,
                        epsFactor: Double): Boolean = {
    val aA = Measure.area(a); val aB = Measure.area(b)
    val rA = Measure.area(r)
    def scaleOf(g: Geom): Double = {
      val e = g.envelope
      if (e.isEmpty) 0.0
      else math.max(math.max(math.abs(e.xmin), math.abs(e.xmax)),
        math.max(math.abs(e.ymin), math.abs(e.ymax)))
    }
    def perimeter(g: Geom): Double = g match {
      case GPoly(rs, _) => rs.iterator.map(Measure.seqLength).sum
      case GMPoly(ps, _) => ps.iterator.map(_.iterator.map(Measure.seqLength).sum).sum
      case GColl(cs, _) => cs.iterator.map(perimeter).sum
      case _ => 0.0
    }
    val eps = epsFactor * math.max(scaleOf(a), scaleOf(b))
    val tol = 4 * eps * (perimeter(a) + perimeter(b)) +
      1e-9 * math.max(aA, aB) + java.lang.Double.MIN_NORMAL
    op match {
      case OpInt => rA <= math.min(aA, aB) + tol
      case OpUnion => rA >= math.max(aA, aB) - tol && rA <= aA + aB + tol
      case OpDiff => rA <= aA + tol && rA >= aA - aB - tol
      case OpSym => rA <= aA + aB + tol && rA >= math.abs(aA - aB) - tol
    }
  }

  /** Test hook: one rung of the ladder at a fixed eps factor, with
    * the same pass criteria the ladder applies — lets specs exhibit
    * inputs where the base rung demonstrably fails and the escalation
    * recovers. Returns None when the rung throws or produces an
    * insane/invalid result.
    */
  private[core] def unionSingleRung(a: Geom, b: Geom,
                                    epsFactor: Double): Option[Geom] =
    try {
      val r = arealOverlay(a, b, OpUnion, epsFactor)
      if (arealSane(a, b, OpUnion, r, epsFactor) &&
          (r.isEmpty || r.dimension < 2 || Validate.isValid(r))) Some(r)
      else None
    } catch { case _: Exception => None }

  /** Areal overlay with the escalation ladder: try at base tolerance
    * (the hot path — no extra validation cost beyond an O(n) area
    * check); on an exception or an insane result, retry with widening
    * snap tolerance, validating escalated results; finally snap-round
    * the INPUTS to a precision-preserving grid (~9 significant
    * figures at the coordinate scale) and overlay the rounded inputs.
    */
  private def arealOverlayRobust(a: Geom, b: Geom, op: Int): Geom = {
    var lastEx: Throwable = null
    var i = 0
    while (i < SnapLadder.length) {
      try {
        val f = Noder.BaseEpsFactor * SnapLadder(i)
        val r = arealOverlay(a, b, op, f)
        val ok = arealSane(a, b, op, r, f) &&
          (i == 0 || r.isEmpty || r.dimension < 2 || Validate.isValid(r))
        if (ok) return r
      } catch { case e: Exception => lastEx = e }
      i += 1
    }
    // final rung: snap-rounding — quantize the inputs themselves so
    // every coordinate is exactly representable on a common grid
    try {
      def scaleOf(g: Geom): Double = {
        val e = g.envelope
        if (e.isEmpty) 0.0
        else math.max(math.max(math.abs(e.xmin), math.abs(e.xmax)),
          math.max(math.abs(e.ymin), math.abs(e.ymax)))
      }
      val scale = math.max(scaleOf(a), scaleOf(b))
      val decimals = math.max(0, math.min(12,
        9 - math.ceil(math.log10(math.max(scale, 1e-30))).toInt))
      val ga = Geom.snapToGrid(a, decimals)
      val gb = Geom.snapToGrid(b, decimals)
      val r = arealOverlay(ga, gb, op, Noder.BaseEpsFactor)
      // grid snapping moved points by up to the grid pitch; judge the
      // result at the equivalent eps factor, not the base one
      val gridEps = math.pow(10.0, -decimals) / math.max(scale, 1e-30)
      if (arealSane(ga, gb, op, r, math.max(gridEps, Noder.BaseEpsFactor))) return r
    } catch { case e: Exception => lastEx = e }
    if (lastEx != null) throw lastEx
    throw new IllegalStateException(
      s"overlay failed area-sanity at every snap-ladder rung (op=$op)")
  }

  private def swapDiffOp(op: Int): Int = op // symmetry handled inside

  // --------------------------------------------------- point overlays

  private def pointsOf(g: Geom): Seq[(Double, Double)] =
    Geom.dump(g).collect { case p: GPoint if !p.isEmpty => (p.x, p.y) }.toSeq

  private def dedupPoints(pts: Seq[(Double, Double)]): Geom = {
    val seen = mutable.LinkedHashSet.empty[(Double, Double)]
    pts.foreach(p => seen += ((p._1 + 0.0, p._2 + 0.0)))
    if (seen.isEmpty) GPoint.empty
    else if (seen.size == 1) GPoint.xy(seen.head._1, seen.head._2)
    else GMPoint(seen.toArray.map(p => GPoint.xy(p._1, p._2)), CT.XY)
  }

  private def pointOverlay(a: Geom, b: Geom, op: Int): Geom = {
    def locIn(g: Geom, x: Double, y: Double): Boolean =
      Intersects.intersects(GPoint.xy(x, y), g)
    op match {
      case OpInt =>
        val pts = if (a.dimension == 0) pointsOf(a).filter(p => locIn(b, p._1, p._2))
                  else pointsOf(b).filter(p => locIn(a, p._1, p._2))
        dedupPoints(pts)
      case OpDiff =>
        if (a.dimension == 0) dedupPoints(pointsOf(a).filterNot(p => locIn(b, p._1, p._2)))
        else {
          // areal/line minus points = unchanged (points are measure zero)
          a
        }
      case OpUnion | OpSym =>
        if (a.dimension == 0 && b.dimension == 0) {
          if (op == OpUnion) dedupPoints(pointsOf(a) ++ pointsOf(b))
          else {
            val pa = pointsOf(a).map(p => (p._1 + 0.0, p._2 + 0.0)).toSet
            val pb = pointsOf(b).map(p => (p._1 + 0.0, p._2 + 0.0)).toSet
            dedupPoints(((pa diff pb) ++ (pb diff pa)).toSeq)
          }
        } else {
          val (pts, other) = if (a.dimension == 0) (a, b) else (b, a)
          val leftover = pointsOf(pts).filterNot(p => locIn(other, p._1, p._2))
          if (leftover.isEmpty) other
          else GColl(Array(other, dedupPoints(leftover)), CT.XY)
        }
    }
  }

  // ------------------------------------------------------ line x line

  private def addLinesOf(noder: Noder, g: Geom, srcA: Boolean): Unit = g match {
    case GLine(s) => noder.addLine(s, srcA)
    case GMLine(ls, _) => ls.foreach(s => noder.addLine(s, srcA))
    case _ => ()
  }

  private def lineLineOverlay(a: Geom, b: Geom, op: Int): Geom = {
    val noder = new Noder
    addLinesOf(noder, a, srcA = true)
    addLinesOf(noder, b, srcA = false)
    noder.node()
    val edges = noder.edges
    op match {
      case OpInt =>
        val shared = edges.filter(e => e.aSrc && e.bSrc)
        val lineG = linesFromEdges(shared)
        // isolated crossing points between A and B not covered by a
        // shared edge
        val endpoints = mutable.HashSet.empty[(Double, Double)]
        shared.foreach { e =>
          endpoints += ((e.x1, e.y1)); endpoints += ((e.x2, e.y2)) }
        val touchPts = noder.abNodes.toSeq
          .filterNot(p => endpoints.contains(p))
          .filterNot(p => shared.exists(e => Alg.onSegment(e.x1, e.y1, e.x2, e.y2, p._1, p._2)))
        assembleMixed(GPoly(Array.empty, CT.XY), lineG, dedupPoints(touchPts), emptyDim = 1)
      case OpUnion => linesFromEdges(edges)
      case OpDiff => linesFromEdges(edges.filter(e => e.aSrc && !e.bSrc))
      case OpSym => linesFromEdges(edges.filter(e => e.aSrc ^ e.bSrc))
    }
  }

  // ----------------------------------------------------- line x areal

  /** line op areal. For (2,1) inputs the caller passes the line first;
    * `lineIsA` tells us whether the original left operand was the line
    * (matters for difference only).
    */
  private def lineArealOverlay(line: Geom, areal: Geom, op: Int,
                               lineIsA: Boolean): Geom = {
    val noder = new Noder
    addLinesOf(noder, line, srcA = true)
    addRingsOf(noder, areal, srcA = false)
    noder.node()
    // classify only the pieces that came from the line
    val pieces = noder.edges.filter(_.aSrc)
    def loc(e: NodedEdge): Int =
      if (e.bSrc) 0 // collinear with the areal boundary
      else Alg.pointInAreal(areal, (e.x1 + e.x2) / 2, (e.y1 + e.y2) / 2)
    op match {
      case OpInt =>
        val kept = pieces.filter(e => loc(e) >= 0)
        val lineG = linesFromEdges(kept)
        val endpoints = mutable.HashSet.empty[(Double, Double)]
        kept.foreach { e => endpoints += ((e.x1, e.y1)); endpoints += ((e.x2, e.y2)) }
        val touchPts = noder.abNodes.toSeq
          .filterNot(p => endpoints.contains(p))
          .filterNot(p => kept.exists(e => Alg.onSegment(e.x1, e.y1, e.x2, e.y2, p._1, p._2)))
          .filter(p => Alg.pointInAreal(areal, p._1, p._2) >= 0)
        assembleMixed(GPoly(Array.empty, CT.XY), lineG, dedupPoints(touchPts), emptyDim = 1)
      case OpDiff =>
        if (lineIsA) linesFromEdges(pieces.filter(e => loc(e) < 0))
        else areal // areal minus line: lines are measure zero
      case OpUnion | OpSym =>
        val outside = linesFromEdges(pieces.filter(e => loc(e) < 0))
        if (outside.isEmpty) areal
        else GColl(Array(areal, outside), CT.XY)
    }
  }

  // ---------------------------------------------------- areal x areal

  private def addRingsOf(noder: Noder, g: Geom, srcA: Boolean): Unit = g match {
    case GPoly(rings, _) => rings.foreach(r => noder.addLine(r, srcA))
    case GMPoly(ps, _) => ps.foreach(_.foreach(r => noder.addLine(r, srcA)))
    case GColl(cs, _) => cs.foreach(addRingsOf(noder, _, srcA))
    case _ => ()
  }

  private def keep(op: Int, inA: Boolean, inB: Boolean): Boolean = op match {
    case OpInt => inA && inB
    case OpUnion => inA || inB
    case OpDiff => inA && !inB
    case OpSym => inA ^ inB
  }

  private def arealOverlay(a: Geom, b: Geom, op: Int,
                           epsFactor: Double = Noder.BaseEpsFactor): Geom = {
    val noder = new Noder(epsFactor)
    addRingsOf(noder, a, srcA = true)
    addRingsOf(noder, b, srcA = false)
    noder.node()
    val arr = new Arrangement(noder.edges)
    arr.build()

    // classify faces — prepared locators when the inputs are big
    // enough that O(faces x edges) plain ray casts would dominate
    val locA = if (ArealLocator.edgeCount(a) >= 32) ArealLocator.build(a) else null
    val locB = if (ArealLocator.edgeCount(b) >= 32) ArealLocator.build(b) else null
    val keptFace = new Array[Boolean](arr.nFaces)
    var f = 0
    while (f < arr.nFaces) {
      if (!arr.faceUnbounded(f)) {
        val (px, py) = arr.faceInteriorPoint(f)
        val inA = (if (locA != null) locA.locate(px, py)
                   else Alg.pointInAreal(a, px, py)) > 0
        val inB = (if (locB != null) locB.locate(px, py)
                   else Alg.pointInAreal(b, px, py)) > 0
        keptFace(f) = keep(op, inA, inB)
      }
      f += 1
    }

    val arealResult = arr.dissolve(keptFace)

    if (op != OpInt) return arealResult

    // lower-dimensional intersection output: collinear boundary pieces
    // between A and B not adjacent to a kept face; then isolated touch
    // points not covered by anything kept. Typical clean polygon
    // intersections have neither — skip the hash-set bookkeeping.
    var anyShared = false
    var ei = 0
    while (!anyShared && ei < arr.edges.length) {
      val e = arr.edges(ei)
      if (e.aSrc && e.bSrc) anyShared = true
      ei += 1
    }
    if (!anyShared && noder.abNodes.isEmpty) return arealResult

    val sharedEdges = mutable.ArrayBuffer.empty[NodedEdge]
    ei = 0
    while (ei < arr.edges.length) {
      val e = arr.edges(ei)
      if (e.aSrc && e.bSrc && !keptFace(arr.leftFace(ei)) && !keptFace(arr.rightFace(ei)))
        sharedEdges += e
      ei += 1
    }
    val lineG = linesFromEdges(sharedEdges.toSeq)

    val touchPts =
      if (noder.abNodes.isEmpty) Seq.empty[(Double, Double)]
      else {
        // abNodes is small (one entry per A-B contact); test edge
        // endpoints against it instead of building a covered-point set
        // over every edge endpoint
        val abSet = noder.abNodes
        val covered = mutable.HashSet.empty[(Double, Double)]
        ei = 0
        while (ei < arr.edges.length && covered.size < abSet.size) {
          val e = arr.edges(ei)
          val keptAdj = keptFace(arr.leftFace(ei)) || keptFace(arr.rightFace(ei)) ||
            (e.aSrc && e.bSrc)
          if (keptAdj) {
            val p1 = (e.x1, e.y1)
            if (abSet.contains(p1)) covered += p1
            val p2 = (e.x2, e.y2)
            if (abSet.contains(p2)) covered += p2
          }
          ei += 1
        }
        abSet.toSeq.filterNot(covered.contains)
      }
    assembleMixed(arealResult, lineG, dedupPoints(touchPts))
  }

  // ------------------------------------------------------- assembly

  /** Merge noded 2-point edges into maximal linestrings through
    * degree-2 nodes.
    */
  private def linesFromEdges(edges: Seq[NodedEdge]): Geom = {
    if (edges.isEmpty) return GLine(Seqn.empty2D)
    type Pt = (Double, Double)
    val adj = mutable.HashMap.empty[Pt, mutable.ArrayBuffer[Int]]
    edges.zipWithIndex.foreach { case (e, i) =>
      adj.getOrElseUpdate((e.x1, e.y1), mutable.ArrayBuffer.empty) += i
      adj.getOrElseUpdate((e.x2, e.y2), mutable.ArrayBuffer.empty) += i
    }
    val used = new Array[Boolean](edges.length)
    val out = mutable.ArrayBuffer.empty[Seqn]

    def walk(start: Int, fromPt: Pt): mutable.ArrayBuffer[Pt] = {
      val pts = mutable.ArrayBuffer[Pt](fromPt)
      var cur = start
      var at = fromPt
      var continue = true
      while (continue) {
        used(cur) = true
        val e = edges(cur)
        val next: Pt = if ((e.x1, e.y1) == at) (e.x2, e.y2) else (e.x1, e.y1)
        pts += next
        at = next
        val cands = adj(at).filterNot(used(_))
        if (cands.length == 1 && adj(at).length == 2) cur = cands.head
        else continue = false
      }
      pts
    }

    // start walks at nodes that are not degree-2 (chain endpoints)
    for ((pt, ids) <- adj if ids.length != 2; i <- ids if !used(i))
      out += seqnOf(walk(i, pt).toSeq)
    // leftover pure cycles
    edges.indices.foreach { i =>
      if (!used(i)) {
        val e = edges(i)
        out += seqnOf(walk(i, (e.x1, e.y1)).toSeq)
      }
    }
    if (out.isEmpty) GLine(Seqn.empty2D)
    else if (out.length == 1) GLine(out.head)
    else GMLine(out.toArray, CT.XY)
  }

  private def seqnOf(pts: Seq[(Double, Double)]): Seqn = {
    val arr = new Array[Double](pts.length * 2)
    var i = 0
    pts.foreach { p => arr(i) = p._1; arr(i + 1) = p._2; i += 2 }
    Seqn.xy(arr)
  }

  /** Combine areal + line + point results into the leanest type;
    * all-empty yields the dim-typed empty (reference:
    * alg_overlay.go:29-44 createEmptyResult).
    */
  private def assembleMixed(areal: Geom, line: Geom, point: Geom,
                            emptyDim: Int = 2): Geom = {
    val parts = mutable.ArrayBuffer.empty[Geom]
    if (!areal.isEmpty) parts += areal
    if (!line.isEmpty) parts += line
    if (!point.isEmpty) parts += point
    parts.length match {
      case 0 => Overlay.emptyOfDim(emptyDim)
      case 1 => parts.head
      case _ => GColl(parts.toArray, CT.XY)
    }
  }
}

object Noder {
  /** Default snap tolerance as a fraction of the coordinate scale. */
  final val BaseEpsFactor = 1e-12
}

/** One noded, deduplicated, undirected edge of the overlay graph. */
final case class NodedEdge(x1: Double, y1: Double, x2: Double, y2: Double,
                           var aSrc: Boolean, var bSrc: Boolean)

/** Segment noder: collects tagged segments, splits them at mutual
  * intersections (computed once per crossing pair so the split point is
  * bit-identical on both), dedupes sub-segments, and records the nodes
  * where an A-segment meets a B-segment (candidate touch points).
  */
final class Noder(epsFactor: Double = Noder.BaseEpsFactor) {
  private val segs = mutable.ArrayBuffer.empty[Array[Double]] // x1,y1,x2,y2
  private val segSrcA = mutable.ArrayBuffer.empty[Boolean]
  private val splits = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[(Double, Double)]]

  /** Nodes where an A-source segment intersects a B-source segment. */
  val abNodes: mutable.LinkedHashSet[(Double, Double)] = mutable.LinkedHashSet.empty

  var edges: IndexedSeq[NodedEdge] = IndexedSeq.empty

  // ---- eps-snapping node registry (the snapping-noder idea from the
  // reference's fallback ladder, jts OverlayNGRobust): vertices and
  // intersection points within eps = 1e-12 * coordinate scale collapse
  // to one node, closing the floating-point micro-cracks that
  // independently-computed coordinates (e.g. r*cos(pi/2) = 9e-17 vs an
  // exact 0) would otherwise open in the arrangement.
  private var eps = 0.0
  // cell -> interleaved x,y point list, keyed by a MIXED hash of the
  // (ix, iy) cell (LongMap, no boxed tuple keys — the snap registry is
  // the hottest allocation site of the whole overlay). Hash collisions
  // between distinct cells are harmless: candidates are accepted only
  // by the exact |dx|,|dy| <= eps comparison.
  private val snapGrid = mutable.LongMap.empty[mutable.ArrayBuffer[Double]]

  @inline private def cellKey(ix: Long, iy: Long): Long =
    ix * 0x9E3779B97F4A7C15L ^ java.lang.Long.rotateLeft(iy * 0xC2B2AE3D27D4EB4FL, 31)

  private def snap(x0: Double, y0: Double): (Double, Double) = {
    val x = x0 + 0.0; val y = y0 + 0.0 // normalize -0.0
    if (eps <= 0) return (x, y)
    val ix = math.floor(x / eps).toLong; val iy = math.floor(y / eps).toLong
    var dx = -1
    while (dx <= 1) {
      var dy = -1
      while (dy <= 1) {
        val lst = snapGrid.getOrNull(cellKey(ix + dx, iy + dy))
        if (lst != null) {
          var k = 0
          while (k < lst.length) {
            val px = lst(k); val py = lst(k + 1)
            if (math.abs(px - x) <= eps && math.abs(py - y) <= eps)
              return (px, py)
            k += 2
          }
        }
        dy += 1
      }
      dx += 1
    }
    val lst = snapGrid.getOrElseUpdate(cellKey(ix, iy), mutable.ArrayBuffer.empty[Double])
    lst += x; lst += y
    (x, y)
  }

  def addLine(s: Seqn, srcA: Boolean): Unit = {
    var i = 0
    while (i < s.n - 1) {
      val x1 = s.x(i); val y1 = s.y(i); val x2 = s.x(i + 1); val y2 = s.y(i + 1)
      if (x1 != x2 || y1 != y2) {
        segs += Array(x1 + 0.0, y1 + 0.0, x2 + 0.0, y2 + 0.0)
        segSrcA += srcA
        splits += mutable.ArrayBuffer.empty
      }
      i += 1
    }
  }

  private def addSplit(i: Int, x: Double, y: Double): Unit = {
    val s = segs(i)
    if ((x != s(0) || y != s(1)) && (x != s(2) || y != s(3)))
      splits(i) += ((x, y))
  }

  def node(): Unit = {
    // eps from coordinate scale, then canonicalize every input vertex
    // through the snap registry (input vertices register first, so
    // derived intersection points snap TO them, not the reverse)
    var maxAbs = 0.0
    segs.foreach { s =>
      var k = 0
      while (k < 4) { val v = math.abs(s(k)); if (v > maxAbs) maxAbs = v; k += 1 }
    }
    eps = maxAbs * epsFactor
    var w = 0
    var r = 0
    while (r < segs.length) {
      val s = segs(r)
      val (x1, y1) = snap(s(0), s(1))
      val (x2, y2) = snap(s(2), s(3))
      if (x1 != x2 || y1 != y2) {
        segs(w) = Array(x1, y1, x2, y2)
        segSrcA(w) = segSrcA(r)
        splits(w) = splits(r)
        w += 1
      }
      r += 1
    }
    segs.takeInPlace(w); segSrcA.takeInPlace(w); splits.takeInPlace(w)

    val n = segs.length
    val envs = new Array[Env](n)
    var i = 0
    while (i < n) {
      val s = segs(i)
      envs(i) = Env(math.min(s(0), s(2)) - eps, math.min(s(1), s(3)) - eps,
        math.max(s(0), s(2)) + eps, math.max(s(1), s(3)) + eps)
      i += 1
    }
    val tree = RTree.bulkLoad(envs)
    i = 0
    while (i < n) {
      val s = segs(i)
      tree.rangeSearch(envs(i)) { j =>
        if (j > i) intersectPair(i, j)
        true
      }
      i += 1
    }

    // split + dedupe: edges land in an insertion-ordered buffer (the
    // arrangement's half-edge ids, contour order, and ultimately ring
    // start points depend on it) indexed by a LongMap of mixed
    // coordinate-bit hashes — no boxed tuple4 key per sub-segment;
    // hash collisions resolved by exact coordinate comparison
    val edgeBuf = mutable.ArrayBuffer.empty[NodedEdge]
    val edgeIdx = mutable.LongMap.empty[mutable.ArrayBuffer[Int]]
    def edgeKey(ax: Double, ay: Double, bx: Double, by: Double): Long = {
      var h = java.lang.Double.doubleToLongBits(ax) * 0x9E3779B97F4A7C15L
      h ^= java.lang.Long.rotateLeft(java.lang.Double.doubleToLongBits(ay) * 0xC2B2AE3D27D4EB4FL, 17)
      h ^= java.lang.Long.rotateLeft(java.lang.Double.doubleToLongBits(bx) * 0x165667B19E3779F9L, 31)
      h ^= java.lang.Long.rotateLeft(java.lang.Double.doubleToLongBits(by) * 0x27D4EB2F165667C5L, 47)
      h
    }
    i = 0
    while (i < n) {
      val s = segs(i)
      val dx = s(2) - s(0); val dy = s(3) - s(1)
      val horiz = math.abs(dx) >= math.abs(dy)
      def t(px: Double, py: Double): Double =
        if (horiz) (px - s(0)) / dx else (py - s(1)) / dy
      val pts = ((s(0), s(1)) +: splits(i).distinct.sortBy(p => t(p._1, p._2))) :+ ((s(2), s(3)))
      var k = 0
      while (k < pts.length - 1) {
        val (ax0, ay0) = pts(k); val (bx0, by0) = pts(k + 1)
        if (ax0 != bx0 || ay0 != by0) {
          val flip = !(ax0 < bx0 || (ax0 == bx0 && ay0 <= by0))
          val ax = if (flip) bx0 else ax0; val ay = if (flip) by0 else ay0
          val bx = if (flip) ax0 else bx0; val by = if (flip) ay0 else by0
          val cands = edgeIdx.getOrElseUpdate(edgeKey(ax, ay, bx, by),
            mutable.ArrayBuffer.empty[Int])
          var found = -1
          var c = 0
          while (found < 0 && c < cands.length) {
            val e = edgeBuf(cands(c))
            if (e.x1 == ax && e.y1 == ay && e.x2 == bx && e.y2 == by) found = cands(c)
            c += 1
          }
          if (found >= 0) {
            val e = edgeBuf(found)
            if (segSrcA(i)) e.aSrc = true else e.bSrc = true
          } else {
            cands += edgeBuf.length
            edgeBuf += NodedEdge(ax, ay, bx, by,
              aSrc = segSrcA(i), bSrc = !segSrcA(i))
          }
        }
        k += 1
      }
      i += 1
    }
    // array-backed: Arrangement/overlay index edges(i) in tight loops,
    // so positional apply must be O(1), not List's O(i)
    edges = scala.collection.immutable.ArraySeq.unsafeWrapArray(edgeBuf.toArray)
  }

  private def intersectPair(i: Int, j: Int): Unit = {
    val a = segs(i); val b = segs(j)
    val o1 = Alg.orient(a(0), a(1), a(2), a(3), b(0), b(1))
    val o2 = Alg.orient(a(0), a(1), a(2), a(3), b(2), b(3))
    val o3 = Alg.orient(b(0), b(1), b(2), b(3), a(0), a(1))
    val o4 = Alg.orient(b(0), b(1), b(2), b(3), a(2), a(3))
    val crossSrc = segSrcA(i) != segSrcA(j)

    if (o1 * o2 < 0 && o3 * o4 < 0) {
      // proper crossing: one shared point, computed once, snapped to
      // any pre-existing node within eps
      val (cx, cy) = Alg.crossingPoint(a(0), a(1), a(2), a(3), b(0), b(1), b(2), b(3))
      val (px, py) = snap(cx, cy)
      addSplit(i, px, py); addSplit(j, px, py)
      if (crossSrc) abNodes += ((px, py))
      return
    }
    if (o1 == 0 && o2 == 0 && o3 == 0 && o4 == 0) {
      // collinear: project endpoints onto the other segment
      def tryPt(si: Int, px: Double, py: Double): Unit = {
        val s = segs(si)
        if (Alg.onSegment(s(0), s(1), s(2), s(3), px, py)) {
          addSplit(si, px, py)
          if (crossSrc) abNodes += ((px, py))
        }
      }
      tryPt(i, b(0), b(1)); tryPt(i, b(2), b(3))
      tryPt(j, a(0), a(1)); tryPt(j, a(2), a(3))
      return
    }
    // endpoint touching / T-junctions: eps-tolerant — a vertex within
    // eps of the other segment nodes it (snapping-noder behavior)
    def near(s: Array[Double], px: Double, py: Double): Boolean =
      Alg.distPointSeg(px, py, s(0), s(1), s(2), s(3)) <= eps
    if (near(a, b(0), b(1))) {
      addSplit(i, b(0), b(1)); if (crossSrc) abNodes += ((b(0), b(1)))
    }
    if (near(a, b(2), b(3))) {
      addSplit(i, b(2), b(3)); if (crossSrc) abNodes += ((b(2), b(3)))
    }
    if (near(b, a(0), a(1))) {
      addSplit(j, a(0), a(1)); if (crossSrc) abNodes += ((a(0), a(1)))
    }
    if (near(b, a(2), a(3))) {
      addSplit(j, a(2), a(3)); if (crossSrc) abNodes += ((a(2), a(3)))
    }
  }
}

/** Planar arrangement over noded edges: half-edge structure, left-face
  * traversal, hole-contour nesting, face interior points, and dissolve
  * of kept faces into shells + holes.
  */
final class Arrangement(val edges: IndexedSeq[NodedEdge]) {
  // nodes
  // node registry: primitive coordinate columns indexed by a LongMap
  // of mixed coordinate-bit hashes (collisions resolved exactly) — no
  // boxed tuple key/value per node; nid() runs once per half-edge
  private val nodeIdx = mutable.LongMap.empty[mutable.ArrayBuffer[Int]]
  private val nodeXs = mutable.ArrayBuffer.empty[Double]
  private val nodeYs = mutable.ArrayBuffer.empty[Double]
  @inline private def nodeX(i: Int): Double = nodeXs(i)
  @inline private def nodeY(i: Int): Double = nodeYs(i)
  @inline private def nodeHash(x: Double, y: Double): Long = {
    var h = java.lang.Double.doubleToLongBits(x) * 0x9E3779B97F4A7C15L
    h ^= java.lang.Long.rotateLeft(java.lang.Double.doubleToLongBits(y) * 0xC2B2AE3D27D4EB4FL, 31)
    h
  }
  private def nid(x: Double, y: Double): Int =
  {
    val lst = nodeIdx.getOrElseUpdate(nodeHash(x, y), new mutable.ArrayBuffer[Int](2))
    var i = 0
    while (i < lst.length) {
      val id = lst(i)
      if (nodeXs(id) == x && nodeYs(id) == y) return id
      i += 1
    }
    val id = nodeXs.length
    nodeXs += x; nodeYs += y
    lst += id
    id
  }

  // half-edges: 2*i = edge i directed (p1->p2), 2*i+1 = (p2->p1)
  private var heFrom: Array[Int] = _
  private var heTo: Array[Int] = _
  private var heNext: Array[Int] = _ // next half-edge in left-face walk
  private var heFace: Array[Int] = _
  private var contourOf: Array[Int] = _ // half-edge -> contour id
  private val contours = mutable.ArrayBuffer.empty[Array[Int]] // contour -> half-edges
  private val contourArea = mutable.ArrayBuffer.empty[Double]
  private var contourFace: Array[Int] = _
  var nFaces: Int = 0
  private var unbounded: Array[Boolean] = _
  private val faceContours = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Int]]

  @inline private def twin(h: Int): Int = h ^ 1

  def build(): Unit = {
    val m = edges.length
    heFrom = new Array[Int](2 * m); heTo = new Array[Int](2 * m)
    var i = 0
    while (i < m) {
      val e = edges(i)
      val u = nid(e.x1, e.y1); val v = nid(e.x2, e.y2)
      heFrom(2 * i) = u; heTo(2 * i) = v
      heFrom(2 * i + 1) = v; heTo(2 * i + 1) = u
      i += 1
    }
    // outgoing half-edges per node, sorted by angle (CCW order)
    val out = Array.fill(nodeXs.length)(mutable.ArrayBuffer.empty[Int])
    i = 0
    while (i < 2 * m) { out(heFrom(i)) += i; i += 1 }
    val angle = new Array[Double](2 * m)
    i = 0
    while (i < 2 * m) {
      val fx = nodeX(heFrom(i)); val fy = nodeY(heFrom(i))
      val tx = nodeX(heTo(i)); val ty = nodeY(heTo(i))
      angle(i) = math.atan2(ty - fy, tx - fx)
      i += 1
    }
    val rankAt = new Array[Int](2 * m) // position of h in out(from(h)) CCW order
    out.foreach { lst =>
      val sorted = lst.sortBy(angle)
      var k = 0
      while (k < sorted.length) { rankAt(sorted(k)) = k; k += 1 }
      lst.clear(); lst ++= sorted
    }
    // next(h): at node v = to(h), take twin(h) (outgoing at v) and step
    // to the next outgoing half-edge in CLOCKWISE order (previous in the
    // CCW-sorted list) — the standard left-face traversal rule
    heNext = new Array[Int](2 * m)
    i = 0
    while (i < 2 * m) {
      val t = twin(i)
      val lst = out(heFrom(t))
      val k = rankAt(t)
      heNext(i) = lst((k - 1 + lst.length) % lst.length)
      i += 1
    }
    // contours
    contourOf = Array.fill(2 * m)(-1)
    i = 0
    while (i < 2 * m) {
      if (contourOf(i) == -1) {
        val cid = contours.length
        val buf = mutable.ArrayBuffer.empty[Int]
        var h = i
        while (contourOf(h) == -1) {
          contourOf(h) = cid
          buf += h
          h = heNext(h)
        }
        contours += buf.toArray
        // signed area (shoelace over the walked cycle)
        var s = 0.0
        buf.foreach { h2 =>
          val x1 = nodeX(heFrom(h2)); val y1 = nodeY(heFrom(h2))
          val x2 = nodeX(heTo(h2)); val y2 = nodeY(heTo(h2))
          s += x1 * y2 - x2 * y1
        }
        contourArea += s / 2
      }
      i += 1
    }
    groupContoursIntoFaces()
    heFace = new Array[Int](2 * m)
    i = 0
    while (i < 2 * m) { heFace(i) = contourFace(contourOf(i)); i += 1 }
  }

  /** Faces: each CCW contour (area > 0) starts a face; each CW contour
    * is either the unbounded face's outer boundary or an inner contour
    * (hole boundary) of the face whose CCW contour most tightly
    * contains it. The unbounded face is face 0.
    */
  private def groupContoursIntoFaces(): Unit = {
    val nc = contours.length
    contourFace = new Array[Int](nc)
    val ccw = (0 until nc).filter(contourArea(_) > 0)
    // face 0 = unbounded
    nFaces = 1 + ccw.length
    unbounded = new Array[Boolean](nFaces)
    unbounded(0) = true
    faceContours.clear()
    (0 until nFaces).foreach(_ => faceContours += mutable.ArrayBuffer.empty[Int])
    val faceOfCcw = mutable.HashMap.empty[Int, Int]
    ccw.zipWithIndex.foreach { case (c, k) =>
      contourFace(c) = k + 1
      faceOfCcw(c) = k + 1
      faceContours(k + 1) += c
    }
    // ring coords of a contour
    def contourPts(c: Int): Array[(Double, Double)] =
      contours(c).map(h => (nodeX(heFrom(h)), nodeY(heFrom(h))))
    // a point strictly inside contour c's cycle region, for nesting
    def probePoint(c: Int): (Double, Double) = {
      val hs = contours(c)
      var k = 0
      while (k < hs.length) {
        val h = hs(k)
        val x1 = nodeX(heFrom(h)); val y1 = nodeY(heFrom(h))
        val x2 = nodeX(heTo(h)); val y2 = nodeY(heTo(h))
        val mx = (x1 + x2) / 2; val my = (y1 + y2) / 2
        return (mx, my)
      }
      (nodeX(heFrom(hs(0))), nodeY(heFrom(hs(0))))
    }
    // nest CW contours: smallest |area| CCW contour whose ring strictly
    // contains a probe point of the CW contour
    val cw = (0 until nc).filter(contourArea(_) <= 0)
    // R-tree over the CCW contours' envelopes: a CW contour can only
    // nest into a CCW contour whose envelope contains its probe point.
    // (A linear scan of all larger CCW contours with an O(ring)
    // containment test each made n-ary union of scattered polygons —
    // st_union_agg's shape — quadratic in part count.)
    val ccwArr = ccw.toArray
    val ccwEnvs = new Array[Env](ccwArr.length)
    var ci = 0
    while (ci < ccwArr.length) {
      val hs = contours(ccwArr(ci))
      var xmin = Double.PositiveInfinity; var ymin = Double.PositiveInfinity
      var xmax = Double.NegativeInfinity; var ymax = Double.NegativeInfinity
      var hi = 0
      while (hi < hs.length) {
        val x = nodeX(heFrom(hs(hi))); val y = nodeY(heFrom(hs(hi)))
        if (x < xmin) xmin = x; if (x > xmax) xmax = x
        if (y < ymin) ymin = y; if (y > ymax) ymax = y
        hi += 1
      }
      ccwEnvs(ci) = Env(xmin, ymin, xmax, ymax)
      ci += 1
    }
    val ccwTree = RTree.bulkLoad(ccwEnvs)
    val ringCache = new Array[Seqn](ccwArr.length)
    cw.foreach { c =>
      val (px, py) = probePoint(c)
      // contours reachable from c through a twin half-edge: c walks the
      // OTHER side of (part of) their boundary. c can never be a hole
      // of such a contour — a hole lies strictly inside its container,
      // not along its edges. The probe-point test alone is fragile
      // here: the probe is an edge midpoint whose rounded coordinates
      // may fall a hair inside the twin ring, which would nest a closed
      // curve's outside walk as a hole of its own inside face and
      // collapse the face to an empty annulus.
      val twinCs = contours(c).iterator.map(h => contourOf(twin(h))).toSet
      val cAbs = math.abs(contourArea(c))
      // tightest strictly-containing CCW contour (same semantics as the
      // previous ascending-area scan: smallest containing area wins)
      var bestCc = -1
      var bestArea = Double.PositiveInfinity
      ccwTree.rangeSearch(Env(px, py, px, py)) { k =>
        val cc = ccwArr(k)
        val a = contourArea(cc)
        if (a > cAbs - 1e-300 && a < bestArea && !twinCs.contains(cc)) {
          if (ringCache(k) == null) ringCache(k) = ringSeqn(contourPts(cc))
          // strict containment of the probe midpoint; a midpoint can't
          // lie on the containing contour (edges are noded & deduped)
          if (Alg.pointInRing(ringCache(k), px, py) > 0) {
            bestCc = cc; bestArea = a
          }
        }
        true
      }
      if (bestCc >= 0) {
        contourFace(c) = faceOfCcw(bestCc)
        faceContours(faceOfCcw(bestCc)) += c
      } else { contourFace(c) = 0; faceContours(0) += c }
    }
  }

  private def ringSeqn(pts: Array[(Double, Double)]): Seqn = {
    val arr = new Array[Double]((pts.length + 1) * 2)
    var i = 0
    while (i < pts.length) { arr(2 * i) = pts(i)._1; arr(2 * i + 1) = pts(i)._2; i += 1 }
    arr(2 * pts.length) = pts(0)._1; arr(2 * pts.length + 1) = pts(0)._2
    Seqn.xy(arr)
  }

  def faceUnbounded(f: Int): Boolean = unbounded(f)
  def leftFace(edgeIdx: Int): Int = heFace(2 * edgeIdx)
  def rightFace(edgeIdx: Int): Int = heFace(2 * edgeIdx + 1)

  /** A point strictly interior to bounded face f: point-on-surface of
    * the face polygon (outer CCW contour + its hole contours).
    */
  def faceInteriorPoint(f: Int): (Double, Double) = {
    val cs = faceContours(f)
    val outer = cs.find(contourArea(_) > 0).get
    val rings = mutable.ArrayBuffer[Seqn](
      ringSeqn(contours(outer).map(h => (nodeX(heFrom(h)), nodeY(heFrom(h))))))
    cs.filter(_ != outer).foreach { c =>
      rings += ringSeqn(contours(c).map(h => (nodeX(heFrom(h)), nodeY(heFrom(h)))))
    }
    val poly = GPoly(rings.toArray, CT.XY)
    PointOnSurface.compute(poly) match {
      case p: GPoint if !p.isEmpty && Alg.pointInPolygon(poly, p.x, p.y) > 0 =>
        (p.x, p.y)
      case _ =>
        // fallback: centroid of first edge triangle fan — robust enough
        // for degenerate slivers
        val hs = contours(outer)
        val x1 = nodeX(heFrom(hs(0))); val y1 = nodeY(heFrom(hs(0)))
        val x2 = nodeX(heTo(hs(0))); val y2 = nodeY(heTo(hs(0)))
        ((x1 + x2) / 2, (y1 + y2) / 2)
    }
  }

  /** Union of kept faces as a Polygon / MultiPolygon: boundary edges
    * (kept on exactly one side) walked with the kept face on the left,
    * then CCW cycles become shells and CW cycles holes, nested by
    * containment.
    */
  def dissolve(keptFace: Array[Boolean]): Geom = {
    val m = edges.length
    val chosen = new Array[Boolean](2 * m)
    var i = 0
    while (i < m) {
      val lf = heFace(2 * i); val rf = heFace(2 * i + 1)
      if (keptFace(lf) != keptFace(rf)) {
        chosen(if (keptFace(lf)) 2 * i else 2 * i + 1) = true
      }
      i += 1
    }
    // walk chosen half-edges with next restricted to chosen: rotate
    // clockwise from twin until a chosen half-edge appears
    val visited = new Array[Boolean](2 * m)
    val ringsOut = mutable.ArrayBuffer.empty[(Seqn, Double)] // (ring, signed area)

    // rebuild rotational structures (outgoing lists) lazily via heNext:
    // nextChosen(h) = first chosen in the CW rotation at to(h) starting
    // from the standard next
    def nextChosen(h: Int): Int = {
      var cand = heNext(h)
      var guard = 0
      while (!chosen(cand) && guard < 4 * m) {
        // rotate to the next candidate around the same node: next of
        // twin(cand) continues the clockwise sweep at to(h)
        cand = heNext(twin(cand))
        guard += 1
      }
      cand
    }

    i = 0
    while (i < 2 * m) {
      if (chosen(i) && !visited(i)) {
        val pts = mutable.ArrayBuffer.empty[(Double, Double)]
        var h = i
        var area2 = 0.0
        var ok = true
        while (ok && !visited(h)) {
          visited(h) = true
          val x1 = nodeX(heFrom(h)); val y1 = nodeY(heFrom(h))
          val x2 = nodeX(heTo(h)); val y2 = nodeY(heTo(h))
          pts += ((x1, y1))
          area2 += x1 * y2 - x2 * y1
          h = nextChosen(h)
          if (!chosen(h)) ok = false
        }
        if (ok && pts.length >= 3) {
          val arr = new Array[Double]((pts.length + 1) * 2)
          var k = 0
          while (k < pts.length) { arr(2 * k) = pts(k)._1; arr(2 * k + 1) = pts(k)._2; k += 1 }
          arr(2 * pts.length) = pts(0)._1; arr(2 * pts.length + 1) = pts(0)._2
          ringsOut += ((Seqn.xy(arr), area2 / 2))
        }
      }
      i += 1
    }

    val shells = ringsOut.filter(_._2 > 0)
    val holes = ringsOut.filter(_._2 <= 0)
    if (shells.isEmpty) return GPoly(Array.empty, CT.XY)

    // assign each hole to the smallest shell containing it
    val shellRings = shells.map(_._1)
    val shellAreas = shells.map(_._2)
    val holeAssign = Array.fill(holes.length)(-1)
    holes.zipWithIndex.foreach { case ((hr, _), hi) =>
      // probe: midpoint of first hole edge
      val px = (hr.x(0) + hr.x(1)) / 2; val py = (hr.y(0) + hr.y(1)) / 2
      var best = -1; var bestArea = Double.MaxValue
      shellRings.zipWithIndex.foreach { case (sr, si) =>
        if (shellAreas(si) < bestArea && Alg.pointInRing(sr, px, py) > 0) {
          best = si; bestArea = shellAreas(si)
        }
      }
      holeAssign(hi) = best
    }
    val polys = shellRings.zipWithIndex.map { case (sr, si) =>
      val hs = holes.indices.filter(holeAssign(_) == si).map(holes(_)._1)
      (sr +: hs).toArray
    }
    if (polys.length == 1) GPoly(polys.head, CT.XY)
    else GMPoly(polys.toArray, CT.XY)
  }
}
