package graft.core

import scala.collection.mutable

/** Buffer (Minkowski sum with a disc).
  *
  * Round caps + round joins (the default, and the only styles whose
  * region is distance-characterised) run through ONE planar
  * arrangement of the raw offset linework with distance-classified
  * faces — see [[tryArrangementBuffer]] — which is near-linear in
  * vertex count. All other style combinations use the piece union:
  * a cap/join piece per vertex and an oriented rectangle per segment,
  * dissolved by SetOps' union (quadratic when the buffer distance
  * spans many segments, but those styles are used on small
  * geometries; the round path also falls back here on sanity
  * failure).
  *
  * Style surface mirrors the reference's option set
  * (geom/alg_buffer.go:24-124): quadrant segments, end caps
  * round/flat/square, joins round/mitre(limit)/bevel, single-sided.
  * Negative distance erodes areal geometries and empties
  * lower-dimensional ones; single-sided picks the side from the
  * distance sign (positive = left) and forces flat caps, as the
  * reference documents.
  *
  * In the piece path, join pieces only fill the CONVEX side of each
  * turn — on the concave side the two segment rectangles overlap and
  * their union boundary is already the exact offset intersection
  * (which is also why erosion corners stay sharp regardless of join
  * style: the inner band boundary comes from rectangle overlap, not
  * join fill).
  */
object BufferOp {

  final val CapRound = 0
  final val CapFlat = 1
  final val CapSquare = 2
  final val JoinRound = 0
  final val JoinMitre = 1
  final val JoinBevel = 2

  /** JTS-compatible defaults: quadSegs 8, round caps/joins, mitre
    * limit 5.
    */
  final case class Style(quadSegs: Int = 8, cap: Int = CapRound,
                         join: Int = JoinRound, mitreLimit: Double = 5.0,
                         singleSided: Boolean = false)

  /** Parse a PostGIS-style parameter string, e.g.
    * "quad_segs=8 endcap=flat join=mitre mitre_limit=2 side=left".
    * side=left/right/both; left/right imply single-sided.
    */
  def parseStyle(params: String): (Style, Int) = {
    var st = Style()
    var side = 0 // 0 = both, +1 = left, -1 = right
    for (kv <- params.trim.split("\\s+") if kv.nonEmpty) {
      val i = kv.indexOf('=')
      if (i <= 0) throw new IllegalArgumentException(s"bad buffer parameter '$kv'")
      val (k, v) = (kv.substring(0, i).toLowerCase, kv.substring(i + 1).toLowerCase)
      k match {
        case "quad_segs" | "quadsegs" => st = st.copy(quadSegs = v.toInt)
        case "endcap" => st = st.copy(cap = v match {
          case "round" => CapRound; case "flat" | "butt" => CapFlat
          case "square" => CapSquare
          case _ => throw new IllegalArgumentException(s"bad endcap '$v'")
        })
        case "join" => st = st.copy(join = v match {
          case "round" => JoinRound; case "mitre" | "miter" => JoinMitre
          case "bevel" => JoinBevel
          case _ => throw new IllegalArgumentException(s"bad join '$v'")
        })
        case "mitre_limit" | "miter_limit" => st = st.copy(mitreLimit = v.toDouble)
        case "side" => v match {
          case "both" => side = 0
          case "left" => side = 1; st = st.copy(singleSided = true)
          case "right" => side = -1; st = st.copy(singleSided = true)
          case _ => throw new IllegalArgumentException(s"bad side '$v'")
        }
        case _ => throw new IllegalArgumentException(s"unknown buffer parameter '$k'")
      }
    }
    (st, side)
  }

  def buffer(g: Geom, dist: Double, quadSegs: Int = 8): Geom =
    buffer(g, dist, Style(quadSegs = quadSegs))

  def buffer(g: Geom, dist: Double, st: Style): Geom = {
    if (st.singleSided) return singleSided(g, dist, st)
    if (g.isEmpty) return GPoly(Array.empty, CT.XY)
    if (dist == 0) {
      // buffer(0) = cleaned areal result; zero-area (flat/degenerate)
      // rings vanish, as in JTS (TestBuffer.xml degenerate cases)
      if (g.dimension < 2) return GPoly(Array.empty, CT.XY)
      val u = try SetOps.unaryUnion(g) catch { case _: Exception => Geom.emptyGC }
      return if (u.dimension == 2 && Measure.area(u) > 0) u else GPoly(Array.empty, CT.XY)
    }
    if (dist < 0) {
      if (g.dimension < 2) return GPoly(Array.empty, CT.XY)
      return erode(g, -dist, st)
    }
    if (st.cap == CapRound && st.join == JoinRound) {
      val r = tryArrangementBuffer(g, dist, st.quadSegs, grow = true)
      if (r != null) return r
    }
    val pieces = mutable.ArrayBuffer.empty[Geom]
    collectPieces(g, dist, st, pieces)
    if (pieces.isEmpty) GPoly(Array.empty, CT.XY)
    else SetOps.unionMany(pieces.toSeq)
  }

  // ------------------------------------------- arrangement buffer core

  /** Round-style buffer via ONE planar arrangement instead of a union
    * of per-segment/per-vertex pieces (whose pairwise overlaps make
    * the piece union O(n * d/segLen) — quadratic when the buffer
    * distance spans many segments).
    *
    * The boundary of {p : dist(p, g) <= d} is contained in the "raw
    * offset linework": per-segment parallels at distance d, plus arcs
    * around vertices where the corner opens on the offset side, plus
    * cap/endpoint circles. So: emit that linework, node it, build the
    * face arrangement, and keep each face iff its interior point is in
    * the buffer (inside g, or within d of g's boundary — both O(log n)
    * with a prepared locator / segment R-tree). Faces cannot straddle
    * the d-contour because the contour is covered by the linework.
    * Same idea as JTS's raw-offset-curve + labeling buffer, re-derived
    * on this engine's arrangement; join/cap styles other than round
    * are not distance-characterised and keep the piece path.
    *
    * Returns null when the result fails cheap area sanity (caller
    * falls back to the piece path).
    */
  private def tryArrangementBuffer(g: Geom, d: Double, qs: Int,
                                   grow: Boolean): Geom =
    try {
      val r = arrangementBuffer(g, d, qs, grow)
      // cheap sanity: grow must cover g's area; erode must not exceed it
      val gA = Measure.area(g)
      val rA = Measure.area(r)
      val e = g.envelope
      val tol = 1e-9 * math.max(gA, d * d) + java.lang.Double.MIN_NORMAL
      val envOk = {
        val re = r.envelope
        re.isEmpty || (re.xmin >= e.xmin - d - tol && re.ymin >= e.ymin - d - tol &&
          re.xmax <= e.xmax + d + tol && re.ymax <= e.ymax + d + tol)
      }
      val areaOk =
        if (grow) rA >= gA - tol && !r.isEmpty
        else rA <= gA + tol
      if (envOk && areaOk) r else null
    } catch { case _: Exception => null }

  private[core] def arrangementBuffer(g: Geom, d: Double, qs: Int,
                                grow: Boolean): Geom = {
    // ---- boundary segments of g (for distance classification);
    // points contribute degenerate segments
    val bs = mutable.ArrayBuffer.empty[Array[Double]]
    def addSeq(s: Seqn): Unit = {
      var i = 0
      while (i < s.n - 1) {
        bs += Array(s.x(i), s.y(i), s.x(i + 1), s.y(i + 1))
        i += 1
      }
      if (s.n == 1) bs += Array(s.x(0), s.y(0), s.x(0), s.y(0))
    }
    def walkB(x: Geom): Unit = x match {
      case p: GPoint if !p.isEmpty => bs += Array(p.x, p.y, p.x, p.y)
      case GMPoint(ps, _) => ps.foreach(walkB)
      case GLine(s) => addSeq(s)
      case GMLine(ls, _) => ls.foreach(addSeq)
      case GPoly(rs, _) => rs.foreach(addSeq)
      case GMPoly(ps, _) => ps.foreach(_.foreach(addSeq))
      case GColl(cs, _) => cs.foreach(walkB)
      case _ => ()
    }
    walkB(g)
    if (bs.isEmpty) return GPoly(Array.empty, CT.XY)
    val bsegs = bs.toArray
    val benvs = bsegs.map(s => Env(math.min(s(0), s(2)), math.min(s(1), s(3)),
      math.max(s(0), s(2)), math.max(s(1), s(3))))
    val btree = RTree.bulkLoad(benvs)
    def withinD(px: Double, py: Double): Boolean = {
      var hit = false
      btree.rangeSearch(Env(px - d, py - d, px + d, py + d)) { i =>
        val s = bsegs(i)
        if (Alg.distPointSeg(px, py, s(0), s(1), s(2), s(3)) <= d) hit = true
        !hit
      }
      hit
    }
    val loc =
      if (g.dimension == 2 && ArealLocator.edgeCount(g) > 0) ArealLocator.build(g)
      else null
    def insideG(px: Double, py: Double): Boolean =
      loc != null && loc.locate(px, py) > 0

    // ---- offset linework
    val noder = new Noder
    def emitLine(pts: Array[Double]): Unit =
      if (pts.length >= 4) noder.addLine(Seqn.xy(pts), srcA = true)
    def emitArc(cx: Double, cy: Double, a1: Double, sweep: Double): Unit = {
      val steps = math.max(2, math.ceil(math.abs(sweep) / (math.Pi / 2) * qs).toInt)
      val arr = new Array[Double]((steps + 1) * 2)
      var i = 0
      while (i <= steps) {
        val a = a1 + sweep * i / steps
        arr(2 * i) = cx + d * math.cos(a)
        arr(2 * i + 1) = cy + d * math.sin(a)
        i += 1
      }
      emitLine(arr)
    }
    /** Full circle polygonized starting at a0. The start angle MUST be
      * the normal angle of any attaching parallel: parallel endpoints
      * lie on the TRUE circle, so they only coincide with circle
      * vertices (and thus node into the arrangement) when the
      * polygonization starts there — otherwise the sagitta gap
      * (r(1-cos(pi/steps))) disconnects the band from its cap.
      * An even step count makes the antipodal normal a vertex too.
      */
    def emitCircle(cx: Double, cy: Double, a0: Double): Unit =
      emitArc(cx, cy, a0, 2 * math.Pi)

    /** Offset one walk. closed: ring (first==last). sides: +1 left of
      * travel, -1 right, 0 both (open lines). For rings the caller
      * picks the single offset side.
      */
    def offsetWalk(s: Seqn, closed: Boolean, side: Int): Unit = {
      val n = s.n
      if (n < 2) { if (n == 1) emitCircle(s.x(0), s.y(0), 0.0); return }
      val sides = if (side == 0) Seq(1.0, -1.0) else Seq(side.toDouble)
      var headUx = Double.NaN; var headUy = Double.NaN
      var tailUx = Double.NaN; var tailUy = Double.NaN
      for (sg <- sides) {
        var prevUx = Double.NaN; var prevUy = Double.NaN
        var firstUx = Double.NaN; var firstUy = Double.NaN
        var i = 0
        while (i < n - 1) {
          val x1 = s.x(i); val y1 = s.y(i); val x2 = s.x(i + 1); val y2 = s.y(i + 1)
          val dx = x2 - x1; val dy = y2 - y1
          val len = math.hypot(dx, dy)
          if (len > 0) {
            val ux = dx / len; val uy = dy / len
            val nx = -uy * sg * d; val ny = ux * sg * d
            emitLine(Array(x1 + nx, y1 + ny, x2 + nx, y2 + ny))
            if (firstUx.isNaN) { firstUx = ux; firstUy = uy }
            if (!prevUx.isNaN) arcAtVertex(x1, y1, prevUx, prevUy, ux, uy, sg)
            prevUx = ux; prevUy = uy
          }
          i += 1
        }
        if (closed && !prevUx.isNaN && !firstUx.isNaN)
          arcAtVertex(s.x(0), s.y(0), prevUx, prevUy, firstUx, firstUy, sg)
        headUx = firstUx; headUy = firstUy
        tailUx = prevUx; tailUy = prevUy
      }
      if (!closed) {
        // round caps: full endpoint circles, polygonized starting at
        // the attaching parallel's normal angle (see emitCircle); the
        // extra half lies inside the buffer and only adds kept faces
        if (!headUx.isNaN)
          emitCircle(s.x(0), s.y(0), math.atan2(headUx, -headUy))
        if (!tailUx.isNaN)
          emitCircle(s.x(n - 1), s.y(n - 1), math.atan2(tailUx, -tailUy))
      }
      // all segments degenerate: the walk is a single repeated point
      if (headUx.isNaN) emitCircle(s.x(0), s.y(0), 0.0)
    }

    /** Arc around vertex (vx,vy) between incoming direction u1 and
      * outgoing u2 when the corner opens on offset side sg.
      */
    def arcAtVertex(vx: Double, vy: Double,
                    u1x: Double, u1y: Double, u2x: Double, u2y: Double,
                    sg: Double): Unit = {
      val cross = u1x * u2y - u1y * u2x
      val dot = u1x * u2x + u1y * u2y
      if (math.abs(cross) < 1e-12) {
        // spike / fold-back: full circle, anchored at u1's normal so
        // all four attaching parallel endpoints are circle vertices
        if (dot < 0) emitCircle(vx, vy, math.atan2(u1x, -u1y))
        return
      }
      if (sg * cross < 0) {
        // corner opens on the offset side: arc from n1 to n2 (short way)
        val n1a = math.atan2(u1x * sg, -u1y * sg)
        val n2a = math.atan2(u2x * sg, -u2y * sg)
        var sweep = n2a - n1a
        while (sweep <= -math.Pi) sweep += 2 * math.Pi
        while (sweep > math.Pi) sweep -= 2 * math.Pi
        emitArc(vx, vy, n1a, sweep)
      }
    }

    def walkO(x: Geom): Unit = x match {
      case p: GPoint if !p.isEmpty => emitCircle(p.x, p.y, 0.0)
      case GMPoint(ps, _) => ps.foreach(walkO)
      case GLine(s) => offsetWalk(s, closed = false, side = 0)
      case GMLine(ls, _) => ls.foreach(offsetWalk(_, closed = false, side = 0))
      case GPoly(rs, _) => offsetRings(rs)
      case GMPoly(ps, _) => ps.foreach(offsetRings)
      case GColl(cs, _) => cs.foreach(walkO)
      case _ => ()
    }
    def offsetRings(rs: Array[Seqn]): Unit = {
      var ri = 0
      while (ri < rs.length) {
        val r = rs(ri)
        if (r.n >= 2) {
          val ccw = Alg.signedRingArea(r) > 0
          val isHole = ri > 0
          // grow: offset toward the polygon EXTERIOR (shell: away from
          // its region; hole: into its region). erode: flipped.
          val intoRegion = if (grow) isHole else !isHole
          // region lies LEFT of travel iff ring is CCW
          val regionSide = if (ccw) 1 else -1
          val side = if (intoRegion) regionSide else -regionSide
          offsetWalk(r, closed = true, side = side)
        } else if (r.n == 1) emitCircle(r.x(0), r.y(0), 0.0)
        ri += 1
      }
    }
    walkO(g)
    noder.node()
    val arr = new Arrangement(noder.edges)
    arr.build()
    val kept = new Array[Boolean](arr.nFaces)
    var f = 0
    while (f < arr.nFaces) {
      if (!arr.faceUnbounded(f)) {
        val (px, py) = arr.faceInteriorPoint(f)
        kept(f) =
          if (grow) insideG(px, py) || withinD(px, py)
          else insideG(px, py) && !withinD(px, py)
      }
      f += 1
    }
    arr.dissolve(kept)
  }

  private def collectPieces(g: Geom, d: Double, st: Style,
                            out: mutable.ArrayBuffer[Geom]): Unit = g match {
    case p: GPoint if !p.isEmpty => out += disc(p.x, p.y, d, st.quadSegs)
    case GMPoint(ps, _) => ps.foreach(collectPieces(_, d, st, out))
    case GLine(s) => seqPieces(s, d, st, out)
    case GMLine(ls, _) => ls.foreach(seqPieces(_, d, st, out))
    case poly @ GPoly(rings, _) if rings.nonEmpty =>
      out += poly
      rings.foreach(seqPieces(_, d, st, out))
    case GMPoly(ps, ct) =>
      ps.filter(_.nonEmpty).foreach(rs => collectPieces(GPoly(rs, ct), d, st, out))
    case GColl(gs, _) => gs.foreach(collectPieces(_, d, st, out))
    case _ => ()
  }

  /** Negative buffer of an areal geometry: interior points at distance
    * > d from the boundary, i.e. g minus the boundary's buffer. Join
    * style shapes the band at reflex corners (convex from inside).
    */
  private def erode(g: Geom, d: Double, st: Style): Geom = {
    if (st.cap == CapRound && st.join == JoinRound) {
      val r = tryArrangementBuffer(g, d, st.quadSegs, grow = false)
      if (r != null) {
        return if (r.dimension == 2) r else GPoly(Array.empty, CT.XY)
      }
    }
    val boundaryPieces = mutable.ArrayBuffer.empty[Geom]
    def rings(x: Geom): Unit = x match {
      case GPoly(rs, _) => rs.foreach(seqPieces(_, d, st, boundaryPieces))
      case GMPoly(ps, _) => ps.foreach(_.foreach(seqPieces(_, d, st, boundaryPieces)))
      case GColl(cs, _) => cs.foreach(rings)
      case _ => ()
    }
    rings(g)
    if (boundaryPieces.isEmpty) return GPoly(Array.empty, CT.XY)
    val band = SetOps.unionMany(boundaryPieces.toSeq)
    SetOps.difference(g, band) match {
      case r if r.dimension == 2 => r
      case _ => GPoly(Array.empty, CT.XY)
    }
  }

  /** Single-sided buffer: region between each lineal component and its
    * offset curve at distance |dist| on one side (positive = left,
    * negative = right, matching the reference's sign convention); caps
    * forced flat. Areal inputs take the ordinary two-sided buffer;
    * puntal inputs are empty (a point has no side).
    */
  private def singleSided(g: Geom, dist: Double, st: Style): Geom = {
    if (g.isEmpty || dist == 0) return GPoly(Array.empty, CT.XY)
    val leftSide = dist > 0
    val d = math.abs(dist)
    val pieces = mutable.ArrayBuffer.empty[Geom]
    def walk(x: Geom): Unit = x match {
      case GLine(s) => sideSeqPieces(s, d, leftSide, st, pieces)
      case GMLine(ls, _) => ls.foreach(sideSeqPieces(_, d, leftSide, st, pieces))
      case p @ (_: GPoly | _: GMPoly) =>
        collectPieces(p, d, st.copy(singleSided = false), pieces)
      case GColl(cs, _) => cs.foreach(walk)
      case _ => ()
    }
    walk(g)
    if (pieces.isEmpty) GPoly(Array.empty, CT.XY)
    else SetOps.unionMany(pieces.toSeq)
  }

  /** Disc approximation: regular polygon with 4*qs vertices. */
  private def disc(cx: Double, cy: Double, r: Double, qs: Int): Geom = {
    val n = math.max(8, 4 * qs)
    val arr = new Array[Double]((n + 1) * 2)
    var i = 0
    while (i < n) {
      val a = 2 * math.Pi * i / n
      arr(2 * i) = cx + r * math.cos(a)
      arr(2 * i + 1) = cy + r * math.sin(a)
      i += 1
    }
    arr(2 * n) = arr(0); arr(2 * n + 1) = arr(1)
    GPoly(Array(Seqn.xy(arr)), CT.XY)
  }

  /** Circular-sector fan: centre v, radius r, sweeping the SHORT way
    * from angle a1 to a2 (gap angles at joins are always < pi).
    */
  private def sector(cx: Double, cy: Double, r: Double,
                     a1: Double, a2: Double, qs: Int): Geom = {
    var sweep = a2 - a1
    while (sweep <= -math.Pi) sweep += 2 * math.Pi
    while (sweep > math.Pi) sweep -= 2 * math.Pi
    val steps = math.max(2, math.ceil(math.abs(sweep) / (math.Pi / 2) * qs).toInt)
    val arr = new Array[Double]((steps + 3) * 2)
    arr(0) = cx; arr(1) = cy
    var i = 0
    while (i <= steps) {
      val a = a1 + sweep * i / steps
      arr(2 * (i + 1)) = cx + r * math.cos(a)
      arr(2 * (i + 1) + 1) = cy + r * math.sin(a)
      i += 1
    }
    arr(2 * (steps + 2)) = cx; arr(2 * (steps + 2) + 1) = cy
    GPoly(Array(Seqn.xy(arr)), CT.XY)
  }

  private def poly(xys: Double*): Geom = {
    val closed = xys ++ Seq(xys(0), xys(1))
    GPoly(Array(Seqn.of(closed: _*)), CT.XY)
  }

  /** Join piece at vertex v between incoming unit direction u1 and
    * outgoing unit u2, on the convex (gap) side, radius d. Returns
    * null when no piece is needed (collinear, or concave-only).
    */
  private def joinPiece(vx: Double, vy: Double,
                        u1x: Double, u1y: Double, u2x: Double, u2y: Double,
                        d: Double, st: Style): Geom = {
    val cross = u1x * u2y - u1y * u2x
    val dot = u1x * u2x + u1y * u2y
    if (math.abs(cross) < 1e-12) {
      // collinear: straight-through needs nothing; a u-turn folds the
      // line back on itself — round fills the half-disc, mitre/bevel
      // leave the flat fold (JTS's limited-mitre degenerates the same
      // way for antiparallel edges)
      if (dot < 0 && st.join == JoinRound)
        return disc(vx, vy, d, st.quadSegs)
      return null
    }
    // gap side: left of the path when turning right (cross<0), right
    // when turning left. Outward normals n1/n2 on that side.
    val s = if (cross < 0) 1.0 else -1.0 // +1 = rotate left, -1 = rotate right
    val n1x = -u1y * s * d; val n1y = u1x * s * d
    val n2x = -u2y * s * d; val n2y = u2x * s * d
    val p1x = vx + n1x; val p1y = vy + n1y
    val p2x = vx + n2x; val p2y = vy + n2y
    st.join match {
      case JoinRound =>
        sector(vx, vy, d, math.atan2(n1y, n1x), math.atan2(n2y, n2x), st.quadSegs)
      case JoinBevel =>
        poly(vx, vy, p1x, p1y, p2x, p2y)
      case JoinMitre =>
        // mitre tip: intersection of the two offset-edge lines
        // p1 + t*u1 = p2 + s2*u2  =>  t = cross(p2-p1, u2) / cross(u1, u2)
        val t = ((p2x - p1x) * u2y - (p2y - p1y) * u2x) / cross
        val mx = p1x + t * u1x; val my = p1y + t * u1y
        val mdist = math.hypot(mx - vx, my - vy)
        if (mdist <= st.mitreLimit * d) poly(vx, vy, p1x, p1y, mx, my, p2x, p2y)
        else {
          // limited mitre: clip the spike with the line perpendicular
          // to the gap bisector at distance limit*d from v
          val bl = math.hypot(n1x + n2x, n1y + n2y)
          if (bl < 1e-12 * d) return poly(vx, vy, p1x, p1y, p2x, p2y)
          val bx = (n1x + n2x) / bl; val by = (n1y + n2y) / bl
          val lim = st.mitreLimit * d
          val den1 = u1x * bx + u1y * by
          val den2 = u2x * bx + u2y * by
          if (math.abs(den1) < 1e-12 || math.abs(den2) < 1e-12)
            return poly(vx, vy, p1x, p1y, p2x, p2y)
          val t1 = (lim - ((p1x - vx) * bx + (p1y - vy) * by)) / den1
          val t2 = (lim - ((p2x - vx) * bx + (p2y - vy) * by)) / den2
          val q1x = p1x + t1 * u1x; val q1y = p1y + t1 * u1y
          val q2x = p2x + t2 * u2x; val q2y = p2y + t2 * u2y
          poly(vx, vy, p1x, p1y, q1x, q1y, q2x, q2y, p2x, p2y)
        }
    }
  }

  /** Cap piece at an open endpoint v with outward unit direction u
    * (pointing away from the line).
    */
  private def capPiece(vx: Double, vy: Double, ux: Double, uy: Double,
                       d: Double, st: Style): Geom = st.cap match {
    case CapRound => disc(vx, vy, d, st.quadSegs)
    case CapFlat => null
    case CapSquare =>
      // square extension: half-square beyond the endpoint
      val nx = -uy * d; val ny = ux * d
      poly(vx + nx, vy + ny,
        vx + nx + ux * d, vy + ny + uy * d,
        vx - nx + ux * d, vy - ny + uy * d,
        vx - nx, vy - ny)
    case _ => null
  }

  /** Per-segment rectangle + styled vertex pieces for a sequence. A
    * closed sequence (ring) takes joins at every vertex incl. the
    * closure; an open one takes caps at its two ends.
    */
  private def seqPieces(sq: Seqn, d: Double, st: Style,
                        out: mutable.ArrayBuffer[Geom]): Unit = {
    if (sq.isEmpty) return
    val n = sq.n
    if (n == 1) { out += disc(sq.x(0), sq.y(0), d, st.quadSegs); return }
    val closed = sq.x(0) == sq.x(n - 1) && sq.y(0) == sq.y(n - 1)

    // segment rectangles + per-segment unit directions (zero-length skipped)
    val dirs = new Array[Double](2 * (n - 1)) // ux, uy per segment; NaN if degenerate
    var i = 0
    while (i < n - 1) {
      val x1 = sq.x(i); val y1 = sq.y(i); val x2 = sq.x(i + 1); val y2 = sq.y(i + 1)
      val dx = x2 - x1; val dy = y2 - y1
      val len = math.hypot(dx, dy)
      if (len > 0) {
        dirs(2 * i) = dx / len; dirs(2 * i + 1) = dy / len
        val nx = -dy / len * d; val ny = dx / len * d
        out += poly(x1 + nx, y1 + ny, x2 + nx, y2 + ny, x2 - nx, y2 - ny, x1 - nx, y1 - ny)
      } else { dirs(2 * i) = Double.NaN; dirs(2 * i + 1) = Double.NaN }
      i += 1
    }
    // previous non-degenerate segment index for each vertex
    def prevSeg(v: Int): Int = {
      var j = v - 1
      while (j >= 0 && dirs(2 * j).isNaN) j -= 1
      if (j >= 0) j
      else if (closed) { var k = n - 2; while (k > v && dirs(2 * k).isNaN) k -= 1
        if (k > v && !dirs(2 * k).isNaN) k else -1 }
      else -1
    }
    def nextSeg(v: Int): Int = {
      var j = v
      while (j < n - 1 && dirs(2 * j).isNaN) j += 1
      if (j < n - 1) j
      else if (closed) { var k = 0; while (k < v && dirs(2 * k).isNaN) k += 1
        if (k < v && !dirs(2 * k).isNaN) k else -1 }
      else -1
    }
    if (st.join == JoinRound && st.cap == CapRound && !st.singleSided) {
      // fast path, identical to the classic construction: a full disc
      // at every vertex covers all round joins and round caps at once
      i = 0
      val last = if (closed) n - 1 else n
      while (i < last) { out += disc(sq.x(i), sq.y(i), d, st.quadSegs); i += 1 }
      return
    }
    // joins at interior vertices (all vertices for a ring)
    val vs = if (closed) 0 until (n - 1) else 1 until (n - 1)
    for (v <- vs) {
      val pi = prevSeg(v); val ni = nextSeg(v)
      if (pi >= 0 && ni >= 0 && !(pi == ni)) {
        val g = joinPiece(sq.x(v), sq.y(v),
          dirs(2 * pi), dirs(2 * pi + 1), dirs(2 * ni), dirs(2 * ni + 1), d, st)
        if (g != null) out += g
      } else if (st.join == JoinRound && (pi >= 0 || ni >= 0)) {
        // isolated repeated-coordinate vertex inside a line
        out += disc(sq.x(v), sq.y(v), d, st.quadSegs)
      }
    }
    if (!closed) {
      val s0 = nextSeg(0)
      if (s0 >= 0) {
        val g = capPiece(sq.x(0), sq.y(0), -dirs(2 * s0), -dirs(2 * s0 + 1), d, st)
        if (g != null) out += g
      }
      val sl = prevSeg(n - 1)
      if (sl >= 0) {
        val g = capPiece(sq.x(n - 1), sq.y(n - 1), dirs(2 * sl), dirs(2 * sl + 1), d, st)
        if (g != null) out += g
      }
    }
  }

  /** One-sided pieces for a sequence: per-segment one-sided rectangles
    * plus gap-side join fills where the path turns away from the
    * offset side. Flat ends (the reference forces flat caps).
    */
  private def sideSeqPieces(sq: Seqn, d: Double, leftSide: Boolean, st: Style,
                            out: mutable.ArrayBuffer[Geom]): Unit = {
    if (sq.isEmpty || sq.n < 2) return
    val n = sq.n
    val s = if (leftSide) 1.0 else -1.0
    val dirs = new Array[Double](2 * (n - 1))
    var i = 0
    while (i < n - 1) {
      val x1 = sq.x(i); val y1 = sq.y(i); val x2 = sq.x(i + 1); val y2 = sq.y(i + 1)
      val dx = x2 - x1; val dy = y2 - y1
      val len = math.hypot(dx, dy)
      if (len > 0) {
        dirs(2 * i) = dx / len; dirs(2 * i + 1) = dy / len
        val nx = -dy / len * s * d; val ny = dx / len * s * d
        out += poly(x1, y1, x2, y2, x2 + nx, y2 + ny, x1 + nx, y1 + ny)
      } else { dirs(2 * i) = Double.NaN; dirs(2 * i + 1) = Double.NaN }
      i += 1
    }
    // gap fills: at vertex v, a gap opens on the offset side when the
    // turn is AWAY from it (right turn for a left buffer, and vice
    // versa) — exactly when the convex side of the turn is the offset
    // side, so joinPiece's own side selection already matches.
    var prev = -1
    i = 0
    while (i < n - 1) {
      if (!dirs(2 * i).isNaN) {
        if (prev >= 0) {
          val cross = dirs(2 * prev) * dirs(2 * i + 1) - dirs(2 * prev + 1) * dirs(2 * i)
          val gapOnSide = if (leftSide) cross < 0 else cross > 0
          if (gapOnSide) {
            val v = i // vertex between segment prev and segment i
            val g = joinPiece(sq.x(v), sq.y(v),
              dirs(2 * prev), dirs(2 * prev + 1), dirs(2 * i), dirs(2 * i + 1), d, st)
            if (g != null) out += g
          }
        }
        prev = i
      }
      i += 1
    }
  }
}
