package graft.core

import scala.collection.mutable

/** Buffer (Minkowski sum with a disc) re-expressed on top of the
  * arrangement overlay: the buffer of a geometry is the union of
  * per-piece primitive buffers — a disc polygon per vertex and an
  * oriented rectangle per segment — dissolved by SetOps' cascaded
  * union. Round caps/joins only (the reference's default; cap/join
  * styles are per-piece generators and can be added the same way).
  *
  * Reference semantics: geom/alg_buffer.go:24-124 (default round caps
  * and joins, quadrant segments = 8; negative distance erodes areal
  * geometries and empties lower-dimensional ones).
  */
object BufferOp {

  def buffer(g: Geom, dist: Double, quadSegs: Int = 8): Geom = {
    if (g.isEmpty) return GPoly(Array.empty, CT.XY)
    if (dist == 0)
      return if (g.dimension == 2) SetOps.unaryUnion(g) else GPoly(Array.empty, CT.XY)
    if (dist < 0) {
      if (g.dimension < 2) return GPoly(Array.empty, CT.XY)
      return erode(g, -dist, quadSegs)
    }
    val pieces = mutable.ArrayBuffer.empty[Geom]
    collectPieces(g, dist, quadSegs, pieces)
    if (pieces.isEmpty) GPoly(Array.empty, CT.XY)
    else SetOps.unionMany(pieces.toSeq)
  }

  private def collectPieces(g: Geom, d: Double, qs: Int,
                            out: mutable.ArrayBuffer[Geom]): Unit = g match {
    case p: GPoint if !p.isEmpty => out += disc(p.x, p.y, d, qs)
    case GMPoint(ps, _) => ps.foreach(collectPieces(_, d, qs, out))
    case GLine(s) => seqPieces(s, d, qs, out)
    case GMLine(ls, _) => ls.foreach(seqPieces(_, d, qs, out))
    case poly @ GPoly(rings, _) if rings.nonEmpty =>
      out += poly
      rings.foreach(seqPieces(_, d, qs, out))
    case GMPoly(ps, ct) =>
      ps.filter(_.nonEmpty).foreach(rs => collectPieces(GPoly(rs, ct), d, qs, out))
    case GColl(gs, _) => gs.foreach(collectPieces(_, d, qs, out))
    case _ => ()
  }

  /** Negative buffer of an areal geometry: interior points at distance
    * > d from the boundary, i.e. g minus the boundary's buffer.
    */
  private def erode(g: Geom, d: Double, qs: Int): Geom = {
    val boundaryPieces = mutable.ArrayBuffer.empty[Geom]
    def rings(x: Geom): Unit = x match {
      case GPoly(rs, _) => rs.foreach(seqPieces(_, d, qs, boundaryPieces))
      case GMPoly(ps, _) => ps.foreach(_.foreach(seqPieces(_, d, qs, boundaryPieces)))
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

  /** Per-segment rectangle + per-vertex disc pieces for a sequence. */
  private def seqPieces(s: Seqn, d: Double, qs: Int,
                        out: mutable.ArrayBuffer[Geom]): Unit = {
    if (s.isEmpty) return
    var i = 0
    while (i < s.n) {
      out += disc(s.x(i), s.y(i), d, qs)
      i += 1
    }
    i = 0
    while (i < s.n - 1) {
      val x1 = s.x(i); val y1 = s.y(i); val x2 = s.x(i + 1); val y2 = s.y(i + 1)
      val dx = x2 - x1; val dy = y2 - y1
      val len = math.hypot(dx, dy)
      if (len > 0) {
        val nx = -dy / len * d; val ny = dx / len * d
        out += GPoly(Array(Seqn.of(
          x1 + nx, y1 + ny, x2 + nx, y2 + ny,
          x2 - nx, y2 - ny, x1 - nx, y1 - ny,
          x1 + nx, y1 + ny)), CT.XY)
      }
      i += 1
    }
  }
}
