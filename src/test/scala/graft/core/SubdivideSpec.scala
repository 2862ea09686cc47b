package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** ST_Subdivide semantics: pieces tile the input exactly (area
  * conserved, disjoint interiors by construction of the halving
  * clips) and each piece respects the vertex bound.
  */
class SubdivideSpec extends AnyFunSuite {

  private def ngon(cx: Double, cy: Double, r: Double, n: Int): Geom = {
    val c = new Array[Double](2 * (n + 1))
    for (i <- 0 until n) {
      val a = i.toDouble / n * 2 * math.Pi
      c(2 * i) = cx + r * math.cos(a); c(2 * i + 1) = cy + r * math.sin(a)
    }
    c(2 * n) = c(0); c(2 * n + 1) = c(1)
    GPoly(Array(Seqn.xy(c)), CT.XY)
  }

  test("area conserved and vertex bound honored on polygons") {
    for (n <- Seq(64, 256, 1024); mv <- Seq(16, 32)) {
      val g = ngon(3, -2, 5.0, n)
      val pieces = Algos.subdivide(g, mv)
      assert(pieces.nonEmpty)
      val total = pieces.map(Measure.area).sum
      assert(math.abs(total - Measure.area(g)) <= 1e-9 * Measure.area(g),
        s"n=$n mv=$mv area ${Measure.area(g)} -> $total")
      // halving clips can add a handful of corner vertices per cut;
      // PostGIS honors the bound modulo the same clip slack
      val worst = pieces.map(_.numPoints).max
      assert(worst <= mv + 8, s"n=$n mv=$mv worst piece has $worst vertices")
      assert(pieces.forall(_.dimension == 2))
    }
  }

  test("small inputs pass through untouched; lines subdivide by length") {
    val g = ngon(0, 0, 1.0, 8)
    assert(Algos.subdivide(g, 32) == Seq(g))
    val zig = {
      val m = 512
      val c = new Array[Double](2 * m)
      for (i <- 0 until m) { c(2 * i) = i * 0.1; c(2 * i + 1) = if (i % 2 == 0) 0 else 1 }
      GLine(Seqn.xy(c))
    }
    val pieces = Algos.subdivide(zig, 64)
    assert(pieces.forall(_.numPoints <= 64 + 8))
    val totalLen = pieces.map(Measure.length).sum
    assert(math.abs(totalLen - Measure.length(zig)) <= 1e-9 * Measure.length(zig))
  }

  test("polygon with hole conserves area through subdivision") {
    val shell = ngon(0, 0, 8.0, 128).asInstanceOf[GPoly].rings(0)
    val hole = ngon(0, 0, 3.0, 64).asInstanceOf[GPoly].rings(0)
    val g = GPoly(Array(shell, hole), CT.XY)
    val pieces = Algos.subdivide(g, 24)
    val total = pieces.map(Measure.area).sum
    assert(math.abs(total - Measure.area(g)) <= 1e-9 * Measure.area(g))
  }
}
