package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** SetOps.makeValid — GEOS wrapper analogue (reference
  * geos/entrypoints.go:259-267; the bowtie case below is the
  * reference's own MakeValid test, geos/entrypoints_test.go:843-857).
  */
class MakeValidSpec extends AnyFunSuite {

  private def g(w: String): Geom = Wkt.parse(w)
  private def mv(w: String): Geom = SetOps.makeValid(g(w))
  private def eqIgnore(a: Geom, b: Geom): Boolean =
    ExactEquals.equalsWithTolerance(a, b, 0.0, ignoreOrder = true)

  test("reference bowtie case: two triangles (geos/entrypoints_test.go:848)") {
    val got = mv("POLYGON((0 0,2 2,2 0,0 2,0 0))")
    val want = g("MULTIPOLYGON(((0 2,1 1,0 0,0 2)),((2 0,1 1,2 2,2 0)))")
    assert(Validate.isValid(got), Wkt.write(got))
    assert(eqIgnore(got, want), Wkt.write(got))
  }

  test("valid inputs round-trip unchanged (idempotent, bit-identical)") {
    val ws = Seq(
      "POLYGON((0 0,4 0,4 4,0 4,0 0))",
      "POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,1 2,2 2,2 1,1 1))",
      "MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)),((5 5,6 5,6 6,5 6,5 5)))",
      "POINT(3 4)", "MULTIPOINT(1 1,1 1,2 2)",
      "LINESTRING(0 0,1 1,1 1,2 0)", "POLYGON EMPTY", "LINESTRING EMPTY",
      "GEOMETRYCOLLECTION(POINT(1 2),POLYGON((0 0,1 0,1 1,0 1,0 0)))")
    for (w <- ws) {
      val in = g(w)
      val out = SetOps.makeValid(in)
      assert(Wkt.write(out) == Wkt.write(in), s"changed: $w -> ${Wkt.write(out)}")
    }
  }

  test("duplicated ring cancels to empty (even-odd)") {
    val got = mv("POLYGON((0 0,4 0,4 4,0 4,0 0),(0 0,4 0,4 4,0 4,0 0))")
    assert(got.isEmpty, Wkt.write(got))
  }

  test("hole crossing outside the shell: both even-odd regions kept") {
    // 4x4 shell, 4x4 "hole" at (2,2): overlap (2..4)^2 covered twice ->
    // dropped; shell-only and hole-outside parts covered once -> kept
    val got = mv("POLYGON((0 0,4 0,4 4,0 4,0 0),(2 2,6 2,6 6,2 6,2 2))")
    assert(Validate.isValid(got), Wkt.write(got))
    assert(math.abs(Measure.area(got) - 24.0) < 1e-9, Wkt.write(got))
    assert(got.asInstanceOf[GMPoly].polys.length == 2, Wkt.write(got))
  }

  test("zero-width spike collapses away, body area preserved") {
    val got = mv("POLYGON((0 0,4 0,4 4,2 4,2 6,2 4,0 4,0 0))")
    assert(Validate.isValid(got), Wkt.write(got))
    assert(math.abs(Measure.area(got) - 16.0) < 1e-9, Wkt.write(got))
  }

  test("hole shares a full edge segment with the shell: still repaired valid") {
    // hole touching the shell along a 1-long edge makes the input
    // invalid (interior disconnected rule aside, boundary-contact rule)
    val got = mv("POLYGON((0 0,4 0,4 4,0 4,0 0),(0 1,2 1,2 2,0 2,0 1))")
    assert(Validate.isValid(got), Wkt.write(got))
    assert(math.abs(Measure.area(got) - 14.0) < 1e-9, Wkt.write(got))
  }

  test("nested shells (shell inside shell in one MULTIPOLYGON): even-odd makes the inner a hole") {
    val got = mv("MULTIPOLYGON(((0 0,4 0,4 4,0 4,0 0)),((1 1,3 1,3 3,1 3,1 1)))")
    assert(Validate.isValid(got), Wkt.write(got))
    assert(math.abs(Measure.area(got) - 12.0) < 1e-9, Wkt.write(got))
  }

  test("degenerate line collapses to POINT (GEOS behaviour)") {
    val got = SetOps.makeValid(g("LINESTRING(1 1,1 1)"))
    assert(got.isInstanceOf[GPoint] && Wkt.write(got) == "POINT(1 1)", Wkt.write(got))
    val ml = SetOps.makeValid(g("MULTILINESTRING((1 1,1 1),(0 0,2 2))"))
    assert(Validate.isValid(ml), Wkt.write(ml))
    assert(ml.isInstanceOf[GColl], Wkt.write(ml))
  }

  test("repaired output is valid and makeValid is idempotent (seeded sweep)") {
    val rnd = new scala.util.Random(20260819L)
    for (_ <- 1 to 200) {
      // random 6-vertex closed ring: usually self-intersecting
      val pts = (1 to 6).map(_ => (rnd.nextInt(20).toDouble, rnd.nextInt(20).toDouble))
      val ring = (pts :+ pts.head).map { case (x, y) => s"$x $y" }.mkString(",")
      val in = g(s"POLYGON(($ring))")
      val out = SetOps.makeValid(in)
      assert(out.isEmpty || Validate.isValid(out),
        s"invalid repair of POLYGON(($ring)): ${Wkt.write(out)}")
      val out2 = SetOps.makeValid(out)
      assert(Wkt.write(out2) == Wkt.write(out), s"not idempotent on POLYGON(($ring))")
      // even-odd area identity: sum of signed-area magnitudes under
      // parity equals the repaired area — cross-check via ray casts on
      // a fine grid (coarse Monte-Carlo-free check: 40x40 lattice)
      val exp = {
        var cells = 0
        val r = in.asInstanceOf[GPoly].rings(0)
        for (ix <- 0 until 40; iy <- 0 until 40) {
          val px = ix * 0.5 + 0.25; val py = iy * 0.5 + 0.25
          if (Alg.pointInRing(r, px, py) > 0) cells += 1
        }
        cells * 0.25
      }
      val area = Measure.area(out)
      // lattice pitch 0.5: every boundary-adjacent cell (within one
      // pitch of the ring) can mis-count, so bound by pitch * ring len
      val ringLen = pts.indices.map { i =>
        val (x1, y1) = pts(i); val (x2, y2) = pts((i + 1) % pts.length)
        math.hypot(x2 - x1, y2 - y1)
      }.sum
      assert(math.abs(area - exp) <= 0.5 * (ringLen + 2),
        s"area $area vs lattice $exp for POLYGON(($ring))")
    }
  }
}
