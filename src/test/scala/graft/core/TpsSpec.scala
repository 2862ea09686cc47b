package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Algos.topologyPreserveSimplify — GEOS wrapper analogue (reference
  * geos/entrypoints.go:239-245).
  */
class TpsSpec extends AnyFunSuite {

  private def g(w: String): Geom = Wkt.parse(w)

  test("small hole survives TPS where plain DP collapses it") {
    // 8x6 rectangle with a diamond hole of radius 1/8 at its center:
    // plain DP at tolerance 1 collapses the hole ring (< 4 points);
    // TPS halves the tolerance until the structure is preserved
    val w = "POLYGON((0 0,8 0,8 6,0 6,0 0)," +
      "(4.125 3,4 3.125,3.875 3,4 2.875,4.125 3))"
    val in = g(w)
    assert(Validate.isValid(in))
    val plain = Algos.simplify(in, 1.0)
    assert(plain.asInstanceOf[GPoly].rings.length == 1, Wkt.write(plain)) // hole gone
    val tps = Algos.topologyPreserveSimplify(in, 1.0)
    val p = tps.asInstanceOf[GPoly]
    assert(p.rings.length == 2, Wkt.write(tps)) // hole preserved
    assert(Validate.isValid(tps))
    assert(math.abs(Measure.area(tps) - (48.0 - 0.03125)) < 1e-12)
  }

  test("noise removal still happens when topology is safe") {
    // zigzag noise of amplitude 1/16 on one edge: TPS at tolerance 1
    // removes it without any retry (the simplified polygon is valid)
    val zig = (1 to 9).map(j => s"${1.0 + (if (j % 2 == 0) 0.0625 else -0.0625)} $j")
      .mkString(",")
    val in = g(s"POLYGON((0 0,1 0,$zig,1 10,0 10,0 0))")
    assert(Validate.isValid(in))
    val tps = Algos.topologyPreserveSimplify(in, 1.0)
    assert(Validate.isValid(tps))
    assert(tps.numPoints == 5, Wkt.write(tps))
    assert(math.abs(Measure.area(tps) - 10.0) < 1e-12)
  }

  test("multipolygon elements never vanish") {
    // a tiny second element (below tolerance) must survive via retry
    val in = g("MULTIPOLYGON(((0 0,4 0,4 4,0 4,0 0))," +
      "((10 10,10.25 10,10.25 10.25,10 10.25,10 10)))")
    val tps = Algos.topologyPreserveSimplify(in, 2.0)
    assert(Geom.numGeometries(tps) == 2, Wkt.write(tps))
    assert(Validate.isValid(tps))
  }

  test("lines keep endpoints; empties and zero tolerance are identity") {
    val l = g("LINESTRING(0 0,0.01 1,0 2,0.01 3,0 4)")
    val tl = Algos.topologyPreserveSimplify(l, 0.5)
    assert(tl.isInstanceOf[GLine] && tl.numPoints == 2, Wkt.write(tl))
    assert(Algos.topologyPreserveSimplify(g("POLYGON EMPTY"), 1.0).isEmpty)
    val sq = g("POLYGON((0 0,1 0,1 1,0 1,0 0))")
    assert(Wkt.write(Algos.topologyPreserveSimplify(sq, 0.0)) == Wkt.write(sq))
  }

  test("invalid input falls back to plain DP (reference leaves it undefined)") {
    val bow = g("POLYGON((0 0,2 2,2 0,0 2,0 0))")
    val tps = Algos.topologyPreserveSimplify(bow, 0.1)
    assert(Wkt.write(tps) == Wkt.write(Algos.simplify(bow, 0.1)))
  }

  test("randomized: valid in, valid out, structure preserved") {
    val rnd = new scala.util.Random(20260819L)
    for (_ <- 1 to 100) {
      // random valid-ish rectangles with noisy edges
      val w = 2 + rnd.nextInt(8); val h = 2 + rnd.nextInt(8)
      val noise = (1 until w).map(i => s"$i ${rnd.nextInt(3) * 0.0625}").mkString(",")
      val in = g(s"POLYGON((0 0,$noise,$w 0,$w $h,0 $h,0 0))")
      if (Validate.isValid(in)) {
        val tps = Algos.topologyPreserveSimplify(in, 0.5 + rnd.nextDouble())
        assert(Validate.isValid(tps), s"in=${Wkt.write(in)} out=${Wkt.write(tps)}")
        assert(tps.asInstanceOf[GPoly].rings.length == 1)
      }
    }
  }
}
