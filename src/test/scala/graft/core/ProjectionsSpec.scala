package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Projection forward goldens from the reference's own test suite
  * (reference: carto/projections_test.go, carto/proj_utm_test.go —
  * values originally cross-checked there against cs2cs/PROJ), plus
  * forward→reverse round-trips for every projection.
  */
class ProjectionsSpec extends AnyFunSuite {

  private def fwd(spec: String, lon: Double, lat: Double): (Double, Double) = {
    val g = Projections.forward(GPoint.xy(lon, lat), spec)
    val p = g.asInstanceOf[GPoint]
    (p.x, p.y)
  }

  private def check(spec: String, lon: Double, lat: Double,
                    ex: Double, ey: Double, tol: Double): Unit = {
    val (x, y) = fwd(spec, lon, lat)
    assert(math.abs(x - ex) <= tol && math.abs(y - ey) <= tol,
      s"$spec($lon,$lat) = ($x,$y), expected ($ex,$ey) +- $tol")
  }

  test("LCC Canada golden (reference carto test)") {
    // origin (-96,40), std parallels 50/70: Toronto, Vancouver
    val spec = "lcc:50:70:-96:40"
    check(spec, -79.3832, 43.6532, 1353292.7229285287, 590902.0666354574, 1e-3)
    check(spec, -123.1216, 49.2827, -1916086.3118012992, 1453088.303860319, 1e-3)
  }

  test("Albers Australia golden") {
    val spec = "albers:-18:-36:132:0"
    check(spec, 151.2146821, -33.8574973, 1757815.279206157, -3843578.921069043, 1e-3)
    check(spec, 115.5397172, -31.9949202, -1534150.6162269458, -3601473.816874394, 1e-3)
  }

  test("Equidistant conic South America golden") {
    val spec = "eqdc:-5:-42:-60:-32"
    check(spec, -43.2, -22.8, 1629961.7759447654, 929251.645477184, 1e-3)
  }

  test("Orthographic at Sydney golden") {
    val spec = "ortho:151:-34"
    check(spec, 151, -34, 0, 0, 1e-6)
    check(spec, 151, -33.99100679628548, 0, 1000, 1e-3)
    check(spec, 150.29102511044510493, -34.68753125394282932,
      -64821.441153708925, -76672.52425247061, 1e-3)
  }

  test("Azimuthal equidistant goldens") {
    // North-pole centered: Hamburg; values rounded to 0.1 in reference
    check("aeqd:0:90", 9.988519873740467, 53.434757149649016,
      705229.5, -4004246.7, 0.5)
    // Africa-centered: Cape Town (rounded to 1m in reference)
    check("aeqd:0:0", 18.483735820900083, -33.95848592499432,
      1805674, -3835659, 1.5)
  }

  test("UTM forward goldens (cs2cs cross-check values)") {
    check("utm:56S", 151.2020581, -33.8557148, 333673.327, 6252387.751, 5e-3)
    check("utm:33N", 14.5186965, 35.9019739, 456567.479, 3973182.990, 5e-3)
  }

  test("round-trips for all projections") {
    val specs = Seq("webmercator:4", "sinusoidal", "lambertcyl", "equirect",
      "lcc:33:45:-96:23", "albers:29.5:45.5:-96:23", "eqdc:29.5:45.5:-96:23",
      "ortho:-100:40", "aeqd:-100:40", "utm:17N")
    for (spec <- specs; (lon, lat) <- Seq((-81.0, 36.0), (-79.5, 43.25))) {
      val (x, y) = fwd(spec, lon, lat)
      val back = Projections.forward(GPoint.xy(x, y), spec + ":inv").asInstanceOf[GPoint]
      assert(math.abs(back.x - lon) < 1e-6 && math.abs(back.y - lat) < 1e-6,
        s"$spec round-trip ($lon,$lat) -> ($x,$y) -> (${back.x},${back.y})")
    }
  }
}
