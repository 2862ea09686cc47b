package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property tests over the geometry kernels — the
  * randomized stand-in for the reference's GEOS-diff fuzzing
  * (cmprefimpl): codec round-trips, predicate symmetry/transposition,
  * envelope consistency, and overlay area conservation, over
  * generator-built valid geometries. Seeded, so runs are
  * deterministic.
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop, n: Int = 300): Unit = {
    // GRAFT_PROP_N overrides the per-property case count for one-off
    // deep fuzz runs (e.g. GRAFT_PROP_N=10000 sbt "testOnly *PropertySpec")
    val nEff = sys.env.get("GRAFT_PROP_N").map(_.toInt).getOrElse(n)
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(nEff)
      .withInitialSeed(Seed(42L))
      .withWorkers(1)
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  // exact quarter-fraction ordinates: no parse/format rounding anywhere
  private val ord: Gen[Double] = Gen.choose(-160, 160).map(_ / 4.0)
  private val posOrd: Gen[Double] = Gen.choose(2, 60).map(_ / 4.0)

  private val genPoint: Gen[Geom] =
    for (x <- ord; y <- ord) yield Wkt.parse(s"POINT($x $y)")

  private val genBoxPoly: Gen[Geom] =
    for (x <- ord; y <- ord; w <- posOrd; h <- posOrd)
      yield Wkt.parse(s"POLYGON((" +
        s"$x $y, ${x + w} $y, ${x + w} ${y + h}, $x ${y + h}, $x $y))")

  private val genHolePoly: Gen[Geom] =
    for (x <- ord; y <- ord; w <- posOrd.map(_ + 4); h <- posOrd.map(_ + 4))
      yield Wkt.parse(s"POLYGON((" +
        s"$x $y, ${x + w} $y, ${x + w} ${y + h}, $x ${y + h}, $x $y)," +
        s"(${x + 1} ${y + 1}, ${x + 1} ${y + 2}, ${x + 2} ${y + 2}," +
        s" ${x + 2} ${y + 1}, ${x + 1} ${y + 1}))")

  private val genLine: Gen[Geom] =
    for {
      n <- Gen.choose(2, 6)
      xs <- Gen.listOfN(n, ord)
      ys <- Gen.listOfN(n, ord)
      if xs.zip(ys).distinct.size >= 2
    } yield Wkt.parse("LINESTRING(" +
      xs.zip(ys).distinct.map { case (x, y) => s"$x $y" }.mkString(", ") + ")")

  private val genMulti: Gen[Geom] = for {
    k <- Gen.choose(1, 3)
    pts <- Gen.listOfN(k, Gen.zip(ord, ord))
  } yield Wkt.parse("MULTIPOINT(" + pts.map { case (x, y) => s"($x $y)" }.mkString(", ") + ")")

  private val genAny: Gen[Geom] =
    Gen.oneOf(genPoint, genBoxPoly, genHolePoly, genLine, genMulti)

  private val genAreal: Gen[Geom] = Gen.oneOf(genBoxPoly, genHolePoly)

  test("WKT and WKB round-trip bit-identically") {
    check("roundtrip", Prop.forAll(genAny) { g =>
      val viaWkt = Wkt.parse(Wkt.write(g))
      val viaWkb = Wkb.read(Wkb.write(g))
      java.util.Arrays.equals(Wkb.write(viaWkt), Wkb.write(g)) &&
        java.util.Arrays.equals(Wkb.write(viaWkb), Wkb.write(g))
    })
  }

  test("intersects is symmetric; disjoint is its negation") {
    check("symmetry", Prop.forAll(genAny, genAny) { (a, b) =>
      val i = Intersects.intersects(a, b)
      i == Intersects.intersects(b, a) && Relate.disjoint(a, b) == !i
    })
  }

  test("contains(a,b) iff within(b,a); relate transposes") {
    check("transpose", Prop.forAll(genAny, genAny) { (a, b) =>
      val m = Relate.relate(a, b)
      val mt = Relate.relate(b, a)
      def t(s: String) = "" + s(0) + s(3) + s(6) + s(1) + s(4) + s(7) + s(2) + s(5) + s(8)
      m == t(mt) &&
        Relate.contains(a, b) == Relate.within(b, a) &&
        Relate.covers(a, b) == Relate.coveredBy(b, a)
    })
  }

  test("intersecting geometries have intersecting envelopes") {
    check("envelope", Prop.forAll(genAny, genAny) { (a, b) =>
      !Intersects.intersects(a, b) || a.envelope.intersects(b.envelope)
    })
  }

  test("overlay conserves area: A = (A∩B) + (A\\B); union bounded") {
    check("area", Prop.forAll(genAreal, genAreal) { (a, b) =>
      val aA = Measure.area(a); val aB = Measure.area(b)
      val inter = Measure.area(SetOps.intersection(a, b))
      val diff = Measure.area(SetOps.difference(a, b))
      val uni = Measure.area(SetOps.union(a, b))
      val eps = 1e-9 * math.max(1.0, aA + aB)
      math.abs(inter + diff - aA) <= eps &&
        uni >= math.max(aA, aB) - eps &&
        uni <= aA + aB + eps &&
        math.abs(uni - (aA + aB - inter)) <= eps
    }, n = 200)
  }

  test("distance zero iff intersects") {
    check("distance", Prop.forAll(genAny, genAny) { (a, b) =>
      Intersects.distance(a, b) match {
        case Some(d) => (d == 0.0) == Intersects.intersects(a, b)
        case None => a.isEmpty || b.isEmpty
      }
    })
  }
}
