package graft.core

import org.scalatest.funsuite.AnyFunSuite

class BufferSpec extends AnyFunSuite {

  private def g(wkt: String): Geom = Wkt.parse(wkt)

  // inscribed regular n-gon area: (1/2) n r^2 sin(2*pi/n)
  private def discArea(r: Double, n: Int): Double =
    0.5 * n * r * r * math.sin(2 * math.Pi / n)

  test("point buffer: n-gon disc, exact inscribed area, covers point") {
    val b = BufferOp.buffer(g("POINT(3 4)"), 2.0)
    assert(b.dimension == 2)
    assert(math.abs(Measure.area(b) - discArea(2.0, 32)) < 1e-9)
    assert(Relate.covers(b, g("POINT(3 4)")))
    assert(Validate.isValid(b))
  }

  test("line buffer: area ~ 2dL + pi d^2, covers line") {
    val l = g("LINESTRING(0 0,10 0)")
    val b = BufferOp.buffer(l, 1.0)
    val expect = 2 * 1.0 * 10 + math.Pi // caps sum to one disc
    assert(math.abs(Measure.area(b) - expect) / expect < 0.01,
      s"area=${Measure.area(b)} expect~$expect")
    assert(Relate.covers(b, l))
    assert(Validate.isValid(b))
  }

  test("bent line buffer stays valid and covers") {
    val l = g("LINESTRING(0 0,10 0,10 10,0 10)")
    val b = BufferOp.buffer(l, 1.5)
    assert(Relate.covers(b, l))
    assert(Validate.isValid(b))
    // 30 length * 3 width + pi*r^2 caps - 2 corner overcounts (already
    // merged by union); just sanity-bound it
    val a = Measure.area(b)
    assert(a > 80 && a < 100, s"area=$a")
  }

  test("polygon positive buffer grows, covers original; negative shrinks") {
    val p = g("POLYGON((0 0,10 0,10 10,0 10,0 0))")
    val grow = BufferOp.buffer(p, 1.0)
    assert(Relate.covers(grow, p))
    val ga = Measure.area(grow)
    // 100 + perimeter*1 + pi (rounded corners) ~ 143.1
    assert(math.abs(ga - (100 + 40 + math.Pi)) / ga < 0.01, s"area=$ga")

    val shrink = BufferOp.buffer(p, -2.0)
    assert(Relate.within(shrink, p))
    assert(math.abs(Measure.area(shrink) - 36.0) < 0.4, s"area=${Measure.area(shrink)}")

    // erode to nothing
    assert(BufferOp.buffer(p, -6.0).isEmpty)
  }

  test("polygon with hole: negative buffer grows the hole") {
    val p = g("POLYGON((0 0,20 0,20 20,0 20,0 0),(8 8,12 8,12 12,8 12,8 8))")
    val shrunk = BufferOp.buffer(p, -1.0)
    assert(Relate.within(shrunk, p))
    // outer shrinks to 18x18, hole grows to ~6x6 with rounded corners
    val a = Measure.area(shrunk)
    assert(a > 285 && a < 289, s"area=$a")
  }

  test("buffer(0) and empties") {
    val p = g("POLYGON((0 0,4 0,4 4,0 4,0 0))")
    assert(Measure.area(BufferOp.buffer(p, 0.0)) == 16.0)
    assert(BufferOp.buffer(g("LINESTRING(0 0,1 1)"), 0.0).isEmpty)
    assert(BufferOp.buffer(g("POINT(1 1)"), -1.0).isEmpty)
    assert(BufferOp.buffer(g("POLYGON EMPTY"), 1.0).isEmpty)
  }

  test("multi-geometry buffers dissolve overlaps") {
    val mp = g("MULTIPOINT(0 0,1 0)")
    val b = BufferOp.buffer(mp, 1.0)
    assert(b.isInstanceOf[GPoly], s"expected dissolved single polygon, got ${b.typeName}")
    assert(Validate.isValid(b))
  }
}
