package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** TWKB Z/M fidelity (reference: geom/twkb_write.go:17-52 extended
  * precision; twkb_parser.go ext byte): write keeps Z/M with their own
  * precisions and running deltas, read reconstructs them, empties
  * carry only the isEmpty bit, collections stay dimensionally uniform.
  */
class TwkbZmSpec extends AnyFunSuite {

  private def norm(wkt: String): String = Wkt.write(Wkt.parse(wkt))

  private def rt(wkt: String, prec: Int = 1): String =
    Wkt.write(Twkb.read(Twkb.write(Wkt.parse(wkt), prec)))

  test("XYZ/XYM/XYZM points round-trip exactly at covering precision") {
    for (w <- Seq("POINT Z (1 2 3.5)", "POINT M (1 2 -4.5)",
      "POINT ZM (1 2 3.5 -4.5)"))
      assert(rt(w) == norm(w), w)
  }

  test("XYZ linestring and polygon keep per-vertex Z") {
    for (w <- Seq("LINESTRING Z (0 0 1, 5 0 2.5, 5 5 -3)",
      "POLYGON Z ((0 0 1, 4 0 2, 4 4 3, 0 4 4, 0 0 1))"))
      assert(rt(w) == norm(w), w)
  }

  test("multis and collections keep Z/M") {
    for (w <- Seq("MULTIPOINT Z ((1 1 1), (2 2 2))",
      "MULTILINESTRING M ((0 0 1, 1 0 2), (2 2 3, 3 3 4))",
      "GEOMETRYCOLLECTION Z (POINT Z (1 2 3), LINESTRING Z (0 0 1, 1 1 2))"))
      assert(rt(w) == norm(w), w)
  }

  test("Z quantizes at precZ, independent of XY precision") {
    // default precZ = clamp(precXY, 0, 7) = 0 rounds 3.4 -> 3
    val g = Twkb.read(Twkb.write(Wkt.parse("POINT Z (1 2 3.4)"), 0))
    assert(Wkt.write(g) == norm("POINT Z (1 2 3)"))
    // explicit precZ=1 keeps tenths
    val g2 = Twkb.read(Twkb.write(Wkt.parse("POINT Z (1 2 3.4)"), 0, precZIn = 1))
    assert(Wkt.write(g2) == norm("POINT Z (1 2 3.4)"))
  }

  test("bbox header covers Z/M dimensions and still parses") {
    val g = Wkt.parse("LINESTRING ZM (0 0 1 10, 5 5 -2 20)")
    val b = Twkb.write(g, 1, withBBox = true, withSize = true)
    assert(Wkt.write(Twkb.read(b)) == norm("LINESTRING ZM (0 0 1 10, 5 5 -2 20)"))
    assert(Twkb.readSize(b).contains(b.length.toLong))
    assert(Twkb.readEnvelope(b).contains(Env(0, 0, 5, 5)))
  }

  test("empty geometries write only the isEmpty bit") {
    for (w <- Seq("POINT EMPTY", "LINESTRING EMPTY", "POLYGON EMPTY",
      "GEOMETRYCOLLECTION EMPTY")) {
      val b = Twkb.write(Wkt.parse(w), 2, withBBox = true, withSize = true)
      assert(b.length == 2, s"$w should be 2 header bytes, got ${b.length}")
      assert(Twkb.read(b).isEmpty)
    }
  }

  test("hostile id-list count is rejected before allocation") {
    // MULTIPOINT with ids, then corrupt the id count varint upward
    val g = Wkt.parse("MULTIPOINT ((1 1), (2 2))")
    val b = Twkb.write(g, 0, ids = Array(7L, 8L))
    // byte 0 type, byte 1 meta (hasIds), byte 2 item count (= id count)
    val bad = b.clone()
    bad(2) = 0x7F.toByte // claims 127 ids in a tiny buffer
    intercept[Twkb.ParseException](Twkb.readIdList(bad))
    assert(Twkb.readIdList(b).exists(_.sameElements(Array(7L, 8L))))
  }

  test("force-coordinates family fills new dims with 0") {
    val p = Wkt.parse("POINT Z (1 2 3)")
    assert(Wkt.write(Geom.forceCT(p, CT.XYZM)) == norm("POINT ZM (1 2 3 0)"))
    assert(Wkt.write(Geom.forceCT(p, CT.XYM)) == norm("POINT M (1 2 0)"))
    assert(Wkt.write(Geom.forceCT(p, CT.XY)) == norm("POINT (1 2)"))
  }
}
