package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Hostile-input fuzz for the binary/text codecs: random bytes,
  * truncations, and bit-flips of valid encodings must either parse or
  * throw a controlled exception — never crash the JVM, hang, or
  * allocate unboundedly (the WKB count and TWKB idlist guards this
  * round's ADVICE items added). Seeded and bounded, so CI-stable.
  */
class CodecFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(1234)

  private def controlled(t: Throwable): Boolean = t match {
    case _: Wkt.ParseException | _: Wkb.ParseException |
         _: Twkb.ParseException | _: GeoJson.ParseException => true
    case _: IllegalArgumentException | _: IllegalStateException |
         _: IndexOutOfBoundsException | _: java.nio.BufferUnderflowException |
         _: NumberFormatException | _: UnsupportedOperationException |
         _: java.util.NoSuchElementException | _: MatchError => true
    case _ => false
  }

  private def tryParse(label: String, f: => Any): Unit =
    try { f; () } catch {
      case t: Throwable =>
        assert(controlled(t), s"$label threw uncontrolled ${t.getClass}: ${t.getMessage}")
    }

  test("random byte blobs never crash the binary readers") {
    for (_ <- 0 until 3000) {
      val n = rnd.nextInt(64)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      tryParse("wkb", Wkb.read(b))
      tryParse("twkb", Twkb.read(b))
    }
  }

  test("bit-flipped and truncated valid WKB/TWKB stay controlled") {
    val geoms = Seq(
      Wkt.parse("POINT(1 2)"),
      Wkt.parse("LINESTRING(0 0, 1 1, 2 0)"),
      Wkt.parse("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0),(1 1, 2 1, 2 2, 1 2, 1 1))"),
      Wkt.parse("MULTIPOLYGON(((0 0, 1 0, 1 1, 0 0)),((5 5, 6 5, 6 6, 5 5)))"),
      Wkt.parse("GEOMETRYCOLLECTION(POINT(1 1),LINESTRING(0 0, 2 2))"))
    for (g <- geoms) {
      val wkb = Wkb.write(g)
      val twkb = Twkb.write(g, 4)
      for (_ <- 0 until 600) {
        val which = rnd.nextInt(4)
        val src = if (which < 2) wkb else twkb
        val mut = src.clone()
        if (which % 2 == 0 && mut.nonEmpty) {
          // flip 1-4 random bits
          for (_ <- 0 to rnd.nextInt(4))
            mut(rnd.nextInt(mut.length)) = (mut(rnd.nextInt(mut.length)) ^ (1 << rnd.nextInt(8))).toByte
          tryParse("mutated", if (which < 2) Wkb.read(mut) else Twkb.read(mut))
        } else {
          val cut = java.util.Arrays.copyOf(mut, rnd.nextInt(mut.length + 1))
          tryParse("truncated", if (which < 2) Wkb.read(cut) else Twkb.read(cut))
        }
      }
    }
  }

  test("garbage text never crashes WKT/GeoJSON parsers") {
    val seeds = Seq(
      "POINT(1 2)", "LINESTRING(0 0, 1 1)", "POLYGON((0 0,1 0,1 1,0 0))",
      """{"type":"Point","coordinates":[1,2]}""",
      """{"type":"FeatureCollection","features":[{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},"properties":{}}]}""")
    for (s <- seeds; _ <- 0 until 400) {
      val chars = s.toCharArray
      val k = rnd.nextInt(3) + 1
      for (_ <- 0 until k) {
        val i = rnd.nextInt(chars.length)
        chars(i) = (rnd.nextInt(94) + 33).toChar
      }
      val mutated = new String(chars, 0, rnd.nextInt(chars.length + 1))
      tryParse("wkt", Wkt.parse(mutated))
      tryParse("geojson", GeoJson.parse(mutated))
    }
  }
}
