package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SparkTestSession
import graft.functions.ST._

/** Raster↔vector + hex binning invariants:
  *  - rasterize partitions area exactly: coverage fractions times the
  *    cell area sum back to the polygon area, interior cells are
  *    exactly 1.0, and every fraction is in (0, 1].
  *  - vectorize (coverage-union dissolve) produces the closed-form
  *    polygon-with-holes of a punched grid, is invariant under
  *    repartitioning (exact partial merge), and REJECTS duplicated
  *    cells rather than silently deduping.
  *  - hexBin assigns each point to the hexagon with the nearest
  *    center (the defining property of the lattice), and inverts
  *    hexCenter.
  */
class RasterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val level = 4
  private val cw = 360.0 / (1 << level) // 22.5, exact
  private val ch = 170.0 / (1 << level) // 10.625, exact
  private val cellArea = cw * ch // 239.0625, exact

  test("rasterize: fractions partition the polygon area exactly") {
    // a box deliberately NOT aligned to the grid: corners at quarter-cell
    // offsets so edge cells get fractional coverage
    val x0 = -180.0 + 1.25 * cw; val y0 = 85.0 - 5.75 * ch
    val x1 = x0 + 3.5 * cw; val y1 = y0 + 2.25 * ch
    val df = Seq((1L, x0, y0, x1, y1)).toDF("id", "x0", "y0", "x1", "y1")
      .withColumn("box", st_makeEnvelope($"x0", $"y0", $"x1", $"y1"))
    val out = Raster.rasterizeEquirect(df, "box", level)
      .select($"ix", $"iy", $"coverage").collect()
    // x spans [1.25, 4.75) in cell units -> columns 1..4; y spans
    // [3.5, 5.75) -> rows 3..5: 4 x 3 touched cells
    assert(out.length === 4 * 3)
    val frs = out.map(_.getDouble(2))
    assert(frs.forall(f => f > 0 && f <= 1.0))
    // fully-covered cells exactly 1.0 (dyadic edges => exact doubles):
    // full columns 2..3 x full row 4
    assert(frs.count(_ == 1.0) === 2 * 1)
    // exact area partition, no tolerance
    assert(frs.sum * cellArea === (x1 - x0) * (y1 - y0))
  }

  test("vectorize: punched grid dissolves to the closed-form polygon and is repartition-invariant") {
    // 5x4 block at offset (2,3), interior odd-odd cells removed:
    // holes at local (1,1), (3,1) => 2 holes
    val cells = for {
      i <- 0 until 5; j <- 0 until 4
      if !(i % 2 == 1 && j % 2 == 1 && i < 4 && j < 3)
    } yield (7L, (2 + i).toLong, (3 + j).toLong)
    def run(parts: Int) = {
      val df = cells.toDF("k", "ix", "iy").repartition(parts)
      Raster.vectorizeEquirect(df, "ix", "iy", level, Seq("k"))
        .select($"k",
          expr("st_area(geom)").as("area"),
          expr("st_length(st_boundary(geom))").as("perim"),
          expr("st_numinteriorrings(geom)").as("holes"),
          expr("st_isvalid(geom)").as("ok"),
          expr("st_astext(geom)").as("wkt"))
        .collect().head
    }
    val r = run(1)
    assert(r.getDouble(1) === (5 * 4 - 2) * cellArea)
    assert(r.getDouble(2) === 2 * (5 * cw + 4 * ch) + 2 * 2 * (cw + ch))
    assert(r.getInt(3) === 2)
    assert(r.getBoolean(4))
    // exact partial merge: any partitioning yields the identical WKB walk
    assert(run(7).getString(5) === r.getString(5))
  }

  test("vectorize: duplicated cell is rejected, not silently deduped") {
    val df = Seq((1L, 4L, 4L), (1L, 4L, 4L)).toDF("k", "ix", "iy")
    val e = intercept[Exception] {
      Raster.vectorizeEquirect(df, "ix", "iy", level, Seq("k")).collect()
    }
    assert(e.getMessage != null)
  }

  test("pyramidUp: level-5 area rollup is bit-identical to clipping at level 4") {
    val x0 = -180.0 + 1.25 * cw; val y0 = 85.0 - 5.75 * ch
    val df = Seq((1L, x0, y0, x0 + 3.5 * cw, y0 + 2.25 * ch))
      .toDF("id", "x0", "y0", "x1", "y1")
      .withColumn("box", st_makeEnvelope($"x0", $"y0", $"x1", $"y1"))
      .select($"id", $"box")
    def areas(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val t5 = SpatialJoins.tileAssignEquirect(df, "box", level + 1)
      .select($"id", $"ix", $"iy", expr("st_area(tile_part)").as("pa"))
      .filter($"pa" > 0)
    val rolled = areas(Raster.pyramidUp(t5, "ix", "iy", Seq("id"), sum($"pa").as("pa")))
    val direct = areas(SpatialJoins.tileAssignEquirect(df, "box", level)
      .select($"id", $"ix", $"iy", expr("st_area(tile_part)").as("pa"))
      .filter($"pa" > 0))
    assert(rolled === direct) // exact double equality, no tolerance
  }

  test("hexCover ⊇ bins of interior points; hexJoin equals brute force") {
    val size = 5.0
    // boxes including one smaller than a hex and one spanning many
    val boxes = Seq(
      (10L, -20.0, -15.0, 0.5, 0.5),
      (11L, 0.5, 0.5, 21.0, 16.0),
      (12L, -1.0, -1.0, 1.0, 1.0),   // sub-hex-sized
      (13L, 100.0, 100.0, 101.0, 101.0)
    ).toDF("bid", "x0", "y0", "x1", "y1")
      .withColumn("box", st_makeEnvelope($"x0", $"y0", $"x1", $"y1"))
    val pts = (1 to 800).map { i =>
      (i.toLong, (i * 13 % 41).toDouble - 20.0 + i % 3 * 0.25,
        (i * 7 % 31).toDouble - 15.0 + i % 5 * 0.125)
    }.toDF("id", "x", "y")
    // cover completeness: every interior point's bin is in the cover
    val cover = Raster.hexCover(boxes.select($"bid", $"box"), "box", size)
      .select($"bid", $"hq", $"hr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val (bq, br) = Raster.hexBin($"x", $"y", size)
    val binned = pts.withColumn("hq", bq).withColumn("hr", br).collect()
    val boxDefs = Seq((10L, -20.0, -15.0, 0.5, 0.5), (11L, 0.5, 0.5, 21.0, 16.0),
      (12L, -1.0, -1.0, 1.0, 1.0), (13L, 100.0, 100.0, 101.0, 101.0))
    var expected = Map.empty[Long, Long].withDefaultValue(0L)
    for (p <- binned; (bid, x0, y0, x1, y1) <- boxDefs) {
      val (x, y) = (p.getDouble(1), p.getDouble(2))
      if (x > x0 && x < x1 && y > y0 && y < y1) {
        assert(cover.contains((bid, p.getLong(3), p.getLong(4))),
          s"bin of interior point ($x,$y) missing from cover of box $bid")
        expected = expected.updated(bid, expected(bid) + 1)
      }
    }
    // join result identity vs brute force
    val got = Raster.hexJoin(boxes.select($"bid", $"box"), "box",
        pts, "x", "y", size)
      .groupBy("bid").agg(count(lit(1)).as("cnt")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected.filter(_._2 > 0))
  }

  test("hexBin: nearest-center assignment and hexCenter inversion") {
    val size = 7.0
    // a grid of probe points spanning several hexes, off-lattice offsets
    val pts = (for (i <- -40 to 40; j <- -20 to 20)
      yield (i * 2.31 + 0.077, j * 3.17 - 0.053)).toDF("x", "y")
    val (hq, hr) = Raster.hexBin($"x", $"y", size)
    val (cxCol, cyCol) = Raster.hexCenter($"hq", $"hr", size)
    val rows = pts.withColumn("hq", hq).withColumn("hr", hr)
      .withColumn("cx", cxCol).withColumn("cy", cyCol)
      .select($"x", $"y", $"hq", $"hr", $"cx", $"cy").collect()
    val neighbors = Seq((1L, 0L), (-1L, 0L), (0L, 1L), (0L, -1L), (1L, -1L), (-1L, 1L))
    def center(q: Long, r: Long) =
      (size * (Raster.Sqrt3 * q + Raster.Sqrt3Half * r), size * 1.5 * r)
    for (row <- rows) {
      val (x, y) = (row.getDouble(0), row.getDouble(1))
      val (q, r) = (row.getLong(2), row.getLong(3))
      val d0 = math.hypot(x - row.getDouble(4), y - row.getDouble(5))
      for ((dq, dr) <- neighbors) {
        val (nx, ny) = center(q + dq, r + dr)
        // ties on hex boundaries allowed; never strictly closer
        assert(math.hypot(x - nx, y - ny) >= d0 - 1e-9,
          s"point ($x,$y) assigned to ($q,$r) but neighbor (${q + dq},${r + dr}) is closer")
      }
    }
    // lattice inversion: the center of every bin maps back to that bin
    val inv = (for (q <- -5L to 5L; r <- -5L to 5L) yield {
      val (cx, cy) = center(q, r); (q, r, cx, cy)
    }).toDF("q", "r", "x", "y")
    val (iq, ir) = Raster.hexBin($"x", $"y", size)
    val badInv = inv.withColumn("iq", iq).withColumn("ir", ir)
      .filter($"iq" =!= $"q" || $"ir" =!= $"r").count()
    assert(badInv === 0)
  }
}
