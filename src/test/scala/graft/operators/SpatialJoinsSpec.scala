package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SparkTestSession
import graft.functions.ST._

/** The three broadcast PIP join paths (generic WKB R-tree join, raw
  * coordinate key join, fused count aggregate) must agree with each
  * other and with a brute-force cross join on the same synthetic data,
  * including boundary points (contains = strict interior).
  */
class SpatialJoinsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def pts = {
    // include exact boundary points: x=0 sits on box edges below
    (1 to 500).map { i =>
      (i.toLong, (i * 13 % 41).toDouble - 20.0, (i * 7 % 31).toDouble - 15.0)
    }.toDF("id", "x", "y").withColumn("pt", st_point($"x", $"y"))
  }

  private def boxes =
    Seq(
      (10L, -20.0, -15.0, 0.0, 0.0),
      (11L, 0.0, 0.0, 20.0, 15.0),
      (12L, -5.0, -5.0, 5.0, 5.0),
      (13L, 100.0, 100.0, 101.0, 101.0) // matches nothing
    ).toDF("bid", "x0", "y0", "x1", "y1")
      .withColumn("box", st_makeEnvelope($"x0", $"y0", $"x1", $"y1"))

  private def brute(strict: Boolean): Map[(Long, Long), Long] = {
    val cmp = if (strict) "<" else "<="
    val cmpL = if (strict) ">" else ">="
    pts.join(boxes,
        expr(s"x $cmpL x0 AND x $cmp x1 AND y $cmpL y0 AND y $cmp y1"))
      .groupBy($"bid").count()
      .collect().map(r => (r.getLong(0), -1L) -> r.getLong(1)).toMap
  }

  private def countsOf(df: org.apache.spark.sql.DataFrame, key: String): Map[(Long, Long), Long] =
    df.collect().map(r => (r.getLong(0), -1L) -> r.getLong(1)).toMap

  test("three broadcast PIP paths agree (contains = strict interior)") {
    val expected = brute(strict = true)

    val generic = SpatialJoins.broadcastSpatialJoin(pts, $"pt", boxes, "box", "contains")
      .groupBy($"bid").agg(count(lit(1)).cast("long").as("n"))
    val keyed = SpatialJoins.broadcastPointKeyJoin(pts, $"x", $"y",
        boxes, "box", "bid", pred = "contains", outKey = "bid")
      .groupBy($"bid").agg(count(lit(1)).cast("long").as("n"))
    val fused = SpatialJoins.broadcastPipCounts(pts, $"x", $"y",
      boxes, "box", "bid", pred = "contains", outKey = "bid", outCount = "n")

    assert(countsOf(generic, "bid") == expected)
    assert(countsOf(keyed, "bid") == expected)
    assert(countsOf(fused, "bid") == expected)
  }

  test("intersects includes boundary points in all three paths") {
    val expected = brute(strict = false)

    val generic = SpatialJoins.broadcastSpatialJoin(pts, $"pt", boxes, "box", "intersects")
      .groupBy($"bid").agg(count(lit(1)).cast("long").as("n"))
    val keyed = SpatialJoins.broadcastPointKeyJoin(pts, $"x", $"y",
        boxes, "box", "bid", pred = "intersects", outKey = "bid")
      .groupBy($"bid").agg(count(lit(1)).cast("long").as("n"))
    val fused = SpatialJoins.broadcastPipCounts(pts, $"x", $"y",
      boxes, "box", "bid", pred = "intersects", outKey = "bid", outCount = "n")

    assert(countsOf(generic, "bid") == expected)
    assert(countsOf(keyed, "bid") == expected)
    assert(countsOf(fused, "bid") == expected)
  }

  test("cellJoin with crossing lineal geometries matches brute force (r4 dedup fix)") {
    // two families of diagonal lines that cross far from the min corner
    // of their envelope intersection: the round-3 reference-point dedup
    // kept a pair only in that corner's cell, which intersects NEITHER
    // line's geometry-refined cover — true pairs were silently dropped.
    val a = (0 until 40).map { i =>
      val x = (i * 13 % 50).toDouble - 25.0
      val y = (i * 7 % 40).toDouble - 20.0
      (i.toLong, s"LINESTRING($x ${y + 10},${x + 10} $y)") // NW->SE diagonal
    }.toDF("a_id", "a_wkt").withColumn("a_g", st_geomFromWKT($"a_wkt"))
    val b = (0 until 40).map { j =>
      val x = (j * 17 % 50).toDouble - 25.0
      val y = (j * 11 % 40).toDouble - 20.0
      (j.toLong, s"LINESTRING($x $y,${x + 10} ${y + 10})") // SW->NE diagonal
    }.toDF("b_id", "b_wkt").withColumn("b_g", st_geomFromWKT($"b_wkt"))
    val expected = a.crossJoin(b).filter(st_intersects($"a_g", $"b_g"))
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty)
    for (level <- Seq(4, 6)) {
      val got = SpatialJoins.cellJoin(a, "a_g", b, "b_g", "intersects",
        level = level, leftKeys = Seq("a_id"), rightKeys = Seq("b_id"))
        .select($"a_id", $"b_id").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"duplicates at level $level")
      assert(got.toSet === expected, s"wrong pairs at level $level")
    }
  }

  test("st_cellOf codegen and interpreted agree") {
    val df = (1 to 1000).map { i =>
      ((i * 937 % 720).toDouble / 2.0 - 180.0, (i * 487 % 340).toDouble / 2.0 - 85.0)
    }.toDF("lon", "lat")
    val viaExpr = df.select(st_cellOf($"lon", $"lat", lit(12)).as("c")).collect().map(_.getLong(0))
    val viaScala = df.collect().map(r => graft.tiling.Cell.cellOf(r.getDouble(0), r.getDouble(1), 12))
    assert(viaExpr.toSeq == viaScala.toSeq)
  }
}
