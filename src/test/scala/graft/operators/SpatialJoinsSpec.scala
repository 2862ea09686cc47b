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

  test("st_cellOf codegen and interpreted agree") {
    val df = (1 to 1000).map { i =>
      ((i * 937 % 720).toDouble / 2.0 - 180.0, (i * 487 % 340).toDouble / 2.0 - 85.0)
    }.toDF("lon", "lat")
    val viaExpr = df.select(st_cellOf($"lon", $"lat", lit(12)).as("c")).collect().map(_.getLong(0))
    val viaScala = df.collect().map(r => graft.tiling.Cell.cellOf(r.getDouble(0), r.getDouble(1), 12))
    assert(viaExpr.toSeq == viaScala.toSeq)
  }
}
