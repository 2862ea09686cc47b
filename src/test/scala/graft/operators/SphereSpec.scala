package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SparkTestSession

/** Spherical measures (q173-q174): haversine against known distances
  * and a local recompute; the cover-join against brute force.
  */
class SphereSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def localHav(lon1: Double, lat1: Double,
                       lon2: Double, lat2: Double): Double = {
    val d = 0.017453292519943295
    val p1 = lat1 * d; val p2 = lat2 * d
    val sd = math.sin((p2 - p1) * 0.5)
    val sl = math.sin(((lon2 - lon1) * d) * 0.5)
    val a = sd * sd + ((math.cos(p1) * math.cos(p2)) * sl) * sl
    2.0 * Sphere.EarthRadiusM * math.asin(math.sqrt(a))
  }

  test("haversine matches known city distances and the scalar recompute") {
    // Paris (2.3522, 48.8566) <-> London (-0.1276, 51.5072): ~343.5 km
    val cases = Seq(
      (2.3522, 48.8566, -0.1276, 51.5072, 343.5e3, 2e3),
      (0.0, 0.0, 1.0, 0.0, 111.195e3, 0.2e3),  // 1 deg lon at equator
      (10.0, 89.0, -170.0, 89.0, 222.39e3, 0.5e3), // over the pole
      (5.0, 5.0, 5.0, 5.0, 0.0, 1e-9))
    val df = cases.map(c => (c._1, c._2, c._3, c._4)).toDF("a", "b", "c", "d")
      .withColumn("dist", Sphere.haversineM(col("a"), col("b"), col("c"), col("d")))
    df.collect().zip(cases).foreach { case (r, (lo1, la1, lo2, la2, want, tol)) =>
      val got = r.getDouble(4)
      assert(math.abs(got - want) <= tol, s"$got vs $want")
      assert(got === localHav(lo1, la1, lo2, la2)) // bit-exact vs scalar
    }
  }

  test("dwithinSphereJoin equals the brute-force haversine join") {
    val pts = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .withColumn("cx", (col("c_custkey") * 7919L % 23040L).cast("double") / 64.0 - 180.0)
      .withColumn("cy", (col("c_custkey") * 104729L % 10880L).cast("double") / 64.0 - 85.0)
      .select(col("c_custkey"), col("cx"), col("cy"))
    val sites = Seq((1L, 2.3125, 48.86), (2L, -170.0, 68.0), (3L, 100.5, -67.9))
      .toDF("site", "slon", "slat")
    val r = 750000.0
    val got = Sphere.dwithinSphereJoin(sites, "slon", "slat",
      pts, "cx", "cy", radiusM = r, precision = 2)
      .select(col("site"), col("c_custkey"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = sites.crossJoin(pts)
      .withColumn("d", Sphere.haversineM(col("slon"), col("slat"), col("cx"), col("cy")))
      .where(col("d") <= r)
      .select(col("site"), col("c_custkey"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === want && want.nonEmpty)
  }
}
