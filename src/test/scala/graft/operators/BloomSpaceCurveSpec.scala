package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SparkTestSession

/** Bloom blocklist anti-join (q137) and Hilbert index (q138). */
class BloomSpaceCurveSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("bloom filter has zero false negatives and a sane FP rate") {
    val keys = Array.tabulate(20000)(i => Bloom.mix64(i.toLong * 7919L))
    val f = Bloom.build(keys)
    assert(keys.forall(f.contains), "false negative!")
    val probes = Array.tabulate(100000)(i => Bloom.mix64(0xabcdef123L + i))
    val inserted = keys.toSet
    val fp = probes.count(p => !inserted.contains(p) && f.contains(p))
    assert(fp < 1000, s"false-positive rate too high: $fp / 100000") // ~0.1% expected
  }

  test("bloom antiJoin equals the exact anti-join, incl. null keys") {
    val corpus = spark.range(0, 5000).toDF("id")
      .withColumn("key", when(col("id") % 97 === 0, lit(null))
        .otherwise(col("id") * 31L % 2048L))
    val block = spark.range(0, 400).select((col("id") * 7L % 2048L).as("bk"))
    val got = Bloom.antiJoin(spark, corpus, col("key"), block, col("bk"))
      .select("id").as[Long].collect().sorted
    val want = corpus.join(block, col("key") === col("bk"), "left_anti")
      .select("id").as[Long].collect().sorted
    assert(got === want)
    assert(want.nonEmpty && want.length < 5000) // the join actually bites
  }

  test("hilbert xy2d round-trips d2xy and walks unit steps") {
    val order = 6
    val n = 1 << order
    // bijection + round-trip
    val ds = for (x <- 0 until n; y <- 0 until n) yield SpaceCurve.xy2d(order, x, y)
    assert(ds.toSet.size === n * n)
    assert(ds.min === 0L && ds.max === (n * n - 1).toLong)
    for (d <- 0L until (n * n).toLong) {
      val (x, y) = SpaceCurve.d2xy(order, d)
      assert(SpaceCurve.xy2d(order, x, y) === d)
    }
    // locality: consecutive d-values are 4-adjacent cells — the
    // property Z-order lacks and the reason Hilbert wins as a sort key
    var prev = SpaceCurve.d2xy(order, 0L)
    for (d <- 1L until (n * n).toLong) {
      val cur = SpaceCurve.d2xy(order, d)
      assert(math.abs(cur._1 - prev._1) + math.abs(cur._2 - prev._2) === 1L,
        s"non-unit step at d=$d")
      prev = cur
    }
  }

  test("hilbert column expression matches the scalar walk and keeps nulls") {
    val df = spark.range(0, 4096).toDF("k")
      .withColumn("x", col("k") % 64L)
      .withColumn("y", col("k") * 31L % 64L)
      .withColumn("hd", SpaceCurve.hilbertIndex(col("x"), col("y"), 6))
    df.collect().foreach { r =>
      assert(r.getLong(3) === SpaceCurve.xy2d(6, r.getLong(1), r.getLong(2)))
    }
    val withNull = spark.range(0, 4).toDF("k")
      .withColumn("x", when(col("k") === 2, lit(null)).otherwise(col("k")))
      .withColumn("hd", SpaceCurve.hilbertIndex(col("x").cast("long"), col("k"), 4))
    assert(withNull.where(col("hd").isNull).count() === 1L)
  }

  test("geohash column matches the canonical halving encoder") {
    // seeded pseudo-random points plus known published cells
    val pts = (0 until 5000).map { i =>
      val lon = ((i * 7919L % 36000L) - 18000L) / 100.0 + (i % 7) * 1e-4
      val lat = ((i * 104729L % 18000L) - 9000L) / 100.0 + (i % 5) * 1e-4
      (i.toLong, lon, lat)
    }
    val df = pts.toDF("k", "lon", "lat")
      .withColumn("gh", SpaceCurve.geohash(col("lon"), col("lat"), 7))
    df.collect().foreach { r =>
      val want = SpaceCurve.geohashClassic(r.getDouble(1), r.getDouble(2), 7)
      assert(r.getString(3) === want, s"at ${(r.getDouble(1), r.getDouble(2))}")
    }
    // published reference cell: (lat 57.64911, lon 10.40744) -> u4pruyd
    val ref = Seq((10.40744, 57.64911)).toDF("lon", "lat")
      .select(SpaceCurve.geohash(col("lon"), col("lat"), 7)).head.getString(0)
    assert(ref === "u4pruyd")
  }

  test("geohash prefixes nest: char k+1 refines the parent cell") {
    for (p <- 1 to 6) {
      val full = SpaceCurve.geohashClassic(-73.9857, 40.7484, 7) // midtown NYC
      val b = SpaceCurve.geohashBounds(full.take(p))
      val bNext = SpaceCurve.geohashBounds(full.take(p + 1))
      assert(bNext._1 >= b._1 && bNext._2 <= b._2 &&
        bNext._3 >= b._3 && bNext._4 <= b._4)
      assert(-73.9857 >= b._1 && -73.9857 < b._2)
      assert(40.7484 >= b._3 && 40.7484 < b._4)
    }
  }

  test("geohash cover is complete: a contained point's cell is always in the cover") {
    val rows = (0 until 400).map { i =>
      val x0 = ((i * 37) % 300).toDouble - 170.0
      val y0 = ((i * 53) % 140).toDouble - 80.0
      val x1 = x0 + 0.3 + (i % 11) * 1.7 // sub-cell through multi-cell widths
      val y1 = y0 + 0.2 + (i % 7) * 1.3
      val px = x0 + (x1 - x0) * ((i % 13) / 12.0) // incl. both edges
      val py = y0 + (y1 - y0) * ((i % 5) / 4.0)
      (i.toLong, x0, y0, x1, y1, px, py)
    }
    val df = rows.toDF("k", "x0", "y0", "x1", "y1", "px", "py")
      .withColumn("cover", SpaceCurve.geohashCoverBox(
        col("x0"), col("y0"), col("x1"), col("y1"), 4))
      .withColumn("gh", SpaceCurve.geohash(col("px"), col("py"), 4))
      .withColumn("ok", array_contains(col("cover"), col("gh")))
    assert(df.where(!col("ok")).count() === 0L)
    // covers are duplicate-free (one row per (box, point) pair in joins)
    val dup = df.where(size(col("cover")) =!= size(array_distinct(col("cover")))).count()
    assert(dup === 0L)
  }

  test("geohash boundary points take the upper cell, matching the walk") {
    // exact cell-edge coordinates (dyadic after the +off/span fold)
    val edges = Seq((-135.0, 0.0), (0.0, 45.0), (45.0, -45.0), (180.0 - 1e-9, 90.0 - 1e-9))
    edges.zipWithIndex.foreach { case ((lon, lat), i) =>
      val got = Seq((lon, lat)).toDF("lon", "lat")
        .select(SpaceCurve.geohash(col("lon"), col("lat"), 6)).head.getString(0)
      assert(got === SpaceCurve.geohashClassic(lon, lat, 6), s"edge case $i")
    }
  }
}
