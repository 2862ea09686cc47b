package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SparkTestSession

/** KMV sketch: exact below k, estimator identity vs a scala replay of
  * the same hashes, partitioning/merge-order invariance (the buffers
  * must be a commutative monoid), duplicate-insensitivity, and
  * accuracy within the theoretical band at k=256.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def md5hash52(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(7).map(b => f"$b%02x").mkString.take(13), 16)
  }

  test("exact path: fewer than k distinct values returns the exact count") {
    val df = (1 to 1000).map(i => ("g", (i % 37).toString)).toDF("g", "v")
    for (parts <- Seq(1, 8)) {
      val got = df.repartition(parts).groupBy($"g")
        .agg(Sketch.kmvDistinct(64)(Sketch.hash52($"v")).as("e"))
        .collect().head.getDouble(1)
      assert(got === 37.0)
    }
  }

  test("estimation path matches the scala replay and is partitioning-invariant") {
    val df = (1 to 5000).map(i => ("g", s"val$i")).toDF("g", "v")
    val k = 64
    val hs = (1 to 5000).map(i => md5hash52(s"val$i")).distinct.sorted
    val expected = (k - 1).toDouble / ((hs(k - 1) + 0.5) / 4503599627370496.0)
    for (parts <- Seq(1, 3, 17)) {
      val got = df.repartition(parts).groupBy($"g")
        .agg(Sketch.kmvDistinct(k)(Sketch.hash52($"v")).as("e"))
        .collect().head.getDouble(1)
      assert(got === expected, s"parts=$parts") // bit-exact, any merge order
    }
  }

  test("duplicates do not move the estimate") {
    val base = (1 to 2000).map(i => ("g", s"x$i"))
    val dup = base ++ base ++ base.take(500)
    val a = base.toDF("g", "v").groupBy($"g")
      .agg(Sketch.kmvDistinct(64)(Sketch.hash52($"v"))).collect().head.getDouble(1)
    val b = dup.toDF("g", "v").repartition(11).groupBy($"g")
      .agg(Sketch.kmvDistinct(64)(Sketch.hash52($"v"))).collect().head.getDouble(1)
    assert(a === b)
  }

  test("k=256 estimate is within 20% of truth on 50k distinct values") {
    val n = 50000
    val df = (1 to n).map(i => ("g", s"item-$i")).toDF("g", "v")
    val got = df.groupBy($"g")
      .agg(Sketch.kmvDistinct(256)(Sketch.hash52($"v"))).collect().head.getDouble(1)
    assert(math.abs(got - n) / n < 0.20, s"estimate $got for true $n")
    // relative std err ~ 1/sqrt(k-2) ~ 6.3%; 20% is > 3 sigma
  }

  test("numeric columns hash through their canonical string form") {
    // 52-bit hash of "12345" must equal hash of the long 12345
    val a = Seq(("g", "12345")).toDF("g", "v")
      .select(Sketch.hash52($"v")).collect().head.getLong(0)
    val b = Seq(("g", 12345L)).toDF("g", "v")
      .select(Sketch.hash52($"v")).collect().head.getLong(0)
    assert(a === b && a === md5hash52("12345"))
  }

  // ---- count-min sketch --------------------------------------------

  // skewed stream: one hot key (600x), a warm key (80x), 400-key tail
  private lazy val cmsStream: Seq[String] =
    Seq.fill(600)("hot") ++ Seq.fill(80)("warm") ++
      (0 until 400).flatMap(i => Seq.fill(1 + i % 3)(s"tail-$i"))

  test("cms estimates are one-sided (est >= true count for EVERY key) and exact replay") {
    val df = cmsStream.toDF("key").repartition(9)
    val truth = cmsStream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = Sketch.cmsEstimates(df, "key", d = 4, w = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === truth.keySet)
    truth.foreach { case (k, c) => assert(est(k) >= c, s"$k: est ${est(k)} < true $c") }
    // exact grid replay: counters from the same md5 hashes
    val counters = scala.collection.mutable.Map[(Int, Long), Long]().withDefaultValue(0L)
    for (k <- cmsStream; j <- 0 until 4)
      counters((j, md5hash52(s"$j:$k") % 64)) += 1L
    val replayed = truth.keys.map { k =>
      k -> (0 until 4).map(j => counters((j, md5hash52(s"$j:$k") % 64))).min
    }.toMap
    assert(est === replayed)
  }

  test("cms heavy hitters: no true heavy hitter missed, no light key reported") {
    val df = cmsStream.toDF("key").repartition(5)
    val got = Sketch.cmsHeavyHitters(df, "key", d = 4, w = 64, threshold = 70L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    val truth = cmsStream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got.map(_._1).toSet === truth.filter(_._2 >= 70L).keySet) // = {hot, warm}
    got.foreach { case (k, est, cnt) =>
      assert(cnt === truth(k)); assert(est >= cnt)
    }
  }
}
