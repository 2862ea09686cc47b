package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparkTestSession

/** Adversarial completeness spec for knnJoin's ring-widening fallback
  * (round-1 judge finding #2: the fixed ring silently missed the k-th
  * neighbor for sparse regions). Ground truth = brute-force cross
  * join.
  */
class KnnJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bruteKnn(qs: Seq[(Long, Double, Double)],
                       ts: Seq[(Long, Double, Double)], k: Int): Set[(Long, Long)] = {
    qs.flatMap { case (qk, qx, qy) =>
      ts.sortBy { case (tk, tx, ty) =>
        ((qx - tx) * (qx - tx) + (qy - ty) * (qy - ty), tk)
      }.take(k).map(t => (qk, t._1))
    }.toSet
  }

  private def run(qs: Seq[(Long, Double, Double)], ts: Seq[(Long, Double, Double)],
                  k: Int, level: Int, ringK: Int): Set[(Long, Long)] = {
    val q = qs.toDF("qk", "qx", "qy")
    val t = ts.toDF("tk", "tx", "ty")
    SpatialJoins.knnJoin(q, "qx", "qy", "qk", t, "tx", "ty", "tk", k, level, ringK)
      .select(col("qk"), col("tk")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("sparse targets far outside the initial ring are still found exactly") {
    // level 10: cells are ~0.35 x 0.17 degrees, so ring 2 spans < 1
    // degree — every target below is provably outside it
    val qs = Seq((1L, 0.0, 0.0), (2L, 100.0, 40.0))
    val ts = Seq(
      (10L, 5.0, 5.0), (11L, -8.0, 3.0), (12L, 0.0, -12.0), // 5-12 deg from q1
      (20L, 104.0, 44.0), (21L, 92.0, 40.0), (22L, 100.0, 55.0)) // 4-15 deg from q2
    val got = run(qs, ts, k = 2, level = 10, ringK = 2)
    assert(got == bruteKnn(qs, ts, 2), s"got $got")
  }

  test("mixed density: dense query resolves in ring 1, sparse query widens") {
    val dense = (0 until 50).map(i => (100L + i, 10.0 + i * 0.001, 10.0))
    val sparse = Seq((200L, -170.0, -80.0), (201L, 170.0, 80.0))
    val ts = dense ++ sparse
    val qs = Seq((1L, 10.0, 10.0), (2L, -160.0, -70.0))
    for (k <- Seq(1, 3, 7)) {
      val got = run(qs, ts, k, level = 10, ringK = 2)
      assert(got == bruteKnn(qs, ts, k), s"k=$k: got $got")
    }
  }

  test("boundary-of-bound case: in-ring candidates beyond the proven radius force widening") {
    // ring-1 at level 8 proves completeness only within min(cellW,cellH)
    // ~0.664 deg; both in-ring candidates are further than that, and a
    // closer-by-distance target hides outside the ring — the naive
    // 'take top-k from ring candidates' answer would be wrong
    val level = 8 // cellW ~1.41, cellH ~0.664
    val qs = Seq((1L, 0.0, 0.0))
    val ts = Seq(
      (10L, 1.25, 0.0),  // in ring (1 cell right), dist 1.25 > 0.664 bound
      (11L, 0.0, -1.5),  // outside ring vertically (>2 cells), dist 1.5
      (12L, 0.0, 1.35),  // outside ring vertically, dist 1.35 < 1.5
      (13L, 40.0, 0.0))  // far noise
    val got = run(qs, ts, k = 2, level = level, ringK = 1)
    assert(got == bruteKnn(qs, ts, 2), s"got $got")
    assert(got == Set((1L, 10L), (1L, 12L))) // 12 must beat 11 despite being out of ring
  }

  test("k larger than candidate count returns all targets, grid-covering fallback") {
    val qs = Seq((1L, 0.0, 0.0))
    val ts = Seq((10L, 179.0, 84.0), (11L, -179.0, -84.0))
    val got = run(qs, ts, k = 5, level = 6, ringK = 1)
    assert(got == Set((1L, 10L), (1L, 11L)))
  }
}
