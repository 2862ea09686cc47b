package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SparkTestSession
import graft.functions.ST._

/** DBSCAN invariants vs an in-test brute-force reference:
  *  - identical (id, cluster, is_core) rows on a corpus engineered to
  *    contain every point class: dense all-core blobs, a long chain
  *    (forces >1 min-label propagation round), border points hanging
  *    off a core at < eps, and isolated noise (absent from output).
  *  - cluster ids are canonical (min member core id), so the result
  *    is independent of partitioning: 1-partition and 13-partition
  *    runs are row-identical.
  */
class ClusterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val eps = 1.0
  private val minPts = 3

  // (id, x, y) — blob A (4 pts, pairwise <= eps), chain B of 7 pts
  // spaced 0.9 apart (each interior point has 2 neighbors + self = 3:
  // core; endpoints have 1 + self = 2: border), border point C at 0.8
  // above a blob-A point, noise D far away, and a 2-point pair E
  // (each 1 neighbor + self < minPts, no core neighbor: noise).
  private val ptsSeq: Seq[(Long, Double, Double)] = Seq(
    (1L, 0.0, 0.0), (2L, 0.5, 0.0), (3L, 0.0, 0.5), (4L, 0.5, 0.5), // blob A
    (10L, 20.0, 0.0), (11L, 20.9, 0.0), (12L, 21.8, 0.0), (13L, 22.7, 0.0), // chain B
    (14L, 23.6, 0.0), (15L, 24.5, 0.0), (16L, 25.4, 0.0),
    (20L, 0.0, 1.4), // C: within eps of (3) only -> border of A
    (30L, 50.0, 50.0), // D: noise
    (40L, -30.0, -30.0), (41L, -30.5, -30.0) // E: subcritical pair -> noise
  )

  private def bruteForce(pts: Seq[(Long, Double, Double)]): Set[(Long, Long, Boolean)] = {
    def near(a: (Long, Double, Double), b: (Long, Double, Double)) =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3) <= eps * eps
    val nbrs = pts.map(p => p._1 -> pts.filter(near(p, _)).map(_._1).toSet).toMap
    val cores = pts.map(_._1).filter(id => nbrs(id).size >= minPts).toSet
    // connected components of the core-core graph by fixpoint min-label
    var lbl = cores.map(id => id -> id).toMap
    var changed = true
    while (changed) {
      changed = false
      for (c <- cores; n <- nbrs(c) if cores(n) && lbl(n) < lbl(c)) {
        lbl += c -> lbl(n); changed = true
      }
    }
    val coreRows = cores.map(id => (id, lbl(id), true))
    val borderRows = pts.map(_._1).filterNot(cores).flatMap { id =>
      val coreNbrs = nbrs(id).filter(cores)
      if (coreNbrs.isEmpty) None else Some((id, coreNbrs.map(lbl).min, false))
    }
    coreRows ++ borderRows.toSet
  }

  private def run(numParts: Int): Set[(Long, Long, Boolean)] = {
    val df = spark.createDataFrame(ptsSeq).toDF("id", "x", "y")
      .repartition(numParts)
      .select($"id", st_point($"x", $"y").as("pt"))
    Cluster.dbscan(df, "id", "pt", eps, minPts, level = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
  }

  test("dbscan matches brute force: cores, chain propagation, borders, noise") {
    val expected = bruteForce(ptsSeq)
    // sanity on the corpus itself: all three classes are present
    assert(expected.exists(_._3), "corpus must contain core points")
    assert(expected.exists(!_._3), "corpus must contain border points")
    assert(!expected.exists(_._1 == 30L), "corpus must contain noise")
    assert(!expected.exists(_._1 == 40L) && !expected.exists(_._1 == 41L),
      "subcritical pair must be noise")
    // the chain must have collapsed to ONE cluster (min core id 11,
    // reached only after multiple propagation rounds) with its border
    // endpoints 10 and 16 attached to the same label
    assert(expected.filter(t => t._1 >= 10L && t._1 <= 16L).map(_._2) == Set(11L))
    assert(expected.contains((10L, 11L, false)) && expected.contains((16L, 11L, false)))
    assert(run(1) === expected)
  }

  test("dbscan is partitioning-invariant (canonical min-core labels)") {
    assert(run(13) === run(1))
  }
}
