package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SparkTestSession

/** Alternating large-star/small-star connected components vs an
  * in-test union-find reference:
  *  - exact (id -> min component id) map on a random multigraph with
  *    duplicate edges, both orientations, and self-loops;
  *  - a 512-node path collapses within 16 rounds (naive min-label
  *    propagation would need 511 — this asserts the O(log n) claim,
  *    not just correctness);
  *  - partitioning invariance (canonical min-id labels).
  */
class CcSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      if (a != b) { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    }
    // only nodes incident to a non-loop edge appear, like the operator
    val nodes = edges.filter(e => e._1 != e._2).flatMap(e => Seq(e._1, e._2)).distinct
    // min id per component
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  private def run(edges: Seq[(Long, Long)], parts: Int, maxRounds: Int = 50): Map[Long, Long] =
    Cluster.connectedComponents(
        edges.toDF("a", "b").repartition(parts), "a", "b", maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches union-find on a random multigraph (dupes, reversals, self-loops)") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(600)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong)) ++
      Seq((5L, 5L), (7L, 3L), (3L, 7L), (3L, 7L)) // self-loop + dup + reverse
    assert(run(edges, 7) === unionFind(edges))
  }

  test("512-node path converges in <= 16 alternating rounds (O(log n))") {
    val edges = (0L until 511L).map(i => (i, i + 1))
    val got = run(edges, 5, maxRounds = 16) // require(converged) throws if not
    assert(got === (0L to 511L).map(_ -> 0L).toMap)
  }

  test("partitioning-invariant") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(200)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
    assert(run(edges, 1) === run(edges, 13))
  }

  test("two-node and star components") {
    val edges = Seq((9L, 2L), (100L, 40L), (100L, 41L), (100L, 42L))
    assert(run(edges, 3) === Map(9L -> 2L, 2L -> 2L,
      100L -> 40L, 40L -> 40L, 41L -> 40L, 42L -> 40L))
  }
}
