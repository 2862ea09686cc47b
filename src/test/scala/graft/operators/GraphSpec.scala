package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SparkTestSession

/** Integer PageRank vs an in-test replay of the same arithmetic:
  * bit-identical ranks (the operator's whole claim is exactness), hub
  * dominance, dangling-node base rank, partitioning invariance.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val S = 1000000000000L

  private def replay(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    val n = nodes.size
    val deg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val base = 15L * (S / n) / 100L
    var r = nodes.map(_ -> S / n).toMap
    for (_ <- 1 to iters) {
      val inc = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(p => r(p._1) / deg(p._1)).sum
      }
      r = nodes.map(v => v -> (base + 85L * inc.getOrElse(v, 0L) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(String, String)], iters: Int, parts: Int): Map[String, Long] =
    Graph.pageRankInt(edges.toDF("a", "b").repartition(parts), "a", "b", iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  // star into "hub" + a chain + a dangling sink + dupes/self-loops
  private val g: Seq[(String, String)] = Seq(
    "a" -> "hub", "b" -> "hub", "c" -> "hub", "d" -> "hub",
    "hub" -> "x", "x" -> "y", "y" -> "a",
    "a" -> "sink", // sink has no out-edges: dangling
    "a" -> "hub", "b" -> "b" // dup + self-loop, must be ignored
  )

  test("bit-identical to the integer replay") {
    val got = run(g, 4, 7)
    assert(got === replay(g, 4))
  }

  test("hub out-ranks its spokes; dangling sink holds only damped flow") {
    val got = run(g, 4, 3)
    assert(got("hub") > got("b") && got("hub") > got("c"))
    assert(got("sink") > 0L)
  }

  test("partitioning-invariant") {
    assert(run(g, 3, 1) === run(g, 3, 13))
  }
}
