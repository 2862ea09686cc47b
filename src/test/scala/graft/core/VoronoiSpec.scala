package graft.core

import org.scalatest.funsuite.AnyFunSuite

class VoronoiSpec extends AnyFunSuite {

  private val R = (-10.0, -10.0, 10.0, 10.0)

  private def diag(pts: Seq[(Double, Double)],
                   r: (Double, Double, Double, Double) = R): Voronoi.Diagram =
    Voronoi.diagram(pts.map(_._1).toArray, pts.map(_._2).toArray,
      r._1, r._2, r._3, r._4)

  private def rectArea(r: (Double, Double, Double, Double)): Double =
    (r._3 - r._1) * (r._4 - r._2)

  test("cells tile the clip rectangle (area partition, random sites)") {
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      val pts = Seq.fill(3 + rnd.nextInt(60))(
        (rnd.nextDouble() * 16 - 8, rnd.nextDouble() * 16 - 8)).distinct
      val d = diag(pts)
      assert(d.cell.length == pts.distinct.length)
      val total = d.cell.map(Measure.area(_)).sum
      assert(math.abs(total - rectArea(R)) <= 1e-6,
        s"seed=$seed: cells sum to $total, rect is ${rectArea(R)}")
      assert(d.cell.forall(Validate.isValid), s"seed=$seed: invalid cell")
    }
  }

  test("each site lies strictly inside its own cell") {
    for (seed <- 21 to 30) {
      val rnd = new scala.util.Random(seed)
      val pts = Seq.fill(3 + rnd.nextInt(40))(
        (rnd.nextDouble() * 16 - 8, rnd.nextDouble() * 16 - 8)).distinct
      val d = diag(pts)
      for (i <- d.cell.indices)
        assert(Alg.pointInAreal(d.cell(i), d.sx(i), d.sy(i)) > 0,
          s"seed=$seed: site $i not interior to its cell")
    }
  }

  test("cell membership == nearest site (random probes, tie-free)") {
    for (seed <- 31 to 40) {
      val rnd = new scala.util.Random(seed)
      val pts = Seq.fill(4 + rnd.nextInt(30))(
        (rnd.nextInt(160).toDouble / 10 - 8, rnd.nextInt(160).toDouble / 10 - 8)).distinct
      val d = diag(pts)
      for (_ <- 1 to 200) {
        val px = rnd.nextDouble() * 19.8 - 9.9
        val py = rnd.nextDouble() * 19.8 - 9.9
        val dists = d.sx.indices.map(i =>
          (d.sx(i) - px) * (d.sx(i) - px) + (d.sy(i) - py) * (d.sy(i) - py))
        val best = dists.indices.minBy(dists)
        val margin = dists.sorted.take(2) match {
          case Seq(a, b) => b - a; case _ => 1.0
        }
        if (margin > 1e-9) {
          assert(Alg.pointInAreal(d.cell(best), px, py) > 0,
            s"seed=$seed: probe ($px,$py) not in nearest site's cell")
          for (i <- d.cell.indices if i != best)
            assert(Alg.pointInAreal(d.cell(i), px, py) <= 0,
              s"seed=$seed: probe ($px,$py) also inside cell $i")
        }
      }
    }
  }

  test("degenerate inputs: one site, two sites, collinear sites") {
    val one = diag(Seq((0.0, 0.0)))
    assert(one.cell.length == 1 &&
      math.abs(Measure.area(one.cell(0)) - rectArea(R)) <= 1e-9)

    val two = diag(Seq((-5.0, 0.0), (5.0, 0.0)))
    assert(two.cell.length == 2)
    assert(two.cell.forall(c => math.abs(Measure.area(c) - rectArea(R) / 2) <= 1e-9))

    // collinear: 5 sites on y = 0 -> vertical slab cells
    val col = diag(Seq.tabulate(5)(i => (i * 2.0 - 4.0, 0.0)))
    assert(col.cell.length == 5)
    assert(math.abs(col.cell.map(Measure.area(_)).sum - rectArea(R)) <= 1e-9)
    // middle site's slab: x in [-1, 1], full height
    assert(math.abs(Measure.area(col.cell(2)) - 2 * 20) <= 1e-9)

    // duplicates dedup
    val dup = diag(Seq((1.0, 1.0), (1.0, 1.0), (-1.0, -1.0)))
    assert(dup.cell.length == 2)
  }

  test("input order independence") {
    val pts = Seq((0.0, 0.0), (3.0, 1.0), (-2.0, 4.0), (5.0, -5.0), (-6.0, -1.0))
    val a = diag(pts)
    val b = diag(new scala.util.Random(7).shuffle(pts))
    assert(a.sx.sameElements(b.sx) && a.sy.sameElements(b.sy))
    for (i <- a.cell.indices)
      assert(Wkb.write(a.cell(i)).sameElements(Wkb.write(b.cell(i))))
  }
}
