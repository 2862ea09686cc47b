package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence tests for the prepared index structures the
  * overlay/measure kernels lean on: ArealLocator vs the plain ray
  * cast, and RTree.nearestPairSearch vs the brute-force closest pair.
  * Seeded, so runs are deterministic.
  */
class IndexStructSpec extends AnyFunSuite {

  private def starPoly(rnd: scala.util.Random, cx: Double, cy: Double,
                       n: Int): GPoly = {
    val coords = new Array[Double](2 * (n + 1))
    for (i <- 0 until n) {
      val a = i.toDouble / n * 2 * math.Pi
      val r = 0.5 + rnd.nextDouble()
      coords(2 * i) = cx + r * math.cos(a)
      coords(2 * i + 1) = cy + r * math.sin(a)
    }
    coords(2 * n) = coords(0); coords(2 * n + 1) = coords(1)
    GPoly(Array(Seqn.xy(coords)), CT.XY)
  }

  test("ArealLocator matches pointInAreal on polygons, holes, and multiparts") {
    val rnd = new scala.util.Random(7)
    var checks = 0
    for (_ <- 0 until 60) {
      val g: Geom = rnd.nextInt(3) match {
        case 0 => starPoly(rnd, rnd.nextDouble() * 8 - 4, rnd.nextDouble() * 8 - 4,
          3 + rnd.nextInt(60))
        case 1 =>
          // shell with a centered hole
          val cx = rnd.nextDouble() * 8 - 4; val cy = rnd.nextDouble() * 8 - 4
          val shell = starPoly(rnd, cx, cy, 24).rings(0)
          val hn = 12
          val hole = new Array[Double](2 * (hn + 1))
          for (i <- 0 until hn) {
            val a = i.toDouble / hn * 2 * math.Pi
            hole(2 * i) = cx + 0.3 * math.cos(a)
            hole(2 * i + 1) = cy + 0.3 * math.sin(a)
          }
          hole(2 * hn) = hole(0); hole(2 * hn + 1) = hole(1)
          GPoly(Array(shell, Seqn.xy(hole)), CT.XY)
        case _ =>
          val parts = Array.fill(2 + rnd.nextInt(3))(
            starPoly(rnd, rnd.nextDouble() * 12 - 6, rnd.nextDouble() * 12 - 6,
              3 + rnd.nextInt(20)))
          GColl(parts.toArray[Geom], CT.XY)
      }
      val loc = ArealLocator.build(g)
      val e = g.envelope
      for (_ <- 0 until 400) {
        val px = e.xmin + rnd.nextDouble() * (e.xmax - e.xmin) * 1.2 - 0.1 * (e.xmax - e.xmin)
        val py = e.ymin + rnd.nextDouble() * (e.ymax - e.ymin) * 1.2 - 0.1 * (e.ymax - e.ymin)
        assert(loc.locate(px, py) == Alg.pointInAreal(g, px, py),
          s"mismatch at ($px,$py) for ${Wkt.write(g).take(120)}")
        checks += 1
      }
      // exact vertices are boundary points
      g match {
        case p: GPoly =>
          val r = p.rings(0)
          var i = 0
          while (i < r.n) {
            assert(loc.locate(r.x(i), r.y(i)) == 0)
            i += 1; checks += 1
          }
        case _ => ()
      }
    }
    info(s"locator equivalence checks: $checks")
  }

  test("nearestPairSearch finds the true closest pair of segment sets") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 40) {
      def segSet(cx: Double, cy: Double, k: Int): Array[Array[Double]] =
        Array.fill(k) {
          val x = cx + rnd.nextDouble() * 2; val y = cy + rnd.nextDouble() * 2
          Array(x, y, x + rnd.nextDouble() - 0.5, y + rnd.nextDouble() - 0.5)
        }
      val sa = segSet(0, 0, 1 + rnd.nextInt(40))
      val sb = segSet(2.5 + rnd.nextDouble() * 3, 0, 1 + rnd.nextInt(40))
      def envs(ss: Array[Array[Double]]): Array[Env] =
        ss.map(s => Env(math.min(s(0), s(2)), math.min(s(1), s(3)),
          math.max(s(0), s(2)), math.max(s(1), s(3))))
      val ta = RTree.bulkLoad(envs(sa))
      val tb = RTree.bulkLoad(envs(sb))
      var best = Double.PositiveInfinity
      ta.nearestPairSearch(tb) { (ia, ib, d2) =>
        if (math.sqrt(d2) >= best) false
        else {
          val a = sa(ia); val b = sb(ib)
          val d = Alg.distSegSeg(a(0), a(1), a(2), a(3), b(0), b(1), b(2), b(3))
          if (d < best) best = d
          true
        }
      }
      var brute = Double.PositiveInfinity
      for (a <- sa; b <- sb) {
        val d = Alg.distSegSeg(a(0), a(1), a(2), a(3), b(0), b(1), b(2), b(3))
        if (d < brute) brute = d
      }
      assert(math.abs(best - brute) <= 1e-12 * math.max(1.0, brute),
        s"trial $trial: dual-tree $best vs brute $brute")
    }
  }

  test("full-height comb polygon: bucket entries stay O(edges), locate stays exact") {
    // zigzag comb: every edge spans most of the Y extent. The round-3
    // CSR build inserted each edge into every bucket its span crossed
    // (nb = min(edges, 65536)), i.e. O(m * min(m, 65536)) entries —
    // billions for a large comb. The span-aware nb bound keeps total
    // entries <= ~4m, degrading to a plain O(m) scan per locate.
    val teeth = 20000 // 40k edges; old layout would build ~1.6e9 entries
    val coords = new Array[Double](2 * (2 * teeth + 3))
    var k = 0
    def add(x: Double, y: Double): Unit = { coords(2 * k) = x; coords(2 * k + 1) = y; k += 1 }
    for (i <- 0 until teeth) { add(i.toDouble, 0.0); add(i + 0.5, 100.0) }
    add(teeth.toDouble, 0.0); add(0.0, -1.0); add(0.0, 0.0)
    val g = GPoly(Array(Seqn.xy(coords)), CT.XY)
    val t0 = System.nanoTime()
    val loc = ArealLocator.build(g) // OOMs/stalls under the old layout
    val buildSecs = (System.nanoTime() - t0) / 1e9
    assert(buildSecs < 10.0, f"comb build took $buildSecs%.1f s — bucket blowup?")
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 200) {
      val px = rnd.nextDouble() * teeth
      val py = rnd.nextDouble() * 102.0 - 1.0
      assert(loc.locate(px, py) == Alg.pointInAreal(g, px, py), s"mismatch at ($px,$py)")
    }
  }
}
