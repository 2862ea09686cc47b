package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial robustness spec for the overlay snap-tolerance ladder
  * (reference: operation_overlayng_overlay_ng_robust.go:5-34 — no
  * single noding tolerance survives arbitrary dirty data, which is why
  * the reference escalates float -> snapping -> wider snapping ->
  * snap-rounding).
  *
  * Hostile inputs: pinwheels of long thin wedges whose edges all pass
  * within ~1e-13 relative of a common point at large coordinate scale,
  * plus sliver stacks perturbed below the base snap tolerance. Each
  * trial unions two such fans; correctness is judged by the same
  * area-sanity + validity gate the ladder itself uses.
  */
class NodingLadderSpec extends AnyFunSuite {

  // deterministic LCG so trials are reproducible
  private var seed = 0x9E3779B97F4A7C15L
  private def nextDouble(): Double = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    ((seed >>> 11).toDouble / (1L << 53).toDouble)
  }

  /** A fan of `n` thin wedges around (cx,cy) with outer radius r and
    * per-coordinate jitter of magnitude `jit` (absolute).
    */
  private def pinwheel(cx: Double, cy: Double, r: Double, n: Int,
                       phase: Double, halfWidth: Double, jit: Double): Geom = {
    val polys = (0 until n).map { i =>
      val a = phase + 2 * math.Pi * i / n
      def j() = (nextDouble() - 0.5) * 2 * jit
      val x1 = cx + r * math.cos(a - halfWidth) + j()
      val y1 = cy + r * math.sin(a - halfWidth) + j()
      val x2 = cx + r * math.cos(a + halfWidth) + j()
      val y2 = cy + r * math.sin(a + halfWidth) + j()
      val ax = cx + j(); val ay = cy + j()
      GPoly(Array(Seqn.of(ax, ay, x1, y1, x2, y2, ax, ay)), CT.XY)
    }
    GMPoly(polys.map(_.rings).toArray, CT.XY)
  }

  private def trials(n: Int): Seq[(Geom, Geom)] = (0 until n).map { t =>
    val scale = 1e7
    val cx = scale * (0.5 + nextDouble())
    val cy = scale * (0.5 + nextDouble())
    val jit = scale * 1e-13 * (1 + 9 * nextDouble()) // 1e-13..1e-12 relative
    val a = pinwheel(cx, cy, scale / 100, 12, 0.0, 1e-4, jit)
    val b = pinwheel(cx, cy, scale / 100, 12, 1e-5 + 0.26 * nextDouble(), 1e-4, jit)
    (a, b)
  }

  test("escalation ladder survives hostile near-degenerate unions the base rung fails") {
    var baseFailures = 0
    var ladderFailures = 0
    val ts = trials(60)
    for ((a, b) <- ts) {
      if (SetOps.unionSingleRung(a, b, Noder.BaseEpsFactor).isEmpty)
        baseFailures += 1
      try {
        val r = SetOps.union(a, b)
        val aA = Measure.area(a); val aB = Measure.area(b)
        val rA = Measure.area(r)
        val tol = 1e-6 * math.max(aA, aB)
        if (!(rA >= math.max(aA, aB) - tol && rA <= aA + aB + tol))
          ladderFailures += 1
      } catch { case _: Exception => ladderFailures += 1 }
    }
    info(s"base-rung failures: $baseFailures/${ts.length}; ladder failures: $ladderFailures")
    assert(ladderFailures == 0,
      s"ladder failed $ladderFailures/${ts.length} hostile unions")
    assert(baseFailures > 0,
      "generator no longer breaks the base rung — tighten it so the ladder stays evidenced")
  }

  test("sliver stacks perturbed below snap tolerance stay sane through the ladder") {
    // 40 nearly-identical tall slivers, vertices jittered at 1e-14
    // relative: unions must stay within area sanity and validity
    val scale = 1e8
    def sliver(k: Int): Geom = {
      def j() = (nextDouble() - 0.5) * scale * 1e-14
      val x = scale + k * scale * 1e-15
      GPoly(Array(Seqn.of(
        x + j(), 0 + j(), x + scale * 1e-9 + j(), 0 + j(),
        x + scale * 1e-9 + j(), scale + j(), x + j(), scale + j(),
        x + j(), 0 + j())), CT.XY)
    }
    val gs = (0 until 40).map(sliver)
    val u = SetOps.unionMany(gs)
    assert(!u.isEmpty && u.dimension == 2)
    val maxA = gs.map(Measure.area).max
    val sumA = gs.map(Measure.area).sum
    val uA = Measure.area(u)
    // snapping budget: eps x total boundary length (slivers have huge
    // perimeter-to-area ratio, so a fixed relative tol is wrong)
    val tol = 4 * (1e-12 * scale) * (2 * scale + 2e-9 * scale) * gs.length
    assert(uA >= maxA - tol && uA <= sumA + tol, s"area=$uA max=$maxA sum=$sumA tol=$tol")
    assert(Validate.isValid(u))
  }
}
