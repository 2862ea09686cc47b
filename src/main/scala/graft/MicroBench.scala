package graft

import graft.core._

/** Single-thread per-operation microbenchmark, replicating the
  * reference's published set-operation benchmark exactly so the
  * numbers in BASELINE.md are directly comparable:
  *
  *   - input: two regular polygons circumscribed by radius-1.0 circles
  *     centered at (0,0) and (1,0) — same construction as the
  *     reference's `regularPolygon` (internal/perf/util_test.go:11-25:
  *     angle = pi/2 + i/n * 2pi), same partial overlap as
  *     `BenchmarkSetOperation` (internal/perf/set_op_test.go:14-41)
  *   - sizes n = 2^2 .. 2^14, the rows of
  *     internal/benchmarkreport/README.md
  *   - metric: median wall time per op, single thread (Go's
  *     `testing.B` reports a mean over b.N; we report the median of
  *     many single-op samples, which is more robust to this host's
  *     multi-second VM pauses and, on quiet hardware, equals the mean
  *     for these allocation-light ops)
  *
  * Usage: runMain graft.MicroBench [maxPow] [samples]
  * Emits a markdown table on stdout plus one JSON line.
  */
object MicroBench {

  private def regularPolygon(cx: Double, cy: Double, radius: Double,
                             sides: Int): Geom = {
    val coords = new Array[Double](2 * (sides + 1))
    var i = 0
    while (i < sides) {
      val angle = math.Pi / 2 + i.toDouble / sides * 2 * math.Pi
      coords(2 * i) = cx + math.cos(angle) * radius
      coords(2 * i + 1) = cy + math.sin(angle) * radius
      i += 1
    }
    coords(2 * sides) = coords(0)
    coords(2 * sides + 1) = coords(1)
    GPoly(Array(new Seqn(coords, CT.XY)), CT.XY)
  }

  private def medianSecs(fn: () => Geom, samples: Int): Double = {
    val ts = new Array[Double](samples)
    var i = 0
    while (i < samples) {
      val t0 = System.nanoTime()
      val r = fn()
      ts(i) = (System.nanoTime() - t0) / 1e9
      if (r == null) sys.error("null result") // keep the op alive
      i += 1
    }
    java.util.Arrays.sort(ts)
    ts(samples / 2)
  }

  def main(args: Array[String]): Unit = {
    val maxPow = if (args.length > 0) args(0).toInt else 14
    val baseSamples = if (args.length > 1) args(1).toInt else 101
    val ops = Seq[(String, (Geom, Geom) => Geom)](
      "intersection" -> SetOps.intersection,
      "union" -> SetOps.union,
      "difference" -> SetOps.difference,
      "symdifference" -> SetOps.symDifference)

    // JIT warm-up on mid sizes (untimed)
    for (_ <- 0 until 300; (_, fn) <- ops)
      fn(regularPolygon(0, 0, 1.0, 64), regularPolygon(1, 0, 1.0, 64))

    println("| n | " + ops.map(_._1).mkString(" | ") + " |  (median s/op)")
    val json = new StringBuilder("{\"metric\":\"setop_median_sec\"")
    for (pow <- 2 to maxPow) {
      val n = 1 << pow
      val p1 = regularPolygon(0, 0, 1.0, n)
      val p2 = regularPolygon(1, 0, 1.0, n)
      // fewer samples for the big inputs so the whole run stays short
      val samples = math.max(11, baseSamples >> math.max(0, pow - 8))
      val row = ops.map { case (name, fn) =>
        val med = medianSecs(() => fn(p1, p2), samples)
        json.append(s""","${name}_2e$pow":$med""")
        med
      }
      println(f"| 2^$pow | " + row.map(s => f"$s%.6f").mkString(" | ") + " |")
    }
    json.append("}")
    println(json.toString)
  }
}
