package graft
import graft.core._
/** Per-geometry kernel scaling sweep: times the scalar kernels on
  * regular polygons / zigzag lines at n = 2^10..2^14 vertices to catch
  * superlinear growth (this harness exposed the O(n^2) arrangement
  * indexing, the snap-round hot-pixel scans, and the piece-union
  * buffer blowup). Usage: runMain graft.KernelScale
  */
object KernelScale {
  def poly(cx: Double, n: Int): Geom = {
    val coords = new Array[Double](2 * (n + 1))
    var i = 0
    while (i < n) {
      val a = math.Pi / 2 + i.toDouble / n * 2 * math.Pi
      coords(2 * i) = cx + math.cos(a); coords(2 * i + 1) = math.sin(a)
      i += 1
    }
    coords(2 * n) = coords(0); coords(2 * n + 1) = coords(1)
    GPoly(Array(new Seqn(coords, CT.XY)), CT.XY)
  }
  // zigzag line with n vertices
  def zig(n: Int): Geom = {
    val c = new Array[Double](2 * n)
    var i = 0
    while (i < n) { c(2*i) = i * 0.01; c(2*i+1) = if (i % 2 == 0) 0.0 else 1.0; i += 1 }
    GLine(Seqn.xy(c))
  }
  def time(label: String, reps: Int)(f: => Any): Double = {
    var k = 0; while (k < 2) { f; k += 1 } // warm
    val t0 = System.nanoTime()
    k = 0; while (k < reps) { f; k += 1 }
    val s = (System.nanoTime() - t0) / 1e9 / reps
    println(f"$label%-28s $s%.5f s/op")
    s
  }
  def main(args: Array[String]): Unit = {
    // global JIT warm-up at a small size so the first timed op of the
    // sweep doesn't carry interpreter/C1 cost for the whole stack
    for (_ <- 0 until 20) {
      val wp = poly(0, 256); val wl = zig(256)
      BufferOp.buffer(wp, 0.1); BufferOp.buffer(wl, 0.05)
      Relate.relate(wp, poly(0.5, 256)); Validate.isValid(wp)
      Simplicity.isSimple(wl); Intersects.distance(wp, poly(3.0, 256))
    }
    for (pow <- Seq(10, 12, 14)) {
      val n = 1 << pow
      val p = poly(0, n); val p2 = poly(0.5, n); val l = zig(n)
      val wkt = Wkt.write(p); val wkb = Wkb.write(p)
      val reps = if (pow >= 14) 3 else 5
      println(s"--- n=2^$pow")
      time(s"buffer poly", reps)(BufferOp.buffer(p, 0.1))
      time(s"buffer line", reps)(BufferOp.buffer(l, 0.05))
      time(s"relate", reps)(Relate.relate(p, p2))
      time(s"isValid", reps)(Validate.isValid(p))
      time(s"isSimple line", reps)(Simplicity.isSimple(l))
      time(s"distance", reps)(Intersects.distance(p, poly(3.0, n)))
      time(s"convexHull", reps)(Algos.convexHull(p))
      time(s"simplify", reps)(Algos.simplify(p, 0.001))
      time(s"wkt parse", reps)(Wkt.parse(wkt))
      time(s"wkt write", reps)(Wkt.write(p))
      time(s"wkb parse", reps)(Wkb.read(wkb))
      time(s"centroid", reps)(Measure.centroid(p))
      time(s"pointInAreal", reps)(Alg.pointInAreal(p, 0.1, 0.1))
      time(s"intersects", reps)(Intersects.intersects(p, p2))
    }
  }
}
