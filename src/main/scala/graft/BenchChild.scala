package graft

import scala.sys.process._

/** One forked benchmark "executor": a JVM whose thread pools (GC,
  * netty, codegen) are sized for exactly `cores` cpus via
  * -XX:ActiveProcessorCount, with heap proportional to cores — the
  * shape a real Spark executor has. Runs the flagship job on both
  * layouts (untimed warm-up first, the fork starts with a cold JIT)
  * and prints one `SAMPLE <layout> <secs>` line per timed run.
  */
object BenchChild {

  /** Fork a child at `cores`, return (randomSecs, clusteredSecs).
    * `onSample` fires as each timed sample line arrives from the
    * child, so the parent can fold partial results into its
    * incremental JSON — an external kill mid-child then still leaves
    * every completed sample on record.
    */
  def fork(cores: Int, innerReps: Int, pathR: String,
           pathC: String, pathWarm: String,
           onSample: (String, Double) => Unit = (_, _) => ()): (Seq[Double], Seq[Double]) = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    // pass through module opens + -D props from this JVM; drop heap
    // and processor-count flags (the child sets its own)
    val inherited = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports") ||
        (a.startsWith("-D") && !a.startsWith("-Dspark.ui")))
    // 2.5 GB/core (realistic executor sizing): at 1.5 GB/core the
    // 2-core child's level-12 random-layout aggregation ran at the edge
    // of GC pressure, amplifying host noise bursts into 3-4x sample
    // swings
    val heapG = math.max(5, (cores * 2.5).toInt)
    // AlwaysPreTouch: the child's heap must be FULLY resident before
    // the cache warm below — lazy heap growth during the first runs
    // creates the allocation pressure that evicts the just-warmed
    // table pages (the guest reclaims clean page cache first)
    val cmd = Seq(javaBin, "-cp", cp, s"-Xmx${heapG}g", s"-Xms${heapG}g",
      "-XX:+AlwaysPreTouch",
      s"-XX:ActiveProcessorCount=$cores", "-Dspark.ui.enabled=false") ++
      inherited ++
      Seq("graft.BenchChild", cores.toString, innerReps.toString, pathR, pathC, pathWarm)
    val out = new StringBuilder
    val code = Process(cmd).!(ProcessLogger(
      line => {
        out.append(line).append('\n')
        if (line.startsWith("SAMPLE ")) {
          val a = line.split(" ")
          try onSample(a(1), a(2).toDouble)
          catch { case _: Exception => () }
        }
        ()
      },
      line => System.err.println(s"[child-$cores] $line")))
    require(code == 0, s"bench child (cores=$cores) exited $code")
    val samples = out.toString.linesIterator
      .filter(_.startsWith("SAMPLE "))
      .map(_.split(" "))
      .map(a => (a(1), a(2).toDouble)).toSeq
    (samples.collect { case ("random", s) => s },
      samples.collect { case ("clustered", s) => s })
  }

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val innerReps = args(1).toInt
    val pathR = args(2)
    val pathC = args(3)
    val pathWarm = args(4)
    val spark = Bench.session(cores)
    // cold JIT in this fork: untimed warm-up on the SMALL (2M-row)
    // table. The flagship's plan/codegen is identical regardless of
    // layout or size, and the per-row kernels see millions of
    // iterations, so C2 compiles everything hot — at a fraction of the
    // wall cost of round 2's two full-size untimed passes (which is
    // what blew the driver's bench budget).
    Bench.flagship(spark, pathWarm)
    Bench.flagship(spark, pathWarm)
    // cache-warm the exact column-pruned pages the flagship scans
    // (page_id/lon/lat), untimed, IMMEDIATELY before the timed reps:
    // this sandbox's guest page cache is reclaimed between the parent's
    // prep warm and the child's first sample (balloon/LRU), and a cold
    // read of this virtio disk runs at ~25 MB/s with ~90% sys time —
    // observed as a systematic ~10x inflation of each child's FIRST
    // clustered sample (235/269 s vs 22/24 s for the second). A real
    // executor streams from distributed storage at NIC bandwidth; that
    // cold-IO pathology does not belong inside the timed window.
    import org.apache.spark.sql.functions.sum
    for (p <- Seq(pathR, pathC)) {
      val t0 = System.nanoTime()
      spark.read.parquet(p).agg(sum("page_id"), sum("lon"), sum("lat")).collect()
      System.err.println(f"[warm] $p ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    for (_ <- 1 to innerReps) {
      for ((layout, path) <- Seq("random" -> pathR, "clustered" -> pathC)) {
        val t0 = System.nanoTime()
        Bench.flagship(spark, path)
        println(f"SAMPLE $layout ${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
