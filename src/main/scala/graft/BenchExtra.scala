package graft

import org.apache.spark.sql.SparkSession

/** Extra measurement harness for the optimization rounds — NOT part of
  * the frozen driver contract (Bench.scala is the graded bench; this
  * main exists for guide-§1 style isolation work: noop-sink timing and
  * `.explain("formatted")` capture for plan-diff evidence).
  *
  * Env:
  *   SPARK_GRAFT_SF_DIR      data dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS        core count (default 32), master local[N]
  *   SPARK_GRAFT_EXTRA_ONLY  comma-separated query names (default: all)
  *   SPARK_GRAFT_EXTRA_REPS  timed noop reps per query (default 3)
  *   SPARK_GRAFT_PLAN_DIR    if set, write <dir>/<query>_<TAG>.txt
  *   SPARK_GRAFT_PLAN_TAG    plan file suffix (default "plan")
  *
  * Timing methodology: df.write.format("noop") — computes every column
  * of every row (guide §1.4), so unlike the frozen suite's count() it
  * cannot be short-circuited by column pruning. Reports min of reps.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val only = sys.env.get("SPARK_GRAFT_EXTRA_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "3").toInt
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val planTag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "plan")

    val spark = Bench.session(cpus)
    val picked = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // JIT/codegen warm-up outside the timed region
    try picked.take(1).foreach(t => noop(t._2(spark, sfDir)))
    catch { case _: Throwable => () }

    val results = picked.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      planDir.foreach { dir =>
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val p = java.nio.file.Paths.get(dir, s"${name}_$planTag.txt")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, txt)
      }
      var best = Double.MaxValue
      var r = 0
      while (r < reps) {
        val t0 = System.nanoTime()
        // a thrown rep must NOT update best: its time-to-failure would
        // masquerade as a (bogus) fast timing in the JSON line
        val ok = try { noop(fn(spark, sfDir)); true }
        catch { case e: Throwable =>
          System.err.println(s"[extra] $name FAILED: ${e.getMessage}"); false }
        if (ok) best = math.min(best, (System.nanoTime() - t0) / 1e9)
        spark.catalog.clearCache()
        r += 1
      }
      spark.sparkContext.setJobDescription(null)
      System.err.println(f"[extra] $name: $best%.3f s (min of $reps)")
      name -> best
    }
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + "%.3f".formatLocal(java.util.Locale.US, v)
    }.mkString("{", ",", "}")
    println(s"""{"metric":"extra_noop","unit":"sec","reps":$reps,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
