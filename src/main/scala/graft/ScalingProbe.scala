package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ST
import graft.functions.ST._
import graft.operators.{Pages, SpatialJoins}

/** Ad-hoc scaling probe: times the flagship job's components at a
  * given core count / page count so the serial fraction is visible.
  * Usage: runMain graft.ScalingProbe <cores> <pages>
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nPages = args(1).toLong
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"probe-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ST.registerAll(spark)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe-$cores] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    def joinJob(): Long = {
      val pages = Pages.pages(spark, nPages)
        .select(col("page_id"), col("lon"), col("lat"))
      val regions = Pages.regions(spark).withColumn("geom", st_geomFromWKT(col("wkt")))
      SpatialJoins.broadcastPipCounts(pages, col("lon"), col("lat"),
        regions, "geom", "region_id", pred = "contains").count()
    }
    def tileJob(): Long =
      Pages.pages(spark, nPages)
        .withColumn("cell", st_cellOf(col("lon"), col("lat"), lit(12)))
        .groupBy(col("cell")).agg(count(lit(1)).as("n")).count()
    def synthOnly(): Long =
      Pages.pages(spark, nPages).select(count(lit(1))).first().getLong(0)

    // warm-up
    time("warmup-join")(joinJob()); time("warmup-tile")(tileJob())
    for (i <- 1 to 3) {
      time(s"synth-$i")(synthOnly())
      time(s"join-$i")(joinJob())
      time(s"tile-$i")(tileJob())
    }
    spark.stop()
  }
}
