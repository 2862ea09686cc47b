package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SparkTestSession

/** Snapshot diff (q147), temperature-resampled language mix (q148),
  * exact rank quantiles (q149).
  */
class MixDiffSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("snapshotDiff classifies all four statuses") {
    val oldS = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val newS = Seq((1L, 10L), (2L, 99L), (4L, 40L)).toDF("k", "v")
    val got = Temporal.snapshotDiff(oldS, newS, "k", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("temperatureSample: quotas follow sqrt weights and kept counts match") {
    // langs sized 900/100: alpha=0.5 weights 30/10 -> quotas 75%/25%
    val docs = spark.range(0, 1000).toDF("k")
      .withColumn("lang", when(col("k") < 900, lit("big")).otherwise(lit("small")))
    val out = Corpus.temperatureSample(docs, "lang", "k", budget = 200L)
    val kept = out.where(col("kept")).groupBy("lang").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // wq(big)=floor(30e6)=3e7, wq(small)=1e7; quotas 150 / 50
    assert(kept === Map("big" -> 150L, "small" -> 50L))
    // selection is by md5 order: deterministic under repartitioning
    val a = out.where(col("kept")).select("k").as[Long].collect().sorted
    val b = Corpus.temperatureSample(docs.repartition(7), "lang", "k", 200L)
      .where(col("kept")).select("k").as[Long].collect().sorted
    assert(a.sameElements(b))
  }

  test("temperatureSample upsamples rare groups (quota may exceed n)") {
    val docs = spark.range(0, 104).toDF("k")
      .withColumn("lang", when(col("k") < 100, lit("big")).otherwise(lit("rare")))
    // wq(big)=1e7, wq(rare)=2e6 -> quota(rare) = floor(120*2/12) = 20 > 4
    val out = Corpus.temperatureSample(docs, "lang", "k", budget = 120L)
    val rare = out.where(col("lang") === "rare")
    assert(rare.count() === 4L && rare.where(col("kept")).count() === 4L)
  }

  test("rankQuantiles returns the exact nearest-rank values") {
    val df = (1 to 100).map(i => ("g", i.toLong)).toDF("grp", "v")
    val out = Corpus.rankQuantiles(df, "v", "grp",
      Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)).collect().head
    assert(out.getAs[Long]("n_rows") === 100L)
    assert(out.getAs[Long]("p50") === 50L)   // ceil(0.5*100) = 50
    assert(out.getAs[Long]("p90") === 90L)
    assert(out.getAs[Long]("p99") === 99L)
    val odd = (1 to 7).map(i => ("g", i * 10L)).toDF("grp", "v")
    val o2 = Corpus.rankQuantiles(odd, "v", "grp", Seq("p50" -> 0.5)).collect().head
    assert(o2.getAs[Long]("p50") === 40L)    // ceil(3.5) = 4th of 7
  }
}
