package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SparkTestSession

/** Two-phase salted per-key top-k must be bit-identical to the
  * single-window textbook plan, on a corpus with one extreme hot key
  * (90% of all rows) plus many small keys — the skew shape the
  * operator exists for. Also: determinism across partitionings, k
  * larger than a key's row count, and the salted phase actually
  * fanning out (salt > 1 exercised with keys far larger than salt*k).
  */
class SampleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // 10_000 rows: key "hot" gets 9_000, keys s0..s19 share 1_000.
  // val column is a deterministic pseudo-random payload with ties, so
  // the doc_id tiebreak is load-bearing.
  private def corpus(parts: Int) = {
    val rows = (1 to 10000).map { i =>
      val key = if (i <= 9000) "hot" else s"s${i % 20}"
      (i.toLong, key, (i * 37 % 101).toDouble, s"pay$i")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts))
      .toDF("id", "key", "v", "payload")
  }

  private def brute(k: Int) = {
    val w = Window.partitionBy($"key").orderBy($"v", $"id")
    corpus(1).withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
      .collect().map(r => (r.getString(1), r.getLong(4), r.getLong(0))).toSet
  }

  test("salted top-k equals single-window top-k on a 90%-hot-key corpus") {
    for (salt <- Seq(1, 4, 16); parts <- Seq(1, 13)) {
      val got = Sample.perKeyTopK(corpus(parts), Seq("key"),
          Seq(col("v"), col("id")), k = 5, salt = salt)
        .collect().map(r => (r.getString(1), r.getLong(4), r.getLong(0))).toSet
      assert(got === brute(5), s"salt=$salt parts=$parts")
    }
  }

  test("k exceeding a key's cardinality returns all its rows, ranked") {
    val small = Seq((1L, "a", 3.0), (2L, "a", 1.0), (3L, "b", 2.0))
      .toDF("id", "key", "v")
    val got = Sample.perKeyTopK(small, Seq("key"), Seq(col("v"), col("id")),
        k = 10, salt = 4)
      .collect().map(r => (r.getString(1), r.getLong(3), r.getLong(0))).toSet
    assert(got === Set(("a", 1L, 2L), ("a", 2L, 1L), ("b", 1L, 3L)))
  }

  test("perKeyUniform draws the md5-ordered sample and is partitioning-stable") {
    val a = Sample.perKeyUniform(corpus(3), Seq("key"), "id", k = 3, salt = 8)
      .collect().map(r => (r.getString(1), r.getLong(4), r.getLong(0))).toSet
    val b = Sample.perKeyUniform(corpus(17), Seq("key"), "id", k = 3, salt = 2)
      .collect().map(r => (r.getString(1), r.getLong(4), r.getLong(0))).toSet
    assert(a === b)
    // replay the draw in-test: md5-of-id-string order, id tiebreak
    val w = Window.partitionBy($"key")
      .orderBy(md5($"id".cast("string").cast("binary")), $"id")
    val exp = corpus(1).withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3)
      .collect().map(r => (r.getString(1), r.getLong(4), r.getLong(0))).toSet
    assert(a === exp)
  }

  test("descending and multi-column orderings survive the salt-hash path") {
    val got = Sample.perKeyTopK(corpus(7), Seq("key"),
        Seq(col("v").desc, col("id").asc), k = 4, salt = 8)
      .collect().map(r => (r.getString(1), r.getLong(4), r.getLong(0))).toSet
    val w = Window.partitionBy($"key").orderBy($"v".desc, $"id".asc)
    val exp = corpus(1).withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 4)
      .collect().map(r => (r.getString(1), r.getLong(4), r.getLong(0))).toSet
    assert(got === exp)
  }

  test("perKeyWeighted replays the A-ES priority and tilts toward weight") {
    // weights: id 1..10000 -> w = 1 for even ids, 1000 for ids % 100 == 1
    val wdf = corpus(9).withColumn("w",
      when($"id" % 100 === 1, 1000.0).otherwise(1.0))
    val got = Sample.perKeyWeighted(wdf, Seq("key"), "id", "w", k = 6, salt = 4)
      .collect().map(r => (r.getString(1), r.getLong(5), r.getLong(0))).toSet
    // brute-force replay of the identical priority in-test
    val u = (conv(substring(md5($"id".cast("string").cast("binary")), 1, 13),
      16, 10).cast("double") + 0.5) / lit(4503599627370496.0)
    val w = Window.partitionBy($"key").orderBy((log(u) / $"w").desc, $"id")
    val exp = wdf.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 6)
      .collect().map(r => (r.getString(1), r.getLong(5), r.getLong(0))).toSet
    assert(got === exp)
    // the hot key has 90 weight-1000 rows among 9000: with k=6 they
    // should dominate the sample (each is ~1000x likelier than a
    // weight-1 row); all 6 sampled hot-key ids being %100==1 has
    // probability ~(1 - 8910/(8910+90*1000))^6 ~ 0.56 per draw — too
    // flaky to assert all, so assert the MAJORITY are heavy, which
    // fails only if weighting is broken (P < 1e-4 under uniform).
    val hotHeavy = got.filter(_._1 == "hot").count(_._3 % 100 == 1)
    assert(hotHeavy >= 4, s"expected weighted tilt, got $hotHeavy/6 heavy")
  }

  test("rejects reserved output columns and degenerate params") {
    val df = Seq((1L, "a")).toDF("rk", "key")
    intercept[IllegalArgumentException] {
      Sample.perKeyTopK(df, Seq("key"), Seq(col("rk")), 1)
    }
    intercept[IllegalArgumentException] {
      Sample.perKeyTopK(corpus(1), Seq("key"), Seq(col("v")), 0)
    }
    intercept[IllegalArgumentException] {
      Sample.perKeyTopK(corpus(1), Seq("key"), Seq.empty, 1)
    }
  }
}
