package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SparkTestSession

/** Product quantization (q150) and boilerplate detection (q152). */
class PqGateSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))

  test("pq codes: codebook rows quantize to themselves with zero error") {
    val out = Ann.pqCodes(emb, "vec", "vec_id", m = 4, k = 8)
    // the 8 Knuth-spread sample rows ARE the codebook: their own
    // nearest entry is themselves at distance exactly 0
    val spreadIds = emb
      .select(col("vec_id"), pmod(col("vec_id") * 2654435761L, lit(4294967296L)).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(8)
      .select("vec_id").as[Long].collect().toSet
    val zero = out.filter(col("err") === 0.0).select("vec_id").as[Long].collect().toSet
    assert(spreadIds.subsetOf(zero))
    // codes are in range and the full corpus is covered
    assert(out.count() === emb.count())
    (1 to 4).foreach { m =>
      val bad = out.filter(col(s"code_$m") < 1 || col(s"code_$m") > 8).count()
      assert(bad === 0L)
    }
  }

  test("pq codes match a local recompute on a sample") {
    val out = Ann.pqCodes(emb, "vec", "vec_id", m = 4, k = 8)
      .filter(col("vec_id") < 40)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(i => r.getLong(i)).toVector).toMap
    val all = emb.collect().map(r => (r.getLong(0),
      r.getSeq[Double](1).toArray)).toMap
    val spread = all.keys.toSeq
      .sortBy(k => (math.floorMod(k * 2654435761L, 4294967296L), k)).take(8)
    val books = spread.map(all)
    for ((id, codes) <- out) {
      val v = all(id)
      val want = (0 until 4).map { mi =>
        val sv = v.slice(mi * 16, mi * 16 + 16)
        (0 until 8).map { ki =>
          val cb = books(ki).slice(mi * 16, mi * 16 + 16)
          val d = math.sqrt(sv.zip(cb).foldLeft(0.0) { case (a, (x, c)) => a + (x - c) * (x - c) })
          (d, ki + 1L)
        }.min._2
      }.toVector
      assert(codes === want, s"vec $id")
    }
  }

  test("boilerplate flags repeated per-source chunks, not body text") {
    val docs = (1 to 30).map { i =>
      val src = if (i <= 15) "a" else "b"
      (i.toLong, src, s"w1 w2 w3 w4 w5 w6 w7 w8 body$i unique$i tail$i x$i y$i z$i p$i q$i")
    }.toDF("k", "src", "text")
    val out = Corpus.boilerplate(docs, "text", "k", "src", chunkWords = 8, maxDocFrac = 0.1)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // every doc: 2 chunks; the shared 8-word header is boilerplate
    // (15/15 docs per source), the unique body chunk is not
    assert(out.values.forall(_ == ((2L, 1L))))
  }
}
