package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SparkTestSession

/** BM25 + char-bigram LM scoring: the plan-shape and semantics the
  * q136/q139 oracles gate, checked here against tiny hand-computed
  * corpora plus partitioning-invariance (the fixed-point trick's whole
  * point).
  */
class RelevanceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("bm25 matches a hand-computed score on a 3-doc corpus") {
    val docs = Seq(
      (1L, "spark join spark"),
      (2L, "window hash window window"),
      (3L, "plain words only")).toDF("k", "text")
    val out = Relevance.bm25(docs, "text", "k", Seq("spark", "window"))
      .orderBy("k").collect()

    // N=3, dl = (3,4,3), avgdl = 10/3; df_spark=1, df_window=1
    val n = 3.0; val avgdl = 10.0 / 3.0
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def s(tf: Double, df: Double, dl: Double) =
      idf(df) * tf * 2.25 / (tf + 1.25 * (0.25 + 0.75 * dl / avgdl))
    def f6(x: Double) = math.floor(x * 1e6) / 1e6

    assert(out(0).getAs[Long]("tf_spark") === 2L)
    assert(out(0).getAs[Double]("bm25") === f6(s(2, 1, 3) + s(0, 1, 3)))
    assert(out(1).getAs[Double]("bm25") === f6(s(0, 1, 4) + s(3, 1, 4)))
    assert(out(2).getAs[Double]("bm25") === 0.0)
  }

  test("bm25 tokenization: case-folded, alnum runs, empties dropped") {
    val docs = Seq((1L, "SPARK!! spark-join 42spark"), (2L, "")).toDF("k", "text")
    val out = Relevance.bm25(docs, "text", "k", Seq("spark", "join"))
      .orderBy("k").collect()
    // tokens: [spark, spark, join, 42spark] -> tf_spark=2, tf_join=1, dl=4
    assert(out(0).getAs[Long]("dl") === 4L)
    assert(out(0).getAs[Long]("tf_spark") === 2L)
    assert(out(0).getAs[Long]("tf_join") === 1L)
    assert(out(1).getAs[Long]("dl") === 0L)
    assert(out(1).getAs[Double]("bm25") === 0.0)
  }

  test("tfidfKeywords: hand-checked scores, ubiquitous terms rank last, ties by token") {
    val docs = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana cherry common"),
      (3L, "cherry cherry common")).toDF("k", "text")
    val out = Relevance.tfidfKeywords(docs, "text", "k", topK = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    def wq(tf: Long, df: Long) = tf * math.floor(math.log(3.0 / df) * 1e6).toLong
    // doc 1: apple tf2 df1 beats banana tf1 df2; "common" (df3, idf 0) last
    assert(out((1L, 1L)) === (("apple", 2L, 1L, wq(2, 1))))
    assert(out((1L, 2L)) === (("banana", 1L, 2L, wq(1, 2))))
    // doc 2: banana and cherry tie exactly (tf1, df2) -> token asc order
    assert(out((2L, 1L)) === (("banana", 1L, 2L, wq(1, 2))))
    assert(out((2L, 2L)) === (("cherry", 1L, 2L, wq(1, 2))))
    // doc 3: cherry tf2; then common with wq = 0 (ln(3/3) = 0)
    assert(out((3L, 1L)) === (("cherry", 2L, 2L, wq(2, 2))))
    assert(out((3L, 2L)) === (("common", 1L, 3L, 0L)))
  }

  test("bigram LM: hand-checked counts and exact-integer scoring") {
    // corpus "abab" + "ba": bigrams ab,ba,ab | ba
    // counts: ab=2, ba=2; ctx a*=2, b*=2
    val docs = Seq((1L, "abab"), (2L, "ba")).toDF("k", "text")
    val out = Relevance.bigramLmScore(docs, "text", "k").orderBy("k").collect()
    val lpAb = math.floor(math.log(3.0 / 29.0) * 1e6).toLong // (2+1)/(2+27)
    val lpBa = lpAb // same counts
    assert(out(0).getAs[Long]("lm_num") === 2 * lpAb + lpBa)
    assert(out(0).getAs[Long]("lm_den") === 3L)
    assert(out(1).getAs[Long]("lm_num") === lpBa)
    assert(out(1).getAs[Long]("lm_den") === 1L)
    val expect = math.floor((2 * lpAb + lpBa).toDouble / 3.0 / 1e6 * 1e6) / 1e6
    assert(out(0).getAs[Double]("lm_score") === expect)
  }

  test("bigram LM drops sub-bigram docs and is partitioning-invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("k"), col("text"))
    val a = Relevance.bigramLmScore(docs, "text", "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Relevance.bigramLmScore(docs.repartition(17, col("k")), "text", "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
    val short = Seq((1L, "x"), (2L, ""), (3L, "  ")).toDF("k", "text")
    assert(Relevance.bigramLmScore(short, "text", "k").count() === 0L)
  }
}
