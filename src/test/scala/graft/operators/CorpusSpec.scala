package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SparkTestSession

/** Corpus curation ops (q140-q143): contamination, inverted index,
  * PMI, paragraph dedup — hand-checked semantics + invariants.
  */
class CorpusSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("contamination flags exactly the docs sharing an n-gram") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),   // shares both 3-grams with bench doc 3
      (2L, "beta gamma delta epsilon"), // shares "beta gamma delta"
      (3L, "alpha beta gamma delta"),   // bench; identical to doc 1
      (4L, "zeta eta theta iota")).toDF("k", "text")
    val bench = corpus.filter(col("k") === 3)
    val out = Corpus.contamination(corpus, bench, "text", "k", n = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(1L -> ((1L, 2L)), 2L -> ((1L, 1L))))
  }

  test("inverted index: df/tf/rank are exact and ties break by doc") {
    val docs = Seq(
      (1L, "x x x y"),
      (2L, "x y y"),
      (3L, "y")).toDF("k", "text")
    val out = Corpus.invertedIndex(docs, "text", "k", topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(out === Set(
      ("x", 2L, 4L, 1L, 1L, 3L), ("x", 2L, 4L, 2L, 2L, 1L),
      ("y", 3L, 4L, 1L, 2L, 2L), ("y", 3L, 4L, 2L, 1L, 1L)))
  }

  test("pmi: independent vs dependent pairs, exact counts") {
    // a,b always co-occur; a,c never
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "c d")).toDF("k", "text")
    val out = Corpus.pmiPairs(docs, "text", "k", minPairCount = 1L)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    def f6(x: Double) = math.floor(x * 1e6) / 1e6
    // pmi(a,b) = ln(4*3/(3*3))
    assert(out(("a", "b")) === ((3L, f6(math.log(4.0 * 3.0 / (3.0 * 3.0))))))
    assert(out(("c", "d")) === ((1L, f6(math.log(4.0 * 1.0 / (1.0 * 1.0))))))
    assert(!out.contains(("a", "c")))
  }

  test("paragraph dedup keeps first occurrence in (doc, idx) order") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 dup dup dup dup dup dup dup dup"),
      (2L, "dup dup dup dup dup dup dup dup tail"),
      (3L, "")).toDF("k", "text")
    val out = Corpus.paragraphDedup(docs, "text", "k", chunkWords = 8)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // doc1: 2 chunks, both first occurrences (kept=2)
    // doc2: chunk "dup x8" already seen in doc1 -> dropped; "tail" kept
    assert(out(1L) === ((2L, 2L)))
    assert(out(2L) === ((2L, 1L)))
    assert(!out.contains(3L)) // empty text -> no chunks
  }

  test("vocabCoverage with empty ks builds a valid empty plan") {
    val docs = Seq("alpha beta beta").toDF("text")
    assert(Corpus.vocabCoverage(docs, "text", Seq.empty).collect().isEmpty)
  }

  test("dupSpans: cross-doc windows merge into maximal spans") {
    // docs 1 and 2 share the 5-token run "a b c d e" -> with w=3 the
    // windows abc/bcd/cde are duplicated and merge into ONE span of 5
    // tokens in each doc; the surrounding tokens are unique.
    val docs = Seq(
      (1L, "u1 u2 a b c d e u3 u4"),
      (2L, "v1 a b c d e v2 v3 v4"),
      (3L, "w1 w2 w3 w4 w5 w6 w7"),
      (4L, "x y")).toDF("k", "text") // n < w -> no windows
    val out = Corpus.dupSpans(docs, "text", "k", w = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(1L -> ((1L, 5L, 9L)), 2L -> ((1L, 5L, 9L))))
  }

  test("dupSpans: within-doc repetition marks and merges") {
    // "p q r s p q r s": pqr/qrs occur twice within the one doc; the
    // marked windows at positions 0,1,4,5 chain into one span [0,8).
    val docs = Seq((1L, "p q r s p q r s")).toDF("k", "text")
    val out = Corpus.dupSpans(docs, "text", "k", w = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(1L -> ((1L, 8L, 8L))))
  }

  test("dupSpans: disjoint duplicated runs stay separate spans") {
    // two shared 3-token runs separated by >w unique tokens -> 2 spans
    val docs = Seq(
      (1L, "a b c u1 u2 u3 u4 u5 d e f"),
      (2L, "a b c z1 z2 z3 z4 z5 d e f")).toDF("k", "text")
    val out = Corpus.dupSpans(docs, "text", "k", w = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(1L -> ((2L, 6L)), 2L -> ((2L, 6L))))
  }

  test("dupSpans is partitioning-invariant on the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("k"),
        concat(col("text"),
          when(col("k") % 7 === 0, lit(" shared banner tokens one two three" +
            " four five six seven eight nine ten eleven twelve")).otherwise(lit("")))
          .as("text"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Corpus.dupSpans(df, "text", "k", w = 12)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val a = run(docs.repartition(1))
    val b = run(docs.repartition(13, col("k")))
    assert(a.nonEmpty && a === b)
  }

  test("dupSpansCut keeps the globally-first occurrence and rebuilds the doc") {
    // doc1 (smaller key) keeps the shared run; doc2 loses it.
    val docs = Seq(
      (1L, "u1 u2 a b c d e u3"),
      (2L, "v1 a b c d e v2 v3")).toDF("k", "text")
    val out = Corpus.dupSpansCut(docs, "text", "k", w = 3)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    def m5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L) === ((8L, 0L, 8L, m5("u1 u2 a b c d e u3"))))
    assert(out(2L) === ((8L, 5L, 3L, m5("v1 v2 v3"))))
  }

  test("dupSpansCut: within-doc repeat cuts the second occurrence only") {
    // w=3 over "p q r s x p q r s": windows pqr(0) qrs(1) repeat at
    // (5)(6); cut span = [5,9) -> kept "p q r s x"
    val docs = Seq((1L, "p q r s x p q r s")).toDF("k", "text")
    val out = Corpus.dupSpansCut(docs, "text", "k", w = 3)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((9L, 4L, 5L)))
  }

  test("dupSpansCut is partitioning-invariant and conserves token counts") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("k"),
        concat(col("text"),
          when(col("k") % 7 === 0, lit(" shared banner tokens one two three" +
            " four five six seven eight nine ten eleven twelve")).otherwise(lit("")))
          .as("text"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Corpus.dupSpansCut(df, "text", "k", w = 12)
        .collect().map(r => (r.getLong(0),
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val a = run(docs.repartition(1))
    val b = run(docs.repartition(13, col("k")))
    assert(a === b)
    assert(a.values.forall { case (n, cut, kept, _) => cut + kept == n })
    assert(a.values.map(_._2).sum > 0) // the cut actually bites
    // exactly one banner occurrence survives corpus-wide: total cut =
    // (occurrences - 1) * 13 banner tokens unless merges with natural
    // dup text change span boundaries — so just check survivors: every
    // %7 doc except the globally-first loses at least the banner.
    val first = a.keys.filter(_ % 7 == 0).min
    a.foreach { case (k, (_, cut, _, _)) =>
      if (k % 7 == 0 && k != first) assert(cut >= 13L, s"doc $k cut=$cut")
    }
  }

  test("shingleNovelty: clones score 0, new text scores all, rewrites score the delta") {
    val old = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"),  // 2 distinct 8-gram shingles
      (2L, "z1 z2 z3")).toDF("k", "text")   // whole-text fallback shingle
    val neu = Seq(
      (10L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"),       // clone -> novel 0
      (11L, "n1 n2 n3 n4 n5 n6 n7 n8"),          // brand new -> all novel
      (12L, "x0 w1 w2 w3 w4 w5 w6 w7 w8 w9")     // prepend -> 2 old + 1 new
    ).toDF("k", "text")
    val out = Corpus.shingleNovelty(old, neu, "text", "k", n = 8)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      10L -> ((2L, 0L)),
      11L -> ((1L, 1L)),
      12L -> ((3L, 1L))))
  }

  test("packSequences: gapless offsets, correct spans, equals the naive global window") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("k"), col("text"))
    val got = Corpus.packSequences(docs, "text", "k", ctx = 128)
    val rows = got.collect().map(r => (r.getLong(0),
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    // gapless: sorted by offset, each start = previous start + previous n
    val byOff = rows.map(_._2).sortBy(_._2)
    assert(byOff.head._2 === 0L)
    byOff.sliding(2).foreach { case Array((n0, s0, _, _, _), (_, s1, _, _, _)) =>
      assert(s1 === s0 + n0)
    case _ => }
    // spans: seq ids match integer division, n_seqs consistent
    rows.foreach { case (_, (n, s, f, l, ns)) =>
      assert(f === s / 128 && l === (s + n - 1) / 128 && ns === l - f + 1)
    }
    // equals the naive single global window
    val naive = docs
      .select(col("k"), md5(col("k").cast("string")).as("h"),
        size(filter(split(lower(col("text")), "[^a-z0-9]+"),
          t => length(t) > 0)).cast("long").as("n"))
      .where(col("n") > 0)
      .withColumn("off", coalesce(sum(col("n")).over(
        Window.orderBy(col("h").asc, col("k").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    rows.foreach { case (k, (_, s, _, _, _)) => assert(naive(k) === s, s"doc $k") }
    // partitioning invariance
    val re = Corpus.packSequences(docs.repartition(13, col("k")), "text", "k", ctx = 128)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    rows.foreach { case (k, (_, s, _, _, _)) => assert(re(k) === s) }
  }

  test("psiDrift: local recompute, missing buckets smoothed, identical dists ~ 0") {
    val oldB = Seq(0L, 0L, 0L, 1L, 1L, 2L).toDF("bucket")
    val newB = Seq(0L, 1L, 1L, 1L, 3L, 3L).toDF("bucket") // bucket 2 gone, 3 new
    val out = Corpus.psiDrift(oldB, newB)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val nb = 4.0
    def share(n: Long, t: Long) = (n + 0.5) / (t + 0.5 * nb)
    def f6(x: Double) = math.floor(x * 1e6) / 1e6
    val counts = Map(0L -> (3L, 1L), 1L -> (2L, 3L), 2L -> (1L, 0L), 3L -> (0L, 2L))
    counts.foreach { case (b, (no, nn)) =>
      val p = share(no, 6L); val q = share(nn, 6L)
      assert(out(b) === ((no, nn, f6((p - q) * math.log(p / q)))), s"bucket $b")
    }
    // identical distributions -> every term is ~0 (exactly 0 after floor6 of 0.0)
    val same = Corpus.psiDrift(oldB, oldB)
      .collect().map(_.getDouble(3))
    assert(same.forall(_ == 0.0))
  }

  test("contamination on the corpus matches a brute-force recompute") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("k"), col("text"))
    val bench = docs.filter(col("k") % 29 === 0)
    val got = Corpus.contamination(docs, bench, "text", "k", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force via local sets
    val sh = docs.select(col("k"), TextOps.wordShingles(col("text"), 8).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    val benchIds = sh.keys.filter(_ % 29 == 0).toSeq
    val want = sh.flatMap { case (k, s) =>
      val hits = benchIds.filter(b => b != k && sh(b).exists(s.toSet))
      val shared = s.toSet.filter(g => benchIds.exists(b => b != k && sh(b).contains(g)))
      if (hits.nonEmpty) Some((k, hits.size.toLong, shared.size.toLong)) else None
    }.toSet
    assert(got === want)
  }
}
