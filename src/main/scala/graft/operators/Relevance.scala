package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.RowKernelCodegen

/** Corpus-relative relevance / quality scoring for training-data
  * pipelines: BM25 term relevance and a character-bigram language
  * model. Both are pure Column/DataFrame plans (no UDFs):
  *
  *  - BM25's corpus statistics (N, avgdl, per-term document frequency)
  *    are ONE tiny global aggregation whose single row is broadcast
  *    back over the scan — at 100 TB that is one map-side-combined
  *    pass plus a metadata-sized join, and the per-doc scoring stays
  *    inside whole-stage codegen.
  *  - The bigram LM trains on the corpus itself (27^2-row model, always
  *    broadcast) and scores each document by mean log-probability. The
  *    per-bigram log-probs are quantized to fixed-point BIGINTs before
  *    the per-document sum so the aggregation is an EXACT integer sum —
  *    invariant under partitioning/shuffle order, unlike a naive
  *    floating sum, and bit-replayable by the DuckDB oracle.
  */
object Relevance {

  /** Lowercased alphanumeric word tokens (empty strings dropped). */
  private def toks(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** BM25 scores for a fixed set of query terms.
    *
    * Output: keyCol, dl (token count), tf_<term>..., bm25 (floor6).
    * Formula (Robertson/Sparck-Jones, the Lucene variant):
    *   idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    *   s(d,t)  = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b*dl/avgdl))
    * with avgdl = sum(dl)/N computed as an exact integer ratio.
    *
    * Scale shape: one groupBy-less global agg (partial-aggregated
    * map-side, 1 output row) + a broadcast of that row + a codegen'd
    * projection. No per-term shuffle; terms are a compile-time list.
    */
  def bm25(docs: DataFrame, textCol: String, keyCol: String,
           terms: Seq[String], k1: Double = 1.25, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms == terms.distinct, "terms must be distinct")
    val tk = toks(col(textCol))
    def tfOf(term: String): Column =
      size(filter(tk, t => t === lit(term))).cast("long")
    val base = docs.select(
      col(keyCol) +: size(tk).cast("long").as("dl") +:
        terms.map(t => tfOf(t).as(s"tf_$t")): _*)
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl") +:
        terms.map(t => sum((col(s"tf_$t") > 0).cast("long")).as(s"df_$t")): _*)
    val j = base.crossJoin(broadcast(stats))
    val nD = col("n_docs").cast("double")
    val avgdl = col("sum_dl").cast("double") / nD
    val score = terms.map { t =>
      val tf = col(s"tf_$t").cast("double")
      val df = col(s"df_$t").cast("double")
      val idf = log(lit(1.0) + (nD - df + lit(0.5)) / (df + lit(0.5)))
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    }.reduceLeft(_ + _)
    j.select(
      col(keyCol) +: col("dl") +:
        terms.map(t => col(s"tf_$t")) :+
        TextOps.floor6(score).as("bm25"): _*)
  }

  /** Character-bigram Laplace-smoothed language model, trained on the
    * corpus and used to score every document by mean log-probability.
    *
    * Normalization: lower, collapse non-[a-z] runs to single spaces,
    * trim — alphabet is exactly {a..z, space} so V = 27.
    *   P(c2|c1) = (count(c1 c2) + 1) / (count(c1 *) + 27)
    *   lpq(bigram) = floor(ln(P) * 1e6)        (fixed-point BIGINT)
    *   score(d) = (Σ_b n_d(b) * lpq(b)) / (Σ_b n_d(b)) / 1e6
    *
    * Output: keyCol, lm_num (BIGINT Σ n·lpq), lm_den (BIGINT Σ n),
    * lm_score (floor6 of the single final division). Docs whose
    * normalized text is shorter than 2 chars are dropped (no bigrams).
    *
    * Scale shape: BOTH aggregations have tiny key cardinality — the
    * model groupBy has ≤729 keys (27²) and the scoring groupBy has one
    * key per document — so map-side partial aggregation collapses the
    * exploded bigram stream inside each task and the shuffles carry
    * only (keys × partitions) rows. (The first cut pre-aggregated
    * per-(doc, bigram) counts — a |docs|·|distinct bigrams per doc|
    * key space whose partial-agg hash maps spill past ~10^7 rows and
    * went superlinear on the LlmScale ladder; Σ n_d(b)·lpq(b) is the
    * same exact integer as the per-occurrence sum, so that
    * aggregation was pure overhead.) The model is a ≤729-row
    * broadcast; per-key sums are exact integers, so the result is
    * invariant under any partitioning — the property that lets the
    * DuckDB oracle replay it bit-for-bit.
    */
  def bigramLmScore(docs: DataFrame, textCol: String, keyCol: String): DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), "[^a-z]+", " "))
    val bigrams = transform(
      sequence(lit(1), length(norm) - 1),
      i => norm.substr(i, lit(2)))
    val bg = docs
      .select(col(keyCol), explode(bigrams).as("bg"))
      .where(length(col("bg")) === 2)
    val model = bg.groupBy(col("bg")).agg(count(lit(1)).as("cb"))
    val ctx = model.groupBy(substring(col("bg"), 1, 1).as("p"))
      .agg(sum(col("cb")).as("cp"))
    // the quantized log-prob table is at most 27^2 = 729 rows: collect
    // it into a flat array (dimension-sized driver collect, same
    // contract as every broadcast-build side) and score each document
    // in ONE kernel pass over the normalized string — no explode, no
    // join, no shuffle on the scoring side. (The explode+broadcast-join
    // form pushed 2 passes x |total chars| rows through codegen'd
    // string slicing and was the whole suite's slowest query at sf0.1.)
    val lpqArr = new Array[Long](27 * 27)
    model
      .join(broadcast(ctx), substring(col("bg"), 1, 1) === col("p"))
      .select(col("bg"),
        floor(log((col("cb").cast("double") + lit(1.0)) /
                  (col("cp").cast("double") + lit(27.0))) * lit(1000000.0))
          .cast("long").as("lpq"))
      .collect()
      .foreach { r =>
        val s = r.getString(0)
        lpqArr(BigramLmNumDen.charIdx(s.charAt(0)) * 27 +
          BigramLmNumDen.charIdx(s.charAt(1))) = r.getLong(1)
      }
    val nd = GraftBridge.column(
      BigramLmNumDen(GraftBridge.expression(norm), lpqArr))
    docs.select(col(keyCol), nd.as("__nd"))
      .select(col(keyCol), col("__nd")("num").as("lm_num"),
        col("__nd")("den").as("lm_den"))
      .where(col("lm_den") > 0L)
      .select(col(keyCol), col("lm_num"), col("lm_den"),
        TextOps.floor6(col("lm_num").cast("double") / col("lm_den").cast("double") /
          lit(1000000.0)).as("lm_score"))
  }
}

object BigramLmNumDen {
  /** Alphabet index over the normalized charset {a..z, space}. */
  def charIdx(c: Char): Int = if (c == ' ') 26 else c - 'a'
}

/** normalized text -> struct(num = Σ lpq(bigram), den = #bigrams),
  * a single allocation-light pass over the string bytes (the input is
  * [a-z ]-only ASCII by construction). Exact integer sums — identical
  * to the explode+join form under any partitioning.
  */
case class BigramLmNumDen(child: Expression, lpq: Array[Long])
    extends UnaryExpression with RowKernelCodegen {
  require(lpq.length == 27 * 27, "lpq must be a 27x27 table")
  override def dataType: DataType = StructType(Seq(
    StructField("num", LongType, nullable = false),
    StructField("den", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bigram_lm_numden"
  override def genEval(vs: Array[Any]): Any = {
    if (vs(0) == null) return null
    val bytes = vs(0).asInstanceOf[UTF8String].getBytes
    var num = 0L
    var den = 0L
    var i = 0
    while (i + 1 < bytes.length) {
      val a = BigramLmNumDen.charIdx(bytes(i).toChar)
      val b = BigramLmNumDen.charIdx(bytes(i + 1).toChar)
      num += lpq(a * 27 + b)
      den += 1L
      i += 1
    }
    InternalRow(num, den)
  }
  override protected def withNewChildInternal(c: Expression): BigramLmNumDen =
    copy(child = c)
}
