package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
    val lpq = model
      .join(broadcast(ctx), substring(col("bg"), 1, 1) === col("p"))
      .select(col("bg"),
        floor(log((col("cb").cast("double") + lit(1.0)) /
                  (col("cp").cast("double") + lit(27.0))) * lit(1000000.0))
          .cast("long").as("lpq"))
    bg.join(broadcast(lpq), "bg")
      .groupBy(col(keyCol))
      .agg(sum(col("lpq")).as("lm_num"), count(lit(1)).as("lm_den"))
      .select(col(keyCol), col("lm_num"), col("lm_den"),
        TextOps.floor6(col("lm_num").cast("double") / col("lm_den").cast("double") /
          lit(1000000.0)).as("lm_score"))
  }
}
