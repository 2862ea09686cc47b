package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * - cosine / dot products via zip_with + aggregate (codegen'd higher
  *   order functions, no UDF);
  * - brute-force top-k as the exactness baseline: broadcast the query
  *   set, one scan of the corpus, per-query top-k via window;
  * - LSH-bucketed ANN as the scale path: deterministic pseudo-random
  *   hyperplanes (LCG over plane index × dimension), sign-bit bucket
  *   key, equi-join on bucket, refine + top-k. At 100 TB the bucket
  *   join replaces the full scan per query batch.
  */
object Ann {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic hyperplane weights: w(p, d) in {-1, +1} derived from
    * an LCG of (p * 8191 + d) — reproducible anywhere, incl. DuckDB.
    */
  private def planeWeight(p: Int, d: Column): Column = {
    val h = (d * lit(8191L) + lit(p.toLong * 127L) + lit(12345L)) * lit(1103515245L) % lit(2147483648L)
    when(h % 2L === 0L, lit(1.0d)).otherwise(lit(-1.0d))
  }

  /** Sign-bit signature of `planes` hyperplanes -> LongType bucket. */
  def hyperplaneSig(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, i) => v * planeWeight(p, i.cast("long"))),
        lit(0.0d), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Exact brute-force cosine top-k: every query against every corpus
    * row (broadcast the small query side), per-query window top-k.
    */
  def bruteForceTopK(queries: DataFrame, qVec: String, qKey: String,
                     corpus: DataFrame, cVec: String, cKey: String,
                     k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .withColumn("cosine", cosine(col(qVec), col(cVec)))
    val w = Window.partitionBy(col(qKey)).orderBy(col("cosine").desc, col(cKey))
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(qKey), col(cKey), TextOps.floor6(col("cosine")).as("cosine"), col("__rn").as("rank"))
  }

  /** LSH-bucketed approximate top-k: candidates share a hyperplane
    * bucket with the query (optionally also neighboring buckets by
    * flipping one bit), then exact cosine + window top-k.
    */
  def lshTopK(queries: DataFrame, qVec: String, qKey: String,
              corpus: DataFrame, cVec: String, cKey: String,
              k: Int, planes: Int = 8, probeBits: Int = 1): DataFrame = {
    val c = corpus.withColumn("__bucket", hyperplaneSig(col(cVec), planes))
      .repartition(col("__bucket"))
    val qSig = queries.withColumn("__sig", hyperplaneSig(col(qVec), planes))
    // multi-probe: original bucket plus all buckets at Hamming distance 1
    val probes =
      if (probeBits <= 0) array(col("__sig"))
      else array((col("__sig") +: (0 until planes).map(b =>
        col("__sig").bitwiseXOR(lit(1L << b)))): _*)
    val q = qSig.withColumn("__bucket", explode(probes))
    val joined = q.join(c, "__bucket")
      .withColumn("cosine", cosine(col(qVec), col(cVec)))
    val w = Window.partitionBy(col(qKey)).orderBy(col("cosine").desc, col(cKey))
    joined
      .dropDuplicates(Seq(qKey, cKey))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(qKey), col(cKey), TextOps.floor6(col("cosine")).as("cosine"), col("__rn").as("rank"))
  }
}
