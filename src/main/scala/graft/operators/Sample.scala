package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-proof per-key sampling / top-k — the training-data curation
  * primitive ("keep the best/first k documents per domain", "uniform
  * sample of k pages per host") at crawl scale.
  *
  * The naive plan — one window `row_number() OVER (PARTITION BY key
  * ORDER BY ord)` — shuffles EVERY row of a key to one task. At 100 TB
  * a hot domain (10^9 pages of one host) is a guaranteed straggler or
  * OOM. The classic fix is two-phase:
  *
  *   1. partial top-k per (key, salt): rows are spread over `salt`
  *      deterministic buckets, each bucket keeps its local top-k.
  *      Window sorts are bucket-local; the hot key's 10^9 rows land on
  *      `salt` tasks, not one.
  *   2. final top-k per key over the survivors — at most `salt * k`
  *      rows per key, trivially small.
  *
  * The result is EXACTLY the single-window top-k (any global top-k row
  * is top-k within its bucket), so a plain SQL window oracle can gate
  * it bit-for-bit. Ordering must be made total by the caller (append a
  * unique tiebreak column) — otherwise "top-k" is not well-defined on
  * ANY engine.
  *
  * Determinism: the salt is a hash of the tiebreak columns, not
  * `spark_partition_id()`, so a resumed/re-partitioned 100 TB run
  * replays the identical bucketing (bit-stable retries).
  */
object Sample {

  /** Exact per-key top-k by `ordering` (which MUST be total — include
    * a unique tiebreak). Returns the input columns plus `rk`
    * (1-based rank within key, LongType).
    *
    * @param salt phase-1 fan-out per key; the hot-key straggler bound
    *             is rows(hotKey)/salt. 16-64 is right for 100 TB.
    */
  def perKeyTopK(df: DataFrame, keyCols: Seq[String],
                 ordering: Seq[Column], k: Int, salt: Int = 16): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(salt >= 1, "salt must be >= 1")
    require(keyCols.nonEmpty, "need at least one key column")
    require(ordering.nonEmpty, "need a total ordering")
    require(!df.columns.contains("rk") && !df.columns.contains("__srk"),
      "perKeyTopK adds rk/__srk; rename existing columns first")
    // Column carries its sort direction; hashing needs the bare child
    // (a SortOrder node is not evaluable inside xxhash64)
    val orderExprs = ordering.map(org.apache.spark.sql.GraftBridge.sortChild)
    val bucket = pmod(xxhash64(orderExprs: _*), lit(salt.toLong))
    val w1 = Window.partitionBy(keyCols.map(col) :+ bucket: _*)
      .orderBy(ordering: _*)
    val w2 = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__srk", row_number().over(w1))
      .filter(col("__srk") <= k).drop("__srk")
      .withColumn("rk", row_number().over(w2).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Deterministic uniform sample of k rows per key: order by the md5
    * of the row's unique id. md5 is available verbatim in standard SQL
    * engines, so an oracle can replay the exact sample; and it is a
    * fixed public function, so a resumed run re-draws the same rows.
    */
  def perKeyUniform(df: DataFrame, keyCols: Seq[String],
                    idCol: String, k: Int, salt: Int = 16): DataFrame =
    perKeyTopK(df, keyCols,
      Seq(md5(col(idCol).cast("string").cast("binary")), col(idCol)),
      k, salt)

  /** Deterministic weighted sample WITHOUT replacement of k rows per
    * key — the Efraimidis–Spirtsis A-ES scheme: each row draws a
    * uniform u and keeps priority u^(1/w); the top-k priorities are
    * the sample (inclusion probability proportional to weight, the
    * "quality-weighted k docs per domain" curation op). u is derived
    * from md5(id) — 52 hash bits exactly representable in a double —
    * so a plain-SQL oracle replays the draw and a resumed run redraws
    * identically. Ordered by ln(u)/w DESC (monotone in u^(1/w),
    * avoids pow) with the id as tiebreak; weights must be > 0.
    */
  def perKeyWeighted(df: DataFrame, keyCols: Seq[String], idCol: String,
                     weightCol: String, k: Int, salt: Int = 16): DataFrame = {
    val u = (conv(substring(
        md5(col(idCol).cast("string").cast("binary")), 1, 13), 16, 10)
      .cast("double") + 0.5) / lit(4503599627370496.0) // 2^52
    perKeyTopK(df, keyCols,
      Seq((log(u) / col(weightCol)).desc, col(idCol)), k, salt)
  }
}
