package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch — the mergeable
  * cardinality estimator for "how many distinct urls/shingles per
  * domain" at scales where exact count-distinct shuffles every value.
  *
  * The sketch keeps the k SMALLEST distinct hash values of the input.
  * If fewer than k distinct hashes exist the count is exact; otherwise
  * the k-th smallest normalized hash u_(k) estimates the cardinality
  * as (k-1)/u_(k) (the classic KMV/bottom-k estimator; relative error
  * ~ 1/sqrt(k-2)). The buffer is a CONSTANT-SIZE sorted long array, so
  * partial aggregation combines map-side and the shuffle carries at
  * most k longs per (group, task) — the whole point at 100 TB.
  *
  * Unlike HLL-based approx_count_distinct, every step here is
  * deterministic over a PUBLIC hash (52 bits of md5, exactly
  * representable in a double), so a plain-SQL oracle replays the
  * estimate bit-for-bit: dedup hashes, rank, take the k-th, same
  * arithmetic. Hash collisions fold two values into one — by design
  * the oracle replays that too (it ranks the same hashes).
  */
object Sketch {

  /** 52 md5 bits of a column's string form as a non-negative long —
    * the hash both the sketch and its SQL oracle rank. Null inputs
    * stay null (and are skipped by the aggregate).
    */
  def hash52(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 13), 16, 10)
      .cast("long")

  private final val TwoTo52 = 4503599627370496.0

  /** `kmvDistinct(k)(hash52(col))` — aggregate Column estimating the
    * distinct count of the hashed input. Exact (as a double) below k
    * distinct values.
    */
  def kmvDistinct(k: Int)(hashCol: Column): Column = {
    require(k >= 2, "k must be >= 2")
    udaf(new KmvDistinctAgg(k), Encoders.scalaLong).apply(hashCol)
  }

  /** Buffer layout: little-endian longs, sorted ascending, distinct,
    * length <= k. Packing per row keeps the Aggregator contract simple
    * (binary buffers encode for free); k is small so the copies are
    * bounded and allocation-local.
    */
  final class KmvDistinctAgg(k: Int)
      extends Aggregator[Long, Array[Byte], Double] {

    private def unpack(b: Array[Byte]): Array[Long] = {
      val out = new Array[Long](b.length / 8)
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .asLongBuffer().get(out)
      out
    }
    private def pack(a: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(a.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.asLongBuffer().put(a)
      bb.array()
    }

    def zero: Array[Byte] = Array.emptyByteArray

    def reduce(buf: Array[Byte], h: Long): Array[Byte] = {
      val a = unpack(buf)
      val i = java.util.Arrays.binarySearch(a, h)
      if (i >= 0) buf // already present
      else {
        val at = -i - 1
        if (a.length < k) {
          val out = new Array[Long](a.length + 1)
          System.arraycopy(a, 0, out, 0, at)
          out(at) = h
          System.arraycopy(a, at, out, at + 1, a.length - at)
          pack(out)
        } else if (at < k) { // displaces the current maximum
          val out = new Array[Long](k)
          System.arraycopy(a, 0, out, 0, at)
          out(at) = h
          System.arraycopy(a, at, out, at + 1, k - at - 1)
          pack(out)
        } else buf
      }
    }

    def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
      val a = unpack(b1); val b = unpack(b2)
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val take =
          if (i >= a.length) { val v = b(j); j += 1; v }
          else if (j >= b.length) { val v = a(i); i += 1; v }
          else if (a(i) < b(j)) { val v = a(i); i += 1; v }
          else if (a(i) > b(j)) { val v = b(j); j += 1; v }
          else { val v = a(i); i += 1; j += 1; v } // shared hash, once
        out(n) = take; n += 1
      }
      pack(if (n == out.length) out else java.util.Arrays.copyOf(out, n))
    }

    def finish(buf: Array[Byte]): Double = {
      val a = unpack(buf)
      if (a.length < k) a.length.toDouble
      else (k - 1).toDouble / ((a(k - 1) + 0.5) / TwoTo52)
    }

    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Count-min sketch counter table: d independent hash rows of w
    * buckets each. The entire sketch is d*w rows REGARDLESS of how
    * many distinct keys stream through — the point at crawl scale,
    * where the key universe (urls/hosts) dwarfs memory but the counter
    * grid stays broadcastable. Purely relational: explode each input
    * row into its d (row, bucket) cells and hash-aggregate, so partial
    * counts combine map-side and the shuffle carries at most d*w rows
    * per task.
    *
    * Hash j of key x = 52 md5 bits of "j:x" mod w — public,
    * deterministic, replayed verbatim by the SQL oracle.
    */
  def cmsCounters(df: DataFrame, keyCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 2, "need d >= 1 rows and w >= 2 buckets")
    df.select(explode(array((0 until d).map(lit): _*)).as("j"), col(keyCol).as("__k"))
      .select(col("j"),
        pmod(hash52(concat(col("j"), lit(":"), col("__k"))), lit(w.toLong)).as("bucket"))
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** CMS point estimate for each distinct key: min over the d rows of
    * the key's bucket counter. One-sided by construction — est >= true
    * count, with overshoot only from bucket collisions.
    */
  def cmsEstimates(df: DataFrame, keyCol: String, d: Int, w: Int): DataFrame = {
    val counters = cmsCounters(df, keyCol, d, w)
    df.select(col(keyCol).as("key")).distinct()
      .select(col("key"), explode(array((0 until d).map(lit): _*)).as("j"))
      .withColumn("bucket",
        pmod(hash52(concat(col("j"), lit(":"), col("key"))), lit(w.toLong)))
      .join(broadcast(counters), Seq("j", "bucket"))
      .groupBy(col("key")).agg(min(col("cnt")).as("est"))
  }

  /** Heavy hitters by CMS-candidate + exact-verify — the two-pass
    * scale pattern: pass 1 builds the constant-size counter grid and
    * screens candidates (est >= threshold never misses a true heavy
    * hitter, by one-sidedness); pass 2 computes EXACT counts only for
    * the few surviving candidates via a broadcast semi-join, so the
    * full-fidelity aggregation never touches the cold tail of the key
    * universe. Output: (key, est, cnt) for keys with cnt >= threshold.
    */
  def cmsHeavyHitters(df: DataFrame, keyCol: String, d: Int, w: Int,
                      threshold: Long): DataFrame = {
    val cands = cmsEstimates(df, keyCol, d, w)
      .filter(col("est") >= threshold)
      // EAGER checkpoint: cands feeds BOTH the exact-count semi-join's
      // broadcast and the final join — unmaterialized, the whole
      // scan -> grid -> min -> screen pipeline is computed twice (the
      // plan showed the full subtree duplicated). The survivor set is
      // threshold-screened and so candidate-sized by design — the
      // materialization is trivially small at any corpus scale.
      .localCheckpoint()
    val exact = df.join(broadcast(cands.select(col("key").as(keyCol))), keyCol)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .select(col(keyCol).as("key"), col("cnt"))
    cands.join(exact, "key")
      .filter(col("cnt") >= threshold)
      .select(col("key"), col("est"), col("cnt"))
  }
}
