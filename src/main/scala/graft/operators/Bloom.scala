package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType}

import org.apache.spark.sql.GraftBridge
import graft.functions.RowKernelCodegen

/** Broadcast Bloom-filter blocklist pre-filter + exact anti-join.
  *
  * The 100-TB shape: a blocklist (spam hashes, opt-out fingerprints,
  * benchmark-contamination keys) can be orders of magnitude past the
  * broadcast-hash-relation budget (10^9 keys ~ 16+ GB as a hash map)
  * while its Bloom bitset at ~16 bits/key (~2 GB) still broadcasts.
  * The bitset test is a codegen'd expression inside the scan's
  * WholeStageCodegen span; rows it rejects are DEFINITE negatives and
  * bypass the join entirely, so only the "maybe" sliver (true hits +
  * ~0.1% false positives) reaches the exact left_anti refine — which
  * Catalyst/AQE then plans as broadcast or shuffle depending on the
  * blocklist's actual size. Net: the corpus is never shuffled; the
  * pruned columnar scan runs once per branch (two cheap scans replace
  * one 100-TB shuffle). The result is exactly
  * `corpus ANTI JOIN blocklist` — the Bloom can only err toward doing
  * a little extra exact work, never toward a wrong row.
  */
object Bloom {

  /** splitmix64 finalizer — a public-domain mixer (Steele et al.,
    * "Fast Splittable Pseudorandom Number Generators", OOPSLA'14).
    */
  private[operators] def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  final case class Filter(bits: Array[Long], numHashes: Int) {
    val nBits: Long = bits.length.toLong * 64L
    def contains(key: Long): Boolean = {
      val h1 = mix64(key)
      val h2 = mix64(key + 0x632be59bd9b4e019L) | 1L
      var i = 0
      while (i < numHashes) {
        val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, nBits)
        if ((bits((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L) return false
        i += 1
      }
      true
    }
  }

  /** Build a filter over the given keys at ~16 bits/key (k=5 hashes
    * => ~1e-3 false-positive rate). Deterministic: same keys, same
    * bits, regardless of order.
    */
  def build(keys: Array[Long], bitsPerKey: Int = 16, numHashes: Int = 5): Filter = {
    val nBits = math.max(64L, java.lang.Long.highestOneBit(
      math.max(1L, keys.length.toLong * bitsPerKey) * 2 - 1))
    val bits = new Array[Long]((nBits >>> 6).toInt)
    keys.foreach { key =>
      val h1 = mix64(key)
      val h2 = mix64(key + 0x632be59bd9b4e019L) | 1L
      var i = 0
      while (i < numHashes) {
        val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, nBits)
        bits((pos >>> 6).toInt) |= 1L << (pos & 63L)
        i += 1
      }
    }
    Filter(bits, numHashes)
  }

  /** `mightContain(bloom, key)` as a codegen'd expression over a
    * broadcast filter (the bitset ships once per executor, not once
    * per task closure).
    */
  def mightContain(bc: Broadcast[Filter], key: Column): Column =
    GraftBridge.column(BloomMightContain(GraftBridge.expression(key), bc))

  /** Exact `corpus ANTI JOIN blocklist` with the Bloom pre-filter:
    * definite-negatives bypass the join entirely; suspects take the
    * broadcast left_anti refine. `blocklist` must be the small side
    * (it is collected to build the bitset — same contract as every
    * broadcast-build side in this library).
    */
  def antiJoin(spark: SparkSession, corpus: DataFrame, key: Column,
               blocklist: DataFrame, blockKey: Column): DataFrame = {
    import spark.implicits._
    val keys = blocklist.select(blockKey.cast("long").as("bk")).distinct()
    val bc = spark.sparkContext.broadcast(build(keys.as[Long].collect()))
    val tagged = corpus.withColumn("__bloom_hit", mightContain(bc, key.cast("long")))
    val clean = tagged.filter(!col("__bloom_hit")).drop("__bloom_hit")
    val suspects = tagged.filter(col("__bloom_hit")).drop("__bloom_hit")
      .join(broadcast(keys), key.cast("long") === col("bk"), "left_anti")
    clean.unionAll(suspects)
  }
}

/** key BIGINT -> bitset membership (k double-hashed probes). Null keys
  * are never "contained" (they cannot match a blocklist row in the
  * refine join either, so nulls survive the anti-join — SQL NOT EXISTS
  * semantics).
  */
case class BloomMightContain(child: Expression, bc: Broadcast[Bloom.Filter])
    extends UnaryExpression with RowKernelCodegen {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_might_contain"
  @transient private lazy val filter = bc.value
  override def genEval(vs: Array[Any]): Any =
    if (vs(0) == null) java.lang.Boolean.FALSE
    else java.lang.Boolean.valueOf(filter.contains(vs(0).asInstanceOf[Long]))
  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}
