package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Design for 100 TB:
  *  - exact dedup is a hash groupBy (one shuffle on a 32-byte key);
  *  - MinHash/LSH banding turns all-pairs similarity into equi-joins
  *    on (band, bandHash) — no cartesian product ever materializes;
  *  - candidate pairs are refined with the exact measure; dedup keys
  *    keep (small_id < big_id) so each pair appears once;
  *  - everything uses native Column expressions (higher-order array
  *    functions), never Python/Scala UDF rows in the hot path.
  */
object Dedup {

  /** Exact dedup: keep the smallest key per identical text. */
  def exactDedup(df: DataFrame, textCol: String, keyCol: String): DataFrame = {
    val w = Window.partitionBy(sha2(col(textCol), 256)).orderBy(col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Groups of exact duplicates (size > 1), for reporting. */
  def exactDupGroups(df: DataFrame, textCol: String, keyCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("text_hash"))
      .agg(count(lit(1)).as("n"), min(col(keyCol)).as("keep_key"))
      .filter(col("n") > 1)

  /** MinHash signature (k values) over word shingles.
    * Per-shingle base hash = crc32 (deterministic, available both in
    * Spark and DuckDB-replicable in principle); k permutations via
    * (a_i * h + b_i) mod p with fixed public constants.
    */
  def minhashSignature(text: Column, shingleN: Int, k: Int): Column = {
    val p = 4294967311L // smallest prime > 2^32
    val shingles = TextOps.wordShingles(text, shingleN)
    val hs = transform(shingles, s => crc32(to_binary(s, lit("utf-8"))))
    val sig = (0 until k).map { i =>
      val a = 1103515245L + 2L * i // odd multipliers
      val b = 12345L + 777L * i
      array_min(transform(hs, h => (h * lit(a) + lit(b)) % lit(p)))
    }
    array(sig: _*)
  }

  /** LSH candidate pairs from banded minhash signatures.
    * Returns (key_a, key_b) with key_a < key_b, deduped.
    */
  def minhashCandidates(df: DataFrame, textCol: String, keyCol: String,
                        shingleN: Int = 3, k: Int = 24, bands: Int = 8): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    // exchange barrier: the signature column feeds 8 band expressions
    // and both join sides — without a barrier Catalyst's CollapseProject
    // would inline (and re-evaluate) the whole minhash tree at every use
    // site. A repartition is a barrier that ReuseExchange dedups within
    // the plan, and unlike cache() it leaks nothing across queries.
    val withSig = df.select(col(keyCol).as("__key"),
      minhashSignature(col(textCol), shingleN, k).as("__sig"))
      .repartition(col("__key"))
    val banded = withSig.select(col("__key"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          hash(concat_ws(",",
            transform(slice(col("__sig"), b * rows + 1, lit(rows)), x => x.cast("string")))).as("bh"))))
        .as("b"))
      .select(col("__key"), col("b.band"), col("b.bh"))
    val l = banded.withColumnRenamed("__key", "key_a")
    val r = banded.withColumnRenamed("__key", "key_b")
    l.join(r, Seq("band", "bh"))
      .filter(col("key_a") < col("key_b"))
      .select("key_a", "key_b")
      .distinct()
  }

  /** MinHash near-dup pairs: LSH candidates refined by exact word-shingle
    * Jaccard >= threshold.
    */
  def minhashNearDups(df: DataFrame, textCol: String, keyCol: String,
                      threshold: Double, shingleN: Int = 3,
                      k: Int = 24, bands: Int = 8): DataFrame = {
    val cands = minhashCandidates(df, textCol, keyCol, shingleN, k, bands)
    val sh = df.select(col(keyCol).as("__k"),
      TextOps.wordShingles(col(textCol), shingleN).as("__sh"))
      .repartition(col("__k"))
    cands
      .join(sh.withColumnRenamed("__k", "key_a").withColumnRenamed("__sh", "sh_a"), "key_a")
      .join(sh.withColumnRenamed("__k", "key_b").withColumnRenamed("__sh", "sh_b"), "key_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("key_a"), col("key_b"), TextOps.floor6(col("jaccard")).as("jaccard"))
  }

  /** Exact all-pairs n-gram Jaccard over a (small) corpus via shingle
    * inverted index — the oracle-checkable ground truth for the LSH
    * path. Scales as sum over shingles of df² — fine for verification
    * corpora, not the 100 TB path.
    */
  def jaccardPairsExact(df: DataFrame, textCol: String, keyCol: String,
                        shingleN: Int, threshold: Double): DataFrame = {
    val sh = df.select(col(keyCol).as("__k"),
      TextOps.wordShingles(col(textCol), shingleN).as("__sh"))
      .repartition(col("__k"))
    val inv = sh.select(col("__k"), explode(col("__sh")).as("s"))
    val pairs = inv.as("a").join(inv.as("b"), col("a.s") === col("b.s"))
      .filter(col("a.__k") < col("b.__k"))
      .select(col("a.__k").as("key_a"), col("b.__k").as("key_b"))
      .distinct()
    pairs
      .join(sh.select(col("__k").as("key_a"), col("__sh").as("sh_a")), "key_a")
      .join(sh.select(col("__k").as("key_b"), col("__sh").as("sh_b")), "key_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("key_a"), col("key_b"), TextOps.floor6(col("jaccard")).as("jaccard"))
  }

  /** 32-bit SimHash per document as a relational plan: explode distinct
    * word tokens, crc32-hash them, take 32 per-bit majority votes in
    * ONE groupBy (a single map-side-combinable aggregation) — instead
    * of a 32-aggregate megalith expression, which blows up codegen.
    * Returns (keyCol, simhash Long).
    */
  def simhashDF(df: DataFrame, textCol: String, keyCol: String): DataFrame = {
    val toks = df.select(col(keyCol).as("__key"),
        explode(TextOps.wordShingles(col(textCol), 1)).as("__tok"))
      .withColumn("__h", crc32(to_binary(col("__tok"), lit("utf-8"))))
    val bitSums = (0 until 32).map(b =>
      sum(shiftright(col("__h"), b) % 2L).as(s"__b$b"))
    val aggs = count(lit(1)).as("__n") +: bitSums
    val counted = toks.groupBy(col("__key")).agg(aggs.head, aggs.tail: _*)
    val simCol = (0 until 32).map(b =>
      when(col(s"__b$b") * 2 >= col("__n"), lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    counted.select(col("__key"), simCol.as("__sim"))
  }

  /** SimHash near-dup pairs: block on 8-bit chunks (any equal chunk is
    * a candidate — Hamming distance <= 3 over 32 bits guarantees one of
    * the 4 chunks matches), refine with exact bit_count.
    */
  def simhashNearDups(df: DataFrame, textCol: String, keyCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val withSig = simhashDF(df, textCol, keyCol)
    val chunks = withSig.select(col("__key"), col("__sim"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("c"), (shiftright(col("__sim"), c * 8) % lit(256L)).as("chunk"))): _*))
        .as("ch"))
      .select(col("__key"), col("__sim"), col("ch.c"), col("ch.chunk"))
    val l = chunks.select(col("c"), col("chunk"), col("__key").as("key_a"), col("__sim").as("sim_a"))
    val r = chunks.select(col("c"), col("chunk"), col("__key").as("key_b"), col("__sim").as("sim_b"))
    l.join(r, Seq("c", "chunk"))
      .filter(col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding cosine near-dup pairs via coarse LSH bucketing (sign of
    * k pseudo-random hyperplanes from deterministic seed) + exact
    * cosine refine.
    */
  def embeddingNearDups(df: DataFrame, vecCol: String, keyCol: String,
                        threshold: Double, planes: Int = 8): DataFrame = {
    val sigExpr = Ann.hyperplaneSig(col(vecCol), planes)
    // barrier: sig expression is expensive (planes x dim fold) and feeds
    // both join sides
    val withSig = df.select(col(keyCol).as("__key"), col(vecCol).as("__v"), sigExpr.as("__b"))
      .repartition(col("__b"))
    val l = withSig.select(col("__b"), col("__key").as("key_a"), col("__v").as("v_a"))
    val r = withSig.select(col("__b"), col("__key").as("key_b"), col("__v").as("v_b"))
    l.join(r, "__b")
      .filter(col("key_a") < col("key_b"))
      .withColumn("cosine", Ann.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("key_a"), col("key_b"), TextOps.floor6(col("cosine")).as("cosine"))
  }
}
