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

  /** LSH candidate pairs from banded minhash signatures — ONE native
    * pass per row computes shingles -> k min-hashes -> band keys
    * ([[graft.functions.TextMinhashBandKeys]]); candidates are an
    * equi-join on the band key (hash-partitioned on the full key, so
    * no fixed parallelism ceiling). Returns (key_a, key_b) with
    * key_a < key_b, deduped.
    */
  def minhashCandidates(df: DataFrame, textCol: String, keyCol: String,
                        shingleN: Int = 3, k: Int = 24, bands: Int = 8): DataFrame = {
    val banded = df.select(col(keyCol).as("__key"),
      explode(graft.functions.ST.minhash_bandKeys(col(textCol), shingleN, k, bands))
        .as("__bk"))
    val l = banded.withColumnRenamed("__key", "key_a")
    val r = banded.withColumnRenamed("__key", "key_b")
    l.join(r, Seq("__bk"))
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

  /** Exact all-pairs n-gram Jaccard via a PREFIX-FILTERED similarity
    * join (SSJoin, Chaudhuri et al. ICDE'06; All-Pairs, Bayardo et al.
    * WWW'07): under any global token order, J(A,B) >= t implies A and
    * B share a token inside each side's first |X| - ceil(t*|X|) + 1
    * tokens — so only those PREFIX tokens are indexed, and the
    * quadratic blowup runs over prefix document frequencies, not full
    * ones. The global order is rare-first (df asc), which pushes the
    * highest-df tokens out of every prefix: the former full
    * inverted-index self-join scaled as sum over ALL shingles of df²
    * and was the one documented quadratic in the suite. Candidates
    * also pass the size filter (t*|A| <= |B| <= |A|/t) before the
    * exact array-intersect refine, and the refine recomputes the same
    * integer |intersection| / (|A|+|B|-|inter|) arithmetic as before,
    * so the output (and the DuckDB oracle) is bit-identical.
    *
    * Scale shape at 10^12 rows: two linear shuffles (df count, per-doc
    * prefix window), a prefix-token equi-join whose skew is capped by
    * the rare-first order, and two hash joins keyed on doc id to
    * attach the full shingle arrays of the (few) candidates.
    */
  def jaccardPairsExact(df: DataFrame, textCol: String, keyCol: String,
                        shingleN: Int, threshold: Double): DataFrame = {
    // wordShingles is array_distinct'd: arrays are sets
    val sh = df.select(col(keyCol).as("__k"),
      TextOps.wordShingles(col(textCol), shingleN).as("__sh")).persist()
    try {
      val inv = sh.select(col("__k"), size(col("__sh")).as("__n"),
        explode(col("__sh")).as("s"))
      val dfreq = inv.groupBy(col("s")).agg(count(lit(1)).as("__df"))
      // required overlap for J >= t is ceil(t*|A|) in EXACT arithmetic;
      // the 1e-9 slack only ever rounds the requirement down (prefix
      // one longer), never up — fp noise can add candidates, not drop
      // pairs
      def prefixLen(n: Column): Column =
        n - ceil(n * threshold - 1e-9).cast("int") + 1
      val wDoc = Window.partitionBy(col("__k")).orderBy(col("__df"), col("s"))
      val prefix = inv.join(dfreq, "s")
        .withColumn("__rn", row_number().over(wDoc))
        .filter(col("__rn") <= prefixLen(col("__n")))
        .select(col("__k"), col("__n"), col("s"))
        .persist()
      val eps = 1e-9
      val cand = prefix.as("a")
        .join(prefix.as("b"), col("a.s") === col("b.s") && col("a.__k") < col("b.__k")
          && col("b.__n") >= col("a.__n") * threshold - eps
          && col("a.__n") >= col("b.__n") * threshold - eps)
        .select(col("a.__k").as("key_a"), col("b.__k").as("key_b"))
        .distinct()
      val out = cand
        .join(sh.as("A"), col("key_a") === col("A.__k"))
        .join(sh.as("B"), col("key_b") === col("B.__k"))
        .withColumn("__c", size(array_intersect(col("A.__sh"), col("B.__sh"))))
        .withColumn("jaccard", col("__c").cast("double") /
          (size(col("A.__sh")) + size(col("B.__sh")) - col("__c")).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select(col("key_a"), col("key_b"), TextOps.floor6(col("jaccard")).as("jaccard"))
        .localCheckpoint() // eager: safe to drop the cached inputs below
      prefix.unpersist()
      out
    } finally sh.unpersist()
  }

  /** 60-bit SimHash per document — one native scalar expression per row
    * ([[graft.functions.StSimhash60]]; md5 token hashes, so the DuckDB
    * oracle recomputes the value exactly in SQL). No shuffle at all:
    * the signature is a per-row map-side scalar.
    * Returns (keyCol, simhash Long).
    */
  def simhashDF(df: DataFrame, textCol: String, keyCol: String): DataFrame =
    df.select(col(keyCol).as("__key"),
      graft.functions.ST.simhash60(col(textCol)).as("__sim"))

  /** SimHash near-dup pairs: block on 15-bit chunks (pigeonhole — any
    * pair at Hamming distance <= 3 over 60 bits has at least one of its
    * 4 chunks exactly equal, so blocking is EXHAUSTIVE, not
    * probabilistic), refine with exact bit_count. 15-bit chunks give
    * 32 768 block values (round 1 used 8-bit chunks of a 32-bit hash:
    * 256 values, O(N^2/256) candidate pairs at corpus scale).
    */
  def simhashNearDups(df: DataFrame, textCol: String, keyCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val withSig = simhashDF(df, textCol, keyCol)
    val chunks = withSig.select(col("__key"), col("__sim"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("c"),
          (shiftright(col("__sim"), c * 15) % lit(32768L)).as("chunk"))): _*))
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

  /** Embedding cosine near-dup pairs via banded hyperplane LSH
    * ([[graft.functions.VecBandKeys]]: 32 planes in 4 bands of 8 bits
    * by default) + exact cosine refine ([[graft.functions.VecCosine]]).
    *
    * A pair is a candidate iff at least one full band of sign bits
    * matches; at cosine >= 0.9999 the per-band match probability is
    * ~0.965, so the 4-band miss rate is ~1.6e-6 (and exact duplicates
    * can never miss — identical vectors have identical signatures).
    * The join is an equi-join on the band key: spurious candidates are
    * N^2/2^8 per band at the default — raise planes (rowsPerBand ~
    * log2 N) at corpus scale. No bucket repartition: the shuffle
    * hash-partitions on the full key, so parallelism is not capped
    * (round 1's 256-bucket ceiling + O(N^2/256) pairing is gone).
    */
  def embeddingNearDups(df: DataFrame, vecCol: String, keyCol: String,
                        threshold: Double, planes: Int = 32,
                        bands: Int = 4, seed: Long = 42L): DataFrame = {
    // Candidate generation shuffles (band-key, doc-key) pairs ONLY —
    // the embedding payload (dim * 8 bytes per row, the dominant byte
    // volume at corpus scale) stays out of the self-join and is
    // re-attached by key for just the (few) surviving candidates,
    // mirroring minhashNearDups' shape.
    val banded = df.select(col(keyCol).as("__key"),
      explode(graft.functions.ST.vec_bandKeys(col(vecCol), planes, bands, seed, 0))
        .as("__bk"))
    val l = banded.withColumnRenamed("__key", "key_a")
    val r = banded.withColumnRenamed("__key", "key_b")
    val cands = l.join(r, Seq("__bk"))
      .filter(col("key_a") < col("key_b"))
      .select("key_a", "key_b")
      .distinct()
    val v = df.select(col(keyCol).as("__k"), col(vecCol).as("__v"))
    cands
      .join(v.withColumnRenamed("__k", "key_a").withColumnRenamed("__v", "v_a"), "key_a")
      .join(v.withColumnRenamed("__k", "key_b").withColumnRenamed("__v", "v_b"), "key_b")
      .withColumn("cosine", graft.functions.ST.vec_cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("key_a"), col("key_b"), TextOps.floor6(col("cosine")).as("cosine"))
  }

  /** Near-duplicate CLUSTERS with a canonical keeper — the actual
    * 100 TB dedup workflow: pairwise near-dup relations are not
    * transitive-closed, so "drop key_b of every pair" over-deletes
    * (a-b and b-c would drop b AND c even though a~c may not hold).
    * The correct semantics is: connected components of the near-dup
    * graph, keep ONE document per component.
    *
    * Pipeline: [[minhashNearDups]] (banded LSH candidates + exact
    * Jaccard refine) → [[Cluster.connectedComponents]] (alternating
    * large/small-star, O(log n) rounds) → keeper = MIN key per
    * component (canonical, so reruns/resumes at any partitioning
    * produce the identical keep set).
    *
    * Output: one row per document that is part of some near-dup
    * component — (key, cluster, keep, cluster_size). Documents with
    * no near-dup never appear (they are trivially kept); callers
    * left_anti join to drop rows where keep = false.
    */
  def dupClusters(df: DataFrame, textCol: String, keyCol: String,
                  threshold: Double, shingleN: Int = 3,
                  k: Int = 24, bands: Int = 8): DataFrame = {
    val pairs = minhashNearDups(df, textCol, keyCol, threshold, shingleN, k, bands)
    val comp = Cluster.connectedComponents(pairs, "key_a", "key_b")
    val sizes = comp.groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "component")
      .select(col("id").as(keyCol), col("component").as("cluster"),
        (col("id") === col("component")).as("keep"), col("cluster_size"))
  }
}
