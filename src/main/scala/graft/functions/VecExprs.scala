package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the embedding-similarity operators.
  *
  * Round 1 computed hyperplane signatures with nested higher-order
  * functions (`aggregate(zip_with(...))` per plane) — HOFs don't
  * participate in whole-stage codegen and evaluate interpreted with
  * per-element boxing, which made the LSH queries the slowest in the
  * suite (q41: 27.8 s at sf0.1 for ~2 200 vectors). These expressions
  * run the planes x dim loop as tight JVM code on the array data
  * (single virtual call per row, like the geometry ops), and fold the
  * whole signature -> banding -> probe expansion into ONE pass so the
  * signature is never recomputed across use sites (no exchange-barrier
  * tricks needed).
  */
object VecOps {

  /** splitmix64 finalizer — public-domain integer mix (Steele et al.,
    * "Fast Splittable Pseudorandom Number Generators", OOPSLA 2014).
    */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic Rademacher (+1/-1) hyperplane weight for (plane, dim). */
  def planeWeight(seed: Long, plane: Int, d: Int): Double =
    if ((mix64(seed ^ (plane.toLong << 32) ^ d.toLong) & 1L) == 0L) 1.0 else -1.0

  /** Read element i of a Float or Double array column as Double. */
  def elem(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  /** SQL trim semantics: strip ' ' (0x20) only — Java's String.trim
    * also strips control chars, which would diverge from the
    * `trim(text)` the DuckDB oracle applies.
    */
  def sqlTrim(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }
}

/** Exact cosine similarity between two vector columns (array<float> or
  * array<double>); null if either side is null/empty or lengths differ.
  */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryKernelCodegen {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val lf = isFloat(left)
  @transient private lazy val rf = isFloat(right)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0 || y.numElements() != n) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = VecOps.elem(x, i, lf); val yv = VecOps.elem(y, i, rf)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null else dot / (math.sqrt(nx) * math.sqrt(ny))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)
}

/** IVF coarse-quantizer assignment: the 1-based index of the centroid
  * with the highest cosine similarity to the vector (strictly-greater
  * wins, so ties resolve to the LOWEST index — identical to the
  * `aggregate(..., when(cos > best, c))` fold it replaces and to the
  * q88 oracle's ORDER BY cosine DESC, cell ASC). Returns 0 when no
  * centroid yields a defined cosine (empty/zero/length-mismatched
  * vector), which matches the fold's initial accumulator and joins to
  * no probe cell.
  *
  * The centroid matrix is a plan-time constant (collected and
  * broadcast-as-literal by Ann.ivfTopK), so it lives in the expression
  * itself: per-corpus-row work is one tight nCells x dim loop on the
  * array data — the HOF version evaluated interpreted with
  * per-element boxing and was the dominant cost of q88 (4.2 s at
  * sf0.1). The per-centroid cosine uses EXACTLY VecCosine's
  * arithmetic (dot / (sqrt(nx) * sqrt(ny)), norms precomputed) so
  * near-tie orderings cannot drift from the oracle by a rounding
  * difference.
  */
case class VecArgmaxCosine(child: Expression, centroids: Array[Array[Double]])
    extends UnaryKernelCodegen {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val sqrtNorms: Array[Double] = centroids.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }
  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n == 0) return 0
    var nx = 0.0
    var i = 0
    while (i < n) { val x = VecOps.elem(v, i, isFloat); nx += x * x; i += 1 }
    if (nx == 0.0) return 0 // zero vector: every cosine is undefined
    val sqrtNx = math.sqrt(nx)
    var best = Double.NegativeInfinity
    var bestCell = 0
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      if (cv.length == n && sqrtNorms(c) > 0.0) {
        var dot = 0.0; var j = 0
        while (j < n) { dot += VecOps.elem(v, j, isFloat) * cv(j); j += 1 }
        val score = dot / (sqrtNx * sqrtNorms(c))
        if (score > best) { best = score; bestCell = c + 1 }
      }
      c += 1
    }
    bestCell
  }
  override protected def withNewChildInternal(c: Expression): VecArgmaxCosine =
    copy(child = c)
}

/** Banded hyperplane-LSH keys for a vector column, in ONE pass:
  * project onto `planes` deterministic Rademacher hyperplanes, take
  * sign bits, split into `bands` bands of planes/bands bits, and emit
  * one Long key per band: (band << 48) | bandBits. With probeBits=1,
  * additionally emits every key with one bit flipped (multi-probe for
  * the query side of ANN top-k).
  *
  * Scale notes (10^12 rows): candidate generation is an equi-join on
  * the emitted key — never an all-pairs product. Expected spurious
  * candidates are N^2 / 2^rowsPerBand per band, so rowsPerBand must
  * grow with corpus size (~log2 N); 8 bits/band is a test-scale
  * setting, web scale wants planes=128+/bands=4 (32 bits/band). The
  * key space is bands * 2^rowsPerBand — the join hash-partitions on
  * the full key, so parallelism is not capped by a fixed bucket count
  * (the round-1 256-bucket repartition ceiling is gone).
  */
case class VecBandKeys(child: Expression, planes: Int, bands: Int,
                       seed: Long, probeBits: Int)
    extends UnaryKernelCodegen {
  require(planes % bands == 0, "planes must divide into bands")
  require(planes / bands <= 48, "band bits must fit under the band tag")
  require(planes <= 4096, "planes capped at 4096")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private val rows = planes / bands
  // weights cached per (expression instance, dim) — dim is constant for
  // a column, so this builds once per executor thread's first row
  @transient private var wts: Array[Double] = _
  @transient private var wtsDim: Int = -1
  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val dim = v.numElements()
    if (dim == 0) return null
    if (wtsDim != dim) {
      val w = new Array[Double](planes * dim)
      var p = 0
      while (p < planes) {
        var d = 0
        while (d < dim) { w(p * dim + d) = VecOps.planeWeight(seed, p, d); d += 1 }
        p += 1
      }
      wts = w; wtsDim = dim
    }
    // dense copy once: ArrayData.getDouble has per-call overhead
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) { x(i) = VecOps.elem(v, i, isFloat); i += 1 }
    // multi-word signature: planes > 64 (the documented web-scale
    // config is planes=128+/bands=4) must not alias mod 64
    val sig = new Array[Long]((planes + 63) >>> 6)
    var p = 0
    while (p < planes) {
      var dot = 0.0
      val base = p * dim
      var d = 0
      while (d < dim) { dot += x(d) * wts(base + d); d += 1 }
      if (dot >= 0) sig(p >>> 6) |= (1L << (p & 63))
      p += 1
    }
    // extract `rows` bits (rows <= 48 < 64) starting at plane index lo,
    // possibly spanning a word boundary
    def bitsAt(lo: Int): Long = {
      val w = lo >>> 6; val off = lo & 63
      var bits = sig(w) >>> off
      if (off + rows > 64 && w + 1 < sig.length) bits |= sig(w + 1) << (64 - off)
      bits & ((1L << rows) - 1)
    }
    val nOut = if (probeBits >= 1) bands * (1 + rows) else bands
    val out = new Array[Long](nOut)
    var b = 0
    var o = 0
    while (b < bands) {
      val bits = bitsAt(b * rows)
      val tag = b.toLong << 48
      out(o) = tag | bits; o += 1
      if (probeBits >= 1) {
        var r = 0
        while (r < rows) { out(o) = tag | (bits ^ (1L << r)); o += 1; r += 1 }
      }
      b += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): VecBandKeys = copy(child = c)
}

/** 60-bit SimHash of a text column, md5-token-hashed so the DuckDB
  * oracle can recompute it exactly in SQL:
  *
  *   tokens  = distinct values of lower(trim(text)) split on \s+
  *   h(tok)  = first 15 hex chars of md5(tok) as a 60-bit integer
  *   bit b   = 1 iff 2 * count(tokens with h bit b set) >= n_tokens
  *
  * (Round 1 used 32-bit crc32 simhash with 8-bit chunk blocking — 256
  * distinct block values, O(N^2/256) candidates at corpus scale. 60
  * bits / 15-bit chunks gives 32 768 block values per chunk and an
  * oracle-expressible hash; see Dedup.simhashNearDups.)
  */
case class StSimhash60(child: Expression)
    extends UnaryKernelCodegen {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any): Any = {
    val text = a.asInstanceOf[UTF8String].toString
    StSimhash60.simhash60(text)
  }
  override protected def withNewChildInternal(c: Expression): StSimhash60 = copy(child = c)
}

/** Banded MinHash keys for a text column, in ONE native pass:
  * distinct word-n-gram shingles -> 60-bit md5 base hash per shingle ->
  * k permuted min-hashes (xor-mix permutations) -> `bands` band keys,
  * each (band << 56) | (mix of the band's k/bands row values masked to
  * 56 bits). LSH near-dup candidates are then an equi-join on the key.
  *
  * Round 1 built the signature with 24 interpreted `transform` +
  * `array_min` passes over the shingle array per row plus a
  * repartition barrier against re-evaluation; this is one pass, no
  * barrier (q36 was 10.4 s at sf0.1).
  */
case class TextMinhashBandKeys(child: Expression, shingleN: Int, k: Int,
                               bands: Int, seed: Long)
    extends UnaryKernelCodegen {
  require(k % bands == 0, "k must divide into bands")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  private val rows = k / bands
  override def nullSafeEval(a: Any): Any = {
    val text = a.asInstanceOf[UTF8String].toString
    val toks = VecOps.sqlTrim(text).toLowerCase(java.util.Locale.ROOT).split("\\s+")
    // distinct shingles, same definition as TextOps.wordShingles
    val shingles = new java.util.HashSet[String]()
    if (toks.length < shingleN) shingles.add(toks.mkString(" "))
    else {
      var i = 0
      val sb = new java.lang.StringBuilder
      while (i + shingleN <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < shingleN) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        shingles.add(sb.toString)
        i += 1
      }
    }
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val it = shingles.iterator()
    while (it.hasNext) {
      val h = StSimhash60.tokenHash60(it.next())
      var p = 0
      while (p < k) {
        val v = VecOps.mix64(h ^ (seed + p * 0x9E3779B97F4A7C15L))
        if (v < mins(p)) mins(p) = v
        p += 1
      }
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = seed
      var r = 0
      while (r < rows) { acc = VecOps.mix64(acc ^ mins(b * rows + r)); r += 1 }
      out(b) = (b.toLong << 56) | (acc & 0x00FFFFFFFFFFFFFFL)
      b += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): TextMinhashBandKeys =
    copy(child = c)
}

object StSimhash60 {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit token hash = integer value of the first 15 hex chars of
    * md5(token) — i.e. the top 60 bits of the digest, byte order as
    * hex-printed. Exactly `list_reduce` over hex digits in DuckDB.
    */
  def tokenHash60(tok: String): Long = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = bytes 0..6 fully + high nibble of byte 7
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (bytes(i) & 0xFFL); i += 1 }
    (h << 4) | ((bytes(7) & 0xF0L) >>> 4)
  }

  def simhash60(text: String): Long = {
    val toks = VecOps.sqlTrim(text).toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val seen = new java.util.HashSet[String]()
    val counts = new Array[Int](60)
    var n = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (seen.add(t)) {
        n += 1
        val h = tokenHash60(t)
        var b = 0
        while (b < 60) { if (((h >>> b) & 1L) == 1L) counts(b) += 1; b += 1 }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (2 * counts(b) >= n) sig |= (1L << b); b += 1 }
    sig
  }
}

/** Distinct word n-gram shingles of a text column in ONE kernel pass —
  * value-identical to the Column spelling
  * `array_distinct(transform(sequence(0, m-n), i -> concat_ws(' ',
  * slice(split(lower(trim(text)), "\\s+"), i+1, n))))` (with the m<n
  * one-element fallback), which every shingle consumer (contamination,
  * novelty, jaccard, minhash refine) previously evaluated as an
  * interpreted higher-order-function chain: Catalyst re-evaluates the
  * whole tokenize subtree inside the transform lambda once per WINDOW,
  * i.e. O(len^2) regex work per document (the q156/q160 pathology,
  * here in its array-producing form). One tokenize + one window loop
  * per row instead.
  *
  * Fidelity notes: sqlTrim strips 0x20 only (SQL trim semantics);
  * split uses limit -1 like Spark's `split`, so a trailing
  * non-space whitespace yields a trailing empty token exactly like
  * the Column spelling; LinkedHashSet reproduces array_distinct's
  * keep-first-occurrence order.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryKernelCodegen {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any): Any = {
    val text = a.asInstanceOf[UTF8String].toString
    val toks = VecOps.sqlTrim(text)
      .toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
    if (toks.length < n)
      return new GenericArrayData(
        Array[Any](UTF8String.fromString(toks.mkString(" "))))
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

/** Consecutive `w`-word chunks of a text column in ONE kernel pass —
  * value-identical to the Column spelling used by paragraphDedup /
  * boilerplate through r5:
  *
  *   tk = split(lower(trim(text)), "\\s+")
  *   m  = 0 when trim(text) = '' else size(tk)
  *   chunks = [] when m = 0 else
  *     transform(sequence(0, ceil(m/w)-1),
  *       i -> concat_ws(' ', slice(tk, i*w+1, w)))
  *
  * whose lambda embeds the tokenize subtree and re-splits the document
  * once per CHUNK (O(len^2/w) regex work per row). One tokenize + one
  * grouping loop instead; the last chunk is shorter when w does not
  * divide m, exactly like slice().
  */
case class WordChunks(child: Expression, w: Int)
    extends UnaryKernelCodegen {
  require(w >= 1, s"chunk size must be >= 1 word, got $w")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any): Any = {
    val trimmed = VecOps.sqlTrim(a.asInstanceOf[UTF8String].toString)
    if (trimmed.isEmpty) return new GenericArrayData(Array.empty[Any])
    val toks = trimmed.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
    val m = toks.length
    val nChunks = (m + w - 1) / w
    val out = new Array[Any](nChunks)
    val sb = new java.lang.StringBuilder
    var c = 0
    while (c < nChunks) {
      sb.setLength(0)
      var j = c * w
      val end = math.min(j + w, m)
      while (j < end) {
        if (j > c * w) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(c) = UTF8String.fromString(sb.toString)
      c += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): WordChunks =
    copy(child = c)
}

/** Polynomial rolling-hash text fingerprint in ONE kernel pass —
  * value-identical to the Column spelling
  * `aggregate(split(trim(text), "\\s+"), 0L,
  *   (acc, t) -> (acc*31 + conv(substring(md5(t),1,5),16,10)) % 2^31)`
  * (an interpreted fold with a per-token md5 + string base conversion
  * + boxing). Tokens are NOT lowercased and empty tokens hash too,
  * exactly like the spelling; tokHash is the top 20 bits of md5 in
  * hex order. acc < 2^31 and tokHash < 2^20, so the fold never
  * overflows a Long.
  */
case class TextFingerprint(child: Expression)
    extends UnaryKernelCodegen {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any): Any = {
    val toks = VecOps.sqlTrim(a.asInstanceOf[UTF8String].toString)
      .split("\\s+", -1)
    val md = java.security.MessageDigest.getInstance("MD5")
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = ((d(0) & 0xFFL) << 12) | ((d(1) & 0xFFL) << 4) | ((d(2) & 0xF0L) >>> 4)
      acc = (acc * 31L + h) % 2147483648L
      i += 1
    }
    acc
  }
  override protected def withNewChildInternal(c: Expression): TextFingerprint =
    copy(child = c)
}

/** Interval-merge of SORTED window start positions: positions p mark
  * token ranges [p, p+w); overlapping/touching ranges merge into
  * maximal spans (break exactly when p > prevEnd, the gaps-and-islands
  * rule). Returns the merged spans as array<struct<st:int,en:int>> in
  * ascending order — value-identical to the r5 two-window islands
  * pass + double groupBy, but evaluated in one loop inside the per-doc
  * aggregation (positions per doc are doc-length-bounded, the same
  * bound the span rebuild join already carries).
  */
case class MergeSpans(child: Expression, w: Int)
    extends UnaryKernelCodegen {
  require(w >= 1, s"window must be >= 1 token, got $w")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("st", IntegerType, nullable = false),
    StructField("en", IntegerType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var st = arr.getInt(0)
    var en = st + w
    var i = 1
    while (i < n) {
      val p = arr.getInt(i)
      if (p > en) { out += InternalRow(st, en); st = p; en = p + w }
      else if (p + w > en) en = p + w
      i += 1
    }
    out += InternalRow(st, en)
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): MergeSpans =
    copy(child = c)
}

/** Upper-triangle ordered pairs of an ALREADY-SORTED string array:
  * for elements e_0..e_{n-1} emits one (a, b) struct per i < j, in
  * (i asc, j asc) order — value-identical to the Column spelling
  * `flatten(transform(ts, (x, i) -> transform(slice(ts, i+2, size(ts)),
  * y -> struct(x, y))))`, whose nested interpreted lambdas re-slice
  * the array per element with per-pair boxing (the PMI hot path). The
  * output is inherently O(n^2/2) rows — same cardinality either way;
  * this removes the per-pair expression-tree evaluation, not the rows.
  */
case class UpperTrianglePairs(child: Expression)
    extends UnaryKernelCodegen {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", StringType, nullable = true),
    StructField("b", StringType, nullable = true))), containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // copy the strings once — an UnsafeArrayData's UTF8Strings point
    // into a codegen row buffer that is reused across rows
    val es = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      es(i) = if (arr.isNullAt(i)) null
        else UTF8String.fromBytes(arr.getUTF8String(i).getBytes)
      i += 1
    }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) { out(k) = InternalRow(es(i), es(j)); k += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): UpperTrianglePairs =
    copy(child = c)
}

/** Stride-1 duplicate-detection window keys over an ALREADY-TOKENIZED
  * array column: for tokens t_0..t_{n-1} emits one (pos, gk) struct
  * per window, gk = md5 hex of the w tokens joined by single spaces —
  * byte-identical to md5(concat_ws(' ', slice(tk, pos+1, w))), so the
  * DuckDB oracles replay it unchanged.
  *
  * Exists because the Column formulation (transform + sequence + slice
  * + concat_ws + md5 per window) is a higher-order-function chain:
  * interpreted evaluation with per-element boxing made candidate
  * generation the dominant cost of q156/q160 (~4.6 s at sf0.1). This
  * is one tight loop per row: token bytes materialized once, one
  * MessageDigest reused across windows.
  */
case class DupWindowKeys(child: Expression, w: Int)
    extends UnaryKernelCodegen {
  require(w >= 2, s"window must be >= 2 tokens, got $w")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gk", StringType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i).getBytes; i += 1 }
    val md = java.security.MessageDigest.getInstance("MD5")
    val hexd = "0123456789abcdef".toCharArray
    val out = new Array[Any](n - w + 1)
    var p = 0
    while (p + w <= n) {
      md.reset()
      var j = 0
      while (j < w) {
        if (j > 0) md.update(' '.toByte)
        md.update(toks(p + j))
        j += 1
      }
      val dig = md.digest()
      val hc = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hc(2 * b) = hexd((dig(b) >> 4) & 0xf)
        hc(2 * b + 1) = hexd(dig(b) & 0xf)
        b += 1
      }
      out(p) = InternalRow(p, UTF8String.fromString(new String(hc)))
      p += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): DupWindowKeys =
    copy(child = c)
}
