package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

import graft.functions.RowKernelCodegen

/** Hilbert space-filling curve index. The Z-order (Morton) curve used
  * by the clustered bench layout (Pages.scala) has locality "seams"
  * where one bit flip teleports across the map; the Hilbert curve is
  * the locality-optimal alternative — adjacent d-values are ALWAYS
  * 4-adjacent cells — which makes it the better sort key for
  * range-partitioned storage (Iceberg/Delta clustering) and for
  * packing R-tree leaves (the classic Hilbert R-tree bulk load,
  * Kamel & Faloutsos VLDB'94).
  *
  * `hilbertIndex` is the standard per-bit rotate/reflect walk
  * (quadrant Gray-code; see Hamilton's "Compact Hilbert Indices" TR or
  * the Wikipedia xy2d form) as a codegen'd kernel expression — a
  * 2·order-step integer loop per row, no allocation. The DuckDB
  * oracle replays the identical walk through `order` generated CTE
  * levels (SparkEntry writes them out), so the curve definition itself
  * is gated bit-for-bit, not just "some locality-ish number".
  */
object SpaceCurve {

  /** d-value in [0, 4^order) for a cell (x, y) with 0 <= x,y < 2^order.
    * Out-of-range coordinates are masked into range (callers quantize
    * first); null in -> null out.
    */
  def hilbertIndex(x: Column, y: Column, order: Int): Column =
    GraftBridge.column(HilbertIndex(
      GraftBridge.expression(x), GraftBridge.expression(y), order))

  /** Core integer walk, shared by the expression and the specs. */
  private[operators] def xy2d(order: Int, x0: Long, y0: Long): Long = {
    val n = 1L << order
    var x = x0 & (n - 1)
    var y = y0 & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate/reflect the quadrant so the sub-square is walked in
      // canonical orientation
      if (ry == 0L) {
        if (rx == 1L) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** The inverse walk (d -> (x, y)), for specs/round-trips. */
  private[operators] def d2xy(order: Int, d0: Long): (Long, Long) = {
    val n = 1L << order
    var (x, y) = (0L, 0L)
    var t = d0
    var s = 1L
    while (s < n) {
      val rx = (t / 2) & 1
      val ry = (t ^ rx) & 1
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  // ------------------------------------------------------------ geohash

  /** The public geohash base32 alphabet (Niemeyer 2008). */
  val GeohashAlphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Geohash cell id of (lon, lat) at `precision` characters — the
    * third cell index the engine speaks alongside the web-mercator
    * Morton cells (tiling/Cell.scala) and H3-style hex bins
    * (Raster.hexBin): the string-prefix-hierarchical one, where a
    * prefix IS the parent cell, so per-region rollups are `substr`
    * and range-clustered storage sorts lexicographically.
    *
    * Construction: the canonical interval-halving walk collapses to
    * closed form — lonIdx = floor((lon+180)/360 · 2^lonBits) (clamped),
    * same for lat, bits interleaved lon-first, 5-bit groups through the
    * base32 alphabet. Everything is plain Column arithmetic (floor,
    * shiftright, &, concat) inside whole-stage codegen — no UDF, no
    * kernel — and the DuckDB oracle replays the identical IEEE-754
    * expression tree, so the cell definition is gated bit-for-bit.
    * Points lying exactly on a cell boundary take the upper cell (the
    * canonical `>= mid` convention): boundary coordinates make
    * (lon+180)/360·2^k a dyadic rational that the double path computes
    * exactly, so floor lands them upward identically to the halving
    * walk.
    */
  def geohash(lon: Column, lat: Column, precision: Int): Column = {
    require(precision >= 1 && precision <= 12, s"precision $precision")
    val totalBits = 5 * precision
    val lonBits = (totalBits + 1) / 2
    val latBits = totalBits / 2
    geohashFromIdx(axisIdx(lon, 180.0, 360.0, lonBits),
      axisIdx(lat, 90.0, 180.0, latBits), precision)
  }

  /** Cell string from already-quantized axis indices (lonIdx in
    * [0, 2^ceil(5p/2)), latIdx in [0, 2^floor(5p/2))).
    */
  def geohashFromIdx(lonIdx: Column, latIdx: Column, precision: Int): Column = {
    val totalBits = 5 * precision
    val lonBits = (totalBits + 1) / 2
    val latBits = totalBits / 2
    val chars = (0 until precision).map { ci =>
      val v = (0 until 5).map { t =>
        val j = 5 * ci + t // interleaved bit position, MSB first, lon-even
        val bit =
          if (j % 2 == 0) shiftright(lonIdx, lonBits - 1 - j / 2)
          else shiftright(latIdx, latBits - 1 - (j - 1) / 2)
        bit.bitwiseAND(lit(1L)) * lit(1L << (4 - t))
      }.reduce(_ + _)
      substring(lit(GeohashAlphabet), (v + lit(1L)).cast("int"), lit(1))
    }
    concat(chars: _*)
  }

  /** Geohash polyfill of a closed box [x0,x1]×[y0,y1]: the array of
    * all precision-p cells intersecting it (inclusive index ranges on
    * both axes — the same clamped closed-form quantization as the
    * point encoder, so a point's cell is ALWAYS inside the cover of
    * any box containing the point; q162's brute-force oracle proves
    * that completeness end to end). Per-row array construction,
    * shuffle-free; callers explode + equi-join on the cell string.
    * Cover size is ((x1-x0)/cell+2)·((y1-y0)/cell+2) — pick the
    * precision so this stays O(100) for the box sizes at hand, the
    * same parameter discipline as hexCover/cellCover.
    */
  def geohashCoverBox(x0: Column, y0: Column, x1: Column, y1: Column,
                      precision: Int): Column = {
    require(precision >= 1 && precision <= 12, s"precision $precision")
    val totalBits = 5 * precision
    val lonBits = (totalBits + 1) / 2
    val latBits = totalBits / 2
    val lo = axisIdx(x0, 180.0, 360.0, lonBits)
    val hi = axisIdx(x1, 180.0, 360.0, lonBits)
    val la = axisIdx(y0, 90.0, 180.0, latBits)
    val lb = axisIdx(y1, 90.0, 180.0, latBits)
    flatten(transform(sequence(lo, hi), i =>
      transform(sequence(la, lb), j => geohashFromIdx(i, j, precision))))
  }

  private def axisIdx(c: Column, off: Double, span: Double, bits: Int): Column = {
    val n = (1L << bits).toDouble
    least(greatest(floor((c + lit(off)) / lit(span) * lit(n)), lit(0.0)),
      lit(n - 1.0)).cast("long")
  }

  /** The same closed form as a DuckDB SQL scalar expression over lon /
    * lat SQL fragments — the oracle half of the bit-for-bit gate.
    */
  def geohashOracleExpr(lonSql: String, latSql: String, precision: Int): String = {
    val totalBits = 5 * precision
    val lonBits = (totalBits + 1) / 2
    val latBits = totalBits / 2
    def idx(e: String, off: Double, span: Double, bits: Int): String = {
      val n = (1L << bits).toDouble
      s"CAST(least(greatest(floor((($e) + $off) / $span * $n), 0.0), ${n - 1.0}) AS BIGINT)"
    }
    val li = idx(lonSql, 180.0, 360.0, lonBits)
    val la = idx(latSql, 90.0, 180.0, latBits)
    val chars = (0 until precision).map { ci =>
      val v = (0 until 5).map { t =>
        val j = 5 * ci + t
        val src = if (j % 2 == 0) s"(($li) >> ${lonBits - 1 - j / 2})"
                  else s"(($la) >> ${latBits - 1 - (j - 1) / 2})"
        s"(($src & 1) * ${1L << (4 - t)})"
      }.mkString(" + ")
      s"substr('$GeohashAlphabet', CAST(($v) + 1 AS INT), 1)"
    }
    chars.mkString(" || ")
  }

  /** Local reference decode for specs: cell bounds of a geohash
    * string as (lonLo, lonHi, latLo, latHi).
    */
  private[operators] def geohashBounds(h: String): (Double, Double, Double, Double) = {
    var (lonLo, lonHi, latLo, latHi) = (-180.0, 180.0, -90.0, 90.0)
    var even = true
    for (ch <- h; t <- 4 to 0 by -1) {
      val bit = (GeohashAlphabet.indexOf(ch) >> t) & 1
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (bit == 1) lonLo = mid else lonHi = mid
      } else {
        val mid = (latLo + latHi) / 2
        if (bit == 1) latLo = mid else latHi = mid
      }
      even = !even
    }
    (lonLo, lonHi, latLo, latHi)
  }

  /** The canonical interval-halving encoder (for spec cross-checks). */
  private[operators] def geohashClassic(lon: Double, lat: Double,
                                        precision: Int): String = {
    var (lonLo, lonHi, latLo, latHi) = (-180.0, 180.0, -90.0, 90.0)
    val sb = new StringBuilder
    var even = true
    var bits = 0
    var acc = 0
    while (sb.length < precision) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { acc = (acc << 1) | 1; lonLo = mid }
        else { acc = acc << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { acc = (acc << 1) | 1; latLo = mid }
        else { acc = acc << 1; latHi = mid }
      }
      even = !even
      bits += 1
      if (bits == 5) { sb.append(GeohashAlphabet.charAt(acc)); bits = 0; acc = 0 }
    }
    sb.toString
  }

  /** DuckDB SQL replaying the same walk: one chained CTE per bit level
    * over an input relation `src(key, x, y)` (BIGINT coords already in
    * [0, 2^order), key unique). Returns the full WITH...SELECT
    * producing (key, x, y, hd) with the ORIGINAL coordinates.
    */
  def oracleSql(order: Int, srcCte: String): String = {
    val n = 1L << order
    val levels = (order - 1 to 0 by -1).zipWithIndex.map { case (bit, i) =>
      val s = 1L << bit
      val prev = if (i == 0) "src" else s"l${i - 1}"
      // quadrant contribution: (3*rx) XOR ry over {0,1}^2 spelled as a CASE
      s"""l$i AS (
         |  SELECT key,
         |    CASE WHEN (y & $s) = 0
         |         THEN (CASE WHEN (x & $s) > 0 THEN ${n - 1} - y ELSE y END)
         |         ELSE x END AS x,
         |    CASE WHEN (y & $s) = 0
         |         THEN (CASE WHEN (x & $s) > 0 THEN ${n - 1} - x ELSE x END)
         |         ELSE y END AS y,
         |    d + ${s * s} * (CASE WHEN (x & $s) = 0 AND (y & $s) = 0 THEN 0
         |                         WHEN (x & $s) = 0 THEN 1
         |                         WHEN (y & $s) = 0 THEN 3
         |                         ELSE 2 END) AS d
         |  FROM $prev)""".stripMargin
    }
    s"""WITH src AS (SELECT key, x, y, CAST(0 AS BIGINT) AS d FROM ($srcCte)),
       |${levels.mkString(",\n")}
       |SELECT s.key AS key, s.x AS x, s.y AS y, l.d AS hd
       |FROM l${order - 1} l JOIN src s ON l.key = s.key""".stripMargin
  }
}

/** (x, y) -> Hilbert d-value; a fixed-trip-count integer loop that
  * rides whole-stage codegen via the row-kernel bridge.
  */
case class HilbertIndex(left: Expression, right: Expression, order: Int)
    extends BinaryExpression with RowKernelCodegen {
  require(order >= 1 && order <= 31, s"order $order out of range")
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "hilbert_index"
  override def genEval(vs: Array[Any]): Any =
    if (vs(0) == null || vs(1) == null) null
    else java.lang.Long.valueOf(SpaceCurve.xy2d(order,
      vs(0).asInstanceOf[Long], vs(1).asInstanceOf[Long]))
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): HilbertIndex = copy(left = l, right = r)
}
