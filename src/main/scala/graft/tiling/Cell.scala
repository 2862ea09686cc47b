package graft.tiling

import graft.core.{Env, Geom, Algos, Intersects}

/** Deterministic hierarchical cell index: Z-order (Morton) cells over
  * the Web Mercator unit square, standing in for H3/S2 (zero external
  * deps). Projection math follows the reference's web mercator
  * (reference: carto/proj_web_mercator.go:30-57); the Morton/quadkey
  * encoding is the standard public construction.
  *
  * Cell id layout (LongType-friendly):
  *   bits 58..62 = level (0..28), bits 0..55 = morton(ix, iy).
  * Ids at the same level sort in Z-order — consecutive ids are
  * spatially close, which keeps range-partitioned shuffles local.
  */
object Cell {

  final val MaxLevel = 28

  /** Web Mercator forward: lon/lat degrees -> unit square [0,1)². */
  def mercX(lonDeg: Double): Double = (lonDeg + 180.0) / 360.0

  def mercY(latDeg: Double): Double = {
    // clamp to the mercator square like web maps do
    val lat = math.max(-85.05112878, math.min(85.05112878, latDeg))
    val latRad = math.toRadians(lat)
    0.5 - math.log(math.tan(math.Pi / 4 + latRad / 2)) / (2 * math.Pi)
  }

  /** Inverse: unit square -> lon/lat degrees. */
  def invMercX(x: Double): Double = x * 360.0 - 180.0
  def invMercY(y: Double): Double =
    math.toDegrees(2 * math.atan(math.exp((0.5 - y) * 2 * math.Pi)) - math.Pi / 2)

  // ------------------------------------------------------------ morton

  /** Spread the low 28 bits of v so bit i lands at position 2i. */
  private def spread(v0: Long): Long = {
    var x = v0 & 0x0FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  private def compact(v0: Long): Long = {
    var x = v0 & 0x5555555555555555L
    x = (x | (x >> 1)) & 0x3333333333333333L
    x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
    x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
    x = (x | (x >> 16)) & 0x00000000FFFFFFFFL
    x
  }

  def morton(ix: Long, iy: Long): Long = spread(ix) | (spread(iy) << 1)
  def mortonX(m: Long): Long = compact(m)
  def mortonY(m: Long): Long = compact(m >> 1)

  // ------------------------------------------------------------- cells

  def pack(level: Int, ix: Long, iy: Long): Long = {
    require(level >= 0 && level <= MaxLevel, s"level $level out of range")
    (level.toLong << 58) | morton(ix, iy)
  }

  def levelOf(cell: Long): Int = ((cell >> 58) & 0x1F).toInt
  def ixOf(cell: Long): Long = mortonX(cell & ((1L << 56) - 1))
  def iyOf(cell: Long): Long = mortonY(cell & ((1L << 56) - 1))

  private def clampIdx(i: Long, level: Int): Long = {
    val n = 1L << level
    math.max(0L, math.min(n - 1, i))
  }

  /** Cell containing a lon/lat point at the given level. */
  def cellOf(lon: Double, lat: Double, level: Int): Long = {
    val n = 1L << level
    val ix = clampIdx(math.floor(mercX(lon) * n).toLong, level)
    val iy = clampIdx(math.floor(mercY(lat) * n).toLong, level)
    pack(level, ix, iy)
  }

  /** Lon/lat bounds of a cell (west, south, east, north). */
  def bounds(cell: Long): Env = {
    val level = levelOf(cell)
    val n = (1L << level).toDouble
    val ix = ixOf(cell); val iy = iyOf(cell)
    val w = invMercX(ix / n); val e = invMercX((ix + 1) / n)
    // y grows downward in mercator tiles: iy -> north edge
    val north = invMercY(iy / n); val south = invMercY((iy + 1) / n)
    Env(w, south, e, north)
  }

  def parent(cell: Long): Long = {
    val level = levelOf(cell)
    require(level > 0, "level-0 cell has no parent")
    pack(level - 1, ixOf(cell) >> 1, iyOf(cell) >> 1)
  }

  def children(cell: Long): Array[Long] = {
    val level = levelOf(cell)
    require(level < MaxLevel, "max level cell has no children")
    val ix = ixOf(cell) << 1; val iy = iyOf(cell) << 1
    Array(pack(level + 1, ix, iy), pack(level + 1, ix + 1, iy),
      pack(level + 1, ix, iy + 1), pack(level + 1, ix + 1, iy + 1))
  }

  /** Cells within Chebyshev distance k of `cell` (incl. itself) at the
    * same level — the kNN candidate-expansion ring.
    */
  def ring(cell: Long, k: Int): Array[Long] = {
    val level = levelOf(cell)
    val n = 1L << level
    val cx = ixOf(cell); val cy = iyOf(cell)
    val out = new scala.collection.mutable.ArrayBuffer[Long]((2 * k + 1) * (2 * k + 1))
    var dy = -k
    while (dy <= k) {
      var dx = -k
      while (dx <= k) {
        val ix = cx + dx; val iy = cy + dy
        if (ix >= 0 && ix < n && iy >= 0 && iy < n) out += pack(level, ix, iy)
        dx += 1
      }
      dy += 1
    }
    out.toArray
  }

  /** All cells at exactly `level` whose lon/lat box intersects the
    * envelope.
    *
    * The level is a CONTRACT, never silently changed: cellJoin/tileAssign
    * equi-join on packed cell ids whose high bits encode the level, so a
    * cover emitted at a coarser level could never match the other side's
    * cells — every pair involving that geometry would be silently
    * dropped. If the cover would exceed maxCells (a geometry too large
    * for the requested level — e.g. a country polygon at level 12), this
    * throws so the caller can pick a coarser level or raise the cap
    * explicitly.
    */
  def coverEnv(env: Env, level: Int, maxCells: Int = 1024): Array[Long] = {
    if (env.isEmpty) return Array.empty
    val est = estimateCover(env, level)
    if (est > maxCells) throw new IllegalArgumentException(
      s"cell cover at level $level needs $est cells (> maxCells=$maxCells); " +
        "use a coarser level or raise maxCells — silently coarsening would " +
        "break cell equi-joins")
    val n = 1L << level
    val ix0 = clampIdx(math.floor(mercX(env.xmin) * n).toLong, level)
    val ix1 = clampIdx(math.floor(mercX(env.xmax) * n).toLong, level)
    // y inverted: ymax (north) -> smaller iy
    val iy0 = clampIdx(math.floor(mercY(env.ymax) * n).toLong, level)
    val iy1 = clampIdx(math.floor(mercY(env.ymin) * n).toLong, level)
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var iy = iy0
    while (iy <= iy1) {
      var ix = ix0
      while (ix <= ix1) {
        out += pack(level, ix, iy)
        ix += 1
      }
      iy += 1
    }
    out.toArray
  }

  private def estimateCover(env: Env, level: Int): Long = {
    val n = 1L << level
    val ix0 = clampIdx(math.floor(mercX(env.xmin) * n).toLong, level)
    val ix1 = clampIdx(math.floor(mercX(env.xmax) * n).toLong, level)
    val iy0 = clampIdx(math.floor(mercY(env.ymax) * n).toLong, level)
    val iy1 = clampIdx(math.floor(mercY(env.ymin) * n).toLong, level)
    (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
  }

  /** Cells at `level` that actually intersect the geometry (envelope
    * cover refined by an exact intersects test per cell box).
    */
  def coverGeom(g: Geom, level: Int, maxCells: Int = 1024): Array[Long] = {
    val cand = coverEnv(g.envelope, level, maxCells)
    if (cand.length <= 1) return cand
    cand.filter { c =>
      val b = bounds(c)
      Intersects.intersects(g, b.toGeom)
    }
  }
}
