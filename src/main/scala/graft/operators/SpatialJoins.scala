package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core._
import graft.functions.ST._
import graft.tiling.Cell

import scala.collection.concurrent.TrieMap

/** Distributed spatial joins.
  *
  * Physical patterns from SURVEY.md §2.12/§4:
  *  - broadcast join: small polygon side is collected, decoded ONCE,
  *    R-tree indexed ONCE per executor (the PreparedGeometry pattern,
  *    reference: geom/alg_prepared.go:12-27), probed by the streamed
  *    point side; match ids then equi-joined back (broadcast hash
  *    join, no shuffle of the big side).
  *  - partitioned cell join: both sides keyed by Z-order cell
  *    (explode cover), shuffle co-partitions by cell, exact refine,
  *    dedup — the distributed analogue of the reference's GC-aware
  *    R-tree intersection plan (geom/alg_overlay.go:84-120).
  *  - kNN: cell-ring candidate expansion + exact distance top-k
  *    (reference: rtree/nearest.go PrioritySearch at task scale).
  */
object SpatialJoins {

  /** Executor-local cache of prepared broadcast sides, keyed by
    * broadcast id: decode WKB + build R-tree once per JVM, not once
    * per task (Spark has no geometry-aware cache; reference prepares
    * one geometry for repeated predicates the same way).
    */
  private val preparedCache = TrieMap.empty[Long, (Array[Geom], Array[Env], RTree)]

  private def prepared(bc: Broadcast[Array[Array[Byte]]]): (Array[Geom], Array[Env], RTree) =
    preparedCache.getOrElseUpdate(bc.id, {
      val geoms = bc.value.map(b => if (b.isEmpty) Geom.emptyGC else Wkb.read(b))
      val envs = geoms.map(_.envelope)
      (geoms, envs, RTree.bulkLoad(envs))
    })

  /** Predicate evaluation for join refinement; `pred` values follow the
    * ST names; the polygon/build side is the left argument.
    */
  private def evalPred(pred: String, poly: Geom, probe: Geom): Boolean = pred match {
    case "contains"   => Relate.contains(poly, probe)
    case "covers"     => Relate.covers(poly, probe)
    case "intersects" => Intersects.intersects(poly, probe)
    case "within"     => Relate.within(poly, probe)
    case "touches"    => Relate.touches(poly, probe)
    case other => throw new IllegalArgumentException(s"unsupported join predicate '$other'")
  }

  /** Broadcast spatial join: returns `big` joined with `small` rows
    * whose geometry satisfies pred(smallGeom, bigGeom).
    *
    * `small` must fit in a broadcast (dimension-table scale). The big
    * side is never shuffled: candidates come from the executor-local
    * R-tree, and the final attach of small-side columns is a broadcast
    * hash equi-join on the matched index.
    */
  def broadcastSpatialJoin(
      big: DataFrame, bigGeom: Column,
      small: DataFrame, smallGeom: String,
      pred: String = "contains",
      joinType: String = "inner"): DataFrame = {
    val spark = big.sparkSession
    // cache so the id assignment is identical between the collect below
    // and the final equi-join back
    val smallIdx = small.withColumn("__idx", monotonically_increasing_id()).cache()
    val collected = smallIdx.select(col("__idx"), col(smallGeom)).collect()
    require(collected.nonEmpty, "broadcast side is empty")
    val maxIdx = collected.map(_.getLong(0)).max
    require(maxIdx < Int.MaxValue, "broadcast side too large")
    val wkbs = Array.fill[Array[Byte]]((maxIdx + 1).toInt)(Array.emptyByteArray)
    collected.foreach(r => wkbs(r.getLong(0).toInt) = r.getAs[Array[Byte]](1))
    val bc = spark.sparkContext.broadcast(wkbs)

    val predName = pred
    val matchUdf = udf { (probeWkb: Array[Byte]) =>
      if (probeWkb == null) Array.empty[Long]
      else {
        val (geoms, _, tree) = prepared(bc)
        val probe = Wkb.read(probeWkb)
        val e = probe.envelope
        val out = scala.collection.mutable.ArrayBuffer.empty[Long]
        if (!e.isEmpty) tree.rangeSearch(e) { i =>
          if (!geoms(i).isEmpty && evalPred(predName, geoms(i), probe)) out += i.toLong
          true
        }
        out.toArray
      }
    }

    val withMatches = big.withColumn("__idxs", matchUdf(bigGeom))
    val exploded =
      if (joinType == "left_outer")
        withMatches.withColumn("__idx",
          explode_outer(when(size(col("__idxs")) > 0, col("__idxs"))))
      else
        withMatches.withColumn("__idx", explode(col("__idxs")))
    exploded.drop("__idxs")
      .join(broadcast(smallIdx), Seq("__idx"), joinType)
      .drop("__idx")
  }

  /** Partitioned cell equi-join for big-vs-big spatial joins.
    *
    * Both sides are exploded to their cell covers at `level`, shuffled
    * on the cell key (hash partitioning → co-location), refined with
    * the exact predicate, and deduped on the provided key columns
    * (a pair matching in several shared cells must emit once).
    *
    * Hot-cell skew: pass saltBuckets > 1 to salt the LEFT side's cell
    * key and replicate the RIGHT side per salt bucket — output rows are
    * identical to the unsalted plan (dedup key unchanged); AQE skew
    * join handles residual imbalance.
    */
  def cellJoin(
      left: DataFrame, leftGeom: String,
      right: DataFrame, rightGeom: String,
      pred: String,
      level: Int,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      saltBuckets: Int = 1): DataFrame = {
    val l = left.withColumn("__cell", explode(st_cellCover(col(leftGeom), lit(level))))
    val r = right.withColumn("__cell", explode(st_cellCover(col(rightGeom), lit(level))))
    val (lk, rk) =
      if (saltBuckets <= 1) (l.withColumn("__salt", lit(0)), r.withColumn("__salt", lit(0)))
      else (
        l.withColumn("__salt", pmod(xxhash64(col(leftKeys.head)), lit(saltBuckets)).cast("int")),
        r.withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1)))))
    val predCol = pred match {
      case "intersects" => st_intersects(col(leftGeom), col(rightGeom))
      case "contains"   => st_contains(col(leftGeom), col(rightGeom))
      case "within"     => st_within(col(leftGeom), col(rightGeom))
      case other => throw new IllegalArgumentException(s"unsupported join predicate '$other'")
    }
    lk.join(rk, Seq("__cell", "__salt"))
      .filter(predCol)
      .drop("__cell", "__salt")
      .dropDuplicates(leftKeys ++ rightKeys)
  }

  /** Distance-kNN join: for each query point, the k nearest target
    * points (ties broken by target key for determinism).
    *
    * Plan: candidates from expanding cell rings (exact within-ring
    * distance bound: a ring of radius r at `level` guarantees all
    * points within (r-1) cell-widths are candidates); queries that
    * can't prove completeness at ringK fall back to a wider ring.
    */
  def knnJoin(
      queries: DataFrame, qLon: String, qLat: String, qKey: String,
      targets: DataFrame, tLon: String, tLat: String, tKey: String,
      k: Int, level: Int = 10, ringK: Int = 2): DataFrame = {
    val t = targets.withColumn("__tcell",
      st_cellOf(col(tLon), col(tLat), lit(level)))
    val q = queries
      .withColumn("__qcell", st_cellOf(col(qLon), col(qLat), lit(level)))
      .withColumn("__cand_cell", explode(st_cellRing(col("__qcell"), lit(ringK))))

    val dist2 =
      (col(qLon) - col(tLon)) * (col(qLon) - col(tLon)) +
        (col(qLat) - col(tLat)) * (col(qLat) - col(tLat))

    val joined = q.join(t, col("__cand_cell") === col("__tcell"))
      .withColumn("__d2", dist2)
    val w = Window.partitionBy(col(qKey)).orderBy(col("__d2"), col(tKey))
    joined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__tcell", "__qcell", "__cand_cell")
  }

  /** Tile assignment: clip each geometry to every cell it covers,
    * emitting (cell, clipped geometry) rows — the raster<->vector
    * tile-assignment query of the north rule; Sutherland–Hodgman per
    * tile (reference: jts ring clipper role in OverlayNG).
    */
  def tileAssign(df: DataFrame, geomCol: String, level: Int): DataFrame = {
    df.withColumn("cell", explode(st_cellCover(col(geomCol), lit(level))))
      .withColumn("cell_geom", st_cellGeom(col("cell")))
      .withColumn("tile_part",
        st_clipByBox(col(geomCol),
          st_xmin(col("cell_geom")), st_ymin(col("cell_geom")),
          st_xmax(col("cell_geom")), st_ymax(col("cell_geom"))))
      .drop("cell_geom")
  }
}
