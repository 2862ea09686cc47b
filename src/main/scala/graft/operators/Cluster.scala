package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ST._

/** Distributed density clustering (the PostGIS `ST_ClusterDBSCAN`
  * analogue, made deterministic).
  *
  * EXACT DBSCAN, expressed as declarative DataFrame stages so Catalyst
  * owns every physical choice:
  *
  *   1. eps-neighbor pairs: `SpatialJoins.cellDWithinJoin` self-join —
  *      radius-padded Z-order cell cover, cell equi-join, exact
  *      distance refine. Both sides shuffle by CELL only; no pair of
  *      points further than eps ever meets, so the stage is
  *      O(points x local density), never O(n^2).
  *   2. core points: one hash aggregation (neighbor count incl. self
  *      >= minPts — the standard DBSCAN convention).
  *   3. cluster ids: connected components of the core-core eps graph
  *      by iterative min-label propagation. Each round is one
  *      equi-join + one aggregation; `localCheckpoint` at every
  *      boundary truncates the lineage (the q25 kNN pattern — without
  *      it the plan doubles per round and the driver dies long before
  *      the data does). Rounds needed = graph diameter in hops, which
  *      for eps-density clusters is small (a cluster D wide has
  *      diameter <= D/eps); the alternating large-star/small-star
  *      variant would give O(log n) for adversarial chain graphs at
  *      2x the per-round cost — not taken, documented.
  *   4. border points: non-core points with a core eps-neighbor join
  *      the MIN neighbouring core's cluster. Standard DBSCAN leaves
  *      border assignment order-dependent; min is the deterministic
  *      refinement (same rows on every run and every partitioning,
  *      which is what lets a SQL oracle replay it).
  *
  * Noise points (non-core, no core neighbor) are omitted from the
  * output, like `ST_ClusterDBSCAN`'s NULLs filtered away.
  *
  * The cluster id is the MINIMUM member core id — a canonical label
  * independent of execution order, so output is bit-stable across
  * retries/partitionings (a 100 TB run can be resumed and compared).
  */
object Cluster {

  /** DBSCAN over a point table.
    *
    * @param pts     input; one row per point
    * @param idCol   unique orderable point id (numeric or string)
    * @param geomCol point geometry column
    * @param eps     neighborhood radius (euclidean, same units as
    *                coordinates)
    * @param minPts  minimum neighborhood size (INCLUDING the point
    *                itself) for a core point
    * @param level   Z-order grid level for the candidate cell join;
    *                pick cells a small multiple of eps wide
    * @return (idCol, cluster, is_core) — one row per non-noise point;
    *         `cluster` is the min core id of the component, typed as
    *         idCol
    */
  def dbscan(pts: DataFrame, idCol: String, geomCol: String,
             eps: Double, minPts: Int, level: Int,
             maxRounds: Int = 64): DataFrame = {
    require(eps >= 0, "eps must be non-negative")
    require(minPts >= 1, "minPts must be >= 1")
    val left = pts.select(col(idCol), col(geomCol))
    val right = pts.select(col(idCol).as("__nid"), col(geomCol).as("__ngeom"))
    // symmetric by construction (same set both sides) and includes the
    // self-pair (distance 0), so count(*) per id IS |N_eps(p)| incl. p
    val pairs = SpatialJoins
      .cellDWithinJoin(left, geomCol, right, "__ngeom", eps, level)
      .select(col(idCol), col("__nid"))
      .localCheckpoint() // reused by 3 downstream stages + the loop
    val cores = pairs.groupBy(idCol).agg(count(lit(1)).as("__deg"))
      .filter(col("__deg") >= minPts).select(col(idCol))
      .localCheckpoint()
    val coreEdges = pairs
      .join(cores, Seq(idCol))                      // source is core
      .join(cores.withColumnRenamed(idCol, "__nid"), Seq("__nid")) // dest is core
      .filter(col(idCol) =!= col("__nid"))
      .localCheckpoint()

    var lbl = cores.withColumn("__lbl", col(idCol)).localCheckpoint()
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      // min incoming label per destination, one join + one agg
      val prop = coreEdges
        .join(lbl.withColumnRenamed(idCol, "__src"), col(idCol) === col("__src"))
        .groupBy(col("__nid").as(idCol)).agg(min(col("__lbl")).as("__plbl"))
      val next = lbl.join(prop, Seq(idCol), "left")
        .select(col(idCol), col("__lbl"),
          least(col("__lbl"), coalesce(col("__plbl"), col("__lbl"))).as("__nlbl"))
        .localCheckpoint()
      changed = next.filter(col("__nlbl") < col("__lbl")).count()
      lbl = next.select(col(idCol), col("__nlbl").as("__lbl"))
      round += 1
    }
    require(changed == 0, s"dbscan label propagation did not converge in $maxRounds rounds")

    val coreOut = lbl.select(col(idCol), col("__lbl").as("cluster"), lit(true).as("is_core"))
    val borderOut = pairs
      // lbl holds exactly the core ids, so this join both restricts to
      // core neighbors and attaches their cluster label
      .join(lbl.withColumnRenamed(idCol, "__nid"), Seq("__nid"))
      .join(cores, Seq(idCol), "left_anti") // self is NOT core
      .groupBy(idCol).agg(min(col("__lbl")).as("cluster"))
      .withColumn("is_core", lit(false))
    coreOut.unionByName(borderOut)
  }
}
