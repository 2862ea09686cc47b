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
  *      the data does). Rounds needed = graph diameter in eps-hops —
  *      1..2 for eps-density blobs (measured: the alternating-star CC
  *      swap, though result-identical, costs 1.6x here; see the note
  *      at the propagation loop for when to prefer it).
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

  /** Connected components of an undirected edge list by ALTERNATING
    * large-star / small-star (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14) — the O(log n)-round algorithm
    * the naive min-label propagation is not: a chain of length D needs
    * D propagation rounds but only O(log D) star rounds, because each
    * round pointer-doubles toward the component minimum.
    *
    * Both star operations are pure relational stages, so every round
    * is ONE hash aggregation (per-node min neighbor, partials combine
    * map-side) plus ONE equi-join (attach that min back to the edges)
    * — no collect_list of neighborhoods, so a 10^8-degree hub node
    * costs the same as any other key in the agg and the join's skew is
    * the ordinary hash-join kind AQE already splits:
    *
    *   large-star: for every edge (u,v) with v > u, emit (v, m(u))
    *     where m(u) = min(N(u) ∪ {u}) — strictly-larger neighbors
    *     re-attach to u's best-known minimum.
    *   small-star: for every edge (u,v) with v <= u, emit (v, m(u))
    *     and (u, m(u)) — u and its smaller neighbors all collapse
    *     onto the minimum.
    *
    * Edges stay canonical child > parent after each small-star; the
    * fixed point (checked with an order-independent count+checksum
    * aggregate, one tiny action per round — never a full set diff) is
    * a star forest whose centers are the component minima.
    *
    * Output: (id, component) for every node incident to an edge,
    * component = MIN member id — canonical, execution-order
    * independent, so a SQL oracle (recursive-CTE label flood) and a
    * 100 TB resume both reproduce it bit-for-bit. Isolated nodes never
    * appear in an edge list; union the complement in if needed.
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxRounds: Int = 50): DataFrame = {
    def mins(e: DataFrame): DataFrame = // m(u) over the given edge set
      e.groupBy(col("u")).agg(min(col("v")).as("__mn"))
        .select(col("u").as("__mu"), least(col("__mn"), col("__mu")).as("__m"))

    // symmetric, no self-loops: N(u) is complete on both sides
    val sym0 = edges
      .select(col(aCol).as("u"), col(bCol).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
    var e = sym0.unionAll(sym0.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      // EAGER: round 1 consumes e from two branches (mins + join);
      // lazy would let those stages race to compute it twice
      .localCheckpoint()

    var round = 0
    var prevSig: (Long, Long) = (-1L, -1L)
    var converged = false
    while (!converged && round < maxRounds) {
      // large-star over the symmetric set
      val ls = e.join(mins(e), col("u") === col("__mu"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("__m").as("v"))
        .filter(col("u") =!= col("v"))
      // small-star over (u, v <= u); ls edges are child > parent.
      // NO distinct here: the min aggregations downstream are
      // duplicate-insensitive, so deduping the star output buys
      // nothing — the one distinct per round below (after
      // re-symmetrization) is what keeps multiplicities bounded at 1
      // entering the next round. (r5 ran TWO full dedup shuffles per
      // round on the suite's slowest query.)
      val ss = {
        val m2 = mins(ls)
        val down = ls.join(m2, col("u") === col("__mu"))
        down.filter(col("v") =!= col("__m"))
          .select(col("v").as("u"), col("__m").as("v"))
          // the (u, m(u)) half comes from the per-u aggregate — ONE
          // row per node, where the r5 spelling emitted it once per
          // EDGE and let the distinct absorb deg(u) duplicates
          .unionAll(m2.select(col("__mu").as("u"), col("__m").as("v")))
          .filter(col("u") =!= col("v"))
      }
      // re-symmetrize: star edges (child, parent) + reverse, so the
      // next large-star sees the full neighborhood again; the single
      // per-round distinct lives here
      // LAZY checkpoint: the signature action below materializes (and
      // persists) the partitions in the SAME job — the r5 eager form
      // paid a dedicated materialization job per round on top of it
      e = ss.unionAll(ss.select(col("v").as("u"), col("u").as("v")))
        .distinct()
        .localCheckpoint(false)
      // order-independent fixed-point signature (count + xor-of-hash)
      // over the just-checkpointed canonical edge SET — a cheap scan
      // of materialized partitions, and equivalent to r5's signature
      // on the deduped star output (e is a bijection of it)
      val sig = e.agg(count(lit(1)),
          coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)))
        .collect()(0)
      val cur = (sig.getLong(0), sig.getLong(1))
      converged = cur == prevSig
      prevSig = cur
      round += 1
    }
    require(converged, s"connectedComponents did not converge in $maxRounds rounds")
    // fixed point: forest edges (child, parent=center). Centers are
    // the rows' parents; add (center, center) for completeness. The
    // two sides are disjoint by the fixed-point structure — a center
    // has only larger neighbors, so it never appears as a child — and
    // groupBy makes children unique, so no outer dedup is needed
    // (r5 paid a third full-union distinct here).
    val forest = e.filter(col("v") < col("u"))
      .groupBy(col("u")).agg(min(col("v")).as("component"))
      .select(col("u").as("id"), col("component"))
    forest.unionAll(
        forest.select(col("component").as("id"), col("component")).distinct())
  }

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
      // EAGER: pairs feeds cores, coreEdges (twice) and the loop —
      // multiple CONCURRENT stages of one lazy materializing job
      // would race to compute the expensive cell join repeatedly
      // (measured: q120's first in-suite sample went 2.4 -> 16 s
      // when this was lazy); a single materialization job is cheaper
      .localCheckpoint()
    val cores = pairs.groupBy(idCol).agg(count(lit(1)).as("__deg"))
      .filter(col("__deg") >= minPts).select(col(idCol))
      .localCheckpoint() // eager: multi-consumer (coreEdges x2, lbl, border)
    val coreEdges = pairs
      .join(cores, Seq(idCol))                      // source is core
      .join(cores.withColumnRenamed(idCol, "__nid"), Seq("__nid")) // dest is core
      .filter(col(idCol) =!= col("__nid"))
      .localCheckpoint() // eager: consumed by every loop round

    // cluster ids: min core id per connected component of the
    // core-core eps graph, by iterative min-label propagation.
    // MEASURED (r6): swapping this loop for [[connectedComponents]]
    // (result-identical — both converge to the min member core id)
    // REGRESSED q120 2.7 -> 4.4 s at sf0.1: eps-density clusters are
    // diameter-1..2 blobs, so this loop converges in 2 rounds of 3
    // stages, while the star CC pays symmetrize/distinct setup + 5
    // exchanges per round + forest extraction. The star swap only
    // wins on stringy clusters (diameter >> eps); callers with such
    // data should run Cluster.connectedComponents on the core graph
    // directly — same output, O(log n) rounds.
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
        .localCheckpoint(false) // lazy: the changed-count job materializes it
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
