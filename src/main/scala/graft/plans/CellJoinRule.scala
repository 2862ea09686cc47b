package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.functions.{GeomBinaryOp, StCellCover}

/** Logical rewrite: an inner join whose condition is a bare
  * `st_intersects(a.geom, b.geom)` / `st_contains` / `st_within` has
  * no equi-key, so Spark plans a BroadcastNestedLoopJoin / cartesian
  * product — quadratic at scale. This rule rewrites it into the
  * cell-partitioned join the SpatialJoins operator builds by hand:
  *
  *   explode(st_cellcover(geom, level)) on each side (the full cover
  *     array rides along),
  *   equi-join on the cell id (hash-partitioned shuffle),
  *   keep each pair only in its MIN SHARED COVER CELL
  *     (array_min(array_intersect(lcov, rcov))) — duplicate
  *     elimination without a Distinct, so multiset semantics are
  *     preserved exactly; unlike an envelope-derived reference point,
  *     the min shared cover cell is by construction a cell BOTH
  *     geometry-refined covers contain, so concave/lineal inputs
  *     cannot lose pairs,
  *   refine with the original exact predicate (evaluated once per
  *     pair, in the surviving cell only).
  *
  * The refine predicate is the ORIGINAL expression, so the directional
  * predicates keep their orientation; the cover/equi-join/refcell
  * machinery is orientation-agnostic (the cover of each side and the
  * envelope-intersection reference point do not depend on which side
  * contains which).
  *
  * `spark.graft.celljoin.level` selects the cell level:
  *   - an integer (e.g. 8): always rewrite at that level;
  *   - "auto" (the default): pick level = clamp(log4(est rows of the
  *     bigger side), 6, 12) — cells ~ rows, so expected occupancy per
  *     cell is O(1) at any scale — and skip the rewrite when the
  *     bigger side is estimated under `spark.graft.celljoin.minRows`
  *     (default 10000; a nested-loop join over a dimension-sized pair
  *     of inputs is cheaper than two explode-shuffles);
  *   - "-1"/"off": disable.
  * Cell covers at the chosen level must stay under the cover cap for
  * the data's geometry sizes — the same contract st_cellcover itself
  * enforces (it throws rather than silently coarsening).
  *
  * `spark.graft.celljoin.saltBuckets` (default 1 = off): hot-cell skew
  * handling, same scheme the hand-built SpatialJoins.cellJoin uses — a
  * dense urban cell holding 10^8 rows would otherwise land on ONE
  * shuffle partition and straggle the stage. With buckets = s, the
  * left side's shuffle key gains pmod(xxhash64(left row), s) and the
  * right side is replicated s ways, so a hot cell spreads over s
  * partitions. Output rows are IDENTICAL to the unsalted plan: a
  * (left, right) pair meets in exactly one salt bucket (the left
  * row's), and the min-shared-cover-cell dedup is salt-independent.
  * AQE skew-join still applies on top for residual imbalance.
  */
class CellJoinRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val PREDS = Set("st_intersects", "st_contains", "st_within")

  private def estRows(p: LogicalPlan): Long = {
    val s = p.stats
    s.rowCount.map(_.toLong)
      .getOrElse((s.sizeInBytes / 64).min(BigInt(Long.MaxValue)).toLong)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val confV = spark.conf.get("spark.graft.celljoin.level", "auto")
    val auto = confV == "auto"
    val explicitLevel =
      if (auto) -1
      else try confV.toInt catch { case _: NumberFormatException => -1 }
    if (!auto && explicitLevel < 0) return plan
    val minRows =
      try spark.conf.get("spark.graft.celljoin.minRows", "10000").toLong
      catch { case _: NumberFormatException => 10000L }
    val saltBuckets =
      try math.max(1, spark.conf.get("spark.graft.celljoin.saltBuckets", "1").toInt)
      catch { case _: NumberFormatException => 1 }

    def levelFor(left: LogicalPlan, right: LogicalPlan): Int =
      if (!auto) explicitLevel
      else {
        val rows = math.max(estRows(left), estRows(right))
        val lvl = math.ceil(math.log(math.max(rows, 1L).toDouble) / math.log(4.0)).toInt
        math.min(12, math.max(6, lvl))
      }
    def bigEnough(left: LogicalPlan, right: LogicalPlan): Boolean =
      !auto || math.max(estRows(left), estRows(right)) >= minRows

    plan.transformUp {
      case Join(left, right, Inner,
          Some(cond @ GeomBinaryOp(op, lg, rg)), hint)
          if PREDS(op) && bigEnough(left, right) &&
            lg.references.subsetOf(left.outputSet) &&
            rg.references.subsetOf(right.outputSet) &&
            lg.references.nonEmpty && rg.references.nonEmpty =>
        rewrite(left, right, lg, rg, cond, levelFor(left, right), saltBuckets, hint)
      case Join(left, right, Inner,
          Some(cond @ GeomBinaryOp(op, lg, rg)), hint)
          if PREDS(op) && bigEnough(left, right) &&
            lg.references.subsetOf(right.outputSet) &&
            rg.references.subsetOf(left.outputSet) &&
            lg.references.nonEmpty && rg.references.nonEmpty =>
        rewrite(left, right, rg, lg, cond, levelFor(left, right), saltBuckets, hint)
    }
  }

  private def rewrite(left: LogicalPlan, right: LogicalPlan,
                      lg: Expression, rg: Expression, exact: Expression,
                      level: Int, saltBuckets: Int, hint: JoinHint): LogicalPlan = {
    val cellL = AttributeReference("__graft_cell_l", LongType, nullable = false)()
    val cellR = AttributeReference("__graft_cell_r", LongType, nullable = false)()
    // compute each cover ONCE per input row, below the Generate, so the
    // dedup can reference the full arrays without re-covering per pair
    val covLA = Alias(StCellCover(lg, Literal(level)), "__graft_cov_l")()
    val covRA = Alias(StCellCover(rg, Literal(level)), "__graft_cov_r")()
    val projL = Project(left.output :+ covLA, left)
    val projR = Project(right.output :+ covRA, right)
    val genL = Generate(Explode(covLA.toAttribute),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(cellL), child = projL)
    val genR = Generate(Explode(covRA.toAttribute),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(cellR), child = projR)

    // hot-cell salting: extend the equi-key with a left-row-hash salt
    // and replicate the right side per bucket, so one dense cell
    // spreads over saltBuckets shuffle partitions
    val (joinL, joinR, saltEq) =
      if (saltBuckets <= 1) (genL, genR, None)
      else {
        val saltLA = Alias(
          Pmod(new XxHash64(left.output), Literal(saltBuckets.toLong)),
          "__graft_salt_l")()
        val saltedL = Project(genL.output :+ saltLA, genL)
        val saltR = AttributeReference("__graft_salt_r", LongType, nullable = false)()
        val saltedR = Generate(
          Explode(Literal.create((0L until saltBuckets.toLong).toArray,
            ArrayType(LongType, containsNull = false))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(saltR), child = genR)
        (saltedL: LogicalPlan, saltedR: LogicalPlan,
          Some(EqualTo(saltLA.toAttribute, saltR)))
      }

    // dedup before the exact predicate: the exact geometry test then
    // runs once per pair (in its min shared cover cell), not once per
    // shared cell
    val eqKeys = saltEq.foldLeft(EqualTo(cellL, cellR): Expression)(And(_, _))
    val cond = And(
      And(eqKeys,
        EqualTo(cellL, ArrayMin(ArrayIntersect(covLA.toAttribute, covRA.toAttribute)))),
      exact)
    Project((left.output ++ right.output).map(a => a: NamedExpression),
      Join(joinL, joinR, Inner, Some(cond), hint))
  }
}

/** `spark.sql.extensions=graft.plans.GraftSparkExtensions` installs
  * the rewrite into a session at build time; tests can instead add
  * the rule to `spark.experimental.extraOptimizations`.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(s => new CellJoinRule(s))
}
