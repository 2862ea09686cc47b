package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

import graft.functions.{GeomBinaryOp, StCellCover, StRefCell}

/** Logical rewrite: an inner join whose condition is a bare
  * `st_intersects(a.geom, b.geom)` has no equi-key, so Spark plans a
  * BroadcastNestedLoopJoin / cartesian product — quadratic at scale.
  * This rule rewrites it into the cell-partitioned join the
  * SpatialJoins operator builds by hand:
  *
  *   explode(st_cellcover(geom, level)) on each side,
  *   equi-join on the cell id (hash-partitioned shuffle),
  *   refine with the original exact predicate,
  *   keep each pair only in the cell holding its reference point
  *     (min corner of the envelope intersection) — duplicate
  *     elimination without a Distinct, so multiset semantics are
  *     preserved exactly.
  *
  * Opt-in: set `spark.graft.celljoin.level` to the cell level (e.g.
  * 8). Cell covers at that level must stay under the cover cap for
  * the data's geometry sizes — the same contract st_cellcover itself
  * enforces (it throws rather than silently coarsening).
  */
class CellJoinRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val level =
      try spark.conf.get("spark.graft.celljoin.level", "-1").toInt
      catch { case _: NumberFormatException => -1 }
    if (level < 0) return plan
    plan.transformUp {
      case Join(left, right, Inner,
          Some(cond @ GeomBinaryOp("st_intersects", lg, rg)), hint)
          if lg.references.subsetOf(left.outputSet) &&
            rg.references.subsetOf(right.outputSet) &&
            lg.references.nonEmpty && rg.references.nonEmpty =>
        rewrite(left, right, lg, rg, cond, level, hint)
      case Join(left, right, Inner,
          Some(cond @ GeomBinaryOp("st_intersects", lg, rg)), hint)
          if lg.references.subsetOf(right.outputSet) &&
            rg.references.subsetOf(left.outputSet) &&
            lg.references.nonEmpty && rg.references.nonEmpty =>
        rewrite(left, right, rg, lg, cond, level, hint)
    }
  }

  private def rewrite(left: LogicalPlan, right: LogicalPlan,
                      lg: Expression, rg: Expression, exact: Expression,
                      level: Int, hint: JoinHint): LogicalPlan = {
    val cellL = AttributeReference("__graft_cell_l", LongType, nullable = false)()
    val cellR = AttributeReference("__graft_cell_r", LongType, nullable = false)()
    val genL = Generate(Explode(StCellCover(lg, Literal(level))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(cellL), child = left)
    val genR = Generate(Explode(StCellCover(rg, Literal(level))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(cellR), child = right)
    val cond = And(
      And(EqualTo(cellL, cellR), exact),
      EqualTo(cellL, StRefCell(Seq(lg, rg, Literal(level)))))
    Project((left.output ++ right.output).map(a => a: NamedExpression),
      Join(genL, genR, Inner, Some(cond), hint))
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
