package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.functions.SparkTestSession

/** Whole-suite plan gate: NO query in SparkEntry.queries may plan a
  * CartesianProduct or BroadcastNestedLoopJoin — the two shapes that
  * are quietly quadratic in row count and sink a 100-TB scale-up —
  * except the explicitly whitelisted brute-force baselines whose
  * all-pairs semantics is the point.
  */
class PlanSweepSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  // Every entry is an INTENTIONAL all-pairs shape over a bounded side:
  // - q39: exact cosine top-k oracle — broadcast cross join of 8 query
  //   vectors against the corpus (the ANN brute-force baseline).
  // - q06/q15/q16/q71: explicit crossJoin matrices of the 25-nation x
  //   100-supplier box sets — the full predicate/overlay matrix IS the
  //   oracle's deliverable.
  // - q01/q03: point-in-polygon joins expressed as plain broadcast
  //   joins with a spatial predicate — Spark plans
  //   BroadcastNestedLoopJoin, which at a 25-row broadcast side is the
  //   canonical streaming probe (big side scans once, never shuffles;
  //   per-row cost 25 codegen'd envelope tests). The prepared-R-tree
  //   operator (q05) and the cell-join rule (q63/q75) are the shapes
  //   for larger dimension tables.
  // - q136/q142/q148/q176/q177/q178: BM25, PMI, the temperature
  //   sampler, int8 quantization, the training-mix capstone and the
  //   PSI drift monitor join rows against a ONE-row corpus-statistics
  //   aggregate (N / avgdl / per-term df / Σweights / per-dim min-max
  //   arrays / totals) — a scalar broadcast, O(n·1); the nested
  //   "loop" has exactly one iteration.
  private val whitelist = Set(
    "q39_cosine_topk",
    "q06_relate_pred_matrix", "q15_clip_area", "q16_intersection_area",
    "q71_predicate_tail",
    "q01_pip_contains_join", "q03_covers_count",
    "q136_bm25", "q142_pmi", "q148_temperature_mix", "q154_vocab_coverage",
    "q176_int8_quantize", "q177_training_mix", "q178_quality_drift",
    "q181_tfidf_keywords")

  test("no query plans a cartesian product or nested-loop join") {
    val spark = SparkTestSession.spark
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, sf).queryExecution.executedPlan.toString()
          catch { case e: Throwable => fail(s"$name failed to plan: $e") }
        val bad =
          (plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin")) &&
            !whitelist.contains(name)
        if (bad) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"quadratic join shapes planned in: ${offenders.mkString(", ")}")
  }
}
