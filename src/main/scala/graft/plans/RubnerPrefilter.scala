package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.{Emd1d, Rubner1d}

/** Optimizer rule: graft the melody pruning cascade into plain SQL.
  *
  * A filter `graft_emd1d(a, b) <= tau` is rewritten to
  * `graft_rubner1d(a, b) <= tau + slack AND graft_emd1d(a, b) <= tau`.
  * Rubner (centroid distance) lower-bounds EMD, and `And` short-circuits
  * left-to-right in both interpreted and generated code, so candidates
  * rejected by the cheap two-fold bound never run the EMD fold — the same
  * cheap-bound-first cascade the melody join engine applies internally
  * (reference behavior: mr/normal/QNEProcessReducer.java pruning chain),
  * here surfaced as a Catalyst rewrite any user query benefits from.
  *
  * Soundness: mathematically rubner <= emd, so the added conjunct never
  * drops a qualifying row. Both sides are evaluated in floating point,
  * though, and an FP-computed lower bound could exceed the FP-computed
  * EMD by a few ulps when the two are nearly equal; `Slack` (1e-9, orders
  * above any n-term double accumulation error on normalized histograms,
  * orders below the repo's >=1e-6 threshold-boundary-gap convention)
  * keeps such marginal rows flowing through to the exact test. The
  * rewrite therefore never changes results, only evaluation cost.
  *
  * Idempotence (the rule runs inside fixed-point batches, and may be
  * installed twice — session extensions + experimental): a filter whose
  * condition already contains a [[Rubner1d]] is left untouched. This also
  * skips user-written rubner guards rather than stacking a redundant one.
  */
case class RubnerPrefilter() extends Rule[LogicalPlan] {

  private val Slack = 1e-9

  private def guarded(emd: Emd1d, tau: Double, original: Expression): Expression =
    And(LessThanOrEqual(Rubner1d(emd.left, emd.right), Literal(tau + Slack)), original)

  /** Rewrite eligible when an EMD threshold appears and no rubner guard
    * (ours or user-written) is present yet. */
  private def eligible(cond: Expression): Boolean =
    cond.exists(_.isInstanceOf[Emd1d]) && !cond.exists(_.isInstanceOf[Rubner1d])

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case c @ LessThanOrEqual(e: Emd1d, Literal(tau: Double, DoubleType)) =>
      guarded(e, tau, c)
    case c @ LessThan(e: Emd1d, Literal(tau: Double, DoubleType)) =>
      guarded(e, tau, c)
    case c @ GreaterThanOrEqual(Literal(tau: Double, DoubleType), e: Emd1d) =>
      guarded(e, tau, c)
    case c @ GreaterThan(Literal(tau: Double, DoubleType), e: Emd1d) =>
      guarded(e, tau, c)
  }

  // Both homes of a pushed-down predicate are covered: a standalone
  // Filter, and a Join whose condition PushPredicateThroughJoin has
  // already merged the threshold into.
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) if eligible(cond) =>
      val r = rewrite(cond)
      if (r fastEquals cond) f else f.copy(condition = r)
    case j @ Join(_, _, _, Some(cond), _) if eligible(cond) =>
      val r = rewrite(cond)
      if (r fastEquals cond) j else j.copy(condition = Some(r))
  }
}
