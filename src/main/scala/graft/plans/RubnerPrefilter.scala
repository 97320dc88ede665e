package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, Add, And, Cast, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, Multiply, Size, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.{Emd1d, MassDiff1d, Rubner1d}

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
  * Soundness — the rule fires on ARBITRARY user SQL, so the guard must
  * be valid for arbitrary inputs, not just the engine's normalized
  * histograms:
  *
  *  - equal mass: mathematically rubner <= emd (centroid distance
  *    lower-bounds transport cost), so the conjunct never drops a
  *    qualifying row;
  *  - unequal mass (sum(a) != sum(b)): the premise FAILS — by Abel
  *    summation, sum_i i*(a_i-b_i) = sum_{j<n-1}(P_{n-1} - P_j) with P
  *    the prefix sums, so the moment difference can exceed
  *    emd = sum|P_j| by up to (n-1)*|P_{n-1}| = (n-1)*|massDiff|.
  *    The guard's budget therefore ADDS `(n-1) * |graft_massdiff1d|`:
  *    exactly the worst-case excess, zero for equal-mass rows (the
  *    optimization is undiminished there), self-relaxing otherwise —
  *    never a dropped row either way (spec: unequal-mass rewrite
  *    equivalence);
  *  - floating point: both folds accumulate with RELATIVE error
  *    (~n*2^-53 of the running magnitude — absolute error grows with
  *    count-scale weights), so the fixed `Slack` (1e-9) is topped up
  *    with relative terms: the computed rubner is shrunk by `RelSlack`
  *    and the threshold grows by `|tau| * RelSlack` (1e-12, orders above
  *    the worst n*2^-53 for any plausible n, orders below the repo's
  *    >=1e-6 boundary-gap convention). Marginal rows flow through to
  *    the exact test; the rewrite changes evaluation cost only.
  *
  * Idempotence (the rule runs inside fixed-point batches, and may be
  * installed twice — session extensions + experimental): a filter whose
  * condition already contains a [[Rubner1d]] is left untouched. This also
  * skips user-written rubner guards rather than stacking a redundant one.
  */
case class RubnerPrefilter() extends Rule[LogicalPlan] {

  private val Slack = 1e-9
  private val RelSlack = 1e-12

  private def guarded(emd: Emd1d, tau: Double, original: Expression): Expression = {
    val massBudget = Multiply(
      Cast(Subtract(Size(emd.left, legacySizeOfNull = false), Literal(1)), DoubleType),
      Abs(MassDiff1d(emd.left, emd.right)))
    val allow = Add(Literal(tau + Slack + math.abs(tau) * RelSlack), massBudget)
    val bound = Multiply(Rubner1d(emd.left, emd.right), Literal(1.0 - RelSlack))
    And(LessThanOrEqual(bound, allow), original)
  }

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
