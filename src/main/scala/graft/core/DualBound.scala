package graft.core

import org.apache.commons.math3.optim.MaxIter
import org.apache.commons.math3.optim.linear._
import org.apache.commons.math3.optim.nonlinear.scalar.GoalType

/** Dual-feasible-solution lower bound for EMD.
  *
  * Construction solves, once per sampled pair (a, b), the LP dual of the
  * transportation problem: maximize sum a_i*phi_i + sum b_j*psi_j subject to
  * phi_i + psi_j <= d(i, j), variables unconstrained in sign. Any feasible
  * (phi, psi) yields, for EVERY pair (x, y), the lower bound
  * key(x) + ckey(y) <= EMD(x, y) where key(h) = h . phi, ckey(h) = h . psi.
  *
  * Reference behavior: utils/DualBound.java:28-143.
  *
  * @param phi dual weights for the "from" side (length numBins)
  * @param psi dual weights for the "to" side (length numBins)
  */
final case class DualBound(phi: Array[Double], psi: Array[Double]) extends Serializable {
  val min: Double = {
    var m = Double.MaxValue
    var i = 0
    while (i < phi.length) { if (phi(i) + psi(i) < m) m = phi(i) + psi(i); i += 1 }
    m
  }

  def key(hist: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < phi.length) { s += hist(i) * phi(i); i += 1 }
    s
  }

  def ckey(hist: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < psi.length) { s += hist(i) * psi(i); i += 1 }
    s
  }

  /** Pairwise lower bound: max of the two orientations.
    * Reference behavior: DualBound.getDualEmd:71-80. */
  def dualEmd(histA: Array[Double], histB: Array[Double]): Double =
    math.max(key(histA) + ckey(histB), key(histB) + ckey(histA))

  /** Candidate key-range for cell pruning at a given threshold:
    * a cell with key range [minKey, maxKey] can contain a match for `hist`
    * only if [min + key(hist) - threshold, threshold - ckey(hist)]
    * intersects it. Reference behavior: DualBound.getRange:64-69. */
  def range(hist: Array[Double], threshold: Double): (Double, Double) =
    (min + key(hist) - threshold, threshold - ckey(hist))
}

object DualBound {
  /** Build a dual bound from one histogram pair by solving the dual LP.
    * Reference behavior: utils/DualBound.java:88-115. */
  def fromPair(histA: Array[Double], histB: Array[Double], dimension: Int,
               bins: Array[Double]): DualBound = {
    val a = HistOps.normalize(histA)
    val b = HistOps.normalize(histB)
    val n = bins.length / dimension
    val constraints = new java.util.ArrayList[LinearConstraint]()
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        val c = new Array[Double](2 * n)
        c(i) = 1.0
        c(n + j) = 1.0
        constraints.add(new LinearConstraint(c,
          Relationship.LEQ, Emd.groundDist(bins, dimension, i, j, GroundDist.L2)))
        j += 1
      }
      i += 1
    }
    val objective = new Array[Double](2 * n)
    i = 0
    while (i < n) { objective(i) = a(i); objective(n + i) = b(i); i += 1 }
    val solver = new SimplexSolver(1e-4, 10)
    val sol = solver.optimize(
      new LinearObjectiveFunction(objective, 0),
      new LinearConstraintSet(constraints),
      new NonNegativeConstraint(false),
      GoalType.MAXIMIZE, new MaxIter(500))
    val p = sol.getPoint
    DualBound(p.slice(0, n), p.slice(n, 2 * n))
  }
}
