package graft.core

import scala.util.Random

/** Dimensionality-reduction lower bound for EMD: randomly merge the
  * `numBins` original bins into `reducedDim` super-bins, give each
  * super-bin pair the MINIMUM ground distance across merged members
  * (min-linkage — this is what makes the reduced EMD a lower bound), then
  * compute exact EMD on the reduced histograms with that cost matrix.
  *
  * The reference seeds `Random` implicitly (unseeded, nondeterministic —
  * utils/ReductionBound.java:11,20); this rebuild takes an explicit seed so
  * results are reproducible.
  *
  * Reference behavior: utils/ReductionBound.java:13-110.
  */
final class ReductionBound(numBins: Int, reducedDim: Int, bins: Array[Double],
                           dimension: Int, seed: Long,
                           dist: GroundDist = GroundDist.L2) extends Serializable {
  /** assignment(i) = super-bin of original bin i */
  val assignment: Array[Int] = {
    val rnd = new Random(seed)
    Array.fill(numBins)(rnd.nextInt(reducedDim))
  }

  val reducedCost: Array[Double] = {
    val cost = Emd.costMatrix(bins, dimension, dist)
    val out = Array.fill(reducedDim * reducedDim)(Double.MaxValue)
    var i = 0
    while (i < reducedDim) { out(i * reducedDim + i) = 0.0; i += 1 }
    i = 0
    while (i < numBins) {
      var j = 0
      while (j < numBins) {
        val ri = assignment(i); val rj = assignment(j)
        if (ri != rj) {
          val c = cost(i * numBins + j)
          if (c < out(ri * reducedDim + rj)) out(ri * reducedDim + rj) = c
        }
        j += 1
      }
      i += 1
    }
    // super-bins with no members: distance never used, zero them for safety
    var k = 0
    while (k < out.length) { if (out(k) == Double.MaxValue) out(k) = 0.0; k += 1 }
    out
  }

  def reduce(hist: Array[Double]): Array[Double] = {
    val out = new Array[Double](reducedDim)
    var i = 0
    while (i < numBins) { out(assignment(i)) += hist(i); i += 1 }
    out
  }

  /** Lower bound: exact EMD between reduced histograms under min-linkage
    * reduced costs. Min-linkage costs violate the triangle inequality, so
    * this MUST use the general transportation solver (pass-through
    * routings allowed) — the net-flow fast path would overestimate and
    * break bound validity. Reference: ReductionBound.getReducedEmd:57-69. */
  def reducedEmd(histA: Array[Double], histB: Array[Double]): Double =
    Emd.exactGeneral(reduce(histA), reduce(histB), reducedCost)
}
