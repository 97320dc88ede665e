package graft.core

import org.apache.commons.math3.optim.MaxIter
import org.apache.commons.math3.optim.linear._
import org.apache.commons.math3.optim.nonlinear.scalar.GoalType
import scala.collection.mutable.ArrayBuffer

/** Ground-distance types. Reference behavior: utils/DistanceType.java,
  * utils/DistanceUtil.java:419-474. */
sealed trait GroundDist
object GroundDist {
  case object L1 extends GroundDist
  case object L2 extends GroundDist
  case object L3 extends GroundDist
  final case class Arbitrary(cost: Array[Double]) extends GroundDist // numBins*numBins row-major
}

/** Earth Mover's Distance kernels.
  *
  * All functions take histogram weight arrays plus flattened row-major bin
  * locations (`numBins * dimension` doubles). Weights are normalized to sum
  * 1 on entry when they do not already match, mirroring the reference
  * (utils/DistanceUtil.java:112-117).
  */
object Emd {
  val Epsilon: Double = 1e-4

  /** 1-D EMD over consecutive integer bins 0,1,2,...:
    * sum of |running cumulative difference|.
    * Reference behavior: utils/DistanceUtil.java:40-48. */
  def emd1dInteger(a: Array[Double], b: Array[Double]): Double = {
    var run = 0.0; var total = 0.0; var i = 0
    while (i < a.length) {
      run += a(i) - b(i)
      total += math.abs(run)
      i += 1
    }
    total
  }

  /** 1-D EMD with explicit (possibly unsorted, possibly duplicated) bin
    * positions: integral of |CDF_a - CDF_b|. Normalizes both inputs.
    * Reference behavior: utils/DistanceUtil.java:50-67. */
  def emd1d(a: Array[Double], b: Array[Double], bins: Array[Double]): Double = {
    val ca = HistOps.discreteCdfNormalized(a, bins)
    val cb = HistOps.discreteCdfNormalized(b, bins)
    var total = 0.0; var i = 0
    while (i < ca.length - 1) {
      total += math.abs(ca(i)._2 - cb(i)._2) * (ca(i + 1)._1 - ca(i)._1)
      i += 1
    }
    total
  }

  /** Plain L1 distance between weight arrays.
    * Reference behavior: utils/DistanceUtil.java:93-99. */
  def l1(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += math.abs(a(i) - b(i)); i += 1 }
    s
  }

  /** Ground distance between two d-dim bin locations. */
  def groundDist(bins: Array[Double], dimension: Int, i: Int, j: Int,
                 dist: GroundDist): Double = dist match {
    case GroundDist.Arbitrary(cost) => cost(i * (bins.length / dimension) + j)
    case d =>
      var acc = 0.0; var k = 0
      while (k < dimension) {
        val diff = math.abs(bins(i * dimension + k) - bins(j * dimension + k))
        acc += (d match {
          case GroundDist.L1 => diff
          case GroundDist.L2 => diff * diff
          case GroundDist.L3 => diff * diff * diff
          case _             => diff
        })
        k += 1
      }
      d match {
        case GroundDist.L1 => acc
        case GroundDist.L2 => math.sqrt(acc)
        case GroundDist.L3 => math.cbrt(acc)
        case _             => acc
      }
  }

  /** Precompute the full numBins x numBins cost matrix. */
  def costMatrix(bins: Array[Double], dimension: Int, dist: GroundDist): Array[Double] = {
    dist match {
      case GroundDist.Arbitrary(c) => c
      case _ =>
        val n = bins.length / dimension
        val out = new Array[Double](n * n)
        var i = 0
        while (i < n) {
          var j = 0
          while (j < n) {
            out(i * n + j) = groundDist(bins, dimension, i, j, dist)
            j += 1
          }
          i += 1
        }
        out
    }
  }

  /** True iff the n x n cost matrix is a metric: zero diagonal, symmetric,
    * and triangle inequality c(i,k) <= c(i,j) + c(j,k) for all triples
    * (1e-9 slack for fp round-off). O(n^3), n <= 64 in practice — cheap
    * one-time guard for operators whose pruning needs metric EMD
    * (MrSimJoin pivot hyperplanes, Emd.exact's net-flow reduction). */
  def isMetricCost(cost: Array[Double], n: Int): Boolean = {
    var i = 0
    while (i < n) {
      if (math.abs(cost(i * n + i)) > 1e-12) return false
      var j = 0
      while (j < n) {
        if (math.abs(cost(i * n + j) - cost(j * n + i)) > 1e-9) return false
        j += 1
      }
      i += 1
    }
    i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        val cij = cost(i * n + j)
        var k = 0
        while (k < n) {
          if (cost(i * n + k) > cij + cost(j * n + k) + 1e-9) return false
          k += 1
        }
        j += 1
      }
      i += 1
    }
    true
  }

  /** Exact EMD = balanced transportation problem, solved by successive
    * shortest augmenting paths with Johnson potentials (dense Dijkstra).
    * Exact optimum for the min-cost flow LP; property-tested equal to the
    * reference's simplex formulation (utils/DistanceUtil.java:112-146).
    * Hot-path solver: O((n+m) * n*m) worst case, microseconds at n<=64.
    *
    * IMPORTANT: uses the net-flow reduction (only surplus mass moves),
    * which equals the full transportation optimum ONLY for ground costs
    * satisfying the triangle inequality (L1/L2/L3 are fine). For arbitrary
    * cost matrices (e.g. min-linkage reduced costs) use exactGeneral. */
  def exact(histA: Array[Double], histB: Array[Double], cost: Array[Double]): Double = {
    val n = histA.length
    val a = HistOps.normalize(histA)
    val b = HistOps.normalize(histB)
    // supply = surplus of a over b per bin; demand = deficit. Net-flow
    // formulation (mass shared in place moves for free) — identical optimum
    // to the reference's transshipment constraints.
    val supplyIdx = new ArrayBuffer[Int](n); val supplyAmt = new ArrayBuffer[Double](n)
    val demandIdx = new ArrayBuffer[Int](n); val demandAmt = new ArrayBuffer[Double](n)
    var i = 0
    while (i < n) {
      val d = a(i) - b(i)
      if (d > 1e-15) { supplyIdx += i; supplyAmt += d }
      else if (d < -1e-15) { demandIdx += i; demandAmt += -d }
      i += 1
    }
    if (supplyIdx.isEmpty) return 0.0
    transport(supplyAmt.toArray, demandAmt.toArray,
      (si, dj) => cost(supplyIdx(si) * n + demandIdx(dj)))
  }

  /** Exact EMD for ARBITRARY non-negative cost matrices: solves the full
    * transportation problem (every bin is both a source with mass a_i and
    * a sink with mass b_i, diagonal assumed zero-cost), which permits the
    * pass-through routings that the net-flow reduction forbids. Matches
    * the reference LP formulation exactly (outflow<=a, inflow<=b, net
    * equality — utils/DistanceUtil.java:129-141). */
  def exactGeneral(histA: Array[Double], histB: Array[Double], cost: Array[Double]): Double = {
    val n = histA.length
    val a = HistOps.normalize(histA)
    val b = HistOps.normalize(histB)
    transport(a, b, (i, j) => cost(i * n + j))
  }

  /** Balanced transportation min-cost via successive shortest augmenting
    * paths with Johnson potentials (dense Dijkstra over the bipartite
    * residual graph). Forward edges s->d are uncapacitated with cost
    * c(s,d); residual edges d->s exist while f(s,d) > 0 with cost -c(s,d).
    * supplies sum == demands sum (caller guarantees up to fp noise). */
  def transport(supply: Array[Double], demand: Array[Double],
                cost: (Int, Int) => Double): Double = {
    val n = supply.length; val m = demand.length
    val remS = supply.clone(); val remD = demand.clone()
    val potS = new Array[Double](n); val potD = new Array[Double](m)
    val distS = new Array[Double](n); val distD = new Array[Double](m)
    val visS = new Array[Boolean](n); val visD = new Array[Boolean](m)
    val prevOfD = new Array[Int](m) // source s whose edge s->d relaxed d
    val prevOfS = new Array[Int](n) // demand d whose residual edge d->s relaxed s (-1 = origin)
    val flow = Array.ofDim[Double](n, m)
    var totalCost = 0.0
    var remaining = remS.sum

    while (remaining > 1e-12) {
      java.util.Arrays.fill(distS, Double.MaxValue)
      java.util.Arrays.fill(distD, Double.MaxValue)
      java.util.Arrays.fill(visS, false)
      java.util.Arrays.fill(visD, false)
      java.util.Arrays.fill(prevOfS, -1)
      var k = 0
      while (k < n) { if (remS(k) > 1e-15) distS(k) = 0.0; k += 1 }
      var targetD = -1
      var searching = true
      while (searching) {
        var best = Double.MaxValue; var bi = -1; var side = 0
        k = 0
        while (k < n) { if (!visS(k) && distS(k) < best) { best = distS(k); bi = k; side = 0 }; k += 1 }
        k = 0
        while (k < m) { if (!visD(k) && distD(k) < best) { best = distD(k); bi = k; side = 1 }; k += 1 }
        if (bi < 0) searching = false
        else if (side == 0) {
          visS(bi) = true
          var j = 0
          while (j < m) {
            if (!visD(j)) {
              val nd = distS(bi) + (cost(bi, j) - potS(bi) + potD(j))
              if (nd < distD(j)) { distD(j) = nd; prevOfD(j) = bi }
            }
            j += 1
          }
        } else {
          visD(bi) = true
          if (remD(bi) > 1e-15) { targetD = bi; searching = false }
          else {
            var s = 0
            while (s < n) {
              if (!visS(s) && flow(s)(bi) > 1e-15) {
                val nd = distD(bi) - (cost(s, bi) - potS(s) + potD(bi))
                if (nd < distS(s)) { distS(s) = nd; prevOfS(s) = bi }
              }
              s += 1
            }
          }
        }
      }
      if (targetD < 0) return totalCost // numerically exhausted
      // update potentials, capping at the target's distance (standard early-
      // termination rule keeping all residual reduced costs non-negative)
      val cap = distD(targetD)
      k = 0
      while (k < n) { potS(k) -= math.min(distS(k), cap); k += 1 }
      k = 0
      while (k < m) { potD(k) -= math.min(distD(k), cap); k += 1 }
      // reconstruct path d <- s <- d' <- s' ... back to an origin source
      var pathD = targetD
      var bottleneck = remD(targetD)
      var s = prevOfD(pathD)
      var atOrigin = prevOfS(s) == -1
      while (!atOrigin) {
        val dPrev = prevOfS(s)
        if (flow(s)(dPrev) < bottleneck) bottleneck = flow(s)(dPrev)
        s = prevOfD(dPrev)
        atOrigin = prevOfS(s) == -1
      }
      if (remS(s) < bottleneck) bottleneck = remS(s)
      // apply augmentation along the same path
      pathD = targetD
      var cur = prevOfD(pathD)
      flow(cur)(pathD) += bottleneck
      totalCost += bottleneck * cost(cur, pathD)
      while (prevOfS(cur) != -1) {
        val dPrev = prevOfS(cur)
        flow(cur)(dPrev) -= bottleneck
        totalCost -= bottleneck * cost(cur, dPrev)
        cur = prevOfD(dPrev)
        flow(cur)(dPrev) += bottleneck
        totalCost += bottleneck * cost(cur, dPrev)
      }
      remS(cur) -= bottleneck
      remD(targetD) -= bottleneck
      remaining -= bottleneck
    }
    totalCost
  }

  /** Exact EMD via commons-math3 SimplexSolver with the reference's exact
    * constraint formulation — the correctness oracle for `exact`.
    * Reference behavior: utils/DistanceUtil.java:112-146. */
  def exactSimplex(histA: Array[Double], histB: Array[Double], dimension: Int,
                   bins: Array[Double], dist: GroundDist): Double = {
    val a = HistOps.normalize(histA)
    val b = HistOps.normalize(histB)
    val n = bins.length / dimension
    require(n == a.length && a.length == b.length, "histogram/bin arity mismatch")
    val cost = costMatrix(bins, dimension, dist)
    val constraints = new java.util.ArrayList[LinearConstraint]()
    var i = 0
    while (i < n) {
      val flowFrom = new Array[Double](n * n)
      val flowTo = new Array[Double](n * n)
      var j = 0
      while (j < n) { flowFrom(i * n + j) = 1.0; flowTo(j * n + i) = 1.0; j += 1 }
      constraints.add(new LinearConstraint(flowFrom, Relationship.LEQ, a(i)))
      constraints.add(new LinearConstraint(flowTo, Relationship.LEQ, b(i)))
      val net = new Array[Double](n * n)
      j = 0
      while (j < n * n) { net(j) = flowFrom(j) - flowTo(j); j += 1 }
      if (a(i) - b(i) > 0)
        constraints.add(new LinearConstraint(net, Relationship.EQ, a(i) - b(i)))
      else {
        j = 0
        while (j < n * n) { net(j) = -net(j); j += 1 }
        constraints.add(new LinearConstraint(net, Relationship.EQ, b(i) - a(i)))
      }
      i += 1
    }
    val solver = new SimplexSolver(Epsilon, 10)
    val sol = solver.optimize(
      new LinearObjectiveFunction(cost, 0),
      new LinearConstraintSet(constraints),
      new NonNegativeConstraint(true),
      GoalType.MINIMIZE, new MaxIter(5000))
    sol.getValue
  }

  /** Independent-minimization lower bound: relax the transportation LP by
    * dropping inbound-capacity constraints for non-surplus bins.
    * Closed form: each unit of surplus at bin i flows to its cheapest
    * other bin — sum_i max(a_i - b_i, 0) would overshoot; the reference LP
    * keeps outflow <= a_i and net-flow equality only for surplus bins, so
    * the optimum routes surplus (a_i - b_i) to argmin_j cost(i,j), j != i.
    * Reference behavior: utils/DistanceUtil.java:148-182.
    */
  def indMin(histA: Array[Double], histB: Array[Double], cost: Array[Double]): Double = {
    val a = HistOps.normalize(histA)
    val b = HistOps.normalize(histB)
    val n = a.length
    var total = 0.0
    var i = 0
    while (i < n) {
      val surplus = a(i) - b(i)
      if (surplus > 0) {
        var minC = Double.MaxValue
        var j = 0
        while (j < n) {
          if (j != i && cost(i * n + j) < minC) minC = cost(i * n + j)
          j += 1
        }
        total += surplus * minC
      }
      i += 1
    }
    total
  }

  /** Rubner lower bound between two records: ground distance between their
    * centroids. Reference behavior: utils/DistanceUtil.java:184-219. */
  def rubner(histA: Array[Double], histB: Array[Double], dimension: Int,
             bins: Array[Double], dist: GroundDist): Double = {
    val ra = HistOps.rubnerValue(histA, dimension, bins)
    val rb = HistOps.rubnerValue(histB, dimension, bins)
    var acc = 0.0
    var i = 0
    while (i < dimension) {
      val diff = math.abs(ra(i) - rb(i))
      acc += (dist match {
        case GroundDist.L1 => diff
        case GroundDist.L2 => diff * diff
        case GroundDist.L3 => diff * diff * diff
        case _             => diff * diff
      })
      i += 1
    }
    dist match {
      case GroundDist.L1 => acc
      case GroundDist.L3 => math.cbrt(acc)
      case _             => math.sqrt(acc)
    }
  }

  /** Rubner box bound: minimum ground distance from a record's centroid to
    * the axis-aligned bounding box [lo, hi] of a cell's centroids — the
    * clamped box distance, generalizing the reference's 27-case d=3
    * analysis (utils/DistanceUtil.java:232-417). */
  def rubnerBox(r: Array[Double], lo: Array[Double], hi: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < r.length) {
      val d = if (r(i) < lo(i)) lo(i) - r(i) else if (r(i) > hi(i)) r(i) - hi(i) else 0.0
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  /** Greedy-flow upper bound: route each source bin's mass (heaviest bin
    * first) to the nearest destination bins with remaining capacity.
    * Always a feasible flow, hence >= exact EMD.
    * Reference behavior: utils/HistUtil.java:606-639. */
  def greedyFlow(histA: Array[Double], histB: Array[Double],
                 nearest: Array[Array[Int]], cost: Array[Double]): Double = {
    val n = histA.length
    val a = HistOps.normalize(histA)
    val b = HistOps.normalize(histB)
    val filled = new Array[Double](n)
    // heaviest-first order of A's bins (ties by index, reference Bin.compareTo)
    val order = Array.range(0, n).sortBy(i => (-a(i), i))
    var flow = 0.0
    var oi = 0
    while (oi < n) {
      val i = order(oi)
      var w = a(i)
      var k = 0
      val near = nearest(i)
      while (k < n && w > 0) {
        val j = near(k)
        val space = b(j) - filled(j)
        if (space > 0) {
          val f = math.min(w, space)
          flow += f * cost(i * n + j)
          w -= f
          filled(j) += f
        }
        k += 1
      }
      oi += 1
    }
    flow
  }

  /** Per-source-bin nearest-destination orderings (ascending ground dist,
    * ties by index). Reference behavior: utils/HistUtil.java:670-689. */
  def nearestOrders(cost: Array[Double], n: Int): Array[Array[Int]] =
    Array.tabulate(n)(i => Array.range(0, n).sortBy(j => (cost(i * n + j), j)))

  /** Max-flow upper bound: every unit of mass travels to the farthest bin.
    * Reference behavior: utils/HistUtil.java:578-604. */
  def maxFlow(hist: Array[Double], cost: Array[Double]): Double = {
    val n = hist.length
    var total = 0.0
    var i = 0
    while (i < n) {
      var mx = 0.0
      var j = 0
      while (j < n) { if (cost(i * n + j) > mx) mx = cost(i * n + j); j += 1 }
      total += hist(i) * mx
      i += 1
    }
    total
  }
}
