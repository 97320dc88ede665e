package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{CubeKR, Emd, GroundDist}
import graft.sources.Fixtures

/** The KR closed form's constants cannot be taken on faith — this spec
  * re-proves what the enumeration promised.
  *
  * Soundness (max-over-vertices <= EMD) needs every stored vertex to be
  * a feasible 1-Lipschitz potential; completeness (>= EMD) needs the
  * true dual optimum to be IN the set. Feasibility is checked directly
  * below. Completeness is checked functionally: equality with the
  * independent SSP solver exhaustively on all small integer histograms
  * and by seeded property on fixture-sized ones — a missing vertex
  * would make the closed form strictly smaller than the LP somewhere,
  * and the exhaustive sweep covers every surplus/deficit support
  * pattern on the cube (the structure that determines which vertex is
  * optimal), so the functional check is not just sampling noise. */
class CubeKRSpec extends AnyFunSuite {

  private val cost3d =
    Emd.costMatrix(Fixtures.Bins3d, Fixtures.Dim3, GroundDist.L2)

  private def ham(i: Int, j: Int): Int = Integer.bitCount(i ^ j)

  test("vertex table shape: 709 rows, coefficients in [-2,2], pi_0 = 0") {
    assert(CubeKR.Vertices.length === CubeKR.NumVertices)
    for (row <- CubeKR.Vertices) {
      assert(row.length === 24)
      assert(row.forall(c => c >= -2 && c <= 2))
      // normalization pin: component 0 is (A,B,C) = (0,0,0)
      assert(row(0) === 0 && row(8) === 0 && row(16) === 0)
    }
    assert(CubeKR.PrefilterIdx.forall(i => i >= 0 && i < CubeKR.NumVertices))
    assert(CubeKR.PrefilterIdx.distinct.length === CubeKR.PrefilterIdx.length)
  }

  test("every vertex is a feasible 1-Lipschitz potential (soundness)") {
    // |pi_i - pi_j| <= sqrt(ham(i,j)) for all corner pairs. Components
    // are A + B*sqrt2 + C*sqrt3 with |A|,|B|,|C| <= 4 after differencing;
    // a violated constraint differs from the bound by an algebraic
    // number with small integer coefficients, which the field-norm
    // bound keeps >= ~1e-7 — double arithmetic with 1e-9 tolerance
    // therefore decides feasibility exactly.
    for (row <- CubeKR.Vertices) {
      val pi = Array.tabulate(8)(i =>
        row(i).toDouble + row(8 + i) * CubeKR.Sqrt2 + row(16 + i) * CubeKR.Sqrt3)
      for (i <- 0 until 8; j <- (i + 1) until 8) {
        val lim = math.sqrt(ham(i, j).toDouble)
        assert(math.abs(pi(i) - pi(j)) <= lim + 1e-9,
          s"vertex violates |pi($i)-pi($j)| <= sqrt(${ham(i, j)}): ${row.mkString(",")}")
      }
    }
  }

  test("closed form equals SSP exact EMD exhaustively on small histograms") {
    // all integer count vectors with total in [1,2] (44 vectors) paired
    // both ways: covers every surplus/deficit support pattern with up
    // to 2 moving units — the regime where a wrong/missing vertex
    // shows up as a strict gap.
    val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    for (i <- 0 until 8) {
      vecs += Array.tabulate(8)(k => if (k == i) 1L else 0L)
      vecs += Array.tabulate(8)(k => if (k == i) 2L else 0L)
      for (j <- (i + 1) until 8)
        vecs += Array.tabulate(8)(k => if (k == i || k == j) 1L else 0L)
    }
    assert(vecs.length === 44)
    for (ca <- vecs; cb <- vecs) {
      val ta = ca.sum; val tb = cb.sum
      val kr = CubeKR.emd(ca, ta, cb, tb)
      val ssp = Emd.exact(ca.map(_.toDouble), cb.map(_.toDouble), cost3d)
      assert(math.abs(kr - ssp) <= 1e-9,
        s"KR=$kr SSP=$ssp for ${ca.mkString(",")} vs ${cb.mkString(",")}")
    }
  }

  test("closed form equals SSP and simplex on seeded fixture-sized histograms") {
    val rng = new scala.util.Random(20260816L)
    for (_ <- 0 until 400) {
      val ca = Array.fill(8)(rng.nextInt(12).toLong)
      val cb = Array.fill(8)(rng.nextInt(12).toLong)
      if (ca.sum > 0 && cb.sum > 0) {
        val kr = CubeKR.emd(ca, ca.sum, cb, cb.sum)
        val ssp = Emd.exact(ca.map(_.toDouble), cb.map(_.toDouble), cost3d)
        assert(math.abs(kr - ssp) <= 1e-9, s"KR=$kr SSP=$ssp")
      }
    }
    // a thinner simplex pass (commons-math3 shares no code with either)
    for (_ <- 0 until 25) {
      val ca = Array.fill(8)(rng.nextInt(20).toLong)
      val cb = Array.fill(8)(rng.nextInt(20).toLong)
      if (ca.sum > 0 && cb.sum > 0) {
        val kr = CubeKR.emd(ca, ca.sum, cb, cb.sum)
        val sx = Emd.exactSimplex(ca.map(_.toDouble), cb.map(_.toDouble),
          Fixtures.Dim3, Fixtures.Bins3d, GroundDist.L2)
        assert(math.abs(kr - sx) <= 1e-6, s"KR=$kr simplex=$sx")
      }
    }
  }

  test("scaled-integer invariance: emd is independent of count scaling") {
    val rng = new scala.util.Random(7L)
    for (_ <- 0 until 50) {
      val ca = Array.fill(8)(rng.nextInt(9).toLong)
      val cb = Array.fill(8)(rng.nextInt(9).toLong)
      if (ca.sum > 0 && cb.sum > 0) {
        val d1 = CubeKR.emd(ca, ca.sum, cb, cb.sum)
        val d2 = CubeKR.emd(ca.map(_ * 3), ca.sum * 3, cb.map(_ * 5), cb.sum * 5)
        assert(math.abs(d1 - d2) <= 1e-12)
      }
    }
  }

  test("SQL fragments bind the same table the evaluator uses") {
    val values = CubeKR.sqlVertexValues
    assert(values.linesIterator.size === CubeKR.NumVertices)
    // spot-check one row's text against the decoded coefficients
    val first = values.linesIterator.next()
    assert(first === "(" + CubeKR.Vertices(0).mkString(",") + "),")
    val pf = CubeKR.sqlPrefilterMax
    // n0 never appears: component 0 is the pi_0 = 0 normalization pin
    assert(pf.startsWith("greatest(") && pf.contains("sqrt(2.0)") &&
      pf.contains("n1") && !pf.contains("n0") &&
      CubeKR.PrefilterIdx.length === 24)
  }
}
