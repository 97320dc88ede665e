package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Engine-vs-oracle equivalence: the grid-pruned melody join must emit
  * exactly the same pair set as the brute-force baseline (the reference's
  * four engines are answer-equivalent — SURVEY.md §5.2). */
class MelodyJoinSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("melody-join-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def cfg3d = MelodyJoin.Config(
    dimension = 3,
    bins = graft.sources.Fixtures.Bins3d,
    vectors = Array(
      Array(1.0, 1.0, 1.0),
      Array(1.0, -1.0, 0.0),
      Array(1.0, 1.0, -2.0)),
    numDuals = 4, numReductions = 4, reducedDim = 4)

  private def randomHists(n: Int, numBins: Int, seed: Long) = {
    val rnd = new Random(seed)
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    (0 until n).map { i =>
      (i.toLong, Array.fill(numBins)(rnd.nextDouble()))
    }.toDF("id", "weights")
  }

  test("melody threshold join == baseline on random histograms") {
    val hists = randomHists(120, 8, seed = 7)
    val theta = 0.35
    val base = BaselineJoin.thresholdJoin(spark, hists, theta, cfg3d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val melody = MelodyJoin.thresholdJoin(spark, hists, theta, cfg3d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(base.nonEmpty, "oracle produced no pairs - bad test setup")
    val missed = base -- melody
    val extra = melody -- base
    assert(missed.isEmpty, s"melody missed ${missed.size} pairs: ${missed.take(5)}")
    assert(extra.isEmpty, s"melody emitted ${extra.size} non-pairs: ${extra.take(5)}")
  }

  test("flat pre-filter enumeration == full object scan per record") {
    // the SummaryIndex skips only cells whose combo ordering / dual
    // ranges / rubner coord-0 band the body would reject — assert the
    // per-record combo ARRAYS (not just the pair set) are identical
    // between the indexed path and the null-index full scan
    val hists = randomHists(150, 8, seed = 23)
    val cfg = cfg3d
    val theta = 0.35
    val prep = MelodyJoin.prepare(spark, hists, cfg)
    val env = MelodyJoin.cellEnvelopesPublic(prep.summaries, cfg)
    val idx = new MelodyJoin.SummaryIndex(prep.summaries)
    val gap = prep.tree.map(_.distortion * theta).getOrElse(-1.0)
    val rows = prep.enriched.collect()
    assert(rows.nonEmpty)
    var nonEmpty = 0
    rows.foreach { r =>
      val flat = MelodyJoin.guestCombosPublic(r, cfg, prep.grids,
        prep.duals, prep.summaries, env, theta, gap, idx)
      val full = MelodyJoin.guestCombosPublic(r, cfg, prep.grids,
        prep.duals, prep.summaries, env, theta, gap, null)
      assert(flat.sameElements(full),
        s"record ${r.getLong(0)}: flat ${flat.length} vs full ${full.length}")
      if (flat.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty > 0, "no record produced guest combos - vacuous test")
    prep.unpersist()
  }

  test("KR-potential cascade stage prunes only, never changes the answer") {
    // the cube fixture's Config carries CubeKR's 24 dual vertices as a
    // caller-supplied Lipschitz lower-bound stage; answers with and
    // without it must be identical on random histograms (admissibility
    // in practice, next to CubeKRSpec's feasibility proof)
    val hists = randomHists(120, 8, seed = 19)
    val theta = 0.35
    val withKr = cfg3d.copy(lipschitzPotentials = graft.core.CubeKR
      .PrefilterIdx.map(graft.core.CubeKR.vertexPotential))
    val plain = MelodyJoin.thresholdJoin(spark, hists, theta, cfg3d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pruned = MelodyJoin.thresholdJoin(spark, hists, theta, withKr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plain.nonEmpty && pruned == plain,
      s"KR stage changed the answer: missed=${(plain -- pruned).take(5)} " +
        s"extra=${(pruned -- plain).take(5)}")
  }

  test("an inadmissible Lipschitz potential is rejected at construction") {
    // |pi_i - pi_j| > cost(i, j) for some bin pair -> Config must throw,
    // not silently drop answers (VERDICT r15 item 3). The cube corners
    // are at most sqrt(3) apart, so a potential spanning 10.0 violates
    // 1-Lipschitz-ness on every long edge.
    val bad = Array(Array.tabulate(8)(i => if (i == 0) 10.0 else 0.0))
    val ex = intercept[IllegalArgumentException] {
      cfg3d.copy(lipschitzPotentials = bad)
    }
    assert(ex.getMessage.contains("not 1-Lipschitz"))
    // the genuine vertices (equality on tight edges) still construct
    cfg3d.copy(lipschitzPotentials = graft.core.CubeKR
      .PrefilterIdx.map(graft.core.CubeKR.vertexPotential))
  }

  test("melody top-k join == baseline top-k") {
    val hists = randomHists(80, 8, seed = 11)
    val k = 15
    val base = BaselineJoin.topKJoin(spark, hists, k, cfg3d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val melody = MelodyJoin.topKJoin(spark, hists, k, cfg3d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(base == melody, s"top-k mismatch: base=$base melody=$melody")
  }

  test("L1 and L3 ground distances: baseline join matches brute-force exact") {
    import graft.core._
    val rnd = new scala.util.Random(23)
    val hists = randomHists(60, 8, seed = 23)
    val rows = hists.collect().map(r =>
      (r.getLong(0), HistOps.normalize(r.getSeq[Double](1).toArray)))
    for (gd <- Seq(GroundDist.L1, GroundDist.L3)) {
      val cfg = cfg3d.copy(groundDist = gd)
      val theta = if (gd == GroundDist.L1) 0.5 else 0.3
      val expected = (for {
        i <- rows.indices; j <- rows.indices if i < j
        d = Emd.exact(rows(i)._2, rows(j)._2, cfg.cost) if d <= theta
      } yield (math.min(rows(i)._1, rows(j)._1), math.max(rows(i)._1, rows(j)._1))).toSet
      val got = BaselineJoin.thresholdJoin(spark, hists, theta, cfg)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(expected.nonEmpty, s"$gd test vacuous")
      assert(got == expected, s"$gd mismatch: missed=${(expected -- got).size} extra=${(got -- expected).size}")
    }
  }

  test("mrsim pivot engine == baseline on random histograms") {
    val hists = randomHists(100, 8, seed = 19)
    val theta = 0.3
    val base = BaselineJoin.thresholdJoin(spark, hists, theta, cfg3d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (mrsimDf, solves) =
      MrSimJoin.thresholdJoinCounted(spark, hists, theta, cfg3d, numPivots = 8)
    val mrsim = mrsimDf
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(base.nonEmpty)
    assert(base == mrsim,
      s"missed=${(base -- mrsim).size} extra=${(mrsim -- base).size}")
    // Rubner routing prune: the counter is accumulator-backed, so task
    // retries can over-count — only sanity-check it here...
    assert(solves > 0, s"routing solves $solves")
    // ...and at a tight radius (narrow window) it must prune strictly,
    // while still matching the baseline pair set exactly
    val tightTheta = 0.05
    val baseT = BaselineJoin.thresholdJoin(spark, hists, tightTheta, cfg3d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (mrsimTDf, solvesT) =
      MrSimJoin.thresholdJoinCounted(spark, hists, tightTheta, cfg3d, numPivots = 8)
    val mrsimT = mrsimTDf
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(baseT == mrsimT,
      s"tight: missed=${(baseT -- mrsimT).size} extra=${(mrsimT -- baseT).size}")
    assert(solvesT > 0 && solvesT < 100L * 8,
      s"tight-theta routing solves $solvesT not pruned below 800")
  }

  test("mrsim answer is pivot-count-invariant (auto and forced p agree)") {
    // autoPivotCount only tunes cost: the centroid band + cascade decide
    // every pair exactly, so wildly different pivot counts (including
    // the density-swept auto choice) must emit the identical pair set
    // with identical distances
    val hists = randomHists(90, 8, seed = 29)
    val theta = 0.3
    def run(p: Int) = MrSimJoin.thresholdJoin(spark, hists, theta, cfg3d,
        numPivots = p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val auto = MrSimJoin.thresholdJoin(spark, hists, theta, cfg3d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val p7 = run(7)
    val p31 = run(31)
    assert(auto.nonEmpty && p7 == auto && p31 == auto,
      s"pivot-variant answers: auto=${auto.size} p7=${p7.size} p31=${p31.size}")
  }

  test("tree-EMD banded join == brute-force tree distance on normalized hists") {
    import graft.core.HistOps
    val hists = randomHists(150, 8, seed = 41)
    val tau = 0.9
    val rows = hists.collect().map { r =>
      (r.getLong(0), HistOps.normalize(r.getSeq[Double](1).toArray))
    }
    def treeEmd(a: Array[Double], b: Array[Double]): Double = {
      var tot = 0.0
      var span = a.length / 2
      while (span >= 1) {
        for (nd <- 0 until a.length / span) {
          var ma = 0.0; var mb = 0.0
          for (i <- nd * span until (nd + 1) * span) { ma += a(i); mb += b(i) }
          tot += span * math.abs(ma - mb)
        }
        span /= 2
      }
      tot
    }
    val expected = (for {
      i <- rows.indices; j <- rows.indices if i < j
      d = treeEmd(rows(i)._2, rows(j)._2) if d <= tau
    } yield (math.min(rows(i)._1, rows(j)._1), math.max(rows(i)._1, rows(j)._1))).toSet
    // operator normalizes via the fixture path? no — it consumes weights
    // as-is, so feed it normalized arrays to match the driver-side oracle
    import spark.implicits._
    val normed = rows.toSeq.toDF("id", "weights")
    val got = EmdJoins.treeEmdThresholdJoin(normed, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "vacuous tree-EMD test")
    assert(got == expected,
      s"missed=${(expected -- got).size} extra=${(got -- expected).size}")
  }

  test("octree tree-EMD banded join == brute-force tree distance, and brackets exact EMD") {
    import graft.core.{HistOps, Emd, GroundDist}
    val hists = randomHists(120, 8, seed = 43)
    val tau = 0.22
    val rows = hists.collect().map { r =>
      (r.getLong(0), HistOps.normalize(r.getSeq[Double](1).toArray))
    }
    // kd-split hierarchy over the 2x2x2 cube: spans (4,2,1), edge weights
    // (0.25, 0.25, 0.5) — must mirror EmdJoins.treeEmd3dThresholdJoin
    val levels = Seq((4, 0.25), (2, 0.25), (1, 0.5))
    def tree3d(a: Array[Double], b: Array[Double]): Double =
      levels.map { case (span, w) =>
        (0 until 8 / span).map { nd =>
          var ma = 0.0; var mb = 0.0
          for (i <- nd * span until (nd + 1) * span) { ma += a(i); mb += b(i) }
          w * math.abs(ma - mb)
        }.sum
      }.sum
    val cost = Emd.costMatrix(graft.sources.Fixtures.Bins3d, 3, GroundDist.L2)
    val expected = (for {
      i <- rows.indices; j <- rows.indices if i < j
      d = tree3d(rows(i)._2, rows(j)._2) if d <= tau
    } yield (rows(i)._1, rows(j)._1)).toSet
    // the advertised cascade constants: exact <= EMD_T <= 2 * exact
    for (i <- 0 until 40) {
      val (a, b) = (rows(i)._2, rows(i + 40)._2)
      val exact = Emd.exact(a, b, cost)
      val td = tree3d(a, b)
      assert(td >= exact - 1e-9, s"tree $td < exact $exact")
      assert(td <= 2 * exact + 1e-9, s"tree $td > 2*exact $exact")
    }
    import spark.implicits._
    val normed = rows.toSeq.toDF("id", "weights")
    val got = EmdJoins.treeEmd3dThresholdJoin(normed, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "vacuous octree tree-EMD test")
    assert(got == expected,
      s"missed=${(expected -- got).size} extra=${(got -- expected).size}")
  }

  test("approx quantile grids (the 100 TB flag) change pruning only, never the answer") {
    val hists = randomHists(100, 8, seed = 53)
    val theta = 0.3
    val exactQ = MelodyJoin.thresholdJoin(spark, hists, theta, cfg3d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approxQ = MelodyJoin.thresholdJoin(spark, hists, theta,
        cfg3d.copy(exactQuantiles = false))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactQ.nonEmpty, "vacuous quantile test")
    assert(approxQ == exactQ,
      s"missed=${(exactQ -- approxQ).size} extra=${(approxQ -- exactQ).size}")
    // top-k path under the same flag: k-sets must agree pair-for-pair
    // (both sides use the unified (round(dist,6), rid, sid) tie-break)
    def topk(c: MelodyJoin.Config) =
      MelodyJoin.topKJoin(spark, hists, 15, c)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(topk(cfg3d.copy(exactQuantiles = false)) == topk(cfg3d))
    // and on the derived parquet histograms the gate actually runs
    val derived = graft.sources.Fixtures.tripleHists(spark, "/root/testdata/sf0.001")
    def derivedPairs(c: MelodyJoin.Config) =
      MelodyJoin.thresholdJoin(spark, derived, 0.05, c)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactD = derivedPairs(cfg3d)
    assert(exactD.nonEmpty, "vacuous derived-data quantile test")
    assert(derivedPairs(cfg3d.copy(exactQuantiles = false)) == exactD)
  }

  test("non-metric / non-L2 configs are rejected by the pruning engines") {
    import graft.core._
    val hists = randomHists(10, 8, seed = 31)
    // MrSim's hyperplane prune needs the triangle inequality
    val n = cfg3d.numBins
    val badCost = new Array[Double](n * n)
    val r = new scala.util.Random(5)
    for (i <- 0 until n; j <- (i + 1) until n) {
      val c = r.nextDouble() * 10
      badCost(i * n + j) = c; badCost(j * n + i) = c
    }
    val nonMetric = cfg3d.copy(groundDist = GroundDist.Arbitrary(badCost))
    intercept[IllegalArgumentException] {
      MrSimJoin.thresholdJoin(spark, hists, 0.3, nonMetric)
    }
    // melody grid pruning is L2-only, guarded in prepare() so the prepared
    // API cannot bypass it
    intercept[IllegalArgumentException] {
      MelodyJoin.prepare(spark, hists, cfg3d.copy(groundDist = GroundDist.L1))
    }
    // L1/L3 are metric: MrSim accepts them (prune is cost-generic)
    assert(MrSimJoin.thresholdJoin(spark, hists, 0.5,
      cfg3d.copy(groundDist = GroundDist.L1), numPivots = 2).collect() != null)
  }

  test("melody join on derived 3-d testdata histograms matches baseline") {
    val hists = graft.sources.Fixtures.tripleHists(spark, "/root/testdata/sf0.001")
    val theta = 0.08
    val base = BaselineJoin.thresholdJoin(spark, hists, theta, cfg3d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val melody = MelodyJoin.thresholdJoin(spark, hists, theta, cfg3d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(base == melody,
      s"mismatch: missed=${(base -- melody).size} extra=${(melody -- base).size}")
    assert(base.nonEmpty)
    // FOURTH exact 3-D engine: tree-embedding candidates + LP verify must
    // produce the identical pair set (and identical distances at 6dp)
    val treeExact = EmdJoins.treeExact3dThresholdJoin(hists, theta)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(treeExact == base,
      s"treeExact mismatch: missed=${(base -- treeExact).size} " +
        s"extra=${(treeExact -- base).size}")
  }

  test("tree-exact 3-D engine == baseline on random normalized histograms") {
    import graft.core.HistOps
    val hists = randomHists(100, 8, seed = 47)
    import spark.implicits._
    val normed = hists.collect()
      .map(r => (r.getLong(0), HistOps.normalize(r.getSeq[Double](1).toArray)))
      .toSeq.toDF("id", "weights")
    val theta = 0.12
    val base = BaselineJoin.thresholdJoin(spark, normed, theta, cfg3d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val treeExact = EmdJoins.treeExact3dThresholdJoin(normed, theta)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(base.nonEmpty, "vacuous tree-exact test")
    assert(treeExact == base,
      s"missed=${(base -- treeExact).size} extra=${(treeExact -- base).size}")
  }
}
