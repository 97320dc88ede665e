package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The cross-engine witness on the three `no_oracle` 3-D LP rows: an
  * agreeing witness is a no-op, a seeded fault in EITHER engine's output
  * (dropped pair, extra pair, wrong distance) must throw — i.e. a 3-D
  * regression fails the driver's Verify run loudly instead of writing
  * unverified rows. */
class CrossCheckSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("cross-check-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def pairsDf(rows: Seq[(Long, Long, Double)]) = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    rows.toDF("rid", "sid", "dist")
  }

  test("agreeing engines pass and return the primary unchanged") {
    val p = pairsDf(Seq((1L, 2L, 0.25), (3L, 4L, 0.125)))
    // witness in the opposite orientation — canonicalization must absorb it
    val w = pairsDf(Seq((4L, 3L, 0.125), (2L, 1L, 0.25)))
    val out = SparkEntry.crossCheckPairs(p, w, "spec")
    assert(out.count() == 2)
  }

  test("seeded faults fail loudly: dropped pair, extra pair, wrong dist") {
    val p = pairsDf(Seq((1L, 2L, 0.25), (3L, 4L, 0.125)))
    val dropped = pairsDf(Seq((1L, 2L, 0.25)))
    val extra = pairsDf(Seq((1L, 2L, 0.25), (3L, 4L, 0.125), (5L, 6L, 0.5)))
    val wrongDist = pairsDf(Seq((1L, 2L, 0.25), (3L, 4L, 0.125001)))
    for (bad <- Seq(dropped, extra)) {
      val e = intercept[IllegalArgumentException] {
        SparkEntry.crossCheckPairs(p, bad, "spec")
      }
      assert(e.getMessage.contains("cross-engine pair-set mismatch"))
    }
    // distance faults trip the TOLERANCE check (set equality is on ids;
    // distances compare to 5.2e-7 — a 1e-6 fault that a rounded-tuple
    // compare could miss when both sides round together now fails)
    val e = intercept[IllegalArgumentException] {
      SparkEntry.crossCheckPairs(p, wrongDist, "spec")
    }
    assert(e.getMessage.contains("cross-engine distance spread"))
    // and symmetrically when the PRIMARY is the faulty side
    intercept[IllegalArgumentException] {
      SparkEntry.crossCheckPairs(dropped, p, "spec")
    }
  }

  test("crosscheck disabled skips the witness (bench mode)") {
    // enabled is passed explicitly: Bench/Verify resolve the
    // -Dgraft.crosscheck property at their entry points; mutating the
    // process-global property here would race parallel suites in the
    // shared forked test JVM
    val p = pairsDf(Seq((1L, 2L, 0.25)))
    val bad = pairsDf(Seq((9L, 10L, 0.9)))
    val out = SparkEntry.crossCheckPairs(p, bad, "spec", enabled = false)
    assert(out.count() == 1)
  }

  test("a solver regression shared by BOTH engines fails the simplex audit") {
    // Both 3-D engines compute final distances with the same SSP kernel
    // (Emd.exact), so a solver fault leaves the pair-set witness in
    // silent agreement — the simplex audit (independent commons-math3
    // formulation, zero shared solver code) is what must catch it. Run
    // the real tree-exact engine with a 0.1%-scaled solver as BOTH
    // primary and witness: pair sets match, every nonzero distance is
    // wrong, the audit must throw.
    import spark.implicits._
    val rnd = new Random(47)
    // perturbation pairs: each base hist gets a lightly-noised twin, so
    // survivor pairs at theta=0.05 are guaranteed and their distances
    // (~1e-2) make the 1% solver fault ~1e-4 — far above the audit's
    // 2e-6 tolerance
    val hists = (0 until 30).flatMap { i =>
      val w = Array.fill(8)(0.2 + rnd.nextDouble())
      val w2 = w.map(x => x + 0.05 * rnd.nextDouble())
      Seq((2L * i, graft.core.HistOps.normalize(w)),
        (2L * i + 1, graft.core.HistOps.normalize(w2)))
    }.toDF("id", "weights")
    val theta = 0.05
    val faulty: (Array[Double], Array[Double], Array[Double]) => Double =
      (a, b, c) => graft.core.Emd.exact(a, b, c) * 1.01
    val bad = graft.operators.EmdJoins
      .treeExact3dThresholdJoin(hists, theta, solver = faulty)
      .select(col("rid"), col("sid"), round(col("dist"), 6).as("dist"))
    assert(bad.count() > 0, "fixture must produce survivor pairs")
    val e = intercept[IllegalArgumentException] {
      SparkEntry.crossCheckPairs(bad, bad, "spec-solver-fault",
        enabled = true, audit = SparkEntry.simplexAudit3d(hists, "spec-solver-fault"))
    }
    assert(e.getMessage.contains("simplex audit mismatch"))
    // and the healthy solver passes the same audit end-to-end
    val good = graft.operators.EmdJoins.treeExact3dThresholdJoin(hists, theta)
      .select(col("rid"), col("sid"), round(col("dist"), 6).as("dist"))
    SparkEntry.crossCheckPairs(good, good, "spec-solver-ok",
      enabled = true, audit = SparkEntry.simplexAudit3d(hists, "spec-solver-ok"))
  }

  test("tree-exact 3-D top-k == melody 3-D top-k on random histograms") {
    import spark.implicits._
    val rnd = new Random(31)
    val hists = (0 until 90).map { i =>
      val w = graft.core.HistOps.normalize(Array.fill(8)(rnd.nextDouble()))
      (i.toLong, w)
    }.toDF("id", "weights")
    val k = 12
    val cfg = SparkEntry.melodyCfg3d
    val melody = graft.operators.MelodyJoin.topKJoin(spark, hists, k, cfg)
      .select(col("rid"), col("sid"), round(col("dist"), 6).as("dist"))
    val tree = graft.operators.EmdJoins.treeExact3dTopK(hists, k)
    SparkEntry.crossCheckPairs(melody, tree, "spec-topk")
    assert(melody.count() == k)
  }
}
