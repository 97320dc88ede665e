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
    for (bad <- Seq(dropped, extra, wrongDist)) {
      val e = intercept[IllegalArgumentException] {
        SparkEntry.crossCheckPairs(p, bad, "spec")
      }
      assert(e.getMessage.contains("cross-engine pair-set mismatch"))
    }
    // and symmetrically when the PRIMARY is the faulty side
    intercept[IllegalArgumentException] {
      SparkEntry.crossCheckPairs(dropped, p, "spec")
    }
  }

  test("crosscheck=off skips the witness (bench mode)") {
    val p = pairsDf(Seq((1L, 2L, 0.25)))
    val bad = pairsDf(Seq((9L, 10L, 0.9)))
    System.setProperty("graft.crosscheck", "off")
    try {
      val out = SparkEntry.crossCheckPairs(p, bad, "spec")
      assert(out.count() == 1)
    } finally System.clearProperty("graft.crosscheck")
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
