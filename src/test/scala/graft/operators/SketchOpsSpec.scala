package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Sketch audits: exact columns match brute force, and the error-envelope
  * booleans hold on adversarial cardinalities/distributions (they are the
  * columns the oracle pins to TRUE). */
class SketchOpsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("sketch-ops-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("distinctAudit: exact counts match brute force, HLL inside envelope") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val rnd = new Random(7)
    // groups spanning 4 orders of cardinality magnitude, incl. one large
    // enough to leave HLL++'s exact sparse mode
    val rows =
      (0 until 60000).map(i => ("big", s"v${rnd.nextInt(40000)}")) ++
      (0 until 500).map(i => ("mid", s"v${i % 97}")) ++
      Seq(("tiny", "only"))
    val df = rows.toDF("g", "v").repartition(8)
    val got = SketchOps.distinctAudit(df, "g", col("v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val exact = rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (g, n) =>
      assert(got(g)._1 == n, s"group $g exact distinct")
      assert(got(g)._2, s"group $g HLL outside 6-sigma envelope")
    }
  }

  test("quantileAudit: rank window intersects target window on skewed data") {
    import spark.implicits._
    val rnd = new Random(11)
    // heavy ties + exponential tail — the hard case for rank sketches
    val vals = (0 until 20000).map(_ => math.floor(-math.log(rnd.nextDouble()) * 10))
    val df = vals.toDF("x")
    val out = SketchOps.quantileAudit(df, col("x"), Seq(0.01, 0.5, 0.9, 0.999))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == 4)
    out.foreach { case (q, n, ok) =>
      assert(n == 20000L)
      assert(ok, s"q=$q estimate rank outside eps window")
    }
  }

  test("quantileAudit: exact on tiny data, integer input casts cleanly") {
    import spark.implicits._
    val df = (1 to 100).toDF("x") // ranks are hand-checkable
    val out = SketchOps.quantileAudit(df, col("x"), Seq(0.25, 1.0), accuracy = 100000)
      .collect().map(r => (r.getDouble(0), r.getBoolean(2))).toMap
    assert(out == Map(0.25 -> true, 1.0 -> true))
  }

  test("rankWindowOk is falsifiable: far-off estimates fail, boundary estimates pass") {
    // n=1000, q=0.5, eps=0.001 -> target window [499, 501]
    assert(!SketchOps.rankWindowOk(ltCount = 600, leCount = 650, 0.5, 1000, 0.001))
    assert(!SketchOps.rankWindowOk(ltCount = 100, leCount = 200, 0.5, 1000, 0.001))
    assert(SketchOps.rankWindowOk(ltCount = 499, leCount = 499, 0.5, 1000, 0.001))
    // heavy ties: a value spanning the target from both sides passes
    assert(SketchOps.rankWindowOk(ltCount = 0, leCount = 1000, 0.5, 1000, 0.001))
    // rank window just outside either edge fails
    assert(!SketchOps.rankWindowOk(ltCount = 501, leCount = 600, 0.5, 1000, 0.001))
    assert(!SketchOps.rankWindowOk(ltCount = 400, leCount = 498, 0.5, 1000, 0.001))
  }

  test("quantileAudit audits against the non-null count on null-bearing data") {
    import spark.implicits._
    val df = ((1 to 1000).map(i => Some(i.toDouble)) ++
      Seq.fill(1000)(Option.empty[Double])).toDF("x")
    val out = SketchOps.quantileAudit(df, col("x"), Seq(0.5, 0.99))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getBoolean(2)))
    assert(out.forall(_._2 == 1000L), s"n must exclude nulls: ${out.toSeq}")
    assert(out.forall(_._3), s"rank_ok false against non-null N: ${out.toSeq}")
  }

  test("quantileAudit rejects out-of-range q") {
    import spark.implicits._
    val df = (1 to 10).toDF("x")
    intercept[IllegalArgumentException] {
      SketchOps.quantileAudit(df, col("x"), Seq(0.0, 0.5))
    }
  }
}
