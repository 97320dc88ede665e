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

  test("bloomJoinAudit: zero false negatives, exact counts, fp inside envelope") {
    import spark.implicits._
    val keys = (0L until 500L).map(_ * 7L).toDF("k")
    // big side: every key matches twice, plus 20k non-matching rows
    val big = ((0L until 500L).map(_ * 7L) ++ (0L until 500L).map(_ * 7L) ++
      (100000L until 120000L)).toDF("b")
    val r = SketchOps.bloomJoinAudit(big, col("b"), keys, col("k")).head()
    assert(r.getLong(0) == 21000L)          // n_big
    assert(r.getLong(1) == 1000L)           // n_true (each key twice)
    assert(r.getLong(2) == 0L)              // a bloom never drops a match
    assert(r.getBoolean(3))                 // fp inside 3*fpp*nonMatching+64
  }

  test("cmsAudit: exact counts, never underestimates, zero-count probes covered") {
    import spark.implicits._
    val toks = (Seq.fill(1000)("hot") ++ (0 until 5000).map(i => s"t$i")
      ++ Seq.fill(3)("warm")).toDF("token")
    val out = SketchOps.cmsAudit(toks, "token", Seq("hot", "warm", "absent"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out("hot") == (1000L, true))
    assert(out("warm") == (3L, true))
    assert(out("absent") == (0L, true))     // absent probe: cnt 0, est >= 0
  }

  test("dataSplit: total coverage, growth-stable assignment, integer thresholds") {
    import spark.implicits._
    val docs = (1L to 2000L).toDF("doc_id")
    val full = CorpusOps.dataSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(full.size == 2000)
    val frac = full.values.groupBy(identity).view.mapValues(_.size).toMap
    // md5 buckets are uniform: 80/10/10 within generous tolerance
    assert(frac("train") > 1500 && frac("train") < 1700, frac)
    assert(frac("val") > 120 && frac("val") < 280, frac)
    assert(frac("test") > 120 && frac("test") < 280, frac)
    // THE holdout property: a doc's split is a pure function of its id —
    // unchanged when the rest of the corpus changes
    val subset = CorpusOps.dataSplit((1L to 100L).toDF("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    subset.foreach { case (id, sp) => assert(full(id) == sp) }
  }

  test("leakSafeSplit: no near-dup cluster ever straddles a split fence") {
    import spark.implicits._
    // hand clusters: members share their cluster's split, whatever it is
    val clustered = Seq(
      (1L, 1L), (2L, 1L), (900L, 1L),   // one 3-member cluster
      (3L, 3L), (77L, 3L),              // a 2-member cluster
      (5L, 5L)).toDF("doc_id", "cluster")
    val got = CorpusOps.leakSafeSplit(clustered).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.groupBy(_._2).forall(_._2.map(_._3).distinct.size == 1),
      "members of one cluster MUST share a split")
    // cluster split == the id-split of the representative id (shared hash)
    val repSplit = CorpusOps.dataSplit(Seq(1L, 3L, 5L).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (_, c, sp) => assert(sp == repSplit(c)) }
    // the fixture path: the declared query's clustering never straddles
    val docs = graft.sources.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val edges = Dedup.simhashDedup(spark, docs, maxHamming = 7)
      .select(col("rid"), col("sid"))
    val fixture = CorpusOps.leakSafeSplit(
      Dedup.connectedComponents(spark, edges, docs.select(col("doc_id")))
        .select(col("id").as("doc_id"), col("cluster"))).collect()
      .map(r => (r.getLong(1), r.getString(2)))
    assert(fixture.groupBy(_._1).forall(_._2.map(_._2).distinct.size == 1))
  }
}
