package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Integer-exact PageRank: the RDD rounds must replay the published
  * recurrence bit-for-bit (ranks are scaled BIGINTs, every division
  * truncates), so the spec pins the operator against an in-memory
  * brute-force replay on a seeded random graph, a hand-computed tiny
  * graph, and the dangling/isolated-node lanes the lost-mass variant
  * defines. */
class GraphSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graph-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Scale = 1000000000000L
  private val Base = 150000000000L

  /** The recurrence, replayed with plain Maps — the oracle shape. */
  private def bruteRank(nodes: Seq[Long], edges: Seq[(Long, Long)],
                        iters: Int): Map[Long, Long] = {
    val odeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> Scale).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for ((u, v) <- edges) contrib(v) += r(u) / odeg(u)
      r = nodes.map(n => n -> (Base + 85L * contrib(n) / 100L)).toMap
    }
    r
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)],
                  iters: Int): Map[Long, (Long, Long)] = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val eDf = edges.toDF("src", "dst")
    val nDf = nodes.toDF("doc_id")
    Graph.pageRank(spark, eDf, nDf, iters = iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("hand graph: one iteration matches the recurrence by hand") {
    // 0 -> {1, 2}, 1 -> {2}, 2 -> {0}; 3 isolated
    val nodes = Seq(0L, 1L, 2L, 3L)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L))
    val got = run(nodes, edges, iters = 1)
    // contrib: 1 gets S/2, 2 gets S/2 + S, 0 gets S
    assert(got(0L)._1 === Base + 85L * Scale / 100L)
    assert(got(1L)._1 === Base + 85L * (Scale / 2) / 100L)
    assert(got(2L)._1 === Base + 85L * (Scale / 2 + Scale) / 100L)
    assert(got(3L)._1 === Base) // isolated: base every round
    assert(got(0L)._2 === 2L && got(1L)._2 === 1L &&
      got(2L)._2 === 1L && got(3L)._2 === 0L)
  }

  test("seeded random graph: 6 iterations equal the brute-force replay") {
    val rnd = new Random(4242)
    val n = 200
    val nodes = (0L until n.toLong).toSeq
    val edges = (for (_ <- 1 to 800) yield {
      val u = rnd.nextInt(n).toLong
      val v = rnd.nextInt(n).toLong
      (u, v)
    }).filter { case (u, v) => u != v }.distinct
    val want = bruteRank(nodes, edges, iters = 6)
    val got = run(nodes, edges, iters = 6)
    assert(got.size === n)
    for (nd <- nodes)
      assert(got(nd)._1 === want(nd), s"rank mismatch at node $nd")
  }

  test("dangling sinks keep receiving but contribute nothing") {
    // 0 -> 1, 1 is a sink: after round 1 node 0 holds base only
    val got = run(Seq(0L, 1L), Seq((0L, 1L)), iters = 2)
    assert(got(0L)._1 === Base)
    // node 1 round 2: base + 85% of (rank_1(0) = base + 85%*S... no:
    // rank_1(0) = base; contribution base/1
    assert(got(1L)._1 === Base + 85L * Base / 100L)
  }

  test("linkEdges: deterministic, self-loop-free, in-range, fanout-bounded") {
    import spark.implicits._
    val docs = (0L until 60L).toDF("doc_id")
    val e1 = Graph.linkEdges(docs, fanout = 3).as[(Long, Long)].collect().toSet
    val e2 = Graph.linkEdges(docs, fanout = 3).as[(Long, Long)].collect().toSet
    assert(e1 === e2)
    assert(e1.forall { case (s, d) => s != d && d >= 0 && d < 60 })
    assert(e1.groupBy(_._1).forall(_._2.size <= 3))
    assert(e1.map(_._1).size === 60) // every doc links out (fanout 3, n 60)
  }

  /** The HITS recurrence, replayed with plain Maps. */
  private def bruteHits(nodes: Seq[Long], edges: Seq[(Long, Long)],
                        iters: Int): Map[Long, (Long, Long)] = {
    var hub = nodes.map(_ -> 1L).toMap
    var auth = hub
    for (_ <- 1 to iters) {
      val a = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, v) <- edges) a(v) += hub(u)
      auth = nodes.map(n => n -> a(n)).toMap
      val h = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, v) <- edges) h(u) += auth(v)
      hub = nodes.map(n => n -> h(n)).toMap
    }
    nodes.map(n => n -> ((auth(n), hub(n)))).toMap
  }

  private def runHits(nodes: Seq[Long], edges: Seq[(Long, Long)],
                      iters: Int): Map[Long, (Long, Long)] = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    Graph.hits(spark, edges.toDF("src", "dst"), nodes.toDF("doc_id"),
        iters = iters)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("hits hand graph: one iteration by hand") {
    // 0 -> {1, 2}, 1 -> {2}; 3 isolated
    val got = runHits(Seq(0L, 1L, 2L, 3L), Seq((0L, 1L), (0L, 2L), (1L, 2L)), 1)
    // a1: 1 <- h0(0)=1; 2 <- h0(0)+h0(1)=2; h1: 0 -> a1(1)+a1(2)=3; 1 -> a1(2)=2
    assert(got === Map(0L -> ((0L, 3L)), 1L -> ((1L, 2L)),
      2L -> ((2L, 0L)), 3L -> ((0L, 0L))))
  }

  test("hits seeded random graph: 3 iterations equal the brute-force replay") {
    val rnd = new Random(777)
    val n = 150
    val nodes = (0L until n.toLong).toSeq
    val edges = (for (_ <- 1 to 500) yield
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (u, v) => u != v }.distinct
    assert(runHits(nodes, edges, 3) === bruteHits(nodes, edges, 3))
  }

  test("hits overflow contract rejects degree^iters past long range") {
    import spark.implicits._
    val nodes = (0L until 200L).toDF("doc_id")
    // star: maxIndeg 199, maxOutdeg 1 -> (199)^k; k = 12 overflows
    val edges = (1L until 200L).map(i => (i, 0L)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      Graph.hits(spark, edges, nodes, iters = 12)
    }
    assert(ex.getMessage.contains("overflow"))
  }

  private def runTriangles(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    Graph.triangles(spark, edges.toDF("src", "dst"), nodes.toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangles: K4 by hand, direction- and duplicate-insensitive") {
    // complete graph on 4 nodes: 4 triangles, each node in 3; edges fed
    // as a mix of directions and duplicates (the operator symmetrizes)
    val edges = Seq((0L, 1L), (1L, 0L), (0L, 2L), (0L, 3L), (2L, 1L),
      (1L, 3L), (2L, 3L), (3L, 2L))
    val got = runTriangles(Seq(0L, 1L, 2L, 3L, 9L), edges)
    assert(got === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L, 9L -> 0L))
  }

  test("triangles: seeded random graph equals the brute-force triple scan") {
    val rnd = new Random(2024)
    val n = 60
    val nodes = (0L until n.toLong).toSeq
    val edges = (for (_ <- 1 to 240) yield
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (u, v) => u != v }.distinct
    val und = edges.map { case (u, v) => (math.min(u, v), math.max(u, v)) }.toSet
    val want = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    var total = 0
    for (a <- nodes; b <- nodes if b > a; c <- nodes if c > b)
      if (und((a, b)) && und((b, c)) && und((a, c))) {
        want(a) += 1; want(b) += 1; want(c) += 1; total += 1
      }
    assert(total > 0, "seed must produce triangles")
    val got = runTriangles(nodes, edges)
    assert(nodes.forall(nd => got(nd) == want(nd)))
  }

  test("triangles: a 10k-spoke star generates zero wedges (skew lane)") {
    // every spoke edge points INTO the hub under degree orientation, so
    // the hub contributes no wedge pairs — the O(E^1.5) argument's
    // worst-skew case completes with all zeros
    val n = 10000L
    val got = runTriangles(0L until n, (1L until n).map(i => (i, 0L)))
    assert(got.size == n.toInt && got.values.forall(_ == 0L))
  }

  test("overflow contract: an unsafe scaleUnit is rejected up front") {
    import spark.implicits._
    val docs = (0L until 4L).toDF("doc_id")
    val e = Seq((0L, 1L)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      Graph.pageRank(spark, e, docs, scaleUnit = Long.MaxValue / 2)
    }
    assert(ex.getMessage.contains("overflow"))
  }
}
