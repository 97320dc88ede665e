package graft.operators

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.Caching._
import graft.functions.TextCols

/** Link-graph analytics over the document corpus.
  *
  * A crawl-shaped corpus is a graph (pages link to pages, hosts to
  * hosts), and the canonical corpus-quality signal over that graph is
  * PageRank — used by production training-data pipelines both as a
  * document-quality prior (e.g. the Common-Crawl-derived corpora rank
  * hosts by centrality before sampling) and as a crawl-frontier
  * priority. The reference engine has no graph operator; this module is
  * pipeline-capability growth, built public-knowledge-first (the
  * original PageRank formulation plus the standard Pregel-style
  * message-passing schedule).
  *
  * Everything is INTEGER arithmetic: ranks are scaled fixed-point
  * BIGINTs (1.0 == `scaleUnit`), per-edge contributions are integer
  * division `rank / odeg`, damping is `85 * s / 100`. Long sums are
  * exact and order-independent, so the result is bit-identical in any
  * engine that replays the same recurrence — the FP-safe-threshold rule
  * (CLAUDE.md) applied to an iterative kernel: no float ever appears.
  */
object Graph {

  /** Deterministic md5-derived out-links over an id column: doc `i`
    * emits `fanout` candidate targets `md5_32("edge:i:j") mod n`
    * (j = 1..fanout), self-loops dropped, duplicates collapsed. Both
    * engines rebuild the same edge set from the ids alone — the same
    * fixture-derivation contract every other synthetic column in this
    * repo uses (FIXTURES.md).
    *
    * `n` (the modulus) is the corpus row count — an O(1) driver-side
    * aggregate, NOT a collect; at deployment scale this is one
    * `count()` job over the id column.
    */
  def linkEdges(docs: DataFrame, idCol: String = "doc_id",
                fanout: Int = 3): DataFrame = {
    require(fanout >= 1, s"linkEdges: fanout must be >= 1, got $fanout")
    val n = docs.count()
    require(n > 0, "linkEdges: empty corpus")
    docs
      .select(col(idCol).cast("long").as("src"))
      .select(col("src"),
        explode(array((1 to fanout).map(lit): _*)).as("j"))
      .select(col("src"),
        (TextCols.md5Bits32(concat(lit("edge:"), col("src").cast("string"),
          lit(":"), col("j").cast("string"))) % lit(n)).as("dst"))
      .filter(col("dst") =!= col("src"))
      .distinct()
  }

  /** HITS hubs/authorities (Kleinberg 1999) — the OTHER classic link
    * signal: a page is a good authority if good hubs point at it, a
    * good hub if it points at good authorities. Run UN-normalized for a
    * fixed iteration count: the per-round normalization in the textbook
    * formulation exists only to stop FP overflow and does not change
    * the RANKING (scores scale uniformly per round), so dropping it
    * makes every score an exact integer both engines reproduce
    * bit-for-bit — the pageRank playbook, minus even the fixed-point
    * scale.
    *
    *   a_k(v) = SUM_{(u,v) in E} h_{k-1}(u),  h_k(u) = SUM_{(u,v) in E} a_k(v)
    *
    * with h_0 = 1. Same execution schedule as [[pageRank]]: the edge
    * set is partitioned ONCE (once by src, once by dst — the two join
    * directions), each half-round is one narrow join + ONE O(V)
    * reduceByKey shuffle. Overflow contract (ANSI throws mid-round
    * otherwise): max score after k rounds is bounded by
    * (maxIndeg * maxOutdeg)^k, checked up front via BigInt — at real
    * web degrees (~1e4) two rounds sit near 1e16, inside long range;
    * more rounds on a skewed graph need the caller to sub-sample or
    * band degrees first, and the require says so. */
  def hits(spark: SparkSession, edges: DataFrame, nodes: DataFrame,
           idCol: String = "doc_id", iters: Int = 2): DataFrame = {
    import spark.implicits._
    require(iters >= 1, s"hits: iters must be >= 1, got $iters")
    val parts = math.max(2, spark.sparkContext.defaultParallelism)
    val part = new HashPartitioner(parts)
    val eRaw = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)].rdd
    // degree maxima in ONE job: tag each endpoint, count per (node,
    // side), max per side — one shuffle instead of two sequential aggs
    // (small audit jobs are latency-bound on submission round-trips)
    val degRow = edges.select(col("src").as("k"), lit("o").as("side"))
      .unionByName(edges.select(col("dst").as("k"), lit("i").as("side")))
      .groupBy(col("k"), col("side")).count()
      .groupBy()
      .agg(max(when(col("side") === "o", col("count"))).as("mo"),
        max(when(col("side") === "i", col("count"))).as("mi"))
      .first()
    val maxOut = if (degRow.isNullAt(0)) 0L else degRow.getLong(0)
    val maxIn = if (degRow.isNullAt(1)) 0L else degRow.getLong(1)
    require(maxIn == 0L || maxOut == 0L ||
      (BigInt(maxIn) * BigInt(maxOut)).pow(iters) <= BigInt(Long.MaxValue),
      s"hits: (maxIndeg=$maxIn * maxOutdeg=$maxOut)^$iters overflows long; " +
        "reduce iters or band the degree distribution first")
    val bySrc = eRaw.partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    val byDst = eRaw.map(_.swap).partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodeR = nodes.select(col(idCol).cast("long")).as[Long].rdd
      .map((_, ())).partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)

    var hub: RDD[(Long, Long)] = nodeR.mapValues(_ => 1L)
    var auth: RDD[(Long, Long)] = hub
    var k = 0
    while (k < iters) {
      val ca = bySrc.join(hub) // narrow: both partitioned by src
        .map { case (_, (v, h)) => (v, h) }
        .reduceByKey(part, _ + _)
      auth = nodeR.leftOuterJoin(ca, part).mapValues(_._2.getOrElse(0L))
      val ch = byDst.join(auth) // narrow: both partitioned by dst
        .map { case (_, (u, a)) => (u, a) }
        .reduceByKey(part, _ + _)
      hub = nodeR.leftOuterJoin(ch, part).mapValues(_._2.getOrElse(0L))
      k += 1
    }
    val out = spark.createDataset(auth.join(hub))
      .map { case (id, (a, h)) => (id, a, h) }
      .toDF(idCol, "auth", "hub")
      .persistOnce()
    out.count()
    bySrc.unpersist(false); byDst.unpersist(false); nodeR.unpersist(false)
    out
  }

  /** Per-node triangle counts over the UNDIRECTED link graph — the
    * clustering-coefficient numerator, the standard spam/link-farm
    * signal (farms are near-cliques; organic link neighborhoods are
    * sparse). Degree-ordered edge orientation (the classic "forward" /
    * MR triangle algorithm, Schank & Wagner 2005 / Cohen 2009): every
    * edge points from its lower-(degree, id) endpoint to the higher,
    * wedges form only at each triangle's LOWEST-rank vertex, and the
    * closing edge is looked up in the same oriented set — each triangle
    * materializes exactly once, and total wedge work is O(E^1.5)
    * regardless of degree skew (a celebrity node generates no wedges
    * because nearly all its edges point INTO it). Rank is the single
    * integer key deg * 2^32 + id (order-preserving, unique — requires
    * deg, id < 2^31, asserted), so both engines compare one BIGINT.
    *
    * Three equi-join shuffles (orient, wedge-at-u, close) + one
    * count aggregation — all on key columns, never adjacency lists.
    * Output: (idCol, n_triangles) over ALL nodes, zero-filled. */
  def triangles(spark: SparkSession, edges: DataFrame, nodes: DataFrame,
                idCol: String = "doc_id"): DataFrame = {
    val und = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val deg = und.select(col("a").as("n"))
      .unionByName(und.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val maxRow = deg.agg(coalesce(max(col("d")), lit(0L)),
      coalesce(max(col("n")), lit(0L))).first()
    require(maxRow.getLong(0) < (1L << 31) && maxRow.getLong(1) < (1L << 31),
      "triangles: rank key needs deg and id < 2^31")
    def rk(dCol: Column, nCol: Column): Column = dCol * lit(1L << 32) + nCol
    val o = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(rk(col("da"), col("a")) < rk(col("db"), col("b")), col("a"))
          .otherwise(col("b")).as("x"),
        when(rk(col("da"), col("a")) < rk(col("db"), col("b")), col("b"))
          .otherwise(col("a")).as("y"),
        when(rk(col("da"), col("a")) < rk(col("db"), col("b")),
          rk(col("db"), col("b"))).otherwise(rk(col("da"), col("a"))).as("ry"))
    val wedges = o.select(col("x"), col("y").as("v"), col("ry").as("rv"))
      .join(o.select(col("x"), col("y").as("w"), col("ry").as("rw")), Seq("x"))
      .filter(col("rv") < col("rw"))
    val tri = wedges.join(
        o.select(col("x").as("v"), col("y").as("w")), Seq("v", "w"))
      .select(col("x").as("u"), col("v"), col("w"))
    val counts = tri.select(col("u").as("n"))
      .unionByName(tri.select(col("v").as("n")))
      .unionByName(tri.select(col("w").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("n_triangles"))
    nodes.select(col(idCol).cast("long").as(idCol))
      .join(counts.withColumnRenamed("n", idCol), Seq(idCol), "left")
      .na.fill(0L, Seq("n_triangles"))
  }

  /** Fixed-point PageRank (damping 0.85, dangling mass dropped — the
    * "lost mass" variant, whose recurrence is exactly SQL-replayable):
    *
    *   pr_0(v)   = scaleUnit
    *   pr_k+1(v) = base + (dampNum * SUM_{(u,v) in E} pr_k(u) / odeg(u))
    *               / dampDen
    *
    * with `base = scaleUnit / dampDen * (dampDen - dampNum)` and every
    * division a truncating integer division.
    *
    * Execution is RDD rounds (the iterative-loop rule: below the ~50M
    * cutover Catalyst re-planning dominates — see
    * Dedup.connectedComponents): edges are hash-partitioned by src ONCE
    * and persisted; each round is edges⋈ranks (narrow — both sides
    * carry the same partitioner), one reduceByKey shuffle for the
    * contribution sum, and a narrow leftOuterJoin back onto the node
    * set. Per-iteration network cost is therefore ONE shuffle of O(V)
    * contribution rows — the Pregel schedule, which is how this holds
    * at a 100 TB crawl graph (edges never move after the initial
    * partition; only the rank vector flows).
    *
    * Overflow envelope (ANSI mode throws rather than wraps): the total
    * rank mass is bounded by scaleUnit*V, so `dampNum * sum` needs
    * scaleUnit*V*dampNum < 2^63 — at the default 1e12 scale that is
    * ~10^8 vertices; shrink `scaleUnit` as V grows (the require below
    * makes the contract explicit rather than relying on a runtime
    * throw deep inside a round).
    */
  def pageRank(spark: SparkSession, edges: DataFrame, nodes: DataFrame,
               idCol: String = "doc_id", iters: Int = 4,
               scaleUnit: Long = 1000000000000L,
               dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    import spark.implicits._
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    require(dampNum > 0 && dampNum < dampDen,
      s"pageRank: need 0 < dampNum < dampDen, got $dampNum/$dampDen")
    val nV = nodes.count()
    require(nV > 0 && scaleUnit <= Long.MaxValue / math.max(1L, nV) / dampNum,
      s"pageRank: scaleUnit=$scaleUnit overflows at V=$nV (need " +
        s"scaleUnit*V*dampNum < 2^63); pass a smaller scaleUnit")
    val base = scaleUnit / dampDen * (dampDen - dampNum)

    val parts = math.max(2, spark.sparkContext.defaultParallelism)
    val part = new HashPartitioner(parts)

    val eRaw = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)].rdd
    val odeg = eRaw.mapValues(_ => 1L).reduceByKey(part, _ + _)
    // (src, (dst, odeg)), partitioned by src once for the whole run
    val ew = eRaw.join(odeg, part)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodeR = nodes.select(col(idCol).cast("long")).as[Long].rdd
      .map((_, ())).partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)

    var ranks: RDD[(Long, Long)] = nodeR.mapValues(_ => scaleUnit)
    var i = 0
    while (i < iters) {
      val contribs = ew.join(ranks) // narrow: same partitioner both sides
        .map { case (_, ((dst, o), r)) => (dst, r / o) }
        .reduceByKey(part, _ + _) // the round's one shuffle
      ranks = nodeR.leftOuterJoin(contribs, part)
        .mapValues { case (_, c) => base + dampNum * c.getOrElse(0L) / dampDen }
      i += 1
    }

    val rankDf = spark.createDataset(ranks).toDF(idCol, "pr")
    val odegDf = spark.createDataset(odeg).toDF(idCol, "out_links")
    val out = rankDf.join(odegDf, Seq(idCol), "left")
      .na.fill(0L, Seq("out_links"))
      .select(col(idCol), col("pr"), col("out_links"))
      .persistOnce()
    out.count() // materialize before freeing the round inputs
    ew.unpersist(false)
    nodeR.unpersist(false)
    out
  }
}
