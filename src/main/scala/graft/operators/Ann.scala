package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.EmdCols

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: exact brute-force cosine top-k (scan + distributed bounded
  * heap via TakeOrderedAndProject — no shuffle of the full score set).
  * Scale path: IVF — k-means coarse quantizer, vectors bucketed by nearest
  * centroid (one shuffle at build), queries probe the nProbe nearest
  * centroid buckets only. Centroid count ~ sqrt(N) keeps both sides
  * balanced at 100 TB; recall is tunable via nProbe.
  */
object Ann {

  /** Exact cosine top-k for one query vector (broadcast scalar math,
    * whole-stage codegen, TakeOrderedAndProject). */
  def bruteForceTopK(embs: DataFrame, query: Array[Double], k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = array(query.map(lit): _*)
    embs.select(col(idCol).as("id"),
        EmdCols.cosine(col(vecCol).cast("array<double>"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** Exact top-k neighbors for EVERY query in a (small, broadcastable)
    * query set: broadcast-nested-loop + per-query rank window. */
  def topKJoinExact(embs: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = embs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        EmdCols.cosine(col("v"), col("qv")).as("cosine"))
    // rounding-bucket rank order (the repo-wide top-k convention): ties
    // at 6 decimals break on id identically in Spark and the oracle, so
    // sub-rounding FP-shape noise cannot flip a rank
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(round(col("cosine"), 6).desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("cosine"), col("rank"))
  }

  /** Hard-negative mining — the contrastive-training data prep pass:
    * for each anchor, the k nearest neighbors whose label DIFFERS from
    * the anchor's (the "hard" negatives: maximally similar yet
    * wrong-class, the pairs that actually move a contrastive loss).
    * Same shape as [[topKJoinExact]] — anchors broadcast, ONE corpus
    * scan, per-anchor rank window — plus the label-inequality
    * predicate applied BEFORE ranking (a post-rank filter would return
    * fewer than k negatives whenever same-label rows crowd the top).
    * At deployment scale the same predicate rides the IVF probe path
    * (filter after ADC scoring, before the rank window); the exact
    * form here is the recall-1 baseline and the oracle's twin. */
  def hardNegatives(embs: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    require(k >= 1, s"hardNegatives: k must be >= 1, got $k")
    val e = embs.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"), col(labelCol).as("lab"))
    val q = queries.select(col(idCol).as("qid"),
      col(vecCol).cast("array<double>").as("qv"), col(labelCol).as("qlab"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid") && col("lab") =!= col("qlab"))
      .select(col("qid"), col("id"),
        EmdCols.cosine(col("v"), col("qv")).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(round(col("cosine"), 6).desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("cosine"), col("rank"))
  }

  /** Exact all-pairs cosine threshold join with NO driver-side collect:
    * rows are hashed into B blocks, each row is replicated to the B
    * unordered block-pairs containing its block, and each block-pair is
    * nested-looped in one task with primitive arrays and precomputed
    * norms. Work is the unavoidable O(N^2) dot products of an exact join,
    * but memory per task is two blocks (~blockTarget rows) and the driver
    * holds nothing — the shape that survives a 1000-executor scale-up.
    * Every unordered row pair meets in exactly one block-pair group. */
  def cosineAllPairsBlocked(spark: SparkSession, embs: DataFrame, tau: Double,
                            numBlocks: Int = 0, blockTarget: Int = 4096,
                            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    val base = embs.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v")).as[(Long, Array[Double])]
    // No upper cap on block count: block SIZE (not count) is the memory
    // invariant — task memory stays at two ~blockTarget-row blocks at any N.
    // The N*B-copy shuffle this implies is inherent to an exact all-pairs
    // join (every pair must meet once); callers who can tolerate recall<1
    // should use embeddingNearDup's LSH path instead.
    val b =
      if (numBlocks > 0) numBlocks
      else {
        val n = base.count()
        math.max(1, ((n + blockTarget - 1) / blockTarget).toInt)
      }
    val keyed = base.flatMap { case (id, v) =>
      val mine = (scala.util.hashing.byteswap64(id) % b).toInt.abs
      (0 until b).map { other =>
        val lo = math.min(mine, other)
        val hi = math.max(mine, other)
        // Long key: lo * b + hi overflows Int once b > ~46k (uncapped B)
        (lo.toLong * b + hi, mine, id, v)
      }
    }
    keyed.groupByKey(_._1).flatMapGroups { (key, it) =>
      val lo = (key / b).toInt
      val hi = (key % b).toInt
      blockPairCosine(lo, hi, tau, it.map { case (_, blk, id, v) => (blk, id, v) })
    }.toDF("rid", "sid", "cosine")
  }

  /** Nested-loop one block-pair with precomputed norms — the shared
    * kernel of cosineAllPairsBlocked and cosinePairsWithinGroups (same
    * arithmetic and loop order in both, so thresholds behave
    * identically). Pairs are emitted lower-id-first. */
  private def blockPairCosine(lo: Int, hi: Int, tau: Double,
      rows: Iterator[(Int, Long, Array[Double])]): Iterator[(Long, Long, Double)] = {
    val aBuf = scala.collection.mutable.ArrayBuffer[(Long, Array[Double])]()
    val bBuf = scala.collection.mutable.ArrayBuffer[(Long, Array[Double])]()
    rows.foreach { case (blk, id, v) =>
      if (blk == lo) aBuf += ((id, v)) else bBuf += ((id, v))
    }
    def norms(xs: scala.collection.mutable.ArrayBuffer[(Long, Array[Double])]) =
      xs.map { case (_, v) =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        math.sqrt(s)
      }.toArray
    val aN = norms(aBuf)
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    @inline def emit(ida: Long, va: Array[Double], na: Double,
                     idb: Long, vb: Array[Double], nb: Double): Unit = {
      var dot = 0.0; var i = 0
      while (i < va.length) { dot += va(i) * vb(i); i += 1 }
      val cos = dot / (na * nb)
      if (cos >= tau)
        out += ((math.min(ida, idb), math.max(ida, idb), cos))
    }
    if (lo == hi) {
      var i = 0
      while (i < aBuf.length) {
        var j = i + 1
        while (j < aBuf.length) {
          // canonical orientation: dot products are order-invariant, but
          // keep lower id first for deterministic output
          emit(aBuf(i)._1, aBuf(i)._2, aN(i), aBuf(j)._1, aBuf(j)._2, aN(j))
          j += 1
        }
        i += 1
      }
    } else {
      val bN = norms(bBuf)
      var i = 0
      while (i < aBuf.length) {
        var j = 0
        while (j < bBuf.length) {
          emit(aBuf(i)._1, aBuf(i)._2, aN(i), bBuf(j)._1, bBuf(j)._2, bN(j))
          j += 1
        }
        i += 1
      }
    }
    out.iterator
  }

  /** Exact within-group cosine threshold pairs — the SemDeDup pair
    * kernel: the group (a k-means cluster) is the blocking key, and any
    * group larger than blockTarget is further sub-blocked with the
    * cosineAllPairsBlocked scheme, so task memory stays at two
    * ~blockTarget-row blocks no matter how skewed a cluster gets. The
    * per-group block counts are an O(groups) aggregate — clusters scale
    * ~N/clusterTarget, so the collect is cells-sized, not data-sized.
    * Input columns: id (long), v (array<double>), grp (long). */
  def cosinePairsWithinGroups(spark: SparkSession, df: DataFrame, tau: Double,
                              blockTarget: Int = 4096): DataFrame = {
    import spark.implicits._
    import graft.core.Caching._
    // pin ONE evaluation: the group census and the block-keyed flatMap
    // must see the same rows — an unpinned input whose `grp` derivation
    // re-evaluates differently would probe the census map with a group
    // it never counted (result comes back materialized; the cache is
    // the caller's to unpersist, the importanceSelect convention)
    val baseDf = df.select(col("id").cast("long").as("id"),
      col("v").cast("array<double>").as("v"),
      col("grp").cast("long").as("grp")).persistOnce()
    val base = baseDf.as[(Long, Array[Double], Long)]
    val blocksPerGroup: Map[Long, Int] =
      base.groupBy(col("grp")).agg(count(lit(1)).as("n")).as[(Long, Long)]
        .collect().map { case (g, n) =>
          g -> math.max(1, ((n + blockTarget - 1) / blockTarget).toInt)
        }.toMap
    val bc = spark.sparkContext.broadcast(blocksPerGroup)
    def blocksOf(g: Long): Int = bc.value.getOrElse(g,
      throw new IllegalStateException(
        s"cosinePairsWithinGroups: group $g absent from the census — " +
          "the input re-evaluated nondeterministically under the pin"))
    val keyed = base.flatMap { case (id, v, g) =>
      val b = blocksOf(g)
      val mine = (scala.util.hashing.byteswap64(id) % b).toInt.abs
      (0 until b).map { other =>
        val lo = math.min(mine, other)
        val hi = math.max(mine, other)
        ((g, lo.toLong * b + hi), mine, id, v)
      }
    }
    val out = keyed.groupByKey(_._1).flatMapGroups { (key, it) =>
      val b = blocksOf(key._1)
      val lo = (key._2 / b).toInt
      val hi = (key._2 % b).toInt
      blockPairCosine(lo, hi, tau, it.map { case (_, blk, id, v) => (blk, id, v) })
    }.toDF("rid", "sid", "cosine").persistOnce()
    out.count()
    baseDf.unpersist(false)
    out
  }

  /** Exact all-pairs cosine threshold join — the quadratic VERIFICATION
    * baseline for near-dup detection (spec oracle role). One side is
    * collected and broadcast (norms precomputed), the probe side streams
    * through primitive JVM loops. Guarded: refuses data too large to
    * collect — production paths are cosineAllPairsBlocked (exact) and
    * Dedup.embeddingNearDup (LSH). */
  def cosineAllPairsExact(spark: SparkSession, embs: DataFrame, tau: Double,
                          idCol: String = "vec_id", vecCol: String = "embedding",
                          maxCollectRows: Long = 1 << 20): DataFrame = {
    import spark.implicits._
    val pre = embs.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val cnt = pre.limit(maxCollectRows.toInt + 1).count()
    require(cnt <= maxCollectRows,
      s"cosineAllPairsExact would collect > $maxCollectRows rows; " +
        "use cosineAllPairsBlocked or Dedup.embeddingNearDup at this scale")
    val all = pre.as[(Long, Array[Double])].collect().sortBy(_._1)
    val norms = all.map { case (_, v) =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    val allB = spark.sparkContext.broadcast(all)
    val normsB = spark.sparkContext.broadcast(norms)
    val idsDf = embs.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    idsDf.as[(Long, Array[Double])].mapPartitions { it =>
      val ref = allB.value
      val refNorms = normsB.value
      it.flatMap { case (id, v) =>
        var myNorm = 0.0
        var i = 0
        while (i < v.length) { myNorm += v(i) * v(i); i += 1 }
        val nv = math.sqrt(myNorm)
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
        var j = 0
        while (j < ref.length) {
          if (ref(j)._1 > id) {
            val rv = ref(j)._2
            var dot = 0.0
            var k = 0
            while (k < v.length) { dot += v(k) * rv(k); k += 1 }
            val cos = dot / (nv * refNorms(j))
            if (cos >= tau) out += ((id, ref(j)._1, cos))
          }
          j += 1
        }
        out
      }
    }.toDF("rid", "sid", "cosine")
  }

  /** Global max-|value| for symmetric scalar quantization: ONE
    * treeAggregate over the corpus — a single double of task state, no
    * explode (a posexplode-groupBy form would shuffle dim x N rows at
    * 100 TB for one comparison's worth of information). Max is
    * comparison-only (no FP accumulation), so the result is
    * partition-order-independent and engine-exact. */
  def sq8MaxAbs(embs: DataFrame, vecCol: String = "embedding"): Double =
    embs.select(col(vecCol).cast("array<double>")).rdd
      .map(_.getSeq[Double](0))
      .treeAggregate(0.0)(
        { (a, v) =>
          var m = a
          var i = 0
          while (i < v.length) {
            val x = math.abs(v(i))
            if (x > m) m = x
            i += 1
          }
          m
        },
        math.max)

  /** One value's symmetric signed SQ8 code in [-127, 127]:
    * floor(x * 127.0 / a + 0.5), left-associated IEEE doubles — the
    * exact SHAPE the oracle replays, so codes are bit-identical across
    * engines with no rounding convention. SYMMETRY is the load-bearing
    * choice, measured not assumed: per-dimension AFFINE codes
    * (floor((x - min_d) * 255 / range_d + 0.5)) destroy the dot-product
    * proxy — the code dot expands into cross terms involving each
    * vector's per-dim offsets, and on the embeddings fixture the exact
    * cosine top-20 needed quantized rank 1435/2000 to cover. Zero-offset
    * shared-scale codes make the integer dot proportional to the true
    * dot up to quantization noise: measured max qrank 20/20 at all
    * three scales (DuckDB probe, recorded in PLANS.md). */
  @inline private def sq8Code(x: Double, a: Double): Long =
    if (a == 0.0) 0L else math.floor(x * 127.0 / a + 0.5).toLong

  /** Int8 symmetric scalar-quantized brute-force top-k (the signed
    * int8 quantization recipe, public knowledge — FAISS SQ8_direct /
    * standard int8 inference quantization): one global scale, signed
    * codes, integer dot-product scoring, (score DESC, id) rank. Scores
    * are pure integers — ranking is engine-exact with no FP anywhere
    * past the (fixed-shape) code map.
    *
    * Scale shape: stats is one treeAggregate (a scalar); scoring is ONE
    * map-side scan (plain-loop kernel, primitive arrays, broadcast
    * query codes) into TakeOrderedAndProject — no shuffle, no driver
    * loop. The point of SQ8 at 100 TB is memory bandwidth: the codes
    * array is 8x smaller than float64 vectors, and the integer kernel
    * has no per-element boxing (an aggregate()/zip_with HOF form would
    * evaluate interpreted — the measured repo rule). */
  def sq8TopK(embs: DataFrame, query: Array[Double], k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              excludeId: Option[Long] = None): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val dim = query.length
    val a = sq8MaxAbs(embs, vecCol)
    val qCodes = Array.tabulate(dim)(i => sq8Code(query(i), a))
    val bc = spark.sparkContext.broadcast((a, qCodes))
    val base = excludeId.fold(embs)(q => embs.filter(col(idCol) =!= q))
    base.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val (ba, bq) = bc.value
        it.map { case (id, v) =>
          var dot = 0L
          var i = 0
          while (i < dim) {
            dot += sq8Code(v(i), ba) * bq(i)
            i += 1
          }
          (id, dot)
        }
      }
      .toDF("id", "qdot")
      .orderBy(col("qdot").desc, col("id"))
      .limit(k)
  }

  /** IVF coarse-quantizer size for an n-row corpus: ~sqrt(n), clamped.
    * sqrt(n) balances the two scan costs of a probe (centroid scan is
    * O(c), probed-bucket rerank is O(n/c) per probe — minimized at
    * c = sqrt(n)); the clamp keeps tiny corpora exact-ish and bounds the
    * broadcast centroid table at cluster scale. */
  def scaledCentroids(n: Long, lo: Int = 16, hi: Int = 4096): Int =
    math.max(lo, math.min(hi, math.ceil(math.sqrt(math.max(0L, n).toDouble)).toInt))

  /** Deterministic seeded k-means (Lloyd, fixed iterations) for the IVF
    * coarse quantizer. Runs on a sample collected to the driver — centroid
    * count and sample are O(sqrt N), not data-sized. */
  def trainCentroids(spark: SparkSession, embs: DataFrame, numCentroids: Int,
                     iters: Int = 5, sampleSize: Int = 0, seed: Long = 42L,
                     vecCol: String = "embedding"): Array[Array[Double]] = {
    import spark.implicits._
    // sample scales with the quantizer, not the data: ~32 points per
    // centroid (numCentroids itself should be ~sqrt(N) at scale)
    val sz = if (sampleSize > 0) sampleSize else math.max(2048, 32 * numCentroids)
    val sample = embs.select(col(vecCol).cast("array<double>"))
      .as[Array[Double]].orderBy(rand(seed)).limit(sz).collect()
    require(sample.nonEmpty, "trainCentroids: input has no embedding rows")
    val rnd = new scala.util.Random(seed)
    var centroids = Array.tabulate(numCentroids)(_ =>
      sample(rnd.nextInt(sample.length)).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(numCentroids)(new Array[Double](centroids(0).length))
      val counts = new Array[Long](numCentroids)
      sample.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(numCentroids) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }
    }
    centroids
  }

  private def nearestCentroid(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0
      var i = 0
      while (i < v.length) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** IVF index: (id, v, bucket) with bucket = nearest centroid. */
  def ivfIndex(spark: SparkSession, embs: DataFrame,
               centroids: Array[Array[Double]],
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    val cB = spark.sparkContext.broadcast(centroids)
    embs.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) => (id, v, nearestCentroid(v, cB.value)) }
      .toDF("id", "v", "bucket")
  }

  /** IVF query: probe the nProbe centroid buckets nearest to the query,
    * exact-rerank inside them. Partition pruning analog: only probed
    * buckets are scanned. */
  def ivfTopK(spark: SparkSession, index: DataFrame,
              centroids: Array[Array[Double]], query: Array[Double], k: Int,
              nProbe: Int = 4): DataFrame = {
    val probes = centroids.indices
      .sortBy { c =>
        var d = 0.0
        var i = 0
        while (i < query.length) { val t = query(i) - centroids(c)(i); d += t * t; i += 1 }
        (d, c)
      }
      .take(nProbe)
    val q = array(query.map(lit): _*)
    index.filter(col("bucket").isin(probes: _*))
      .select(col("id"), EmdCols.cosine(col("v"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  // -------------------------------------------------------------------
  // Product quantization — the IVF-PQ memory path. Vectors are split
  // into M contiguous subspaces; each subspace trains its own
  // ksub-centroid codebook with the SAME integer-exact Lloyd's
  // arithmetic as Cluster.kmeans (quantize once, BIGINT squared-L2
  // argmin with ties to the lowest code, rounded-integer-mean updates),
  // so a SQL oracle can replay training, encoding, and scoring
  // bit-for-bit. At 100 TB this is the difference between holding
  // 4*dim bytes and M code bytes per vector: the encoded index fits in
  // executor memory where raw vectors cannot, and a query scans codes
  // against a broadcast M x ksub table of integer distances (asymmetric
  // distance computation) — whole-stage-codegen lookups + one
  // TakeOrderedAndProject, no shuffle of the score set.
  // -------------------------------------------------------------------

  /** The codebook set as ONE nested array literal — indexing it inside
    * loop-based higher-order functions keeps the expression tree
    * O(1)-sized regardless of numSub x ksub, where per-centroid unrolled
    * aggregates would explode codegen compile time. */
  private def cbLit(cbs: Array[Array[Array[Long]]]) =
    typedLit(cbs.map(_.map(_.toSeq).toSeq).toSeq)

  /** Argmin code of sub-vector `sv` within subspace `m` (0-based Column):
    * BIGINT squared-L2 against each centroid, ties to the LOWEST code
    * (array_position returns the first match) — the Cluster.assignCols
    * order, replayed by the oracle's (d2, cid) row_number. */
  private def argminCode(cb: Column, m: Column, sv: Column): Column = {
    val d2s = transform(element_at(cb, m + 1), cent =>
      aggregate(zip_with(sv, cent, (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x))
    (array_position(d2s, array_min(d2s)) - 1).cast("int")
  }

  /** Per-subspace PQ codebooks over the integer-quantized corpus:
    * element m is a ksub x (dim/numSub) centroid table. Seeds per
    * subspace are the sub-slices of the ksub lowest-id vectors (the
    * Cluster.kmeans seed rule, replayed per subspace by the oracle);
    * updates are rounded integer means with empty codes keeping the
    * previous centroid. ALL subspaces train together: each iteration is
    * ONE job over an exploded (id, m, sv) frame — numSub sequential
    * Lloyd's loops would pay the ~0.8 s/job Catalyst re-planning tax
    * numSub x iters times for identical arithmetic. */
  def pqTrain(spark: SparkSession, embs: DataFrame, numSub: Int, ksub: Int,
              iters: Int = 2, scale: Int = 1000, idCol: String = "vec_id",
              vecCol: String = "embedding",
              cutover: Long = Cluster.IterCutover): Array[Array[Array[Long]]] =
    pqTrainQuantized(spark, Cluster.quantize(embs, scale, idCol, vecCol),
      numSub, ksub, iters, cutover)

  /** [[pqTrain]] over an ALREADY-quantized `(id, v ARRAY<BIGINT>)` frame
    * — the entry point for residual vectors ([[ivfPqTopK]]), which are
    * integer by construction (quantized vector minus integer coarse
    * centroid) and must NOT be re-quantized. */
  def pqTrainQuantized(spark: SparkSession, quantized: DataFrame,
                       numSub: Int, ksub: Int, iters: Int = 2,
                       cutover: Long = Cluster.IterCutover): Array[Array[Array[Long]]] = {
    import graft.core.Caching._
    require(numSub > 0 && ksub > 0 && iters >= 0,
      s"pqTrain: numSub=$numSub ksub=$ksub iters=$iters")
    // fresh projection: persistOnce on the caller's own frame would
    // alias it, and the finally-unpersist would evict a cache the
    // caller still relies on
    val q = quantized.select(col("id"), col("v")).persistOnce()
    var subDf: DataFrame = null // DF-path exploded frame, built on demand
    try {
      val dim = q.select(size(col("v"))).head().getInt(0)
      require(dim % numSub == 0, s"pqTrain: dim=$dim % numSub=$numSub != 0")
      val sub = dim / numSub
      val seedRows = q.orderBy(col("id")).limit(ksub)
        .select(col("v")).collect().map(_.getSeq[Long](0).toArray)
      require(seedRows.length >= ksub,
        s"pqTrain: ksub=$ksub exceeds input row count ${seedRows.length}")
      var cbs: Array[Array[Array[Long]]] = Array.tabulate(numSub)(m =>
        seedRows.map(v => v.slice(m * sub, m * sub + sub)))
      // below the repo's iterative-loop cutover, each training pass is an
      // RDD mapPartitions of plain-loop partial (count, sum) vectors per
      // (subspace, code) — numSub*ksub rows per partition, merged by key,
      // no interpreted HOF evaluation; identical integer arithmetic to
      // the DataFrame pass (spec: ClusterSpec path equivalence)
      val rddPath = iters > 0 && q.count() <= cutover
      for (_ <- 0 until iters) {
        val prev = cbs
        if (rddPath) {
          val sc = spark.sparkContext
          val bc = sc.broadcast(prev)
          val partials = q.select(col("v")).rdd
            .mapPartitions { it =>
              val cb = bc.value
              val cnts = Array.fill(numSub)(new Array[Long](ksub))
              val sums = Array.fill(numSub, ksub)(new Array[Long](sub))
              it.foreach { row =>
                val v = row.getSeq[Long](0).toArray
                var m = 0
                while (m < numSub) {
                  var bd = Long.MaxValue
                  var bcode = 0
                  var c = 0
                  while (c < ksub) {
                    val cent = cb(m)(c)
                    var d = 0L
                    var i = 0
                    while (i < sub) {
                      val t = v(m * sub + i) - cent(i); d += t * t; i += 1
                    }
                    // strict < keeps the FIRST min — argminCode's
                    // array_position tie rule (lowest code)
                    if (d < bd) { bd = d; bcode = c }
                    c += 1
                  }
                  cnts(m)(bcode) += 1
                  var i = 0
                  while (i < sub) { sums(m)(bcode)(i) += v(m * sub + i); i += 1 }
                  m += 1
                }
              }
              for {
                m <- Iterator.range(0, numSub)
                c <- Iterator.range(0, ksub) if cnts(m)(c) > 0
              } yield ((m, c), (cnts(m)(c), sums(m)(c)))
            }
            .reduceByKey((a, b) =>
              (a._1 + b._1, Array.tabulate(sub)(i => a._2(i) + b._2(i))))
            .collect().toMap
          bc.destroy()
          cbs = Array.tabulate(numSub)(m => Array.tabulate(ksub)(c =>
            partials.get((m, c)) match {
              case Some((n, s)) => s.map(Cluster.roundedMean(_, n))
              case None => prev(m)(c)
            }))
        } else {
          if (subDf == null)
            subDf = q.select(col("id"),
                posexplode(transform(sequence(lit(0), lit(numSub - 1)),
                  m => slice(col("v"), m * sub + 1, lit(sub)))).as(Seq("m", "sv")))
              .persistOnce()
          val code = argminCode(cbLit(prev), col("m"), col("sv"))
          val upd = subDf
            .select(col("m"), code.as("c"),
              posexplode(col("sv")).as(Seq("dim", "val")))
            .groupBy(col("m"), col("c"), col("dim"))
            .agg(count(lit(1)).as("n"), sum(col("val")).as("s"))
            .collect()
            .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
              (r.getLong(3), r.getLong(4))).toMap
          cbs = Array.tabulate(numSub)(m => Array.tabulate(ksub)(c =>
            Array.tabulate(sub) { i =>
              upd.get((m, c, i)) match {
                // the Cluster.roundedMean update step, bit-identical
                case Some((n, s)) => Cluster.roundedMean(s, n)
                case None => prev(m)(c)(i)
              }
            }))
        }
      }
      cbs
    } finally {
      if (subDf != null) subDf.unpersist(false)
      q.unpersist(false)
    }
  }

  /** PQ-encode: (id, codes ARRAY<INT>), codes(m) = argmin codebook entry
    * of subspace m — same BIGINT squared-L2 / lowest-code tie order as
    * training, so the SQL oracle replays it row-for-row.
    *
    * Runs as a per-partition plain loop, not a Catalyst expression:
    * `aggregate`/`zip_with` higher-order functions never enter
    * whole-stage codegen (interpreted eval, per-element boxing), so at
    * EVERY scale the numSub x ksub argmin is cheaper as primitive long
    * arithmetic — a pure map with no shuffle either way, and nothing is
    * collected. (The codebooks ride in the closure: O(numSub x ksub x
    * dim/numSub) longs = the same payload the literal-expression form
    * embedded in the plan.) */
  def pqEncode(embs: DataFrame, codebooks: Array[Array[Array[Long]]],
               scale: Int = 1000, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame =
    pqEncodeQuantized(Cluster.quantize(embs, scale, idCol, vecCol), codebooks)

  /** [[pqEncode]] over an ALREADY-quantized `(id, v)` frame (residual
    * path — see [[pqTrainQuantized]]). */
  def pqEncodeQuantized(quantized: DataFrame,
                        codebooks: Array[Array[Array[Long]]]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, IntegerType, StructField, StructType}
    val numSub = codebooks.length
    val sub = codebooks(0)(0).length
    val q = quantized
    val schema = StructType(Seq(q.schema("id").copy(name = "id"),
      StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false)))
    val rows = q.rdd.mapPartitions { it =>
      it.map { r =>
        val v = r.getSeq[Long](1).toArray
        val codes = new Array[Int](numSub)
        var m = 0
        while (m < numSub) {
          var bd = Long.MaxValue
          var bcode = 0
          var c = 0
          while (c < codebooks(m).length) {
            val cent = codebooks(m)(c)
            var d = 0L
            var i = 0
            while (i < sub) { val t = v(m * sub + i) - cent(i); d += t * t; i += 1 }
            // strict < keeps the FIRST min — the training tie rule
            if (d < bd) { bd = d; bcode = c }
            c += 1
          }
          codes(m) = bcode
          m += 1
        }
        Row(r.get(0), codes.toSeq)
      }
    }
    q.sparkSession.createDataFrame(rows, schema)
  }

  /** ADC top-k over a PQ-encoded index: the ALREADY-QUANTIZED query
    * (quantize it with [[Cluster.quantize]] so driver and oracle share
    * Spark's exact rounding) is turned into an M x ksub integer lookup
    * table of per-subspace centroid distances; each row's score is M
    * literal-array lookups summed — pure BIGINT, ranked by
    * (adc_d2, id), a total order with no FP boundary. */
  def pqTopK(index: DataFrame, codebooks: Array[Array[Array[Long]]],
             quantizedQuery: Array[Long], k: Int): DataFrame = {
    val sub = codebooks(0)(0).length
    val lut: Array[Array[Long]] = codebooks.zipWithIndex.map { case (cb, m) =>
      cb.map { cent =>
        var d = 0L
        var i = 0
        while (i < sub) {
          val t = quantizedQuery(m * sub + i) - cent(i)
          d += t * t
          i += 1
        }
        d
      }
    }
    val score = lut.zipWithIndex.map { case (lm, m) =>
      element_at(lit(lm), element_at(col("codes"), m + 1) + 1)
    }.reduce(_ + _)
    index.select(col("id"), score.as("adc_d2"))
      .orderBy(col("adc_d2"), col("id"))
      .limit(k)
  }

  /** Residual IVF-PQ top-k — the two-level production ANN layout that
    * IVF and PQ separately only approximate:
    *
    *  - a kCoarse-centroid coarse quantizer (the [[Cluster]] integer
    *    Lloyd's — same seeds/ties/update arithmetic) partitions the
    *    corpus into inverted lists;
    *  - PQ codebooks train on RESIDUALS (vector minus its coarse
    *    centroid — still exact BIGINTs, so the whole two-level pipeline
    *    stays oracle-replayable), which carry far less variance than raw
    *    vectors: the same code budget quantizes much finer;
    *  - a query probes the nProbe nearest coarse cells and scores ONLY
    *    their members by ADC — with a PER-CELL lookup table built from
    *    the query's per-cell residual (q - centroid), the textbook
    *    IVF-ADC recipe.
    *
    * At 100 TB: the index holds one byte-ish code row per vector
    * (cluster + numSub codes), the scan touches nProbe/kCoarse of the
    * corpus, scoring is literal-array lookups in whole-stage codegen,
    * and the result is one TakeOrdered — no shuffle of the score set.
    * Training is the [[Cluster]]/[[pqTrainQuantized]] job shapes.
    *
    * Output: (id, adc_d2 BIGINT) top-k under the (adc_d2, id) total
    * order, restricted to the probed cells. */
  /** A built residual IVF-PQ index: coarse centroids + residual PQ
    * codebooks (both bounded, broadcastable) and the encoded corpus
    * frame `(id, cluster INT, codes ARRAY<INT>)` — one compact code row
    * per vector, MATERIALIZED (the training inputs' caches are already
    * released). `close()` releases the index frame. */
  final case class IvfPqIndex(coarse: Array[Array[Long]],
                              codebooks: Array[Array[Array[Long]]],
                              index: DataFrame,
                              dim: Int, numSub: Int) {
    def sub: Int = dim / numSub
    def ksub: Int = codebooks(0).length
    /** Broadcast ONCE per built index: the batch/stream read path runs
      * once per micro-batch — re-broadcasting the static arrays every
      * call would accumulate an unbounded broadcast backlog over a
      * long-running stream. */
    val coarseB: org.apache.spark.broadcast.Broadcast[Array[Array[Long]]] =
      index.sparkSession.sparkContext.broadcast(coarse)
    val cbsB: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Long]]]] =
      index.sparkSession.sparkContext.broadcast(codebooks)
    def close(): Unit = {
      index.unpersist(false)
      // unpersist, not destroy: an evicted downstream partition may
      // still recompute through the broadcasts; the driver copy is tiny
      coarseB.unpersist(false)
      cbsB.unpersist(false)
    }
  }

  /** Train the residual IVF-PQ layout once — the build half of
    * [[ivfPqTopK]], shared by the single-query read path, the
    * multi-query batch path ([[ivfPqBatchTopK]]) and the stream-static
    * ANN leg (the index is static by definition; queries come and go).
    * Identical arithmetic to the inlined training this replaces:
    * integer Lloyd's coarse quantizer, plain-loop residuals, residual
    * PQ books, plain-loop encode. */
  def buildIvfPqIndex(spark: SparkSession, corpus: DataFrame,
                      kCoarse: Int, numSub: Int, ksub: Int, iters: Int = 2,
                      scale: Int = 1000, idCol: String = "vec_id",
                      vecCol: String = "embedding"): IvfPqIndex = {
    import graft.core.Caching._
    val q = Cluster.quantize(corpus, scale, idCol, vecCol).persistOnce()
    try {
      val dim = q.select(size(col("v"))).head().getInt(0)
      require(dim % numSub == 0, s"buildIvfPqIndex: dim=$dim % numSub=$numSub != 0")
      val coarse = Cluster.lloydCentroids(q, kCoarse, iters, dim)
      // (id, cluster, residual) in one plain-loop pass — the assignment
      // argmin and integer subtraction stay out of interpreted HOF eval
      val residSchema = org.apache.spark.sql.types.StructType(Seq(
        q.schema("id").copy(name = "id"),
        org.apache.spark.sql.types.StructField("cluster",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = false),
          nullable = false)))
      val resid = spark.createDataFrame(
        q.rdd.mapPartitions { it =>
          it.map { r =>
            val v = r.getSeq[Long](1).toArray
            val c = Cluster.argminIdx(coarse, v)._1
            val cent = coarse(c)
            val rv = new Array[Long](v.length)
            var i = 0
            while (i < v.length) { rv(i) = v(i) - cent(i); i += 1 }
            org.apache.spark.sql.Row(r.get(0), c, rv.toSeq)
          }
        }, residSchema).persistOnce()
      try {
        val cbs = pqTrainQuantized(spark, resid.select(col("id"), col("v")),
          numSub, ksub, iters)
        val index = pqEncodeQuantized(resid.select(col("id"), col("v")), cbs)
          .join(resid.select(col("id"), col("cluster")), "id")
          .persistOnce()
        // materialize before the finallys release the training caches —
        // the returned index must not silently recompute training
        index.count()
        IvfPqIndex(coarse, cbs, index, dim, numSub)
      } finally resid.unpersist(false)
    } finally q.unpersist(false)
  }

  def ivfPqTopK(spark: SparkSession, corpus: DataFrame,
                quantizedQuery: Array[Long], kCoarse: Int, nProbe: Int,
                numSub: Int, ksub: Int, k: Int, iters: Int = 2,
                scale: Int = 1000, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    import graft.core.Caching._
    require(nProbe >= 1 && nProbe <= kCoarse, s"nProbe=$nProbe kCoarse=$kCoarse")
    val idx = buildIvfPqIndex(spark, corpus, kCoarse, numSub, ksub, iters,
      scale, idCol, vecCol)
    try {
      // materialize before the finally closes the index — the result
      // must not silently recompute through an unpersisted index frame
      val out = ivfPqTopKOnIndex(idx, quantizedQuery, nProbe, k).persistOnce()
      out.count()
      out
    } finally idx.close()
  }

  /** Single-query read path over a PRE-BUILT (possibly session-shared)
    * index — the query half of [[ivfPqTopK]], byte-identical arithmetic
    * and (adc_d2, id) tie order; the index's owner controls its
    * lifetime. Returns a lazy frame (the index frame is persisted, so
    * re-evaluation is a cached scan). */
  def ivfPqTopKOnIndex(idx: IvfPqIndex, quantizedQuery: Array[Long],
                       nProbe: Int, k: Int): DataFrame = {
    require(nProbe >= 1 && nProbe <= idx.coarse.length,
      s"nProbe=$nProbe kCoarse=${idx.coarse.length}")
    val dim = idx.dim
    val sub = idx.sub
    val coarse = idx.coarse
    val cbs = idx.codebooks
    // driver-side probe: nProbe nearest coarse cells under (d2, cid)
    val probed = coarse.zipWithIndex.map { case (cent, c) =>
      var d = 0L
      var i = 0
      while (i < dim) { val t = quantizedQuery(i) - cent(i); d += t * t; i += 1 }
      (d, c)
    }.sorted.take(nProbe).map(_._2)
    // per-cell ADC lookup table from the query's per-cell residual
    def lutFor(c: Int): Array[Array[Long]] = {
      val cent = coarse(c)
      cbs.zipWithIndex.map { case (cb, m) =>
        cb.map { pqc =>
          var d = 0L
          var i = 0
          while (i < sub) {
            val t = (quantizedQuery(m * sub + i) - cent(m * sub + i)) - pqc(i)
            d += t * t
            i += 1
          }
          d
        }
      }
    }
    def adc(lut: Array[Array[Long]]): Column =
      lut.zipWithIndex.map { case (lm, m) =>
        element_at(lit(lm), element_at(col("codes"), m + 1) + 1)
      }.reduce(_ + _)
    val score = probed.tail.foldLeft(
        when(col("cluster") === probed.head, adc(lutFor(probed.head)))) {
      (acc, c) => acc.when(col("cluster") === c, adc(lutFor(c)))
    }
    idx.index
      .filter(col("cluster").isin(probed.map(Integer.valueOf): _*))
      .select(col("id"), score.as("adc_d2"))
      .orderBy(col("adc_d2"), col("id"))
      .limit(k)
  }

  /** Multi-query IVF-PQ read path over a PRE-BUILT static index — the
    * distributed serving shape behind both the batch query-set workload
    * and the stream-static ANN leg (each micro-batch of query vectors
    * is one call):
    *
    *  - each query row computes its own probe list and per-cell ADC
    *    lookup tables EXECUTOR-SIDE in a plain loop over the broadcast
    *    centroids/codebooks (nothing per-query touches the driver);
    *  - the (qid, cluster, lut) probe rows — nProbe rows of
    *    numSub x ksub longs per query, bounded — broadcast-join the
    *    cluster-keyed index, so the corpus never reshuffles and only
    *    probed members are scored;
    *  - per-query top-k is a rank window over the scored rows, keyed
    *    by qid; the `row_number <= k` filter plans as a PARTIAL
    *    WindowGroupLimit before the exchange (verified in the explain
    *    dump — the q_ann_batch shape), so each map task keeps a k-heap
    *    per query and the shuffle carries ~k rows per query per
    *    partition, never the probed corpus fraction.
    *
    * Same integer arithmetic and (adc_d2, id) tie order as
    * [[ivfPqTopK]]; a query set of one reproduces it row-for-row
    * (spec-pinned). Output: (qid, id, adc_d2) — k rows per query.
    *
    * `queries` must carry (qid BIGINT, v ARRAY<BIGINT>) with v already
    * quantized by [[Cluster.quantize]]'s rounding. */
  def ivfPqBatchTopK(queries: DataFrame, idx: IvfPqIndex,
                     nProbe: Int, k: Int): DataFrame = {
    require(nProbe >= 1 && nProbe <= idx.coarse.length,
      s"nProbe=$nProbe kCoarse=${idx.coarse.length}")
    val spark = queries.sparkSession
    import spark.implicits._
    val numSub = idx.numSub
    val ksub = idx.ksub
    val sub = idx.sub
    val coarseB = idx.coarseB
    val cbsB = idx.cbsB
    val probes = queries
      .select(col("qid").cast("long"), col("v").cast("array<long>"))
      .as[(Long, Array[Long])]
      .mapPartitions { it =>
        val coarse = coarseB.value
        val cbs = cbsB.value
        it.flatMap { case (qid, qv) =>
          // probe order mirrors ivfPqTopK: (d2, cid) ascending
          val cells = coarse.zipWithIndex.map { case (cent, c) =>
            var d = 0L
            var i = 0
            while (i < qv.length) { val t = qv(i) - cent(i); d += t * t; i += 1 }
            (d, c)
          }.sorted.take(nProbe)
          cells.iterator.map { case (_, c) =>
            val cent = coarse(c)
            val lut = new Array[Long](numSub * ksub)
            var m = 0
            while (m < numSub) {
              var cc = 0
              while (cc < ksub) {
                val pqc = cbs(m)(cc)
                var d = 0L
                var i = 0
                while (i < sub) {
                  val t = (qv(m * sub + i) - cent(m * sub + i)) - pqc(i)
                  d += t * t
                  i += 1
                }
                lut(m * ksub + cc) = d
                cc += 1
              }
              m += 1
            }
            (qid, c, lut)
          }
        }
      }.toDF("qid", "cluster", "lut")
    val adcScore = udf { (codes: Seq[Int], lut: Seq[Long]) =>
      var s = 0L
      var m = 0
      while (m < numSub) { s += lut(m * ksub + codes(m)); m += 1 }
      s
    }
    idx.index.join(broadcast(probes), "cluster")
      .select(col("qid"), col("id"),
        adcScore(col("codes"), col("lut")).as("adc_d2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("adc_d2"), col("id"))))
      .filter(col("rn") <= k)
      .select(col("qid"), col("id"), col("adc_d2"))
  }

  /** [[ivfPqTopK]] with the exact-rerank tail — the complete production
    * read path: probe cells, ADC-score members, fetch the `shortlist`
    * best by id (broadcast semi-join, not a corpus shuffle), rank them
    * by EXACT integer squared-L2 against the full query. Approximation
    * bounds recall only; the returned order is exact. */
  def ivfPqTopKRerank(spark: SparkSession, corpus: DataFrame,
                      quantizedQuery: Array[Long], kCoarse: Int, nProbe: Int,
                      numSub: Int, ksub: Int, k: Int, shortlist: Int,
                      iters: Int = 2, scale: Int = 1000,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    val cand = ivfPqTopK(spark, corpus, quantizedQuery, kCoarse, nProbe,
      numSub, ksub, shortlist, iters, scale, idCol, vecCol)
      .select(col("id"))
    rerankExact(corpus, cand, quantizedQuery, k, scale, idCol, vecCol)
  }

  /** [[ivfPqTopKRerank]] over a PRE-BUILT index — shortlist from
    * [[ivfPqTopKOnIndex]], identical exact-rerank tail. */
  def ivfPqTopKRerankOnIndex(corpus: DataFrame, idx: IvfPqIndex,
                             quantizedQuery: Array[Long], nProbe: Int,
                             k: Int, shortlist: Int,
                             scale: Int = 1000, idCol: String = "vec_id",
                             vecCol: String = "embedding"): DataFrame = {
    val cand = ivfPqTopKOnIndex(idx, quantizedQuery, nProbe, shortlist)
      .select(col("id"))
    rerankExact(corpus, cand, quantizedQuery, k, scale, idCol, vecCol)
  }

  /** The exact-rerank tail shared by the build-and-query and the
    * prebuilt-index read paths (one body, so the integer L2 and the
    * (d2, id) tie order cannot drift apart). */
  private def rerankExact(corpus: DataFrame, cand: DataFrame,
                          quantizedQuery: Array[Long], k: Int, scale: Int,
                          idCol: String, vecCol: String): DataFrame =
    Cluster.quantize(corpus, scale, idCol, vecCol)
      .join(broadcast(cand), "id")
      .select(col("id"),
        aggregate(zip_with(col("v"), lit(quantizedQuery),
          (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x).as("d2"))
      .orderBy(col("d2"), col("id"))
      .limit(k)

  /** ADC shortlist + exact rerank — the production IVF-PQ read path:
    * the `shortlist` best ADC candidates are fetched by id (a broadcast
    * semi-join of R ids against the corpus, not a corpus shuffle) and
    * ranked by EXACT integer squared-L2 against the quantized query.
    * ADC quantization error only costs recall if a true neighbor misses
    * the whole shortlist; the returned order is exact. Output (id, d2)
    * top-k under the total (d2, id) order. */
  def pqTopKRerank(embs: DataFrame, index: DataFrame,
                   codebooks: Array[Array[Array[Long]]],
                   quantizedQuery: Array[Long], k: Int, shortlist: Int,
                   scale: Int = 1000, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val cand = pqTopK(index, codebooks, quantizedQuery, shortlist)
      .select(col("id"))
    Cluster.quantize(embs, scale, idCol, vecCol)
      .join(broadcast(cand), "id")
      .select(col("id"),
        aggregate(zip_with(col("v"), lit(quantizedQuery),
          (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x).as("d2"))
      .orderBy(col("d2"), col("id"))
      .limit(k)
  }
}
