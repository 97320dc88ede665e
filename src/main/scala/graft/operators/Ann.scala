package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("cosine"), col("rank"))
  }

  /** Exact all-pairs cosine threshold join — the quadratic baseline for
    * near-dup detection. One side is collected and broadcast (norms
    * precomputed), the probe side streams through primitive JVM loops —
    * no per-pair array allocation. For data too large to broadcast, use
    * Dedup.embeddingNearDup (LSH) — this operator IS the small-side/
    * verification baseline. */
  def cosineAllPairsExact(spark: SparkSession, embs: DataFrame, tau: Double,
                          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    val all = embs.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
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

  /** Deterministic seeded k-means (Lloyd, fixed iterations) for the IVF
    * coarse quantizer. Runs on a sample collected to the driver — centroid
    * count and sample are O(sqrt N), not data-sized. */
  def trainCentroids(spark: SparkSession, embs: DataFrame, numCentroids: Int,
                     iters: Int = 5, sampleSize: Int = 2048, seed: Long = 42L,
                     vecCol: String = "embedding"): Array[Array[Double]] = {
    import spark.implicits._
    val sample = embs.select(col(vecCol).cast("array<double>"))
      .as[Array[Double]].orderBy(rand(seed)).limit(sampleSize).collect()
    val rnd = new scala.util.Random(seed)
    var centroids = Array.tabulate(numCentroids)(i => sample(
      if (sample.nonEmpty) (math.abs(rnd.nextInt()) % sample.length) else 0).clone())
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
}
