package graft.operators

import graft.core.Caching._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed k-means document clustering over embedding columns —
  * integer-exact Lloyd's, designed so the whole iteration is
  * reproducible bit-for-bit across engines (and across cluster runs,
  * where FP aggregation order is nondeterministic):
  *
  *  - vectors are quantized once to integers (`round(x * scale)`);
  *  - centroids are kept as ROUNDED INTEGER MEANS each iteration, so
  *    cluster sums are exact integer aggregations (order-free — Spark's
  *    shuffle order cannot change the result, unlike FP means) and the
  *    only FP operation anywhere is one correctly-rounded IEEE division
  *    inside `round(sum/count)`, which every engine computes identically
  *    from identical integers;
  *  - assignment distances are pure BIGINT squared-L2 sums with argmin
  *    ties broken on the centroid id — a total order with no FP
  *    boundary, so a DuckDB oracle can replay the full iteration.
  *
  * Scale shape: per iteration one map (assignment against k broadcast
  * centroid literals, all whole-stage codegen: zip_with + aggregate
  * folds) and one groupBy with 64 map-side-combined integer sums into k
  * rows; the driver holds O(k * dim) ints. Quantization error is bounded
  * by dim/scale^2 per squared distance — with scale 1000 that is ~1e-4
  * of the typical inter-point distance, noise relative to cluster
  * structure. Overflow bound: |q| <= scale * max|x|, so d2 <= dim *
  * (2 * scale * max|x|)^2 — at scale 1000 and unit-ish embeddings,
  * ~1e8, leaving 10 orders of magnitude of int64 headroom.
  */
object Cluster {

  /** Quantized copy of `embs`: (id, v ARRAY<BIGINT>). */
  def quantize(embs: DataFrame, scale: Int,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    embs.select(col(idCol).as("id"),
      transform(col(vecCol), x => round(x.cast("double") * scale).cast("long")).as("v"))

  private def d2To(cent: Array[Long], vcol: Column): Column =
    aggregate(
      zip_with(vcol, lit(cent), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** (cluster, d2) argmin columns against the k centroid literals. */
  private[operators] def assignCols(cents: Array[Array[Long]],
                                    vcol: Column = col("v")): (Column, Column) = {
    val ds = cents.map(d2To(_, vcol))
    val best = ds.reduce((a, b) => least(a, b))
    // first (lowest cid) centroid attaining the min — ties deterministic
    val cid = ds.zipWithIndex.reverse.foldLeft(lit(-1)) {
      case (acc, (d, c)) => when(d === best, lit(c)).otherwise(acc)
    }
    (cid, best)
  }

  /** The one FP step of the centroid update, shared by every path and
    * replayed by the SQL oracles: one correctly-rounded IEEE division +
    * half-away-from-zero round — bit-identical from identical integer
    * sums in any engine. */
  private[operators] def roundedMean(s: Long, n: Long): Long =
    BigDecimal(s.toDouble / n)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Scala-loop argmin of BIGINT squared-L2 against the centroid table,
    * ties to the lowest centroid id (strict `<` keeps the first min) —
    * the exact [[assignCols]] total order, for the RDD iteration path. */
  private[operators] def argminIdx(cents: Array[Array[Long]],
                                   v: Array[Long]): (Int, Long) = {
    var bc = 0
    var bd = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d = 0L
      var i = 0
      while (i < v.length) { val t = v(i) - cent(i); d += t * t; i += 1 }
      if (d < bd) { bd = d; bc = c }
      c += 1
    }
    (bc, bd)
  }

  /** Row-count cutover between the RDD and DataFrame iteration paths —
    * the repo-wide rule for iterative loops: below it, per-iteration
    * Catalyst re-planning plus interpreted higher-order-function
    * evaluation (aggregate/zip_with never enter codegen) dominates and
    * plain-loop RDD rounds with the SAME shuffle structure win; above
    * it, Tungsten's managed memory wins (see Dedup.connectedComponents,
    * which pioneered the cutover). */
  private[operators] val IterCutover = 50L * 1000 * 1000

  /** The Lloyd's centroid loop over an already-quantized `(id, v)` frame:
    * `iters` update rounds from the deterministic seed (the k lowest-id
    * vectors). Empty clusters keep their previous centroid. Exposed so
    * product quantization ([[Ann.pqTrain]]) runs IDENTICAL arithmetic
    * per subspace — one oracle-replayable iteration shape for every
    * codebook in the repo.
    *
    * Below `cutover` rows each round is an RDD mapPartitions of
    * plain-loop partial (count, sum) vectors per cluster — k rows out of
    * each partition, merged by key, identical integer arithmetic (spec:
    * ClusterSpec path equivalence). Above, the same shape runs as a
    * codegen'd DataFrame aggregation. */
  private[operators] def lloydCentroids(q: DataFrame, k: Int, iters: Int,
                                        dim: Int,
                                        cutover: Long = IterCutover): Array[Array[Long]] = {
    var cents: Array[Array[Long]] = q.orderBy(col("id")).limit(k)
      .select(col("v")).collect()
      .map(_.getSeq[Long](0).toArray)
    // fewer rows than k: Array.tabulate(k) below would index past the
    // seed — fail loudly instead of an ArrayIndexOutOfBoundsException
    // mid-iteration
    require(cents.length >= k,
      s"kmeans: k=$k exceeds input row count ${cents.length}")
    if (iters == 0) return cents
    val rddPath = q.count() <= cutover
    for (_ <- 0 until iters) {
      val upd: Map[Int, Array[Long]] =
        if (rddPath) {
          val sc = q.sparkSession.sparkContext
          val bc = sc.broadcast(cents)
          val partials = q.select(col("v")).rdd
            .mapPartitions { it =>
              val cs = bc.value
              val cnts = new Array[Long](k)
              val sums = Array.fill(k)(new Array[Long](dim))
              it.foreach { row =>
                val v = row.getSeq[Long](0).toArray
                val c = argminIdx(cs, v)._1
                cnts(c) += 1
                var i = 0
                while (i < dim) { sums(c)(i) += v(i); i += 1 }
              }
              Iterator.range(0, k).filter(cnts(_) > 0)
                .map(c => (c, (cnts(c), sums(c))))
            }
            .reduceByKey((a, b) =>
              (a._1 + b._1, Array.tabulate(dim)(i => a._2(i) + b._2(i))))
            .collect()
          bc.destroy()
          partials.map { case (c, (n, s)) => c -> s.map(roundedMean(_, n)) }
            .toMap
        } else {
          val (cid, _) = assignCols(cents)
          val sums = (0 until dim).map(i =>
            sum(element_at(col("v"), i + 1)).as(s"s$i"))
          q.select(cid.as("c"), col("v"))
            .groupBy(col("c"))
            .agg(count(lit(1)).as("n"), sums: _*)
            .collect()
            .map { r =>
              val n = r.getLong(1)
              r.getInt(0) -> Array.tabulate(dim)(i => roundedMean(r.getLong(i + 2), n))
            }.toMap
        }
      cents = Array.tabulate(k)(c => upd.getOrElse(c, cents(c)))
    }
    cents
  }

  /** Full integer Lloyd's: `iters` update rounds from the deterministic
    * seed (the k lowest-id vectors), then the final assignment.
    * Returns (id, cluster INT, d2 BIGINT). Empty clusters keep their
    * previous centroid. */
  def kmeans(spark: SparkSession, embs: DataFrame, k: Int, iters: Int,
             scale: Int = 1000, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    require(k > 0 && iters >= 0, s"k=$k iters=$iters")
    val q = quantize(embs, scale, idCol, vecCol)
      .persistOnce()
    try {
      val dim = q.select(size(col("v"))).head().getInt(0)
      val cents = lloydCentroids(q, k, iters, dim)
      val (cid, d2) = assignCols(cents)
      val out = q.select(col("id"), cid.as("cluster"), d2.as("d2"))
        .persistOnce()
      out.count()
      out
    } finally {
      q.unpersist(false)
    }
  }

  /** Per-cluster farthest-point outlier scoring — the embedding-quality
    * filter of a curation pipeline (prune vectors far from their
    * centroid before training): the [[kmeans]] assignment ranked by
    * (d2 desc, id) WITHIN each cluster, flagging the topM farthest per
    * cluster. Integer-exact end to end (quantized BIGINT d2, total
    * order tie-broken by id), so the oracle replays the rank
    * deterministically. The per-cluster rank is the
    * CorpusOps.groupRunningSum two-phase pass (clusters are bounded by
    * k, the groupRunningSum contract), never a one-task-per-cluster
    * window. Output: (id, cluster, d2, c_rank, is_outlier). */
  def outliers(spark: SparkSession, embs: DataFrame, k: Int, iters: Int,
               topM: Int, scale: Int = 1000, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    require(topM > 0, s"topM=$topM")
    val a = kmeans(spark, embs, k, iters, scale, idCol, vecCol)
    val rk = CorpusOps.groupRunningSum(
      a.select(col("id"), col("cluster"), col("d2")),
      "cluster", Seq(col("d2").desc, col("id")), lit(1L), "c_rank")
    val out = rk.select(col("id"), col("cluster"), col("d2"), col("c_rank"),
        (col("c_rank") <= topM).as("is_outlier"))
      .persistOnce()
    out.count()
    rk.unpersist(false)
    a.unpersist(false)
    out
  }
}
