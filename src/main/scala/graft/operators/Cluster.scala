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

  /** The Lloyd's centroid loop over an already-quantized `(id, v)` frame:
    * `iters` update rounds from the deterministic seed (the k lowest-id
    * vectors). Empty clusters keep their previous centroid. Exposed so
    * product quantization ([[Ann.pqTrain]]) can run the IDENTICAL
    * arithmetic per subspace — one oracle-replayable iteration shape for
    * every codebook in the repo. */
  private[operators] def lloydCentroids(q: DataFrame, k: Int, iters: Int,
                                        dim: Int): Array[Array[Long]] = {
    var cents: Array[Array[Long]] = q.orderBy(col("id")).limit(k)
      .select(col("v")).collect()
      .map(_.getSeq[Long](0).toArray)
    // fewer rows than k: Array.tabulate(k) below would index past the
    // seed — fail loudly instead of an ArrayIndexOutOfBoundsException
    // mid-iteration
    require(cents.length >= k,
      s"kmeans: k=$k exceeds input row count ${cents.length}")
    for (_ <- 0 until iters) {
      val (cid, _) = assignCols(cents)
      val sums = (0 until dim).map(i =>
        sum(element_at(col("v"), i + 1)).as(s"s$i"))
      val upd = q.select(cid.as("c"), col("v"))
        .groupBy(col("c"))
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
        .map { r =>
          val n = r.getLong(1)
          r.getInt(0) -> Array.tabulate(dim) { i =>
            // one IEEE division + half-away-from-zero round: the only
            // FP step, bit-identical from identical integer sums
            BigDecimal(r.getLong(i + 2).toDouble / n)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          }
        }.toMap
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
}
