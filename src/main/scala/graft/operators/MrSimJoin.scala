package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** Pivot-partition EMD self-join — the Spark rewrite of the reference's
  * MRSimJoin engine (mrsim/generic/MRSimJoinHD.java:48-377).
  *
  * Generalized-hyperplane blocking: sample `numPivots` pivot histograms;
  * every record lands in the partition of its closest pivot (exact EMD, as
  * the reference does — CloudJoinBaseMapper.java:81-196) and is replicated
  * into any other pivot's partition whose hyperplane margin
  * (d(r, q) - d(r, p)) / 2 <= theta can still hide a qualifying pair.
  * Each partition joins its records with the shared filter cascade.
  *
  * The reference's multi-round driver loop + 32MB spill machinery
  * (CloudJoinBaseReducer.java:105-275) is NOT ported: Spark's shuffle
  * spill and AQE make one shuffle sufficient (SURVEY.md §4). This engine
  * computes the same answer as MelodyJoin/BaselineJoin — kept as the J3
  * capability and as a third independent engine for equivalence testing.
  */
object MrSimJoin {

  def thresholdJoin(spark: SparkSession, hists: DataFrame, theta: Double,
                    cfg: MelodyJoin.Config, numPivots: Int = 16): DataFrame = {
    import spark.implicits._
    val pivots = hists.select(col("id"), col("weights"))
      .orderBy(hash(col("id")), col("id")).limit(numPivots)
      .as[(Long, Array[Double])].collect()
      .map { case (id, w) => (id, HistOps.normalize(w)) }
    val pivotsB = spark.sparkContext.broadcast(pivots)
    val cfgB = spark.sparkContext.broadcast(cfg)

    // assign: base partition = closest pivot; window copies where the
    // hyperplane margin admits a pair within theta
    val routed = hists.select(col("id"), col("weights"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val ps = pivotsB.value
        val c = cfgB.value
        it.flatMap { case (id, w0) =>
          val w = HistOps.normalize(w0)
          val dists = ps.map(p => Emd.exact(w, p._2, c.cost))
          val base = dists.indices.minBy(i => (dists(i), i))
          dists.indices.flatMap { q =>
            if (q == base) Some((q, id, w, true))
            else if ((dists(q) - dists(base)) / 2.0 <= theta) Some((q, id, w, false))
            else None
          }
        }
      }.toDF("pivot", "id", "weights", "isBase")

    val duals = MelodyJoin.buildDuals(spark, hists, cfg)
    val cascadeB = spark.sparkContext.broadcast(new MelodyJoin.Cascade(cfg, duals))

    // per-partition nested-loop join with the cascade; a pair is emitted
    // only where at least one side is a base copy (then de-duplicated
    // globally: a pair can qualify in both endpoints' base partitions)
    routed.as[(Int, Long, Array[Double], Boolean)]
      .groupByKey(_._1)
      .flatMapGroups { (_: Int, rows: Iterator[(Int, Long, Array[Double], Boolean)]) =>
        val casc = cascadeB.value
        val members = rows.toArray
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
        var i = 0
        while (i < members.length) {
          var j = i + 1
          while (j < members.length) {
            val a = members(i); val b = members(j)
            if ((a._4 || b._4) && a._2 != b._2) {
              // canonical orientation (lower id first): keeps the exact
              // solver's fp path identical across partitions/engines
              val (lo, hi) = if (a._2 < b._2) (a, b) else (b, a)
              val emd = casc.emdIfCandidate(lo._3, hi._3, theta)
              if (emd >= 0) out += ((lo._2, hi._2, emd))
            }
            j += 1
          }
          i += 1
        }
        out
      }
      .toDF("rid", "sid", "dist")
      .dropDuplicates("rid", "sid")
  }
}
