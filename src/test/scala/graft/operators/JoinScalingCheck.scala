package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared measurement kernel for the flagship-engine scaling evidence:
  * counts the melody engine's ACTUAL work drivers (candidate pairs that
  * reach the cascade, guest replication rows) and the residual IVF-PQ
  * probe's scanned-row count, without running the joins themselves.
  * Used by [[JoinScalingCheck]] (PLANS.md curve) and ScalingSpec (the
  * growth-exponent assertions). */
object ScalingStats {

  final case class MelodyStats(n: Long, guests: Long, intraPairs: Long,
                               crossPairs: Long) {
    def candPairs: Long = intraPairs + crossPairs
  }

  /** Candidate-pair and guest-replication counts for the 3-D melody
    * grid join at `theta`, via the engine's own enrichment + summaries
    * + guest enumeration (the Prof counters, aggregated cluster-side). */
  def melody(spark: SparkSession, hists: DataFrame,
             cfg: MelodyJoin.Config, theta: Double): MelodyStats = {
    val h = hists.persist()
    val n = h.count()
    val grids = MelodyJoin.buildGrids(spark, h, cfg)
    val duals = MelodyJoin.buildDuals(spark, h, cfg)
    val tree = graft.core.TreeEmd.build(cfg.bins, cfg.dimension)
    val enriched = MelodyJoin.enrich(spark, h, cfg, grids, duals, tree)
      .persist()
    enriched.count()
    val summaries = MelodyJoin.summarize(enriched, cfg,
      numTreeFeats = tree.map(_.numFeatures).getOrElse(0))
    val gapLimit = tree.map(_.distortion * theta).getOrElse(-1.0)
    val intra = summaries.map(s => s.count * (s.count - 1) / 2).sum
    val cfgB = spark.sparkContext.broadcast(cfg)
    val gridsB = spark.sparkContext.broadcast(grids)
    val dualsB = spark.sparkContext.broadcast(duals)
    val sumB = spark.sparkContext.broadcast(summaries)
    // guest rows and native-x-guest candidate pairs in one pass: each
    // record contributes |targets| replicas and sum(count(target))
    // cascade pairs
    val (guests, cross) = enriched.rdd.mapPartitions { it =>
      val countByCombo = sumB.value.map(s => s.combo -> s.count).toMap
      it.map { r =>
        val targets = MelodyJoin.guestCombosPublic(r, cfgB.value,
          gridsB.value, dualsB.value, sumB.value, theta, gapLimit)
        (targets.length.toLong,
          targets.map(t => countByCombo.getOrElse(t, 0L)).sum)
      }
    }.fold((0L, 0L)) { case ((a1, a2), (b1, b2)) => (a1 + b1, a2 + b2) }
    enriched.unpersist(false)
    h.unpersist(false)
    MelodyStats(n, guests, intra, cross)
  }

  final case class IvfPqStats(n: Long, probedRows: Long, kCoarse: Int,
                              nProbe: Int)

  /** Scanned-row count of the residual IVF-PQ probe: assign the corpus
    * to the same deterministic coarse quantizer ivfPqTopK trains, probe
    * the nProbe cells nearest to the corpus' min-id vector (the declared
    * query convention), count members. */
  def ivfPq(spark: SparkSession, embs: DataFrame, kCoarse: Int,
            nProbe: Int, iters: Int = 2): IvfPqStats = {
    val q = Cluster.quantize(embs, 1000).persist()
    val n = q.count()
    val dim = q.select(size(col("v"))).head().getInt(0)
    val coarse = Cluster.lloydCentroids(q, kCoarse, iters, dim)
    val minId = q.agg(min(col("id"))).head().getLong(0)
    val qv = q.filter(col("id") === minId).select(col("v"))
      .head().getSeq[Long](0).toArray
    val probed = coarse.zipWithIndex.map { case (cent, c) =>
      var d = 0L
      var i = 0
      while (i < dim) { val t = qv(i) - cent(i); d += t * t; i += 1 }
      (d, c)
    }.sorted.take(nProbe).map(_._2).toSet
    val probedRows = q.rdd.map { r =>
      val v = r.getSeq[Long](1).toArray
      if (probed.contains(Cluster.argminIdx(coarse, v)._1)) 1L else 0L
    }.fold(0L)(_ + _)
    q.unpersist(false)
    IvfPqStats(n, probedRows, kCoarse, nProbe)
  }
}

/** Throwaway curve dump for PLANS.md (not a test): run with
  * `Test / runMain graft.operators.JoinScalingCheck`. */
object JoinScalingCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = graft.SparkEntry.melodyCfg3d
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val hists = graft.sources.Fixtures.tripleHists(spark, s"/root/testdata/$sf")
      val n0 = hists.count()
      for ((tag, c) <- Seq(
          "fixed6" -> cfg,
          "sized " -> cfg.copy(sideNum = MelodyJoin.sideNumFor(n0)))) {
        val t0 = System.nanoTime()
        val m = ScalingStats.melody(spark, hists, c, 0.0803)
        val out = MelodyJoin.thresholdJoin(spark, hists, 0.0803, c).count()
        println(f"MELODY $sf%-8s $tag side=${c.sideNum}%2d N=${m.n}%6d " +
          f"guests=${m.guests}%9d cand=${m.candPairs}%10d out=$out%8d " +
          f"naive=${m.n * (m.n - 1) / 2}%12d " +
          f"(${(System.nanoTime() - t0) / 1e9}%5.1f s)")
      }
    }
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val p = ScalingStats.ivfPq(spark,
        graft.sources.Fixtures.embeddings(spark, s"/root/testdata/$sf"),
        kCoarse = 16, nProbe = 2)
      println(f"IVFPQ  $sf%-8s N=${p.n}%6d probed=${p.probedRows}%6d " +
        f"frac=${p.probedRows.toDouble / p.n}%6.3f ideal=${2.0 / 16}%6.3f")
    }
    spark.stop()
  }
}
