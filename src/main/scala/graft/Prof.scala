package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.MelodyJoin
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = SparkEntry.melodyCfg3d.copy(sideNum = sys.env.getOrElse("PROF_SIDE", "6").toInt)
    val hists = graft.sources.Fixtures.tripleHists(spark, "/root/testdata/sf0.1")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println("hists " + hists.count())
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-12s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r
    }
    val grids = time("grids") { MelodyJoin.buildGrids(spark, hists, cfg) }
    val duals = time("duals") { MelodyJoin.buildDuals(spark, hists, cfg) }
    val tree = graft.core.TreeEmd.build(cfg.bins, cfg.dimension)
    println("tree levels/feats/distortion: " +
      tree.map(t => s"${t.numFeatures} feats C=${t.distortion}").getOrElse("none"))
    val enriched = time("enrich") {
      val e = MelodyJoin.enrich(spark, hists, cfg, grids, duals, tree)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count(); e
    }
    val summaries = time("summarize") {
      MelodyJoin.summarize(enriched, cfg,
        numTreeFeats = tree.map(_.numFeatures).getOrElse(0))
    }
    println("combos " + summaries.length + " maxCount " + summaries.map(_.count).max)
    import spark.implicits._
    // the DECLARED threshold (0.0803): 0.08 is a data-reachable rational
    // (pairs sit exactly ON it) and cell-prune FP noise at the boundary
    // makes the diagnostic pair count grid-dependent — worthless as a
    // regression signal
    val theta = 0.0803
    val gapLimit = tree.map(_.distortion * theta).getOrElse(-1.0)
    val cfgB = spark.sparkContext.broadcast(cfg)
    val gridsB = spark.sparkContext.broadcast(grids)
    val dualsB = spark.sparkContext.broadcast(duals)
    val sumB = spark.sparkContext.broadcast(summaries)
    val nGuests = time("guestEnum") {
      enriched.mapPartitions { it =>
        val c = cfgB.value
        it.map { r => MelodyJoin.guestCombosPublic(r, c, gridsB.value, dualsB.value, sumB.value, theta, gapLimit).length.toLong }
      }.reduce(_ + _)
    }
    println("guest copies " + nGuests)
    // native x native pair count
    val comboCounts = summaries.map(s => (s.count * (s.count - 1)) / 2).sum
    println("intra pairs " + comboCounts)
    val full = time("fullJoin") {
      MelodyJoin.thresholdJoin(spark, hists, theta, cfg).count()
    }
    println("pairs " + full)
    spark.stop()
  }
}
