package graft
import org.apache.spark.sql.SparkSession
import graft.operators.MelodyJoin

/** Stage timings for the 1-D melody engine (quantityHists, sf0.1). */
object Prof1d {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = SparkEntry.melodyCfg1d.copy(
      sideNum = sys.env.getOrElse("PROF_SIDE", "16").toInt)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-12s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r
    }
    val hists = time("hists") {
      val h = graft.sources.Fixtures.quantityHists(spark, "/root/testdata/sf0.1")
      println("n " + h.count()); h
    }
    val grids = time("grids") { MelodyJoin.buildGrids(spark, hists, cfg) }
    val duals = time("duals") { MelodyJoin.buildDuals(spark, hists, cfg) }
    val tree = graft.core.TreeEmd.build(cfg.bins, cfg.dimension)
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
    val theta = 0.153
    val gapLimit = tree.map(_.distortion * theta).getOrElse(-1.0)
    val cfgB = spark.sparkContext.broadcast(cfg)
    val gridsB = spark.sparkContext.broadcast(grids)
    val dualsB = spark.sparkContext.broadcast(duals)
    val sumB = spark.sparkContext.broadcast(summaries)
    // precomputed envelopes + flat index: the per-record arity rebuilds
    // the envelopes per row and would time THAT, not enumeration
    val envB = spark.sparkContext.broadcast(
      MelodyJoin.cellEnvelopesPublic(summaries, cfg))
    val idxB = spark.sparkContext.broadcast(
      new MelodyJoin.SummaryIndex(summaries))
    import spark.implicits._
    val nGuests = time("guestEnum") {
      enriched.mapPartitions { it =>
        val c = cfgB.value
        it.map { r => MelodyJoin.guestCombosPublic(r, c, gridsB.value,
          dualsB.value, sumB.value, envB.value, theta, gapLimit,
          idxB.value).length.toLong }
      }.reduce(_ + _)
    }
    println("guest copies " + nGuests)
    println("intra pairs " + summaries.map(s => (s.count * (s.count - 1)) / 2).sum)
    val full = time("fullJoin") {
      MelodyJoin.thresholdJoin(spark, hists, theta, cfg).count()
    }
    println("pairs " + full)
    // second run with everything warm (prep cache)
    val again = time("joinWarm") {
      MelodyJoin.thresholdJoin(spark, hists, theta, cfg).count()
    }
    println("pairs " + again)
    spark.stop()
  }
}
