package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Diagnostic: run ONE declared query and print every Spark job's wall
  * time, stage count and task count — finds which of a query's
  * sequential driver actions the time actually goes to (guide §1:
  * measure before touching). Second pass repeats after a cache clear so
  * warm-path costs are visible next to cold-path ones. */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = if (args.nonEmpty) args(0) else "q_tfidf_pairs"
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.setProperty("graft.crosscheck", "off")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        println(s"START ${js.jobId} $site")
        starts.put(js.jobId, (System.nanoTime(), js.stageInfos.map(_.numTasks).sum))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        tasks.addAndGet(sc.stageInfo.numTasks)
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, nt) = starts.getOrDefault(je.jobId, (0L, 0))
        println(f"JOB ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  tasks=$nt%5d")
      }
    })
    // warmup (JIT + codegen + session)
    SparkEntry.queries("q1_agg")(spark, dir).count()
    (1 to 2).foreach { pass =>
      SparkEntry.clearSessionCaches(spark)
      println(s"=== pass $pass: $name ===")
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%7.3f s rows=$n")
    }
    spark.stop()
  }
}
