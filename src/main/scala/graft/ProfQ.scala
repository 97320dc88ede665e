package graft

import org.apache.spark.sql.SparkSession

/** Repeat-min profiler for declared queries (mirrors Bench's honest cache clearing). */
object ProfQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // mirror Bench: timings measure ONE engine; the witness assertion
    // belongs to Verify (without this, the 3-D rows profile the witness
    // engine + simplex audit too and the numbers are not bench-like)
    System.setProperty("graft.crosscheck", "off")
    val dir = "/root/testdata/sf0.1"
    val names = if (args.nonEmpty) args.toSeq else Seq("q_ngram_jaccard")
    // warmup
    SparkEntry.queries("q1_agg")(spark, dir).count()
    names.foreach { name =>
      val times = (1 to 2).map { _ =>
        // ONE registry (SparkEntry.clearSessionCaches) — this harness
        // previously cleared three caches individually and silently
        // missed the simhash edge memo
        SparkEntry.clearSessionCaches(spark)
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"REPEATMIN $name%-22s ${times.min}%7.2f s  (${times.mkString(", ")})")
    }
    spark.stop()
  }
}
