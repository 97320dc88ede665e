package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: per-query wall-clock, printed as each completes. */
object BenchEach {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // timings measure one engine; the 3-D witness assertion runs in Verify
    System.setProperty("graft.crosscheck", "off")
    // A/B probe hook: SPARK_GRAFT_SQLCONF="k=v;k=v" sets session confs
    // before any query runs (e.g. join-strategy preferences), so config
    // candidates are MEASURED here before any main adopts them
    sys.env.get("SPARK_GRAFT_SQLCONF").foreach(_.split(';').iterator
      .map(_.trim).filter(_.nonEmpty).foreach { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"SPARK_GRAFT_SQLCONF entry '$kv' is not k=v")
        spark.conf.set(kv.take(i), kv.drop(i + 1))
      })
    val only = args.toSet
    // SPARK_GRAFT_BENCH_CLEAR=1: free every session cache after each
    // query. Long multi-query lists at 10x scale otherwise accumulate
    // the persisted materializeAndFree results (52M-pair frames each)
    // until a later query dies of memory pressure — the round-16 scale
    // gate lost 11 rows that way. Also makes each row's cost honest in
    // isolation (no cross-row prep sharing), which is what a ratio
    // table wants.
    val clear = sys.env.get("SPARK_GRAFT_BENCH_CLEAR").contains("1")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        val t0 = System.nanoTime()
        val n = try fn(spark, sfDir).count() catch { case e: Throwable => println(s"ERR $name ${e.getMessage}"); -1L }
        println(f"TIMING $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
        if (clear) SparkEntry.clearSessionCaches(spark)
      }
    }
    spark.stop()
  }
}
