package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query, prints ONE JSON line.
  *
  * A crashing query is NOT silently timed (round-3 lesson: a swallowed
  * Throwable made regressions look fast): its elapsed-until-failure time
  * still counts toward the total, the failure lands in an "errors" field,
  * and the process exits non-zero. SPARK_GRAFT_BENCH_REPEATS=N (default 1)
  * enables repeat-min mode — per-query minimum over N passes — to defend
  * the headline number against sandbox contention noise. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // default 2: round 3's driver-recorded bench was a 2x-inflated
    // contended run (104.7s vs a reproducible 50.5s) — repeat-min with
    // per-pass cache clearing makes the recorded number defend itself
    val repeats = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "2").toInt)
    // the 3-D LP queries are self-verifying (they run a second witness
    // engine and assert pair-set equality — SparkEntry.crossCheckPairs).
    // Bench measures single-engine throughput, so the witness is off here;
    // Verify (the correctness gate) always runs it.
    System.setProperty("graft.crosscheck", "off")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one untimed scan: JVM/codegen/session warmup otherwise lands on
    // whichever query happens to run first
    graft.sources.Fixtures.lineitem(spark, sfDir).count()
    val names = SparkEntry.queries.keys.toSeq.sorted
    val times = scala.collection.mutable.Map.empty[String, Double]
    val errors = scala.collection.mutable.Map.empty[String, String]
    for (pass <- 1 to repeats; name <- names) {
      // repeat passes must measure the QUERY, not the session caches: a
      // later pass would otherwise skip histogram derivation and engine
      // preparation entirely and the per-query minimum would stop
      // covering them (a regression there would be invisible)
      if (pass > 1 && name == names.head) {
        graft.sources.Fixtures.clearCache(spark)
        graft.operators.MelodyJoin.clearPrepCache(spark)
        SparkEntry.clearEdgeCache(spark)
        // drop EVERY cached plan, not just the known session caches:
        // operators that return a persisted result (materializeAndFree
        // pattern) leave plan-cache entries a later pass of the same
        // pure-Catalyst query would silently hit, recording a min that
        // measured the cache, not the query
        spark.sharedState.cacheManager.clearCache()
      }
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        times(name) = math.min(times.getOrElse(name, Double.MaxValue), dt)
      } catch {
        case t: Throwable =>
          times(name) = math.min(times.getOrElse(name, Double.MaxValue),
            (System.nanoTime() - t0) / 1e9)
          errors(name) = (t.getClass.getSimpleName + ": " +
            String.valueOf(t.getMessage)).take(200)
      }
    }
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }
    val qs = names.map(n => "\"" + n + "\":" + times(n)).mkString("{", ",", "}")
    val errJson = errors.toSeq.sorted
      .map { case (k, v) => "\"" + k + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = times.values.sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    println(line)
    // machine-readable artifact: the stdout line drowns in sbt noise and
    // the driver's BENCH_r*.json "parsed" field has been null every round
    // — write the bare JSON line to SPARK_GRAFT_BENCH_OUT when set, and
    // always (best-effort) to BENCH_LAST.json in the working directory so
    // any consumer can find the latest run without knowing the env var
    // best-effort means best-effort: an unwritable path must not fail the
    // run after the measurements succeeded. NonFatal, not just
    // IOException — Paths.get throws InvalidPathException (a
    // RuntimeException) on a malformed SPARK_GRAFT_BENCH_OUT value.
    def writeTo(path: String): Unit =
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(path), line + "\n")
      catch { case scala.util.control.NonFatal(_) => () }
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach(writeTo)
    writeTo("BENCH_LAST.json")
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"BENCH FAILURES: ${errors.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
