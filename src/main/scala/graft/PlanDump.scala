package graft

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` output for named queries to files —
  * the per-round plan-evidence artifact (`plans/r{N}/<query>_{before,after}.txt`).
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <query> [query...]
  *
  * Each query's plan lands in `<outDir>/<query>_<suffix>.txt`. Runs with
  * the same session shape as Bench (AQE on, pinned UTC) so the dumped
  * plan is the one the bench actually executes — modulo AQE's runtime
  * re-optimization, which `explain` shows as the initial plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <query> [query...]")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names = args.drop(3).toSeq
    System.setProperty("graft.crosscheck", "off")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      // queryExecution.explainString gives the same text explain() prints
      val text = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val path = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
      java.nio.file.Files.write(path,
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $path (${text.length} chars)")
    }
    spark.stop()
  }
}
