package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Diagnostic: dump selected queries' results + oracle SQL for a fast
  * check.py-style compare loop while iterating on new oracles —
  * `runMain graft.DumpOne <query>[,<query>...] <sfDir> <outDir>`
  * (Verify's layout, restricted to the named queries). */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val Array(namesArg, sfDir, outDir) = args
    val names = namesArg.split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = names.flatMap(n => SparkEntry.oracleSql.get(n)
        .map(sql => s"${q(n)}: ${q(sql)}"))
      .mkString("{", ", ", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
