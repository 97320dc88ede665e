package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway measurement (not a test): post-positional-filter candidate
  * counts for the prefix-Jaccard family at every generated scale plus
  * the 3x stress corpus, through the operator's own ScalingStats kernel
  * — the calibration evidence for the ScalingSpec/StressCheck envelope.
  * Run: `Test/runMain graft.operators.NgramStressProbe`. */
object NgramStressProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tau = graft.SparkEntry.NgramTau

    def shingled(docs: DataFrame): DataFrame =
      docs.select(col("doc_id"), concat_ws(" ",
        graft.functions.TextCols.shingles(col("text"), 3)).as("shtext"))

    def report(tag: String, sh: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val g = ScalingStats.prefixJaccard(spark, sh, tau, textCol = "shtext")
      println(f"PROBE $tag%-10s sets=${g.nSets}%6d cand=${g.candPairs}%9d " +
        f"out=${g.out}%6d near=${g.near}%6d " +
        f"b2=${2L * (g.out + g.near) + 2L * g.nSets}%9d " +
        f"b3=${2L * (g.out + g.near) + 3L * g.nSets}%9d " +
        f"naive=${g.nSets * (g.nSets - 1) / 2}%12d " +
        f"(${(System.nanoTime() - t0) / 1e9}%5.1f s)")
    }

    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val sh = shingled(
        graft.sources.Fixtures.documents(spark, s"/root/testdata/$sf")).persist()
      sh.count()
      report(sf, sh)
      sh.unpersist(false)
    }
    val off = 10000000L
    val d0 = graft.sources.Fixtures.documents(spark, "/root/testdata/sf0.1")
    val toks = split(col("text"), " ")
    val docs = Seq(
      d0.select(col("doc_id"), col("text")),
      d0.select((col("doc_id") + off).as("doc_id"),
        concat_ws(" ", reverse(toks)).as("text")),
      d0.select((col("doc_id") + 2 * off).as("doc_id"),
        concat_ws(" ", concat(slice(toks, 8, 100000), slice(toks, 1, 7)))
          .as("text"))
    ).reduce(_ unionByName _)
    val sh3 = shingled(docs).persist()
    sh3.count()
    report("sf0.3x", sh3)
    sh3.unpersist(false)
    spark.stop()
  }
}
