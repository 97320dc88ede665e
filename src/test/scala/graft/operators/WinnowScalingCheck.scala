package graft.operators

import org.apache.spark.sql.SparkSession

/** Throwaway timing harness (not a test): winnowFingerprints per-row cost
  * should scale linearly in document length — O(shingles * w) window
  * minima over packed keys. Evidence recorded in PLANS.md. */
object WinnowScalingCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    for (sz <- Seq(5000, 10000, 20000, 40000)) {
      val text = (0 until sz).map(i => s"w${i % (sz - 3)}").mkString(" ")
      val df = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
      CorpusOps.winnowFingerprints(df, 3, 4).count() // warm plan
      val t0 = System.nanoTime()
      val n = CorpusOps.winnowFingerprints(df, 3, 4).count()
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"WINNOW tokens=$sz%6d ms=$ms%8.1f selected=$n")
    }
    spark.stop()
  }
}
