package graft.operators

import org.apache.spark.sql.SparkSession

/** Throwaway timing harness for PLANS.md evidence (not a test). */
object SpanScalingCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    for (sz <- Seq(5000, 10000, 20000, 40000)) {
      val text = (0 until sz).map(i => s"w${i % (sz - 3)}").mkString(" ")
      val df = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
      CorpusOps.spanRewrite(df, 3).collect() // warm plan
      val t0 = System.nanoTime()
      val r = CorpusOps.spanRewrite(df, 3).collect()
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"SCALING tokens=$sz%6d ms=$ms%8.1f kept2=${r.find(_.getLong(0) == 2L).get.getLong(2)}")
    }
    spark.stop()
  }
}
