package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway evidence harness (not a test): k-th sample-pair distance
  * bound from the former lowest-64-ids sample vs the hash-spread sample,
  * on the sf0.1 3-D hists. */
object TopkUbCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val hists = graft.sources.Fixtures.tripleHists(spark, dir)
    val cost = graft.core.Emd.costMatrix(
      graft.sources.Fixtures.Bins3d, graft.sources.Fixtures.Dim3,
      graft.core.GroundDist.L2)
    val k = 20
    def ub(sample: Array[(Long, Array[Double])]): Double =
      MelodyJoin.kthSampleDist(spark, sample.map(_._2), k, cost)
    val low = hists.select("id", "weights").as[(Long, Array[Double])]
      .orderBy(col("id")).limit(64).collect()
    val spread = hists.select("id", "weights").as[(Long, Array[Double])]
      .orderBy(md5(col("id").cast("string")), col("id")).limit(64).collect()
    val n = hists.count()
    println(f"UBCHECK n=$n k=$k lowest64=${ub(low)}%.6f hashSpread64=${ub(spread)}%.6f")
    spark.stop()
  }
}
