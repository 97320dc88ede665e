package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Z-order key: bit-exact vs a reference interleave, the block-locality
  * identity that makes min/max pruning work, and the layout contract
  * (non-overlapping zval ranges across output partitions). */
class LayoutSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("layout-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def refInterleave(xs: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (b <- 0 until bits; i <- xs.indices)
      z |= (((xs(i) >> b) & 1L) << (b * xs.length + i))
    z
  }

  test("zOrderKey == reference interleave, 2 and 3 dims") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val rnd = new Random(3)
    val rows = (0 until 500).map(_ =>
      (rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val df = rows.toDF("x", "y", "w")
    val got2 = df.select(Layout.zOrderKey(Seq(col("x"), col("y")), 16))
      .collect().map(_.getLong(0))
    val got3 = df.select(Layout.zOrderKey(Seq(col("x"), col("y"), col("w")), 16))
      .collect().map(_.getLong(0))
    // collect order matches input order on a narrow local scan; compare as multisets anyway
    assert(got2.sorted.toSeq == rows.map(r => refInterleave(Seq(r._1, r._2), 16)).sorted)
    assert(got3.sorted.toSeq == rows.map(r => refInterleave(Seq(r._1, r._2, r._3), 16)).sorted)
  }

  test("block locality: zval >> d*k == interleave of coordinates >> k") {
    // the identity row-group pruning relies on: an aligned zval range
    // [m << dk, (m+1) << dk) is EXACTLY the 2^k x 2^k grid block m
    val rnd = new Random(9)
    for (_ <- 0 until 200; k <- Seq(2, 5, 9)) {
      val x = rnd.nextInt(1 << 16).toLong
      val y = rnd.nextInt(1 << 16).toLong
      val z = refInterleave(Seq(x, y), 16)
      assert(z >> (2 * k) == refInterleave(Seq(x >> k, y >> k), 16 - k))
    }
  }

  test("zOrderLayout: partition zval ranges are disjoint and sorted within") {
    import spark.implicits._
    val rnd = new Random(17)
    val rows = (0 until 5000).map(_ =>
      (rnd.nextInt(1 << 12).toLong, rnd.nextInt(1 << 12).toLong))
    val out = Layout.zOrderLayout(rows.toDF("x", "y"),
      Seq(col("x"), col("y")), bits = 12, partitions = 6)
    val byPart = out.select(spark_partition_id().as("p"), col("zval"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (p, vs) => (p, vs.map(_._2)) }
    byPart.foreach { case (_, vs) =>
      assert(vs.toSeq == vs.sorted.toSeq, "not sorted within partition")
    }
    byPart.sliding(2).foreach {
      case Seq((_, a), (_, b)) => assert(a.max <= b.min, "overlapping partition ranges")
      case _ =>
    }
    // layout must not lose or duplicate rows
    assert(out.count() == 5000)
  }
}
