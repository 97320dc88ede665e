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

  test("bucketed write makes the key join exchange-free and answer-preserving") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_bucket_spec").toString
    val fact = (0L until 5000L).map(i => (i % 400, i, s"p$i"))
      .toDF("k", "row_id", "payload")
    val dim = (0L until 400L).map(i => (i, s"d$i")).toDF("k", "name")
    val (bf, bd) = Layout.writeBucketed(spark, fact, dim, "k", "k",
      buckets = 8, basePath = base,
      leftName = "graft_spec_fact", rightName = "graft_spec_dim")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the assertion tests CO-LOCATION, not size
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = bf.join(bd.withColumnRenamed("k", "dk"),
        col("k") === col("dk"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      val got = j.select(col("row_id"), col("name")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val want = fact.join(dim, "k").select(col("row_id"), col("name"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == want && got.size == 5000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_spec_fact")
      spark.sql("DROP TABLE IF EXISTS graft_spec_dim")
    }
  }
}
