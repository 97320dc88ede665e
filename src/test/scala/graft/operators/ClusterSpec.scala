package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integer-exact k-means: distributed Lloyd's must equal a sequential
  * driver-side replay bit-for-bit (quantization, rounded-integer-mean
  * centroids, argmin tie-breaks), including the empty-cluster path. */
class ClusterSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("cluster-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def refKmeans(vecs: Seq[(Long, Array[Long])], k: Int,
                        iters: Int): Map[Long, (Int, Long)] = {
    val dim = vecs.head._2.length
    var cents = vecs.sortBy(_._1).take(k).map(_._2.clone).toArray
    def assign(v: Array[Long]): (Int, Long) = {
      var best = 0; var bd = Long.MaxValue
      for (c <- cents.indices) {
        var d = 0L; var i = 0
        while (i < dim) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
        if (d < bd) { bd = d; best = c } // strict < : ties keep lowest cid
      }
      (best, bd)
    }
    for (_ <- 0 until iters) {
      val byC = vecs.groupBy(v => assign(v._2)._1)
      cents = Array.tabulate(k) { c =>
        byC.get(c) match {
          case None => cents(c)
          case Some(members) => Array.tabulate(dim) { i =>
            val s = members.map(_._2(i)).sum
            BigDecimal(s.toDouble / members.size)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          }
        }
      }
    }
    vecs.map { case (id, v) => id -> assign(v) }.toMap
  }

  test("kmeans == sequential integer Lloyd's on fixture embeddings") {
    spark.sparkContext.setLogLevel("WARN")
    val embs = graft.sources.Fixtures.embeddings(spark, "/root/testdata/sf0.001")
    val got = Cluster.kmeans(spark, embs, k = 8, iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val vecs = Cluster.quantize(embs, 1000).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toSeq
    val want = refKmeans(vecs, 8, 2)
    assert(got.size == want.size)
    assert(got == want)
    // sanity: clustering is non-trivial (more than one cluster used)
    assert(got.values.map(_._1).toSet.size > 1)
  }

  test("outliers == per-cluster (d2 desc, id) rank over the kmeans assignment") {
    val embs = graft.sources.Fixtures.embeddings(spark, "/root/testdata/sf0.001")
    val topM = 5
    val asg = Cluster.kmeans(spark, embs, k = 8, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val got = Cluster.outliers(spark, embs, k = 8, iters = 2, topM = topM)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    // brute rank: within each cluster, 1-based position in (d2 desc, id)
    val want = asg.groupBy(_._2).toSeq.flatMap { case (c, rows) =>
      rows.sortBy { case (id, _, d2) => (-d2, id) }.zipWithIndex.map {
        case ((id, _, d2), i) =>
          id -> ((c, d2, (i + 1).toLong, i + 1 <= topM))
      }.toSeq
    }.toMap
    assert(got == want)
    assert(got.values.count(_._4) > 0 && got.values.exists(!_._4),
      "the outlier flag must pass and fail somewhere")
  }

  test("kmeans handles k > distinct points (empty clusters keep seeds)") {
    import spark.implicits._
    val tiny = Seq(
      (0L, Array.fill(4)(0.1f)), (1L, Array.fill(4)(0.1f)),
      (2L, Array.fill(4)(-0.4f))
    ).toDF("vec_id", "embedding")
    val got = Cluster.kmeans(spark, tiny, k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // 0 and 1 are identical -> same cluster; 2 distinct
    assert(got(0L) == got(1L))
    assert(got(2L) != got(0L))
  }

  test("kmeans fails loudly when k exceeds the row count") {
    import spark.implicits._
    val tiny = Seq(
      (0L, Array.fill(4)(0.1f)), (1L, Array.fill(4)(0.6f))
    ).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Cluster.kmeans(spark, tiny, k = 5, iters = 1)
    }
    assert(e.getMessage.contains("exceeds input row count"))
  }

  test("lloydCentroids: RDD and DataFrame iteration paths are bit-identical") {
    val embs = graft.sources.Fixtures.embeddings(spark, "/root/testdata/sf0.001")
      .repartition(7) // uneven partials exercise the reduceByKey merge
    val q = Cluster.quantize(embs, 1000).cache()
    try {
      val dim = q.select(size(col("v"))).head().getInt(0)
      val rdd = Cluster.lloydCentroids(q, k = 6, iters = 3, dim = dim,
        cutover = Long.MaxValue)
      val df = Cluster.lloydCentroids(q, k = 6, iters = 3, dim = dim,
        cutover = -1L)
      assert(rdd.map(_.toSeq).toSeq == df.map(_.toSeq).toSeq)
    } finally q.unpersist()
  }

  test("pqTrain: RDD and DataFrame training paths are bit-identical") {
    val embs = graft.sources.Fixtures.embeddings(spark, "/root/testdata/sf0.001")
      .repartition(5)
    val rdd = Ann.pqTrain(spark, embs, numSub = 4, ksub = 8, iters = 2,
      cutover = Long.MaxValue)
    val df = Ann.pqTrain(spark, embs, numSub = 4, ksub = 8, iters = 2,
      cutover = -1L)
    assert(rdd.map(_.map(_.toSeq).toSeq).toSeq == df.map(_.map(_.toSeq).toSeq).toSeq)
  }
}
