package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins Ann.sq8MaxAbs / sq8TopK: the signed code-map endpoints and
  * midpoint rounding, the all-zero degenerate corpus, exclusion + id
  * tiebreak, and agreement with a driver-side brute-force
  * requantization on a deterministic corpus (which also re-measures
  * the symmetry rationale: the code dot must rank like the true dot). */
class Sq8Spec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def embDf(rows: (Long, Array[Double])*) = {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    rows.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
  }

  test("sq8MaxAbs finds the global |max| in one pass") {
    val df = embDf(
      1L -> Array(0.0, -2.0, 0.5),
      2L -> Array(1.0, 1.5, -0.25))
    assert(Ann.sq8MaxAbs(df) == 2.0)
  }

  test("signed code map: +-a -> +-127, 0 -> 0, midpoint rounds half-up") {
    // a = 2.0. Query [2.0, -2.0]: codes [127, -127]. Corpus:
    //   (1) [2.0, -2.0] -> 127*127 + 127*127 = 32258
    //   (2) [-2.0, 2.0] -> -32258
    //   (3) [0.0, 2.0/127] -> second dim codes floor(1.5) = 1 -> -127
    val df = embDf(
      1L -> Array(2.0, -2.0),
      2L -> Array(-2.0, 2.0),
      3L -> Array(0.0, 2.0 / 127))
    val out = Ann.sq8TopK(df, Array(2.0, -2.0), 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 32258L, 2L -> -32258L, 3L -> -127L))
  }

  test("an all-zero corpus degenerates to zero scores ranked by id") {
    val df = embDf(1L -> Array(0.0, 0.0), 2L -> Array(0.0, 0.0))
    val out = Ann.sq8TopK(df, Array(0.0, 0.0), 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 0L), (2L, 0L)))
  }

  test("exclusion drops the query row; integer ties rank by id") {
    val df = embDf(
      1L -> Array(1.0),
      2L -> Array(1.0),
      3L -> Array(0.0),
      4L -> Array(1.0))
    val out = Ann.sq8TopK(df, Array(1.0), 10, excludeId = Some(1L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((2L, 127L * 127L), (4L, 127L * 127L), (3L, 0L)))
  }

  test("agrees with a driver-side brute-force requantization") {
    val dim = 16
    val rows = (0L until 300L).map { id =>
      id -> Array.tabulate(dim)(d =>
        math.sin(id.toDouble * (d + 1) * 0.37) * (d + 1))
    }
    val df = embDf(rows: _*)
    val query = rows.head._2
    val out = Ann.sq8TopK(df, query, 25, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    // brute force with the same fixed-shape signed code map
    val a = rows.flatMap(_._2.map(math.abs)).max
    def code(x: Double): Long =
      if (a == 0.0) 0L else math.floor(x * 127.0 / a + 0.5).toLong
    val qc = query.map(code)
    val expect = rows.drop(1).map { case (id, v) =>
      (id, (0 until dim).map(d => code(v(d)) * qc(d)).sum)
    }.sortBy { case (id, dot) => (-dot, id) }.take(25)
    assert(out == expect)
  }
}
