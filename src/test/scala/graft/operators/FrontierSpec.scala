package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins Frontier.schedule against a brute-force (priority DESC, id)
  * window reimplementation, the cap/slot/clock contract, and the
  * mega-host hot-key completion probe the bounded aggregator exists
  * for. */
class FrontierSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(cap: Int, delay: Long, rows: (Long, String, Long)*) = {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Frontier.schedule(
      rows.toSeq.toDF("url_id", "host", "priority"), cap, delay)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
  }

  /** Brute force: per host sort by (priority DESC, id), take cap. */
  private def brute(cap: Int, delay: Long, rows: Seq[(Long, String, Long)]) =
    rows.groupBy(_._2).flatMap { case (host, rs) =>
      rs.sortBy { case (id, _, pri) => (-pri, id) }.take(cap).zipWithIndex
        .map { case ((id, _, pri), slot) =>
          (id, host, pri, slot.toLong, slot * delay)
        }
    }.toSet

  test("admission, slots, and the politeness clock match brute force") {
    val rows = for {
      id <- 0L until 200L
    } yield (id, s"h${id % 7}.example.com", (id * 31) % 50)
    assert(run(5, 1500L, rows: _*) == brute(5, 1500L, rows))
  }

  test("priority ties admit the lower id first") {
    val rows = Seq((9L, "h", 10L), (3L, "h", 10L), (5L, "h", 10L))
    assert(run(2, 100L, rows: _*) ==
      Set((3L, "h", 10L, 0L, 0L), (5L, "h", 10L, 1L, 100L)))
  }

  test("hosts under the cap admit everything; slots stay dense") {
    val rows = Seq((1L, "a", 5L), (2L, "a", 9L), (3L, "b", 1L))
    assert(run(10, 1000L, rows: _*) == Set(
      (2L, "a", 9L, 0L, 0L), (1L, "a", 5L, 1L, 1000L),
      (3L, "b", 1L, 0L, 0L)))
  }

  test("mega-host hot key: 100k URLs on one host complete with O(cap) output") {
    import spark.implicits._
    val n = 100000L
    val df = spark.range(n).selectExpr(
      "id AS url_id", "'megahost.example.com' AS host",
      "(id * 17) % 1000 AS priority")
    val out = Frontier.schedule(df, perHostCap = 8, delayMs = 250L)
      .collect().sortBy(_.getLong(3))
    assert(out.length == 8)
    // top priority is 999, attained by ids with id*17 % 1000 == 999;
    // brute-force the expected winners on the driver
    val expect = (0L until n).map(id => (id, (id * 17) % 1000))
      .sortBy { case (id, pri) => (-pri, id) }.take(8)
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq == expect)
    assert(out.map(_.getLong(4)).toSeq == (0L until 8L).map(_ * 250L))
  }
}
