package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** State-store realism for the stateful streaming families.
  *
  * The replay harness pins `shuffle.partitions = 1` (deterministic
  * batch boundaries for the gate) on the default HDFS-backed state
  * store. A real cluster runs the SAME operators multi-partition on
  * the RocksDB provider — state keys hash across many stores and
  * values round-trip through RocksDB's serialization instead of the
  * in-memory map. One test per stateful operator kind replays the
  * identical input under that configuration (4 partitions + RocksDB)
  * and asserts output identity with the pinned replay:
  *
  *   - streaming aggregation state  (windowed event agg)
  *   - flatMapGroupsWithState       (sessionize)
  *   - stream-stream join state     (time-range join)
  *   - dropDuplicates state         (exact dedup verdicts)
  */
class StreamStateStoreSpec extends AnyFunSuite {

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("stream-statestore-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The multi-partition RocksDB replay configuration, passed as an
    * EXPLICIT parameter to each replay entry point — never via
    * process-global sys.props, which a concurrently-running suite's
    * replay in the shared forked JVM could silently pick up. */
  private val realStores = StreamOps.ReplayStores(partitions = 4,
    provider = Some(RocksDb))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def eventsFixture = {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val base = 1700000000000000L
    (0 until 150).map { i =>
      (i.toLong, rnd.nextInt(5).toLong,
        base + rnd.nextInt(200000).toLong * 1000000L,
        (rnd.nextInt(64) + 1).toDouble / 8.0)
    }.toDF("event_id", "user_id", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
  }

  test("windowed agg state: multi-partition RocksDB output == pinned replay") {
    spark.sparkContext.setLogLevel("WARN")
    val evs = eventsFixture
      .select(col("ts"), (col("user_id") % 3).cast("string").as("event_type"),
        col("value"))
    val pinned = rows(StreamOps.replayWindowAgg(spark, evs, numBatches = 5))
    val real =
      rows(StreamOps.replayWindowAgg(spark, evs, numBatches = 5,
        stores = realStores))
    assert(pinned.nonEmpty && real == pinned,
      s"windowed agg diverged: pinned=${pinned.size} real=${real.size}")
  }

  test("flatMapGroupsWithState state: sessionize under RocksDB == pinned") {
    val evs = eventsFixture.select(col("event_id"), col("user_id"),
      col("ts"), col("value"))
    val gapUs = 3600L * 1000000L
    val pinned = rows(StreamOps.replaySessionize(spark, evs, gapUs, numBatches = 5))
    val real =
      rows(StreamOps.replaySessionize(spark, evs, gapUs, numBatches = 5,
        stores = realStores))
    assert(pinned.nonEmpty && real == pinned,
      s"sessionize diverged: pinned=${pinned.size} real=${real.size}")
  }

  test("stream-stream join state: range join under RocksDB == pinned") {
    import spark.implicits._
    val base = 1700000000000000L
    def side(seed: Int, n: Int) = {
      val r = new scala.util.Random(seed)
      (0 until n).map { i =>
        (i.toLong, r.nextInt(6).toLong,
          base + r.nextInt(9000).toLong * 1000000L)
      }.toDF("id", "k", "us").withColumn("ts", timestamp_micros(col("us")))
        .drop("us")
    }
    val (l, r) = (side(7, 80), side(11, 80))
    val pinned = rows(StreamOps.replayRangeJoin(spark, l, r,
      keyCol = "k", tsCol = "ts", idCol = "id", deltaSec = 600L, numBatches = 4))
    val real = rows(StreamOps.replayRangeJoin(spark, l, r,
      keyCol = "k", tsCol = "ts", idCol = "id", deltaSec = 600L, numBatches = 4,
      stores = realStores))
    assert(pinned.nonEmpty && real == pinned,
      s"range join diverged: pinned=${pinned.size} real=${real.size}")
  }

  test("dropDuplicates state: exact dedup verdicts under RocksDB == pinned") {
    import spark.implicits._
    val docs = (0 until 120).map { i =>
      (i.toLong, s"text body ${i % 37}") // 37 distinct contents -> real dups
    }.toDF("doc_id", "text")
    val pinned = rows(StreamOps.replayExactDedup(spark, docs, numBatches = 4))
    val real =
      rows(StreamOps.replayExactDedup(spark, docs, numBatches = 4,
        stores = realStores))
    assert(pinned.nonEmpty && real == pinned,
      s"exact dedup diverged: pinned=${pinned.size} real=${real.size}")
  }
}
