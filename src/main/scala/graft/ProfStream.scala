package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: phase timings inside the streaming replay harnesses —
  * source prep vs per-micro-batch rounds vs sentinel flush rounds —
  * to aim the replay-overhead trim at the real cost. */
object ProfStream {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark: SparkSession = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session so JVM/codegen startup doesn't land on phase 1
    graft.sources.Fixtures.events(spark, dir).count()

    def time[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PHASE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = graft.sources.Fixtures.events(spark, dir)
    val gapUs = 1800L * 1000000L

    for (round <- 1 to 2) {
      println(s"== replaySessionize round $round ==")
      val src = events.select(col("user_id").cast("long"),
          col("ts").cast("timestamp"), col("value").cast("double"))
        .as[(Long, java.sql.Timestamp, Double)]
      val n = time("count")(src.count())
      val per = math.max(1L, (n + 3) / 4).toInt
      val maxUs = time("maxUs")(
        events.select(max(unix_micros(col("ts")))).head().getLong(0))
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, Double)]
      val query = time("start") {
        graft.streaming.StreamOps.sessionize(spark,
            mem.toDF().toDF("user_id", "ts", "value"), gapUs,
            watermark = "1 second")
          .writeStream.format("memory").queryName(s"prof_sess_$round")
          .outputMode("update").start()
      }
      try {
        import scala.jdk.CollectionConverters._
        val it = time("sort+firstPartition")(
          src.orderBy(col("ts"), col("user_id")).toLocalIterator().asScala
            .grouped(per))
        var i = 0
        it.foreach { chunk =>
          i += 1
          time(s"batch$i (${chunk.size} rows)") {
            mem.addData(chunk.toSeq: _*)
            query.processAllAvailable()
          }
        }
        def sentinel(us: Long) =
          (-1L, new java.sql.Timestamp((us + gapUs) / 1000L + 2000L), 0.0)
        if (round == 1) {
          time("sentinel1") {
            mem.addData(sentinel(maxUs)); query.processAllAvailable()
          }
          time("sentinel2") {
            mem.addData(sentinel(maxUs + 5000000L)); query.processAllAvailable()
          }
        } else {
          // variant: ONE sentinel round — the engine should self-trigger
          // the timeout-sweep batch after the watermark advances
          time("sentinelSingle") {
            mem.addData(sentinel(maxUs)); query.processAllAvailable()
          }
        }
        val closed = time("collect")(
          spark.table(s"prof_sess_$round").collect()
            .count(r => r.getBoolean(5) && r.getLong(0) >= 0L))
        println(s"CLOSED round$round = $closed")
      } finally {
        query.stop()
        spark.conf.set("spark.sql.shuffle.partitions", prev)
      }
    }

    for (round <- 1 to 2) {
      println(s"== replayRangeJoin round $round ==")
      val left = events.filter(col("event_type") === "click")
      val right = events.filter(col("event_type") === "purchase")
      def srcOf(df: org.apache.spark.sql.DataFrame) =
        df.select(col("event_id").cast("long"), col("user_id").cast("long"),
            col("ts").cast("timestamp"))
          .as[(Long, Long, java.sql.Timestamp)]
      val (ls, rs) = (srcOf(left), srcOf(right))
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val memL = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, java.sql.Timestamp)]
      val memR = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, java.sql.Timestamp)]
      val query = time("start") {
        graft.streaming.StreamOps.streamingRangeJoin(
            memL.toDF().toDF("event_id", "user_id", "ts"),
            memR.toDF().toDF("event_id", "user_id", "ts"),
            "user_id", "ts", "event_id", 7200L)
          .writeStream.format("memory").queryName(s"prof_rj_$round")
          .outputMode("append").start()
      }
      try {
        import scala.jdk.CollectionConverters._
        def chunks(ds: org.apache.spark.sql.Dataset[(Long, Long, java.sql.Timestamp)]) = {
          val n = ds.count()
          val per = math.max(1L, (n + 3) / 4).toInt
          ds.orderBy(col("ts"), col("event_id")).toLocalIterator().asScala.grouped(per)
        }
        val (lc, rc) = (time("chunks")(chunks(ls)), time("chunksR")(chunks(rs)))
        var i = 0
        while (lc.hasNext || rc.hasNext) {
          i += 1
          time(s"batch$i") {
            if (lc.hasNext) memL.addData(lc.next().toSeq: _*)
            if (rc.hasNext) memR.addData(rc.next().toSeq: _*)
            query.processAllAvailable()
          }
        }
        println(s"PAIRS round$round = ${time("collect")(
          spark.table(s"prof_rj_$round").collect().length)}")
      } finally {
        query.stop()
        spark.conf.set("spark.sql.shuffle.partitions", prev)
      }
    }
    spark.stop()
  }
}
