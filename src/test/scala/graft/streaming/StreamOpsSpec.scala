package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structured-Streaming operator tests over MemoryStream micro-batches. */
class StreamOpsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("stream-ops-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.streaming.checkpointLocation",
      java.nio.file.Files.createTempDirectory("ckpt").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("windowed event aggregation over a stream matches batch semantics") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val agg = StreamOps.windowedEventAgg(events, "1 hour", "2 hours")
    val query = agg.writeStream.format("memory").queryName("winagg")
      .outputMode("update").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:15:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:45:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-01 11:05:00")
    mem.addData((t0, "click", 1.0), (t1, "click", 2.0), (t2, "view", 5.0))
    query.processAllAvailable()
    val rows = spark.sql("select * from winagg").collect()
    query.stop()
    val clicks = rows.find(r => r.getString(1) == "click").get
    assert(clicks.getLong(2) == 2L)
    assert(math.abs(clicks.getDouble(3) - 3.0) < 1e-9)
    assert(rows.exists(r => r.getString(1) == "view" && r.getLong(2) == 1L))
  }

  test("stateful sessionization accumulates per-user state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")
    val sess = StreamOps.sessionize(spark, events)
    val query = sess.writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    def ts(m: String) = java.sql.Timestamp.valueOf(m)
    mem.addData((1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:01:00"), 2.0),
      (2L, ts("2024-01-01 10:02:00"), 5.0),
      // user 3: two events 45 min apart INSIDE one micro-batch — the
      // explicit gap split must close the first session immediately
      (3L, ts("2024-01-01 09:00:00"), 7.0),
      (3L, ts("2024-01-01 09:45:00"), 9.0))
    query.processAllAvailable()
    mem.addData((1L, ts("2024-01-01 10:05:00"), 3.0))
    query.processAllAvailable()
    val rows = spark.sql("select * from sessions").collect()
    query.stop()
    val u1 = rows.filter(_.getLong(0) == 1L).maxBy(_.getLong(1))
    assert(u1.getLong(1) == 3L, s"user1 events ${u1.getLong(1)}")
    assert(math.abs(u1.getDouble(2) - 6.0) < 1e-9)
    assert(rows.exists(r => r.getLong(0) == 2L && r.getLong(1) == 1L))
    // the intra-batch split: one CLOSED single-event session at 09:00
    // and an open one at 09:45
    val u3closed = rows.filter(r => r.getLong(0) == 3L && r.getBoolean(5))
    assert(u3closed.length == 1 && u3closed.head.getLong(1) == 1L &&
      math.abs(u3closed.head.getDouble(2) - 7.0) < 1e-9,
      s"intra-batch gap split missing: ${u3closed.mkString(",")}")
    assert(rows.exists(r => r.getLong(0) == 3L && !r.getBoolean(5) &&
      math.abs(r.getDouble(2) - 9.0) < 1e-9))
  }

  test("replaySessionize reproduces the batch sessionize rows exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(23)
    // 4 users, 120 events over ~40 hours, gap 1 hour: multiple sessions
    // per user, boundaries landing inside and across micro-batches
    val base = 1700000000000000L
    val evs = (0 until 120).map { i =>
      (i.toLong, rnd.nextInt(4).toLong,
        base + rnd.nextInt(144000).toLong * 1000000L,
        (rnd.nextInt(1000) + 1).toDouble / 8.0) // exact eighths: FP-safe
    }
    val df = evs.toDF("event_id", "user_id", "us", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val gapUs = 3600L * 1000000L
    val streamed = StreamOps.replaySessionize(spark, df, gapUs, numBatches = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    val batch = graft.operators.EventOps.sessionize(df, gapSec = 3600L)
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("start_us"), col("end_us"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(batch.exists(_._2 >= 2L), "fixture must produce multi-session users")
    assert(streamed == batch,
      s"stream != batch: missing=${batch -- streamed} extra=${streamed -- batch}")
  }

  test("replayFunnel reproduces the batch funnel rows exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(31)
    val types = Seq("view", "click", "purchase", "error")
    val base = 1700000000000000L
    val evs = (0 until 300).map { i =>
      (i.toLong, rnd.nextInt(12).toLong,
        base + rnd.nextInt(50000).toLong * 1000000L,
        types(rnd.nextInt(types.length)))
    } ++ Seq( // same-microsecond step-2 (must not count) straddling batches
      (9000L, 50L, base, "view"), (9001L, 50L, base, "click"),
      (9002L, 50L, base + 1000000L, "click"))
    val df = evs.toDF("event_id", "user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val steps = Seq("view", "click", "purchase")
    def norm(r: org.apache.spark.sql.Row) =
      (r.getLong(0), (1 to 3).map(i => if (r.isNullAt(i)) -1L else r.getLong(i)),
        r.getLong(4))
    val streamed = StreamOps.replayFunnel(spark, df, steps, numBatches = 5)
      .collect().map(norm).toSet
    val batch = graft.operators.EventOps.funnel(df, steps)
      .collect().map(norm).toSet
    assert(batch.exists(_._3 == 3L) && batch.exists(_._3 < 3L), "vacuous mix")
    assert(streamed == batch,
      s"stream != batch: missing=${batch -- streamed} extra=${streamed -- batch}")
  }

  test("streaming near-dup emits exactly the batch simhash pair set across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // small corpus with genuine near-dups (shared phrasing, token swaps)
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat",
      3L -> "a completely different document about spark joins",
      4L -> "the quick brown fox jumps over the lazy dog",
      5L -> "another unrelated text mentioning histograms and emd",
      6L -> "a completely different document about spark joins today")
    val maxHamming = 12
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val matched = StreamOps.streamingNearDup(spark, stream, maxHamming)
    val query = matched.writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    // split across micro-batches: pairs must match within AND across them
    mem.addData(texts.take(3): _*)
    query.processAllAvailable()
    mem.addData(texts.drop(3): _*)
    query.processAllAvailable()
    val streamed = spark.sql("select * from neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    query.stop()
    val batch = graft.operators.Dedup.simhashDedup(spark,
        texts.toDF("doc_id", "text"), maxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(batch.nonEmpty, "vacuous streaming near-dup test")
    assert(streamed == batch,
      s"stream != batch: missing=${batch -- streamed} extra=${streamed -- batch}")
    // no self-pairs anywhere in the output
    assert(streamed.forall { case (r, s, _) => r < s })
  }

  test("replayNearDup harness reproduces the batch simhash pair set") {
    import spark.implicits._
    // near-dup families split across the harness's micro-batch boundaries
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat",
      3L -> "a completely different document about spark joins",
      4L -> "the quick brown fox jumps over the lazy dog",
      5L -> "another unrelated text mentioning histograms and emd",
      6L -> "a completely different document about spark joins today")
    val maxHamming = 12
    val replayed = StreamOps.replayNearDup(spark,
        texts.toDF("doc_id", "text"), maxHamming, numBatches = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.operators.Dedup.simhashDedup(spark,
        texts.toDF("doc_id", "text"), maxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(batch.nonEmpty && replayed == batch,
      s"replay != batch: missing=${batch -- replayed} extra=${replayed -- batch}")
  }

  test("streaming exact dedup: one verdict per doc, keepers match the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // exact duplicates up to case/whitespace (the fingerprint convention),
    // arriving id-ordered across micro-batches so first-seen == min-id
    val texts = Seq(
      1L -> "alpha beta gamma", 2L -> "delta epsilon", 3L -> "ALPHA  beta   GAMMA",
      4L -> "unique content here", 5L -> "delta epsilon", 6L -> "alpha beta gamma")
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val verdicts = StreamOps.streamingExactDedup(spark, stream)
    val query = verdicts.writeStream.format("memory").queryName("exactdedup")
      .outputMode("append").start()
    mem.addData(texts.take(3): _*)
    query.processAllAvailable()
    mem.addData(texts.drop(3): _*)
    query.processAllAvailable()
    val streamed = spark.sql("select * from exactdedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    query.stop()
    assert(streamed.length == texts.length, "exactly one verdict per document")
    // dup 3 (case/whitespace variant of 1) and dups 5, 6 point at their keepers
    val byId = streamed.map(t => t._1 -> t).toMap
    assert(byId(3L) == ((3L, 1L, true)) && byId(5L) == ((5L, 2L, true)) &&
      byId(6L) == ((6L, 1L, true)))
    assert(!byId(1L)._3 && !byId(2L)._3 && !byId(4L)._3)
    // keeper set == the batch operator's min-id keepers
    val batchKeepers = graft.operators.Dedup.exactDedup(texts.toDF("doc_id", "text"))
      .collect().map(_.getLong(1)).toSet
    val streamKeepers = streamed.filter(!_._3).map(_._1).toSet
    assert(streamKeepers == batchKeepers)
  }

  test("streaming interval join emits exactly the batch rangeJoin pair set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(us: Long) = new java.sql.Timestamp(us / 1000) // micros -> ms-based
    val rnd = new scala.util.Random(13)
    // 2023-era base: timestamps near epoch 0 sit on the clamped global
    // watermark and get dropped as late — not the semantics under test
    val base = 1700000000000000L
    // (id, key, tsMicros): second-aligned so Timestamp ms precision is exact
    val leftRows = (0 until 80).map(i =>
      (i.toLong, rnd.nextInt(3).toLong, base + rnd.nextInt(200).toLong * 1000000L))
    val rightRows = (0 until 60).map(i =>
      (1000L + i, rnd.nextInt(3).toLong, base + rnd.nextInt(200).toLong * 1000000L)) ++
      Seq((2000L, 0L, base)) // boundary partner candidate
    val delta = 15L
    val memL = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val memR = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val l = memL.toDF().toDF("event_id", "user_id", "ts")
    val r = memR.toDF().toDF("event_id", "user_id", "ts")
    val joined = StreamOps.streamingRangeJoin(l, r, "user_id", "ts", "event_id", delta)
    val query = joined.writeStream.format("memory").queryName("rjoin")
      .outputMode("append").start()
    // two micro-batches per side so cross-batch pairs are exercised
    val (l1, l2) = leftRows.splitAt(40)
    val (r1, r2) = rightRows.splitAt(30)
    memL.addData(l1.map(t => (t._1, t._2, ts(t._3))): _*)
    memR.addData(r1.map(t => (t._1, t._2, ts(t._3))): _*)
    query.processAllAvailable()
    memL.addData(l2.map(t => (t._1, t._2, ts(t._3))): _*)
    memR.addData(r2.map(t => (t._1, t._2, ts(t._3))): _*)
    query.processAllAvailable()
    val streamed = spark.sql("select * from rjoin").collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2))).toSet
    query.stop()
    val want = (for {
      (li, lk, lt) <- leftRows
      (ri, rk, rt) <- rightRows
      if lk == rk && math.abs(lt - rt) <= delta * 1000000L
    } yield (li, ri, lt - rt)).toSet
    assert(streamed == want,
      s"stream != batch: missing=${want -- streamed} extra=${streamed -- want}")
    // batch operator agrees on the same input
    val batch = graft.operators.EventOps.rangeJoin(
      leftRows.toDF("event_id", "user_id", "us")
        .withColumn("ts", timestamp_micros(col("us"))),
      rightRows.toDF("event_id", "user_id", "us")
        .withColumn("ts", timestamp_micros(col("us"))),
      "user_id", "ts", "event_id", delta)
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2))).toSet
    assert(batch == want)
  }

  test("streaming EMD match against static refs emits within-theta pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cfg = graft.SparkEntry.melodyCfg1d
    val refs: Array[(Long, Array[Double])] = Array(
      (100L, Array(1.0, 0, 0, 0, 0, 0, 0, 0)),
      (200L, Array(0, 0, 0, 0, 0, 0, 0, 1.0)))
    val mem = MemoryStream[(Long, Array[Double])]
    val stream = mem.toDF().toDF("id", "weights")
    val matched = StreamOps.streamingEmdMatch(spark, stream, refs, cfg, theta = 1.5)
    val query = matched.writeStream.format("memory").queryName("emdmatch")
      .outputMode("append").start()
    mem.addData((1L, Array(0.5, 0.5, 0, 0, 0, 0, 0, 0)), // close to ref 100
      (2L, Array(0, 0, 0, 0, 0, 0, 0.5, 0.5))) // close to ref 200
    query.processAllAvailable()
    val rows = spark.sql("select * from emdmatch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    query.stop()
    assert(rows.contains((1L, 100L, 0.5)))
    assert(rows.contains((2L, 200L, 0.5)))
    // far pairs (dist 6.5) must be pruned by theta=1.5
    assert(!rows.exists { case (s, r, _) => (s, r) == (1L, 200L) || (s, r) == (2L, 100L) })
  }

  test("stream-static edit match replay equals the batch banded join; batch-count invariant") {
    val docs = graft.sources.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val stream = docs.filter(col("doc_id") % 10 =!= 0)
    val refs = docs.filter(col("doc_id") % 10 === 0)
    def run(nb: Int): Set[(Long, Long, Long)] =
      StreamOps.replayEditMatch(spark, stream, refs, d = 4,
          maxRefs = 4096, numBatches = nb)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = run(2)
    // independent batch truth: the editJoin self-join restricted to
    // cross-(stream, ref) pairs, reoriented to (stream_id, ref_id)
    val batch = graft.operators.EditJoin.editJoin(docs, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .flatMap { case (a, b, ed) =>
        if (a % 10 == 0 && b % 10 != 0) Some((b, a, ed))
        else if (b % 10 == 0 && a % 10 != 0) Some((a, b, ed))
        else None
      }.toSet
    assert(streamed == batch,
      s"stream != batch: missing=${batch -- streamed} extra=${streamed -- batch}")
    assert(streamed.nonEmpty, "fixture must plant cross-split pairs")
    // replay invariance: a different ingestion slicing emits the same set
    assert(run(4) == streamed)
  }

  test("streaming ingest replay equals the batch parse+scrub; batch-count invariant") {
    import graft.operators.CorpusOps
    val docs = graft.sources.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val records = CorpusOps.jsonWrap(CorpusOps.cardWrap(docs))
    def run(nb: Int): Set[(Long, String, Long, Long)] =
      StreamOps.replayIngest(spark, records, numBatches = nb)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
    val streamed = run(2)
    val batch = CorpusOps.luhnScrub(
        CorpusOps.jsonIngest(records, withText = true)
          .filter(col("valid")).select(col("doc_id"), col("text")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed == batch,
      s"stream != batch: missing=${(batch -- streamed).size} extra=${(streamed -- batch).size}")
    // the lanes are non-vacuous: parse drops, redactions, rejections
    assert(streamed.size < 500 && streamed.nonEmpty)
    assert(streamed.exists(_._3 > 0) && streamed.exists(_._4 > 0))
    // replay invariance: a different ingestion slicing lands the same set
    assert(run(3) == streamed)
  }

  test("streaming blocklist replay equals the batch automaton; batch-count invariant") {
    val docs = graft.sources.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val dict = Seq("join", "join order", "batch batch", "slow query", "vector")
    def run(nb: Int): Set[(Long, String, Long)] =
      StreamOps.replayBlocklist(spark, docs, dict, numBatches = nb)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
    val streamed = run(2)
    val batch = graft.operators.Blocklist.matchCounts(spark, docs, dict)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed == batch,
      s"stream != batch: missing=${(batch -- streamed).size} extra=${(streamed -- batch).size}")
    // non-vacuous: the nested pattern pair both fire somewhere
    assert(streamed.exists(_._2 == "join") && streamed.exists(_._2 == "join order"))
    // replay invariance: a different ingestion slicing lands the same set
    assert(run(3) == streamed)
  }

  test("streaming WARC replay equals the batch parse; batch-count invariant") {
    import graft.operators.Warc
    val docs = graft.sources.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val files = Warc.warcWrap(docs)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)), Option(r.getString(5)))
    def run(nb: Int): Set[(Long, Long, String, Option[String], Option[String])] =
      StreamOps.replayWarc(spark, files, numBatches = nb)
        .collect().map(key).toSet
    val streamed = run(2)
    val batch = Warc.parseWarc(spark, files).collect().map(key).toSet
    assert(streamed == batch,
      s"stream != batch: missing=${(batch -- streamed).size} extra=${(streamed -- batch).size}")
    // the corrupt-stop and trap lanes survive the streaming path
    assert(streamed.exists(_._3 == "_corrupt") &&
      streamed.exists(_._3 == "warcinfo"))
    assert(run(3) == streamed)
  }

  test("streaming snapshot diff equals the batch diff minus removed; batch-count invariant") {
    import graft.operators.Snapshot
    val docs = graft.sources.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val next = Snapshot.nextSnapshot(docs)
    def run(nb: Int): Set[(Long, String)] =
      StreamOps.replaySnapshotDiff(spark, next, docs, numBatches = nb)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val streamed = run(2)
    val batch = Snapshot.diff(docs, next).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2 != "removed").toSet
    assert(streamed == batch,
      s"stream != batch: missing=${(batch -- streamed).size} extra=${(streamed -- batch).size}")
    // all three arrival-visible lanes fire
    assert(Set("added", "changed", "unchanged").subsetOf(streamed.map(_._2)))
    assert(run(3) == streamed)
  }

  test("streaming classify replay equals the batch scorer; batch-count invariant") {
    import graft.operators.Classifier
    val docs = graft.sources.Fixtures.documents(spark, "/root/testdata/sf0.001")
    def run(nb: Int): Set[(Long, Long, Long, Boolean)] =
      StreamOps.replayClassify(spark, docs, numBatches = nb)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .toSet
    val streamed = run(2)
    val batch = Classifier.scoreDocs(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(streamed == batch,
      s"stream != batch: missing=${(batch -- streamed).size} extra=${(streamed -- batch).size}")
    // both verdict lanes fire
    assert(streamed.exists(_._4) && streamed.exists(!_._4))
    assert(run(3) == streamed)
  }

  test("arrival pipeline equals the independently-composed batch gates; batch-count invariant") {
    import graft.operators.{Blocklist, Classifier, CorpusOps}
    val docs = graft.sources.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val records = CorpusOps.jsonWrap(CorpusOps.cardWrap(docs))
    val dict = Seq("join", "join order", "batch batch", "slow query", "vector")
    def run(nb: Int): Set[(Long, Long, Long, Long, Boolean, Long, Boolean)] =
      StreamOps.replayArrival(spark, records, dict, numBatches = nb)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4), r.getLong(5), r.getBoolean(6))).toSet
    val streamed = run(2)
    // independent batch composition: separate frames + a join, vs the
    // pipeline's fused single-pass kernel
    val scrubbed = CorpusOps.luhnScrub(
      CorpusOps.jsonIngest(records, withText = true)
        .filter(col("valid")).select(col("doc_id"), col("text")))
    val scores = Classifier.scoreDocs(spark, scrubbed, textCol = "clean_text")
    val hits = Blocklist.matchCounts(spark, scrubbed, dict,
        textCol = "clean_text")
      .groupBy("doc_id").agg(sum(col("hits")).as("bh"))
    val batch = scrubbed.join(scores, "doc_id")
      .join(hits, Seq("doc_id"), "left").na.fill(0L, Seq("bh"))
      .collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getLong(r.fieldIndex("n_cards")),
        r.getLong(r.fieldIndex("n_rejected")),
        r.getLong(r.fieldIndex("score")),
        r.getBoolean(r.fieldIndex("keep")),
        r.getLong(r.fieldIndex("bh")),
        r.getBoolean(r.fieldIndex("keep")) && r.getLong(r.fieldIndex("bh")) == 0L))
      .toSet
    assert(streamed == batch,
      s"stream != batch: missing=${(batch -- streamed).size} extra=${(streamed -- batch).size}")
    // lane variety: admitted and rejected both fire, blocked and clean both exist
    assert(streamed.exists(_._7) && streamed.exists(!_._7))
    assert(streamed.exists(_._6 == 0L) && streamed.exists(_._6 > 0L))
    assert(run(3) == streamed)
  }

  test("streaming content dedup equals the batch anti-join; batch-count invariant") {
    import graft.operators.Snapshot
    val docs = graft.sources.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val arriving = Snapshot.rehostWrap(docs)
    def run(nb: Int): Set[(Long, Boolean)] =
      StreamOps.replayContentDedup(spark, arriving, docs, numBatches = nb)
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    val streamed = run(2)
    val batch = Snapshot.contentDedup(docs, arriving).collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toSet
    assert(streamed == batch,
      s"stream != batch: missing=${(batch -- streamed).size} extra=${(streamed -- batch).size}")
    assert(streamed.exists(_._2) && streamed.exists(!_._2),
      "mirror and fresh lanes must both fire")
    assert(run(3) == streamed)
  }

  test("stream-static ANN replay equals the one-shot batch read path") {
    val embs = graft.sources.Fixtures.embeddings(spark, "/root/testdata/sf0.001")
    val queries = graft.operators.Cluster
      .quantize(embs.filter(col("vec_id") % 50 === 0), 1000)
      .select(col("id").as("qid"), col("v"))
    val streamed = StreamOps.replayAnnTopK(spark, queries, embs,
        kCoarse = 4, nProbe = 2, numSub = 4, ksub = 8, k = 5, numBatches = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val idx = graft.operators.Ann.buildIvfPqIndex(spark, embs,
      kCoarse = 4, numSub = 4, ksub = 8)
    try {
      val batch = graft.operators.Ann.ivfPqBatchTopK(queries, idx,
          nProbe = 2, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch,
        s"stream != batch: missing=${batch -- streamed} extra=${streamed -- batch}")
      assert(streamed.nonEmpty)
    } finally idx.close()
  }

  test("streaming as-of join reproduces the batch operator incl. equal-ts ties") {
    import spark.implicits._
    def ts(us: Long) = new java.sql.Timestamp(us / 1000L)
    // user 1: purchase before+at+after clicks, incl. an EQUAL-ts pair
    // (two purchases at the same ts — larger id must win) and a click
    // with no prior purchase; user 2: clicks only (null matches)
    val rows = Seq(
      (1L, ts(1000000L), "purchase", 10L),
      (1L, ts(2000000L), "click", 11L),
      (1L, ts(3000000L), "purchase", 12L),
      (1L, ts(3000000L), "purchase", 13L), // equal ts, larger id wins
      (1L, ts(3000000L), "click", 14L),    // equal-ts click sees both
      (1L, ts(500000L), "click", 9L),      // before any purchase -> null
      (2L, ts(2000000L), "click", 20L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val left = rows.filter($"event_type" === "click")
    val right = rows.filter($"event_type" === "purchase")
    val batch = graft.operators.EventOps.asOfJoin(left, right,
        "user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    val streamed = StreamOps.replayAsOf(spark, left, right,
        "user_id", "ts", "event_id", numBatches = 3).collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(streamed == batch)
    assert(batch.contains((14L, Some(13L), Some(0L))), batch)   // tie rule
    assert(batch.contains((9L, None, None)))                    // no match
  }

  test("streaming heavy hitters: cross-batch sketch merge matches the batch operator") {
    import spark.implicits._
    // skewed corpus: "hot" dominates, "warm" sits just above the 1/5
    // threshold only when ALL batches are counted — a dropped or
    // partially-sketched micro-batch changes the verdict set
    val docs = (1L to 30L).map { i =>
      val toks = Seq.fill(3)("hot") ++ Seq("warm", s"cold$i", s"rare${i % 7}")
      (i, toks.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val batch = graft.operators.CorpusOps
      .heavyHitters(df, phiDen = 5L, sketchSize = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val streamed = StreamOps
      .replayHeavyHitters(spark, df, phiDen = 5L, sketchSize = 16,
        numBatches = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "fixture must produce at least one heavy hitter")
    assert(streamed == batch)
  }
}
