package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Event-time joins: brute-force equivalence of the windowed as-of join
  * and the bucketed range join, plus the boundary semantics (equal-ts
  * match, tie-break by larger right id, left-outer nulls, pairs exactly
  * on the delta boundary, bucket-straddling pairs). */
class EventOpsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("event-ops-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mkEvents(rows: Seq[(Long, Long, Long)]) = {
    // (id, key, tsMicros)
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    rows.toDF("event_id", "user_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
  }

  test("asOfJoin == brute-force latest-at-or-before, incl. ties and no-match") {
    val rnd = new scala.util.Random(7)
    val left = (0 until 200).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong * 1000L))
    // include exact-equal timestamps across sides and duplicate right ts
    // within a key (ids 1000/1001 share key 0, ts 500000)
    val right = (0 until 150).map(i =>
      (1000L + i, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong * 1000L)) ++
      Seq((2000L, 0L, 500000L), (2001L, 0L, 500000L))
    val got = EventOps.asOfJoin(mkEvents(left), mkEvents(right),
        "user_id", "ts", "event_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val rByKey = right.groupBy(_._2)
    val want = left.map { case (id, k, ts) =>
      val cands = rByKey.getOrElse(k, Seq.empty).filter(_._3 <= ts)
      if (cands.isEmpty) (id, -1L, -1L)
      else {
        val m = cands.maxBy(c => (c._3, c._1))
        (id, m._1, ts - m._3)
      }
    }.toSet
    assert(got == want)
    // at least one equal-ts tie must actually be exercised
    assert(want.exists(t => t._2 == 2001L),
      "fixture must hit the duplicate-ts tie-break (2001 beats 2000)")
    assert(want.exists(_._2 == -1L), "fixture must hit the no-match case")
  }

  test("asOfJoin sliced path is output-identical to the per-key window path") {
    // the random fixture spans 1000 s; a 7 s slice forces ~143 slices, so
    // cross-slice carries (including multi-empty-slice gaps), within-slice
    // equal-ts ties, and no-match-yet lefts are all exercised
    val rnd = new scala.util.Random(7)
    val left = (0 until 200).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong * 1000000L))
    val right = (0 until 150).map(i =>
      (1000L + i, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong * 1000000L)) ++
      Seq((2000L, 0L, 500000000L), (2001L, 0L, 500000000L))
    def run(sliceSec: Long) = EventOps.asOfJoin(mkEvents(left), mkEvents(right),
        "user_id", "ts", "event_id", sliceSec = sliceSec)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val unsliced = run(0)
    assert(run(7) == unsliced)
    // degenerate widths too: one slice per distinct second (maximum
    // slicing — every match crosses slices) and one slice swallowing
    // everything (the carry path never fires)
    assert(run(1) == unsliced)
    assert(run(100000) == unsliced)
  }

  test("rangeJoin == brute-force filter, incl. boundary and bucket-straddling pairs") {
    val delta = 10L // seconds
    val dUs = delta * 1000000L
    val rnd = new scala.util.Random(11)
    val left = (0 until 120).map(i =>
      (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(100).toLong * 1000000L)) ++
      Seq((500L, 9L, 25000000L))
    // 501: exactly delta away from 500; 502: delta+1us away (excluded);
    // 503: same bucket; 504: adjacent bucket within delta
    val right = (0 until 90).map(i =>
      (1000L + i, rnd.nextInt(3).toLong, rnd.nextInt(100).toLong * 1000000L)) ++
      Seq((501L, 9L, 35000000L), (502L, 9L, 35000001L),
        (503L, 9L, 21000000L), (504L, 9L, 19999999L))
    val got = EventOps.rangeJoin(mkEvents(left), mkEvents(right),
        "user_id", "ts", "event_id", delta)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      (li, lk, lt) <- left
      (ri, rk, rt) <- right
      if lk == rk && math.abs(lt - rt) <= dUs
    } yield (li, ri, lt - rt)).toSet
    assert(got == want)
    assert(want.contains((500L, 501L, -dUs)), "exact-boundary pair must match")
    assert(!want.exists(p => p._1 == 500L && p._2 == 502L), "delta+1us must not match")
    assert(want.contains((500L, 504L, 5000001L)), "cross-bucket pair must match")
    // no duplicates: the bucketed join must emit each pair exactly once
    val gotList = EventOps.rangeJoin(mkEvents(left), mkEvents(right),
        "user_id", "ts", "event_id", delta).collect()
    assert(gotList.length == want.size, "bucketed join emitted duplicates")
  }

  test("sessionize == brute-force gap splitting, incl. boundary gap") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val gapSec = 100L
    val gapUs = gapSec * 1000000L
    // per user: random walk of inter-event gaps straddling the threshold,
    // including EXACTLY-equal gaps (same session: the rule is strict >)
    val rows = (0 until 20).flatMap { u =>
      var t = 1700000000000000L + u * 777L
      (0 until 50).map { i =>
        val gap = Seq(gapUs / 2, gapUs, gapUs + 1, 3 * gapUs)(rnd.nextInt(4))
        t += gap
        // dyadic values: session sums are exact in any summation order,
        // so the 6dp compare cannot straddle a rounding boundary
        (u * 1000L + i, u.toLong, t, rnd.nextInt(1024) / 8.0)
      }
    }
    val df = rows.toDF("event_id", "user_id", "us", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val want = rows.groupBy(_._2).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._3, e._1))
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) {
        case (acc @ cur :: rest, e) =>
          if (e._3 - cur.head._3 > gapUs) List(e) :: acc
          else (e :: cur) :: rest
        case (Nil, _) => Nil // unreachable
      }.reverse.map(_.reverse)
      sessions.zipWithIndex.map { case (ses, i) =>
        (u, i + 1L, ses.length.toLong, ses.map(_._3).min, ses.map(_._3).max,
          BigDecimal(ses.map(_._4).sum).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.toSet
    val got = EventOps.sessionize(df, gapSec).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet
    assert(got == want)
    assert(want.exists(_._3 > 1) && want.size > 20,
      "vacuous: need multi-event sessions and multi-session users")
  }

  test("dedupEvents == brute-force any-earlier-within-window rule, incl. equal-ts ties") {
    import spark.implicits._
    val W = 10L // seconds
    // (id, user, type, us): chains, exact-boundary gaps, equal-ts twins,
    // cross-type independence, singletons
    val rows = Seq(
      (1L, 1L, "a", 0L), (2L, 1L, "a", 5000000L),   // 5s: dup
      (3L, 1L, "a", 15000000L),                      // 10s after id 2: boundary dup
      (4L, 1L, "a", 26000001L),                      // 11.000001s: NOT dup
      (5L, 1L, "b", 5000000L),                       // other type: first, not dup
      (6L, 2L, "a", 5000000L), (7L, 2L, "a", 5000000L), // equal-ts twin: id 7 dup
      (8L, 3L, "a", 100L)                            // singleton
    )
    val df = rows.toDF("event_id", "user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val got = EventOps.dedupEvents(df, windowSec = W)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(3)) None else Some(r.getLong(3))), r.getBoolean(4))).toMap
    // brute force: exists an earlier (ts, id)-ordered same-key event
    // within W; gap = to the latest such predecessor
    val want = rows.map { case (id, u, t, us) =>
      val earlier = rows.filter { case (id2, u2, t2, us2) =>
        u2 == u && t2 == t && (us2 < us || (us2 == us && id2 < id))
      }
      val gap = earlier.map(e => us - e._4).minOption
      id -> ((gap, gap.exists(_ <= W * 1000000L)))
    }.toMap
    assert(got == want, s"got $got want $want")
    assert(want(3L)._2 && !want(4L)._2, "boundary cases must straddle W")
    assert(want(7L) == ((Some(0L), true)), "equal-ts twin must be a zero-gap dup")
  }

  test("retention == brute-force cohort/age counts") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val dayUs = 86400000000L
    val rows = (0 until 600).map { i =>
      (i.toLong, rnd.nextInt(30).toLong,
        rnd.nextInt(20).toLong * dayUs + rnd.nextInt(24).toLong * 3600000000L)
    }
    val df = rows.toDF("event_id", "user_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val byUser = rows.groupBy(_._2).view
      .mapValues(_.map(_._3 / dayUs).distinct).toMap
    val want = byUser.toSeq.flatMap { case (u, days) =>
      val cohort = days.min
      days.map(d => (cohort, d - cohort, u))
    }.groupBy(t => (t._1, t._2)).map { case ((c, a), us) =>
      (c, a, us.map(_._3).distinct.size.toLong)
    }.toSet
    val got = EventOps.retention(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(want.exists(_._2 > 0), "vacuous: need multi-day-active users")
  }

  test("funnel == brute-force sequential scan, incl. same-ts and skipped-step cases") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val types = Seq("view", "click", "purchase", "error")
    val rows = (0 until 800).map { i =>
      (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(300).toLong * 1000000L,
        types(rnd.nextInt(types.length)))
    } ++ Seq(
      // same-microsecond click as the first view: must NOT count (strict >)
      (9000L, 100L, 5000000L, "view"), (9001L, 100L, 5000000L, "click"),
      (9002L, 100L, 6000000L, "click"), (9003L, 100L, 7000000L, "purchase"),
      // step 2 before step 1 only: reached stops at 1
      (9010L, 101L, 5000000L, "click"), (9011L, 101L, 6000000L, "view"),
      // step 2 with no step 1: reached 0
      (9020L, 102L, 5000000L, "click"), (9021L, 102L, 6000000L, "purchase"))
    val df = rows.toDF("event_id", "user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val steps = Seq("view", "click", "purchase")
    val want = rows.groupBy(_._2).map { case (u, evs) =>
      var prev = Option.empty[Long]
      var first = true
      val ts = steps.map { s =>
        val cand = evs.filter(e => e._4 == s &&
          (first || (prev.nonEmpty && e._3 > prev.get))).map(_._3)
        val t = if ((first || prev.nonEmpty) && cand.nonEmpty) Some(cand.min) else None
        prev = t; first = false
        t
      }
      (u, ts(0), ts(1), ts(2), ts.lastIndexWhere(_.nonEmpty) + 1L)
    }.toSet
    val got = EventOps.funnel(df, steps).collect().map { r =>
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      (r.getLong(0), opt(1), opt(2), opt(3), r.getLong(4))
    }.toSet
    assert(got == want)
    assert(want.exists(_._5 == 3L) && want.exists(_._5 == 0L), "vacuous mix")
    // the crafted cases
    val m = got.map(t => t._1 -> t).toMap
    assert(m(100L) == ((100L, Some(5000000L), Some(6000000L), Some(7000000L), 3L)))
    assert(m(101L)._5 == 1L && m(101L)._3.isEmpty)
    assert(m(102L)._5 == 0L && m(102L)._2.isEmpty)
  }
}
