package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time join operators Spark lacks natively: backward as-of join
  * (each left row matched to the single latest right row at-or-before it)
  * and a banded range join (all pairs within a time delta). Both are
  * corpus/feature-pipeline staples (session attribution, feature lookup
  * as-of a label timestamp, leakage-safe joins).
  *
  * Neither needs a custom physical operator: the as-of join is one
  * union + one keyed window (a single shuffle, O(1) running state per
  * row), and the range join is a bucketed equijoin (each left row fans
  * out to 3 buckets; every qualifying pair meets in exactly one bucket,
  * so no post-join dedup). All time arithmetic is integer microseconds —
  * no FP boundary anywhere, so oracle comparisons are exact.
  */
object EventOps {

  /** Backward as-of join: for every left row, the latest right row with
    * `ts_right <= ts_left` sharing `keyCol` (ties on ts broken by the
    * larger right id, making the match total-order deterministic); left
    * rows with no prior right row keep a NULL match (left-outer
    * semantics). Output: (leftIdOut, match_id, lag_us).
    *
    * Shape (sliceSec = 0): tag the two sides, union, and take a running
    * `last` of the right id over a per-key window ordered by
    * (ts, side, id) — right rows sort before left rows at equal ts so
    * equality matches, and ascending id makes the running last the
    * max-id tie winner. One shuffle on the key; per-key streams are
    * processed by a single task (the standard window contract — at
    * 100 TB the keys are users/entities, millions of them, so
    * parallelism is ample).
    *
    * Shape (sliceSec > 0) — the hot-key scale path, output-identical
    * (spec-checked): rows bucket into (key, floor(ts / slice)) so the
    * heavy running-last window is per SLICE, not per key — task memory
    * is bounded by a slice's rows no matter how hot the key. Cross-slice
    * state flows through a per-slice carry summary (the latest right row
    * of each slice, max (ts, id) — the same tie convention), prefixed
    * per key over slice-count-sized rows by a second, tiny window; a
    * left row with no within-slice predecessor coalesces to its slice's
    * carry. Cost: one extra aggregation + one co-partitioned join. */
  def asOfJoin(left: DataFrame, right: DataFrame,
               keyCol: String, tsCol: String, idCol: String,
               leftIdOut: String = "event_id",
               matchIdOut: String = "match_id",
               sliceSec: Long = 0): DataFrame = {
    val l = left.select(col(keyCol).as("k"), col(tsCol).as("t"),
      col(idCol).cast("long").as("i"), lit(1).as("side"))
    val r = right.select(col(keyCol).as("k"), col(tsCol).as("t"),
      col(idCol).cast("long").as("i"), lit(0).as("side"))
    val u = l.union(r)
    if (sliceSec <= 0) {
      val w = Window.partitionBy(col("k"))
        .orderBy(col("t"), col("side"), col("i"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.withColumn("m", last(when(col("side") === 0, col("i")), ignoreNulls = true).over(w))
        .withColumn("mt", last(when(col("side") === 0, col("t")), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("i").as(leftIdOut), col("m").as(matchIdOut),
          (unix_micros(col("t")) - unix_micros(col("mt"))).as("lag_us"))
    } else {
      val sliceUs = sliceSec * 1000000L
      val sliced = u.withColumn("slice", floor(unix_micros(col("t")) / sliceUs))
      val ws = Window.partitionBy(col("k"), col("slice"))
        .orderBy(col("t"), col("side"), col("i"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val within = sliced
        .withColumn("m", last(when(col("side") === 0, col("i")), ignoreNulls = true).over(ws))
        .withColumn("mt", last(when(col("side") === 0, col("t")), ignoreNulls = true).over(ws))
      // one row per (key, slice): the slice's latest right row — max
      // (us, id) replicates the (ts, larger-id) tie convention
      val summaries = sliced.groupBy(col("k"), col("slice"))
        .agg(max(when(col("side") === 0,
          struct(unix_micros(col("t")).as("cus"), col("i").as("ci")))).as("cr"))
      // strictly-preceding slices only; rows here are slice summaries
      // (time-range / slice wide per key), never data-sized
      val wc = Window.partitionBy(col("k")).orderBy(col("slice"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val carries = summaries
        .withColumn("carry", last(col("cr"), ignoreNulls = true).over(wc))
        .select(col("k"), col("slice"), col("carry"))
      within.join(carries, Seq("k", "slice"))
        .filter(col("side") === 1)
        .select(col("i").as(leftIdOut),
          coalesce(col("m"), col("carry.ci")).as(matchIdOut),
          (unix_micros(col("t")) -
            coalesce(unix_micros(col("mt")), col("carry.cus"))).as("lag_us"))
    }
  }

  /** Banded range join: all (left, right) pairs sharing `keyCol` with
    * `|ts_left - ts_right| <= deltaSec`. Output: (left_id, right_id,
    * lag_us) with the signed lag left-minus-right.
    *
    * Shape: both sides bucket time at the delta width; the right side
    * keeps its own bucket, the left side fans out to {b-1, b, b+1}. Any
    * pair within delta has bucket distance <= 1, so it meets at the
    * right row's bucket exactly once — one shuffled equijoin on
    * (key, bucket), a codegen filter, no dedup. 3x fan-out of the
    * (id, ts) projection only — the standard interval-join shape AQE
    * can re-plan for skew. */
  def rangeJoin(left: DataFrame, right: DataFrame,
                keyCol: String, tsCol: String, idCol: String,
                deltaSec: Long): DataFrame = {
    val dUs = deltaSec * 1000000L
    def prep(df: DataFrame, out: String) =
      df.select(col(keyCol).as("k"), unix_micros(col(tsCol)).as(s"${out}_us"),
        col(idCol).cast("long").as(out))
    val l = prep(left, "left_id")
      .withColumn("db", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("bucket", floor(col("left_id_us") / dUs) + col("db"))
      .drop("db")
    val r = prep(right, "right_id")
      .withColumn("bucket", floor(col("right_id_us") / dUs))
    l.join(r, Seq("k", "bucket"))
      .filter(abs(col("left_id_us") - col("right_id_us")) <= dUs)
      .select(col("left_id"), col("right_id"),
        (col("left_id_us") - col("right_id_us")).as("lag_us"))
  }

  /** Batch sessionization — the batch twin of
    * [[graft.streaming.StreamOps.sessionize]]: per user, events ordered
    * by (ts, event_id); a gap of MORE than `gapSec` from the previous
    * event starts a new session. One row per session:
    * (user_id, session_idx, n_events, start_us, end_us, sum_value),
    * session_idx 1-based in time order.
    *
    * Session-boundary arithmetic is integer microseconds (the gap
    * compare is exact in both engines — no FP threshold, no probing);
    * sum_value follows the q_events_window 6dp rounding convention.
    * Shape: two window passes + the final aggregation, all partitioned
    * by user — ONE shuffle; a user's events must fit one task's stream
    * (the per-group window contract shared with asOfJoin: keys are
    * human-scale users, not corpus-sized groups). */
  def sessionize(events: DataFrame, gapSec: Long,
                 userCol: String = "user_id", tsCol: String = "ts",
                 idCol: String = "event_id",
                 valueCol: String = "value"): DataFrame = {
    require(gapSec > 0, s"gapSec must be positive, got $gapSec")
    val pre = events.select(col(userCol).as("user_id"),
      unix_micros(col(tsCol)).as("us"), col(idCol).as("eid"),
      col(valueCol).as("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("eid"))
    pre
      .withColumn("new_s",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"),
        round(sum(col("value")), 6).as("sum_value"))
  }

  /** Windowed duplicate-event suppression — the ingestion dedup rule
    * of an event pipeline: an event is a duplicate iff ANY earlier
    * event with the same (user, type) key lies within `windowSec`
    * before it. Since a key's events are totally ordered by (ts, id),
    * the immediately preceding event decides ("any earlier within W"
    * == "the latest earlier within W"), so ONE lag window per key
    * partition computes the rule exactly — integer micros end to end,
    * no FP anywhere, ties on equal timestamps broken by id (an
    * equal-ts twin IS a duplicate: gap 0 <= W).
    *
    * Output: (event_id, user_id, event_type, gap_us, is_dup) —
    * gap_us NULL for each key's first event. The window partition is
    * (user, type): bounded by the data model (one user's events of one
    * type), not a corpus share — the same argument as sessionize/asof. */
  def dedupEvents(events: DataFrame, windowSec: Long,
                  userCol: String = "user_id", typeCol: String = "event_type",
                  tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(windowSec > 0, s"windowSec must be positive, got $windowSec")
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("tus"), col("event_id"))
    events.select(col(idCol).cast("long").as("event_id"),
        col(userCol).cast("long").as("user_id"),
        col(typeCol).as("event_type"),
        unix_micros(col(tsCol)).as("tus"))
      .withColumn("gap_us", col("tus") - lag(col("tus"), 1).over(w))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("gap_us"),
        coalesce(col("gap_us") <= windowSec * 1000000L, lit(false))
          .as("is_dup"))
  }

  /** Cohort retention — the third leg of the event-analytics trio
    * (sessions, funnels, retention): users cohort by their FIRST active
    * day, and each (cohort_day, age_days) cell counts the distinct
    * users active `age` days after their cohort day. All arithmetic is
    * integer epoch-days (`unix_micros DIV 86400000000` — matches
    * DuckDB's `//` floor division for the non-negative timestamps the
    * events table carries), no calendar/timezone functions.
    *
    * Shape: one user-keyed min aggregation, a re-join of the (user,
    * day) distinct activity set against the broadcast-friendly cohort
    * frame, and one (cohort, age) count — map-side-combined shuffles
    * keyed by user then by the tiny cell grid. */
  def retention(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    val e = events.select(col(userCol).as("user_id"), col(tsCol).as("ts"))
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .distinct()
    val cohorts = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    e.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("age_days"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Ordered funnel analysis — per user, the earliest time each step of
    * `steps` completes STRICTLY AFTER the previous step's completion
    * (the product-analytics conversion primitive: view -> click ->
    * purchase). Step times are integer microseconds, strict `>` — no FP
    * boundary, and a same-microsecond later step does NOT count (both
    * engines agree exactly).
    *
    * Shape: ONE user-partition exchange. Step k's time is a windowed
    * `min(CASE step-k-event and after t(k-1))` over the user partition;
    * the k window passes chain over the SAME partitioning (window
    * results are per-user constants, so each pass reads the previous
    * pass's column as an ordinary value — no nested window
    * expressions), and Catalyst plans one Exchange reused by every
    * WindowExec. The final per-user reduction rides the same
    * partitioning. Per-user state is O(k); no per-group iteration, so
    * hot users cost nothing beyond their scan.
    *
    * Output: (user_id, t1..tk BIGINT nullable micros, reached BIGINT =
    * deepest completed step). */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel: empty step list")
    val w = Window.partitionBy(col("user_id"))
    var df = events.select(col(userCol).as("user_id"),
      unix_micros(col(tsCol)).as("tus"), col(typeCol).as("et"))
    steps.zipWithIndex.foreach { case (s, i) =>
      val cond =
        if (i == 0) col("et") === s
        else (col("et") === s) && col("tus") > col(s"t$i")
      df = df.withColumn(s"t${i + 1}", min(when(cond, col("tus"))).over(w))
    }
    val tCols = steps.indices.map(i => min(col(s"t${i + 1}")).as(s"t${i + 1}"))
    // fold deepest-step check to the OUTERMOST when: reached = max
    // completed step (the chain guarantees t_i null => t_{i+1} null)
    val reached = steps.indices.foldLeft(lit(0L)) { (acc, i) =>
      when(col(s"t${i + 1}").isNotNull, lit((i + 1).toLong)).otherwise(acc)
    }
    df.groupBy(col("user_id"))
      .agg(tCols.head, tCols.tail: _*)
      .select(col("user_id") +: steps.indices.map(i => col(s"t${i + 1}")) :+
        reached.as("reached"): _*)
  }
}
