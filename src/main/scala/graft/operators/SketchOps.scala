package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based profiling with in-query error audits — the 100 TB
  * cardinality/quantile path, wired so approximation NEVER reaches an
  * unverified result:
  *
  *  - the sketch aggregates (HyperLogLog++, Greenwald–Khanna-style
  *    approx_percentile) are Spark-native partial aggregates: map-side
  *    mergeable state, one tiny shuffle row per group, no vocabulary /
  *    value-set exchange — exactly what survives a 1000-executor scan;
  *  - each query ALSO computes the exact statistic and emits a boolean
  *    asserting the sketch landed inside its published error envelope.
  *    The oracle pins that boolean to TRUE, so a sketch drifting out of
  *    bounds is a driver-visible hash mismatch, not a silent estimate.
  *
  * At gate scale the exact side is cheap; at 100 TB a user keeps the
  * sketch columns and drops the exact ones — the audit queries exist to
  * prove the envelope claims those users rely on.
  */
object SketchOps {

  /** Per-group exact distinct count + HyperLogLog++ estimate audit.
    *
    * One `groupBy` computes `count(DISTINCT v)` (exact, oracle-checked)
    * and `approx_count_distinct(v, rsd)` side by side; `hll_ok` asserts
    * `|est - exact| <= ceil(sigmas * rsd * exact)`. HLL++'s standard
    * error is rsd (with sub-rsd bias-corrected sparse mode at low
    * cardinalities), so `sigmas` standard deviations is a
    * conservatively-wide envelope: a false FAIL is astronomically
    * unlikely, while a broken sketch (or a future Spark regression in
    * it) trips the oracle.
    *
    * Output: (groupCol, n_distinct BIGINT, hll_ok BOOLEAN). */
  def distinctAudit(df: DataFrame, groupCol: String, value: Column,
                    rsd: Double = 0.02, sigmas: Double = 6.0): DataFrame =
    df.groupBy(col(groupCol))
      .agg(countDistinct(value).as("n_distinct"),
        approx_count_distinct(value, rsd).as("est"))
      .select(col(groupCol), col("n_distinct"),
        (abs(col("est") - col("n_distinct")) <=
          ceil(lit(sigmas * rsd) * col("n_distinct"))).as("hll_ok"))

  /** Global approx-percentile rank audit.
    *
    * `approx_percentile(v, q, accuracy)` guarantees the returned value's
    * RANK is within eps*n of the target rank, eps = 1/accuracy (Spark's
    * documented contract for the Greenwald–Khanna variant it ships).
    * The audit recomputes each estimate's exact rank window
    * [count(v < est) + 1, count(v <= est)] in ONE conditional-sum pass
    * over the data (estimates ride as literals — O(|qs|) driver state)
    * and checks it intersects [floor((q-eps)*n), ceil((q+eps)*n)].
    *
    * Output: one row per q — (q DOUBLE, n BIGINT, rank_ok BOOLEAN),
    * oracle-pinned rank_ok = TRUE. */
  def quantileAudit(df: DataFrame, valueCol: Column, qs: Seq[Double],
                    accuracy: Int = 10000): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0), s"qs=$qs")
    val spark = df.sparkSession
    val value = valueCol.cast("double")
    val estRow = df.agg(
        percentile_approx(value, typedLit(qs), lit(accuracy)).as("est"))
      .head()
    // empty (or all-null) input: the percentile aggregate is NULL and
    // there is no rank to audit — zero rows, not an NPE
    if (estRow.isNullAt(0))
      return spark.createDataFrame(Seq.empty[(Double, Long, Boolean)])
        .toDF("q", "n", "rank_ok")
    val ests = estRow.getSeq[Double](0)
    val eps = 1.0 / accuracy
    val rankAggs = ests.zipWithIndex.flatMap { case (e, i) => Seq(
      sum(when(value < e, 1L).otherwise(0L)).as(s"lt$i"),
      sum(when(value <= e, 1L).otherwise(0L)).as(s"le$i"))
    }
    // n counts NON-NULL values: percentile_approx and the lt/le rank
    // sums ignore nulls, so a count(*) target window on null-bearing
    // data would audit against the wrong N
    val r = df.agg(count(value).as("n"), rankAggs: _*).head()
    val n = r.getLong(0)
    val rows = qs.zipWithIndex.map { case (q, i) =>
      (q, n, rankWindowOk(r.getLong(1 + 2 * i), r.getLong(2 + 2 * i), q, n, eps))
    }
    spark.createDataFrame(rows).toDF("q", "n", "rank_ok")
  }

  /** Bloom-filter semi-join audit — the broadcast pre-filter that cuts
    * a big-table shuffle before an equijoin, with its guarantees pinned
    * to the oracle.
    *
    * At 100 TB this is the shape that matters: build one bloom over the
    * (small) key side — a distributed aggregate whose result is a few
    * MB regardless of big-side size — broadcast it, and drop big-side
    * rows map-side BEFORE the join shuffle. Spark's own runtime
    * row-level filtering does this opportunistically; here it is an
    * explicit, audited operator:
    *
    *  - `false_negatives` is pinned 0 — a bloom filter NEVER drops a
    *    true match (the correctness half, exact by construction;
    *    a hash mismatch here means the pre-filter broke the join);
    *  - `fp_ok` asserts the false-positive count stays within
    *    `slack * fpp * nonMatchingKeys + 64` — the capacity/fpp
    *    envelope (a silently overloaded filter passes everything and
    *    the "optimization" quietly dies; this makes that
    *    driver-visible). The envelope is denominated in DISTINCT keys,
    *    matching the bloom's per-key fpp guarantee: per-ROW accounting
    *    would let duplicated keys (lineitem ~4 rows/order) cluster
    *    false positives and break the statistical margin.
    *
    * Output: one row (n_big, n_true, false_negatives, fp_ok). */
  def bloomJoinAudit(big: DataFrame, bigKey: Column,
                     keys: DataFrame, keyCol: Column,
                     fpp: Double = 0.03, slack: Double = 3.0): DataFrame = {
    val spark = big.sparkSession
    val keyDs = keys.select(keyCol.cast("long").as("k")).distinct()
    val nKeys = math.max(keyDs.count(), 1L)
    val bloom = keys.stat.bloomFilter(keyCol, nKeys, fpp)
    val bloomB = spark.sparkContext.broadcast(bloom)
    val bigK = big.select(bigKey.cast("long").as("k"))
    // The map-side pre-filter's verdict is a DETERMINISTIC function of
    // the key (mightContainLong probes the same bits every time), so
    // row- and key-granular tallies fold into ONE aggregation over the
    // distinct big-side keys: groupBy(k) carries each key's row count
    // up (map-side partial agg — the only shuffle, key-sized), the
    // broadcast join marks true matches, the bloom probe runs once per
    // distinct key exactly as it would per row. One pass over the big
    // side + one action, replacing the six per-tally scans this audit
    // used to run (the round-11 q_bloom_join regression).
    // fp accounting stays in DISTINCT keys — the granularity of the
    // bloom's fpp guarantee: a key either collides or it doesn't, and
    // all its rows follow, so the budget is fpp x non-matching keys.
    val mightContain = udf((k: Long) => bloomB.value.mightContainLong(k))
    val r = bigK.groupBy(col("k")).agg(count(lit(1)).as("rows"))
      .join(broadcast(keyDs.withColumn("hit", lit(1L))), Seq("k"), "left")
      .select(col("rows"), coalesce(col("hit"), lit(0L)).as("hit"),
        when(mightContain(col("k")), 1L).otherwise(0L).as("pass"))
      .agg(
        coalesce(sum(col("rows")), lit(0L)).as("n_big"),
        coalesce(sum(when(col("hit") === 1L, col("rows")).otherwise(0L)),
          lit(0L)).as("n_true"),
        coalesce(sum(when(col("hit") === 1L && col("pass") === 0L,
          col("rows")).otherwise(0L)), lit(0L)).as("false_neg"),
        count(lit(1)).as("n_big_keys"),
        coalesce(sum(col("hit")), lit(0L)).as("n_true_keys"),
        coalesce(sum(when(col("hit") === 0L && col("pass") === 1L, 1L)
          .otherwise(0L)), lit(0L)).as("fp_keys"))
      .head()
    val (nBig, nTrue, falseNegatives) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (nBigKeys, nTrueKeys, fpKeys) = (r.getLong(3), r.getLong(4), r.getLong(5))
    val fpBudget = math.ceil(
      slack * fpp * math.max(nBigKeys - nTrueKeys, 1L).toDouble).toLong + 64L
    spark.createDataFrame(Seq(
        (nBig, nTrue, falseNegatives, fpKeys <= fpBudget)))
      .toDF("n_big", "n_true", "false_negatives", "fp_ok")
  }

  /** Count-Min sketch frequency audit over a token column.
    *
    * `count_min_sketch` is a Spark-native partial aggregate (map-side
    * mergeable, one small binary per partition up the tree — the
    * streaming-friendly cousin of the Misra–Gries exact path in
    * [[graft.core.MisraGries]]). The audit queries the sketch for a
    * fixed probe list and checks both published guarantees against
    * exact counts computed in the same pass structure:
    *
    *  - CMS NEVER underestimates (est >= exact, deterministic);
    *  - est <= exact + eps * N with probability >= confidence; the
    *    envelope uses `slack * eps * N` so a correct sketch cannot
    *    flake the gate while a broken one still trips it.
    *
    * Output: one row per probe — (token, cnt BIGINT exact, cms_ok). */
  def cmsAudit(toks: DataFrame, tokenCol: String, probes: Seq[String],
               eps: Double = 0.0005, confidence: Double = 0.99,
               seed: Int = 42, slack: Double = 4.0): DataFrame = {
    require(probes.nonEmpty, "cmsAudit: empty probe list")
    val spark = toks.sparkSession
    import spark.implicits._
    val bytes = toks
      .agg(expr(s"count_min_sketch($tokenCol, ${eps}d, ${confidence}d, $seed)"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val exact = toks.filter(col(tokenCol).isin(probes: _*))
      .groupBy(col(tokenCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = math.ceil(slack * eps * cms.totalCount().toDouble).toLong
    val rows = probes.map { p =>
      val e = exact.getOrElse(p, 0L)
      val est = cms.estimateCount(p)
      (p, e, est >= e && est - e <= budget)
    }
    spark.createDataset(rows).toDF("token", "cnt", "cms_ok")
  }

  /** Does the estimate's exact rank window [ltCount+1, leCount]
    * intersect the target window [(q-eps)*n, (q+eps)*n]? Factored pure
    * so the envelope is directly falsifiable in specs (the DataFrame
    * path can only ever feed it in-bounds estimates). */
  private[operators] def rankWindowOk(ltCount: Long, leCount: Long,
                                      q: Double, n: Long, eps: Double): Boolean = {
    val lo = ltCount + 1
    val hi = leCount
    val tLo = math.floor((q - eps) * n).toLong
    val tHi = math.ceil((q + eps) * n).toLong
    lo <= tHi && hi >= tLo
  }
}
