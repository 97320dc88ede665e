package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hashed bag-of-ngrams linear classifier inference — the fastText
  * architecture (public knowledge: Joulin et al. 2016) that production
  * pipelines run as the cheap document-quality model: features are
  * unigrams + adjacent bigrams, hashed into a fixed bucket space, and
  * the document score is the sum of per-bucket weights. Inference is
  * ONE broadcast (the weight vector) + one map pass — no shuffle, the
  * same shape at 500 docs and at 100 TB.
  *
  * Weights here are md5-derived INTEGERS in [-1000, 1000] (a stand-in
  * model both engines can rebuild from the bucket id alone — the
  * fixture-derivation contract), and the score is a plain long sum, so
  * classification is engine-exact with no float anywhere; a real
  * trained model drops in by replacing [[hashWeights]] with a loaded
  * array, leaving the execution plan untouched.
  */
object Classifier {

  /** First 32 bits of md5, as an unsigned long — the JVM twin of the
    * oracle's `('0x' || substr(md5(s), 1, 8))::BIGINT` (the first 8 hex
    * chars of the digest are its first 4 bytes, big-endian). */
  private[operators] def md5Bits32Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Integer.toUnsignedLong(java.nio.ByteBuffer.wrap(d).getInt)
  }

  /** The md5-derived weight table: bucket b -> integer in [-1000, 1000]. */
  def hashWeights(buckets: Int): Array[Long] =
    Array.tabulate(buckets)(b => md5Bits32Local("ftw:" + b) % 2001L - 1000L)

  /** Score one text: (score, n_features). The shared per-row kernel —
    * scoreDocs and the fused arrival pipeline both call it, so the
    * feature derivation cannot fork. `cache` memoizes feature->bucket
    * per partition (vocab << token instances). */
  private[graft] def scoreText(text: String, wt: Array[Long], buckets: Int,
                               cache: java.util.HashMap[String, Int]): (Long, Long) = {
    def bucket(f: String): Int = {
      var b = cache.getOrDefault(f, -1)
      if (b < 0) {
        b = (md5Bits32Local("ft:" + f) % buckets).toInt
        cache.put(f, b)
      }
      b
    }
    // -1 limit: trailing empty tokens survive, matching both Catalyst
    // split and DuckDB string_split
    val t = text.split(" ", -1)
    var s = 0L
    var i = 0
    while (i < t.length) { s += wt(bucket(t(i))); i += 1 }
    i = 0
    while (i < t.length - 1) { s += wt(bucket(t(i) + " " + t(i + 1))); i += 1 }
    (s, (2 * t.length - 1).toLong)
  }

  /** Classifier evaluation over a scored + labeled frame: a fixed
    * threshold sweep (confusion counts at each cut) plus the exact AUC
    * as an INTEGER pair — `auc_num = 2*wins + ties` over all
    * (positive, negative) pairs, `auc_den = 2*n_pos*n_neg` (the
    * Mann–Whitney U statistic; midrank tie handling, kept as a ratio of
    * integers per the FP-safe-threshold rule, so both engines agree
    * bit-for-bit). No doc-level sort anywhere: scores collapse to a
    * histogram first (one shuffle), the below-cut negative counts ride
    * the audited two-phase prefix sum ([[CorpusOps.groupRunningSum]] —
    * a window over the unpartitioned histogram would funnel every
    * distinct score into one task), and the sweep is a broadcast of the
    * threshold list against the histogram. Overflow contract: pair
    * counts need n_pos*n_neg < 2^62 (~4e9 balanced rows) — eval slices
    * are sampled, not the full corpus; the require makes the limit
    * explicit (ANSI would throw mid-agg anyway, this names it).
    *
    * Input: (doc_id, score LONG, label BOOLEAN); output one row per
    * threshold: (threshold, tp, fp, fn, tn, auc_num, auc_den). */
  def evalScores(spark: SparkSession, scored: DataFrame,
                 thresholds: Seq[Long]): DataFrame = {
    import spark.implicits._
    require(thresholds.nonEmpty && thresholds.distinct == thresholds,
      s"evalScores: thresholds must be non-empty and distinct: $thresholds")
    val hist = scored
      .filter(col("score").isNotNull && col("label").isNotNull)
      .groupBy(col("score").cast("long").as("score"))
      .agg(sum(when(col("label"), 1L).otherwise(0L)).as("pos"),
        sum(when(col("label"), 0L).otherwise(1L)).as("neg"))
    val cum = CorpusOps.groupRunningSum(hist.withColumn("grp", lit(0L)),
      "grp", Seq(col("score")), col("neg"), "cumneg")
    try {
      // the totals/AUC agg and the threshold sweep are INDEPENDENT jobs
      // over the same persisted histogram — run them concurrently (the
      // q_engine_equiv pattern: small audit jobs are latency-bound on
      // job-submission round-trips, not compute)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val fTot = Future(cum.agg(
        coalesce(sum(col("pos")), lit(0L)).as("totpos"),
        coalesce(sum(col("neg")), lit(0L)).as("totneg"),
        coalesce(sum(col("pos") * (col("cumneg") - col("neg"))), lit(0L))
          .as("wins"),
        coalesce(sum(col("pos") * col("neg")), lit(0L)).as("ties"))
        .first()) // O(1): four longs
      // materialized here (O(|thresholds|) rows) BEFORE the finally
      // unpersists cum — a lazy result would recompute through freshly
      // sampled range boundaries (the phase-alignment hazard)
      val fSweep = Future(
        cum.crossJoin(broadcast(thresholds.toDF("threshold")))
          .groupBy(col("threshold"))
          .agg(coalesce(sum(when(col("score") >= col("threshold"), col("pos"))),
            lit(0L)).as("tp"),
            coalesce(sum(when(col("score") >= col("threshold"), col("neg"))),
              lit(0L)).as("fp"))
          .collect())
      val t = Await.result(fTot, Duration.Inf)
      val (totPos, totNeg) = (t.getLong(0), t.getLong(1))
      require(totPos == 0 || totNeg == 0 ||
        totPos <= Long.MaxValue / 2 / math.max(totNeg, 1L),
        s"evalScores: pair count 2*$totPos*$totNeg overflows; sample the eval slice")
      val aucNum = 2L * t.getLong(2) + t.getLong(3)
      val aucDen = 2L * totPos * totNeg
      val sweep = Await.result(fSweep, Duration.Inf)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          totPos - r.getLong(1), totNeg - r.getLong(2), aucNum, aucDen))
        .toSeq
      sweep.toDF("threshold", "tp", "fp", "fn", "tn", "auc_num", "auc_den")
    } finally cum.unpersist()
  }

  /** `(doc_id, score, n_features, keep)` — score the long weight sum
    * over hashed unigram+bigram features (duplicate features count each
    * occurrence, the bag semantics), keep = score >= 0. */
  def scoreDocs(spark: SparkSession, docs: DataFrame, buckets: Int = 4096,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import spark.implicits._
    require(buckets > 0, s"scoreDocs: buckets must be positive, got $buckets")
    val bw = spark.sparkContext.broadcast(hashWeights(buckets))
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        col(textCol).cast("string").as("text"))
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .as[(Long, String)]
      .mapPartitions { rows =>
        val wt = bw.value
        val cache = new java.util.HashMap[String, Int]()
        rows.map { case (id, text) =>
          val (s, nf) = scoreText(text, wt, buckets, cache)
          (id, s, nf, s >= 0L)
        }
      }
      .toDF("doc_id", "score", "n_features", "keep")
  }
}
