package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hashed-ngram classifier inference vs a from-scratch replay: the
  * feature derivation (unigrams + adjacent bigrams, bag semantics,
  * trailing-empty-token survival), the md5 bucket/weight contract the
  * oracle rebuilds, and the no-shuffle plan shape. */
class ClassifierSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("classifier-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Independent scoring path: no memo cache, explicit feature list. */
  private def replayScore(text: String, buckets: Int): (Long, Long) = {
    val t = text.split(" ", -1)
    val feats = t.toSeq ++ t.toSeq.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    val w = Classifier.hashWeights(buckets)
    val s = feats.map(f => w((Classifier.md5Bits32Local("ft:" + f) % buckets).toInt)).sum
    (s, feats.length.toLong)
  }

  test("md5Bits32Local matches DuckDB's first-8-hex-chars convention") {
    // ('0x' || substr(md5('abc'), 1, 8))::BIGINT = 0x90015098 = 2416005272
    assert(Classifier.md5Bits32Local("abc") === 2416005272L)
    // md5('') = d41d8cd9... -> 0xd41d8cd9
    assert(Classifier.md5Bits32Local("") === 0xd41d8cd9L)
  }

  test("scoreDocs equals the independent replay on edge-shaped docs") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val texts = Seq(
      "plain three tokens",
      "one",                 // no bigram leg: n_features = 1
      "",                    // single empty token (split -1 keeps it)
      "trailing space ",     // trailing empty token is a real feature
      "dup dup dup dup",     // bag semantics: repeated features recount
      "a  b")                // interior empty token from double space
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Classifier.scoreDocs(spark, docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    for (((t, i)) <- texts.zipWithIndex) {
      val (s, n) = replayScore(t, 4096)
      assert(got(i.toLong) === ((s, n, s >= 0L)), s"doc '$t'")
      assert(n === 2L * t.split(" ", -1).length - 1)
    }
  }

  test("null ids and null text are dropped, not scored") {
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "ok doc"),
        org.apache.spark.sql.Row(null, "orphan"),
        org.apache.spark.sql.Row(3L, null))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType, nullable = true))))
    assert(Classifier.scoreDocs(spark, docs).collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("inference plan has no exchange — one broadcast plus a map pass") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, s"tok$i tok${i % 7} shared")).toDF("doc_id", "text")
    val plan = Classifier.scoreDocs(spark, docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("evalScores equals the brute-force pairwise U and confusion counts") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // small score range forces ties (the midrank lane must count)
    val rows = (1L to 300L).map(i => (i, rnd.nextInt(21).toLong - 10L,
      rnd.nextBoolean()))
    val scored = rows.toDF("doc_id", "score", "label")
    val thr = Seq(-5L, 0L, 5L)
    val got = Classifier.evalScores(spark, scored, thr).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val pos = rows.filter(_._3).map(_._2)
    val neg = rows.filterNot(_._3).map(_._2)
    val wins = (for (p <- pos; n <- neg if p > n) yield 1L).sum
    val ties = (for (p <- pos; n <- neg if p == n) yield 1L).sum
    val (num, den) = (2L * wins + ties, 2L * pos.length.toLong * neg.length)
    for (t <- thr) {
      val (tp, fp) = (pos.count(_ >= t).toLong, neg.count(_ >= t).toLong)
      assert(got(t) === ((tp, fp, pos.length - tp, neg.length - fp, num, den)),
        s"threshold $t")
    }
  }

  test("evalScores corners: one-class input and perfect separation") {
    import spark.implicits._
    // all-positive: den = 0, num = 0, sweep still counts tp/fn
    val onecls = Seq((1L, 5L, true), (2L, -5L, true)).toDF("doc_id", "score", "label")
    val g1 = Classifier.evalScores(spark, onecls, Seq(0L)).collect().head
    assert((g1.getLong(1), g1.getLong(2), g1.getLong(3), g1.getLong(4),
      g1.getLong(5), g1.getLong(6)) === ((1L, 0L, 1L, 0L, 0L, 0L)))
    // perfect separation: AUC = 1 (num == den)
    val sep = Seq((1L, 10L, true), (2L, 9L, true), (3L, -1L, false),
      (4L, -2L, false)).toDF("doc_id", "score", "label")
    val g2 = Classifier.evalScores(spark, sep, Seq(0L)).collect().head
    assert(g2.getLong(5) === g2.getLong(6) && g2.getLong(6) === 8L)
    intercept[IllegalArgumentException] {
      Classifier.evalScores(spark, sep, Seq.empty)
    }
  }

  test("bad bucket counts are rejected") {
    import spark.implicits._
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Classifier.scoreDocs(spark, docs, buckets = 0)
    }
  }
}
