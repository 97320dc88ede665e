package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Viterbi unigram segmentation vs exhaustive enumeration: the DP must
  * return the true maximum score and the true minimum piece count among
  * maximum-score segmentations — including the lane where a longer
  * vocab piece loses to a cheaper split (the anti-greedy semantics that
  * distinguish this family from WordPiece). */
class UnigramSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("unigram-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val vocab: Seq[(String, Long)] =
    (('a' to 'u') ++ Seq('w', 'y')).map(c => c.toString -> -10L) ++
      Seq("th" -> -15L, "er" -> -15L, "an" -> -16L, "in" -> -12L,
        "jo" -> -15L, "join" -> -30L, "sc" -> -14L, "scan" -> -28L,
        "ing" -> -24L, "que" -> -22L, "ry" -> -13L, "ba" -> -17L,
        "tch" -> -21L, "order" -> -38L, "ta" -> -16L, "ble" -> -26L)

  /** All segmentations by brute recursion; None if uncoverable. */
  private def brute(w: String): Option[(Long, Long)] = {
    def segs(i: Int): Seq[(Long, Long)] =
      if (i == w.length) Seq((0L, 0L))
      else vocab.flatMap { case (p, s) =>
        if (w.startsWith(p, i)) segs(i + p.length).map(t => (t._1 + s, t._2 + 1))
        else Nil
      }
    val all = segs(0)
    if (all.isEmpty) None
    else {
      val best = all.map(_._1).max
      Some((best, all.filter(_._1 == best).map(_._2).min))
    }
  }

  test("hand lanes: anti-greedy split, whole-piece win, UNK, empty") {
    // "join": piece join = -30 LOSES to jo+in = -27
    assert(Unigram.segment("join", vocab) === ((-27L, 2L, false)))
    // "scan": piece scan = -28 BEATS sc+an = -30
    assert(Unigram.segment("scan", vocab) === ((-28L, 1L, false)))
    assert(Unigram.segment("query", vocab) === ((-35L, 2L, false)))
    // 'v' is uncoverable -> whole-word UNK
    assert(Unigram.segment("value", vocab) === ((Unigram.UnkScore, 1L, true)))
    assert(Unigram.segment("", vocab) === ((0L, 0L, false)))
  }

  test("seeded random words equal the exhaustive enumeration") {
    val rnd = new Random(31337)
    val alpha = "abcdefghijklmnopqrstuvwy" // includes the UNK letter v
    for (_ <- 1 to 400) {
      val w = Seq.fill(1 + rnd.nextInt(9))(alpha(rnd.nextInt(alpha.length))).mkString
      val got = Unigram.segment(w, vocab)
      brute(w) match {
        case Some((s, p)) => assert(got === ((s, p, false)), s"word '$w'")
        case None => assert(got === ((Unigram.UnkScore, 1L, true)), s"word '$w'")
      }
    }
  }

  test("encode sums the per-word stats over documents") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val docs = Seq((1L, "join scan value"), (2L, "")).toDF("doc_id", "text")
    val got = Unigram.encode(docs, vocab).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got(1L) === ((3L, -27L - 28L + Unigram.UnkScore, 2L + 1L + 1L, 1L)))
    // empty text = one empty word: zero score, zero pieces, not UNK
    assert(got(2L) === ((1L, 0L, 0L, 0L)))
  }

  test("bad vocabularies are rejected") {
    import spark.implicits._
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Unigram.encode(docs, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Unigram.encode(docs, Seq("a" -> -1L, "a" -> -2L))
    }
    intercept[IllegalArgumentException] {
      Unigram.encode(docs, Seq("" -> -1L))
    }
  }
}
