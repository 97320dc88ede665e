package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins CorpusOps.exactSubstrSpans against a brute-force substring
  * scan: for every document and position, test whether the k-token
  * window appears verbatim in ANOTHER document, then merge covered
  * windows — the direct reading of the ExactSubstr criterion the
  * operator computes via anchor postings. */
class ExactSubstrSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(docs: Seq[(Long, String)], k: Int) = {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    CorpusOps.exactSubstrSpans(docs.toDF("doc_id", "text"), k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
      .toSet
  }

  /** Direct criterion: mark position p of doc iff tokens[p, p+k) occur
    * in a different document; merge marked windows into maximal spans. */
  private def brute(docs: Seq[(Long, String)], k: Int) = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1) }
    val byGram = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Set[Long]]
    for ((id, ts) <- toks; p <- 0 to ts.length - k) {
      byGram.getOrElseUpdate(ts.slice(p, p + k).mkString(" "),
        scala.collection.mutable.Set.empty[Long]) += id
    }
    toks.flatMap { case (id, ts) =>
      val dupPos = (0 to ts.length - k).filter { p =>
        byGram(ts.slice(p, p + k).mkString(" ")).exists(_ != id)
      }
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
      dupPos.foreach { p =>
        spans.lastOption match {
          // merge while the new window starts at or before the current
          // span end (overlap or touch): p <= lastAnchor + k == e
          case Some((s, e, n)) if p <= e =>
            spans(spans.length - 1) = (s, p + k, n + 1)
          case _ => spans += ((p, p + k, 1))
        }
      }
      spans.map { case (s, e, n) =>
        (id, s.toLong, e.toLong, (e - s).toLong, n.toLong,
          ts.slice(s, e).mkString(" "))
      }
    }.toSet
  }

  test("planted shared substring yields exactly its maximal span in both docs") {
    // docs 1 and 2 share the 8-token run "p q r s t u v w"; k = 4
    val docs = Seq(
      1L -> "a b c p q r s t u v w d e",
      2L -> "x p q r s t u v w y z",
      3L -> "m n o aa bb cc dd ee ff gg")
    val got = run(docs, 4)
    assert(got == Set(
      (1L, 3L, 11L, 8L, 5L, "p q r s t u v w"),
      (2L, 1L, 9L, 8L, 5L, "p q r s t u v w")))
  }

  test("touching windows merge: duplicated anchors k apart fuse into one span") {
    // doc 1 shares "a b c" (pos 0) with doc 2 and "d e f" (pos 3) with
    // doc 3: anchor gap exactly k = 3 -> windows touch -> one 6-token span
    val docs = Seq(
      1L -> "a b c d e f tail1 tail2 tail3",
      2L -> "a b c x1 x2 x3",
      3L -> "y1 y2 y3 d e f")
    val got = run(docs, 3)
    assert(got.contains((1L, 0L, 6L, 6L, 2L, "a b c d e f")), got.toString)
  }

  test("within-doc repeats alone are not cross-document duplication") {
    val docs = Seq(
      1L -> "a b c a b c a b c",
      2L -> "x y z w v u t")
    assert(run(docs, 3).isEmpty)
  }

  test("docs shorter than k tokens carry no anchors and no spans") {
    val docs = Seq(1L -> "a b", 2L -> "a b", 3L -> "c d e f g h")
    assert(run(docs, 3).isEmpty)
  }

  test("brute-force equivalence on a collision-heavy random corpus") {
    // tiny vocabulary forces chance k-gram duplicates and irregular
    // merge patterns — the shape the k = 6 cliff probe measured
    val rnd = new scala.util.Random(23)
    val vocab = Array("a", "b", "c", "d", "e")
    val docs = (1L to 40L).map { i =>
      i -> Array.fill(8 + rnd.nextInt(8))(vocab(rnd.nextInt(5))).mkString(" ")
    }
    val k = 3
    val got = run(docs, k)
    val want = brute(docs, k)
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(want.nonEmpty, "vacuous corpus")
  }

  test("empty corpus and empty text survive") {
    import spark.implicits._
    val none = CorpusOps.exactSubstrSpans(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), 3)
    assert(none.count() == 0)
    assert(run(Seq(1L -> "", 2L -> ""), 3).isEmpty)
  }
}
