package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Anchor-join phrase search vs a brute-force sliding-window count:
  * overlapping occurrences, repeated-word phrases (the lane where a
  * naive "count matched words" check over-fires), zero-hit phrases,
  * and a seeded random corpus sweep. */
class SearchSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("search-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def brute(docs: Seq[(Long, String)],
                    phrases: Seq[String]): Map[(String, Long), Long] = {
    val out = scala.collection.mutable.Map.empty[(String, Long), Long]
    for ((id, text) <- docs; p <- phrases) {
      val t = text.split(" ")
      val w = p.split(" ")
      val hits = (0 to t.length - w.length)
        .count(i => w.indices.forall(k => t(i + k) == w(k)))
      if (hits > 0) out((p, id)) = hits.toLong
    }
    out.toMap
  }

  private def run(docs: Seq[(Long, String)],
                  phrases: Seq[String]): Map[(String, Long), Long] = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val df = docs.toDF("doc_id", "text")
    Search.phraseSearch(spark, Search.positionalIndex(df), phrases)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("overlapping and repeated-word phrases count per anchor") {
    val docs = Seq(
      1L -> "batch batch batch batch",      // "batch batch batch" x2 (overlap)
      2L -> "a the a the a",                // "a the a" x2 (overlap)
      3L -> "x y z")
    val got = run(docs, Seq("batch batch batch", "a the a", "y z", "z y"))
    assert(got(("batch batch batch", 1L)) === 2L)
    assert(got(("a the a", 2L)) === 2L)
    assert(got(("y z", 3L)) === 1L)
    assert(!got.contains(("z y", 3L))) // order matters
    assert(got.size === 3)
  }

  test("partial word hits never fire: all-but-one matched is no match") {
    // doc has "hash join sort" — phrase "hash join merge" shares 2 of 3
    val got = run(Seq(1L -> "hash join sort"), Seq("hash join merge"))
    assert(got.isEmpty)
  }

  test("seeded random corpus equals the sliding-window brute force") {
    val rnd = new Random(77)
    val vocab = Vector("a", "b", "c", "d")
    val docs = (0L until 50L).map { id =>
      id -> Seq.fill(3 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    val phrases = Seq("a b", "b b", "c a d", "a a a", "d")
    assert(run(docs, phrases) === brute(docs, phrases))
  }

  test("malformed phrases are rejected up front") {
    import spark.implicits._
    val idx = Search.positionalIndex(Seq(1L -> "a b").toDF("doc_id", "text"))
    intercept[IllegalArgumentException] {
      Search.phraseSearch(spark, idx, Seq("a  b"))
    }
    intercept[IllegalArgumentException] {
      Search.phraseSearch(spark, idx, Seq(" a"))
    }
    intercept[IllegalArgumentException] {
      Search.phraseSearch(spark, idx, Seq.empty)
    }
  }
}
