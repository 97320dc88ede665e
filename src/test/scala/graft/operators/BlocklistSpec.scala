package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Aho–Corasick vs brute-force all-position substring counting: nested
  * dictionary entries, self-overlapping patterns, and a seeded random
  * sweep over a small alphabet (the worst case for fail-link bugs —
  * dense self-overlap everywhere). */
class BlocklistSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("blocklist-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def bruteCount(text: String, pat: String): Long =
    (0 to text.length - pat.length)
      .count(i => text.regionMatches(i, pat, 0, pat.length)).toLong

  test("automaton counts equal brute force on hand lanes") {
    val ac = new Blocklist.AhoCorasick(
      Array("join", "join order", "batch batch", "aa"))
    val texts = Seq(
      "join order by join",          // nested: join x2, join order x1
      "batch batch batch",           // self-overlap: batch batch x2
      "aaaa",                        // aa x3 (all positions)
      "",                            // nothing
      "jo in orde r")                // near-misses only
    for (t <- texts) {
      val got = ac.countAll(t)
      for ((p, i) <- ac.patterns.zipWithIndex)
        assert(got(i) === bruteCount(t, p), s"pattern '$p' on '$t'")
    }
  }

  test("seeded random corpus over a 2-char alphabet equals brute force") {
    val rnd = new Random(99)
    val ac = new Blocklist.AhoCorasick(
      Array("a", "ab", "ba", "aba", "bab", "aaa", "abab"))
    for (_ <- 1 to 200) {
      val t = Seq.fill(1 + rnd.nextInt(40))(if (rnd.nextBoolean()) 'a' else 'b')
        .mkString
      val got = ac.countAll(t)
      for ((p, i) <- ac.patterns.zipWithIndex)
        assert(got(i) === bruteCount(t, p), s"pattern '$p' on '$t'")
    }
  }

  test("matchCounts emits only positive rows and skips null text") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val docs = Seq((1L, "x join y"), (2L, "nothing here"), (3L, null))
      .toDF("doc_id", "text")
    val got = Blocklist.matchCounts(spark, docs, Seq("join", "zebra"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set((1L, "join", 1L)))
  }

  test("bad dictionaries are rejected up front") {
    intercept[IllegalArgumentException] {
      new Blocklist.AhoCorasick(Array.empty[String])
    }
    intercept[IllegalArgumentException] {
      new Blocklist.AhoCorasick(Array("a", ""))
    }
    intercept[IllegalArgumentException] {
      new Blocklist.AhoCorasick(Array("dup", "dup"))
    }
  }
}
