package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins Dedup.paragraphDedup's first-occurrence rule on hand-built
  * corpora: global (doc_id, position) ordering, within-doc duplicate
  * paragraphs, fully-duplicated documents, and agreement with a
  * brute-force reimplementation on a generated corpus. */
class ParaDedupSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(docs: (Long, String)*) = {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Dedup.paragraphDedup(docs.toSeq.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("the globally first occurrence survives; later copies drop") {
    val m = run(
      1L -> "alpha prose\nshared footer",
      2L -> "shared footer\nbeta prose",
      3L -> "gamma prose\nshared footer\ndelta prose")
    assert(m(1L) == (("alpha prose\nshared footer", 2L, 0L)))
    assert(m(2L) == (("beta prose", 1L, 1L)))
    assert(m(3L) == (("gamma prose\ndelta prose", 2L, 1L)))
  }

  test("within-doc duplicates: the earlier position wins, the later drops") {
    val m = run(1L -> "same para\nmiddle\nsame para")
    assert(m(1L) == (("same para\nmiddle", 2L, 1L)))
  }

  test("a fully-duplicated document empties; single-paragraph docs pass") {
    val m = run(
      1L -> "only para",
      2L -> "only para",
      3L -> "fresh text")
    assert(m(1L) == (("only para", 1L, 0L)))
    assert(m(2L) == (("", 0L, 1L)))
    assert(m(3L) == (("fresh text", 1L, 0L)))
  }

  test("mega-doc hot key: 100k paragraphs in one document complete with analytic counts") {
    import spark.implicits._
    // doc 0 carries 100k paragraphs, each repeated once within the doc
    // (the reassembly aggregation holds one doc's paragraphs — the
    // data-model bound this probe exercises); doc 1 repeats a slice of
    // doc 0 and must empty entirely
    val n = 100000
    val text0 = (0 until n).map(i => s"para ${i % (n / 2)}").mkString("\n")
    val text1 = (0 until 1000).map(i => s"para $i").mkString("\n")
    val out = Dedup.paragraphDedup(
        Seq((0L, text0), (1L, text1)).toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == ((n / 2L, n / 2L)))
    assert(out(1L) == ((0L, 1000L)))
  }

  test("agrees with a brute-force first-occurrence scan on a generated corpus") {
    val docs = (0L until 60L).map { id =>
      val paras = Seq(
        Some(s"body text of document ${id % 23}"), // some cross-doc dups
        if (id % 3 == 0) Some("boilerplate subscribe block") else None,
        if (id % 4 == 1) Some(s"footer variant ${id % 5}") else None,
        Some(s"unique trailer $id")).flatten
      id -> paras.mkString("\n")
    }
    // brute force: first occurrence by (doc_id, pno)
    val seen = scala.collection.mutable.Set.empty[String]
    val expect = docs.map { case (id, t) =>
      val ps = t.split("\n", -1)
      val kept = ps.filter(p => seen.add(p))
      id -> ((kept.mkString("\n"), kept.length.toLong,
        (ps.length - kept.length).toLong))
    }.toMap
    assert(run(docs: _*) == expect)
  }
}
