package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins CorpusOps.luhnScrub's scanner + checksum on hand cases: known
  * Luhn vectors, separator grouping, length gating, multiple runs per
  * row, and boundary shapes the generated fixture (one card per doc)
  * cannot distinguish. */
class LuhnScrubSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def scrub(texts: (Long, String)*) = {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    CorpusOps.luhnScrub(texts.toSeq.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("luhnValid agrees with the published test vectors") {
    def v(s: String) = CorpusOps.luhnValid(s.map(_ - '0').toArray)
    assert(v("79927398713"))        // the canonical Luhn example
    assert(!v("79927398710") && !v("79927398711") && !v("79927398712"))
    assert(v("4532015112830366"))   // a classic valid 16-digit visa vector
    assert(!v("4532015112830367"))
    assert(v("378282246310005"))    // 15-digit amex vector
  }

  test("valid cards redact; checksum failures and sub-length runs stay") {
    val m = scrub(
      1L -> "pay 4532015112830366 now",          // valid 16 -> redacted
      2L -> "pay 4532015112830367 now",          // invalid 16 -> kept, rejected
      3L -> "ref 12345 and year 2024 ok",        // sub-length -> untouched
      4L -> "id 45320151128303660000000000 x")   // 26 digits: not a candidate
    assert(m(1L) == (("pay <CARD> now", 1L, 0L)))
    assert(m(2L) == (("pay 4532015112830367 now", 0L, 1L)))
    assert(m(3L) == (("ref 12345 and year 2024 ok", 0L, 0L)))
    assert(m(4L) == (("id 45320151128303660000000000 x", 0L, 0L)))
  }

  test("dash and space groupings scan as one candidate; the separator span redacts whole") {
    val m = scrub(
      1L -> "card 4532-0151-1283-0366 thanks",
      2L -> "card 4532 0151 1283 0366 thanks",
      3L -> "card 4532--0151 thanks")             // double separator splits the run
    assert(m(1L) == (("card <CARD> thanks", 1L, 0L)))
    assert(m(2L) == (("card <CARD> thanks", 1L, 0L)))
    assert(m(3L)._2 == 0L && m(3L)._1 == "card 4532--0151 thanks")
  }

  test("multiple runs per row count independently; edges and empty rows survive") {
    val m = scrub(
      1L -> "a 4532015112830366 b 4532015112830367 c 378282246310005",
      2L -> "4532015112830366",                    // card IS the whole row
      3L -> "",
      4L -> null.asInstanceOf[String])
    assert(m(1L) == (("a <CARD> b 4532015112830367 c <CARD>", 2L, 1L)))
    assert(m(2L) == (("<CARD>", 1L, 0L)))
    assert(m(3L) == (("", 0L, 0L)))
    assert(m(4L) == (("", 0L, 0L)))
  }

  test("fixture wrapper: exactly the doc_id % 3 == 0 docs carry one counted run") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val out = CorpusOps.luhnScrub(CorpusOps.cardWrap(docs))
    val counted = out.filter(col("n_cards") + col("n_rejected") =!= 0)
    assert(counted.filter(col("doc_id") % 3 =!= 0).count() == 0)
    assert(counted.count() ==
      docs.filter(col("doc_id") % 3 === 0).count())
    // the 5-digit decoy never redacts: every planted doc keeps 'ref 12345'
    assert(out.filter(col("doc_id") % 3 === 0 &&
      !col("clean_text").contains("ref 12345 ok")).count() == 0)
  }
}
