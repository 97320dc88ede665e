package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins CorpusOps.normalizeText's kernel on hand cases the generated
  * fixture cannot distinguish: composition vs precomposed input, each
  * raw char map in isolation, accent stripping of precomposed chars,
  * step-order interactions (accent + case together), and the
  * codepoint-counted delta. */
class TextNormSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def norm(texts: (Long, String)*) = {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    CorpusOps.normalizeText(texts.toSeq.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getBoolean(2), r.getLong(3))))
      .toMap
  }

  test("NFC composes a combining acute, then the accent strips away") {
    // decomposed e + U+0301 (10 codepoints) and precomposed U+00E9
    // (9 codepoints) normalize to the same text; only the decomposed
    // form loses a codepoint
    val m = norm(1L -> "Cafe\u0301 menu", 2L -> "Caf\u00e9 menu")
    assert(m(1L) == (("cafe menu", true, 1L)))
    assert(m(2L) == (("cafe menu", true, 0L)))
  }

  test("precomposed uppercase accents strip AND lowercase (step order)") {
    // É -> NFD E + mark -> strip -> E -> lower -> e
    val m = norm(1L -> "\u00c9TAT morne", 2L -> "na\u00efve \u00dcber")
    assert(m(1L) == (("etat morne", true, 0L)))
    assert(m(2L) == (("naive uber", true, 0L)))
  }

  test("each raw char map in isolation: ZWSP/ZWJ/ZWNJ/BOM out, NBSP and tab to space") {
    val m = norm(
      1L -> "zero\u200Bwidth", 2L -> "jo\u200D\u200Cin", 3L -> "\uFEFFbom",
      4L -> "hot\u00A0take", 5L -> "tab\there")
    assert(m(1L) == (("zerowidth", true, 1L)))
    assert(m(2L) == (("join", true, 2L)))
    assert(m(3L) == (("bom", true, 1L)))
    assert(m(4L) == (("hot take", true, 0L)))
    assert(m(5L) == (("tab here", true, 0L)))
  }

  test("whitespace runs collapse and edges trim; delta counts codepoints") {
    val m = norm(
      1L -> "  a   b  ", 2L -> "already clean", 3L -> "",
      4L -> "UPPER Case")
    assert(m(1L) == (("a b", true, 6L)))
    assert(m(2L) == (("already clean", false, 0L)))
    assert(m(3L) == (("", false, 0L)))
    assert(m(4L) == (("upper case", true, 0L)))
  }

  test("null text routes through the empty-string coalesce") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Some("ok"))).toDF("doc_id", "text")
    val m = CorpusOps.normalizeText(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "" && m(2L) == "ok")
  }
}
