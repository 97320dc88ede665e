package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins CorpusOps.jsonIngest's per-row malformed-record policy on
  * hand-built records — the behaviors the generated corpus cannot
  * distinguish (missing fields vs corrupt records vs type mismatches
  * vs NULL input). */
class JsonIngestSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def byId(rows: Seq[(Long, String)]) = {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    CorpusOps.jsonIngest(rows.toDF("doc_id", "json")).collect()
      .map(r => r.getLong(0) -> r).toMap
  }

  test("valid, partial, corrupt, mismatched, and NULL records each take their lane") {
    val rows = Seq(
      1L -> """{"id": 1, "meta": {"lang": "en", "source": "s", "n_chars": 3}, "tags": ["a", "b"], "text": "x y"}""",
      2L -> """{"id": 2}""",                                   // missing fields: valid, NULLs
      3L -> """{"id": 3, "meta": {"lang": "de"}, "tags": [], "text": ""}""", // empty array + empty text
      4L -> """{"id": 4, "tags": ["q"], "text": "unterminated""", // truncated: corrupt
      5L -> "not json at all",                                   // garbage: corrupt
      6L -> """{"id": "six"}""",                                 // type mismatch: corrupt row
      7L -> null                                                  // NULL input
    )
    val m = byId(rows)
    // 1: fully valid
    assert(m(1L).getBoolean(1) && m(1L).getLong(2) == 1L &&
      m(1L).getString(3) == "en" && m(1L).getLong(5) == 2L &&
      m(1L).getString(6) == "a" && m(1L).getLong(7) == 3L)
    // 2: valid json, absent fields are NULL (not corrupt)
    assert(m(2L).getBoolean(1) && m(2L).getLong(2) == 2L && m(2L).isNullAt(3))
    // 3: empty tags -> n_tags 0, tag0 NULL (get() is ANSI-safe);
    //    empty text -> 0 chars
    assert(m(3L).getBoolean(1) && m(3L).getLong(5) == 0L &&
      m(3L).isNullAt(6) && m(3L).getLong(7) == 0L)
    // 4/5: corrupt rows degrade per row — present, invalid, never a throw
    assert(!m(4L).getBoolean(1) && !m(5L).getBoolean(1))
    // 6: a type-mismatched field marks the RECORD corrupt under
    //    PERMISSIVE with a corrupt-record column
    assert(!m(6L).getBoolean(1))
    // 7: NULL input parses to nothing — row present, invalid or all-NULL
    assert(m.contains(7L))
    assert(m.size == 7, "every input row must produce exactly one output row")
  }

  test("fixture wrapper plants exactly the doc_id % 17 corrupt rows") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val out = CorpusOps.jsonIngest(CorpusOps.jsonWrap(docs))
    val bad = out.filter(!col("valid")).select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val want = docs.select(col("doc_id")).collect().map(_.getLong(0))
      .filter(_ % 17 == 0).toSet
    assert(bad == want)
    // valid rows must re-extract their own id (id/payload consistency)
    assert(out.filter(col("valid") && col("jid") =!= col("doc_id")).count() == 0)
  }
}
