package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins CorpusOps.csvIngest's RFC 4180 parsing decisions on hand
  * cases the generated fixture cannot distinguish: quote recovery,
  * embedded separators, doubled quotes, token-count gating (both too
  * few and too many), type-cast failures, and the nulled-field policy
  * on invalid rows. */
class CsvIngestSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ingest(lines: (Long, String)*) = {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    CorpusOps.csvIngest(lines.toSeq.toDF("doc_id", "line")).collect()
      .map { r =>
        r.getLong(0) -> ((r.getBoolean(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) null else r.getString(3),
          if (r.isNullAt(6)) -1L else r.getLong(6)))
      }.toMap
  }

  test("a plain record parses; quoted text recovers commas and doubled quotes") {
    val m = ingest(
      1L -> "1,en,src0,10,\"plain text\"",
      2L -> "2,fr,src1,20,\"with, comma\"",
      3L -> "3,de,src2,30,\"say \"\"hi\"\" now\"")
    assert(m(1L) == ((true, 1L, "en", 10L)))
    assert(m(2L) == ((true, 2L, "fr", 11L)))  // 'with, comma'
    assert(m(3L) == ((true, 3L, "de", 12L)))  // 'say "hi" now'
  }

  test("wrong token counts are the malformed lane: valid=false, fields nulled") {
    val m = ingest(
      1L -> "1,en,src",
      2L -> "2,en,src0,40,\"ok text\"",
      3L -> "3,en,src0,40,\"x\",extra,stuff")
    assert(m(1L) == ((false, -1L, null, -1L)))
    assert(m(2L) == ((true, 2L, "en", 7L)))
    assert(m(3L) == ((false, -1L, null, -1L)))
  }

  test("a type-cast failure poisons the row, not the job") {
    val m = ingest(
      1L -> "notanumber,en,src0,10,\"x\"",
      2L -> "2,en,src0,notanumber,\"x\"")
    assert(m(1L)._1 == false && m(2L)._1 == false)
  }

  test("empty and null lines are invalid rows, not aborts (explicit gate: univocity leaves them uncorrupted)") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Some("")),
      (3L, Some("3,en,src0,5,\"t\""))).toDF("doc_id", "line")
    val m = CorpusOps.csvIngest(df).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(m == Map(1L -> false, 2L -> false, 3L -> true))
  }
}
