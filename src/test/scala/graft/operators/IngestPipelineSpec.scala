package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the q_ingest_pipeline stage INTERFACES (what no per-operator
  * oracle checks): the parse lane drops exactly the truncated records,
  * the scrub lane touches exactly the planted-card docs, and the gate
  * demonstrably consumes the SCRUBBED text. */
class IngestPipelineSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("parse, scrub, and gate lanes compose with the declared interfaces") {
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("q_ingest_pipeline")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val allIds = graft.sources.Fixtures.documents(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet

    // parse lane: exactly the doc_id % 17 truncated records are absent
    assert(allIds -- out.keySet == allIds.filter(_ % 17 == 0))

    // scrub lane: card evidence appears exactly on surviving % 3 == 0
    // docs, one counted run each, and n_cards + n_rejected == 1 there
    out.foreach { case (id, (_, _, cards, rejected, _)) =>
      if (id % 3 == 0) assert(cards + rejected == 1L, s"doc $id")
      else assert(cards == 0L && rejected == 0L, s"doc $id")
    }
    assert(out.exists(_._2._3 > 0), "some card must pass Luhn")
    assert(out.exists(_._2._4 > 0), "some card must fail Luhn")

    // gate consumes the SCRUBBED text: a redacted doc's token count must
    // equal the gate's n_tokens recomputed over its clean text — checked
    // via clean_chars: redaction shrinks the card span (16+ chars + 3
    // separators) to '<CARD>' (6), so clean_chars < the carded length
    val carded = CorpusOps.cardWrap(
        graft.sources.Fixtures.documents(spark, dir))
      .select(col("doc_id"), length(col("text")).cast("long").as("raw_len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, (_, _, cards, _, cleanChars)) =>
      if (cards > 0) assert(cleanChars < carded(id), s"doc $id not shrunk")
      else assert(cleanChars == carded(id), s"doc $id changed without redaction")
    }

    // non-vacuous gate: both verdicts occur
    assert(out.exists(_._2._1) && out.exists(!_._2._1),
      "gate must pass AND fail somewhere")
  }
}
