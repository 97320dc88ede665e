package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Positional inverted index + phrase search — the retrieval shape a
  * corpus pipeline needs for decontamination-by-query, targeted
  * inspection ("show me every document containing this exact phrase"),
  * and eval-leak auditing, where rescanning 100 TB of raw text per
  * query is not an option.
  *
  * The index is the classic IR posting list WITH positions:
  * `(token, doc_id, pos)` — built in one exploded projection (no
  * shuffle; at deployment scale it is written bucketed by token so
  * query-time joins prune to the terms' buckets).
  *
  * Phrase matching is the anchor-join: occurrence of phrase word k at
  * position p votes for an anchor p-k; an anchor that collects ALL m
  * distinct k's is a full occurrence. One broadcast join (the phrase
  * word list is query-sized) + ONE wide shuffle keyed by
  * (phrase, doc, anchor) with map-side partial aggregation — no
  * m-way self-join of the posting lists, no per-phrase rescan of the
  * corpus, and repeated words inside a phrase fall out naturally
  * (each k votes separately).
  */
object Search {

  /** `(token, doc_id, pos)` postings over a whitespace-tokenized text
    * column — positions are 0-based. */
  def positionalIndex(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "token")))
      .select(col("token"), col("doc_id"), col("pos").cast("long").as("pos"))

  /** Exact-phrase hit counts per document: `(phrase, doc_id, hits)`,
    * docs with zero hits absent. Overlapping occurrences count — each
    * anchor is a distinct occurrence.
    *
    * PRECONDITION (default `uniquePostings = true`): `index` has at
    * most one row per `(token, doc_id, pos)` — [[positionalIndex]]
    * guarantees it by construction. The anchor vote count is then
    * `count(*)`, one Exchange cheaper than the distinct form. An
    * index with duplicate postings would inflate `nk` past `m` and
    * the `nk === m` filter would silently DROP real occurrences —
    * callers with an unvetted index must pass
    * `uniquePostings = false` to get the duplicate-safe
    * `count(DISTINCT k)` vote (same answer, one extra shuffle). */
  def phraseSearch(spark: SparkSession, index: DataFrame,
                   phrases: Seq[String],
                   uniquePostings: Boolean = true): DataFrame = {
    require(phrases.nonEmpty, "phraseSearch: no phrases")
    require(phrases.forall(p => p.trim == p && p.nonEmpty && !p.contains("  ")),
      s"phraseSearch: phrases must be single-space-joined tokens: $phrases")
    import spark.implicits._
    val words = phrases.flatMap { p =>
      val ws = p.split(" ")
      ws.zipWithIndex.map { case (w, k) => (p, ws.length.toLong, k.toLong, w) }
    }
    val wordsDf = words.toDF("phrase", "m", "k", "token")
    val votes = index
      .join(broadcast(wordsDf), Seq("token"))
      .select(col("phrase"), col("m"), col("doc_id"),
        (col("pos") - col("k")).as("anchor"), col("k"))
      .filter(col("anchor") >= 0)
    // count(*) == count(DISTINCT k) under the uniquePostings
    // precondition: postings unique per (token, doc, pos) and
    // pos = anchor + k mean a (phrase, doc, anchor, k) cell receives
    // at most ONE vote — the distinct form costs a whole extra
    // Exchange (the dedup pre-agg) for nothing (measured: 3 shuffles
    // -> 2, hashes unchanged). Unvetted indexes take the distinct
    // path, which is duplicate-safe by definition.
    val vote =
      if (uniquePostings) count(lit(1)) else countDistinct(col("k"))
    val occurrences = votes
      .groupBy(col("phrase"), col("m"), col("doc_id"), col("anchor"))
      .agg(vote.as("nk"))
      .filter(col("nk") === col("m"))
    occurrences
      .groupBy(col("phrase"), col("doc_id"))
      .agg(count(lit(1)).as("hits"))
  }
}
