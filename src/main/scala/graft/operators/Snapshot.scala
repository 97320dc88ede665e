package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the bookkeeping pass every recurring-crawl
  * pipeline runs between refreshes: which documents appeared,
  * disappeared, or changed content since the last snapshot. Downstream
  * consumers re-process ONLY the added/changed set (incremental dedup,
  * re-embedding, re-scoring), so the diff is the gate that turns a
  * full-corpus pipeline into an incremental one.
  *
  * Shape: ONE full outer join on the identity key with both sides
  * reduced to (id, fingerprint) projections first — the join moves two
  * id+hash columns, never document bodies, and both sides hash-shuffle
  * once on the same key (co-partitioned merge). Content equality is
  * md5-fingerprint equality, the repo-wide exact-dedup convention
  * ([[Dedup]]).
  */
object Snapshot {

  /** `(doc_id, status)` over the union of ids, status in
    * {added, removed, changed, unchanged} — `added` = only in `b`,
    * `removed` = only in `a`, `changed` = in both with differing
    * fingerprints. */
  def diff(a: DataFrame, b: DataFrame, idCol: String = "doc_id",
           textCol: String = "text"): DataFrame = {
    // presence is a flag per side, NOT fingerprint nullity: a present
    // row with NULL text has a NULL md5, and reading that as "absent"
    // would label it added/removed while the SQL-oracle CASE (where
    // NULL <> x falls through to unchanged) keeps it present
    def fp(df: DataFrame, h: String, in: String) = df
      .select(col(idCol).cast("long").as(idCol),
        md5(col(textCol).cast("binary")).as(h), lit(true).as(in))
      .filter(col(idCol).isNotNull)
    val j = fp(a, "a_fp", "a_in")
      .join(fp(b, "b_fp", "b_in"), Seq(idCol), "full_outer")
    j.select(col(idCol),
      when(col("a_in").isNull, lit("added"))
        .when(col("b_in").isNull, lit("removed"))
        .when(col("a_fp") =!= col("b_fp"), lit("changed"))
        .otherwise(lit("unchanged")).as("status"))
  }

  /** Cross-snapshot CONTENT dedup — the other half of incremental
    * ingestion next to the id-keyed [[diff]]: an arriving document
    * whose CONTENT already exists in the historical corpus under ANY
    * id (a re-hosted page, a mirror, a boilerplate clone) is a
    * duplicate even though its id is new. One distinct fingerprint
    * projection over history + one co-partitioned LEFT SEMI-shaped
    * join on the fp — only (id, md5) pairs shuffle, and history keeps
    * ONE row per distinct content regardless of how duplicated it is
    * (the distinct is the skew gate: a million-copy boilerplate page
    * is one fp row). Output: `(doc_id, fresh)` per incoming doc. */
  def contentDedup(history: DataFrame, incoming: DataFrame,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val seen = history
      .select(md5(col(textCol).cast("binary")).as("fp"))
      .filter(col("fp").isNotNull)
      .distinct()
      .withColumn("seen", lit(true))
    incoming
      .select(col(idCol).cast("long").as(idCol),
        md5(col(textCol).cast("binary")).as("fp"))
      .filter(col(idCol).isNotNull)
      .join(seen, Seq("fp"), "left")
      .select(col(idCol), col("seen").isNull.as("fresh"))
  }

  /** Deterministic "re-hosted + fresh" arrival batch over the documents
    * fixture: doc_id % 13 == 1 pages REAPPEAR verbatim under
    * id + 2000000 (the mirror lane — content dedup must catch them),
    * doc_id % 13 == 2 pages arrive with genuinely new text (the fresh
    * lane). */
  def rehostWrap(docs: DataFrame): DataFrame = {
    val mirrored = docs.filter(col("doc_id") % 13 === 1)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    val fresh = docs.filter(col("doc_id") % 13 === 2)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        concat(lit("unseen page about topic "), col("doc_id").cast("string"))
          .as("text"))
    mirrored.unionByName(fresh)
  }

  /** Deterministic "next crawl" snapshot over the documents fixture
    * (the jsonWrap convention): doc_id % 23 == 0 pages vanish,
    * doc_id % 7 == 3 pages change content, and each doc_id % 11 == 5
    * page spawns a NEW page at id + 1000000 — all four diff lanes
    * non-vacuous at every scale. */
  def nextSnapshot(docs: DataFrame): DataFrame = {
    val kept = docs
      .filter(col("doc_id") % 23 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 3, concat(col("text"), lit(" updated content")))
          .otherwise(col("text")).as("text"))
    val added = docs
      .filter(col("doc_id") % 11 === 5)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("new page for "), col("doc_id").cast("string")).as("text"))
    kept.unionByName(added)
  }
}
