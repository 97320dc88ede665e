package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF document similarity: corpus-weighted sparse vectors over the
  * token vocabulary, and an EXACT cosine-threshold all-pairs join with a
  * suffix-norm prefix filter (the AllPairs family — Bayardo, Ma, Srikant,
  * WWW'07) so the candidate set shrinks with the threshold instead of
  * degenerating to every token-sharing pair.
  *
  * Set-based similarity (Dedup.jaccardJoin) treats every token equally;
  * TF-IDF is the other canonical text-similarity modality — corpus
  * statistics downweight boilerplate — and its prefix filter prunes by
  * WEIGHT mass, not set size, so the two operators cover different
  * corpora. Weights, norms, and the final cosine are plain relational
  * aggregations (DuckDB-oracle-checkable, identical arithmetic shape:
  * dot of raw weights divided by the two norms); the filter is
  * Spark-internal and provably recall-free (spec-checked against the
  * unfiltered join).
  */
object TfIdf {

  /** Smoothed tf-idf weights per (document, token):
    * w = tf * (ln((N+1)/(df+1)) + 1), tf = in-document count, df = number
    * of documents containing the token. One data-sized shuffle (the
    * (id, tok) count); df is a vocabulary-sized aggregate joined back on
    * the token. `numDocs` arrives as a parameter so callers amortize the
    * one O(1)-result count action across uses. */
  def weights(docs: DataFrame, numDocs: Long, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col("id"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).cast("double").as("df"))
    tf.join(df, "tok")
      .select(col("id"), col("tok"), col("df"),
        (col("tf") * (log(lit(numDocs + 1.0) / (col("df") + 1.0)) + 1.0)).as("w"))
  }

  /** All document pairs with tf-idf cosine similarity >= tau, exact.
    *
    * Candidate generation indexes only each document's weight-heavy
    * tokens: order features by (df desc, tok) — commonest first — and
    * leave in the un-indexed suffix the longest run whose normalized
    * norm stays below tau. For a qualifying pair, the suffix alone
    * cannot reach tau (Cauchy-Schwarz: dot over the suffix is at most
    * its norm), so every such pair shares an INDEXED token of each side
    * and the index-to-full-postings equijoin has perfect recall. High-df
    * tokens carry low idf weight, so exactly the skew-heavy postings
    * are the ones the filter drops from the index.
    *
    * Shuffle shape: ids-only candidate join (the filter state is one
    * cumulative-sum window per document), candidates deduplicated before
    * any arithmetic, weights re-attached by id-equijoin, one partial-agg
    * sum per surviving pair. No driver-side data, no cartesian.
    */
  def cosineJoin(spark: SparkSession, docs: DataFrame, tau: Double,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau $tau outside (0, 1]")
    val n = docs.count()
    val w = weights(docs, n, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val norms = w.groupBy(col("id"))
        .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      // cumulative normalized mass, commonest token first; a feature is
      // indexed once the running norm can no longer be hidden below tau
      val cum = w.join(norms, "id")
        .withColumn("u2",
          (col("w") / col("nrm")) * (col("w") / col("nrm")))
        .withColumn("cum", sum(col("u2")).over(
          Window.partitionBy(col("id")).orderBy(col("df").desc, col("tok"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // the -1e-9 slack absorbs FP noise in the cumulative sum so a pair
      // sitting exactly on the threshold can never be lost to rounding
      val index = cum.filter(col("cum") >= lit(tau * tau - 1e-9))
        .select(col("id"), col("tok"))
      val full = w.select(col("id").as("idb"), col("tok"))
      val cands = index.join(full, "tok")
        .filter(col("id") =!= col("idb"))
        .select(least(col("id"), col("idb")).as("rid"),
          greatest(col("id"), col("idb")).as("sid"))
        .dropDuplicates("rid", "sid")
      val dots = cands
        .join(w.select(col("id").as("rid"), col("tok"), col("w").as("wa")), "rid")
        .join(w.select(col("id").as("sid"), col("tok"), col("w").as("wb")),
          Seq("sid", "tok"))
        .groupBy(col("rid"), col("sid"))
        .agg(sum(col("wa") * col("wb")).as("dot"))
      val result = dots
        .join(norms.select(col("id").as("rid"), col("nrm").as("na")), "rid")
        .join(norms.select(col("id").as("sid"), col("nrm").as("nb")), "sid")
        .withColumn("cosine", col("dot") / (col("na") * col("nb")))
        .filter(col("cosine") >= tau)
        .select(col("rid"), col("sid"), col("cosine"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      result.count() // O(pairs); lets the data-sized weights cache go now
      result
    } finally {
      w.unpersist(false)
    }
  }
}
