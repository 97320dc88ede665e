package graft.operators

import graft.core.Caching._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF document similarity: corpus-weighted sparse vectors over the
  * token vocabulary, and an EXACT cosine-threshold all-pairs join.
  *
  * Set-based similarity (Dedup.jaccardJoin) treats every token equally;
  * TF-IDF is the other canonical text-similarity modality — corpus
  * statistics downweight boilerplate. Two execution paths, chosen by a
  * bounded vocabulary probe (the jaccardJoin precedent):
  *
  * - DENSE (vocabulary fits the probe): a tiny vocabulary means every
  *   document shares tokens with most others, so posting-list pruning is
  *   hopeless by construction — token-equijoin shapes degenerate to a
  *   sum-of-df-squared-row shuffle. Instead, embed each document as a
  *   vocabulary-sized dense tf-idf vector (gate-bounded length) and run
  *   the blocked exact all-pairs kernel (Ann.cosineAllPairsBlocked):
  *   block-pair tasks compute dots in primitive loops and emit ONLY
  *   qualifying pairs — the quadratic work parallelizes without any
  *   pair-sized shuffle.
  * - SPARSE (real corpora): a suffix-norm prefix filter (the AllPairs
  *   family — Bayardo, Ma, Srikant, WWW'07). Order each document's
  *   features commonest-first and leave un-indexed the longest run whose
  *   normalized norm stays below tau: for a qualifying pair the suffix
  *   alone cannot reach tau (Cauchy-Schwarz), so every such pair shares
  *   an INDEXED token of each side and the index-to-full-postings
  *   equijoin has perfect recall. High-df tokens carry low idf weight, so
  *   exactly the skew-heavy postings drop out of the index.
  *
  * Weights, norms, and the final cosine keep the same arithmetic shape in
  * both paths and in the DuckDB oracle (dot of raw tf-idf weights divided
  * by the two norms); path choice cannot change the result (spec-checked:
  * both paths against each other and against the unfiltered join).
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
    val tf = CorpusOps.widen(docs)
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
    * Shuffle shape (both paths): no driver-side data, no cartesian.
    * Dense path: vocabulary-sized dimension broadcast, one groupBy(id) to
    * assemble vectors, then block-pair tasks (output-sized result only).
    * Sparse path: ids-only candidate join (the filter state is one
    * cumulative-sum window per document), candidates deduplicated before
    * any arithmetic, weights re-attached by id-equijoin.
    *
    * @param denseVocabMax take the dense path when the vocabulary has at
    *        most this many tokens (bounded `limit` probe, nothing
    *        data-sized reaches the driver); 0 forces the sparse path.
    */
  def cosineJoin(spark: SparkSession, docs: DataFrame, tau: Double,
                 idCol: String = "doc_id", textCol: String = "text",
                 denseVocabMax: Int = 4096): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau $tau outside (0, 1]")
    val n = docs.count()
    val w = weights(docs, n, idCol, textCol)
      .persistOnce()
    try {
      val raw =
        if (denseVocabMax > 0 &&
            w.select(col("tok")).distinct().limit(denseVocabMax + 1).count()
              <= denseVocabMax) {
          // dense path: intern tokens to 1-based positions in the (gate-
          // bounded) vocabulary, assemble per-document dense vectors, and
          // let the blocked kernel do the quadratic part shuffle-free.
          // The gate just proved the vocabulary fits the driver, so the id
          // assignment is a sorted collect + local relation — the
          // row_number-over-unpartitioned-window alternative plans a
          // single-partition WindowExec (and warns about it) for the same
          // bounded work
          import spark.implicits._
          val vocab = w.select(col("tok")).distinct().orderBy(col("tok"))
            .collect().map(_.getString(0))
          val vocabSize = vocab.length
          val tokIds = vocab.zipWithIndex
            .map { case (t, i) => (t, i + 1) }.toSeq.toDF("tok", "tid")
          val dense = w.join(broadcast(tokIds), "tok")
            .groupBy(col("id"))
            .agg(map_from_entries(collect_list(struct(col("tid"), col("w"))))
              .as("m"))
            .select(col("id"),
              transform(sequence(lit(1), lit(vocabSize)),
                i => coalesce(element_at(col("m"), i), lit(0.0))).as("v"))
          Ann.cosineAllPairsBlocked(spark, dense, tau, idCol = "id", vecCol = "v")
        } else {
          // sparse path: cumulative normalized mass, commonest token
          // first; a feature is indexed once the running norm can no
          // longer be hidden below tau. The -1e-9 slack absorbs FP noise
          // in the cumulative sum so a pair sitting exactly on the
          // threshold can never be lost to rounding.
          val norms = w.groupBy(col("id"))
            .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
          val cum = w.join(norms, "id")
            .withColumn("u2",
              (col("w") / col("nrm")) * (col("w") / col("nrm")))
            .withColumn("cum", sum(col("u2")).over(
              Window.partitionBy(col("id")).orderBy(col("df").desc, col("tok"))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          val index = cum.filter(col("cum") >= lit(tau * tau - 1e-9))
            .select(col("id"), col("tok"))
          val full = w.select(col("id").as("idb"), col("tok"))
          val cands = index.join(full, "tok")
            .filter(col("id") =!= col("idb"))
            .select(least(col("id"), col("idb")).as("rid"),
              greatest(col("id"), col("idb")).as("sid"))
            .dropDuplicates("rid", "sid")
          cands
            .join(w.select(col("id").as("rid"), col("tok"), col("w").as("wa")),
              "rid")
            .join(w.select(col("id").as("sid"), col("tok"), col("w").as("wb")),
              Seq("sid", "tok"))
            .groupBy(col("rid"), col("sid"))
            .agg(sum(col("wa") * col("wb")).as("dot"))
            .join(norms.select(col("id").as("rid"), col("nrm").as("na")), "rid")
            .join(norms.select(col("id").as("sid"), col("nrm").as("nb")), "sid")
            .withColumn("cosine", col("dot") / (col("na") * col("nb")))
            .filter(col("cosine") >= tau)
        }
      val result = raw.select(col("rid"), col("sid"), col("cosine"))
        .persistOnce()
      result.count() // O(pairs); lets the data-sized weights cache go now
      result
    } finally {
      w.unpersist(false)
    }
  }
}
