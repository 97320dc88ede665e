package graft.operators

import graft.core.Caching._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
      // Bounded vocabulary probe and dense-path vocabulary collection in
      // ONE action: TakeOrdered over the distinct tokens with a
      // denseVocabMax+1 cap. The cap keeps it driver-safe on real corpora
      // (at most max+1 rows ever reach the driver, a per-partition heap
      // distributed-side), and when the vocabulary fits, the collected
      // rows ARE the sorted vocabulary — the former separate
      // distinct().limit().count() gate plus distinct().orderBy().collect()
      // doubled the job for no information.
      val vocabProbe: Array[String] =
        if (denseVocabMax > 0)
          w.select(col("tok")).distinct().orderBy(col("tok"))
            .limit(denseVocabMax + 1).collect().map(_.getString(0))
        else Array.empty
      val raw =
        if (denseVocabMax > 0 && vocabProbe.length <= denseVocabMax) {
          // dense path: intern tokens to 1-based positions in the (gate-
          // bounded) vocabulary, assemble per-document dense vectors, and
          // let the blocked kernel do the quadratic part shuffle-free.
          // The gate just proved the vocabulary fits the driver, so the id
          // assignment is a sorted collect + local relation — the
          // row_number-over-unpartitioned-window alternative plans a
          // single-partition WindowExec (and warns about it) for the same
          // bounded work
          import spark.implicits._
          val vocab = vocabProbe
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
          // block count derived from the known document count (n, an
          // upper bound on dense rows): saves the kernel's internal
          // count() action; blocking is hash-based so the block count
          // never changes which pairs meet, only task sizing
          Ann.cosineAllPairsBlocked(spark, dense, tau,
            numBlocks = math.max(1, ((n + 4095) / 4096).toInt),
            idCol = "id", vecCol = "v")
        } else {
          val norms = w.groupBy(col("id"))
            .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
          val cands = sparseCandidates(w, norms, tau)
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

  /** Sparse-path candidate pairs: cumulative normalized mass, commonest
    * token first; a feature is indexed once the running prefix bound
    * can no longer hide a qualifying pair below tau. The -1e-9 slacks
    * absorb FP noise in the cumulative sums so a pair sitting exactly
    * on the threshold can never be lost to rounding. Package-private so
    * ScalingStats measures the SAME candidate derivation the join
    * executes.
    *
    * MARGIN INDEXING + EVIDENCE FILTER (the rare-suffix-collision fix
    * — PPJoin's insight re-expressed as one aggregation):
    *
    * Index a margin DEEPER than the filter needs: un-indexed prefix
    * mass stays < (tau - m)^2 instead of tau^2 (m = EvidenceMargin).
    * For a qualifying pair the un-indexed prefix can then hide at most
    * tau - m of the dot (Cauchy-Schwarz), so its shared INDEXED tokens
    * must carry >= m of it — and each indexed row already carries a
    * cheap upper bound on its possible contribution, contrib =
    * u_a(t) * mw(t) (mw = corpus max normalized weight of t, one
    * vocab-sized aggregate). Summing contrib per ORIENTED pair in the
    * candidate aggregation (the same shuffle that deduplicated pairs
    * before) and keeping pairs with sum >= m is therefore exact-recall:
    * every qualifying pair passes in both orientations, while a chance
    * rare-token collision shares 1-3 indexed tokens worth ~0.02-0.06
    * of bounded contribution and dies. Measured on the sf0.1 shingle
    * corpus: candidates 145,150 -> 324 for 255 true pairs (ids-only
    * join rows grow ~6x — the PPJoin trade: a bounded-width posting
    * join bought the elimination of 99.8% of the verification joins).
    * The -1e-9 slacks keep both the index cut and the evidence cut
    * conservative against FP noise in the window/aggregate sums. */
  private[operators] val EvidenceMargin = 0.2

  private[operators] def sparseCandidates(w: DataFrame, norms: DataFrame,
                                          tau: Double): DataFrame = {
    val m = math.min(EvidenceMargin, tau)
    val u = w.join(norms, "id").withColumn("uw", col("w") / col("nrm"))
    // corpus max normalized weight per token — vocab-sized aggregate,
    // the df-join shape weights() already pays
    val mw = u.groupBy(col("tok")).agg(max(col("uw")).as("mw"))
    val win = Window.partitionBy(col("id"))
      .orderBy(col("df").desc, col("tok"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = u.join(mw, "tok")
      .withColumn("cum", sum(col("uw") * col("uw")).over(win))
    val index = cum
      .filter(col("cum") >= lit((tau - m) * (tau - m) - 1e-9))
      .select(col("id"), col("tok"), (col("uw") * col("mw")).as("contrib"))
    val full = w.select(col("id").as("idb"), col("tok"))
    index.join(full, "tok")
      .filter(col("id") =!= col("idb"))
      .groupBy(col("id"), col("idb"))
      .agg(sum(col("contrib")).as("s"))
      .filter(col("s") >= lit(m - 1e-9))
      .select(least(col("id"), col("idb")).as("rid"),
        greatest(col("id"), col("idb")).as("sid"))
      .dropDuplicates("rid", "sid")
  }

  /** BM25-shaped query->document retrieval, engine-exact.
    *
    * The TF-saturation core is textbook BM25: per query term t,
    * tf_t / (tf_t + k1 * (1 - b + b * dl / avgdl)). The idf weight is
    * the repo's log-free integer form — bitlen(N / df_t) (length of the
    * binary expansion; `length(bin(x))` in DuckDB) — because `ln` is
    * not guaranteed last-ulp-identical across engines while bitlen is
    * exact in both (the lm-surprisal precedent). Per-term addends are
    * summed in FIXED query order in both engines, so the doubles are
    * bit-identical: integer tf/dl/df/N in, one shared avgdl division,
    * same literal constants, same expression tree.
    *
    * Shape at 100 TB: ONE token-filtered aggregation builds (dl, tf_t)
    * per document — the filter prunes the explode to query terms plus
    * the doc-length count, no vocabulary shuffle; df/N/avgdl are an
    * O(|terms|) driver map; scoring is a codegen projection; top-k is
    * TakeOrderedAndProject. A query SERVICE would precompute (dl, tf)
    * postings once and reuse them per query — this is the single-query
    * scan form.
    *
    * Output: (doc_id, score) top-k by (round(score, 6) DESC, doc_id). */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75,
               idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      s"bm25TopK: terms must be non-empty and distinct: $terms")
    val toks = CorpusOps.widen(docs).select(col(idCol).as("doc_id"),
      explode(graft.functions.TextCols.tokens(col(textCol))).as("token"))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("token") === t, 1L).otherwise(0L)).as(s"tf$i")
    }
    val agg = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"), tfCols: _*)
    // O(|terms|) driver stats: N, avgdl, df per term
    val statAggs: Seq[Column] =
      countDistinct(col("doc_id")).as("n") +:
      (count(lit(1)).cast("double") /
        countDistinct(col("doc_id"))).as("avgdl") +:
      terms.zipWithIndex.map { case (t, i) =>
        countDistinct(when(col("token") === t, col("doc_id"))).as(s"df$i")
      }
    val dfRow = toks.agg(statAggs.head, statAggs.tail: _*).head()
    val n = dfRow.getLong(0)
    val avgdl = dfRow.getDouble(1)
    val weights = terms.indices.map { i =>
      val df = dfRow.getLong(2 + i)
      if (df == 0L) 0L else java.lang.Long.toBinaryString(n / df).length.toLong
    }
    val kTerm = lit(k1) * (lit(1.0 - b) +
      lit(b) * col("dl").cast("double") / lit(avgdl))
    val score = terms.indices.map { i =>
      lit(weights(i)) * (col(s"tf$i").cast("double") /
        (col(s"tf$i").cast("double") + kTerm))
    }.reduce(_ + _) // fixed left-assoc query order, mirrored in the oracle
    agg.select(col("doc_id"), round(score, 6).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }
}
