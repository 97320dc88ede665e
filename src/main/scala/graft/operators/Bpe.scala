package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextCols

/** Distributed BPE (byte-pair-encoding) merge learning — the tokenizer-
  * training step of an LLM data pipeline, run where the data lives.
  *
  * Classic BPE (Sennrich et al. 2016) iterates: count adjacent symbol
  * pairs across the corpus, merge the most frequent pair everywhere,
  * repeat. The scale shape here:
  *
  *  - the corpus first collapses to its WORD-FREQUENCY vocabulary (one
  *    `groupBy(word)` — the only stage that touches every token
  *    occurrence; at 100 TB this is the same single-shuffle shape as
  *    q_token_stats, and everything after runs on distinct words only);
  *  - each merge round is one RDD job over the vocabulary: flatMap
  *    adjacent (pair, count) partials, `reduceByKey` (map-side
  *    combined), and a deterministic global argmax — highest count,
  *    ties to the LEXICOGRAPHICALLY SMALLEST (left, right) pair, so the
  *    learned table is reproducible across engines and partitionings;
  *  - the chosen pair is broadcast-applied to the symbol sequences
  *    (greedy left-to-right, the reference rule) — a map, no shuffle.
  *    Rounds are RDD, not DataFrame: the repo's iterative-loop rule
  *    (see Cluster.IterCutover) — per-round Catalyst re-planning would
  *    dominate on the collapsed vocabulary at any realistic size.
  *
  * Like the 3-D LP joins, the learned table has no SQL oracle (DuckDB
  * cannot replay an iterative argmax), so it ships with a WITNESS: an
  * independently-written sequential trainer ([[trainReference]]) must
  * produce the identical merge list (q_bpe_witness pins the verdict;
  * BpeSpec proves seeded faults fail it).
  */
object Bpe {

  /** End-of-word marker symbol (reference convention: word-final
    * subwords are distinct from word-internal ones). */
  val Eow = "</w>"

  /** (word, cnt) vocabulary of the corpus — the one full-corpus shuffle. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextCols.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Greedy left-to-right application of one merge to a symbol array —
    * the update rule both trainers share (it IS the BPE definition, not
    * witness-relevant logic: the witness independence lives in the
    * counting/argmax/loop structure). */
  private[operators] def applyMerge(syms: Array[String], a: String,
                                    b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  private def charSyms(word: String): Array[String] =
    word.map(_.toString).toArray :+ Eow

  /** Deterministic argmax order: count DESC, then (left, right) ASC. */
  private def better(x: ((String, String), Long), y: ((String, String), Long)): Boolean =
    x._2 > y._2 || (x._2 == y._2 &&
      (x._1._1 < y._1._1 || (x._1._1 == y._1._1 && x._1._2 < y._1._2)))

  /** Distributed trainer: learns up to `numMerges` merges (stops early
    * when no adjacent pair repeats). Returns the ranked merge table. */
  def train(spark: SparkSession, docs: DataFrame, numMerges: Int,
            textCol: String = "text"): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges=$numMerges")
    var vocab: RDD[(Array[String], Long)] = wordCounts(docs, textCol).rdd
      .map(r => (charSyms(r.getString(0)), r.getLong(1)))
      .persist()
    // vocab-proportional task count (the Wordpiece.train /
    // Dedup.connectedComponents sizing rule): the word-frequency table
    // is vocabulary-sized, so the corpus-shuffle partitioning it
    // inherits would run every round job as a fleet of near-empty
    // tasks; one up-front count buys numMerges rounds of right-sized
    // jobs.
    val parts = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      (vocab.count() / 500000L).toInt + 1))
    // keep a handle on the pre-coalesce persisted RDD: rebinding vocab to
    // the (unpersisted) coalesce wrapper orphans the original cached
    // blocks — round-1's parent.unpersist targets the wrapper, so without
    // this the initial vocabulary-sized cache leaks for the session
    // (ADVICE r16; raw RDD persists are invisible to clearSessionCaches)
    val initial = vocab
    if (parts < vocab.getNumPartitions) vocab = vocab.coalesce(parts)
    var parent: RDD[(Array[String], Long)] = null
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    try {
      val argmaxOrd = Ordering.fromLessThan[((String, String), Long)](better)
      var continue = numMerges > 0
      while (continue && merges.length < numMerges) {
        // ONE job per round: map-side-combined pair counts, global
        // argmax as a single takeOrdered(1) element. The job also
        // materializes this round's (cached) vocab, so the previous
        // round's parent can be dropped afterwards — lineage any job
        // replays stays one map deep without a separate count() pass.
        val top = vocab.flatMap { case (syms, c) =>
          (0 until syms.length - 1).iterator.map(i => ((syms(i), syms(i + 1)), c))
        }.reduceByKey(_ + _, parts).filter(_._2 >= 2)
          .takeOrdered(1)(argmaxOrd)
        if (parent != null) { parent.unpersist(false); parent = null }
        if (top.isEmpty) continue = false
        else {
          val pair = top(0)._1
          merges += pair
          parent = vocab
          vocab = vocab.map { case (syms, c) =>
            (applyMerge(syms, pair._1, pair._2), c)
          }.persist()
        }
      }
      merges.toSeq
    } finally {
      if (parent != null) parent.unpersist(false)
      vocab.unpersist(false)
      // idempotent when no coalesce happened (unpersist twice is a no-op)
      initial.unpersist(false)
    }
  }

  /** Independent sequential witness trainer over a collected
    * (word, cnt) vocabulary: same definition, different structure —
    * a recursive loop over an immutable Map with full re-counting each
    * round, no partials/combiners/RDD order anywhere. Gate-scale only
    * (the caller collects the vocabulary). */
  def trainReference(vocabulary: Seq[(String, Long)],
                     numMerges: Int): Seq[(String, String)] = {
    @annotation.tailrec
    def loop(vocab: Map[List[String], Long], acc: List[(String, String)],
             left: Int): List[(String, String)] = {
      if (left == 0) acc.reverse
      else {
        val counts = vocab.toSeq.flatMap { case (syms, c) =>
          syms.zip(syms.tail).map(p => p -> c)
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
          .filter(_._2 >= 2)
        if (counts.isEmpty) acc.reverse
        else {
          val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
          val merged = vocab.toSeq.map { case (syms, c) =>
            applyMerge(syms.toArray, best._1, best._2).toList -> c
          }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
          loop(merged, best :: acc, left - 1)
        }
      }
    }
    loop(vocabulary.map { case (w, c) => charSyms(w).toList -> c }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap,
      Nil, numMerges)
  }

  /** Apply a learned merge table to one word — merges in RANK order,
    * each greedy left-to-right (the reference decode rule: training
    * order IS application order). */
  private[operators] def segmentWord(word: String,
                                     merges: Seq[(String, String)]): Array[String] = {
    var syms = charSyms(word)
    merges.foreach { case (a, b) =>
      if (syms.length > 1) syms = applyMerge(syms, a, b)
    }
    syms
  }

  /** Segment the corpus with a learned merge table: per document, the
    * subword count and the per-word expansion stats a tokenizer-budget
    * pass consumes. One map over documents (merges ride in the
    * closure, O(numMerges) strings); per-word segmentations are
    * memoized per partition — Zipf makes the distinct-word working set
    * tiny relative to the token stream. */
  def segment(docs: DataFrame, merges: Seq[(String, String)],
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val in = docs.select(col(idCol), col(textCol))
    val schema = StructType(Seq(in.schema.head.copy(name = "doc_id"),
      StructField("n_words", LongType, nullable = false),
      StructField("n_subwords", LongType, nullable = false)))
    val rows = in.rdd.mapPartitions { it =>
      val memo = scala.collection.mutable.HashMap.empty[String, Int]
      it.map { r =>
        val words = r.getString(1).split(" ", -1)
        var subs = 0L
        words.foreach { w =>
          subs += memo.getOrElseUpdate(w, segmentWord(w, merges).length)
        }
        Row(r.get(0), words.length.toLong, subs)
      }
    }
    docs.sparkSession.createDataFrame(rows, schema)
  }

  /** Merge table as a DataFrame (rank, left, right). */
  def mergeTable(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i + 1, a, b) }
      .toDF("rank", "left", "right")
  }
}
