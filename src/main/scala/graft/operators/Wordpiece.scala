package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed WordPiece tokenizer learning + inference (Schuster &
  * Nakajima 2012; the BERT tokenizer family — public knowledge), the
  * second tokenizer family next to [[Bpe]]: same corpus-collapse and
  * RDD-round scale shape, a DIFFERENT merge-selection rule, and the
  * `##` continuation convention with greedy longest-match-first
  * inference.
  *
  * Selection rule: WordPiece merges the adjacent pair maximizing the
  * likelihood gain score count(ab) / (count(a) * count(b)). The repo's
  * FP-safe-ratio rule makes this ENGINE-EXACT: scores are never
  * materialized as doubles — candidate pairs compare by BigInt
  * cross-multiplication (c1 * l2*r2 vs c2 * l1*r1; counts at 100 TB
  * can reach ~1e12, so the products need arbitrary precision), ties to
  * the lexicographically smallest (left, right). The learned table is
  * therefore bit-reproducible across engines and partitionings, like
  * BPE's count-argmax.
  *
  * Scale shape (the [[Bpe]] contract): ONE full-corpus shuffle to the
  * word-frequency vocabulary, then each merge round is one RDD job
  * over distinct words — flatMap (symbol, count) + (pair, count)
  * partials tagged into a single reduceByKey, deterministic global
  * argmin over the vocab-sized result, broadcast-applied merge.
  * RDD rounds, not DataFrame (the iterative-loop re-planning rule).
  *
  * Like BPE, the learned table has no SQL oracle (DuckDB cannot replay
  * an iterative argmax), so it ships with a WITNESS: an independently
  * written sequential trainer + encoder ([[trainReference]],
  * q_wordpiece_witness) must agree exactly; the INFERENCE kernel is
  * separately full-oracle against a pinned static vocabulary
  * (q_wordpiece_tokens — greedy longest-match replayed by a recursive
  * CTE). */
object Wordpiece {

  val Unk = "[UNK]"

  /** Word -> initial symbols: first char bare, rest `##`-prefixed. */
  private[operators] def charSyms(word: String): Array[String] = {
    val cps = word.toCharArray
    Array.tabulate(cps.length)(i =>
      if (i == 0) cps(i).toString else "##" + cps(i))
  }

  /** Concatenate a merge pair: the right side loses its continuation
    * marker; the left side keeps whatever marker it has. */
  private[operators] def joinPair(a: String, b: String): String =
    a + (if (b.startsWith("##")) b.substring(2) else b)

  /** Deterministic selection order over (left, right, pairCnt, leftCnt,
    * rightCnt): higher score first — compared as BigInt cross products —
    * then lexicographically smallest pair. */
  private[operators] def better(x: (String, String, Long, Long, Long),
                                y: (String, String, Long, Long, Long)): Boolean = {
    val lhs = BigInt(x._3) * (BigInt(y._4) * BigInt(y._5))
    val rhs = BigInt(y._3) * (BigInt(x._4) * BigInt(x._5))
    if (lhs != rhs) lhs > rhs
    else if (x._1 != y._1) x._1 < y._1
    else x._2 < y._2
  }

  /** Greedy left-to-right application of one merge (shared update rule,
    * the same role as Bpe.applyMerge). */
  private[operators] def applyMerge(syms: Array[String], a: String,
                                    b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += joinPair(a, b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Distributed trainer: learns up to `numMerges` (left, right) merges,
    * stopping early when no adjacent pair occurs twice. One RDD job per
    * round over the word-frequency vocabulary; symbol and pair counts
    * ride ONE tagged reduceByKey. */
  def train(spark: SparkSession, docs: DataFrame, numMerges: Int,
            textCol: String = "text"): Seq[(String, String)] = {
    var vocab = Bpe.wordCounts(docs, textCol).rdd
      .map(r => (charSyms(r.getString(0)), r.getLong(1)))
      .persist()
    // vocab-proportional task count: the word-frequency table is
    // vocabulary-sized (orders of magnitude below the corpus), so the
    // inherited corpus-shuffle partitioning would run every one of the
    // ~2*numMerges round jobs as a fleet of near-empty tasks. Same
    // sizing rule as Dedup.connectedComponents' RDD rounds.
    val parts = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      (vocab.count() / 500000L).toInt + 1))
    // pre-coalesce handle: see Bpe.train — the coalesce wrapper is what
    // round-1's parent.unpersist later targets, so the original persisted
    // word-count blocks would leak for the session without this
    val initial = vocab
    if (parts < vocab.getNumPartitions) vocab = vocab.coalesce(parts)
    val argmaxOrd = Ordering.fromLessThan(better)
    var parent: org.apache.spark.rdd.RDD[(Array[String], Long)] = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      // tagged partials: (sym, "") for unigram counts, (a, b) for pairs
      val counts = vocab.flatMap { case (syms, c) =>
        val out = new scala.collection.mutable.ArrayBuffer[((String, String), Long)](2 * syms.length)
        var i = 0
        while (i < syms.length) {
          out += (((syms(i), "")) -> c)
          if (i + 1 < syms.length) out += (((syms(i), syms(i + 1))) -> c)
          i += 1
        }
        out
      }.reduceByKey(_ + _, parts).persist()
      // unigram counts: O(alphabet + merges-so-far) entries — a closure-
      // sized driver map; pair candidates stay an RDD and reduce
      // distributed (vocab-adjacency-sized, never collected). This job
      // also materializes this round's cached vocab, so the previous
      // round's parent can be dropped here (the Bpe.train pattern) —
      // no separate count() pass per round.
      val uni = counts.filter(_._1._2.isEmpty)
        .map { case ((s, _), c) => (s, c) }.collectAsMap()
      if (parent != null) { parent.unpersist(false); parent = null }
      val uniB = spark.sparkContext.broadcast(uni)
      val pairs = counts.filter { case ((_, b), c) => b.nonEmpty && c >= 2 }
        .map { case ((a, b), c) => (a, b, c, uniB.value(a), uniB.value(b)) }
      // empty-check + argmax in ONE job: takeOrdered(1) under the same
      // total order the reduce expressed (score desc, pair asc — unique
      // max, so the selected merge is identical)
      val top = pairs.takeOrdered(1)(argmaxOrd)
      if (top.isEmpty) done = true
      else {
        val best = top(0)
        merges += ((best._1, best._2))
        parent = vocab
        vocab = parent.map { case (syms, c) =>
          (if (syms.length > 1) applyMerge(syms, best._1, best._2) else syms, c)
        }.persist()
      }
      counts.unpersist(false)
      uniB.destroy()
    }
    if (parent != null) parent.unpersist(false)
    vocab.unpersist(false)
    // idempotent when no coalesce happened (unpersist twice is a no-op)
    initial.unpersist(false)
    merges.toSeq
  }

  /** Independent sequential reference trainer for the witness: same
    * contract, written over a plain Map vocabulary with per-round
    * recounts (the Bpe.trainReference role — independence lives in the
    * counting/argmax/loop structure, not the shared update rule). */
  def trainReference(vocabulary: Seq[(String, Long)],
                     numMerges: Int): Seq[(String, String)] = {
    @annotation.tailrec
    def loop(vocab: Map[List[String], Long], acc: List[(String, String)],
             left: Int): List[(String, String)] = {
      if (left == 0) acc.reverse
      else {
        val uni = vocab.toSeq.flatMap { case (syms, c) => syms.map(_ -> c) }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        val pairCnt = vocab.toSeq.flatMap { case (syms, c) =>
          syms.zip(syms.tail).map(p => p -> c)
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
          .filter(_._2 >= 2)
        if (pairCnt.isEmpty) acc.reverse
        else {
          val best = pairCnt.toSeq
            .map { case ((a, b), c) => (a, b, c, uni(a), uni(b)) }
            .reduce((x, y) => if (better(x, y)) x else y)
          val merged = vocab.toSeq.map { case (syms, c) =>
            applyMerge(syms.toArray, best._1, best._2).toList -> c
          }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
          loop(merged, (best._1, best._2) :: acc, left - 1)
        }
      }
    }
    loop(vocabulary.map { case (w, c) => charSyms(w).toList -> c }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap,
      Nil, numMerges)
  }

  /** Greedy longest-match-first segmentation of one word against a
    * vocabulary (the published WordPiece inference rule): repeatedly
    * take the LONGEST piece matching at the cursor (continuation
    * pieces past position 0); if no piece matches, the WHOLE word
    * becomes [UNK] (the BERT convention). Returns (pieces, isUnk). */
  private[operators] def matchWord(word: String,
                                   starts: Set[String],
                                   conts: Set[String]): (Int, Boolean) = {
    if (word.isEmpty) return (0, false)
    var pos = 0
    var n = 0
    while (pos < word.length) {
      val set = if (pos == 0) starts else conts
      var len = word.length - pos
      var found = 0
      while (len > 0 && found == 0) {
        if (set.contains(word.substring(pos, pos + len))) found = len
        else len -= 1
      }
      if (found == 0) return (1, true)
      pos += found
      n += 1
    }
    (math.max(n, 1), false)
  }

  /** Segment the corpus against a vocabulary of pieces (bare = word
    * starts, `##`-prefixed = continuations): per document, word count,
    * total piece count, and UNK-word count. One map over documents
    * (vocab rides the closure), per-partition distinct-word
    * memoization (Zipf working set — the Bpe.segment contract). */
  def encode(docs: DataFrame, vocab: Seq[String],
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val starts = vocab.filterNot(_.startsWith("##")).toSet
    val conts = vocab.filter(_.startsWith("##")).map(_.substring(2)).toSet
    val in = docs.select(col(idCol), col(textCol))
    val schema = StructType(Seq(in.schema.head.copy(name = "doc_id"),
      StructField("n_words", LongType, nullable = false),
      StructField("n_pieces", LongType, nullable = false),
      StructField("n_unk_words", LongType, nullable = false)))
    val rows = in.rdd.mapPartitions { it =>
      val memo = scala.collection.mutable.HashMap.empty[String, (Int, Boolean)]
      it.map { r =>
        val words = r.getString(1).split(" ", -1)
        var pieces = 0L
        var unks = 0L
        words.foreach { w =>
          val (n, unk) = memo.getOrElseUpdate(w, matchWord(w, starts, conts))
          pieces += n
          if (unk) unks += 1
        }
        Row(r.get(0), words.length.toLong, pieces, unks)
      }
    }
    docs.sparkSession.createDataFrame(rows, schema)
  }

  /** Final piece vocabulary from a training run: surviving single-char
    * symbols plus every merge product, as inference pieces. */
  def vocabFromTraining(spark: SparkSession, docs: DataFrame,
                        merges: Seq[(String, String)],
                        textCol: String = "text"): Seq[String] = {
    val base = Bpe.wordCounts(docs, textCol).rdd
      .flatMap(r => charSyms(r.getString(0)))
      .distinct().collect()
    (base ++ merges.map { case (a, b) => joinPair(a, b) }).distinct.sorted.toSeq
  }

  /** Merge table as a DataFrame (rank, left, right). */
  def mergeTable(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i + 1, a, b) }
      .toDF("rank", "left", "right")
  }
}
