package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Unigram-LM tokenization (Kudo 2018 — the SentencePiece unigram
  * model): the THIRD tokenizer family next to BPE and WordPiece, and
  * the one with genuinely different inference semantics — segmentation
  * is the VITERBI OPTIMUM over per-piece scores, not a greedy
  * longest-match: a longer vocab piece LOSES when a cheaper split
  * outscores it (the demo vocab pins "join" → jo+in beating the whole
  * piece — impossible under WordPiece's greedy rule).
  *
  * Scores here are INTEGERS (log-prob stand-ins; a trained model's
  * floats quantize to fixed-point the same way every integer kernel in
  * this repo does), so the DP is engine-exact. The outputs are the two
  * tie-free quantities: the maximum total score (unique by definition)
  * and the minimum piece count AMONG maximum-score segmentations (also
  * unique) — no lexicographic tie-break convention exists to drift
  * between engines. An uncoverable word is whole-word UNK at a fixed
  * penalty, one piece — the WordPiece convention.
  *
  * Execution: the same shape as [[Wordpiece.encode]] — one map pass
  * with a per-partition word memo (vocab is closure-sized, words repeat
  * heavily), no shuffle, nothing leaves the row.
  */
object Unigram {

  val UnkScore = -10000L

  /** Viterbi DP for one word: (best total score, min pieces at best,
    * unk). Empty word: (0, 0, false) — the empty segmentation. */
  private[operators] def segment(w: String,
                                 vocab: Seq[(String, Long)]): (Long, Long, Boolean) = {
    val n = w.length
    if (n == 0) return (0L, 0L, false)
    val sc = Array.fill[Long](n + 1)(Long.MinValue)
    val pc = Array.fill[Long](n + 1)(Long.MaxValue)
    sc(0) = 0L
    pc(0) = 0L
    var i = 1
    while (i <= n) {
      vocab.foreach { case (p, s) =>
        val m = p.length
        if (m <= i && sc(i - m) != Long.MinValue &&
            w.regionMatches(i - m, p, 0, m)) {
          val cand = sc(i - m) + s
          if (cand > sc(i)) { sc(i) = cand; pc(i) = pc(i - m) + 1 }
          else if (cand == sc(i) && pc(i - m) + 1 < pc(i)) pc(i) = pc(i - m) + 1
        }
      }
      i += 1
    }
    if (sc(n) == Long.MinValue) (UnkScore, 1L, true)
    else (sc(n), pc(n), false)
  }

  /** Per-document stats under the Viterbi segmentation:
    * `(doc_id, n_words, total_score, n_pieces, n_unk_words)`. */
  def encode(docs: DataFrame, vocab: Seq[(String, Long)],
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    require(vocab.nonEmpty && vocab.forall(_._1.nonEmpty) &&
      vocab.map(_._1).distinct.length == vocab.length,
      "Unigram.encode: vocab must be non-empty, duplicate- and empty-free")
    val in = docs.select(col(idCol), col(textCol))
    val schema = StructType(Seq(in.schema.head.copy(name = "doc_id"),
      StructField("n_words", LongType, nullable = false),
      StructField("total_score", LongType, nullable = false),
      StructField("n_pieces", LongType, nullable = false),
      StructField("n_unk_words", LongType, nullable = false)))
    val rows = in.rdd.mapPartitions { it =>
      val memo = scala.collection.mutable.HashMap.empty[String, (Long, Long, Boolean)]
      it.map { r =>
        val words = r.getString(1).split(" ", -1)
        var score = 0L
        var pieces = 0L
        var unks = 0L
        words.foreach { w =>
          val (s, p, unk) = memo.getOrElseUpdate(w, segment(w, vocab))
          score += s
          pieces += p
          if (unk) unks += 1
        }
        Row(r.get(0), words.length.toLong, score, pieces, unks)
      }
    }
    docs.sparkSession.createDataFrame(rows, schema)
  }
}
