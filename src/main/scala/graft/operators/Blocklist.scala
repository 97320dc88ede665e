package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Dictionary-phrase matching — the C4-class "blocklist" ingestion
  * filter: given a dictionary of banned phrases, count every occurrence
  * of every phrase in every document in ONE pass over the text.
  *
  * The kernel is the classic Aho–Corasick automaton (public knowledge:
  * Aho & Corasick 1975): the dictionary compiles once on the driver
  * into a goto/fail/output trie, ships as ONE broadcast, and each
  * document is scanned in O(len + hits) regardless of dictionary size —
  * the property that makes a 10k-phrase blocklist the same cost as a
  * 10-phrase one at 100 TB. A per-pattern `indexOf` rescan (or a regex
  * alternation, which Java compiles to backtracking) is O(len ×
  * patterns) and is exactly what this operator exists to avoid.
  *
  * Semantics: ALL match positions count — overlapping occurrences and
  * nested patterns ("join" inside "join order") each report. This is
  * the automaton's natural output and is position-exact replayable in
  * SQL (count the i where substr(text, i, len(p)) = p), with no
  * leftmost-greedy convention to keep in sync between engines.
  */
object Blocklist {

  /** Immutable, serializable Aho–Corasick automaton. Arrays-of-maps
    * keep it compact enough to broadcast at dictionary sizes far past
    * any real blocklist. */
  final class AhoCorasick(val patterns: Array[String]) extends Serializable {
    require(patterns.nonEmpty, "AhoCorasick: empty dictionary")
    require(patterns.forall(_.nonEmpty), "AhoCorasick: empty pattern")
    require(patterns.distinct.length == patterns.length,
      s"AhoCorasick: duplicate patterns in ${patterns.mkString(",")}")

    private val gotoMap = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    private val outs = mutable.ArrayBuffer(List.empty[Int])
    // trie
    for (pi <- patterns.indices) {
      var s = 0
      for (c <- patterns(pi)) {
        s = gotoMap(s).getOrElseUpdate(c, {
          gotoMap += mutable.Map.empty[Char, Int]
          outs += Nil
          gotoMap.length - 1
        })
      }
      outs(s) = pi :: outs(s)
    }
    // fail links (BFS) + output merging
    private val fail = Array.fill(gotoMap.length)(0)
    locally {
      val q = mutable.Queue.empty[Int]
      for ((_, s) <- gotoMap(0)) { fail(s) = 0; q.enqueue(s) }
      while (q.nonEmpty) {
        val u = q.dequeue()
        for ((c, v) <- gotoMap(u)) {
          q.enqueue(v)
          var f = fail(u)
          while (f != 0 && !gotoMap(f).contains(c)) f = fail(f)
          fail(v) = if (gotoMap(f).contains(c) && gotoMap(f)(c) != v)
            gotoMap(f)(c) else 0
          outs(v) = outs(v) ::: outs(fail(v))
        }
      }
    }
    private val gotoArr: Array[Map[Char, Int]] = gotoMap.map(_.toMap).toArray
    private val outArr: Array[Array[Int]] = outs.map(_.toArray).toArray

    /** Per-pattern occurrence counts over `text` (all positions). */
    def countAll(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (s != 0 && !gotoArr(s).contains(c)) s = fail(s)
        s = gotoArr(s).getOrElse(c, 0)
        val o = outArr(s)
        var j = 0
        while (j < o.length) { counts(o(j)) += 1L; j += 1 }
        i += 1
      }
      counts
    }
  }

  /** `(doc_id, pattern, hits)` for every document × dictionary phrase
    * with at least one occurrence. One broadcast, one map pass, no
    * shuffle (the output IS per-row — any aggregation downstream is the
    * caller's). */
  def matchCounts(spark: SparkSession, docs: DataFrame,
                  dictionary: Seq[String], idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    import spark.implicits._
    val ac = new AhoCorasick(dictionary.toArray)
    val bc = spark.sparkContext.broadcast(ac)
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        col(textCol).cast("string").as("text"))
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .as[(Long, String)]
      .mapPartitions { rows =>
        val a = bc.value
        rows.flatMap { case (id, text) =>
          val counts = a.countAll(text)
          counts.iterator.zipWithIndex.collect {
            case (n, pi) if n > 0 => (id, a.patterns(pi), n)
          }
        }
      }
      .toDF("doc_id", "pattern", "hits")
  }
}
