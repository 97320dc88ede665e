package graft.core

import scala.collection.mutable

/** Bounded-state Misra–Gries frequency sketch over a string stream.
  *
  * Invariant (Misra & Gries 1982): after processing n items with k
  * counters, every item's true count c satisfies
  * `sketchCount >= c - n/(k+1)` (absent items have sketchCount 0), so
  * ANY item with true count > n/(k+1) is guaranteed present.
  *
  * The sketch is MERGEABLE with the same guarantee (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012, §3.1): summing counters and then
  * subtracting the (k+1)-th largest value from all (dropping non-
  * positives) keeps total under-count <= n/(k+1) for the COMBINED
  * stream, independent of the merge tree shape. That makes it a valid
  * `treeAggregate` zero/seqOp/combOp triple: per-partition sketches
  * merge executor-side, the driver holds exactly one k-entry map no
  * matter how many partitions contributed (vs a union-of-candidates
  * pass 1 whose driver set grows with executor count).
  *
  * This sketch is only ever a CANDIDATE filter — operators re-count
  * survivors exactly in a second pass, so approximation never reaches
  * a result (see CorpusOps.heavyHitters).
  */
final class MisraGries(val k: Int) extends Serializable {
  require(k > 0, s"MisraGries: k=$k")

  /** Surviving candidate counters (under-counts, never over-counts). */
  val counts = new mutable.HashMap[String, Long]

  /** Items processed (summed across merges). */
  var n = 0L

  def add(item: String): this.type = {
    n += 1
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < k => counts.update(item, 1L)
      case None =>
        // classic decrement-all step: one "deletion" of k+1 distinct
        // items (the arrival plus one from each counter); amortized O(1)
        // per add — each decrement pass is paid for by the >= k adds
        // that filled the map
        val keys = counts.keysIterator.toArray
        var i = 0
        while (i < keys.length) {
          val c = counts(keys(i)) - 1
          if (c == 0L) counts.remove(keys(i)) else counts.update(keys(i), c)
          i += 1
        }
    }
    this
  }

  def merge(other: MisraGries): this.type = {
    require(other.k == k, s"MisraGries merge: k=$k vs ${other.k}")
    n += other.n
    other.counts.foreach { case (t, c) =>
      counts.update(t, counts.getOrElse(t, 0L) + c)
    }
    if (counts.size > k) {
      // subtract the (k+1)-th largest counter from every counter and
      // drop non-positives: AT MOST k survivors (counters tied with the
      // cut value also drop), combined-stream error bound preserved
      // (Mergeable Summaries §3.1)
      val vals = counts.values.toArray
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - (k + 1)) // (k+1)-th largest
      val keys = counts.keysIterator.toArray
      var i = 0
      while (i < keys.length) {
        val c = counts(keys(i)) - cut
        if (c <= 0L) counts.remove(keys(i)) else counts.update(keys(i), c)
        i += 1
      }
    }
    this
  }
}
