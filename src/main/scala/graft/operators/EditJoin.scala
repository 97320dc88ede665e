package graft.operators

import graft.core.Caching._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Bounded edit-distance (Levenshtein) similarity self-join — the
  * string-distance member of the engine's similarity-join family
  * (set-Jaccard: `Dedup.jaccardJoin`; weighted cosine: `TfIdf`;
  * distribution EMD: `MelodyJoin`). Completes the near-duplicate
  * detection surface with the character-level metric used for
  * OCR/transcription noise and small in-place edits that token-set
  * metrics under-weight.
  *
  * Algorithm (PassJoin-style segment signatures, Li/Deng/Feng's
  * pigeonhole scheme re-expressed as Spark shuffled equijoins):
  * partition every string into d+1 even segments. If ed(a, b) <= d,
  * some optimal alignment edits at most d segments, so at least one
  * segment of a appears in b EXACTLY, shifted by at most d positions
  * (the net indel drift before it). Candidate generation is therefore
  * an equijoin between
  *   index side:  (segIdx, segment text, |a|)           — d+1 rows/doc
  *   probe side:  (segIdx, substring of b at the segment's position
  *                 +- d for every target length within +-d of |b|)
  *                 — at most (d+1)(2d+1)^2 rows/doc
  * followed by exact verification with Spark's banded `levenshtein`
  * (threshold form: O(d * len) per pair, not O(len^2)).
  *
  * 100 TB shape: probe/index generation is a map-side flatMap with a
  * CONSTANT per-row blow-up ((d+1)(2d+1)^2 ~ 405 at d = 4) of short
  * substring keys (~len/(d+1) chars); the candidate equijoin shuffles
  * on hashed (segIdx, segment, length) — high-cardinality keys, no
  * skew hot-spot (segments of near-unique text); candidates collapse
  * to an ids-only distinct before texts are re-joined for the O(d*len)
  * verify. Never all-pairs: a pair is materialized only if it shares
  * an exact segment at a compatible position. The candidate count is
  * pinned empirically by ScalingSpec (ScalingStats.editJoin).
  *
  * Reference behavior: the reference's join surface is
  * distribution-distance only (`/root/reference/src/com/iojin/melody/Join.java:42-131`);
  * this operator extends the same threshold-join contract (rid < sid
  * canonical orientation, exact verification after pruned candidate
  * generation) to the string-edit metric a text-corpus pipeline needs.
  */
object EditJoin {

  /** Even-partition boundary: segment i of a length-l string spans
    * [pos(i, l, d), pos(i + 1, l, d)). Non-empty for all i iff l >= d + 1. */
  private def pos(i: Int, l: Int, d: Int): Int = (i.toLong * l / (d + 1)).toInt

  /** Hard cap on the SHORT-string leg (strings of < d+1 code points,
    * which segment signatures cannot index): all short-short pairs
    * trivially satisfy ed <= max length <= d, so the output itself is
    * quadratic in the short count — no candidate filter can prune it.
    * The cap keeps the leg an O(cap^2) broadcast nested loop; a corpus
    * with more sub-(d+1)-length rows than this has a quadratic ANSWER
    * and needs a deliberate pre-filter, not a silent join. */
  private[operators] val ShortLegCap = 4096L

  /** Candidate (rid, sid) pairs sharing an exact segment at a compatible
    * shifted position — a superset of all pairs with ed <= d (recall 1.0
    * by the pigeonhole argument above) — unioned with the two SHORT legs
    * for strings of < d+1 code points (which cannot host d+1 non-empty
    * segments): short-short is all-pairs over the broadcast-small short
    * set (every such pair qualifies trivially: ed <= max length <= d),
    * and short-long pairs only longs of length <= 2d (ed >= length gap
    * otherwise), again against the broadcast short side. NULL text is
    * treated as the empty string (a short row). Package-private so the
    * scaling contract can count candidates through the operator's own
    * kernel.
    *
    * All positions/lengths are CODE POINTS, not UTF-16 units: the
    * verifier (Spark `levenshtein`) counts code-point edits, and the
    * pigeonhole guarantee only holds when segmentation uses the same
    * unit — a UTF-16 split lets d code-point edits (2d units for
    * astral chars) touch all d+1 unit-based segments. (DuckDB's
    * `levenshtein` counts BYTES, so the q_edit_pairs oracle agrees
    * with this operator only on ASCII corpora — exactly the
    * `documents.text` contract FixtureContractSpec enforces at every
    * generated scale; non-ASCII correctness is pinned engine-side by
    * EditJoinSpec's astral-plane case instead.) */
  private[operators] def candidatePairs(docs: DataFrame, d: Int,
                                        idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(d >= 1, s"edit-distance threshold must be >= 1, got $d")

    // Spark `length` counts code points, matching the segment unit.
    val t = docs.select(col(idCol).cast("long").as("id"),
      coalesce(col(textCol).cast("string"), lit("")).as("t"))
    val base: Dataset[(Long, String)] =
      t.filter(length(col("t")) >= d + 1).as[(Long, String)]

    // SHORT legs: strings the pigeonhole cannot index. They are few on
    // any real document corpus (the cap guards the degenerate one); one
    // column-pruned count-scan decides whether the legs exist at all.
    val shorts = t.filter(length(col("t")) <= d)
    val nShorts = shorts.count()
    val shortLegs: Option[DataFrame] =
      if (nShorts == 0) None
      else {
        require(nShorts <= ShortLegCap,
          s"editJoin: $nShorts strings shorter than d+1 = ${d + 1} code " +
            s"points (cap $ShortLegCap). Every pair of such strings " +
            "qualifies trivially (ed <= max length <= d), so the answer " +
            "itself is quadratic in that count — pre-filter sub-threshold-" +
            "length rows or lower d rather than materializing it")
        // no persist: the short projection is <= ShortLegCap rows over the
        // caller's (usually cached) texts frame — a persistOnce here would
        // leak a cache entry past the call (nothing downstream unpersists)
        val sa = broadcast(shorts.select(col("id").as("aid"),
          length(col("t")).as("la")))
        // short-short: all pairs (each trivially within d)
        val ss = sa.crossJoin(shorts.select(col("id").as("bid")))
          .filter(col("aid") < col("bid"))
        // short-long: only longs within length reach of THIS short
        // (ed >= |b| - |a|, so |b| <= |a| + d per pair — the global
        // |b| <= 2d band alone admits pairs whose length gap already
        // exceeds d, e.g. a 1-char short vs a 2d-char long)
        val sl = sa.crossJoin(
            t.filter(length(col("t")).between(d + 1, 2 * d))
              .select(col("id").as("bid"), length(col("t")).as("lb")))
          .filter(col("lb") <= col("la") + d)
        Some(ss.select(col("aid"), col("bid"))
          .unionByName(sl.select(col("aid"), col("bid")))
          .select(least(col("aid"), col("bid")).as("rid"),
            greatest(col("aid"), col("bid")).as("sid")))
      }

    // index side: the d+1 even segments of each string
    val segs = base.flatMap { case (id, t) =>
      val cps = t.codePoints().toArray
      val l = cps.length
      (0 to d).iterator.map { i =>
        val p0 = pos(i, l, d)
        (i, new String(cps, p0, pos(i + 1, l, d) - p0), l, id)
      }
    }.toDF("i", "seg", "la", "aid")

    // probe side: the substrings of b that could equal segment i of a
    // length-la string, shifted by at most d from the segment's home
    // position. Only target lengths la <= |b| are generated: for any
    // qualifying pair it is the SHORTER string whose unedited segment we
    // look for inside the longer (equal lengths probe both ways and the
    // distinct collapses them), cutting probe rows ~45% vs the
    // symmetric +-d window with recall still 1.0 (EditJoinSpec).
    val probes = base.flatMap { case (id, t) =>
      val cps = t.codePoints().toArray
      val l = cps.length
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Int, Long)]
      var la = math.max(d + 1, l - d) // indexed lengths are all >= d+1
      while (la <= l) {
        var i = 0
        while (i <= d) {
          val p0 = pos(i, la, d)
          val segLen = pos(i + 1, la, d) - p0
          if (segLen > 0 && segLen <= l) {
            var s = math.max(0, p0 - d)
            val sMax = math.min(l - segLen, p0 + d)
            while (s <= sMax) {
              out += ((i, new String(cps, s, segLen), la, id))
              s += 1
            }
          }
          i += 1
        }
        la += 1
      }
      out.iterator
    }.toDF("i", "seg", "la", "bid")

    val longLeg = segs.join(probes, Seq("i", "seg", "la"))
      .filter(col("aid") =!= col("bid"))
      .select(least(col("aid"), col("bid")).as("rid"),
        greatest(col("aid"), col("bid")).as("sid"))
    shortLegs.fold(longLeg)(longLeg.unionByName(_)).distinct()
  }

  /** Banded Levenshtein over CODE POINTS: the exact distance when it is
    * <= d, else -1 — the same contract as Spark's `levenshtein(l, r, d)`
    * expression, as a plain-JVM kernel for executor-side probe loops
    * (stream-static matching). Two-row DP restricted to the |i - j| <= d
    * band: O(d * len) time, O(len) space. */
  private[operators] def bandedEd(a: Array[Int], b: Array[Int], d: Int): Int = {
    if (math.abs(a.length - b.length) > d) return -1
    val (x, y) = if (a.length <= b.length) (a, b) else (b, a)
    val n = x.length
    val m = y.length
    val inf = d + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= d) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      if (i <= d) cur(0) = i
      var jj = math.max(1, i - d)
      val hi = math.min(m, i + d)
      while (jj <= hi) {
        var v = prev(jj - 1) + (if (x(i - 1) == y(jj - 1)) 0 else 1)
        if (prev(jj) + 1 < v) v = prev(jj) + 1
        if (cur(jj - 1) + 1 < v) v = cur(jj - 1) + 1
        cur(jj) = if (v > inf) inf else v
        jj += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(m) > d) -1 else prev(m)
  }

  /** Broadcastable static-side index for stream-static edit matching:
    * segment signatures of every reference of length >= d+1 (the
    * PassJoin index side), references shorter than d+1 code points as a
    * brute list (their pair counts are bounded by the index size, which
    * is bounded by contract), and the reference code points for the
    * banded verify. Built once from a BOUNDED reference set (a
    * broadcast index is fixed-size by definition — the q_stream_emd
    * contract applied to strings). */
  final case class ProbeIndex(
      d: Int,
      segs: Map[(Int, String, Int), Array[Long]],
      shorts: Array[(Long, Array[Int])],
      texts: Map[Long, Array[Int]],
      /** Distinct indexed reference lengths: matchOne skips target
        * lengths la with no indexed reference entirely, shrinking the
        * ~(2d+1)^2(d+1) per-row probe constant when reference lengths
        * cluster (they do on real corpora). */
      lengths: Set[Int]) extends Serializable

  def buildProbeIndex(refs: Array[(Long, String)], d: Int): ProbeIndex = {
    require(d >= 1, s"edit-distance threshold must be >= 1, got $d")
    val texts = refs.map { case (id, t) =>
      id -> Option(t).getOrElse("").codePoints().toArray
    }.toMap
    val segs = scala.collection.mutable.HashMap
      .empty[(Int, String, Int), scala.collection.mutable.ArrayBuffer[Long]]
    val shorts = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Int])]
    refs.foreach { case (id, _) =>
      val cps = texts(id)
      val l = cps.length
      if (l <= d) shorts += ((id, cps))
      else (0 to d).foreach { i =>
        val p0 = pos(i, l, d)
        val key = (i, new String(cps, p0, pos(i + 1, l, d) - p0), l)
        segs.getOrElseUpdate(key,
          scala.collection.mutable.ArrayBuffer.empty[Long]) += id
      }
    }
    val lengths = refs.iterator.map { case (id, _) => texts(id).length }
      .filter(_ > d).toSet
    ProbeIndex(d, segs.view.mapValues(_.toArray).toMap, shorts.toArray,
      texts, lengths)
  }

  /** All references within edit distance d of `t`, as (refId, ed):
    * pigeonhole probe over indexed lengths la in [max(d+1, l-d), l+d]
    * (the STATIC side is the indexed side here, so both shorter and
    * longer references are reachable from one probe — a qualifying
    * reference has an unedited segment appearing in t within +-d of its
    * home position, and an unedited segment is a substring of t so its
    * length never exceeds l), plus the brute short-reference leg, then
    * the banded-DP verify. ~(2d+1)^2*(d+1) hash lookups per call at the
    * declared d = 4. */
  def matchOne(idx: ProbeIndex, t: String): Seq[(Long, Int)] = {
    val cps = Option(t).getOrElse("").codePoints().toArray
    val cand = candidateIds(idx, cps)
    cand.iterator.flatMap { id =>
      val ed = bandedEd(cps, idx.texts(id), idx.d)
      if (ed >= 0) Some((id, ed)) else None
    }.toSeq
  }

  /** The probe's candidate set alone (no verify) — package-visible so
    * the stress probe can measure per-row candidate counts through the
    * operator's own kernel. */
  private[graft] def candidateIds(idx: ProbeIndex,
                                  cps: Array[Int]): scala.collection.mutable.HashSet[Long] = {
    val l = cps.length
    val d = idx.d
    val cand = scala.collection.mutable.HashSet.empty[Long]
    var la = math.max(d + 1, l - d)
    val laMax = l + d
    while (la <= laMax) {
      // skip target lengths with no indexed reference: every key built
      // for such a la misses, and the (d+1)(2d+1) substring builds +
      // hash lookups per la dominate the per-row probe constant
      if (idx.lengths.contains(la)) {
        var i = 0
        while (i <= d) {
          val p0 = pos(i, la, d)
          val segLen = pos(i + 1, la, d) - p0
          if (segLen > 0 && segLen <= l) {
            var s = math.max(0, p0 - d)
            val sMax = math.min(l - segLen, p0 + d)
            while (s <= sMax) {
              idx.segs.get((i, new String(cps, s, segLen), la))
                .foreach(ids => ids.foreach(cand += _))
              s += 1
            }
          }
          i += 1
        }
      }
      la += 1
    }
    idx.shorts.foreach { case (id, rc) =>
      if (math.abs(rc.length - l) <= d) cand += id
    }
    cand
  }

  /** All pairs with levenshtein(a, b) <= d, canonically oriented
    * rid < sid, with the exact distance. Output: (rid, sid, ed). */
  def editJoin(docs: DataFrame, d: Int,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // NULL text is the empty string throughout (candidate legs and
    // verifier agree; levenshtein(NULL, x) would return NULL and silently
    // drop the pair instead)
    val texts = docs
      .select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol).cast("string"), lit("")).as("t"))
      .persistOnce()
    // candidate generation reads the persisted projection: the min-scan
    // and the two signature flatMaps would otherwise each re-scan the
    // raw source (3 extra input passes on a large corpus)
    val cands = candidatePairs(texts, d, "id", "t")
    val verified = cands
      .join(texts.select(col("id").as("rid"), col("t").as("ta")), "rid")
      .join(texts.select(col("id").as("sid"), col("t").as("tb")), "sid")
      .select(col("rid"), col("sid"),
        levenshtein(col("ta"), col("tb"), d).cast("long").as("ed"))
      .filter(col("ed") >= 0) // banded levenshtein returns -1 above d
    val out = verified.persistOnce()
    out.count()
    texts.unpersist()
    out
  }
}
