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

  /** Candidate (rid, sid) pairs sharing an exact segment at a compatible
    * shifted position — a superset of all pairs with ed <= d (recall 1.0
    * by the pigeonhole argument above). Package-private so the scaling
    * contract can count candidates through the operator's own kernel.
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

    val base: Dataset[(Long, String)] = docs
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]

    // The pigeonhole needs ONE side of a pair partitionable into d+1
    // non-empty segments; candidates generate symmetrically, so a pair is
    // missed only when BOTH strings are <= d chars (where every pair
    // trivially has ed <= max length <= d — an all-pairs leg this
    // operator deliberately does not carry). Guard instead of silently
    // under-reporting; one column-pruned min-scan (Spark `length` counts
    // code points, matching the segment unit). NULL texts count as
    // length 0 so they hit this require loudly instead of NPEing in the
    // segment flatMap (SQL min would silently skip them); an empty
    // corpus short-circuits to the empty pair set.
    val minLenRow = docs.agg(
      min(coalesce(length(col(textCol)), lit(0))).cast("int")).head()
    if (minLenRow.isNullAt(0)) return Seq.empty[(Long, Long)].toDF("rid", "sid")
    val minLen = minLenRow.getInt(0)
    require(minLen >= d + 1,
      s"editJoin needs every string >= d+1 = ${d + 1} chars (min found $minLen): " +
        "pairs of sub-threshold-length strings all qualify trivially and need a " +
        "dedicated all-pairs leg, not segment signatures")

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

    segs.join(probes, Seq("i", "seg", "la"))
      .filter(col("aid") =!= col("bid"))
      .select(least(col("aid"), col("bid")).as("rid"),
        greatest(col("aid"), col("bid")).as("sid"))
      .distinct()
  }

  /** All pairs with levenshtein(a, b) <= d, canonically oriented
    * rid < sid, with the exact distance. Output: (rid, sid, ed). */
  def editJoin(docs: DataFrame, d: Int,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val texts = docs
      .select(col(idCol).cast("long").as("id"), col(textCol).cast("string").as("t"))
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
