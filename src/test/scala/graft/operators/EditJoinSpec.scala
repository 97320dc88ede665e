package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** EditJoin vs an independent brute-force: the PassJoin segment scheme
  * must have recall 1.0 (candidates are a superset of all true pairs)
  * and the verified output must equal the all-pairs DP result exactly. */
class EditJoinSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("edit-join-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Independent reference DP (full-matrix Wagner-Fischer) — written
    * against the definition, not Spark's implementation. */
  private def refEd(a: String, b: String): Int = {
    val (n, m) = (a.length, b.length)
    val dp = Array.tabulate(n + 1)(i => Array.tabulate(m + 1)(j => if (i == 0) j else if (j == 0) i else 0))
    for (i <- 1 to n; j <- 1 to m) {
      val sub = dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
      dp(i)(j) = math.min(sub, math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1))
    }
    dp(n)(m)
  }

  /** Corpus with planted near-pairs: base random token strings plus
    * copies mutated by exactly k random character edits (substitute /
    * insert / delete), k spanning both sides of the threshold. */
  private def corpus(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val toks = Vector("row", "scan", "agg", "join", "sort", "hash", "key", "value")
    def randDoc(): String =
      (0 until (8 + rnd.nextInt(12))).map(_ => toks(rnd.nextInt(toks.size))).mkString(" ")
    def mutate(s: String, k: Int): String = {
      var t = s
      for (_ <- 0 until k) {
        val p = rnd.nextInt(math.max(1, t.length))
        rnd.nextInt(3) match {
          case 0 if t.nonEmpty => t = t.updated(p, ('a' + rnd.nextInt(26)).toChar) // substitute
          case 1 => t = t.substring(0, p) + ('a' + rnd.nextInt(26)).toChar + t.substring(p) // insert
          case _ if t.length > 6 => t = t.substring(0, p) + t.substring(math.min(t.length, p + 1)) // delete
          case _ => ()
        }
      }
      t
    }
    val bases = (0 until n).map(_ => randDoc())
    val copies = bases.zipWithIndex.collect {
      case (s, i) if i % 3 == 0 => mutate(s, 1 + rnd.nextInt(8)) // ed 1..8, straddles d=4
    }
    (bases ++ copies).zipWithIndex.map { case (s, i) => (i.toLong, s) }
  }

  test("editJoin == brute-force DP on a planted-edit corpus (d = 4)") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val d = 4
    for (seed <- Seq(11, 42)) {
      val data = corpus(seed, 60)
      val docs = data.toDF("doc_id", "text")
      val got = EditJoin.editJoin(docs, d)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      val want = (for {
        (ia, ta) <- data; (ib, tb) <- data if ia < ib
        e = refEd(ta, tb) if e <= d
      } yield ((ia, ib), e.toLong)).toMap
      assert(got == want, s"seed=$seed: got ${got.size} pairs, want ${want.size}")
      assert(want.nonEmpty, s"seed=$seed: fixture must plant qualifying pairs")
      assert(want.values.exists(_ == d.toLong),
        s"seed=$seed: fixture must exercise the exact boundary ed == d")
    }
  }

  test("candidate generation is a superset of true pairs and not all-pairs") {
    import spark.implicits._
    val d = 3
    val data = corpus(7, 80)
    val docs = data.toDF("doc_id", "text")
    val cands = EditJoin.candidatePairs(docs, d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truePairs = (for {
      (ia, ta) <- data; (ib, tb) <- data if ia < ib && refEd(ta, tb) <= d
    } yield (ia, ib)).toSet
    assert(truePairs.subsetOf(cands), "segment filter dropped a true pair")
    val naive = data.size.toLong * (data.size - 1) / 2
    assert(cands.size.toLong * 4 <= naive,
      s"candidates ${cands.size} should prune most of the $naive pair space")
  }

  test("sub-threshold-length strings route through the short legs == brute force (d = 4)") {
    import spark.implicits._
    val d = 4
    // shorts (< d+1 = 5 chars, incl. empty), boundary-length longs
    // (5..2d = 8 chars — reachable from shorts), and far longs (> 2d)
    val data: Seq[(Long, String)] = Seq(
      0L -> "", 1L -> "ab", 2L -> "abcd", 3L -> "wxyz",
      4L -> "abcde", 5L -> "abcdefgh", 6L -> "zzzzzzzz",
      7L -> "abcdefghijklmnop", 8L -> "ab" // duplicate short content, new id
    )
    val docs = data.toDF("doc_id", "text")
    val got = EditJoin.editJoin(docs, d)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val want = (for {
      (ia, ta) <- data; (ib, tb) <- data if ia < ib
      e = refEd(ta, tb) if e <= d
    } yield ((ia, ib), e.toLong)).toMap
    assert(want.exists { case ((a, b), _) => a <= 3 && b <= 3 },
      "fixture must plant short-short pairs")
    assert(want.exists { case ((a, b), _) => b >= 4 && a <= 3 },
      "fixture must plant a short-long pair")
    assert(!want.contains((0L, 7L)), "far long must be out of a short's reach")
    assert(got == want, s"got $got, want $want")
  }

  test("null text == empty string through the short legs; empty corpus returns empty") {
    import spark.implicits._
    val d = 4
    val withNull = Seq((1L, "abcdefgh"), (2L, null.asInstanceOf[String]),
      (3L, "abc")).toDF("doc_id", "text")
    val got = EditJoin.editJoin(withNull, d)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // ed("", "abc") = 3 qualifies; ed vs the 8-char long is the length
    // gap (> d from "", exactly... 8 > 4 so out; 5 from "abc" so out)
    assert(got == Map((2L, 3L) -> 3L), s"got $got")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(EditJoin.editJoin(empty, 4).count() == 0L)
  }

  test("the short-leg cap fails loudly instead of materializing a quadratic answer") {
    import spark.implicits._
    val d = 2
    val docs = (0L until EditJoin.ShortLegCap + 1).map(i => (i, "ab"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      EditJoin.candidatePairs(docs, d, "doc_id", "text").count())
    assert(e.getMessage.contains("quadratic"), e.getMessage)
  }

  test("probe index matchOne == brute-force DP across shorter/longer/short refs (d = 4)") {
    val d = 4
    val rnd = new scala.util.Random(19)
    def mut(s: String, k: Int): String = {
      var t = s
      for (_ <- 0 until k) {
        val p = rnd.nextInt(math.max(1, t.length))
        rnd.nextInt(3) match {
          case 0 if t.nonEmpty => t = t.updated(p, ('a' + rnd.nextInt(26)).toChar)
          case 1 => t = t.substring(0, p) + ('a' + rnd.nextInt(26)).toChar + t.substring(p)
          case _ if t.length > 2 => t = t.substring(0, p) + t.substring(math.min(t.length, p + 1))
          case _ => ()
        }
      }
      t
    }
    val bases = (0 until 30).map(_ =>
      (0 until (10 + rnd.nextInt(20))).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString)
    // refs: some bases, short refs (<= d), and an empty ref
    val refs: Array[(Long, String)] =
      (bases.take(10).zipWithIndex.map { case (s, i) => (1000L + i, s) } ++
        Seq((2000L, "ab"), (2001L, ""), (2002L, "abcd"))).toArray
    // stream rows: mutations straddling d on both sides (insertions make
    // some LONGER than their ref — the la > l probe path), short rows,
    // and unrelated strings
    val stream: Seq[(Long, String)] =
      bases.take(10).zipWithIndex.flatMap { case (s, i) =>
        Seq((10L * i, mut(s, 1 + rnd.nextInt(8))), (10L * i + 1, mut(s, 6)))
      } ++ Seq((900L, "abc"), (901L, ""), (902L, "zzzzzzzzzzzzzzzzzz"))
    val idx = EditJoin.buildProbeIndex(refs, d)
    val got = stream.flatMap { case (sid, t) =>
      EditJoin.matchOne(idx, t).map { case (rid, ed) => ((sid, rid), ed) }
    }.toMap
    val want = (for {
      (sid, t) <- stream; (rid, rt) <- refs
      e = refEdCp(t, rt) if e <= d
    } yield ((sid, rid), e)).toMap
    assert(want.nonEmpty && want.values.exists(_ == d),
      "fixture must plant pairs incl. the ed == d boundary")
    // the la > l probe path must be exercised: some qualifying pair has
    // a ref strictly longer than its stream row
    val streamLen = stream.toMap.view.mapValues(_.codePoints().count()).toMap
    val refLen = refs.toMap.view.mapValues(_.codePoints().count()).toMap
    assert(want.keys.exists { case (sid, rid) => refLen(rid) > streamLen(sid) },
      "fixture must plant a longer-ref pair (la > l probe path)")
    assert(got == want, s"missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
  }

  test("bandedEd == full DP on random pairs incl. astral code points") {
    val rnd = new scala.util.Random(5)
    for (_ <- 0 until 300) {
      val d = 1 + rnd.nextInt(5)
      def gen(n: Int) = Array.fill(n)(
        if (rnd.nextBoolean()) 'a'.toInt + rnd.nextInt(4) else 0x1F600 + rnd.nextInt(4))
      val a = gen(rnd.nextInt(20))
      val b = gen(rnd.nextInt(20))
      val sa = new String(a, 0, a.length)
      val sb = new String(b, 0, b.length)
      val full = refEdCp(sa, sb)
      val banded = EditJoin.bandedEd(a, b, d)
      assert(banded == (if (full <= d) full else -1),
        s"d=$d a=${a.toSeq} b=${b.toSeq} full=$full banded=$banded")
    }
  }

  /** Reference DP over CODE POINTS — the unit both Spark `levenshtein`
    * and the segmentation must agree on. */
  private def refEdCp(a: String, b: String): Int = {
    val x = a.codePoints().toArray
    val y = b.codePoints().toArray
    val dp = Array.tabulate(x.length + 1)(i => Array.tabulate(y.length + 1)(
      j => if (i == 0) j else if (j == 0) i else 0))
    for (i <- 1 to x.length; j <- 1 to y.length) {
      val sub = dp(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1)
      dp(i)(j) = math.min(sub, math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1))
    }
    dp(x.length)(y.length)
  }

  test("astral-plane text: segmentation counts code points, not UTF-16 units (d = 4)") {
    import spark.implicits._
    val d = 4
    // 25 astral code points = 50 UTF-16 units. DELETING 4 code points is
    // ed = 4 but shifts the UTF-16 length by 8 — a unit-based probe
    // window (la in [|b|-d, |b|]) can never reach the short side's
    // unit length, so this pair is the regression case unit-based
    // segmentation silently misses.
    val baseCps = (0 until 25).map(0x1F600 + _).toArray
    def str(cps: Array[Int]): String = new String(cps, 0, cps.length)
    def dropAt(cps: Array[Int], ps: Seq[Int]): Array[Int] =
      cps.zipWithIndex.collect { case (c, i) if !ps.contains(i) => c }
    def subAt(cps: Array[Int], ps: Seq[Int]): Array[Int] =
      cps.zipWithIndex.map { case (c, i) => if (ps.contains(i)) 0x1F900 + i else c }
    val data = Seq(
      0L -> str(baseCps),
      1L -> str(dropAt(baseCps, Seq(3, 9, 15, 21))),      // ed 4 via deletions
      2L -> str(subAt(baseCps, Seq(2, 8, 14, 20))),       // ed 4 via substitutions
      3L -> str(dropAt(baseCps, Seq(1, 6, 11, 16, 22))),  // ed 5 vs base
      4L -> str((0 until 25).map(0x1D100 + _).toArray))   // unrelated
    val docs = data.toDF("doc_id", "text")
    val got = EditJoin.editJoin(docs, d)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val want = (for {
      (ia, ta) <- data; (ib, tb) <- data if ia < ib
      e = refEdCp(ta, tb) if e <= d
    } yield ((ia, ib), e.toLong)).toMap
    assert(want.contains((0L, 1L)), "fixture must plant the deletion-shift pair")
    assert(want.contains((0L, 2L)), "fixture must plant the substitution pair")
    assert(!want.contains((0L, 3L)), "ed-5 mutant must sit outside the threshold")
    assert(got == want, s"got ${got.keySet}, want ${want.keySet}")
  }
}
