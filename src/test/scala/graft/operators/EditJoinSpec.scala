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

  test("sub-threshold-length strings are rejected, not silently dropped") {
    import spark.implicits._
    val docs = Seq((1L, "abcdef"), (2L, "ab")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](EditJoin.editJoin(docs, 4))
    assert(e.getMessage.contains("all-pairs leg"))
  }
}
