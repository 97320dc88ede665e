package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins Wordpiece: the likelihood-gain selection rule (vs BPE's raw
  * count — a corpus where they disagree), BigInt cross-multiplied
  * comparisons at counts where Long products overflow, distributed ==
  * sequential-reference training, greedy longest-match inference with
  * the whole-word [UNK] rule, and seeded-fault sensitivity of the
  * witness comparison. */
class WordpieceSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(texts: String*) = {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("selection maximizes count/(left*right), not raw count (the BPE-disagreement corpus)") {
    // pair (a,##b) occurs 10x but its symbols are everywhere (score
    // 10/(100*10)); (c,##d) occurs 3x with rare symbols (score 3/9) —
    // WordPiece must pick (c,##d) first, BPE would pick (a,##b)
    val d = docs((Seq.fill(10)("ab") ++ Seq.fill(90)("a") ++
      Seq.fill(3)("cd")).mkString(" "))
    val merges = Wordpiece.train(spark, d, numMerges = 1)
    assert(merges == Seq(("c", "##d")))
    // BPE's raw-count rule picks the frequent pair instead (its symbol
    // alphabet includes the </w> marker, where (a, </w>) dominates)
    assert(Bpe.train(spark, d, numMerges = 1).head == (("a", "</w>")))
  }

  test("cross-multiplied comparison is exact where Long products overflow") {
    // scores 4e11/(8e11*8e11) vs 3e11/(5e11*8e11): 6.25e-13 vs
    // 7.5e-13 — verify against exact BigDecimal arithmetic; Long math
    // would overflow both products
    val x = ("aa", "##x", 400000000000L, 800000000000L, 800000000000L)
    val y = ("ab", "##y", 300000000000L, 500000000000L, 800000000000L)
    val exact = BigDecimal(x._3) / (BigDecimal(x._4) * BigDecimal(x._5)) >
      BigDecimal(y._3) / (BigDecimal(y._4) * BigDecimal(y._5))
    assert(Wordpiece.better(x, y) == exact)
    assert(Wordpiece.better(y, x) == !exact)
    // exact score ties break on the lexicographically smaller pair
    val t1 = ("b", "##c", 10L, 20L, 30L)
    val t2 = ("b", "##d", 10L, 30L, 20L)
    assert(Wordpiece.better(t1, t2) && !Wordpiece.better(t2, t1))
  }

  test("distributed training equals the sequential reference on a generated corpus") {
    val words = (0 until 400).map { i =>
      val w = s"${('a' + i % 7).toChar}${('k' + i % 5).toChar}${('p' + i % 3).toChar}"
      w * (1 + i % 3)
    }
    val d = docs(words.grouped(40).map(_.mkString(" ")).toSeq: _*)
    val dist = Wordpiece.train(spark, d, numMerges = 12)
    val vocab = Bpe.wordCounts(d).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val ref = Wordpiece.trainReference(vocab, numMerges = 12)
    assert(dist.nonEmpty && dist == ref)
    // a seeded fault (dropped first merge) must fail the comparison
    assert(dist.drop(1) != ref)
  }

  test("greedy inference: longest match first, ## continuations, whole-word [UNK]") {
    val vocab = Seq("t", "th", "s", "sc", "w", "j", "join",
      "##a", "##b", "##l", "##e", "##n", "##able", "##ow")
    val out = Wordpiece.encode(
      docs("the table scan", "join now", "value"), vocab).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // the -> th+##e (2); table -> t+##able (2, longest beats ##a##b..);
    // scan -> sc+##a+##n (3)
    assert(out(0L) == ((3L, 7L, 0L)))
    // join -> join (1); now -> UNK? n is not a start piece -> whole-word
    // [UNK] (1 piece, 1 unk)
    assert(out(1L) == ((2L, 2L, 1L)))
    // value: no 'v' start piece -> [UNK]
    assert(out(2L) == ((1L, 1L, 1L)))
  }

  test("encode totals are word-frequency linear (memoized distinct words)") {
    val vocab = Seq("a", "##b")
    val out = Wordpiece.encode(docs("ab ab ab ab"), vocab).collect().head
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) == ((4L, 8L, 0L)))
  }
}
