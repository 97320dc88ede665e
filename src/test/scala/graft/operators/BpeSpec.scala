package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge learning: known-answer merges, distributed == sequential
  * witness, determinism under repartitioning, and the early-stop rule. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("bpe-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df(texts: String*) = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("known answer: 'ab ab ab' learns (a,b) then (ab,</w>) and stops") {
    val merges = Bpe.train(spark, df("ab ab ab"), numMerges = 10)
    assert(merges == Seq(("a", "b"), ("ab", Bpe.Eow)))
  }

  test("tie-break is lexicographic on (left, right) at equal counts") {
    // 'ba ba ba': pairs (b,a) and (a,</w>) both count 3 -> (a,</w>) first
    val merges = Bpe.train(spark, df("ba ba ba"), numMerges = 1)
    assert(merges == Seq(("a", Bpe.Eow)))
  }

  test("no repeated pair -> zero merges (early stop)") {
    assert(Bpe.train(spark, df("ab cd"), numMerges = 5).isEmpty)
  }

  test("distributed == sequential reference on the fixture corpus, any partitioning") {
    val docs = graft.sources.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val vocab = Bpe.wordCounts(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val ref = Bpe.trainReference(vocab, numMerges = 25)
    assert(ref.length == 25, "fixture corpus too small for 25 merges")
    val d1 = Bpe.train(spark, docs.repartition(1), numMerges = 25)
    val d7 = Bpe.train(spark, docs.repartition(7), numMerges = 25)
    assert(d1 == ref)
    assert(d7 == ref)
  }

  test("segment: learned merges collapse trained words, leave novel words at chars+1") {
    val corpus = df("ab ab ab")
    val merges = Bpe.train(spark, corpus, numMerges = 10)
    val out = Bpe.segment(df("ab ab xyz"), merges)
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    // 'ab' -> [ab</w>] (1 subword) twice; 'xyz' unseen -> x y z </w> (4)
    assert(out == ((3L, 6L)))
  }

  test("segment: subword count bounded by [n_words, chars + n_words] on the fixture corpus") {
    val docs = graft.sources.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.train(spark, docs, numMerges = 25)
    val joined = Bpe.segment(docs, merges)
      .join(docs, "doc_id")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val nWords = r.getAs[Long]("n_words")
      val nSubs = r.getAs[Long]("n_subwords")
      val text = r.getAs[String]("text")
      val chars = text.replace(" ", "").length
      assert(nSubs >= nWords, "every word yields at least one subword")
      assert(nSubs <= chars + nWords, "subwords cannot exceed chars + eow markers")
    }
  }

  test("witness equality is falsifiable: a perturbed vocabulary diverges") {
    val docs = graft.sources.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val vocab = Bpe.wordCounts(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val ref = Bpe.trainReference(vocab, numMerges = 25)
    // doubling one mid-frequency word's count must reorder some merge
    val perturbed = vocab.sortBy(-_._2) match {
      case s => s.updated(s.length / 2, (s(s.length / 2)._1, s(s.length / 2)._2 * 100))
    }
    val refP = Bpe.trainReference(perturbed, numMerges = 25)
    assert(ref != refP, "witness would not detect a count-corruption fault")
  }
}
