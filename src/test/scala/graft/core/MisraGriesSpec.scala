package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Misra–Gries survival guarantee, under-count-only errors, and merge
  * correctness across arbitrary stream splits — the properties
  * CorpusOps.heavyHitters' pass-1 pruning depends on. */
class MisraGriesSpec extends AnyFunSuite {

  private def trueCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def checkInvariants(mg: MisraGries, xs: Seq[String]): Unit = {
    val tc = trueCounts(xs)
    assert(mg.n == xs.length)
    assert(mg.counts.size <= mg.k)
    val bound = xs.length.toDouble / (mg.k + 1)
    tc.foreach { case (t, c) =>
      val sk = mg.counts.getOrElse(t, 0L)
      assert(sk <= c, s"over-count: $t sketch=$sk true=$c")
      assert(sk >= c - bound, s"under-count beyond n/(k+1): $t sketch=$sk true=$c bound=$bound")
      if (c > bound) assert(mg.counts.contains(t), s"heavy item $t (count $c > $bound) evicted")
    }
  }

  private def adversarialStream(rnd: Random): Seq[String] = {
    // few heavy items buried in a long distinct tail, shuffled
    val heavy = (0 until 5).flatMap(i => Seq.fill(200 + i)(s"h$i"))
    val tail = (0 until 3000).map(i => s"t$i")
    rnd.shuffle(heavy ++ tail)
  }

  test("single-stream survival + error bound on adversarial input") {
    for (seed <- 0 until 5; k <- Seq(7, 16, 100)) {
      val xs = adversarialStream(new Random(seed))
      val mg = xs.foldLeft(new MisraGries(k))(_.add(_))
      checkInvariants(mg, xs)
    }
  }

  test("merge across arbitrary splits keeps the combined-stream bound") {
    for (seed <- 0 until 5) {
      val rnd = new Random(100 + seed)
      val xs = adversarialStream(rnd)
      // random 6-way split, random merge order (simulates treeAggregate)
      val parts = xs.groupBy(_ => rnd.nextInt(6)).values.toSeq
      val sketches = parts.map(p => p.foldLeft(new MisraGries(16))(_.add(_)))
      val merged = rnd.shuffle(sketches).reduce(_.merge(_))
      checkInvariants(merged, xs)
    }
  }

  test("property: invariants hold for arbitrary streams, k, and merge splits") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    val itemGen = Gen.frequency(
      (3, Gen.choose(0, 4).map(i => s"hot$i")), // skewed head
      (2, Gen.choose(0, 2000).map(i => s"cold$i"))) // long tail
    val streamGen = Gen.listOfN(400, itemGen)
    val prop = forAll(streamGen, Gen.choose(1, 40), Gen.choose(1, 8)) {
      (xs, k, nParts) =>
        val single = xs.foldLeft(new MisraGries(k))(_.add(_))
        checkInvariants(single, xs)
        val parts = xs.zipWithIndex.groupBy(_._2 % nParts).values
          .map(_.map(_._1))
        val merged = parts.map(p => p.foldLeft(new MisraGries(k))(_.add(_)))
          .reduce(_.merge(_))
        checkInvariants(merged, xs)
        Prop.passed
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("merge of disjoint small streams is exact below capacity") {
    val a = Seq("x", "x", "y").foldLeft(new MisraGries(10))(_.add(_))
    val b = Seq("y", "z").foldLeft(new MisraGries(10))(_.add(_))
    val m = a.merge(b)
    assert(m.counts == scala.collection.mutable.HashMap("x" -> 2L, "y" -> 2L, "z" -> 1L))
    assert(m.n == 5)
  }
}
