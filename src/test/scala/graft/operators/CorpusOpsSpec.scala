package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-management + TF-IDF operators: determinism and rate behavior of
  * the stratified sampler, brute-force equivalence for vocabulary stats
  * and decontamination, and perfect recall of the prefix-filtered cosine
  * join against the unfiltered join. */
class CorpusOpsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("corpus-ops-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = {
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Fixtures.documents(spark, "/root/testdata/sf0.001")
  }

  test("stratified sample: deterministic, subset, rates honored") {
    val rates = Map("en" -> 0.25, "zh" -> 1.0, "de" -> 0.0)
    val s1 = CorpusOps.stratifiedSample(docs, "lang", rates, defaultRate = 0.5)
    val s2 = CorpusOps.stratifiedSample(docs, "lang", rates, defaultRate = 0.5)
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = s2.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2, "sampler not deterministic across runs")
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1.subsetOf(all))
    // per-stratum: rate 1.0 keeps everything, rate 0.0 keeps nothing,
    // fractional rates keep a binomially-plausible share
    val byLang = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.getOrElse("zh", 0L) == totals("zh"), "rate 1.0 must keep all")
    assert(byLang.getOrElse("de", 0L) == 0L, "rate 0.0 must keep none")
    val enKept = byLang.getOrElse("en", 0L).toDouble / totals("en")
    assert(enKept > 0.05 && enKept < 0.6, s"en keep share $enKept implausible for 0.25")
  }

  test("topNgrams == brute-force per-group counts with (count desc, gram) ties") {
    val got = CorpusOps.topNgrams(docs, "lang", n = 2, k = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val raw = docs.select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = scala.collection.mutable.Map[(String, String), Long]()
    raw.foreach { case (lang, text) =>
      val t = text.split(" ", -1)
      val grams =
        if (t.length < 2) Seq(text.replace(" ", "_"))
        else t.sliding(2).map(_.mkString("_")).toSeq
      grams.foreach { g => counts((lang, g)) = counts.getOrElse((lang, g), 0L) + 1 }
    }
    val expected = counts.groupBy(_._1._1).flatMap { case (lang, m) =>
      m.toSeq.map { case ((_, g), c) => (g, c) }
        .sortBy { case (g, c) => (-c, g) }
        .take(5).zipWithIndex
        .map { case ((g, c), i) => (lang, g, c, (i + 1).toLong) }
    }.toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("decontaminationJoin == brute-force distinct-shingle intersection") {
    val all = docs
    val eval = all.filter(col("source") === "src0")
    val train = all.filter(col("source") =!= "src0")
    val got = CorpusOps.decontaminationJoin(train, eval, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def shingleSet(text: String): Set[String] = {
      val t = text.split(" ", -1)
      if (t.length < 3) Set(text.replace(" ", "_"))
      else t.sliding(3).map(_.mkString("_")).toSet
    }
    val evalRows = eval.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), shingleSet(r.getString(1))))
    val trainRows = train.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), shingleSet(r.getString(1))))
    val expected = (for {
      (eid, es) <- evalRows; (tid, ts) <- trainRows
      shared = (es & ts).size if shared > 0
    } yield (eid, tid) -> shared.toLong).toMap
    assert(got == expected,
      s"pairs got=${got.size} expected=${expected.size}")
    assert(expected.nonEmpty, "decontamination test vacuous at sf0.001")

    // df-cap: with the cap above every shingle's train-df the output is
    // IDENTICAL; with a cap of 1, only shingles unique to one training
    // doc count — replayed against the brute force under the same rule
    val maxDf = trainRows.flatMap(_._2).groupBy(identity).values.map(_.size).max
    val gotUncapped = CorpusOps.decontaminationJoin(train, eval, n = 3,
        maxTrainDf = maxDf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(gotUncapped == expected, "cap above max df must not change output")
    val hot = trainRows.flatMap(_._2).groupBy(identity)
      .collect { case (g, occ) if occ.size > 1 => g }.toSet
    val expectedCapped = (for {
      (eid, es) <- evalRows; (tid, ts) <- trainRows
      shared = ((es & ts) -- hot).size if shared > 0
    } yield (eid, tid) -> shared.toLong).toMap
    val gotCapped = CorpusOps.decontaminationJoin(train, eval, n = 3,
        maxTrainDf = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(gotCapped == expectedCapped)
    assert(gotCapped.size < got.size, "cap=1 must actually drop hot-only pairs")
  }

  test("tfidf cosineJoin: prefix filter has perfect recall vs unfiltered join") {
    import spark.implicits._
    // the unfiltered reference: every token-sharing pair scored
    val n = docs.count()
    val w = TfIdf.weights(docs, n)
    val norms = w.groupBy(col("id")).agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val brute = w.select(col("id").as("rid"), col("tok"), col("w").as("wa"))
      .join(w.select(col("id").as("sid"), col("tok"), col("w").as("wb")), "tok")
      .filter(col("rid") < col("sid"))
      .groupBy("rid", "sid").agg(sum(col("wa") * col("wb")).as("dot"))
      .join(norms.select(col("id").as("rid"), col("nrm").as("na")), "rid")
      .join(norms.select(col("id").as("sid"), col("nrm").as("nb")), "sid")
      .withColumn("cosine", col("dot") / (col("na") * col("nb")))
    for (tau <- Seq(0.5, 0.9)) {
      val expected = brute.filter(col("cosine") >= tau)
        .select("rid", "sid").as[(Long, Long)].collect().toSet
      // dense path (this corpus' vocab fits the probe) ...
      val dense = TfIdf.cosineJoin(spark, docs, tau)
        .select("rid", "sid").as[(Long, Long)].collect().toSet
      // ... and the sparse prefix-filter path, forced (denseVocabMax = 0):
      // path choice must not change the answer
      val sparse = TfIdf.cosineJoin(spark, docs, tau, denseVocabMax = 0)
        .select("rid", "sid").as[(Long, Long)].collect().toSet
      assert(dense == expected,
        s"dense tau=$tau missed=${(expected -- dense).size} extra=${(dense -- expected).size}")
      assert(sparse == expected,
        s"sparse tau=$tau missed=${(expected -- sparse).size} extra=${(sparse -- expected).size}")
      assert(expected.nonEmpty, s"tau=$tau recall test vacuous")
    }
  }

  test("packSequences == driver-side concat-and-chunk over id order") {
    val got = CorpusOps.packSequences(docs, maxLen = 512)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).length.toLong))
      .sortBy(_._1)
    var cum = 0L
    val expected = rows.map { case (id, n) =>
      val start = cum; cum += n
      (id, (n, start / 512, (cum - 1) / 512, start % 512))
    }.toMap
    assert(got == expected)
    // chunk-map sanity: windows tile the corpus without gaps
    assert(got.values.map(_._1).sum == cum)
  }

  test("packSequences prefix sum survives many partitions") {
    import spark.implicits._
    val tiny = (1L to 100L).map(i => (i, Seq.fill(i.toInt % 7 + 1)("w").mkString(" ")))
      .toDF("doc_id", "text").repartition(13)
    val got = CorpusOps.packSequences(tiny, maxLen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).sortBy(_._1)
    var cum = 0L
    val expected = (1L to 100L).map { i =>
      val n = i % 7 + 1
      val start = cum; cum += n
      (i, start / 10, start % 10)
    }
    assert(got.toSeq == expected)
  }

  test("tokenBudget keeps best-quality docs within the per-group budget") {
    val kept = CorpusOps.tokenBudget(docs, "lang", budget = 2500)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getDouble(3)))
    val byGroup = kept.groupBy(_._1)
    assert(byGroup.nonEmpty)
    byGroup.foreach { case (g, rows) =>
      assert(rows.map(_._3).sum <= 2500, s"group $g over budget")
    }
    // greedy property: every kept doc's (rounded) score is >= every
    // dropped doc's score in its group, except where the budget cut
    // lands mid-tie (the doc_id tie-break) — check the strict part
    val all = docs.select(col("lang"), col("doc_id"),
        graft.functions.TextCols.tokenCount(col("text")).cast("long").as("n"),
        round(graft.functions.TextCols.qualityScore(col("text")), 6).as("score"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    byGroup.foreach { case (g, rows) =>
      val keptIds = rows.map(_._2).toSet
      val minKept = rows.map(_._4).min
      val droppedAbove = all.filter(t => t._1 == g && !keptIds.contains(t._2))
        .count(_._4 > minKept)
      assert(droppedAbove == 0, s"group $g dropped a strictly-better doc")
    }
  }

  test("tfidf cosineJoin handles single-token and identical documents") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "alpha"), (2L, "alpha"), // identical one-token docs: cos = 1
      (3L, "beta gamma beta"), (4L, "beta gamma beta"), // identical multi
      (5L, "delta")                 // no partner
    ).toDF("doc_id", "text")
    val got = TfIdf.cosineJoin(spark, tiny, 0.999)
      .select("rid", "sid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (3L, 4L)), s"got $got")
  }

  test("fixedSample: exact group sizes, deterministic, rank-consistent") {
    val s1 = CorpusOps.fixedSample(docs, "lang", 7)
    val rows = s1.select("lang", "doc_id", "smp_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val sizes = rows.groupBy(_._1).view.mapValues(_.length).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (g, n) =>
      assert(sizes.getOrElse(g, 0) == math.min(7L, n),
        s"group $g expected ${math.min(7L, n)} got ${sizes.getOrElse(g, 0)}")
    }
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
    }
    val s2 = CorpusOps.fixedSample(docs, "lang", 7)
      .select("lang", "doc_id", "smp_rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet == s2.toSet, "fixed sample not deterministic")
  }

  test("groupQuantiles == brute-force order statistics") {
    val got = CorpusOps.groupQuantiles(docs, "lang",
        graft.functions.TextCols.tokenCount(col("text")), Seq(0.25, 0.5, 1.0))
      .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getLong(2))).toMap
    val all = docs.select(col("lang"),
        graft.functions.TextCols.tokenCount(col("text")).cast("long"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    all.groupBy(_._1).foreach { case (g, rs) =>
      val sorted = rs.sortBy(t => (t._2, t._3)).map(_._2)
      for (q <- Seq(0.25, 0.5, 1.0)) {
        val want = sorted(math.ceil(q * sorted.length).toInt - 1)
        assert(got((g, q)) == want, s"group $g q=$q")
      }
    }
    // max quantile is the group max
    assert(got.keys.count(_._2 == 1.0) == all.map(_._1).distinct.length)
  }

  test("spanOwnership == brute-force first-occurrence shingle ownership") {
    import spark.implicits._
    val all = docs.select("doc_id", "text").as[(Long, String)].collect()
    def sh(text: String): Set[String] = {
      val t = text.split(" ", -1)
      if (t.length < 3) Set(text.replace(' ', '_'))
      else (0 to t.length - 3).map(i => s"${t(i)}_${t(i + 1)}_${t(i + 2)}").toSet
    }
    val owner = scala.collection.mutable.Map.empty[String, Long]
    all.sortBy(_._1).foreach { case (id, text) =>
      sh(text).foreach(g => if (!owner.contains(g)) owner(g) = id) }
    val want = all.map { case (id, text) =>
      val gs = sh(text)
      (id, gs.size.toLong, gs.count(g => owner(g) == id).toLong)
    }.toSet
    val got = CorpusOps.spanOwnership(docs, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // at least one document must actually duplicate an earlier span
    assert(want.exists(t => t._3 < t._2), "fixture has no cross-doc duplicate spans")
  }

  test("spanRewrite == brute-force span removal, incl. emptied short dups") {
    import spark.implicits._
    // fixture docs plus seeded cases: a full duplicate (must empty), a
    // partial overlap (prefix stolen by the earlier doc), and a short
    // duplicate (whole-text shingle, must empty)
    val fixture = docs.select("doc_id", "text").as[(Long, String)].collect() ++ Seq(
      (8001L, "alpha beta gamma delta epsilon zeta"),
      (8002L, "alpha beta gamma delta epsilon zeta"),
      (8003L, "alpha beta gamma NEW1 NEW2 NEW3 NEW4"),
      (8004L, "tiny doc"), (8005L, "tiny doc"))
    val df = fixture.toSeq.toDF("doc_id", "text")
    def shOcc(text: String): Seq[(Int, Int, String)] = {
      val t = text.split(" ", -1)
      if (t.length < 3) Seq((1, t.length, text.replace(' ', '_')))
      else (0 to t.length - 3).map(i =>
        (i + 1, i + 3, s"${t(i)}_${t(i + 1)}_${t(i + 2)}"))
    }
    val owner = scala.collection.mutable.Map.empty[String, Long]
    fixture.sortBy(_._1).foreach { case (id, text) =>
      shOcc(text).foreach { case (_, _, g) =>
        if (!owner.contains(g)) owner(g) = id } }
    val want = fixture.map { case (id, text) =>
      val t = text.split(" ", -1)
      val badSpans = shOcc(text).filter { case (_, _, g) => owner(g) != id }
      val keep = t.indices.filter { i0 =>
        val i = i0 + 1
        !badSpans.exists { case (s, e, _) => s <= i && i <= e }
      }.map(t)
      (id, t.length.toLong, keep.length.toLong, keep.mkString(" "))
    }.toSet
    val got = CorpusOps.spanRewrite(df, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got == want)
    // the seeded shapes actually exercised their paths
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(8002L)._4 == "", "full duplicate must empty")
    assert(byId(8005L)._4 == "", "short duplicate must empty")
    assert(byId(8003L)._3 > 0 && byId(8003L)._3 < 7, "partial overlap must lose its stolen prefix only")
  }

  test("span maxDf cap: identity when unexceeded, hot grams leave the analysis") {
    import spark.implicits._
    val df = Seq(
      (1L, "hot hot hot uniq1 uniq2 uniq3"),
      (2L, "hot hot hot uniq4 uniq5 uniq6"),
      (3L, "hot hot hot uniq7 uniq8 uniq9")).toDF("doc_id", "text")
    // hot_hot_hot has df=3; every other gram df=1
    def ownRows(maxDf: Int) = CorpusOps.spanOwnership(df, 3, maxDf = maxDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def rewRows(maxDf: Int) = CorpusOps.spanRewrite(df, 3, maxDf = maxDf)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(ownRows(3) == ownRows(0), "cap above max df must not change ownership")
    assert(rewRows(3) == rewRows(0), "cap above max df must not change rewrite")
    // cap=2 drops hot_hot_hot: docs 2/3 no longer carry any dup evidence
    // (their only shared gram is capped), so every token survives
    val capped = rewRows(2).toMap
    assert(capped(2L) == "hot hot hot uniq4 uniq5 uniq6")
    assert(capped(3L) == "hot hot hot uniq7 uniq8 uniq9")
    // uncapped, the shared hot gram kills docs 2/3's covered prefix
    val uncapped = rewRows(0).toMap
    assert(uncapped(2L) == "uniq4 uniq5 uniq6" && uncapped(3L) == "uniq7 uniq8 uniq9")
    // ownership with cap=2: the capped gram is in neither n_shingles nor
    // dup evidence
    val own = ownRows(2).map(t => t._1 -> t).toMap
    assert(own(2L)._2 == 3L && own(2L)._3 == 3L, s"got ${own(2L)}")
  }

  test("spanOwnership keeps one row per doc when every gram is capped") {
    import spark.implicits._
    // doc 2's ONLY gram (short doc -> one whole-text shingle) is shared
    // by all three docs; cap=2 removes it from the analysis entirely,
    // but the per-doc contract must still emit doc 2's row
    val df = Seq(
      (1L, "same same same uniq1 uniq2"),
      (2L, "same same same"),
      (3L, "same same same uniq3 uniq4")).toDF("doc_id", "text")
    val rows = CorpusOps.spanOwnership(df, 3, maxDf = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L), s"got ${rows.keySet}")
    assert(rows(2L) == ((0L, 0L, 0.0)), s"got ${rows(2L)}")
  }

  test("winnowSpans: planted shared run is bracketed by the pair's spans") {
    import spark.implicits._
    // 7 shared tokens >= w + k - 1 = 6 -> at least one shared selected
    // fingerprint is guaranteed; all other tokens are doc-unique, so
    // every matched position lies INSIDE the planted run on both sides
    val shared = (1 to 7).map(i => s"s$i").mkString(" ")
    val doc1 = s"a1 a2 a3 a4 $shared b1 b2" // run shingle starts 5..9
    val doc2 = s"c1 $shared d1 d2 d3"       // run shingle starts 2..6
    val df = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")
    val spans = CorpusOps.winnowSpans(df, 3, 4, minShared = 1).collect()
    assert(spans.length == 1, s"got ${spans.length} pairs")
    val r = spans.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    val (nsh, rlo, rhi, slo, shi) =
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    assert(nsh >= 1)
    assert(rlo >= 5 && rhi <= 9, s"rid span [$rlo,$rhi] outside run")
    assert(slo >= 2 && shi <= 6, s"sid span [$slo,$shi] outside run")
    // the same grams matched on both sides: spans differ by the plant
    // offset exactly
    assert(rlo - slo == 3 && rhi - shi == 3, s"offset broken: $rlo/$slo $rhi/$shi")
    // evidence consistency: n_shared identical to winnowJoin's count
    val joins = CorpusOps.winnowJoin(df, 3, 4, minShared = 1).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(joins == Set((1L, 2L, nsh)))
  }

  test("spanRewrite is not quadratic in a fully-duplicated long doc") {
    import spark.implicits._
    // 20k-token doc duplicated: ~20k dup starts and every token has a
    // covering dup gram. The position-based array_except subtraction is
    // O(tokens + n*|dup_starts|) per row; both earlier shapes (per-start
    // array_contains over the dup-gram set; its map_from_arrays variant —
    // Spark map lookups are linear scans) were O(tokens * n * |dups|)
    // ~ 1.2G comparisons in this fixture (measured evidence in PLANS.md).
    val text = (0 until 20000).map(i => s"w${i % 19997}").mkString(" ")
    val df = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val got = CorpusOps.spanRewrite(df, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3).isEmpty)).toSet
    assert(got == Set((1L, 20000L, 20000L, false), (2L, 20000L, 0L, true)))
  }

  test("winnowFingerprints == brute force; winnowing guarantee holds") {
    import spark.implicits._
    val k = 3; val w = 4
    val all = docs.select("doc_id", "text").as[(Long, String)].collect()
    def md5b32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    def grams(text: String): Seq[String] = {
      val t = text.split(" ", -1)
      if (t.length < k) Seq(text.replace(' ', '_'))
      else (0 to t.length - k).map(i => t.slice(i, i + k).mkString("_"))
    }
    def winnow(text: String): Set[(Long, Long)] = {
      val keys = grams(text).zipWithIndex
        .map { case (g, i0) => md5b32(g) * 1073741824L + (i0 + 1) }
      val nW = math.max(keys.length - (w - 1), 1)
      (1 to nW).map(j => keys.slice(j - 1, j - 1 + w).min).distinct
        .map(key => (key % 1073741824L, key / 1073741824L)).toSet
    }
    val got = CorpusOps.winnowFingerprints(docs, k, w).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for ((id, text) <- all.take(40)) assert(got(id) == winnow(text), s"doc $id")
    // guarantee: docs sharing a run of >= w+k-1 tokens share >= 1 fp
    val shared = (0 until 10).map(i => s"shared$i").mkString(" ")
    val two = Seq(
      9001L -> (shared + " " + (0 until 7).map(i => s"ax$i").mkString(" ")),
      9002L -> ((0 until 5).map(i => s"bx$i").mkString(" ") + " " + shared))
      .toDF("doc_id", "text")
    val fps = CorpusOps.winnowFingerprints(two, k, w).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert((fps.filter(_._1 == 9001L).map(_._2).toSet
      intersect fps.filter(_._1 == 9002L).map(_._2).toSet).nonEmpty,
      "winnowing guarantee: a shared 10-token run must share a fingerprint")
    // the selection is genuinely sparse on the real corpus
    val nGrams = all.map(d => grams(d._2).length.toLong).sum
    val nSel = got.values.map(_.size.toLong).sum
    assert(nSel < nGrams, "vacuous: selection kept every gram")
  }

  test("winnowJoin == brute-force shared-fp pair counts; cap identity") {
    import spark.implicits._
    val fps = CorpusOps.winnowFingerprints(docs, 3, 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).distinct
    val want = fps.groupBy(_._2).values.flatMap { ds =>
      val ids = ds.map(_._1).distinct.sorted
      for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2L).toMap
    def run(maxDf: Int) = CorpusOps.winnowJoin(docs, 3, 4, minShared = 2,
        maxDf = maxDf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = run(0)
    assert(got == want)
    assert(got.nonEmpty, "vacuous: no shared-fingerprint pairs in the corpus")
    // a cap above the max document frequency must not change the output
    val maxdf = fps.groupBy(_._2).values.map(_.map(_._1).distinct.size).max
    assert(run(maxdf) == got)
  }

  test("qualityGate == brute-force integer rules; every rule non-vacuous") {
    import spark.implicits._
    val all = docs.select("doc_id", "text").as[(Long, String)].collect()
    val stops = Set("the", "and", "of", "to", "in", "is", "with", "for")
    def rules(text: String): (Long, Boolean, Boolean, Boolean, Boolean, Boolean) = {
      val t = text.split(" ", -1)
      val n = t.length.toLong
      val dset = t.distinct
      val d = dset.length.toLong
      val st = dset.count(stops).toLong
      val m = dset.map(x => t.count(_ == x)).max.toLong
      val g3 = if (t.length < 3) Seq(text.replace(' ', '_'))
        else t.sliding(3).map(_.mkString("_")).toSeq
      val rep = (g3.size - g3.distinct.size).toLong * 50 <= g3.size
      (n, n >= 15 && n <= 5000, d * 5 >= n * 2, st >= 1, m * 5 <= n, rep)
    }
    val want = all.map { case (id, text) =>
      val (n, a, b, c, dd, e) = rules(text)
      (id, n, a, b, c, dd, e, a && b && c && dd && e)
    }.toSet
    val got = CorpusOps.qualityGate(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6),
        r.getBoolean(7))).toSet
    assert(got == want)
    // calibration holds: each rule both passes and fails somewhere, and
    // the combined gate actually splits the corpus
    for ((idx, nm) <- Seq(3 -> "len", 4 -> "div", 5 -> "stop", 6 -> "top", 7 -> "rep")) {
      val vals = want.map(_.productElement(idx - 1).asInstanceOf[Boolean])
      assert(vals.size == 2, s"rule $nm vacuous (all ${vals.head})")
    }
    assert(want.map(_._8).size == 2, "combined gate vacuous")
  }

  test("shuffleRank == driver-side (hash, id) sort; dense, 1-based, deterministic") {
    import spark.implicits._
    // many partitions so per-partition offsets genuinely compose
    val ids = (1L to 5000L).map(i => (i, s"text $i"))
    val df = ids.toDF("doc_id", "text").repartition(16)
    val got = CorpusOps.shuffleRank(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val hashes = df.select(col("doc_id"),
        graft.functions.TextCols.md5Bits32(
          concat(lit("shuf"), lit(":"), col("doc_id").cast("string"))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = hashes.sortBy { case (id, h) => (h, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got == want)
    assert(got.values.toSeq.sorted == (1L to 5000L), "ranks not dense 1..N")
    // a different salt is a different permutation (not the identity map)
    val other = CorpusOps.shuffleRank(df, salt = "epoch2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(other != got)
  }

  test("unigramSurprisal == brute-force whole-bit surprisal") {
    import spark.implicits._
    val all = docs.select("doc_id", "text").as[(Long, String)].collect()
    val counts = all.flatMap(_._2.split(" ", -1)).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val total = counts.values.sum
    def bitlen(x: Long): Long = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val want = all.map { case (id, text) =>
      val t = text.split(" ", -1)
      val s = t.map(tok => bitlen(total) - bitlen(counts(tok))).sum
      (id, t.length.toLong, s)
    }.toSet
    val got = CorpusOps.unigramSurprisal(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // rare-token docs must actually score higher than boilerplate ones
    assert(want.map(_._3).size > 1, "vacuous: all docs identical surprisal")
  }

  test("unigramSurprisal degrades to an empty result on an empty corpus") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // sum(c) over zero rows is NULL — must yield 0 rows, not an NPE
    assert(CorpusOps.unigramSurprisal(empty).count() == 0)
  }

  test("oovRate == brute-force top-vocab coverage") {
    import spark.implicits._
    val all = docs.select("doc_id", "text").as[(Long, String)].collect()
    val counts = all.flatMap(_._2.split(" ", -1)).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(20).map(_._1).toSet
    val want = all.map { case (id, text) =>
      val t = text.split(" ", -1)
      (id, t.length.toLong, t.count(tok => !vocab(tok)).toLong)
    }.toSet
    val got = CorpusOps.oovRate(docs, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("chunkDocuments == driver-side sliding windows, incl. short docs") {
    import spark.implicits._
    val fixture = docs.select("doc_id", "text").as[(Long, String)].collect() ++
      Seq((9001L, "a"), (9002L, (1 to 32).map(i => s"t$i").mkString(" ")),
        (9003L, (1 to 33).map(i => s"t$i").mkString(" ")))
    val df = fixture.toSeq.toDF("doc_id", "text")
    val got = CorpusOps.chunkDocuments(df, window = 32, stride = 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val want = fixture.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      val nChunks = (math.max(toks.length - 32, 0) + 23) / 24 + 1
      (0 until nChunks).map { i =>
        val c = toks.slice(i * 24, math.min(i * 24 + 32, toks.length))
        val fp = java.security.MessageDigest.getInstance("MD5")
          .digest(c.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (id, i.toLong, c.length.toLong, fp)
      }
    }.toSet
    assert(got == want)
    // exactly one chunk for docs with <= window tokens; two for window+1
    assert(want.count(_._1 == 9002L) == 1)
    assert(want.count(_._1 == 9003L) == 2)
  }

  test("repetition kernels == brute-force counts") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "a b a b a"),          // top a=3/5; 2-grams: ab ba ab ba -> 2 distinct of 4
      (2L, "x"),                  // single token: shingles collapse to whole text
      (3L, "u v w x y z")         // all unique
    ).toDF("doc_id", "text")
    val got = tiny.select(col("doc_id"),
        graft.functions.TextCols.maxTokenCount(col("text")).as("m"),
        graft.functions.TextCols.dupNgramFraction(col("text"), 2).as("d2"))
      .as[(Long, Int, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(1L)._1 == 3 && math.abs(got(1L)._2 - 0.5) < 1e-12)
    assert(got(2L)._1 == 1 && got(2L)._2 == 0.0)
    assert(got(3L)._1 == 1 && got(3L)._2 == 0.0)
  }

  test("piiScrub: redaction classes, order, counts, and no-PII identity") {
    import spark.implicits._
    val in = Seq(
      // two emails, adjacent PII, phone, ip
      (1L, "mail a@x.co and b.c+tag@y.org call +1-555-0042 from 10.3.0.7 end"),
      // PII at string start and end, back-to-back
      (2L, "z@w.io +44-123-9999"),
      // no PII: bare '@' without TLD dot, digits without shape
      (3L, "keep a@b intact 12345 1-2-3 10.3 ok"),
      // ip would also prefix-match inside a longer dotted run: leftmost
      // match takes the first 4 octets, remainder stays
      (4L, "route 10.1.2.3.4 left")
    ).toDF("doc_id", "text")
    val out = CorpusOps.piiScrub(in).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == (("mail <EMAIL> and <EMAIL> call <PHONE> from <IP> end", 2L, 1L, 1L)))
    assert(out(2L) == (("<EMAIL> <PHONE>", 1L, 1L, 0L)))
    assert(out(3L) == (("keep a@b intact 12345 1-2-3 10.3 ok", 0L, 0L, 0L)))
    assert(out(4L) == (("route <IP>.4 left", 0L, 0L, 1L)))
  }

  test("piiScrub: email scrub runs first, so its digits never count as phone/ip") {
    import spark.implicits._
    val in = Seq((1L, "x +1-222-3333@host.com y")).toDF("doc_id", "text")
    // the email pattern's local part swallows '1-222-3333' (digits and
    // '-' are in its class, '+' too) -> whole token is ONE email, no phone
    val r = CorpusOps.piiScrub(in).head()
    assert(r.getString(1) == "x +<EMAIL> y" || r.getString(1) == "x <EMAIL> y")
    assert(r.getLong(3) == 0L) // no phone counted after email removal
  }

  test("heavyHitters == full groupBy HAVING on the fixture corpus") {
    for (phiDen <- Seq(100L, 1000L)) {
      val got = CorpusOps.heavyHitters(docs, phiDen = phiDen, sketchSize = 2048)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val toks = docs.select(explode(split(col("text"), " ")).as("t"))
        .collect().map(_.getString(0))
      val n = toks.length.toLong
      val expected = toks.groupBy(identity).view
        .mapValues(_.size.toLong).filter(_._2 * phiDen > n).toMap
      assert(got == expected, s"phiDen=$phiDen")
      assert(expected.nonEmpty, s"vacuous fixture at phiDen=$phiDen")
    }
  }

  test("heavyHitters stays exact at minimal legal sketch size + skewed partitioning") {
    import spark.implicits._
    // heavy tokens buried in a distinct tail that constantly evicts a
    // tiny sketch; single-token docs maximize partition imbalance churn
    val rows = ((0 until 40).map(i => s"heavy${i % 2}") ++
      (0 until 900).map(i => s"tail$i")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val in = spark.createDataset(rows).toDF("doc_id", "text").repartition(7)
    // n = 940: at phiDen=40 the bar is cnt >= 24 (heavy tokens have 20
    // each -> empty result); at phiDen=60 the bar is cnt >= 16 -> exactly
    // the two heavy tokens. Both run at the minimal legal sketch size.
    val got = CorpusOps.heavyHitters(in, phiDen = 40L, sketchSize = 39)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got2 = CorpusOps.heavyHitters(in, phiDen = 60L, sketchSize = 59)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.isEmpty)
    assert(got2 == Map("heavy0" -> 20L, "heavy1" -> 20L))
  }

  test("cdcChunks: reference partition, coverage, and the insertion-locality property") {
    import spark.implicits._
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    def isCut(tok: String) =
      java.lang.Long.parseLong(md5hex(tok).take(8), 16) % 32 == 0
    // independent reference: group tokens by prefix-cut-count, not a scan
    def refChunks(text: String): Seq[(Long, Long, String)] = {
      val toks = text.split(" ", -1)
      val cum = toks.scanLeft(0)((a, t) => a + (if (isCut(t)) 1 else 0))
      toks.indices.groupBy(i => cum(i)).toSeq.sortBy(_._1).zipWithIndex
        .map { case ((_, is), k) =>
          (k.toLong, is.length.toLong, md5hex(is.sorted.map(toks).mkString(" ")))
        }
    }
    val got = CorpusOps.cdcChunks(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val raw = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = raw.flatMap { case (id, t) =>
      refChunks(t).map { case (k, n, fp) => (id, k, n, fp) }
    }.toSet
    assert(got == want)
    assert(want.groupBy(_._1).values.exists(_.size > 1), "vacuous: need multi-chunk docs")
    // coverage: chunk token counts sum to the doc token count
    raw.foreach { case (id, t) =>
      assert(want.filter(_._1 == id).toSeq.map(_._3).sum == t.split(" ", -1).length)
    }
    // CDC locality: inserting one token changes at most ONE chunk's
    // fingerprint region (the chunk containing the insertion — possibly
    // split in two), all other fingerprints survive
    val (bid, btext) = raw.maxBy(_._2.split(" ").length)
    val btoks = btext.split(" ", -1)
    val inserted = (btoks.take(btoks.length / 2) ++ Array("INSERTEDTOKEN") ++
      btoks.drop(btoks.length / 2)).mkString(" ")
    val before = refChunks(btext).map(_._3)
    val after = refChunks(inserted).map(_._3)
    assert((before.toSet -- after.toSet).size <= 1,
      "insertion must invalidate at most the chunk it lands in")
    assert((after.toSet -- before.toSet).size <= 2,
      "insertion may add at most the split halves of the touched chunk")
  }

  test("bigramSurprisal == brute-force conditional bitlen, one row per doc") {
    import spark.implicits._
    def bitlen(x: Long) = java.lang.Long.toBinaryString(x).length
    val extra = Seq((90001L, "solo"), (90002L, "a a a a"), (90003L, "b a b"))
      .toDF("doc_id", "text")
    val in = docs.select("doc_id", "text").union(extra)
    val raw = in.collect().map(r => (r.getLong(0), r.getString(1)))
    val all = raw.flatMap { case (id, t) =>
      t.split(" ", -1).sliding(2).filter(_.length == 2).map(p => (id, p(0), p(1)))
    }
    val ctx = all.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pc = all.groupBy(x => (x._2, x._3)).view.mapValues(_.size.toLong).toMap
    val per = all.groupBy(_._1).view.mapValues { es =>
      (es.size.toLong,
        es.map(e => (bitlen(ctx(e._2)) - bitlen(pc((e._2, e._3)))).toLong).sum)
    }.toMap
    val want = raw.map { case (id, _) =>
      per.get(id) match {
        case Some((n, s)) => (id, n, s, s.toDouble / n)
        case None => (id, 0L, 0L, 0.0)
      }
    }.toSet
    val got = CorpusOps.bigramSurprisal(in).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want)
    assert(want.exists(_._2 == 0L), "need a bigram-free doc in the mix")
    // in an isolated corpus, pure repetition costs 0 conditional bits
    val rep = CorpusOps.bigramSurprisal(
        Seq((1L, "z z z z z")).toDF("doc_id", "text")).collect().head
    assert(rep.getLong(1) == 4L && rep.getDouble(3) == 0.0)
  }

  test("heavyHitters pass 2 joins candidates by broadcast, never a shuffle join") {
    val plan = CorpusOps.heavyHitters(docs, phiDen = 100L).queryExecution
      .executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(!plan.contains("SortMergeJoin"), "candidate join fell back to a shuffle join")
  }

  test("heavyHitters rejects a sketch too small for the guarantee") {
    intercept[IllegalArgumentException] {
      CorpusOps.heavyHitters(docs, phiDen = 1000L, sketchSize = 512)
    }
  }

  test("cooccurrence: window semantics, canonical pair order, brute-force equality") {
    import spark.implicits._
    val in = Seq((1L, "b a b c"), (2L, "a a")).toDF("doc_id", "text")
    // window=1 adjacent pairs: (b,a) (a,b) (b,c) + (a,a) -> canonical
    val got = CorpusOps.cooccurrence(in, window = 1, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("a", "b", 2L), ("a", "a", 1L), ("b", "c", 1L)))
    // window=3 brute force over a slightly bigger corpus
    val corpus = Seq((1L, "x y z x y"), (2L, "z z y"), (3L, "q"))
    val want = corpus.flatMap { case (_, text) =>
      val t = text.split(" ", -1)
      for {
        i <- t.indices; j <- (i + 1) to math.min(t.length - 1, i + 3)
      } yield if (t(i) <= t(j)) (t(i), t(j)) else (t(j), t(i))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got3 = CorpusOps.cooccurrence(corpus.toDF("doc_id", "text"),
        window = 3, k = 100).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got3 == want)
  }

  test("bm25TopK: saturation ranking, absent terms drop out, deterministic ties") {
    import spark.implicits._
    val in = Seq(
      (1L, "spark spark spark join pad pad pad pad"),
      (2L, "spark join table pad pad pad pad pad"),   // all 3 terms
      (3L, "pad pad pad pad pad pad pad pad"),
      (4L, "spark join table pad pad pad pad pad")    // tie with doc 2
    ).toDF("doc_id", "text")
    val rows = TfIdf.bm25TopK(in, Seq("spark", "table", "join"), k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // docs with every query term beat the one-term-heavy doc (tf
    // saturates); the no-term doc scores 0 and sorts last by doc_id
    assert(rows.map(_._1).take(2).toSet == Set(2L, 4L))
    assert(rows(0)._1 == 2L && rows(1)._1 == 4L, "ties break by doc_id")
    assert(rows(0)._2 == rows(1)._2)
    assert(rows.last._1 == 3L && rows.last._2 == 0.0)
    // absent-everywhere term contributes weight 0, not a crash
    val absent = TfIdf.bm25TopK(in, Seq("zzz"), k = 2).collect()
    assert(absent.forall(_.getDouble(1) == 0.0))
  }

  test("domainMixSample == full driver-side recomputation of the integer " +
    "mixture (epochs, hash order, partial-epoch cut); deterministic") {
    val weights = Map("src0" -> 5L, "src1" -> 3L, "src3" -> 1L)
    val budget = 9000L
    val got = CorpusOps.domainMixSample(docs, weights, budget)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // independent recomputation: same md5-prefix order, same integer
    // budget/epoch arithmetic, built entirely driver-side
    val toks = docs.select(col("doc_id"), col("source"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1).length.toLong))
    def md5bits32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val sumW = weights.values.sum
    val want = weights.keySet.toSeq.flatMap { g =>
      val mine = toks.filter(_._2 == g)
        .sortBy { case (id, _, _) => (md5bits32(s"$g:$id"), id) }
      val tot = mine.map(_._3).sum
      if (tot == 0) Seq.empty
      else {
        val b = budget * weights(g) / sumW
        val nFull = b / tot
        val rem = b % tot
        val cums = mine.scanLeft(0L)(_ + _._3).tail
        (0L until nFull).flatMap { e =>
          mine.zip(cums).map { case ((id, _, n), c) => (id, g, e, n, c) }
        } ++ mine.zip(cums).collect {
          case ((id, _, n), c) if c <= rem => (id, g, nFull, n, c)
        }
      }
    }.toSet
    assert(got == want && got.nonEmpty)
    // at least one domain must exercise real upsampling on this fixture,
    // or the epoch arithmetic is untested
    assert(got.exists(_._3 >= 1L), "no domain got a whole extra epoch")
    val again = CorpusOps.domainMixSample(docs, weights, budget)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(again == got)
  }

  test("groupRunningSum: cross-partition offsets exact when groups span partitions") {
    import spark.implicits._
    // 3 groups x 4000 rows on 4 shuffle partitions: range partitioning on
    // (grp, k, id) MUST split at least one group across partitions, or
    // this spec is not exercising the two-phase offset logic at all —
    // asserted below, so a config drift that collapses partitions fails
    // loudly instead of green-washing.
    val rnd = new scala.util.Random(97)
    val data = (for {
      g <- Seq("a", "b", "c"); i <- 0 until 4000
    } yield (g.hashCode.toLong * 100000 + i, g, rnd.nextInt(1000).toLong,
        1L + rnd.nextInt(50))).map {
      case (id, g, k, v) => (id, g, k, v.toLong)
    }
    val df = data.toDF("id", "grp", "k", "v")
    val got = CorpusOps.groupRunningSum(df, "grp",
      Seq(col("k"), col("id")), col("v"), "cum")
    try {
      // the two-phase property: at least one group's rows land in >= 2
      // range partitions (otherwise a window would have been equivalent)
      val spans = got.select(col("grp"),
          org.apache.spark.sql.functions.spark_partition_id().as("p"))
        .distinct().groupBy("grp").count().as[(String, Long)].collect().toMap
      assert(spans.values.exists(_ >= 2L),
        s"fixture must split a group across partitions, got $spans")
      val rows = got.select(col("id"), col("grp"), col("v"), col("cum"))
        .as[(Long, String, Long, Long)].collect()
        .map { case (id, g, v, c) => (id, g) -> (v, c) }.toMap
      // independent recomputation: running sum in (k, id) order per group
      data.groupBy(_._2).foreach { case (g, gs) =>
        var run = 0L
        gs.sortBy { case (id, _, k, _) => (k, id) }.foreach {
          case (id, _, _, v) =>
            run += v
            assert(rows((id, g)) == (v, run), s"mismatch at ($g, $id)")
        }
      }
      // determinism across invocations (fresh range sampling each time)
      val again = CorpusOps.groupRunningSum(df, "grp",
        Seq(col("k"), col("id")), col("v"), "cum")
      try {
        val c2 = again.select(col("id"), col("cum")).as[(Long, Long)]
          .collect().toMap
        rows.foreach { case ((id, _), (_, c)) => assert(c2(id) == c) }
      } finally again.unpersist()
    } finally got.unpersist()
  }

  test("importanceSelect == independent bitlen-LLR recomputation") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // two dialects over a shared vocabulary: target-flavored docs reuse a
    // narrow bigram set, raw docs roam; some docs too short for bigrams
    val tgtToks = Vector("spark", "join", "shuffle", "agg")
    val rawToks = Vector("spark", "join", "row", "scan", "sort", "hash", "key", "value")
    val data = (0 until 90).map { i =>
      val isTgt = i % 3 == 0
      val toks = if (isTgt) tgtToks else rawToks
      val len = if (i % 17 == 0) 1 else 4 + rnd.nextInt(10)
      (i.toLong, (0 until len).map(_ => toks(rnd.nextInt(toks.size))).mkString(" "),
        if (isTgt) "en" else "de")
    }
    val docs = data.toDF("doc_id", "text", "lang")
    val got = CorpusOps.importanceSelect(docs, col("lang") === "en", 1L, 4L)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap

    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(math.max(1L, x))
    val occ = data.flatMap { case (id, text, lang) =>
      val t = text.split(" ")
      t.zip(t.drop(1)).map { case (a, b) => (id, lang == "en", s"$a $b") }
    }
    val craw = occ.groupBy(_._3).map { case (f, xs) => f -> xs.size.toLong }
    val ct = occ.groupBy(_._3).map { case (f, xs) => f -> xs.count(_._2).toLong }
    val (tRaw, tTgt) = (craw.values.sum, ct.values.sum)
    val scores = data.map { case (id, text, _) =>
      val t = text.split(" ")
      val fs = t.zip(t.drop(1)).map { case (a, b) => s"$a $b" }
      val s = fs.map(f => bitlen(ct(f) + 1) - bitlen(tTgt + 1) - bitlen(craw(f)) + bitlen(tRaw)).sum
      (id, fs.length.toLong, s)
    }
    val k = (data.size.toLong * 1 + 3) / 4
    val want = scores.sortBy { case (id, _, s) => (-s, id) }.zipWithIndex.map {
      case ((id, nb, s), r) => (id, (nb, s, r + 1L, r + 1L <= k))
    }.toMap
    assert(got == want)
    assert(want.values.count(_._4) == k.toInt, "keep count must equal the integer ceil")
    // the fixture must actually discriminate: target docs should dominate
    // the kept set (sanity that the LLR sign convention is right)
    val keptTgt = data.filter(d => want(d._1)._4).count(_._3 == "en")
    assert(keptTgt * 2 > k, s"target docs should dominate the kept set: $keptTgt of $k")
  }
}
