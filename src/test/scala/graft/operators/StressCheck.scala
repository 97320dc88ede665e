package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway sf0.3-class stress measurement (not a test): replicates the
  * sf0.1 corpora 3x with deterministic perturbations and re-runs the
  * ScalingStats counters, extending the measured scaling curves one
  * extrapolation point past the generated scales BEFORE a real cluster
  * does it. Run with `Test/runMain graft.operators.StressCheck`;
  * results recorded in PLANS.md.
  *
  * Replication is perturbation, not duplication — an exact copy would
  * plant N artificial zero-distance twins and make the output itself
  * quadratic in the copy count:
  *  - histograms: cyclic BIN rotation per copy (a valid distribution
  *    with the same weight multiset, different shape);
  *  - embeddings: cyclic DIMENSION rotation per copy (same norm,
  *    different direction);
  *  - documents: token-order reversal / rotation per copy (same token
  *    marginals; order-sensitive shingles differ across copies while
  *    within-copy near-dup structure mirrors the original).
  * Copy ids offset by 10^7 per copy keeps id spaces disjoint. */
object StressCheck {

  private def rotArray(a: org.apache.spark.sql.Column, len: Int, c: Int) =
    if (c == 0) a
    else concat(slice(a, c + 1, len - c), slice(a, 1, c))

  /** The 3x perturbed document corpus (reversal + 7-token rotation
    * copies, disjoint id spaces) — shared by the text-join rows and the
    * round-14 rows. Persisted; caller unpersists. */
  private def stressDocs(spark: SparkSession, dir: String, off: Long): DataFrame = {
    val d0 = graft.sources.Fixtures.documents(spark, dir)
    val toks = split(col("text"), " ")
    // rotation by 7 degenerates to an IDENTITY copy for docs with <= 7
    // tokens (and reversal for 1-token docs) — exactly the artificial
    // zero-distance twins the header says replication must avoid; the
    // corpus generator has shipped drifting shapes across rounds, so
    // fail loudly instead of silently softening the envelopes
    val minToks = d0.select(min(size(toks))).head().getInt(0)
    require(minToks >= 8,
      s"doc replication rotates by 7 tokens; min tokens in corpus is $minToks " +
        "— a <=7-token doc would replicate as an identity copy and plant " +
        "artificial exact twins; shrink the rotation or re-perturb")
    val docs = Seq(
      d0.select(col("doc_id"), col("text"), col("lang"), col("source")),
      d0.select((col("doc_id") + off).as("doc_id"),
        concat_ws(" ", reverse(toks)).as("text"), col("lang"), col("source")),
      d0.select((col("doc_id") + 2 * off).as("doc_id"),
        concat_ws(" ", concat(slice(toks, 8, 100000), slice(toks, 1, 7)))
          .as("text"), col("lang"), col("source"))
    ).reduce(_ unionByName _).persist()
    docs.count()
    docs
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val off = 10000000L
    // `r14` runs only the round-14 rows (exact-substr anchors,
    // stream-editmatch probe cost) for iteration; default runs all
    val r14only = args.contains("r14")
    if (r14only) { round14Rows(spark, dir, off); spark.stop(); return }

    // --- melody 3-D threshold join at ~3x sf0.1 density ---
    val h0 = graft.sources.Fixtures.tripleHists(spark, dir)
    val hists = (0 to 2).map { c =>
      h0.select((col("id") + lit(off * c)).as("id"),
        rotArray(col("weights"), 8, c).as("weights"))
    }.reduce(_ unionByName _).persist()
    val n0 = hists.count()
    val cfg = graft.SparkEntry.melodyCfg3d
      .copy(sideNum = MelodyJoin.sideNumFor(n0))
    val t0 = System.nanoTime()
    val m = ScalingStats.melody(spark, hists, cfg, 0.0803)
    val out = MelodyJoin.thresholdJoin(spark, hists, 0.0803, cfg).count()
    println(f"MELODY sf0.3x side=${cfg.sideNum}%2d N=${m.n}%6d " +
      f"guests=${m.guests}%9d cand=${m.candPairs}%10d out=$out%8d " +
      f"naive=${m.n * (m.n - 1) / 2}%12d " +
      f"(${(System.nanoTime() - t0) / 1e9}%5.1f s)")
    println(f"MELODY sf0.3x envelopes: cand<=16out+64N=${m.candPairs <= 16L * out + 64L * m.n} " +
      f"guests<=8out+32N=${m.guests <= 8L * out + 32L * m.n} " +
      f"cand*100<=naive=${m.candPairs * 100L <= m.n * (m.n - 1) / 2}")
    hists.unpersist(false)

    // --- residual IVF-PQ probe fraction at 3x ---
    val e0 = graft.sources.Fixtures.embeddings(spark, dir)
    val dim = e0.select(size(col("embedding"))).head().getInt(0)
    val embs = (0 to 2).map { c =>
      e0.select((col("vec_id") + lit(off * c)).as("vec_id"),
        rotArray(col("embedding"), dim, c * 7).as("embedding"))
    }.reduce(_ unionByName _).persist()
    embs.count()
    val p = ScalingStats.ivfPq(spark, embs, kCoarse = 16, nProbe = 2)
    println(f"IVFPQ  sf0.3x N=${p.n}%6d probed=${p.probedRows}%6d " +
      f"frac=${p.probedRows.toDouble / p.n}%6.3f ideal=${2.0 / 16}%6.3f " +
      f"within2x=${p.probedRows * p.kCoarse.toLong <= 2L * p.nProbe * p.n}")

    // --- semantic dedup cluster balance at 3x (deployment-scaled k):
    //     the within-cluster pair fraction vs the balanced 1/k ideal is
    //     exactly what decides whether the quadratic-within-cells shape
    //     survives a corpus that k-means might cluster badly ---
    val nE = embs.count()
    for (k <- Seq(8, Ann.scaledCentroids(nE))) {
      val sd = ScalingStats.semDedup(spark, embs, k)
      println(f"SEMDD  sf0.3x k=$k%4d N=${sd.n}%6d within=${sd.withinPairs}%9d " +
        f"naive=${sd.naive}%12d frac=${sd.frac}%6.4f ideal=${1.0 / k}%6.4f " +
        f"maxC=${sd.maxCluster}%6d " +
        f"within2x=${sd.withinPairs.toDouble <= 2.0 * sd.naive.toDouble / k} " +
        f"maxC4x=${sd.maxCluster.toDouble <= 4.0 * sd.n.toDouble / k + 1.0}")
    }
    embs.unpersist(false)

    // --- prefix-filter text joins on the 3x shingle corpus ---
    val docs = stressDocs(spark, dir, off)
    val shdocs = docs.select(col("doc_id"), concat_ws(" ",
      graft.functions.TextCols.shingles(col("text"), 3)).as("shtext"))
      .persist()
    val t1 = System.nanoTime()
    val g = ScalingStats.prefixJaccard(spark, shdocs, graft.SparkEntry.NgramTau, textCol = "shtext")
    // envelope written against out + near (pairs no admissible filter
    // may reject: the rotation copies plant a just-below-tau band) plus
    // 3*sets for the mutual-rarest-token collisions the positional
    // filter cannot remove (i0 = j0 = 1 pairs; measured 2.36*sets here)
    println(f"NGRAM  sf0.3x N=${g.nDocs}%6d sets=${g.nSets}%6d " +
      f"setToks=${g.setTokens}%8d post=${g.postings}%8d " +
      f"cand=${g.candPairs}%9d out=${g.out}%7d near=${g.near}%7d " +
      f"naive=${g.nSets * (g.nSets - 1) / 2}%12d " +
      f"within=${g.candPairs <= 2L * (g.out + g.near) + 3L * g.nSets} " +
      f"prune999=${g.candPairs * 1000L <= g.nSets * (g.nSets - 1) / 2} " +
      f"(${(System.nanoTime() - t1) / 1e9}%5.1f s)")
    val t2 = System.nanoTime()
    val wn = ScalingStats.winnow(spark, docs, k = 3, w = 4, minShared = 2)
    println(f"WINNOW sf0.3x N=${wn.nDocs}%6d grams=${wn.gramPositions}%9d " +
      f"post=${wn.postings}%8d joinRows=${wn.joinRows}%9d out=${wn.out}%7d " +
      f"within=${wn.joinRows <= 48L * wn.out + 2L * wn.nDocs} " +
      f"(${(System.nanoTime() - t2) / 1e9}%5.1f s)")
    val t3 = System.nanoTime()
    val c = ScalingStats.cosineSparse(spark, shdocs, 0.9, textCol = "shtext")
    println(f"COSINE sf0.3x N=${c.nDocs}%6d wrows=${c.weightRows}%8d " +
      f"cand=${c.candPairs}%9d out=${c.out}%7d " +
      f"naive=${c.nDocs * (c.nDocs - 1) / 2}%12d " +
      f"(${(System.nanoTime() - t3) / 1e9}%5.1f s)")
    shdocs.unpersist(false)

    // --- bounded edit-distance join at 3x: segment-key COLLISION growth
    //     with N is the scale risk (the (d+1)(2d+1)^2 probe constant is
    //     fixed) — the candidate count must stay output-proportional,
    //     not drift toward the key-collision quadratic ---
    val t4 = System.nanoTime()
    val e = ScalingStats.editJoin(spark, docs, 4)
    println(f"EDIT   sf0.3x N=${e.n}%6d cand=${e.cand}%9d out=${e.out}%7d " +
      f"naive=${e.naive}%12d " +
      f"within=${e.cand <= 2L * e.out + e.n / 10} " +
      f"prune999=${e.cand * 1000 <= e.naive} " +
      f"(${(System.nanoTime() - t4) / 1e9}%5.1f s)")

    // --- DSIR importance selection at 3x: end-to-end, plus the
    //     rank-stage range-partition span (the operator's only global
    //     structure; a skewed span would mean the two-phase rank rebuilt
    //     the single-task window it exists to avoid) ---
    val t5 = System.nanoTime()
    val sel = CorpusOps.importanceSelect(docs, col("lang") === "en", 1L, 4L)
    val nSel = sel.count()
    val kept = sel.filter(col("keep")).count()
    val (dp, dmax, dmean) = rangeSpan(
      sel.select((-col("score_bits")).as("k"), col("doc_id").as("id")),
      Seq(col("k"), col("id")))
    println(f"DSIR   sf0.3x N=$nSel%6d kept=$kept%6d rankParts=$dp%3d " +
      f"maxPart=$dmax%7d meanPart=$dmean%7d skew=${dmax.toDouble / math.max(1L, dmean)}%5.2f " +
      f"balanced=${dmax <= 3L * math.max(1L, dmean)} " +
      f"(${(System.nanoTime() - t5) / 1e9}%5.1f s)")
    sel.unpersist(false)

    // --- domain-mixture sampling at 3x (budget scaled 3x to hold the
    //     regime): end-to-end, plus the running-sum stage's
    //     range-partition span over its real (grp, md5, id) key — a
    //     domain must span as many partitions as its size needs, never
    //     funnel through one task ---
    val t6 = System.nanoTime()
    val mix = CorpusOps.domainMixSample(docs,
      Map("src0" -> 5L, "src1" -> 3L, "src2" -> 2L, "src3" -> 1L),
      totalBudget = 60000L)
    val mixRows = mix.count()
    val keyed = docs.select(col("source").as("grp"), col("doc_id").as("id"))
      .withColumn("h", graft.functions.TextCols.md5Bits32(
        concat(col("grp"), lit(":"), col("id").cast("string"))))
    val (mp, mmax, mmean) = rangeSpan(keyed,
      Seq(col("grp"), col("h"), col("id")))
    println(f"DOMMIX sf0.3x outRows=$mixRows%8d sumParts=$mp%3d " +
      f"maxPart=$mmax%7d meanPart=$mmean%7d skew=${mmax.toDouble / math.max(1L, mmean)}%5.2f " +
      f"balanced=${mmax <= 3L * math.max(1L, mmean)} " +
      f"(${(System.nanoTime() - t6) / 1e9}%5.1f s)")

    docs.unpersist(false)
    round14Rows(spark, dir, off)
    spark.stop()
  }

  /** Round-14 stress rows: ExactSubstr anchor postings and the
    * stream-editmatch per-row probe cost, both at 3x sf0.1. */
  private def round14Rows(spark: SparkSession, dir: String, off: Long): Unit = {
    val docs = stressDocs(spark, dir, off)

    // --- ExactSubstr anchors at 3x: dup postings (the only rows that
    //     reach the merge window) must stay inside the span-token mass
    //     they evidence (dupPost <= sum n_tokens is the structural
    //     identity; the measured ratio pins the headroom), and the
    //     hottest anchor's doc-frequency is the gram-keyed join's skew
    //     lever — the quantity a spanOwnership-style df-cap would need
    //     to bound on a chrome-ridden corpus ---
    val t7 = System.nanoTime()
    val es = ScalingStats.exactSubstr(spark, docs, graft.SparkEntry.ExactSubstrK)
    println(f"EXSUB  sf0.3x N=${es.n}%6d kgrams=${es.kgrams}%9d " +
      f"dupPost=${es.dupPostings}%8d spans=${es.spans}%7d " +
      f"spanToks=${es.spanTokens}%8d maxGramDf=${es.maxGramDf}%5d " +
      f"postBound=${es.dupPostings <= es.spanTokens} " +
      f"dupFrac=${es.dupPostings.toDouble / math.max(1L, es.kgrams)}%6.4f " +
      f"(${(System.nanoTime() - t7) / 1e9}%5.1f s)")

    // --- stream-editmatch probe cost at 3x against the 512-ref index:
    //     candidate-set sizes per streamed row are data-dependent (the
    //     probe CONSTANT is fixed, candidates are not) — measure the
    //     total and max per-row candidates and verify calls per emitted
    //     match through the operator's own kernel ---
    val t8 = System.nanoTime()
    val refs = docs.filter(col("doc_id") % 10 === 0)
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .limit(512)
      .select(col("doc_id").as("id"), col("text"))
    val refArr = graft.streaming.StreamOps.collectBoundedTexts(refs, 512)
    val em = ScalingStats.streamEditMatch(spark,
      docs.filter(col("doc_id") % 10 =!= 0), refArr, d = 4)
    println(f"EDITMA sf0.3x rows=${em.rows}%6d refs=${refArr.length}%4d " +
      f"cand=${em.cand}%8d maxCand=${em.maxCand}%5d matches=${em.matches}%6d " +
      f"candPerRow=${em.cand.toDouble / math.max(1L, em.rows)}%6.3f " +
      f"within=${em.cand <= 4L * em.matches + em.rows} " +
      f"(${(System.nanoTime() - t8) / 1e9}%5.1f s)")

    docs.unpersist(false)
  }

  /** Row-count span of a repartitionByRange over `keys` at an EXPLICIT
    * partition count (AQE would coalesce a corpus this small into one
    * partition and make the measurement vacuous — at deployment scale
    * the exchange keeps its width): (partitions, max rows, mean rows).
    * The honest external probe of whether a two-phase rank/running-sum
    * stage's work spreads across tasks or funnels into one. */
  private def rangeSpan(df: DataFrame,
                        keys: Seq[org.apache.spark.sql.Column]): (Int, Long, Long) = {
    val parts = df.repartitionByRange(32, keys: _*).rdd
      .mapPartitions { it =>
        var n = 0L; it.foreach(_ => n += 1); Iterator.single(n)
      }.collect()
    val nonEmpty = math.max(1, parts.length)
    (parts.length, if (parts.isEmpty) 0L else parts.max, parts.sum / nonEmpty)
  }
}
