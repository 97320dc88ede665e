package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.{BinaryScan, Fixtures}
import graft.functions.{EmdCols, TextCols}
import graft.core.Caching.PersistOnce
import graft.operators.{EmdJoins, MelodyJoin, BaselineJoin, MrSimJoin, Dedup, Ann, Multimodal, CorpusOps, TfIdf, EventOps, Cluster, SketchOps, Layout, Bpe, Skew, EditJoin, HtmlOps, UrlOps, Frontier, Wordpiece, Graph, Search, Blocklist, Classifier, Warc, Unigram, Snapshot, Profile}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query reads only the driver-generated parquet under `dir` and has
  * (where SQL-expressible) a DuckDB oracle over the same tables producing
  * identical columns. Doubles are rounded to 6 decimals on output in BOTH
  * systems so value hashes match.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * EMD distance-threshold self-join over quantity histograms. */
  def entry(spark: SparkSession): DataFrame = {
    val hists = Fixtures.quantityHists(spark, "/root/testdata/sf0.001")
    EmdJoins.emd1dThresholdJoin(hists, 0.153)
  }

  private[graft] val Theta = 0.153
  private val RubnerTheta = 0.0401
  private val TopK = 20
  /** Extra candidates each 3-D top-k engine fetches beyond [[TopK]] so
    * q_emd3d_topk can SELECT the final k by the canonical rounded
    * distance (membership hazard fix, ADVICE r15). An in-query margin
    * TEST checks whether this depth sufficed; when it cannot prove
    * exclusion (cutoff-tied pools) the query falls back to a complete
    * threshold fetch — correct either way, the pad only buys the cheap
    * path. */
  private val CanonPad = 20
  // fixed size of q_stream_emd's static broadcast reference index: a
  // broadcast index is bounded by contract (the honest stream-static
  // shape at any corpus scale), selected deterministically by
  // (md5(id), id) hash-spread order in BOTH engines
  private val StreamEmdRefCap = 256
  // fixed size of q_stream_editmatch's static broadcast segment index —
  // the StreamEmdRefCap contract applied to the string metric: selected
  // by the same (md5(id), id) hash-spread order in BOTH engines
  private val StreamEditRefCap = 512
  // driver cap on q_bpe_witness's word-count collect: the sequential
  // reference trainer is a witness, not the operator, and vocabulary
  // grows sublinearly (Heaps' law) — but a data-derived collect must
  // still be bounded; 2M rows ~ a full web-scale word vocabulary and
  // stays ~100 MB on the driver
  private val BpeWitnessVocabCap = 2000000

  /** q_phrase_search's query set — shared by the Spark lambda and the
    * oracle generator so the literal phrases can never drift apart.
    * Chosen non-vacuous (probed in DuckDB): at least four phrases hit
    * at every generated scale, and the two 3-gram phrases exercise the
    * repeated-word and multi-word anchor lanes. */
  private val searchPhrases = Seq(
    "table scan", "join order", "slow query",
    "batch batch batch", "hash join merge")

  /** q_blocklist_match's dictionary — shared by the Spark lambda and
    * the oracle. Deliberate lanes: a nested pair ("join" inside
    * "join order"), a self-overlapping pattern ("batch batch" overlaps
    * itself in "batch batch batch" — all-positions semantics counts
    * both), and plain word/phrase members. */
  private val blockPatterns = Seq(
    "join", "join order", "batch batch", "slow query", "vector")

  /** q_classifier_eval's sweep — probed against the score distribution
    * (roughly ±20k, median near 0 at every scale) so each cut moves
    * the confusion counts. Integer >= cuts are exact in both engines —
    * no boundary-gap probing needed (the FP rule applies to ratios). */
  private val evalThresholds = Seq(-8000L, -4000L, -2000L, -1000L, 0L,
    1000L, 2000L, 4000L, 8000L)

  /** q_profile's column lists — shared by the Spark melt and the oracle
    * UNION ALL generator (one source of truth). l_quantity is
    * integral-valued in the fixture (long-castable); truly fractional
    * doubles stay out per the Profile string-form contract. */
  private val ProfileNumericCols = Seq("l_orderkey", "l_partkey",
    "l_suppkey", "l_linenumber", "l_quantity")
  private val ProfileStringCols = Seq("l_returnflag", "l_linestatus")

  /** Content-dedup replay shared by the batch and streaming legs. */
  private lazy val IncrDedupSql: String =
    """WITH arr AS (
      |  SELECT doc_id + 2000000 AS doc_id, text
      |  FROM documents WHERE doc_id % 13 = 1
      |  UNION ALL
      |  SELECT doc_id + 3000000 AS doc_id,
      |    'unseen page about topic ' || CAST(doc_id AS VARCHAR) AS text
      |  FROM documents WHERE doc_id % 13 = 2
      |)
      |SELECT a.doc_id,
      |  NOT EXISTS (SELECT 1 FROM documents d WHERE d.text = a.text)
      |    AS fresh
      |FROM arr a""".stripMargin

  /** md5-derived link-edge replay shared by q_pagerank and q_hits —
    * ends in `e(src, dst)` (self-loops dropped, duplicates collapsed);
    * the single source of truth for [[graft.operators.Graph.linkEdges]]'
    * fixture contract. */
  private val LinkEdgeCtes: String =
    """e0 AS (
      |  SELECT d.doc_id AS src,
      |    (('0x' || substr(md5('edge:' || CAST(d.doc_id AS VARCHAR) || ':' ||
      |        CAST(jj.j AS VARCHAR)), 1, 8))::BIGINT
      |      % (SELECT count(*) FROM documents)) AS dst
      |  FROM documents d CROSS JOIN (SELECT unnest([1, 2, 3]) AS j) jj
      |), e AS (SELECT DISTINCT src, dst FROM e0 WHERE dst <> src)""".stripMargin

  /** Position-exact blocklist replay, shared by the batch and streaming
    * legs (the stream is stateless per batch, so one oracle checks
    * both): for each (doc, pattern), count the 1-based i where
    * substr(text, i, len(p)) = p — no leftmost-greedy or non-overlap
    * convention exists to drift (replace()-counting would undercount
    * the self-overlapping "batch batch" lane). */
  private lazy val BlocklistSql: String = {
    val pats = blockPatterns.map(p => s"('$p')").mkString(", ")
    s"""WITH pats AS (SELECT * FROM (VALUES $pats) v(pattern)),
       |h AS (
       |  SELECT d.doc_id, p.pattern,
       |    CAST(len(list_filter(
       |      range(1, len(d.text) - len(p.pattern) + 2),
       |      i -> substr(d.text, CAST(i AS INTEGER), len(p.pattern)) = p.pattern))
       |      AS BIGINT) AS hits
       |  FROM documents d CROSS JOIN pats p
       |)
       |SELECT doc_id, pattern, hits FROM h WHERE hits > 0""".stripMargin
  }

  /** Shared CTE chain for the hash-classifier score replay — ends in
    * `s(doc_id, score, n_features)`; q_hash_classify and
    * q_classifier_eval both build on it (one source of truth for the
    * md5 bucket/weight arithmetic). */
  private def hashClassifyScoreCtes(src: String): String =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS t FROM $src),
       |f AS (
       |  SELECT doc_id, unnest(t) AS f FROM t
       |  UNION ALL
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS f
       |  FROM t
       |), s AS (
       |  SELECT doc_id,
       |    CAST(SUM(
       |      ('0x' || substr(md5('ftw:' || CAST(
       |        ('0x' || substr(md5('ft:' || f), 1, 8))::BIGINT % 4096
       |        AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000) AS BIGINT) AS score,
       |    CAST(count(*) AS BIGINT) AS n_features
       |  FROM f GROUP BY doc_id
       |)""".stripMargin
  // pinned static WordPiece demo vocabulary for q_wordpiece_tokens —
  // the INFERENCE kernel's full oracle runs against this fixed piece
  // set (single source of truth: the oracle VALUES list interpolates
  // from this val). Every letter is a start piece EXCEPT 'v' (value/
  // vector exercise the whole-word-[UNK] lane); every letter is a
  // continuation; three multi-char starts (th, sc, join) and three
  // multi-char continuations (##able, ##ow, ##tream) exercise
  // longest-match-first over the char-by-char fallback
  private[graft] val WordpieceDemoVocab: Seq[String] =
    ('a' to 'z').filterNot(_ == 'v').map(_.toString) ++
      Seq("th", "sc", "join") ++
      ('a' to 'z').map(c => s"##$c") ++ Seq("##able", "##ow", "##tream")
  // pinned unigram-LM demo vocabulary (piece -> integer score) for
  // q_unigram_tokens — the Viterbi INFERENCE kernel's full oracle runs
  // against this fixed scored set (the oracle VALUES list interpolates
  // from this val). Lanes: no 'v' piece (value/vector hit whole-word
  // UNK), "join" at -30 LOSES to jo+in at -27 (Viterbi optimality vs
  // greedy longest-match — the family's distinguishing behavior),
  // "scan" at -28 BEATS sc+an at -30, and single chars at -10 make
  // equal-score decompositions reachable (the min-pieces output is the
  // tie-free quantity)
  private[graft] val UnigramDemoVocab: Seq[(String, Long)] =
    (('a' to 'u') ++ Seq('w', 'y')).map(c => c.toString -> -10L) ++
      Seq("th" -> -15L, "er" -> -15L, "an" -> -16L, "in" -> -12L,
        "jo" -> -15L, "join" -> -30L, "sc" -> -14L, "scan" -> -28L,
        "ing" -> -24L, "que" -> -22L, "ry" -> -13L, "ba" -> -17L,
        "tch" -> -21L, "order" -> -38L, "ta" -> -16L, "ble" -> -26L)
  // exact shingle-Jaccard threshold shared by q_ngram_jaccard, its oracle
  // (8969/10000 rational form), and the scaling/stress calibration probes
  // — one constant so the contract evidence cannot desynchronize
  private[graft] val NgramTau = 0.8969
  // ExactSubstr anchor length (tokens), shared by q_exact_substr, its
  // oracle CTE, and the stress probe: k = 6 is past the fixture
  // vocabulary's chance-collision cliff (k <= 5 spans are dominated by
  // coincidental matches; the span set is k-stable from 6 through 10)
  private[graft] val ExactSubstrK = 6
  private val Theta3d = 0.0803
  // tree-EMD overestimates 1-D EMD by up to 2n-2; sized so the pair set
  // is in the same regime as the exact join. 0.4071 = 4071/10000: a
  // boundary hit needs the pair's count-total product divisible by 10000
  // AND the node-mass sum to land exactly there — measured closest
  // distance is 1.9e-5 away at sf0.01 (was 0.407 in round 3; widened per
  // round-3 advice to keep a large margin from reachable rationals)
  private val TreeTau = 0.4071
  // octree tree-EMD threshold: 10739/100000 has a prime numerator and a
  // denominator needing count-total products >= 25000 (per-partkey totals
  // are ~30-60, so unreachable); closest measured distance is 4.6e-6 away
  private val TreeTau3d = 0.10739
  // 3-D centroid (Rubner) threshold: distances are sqrt of rational sums
  // (irrational except at axis-aligned pairs); closest measured distance
  // is 2.9e-6 away at sf0.01 — far above FP noise
  private val Rubner3dTheta = 0.0309

  /** Cross-engine witness for the three `no_oracle` 3-D LP rows: LP-EMD
    * is not DuckDB-expressible (SURVEY §7.4), so each declared 3-D query
    * runs a SECOND, independently-built exact engine and requires pair-set
    * equality on (rid, sid, round(dist,6)) before returning — a seeded
    * fault in either engine fails the driver's Verify run loudly instead
    * of producing unverified rows. This mirrors the reference's own core
    * promise of answer-equivalent engines over one corpus (Join.java:42-131).
    *
    * Gated by -Dgraft.crosscheck=off: Bench disables it so per-query
    * timings keep measuring ONE engine (the witness is a correctness
    * assertion, not part of the operator's work); Verify never sets the
    * property, so the correctness gate always runs the assertion. The
    * property is read per call as the DEFAULT of `enabled` — specs pass
    * the flag explicitly instead of mutating the process-global property
    * (suites share one forked JVM and run in parallel).
    *
    * `audit` runs after pair-set equality passes: the solver-independent
    * distance check ([[simplexAudit3d]]). The pair-set witness alone
    * cannot catch a regression in the shared SSP kernel (both engines
    * compute final distances with `Emd.exact` — MelodyJoin.scala:379,
    * EmdJoins.scala:231); the audit recomputes every survivor distance
    * with the commons-math3 simplex formulation, which shares no solver
    * code, restoring the reference's promise of answer-equivalent
    * INDEPENDENT engines (Join.java:42-131). */
  private[graft] def crossCheckPairs(primary: DataFrame, witness: => DataFrame,
                                     label: String,
                                     enabled: Boolean =
                                       sys.props.getOrElse("graft.crosscheck", "on") != "off",
                                     audit: DataFrame => Unit = _ => ()): DataFrame = {
    if (enabled) {
      def canon(df: DataFrame): DataFrame = df.select(
        least(col("rid"), col("sid")).as("a"),
        greatest(col("rid"), col("sid")).as("b"),
        col("dist").cast("double").as("d"))
      // persist both canonical sets: the two exceptAll directions would
      // otherwise each re-run a full engine (2x the LP work per gate row)
      val p = canon(primary).persist()
      val w = canon(witness).persist()
      try {
        // pair-set equality on IDS, distance agreement by TOLERANCE:
        // the engines now run genuinely different exact kernels (SSP vs
        // the KR closed form), and one fixture pair sits 8e-13 from a
        // 6-decimal rounding boundary — an exact compare of rounded
        // tuples would flap on which side each kernel's last ulp lands.
        // 5.2e-7 covers one side's 6dp rounding (callers pass the
        // primary rounded, the witness raw) plus kernel jitter; a real
        // solver fault moves distances orders of magnitude more
        // (CrossCheckSpec seeds 1%).
        val pk = p.select(col("a"), col("b"))
        val wk = w.select(col("a"), col("b"))
        val diff = pk.exceptAll(wk).unionAll(wk.exceptAll(pk)).limit(5).collect()
        require(diff.isEmpty,
          s"$label: cross-engine pair-set mismatch (primary vs witness): " +
            diff.map(_.toString).mkString("; "))
        val spread = p.join(w.select(col("a"), col("b"), col("d").as("dw")),
            Seq("a", "b"))
          .agg(coalesce(max(abs(col("d") - col("dw"))), lit(0.0))).head().getDouble(0)
        require(spread <= 5.2e-7,
          s"$label: cross-engine distance spread $spread > 5.2e-7")
        // audit over the persisted canonical set (orientation-symmetric)
        // — running it on `primary` would re-execute the engine
        audit(p.select(col("a").as("rid"), col("b").as("sid"),
          col("d").as("dist")))
      } finally { p.unpersist(false); w.unpersist(false) }
    }
    primary
  }

  /** Solver-independent distance audit for the 3-D LP rows: joins each
    * survivor pair back to its histograms and recomputes the distance on
    * executors with [[graft.core.Emd.exactSimplex]] (commons-math3
    * SimplexSolver over the reference's exact constraint formulation,
    * utils/DistanceUtil.java:112-146) — zero code shared with the SSP
    * kernel. Tolerance 2e-6 covers the 6-decimal output rounding (5e-7)
    * plus simplex epsilon; a real solver regression moves distances by
    * orders of magnitude more (CrossCheckSpec seeds one). Gate-scale
    * only (~1.4k survivor pairs at sf0.01, 8-bin LPs): runs inside
    * Verify, never in Bench (same `enabled` gate as the witness). */
  private[graft] def simplexAudit3d(hists: DataFrame, label: String)
                                   (pairs: DataFrame): Unit = {
    val h = hists.select(col("id"), col("weights"))
    val joined = pairs
      .join(h.select(col("id").as("rid"), col("weights").as("wa")), "rid")
      .join(h.select(col("id").as("sid"), col("weights").as("wb")), "sid")
      .select(col("rid").cast("long"), col("sid").cast("long"),
        col("dist").cast("double"), col("wa"), col("wb"))
    val bad = joined.rdd.flatMap { row =>
      val d = row.getDouble(2)
      val wa = row.getSeq[Double](3).toArray
      val wb = row.getSeq[Double](4).toArray
      val sx = graft.core.Emd.exactSimplex(wa, wb,
        Fixtures.Dim3, Fixtures.Bins3d, graft.core.GroundDist.L2)
      if (math.abs(d - sx) > 2e-6)
        Some((row.getLong(0), row.getLong(1), d, sx))
      else None
    }.take(5)
    require(bad.isEmpty,
      s"$label: simplex audit mismatch (engine dist vs independent simplex): " +
        bad.map { case (r, sd, d, sx) => s"($r,$sd) engine=$d simplex=$sx" }
          .mkString("; "))
  }

  /** 1-D melody config: with integer bins and one identity vector, exact
    * LP-EMD reduces to the closed-form 1-D EMD, making the whole
    * grid-pruned engine DuckDB-checkable. */
  def melodyCfg1d: MelodyJoin.Config = MelodyJoin.Config(
    dimension = 1,
    bins = Array.tabulate(Fixtures.NumBins)(_.toDouble),
    vectors = Array(Array(1.0)),
    // sideNum swept at sf0.1: 16 quantile cells beat 8 (4.9s -> 3.4s) —
    // finer cells cut intra-cell quadratic work faster than guest
    // replication grows at this distribution; 24+ regresses
    sideNum = 16, numDuals = 4, numReductions = 4, reducedDim = 4)

  /** Replace the engine-reported dist on 3-D cube pairs with the
    * CANONICAL closed form ([[graft.core.CubeKR]]): exact integer
    * difference vectors from [[Fixtures.tripleCounts]], the KR vertex
    * max, one divide — the same fixed FP expression the DuckDB oracle
    * evaluates, so the reported value is bit-identical in both engines
    * (the SSP kernels' doubles agree with the truth to ~1e-12, but one
    * fixture pair sits 8e-13 from a 6-decimal rounding boundary, so an
    * independent recomputation could legitimately round differently —
    * canonicalization removes the hazard instead of betting on it).
    * Each row also ASSERTS |engine dist - canonical| <= 1e-6 (engine
    * dist arrives 6dp-rounded, so legit deviation is < 5e-7 + jitter):
    * with crossCheckPairs (engines agree) and this bound (engine agrees
    * with the closed form) the oracle match is evidence about the LP
    * kernels, not just about CubeKR agreeing with itself. Runs on the
    * final output only (1.4k-150k rows), one broadcast join per side. */
  private def cubeCanonicalDist(s: SparkSession, dir: String)
                               (pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val cnt = Fixtures.tripleCounts(s, dir)
    val aSide = cnt.select(col("id").as("rid") +:
      (0 until 8).map(i => col(s"c$i").as(s"ca$i")) :+ col("t").as("ta"): _*)
    val bSide = cnt.select(col("id").as("sid") +:
      (0 until 8).map(i => col(s"c$i").as(s"cb$i")) :+ col("t").as("tb"): _*)
    val j = pairs
      .join(broadcast(aSide), "rid").join(broadcast(bSide), "sid")
      .select(Seq(col("rid").cast("long"), col("sid").cast("long"),
        col("dist").cast("double")) ++
        (0 until 8).map(i => col(s"ca$i").cast("long")) ++
        Seq(col("ta").cast("long")) ++
        (0 until 8).map(i => col(s"cb$i").cast("long")) ++
        Seq(col("tb").cast("long")): _*)
    val out = j.rdd.map { r =>
      val rid = r.getLong(0); val sid = r.getLong(1); val eng = r.getDouble(2)
      val ca = Array.tabulate(8)(i => r.getLong(3 + i)); val ta = r.getLong(11)
      val cb = Array.tabulate(8)(i => r.getLong(12 + i)); val tb = r.getLong(20)
      val d = graft.core.CubeKR.emd(ca, ta, cb, tb)
      require(math.abs(eng - d) <= 1e-6,
        s"cube canonical dist mismatch ($rid,$sid): engine=$eng canonical=$d")
      Row(rid, sid, d)
    }
    val schema = StructType(Seq(StructField("rid", LongType),
      StructField("sid", LongType), StructField("dist", DoubleType)))
    s.createDataFrame(out, schema)
      .select(col("rid"), col("sid"), round(col("dist"), 6).as("dist"))
  }

  /** [[melodyCfg3d]] with the grid sized to the corpus density
    * (MelodyJoin.sideNumFor): sf0.01 and below stay at the floor
    * side 6 (so gate-scale plans are unchanged), sf0.1 gets side 8 —
    * 3.6x fewer candidate pairs and 2.2x fewer guest-replica shuffle
    * rows for the identical (grid-invariant) result. tripleHists is
    * session-cached, so the sizing count() is a cached-scan job. */
  def melodyCfg3dFor(s: SparkSession, dir: String): MelodyJoin.Config =
    melodyCfg3d.copy(sideNum =
      MelodyJoin.sideNumFor(Fixtures.tripleHists(s, dir).count()))

  /** 3-D melody config over the unit-cube corner bins of tripleHists.
    * Carries CubeKR's 24 hardest-pruning KR-dual vertices as the
    * cascade's caller-supplied Lipschitz-potential stage (admissible
    * by CubeKRSpec's feasibility proof; the answer is pinned unchanged
    * by the tree-exact crosscheck, the simplex audit and the full
    * DuckDB oracle). */
  lazy val melodyCfg3d: MelodyJoin.Config = MelodyJoin.Config(
    dimension = 3,
    bins = Fixtures.Bins3d,
    vectors = Array(
      Array(1.0, 1.0, 1.0),
      Array(1.0, -1.0, 0.0),
      Array(1.0, 1.0, -2.0)),
    sideNum = 6, numDuals = 4, numReductions = 4, reducedDim = 4,
    lipschitzPotentials =
      graft.core.CubeKR.PrefilterIdx.map(graft.core.CubeKR.vertexPotential))

  /** Session-shared simhash near-dup edges over the documents corpus —
    * the q_dedup_clusters / q_keep_best pairing pays the signature +
    * banding + verify pass once, exactly as the 3-D queries share
    * engine state via [[MelodyJoin.prepareCached]] (the reference pairs
    * query types over one corpus, Join.java:42-131). Keyed by
    * (session, dir) — the histCache convention, with its documented
    * rewrite-within-a-session caveat; stopped sessions evicted on
    * access. Bench clears this between repeat passes so pass minimums
    * keep covering the edge build. */
  private final class EdgeMemo(s: SparkSession, dir: String) {
    @volatile private var built: DataFrame = null
    @volatile private var builtCc: DataFrame = null
    // per-key monitor: same-(session, dir) callers serialize here, but a
    // concurrent session building a DIFFERENT corpus never waits behind
    // this multi-job simhash build (the cache map's lock only guards
    // lookup/insert)
    def df: DataFrame = synchronized {
      if (built == null)
        built = Dedup.simhashDedup(s, Fixtures.documents(s, dir), maxHamming = 7)
      built
    }
    /** Connected-components labels over [[df]] — memoized for the same
      * reason the edge set is: q_dedup_clusters, q_keep_best and
      * q_leak_split all run the SAME contraction over the same edges,
      * so within a session the fixed-point rounds execute once (the
      * result frame is already persisted by connectedComponents'
      * materializeAndFree). Bench clears this between repeat passes so
      * pass minimums keep covering the contraction. */
    def cc: DataFrame = synchronized {
      if (builtCc == null)
        builtCc = Dedup.connectedComponents(s,
          df.select(col("rid"), col("sid")),
          Fixtures.documents(s, dir).select(col("doc_id")))
      builtCc
    }
    def unpersistIfBuilt(): Unit = {
      val b = built
      val c = builtCc
      // Try: unpersist on an already-stopped session throws, and the
      // blocks die with the session anyway — eviction symmetry only
      if (b != null) scala.util.Try(b.unpersist(false))
      if (c != null) scala.util.Try(c.unpersist(false))
    }
  }

  /** Session-memoized decontamination postings (train side, eval side) —
    * q_contamination and q_contamination_capped run the SAME two
    * (id, gram)-distinct shingle derivations and differ only in the
    * hot-gram cap applied at the join, so within a session the four
    * explode+distinct passes collapse to two (the EdgeMemo precedent;
    * Bench clears this between repeat passes through
    * [[clearSessionCaches]], so pass minimums keep covering the
    * derivation). */
  private final class ContamMemo(s: SparkSession, dir: String) {
    @volatile private var built: (DataFrame, DataFrame) = null
    def dfs: (DataFrame, DataFrame) = synchronized {
      if (built == null) {
        val d = Fixtures.documents(s, dir)
        built = (
          CorpusOps.contaminationPostings(
            d.filter(col("source") =!= "src0"), 3, "train_id").persistOnce(),
          CorpusOps.contaminationPostings(
            d.filter(col("source") === "src0"), 3, "eval_id").persistOnce())
      }
      built
    }
    def unpersistIfBuilt(): Unit = {
      val b = built
      if (b != null) {
        scala.util.Try(b._1.unpersist(false))
        scala.util.Try(b._2.unpersist(false))
      }
    }
  }

  /** Session-memoized melody 3-D THRESHOLD PAIR SET at [[Theta3d]] —
    * the engine's exact answer {(rid, sid, emd) : emd <= Theta3d} over
    * the (session-cached) prepared state. Two consumers run the
    * identical fetch: q_emd3d_pairs IS this set, and q_emd3d_topk's
    * complete-fetch tie fallback needs {emd <= cutoff + 4e-6} — a pure
    * FILTER of this set whenever cutoff + 4e-6 <= Theta3d, because
    * membership is decided by the exact solver's `emd <= theta` compare
    * on the canonically-oriented pair (MelodyJoin.Cascade.emdIfCandidate;
    * every pre-filter rejects with admissible slack only), so
    * thresholdJoin(th) == thresholdJoin(Theta3d).filter(dist <= th) for
    * th <= Theta3d, double-for-double. Before this memo the fallback
    * re-ran the whole enumeration+cascade every sf0.1 run (>= 40
    * zero-distance duplicate-histogram pairs keep the pad-margin proof
    * failing — VERDICT r16 item 3, driver row 2.47 -> 3.69s). The
    * EdgeMemo conventions apply: keyed (session, dir), cleared between
    * bench passes via [[clearSessionCaches]], dies with the session. */
  private final class Cube3dMemo(s: SparkSession, dir: String) {
    @volatile private var built: DataFrame = null
    def pairs: DataFrame = synchronized {
      if (built == null) {
        val hists = Fixtures.tripleHists(s, dir)
        val cfg3 = melodyCfg3dFor(s, dir)
        val prep = MelodyJoin.prepareCached(s, hists, cfg3)
        // LAZY persist (no count): the first consumer's own action
        // materializes the cache as a side effect of its pipeline — an
        // eager count here was measured as a pure materialization
        // barrier on q_emd3d_pairs (the union output can no longer
        // pipeline into the canonicalization join)
        built = MelodyJoin.thresholdJoinPrepared(s, prep, Theta3d, cfg3)
          .persistOnce()
      }
      built
    }
    def unpersistIfBuilt(): Unit = {
      val b = built
      if (b != null) scala.util.Try(b.unpersist(false))
    }
  }

  private val cube3dCache =
    scala.collection.mutable.Map.empty[(SparkSession, String), Cube3dMemo]

  private def cube3dPairs(s: SparkSession, dir: String): DataFrame =
    cube3dCache.synchronized {
      cube3dCache.filterInPlace { case ((ss, _), m) =>
        !ss.sparkContext.isStopped || { m.unpersistIfBuilt(); false } }
      cube3dCache.getOrElseUpdate((s, dir), new Cube3dMemo(s, dir))
    }.pairs

  def clearCube3dCache(spark: SparkSession): Unit = cube3dCache.synchronized {
    val dead = cube3dCache.keys.filter(_._1 eq spark).toSeq
    dead.foreach { k => cube3dCache.remove(k).foreach(_.unpersistIfBuilt()) }
  }

  /** Session-memoized residual IVF-PQ engine state — the q_ivfpq_topk /
    * q_ivfpq_rerank / q_ivfpq_recall rows train the IDENTICAL two-level
    * index (same corpus `rest` = embeddings minus the min vec_id, same
    * kCoarse/numSub/ksub/iters/scale) plus the same min-id probe query;
    * training is deterministic (Cluster.lloydCentroids / pqTrain are
    * spec-pinned bit-identical), so within a session the three trainings
    * collapse to one (guide §2.1 don't-recompute; the EdgeMemo/
    * prepareCached precedent — engine state shared across query types
    * over one corpus). Cleared between bench passes via
    * [[clearSessionCaches]] so pass minimums keep covering training. */
  private final class IvfPqMemo(s: SparkSession, dir: String) {
    @volatile private var built: (Long, Array[Long], Ann.IvfPqIndex) = null
    def state: (Long, Array[Long], Ann.IvfPqIndex) = synchronized {
      if (built == null) {
        val embs = Fixtures.embeddings(s, dir)
        val minId = embs.agg(min(col("vec_id"))).head().getLong(0)
        val qq = Cluster.quantize(embs.filter(col("vec_id") === minId), 1000)
          .select(col("v")).head().getSeq[Long](0).toArray
        val idx = Ann.buildIvfPqIndex(s, embs.filter(col("vec_id") =!= minId),
          kCoarse = 4, numSub = 4, ksub = 8)
        built = (minId, qq, idx)
      }
      built
    }
    def unpersistIfBuilt(): Unit = {
      val b = built
      if (b != null) scala.util.Try(b._3.close())
    }
  }

  private val ivfPqCache =
    scala.collection.mutable.Map.empty[(SparkSession, String), IvfPqMemo]

  private def ivfPqState(s: SparkSession, dir: String): (Long, Array[Long], Ann.IvfPqIndex) =
    ivfPqCache.synchronized {
      ivfPqCache.filterInPlace { case ((ss, _), m) =>
        !ss.sparkContext.isStopped || { m.unpersistIfBuilt(); false } }
      ivfPqCache.getOrElseUpdate((s, dir), new IvfPqMemo(s, dir))
    }.state

  def clearIvfPqCache(spark: SparkSession): Unit = ivfPqCache.synchronized {
    val dead = ivfPqCache.keys.filter(_._1 eq spark).toSeq
    dead.foreach { k => ivfPqCache.remove(k).foreach(_.unpersistIfBuilt()) }
  }

  private val contamCache =
    scala.collection.mutable.Map.empty[(SparkSession, String), ContamMemo]

  private def contamPostings(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    contamCache.synchronized {
      contamCache.filterInPlace { case ((ss, _), m) =>
        !ss.sparkContext.isStopped || { m.unpersistIfBuilt(); false } }
      contamCache.getOrElseUpdate((s, dir), new ContamMemo(s, dir))
    }.dfs

  def clearContamCache(spark: SparkSession): Unit = contamCache.synchronized {
    val dead = contamCache.keys.filter(_._1 eq spark).toSeq
    dead.foreach { k => contamCache.remove(k).foreach(_.unpersistIfBuilt()) }
  }

  private val edgeCache =
    scala.collection.mutable.Map.empty[(SparkSession, String), EdgeMemo]

  private def edgeMemo(s: SparkSession, dir: String): EdgeMemo =
    edgeCache.synchronized {
      edgeCache.filterInPlace { case ((ss, _), m) =>
        !ss.sparkContext.isStopped || { m.unpersistIfBuilt(); false } }
      edgeCache.getOrElseUpdate((s, dir), new EdgeMemo(s, dir))
    }

  private def simhashEdges(s: SparkSession, dir: String): DataFrame =
    edgeMemo(s, dir).df

  /** Session-memoized near-dup clustering (see [[EdgeMemo.cc]]). */
  private def simhashClusters(s: SparkSession, dir: String): DataFrame =
    edgeMemo(s, dir).cc

  def clearEdgeCache(spark: SparkSession): Unit = edgeCache.synchronized {
    val dead = edgeCache.keys.filter(_._1 eq spark).toSeq
    dead.foreach { k => edgeCache.remove(k).foreach(_.unpersistIfBuilt()) }
  }

  /** Drop EVERY session-scoped cache the engine keeps (fixture frames,
    * melody prep state, the simhash edge memo) plus the whole plan
    * cache — operators that return a persisted result
    * (materializeAndFree pattern) leave plan-cache entries a later run
    * of the same pure-Catalyst query would silently hit. The ONE
    * registry both Bench's repeat passes and BenchEach's
    * SPARK_GRAFT_BENCH_CLEAR mode call: a new session cache added to
    * the codebase gets registered here once, not in each harness. */
  def clearSessionCaches(spark: SparkSession): Unit = {
    graft.sources.Fixtures.clearCache(spark)
    graft.operators.MelodyJoin.clearPrepCache(spark)
    clearEdgeCache(spark)
    clearContamCache(spark)
    clearCube3dCache(spark)
    clearIvfPqCache(spark)
    graft.streaming.StreamOps.clearFeedCache(spark)
    spark.sharedState.cacheManager.clearCache()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- scans + aggregation smoke (S1, A1-analog) ---
    "q1_agg" -> ((s, dir) => {
      Fixtures.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(round(sum(col("l_quantity")), 6).as("sum_qty"),
          count(lit(1)).as("n"))
    }),

    // --- histogram build (P1 normalize; the canonical fixture) ---
    "q_hist_build" -> ((s, dir) => {
      Fixtures.quantityHistLong(s, dir)
        .select(col("id"), col("bin").cast("long").as("bin"),
          round(col("w"), 6).as("w"))
    }),

    // --- the SQL surface: graft_* functions resolved from the registry,
    //     RubnerPrefilter grafting the LB cascade into plain user SQL.
    //     The mod-7 id subset keeps the deliberately-naive a.id < b.id
    //     pair join (the whole point: NO hand blocking — the optimizer
    //     rule is what prunes) bounded at bench scale ---
    "q_sql_emd" -> ((s, dir) => {
      graft.plans.GraftFunctions.ensureRegistered(s)
      Fixtures.quantityHists(s, dir).filter(col("id") % 7 === 0)
        .createOrReplaceTempView("graft_sql_emd_hists")
      s.sql(
        s"""SELECT a.id AS rid, b.id AS sid,
           |       round(graft_emd1d(a.weights, b.weights), 6) AS dist
           |FROM graft_sql_emd_hists a JOIN graft_sql_emd_hists b
           |  ON a.id < b.id
           |WHERE graft_emd1d(a.weights, b.weights) <= $Theta""".stripMargin)
    }),

    // --- 1-D EMD threshold self-join (D2 + J1 semantics, banded blocking) ---
    "q_emd1d_pairs" -> ((s, dir) => {
      val hists = Fixtures.quantityHists(s, dir)
      EmdJoins.emd1dThresholdJoin(hists, Theta)
        .select(col("rid"), col("sid"), round(col("dist"), 6).as("dist"))
    }),

    // --- top-k closest pairs by 1-D EMD (J2/A7/O1 semantics) ---
    "q_emd1d_topk" -> ((s, dir) => {
      val hists = Fixtures.quantityHists(s, dir)
      EmdJoins.emd1dTopK(hists, TopK)
        .select(col("rid"), col("sid"), round(col("dist"), 6).as("dist"))
        .orderBy(col("dist"), col("rid"), col("sid"))
    }),

    // --- quadtree tree-EMD threshold join (Indyk-Thaper embedding): the
    //     multi-resolution EMD-family path that stays SQL-expressible in
    //     any dimension, so the driver gets a hash-checked row for it ---
    "q_treeemd_pairs" -> ((s, dir) => {
      val hists = Fixtures.quantityHists(s, dir)
      EmdJoins.treeEmdThresholdJoin(hists, TreeTau)
        .select(col("rid"), col("sid"), round(col("dist"), 6).as("dist"))
    }),

    // --- octree tree-EMD threshold join over 3-D histograms: the
    //     multi-dimensional EMD-family join that stays SQL-expressible
    //     (exact 3-D EMD needs an LP; the tree metric is a flat
    //     weighted-L1 embedding), giving the driver a hash-checked
    //     multi-dimensional EMD row ---
    "q_treeemd3d_pairs" -> ((s, dir) => {
      val hists = Fixtures.tripleHists(s, dir)
      EmdJoins.treeEmd3dThresholdJoin(hists, TreeTau3d)
        .select(col("rid"), col("sid"), round(col("dist"), 6).as("dist"))
    }),

    // --- tree-EMD top-k, 1-D and 3-D (J2/A7 analog on the tree metric:
    //     sampled k-th-distance bound, banded join, bounded-heap top-k) ---
    "q_treeemd_topk" -> ((s, dir) => {
      val hists = Fixtures.quantityHists(s, dir)
      EmdJoins.treeEmdTopK(hists, TopK)
        .select(col("rid"), col("sid"), round(col("dist"), 6).as("dist"))
        .orderBy(col("dist"), col("rid"), col("sid"))
    }),

    "q_treeemd3d_topk" -> ((s, dir) => {
      val hists = Fixtures.tripleHists(s, dir)
      EmdJoins.treeEmd3dTopK(hists, TopK)
        .select(col("rid"), col("sid"), round(col("dist"), 6).as("dist"))
        .orderBy(col("dist"), col("rid"), col("sid"))
    }),

    // --- pivot-partition MRSimJoin engine, top-k form (J3+J2: the
    //     reference serves both query types from every engine,
    //     Join.java:42-131) ---
    "q_mrsim1d_topk" -> ((s, dir) => {
      val hists = Fixtures.quantityHists(s, dir)
      MrSimJoin.topKJoin(s, hists, TopK, melodyCfg1d)
        .select(col("rid"), col("sid"), round(col("dist"), 6).as("dist"))
        .orderBy(col("dist"), col("rid"), col("sid"))
    }),

    // --- Rubner (centroid) lower-bound threshold join (D10/P9) ---
    "q_rubner_pairs" -> ((s, dir) => {
      val hists = Fixtures.quantityHists(s, dir)
        .withColumn("_mean", EmdCols.histMean(col("weights")))
      EmdJoins.bandedSelfPairs(hists, "id", "_mean", RubnerTheta)
        .select(col("id_a").as("rid"), col("id_b").as("sid"),
          round(abs(col("_mean_a") - col("_mean_b")), 6).as("dist"))
    }),

    // --- 3-D Rubner (centroid) lower-bound threshold join (D10/P9 in 3
    //     dimensions): centroid coordinate d = sum of corner weights with
    //     bit d set; 2-key banding on (cx, cy) — every coordinate gap is
    //     bounded by the L2 distance, so the 9-neighbor band equijoin
    //     keeps perfect recall with a multiplicative candidate cut ---
    "q_rubner3d_pairs" -> ((s, dir) => {
      val w = col("weights")
      val cents = Fixtures.tripleHists(s, dir).select(col("id"),
        (w(4) + w(5) + w(6) + w(7)).as("_cx"),
        (w(2) + w(3) + w(6) + w(7)).as("_cy"),
        (w(1) + w(3) + w(5) + w(7)).as("_cz"))
      val dx = col("_cx_a") - col("_cx_b")
      val dy = col("_cy_a") - col("_cy_b")
      val dz = col("_cz_a") - col("_cz_b")
      EmdJoins.bandedSelfPairs2(cents, "id", "_cx", Some("_cy"), Rubner3dTheta)
        .withColumn("dist", sqrt(dx * dx + dy * dy + dz * dz))
        .filter(col("dist") <= Rubner3dTheta)
        .select(col("id_a").as("rid"), col("id_b").as("sid"),
          round(col("dist"), 6).as("dist"))
    }),

    // --- grid-pruned melody engine, 1-D (J1: full DuckDB oracle since
    //     exact EMD == closed-form 1-D EMD on integer bins) ---
    "q_melody1d_pairs" -> ((s, dir) => {
      val hists = Fixtures.quantityHists(s, dir)
      MelodyJoin.thresholdJoin(s, hists, Theta, melodyCfg1d)
        .select(col("rid"), col("sid"), round(col("dist"), 6).as("dist"))
    }),

    // --- pivot-partition MRSimJoin engine, 1-D (J3; same DuckDB oracle
    //     as the melody engine - engines are answer-equivalent) ---
    "q_mrsim1d_pairs" -> ((s, dir) => {
      val hists = Fixtures.quantityHists(s, dir)
      MrSimJoin.thresholdJoin(s, hists, Theta, melodyCfg1d)
        .select(col("rid"), col("sid"), round(col("dist"), 6).as("dist"))
    }),

    // --- four-engine answer equality, driver-visible: the reference
    //     dispatches four engines off one conf (Join.java:42-131 —
    //     melody, mrsim, bspmelody(=melody), bspb(=baseline)) and
    //     claims they return the same join. The four independently
    //     built engines here (banded closed form, grid-cascade melody,
    //     pivot-partition mrsim, brute-cascade baseline) run on the
    //     same corpus slice; the declared row carries each engine's
    //     pair count, its MEMBERSHIP symmetric difference vs the
    //     closed-form reference on (rid, sid), and a dist_ok verdict
    //     (max raw-distance spread across engines <= 1e-9). Membership
    //     is FP-safe — thresholds carry measured boundary gaps >= 1e-6
    //     — but the four engines' distance ARITHMETIC is deliberately
    //     FP-distinct (prefix-sum vs cum-of-differences shapes), so
    //     requiring bit-equal rounded doubles would hinge on no value
    //     straddling a 6dp rounding half-boundary; a 1e-9 spread bound
    //     asserts agreement far below the reporting granule without
    //     that fragility. The oracle pins n_pairs to the
    //     DuckDB-computed count, n_diff to ZERO and dist_ok to TRUE,
    //     so any divergence hash-fails the driver gate ---
    "q_engine_equiv" -> ((s, dir) => {
      // fixed-size corpus slice (512 lowest ids): the equality evidence
      // does not strengthen with corpus size, so the audit row's cost
      // must not grow with it either
      val all = Fixtures.quantityHists(s, dir)
      val ids = all.select(col("id")).distinct().orderBy(col("id")).limit(512)
      // pin the slice: four engines (and melody's grids/duals/enrichment
      // passes inside prepare) each re-scan their input several times —
      // without the pin every pass re-reads the fixture and re-runs the
      // broadcast semi-join; 512 rows cache for the audit's duration.
      // coalesce(4): the slice is FIXED 512 rows by contract at any
      // corpus scale, so right-sizing its task count is constant-cost
      // correctness, not a scale assumption — the engines' ~30 small
      // prepare/routing jobs otherwise pay 32-task scheduling latency
      // each on a 512-row input (measured ~2s of the row, EquivProbe)
      val hists = all.join(broadcast(ids), "id")
        .coalesce(4)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      hists.count()
      def norm(df: DataFrame): DataFrame =
        df.select(col("rid"), col("sid"), col("dist").cast("double").as("dist"))
      // the four engines are independent and latency-bound on the 512-row
      // slice (dozens of small prepare/routing jobs each) — materialize
      // them as CONCURRENT Spark jobs so the audit's wall time is the
      // slowest engine, not the sum; identical outputs, identical plans,
      // just overlapping job submission (a supported Spark pattern)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      // ONE declaration owns both the engine roster and its order: the
      // Futures below and the result-row decoding after the try block
      // both derive from it, so adding/reordering an engine cannot
      // silently mislabel counts (the two used to be separate lists)
      val engineDefs: Seq[(String, () => DataFrame)] = Seq(
        "closed_form" -> (() => norm(EmdJoins.emd1dThresholdJoin(hists, Theta))),
        "melody" -> (() => norm(MelodyJoin.thresholdJoin(s, hists, Theta, melodyCfg1d))),
        // the 100 TB quantile path, driver-visibly answer-preserving
        // (VERDICT r15 item 6): approx-percentile grid boundaries
        // (Config.exactQuantiles=false) steer PRUNING only, so this
        // engine's pair set must diff to zero against every other —
        // the claim the scaladoc makes, now hash-checked every round
        "melody_approxq" -> (() => norm(MelodyJoin.thresholdJoin(
          s, hists, Theta, melodyCfg1d.copy(exactQuantiles = false)))),
        "mrsim" -> (() => norm(MrSimJoin.thresholdJoin(s, hists, Theta, melodyCfg1d))),
        "baseline" -> (() => norm(BaselineJoin.thresholdJoin(s, hists, Theta, melodyCfg1d))))
      val engineNames = engineDefs.map(_._1)
      // try/finally: a failing engine Future must not leak the pinned
      // slice (Await rethrows; the sibling jobs finish against a frame
      // whose unpersist is lazy-safe)
      val r = try {
        val engineFs: Seq[(String, Future[DataFrame])] =
          engineDefs.map { case (n, mk) => n -> Future(mk()) }
        val engines: Seq[(String, DataFrame)] =
          engineFs.map { case (n, f) => n -> Await.result(f, Duration.Inf) }
        // ONE action for all counts + diffs: tag, union, per-pair presence
        // flags + distance spread, then a global aggregate — each engine
        // runs exactly once and no pair set is recomputed for
        // set-difference passes
        val tagged = engines.map { case (n, df) =>
          df.withColumn("engine", lit(n))
        }.reduce(_ unionByName _)
        val flags = engines.map { case (n, _) =>
          max(when(col("engine") === n, 1).otherwise(0)).as(s"f_$n")
        } :+ (max(col("dist")) - min(col("dist"))).as("spread")
        val perKey = tagged.groupBy(col("rid"), col("sid"))
          .agg(flags.head, flags.tail: _*)
        val aggs = engines.flatMap { case (n, _) => Seq(
          coalesce(sum(col(s"f_$n")), lit(0)).cast("long").as(s"n_$n"),
          coalesce(sum(abs(col(s"f_$n") - col("f_closed_form"))), lit(0))
            .cast("long").as(s"d_$n"))
        } :+ coalesce(max(col("spread")), lit(0.0)).as("max_spread")
        perKey.agg(aggs.head, aggs.tail: _*).head()
      } finally hists.unpersist(false)
      val distOk = r.getDouble(2 * engineNames.size) <= 1e-9
      val rows = engineNames.zipWithIndex.map { case (n, i) =>
        (n, r.getLong(2 * i), r.getLong(2 * i + 1), distOk)
      }
      s.createDataFrame(rows).toDF("engine", "n_pairs", "n_diff", "dist_ok")
    }),

    // --- grid-pruned melody engine, 3-D exact LP-EMD (J1). The LP is a
    //     closed form on this corpus (CubeKR: KR duality over the fixed
    //     sqrt-Hamming cube metric), so the row carries a FULL DuckDB
    //     oracle; it additionally stays SELF-VERIFYING (the tree-exact
    //     engine recomputes the answer and crossCheckPairs requires
    //     pair-set equality) and the reported dist is canonicalized to
    //     the same closed form both engines print bit-identically.
    //     Engine state is theta-independent and shared with
    //     q_emd3d_topk via the session prepare cache — the reference
    //     pairing of query types over one corpus (Join.java:42-131)
    //     pays the grid/enrichment once ---
    "q_emd3d_pairs" -> ((s, dir) => {
      val hists = Fixtures.tripleHists(s, dir)
      // the Theta3d pair set is the session-shared Cube3dMemo (its other
      // consumer is q_emd3d_topk's tie fallback — see the memo scaladoc)
      cubeCanonicalDist(s, dir)(crossCheckPairs(
        cube3dPairs(s, dir)
          .select(col("rid"), col("sid"), round(col("dist"), 6).as("dist")),
        EmdJoins.treeExact3dThresholdJoin(hists, Theta3d),
        "q_emd3d_pairs",
        audit = simplexAudit3d(hists, "q_emd3d_pairs")))
    }),

    // --- tree-exact 3-D engine (FlowTree-style: banded tree candidates
    //     at the certified 2*theta distortion radius + LP verify) — the
    //     fourth answer-identical exact 3-D engine; self-verifying against
    //     the melody engine (LP not SQL-expressible) ---
    "q_treeexact3d_pairs" -> ((s, dir) => {
      val hists = Fixtures.tripleHists(s, dir)
      cubeCanonicalDist(s, dir)(crossCheckPairs(
        EmdJoins.treeExact3dThresholdJoin(hists, Theta3d)
          .select(col("rid"), col("sid"), round(col("dist"), 6).as("dist")),
        MelodyJoin.thresholdJoinPrepared(s,
          MelodyJoin.prepareCached(s, hists, melodyCfg3dFor(s, dir)),
          Theta3d, melodyCfg3dFor(s, dir)),
        "q_treeexact3d_pairs",
        audit = simplexAudit3d(hists, "q_treeexact3d_pairs")))
    }),

    // --- 3-D exact EMD top-k (J2/A7; shares the cached engine state;
    //     self-verifying against the tree-exact top-k). MEMBERSHIP of
    //     the final k-set is decided by the CANONICAL rounded distance,
    //     not the engine's (ADVICE r15): each engine fetches a
    //     TopK + CanonPad candidate pool by its own distance, the pool
    //     is canonicalized ([[cubeCanonicalDist]] — the same fixed FP
    //     expression the oracle evaluates), and the k survivors are the
    //     canonical-least with the (dist, rid, sid) tie-break. A
    //     per-pool margin test proves the pad was deep enough that
    //     no unfetched pair could enter the canonical top-k (falling
    //     back to a complete threshold fetch when it cannot), so a
    //     near-boundary pair rounding differently under the two kernels
    //     can no longer flip the k-set nondeterministically — both
    //     engines' canonical k-sets are DETERMINISTICALLY identical and
    //     the crosscheck spread is exactly 0. ---
    "q_emd3d_topk" -> ((s, dir) => {
      val hists = Fixtures.tripleHists(s, dir)
      val cfg3 = melodyCfg3dFor(s, dir)
      val prep = MelodyJoin.prepareCached(s, hists, cfg3)
      // Canonical-selection harness: collect the <= TopK + CanonPad pool
      // (40 scalar rows — O(k) driver state, never data-sized), replace
      // each distance with the canonical closed form, sort, take TopK.
      // Soundness of the pad: BOTH engines rank their pool by the
      // ROUNDED engine distance, and both pools arrive here rounded
      // (the select below — engMax must be a rounded value or the raw
      // vs rounded 5e-7 skew eats the margin). Any UNFETCHED pair U
      // then has round(engine(U)) >= engMax, so engine(U) >= engMax
      // - 5e-7, canonical(U) >= engMax - 1.5e-6 (1e-6 kernel
      // agreement), and round(canonical(U)) >= engMax - 2e-6; hence
      // engMax > cutoff + 2e-6 implies the rounded canonical of U
      // exceeds cutoff — U cannot displace a survivor.
      // When the margin CANNOT prove exclusion (e.g. sf0.1 has >= 40
      // zero-distance duplicate-histogram pairs, so the whole pool ties
      // at the cutoff), fall back to a COMPLETE fetch: every pair whose
      // canonical dist could reach the cutoff has engine dist
      // <= cutoff + 2e-6 < the threshold radius cutoff + 4e-6, so the
      // canonical (dist, rid, sid) top-k over that set is the GLOBAL
      // canonical top-k, cutoff ties included — deterministic, and
      // identical to the oracle's ORDER BY ... LIMIT k.
      def canonicalTopK(pool: DataFrame,
                        allWithin: Double => DataFrame): DataFrame = {
        import s.implicits._
        def canonOf(df: DataFrame): Array[(Long, Long, Double)] =
          cubeCanonicalDist(s, dir)(df).as[(Long, Long, Double)].collect()
        val fetched = pool.select(col("rid").cast("long"),
            col("sid").cast("long"), col("dist").cast("double"))
          .as[(Long, Long, Double)].collect()
        val engMax = fetched.map(_._3).max
        val canon = canonOf(s.createDataset(fetched.toSeq)
          .toDF("rid", "sid", "dist"))
        val top0 = canon.sortBy { case (a, b, d) => (d, a, b) }.take(TopK)
        val cutoff = top0.map(_._3).max
        val top =
          if (engMax > cutoff + 2e-6) top0.toSeq
          else canonOf(allWithin(cutoff + 4e-6)
              .select(col("rid").cast("long"), col("sid").cast("long"),
                col("dist").cast("double")).toDF("rid", "sid", "dist"))
            .sortBy { case (a, b, d) => (d, a, b) }.take(TopK).toSeq
        s.createDataset(top).toDF("rid", "sid", "dist")
      }
      crossCheckPairs(
        canonicalTopK(
          MelodyJoin.topKJoinPrepared(s, prep, TopK + CanonPad, cfg3)
            .select(col("rid"), col("sid"), round(col("dist"), 6).as("dist")),
          // tie fallback: {emd <= th} is a pure filter of the memoized
          // Theta3d pair set whenever th <= Theta3d (exact-solver
          // membership — see Cube3dMemo), so the every-sf0.1-run
          // complete fetch stops re-running enumeration + cascade
          // (VERDICT r16 item 3); a cutoff past Theta3d (never seen at
          // the declared scales) still takes the live engine fetch
          th => (if (th <= Theta3d) cube3dPairs(s, dir).filter(col("dist") <= th)
                 else MelodyJoin.thresholdJoinPrepared(s, prep, th, cfg3))
            .select(col("rid"), col("sid"), round(col("dist"), 6).as("dist"))),
        canonicalTopK(EmdJoins.treeExact3dTopK(hists, TopK + CanonPad)
            .select(col("rid"), col("sid"), round(col("dist"), 6).as("dist")),
          th => EmdJoins.treeExact3dThresholdJoin(hists, th)),
        "q_emd3d_topk",
        audit = simplexAudit3d(hists, "q_emd3d_topk"))
    }),

    // --- ORACLE-VISIBLE witness verdict for the three no_oracle LP rows:
    //     recomputes each primary/witness pair-set diff and emits one row
    //     per LP query (only_primary, only_witness, engines_agree). The
    //     oracle expects literal zeros/true, so the driver's hash check
    //     SEES the cross-engine agreement directly instead of recording
    //     `no_oracle`. Under -Dgraft.crosscheck=off (Bench/BenchEach
    //     timing runs only — Verify NEVER sets it, per the gate contract)
    //     the expensive second-engine runs are skipped and the literal
    //     expected rows come back, exactly like the in-query witness
    //     assertions those runs also skip ---
    "q_lp_witness" -> ((s, dir) => {
      import s.implicits._
      val enabled = sys.props.getOrElse("graft.crosscheck", "on") != "off"
      val rows =
        if (!enabled)
          Seq(("q_emd3d_pairs", 0L, 0L, true), ("q_emd3d_topk", 0L, 0L, true),
            ("q_treeexact3d_pairs", 0L, 0L, true),
            ("q_mrsim3d_pairs_vs_tree", 0L, 0L, true),
            ("q_mrsim3d_pairs_vs_melody", 0L, 0L, true),
            ("q_mrsim3d_topk_vs_tree", 0L, 0L, true))
        else {
          val hists = Fixtures.tripleHists(s, dir)
          val cfg3 = melodyCfg3dFor(s, dir)
          val prep = MelodyJoin.prepareCached(s, hists, cfg3)
          // raw distances; the verdict compares pair IDS as sets and
          // distances by tolerance (the engines run different exact
          // kernels — SSP vs the KR closed form — and a rounded-tuple
          // compare would flap on rounding-boundary pairs)
          def canon(df: DataFrame): DataFrame = df.select(
            least(col("rid"), col("sid")).as("a"),
            greatest(col("rid"), col("sid")).as("b"),
            col("dist").cast("double").as("d"))
          // persist each canonical pair-set: every frame feeds two
          // exceptAll counts (the threshold sets feed four — both diff
          // directions of two verdict rows), and an unpersisted plan
          // would re-run its whole engine per count
          val melodyC = canon(MelodyJoin.thresholdJoinPrepared(
            s, prep, Theta3d, cfg3)).persist()
          val treeC = canon(EmdJoins.treeExact3dThresholdJoin(hists, Theta3d))
            .persist()
          val topkMC = canon(MelodyJoin.topKJoinPrepared(
            s, prep, TopK, cfg3)).persist()
          val topkTC = canon(EmdJoins.treeExact3dTopK(hists, TopK)).persist()
          // third physical strategy on the SAME exact-EMD config: the
          // pivot-partition engine's 3-D LP pair/top-k sets, diffed
          // against both other engines so all three are pairwise-verified
          // (the reference's core claim is answer-equivalent engines,
          // Join.java:42-131); oracle-checked at 1-D, witness-checked
          // here at 3-D
          val mrsimC = canon(MrSimJoin.thresholdJoin(
            s, hists, Theta3d, cfg3)).persist()
          val topkXC = canon(MrSimJoin.topKJoin(
            s, hists, TopK, cfg3)).persist()
          def verdict(name: String, po: DataFrame, wo: DataFrame) = {
            val pk = po.select(col("a"), col("b"))
            val wk = wo.select(col("a"), col("b"))
            val onlyP = pk.exceptAll(wk).count()
            val onlyW = wk.exceptAll(pk).count()
            val spread = po.join(wo.select(col("a"), col("b"),
                col("d").as("dw")), Seq("a", "b"))
              .agg(coalesce(max(abs(col("d") - col("dw"))), lit(0.0)))
              .head().getDouble(0)
            (name, onlyP, onlyW,
              onlyP == 0L && onlyW == 0L && spread <= 5.2e-7)
          }
          try Seq(
            verdict("q_emd3d_pairs", melodyC, treeC),
            verdict("q_emd3d_topk", topkMC, topkTC),
            verdict("q_treeexact3d_pairs", treeC, melodyC),
            verdict("q_mrsim3d_pairs_vs_tree", mrsimC, treeC),
            verdict("q_mrsim3d_pairs_vs_melody", mrsimC, melodyC),
            verdict("q_mrsim3d_topk_vs_tree", topkXC, topkTC))
          finally Seq(melodyC, treeC, topkMC, topkTC, mrsimC, topkXC)
            .foreach(_.unpersist(false))
        }
      rows.toDF("query", "only_primary", "only_witness", "engines_agree")
    }),

    // --- generator-analog pipeline (S8 -> J1): binary payload -> byte
    //     histogram -> 1-D EMD threshold join (the reference's
    //     image->histogram->join lifecycle, mr/EmdGenerate.java) ---
    "q_gen_emd" -> ((s, dir) => {
      val feats = Multimodal.extractFeatures(s,
        Multimodal.withPayload(Fixtures.documents(s, dir)))
        .select(col("doc_id").as("id"), col("features").as("weights"))
      EmdJoins.emd1dThresholdJoin(feats, 0.00203)
        .select(col("rid"), col("sid"), round(col("dist"), 6).as("dist"))
    }),

    // ==================== training-data pipeline ops ====================

    // --- exact dedup: hash-groupBy on canonical fingerprint ---
    "q_dedup_exact" -> ((s, dir) => {
      Dedup.exactDedup(Fixtures.documents(s, dir))
    }),

    // --- STREAMING exact dedup, driver-visible: the corpus is replayed
    //     through the real flatMapGroupsWithState operator as ascending-id
    //     micro-batches (MemoryStream harness); the oracle replays the
    //     first-seen-keeper semantics (min doc_id per fingerprint under
    //     that ingestion order), so the hash gate checks actual streaming
    //     state execution, not just a batch re-declaration ---
    "q_stream_dedup" -> ((s, dir) => {
      // 2 batches: cross-batch state carry still exercised (batch-1
      // state serves batch-2 lookups) at half the per-batch commit
      // cost; the 4-batch feed stays in StreamOpsSpec
      graft.streaming.StreamOps.replayExactDedup(s,
        Fixtures.documents(s, dir), numBatches = 2,
        feedKey = Some(s"docs:$dir"))
    }),

    // --- STREAMING near-dup, driver-visible: the corpus replays through
    //     the real per-bucket flatMapGroupsWithState + streaming
    //     dropDuplicates chain (MemoryStream harness); the pair set is
    //     ingestion-order-invariant, so the batch simhash oracle checks
    //     actual streaming bucket-state execution ---
    "q_stream_neardup" -> ((s, dir) => {
      graft.streaming.StreamOps.replayNearDup(s, Fixtures.documents(s, dir),
        maxHamming = 7, numBatches = 2, feedKey = Some(s"docs:$dir"))
    }),

    // --- STREAMING heavy hitters, driver-visible: per micro-batch
    //     distributed Misra–Gries treeAggregate merged into a
    //     cross-batch accumulator (the mergeable-sketch streaming
    //     pattern), batches landed to parquet, exact recount of the
    //     <= k candidates on close — same (token, cnt) contract and
    //     corpus-wide oracle as the batch q_heavy_hitters, so a
    //     dropped/replayed batch is a driver-visible hash mismatch ---
    "q_stream_heavy" -> ((s, dir) => {
      graft.streaming.StreamOps.replayHeavyHitters(s,
        Fixtures.documents(s, dir), phiDen = 1000L, numBatches = 2,
        feedKey = Some(s"docs:$dir"))
    }),

    // --- token counting + lexical stats ---
    "q_token_stats" -> ((s, dir) => {
      Fixtures.documents(s, dir).select(col("doc_id"),
        TextCols.tokenCount(col("text")).cast("long").as("n_tokens"),
        size(TextCols.distinctTokens(col("text"))).cast("long").as("n_distinct"),
        round(TextCols.avgTokenLength(col("text")), 6).as("avg_len"),
        round(TextCols.uniqueRatio(col("text")), 6).as("uniq_ratio"))
    }),

    // --- BPE-ish subword token counting (regex pre-tokenizer) ---
    "q_bpe_tokens" -> ((s, dir) => {
      Fixtures.documents(s, dir).select(col("doc_id"),
        TextCols.bpeishTokenCount(col("text")).cast("long").as("n_bpe"))
    }),

    // --- rolling-hash (order-sensitive) document fingerprint over 32-bit
    //     md5 token hashes (both systems compute the fold bit-identically) ---
    "q_rolling_fp" -> ((s, dir) => {
      Fixtures.documents(s, dir).select(col("doc_id"),
        TextCols.rollingHash(col("text")).as("fp"))
    }),

    // --- quality scoring ---
    "q_quality" -> ((s, dir) => {
      Fixtures.documents(s, dir).select(col("doc_id"),
        round(TextCols.qualityScore(col("text")), 6).as("score"))
    }),

    // --- Gopher-style quality GATE (the actionable counterpart of the
    //     q_quality score): one boolean per rule + combined keep; every
    //     rule is an integer cross-multiplied comparison, engine-exact ---
    "q_quality_gate" -> ((s, dir) => {
      CorpusOps.qualityGate(Fixtures.documents(s, dir))
    }),

    // --- PII redaction audit: the synthetic corpus carries no PII, so
    //     the fixture derives deterministic contact strings from doc_id
    //     (replayed verbatim by the oracle CTE) — some docs get email +
    //     phone + IP, some a subset, some nothing, exercising every
    //     count-0 and multi-class path of the scrubber ---
    "q_pii_scrub" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      val idS = col("doc_id").cast("string")
      val contact = docs.select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 5 =!= 4,
          concat(lit(" contact user"), idS, lit("@mail.example.com now")))
          .otherwise(lit("")),
        when(col("doc_id") % 3 === 0,
          concat(lit(" call +1-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
            lit(".0."), (col("doc_id") % 100).cast("string")))
          .otherwise(lit(""))).as("text"))
      CorpusOps.piiScrub(contact)
    }),

    // --- HTML boilerplate extraction: the fixture text wraps in a
    //     deterministic doc_id-derived page (title/script/nav/aside/
    //     footer boilerplate + entity- and link-bearing paragraphs);
    //     the density-rule extractor (HtmlOps) recovers the main text.
    //     The oracle replays the per-line generation and the
    //     tag-strip/entity-decode/density rule in SQL — keep decisions
    //     are integer-exact (cross-multiplied link density, word
    //     counts), no FP anywhere ---
    "q_html_extract" -> ((s, dir) => {
      HtmlOps.extractMain(HtmlOps.htmlWrap(Fixtures.documents(s, dir)))
    }),

    // --- heuristic language ID ---
    "q_lang_id" -> ((s, dir) => {
      Fixtures.documents(s, dir).select(col("doc_id"), col("lang"),
        TextCols.langId(col("text")).as("lang_pred"))
    }),

    // --- exact n-gram (token-set) Jaccard similarity join via prefix
    //     filtering (perfect recall, no cartesian) ---
    "q_jaccard_pairs" -> ((s, dir) => {
      Dedup.jaccardJoin(Fixtures.documents(s, dir), 0.9)
        .select(col("rid"), col("sid"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // --- exact n-gram (3-token-shingle) Jaccard join: shingles become
    //     '_'-joined tokens and flow through the same prefix-filter
    //     operator. Shingle vocabularies dwarf the 64-token bitmask gate,
    //     so THIS query drives the scalable prefix path end-to-end (the
    //     token-set query above takes the bitmask fast path on this
    //     corpus). tau = 0.8969: the corpus' qualifying pairs sit at
    //     J >= 0.9 (nearest other distance is 0.003 below the threshold),
    //     and a high tau is the prefix filter's operating regime — the
    //     prefix length is (1-tau)*|set|+1, so low taus degrade toward
    //     exploding candidates ---
    "q_ngram_jaccard" -> ((s, dir) => {
      // the shingle ARRAY feeds the join directly (tokenExpr): building a
      // ~3x-document-sized '_'-shingle string per row only to re-split it
      // inside setTokens was pure per-row string churn — round-trip
      // equality argued at Dedup.setTokens (oracle hashes unchanged)
      Dedup.jaccardJoin(Fixtures.documents(s, dir), NgramTau,
          tokenExpr = Some(TextCols.shingles(col("text"), 3)))
        .select(col("rid"), col("sid"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // --- bounded edit-distance self-join (PassJoin segment signatures +
    //     banded levenshtein verify): the character-level member of the
    //     similarity-join family. d = 4 sits on a measured integer
    //     boundary (24 corpus pairs at ed exactly 4, none at ed 1-3, next
    //     mass at ed 8+) — integer distances are engine-exact, so the
    //     boundary needs no FP gap ---
    "q_edit_pairs" -> ((s, dir) => {
      EditJoin.editJoin(Fixtures.documents(s, dir), 4)
    }),

    // --- deterministic stratified sampling (corpus mixing): hash-threshold
    //     per-language keep rates, a pure map-side filter — no shuffle, no
    //     RNG, reproducible across engines (integer md5 compare, no FP) ---
    "q_stratified_sample" -> ((s, dir) => {
      CorpusOps.stratifiedSample(Fixtures.documents(s, dir), "lang",
        Map("en" -> 0.25, "de" -> 0.5, "es" -> 0.75, "zh" -> 1.0),
        defaultRate = 0.5)
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // --- fixed-size deterministic per-group sample: exactly 30 docs per
    //     language by md5 rank (stable across runs/engines; ties
    //     impossible — md5 of distinct ids is distinct) ---
    "q_fixed_sample" -> ((s, dir) => {
      CorpusOps.fixedSample(Fixtures.documents(s, dir), "lang", n = 30)
        .select(col("doc_id"), col("lang"), col("smp_rank"))
    }),

    // --- exact per-group order-statistic quantiles of token counts
    //     (type 1, integer-exact; q values are exact binary fractions so
    //     ceil(q*n) is the same integer in both engines) ---
    "q_group_quantiles" -> ((s, dir) => {
      CorpusOps.groupQuantiles(Fixtures.documents(s, dir), "lang",
        TextCols.tokenCount(col("text")), Seq(0.25, 0.5, 0.75, 1.0))
        .select(col("grp").as("lang"), col("q"), col("value"), col("n"))
    }),

    // --- EXACT 1/1000-fraction heavy-hitter tokens via two-pass
    //     Misra–Gries candidate pruning: shuffle-free treeAggregate
    //     sketch pass + exact recount of the <= 2048 candidates (the
    //     scale path that never shuffles the long-tail vocabulary);
    //     output provably identical to the full groupBy the oracle runs ---
    "q_heavy_hitters" -> ((s, dir) => {
      CorpusOps.heavyHitters(Fixtures.documents(s, dir), phiDen = 1000L)
    }),

    // --- sketch audits: the 100 TB mergeable-sketch paths (HLL++
    //     distinct, approx_percentile) computed NEXT TO their exact
    //     statistics, with the error-envelope assertion emitted as a
    //     boolean the oracle pins to TRUE — an out-of-bounds sketch is a
    //     driver-visible hash mismatch, not a silent estimate ---
    "q_approx_distinct" -> ((s, dir) => {
      val toks = Fixtures.documents(s, dir)
        .select(col("source"), explode(TextCols.tokens(col("text"))).as("token"))
      SketchOps.distinctAudit(toks, "source", col("token"))
    }),
    "q_approx_quantiles" -> ((s, dir) => {
      SketchOps.quantileAudit(Fixtures.events(s, dir), col("value"),
          Seq(0.5, 0.9, 0.99))
        .select(round(col("q"), 6).as("q"), col("n"), col("rank_ok"))
    }),

    // --- bloom-filter semi-join pre-filter audit: build one bloom over
    //     the urgent-order keys, drop lineitem rows map-side BEFORE the
    //     join shuffle; false_negatives pinned 0 (blooms never drop a
    //     true match), fp count pinned inside the capacity/fpp envelope ---
    "q_bloom_join" -> ((s, dir) => {
      SketchOps.bloomJoinAudit(
        Fixtures.lineitem(s, dir), col("l_orderkey"),
        Fixtures.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
        col("o_orderkey"))
    }),

    // --- count-min sketch frequency audit: Spark-native mergeable CMS
    //     aggregate probed for the stopword list next to exact counts;
    //     never-underestimates is exact, the overestimate is pinned
    //     inside slack*eps*N ---
    "q_cms_audit" -> ((s, dir) => {
      val toks = Fixtures.documents(s, dir)
        .select(explode(TextCols.tokens(col("text"))).as("token"))
      SketchOps.cmsAudit(toks, "token",
        Seq("the", "and", "of", "to", "in", "is", "with", "for"))
    }),

    // --- deterministic train/val/test split: md5-bucket thresholds,
    //     map-side and stable under corpus growth (a doc's split never
    //     changes when other docs arrive — the holdout property) ---
    "q_data_split" -> ((s, dir) => {
      CorpusOps.dataSplit(Fixtures.documents(s, dir))
    }),

    // --- windowed co-occurrence counts (PMI/word-vector corpus stat):
    //     per-row pair derivation, one map-side-combined aggregation ---
    "q_cooccur" -> ((s, dir) => {
      CorpusOps.cooccurrence(Fixtures.documents(s, dir), window = 3, k = 25)
    }),

    // --- BM25-shaped retrieval: TF-saturation scoring with the
    //     log-free bitlen idf (engine-exact; fixed-order term sum) ---
    "q_bm25_topk" -> ((s, dir) => {
      TfIdf.bm25TopK(Fixtures.documents(s, dir),
        Seq("spark", "table", "join"))
    }),

    // --- Z-order (Morton) layout key over (l_partkey, l_suppkey): the
    //     write-side data-skipping primitive — the dumped column is the
    //     pure-integer interleave key zOrderLayout range-partitions on
    //     (the layout itself is exercised in LayoutSpec; the key
    //     arithmetic is what an oracle can check) ---
    "q_zorder_key" -> ((s, dir) => {
      Fixtures.lineitem(s, dir).select(col("l_orderkey"), col("l_linenumber"),
        Layout.zOrderKey(Seq(col("l_partkey"), col("l_suppkey")), 16).as("zval"))
    }),

    // --- ordered conversion funnel over the events stream: earliest
    //     per-user completion time of each step strictly after the
    //     previous step (integer-micros, one user-partition exchange
    //     reused by all chained step windows) ---
    "q_funnel" -> ((s, dir) => {
      EventOps.funnel(Fixtures.events(s, dir), Seq("view", "click", "purchase"))
    }),

    // --- distributed BPE merge learning (tokenizer training). The
    //     learned table has no SQL oracle (iterative argmax); like the
    //     3-D LP rows it is witness-verified: q_bpe_witness re-trains
    //     with an independent sequential implementation and the oracle
    //     pins table equality + the full merge count ---
    "q_bpe_train" -> ((s, dir) => {
      Bpe.mergeTable(s, Bpe.train(s, Fixtures.documents(s, dir), numMerges = 30))
    }),
    "q_bpe_witness" -> ((s, dir) => {
      import s.implicits._
      val enabled = sys.props.getOrElse("graft.crosscheck", "on") != "off"
      val rows =
        if (!enabled) Seq(("q_bpe_train", 30L, true))
        else {
          val d = Fixtures.documents(s, dir)
          val dist = Bpe.train(s, d, numMerges = 30)
          // the sequential reference trainer needs the word-count table
          // on the driver; vocabulary grows sublinearly (Heaps' law) but
          // is still data-derived, so the collect is require-BOUNDED
          // (the collectBoundedRefs idiom): past the cap the witness
          // fails loudly instead of silently pulling a corpus-sized
          // table through the driver
          val rows = Bpe.wordCounts(d).limit(BpeWitnessVocabCap + 1).collect()
          require(rows.length <= BpeWitnessVocabCap,
            s"q_bpe_witness: word-count vocabulary exceeds the " +
              s"$BpeWitnessVocabCap-row driver cap for the sequential " +
              "reference trainer — witness on a capped most-frequent-word " +
              "slice or raise the cap deliberately; the DISTRIBUTED " +
              "trainer (q_bpe_train) is unaffected")
          val vocab = rows.map(r => (r.getString(0), r.getLong(1))).toSeq
          val ref = Bpe.trainReference(vocab, numMerges = 30)
          Seq(("q_bpe_train", dist.length.toLong, dist == ref))
        }
      rows.toDF("query", "n_merges", "engines_agree")
    }),

    // --- WordPiece tokenizer family (Schuster & Nakajima 2012; the
    //     BERT tokenizer), next to BPE: same corpus-collapse + RDD-round
    //     shape, the likelihood-gain selection rule count(ab)/(count(a)
    //     *count(b)) compared via BigInt CROSS-MULTIPLICATION (never a
    //     double — the FP-safe-ratio rule), ## continuations. Like BPE,
    //     the iterative argmax has no SQL oracle; q_wordpiece_witness
    //     re-trains with an independent sequential implementation and
    //     re-derives the encode totals with an independently-coded
    //     segmenter, hash-checked ---
    "q_wordpiece_train" -> ((s, dir) => {
      Wordpiece.mergeTable(s,
        Wordpiece.train(s, Fixtures.documents(s, dir), numMerges = 30))
    }),
    // --- WordPiece INFERENCE against the pinned demo vocabulary: greedy
    //     longest-match-first with whole-word [UNK] — full oracle (the
    //     recursive-CTE replay; the vocab literal interpolates from the
    //     same WordpieceDemoVocab val the Spark side uses) ---
    "q_wordpiece_tokens" -> ((s, dir) => {
      Wordpiece.encode(Fixtures.documents(s, dir), WordpieceDemoVocab)
    }),

    // --- unigram-LM (SentencePiece-style) Viterbi tokenization: the
    //     third tokenizer family, with the OPTIMAL-segmentation
    //     semantics greedy matchers cannot express (the demo vocab pins
    //     a longer piece losing to a cheaper split); integer scores,
    //     tie-free outputs (max score + min pieces at max), one map
    //     pass with a word memo — no shuffle ---
    "q_unigram_tokens" -> ((s, dir) => {
      Unigram.encode(Fixtures.documents(s, dir), UnigramDemoVocab)
    }),
    "q_wordpiece_witness" -> ((s, dir) => {
      import s.implicits._
      val enabled = sys.props.getOrElse("graft.crosscheck", "on") != "off"
      val rows =
        if (!enabled) Seq(("q_wordpiece_train", 30L, true),
          ("q_wordpiece_tokens", 30L, true))
        else {
          val d = Fixtures.documents(s, dir)
          val dist = Wordpiece.train(s, d, numMerges = 30)
          val wc = Bpe.wordCounts(d).limit(BpeWitnessVocabCap + 1).collect()
          require(wc.length <= BpeWitnessVocabCap,
            s"q_wordpiece_witness: word-count vocabulary exceeds the " +
              s"$BpeWitnessVocabCap-row driver cap for the sequential " +
              "reference trainer (the q_bpe_witness bound)")
          val vocab = wc.map(r => (r.getString(0), r.getLong(1))).toSeq
          val ref = Wordpiece.trainReference(vocab, numMerges = 30)
          // encode-total witness: the distributed encoder over the
          // TRAINED pieces vs an independently-coded recursive
          // segmenter on the driver's word-count table
          val pieces = Wordpiece.vocabFromTraining(s, d, dist)
          val starts = pieces.filterNot(_.startsWith("##")).toSet
          val conts = pieces.filter(_.startsWith("##")).map(_.substring(2)).toSet
          def segRec(w: String, pos: Int, acc: Int): (Int, Boolean) =
            if (pos >= w.length) (acc, false)
            else {
              val set = if (pos == 0) starts else conts
              val l = (w.length - pos to 1 by -1)
                .find(n => set.contains(w.substring(pos, pos + n)))
              l match {
                case None => (1, true)
                case Some(n) => segRec(w, pos + n, acc + 1)
              }
            }
          val refTotal = vocab.map { case (w, c) => segRec(w, 0, 0)._1 * c }.sum
          val encTotal = Wordpiece.encode(d, pieces)
            .agg(sum(col("n_pieces"))).head().getLong(0)
          Seq(("q_wordpiece_train", dist.length.toLong, dist == ref),
            ("q_wordpiece_tokens", dist.length.toLong, encTotal == refTotal))
        }
      rows.toDF("query", "n_merges", "engines_agree")
    }),

    // --- per-language top-k frequent bigrams (vocabulary statistics for
    //     tokenizer training); rank window runs over vocab-sized rows ---
    "q_top_ngrams" -> ((s, dir) => {
      CorpusOps.topNgrams(Fixtures.documents(s, dir), "lang", n = 2, k = 5)
        .select(col("grp").as("lang"), col("gram"),
          col("cnt").cast("long").as("cnt"), col("rank"))
    }),

    // --- benchmark decontamination: distinct 3-token-shingle collisions
    //     between the src0 "eval" split and the rest of the corpus ---
    "q_contamination" -> ((s, dir) => {
      val (tp, ep) = contamPostings(s, dir)
      CorpusOps.decontaminationJoinOnPostings(tp, ep)
        .select(col("eval_id"), col("train_id"),
          col("n_shared").cast("long").as("n_shared"))
    }),

    // --- decontamination with the hot-shingle df-cap engaged (cap 2:
    //     grams in >2 training docs are boilerplate, excluded before the
    //     join) — drives the capped path end-to-end against a DuckDB
    //     replay of the same rule ---
    "q_contamination_capped" -> ((s, dir) => {
      val (tp, ep) = contamPostings(s, dir)
      CorpusOps.decontaminationJoinOnPostings(tp, ep, maxTrainDf = 2)
        .select(col("eval_id"), col("train_id"),
          col("n_shared").cast("long").as("n_shared"))
    }),

    // --- deterministic training-order shuffle: stable global rank in
    //     md5-random (hash, id) order via distributed prefix sum — never
    //     a single-task global window ---
    "q_shuffle_rank" -> ((s, dir) => {
      CorpusOps.shuffleRank(Fixtures.documents(s, dir))
    }),

    // --- CCNet/Gopher-style unigram-LM surprisal (the "perplexity
    //     filter"): whole-bit surprisal bitlen(T) - bitlen(c) per token,
    //     integer-exact in both engines (binary string length, no
    //     transcendental log), mean per doc ---
    "q_lm_surprisal" -> ((s, dir) => {
      CorpusOps.unigramSurprisal(Fixtures.documents(s, dir))
        .select(col("doc_id"), col("n_tokens"), col("sum_bits"),
          round(col("mean_bits"), 6).as("mean_bits"))
    }),

    // --- DSIR-style importance selection: keep the quarter of the corpus
    //     whose bigram distribution looks most like the English subcorpus.
    //     Whole-bit log-likelihood-ratio scores (bitlen arithmetic — no
    //     transcendental log, engine-exact) + the distributed rankByKey
    //     global rank (range-partition + two-phase offsets, never a
    //     single-task window). keep fraction 1/4 is exact integer ceil ---
    "q_dsir_select" -> ((s, dir) => {
      CorpusOps.importanceSelect(Fixtures.documents(s, dir),
        col("lang") === "en", 1L, 4L)
    }),

    // --- salted fact-x-dim join (planned skew mitigation for keys AQE
    //     cannot split): lineitem salted 8 ways on a deterministic
    //     xxhash64, orders replicated per salt; output == the plain
    //     inner join, which IS the oracle ---
    "q_salted_join" -> ((s, dir) => {
      val li = Fixtures.lineitem(s, dir)
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_orderstatus"))
      Skew.saltedJoin(li.select(col("l_orderkey").as("o_orderkey"),
          col("l_linenumber"), col("l_quantity")),
          ord, "o_orderkey", salts = 8, factIdCol = "l_linenumber")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 6).as("sum_qty"))
    }),

    // --- content-defined chunking (LBFS/rsync boundaries on token md5):
    //     chunk fingerprints survive insertions outside their span, so
    //     shared chunks across docs are the storage/training-dedup key ---
    "q_cdc_chunks" -> ((s, dir) => {
      CorpusOps.cdcChunks(Fixtures.documents(s, dir))
    }),

    // --- second-order LM filter: bigram-conditional surprisal in whole
    //     bits (-log2 P(cur|prev) via bitlen — integer-exact, no
    //     transcendentals); repetition scores ~0, token soup scores the
    //     context entropy ---
    "q_bigram_surprisal" -> ((s, dir) => {
      CorpusOps.bigramSurprisal(Fixtures.documents(s, dir))
        .select(col("doc_id"), col("n_bigrams"), col("sum_bits"),
          round(col("mean_bits"), 6).as("mean_bits"))
    }),

    // --- C4-style span ownership: fraction of each document's distinct
    //     3-gram shingles first seen in an earlier document (what a
    //     span-dedup pass would strip); integer counts + one division ---
    "q_span_dedup" -> ((s, dir) => {
      CorpusOps.spanOwnership(Fixtures.documents(s, dir), n = 3)
        .select(col("doc_id"), col("n_shingles"), col("n_owned"),
          round(col("dup_frac"), 6).as("dup_frac"))
    }),

    // --- C4-style span REMOVAL (the rewrite q_span_dedup scores):
    //     tokens covered by an earlier document's shingle are dropped,
    //     the surviving text is re-emitted — all-integer/string output,
    //     full DuckDB oracle ---
    "q_span_rewrite" -> ((s, dir) => {
      CorpusOps.spanRewrite(Fixtures.documents(s, dir), n = 3)
    }),

    // --- the same rewrite with the hot-gram df-cap engaged (maxDf=2:
    //     grams in >2 documents are chrome and leave the analysis) — the
    //     boilerplate-skew mitigation as a first-class checked row, the
    //     q_contamination_capped convention ---
    "q_span_rewrite_capped" -> ((s, dir) => {
      CorpusOps.spanRewrite(Fixtures.documents(s, dir), n = 3, maxDf = 2)
    }),

    // --- composed INGESTION pipeline (the q_pipeline idiom for the
    //     acquisition side): plant cards -> serialize to JSONL (with the
    //     doc_id % 17 truncation) -> schema'd parse (corrupt records
    //     drop: the parse lane) -> Luhn card scrub on the EXTRACTED
    //     text -> Gopher-style quality gate on the SCRUBBED text. Any
    //     stage-interface mismatch (a scrub that changes token counts,
    //     a parse that drops different rows) shifts the gate verdicts
    //     and the row set — caught by no per-operator oracle ---
    "q_ingest_pipeline" -> ((s, dir) => {
      // one scan, zero joins, zero shuffles: card wrap and JSONL
      // serialization are projections, parse and scrub are per-row
      // kernels, and the gate verdicts ride the SAME projection as the
      // scrub stats (qualityGate passthrough) — the composed pipeline
      // never re-derives its own lineage
      val records = CorpusOps.jsonWrap(
        CorpusOps.cardWrap(Fixtures.documents(s, dir)))
      val parsed = CorpusOps.jsonIngest(records, withText = true)
      val scrubbed = CorpusOps.luhnScrub(
        parsed.filter(col("valid")).select(col("doc_id"), col("text")))
      CorpusOps.qualityGate(
          scrubbed.select(col("doc_id"), col("clean_text").as("text"),
            col("n_cards"), col("n_rejected")),
          passthrough = Seq(col("n_cards"), col("n_rejected"),
            length(col("text")).cast("long").as("clean_chars")))
        .select(col("doc_id"), col("keep"), col("n_tokens"),
          col("n_cards"), col("n_rejected"), col("clean_chars"))
    }),

    // --- STREAMING ingestion, driver-visible: the serialized records
    //     (cards planted, % 17 truncation) stream in as ascending-id
    //     micro-batches; parse + Luhn scrub run per batch (stateless
    //     projections/kernels, no state, no watermark), so the landed
    //     set equals the batch parse+scrub and the composed ingest
    //     oracle replays it in full ---
    "q_stream_ingest" -> ((s, dir) => {
      graft.streaming.StreamOps.replayIngest(s,
        CorpusOps.jsonWrap(CorpusOps.cardWrap(Fixtures.documents(s, dir))),
        numBatches = 2, feedKey = Some(s"records:$dir"))
    }),

    // --- STREAMING blocklist matching: documents stream in, the
    //     broadcast Aho–Corasick automaton scans each batch (stateless
    //     map, no state store) — the ingestion filter at arrival time;
    //     append output equals the batch run, so the position-exact
    //     blocklist oracle replays it in full ---
    "q_stream_blocklist" -> ((s, dir) => {
      graft.streaming.StreamOps.replayBlocklist(s,
        Fixtures.documents(s, dir), blockPatterns, numBatches = 2,
        feedKey = Some(s"docs0:$dir"))
    }),

    // --- checksum-validated card scrubbing: 13-19 digit runs redact
    //     ONLY when they pass Luhn mod-10 (the precision gate real PII
    //     pipelines use); the fixture's id-derived check digit passes
    //     ~10% of the time so both lanes stay non-vacuous, and a
    //     5-digit decoy pins the length gate ---
    "q_pii_luhn" -> ((s, dir) => {
      CorpusOps.luhnScrub(CorpusOps.cardWrap(Fixtures.documents(s, dir)))
    }),

    // --- CCNet paragraph-level exact dedup: the fixture derives a
    //     deterministic multi-paragraph page from doc_id (shared
    //     boilerplate at three duplication frequencies + a unique
    //     per-doc trailer, all words outside the corpus vocabulary);
    //     the operator keeps the globally FIRST occurrence of every
    //     distinct paragraph via a hash-partial min-struct aggregation
    //     (no per-fingerprint window — a million-doc boilerplate para
    //     is one combiner cell per map task) and reassembles the
    //     surviving text per document ---
    "q_para_dedup" -> ((s, dir) => {
      Dedup.paragraphDedup(Dedup.paraWrap(Fixtures.documents(s, dir)))
    }),

    // --- Unicode text normalization (CCNet-class cleanup): the fixture
    //     injects a decomposed combining accent, NBSP, zero-width
    //     space, tab/double-space runs, uppercasing, and trailing
    //     spaces — the kernel NFC-composes, strips accents, lowercases,
    //     and collapses whitespace in ONE map pass; unmatched docs pass
    //     through byte-identical (changed = false lane) ---
    "q_text_norm" -> ((s, dir) => {
      CorpusOps.normalizeText(CorpusOps.messWrap(Fixtures.documents(s, dir)))
    }),

    // --- URL canonicalization + domain policy: deterministic URL
    //     fixture (mixed-case scheme/host, default and non-default
    //     ports, utm/ref tracking params, sortable queries, fragments,
    //     a tracker-domain slice), normalized by the UrlOps kernel;
    //     registered domains via longest public-suffix match, blocklist
    //     verdicts as a boolean column — all-string/integer output ---
    "q_url_normalize" -> ((s, dir) => {
      UrlOps.normalizeUrls(UrlOps.urlWrap(Fixtures.documents(s, dir)),
        blocklist = Set("tracker.com", "tracker.org", "tracker.co.uk"))
    }),

    // --- crawl-frontier politeness scheduling over the canonicalized,
    //     policy-filtered URL set (the acquisition chain composed:
    //     urlWrap -> normalize + blocklist -> frontier): at most 8 URLs
    //     per host, priority (doc_id*37 % 100) DESC with id tiebreak,
    //     slot-paced at 1000 ms per host. Per-host selection is a
    //     BOUNDED typed Aggregator (O(cap) combiner state, map-side
    //     partial agg) — immune to the Zipf mega-host, where a window
    //     or collect_list would funnel or blow state ---
    "q_crawl_frontier" -> ((s, dir) => {
      val urls = UrlOps.normalizeUrls(
          UrlOps.urlWrap(Fixtures.documents(s, dir)),
          blocklist = Set("tracker.com", "tracker.org", "tracker.co.uk"))
        .filter(not(col("blocked")))
        .select(col("doc_id").as("url_id"), col("host"),
          ((col("doc_id") * 37) % 100).as("priority"))
      Frontier.schedule(urls, perHostCap = 8, delayMs = 1000L)
    }),

    // --- hashed linear classifier inference (fastText-shaped quality
    //     model): unigram+bigram features hashed into 4096 buckets,
    //     md5-derived INTEGER weights, long-sum score — one broadcast +
    //     one map pass, engine-exact with no float anywhere ---
    "q_hash_classify" -> ((s, dir) => {
      Classifier.scoreDocs(s, Fixtures.documents(s, dir))
    }),

    // --- classifier evaluation: fixed threshold sweep + exact AUC as
    //     an integer pair (Mann–Whitney U with midrank ties, kept as
    //     2*wins+ties over 2*npos*nneg — never a double); the label is
    //     lang='en', the below-cut counts ride the two-phase prefix
    //     sum over the score HISTOGRAM (no doc-level sort, no
    //     single-task window) ---
    "q_classifier_eval" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      val scored = Classifier.scoreDocs(s, docs)
        .join(docs.select(col("doc_id"),
          (col("lang") === "en").as("label")), "doc_id")
      Classifier.evalScores(s, scored, evalThresholds)
    }),

    // --- Aho–Corasick blocklist matching (C4-class banned-phrase
    //     filter): the dictionary compiles ONCE into a goto/fail trie,
    //     ships as one broadcast, each doc scans in O(len + hits)
    //     regardless of dictionary size — one map pass, no shuffle.
    //     ALL match positions count (nested + overlapping) ---
    "q_blocklist_match" -> ((s, dir) => {
      Blocklist.matchCounts(s, Fixtures.documents(s, dir), blockPatterns)
    }),

    // --- positional inverted index + exact-phrase search: posting
    //     lists with positions, anchor-join matching (word k at pos p
    //     votes for anchor p-k; an anchor with all m k's is a hit) —
    //     one broadcast of the query terms + ONE wide shuffle, never an
    //     m-way posting self-join or a per-phrase corpus rescan ---
    "q_phrase_search" -> ((s, dir) => {
      Search.phraseSearch(s,
        Search.positionalIndex(Fixtures.documents(s, dir)), searchPhrases)
    }),

    // --- PageRank over the md5-derived link graph: fixed-point BIGINT
    //     ranks (1.0 = 1e12), truncating integer division everywhere, so
    //     4 damped iterations are bit-identical in any engine. RDD
    //     rounds: edges hash-partitioned ONCE; each round one O(V)
    //     contribution shuffle (the Pregel schedule) ---
    "q_pagerank" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      Graph.pageRank(s, Graph.linkEdges(docs), docs, iters = 4)
    }),

    // --- HITS hubs/authorities over the same link graph: UN-normalized
    //     fixed-iteration power rounds (normalization is the FP trap —
    //     it never changes the ranking), so every score is an exact
    //     integer; edges partitioned once per join direction, each
    //     half-round ONE O(V) reduceByKey shuffle; BigInt overflow
    //     contract checked up front ---
    "q_hits" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      Graph.hits(s, Graph.linkEdges(docs), docs, iters = 2)
    }),

    // --- per-node triangle counts (clustering-coefficient numerator,
    //     the link-farm signal): degree-ordered orientation — wedges
    //     only at each triangle's lowest-rank vertex, O(E^1.5) wedge
    //     work under ANY skew, each triangle found exactly once ---
    "q_triangles" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      Graph.triangles(s, Graph.linkEdges(docs), docs)
    }),

    // --- column profiling (the ANALYZE pass): per-column row/null/
    //     distinct/min/max for ALL columns in ONE scan + one tiny
    //     shuffle (melt -> aggregate by column name), numeric min/max
    //     on the exact integer lane — never lexicographic, never one
    //     scan per column ---
    "q_profile" -> ((s, dir) => {
      Profile.columnStats(Fixtures.lineitem(s, dir),
        numeric = ProfileNumericCols, strings = ProfileStringCols)
    }),

    // --- bucketed co-located join: both sides written bucketBy the
    //     join key (16 buckets, sorted), read back through the catalog,
    //     joined EXCHANGE-FREE (the physical-layout lever for recurring
    //     fact-dim joins — spec asserts zero pre-join Exchange) ---
    "q_bucketed_join" -> ((s, dir) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft_buckets").toString
      val (c, o) = Layout.writeBucketed(s,
        Fixtures.customer(s, dir), Fixtures.orders(s, dir),
        "c_custkey", "o_custkey", buckets = 16, basePath = base,
        leftName = "graft_b_cust", rightName = "graft_b_ord")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_orderkey")).as("sum_okey"))
    }),

    // --- STREAMING content dedup: the arriving batch's fingerprints
    //     check against the static history at arrival time (stream-
    //     static left join on the distinct-fp projection) — the stream
    //     twin of q_incr_dedup, same oracle ---
    "q_stream_incrdedup" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      graft.streaming.StreamOps.replayContentDedup(s,
        Snapshot.rehostWrap(docs), docs, numBatches = 2,
        feedKey = Some(s"rehost:$dir"))
    }),

    // --- cross-snapshot CONTENT dedup: arriving docs whose content
    //     the historical corpus already holds under ANY id (mirrors,
    //     re-hosts) are duplicates despite their fresh ids; distinct
    //     fp projection over history (the skew gate) + one fp-keyed
    //     join, only (id, md5) pairs shuffle ---
    "q_incr_dedup" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      Snapshot.contentDedup(docs, Snapshot.rehostWrap(docs))
    }),

    // --- snapshot diff (the incremental-crawl gate): fingerprint both
    //     snapshots down to (id, md5), ONE co-partitioned full outer
    //     join — bodies never move; the derived "next crawl" plants
    //     all four lanes (added/removed/changed/unchanged) ---
    "q_snapshot_diff" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      Snapshot.diff(docs, Snapshot.nextSnapshot(docs))
    }),

    // --- the composed ARRIVAL pipeline, driver-visible: parse ->
    //     Luhn scrub -> ONE fused per-row pass (classifier score +
    //     blocklist hits on the CLEAN text) -> admitted verdict, all
    //     in one streaming query (stateless; fusing the two gates is
    //     the no-lineage-rejoin rule applied to streams); the oracle
    //     chains ingestScrubCtes -> hashClassifyScoreCtes -> the
    //     blocklist positional count over the same scrubbed text ---
    "q_arrival_pipeline" -> ((s, dir) => {
      graft.streaming.StreamOps.replayArrival(s,
        CorpusOps.jsonWrap(CorpusOps.cardWrap(Fixtures.documents(s, dir))),
        blockPatterns, numBatches = 2, feedKey = Some(s"records:$dir"))
    }),

    // --- STREAMING classifier inference: the hashed-ngram quality gate
    //     per micro-batch (broadcast weights, stateless map) — the
    //     model-based arrival-time filter next to q_stream_blocklist;
    //     append == batch, same engine-exact oracle ---
    "q_stream_classify" -> ((s, dir) => {
      graft.streaming.StreamOps.replayClassify(s,
        Fixtures.documents(s, dir), numBatches = 2,
        feedKey = Some(s"docs0:$dir"))
    }),

    // --- STREAMING snapshot diff: the next crawl's docs stream against
    //     the static previous snapshot (stream-static left join on
    //     (id, md5) projections); arrival-time labels added/changed/
    //     unchanged — `removed` is structurally invisible to arrival
    //     events and stays the batch sweep's job ---
    "q_stream_snapshot" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      graft.streaming.StreamOps.replaySnapshotDiff(s,
        Snapshot.nextSnapshot(docs), docs, numBatches = 2,
        feedKey = Some(s"nextsnap:$dir"))
    }),

    // --- WARC container parsing (the Common Crawl wire format): files
    //     assembled from the documents fixture (8 docs/file + warcinfo
    //     leader; planted lanes: WARC/1.0 inside a payload, a short
    //     Content-Length lie), then ONE linear mapPartitions walk by
    //     declared length — never a magic-scan; a length lie emits
    //     _corrupt and ends the file (no resync guessing) ---
    "q_warc_ingest" -> ((s, dir) => {
      Warc.parseWarc(s, Warc.warcWrap(Fixtures.documents(s, dir)))
    }),

    // --- STREAMING WARC ingestion: container files stream in as they
    //     land (the crawl-delivery unit); the linear record walk runs
    //     per batch, stateless, so append == batch and the same
    //     recursive-CTE oracle checks the streamed record set ---
    "q_stream_warc" -> ((s, dir) => {
      graft.streaming.StreamOps.replayWarc(s,
        Warc.warcWrap(Fixtures.documents(s, dir)), numBatches = 2,
        feedKey = Some(s"warc:$dir"))
    }),

    // --- int8 scalar-quantized ANN (SQ8): per-dimension affine codes
    //     from a one-pass treeAggregate (min/max), integer dot-product
    //     scoring against the min-vec_id query, (qdot DESC, id) top-20.
    //     Scores are pure integers — engine-exact ranking with no
    //     rounding convention; the code map's fixed IEEE shape is
    //     replayed verbatim by the oracle ---
    "q_sq8_topk" -> ((s, dir) => {
      val embs = Fixtures.embeddings(s, dir)
      val minId = embs.agg(min(col("vec_id"))).head().getLong(0)
      val q = embs.filter(col("vec_id") === minId)
        .select(col("embedding").cast("array<double>")).head()
        .getSeq[Double](0).toArray
      Ann.sq8TopK(embs, q, 20, excludeId = Some(minId))
    }),

    // --- schema'd JSONL ingestion with a per-row malformed-record
    //     policy: every 17th record truncates to an unterminated string
    //     (invalid under Jackson AND DuckDB json_valid); corrupt rows
    //     surface as valid=false with NULL fields, never a job abort ---
    "q_json_ingest" -> ((s, dir) => {
      CorpusOps.jsonIngest(CorpusOps.jsonWrap(Fixtures.documents(s, dir)))
    }),

    // --- schema'd CSV ingestion (the from_csv twin of q_json_ingest):
    //     RFC 4180 quoting exercised by embedded-comma and doubled-quote
    //     injections; every 13th record truncates below the schema's
    //     token count -> the malformed lane (fields nulled, valid=false,
    //     no abort). Data fields are NULLED on invalid rows — univocity
    //     keeps partially-parsed prefixes, and a partial parse is a
    //     silent corpus poisoner ---
    "q_csv_ingest" -> ((s, dir) => {
      CorpusOps.csvIngest(CorpusOps.csvWrap(Fixtures.documents(s, dir)))
    }),

    // --- SQ8 recall audit: |quantized top-20 ∩ exact round-6 cosine
    //     top-20| — the one-number measurement a quantized index ships
    //     with; both legs are the already-hash-checked constructions ---
    "q_sq8_recall" -> ((s, dir) => {
      val embs = Fixtures.embeddings(s, dir)
      val minId = embs.agg(min(col("vec_id"))).head().getLong(0)
      val q = embs.filter(col("vec_id") === minId)
        .select(col("embedding").cast("array<double>")).head()
        .getSeq[Double](0).toArray
      val rest = embs.filter(col("vec_id") =!= minId)
      val s8 = Ann.sq8TopK(embs, q, 20, excludeId = Some(minId)).select(col("id"))
      val exact = Ann.bruteForceTopK(rest, q, 20)
        .select(col("id"), round(col("cosine"), 6).as("cosine"))
        .orderBy(col("cosine").desc, col("id"))
        .select(col("id"))
      s8.join(exact, "id")
        .agg(count(lit(1)).cast("long").as("n_common"))
    }),

    // --- composed cleaning pipeline: messy raw text -> Unicode
    //     normalization -> paragraph structure -> corpus-wide paragraph
    //     dedup -> Gopher quality gate on the CLEANED text, chained
    //     end-to-end with the para stats as passthrough columns (the
    //     q_ingest_pipeline rule: no lineage re-join). Normalization
    //     BEFORE dedup is the order that matters: case/accent variants
    //     of the same paragraph must fingerprint identically ---
    "q_clean_pipeline" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      val normed = CorpusOps.normalizeText(CorpusOps.messWrap(docs))
      val paras = Dedup.paraWrap(
        normed.select(col("doc_id"), col("norm_text").as("text")))
      val deduped = Dedup.paragraphDedup(paras)
      CorpusOps.qualityGate(deduped, textCol = "clean_text",
        passthrough = Seq(col("kept_paras"), col("dropped_paras")))
    }),

    // --- ExactSubstr dedup detection (Lee et al. 2022): maximal spans
    //     covered by >= k-token substrings appearing verbatim in another
    //     document, via duplicated k-gram anchors merged per doc. k = 6
    //     sits past the measured chance-collision cliff of the small
    //     fixture vocabulary (k = 4 admits 656/639/20436 coincidental
    //     spans at the three scales; k = 6 pins the stable genuine set
    //     45/47/529, identical at k = 8/10) — all-integer positions ---
    "q_exact_substr" -> ((s, dir) => {
      CorpusOps.exactSubstrSpans(Fixtures.documents(s, dir), k = ExactSubstrK)
    }),

    // --- winnowing fingerprints (MOSS local fingerprinting): 3-gram
    //     hashes, window 4, leftmost-lowest selection — detects any
    //     shared run of >= 6 tokens while keeping ~2/(w+1) of grams ---
    "q_winnow" -> ((s, dir) => {
      CorpusOps.winnowFingerprints(Fixtures.documents(s, dir), k = 3, w = 4)
    }),

    // --- the JOIN use of winnowing: near-dup candidate pairs sharing
    //     >= 2 selected fingerprints (ids-only postings equijoin) ---
    "q_winnow_pairs" -> ((s, dir) => {
      CorpusOps.winnowJoin(Fixtures.documents(s, dir), k = 3, w = 4,
        minShared = 2)
    }),

    // --- the positional evidence behind those pairs (MOSS matched
    //     regions): per qualifying pair, min/max matched shingle-start
    //     positions on each side + the shared-fingerprint count ---
    "q_winnow_spans" -> ((s, dir) => {
      CorpusOps.winnowSpans(Fixtures.documents(s, dir), k = 3, w = 4,
        minShared = 2)
    }),

    // --- tokenizer coverage: per-doc OOV rate against the corpus'
    //     top-50 tokens ((count desc, token) total order) ---
    "q_oov_rate" -> ((s, dir) => {
      CorpusOps.oovRate(Fixtures.documents(s, dir), vocabSize = 50)
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          round(col("oov_frac"), 6).as("oov_frac"))
    }),

    // --- exact TF-IDF cosine similarity join, suffix-norm prefix filter
    //     (AllPairs): the corpus-weighted counterpart of q_jaccard_pairs.
    //     tau = 0.9: measured boundary gap ~7e-4 both sides at both SFs ---
    "q_tfidf_pairs" -> ((s, dir) => {
      TfIdf.cosineJoin(s, Fixtures.documents(s, dir), 0.9)
        .select(col("rid"), col("sid"), round(col("cosine"), 6).as("cosine"))
    }),

    // --- sequence packing (pretraining concat-and-chunk): distributed
    //     prefix sum over id-ordered token counts, 512-token windows;
    //     every output column is an integer ---
    "q_pack_sequences" -> ((s, dir) => {
      CorpusOps.packSequences(Fixtures.documents(s, dir), maxLen = 512)
    }),

    // --- token-budget selection: best-quality docs per language until
    //     2500 tokens; integer running total, 6dp-rounded score order ---
    "q_token_budget" -> ((s, dir) => {
      CorpusOps.tokenBudget(Fixtures.documents(s, dir), "lang", budget = 2500)
        .select(col("id").as("doc_id"), col("grp").as("lang"),
          col("n_tokens"), col("score"), col("cum"))
    }),

    // --- domain-mixture sampling with upsampling: target token weights
    //     5:3:2:1 over four sources (six sources deliberately
    //     unweighted => excluded), whole extra epochs for over-budget
    //     domains plus a hash-spread partial epoch — all integer
    //     arithmetic (budget div/mod), replayed exactly by the oracle.
    //     Across the three scales the same weights exercise all
    //     regimes: many epochs (sf0.001), a few (sf0.01), partial-only
    //     (sf0.1) ---
    "q_domain_mix" -> ((s, dir) => {
      CorpusOps.domainMixSample(Fixtures.documents(s, dir),
        Map("src0" -> 5L, "src1" -> 3L, "src2" -> 2L, "src3" -> 1L),
        totalBudget = 20000L)
        .select(col("id").as("doc_id"), col("grp").as("source"),
          col("epoch"), col("n_tokens"), col("cum"))
    }),

    // --- MinHash+LSH near-dup. Candidates are probabilistic but verified
    //     with EXACT shingle Jaccard, and the banding is sized so recall
    //     is 1.0 on this corpus (checked in PipelineOpsSpec), making the
    //     output equal to the exact shingle-Jaccard join the oracle runs ---
    "q_minhash_pairs" -> ((s, dir) => {
      // 2-row bands: per-pair miss prob at the corpus' lowest qualifying
      // J (0.8) is (1 - 0.8^2)^16 ~ 7.7e-8 — recall 1.0 in practice.
      Dedup.minhashLsh(s, Fixtures.documents(s, dir), 0.5, numHashes = 32, bands = 16)
        .select(col("rid"), col("sid"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // --- SimHash near-dup (banded Hamming blocking, pigeonhole recall =
    //     1.0 by construction; md5-derived token bits so DuckDB rebuilds
    //     the identical signatures) ---
    "q_simhash_pairs" -> ((s, dir) => {
      Dedup.simhashDedup(s, Fixtures.documents(s, dir), maxHamming = 7)
        .select(col("rid"), col("sid"), col("hamming").cast("long").as("hamming"))
    }),

    // --- near-dup clustering: simhash pairs -> connected components,
    //     cluster = min doc_id reachable (canonical keeper per cluster) ---
    "q_dedup_clusters" -> ((s, dir) => {
      simhashClusters(s, dir)
        .select(col("id").as("doc_id"), col("cluster"))
    }),

    // --- LEAKAGE-SAFE split: assignment keyed by the near-dup cluster
    //     representative, so near-duplicates structurally cannot
    //     straddle train/test (the doc-keyed split's silent
    //     contamination); shares the session-cached edge set ---
    "q_leak_split" -> ((s, dir) => {
      CorpusOps.leakSafeSplit(
        simhashClusters(s, dir)
          .select(col("id").as("doc_id"), col("cluster")))
    }),

    // --- the ACTION the clustering feeds: keep the best-quality member
    //     per near-dup cluster ((round(score,6) DESC, id) total order —
    //     the rounded score is itself the hash-checked q_quality row);
    //     shares the session-cached edge set with q_dedup_clusters ---
    "q_keep_best" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      val edges = simhashEdges(s, dir).select(col("rid"), col("sid"))
      Dedup.keepBest(s, docs, edges,
        clusters = Some(simhashClusters(s, dir)))
    }),

    // --- COMPOSED pretraining-data pipeline: quality gate -> exact
    //     dedup -> minhash near-dup + keep-best -> pack sequences, each
    //     stage the already-verified operator, chained. The output is the
    //     survivors' packed-sequence assignment, whose global prefix sums
    //     shift if ANY upstream stage admits or drops a different doc —
    //     an interface mismatch between stages no per-operator oracle
    //     can catch is a hash mismatch here. Oracle = the four component
    //     CTE generators composed over the same staged corpus ---
    "q_pipeline" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      // gated is consumed twice (the dedup grouping and the ddocs join);
      // the gate's per-row kernels live in the gatedIds subtree, so an
      // unpersisted gatedIds re-ran them per consumer — pin the tiny id
      // list instead (ids only, freed after the result materializes)
      val gatedIds = CorpusOps.qualityGate(docs)
        .filter(col("keep")).select(col("doc_id"))
        .persistOnce()
      val gated = docs.join(gatedIds, "doc_id")
      val keeperIds = Dedup.exactDedup(gated)
        .select(col("keeper").as("doc_id"))
      // ddocs feeds FOUR consumers (minhash banding, its exact-verify
      // re-read, keep-best scoring, survivor packing) — unpersisted,
      // each would re-run the gate + dedup lineage; a real pipeline
      // materializes between stages (checkpoint-to-parquet).
      // localCheckpoint is the in-session analog that ALSO truncates the
      // logical plan: with plain persist every downstream action
      // re-analyzes the whole gate+dedup tree (~2s of driver-side
      // planning across the stage chain's ~45 AQE jobs, measured with
      // ProfJobs); the checkpoint keeps rows in Tungsten format (no
      // .rdd round-trip) and the stage results themselves are
      // action-pinned, so answers are unchanged
      val ddocs = gated.join(keeperIds, "doc_id").localCheckpoint()
      val edges = Dedup.minhashLsh(s, ddocs, 0.5, numHashes = 32, bands = 16)
        .select(col("rid"), col("sid"))
      val bestIds = Dedup.keepBest(s, ddocs, edges)
        .select(col("keeper").as("doc_id"))
      val survivors = ddocs.join(bestIds, "doc_id")
      // materializeAndFree contract (Dedup.scala): persist the (small)
      // result, force it, free the data-sized intermediate; the result's
      // cache entry is the caller's to drop (CacheManager dedupes the
      // identical plan on repeated invocations, so re-running the query
      // in one session reuses this entry rather than stacking copies)
      val packed = CorpusOps.packSequences(survivors, maxLen = 512)
        .persistOnce()
      packed.count()
      gatedIds.unpersist(false)
      // the localCheckpoint's blocks are freed by the ContextCleaner once
      // ddocs is unreferenced (Dataset.unpersist only covers cacheManager
      // entries, so there is nothing to unpersist here)
      packed
    }),

    // --- brute-force cosine top-k (exact ANN baseline) ---
    "q_cosine_topk" -> ((s, dir) => {
      val embs = Fixtures.embeddings(s, dir)
      val minId = embs.agg(min(col("vec_id"))).head().getLong(0)
      val q = embs.filter(col("vec_id") === minId)
        .select(col("embedding").cast("array<double>")).head()
        .getSeq[Double](0).toArray
      Ann.bruteForceTopK(embs.filter(col("vec_id") =!= minId), q, 20)
        .select(col("id"), round(col("cosine"), 6).as("cosine"))
        .orderBy(col("cosine").desc, col("id"))
    }),

    // --- exact embedding near-dup pairs via the blocked distributed
    //     all-pairs join (no driver collect — the scale-safe exact path) ---
    "q_emb_neardup_exact" -> ((s, dir) => {
      Ann.cosineAllPairsBlocked(s, Fixtures.embeddings(s, dir), 0.45)
        .select(col("rid"), col("sid"), round(col("cosine"), 6).as("cosine"))
    }),

    // --- LSH-bucketed embedding near-dup in its genuine operating regime:
    //     the corpus unioned with scaled twins (cosine 1.0) at tau=0.99.
    //     Sign sketches are scale-invariant, so twin recall is exactly 1.0
    //     by construction (not probabilistic) while the 8x8-bit banding
    //     prunes ~97% of random pairs; every candidate is verified with
    //     exact cosine, so output == the exact join the oracle runs. ---
    "q_emb_neardup_lsh" -> ((s, dir) => {
      val base = Fixtures.embeddings(s, dir)
        .select(col("vec_id").cast("long").as("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
      val twins = base.select((col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0)).as("embedding"))
      Dedup.embeddingNearDup(s, base.union(twins), 0.99, planes = 64, bands = 8)
        .select(col("rid"), col("sid"), round(col("cosine"), 6).as("cosine"))
    }),

    // --- IVF ANN with nProbe = numCentroids (all buckets probed => exact,
    //     shares the brute-force oracle; sub-all nProbe recall is
    //     spec-covered in PipelineOpsSpec). The quantizer size is DERIVED
    //     from the corpus (~sqrt N, clamped) instead of a pinned 16, so
    //     the declared query keeps the scale shape it advertises ---
    "q_cosine_ivf" -> ((s, dir) => {
      val embs = Fixtures.embeddings(s, dir)
      val minId = embs.agg(min(col("vec_id"))).head().getLong(0)
      val q = embs.filter(col("vec_id") === minId)
        .select(col("embedding").cast("array<double>")).head()
        .getSeq[Double](0).toArray
      val rest = embs.filter(col("vec_id") =!= minId)
      val nc = Ann.scaledCentroids(rest.count())
      val cents = Ann.trainCentroids(s, rest, numCentroids = nc)
      val idx = Ann.ivfIndex(s, rest, cents)
      Ann.ivfTopK(s, idx, cents, q, 20, nProbe = nc)
        .select(col("id"), round(col("cosine"), 6).as("cosine"))
        .orderBy(col("cosine").desc, col("id"))
    }),

    // --- product-quantized ANN (the IVF-PQ memory path): 4 subspaces x
    //     8-centroid integer codebooks trained with the q_kmeans Lloyd's
    //     arithmetic, corpus stored as 4 codes/vector, query scored via
    //     an integer ADC lookup table. Training, encoding, and scoring
    //     are pure BIGINT, so the oracle replays ALL of it exactly ---
    "q_pq_topk" -> ((s, dir) => {
      val embs = Fixtures.embeddings(s, dir)
      val minId = embs.agg(min(col("vec_id"))).head().getLong(0)
      val rest = embs.filter(col("vec_id") =!= minId)
      val cbs = Ann.pqTrain(s, rest, numSub = 4, ksub = 8, iters = 2)
      val qq = Cluster.quantize(embs.filter(col("vec_id") === minId), 1000)
        .select(col("v")).head().getSeq[Long](0).toArray
      Ann.pqTopK(Ann.pqEncode(rest, cbs), cbs, qq, 20)
    }),

    // --- PQ with exact rerank (the production IVF-PQ read path): finer
    //     books (16 x 4-dim, 16 codes = 16 bytes/vector, 16x smaller
    //     than the raw floats), ADC top-200 shortlist, exact integer-L2
    //     rerank of the fetched shortlist. Measured shortlist recall@20
    //     is 1.00 on the fixture corpus (PipelineOpsSpec pins >= 0.95) ---
    "q_pq_rerank" -> ((s, dir) => {
      val embs = Fixtures.embeddings(s, dir)
      val minId = embs.agg(min(col("vec_id"))).head().getLong(0)
      val rest = embs.filter(col("vec_id") =!= minId)
      val cbs = Ann.pqTrain(s, rest, numSub = 16, ksub = 16, iters = 2)
      val qq = Cluster.quantize(embs.filter(col("vec_id") === minId), 1000)
        .select(col("v")).head().getSeq[Long](0).toArray
      Ann.pqTopKRerank(rest, Ann.pqEncode(rest, cbs), cbs, qq,
        k = 20, shortlist = 200)
    }),

    // --- residual IVF-PQ (the full two-level production ANN layout):
    //     4-cell integer coarse quantizer, PQ books trained on RESIDUALS
    //     (exact BIGINTs — vector minus coarse centroid), query probes
    //     the 2 nearest cells and ADC-scores only their members with
    //     per-cell lookup tables. Coarse training, residuals, PQ rounds,
    //     probe order and scoring are all integer — the oracle replays
    //     the entire two-level pipeline ---
    //     The three q_ivfpq_* rows share the trained index through the
    //     session IvfPqMemo (identical corpus + params, deterministic
    //     training — see the memo scaladoc); each row runs its own read
    //     path over it. First row alphabetically (q_ivfpq_recall)
    //     absorbs training within a bench pass.
    "q_ivfpq_topk" -> ((s, dir) => {
      val (_, qq, idx) = ivfPqState(s, dir)
      Ann.ivfPqTopKOnIndex(idx, qq, nProbe = 2, k = 20)
    }),
    // --- the same two-level layout with the exact-rerank tail: ADC
    //     top-100 shortlist fetched by broadcast semi-join, ranked by
    //     exact integer L2 — approximation bounds recall only, the
    //     returned order is exact ---
    "q_ivfpq_rerank" -> ((s, dir) => {
      val (minId, qq, idx) = ivfPqState(s, dir)
      val rest = Fixtures.embeddings(s, dir).filter(col("vec_id") =!= minId)
      Ann.ivfPqTopKRerankOnIndex(rest, idx, qq, nProbe = 2,
        k = 20, shortlist = 100)
    }),
    // --- IVF-PQ recall audit: |reranked top-20 ∩ exact integer-L2
    //     top-20| under the shared (d2, id) total order — the same
    //     continuously-measured recall row the SQ8 path has
    //     (q_sq8_recall), closing the driver-visible gap for the
    //     two-level index. A shortlist miss (a true neighbor whose
    //     cell is never probed or whose ADC rank falls past 100) is
    //     the ONLY way the two legs can differ, so this one number is
    //     the quantization-quality contract of the production read
    //     path ---
    "q_ivfpq_recall" -> ((s, dir) => {
      val (minId, qq, idx) = ivfPqState(s, dir)
      val rest = Fixtures.embeddings(s, dir).filter(col("vec_id") =!= minId)
      val approx = Ann.ivfPqTopKRerankOnIndex(rest, idx, qq, nProbe = 2,
        k = 20, shortlist = 100).select(col("id"))
      val exact = Cluster.quantize(rest, 1000)
        .select(col("id"),
          aggregate(zip_with(col("v"), lit(qq), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x).as("d2"))
        .orderBy(col("d2"), col("id")).limit(20).select(col("id"))
      approx.join(exact, "id")
        .agg(count(lit(1)).cast("long").as("n_common"))
    }),

    // --- batch retrieval: exact top-5 corpus neighbors for EVERY query
    //     in a broadcast query set (the 10 lowest vec_ids) — the
    //     multi-query retrieval workload behind RAG/eval pipelines ---
    "q_ann_batch" -> ((s, dir) => {
      val embs = Fixtures.embeddings(s, dir)
      val qs = embs.orderBy(col("vec_id")).limit(10)
      Ann.topKJoinExact(embs, qs, k = 5)
        .select(col("qid"), col("id"),
          round(col("cosine"), 6).as("cosine"), col("rank").cast("long").as("rank"))
    }),

    // --- hard-negative mining (contrastive data prep): per anchor,
    //     top-5 nearest DIFFERENT-label vectors (labels = vec_id % 5 —
    //     the fixture-derivation contract); the label predicate sits
    //     BEFORE the rank window so k negatives always return ---
    "q_hard_negatives" -> ((s, dir) => {
      val embs = Fixtures.embeddings(s, dir)
        .withColumn("label", col("vec_id") % 5)
      val qs = embs.orderBy(col("vec_id")).limit(10)
      Ann.hardNegatives(embs, qs, k = 5)
        .select(col("qid"), col("id"),
          round(col("cosine"), 6).as("cosine"), col("rank").cast("long").as("rank"))
    }),

    // --- multimodal: binary payload + stub decode features ---
    "q_multimodal" -> ((s, dir) => {
      Multimodal.extractFeatures(s,
        Multimodal.withPayload(Fixtures.documents(s, dir)))
        .select(col("doc_id"), col("n_bytes"), round(col("entropy"), 6).as("entropy"))
    }),

    // --- image lifecycle with a REAL codec: synthesize a valid PPM (P6)
    //     image per document, decode it byte-for-byte (header parse, RGB
    //     plane), emit the red-channel color histogram. The oracle
    //     re-derives the same histogram analytically from the text (the
    //     pixel plane is the text bytes cycled), so a hash match proves
    //     the encode -> decode -> featurize path end-to-end ---
    "q_image_hist" -> ((s, dir) => {
      Multimodal.imageRedHist(s,
        Multimodal.withImagePayload(Fixtures.documents(s, dir)))
        .select(col("doc_id"), col("bin"), round(col("w"), 6).as("w"))
    }),

    // --- HIPI-style image-bundle container (S8's last residual —
    //     mr/EmdGenerate.java:117 ImageBundleInputFormat): the corpus'
    //     PPM payloads packed 8-per-bundle into length-walked binary
    //     containers, parsed back, decoded through the real codec. The
    //     oracle is q_image_hist's — the bundle roundtrip must be
    //     byte-lossless or the histograms hash-mismatch; HibSpec owns
    //     the adversarial lanes (length lies, embedded magic, count
    //     lies -> corrupt-and-stop) ---
    "q_hib_hist" -> ((s, dir) => {
      val bundles = graft.sources.Hib.bundleWrap(
        Multimodal.withImagePayload(Fixtures.documents(s, dir))
          .select(col("doc_id"), col("payload")), perBundle = 8)
      val members = graft.sources.Hib.parseBundles(s, bundles)
        .filter(!col("corrupt"))
        .select(col("doc_id"), col("payload"))
      Multimodal.imageRedHist(s, members)
        .select(col("doc_id"), col("bin"), round(col("w"), 6).as("w"))
    }),

    // --- binary-file directory scan (the reference's local image-dir
    //     acquisition path, EmdGenerate.java:117-172): materialize the
    //     corpus' PPM payloads as one FILE per doc, re-read them with
    //     Spark's binaryFile source (distributed listing, glob pushdown,
    //     id parsed from the file name), decode through the real PPM
    //     codec — same histogram contract and oracle as q_image_hist,
    //     so a lost/misparsed/truncated file is a hash mismatch ---
    "q_binary_scan" -> ((s, dir) => {
      // Scan directory: executors write one .ppm per doc here, then
      // Spark's binaryFile source re-reads it. Driver and executors must
      // share this filesystem — true in local mode (default: /dev/shm or
      // java.io.tmpdir); on a real cluster set graft.binscan.dir to a
      // shared mount (NFS / fuse-mounted object store).
      val base = java.nio.file.Paths.get(
        s.conf.getOption("graft.binscan.dir").getOrElse {
          val shm = java.nio.file.Paths.get("/dev/shm")
          if (java.nio.file.Files.isDirectory(shm) &&
            java.nio.file.Files.isWritable(shm)) shm.toString
          else System.getProperty("java.io.tmpdir")
        })
      val tmp = java.nio.file.Files.createTempDirectory(base, "graft-binscan")
      val tmpStr = tmp.toString
      try {
        Multimodal.withImagePayload(Fixtures.documents(s, dir))
          .select(col("doc_id"), col("payload"))
          .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
            it.foreach { r =>
              java.nio.file.Files.write(
                java.nio.file.Paths.get(tmpStr, s"${r.getLong(0)}.ppm"),
                r.getAs[Array[Byte]](1))
            }
          }
        // localCheckpoint(eager = true) materializes the decoded
        // histograms in EXECUTOR block storage (never the driver —
        // scale-safe at corpus size) and truncates lineage, so the scan
        // directory can be deleted below without any later action
        // re-reading it
        Multimodal.imageRedHist(s, BinaryScan.scan(s, tmpStr))
          .select(col("doc_id"), col("bin"), round(col("w"), 6).as("w"))
          .localCheckpoint(true)
      } finally {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(tmp)
        val paths = try walk.iterator().asScala.toSeq.reverse finally walk.close()
        paths.foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }),

    // --- perceptual image hash (aHash) + exact perceptual-dup groups:
    //     decode -> 8x8 nearest-neighbor downsample -> mean-threshold
    //     bits (integer cross-multiplied, tie-free) -> 32-bit halves;
    //     rep_id = lowest doc sharing the identical hash ---
    "q_image_phash" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Multimodal.imagePerceptualHash(s,
          Multimodal.withImagePayload(Fixtures.documents(s, dir)))
        .withColumn("rep_id", min(col("doc_id")).over(
          Window.partitionBy(col("hash_hi"), col("hash_lo"))))
    }),

    // --- COMPRESSED-image lifecycle with the pure-JVM baseline JFIF
    //     codec: 16x16 grayscale JPEG of four constant 8x8 blocks per
    //     doc (constant blocks are DC-only, so the lossy codec is
    //     exactly lossless and the pixels stay analytic), real Huffman +
    //     dequant + IDCT decode, 8-bin gray histogram ---
    "q_jpeg_hist" -> ((s, dir) => {
      Multimodal.jpegGrayHist(s,
        Multimodal.withJpegPayload(Fixtures.documents(s, dir)))
        .select(col("doc_id"), col("bin"), round(col("w"), 6).as("w"))
    }),

    // --- PNG lifecycle with the pure-JVM codec (JDK zlib, no external
    //     jars): 16x16 gray PNG of the cycled text bytes per doc,
    //     CRC-verified chunk walk -> inflate -> unfilter -> 8-bin gray
    //     histogram; PNG is lossless so the pixels are directly the
    //     analytic cycled bytes ---
    "q_png_hist" -> ((s, dir) => {
      Multimodal.pngGrayHist(s,
        Multimodal.withPngPayload(Fixtures.documents(s, dir)))
        .select(col("doc_id"), col("bin"), round(col("w"), 6).as("w"))
    }),

    // --- resize/recompress lifecycle: decode -> 16x16 -> 9x9 nearest-
    //     neighbor resize -> re-encode -> decode -> red histogram. 9 is a
    //     non-divisor of 16, so the oracle's integer floor index math is
    //     genuinely exercised (a divisor would hide a rounding bug) ---
    "q_resize_hist" -> ((s, dir) => {
      Multimodal.imageResizeHist(s,
        Multimodal.withImagePayload(Fixtures.documents(s, dir)))
        .select(col("doc_id"), col("bin"), round(col("w"), 6).as("w"))
    }),

    // --- video-style frame sampling over the PPM payloads: every 4th
    //     64-byte block's fingerprint (mod-2^31-1 polynomial fold). The
    //     oracle replays the fold over analytically synthesized payload
    //     bytes (fixed 13-byte PPM header + cycled text bytes), so a hash
    //     match proves the byte-exact payload layout AND the fold ---
    "q_frame_hash" -> ((s, dir) => {
      Multimodal.frameSample(s,
        Multimodal.withImagePayload(Fixtures.documents(s, dir)))
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("frame_hash"))
    }),

    // --- audio lifecycle with a REAL codec: synthesize a valid WAV
    //     (RIFF PCM s16le mono) per document, decode it chunk-by-chunk,
    //     nearest-index resample 320 -> 240 samples (ratio 4/3 — a
    //     non-integer step so the floor index math is genuinely
    //     exercised), then per-60-sample-window RMS + mod-2^31-1 rolling
    //     fingerprint. The oracle re-derives the resampled signal
    //     analytically from the text (sample = byte*256 - 16384), so a
    //     hash match proves encode -> decode -> resample -> featurize ---
    "q_audio_rms" -> ((s, dir) => {
      Multimodal.audioRmsFingerprint(s,
        Multimodal.withAudioPayload(Fixtures.documents(s, dir)))
        .select(col("doc_id"), col("win_idx"),
          round(col("rms"), 6).as("rms"), col("fp"))
    }),

    // --- batch sessionization (24h inactivity gap): the batch twin of
    //     the streaming sessionizer, one row per (user, session) with
    //     integer-micros bounds — gap compares are exact integers, no
    //     FP threshold ---
    "q_sessionize" -> ((s, dir) => {
      EventOps.sessionize(Fixtures.events(s, dir), gapSec = 86400L)
    }),

    // --- windowed duplicate-event suppression (ingestion dedup): an
    //     event is a dup iff any same-(user, type) event precedes it
    //     within 30 minutes; one lag window per bounded key partition,
    //     integer micros, 6/91/926 dups at the three scales (the rule
    //     passes AND fails everywhere — non-vacuous) ---
    "q_event_dedup" -> ((s, dir) => {
      EventOps.dedupEvents(Fixtures.events(s, dir), windowSec = 1800L)
    }),

    // --- STREAMING sessionize, driver-visible: the event table replays
    //     through the real flatMapGroupsWithState operator as
    //     ascending-time micro-batches; explicit integer-micros gap
    //     splits + sentinel-flushed event-time timeouts reproduce the
    //     batch session set exactly, so the q_sessionize oracle checks
    //     actual streaming state splits/carries/timeout flushes ---
    "q_stream_sessionize" -> ((s, dir) => {
      graft.streaming.StreamOps.replaySessionize(s, Fixtures.events(s, dir),
        gapUs = 86400000000L, numBatches = 2,
        feedKey = Some(s"events_sess:$dir"))
    }),

    // --- cohort retention (integer epoch-day arithmetic, no calendar
    //     functions): distinct users active per (first-seen-day, age) ---
    "q_retention" -> ((s, dir) => {
      EventOps.retention(Fixtures.events(s, dir))
    }),

    // --- STREAMING funnel, driver-visible: ascending-time micro-batch
    //     replay through the real no-timeout flatMapGroupsWithState
    //     operator; the last per-user update is the verdict, checked by
    //     the same chained-window oracle as the batch twin ---
    "q_stream_funnel" -> ((s, dir) => {
      graft.streaming.StreamOps.replayFunnel(s, Fixtures.events(s, dir),
        Seq("view", "click", "purchase"), numBatches = 2,
        feedKey = Some(s"events_funnel:$dir"))
    }),

    // --- JSON property extraction over the event stream ---
    "q_events_props" -> ((s, dir) => {
      Fixtures.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    }),

    // --- event-stream tumbling-window aggregation ---
    "q_events_window" -> ((s, dir) => {
      Fixtures.events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
    }),

    // --- integer-exact k-means clustering over embeddings: quantized
    //     vectors, rounded-integer-mean centroids (the only FP op is one
    //     IEEE division inside round), BIGINT distances — the full
    //     2-iteration Lloyd's replayed exactly by the oracle ---
    "q_kmeans" -> ((s, dir) => {
      Cluster.kmeans(s, Fixtures.embeddings(s, dir), k = 8, iters = 2)
        .select(col("id").as("vec_id"),
          col("cluster").cast("long").as("cluster"), col("d2"))
    }),

    // --- embedding outlier scoring (curation filter): per-cluster
    //     farthest-point rank over the integer-exact kmeans assignment,
    //     top-5 per cluster flagged; the rank is the groupRunningSum
    //     two-phase pass (never a one-task-per-cluster window) and the
    //     (d2 desc, id) total order replays exactly in the oracle ---
    "q_emb_outliers" -> ((s, dir) => {
      Cluster.outliers(s, Fixtures.embeddings(s, dir), k = 8, iters = 2,
          topM = 5)
        .select(col("id").as("vec_id"),
          col("cluster").cast("long").as("cluster"), col("d2"),
          col("c_rank"), col("is_outlier"))
    }),

    // --- SemDeDup: the q_kmeans clustering (integer-exact, so the
    //     oracle replays the assignments) + exact within-cluster cosine
    //     pairs at the q_emb_neardup tau (0.45 — gap-probed on this
    //     fixture) + the deterministic lowest-id-survives keep rule.
    //     Cross-cluster near-dups are deliberately out of reach — that
    //     recall trade IS the SemDeDup contract (quadratic only within
    //     cells) ---
    "q_semdedup" -> ((s, dir) => {
      Dedup.semanticDedup(s, Fixtures.embeddings(s, dir), k = 8, iters = 2,
        tau = 0.45)
        .select(col("vec_id"), col("cluster"), col("kept"))
    }),

    // --- Gopher-style repetition quality: top-token share and duplicate
    //     n-gram fractions, all integer-count ratios (one division each,
    //     mirrored exactly by the oracle) ---
    "q_repetition" -> ((s, dir) => {
      val t = col("text")
      Fixtures.documents(s, dir).select(
        col("doc_id"),
        TextCols.tokenCount(t).cast("long").as("n_tokens"),
        TextCols.maxTokenCount(t).cast("long").as("top_tok_cnt"),
        round(TextCols.maxTokenCount(t).cast("double") /
          TextCols.tokenCount(t), 6).as("top_tok_frac"),
        round(TextCols.dupNgramFraction(t, 2), 6).as("dup_2gram_frac"),
        round(TextCols.dupNgramFraction(t, 3), 6).as("dup_3gram_frac"))
    }),

    // --- sliding-window chunking (RAG/pretraining segmentation):
    //     32-token windows every 24 tokens, md5 chunk fingerprints ---
    "q_chunking" -> ((s, dir) => {
      CorpusOps.chunkDocuments(Fixtures.documents(s, dir), window = 32, stride = 24)
    }),

    // --- backward as-of join: each click matched to the user's latest
    //     prior purchase (left-outer; ties by larger purchase id). All
    //     time arithmetic is integer micros — exact in both engines ---
    "q_asof_join" -> ((s, dir) => {
      val ev = Fixtures.events(s, dir)
      // the SLICED scale path (output-identical to the per-key window,
      // spec-checked): 1-day slices over the 30-day fixture, so the
      // hash gate exercises within-slice matches AND cross-slice carries
      EventOps.asOfJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        keyCol = "user_id", tsCol = "ts", idCol = "event_id",
        sliceSec = 86400L)
    }),

    // --- STREAMING as-of join, driver-visible: the merged two-sided
    //     feed replays in event-time order through the real O(1)-state
    //     flatMapGroupsWithState enrichment operator (per-key state =
    //     ONE last-purchase pair); under the in-order feed the output
    //     equals the batch as-of join row-for-row, so the q_asof_join
    //     oracle checks real streaming enrichment state carries ---
    "q_stream_asof" -> ((s, dir) => {
      val ev = Fixtures.events(s, dir)
      graft.streaming.StreamOps.replayAsOf(s,
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        keyCol = "user_id", tsCol = "ts", idCol = "event_id",
        feedKey = Some(s"events_asof:$dir"))
    }),

    // --- banded range join: (click, purchase) pairs of one user within
    //     2 hours of each other, signed lag in micros ---
    "q_range_join" -> ((s, dir) => {
      val ev = Fixtures.events(s, dir)
      EventOps.rangeJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        keyCol = "user_id", tsCol = "ts", idCol = "event_id",
        deltaSec = 7200L)
    }),

    // --- STREAMING interval join, driver-visible: both event sides
    //     replay as ascending-time micro-batches through the real
    //     watermarked stream-stream join (global-watermark eviction
    //     never drops a within-delta partner under ascending feeds);
    //     the q_range_join oracle replays the append-mode pair set ---
    "q_stream_rangejoin" -> ((s, dir) => {
      val ev = Fixtures.events(s, dir)
      graft.streaming.StreamOps.replayRangeJoin(s,
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        keyCol = "user_id", tsCol = "ts", idCol = "event_id",
        deltaSec = 7200L, numBatches = 2,
        feedKey = Some(s"events_rj:$dir"))
    }),

    // --- STREAMING tumbling-window aggregation, driver-visible: events
    //     replay time-ordered through the real watermarked window agg in
    //     APPEND mode (each window row emitted once, on watermark close;
    //     sentinel batches flush the trailing windows) — the emitted set
    //     equals the q_events_window batch groupBy row-for-row ---
    "q_stream_window" -> ((s, dir) => {
      graft.streaming.StreamOps.replayWindowAgg(s, Fixtures.events(s, dir),
          numBatches = 2, feedKey = Some(s"events_window:$dir"))
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")
            .as("window_start"),
          col("event_type"), col("n"), round(col("sum_value"), 6).as("sum_value"))
    }),

    // --- STREAMING stream-static EMD match, driver-visible: the
    //     histogram corpus (ids not divisible by 10) streams against a
    //     FIXED-SIZE broadcast reference set — ids divisible by 10,
    //     hash-spread to StreamEmdRefCap by (md5(id), id) order (the D14
    //     sampling idiom; a broadcast index is bounded by contract, so
    //     nothing corpus-proportional reaches the driver at any scale) —
    //     through the real cascade kernel; 1-D config, so emitted
    //     distances carry the cum-of-differences closed form the oracle
    //     mirrors ---
    "q_stream_emd" -> ((s, dir) => {
      val hists = Fixtures.quantityHists(s, dir)
      val refs = hists.filter(col("id") % 10 === 0)
        .select(col("id").cast("long").as("id"), col("weights"))
        .orderBy(md5(col("id").cast("string")), col("id"))
        .limit(StreamEmdRefCap)
      graft.streaming.StreamOps.replayEmdMatch(s,
          hists.filter(col("id") % 10 =!= 0), refs, melodyCfg1d, Theta,
          maxRefs = StreamEmdRefCap, numBatches = 2,
          feedKey = Some(s"hists_emd:$dir"))
        .select(col("stream_id"), col("ref_id"),
          round(col("dist"), 6).as("dist"))
    }),

    // --- STREAMING stream-static bounded edit-distance match: the
    //     fuzzy-blocklist ingestion shape — documents stream against a
    //     FIXED-size broadcast PassJoin segment index (refs = ids
    //     divisible by 10, hash-spread to StreamEditRefCap by
    //     (md5(id), id) order in BOTH engines); per batch a pure
    //     map-side probe + banded-DP verify, no shuffle, no state.
    //     Stateless per batch => emitted set == the batch banded
    //     levenshtein join the oracle replays ---
    "q_stream_editmatch" -> ((s, dir) => {
      val d = Fixtures.documents(s, dir)
      val refs = d.filter(col("doc_id") % 10 === 0)
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        .limit(StreamEditRefCap)
      graft.streaming.StreamOps.replayEditMatch(s,
        d.filter(col("doc_id") % 10 =!= 0), refs, d = 4,
        maxRefs = StreamEditRefCap, numBatches = 2,
        feedKey = Some(s"docsmod10:$dir"))
    }),

    // --- STREAMING stream-static ANN, driver-visible: every 20th
    //     embedding streams as a query against the static residual
    //     IVF-PQ index built once over the FULL corpus (4 coarse cells,
    //     4x16-dim 8-code residual books — the q_ivfpq_topk layout);
    //     per batch, executor-side probe+LUT rows broadcast-join the
    //     cluster-keyed index and a rank window takes each query's
    //     top-5 by (adc_d2, id). Stateless per batch => emitted set ==
    //     the one-shot batch run, which the oracle replays in BIGINT ---
    "q_stream_ann" -> ((s, dir) => {
      val embs = Fixtures.embeddings(s, dir)
      val queries = graft.operators.Cluster
        .quantize(embs.filter(col("vec_id") % 20 === 0), 1000)
        .select(col("id").as("qid"), col("v"))
      graft.streaming.StreamOps.replayAnnTopK(s, queries, embs,
        kCoarse = 4, nProbe = 2, numSub = 4, ksub = 8, k = 5,
        numBatches = 2, feedKey = Some(s"ann_q:$dir"))
    }),

    // --- normal fit + Hough + uniform grid cell id (P4/P5/P8/A1) ---
    "q_cell_assign" -> ((s, dir) => {
      val hists = Fixtures.quantityHists(s, dir)
      val fitted = hists.select(
        col("id"),
        EmdCols.histMean(col("weights")).as("mu"),
        sqrt(greatest(EmdCols.histMoment2(col("weights")) -
          EmdCols.histMean(col("weights")) * EmdCols.histMean(col("weights")),
          lit(1e-8))).as("sigma"))
      val hough = fitted.select(col("id"), col("mu"), col("sigma"),
        (lit(1.0) / col("sigma")).as("m"),
        (-col("mu") / col("sigma")).as("b"))
      val dom = hough.agg(
        min(col("m")).as("min_m"), max(col("m")).as("max_m"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"))
      val g = 4
      hough.crossJoin(broadcast(dom))
        .select(col("id"),
          round(col("mu"), 6).as("mu"), round(col("sigma"), 6).as("sigma"),
          (least(floor((col("m") - col("min_m")) /
              ((col("max_m") - col("min_m")) / g)), lit(g - 1.0)) * g +
            least(floor((col("b") - col("min_b")) /
              ((col("max_b") - col("min_b")) / g)), lit(g - 1.0)))
            .cast("long").as("cell"))
    })
  )

  /** DuckDB-equivalent SQL per query (tables registered from the same
    * parquet dir by the driver). Shared hist CTE mirrors
    * Fixtures.quantityHistLong exactly. */
  /** The 8-bin quantity-histogram CTE chain. `idLimit` restricts the
    * corpus to the N lowest ids BEFORE anything pairwise downstream —
    * fixed-slice audit oracles must not pay (or risk OOMing the
    * checker with) a full-corpus candidate join just to count pairs
    * inside the slice. */
  private def histCte(idLimit: Option[Int] = None): String = {
    val lim = idLimit.map(n => s" ORDER BY id LIMIT $n").getOrElse("")
    s"""WITH binned AS (
      |  SELECT l_partkey AS id,
      |         least(greatest(cast(floor((l_quantity - 1.0) / 6.25) AS INTEGER), 0), 7) AS bin
      |  FROM lineitem
      |), counts AS (
      |  SELECT id, bin, cast(count(*) AS DOUBLE) AS c FROM binned GROUP BY id, bin
      |), ids AS (SELECT DISTINCT id FROM binned$lim
      |), dense AS (
      |  SELECT i.id, b.bin, coalesce(c.c, 0.0) AS c
      |  FROM ids i
      |  CROSS JOIN (SELECT cast(range AS INTEGER) AS bin FROM range(8)) b
      |  LEFT JOIN counts c ON c.id = i.id AND c.bin = b.bin
      |), hist AS (
      |  SELECT id, bin, c / sum(c) OVER (PARTITION BY id) AS w FROM dense
      |)""".stripMargin
  }

  private val HistCte: String = histCte()

  /** 3-D histogram CTE mirroring Fixtures.tripleHists exactly: per
    * l_partkey, 2x2x2 corner bins over (quantity, extendedprice,
    * discount), bit-order bin index, normalized weights. */
  private val Hist3Cte: String =
    """WITH binned AS (
      |  SELECT l_partkey AS id,
      |         (CASE WHEN l_quantity > 25.0 THEN 4 ELSE 0 END +
      |          CASE WHEN l_extendedprice > 30000.0 THEN 2 ELSE 0 END +
      |          CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS bin
      |  FROM lineitem
      |), counts AS (
      |  SELECT id, bin, cast(count(*) AS DOUBLE) AS c FROM binned GROUP BY id, bin
      |), ids AS (SELECT DISTINCT id FROM binned
      |), dense AS (
      |  SELECT i.id, b.bin, coalesce(c.c, 0.0) AS c
      |  FROM ids i
      |  CROSS JOIN (SELECT cast(range AS INTEGER) AS bin FROM range(8)) b
      |  LEFT JOIN counts c ON c.id = i.id AND c.bin = b.bin
      |), hist AS (
      |  SELECT id, bin, c / sum(c) OVER (PARTITION BY id) AS w FROM dense
      |)""".stripMargin

  /** Banded tree-EMD oracle generator shared by the four tree queries.
    *
    * The naive oracle self-joins `nodemass` on (span, node) and GROUPs by
    * the pair — N^2/2 hash-aggregate groups, which reproducibly OOM-kills
    * the single-process DuckDB checker at sf0.1 (~2e8 groups, 60-90 GB
    * RSS). This form prunes candidate pairs BEFORE computing distances
    * with a lossless band: per id and per level l, s_l = node-parity
    * signed sum of that level's features, so |Δs_l| = |Σ±(f_a - f_b)| <=
    * Σ_l|f_a - f_b| for ANY fixed sign assignment, and because the
    * levels' term sets are disjoint, Σ_l |Δs_l| <= Σ_all |Δf| = dist.
    * The IEJoin bands on the global sum s4+s2+s1 (= the one-projection
    * shadow), then the tighter per-level sum filters the survivors
    * (53M -> 7M candidates at sf0.1, measured). Distances are then
    * computed per candidate row from a per-id feature LIST
    * (list_transform over the same 14 |Δf| terms — no N^2 hash-aggregate
    * anywhere), so values (and hashes) are unchanged.
    *
    * cap: threshold queries use tau + 1e-9 (slack absorbs the FP
    * evaluation gap between s and dist at an exact-boundary pair; the
    * final raw `dist <= tau` filter is unchanged). Top-k queries derive
    * cap from a deterministic O(N) sample — consecutive ids in id order —
    * whose k-th smallest distance upper-bounds the true k-th distance;
    * +2e-6 covers the full 6-decimal rounding bucket, mirroring the Spark
    * side (EmdJoins.treeEmdTopKLevels ub + 2e-6 for the same reason). */
  private def treeEmdOracle(baseCte: String, fSql: String, topK: Option[Int],
                            tau: Double): String = {
    val capCte = topK match {
      case Some(k) =>
        s""", ord AS (
           |  SELECT id, fv, row_number() OVER (ORDER BY id) AS rn FROM fvec
           |), sampd AS (
           |  SELECT list_sum(list_transform(range(1, 15),
           |           i -> abs(x.fv[i] - y.fv[i]))) AS dist
           |  FROM ord x JOIN ord y ON y.rn = x.rn + 1
           |), cap AS (
           |  SELECT CASE WHEN count(*) >= $k THEN max(dist) + 2e-6 ELSE 1e18 END AS ub
           |  FROM (SELECT dist FROM sampd ORDER BY dist LIMIT $k)
           |)""".stripMargin
      case None => s", cap AS (SELECT $tau + 1e-9 AS ub)"
    }
    val finalSel = topK match {
      case Some(k) =>
        s"""SELECT rid, sid, round(dist, 6) AS dist FROM dists
           |ORDER BY round(dist, 6), rid, sid LIMIT $k""".stripMargin
      case None =>
        s"""SELECT rid, sid, round(dist, 6) AS dist FROM dists
           |WHERE dist <= $tau""".stripMargin
    }
    baseCte +
      s""", lv AS (
         |  SELECT unnest([4, 2, 1]) AS span
         |), nodemass AS (
         |  SELECT h.id, lv.span, h.bin // lv.span AS node,
         |         $fSql AS f
         |  FROM hist h CROSS JOIN lv
         |  GROUP BY h.id, lv.span, h.bin // lv.span
         |), bkey AS (
         |  SELECT id,
         |    sum(CASE WHEN span = 4 AND node % 2 = 0 THEN f
         |             WHEN span = 4 THEN -f ELSE 0 END) AS s4,
         |    sum(CASE WHEN span = 2 AND node % 2 = 0 THEN f
         |             WHEN span = 2 THEN -f ELSE 0 END) AS s2,
         |    sum(CASE WHEN span = 1 AND node % 2 = 0 THEN f
         |             WHEN span = 1 THEN -f ELSE 0 END) AS s1
         |  FROM nodemass GROUP BY id
         |), fvec AS (
         |  SELECT id, list(f ORDER BY span DESC, node) AS fv
         |  FROM nodemass GROUP BY id
         |)""".stripMargin +
      capCte +
      s""", cand AS (
         |  SELECT a.id AS rid, b.id AS sid
         |  FROM bkey a JOIN bkey b
         |    ON a.id < b.id
         |   AND a.s4 + a.s2 + a.s1 <= b.s4 + b.s2 + b.s1 + (SELECT ub FROM cap)
         |   AND b.s4 + b.s2 + b.s1 <= a.s4 + a.s2 + a.s1 + (SELECT ub FROM cap)
         |  WHERE abs(a.s4 - b.s4) + abs(a.s2 - b.s2) + abs(a.s1 - b.s1)
         |        <= (SELECT ub FROM cap)
         |), dists AS (
         |  SELECT c.rid, c.sid,
         |         list_sum(list_transform(range(1, 15),
         |           i -> abs(a.fv[i] - b.fv[i]))) AS dist
         |  FROM cand c
         |  JOIN fvec a ON a.id = c.rid
         |  JOIN fvec b ON b.id = c.sid
         |)
         |""".stripMargin + finalSel
  }

  private val TreeF1dSql = "sum(h.w) * lv.span"
  private val TreeF3dSql =
    "sum(h.w) * (CASE lv.span WHEN 4 THEN 0.25 WHEN 2 THEN 0.25 ELSE 0.5 END)"

  /** Banded 1-D EMD oracle generator — the [[treeEmdOracle]] idiom for
    * the two 1-D arithmetic shapes. The naive forms aggregate N^2/2
    * pair groups in DuckDB (the dominant term of the sf0.1 checker's
    * 96.6 GB peak and ~4-10 min per query); this form bands first and
    * computes each shape's distance per candidate row from a per-id
    * LIST, preserving the FP shape exactly:
    *
    *  - prefixShape=true (q_emd1d/q_melody1d): dist = sum over bins<7 of
    *    |cw_a - cw_b| — the scalar-cums shape, same values as the old
    *    `sum(abs(a.cw - b.cw))` aggregate;
    *  - prefixShape=false (mrsim's kernel): dist = sum over all 8 bins
    *    of |running sum of (w_a - w_b)| — the cum-of-differences shape;
    *    the inner list_sum re-adds d_1..d_b left-to-right, the exact
    *    addition sequence of the kernel's running fold, so the doubles
    *    stay bit-identical (the two CTE forms are FP-DISTINCT and must
    *    not be swapped — CLAUDE.md rule 1).
    *
    * Band key: s = SUM of the per-id prefix sums with ALL-PLUS signs —
    * |Δs| <= Σ|Δcw| <= dist for any fixed sign pattern, and 1-D EMD
    * cum-differences are monotone-correlated, so the alternating
    * pattern cancels (76% survivors) while all-plus separates (20%,
    * measured at sf0.1; end-to-end 8.7s/20.3s vs minutes). Top-k caps
    * come from the consecutive-id sample's k-th distance + 2e-6
    * (rounding-bucket margin), threshold caps are tau + 1e-6 FP slack;
    * the final raw `dist <= tau` filter / rounded order is unchanged. */
  private def emd1dOracle(prefixShape: Boolean, topK: Option[Int],
                          tau: Double,
                          idLimit: Option[Int] = None): String = {
    val vecCte =
      if (prefixShape)
        """, vec AS (
          |  SELECT id, list(cw ORDER BY bin) AS v
          |  FROM cum WHERE bin < 7 GROUP BY id
          |)""".stripMargin
      else
        """, vec AS (
          |  SELECT id, list(w ORDER BY bin) AS v FROM hist GROUP BY id
          |)""".stripMargin
    def distExpr(a: String, b: String): String =
      if (prefixShape)
        s"list_sum(list_transform(range(1, 8), i -> abs($a.v[i] - $b.v[i])))"
      else
        s"""list_sum(list_transform(range(1, 9), bb ->
           |      abs(list_sum(list_transform(range(1, bb + 1),
           |        i -> $a.v[i] - $b.v[i])))))""".stripMargin
    val capCte = topK match {
      case Some(k) =>
        s""", ord AS (
           |  SELECT id, v, row_number() OVER (ORDER BY id) AS rn FROM vec
           |), sampd AS (
           |  SELECT ${distExpr("x", "y")} AS dist
           |  FROM ord x JOIN ord y ON y.rn = x.rn + 1
           |), cap AS (
           |  SELECT CASE WHEN count(*) >= $k THEN max(dist) + 2e-6 ELSE 1e18 END AS ub
           |  FROM (SELECT dist FROM sampd ORDER BY dist LIMIT $k)
           |)""".stripMargin
      case None => s", cap AS (SELECT $tau + 1e-6 AS ub)"
    }
    val finalSel = topK match {
      case Some(k) =>
        s"""SELECT rid, sid, round(dist, 6) AS dist FROM emds
           |ORDER BY round(dist, 6), rid, sid LIMIT $k""".stripMargin
      case None =>
        s"""SELECT rid, sid, round(dist, 6) AS dist FROM emds
           |WHERE dist <= $tau""".stripMargin
    }
    histCte(idLimit) +
      """, cum AS (
        |  SELECT id, bin, sum(w) OVER (PARTITION BY id ORDER BY bin) AS cw
        |  FROM hist
        |), bkey AS (
        |  SELECT id, sum(cw) AS s FROM cum WHERE bin < 7 GROUP BY id
        |)""".stripMargin +
      vecCte + capCte +
      s""", cand AS (
         |  SELECT a.id AS rid, b.id AS sid
         |  FROM bkey a JOIN bkey b
         |    ON a.id < b.id
         |   AND a.s <= b.s + (SELECT ub FROM cap)
         |   AND b.s <= a.s + (SELECT ub FROM cap)
         |), emds AS (
         |  SELECT c.rid, c.sid, ${distExpr("x", "y")} AS dist
         |  FROM cand c
         |  JOIN vec x ON x.id = c.rid
         |  JOIN vec y ON y.id = c.sid
         |)
         |""".stripMargin + finalSel
  }

  /** Simhash signature + all-pairs Hamming CTEs, shared by the pair join
    * oracle and the connected-components clustering oracle. */
  private val SimhashCteBody: String =
    """tc AS (
      |  SELECT doc_id, tok, count(*) AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY doc_id, tok
      |), th AS (
      |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h, c FROM tc
      |), bitsum AS (
      |  SELECT doc_id, bb.b AS b,
      |         sum(CASE WHEN (h >> bb.b) & 1 = 1 THEN c ELSE -c END) AS acc
      |  FROM th CROSS JOIN (SELECT unnest(range(64)) AS b) bb
      |  GROUP BY doc_id, bb.b
      |), sims AS (
      |  SELECT doc_id,
      |         list(CASE WHEN acc > 0 THEN 1 ELSE 0 END ORDER BY b) AS bits
      |  FROM bitsum GROUP BY doc_id
      |), pairs AS (
      |  SELECT a.doc_id AS rid, b.doc_id AS sid,
      |         list_sum(list_transform(range(1, 65),
      |           i -> CASE WHEN a.bits[i] <> b.bits[i] THEN 1 ELSE 0 END)) AS hamming
      |  FROM sims a JOIN sims b ON a.doc_id < b.doc_id
      |)""".stripMargin

  /** Exact-dedup canonical fingerprint (mirrors TextCols.fingerprint) —
    * the ONE copy shared by q_dedup_exact, q_stream_dedup, and
    * q_pipeline's keepers stage, so a normalization change cannot drift
    * between the standalone and composed oracles. Parameterized by the
    * column reference (aliased call sites pass "d.text") instead of
    * post-hoc string surgery, which would silently corrupt the SQL if
    * the body ever gained another 'text' occurrence. */
  /** Ingest-chain CTEs (lg/lg2/lg3 card derivation + Luhn verdict, jg
    * JSONL serialization, jrec truncation, parsed json_valid lane,
    * scrub structural redaction) over `documents` — shared by
    * q_ingest_pipeline (which appends the quality gate) and
    * q_stream_ingest (whose stateless replay lands exactly the scrub
    * output): one body, two call sites. */
  private def ingestScrubCtes: String =
    """lg AS (
      |  SELECT doc_id, text, lang, source, n_chars,
      |    concat('4', lpad(CAST((doc_id * 7919) % 1000000000000000 AS VARCHAR), 15, '0')) AS c16
      |  FROM documents
      |), lg2 AS (
      |  SELECT doc_id, text, lang, source, n_chars, c16,
      |    CASE WHEN doc_id % 2 = 0
      |         THEN concat(substr(c16, 1, 4), '-', substr(c16, 5, 4), '-',
      |                     substr(c16, 9, 4), '-', substr(c16, 13, 4))
      |         ELSE c16 END AS cardstr,
      |    doc_id % 3 = 0 AS has_card
      |  FROM lg
      |), lg3 AS (
      |  SELECT doc_id, lang, source, n_chars, cardstr, has_card,
      |    concat(text, CASE WHEN has_card
      |      THEN concat(' pay ', cardstr, ' today ref 12345 ok')
      |      ELSE '' END) AS ctext,
      |    list_sum(list_transform(generate_series(1, 16), i ->
      |      CASE WHEN (16 - i) % 2 = 1
      |           THEN CASE WHEN 2 * CAST(substr(c16, i, 1) AS INT) > 9
      |                     THEN 2 * CAST(substr(c16, i, 1) AS INT) - 9
      |                     ELSE 2 * CAST(substr(c16, i, 1) AS INT) END
      |           ELSE CAST(substr(c16, i, 1) AS INT) END)) % 10 = 0 AS luhn_ok
      |  FROM lg2
      |), jg AS (
      |  SELECT doc_id, cardstr, has_card, luhn_ok,
      |    concat('{"id": ', CAST(doc_id AS VARCHAR),
      |           ', "meta": {"lang": "', lang,
      |           '", "source": "', source,
      |           '", "n_chars": ', CAST(n_chars AS VARCHAR),
      |           '}, "tags": ',
      |           CASE WHEN doc_id % 3 = 0 THEN '["wiki", "ref"]'
      |                WHEN doc_id % 3 = 1 THEN '["web"]'
      |                ELSE '[]' END,
      |           ', "text": "', ctext, '"}') AS fj
      |  FROM lg3
      |), jrec AS (
      |  SELECT doc_id, cardstr, has_card, luhn_ok,
      |    CASE WHEN doc_id % 17 = 0 THEN substr(fj, 1, len(fj) - 5)
      |         ELSE fj END AS j
      |  FROM jg
      |), parsed AS (
      |  SELECT doc_id, cardstr, has_card, luhn_ok,
      |    json_extract_string(j, '$.text') AS ptext
      |  FROM jrec WHERE json_valid(j)
      |), scrub AS (
      |  SELECT doc_id,
      |    CASE WHEN has_card AND luhn_ok THEN replace(ptext, cardstr, '<CARD>')
      |         ELSE ptext END AS clean_text,
      |    CAST(CASE WHEN has_card AND luhn_ok THEN 1 ELSE 0 END AS BIGINT) AS n_cards,
      |    CAST(CASE WHEN has_card AND NOT luhn_ok THEN 1 ELSE 0 END AS BIGINT) AS n_rejected
      |  FROM parsed
      |)""".stripMargin

  private def fingerprintSql(col: String = "text"): String =
    s"""md5(regexp_replace(lower($col), '\\s+', ' ', 'g'))"""
  private val FingerprintSql = fingerprintSql()

  /** Quality-gate stats CTE chain (t, h) over `src` (doc_id, text):
    * token list, n/d/stops, top-token count m, 3-gram list g3. The five
    * rule predicates over h are the Qg* constants below — integer
    * cross-multiplied, engine-exact. Shared by q_quality_gate and
    * q_pipeline (the advisor's compose-don't-copy rule: one body, two
    * call sites). */
  /** Paragraph-dedup CTE chain (Dedup.paraWrap + paragraphDedup replay)
    * over `src` (doc_id, text): emits paras/ranked/rdoc where rdoc is
    * (doc_id, clean_text, kept_paras, dropped_paras). Shared by
    * q_para_dedup and the composed q_clean_pipeline so the replay
    * cannot desynchronize from the fixture. */
  private def paraDedupCtes(src: String): String =
    s"""paras AS (
       |  SELECT doc_id, 1 AS pno, text AS para FROM $src
       |  UNION ALL SELECT doc_id, 2,
       |    'subscribe to our newsletter for weekly updates and news'
       |    FROM $src WHERE doc_id % 3 = 0
       |  UNION ALL SELECT doc_id, 3,
       |    concat('all rights reserved contact support team ', CAST(doc_id % 5 AS VARCHAR))
       |    FROM $src WHERE doc_id % 4 = 1
       |  UNION ALL SELECT doc_id, 4,
       |    concat('popular in category ', CAST(doc_id % 11 AS VARCHAR), ' read more stories')
       |    FROM $src WHERE doc_id % 7 = 2
       |  UNION ALL SELECT doc_id, 5,
       |    concat('trailer note for document ', CAST(doc_id AS VARCHAR))
       |    FROM $src
       |), ranked AS (
       |  SELECT doc_id, pno, para,
       |    row_number() OVER (PARTITION BY para ORDER BY doc_id, pno) AS rn
       |  FROM paras
       |), rdoc AS (
       |  SELECT doc_id,
       |    coalesce(string_agg(para, chr(10) ORDER BY pno) FILTER (WHERE rn = 1), '') AS clean_text,
       |    CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS kept_paras,
       |    CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS dropped_paras
       |  FROM ranked GROUP BY doc_id
       |)""".stripMargin

  /** Text-normalization CTE chain (CorpusOps.messWrap + normalizeText
    * replay) over `src` (doc_id, text): emits g/n where n is
    * (doc_id, raw, norm_text). The normalization chain mirrors the
    * kernel's step order exactly — raw char maps innermost (8203/8204/
    * 8205 zero-width out, 160/9 to space), then nfc_normalize,
    * strip_accents (utf8proc == NFD-minus-Mn on the reachable charset),
    * lower, space-run collapse, trim. Shared by q_text_norm and
    * q_clean_pipeline. */
  private def textNormCtes(src: String): String =
    s"""g AS (
       |  SELECT doc_id, concat(
       |    CASE WHEN doc_id % 3 = 0 THEN concat('Cafe', chr(769), ' menu ') ELSE '' END,
       |    CASE WHEN doc_id % 5 = 1 THEN concat('hot', chr(160), 'take ') ELSE '' END,
       |    CASE WHEN doc_id % 7 = 3 THEN concat('zero', chr(8203), 'width ') ELSE '' END,
       |    CASE WHEN doc_id % 4 = 2 THEN concat('TAB', chr(9), 'SPACED  OUT ') ELSE '' END,
       |    CASE WHEN doc_id % 2 = 0 THEN upper(text) ELSE text END,
       |    CASE WHEN doc_id % 11 = 5 THEN '  ' ELSE '' END) AS raw
       |  FROM $src
       |), n AS (
       |  SELECT doc_id, raw,
       |    trim(regexp_replace(
       |      lower(strip_accents(nfc_normalize(
       |        replace(replace(replace(replace(replace(raw,
       |          chr(8203), ''), chr(8204), ''), chr(8205), ''),
       |          chr(160), ' '), chr(9), ' ')))),
       |      ' +', ' ', 'g')) AS norm_text
       |  FROM g
       |)""".stripMargin

  /** SQ8 CTE chain (Ann.sq8MaxAbs + sq8TopK replay): emits
    * base/e/amax/qq/c/scored where scored is (id, qdot) over the whole
    * corpus minus the min-vec_id query row; the scale covers the FULL
    * corpus (query included), matching sq8TopK's stats-before-exclusion.
    * The signed code map is the kernel's exact left-associated IEEE
    * shape (symmetric, zero offset — the measured design; see
    * Ann.sq8Code). Shared by q_sq8_topk and q_sq8_recall. */
  private def sq8Ctes: String =
    """base AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |), e AS (
      |  SELECT vec_id, generate_subscripts(v, 1) AS dim, unnest(v) AS val FROM base
      |), amax AS (
      |  SELECT max(abs(val)) AS a FROM e
      |), qq AS (
      |  SELECT e.dim,
      |    CASE WHEN (SELECT a FROM amax) = 0 THEN 0
      |         ELSE CAST(floor(e.val * 127.0 / (SELECT a FROM amax) + 0.5) AS BIGINT)
      |    END AS qc
      |  FROM e
      |  WHERE e.vec_id = (SELECT min(vec_id) FROM base)
      |), c AS (
      |  SELECT e.vec_id, e.dim,
      |    CASE WHEN (SELECT a FROM amax) = 0 THEN 0
      |         ELSE CAST(floor(e.val * 127.0 / (SELECT a FROM amax) + 0.5) AS BIGINT)
      |    END AS cc
      |  FROM e
      |  WHERE e.vec_id <> (SELECT min(vec_id) FROM base)
      |), scored AS (
      |  SELECT c.vec_id AS id, CAST(sum(c.cc * qq.qc) AS BIGINT) AS qdot
      |  FROM c JOIN qq USING (dim)
      |  GROUP BY c.vec_id
      |)""".stripMargin

  private def qualityGateCtes(src: String): String =
    s"""t AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS t FROM $src
       |), h AS (
       |  SELECT doc_id, text, t,
       |    len(t) AS n, len(list_distinct(t)) AS d,
       |    len(list_filter(['the','and','of','to','in','is','with','for'],
       |        m -> list_contains(list_distinct(t), m))) AS stops,
       |    list_max(list_transform(list_distinct(t),
       |        x -> len(list_filter(t, y -> y = x)))) AS m,
       |    CASE WHEN len(t) < 3 THEN [replace(text, ' ', '_')]
       |         ELSE list_transform(range(1, len(t) - 1),
       |                i -> t[i] || '_' || t[i + 1] || '_' || t[i + 2])
       |    END AS g3
       |  FROM t
       |)""".stripMargin

  private val QgLenOk = "n BETWEEN 15 AND 5000"
  private val QgDivOk = "d * 5 >= n * 2"
  private val QgStopOk = "stops >= 1"
  private val QgTopOk = "m * 5 <= n"
  private val QgRepOk = "(len(g3) - len(list_distinct(g3))) * 50 <= len(g3)"
  private def qgKeepPred: String =
    s"$QgLenOk AND $QgDivOk AND $QgStopOk AND $QgTopOk AND $QgRepOk"

  /** round-6 quality score CTE (CorpusOps.qualityScore arithmetic shape)
    * over `src` (doc_id, text) — shared by q_keep_best and q_pipeline. */
  private def qualityScoreCte(src: String): String =
    s"""sc AS (
       |  SELECT doc_id,
       |    round(least(cast(len(string_split(text, ' ')) AS DOUBLE) / 100.0,
       |                1.0) * 0.3 +
       |          (cast(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |           / len(string_split(text, ' '))) * 0.4 +
       |          least((cast(len(list_filter(
       |              ['the','and','of','to','in','is','with','for'],
       |              m -> list_contains(list_distinct(string_split(text, ' ')),
       |                                 m))) AS DOUBLE)
       |                 / len(list_distinct(string_split(text, ' ')))) * 5.0,
       |                1.0) * 0.3, 6) AS score
       |  FROM $src
       |)""".stripMargin

  /** Undirected transitive closure over an edge CTE `edges`(u, v):
    * bidir + recursive reach. Requires a WITH RECURSIVE prefix. Shared
    * by q_dedup_clusters, q_keep_best, and q_pipeline. */
  private def reachCtes(edges: String): String =
    s"""bidir AS (
       |  SELECT u, v FROM $edges UNION SELECT v AS u, u AS v FROM $edges
       |), reach(u, v) AS (
       |  SELECT u, v FROM bidir
       |  UNION
       |  SELECT r.u, b.v FROM reach r JOIN bidir b ON r.v = b.u
       |)""".stripMargin

  /** Min-reachable-id cluster assignment CTE (cl) over reach for every
    * doc in `src`. */
  private def clusterCte(src: String): String =
    s"""cl AS (
       |  SELECT d.doc_id AS id,
       |         least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS cluster
       |  FROM $src d LEFT JOIN reach r ON r.u = d.doc_id
       |  GROUP BY d.doc_id
       |)""".stripMargin

  /** doc_id-ordered token packing CTEs (sized, c) + final select over
    * `src` (doc_id, text) at the fixed 512 budget — shared by
    * q_pack_sequences and q_pipeline. */
  private def packCtes(src: String): String =
    s"""sized AS (
       |  SELECT doc_id, cast(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM $src
       |), c AS (
       |  SELECT doc_id, n_tokens,
       |    sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS s
       |  FROM sized
       |)""".stripMargin

  private val PackSelect =
    """SELECT doc_id, n_tokens,
      |       cast(s // 512 AS BIGINT) AS seq_start,
      |       cast((s + n_tokens - 1) // 512 AS BIGINT) AS seq_end,
      |       cast(s % 512 AS BIGINT) AS seq_offset
      |FROM c""".stripMargin

  /** 3-token shingle-set select (doc_id, s) over `src` — the operator's
    * two joiner variants (' ' for the minhash family, '_' for ngram);
    * sub-3-token docs collapse to the single joined-text shingle. */
  private def shingleSetSql(src: String, joiner: String,
                            shortExpr: String): String =
    s"""SELECT doc_id,
       |    CASE WHEN len(t) < 3 THEN [$shortExpr]
       |         ELSE list_distinct(list_transform(range(1, len(t) - 1),
       |                i -> t[i] || '$joiner' || t[i + 1] || '$joiner' || t[i + 2]))
       |    END AS s
       |  FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM $src)""".stripMargin

  /** BANDED set-Jaccard pair CTEs — shared by q_jaccard_pairs,
    * q_minhash_pairs, q_ngram_jaccard, and q_pipeline's edge stage.
    *
    * The naive oracle self-joins the per-doc set lists all-pairs
    * (N^2/2 rows each dragging two full LIST columns — the checker's
    * residual ~30 GB RSS peak at sf0.1). This form prunes candidates
    * FIRST with the operator's own prefix-filter argument
    * (Dedup.jaccardJoin): rank each doc's elements by the global total
    * order (document frequency, element) and keep the first
    * n - ceil(tau*n) + 1 ranked elements. J(A,B) >= tau implies
    * |A∩B| >= tau*|A∪B| >= ceil(tau*max(|A|,|B|)), and a pair sharing
    * >= t elements must share its globally-smallest shared element
    * inside both (len - t + 1)-prefixes (if it sat in A's last t-1
    * positions, all >= t shared elements would have to fit there —
    * pigeonhole), so the prefix equijoin loses no qualifying pair; each
    * doc's own t = ceil(tau*len) only ever LENGTHENS the prefix past
    * the pairwise requirement. ceil is integer-exact:
    * (num*n + den - 1) // den. The exact verify over candidates keeps
    * the original i/la/lb arithmetic, so values and hashes are
    * unchanged vs the all-pairs form.
    *
    * Emits {p}sh, {p}un, {p}df, {p}pref, {p}cand, {p}pairs(rid, sid,
    * i DOUBLE, la, lb); `shSelect` must yield (doc_id, s LIST). */
  private def jaccardBandedCtes(shSelect: String, tauNum: Long,
                                tauDen: Long, p: String = ""): String =
    s"""${p}sh AS (
       |  $shSelect
       |), ${p}un AS (
       |  SELECT doc_id, unnest(s) AS g FROM ${p}sh
       |), ${p}df AS (
       |  SELECT g, count(*) AS df FROM ${p}un GROUP BY g
       |), ${p}pref AS (
       |  SELECT doc_id, g FROM (
       |    SELECT u.doc_id, u.g,
       |      row_number() OVER (PARTITION BY u.doc_id ORDER BY d.df, u.g) AS r,
       |      count(*) OVER (PARTITION BY u.doc_id) AS n
       |    FROM ${p}un u JOIN ${p}df d ON d.g = u.g)
       |  WHERE r <= n - ($tauNum * n + $tauDen - 1) // $tauDen + 1
       |), ${p}cand AS (
       |  SELECT DISTINCT a.doc_id AS rid, b.doc_id AS sid
       |  FROM ${p}pref a JOIN ${p}pref b ON a.g = b.g AND a.doc_id < b.doc_id
       |), ${p}pairs AS (
       |  SELECT c.rid, c.sid,
       |         cast(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE) AS i,
       |         len(a.s) AS la, len(b.s) AS lb
       |  FROM ${p}cand c
       |  JOIN ${p}sh a ON a.doc_id = c.rid
       |  JOIN ${p}sh b ON b.doc_id = c.sid
       |)""".stripMargin

  /** One Lloyd's round of the q_kmeans oracle: assign (BIGINT squared-L2
    * argmin, ties to the lowest cid), then rounded-integer-mean centroid
    * update with empty clusters keeping the previous centroid — the exact
    * arithmetic Cluster.kmeans performs. */
  private def kmeansRound(t: Int): String = {
    val prev = if (t == 1) "c0" else s"c${t - 1}"
    s""", a$t AS (
       |  SELECT id, v, cid, d2,
       |         row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
       |  FROM (SELECT q.id, q.v, c.cid,
       |          cast(list_sum(list_transform(range(1, len(q.v) + 1),
       |            i -> (q.v[i] - c.m[i]) * (q.v[i] - c.m[i]))) AS BIGINT) AS d2
       |        FROM q CROSS JOIN $prev c)
       |), u$t AS (
       |  SELECT cid, list(mi ORDER BY dim) AS m FROM (
       |    SELECT cid, dim, cast(round(sum(val) / count(*)) AS BIGINT) AS mi
       |    FROM (SELECT cid, unnest(v) AS val, generate_subscripts(v, 1) AS dim
       |          FROM a$t WHERE rn = 1)
       |    GROUP BY cid, dim) GROUP BY cid
       |), c$t AS (
       |  SELECT p.cid, coalesce(u$t.m, p.m) AS m
       |  FROM $prev p LEFT JOIN u$t USING (cid)
       |)""".stripMargin
  }

  /** Chained per-step window minima — one oracle for both the batch
    * funnel and its streaming replay (identical output contract). */
  private val FunnelSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS tus, event_type AS et FROM events
      |), s1 AS (
      |  SELECT *, min(CASE WHEN et = 'view' THEN tus END)
      |              OVER (PARTITION BY user_id) AS t1 FROM e
      |), s2 AS (
      |  SELECT *, min(CASE WHEN et = 'click' AND tus > t1 THEN tus END)
      |              OVER (PARTITION BY user_id) AS t2 FROM s1
      |), s3 AS (
      |  SELECT *, min(CASE WHEN et = 'purchase' AND tus > t2 THEN tus END)
      |              OVER (PARTITION BY user_id) AS t3 FROM s2
      |)
      |SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3,
      |       CAST(CASE WHEN min(t3) IS NOT NULL THEN 3
      |                 WHEN min(t2) IS NOT NULL THEN 2
      |                 WHEN min(t1) IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS reached
      |FROM s3 GROUP BY user_id""".stripMargin

  /** The k=8 / iters=2 Lloyd's CTE chain over the embeddings table
    * (corpus CTE `q`, final assignment CTE `af` keyed rn=1) — shared by
    * the q_kmeans oracle and the q_semdedup oracle, which clusters with
    * the exact same arithmetic before its within-cluster cosine pass. */
  private val KmeansBody: String =
    """WITH q AS (
      |  SELECT vec_id AS id,
      |         list_transform(embedding::DOUBLE[],
      |           x -> cast(round(x * 1000) AS BIGINT)) AS v
      |  FROM embeddings
      |), c0 AS (
      |  SELECT row_number() OVER (ORDER BY id) - 1 AS cid, v AS m
      |  FROM q ORDER BY id LIMIT 8
      |)""".stripMargin +
      kmeansRound(1) + kmeansRound(2) +
      """, af AS (
        |  SELECT id, cid, d2,
        |         row_number() OVER (PARTITION BY id ORDER BY d2, cid) AS rn
        |  FROM (SELECT q.id, c.cid,
        |          cast(list_sum(list_transform(range(1, len(q.v) + 1),
        |            i -> (q.v[i] - c.m[i]) * (q.v[i] - c.m[i]))) AS BIGINT) AS d2
        |        FROM q CROSS JOIN c2 c)
        |)""".stripMargin

  private val KmeansSql: String =
    KmeansBody +
      """
        |SELECT id AS vec_id, cast(cid AS BIGINT) AS cluster, d2
        |FROM af WHERE rn = 1""".stripMargin

  // per-cluster farthest-point rank over the same assignment chain;
  // (d2 DESC, id) is a total order so row_number replays the engine's
  // groupRunningSum rank exactly
  private val EmbOutliersSql: String =
    KmeansBody +
      """, asg AS (
        |  SELECT id, cid, d2 FROM af WHERE rn = 1
        |), rk AS (
        |  SELECT id, cid, d2,
        |         row_number() OVER (PARTITION BY cid ORDER BY d2 DESC, id)
        |           AS c_rank
        |  FROM asg
        |)
        |SELECT id AS vec_id, cast(cid AS BIGINT) AS cluster, d2,
        |       cast(c_rank AS BIGINT) AS c_rank, c_rank <= 5 AS is_outlier
        |FROM rk""".stripMargin

  /** One per-subspace Lloyd's round of the PQ oracles — the kmeansRound
    * arithmetic with an extra `m` (subspace) key: assign each subDim-dim
    * sub-vector (BIGINT squared-L2 argmin, ties to the lowest code),
    * then rounded-integer-mean codebook update with empty codes keeping
    * the previous centroid — exactly what Ann.pqTrain's per-subspace
    * lloydCentroids calls perform. */
  private def pqRound(t: Int, subDim: Int): String = {
    val prev = if (t == 1) "pc0" else s"pc${t - 1}"
    s""", pa$t AS (
       |  SELECT id, m, sv, cid, d2,
       |         row_number() OVER (PARTITION BY id, m ORDER BY d2, cid) AS rn
       |  FROM (SELECT s.id, s.m, s.sv, c.cid,
       |          cast(list_sum(list_transform(range(1, ${subDim + 1}),
       |            i -> (s.sv[i] - c.cm[i]) * (s.sv[i] - c.cm[i]))) AS BIGINT) AS d2
       |        FROM psub s JOIN $prev c ON s.m = c.m)
       |), pu$t AS (
       |  SELECT m, cid, list(mi ORDER BY dim) AS cm FROM (
       |    SELECT m, cid, dim, cast(round(sum(val) / count(*)) AS BIGINT) AS mi
       |    FROM (SELECT m, cid, unnest(sv) AS val, generate_subscripts(sv, 1) AS dim
       |          FROM pa$t WHERE rn = 1)
       |    GROUP BY m, cid, dim) GROUP BY m, cid
       |), pc$t AS (
       |  SELECT p.m, p.cid, coalesce(u.cm, p.cm) AS cm
       |  FROM $prev p LEFT JOIN pu$t u ON u.m = p.m AND u.cid = p.cid
       |)""".stripMargin
  }

  /** Shared PQ oracle pipeline up to the integer ADC score table `padc`:
    * quantize, slice numSub x subDim subspaces, seed per-subspace books
    * from the ksub lowest-id corpus sub-slices, 2 Lloyd's rounds,
    * encode, and score against the min-id query's lookup table. Every
    * step is BIGINT, mirroring pqTrain/pqEncode/pqTopK. */
  private def pqAdcSql(numSub: Int, subDim: Int, ksub: Int): String =
    s"""WITH qz AS (
       |  SELECT vec_id AS id,
       |         list_transform(embedding::DOUBLE[],
       |           x -> cast(round(x * 1000) AS BIGINT)) AS v
       |  FROM embeddings
       |), corp AS (
       |  SELECT id, v FROM qz WHERE id <> (SELECT min(id) FROM qz)
       |), psub AS (
       |  SELECT c.id, mm.m,
       |         list_transform(range(mm.m * $subDim + 1, mm.m * $subDim + ${subDim + 1}),
       |           i -> c.v[i]) AS sv
       |  FROM corp c CROSS JOIN (SELECT unnest(range($numSub)) AS m) mm
       |), pc0 AS (
       |  SELECT m, row_number() OVER (PARTITION BY m ORDER BY id) - 1 AS cid,
       |         sv AS cm
       |  FROM psub WHERE id IN (SELECT id FROM corp ORDER BY id LIMIT $ksub)
       |)""".stripMargin +
      pqRound(1, subDim) + pqRound(2, subDim) +
      s""", penc AS (
         |  SELECT id, m, cid FROM (
         |    SELECT s.id, s.m, c.cid,
         |           row_number() OVER (PARTITION BY s.id, s.m
         |             ORDER BY cast(list_sum(list_transform(range(1, ${subDim + 1}),
         |               i -> (s.sv[i] - c.cm[i]) * (s.sv[i] - c.cm[i]))) AS BIGINT),
         |               c.cid) AS rn
         |    FROM psub s JOIN pc2 c ON s.m = c.m)
         |  WHERE rn = 1
         |), qsub AS (
         |  SELECT mm.m,
         |         list_transform(range(mm.m * $subDim + 1, mm.m * $subDim + ${subDim + 1}),
         |           i -> q.v[i]) AS sv
         |  FROM (SELECT v FROM qz WHERE id = (SELECT min(id) FROM qz)) q
         |  CROSS JOIN (SELECT unnest(range($numSub)) AS m) mm
         |), plut AS (
         |  SELECT c.m, c.cid,
         |         cast(list_sum(list_transform(range(1, ${subDim + 1}),
         |           i -> (q.sv[i] - c.cm[i]) * (q.sv[i] - c.cm[i]))) AS BIGINT) AS d2
         |  FROM pc2 c JOIN qsub q ON c.m = q.m
         |), padc AS (
         |  SELECT e.id, cast(sum(l.d2) AS BIGINT) AS adc_d2
         |  FROM penc e JOIN plut l ON e.m = l.m AND e.cid = l.cid
         |  GROUP BY e.id
         |)""".stripMargin

  /** q_pq_topk: 4 x 16-dim subspaces, 8-code books — pure ADC ranking. */
  private val PqSql: String =
    pqAdcSql(4, 16, 8) +
      "\nSELECT id, adc_d2 FROM padc ORDER BY adc_d2, id LIMIT 20"

  /** q_pq_rerank: 16 x 4-dim subspaces, 16-code books (16 bytes/vector),
    * ADC top-200 shortlist, then EXACT integer-L2 rerank of the
    * shortlist against the full query vector — the production IVF-PQ
    * read path (Ann.pqTopKRerank). */
  private val PqRerankSql: String =
    pqAdcSql(16, 4, 16) +
      """, pshort AS (
        |  SELECT id FROM padc ORDER BY adc_d2, id LIMIT 200
        |), prr AS (
        |  SELECT c.id,
        |         cast(list_sum(list_transform(range(1, 65),
        |           i -> (c.v[i] - q.v[i]) * (c.v[i] - q.v[i]))) AS BIGINT) AS d2
        |  FROM corp c JOIN pshort USING (id)
        |  CROSS JOIN (SELECT v FROM qz WHERE id = (SELECT min(id) FROM qz)) q
        |)
        |SELECT id, d2 FROM prr ORDER BY d2, id LIMIT 20""".stripMargin

  /** Shared CTE prefix of the 3-D exact-EMD oracles: cube-corner
    * integer count histograms (the [[Fixtures.tripleCounts]]
    * derivation) + per-id 3-D means for the rubner stage. Exact EMD on
    * this corpus is a CLOSED FORM — max over [[graft.core.CubeKR]]'s
    * 709 fixed KR-dual vertices of an integer dot product — so the LP
    * rows carry full DuckDB oracles: stage 1 prunes by the rubner
    * mean-distance lower bound, stage 2 by the 24 hardest-pruning
    * vertices inline (121k -> 2.5k candidates at sf0.01), stage 3
    * joins survivors against the full vertex VALUES table. Every stage
    * bound is admissible (each vertex is a lower bound; slack 1e-9
    * absorbs FP jitter), so only cost — never membership — depends on
    * the cascade; membership and the reported value come from the
    * identical fixed-shape FP expression the Spark side evaluates
    * (SparkEntry.cubeCanonicalDist). */
  private lazy val Cube3dBody: String = {
    val counts = (0 until 8).map(k =>
      s"CAST(count(*) FILTER (bin = $k) AS BIGINT) AS c$k").mkString(",\n    ")
    s"""WITH bsrc AS (
       |  SELECT l_partkey AS id,
       |    (CASE WHEN l_quantity > 25.0 THEN 4 ELSE 0 END +
       |     CASE WHEN l_extendedprice > 30000.0 THEN 2 ELSE 0 END +
       |     CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS bin
       |  FROM lineitem
       |), h AS (
       |  SELECT id,
       |    $counts,
       |    CAST(count(*) AS BIGINT) AS t
       |  FROM bsrc GROUP BY id
       |), hm AS (
       |  SELECT id, c0,c1,c2,c3,c4,c5,c6,c7, t,
       |    CAST(c4+c5+c6+c7 AS DOUBLE)/t AS mx,
       |    CAST(c2+c3+c6+c7 AS DOUBLE)/t AS my,
       |    CAST(c1+c3+c5+c7 AS DOUBLE)/t AS mz
       |  FROM h
       |)""".stripMargin
  }

  private def cube3dNs: String =
    (0 until 8).map(i => s"a.c$i*b.t - b.c$i*a.t AS n$i").mkString(",\n    ")

  private def cube3dVtx: String = {
    val cols = ((0 until 8).map(i => s"a$i") ++ (0 until 8).map(i => s"b$i") ++
      (0 until 8).map(i => s"g$i")).mkString(", ")
    s", vtx($cols) AS (VALUES\n" + graft.core.CubeKR.sqlVertexValues + "\n)"
  }

  /** stage-3 exact evaluation + the final projection (caller appends
    * the membership filter / ordering). */
  private def cube3dExCte: String = {
    def dot(p: String) = (0 until 8).map(i => s"v.$p$i*p.n$i").mkString(" + ")
    s""", ex AS (
       |  SELECT p.rid, p.sid, p.tt,
       |    max(abs(CAST(${dot("a")} AS DOUBLE)
       |            + CAST(${dot("b")} AS DOUBLE)*sqrt(2.0)
       |            + CAST(${dot("g")} AS DOUBLE)*sqrt(3.0))) AS mxv
       |  FROM surv p CROSS JOIN vtx v
       |  GROUP BY p.rid, p.sid, p.tt
       |)""".stripMargin
  }

  /** q_emd3d_pairs / q_treeexact3d_pairs: all pairs with exact
    * cube-EMD <= Theta3d (both engines compute the same answer, so
    * both rows share this oracle). */
  private lazy val Cube3dPairsSql: String =
    Cube3dBody +
      s""", cand AS (
         |  SELECT a.id AS rid, b.id AS sid,
         |    $cube3dNs,
         |    a.t*b.t AS tt
         |  FROM hm a JOIN hm b ON a.id < b.id
         |   AND sqrt((a.mx-b.mx)*(a.mx-b.mx) + (a.my-b.my)*(a.my-b.my)
         |            + (a.mz-b.mz)*(a.mz-b.mz)) <= $Theta3d + 1e-9
         |), surv AS (
         |  SELECT * FROM cand
         |  WHERE ${graft.core.CubeKR.sqlPrefilterMax}
         |    <= ($Theta3d + 1e-9) * tt
         |)""".stripMargin + cube3dVtx + cube3dExCte +
      s"""
         |SELECT rid, sid, round(mxv / tt, 6) AS dist
         |FROM ex WHERE mxv / tt <= $Theta3d""".stripMargin

  /** q_emd3d_topk: the top-20 budget comes from the 20th smallest
    * sqrt(3)*TV upper bound over ALL pairs (any >=20-pair subset's
    * 20th-smallest UB bounds the global 20th-smallest exact dist from
    * above; the full set needs no size precondition), then the same
    * admissible cascade at the budget radius, exact evaluation, and
    * the engines' unified (round(dist,6), rid, sid) order. */
  private lazy val Cube3dTopKSql: String = {
    val absn = (0 until 8).map(i => s"abs(n$i)").mkString(" + ")
    Cube3dBody +
      s""", allp AS (
         |  SELECT $cube3dNs,
         |    a.t*b.t AS tt
         |  FROM hm a JOIN hm b ON a.id < b.id
         |), bud AS (
         |  SELECT sqrt(3.0) * ($absn) / (2.0 * tt) AS ub
         |  FROM allp ORDER BY ub LIMIT 1 OFFSET ${TopK - 1}
         |), cand AS (
         |  SELECT a.id AS rid, b.id AS sid,
         |    $cube3dNs,
         |    a.t*b.t AS tt
         |  FROM hm a, hm b
         |  WHERE a.id < b.id
         |   AND sqrt((a.mx-b.mx)*(a.mx-b.mx) + (a.my-b.my)*(a.my-b.my)
         |            + (a.mz-b.mz)*(a.mz-b.mz))
         |       <= coalesce((SELECT ub FROM bud), 1e9) + 1e-9
         |), surv AS (
         |  SELECT * FROM cand
         |  WHERE ${graft.core.CubeKR.sqlPrefilterMax}
         |    <= (coalesce((SELECT ub FROM bud), 1e9) + 1e-9) * tt
         |)""".stripMargin + cube3dVtx + cube3dExCte +
      s"""
         |SELECT rid, sid, round(mxv / tt, 6) AS dist
         |FROM ex ORDER BY round(mxv / tt, 6), rid, sid LIMIT $TopK""".stripMargin
  }

  /** Unrolled-merge replay of the BPE trainer: each round is one block
    * of MATERIALIZED CTEs — adjacent-pair counts over the exploded
    * symbol rows (window lead, overlaps counted like the trainer's
    * flatMap), the deterministic argmax (count DESC, then (left,
    * right) ASC — ASCII corpus, so Scala UTF-16 order == DuckDB byte
    * order), and the greedy non-overlapping merge application: within
    * a maximal run of consecutive match positions only even offsets
    * merge (runs longer than 1 exist only for a == b, where this IS
    * left-to-right greediness), and the consumed right-hand rows drop
    * via a lag(take) flag. MATERIALIZED is load-bearing: each round
    * references its predecessor three times, and inlining would expand
    * the 30-round chain exponentially. */
  private def bpeRoundCte(r: Int): String =
    s""", pc$r AS MATERIALIZED (
       |  SELECT sym AS a, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS b, cnt
       |  FROM v$r
       |), tot$r AS MATERIALIZED (
       |  SELECT a, b, CAST(sum(cnt) AS BIGINT) AS c FROM pc$r
       |  WHERE b IS NOT NULL GROUP BY a, b
       |), best$r AS MATERIALIZED (
       |  SELECT a, b FROM tot$r WHERE c >= 2 ORDER BY c DESC, a, b LIMIT 1
       |), mk$r AS MATERIALIZED (
       |  SELECT v.word, v.cnt, v.pos, v.sym,
       |    (v.sym = bb.a AND lead(v.sym) OVER (PARTITION BY v.word ORDER BY v.pos) = bb.b)
       |      AS m
       |  FROM v$r v LEFT JOIN best$r bb ON TRUE
       |), rp$r AS MATERIALIZED (
       |  SELECT word, cnt, pos, sym, m,
       |    CASE WHEN m THEN
       |      (row_number() OVER (PARTITION BY word, grp ORDER BY pos) - 1) % 2 = 0
       |    ELSE FALSE END AS take
       |  FROM (
       |    SELECT *,
       |      CASE WHEN m THEN pos - row_number() OVER (PARTITION BY word, m ORDER BY pos)
       |           ELSE NULL END AS grp
       |    FROM mk$r
       |  )
       |), v${r + 1} AS MATERIALIZED (
       |  SELECT word, cnt,
       |    row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
       |    CASE WHEN take THEN sym || (SELECT b FROM best$r) ELSE sym END AS sym
       |  FROM (
       |    SELECT *, coalesce(lag(take) OVER (PARTITION BY word ORDER BY pos),
       |      FALSE) AS consumed
       |    FROM rp$r
       |  ) WHERE NOT consumed
       |)""".stripMargin

  private def trainSelect(rounds: Int): String = {
    // internal aliases are l/r — NEVER bare left/right/full/outer in a
    // CTE body (DuckDB parses `AS left` but a later bare reference dies
    // with a misdirected syntax error; CLAUDE.md hard-won rule). The
    // quoted "left"/"right" rename happens only in the final projection,
    // where the Spark column-name contract forces those names.
    val sel = (0 until rounds).map(r =>
      s"SELECT $r + 1 AS rank, a AS l, b AS r FROM best$r")
      .mkString(" UNION ALL ")
    s"""
       |SELECT CAST(rank AS INTEGER) AS rank, l AS "left", r AS "right" FROM (
       |  $sel
       |) ORDER BY rank""".stripMargin
  }

  /** q_bpe_train: 30 unrolled merge rounds over the word-frequency
    * vocabulary (chars + the `</w>` end-of-word marker). Early stop
    * replicates structurally: an empty best leaves the state CTE
    * unchanged, so all later rounds stay empty and the UNION simply
    * yields fewer rows. */
  private lazy val BpeTrainSql: String =
    """WITH wc AS MATERIALIZED (
      |  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
      |    SELECT unnest(string_split(text, ' ')) AS word FROM documents
      |  ) GROUP BY word
      |), v0 AS MATERIALIZED (
      |  SELECT word, cnt, pos, sym FROM (
      |    SELECT word, cnt, generate_subscripts(chars, 1) AS pos, unnest(chars) AS sym
      |    FROM (SELECT word, cnt, list_append(string_split(word, ''), '</w>') AS chars FROM wc)
      |  )
      |)""".stripMargin +
      (0 until 30).map(bpeRoundCte).mkString + trainSelect(30)

  /** One WordPiece round: like [[bpeRoundCte]] plus per-round symbol
    * counts, argmax by likelihood gain c/(u_a*u_b) made ENGINE-EXACT
    * via a HUGEINT quotient key c*10^30 // (u_a*u_b): two distinct
    * fractions with denominators <= D differ by >= 1/D^2, so the key
    * discriminates exactly whenever corpus token count <= 1e7 (D <=
    * 1e14, 1/D^2 = 1e-28 >= 100 key ulps; sf0.1 is ~2.2M tokens, 4.5x
    * inside the bound, and c*10^30 <= 1e37 < HUGEINT max). Equal
    * fractions get equal keys and fall to the (left, right) ASC
    * tie-break — the trainer's BigInt cross-multiplication order
    * exactly. The merged symbol drops the right side's `##`. */
  private def wpRoundCte(r: Int): String =
    s""", uni$r AS MATERIALIZED (
       |  SELECT sym, CAST(sum(cnt) AS BIGINT) AS u FROM v$r GROUP BY sym
       |), pc$r AS MATERIALIZED (
       |  SELECT sym AS a, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS b, cnt
       |  FROM v$r
       |), tot$r AS MATERIALIZED (
       |  SELECT a, b, CAST(sum(cnt) AS BIGINT) AS c FROM pc$r
       |  WHERE b IS NOT NULL GROUP BY a, b
       |), best$r AS MATERIALIZED (
       |  SELECT t.a, t.b,
       |    t.a || CASE WHEN starts_with(t.b, '##') THEN substr(t.b, 3) ELSE t.b END
       |      AS joined
       |  FROM tot$r t
       |  JOIN uni$r ua ON ua.sym = t.a
       |  JOIN uni$r ub ON ub.sym = t.b
       |  WHERE t.c >= 2
       |  ORDER BY (CAST(t.c AS HUGEINT) * CAST('1000000000000000000000000000000' AS HUGEINT))
       |           // (CAST(ua.u AS HUGEINT) * CAST(ub.u AS HUGEINT)) DESC,
       |           t.a, t.b
       |  LIMIT 1
       |), mk$r AS MATERIALIZED (
       |  SELECT v.word, v.cnt, v.pos, v.sym,
       |    (v.sym = bb.a AND lead(v.sym) OVER (PARTITION BY v.word ORDER BY v.pos) = bb.b)
       |      AS m
       |  FROM v$r v LEFT JOIN best$r bb ON TRUE
       |), rp$r AS MATERIALIZED (
       |  SELECT word, cnt, pos, sym, m,
       |    CASE WHEN m THEN
       |      (row_number() OVER (PARTITION BY word, grp ORDER BY pos) - 1) % 2 = 0
       |    ELSE FALSE END AS take
       |  FROM (
       |    SELECT *,
       |      CASE WHEN m THEN pos - row_number() OVER (PARTITION BY word, m ORDER BY pos)
       |           ELSE NULL END AS grp
       |    FROM mk$r
       |  )
       |), v${r + 1} AS MATERIALIZED (
       |  SELECT word, cnt,
       |    row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
       |    CASE WHEN take THEN (SELECT joined FROM best$r) ELSE sym END AS sym
       |  FROM (
       |    SELECT *, coalesce(lag(take) OVER (PARTITION BY word ORDER BY pos),
       |      FALSE) AS consumed
       |    FROM rp$r
       |  ) WHERE NOT consumed
       |)""".stripMargin

  /** q_wordpiece_train: 30 unrolled rounds, `##` continuation symbols. */
  private lazy val WordpieceTrainSql: String =
    """WITH wc AS MATERIALIZED (
      |  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
      |    SELECT unnest(string_split(text, ' ')) AS word FROM documents
      |  ) GROUP BY word
      |), v0 AS MATERIALIZED (
      |  SELECT word, cnt, pos,
      |    CASE WHEN pos = 1 THEN sym ELSE '##' || sym END AS sym
      |  FROM (
      |    SELECT word, cnt, generate_subscripts(chars, 1) AS pos, unnest(chars) AS sym
      |    FROM (SELECT word, cnt, string_split(word, '') AS chars FROM wc)
      |  )
      |)""".stripMargin +
      (0 until 30).map(wpRoundCte).mkString + trainSelect(30)

  /** q_ivfpq_topk: the residual IVF-PQ pipeline end-to-end — 4-cell
    * coarse quantizer (the kmeansRound CTEs over the corpus `q`),
    * final assignment + integer residuals, PQ books trained on the
    * residual sub-slices (the pqRound CTEs over `psub`), residual
    * encode, 2-cell probe under the (d2, cid) order, PER-CELL query
    * residual lookup tables, ADC over probed members only. Every step
    * is BIGINT — the oracle replays the full two-level path. */
  private val IvfPqBody: String = {
    val numSub = 4
    val subDim = 16
    val ksub = 8
    s"""WITH qz AS (
       |  SELECT vec_id AS id,
       |         list_transform(embedding::DOUBLE[],
       |           x -> cast(round(x * 1000) AS BIGINT)) AS v
       |  FROM embeddings
       |), qv AS (
       |  SELECT v FROM qz WHERE id = (SELECT min(id) FROM qz)
       |), q AS (
       |  SELECT id, v FROM qz WHERE id <> (SELECT min(id) FROM qz)
       |), c0 AS (
       |  SELECT row_number() OVER (ORDER BY id) - 1 AS cid, v AS m
       |  FROM q ORDER BY id LIMIT 4
       |)""".stripMargin +
      kmeansRound(1) + kmeansRound(2) +
      s""", av AS (
         |  SELECT id, v, cid FROM (
         |    SELECT q.id, q.v, c.cid,
         |           row_number() OVER (PARTITION BY q.id ORDER BY
         |             cast(list_sum(list_transform(range(1, len(q.v) + 1),
         |               i -> (q.v[i] - c.m[i]) * (q.v[i] - c.m[i]))) AS BIGINT),
         |             c.cid) AS rn
         |    FROM q CROSS JOIN c2 c)
         |  WHERE rn = 1
         |), resid AS (
         |  SELECT a.id, a.cid,
         |         list_transform(range(1, len(a.v) + 1), i -> a.v[i] - c.m[i]) AS rv
         |  FROM av a JOIN c2 c USING (cid)
         |), psub AS (
         |  SELECT r.id, mm.m,
         |         list_transform(range(mm.m * $subDim + 1, mm.m * $subDim + ${subDim + 1}),
         |           i -> r.rv[i]) AS sv
         |  FROM resid r CROSS JOIN (SELECT unnest(range($numSub)) AS m) mm
         |), pc0 AS (
         |  SELECT m, row_number() OVER (PARTITION BY m ORDER BY id) - 1 AS cid,
         |         sv AS cm
         |  FROM psub WHERE id IN (SELECT id FROM q ORDER BY id LIMIT $ksub)
         |)""".stripMargin +
      pqRound(1, subDim) + pqRound(2, subDim) +
      s""", penc AS (
         |  SELECT id, m, cid FROM (
         |    SELECT s.id, s.m, c.cid,
         |           row_number() OVER (PARTITION BY s.id, s.m
         |             ORDER BY cast(list_sum(list_transform(range(1, ${subDim + 1}),
         |               i -> (s.sv[i] - c.cm[i]) * (s.sv[i] - c.cm[i]))) AS BIGINT),
         |               c.cid) AS rn
         |    FROM psub s JOIN pc2 c ON s.m = c.m)
         |  WHERE rn = 1
         |), pd AS (
         |  SELECT c.cid,
         |         cast(list_sum(list_transform(range(1, 65),
         |           i -> (qv.v[i] - c.m[i]) * (qv.v[i] - c.m[i]))) AS BIGINT) AS d2
         |  FROM c2 c CROSS JOIN qv
         |), probed AS (
         |  SELECT cid FROM pd ORDER BY d2, cid LIMIT 2
         |), qres AS (
         |  SELECT c.cid AS gcid,
         |         list_transform(range(1, 65), i -> qv.v[i] - c.m[i]) AS rv
         |  FROM c2 c JOIN probed USING (cid) CROSS JOIN qv
         |), qrsub AS (
         |  SELECT gcid, mm.m,
         |         list_transform(range(mm.m * $subDim + 1, mm.m * $subDim + ${subDim + 1}),
         |           i -> rv[i]) AS sv
         |  FROM qres CROSS JOIN (SELECT unnest(range($numSub)) AS m) mm
         |), plut AS (
         |  SELECT s.gcid, c.m, c.cid,
         |         cast(list_sum(list_transform(range(1, ${subDim + 1}),
         |           i -> (s.sv[i] - c.cm[i]) * (s.sv[i] - c.cm[i]))) AS BIGINT) AS d2
         |  FROM qrsub s JOIN pc2 c ON s.m = c.m
         |), padc AS (
         |  SELECT e.id, cast(sum(l.d2) AS BIGINT) AS adc_d2
         |  FROM penc e
         |  JOIN av a ON a.id = e.id
         |  JOIN probed p ON p.cid = a.cid
         |  JOIN plut l ON l.gcid = a.cid AND l.m = e.m AND l.cid = e.cid
         |  GROUP BY e.id
         |)""".stripMargin
  }

  private val IvfPqSql: String =
    IvfPqBody + "\nSELECT id, adc_d2 FROM padc ORDER BY adc_d2, id LIMIT 20"

  /** q_ivfpq_rerank: the ADC shortlist (top-100 probed members) fetched
    * and ranked by EXACT integer squared-L2 — the PqRerankSql tail over
    * the two-level body. */
  private val IvfPqRerankSql: String =
    IvfPqBody +
      """, pshort AS (
        |  SELECT id FROM padc ORDER BY adc_d2, id LIMIT 100
        |), prr AS (
        |  SELECT c.id,
        |         cast(list_sum(list_transform(range(1, 65),
        |           i -> (c.v[i] - qv.v[i]) * (c.v[i] - qv.v[i]))) AS BIGINT) AS d2
        |  FROM q c JOIN pshort USING (id) CROSS JOIN qv
        |)
        |SELECT id, d2 FROM prr ORDER BY d2, id LIMIT 20""".stripMargin

  /** q_ivfpq_recall: the rerank pipeline's top-20 intersected with the
    * exact integer-L2 top-20 over the whole corpus — one BIGINT count
    * under the shared (d2, id) order. */
  private val IvfPqRecallSql: String =
    IvfPqBody +
      """, pshort AS (
        |  SELECT id FROM padc ORDER BY adc_d2, id LIMIT 100
        |), prr AS (
        |  SELECT c.id,
        |         cast(list_sum(list_transform(range(1, 65),
        |           i -> (c.v[i] - qv.v[i]) * (c.v[i] - qv.v[i]))) AS BIGINT) AS d2
        |  FROM q c JOIN pshort USING (id) CROSS JOIN qv
        |), approx AS (
        |  SELECT id FROM prr ORDER BY d2, id LIMIT 20
        |), exact AS (
        |  SELECT c.id
        |  FROM q c CROSS JOIN qv
        |  ORDER BY cast(list_sum(list_transform(range(1, 65),
        |    i -> (c.v[i] - qv.v[i]) * (c.v[i] - qv.v[i]))) AS BIGINT), c.id
        |  LIMIT 20
        |)
        |SELECT cast(count(*) AS BIGINT) AS n_common
        |FROM approx JOIN exact USING (id)""".stripMargin

  /** q_stream_ann: the multi-query residual IVF-PQ read path over the
    * FULL-corpus index — the IvfPqBody pipeline (same kmeansRound /
    * pqRound CTE generators; corpus CTE `q` is ALL embeddings here, and
    * the single min-id query CTEs become per-qid versions keyed by the
    * query set `qs` = every 20th vector). Stateless-per-batch streaming
    * equals the one-shot batch run, so this one BIGINT replay oracles
    * the streamed result. */
  private val StreamAnnSql: String = {
    val numSub = 4
    val subDim = 16
    val ksub = 8
    s"""WITH qz AS (
       |  SELECT vec_id AS id,
       |         list_transform(embedding::DOUBLE[],
       |           x -> cast(round(x * 1000) AS BIGINT)) AS v
       |  FROM embeddings
       |), q AS (
       |  SELECT id, v FROM qz
       |), qs AS (
       |  SELECT id AS qid, v FROM qz WHERE id % 20 = 0
       |), c0 AS (
       |  SELECT row_number() OVER (ORDER BY id) - 1 AS cid, v AS m
       |  FROM q ORDER BY id LIMIT 4
       |)""".stripMargin +
      kmeansRound(1) + kmeansRound(2) +
      s""", av AS (
         |  SELECT id, v, cid FROM (
         |    SELECT q.id, q.v, c.cid,
         |           row_number() OVER (PARTITION BY q.id ORDER BY
         |             cast(list_sum(list_transform(range(1, len(q.v) + 1),
         |               i -> (q.v[i] - c.m[i]) * (q.v[i] - c.m[i]))) AS BIGINT),
         |             c.cid) AS rn
         |    FROM q CROSS JOIN c2 c)
         |  WHERE rn = 1
         |), resid AS (
         |  SELECT a.id, a.cid,
         |         list_transform(range(1, len(a.v) + 1), i -> a.v[i] - c.m[i]) AS rv
         |  FROM av a JOIN c2 c USING (cid)
         |), psub AS (
         |  SELECT r.id, mm.m,
         |         list_transform(range(mm.m * $subDim + 1, mm.m * $subDim + ${subDim + 1}),
         |           i -> r.rv[i]) AS sv
         |  FROM resid r CROSS JOIN (SELECT unnest(range($numSub)) AS m) mm
         |), pc0 AS (
         |  SELECT m, row_number() OVER (PARTITION BY m ORDER BY id) - 1 AS cid,
         |         sv AS cm
         |  FROM psub WHERE id IN (SELECT id FROM q ORDER BY id LIMIT $ksub)
         |)""".stripMargin +
      pqRound(1, subDim) + pqRound(2, subDim) +
      s""", penc AS (
         |  SELECT id, m, cid FROM (
         |    SELECT s.id, s.m, c.cid,
         |           row_number() OVER (PARTITION BY s.id, s.m
         |             ORDER BY cast(list_sum(list_transform(range(1, ${subDim + 1}),
         |               i -> (s.sv[i] - c.cm[i]) * (s.sv[i] - c.cm[i]))) AS BIGINT),
         |               c.cid) AS rn
         |    FROM psub s JOIN pc2 c ON s.m = c.m)
         |  WHERE rn = 1
         |), pd AS (
         |  SELECT s.qid, c.cid,
         |         cast(list_sum(list_transform(range(1, 65),
         |           i -> (s.v[i] - c.m[i]) * (s.v[i] - c.m[i]))) AS BIGINT) AS d2
         |  FROM qs s CROSS JOIN c2 c
         |), probed AS (
         |  SELECT qid, cid FROM (
         |    SELECT qid, cid, row_number() OVER (PARTITION BY qid
         |      ORDER BY d2, cid) AS rn FROM pd)
         |  WHERE rn <= 2
         |), qres AS (
         |  SELECT p.qid, c.cid AS gcid,
         |         list_transform(range(1, 65), i -> s.v[i] - c.m[i]) AS rv
         |  FROM probed p JOIN qs s USING (qid) JOIN c2 c ON c.cid = p.cid
         |), qrsub AS (
         |  SELECT qid, gcid, mm.m,
         |         list_transform(range(mm.m * $subDim + 1, mm.m * $subDim + ${subDim + 1}),
         |           i -> rv[i]) AS sv
         |  FROM qres CROSS JOIN (SELECT unnest(range($numSub)) AS m) mm
         |), plut AS (
         |  SELECT s.qid, s.gcid, c.m, c.cid,
         |         cast(list_sum(list_transform(range(1, ${subDim + 1}),
         |           i -> (s.sv[i] - c.cm[i]) * (s.sv[i] - c.cm[i]))) AS BIGINT) AS d2
         |  FROM qrsub s JOIN pc2 c ON s.m = c.m
         |), padc AS (
         |  SELECT p.qid, e.id, cast(sum(l.d2) AS BIGINT) AS adc_d2
         |  FROM penc e
         |  JOIN av a ON a.id = e.id
         |  JOIN probed p ON p.cid = a.cid
         |  JOIN plut l ON l.qid = p.qid AND l.gcid = a.cid
         |             AND l.m = e.m AND l.cid = e.cid
         |  GROUP BY p.qid, e.id
         |)
         |SELECT qid, id, adc_d2 FROM (
         |  SELECT qid, id, adc_d2, row_number() OVER (PARTITION BY qid
         |    ORDER BY adc_d2, id) AS rn FROM padc)
         |WHERE rn <= 5""".stripMargin
  }

  /** Red-channel 8-bin PPM histogram replay: pixel i's red byte is text
    * byte (3*i % len) (withImagePayload cycles UTF-8 bytes through the
    * 16x16 RGB plane). Shared by q_image_hist and q_binary_scan (the
    * same payloads round-tripped through files). */
  private val ImageHistSql: String =
    """WITH px AS (
      |  SELECT d.doc_id,
      |         CASE WHEN length(d.text) = 0 THEN 0
      |              ELSE ascii(substr(d.text,
      |                ((3 * cast(r.range AS INTEGER)) % length(d.text)) + 1, 1))
      |         END AS b
      |  FROM documents d CROSS JOIN range(256) r
      |), counts AS (
      |  SELECT doc_id, b // 32 AS bin, cast(count(*) AS DOUBLE) AS c
      |  FROM px GROUP BY 1, 2
      |), dense AS (
      |  SELECT d.doc_id, bb.bin, coalesce(c.c, 0.0) AS c
      |  FROM (SELECT DISTINCT doc_id FROM documents) d
      |  CROSS JOIN (SELECT cast(range AS BIGINT) AS bin FROM range(8)) bb
      |  LEFT JOIN counts c ON c.doc_id = d.doc_id AND c.bin = bb.bin
      |)
      |SELECT doc_id, bin, round(c / 256.0, 6) AS w FROM dense""".stripMargin

  /** WARC parse replay shared by the batch and streaming legs. */
  private lazy val WarcIngestSql: String =
      """WITH RECURSIVE recs AS (
        |  SELECT doc_id // 8 AS file_id, doc_id,
        |    'WARC/1.0' || chr(13)||chr(10) ||
        |    'WARC-Type: response' || chr(13)||chr(10) ||
        |    'WARC-Target-URI: http://h' || CAST(doc_id % 13 AS VARCHAR) ||
        |      '.example/p/' || CAST(doc_id AS VARCHAR) || chr(13)||chr(10) ||
        |    'Content-Length: ' || CAST(length(payload) -
        |      CASE WHEN doc_id % 31 = 0 THEN 3 ELSE 0 END AS VARCHAR) ||
        |      chr(13)||chr(10) || chr(13)||chr(10) ||
        |    payload || chr(13)||chr(10) || chr(13)||chr(10) AS rec
        |  FROM (
        |    SELECT doc_id,
        |      CASE WHEN doc_id % 17 = 0
        |           THEN 'WARC/1.0' || chr(13)||chr(10) || text
        |           ELSE text END AS payload
        |    FROM documents)
        |), files AS (
        |  SELECT file_id,
        |    'WARC/1.0' || chr(13)||chr(10) ||
        |    'WARC-Type: warcinfo' || chr(13)||chr(10) ||
        |    'Content-Length: 15' || chr(13)||chr(10) || chr(13)||chr(10) ||
        |    'software: graft' || chr(13)||chr(10) || chr(13)||chr(10) ||
        |    string_agg(rec, '' ORDER BY doc_id) AS content
        |  FROM recs GROUP BY file_id
        |), st(file_id, content, off, rec_no, warc_type, target_uri,
        |      content_length, payload_md5, payload_chars, stop) AS (
        |  SELECT file_id, content, CAST(1 AS BIGINT), CAST(-1 AS BIGINT),
        |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |    CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        |    CAST(NULL AS BIGINT), false
        |  FROM files
        |  UNION ALL
        |  SELECT file_id, content,
        |    CASE WHEN ok THEN pstart + clen + 4 ELSE off END,
        |    rec_no + 1,
        |    CASE WHEN ok THEN wtype ELSE '_corrupt' END,
        |    CASE WHEN ok AND wuri <> '' THEN wuri ELSE NULL END,
        |    CASE WHEN ok THEN clen ELSE NULL END,
        |    CASE WHEN ok THEN md5(substr(content, CAST(pstart AS INTEGER),
        |      CAST(clen AS INTEGER))) ELSE NULL END,
        |    CASE WHEN ok THEN clen ELSE NULL END,
        |    NOT ok
        |  FROM (
        |    SELECT file_id, content, off, rec_no, pstart, clen,
        |      regexp_extract(hdrs, '(^|\r\n)WARC-Type: ([^\r\n]*)', 2) AS wtype,
        |      regexp_extract(hdrs, '(^|\r\n)WARC-Target-URI: ([^\r\n]*)', 2) AS wuri,
        |      (substr(content, CAST(off AS INTEGER), 10)
        |         = 'WARC/1.0' || chr(13)||chr(10)
        |       AND hdr_rel > 0 AND clen IS NOT NULL AND clen >= 0
        |       AND substr(content, CAST(pstart + clen AS INTEGER), 4)
        |             = chr(13)||chr(10)||chr(13)||chr(10)) AS ok
        |    FROM (
        |      SELECT file_id, content, off, rec_no, hdr_rel, hdrs,
        |        off + hdr_rel - 1 + 4 AS pstart,
        |        TRY_CAST(regexp_extract(
        |            regexp_extract(hdrs, '(^|\r\n)Content-Length: ([^\r\n]*)', 2),
        |            '^([0-9]+)', 1) AS BIGINT) AS clen
        |      FROM (
        |        SELECT file_id, content, off, rec_no, hdr_rel,
        |          substr(content, CAST(off AS INTEGER),
        |            CAST(greatest(hdr_rel - 1, 0) AS INTEGER)) AS hdrs
        |        FROM (
        |          SELECT file_id, content, off, rec_no,
        |            CAST(instr(substr(content, CAST(off AS INTEGER)),
        |              chr(13)||chr(10)||chr(13)||chr(10)) AS BIGINT) AS hdr_rel
        |          FROM st
        |          WHERE NOT stop AND off <= length(content)
        |        )
        |      )
        |    )
        |  )
        |)
        |SELECT file_id, rec_no, warc_type, target_uri, content_length,
        |  payload_md5, payload_chars
        |FROM st WHERE rec_no >= 0""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // The LP rows themselves stay no_oracle (LP-EMD is not DuckDB-
    // expressible), but their cross-engine witness verdict is a fixed
    // contract: zero pairs unique to either engine, for every LP query,
    // at any scale factor. Literal oracle rows make that verdict
    // hash-checked by the driver.
    "q_lp_witness" ->
      """SELECT query, CAST(only_primary AS BIGINT) AS only_primary,
        |       CAST(only_witness AS BIGINT) AS only_witness, engines_agree
        |FROM (VALUES ('q_emd3d_pairs', 0, 0, true),
        |             ('q_emd3d_topk', 0, 0, true),
        |             ('q_treeexact3d_pairs', 0, 0, true),
        |             ('q_mrsim3d_pairs_vs_tree', 0, 0, true),
        |             ('q_mrsim3d_pairs_vs_melody', 0, 0, true),
        |             ('q_mrsim3d_topk_vs_tree', 0, 0, true))
        |     t(query, only_primary, only_witness, engines_agree)""".stripMargin,

    "q_kmeans" -> KmeansSql,
    "q_emb_outliers" -> EmbOutliersSql,

    // the q_kmeans assignment chain verbatim (KmeansBody), then exact
    // within-cluster cosine pairs on the ORIGINAL double vectors at the
    // q_emb_neardup tau, then the lowest-id-survives rule: dropped iff
    // a lower-id cluster-mate is tau-close
    "q_semdedup" ->
      (KmeansBody +
        """, emb AS (
          |  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
          |), m AS (
          |  SELECT emb.id, emb.v, a.cid
          |  FROM emb JOIN (SELECT id, cid FROM af WHERE rn = 1) a ON a.id = emb.id
          |), drops AS (
          |  SELECT DISTINCT b.id FROM m a JOIN m b ON a.cid = b.cid AND a.id < b.id
          |  WHERE list_cosine_similarity(a.v, b.v) >= 0.45
          |)
          |SELECT m.id AS vec_id, cast(m.cid AS BIGINT) AS cluster,
          |       cast(CASE WHEN d.id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
          |FROM m LEFT JOIN drops d ON m.id = d.id""".stripMargin),
    "q_pq_topk" -> PqSql,
    "q_pq_rerank" -> PqRerankSql,
    "q_ivfpq_topk" -> IvfPqSql,
    "q_ivfpq_rerank" -> IvfPqRerankSql,
    "q_ivfpq_recall" -> IvfPqRecallSql,
    "q_stream_ann" -> StreamAnnSql,

    "q1_agg" ->
      """SELECT l_returnflag, round(cast(sum(l_quantity) AS DOUBLE), 6) AS sum_qty,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_hist_build" ->
      (HistCte +
        " SELECT id, cast(bin AS BIGINT) AS bin, round(w, 6) AS w FROM hist"),

    "q_emd1d_pairs" -> emd1dOracle(prefixShape = true, None, Theta),

    // cum-of-differences form: the native Emd1d kernel folds
    // run += a(i)-b(i); tot += |run|, which is the EmdCte arithmetic
    // shape (NOT the prefix-sum-difference shape q_emd1d_pairs uses)
    "q_sql_emd" ->
      (HistCte +
        s""", diffs AS (
           |  SELECT a.id AS rid, b.id AS sid, a.bin AS bin, a.w - b.w AS d
           |  FROM hist a JOIN hist b ON a.bin = b.bin AND a.id < b.id
           |  WHERE a.id % 7 = 0 AND b.id % 7 = 0
           |), cums AS (
           |  SELECT rid, sid,
           |         sum(d) OVER (PARTITION BY rid, sid ORDER BY bin) AS cum
           |  FROM diffs
           |), emds AS (
           |  SELECT rid, sid, sum(abs(cum)) AS dist FROM cums GROUP BY rid, sid
           |) SELECT rid, sid, round(dist, 6) AS dist FROM emds
           | WHERE dist <= $Theta""".stripMargin),

    "q_emd1d_topk" -> emd1dOracle(prefixShape = true, Some(TopK), Theta),

    // prefix-sum-difference form: the melody 1-D columnar path carries
    // per-side running sums (the q_emd1d scalar-cums shape), which is
    // FP-distinct from the cum-of-differences form mrsim's kernel uses
    "q_melody1d_pairs" -> emd1dOracle(prefixShape = true, None, Theta),

    "q_mrsim1d_pairs" -> emd1dOracle(prefixShape = false, None, Theta),

    // four-engine equality: the oracle computes the true pair count on
    // the fixed 512-lowest-id slice (pair-level filter == corpus-level
    // filter: a pair is within the slice iff both endpoints are) and
    // pins every engine's n_pairs to it and n_diff to zero
    // the pair CTE is id-restricted BEFORE its band join (idLimit):
    // the audit only counts pairs inside the 512-id slice, so the
    // oracle must not run the full-corpus candidate join to get there
    "q_engine_equiv" -> {
      val pairSql = emd1dOracle(prefixShape = true, None, Theta,
        idLimit = Some(512))
      s"""WITH pairs AS (
         |$pairSql
         |), cnt AS (
         |  SELECT count(*) AS n FROM pairs
         |)
         |SELECT e.engine, cnt.n AS n_pairs, CAST(0 AS BIGINT) AS n_diff,
         |       TRUE AS dist_ok
         |FROM (VALUES ('baseline'), ('closed_form'), ('melody'),
         |             ('melody_approxq'), ('mrsim'))
         |  AS e(engine)
         |CROSS JOIN cnt""".stripMargin
    },

    // Mirrors the Spark embedding exactly: per dyadic level (span 4/2/1),
    // per node, feature = span * node mass; distance = sum of abs diffs
    // over the complete 14-feature embedding (hist is dense per id, so
    // every pair joins on all 14 (span, node) keys). Banded candidate
    // generation (see treeEmdOracle) keeps DuckDB's group count at the
    // candidate-set size instead of N^2/2.
    "q_treeemd_pairs" ->
      treeEmdOracle(HistCte, TreeF1dSql, None, TreeTau),

    // Mirrors EmdJoins.treeEmd3dThresholdJoin: kd-split hierarchy (q, then
    // p, then d) — the level-l node of bin i is i // span for span in
    // {4, 2, 1}; edge weights (0.25, 0.25, 0.5); distance = sum of
    // weighted node-mass abs diffs over the complete 14-feature embedding.
    "q_treeemd3d_pairs" ->
      treeEmdOracle(Hist3Cte, TreeF3dSql, None, TreeTau3d),

    "q_treeemd_topk" ->
      treeEmdOracle(HistCte, TreeF1dSql, Some(TopK), TreeTau),

    "q_treeemd3d_topk" ->
      treeEmdOracle(Hist3Cte, TreeF3dSql, Some(TopK), TreeTau3d),

    "q_mrsim1d_topk" -> emd1dOracle(prefixShape = false, Some(TopK), Theta),

    // Mirrors the Spark centroid arithmetic: sum(w * bit) over the dense
    // 8-bin hist adds the zero terms exactly (x + 0.0 == x in IEEE), so
    // both systems compute w4+w5+w6+w7 etc. bit-identically.
    "q_rubner3d_pairs" ->
      (Hist3Cte +
        s""", cents AS (
           |  SELECT id, sum(w * (bin // 4)) AS cx,
           |         sum(w * ((bin // 2) % 2)) AS cy,
           |         sum(w * (bin % 2)) AS cz
           |  FROM hist GROUP BY id
           |), dists AS (
           |  SELECT a.id AS rid, b.id AS sid,
           |         sqrt((a.cx-b.cx)*(a.cx-b.cx) + (a.cy-b.cy)*(a.cy-b.cy) +
           |              (a.cz-b.cz)*(a.cz-b.cz)) AS dist
           |  FROM cents a JOIN cents b ON a.id < b.id
           |)
           |SELECT rid, sid, round(dist, 6) AS dist FROM dists
           |WHERE dist <= $Rubner3dTheta""".stripMargin),

    // the 3-D exact LP-EMD rows: closed-form KR-dual oracles (CubeKR
    // scaladoc has the duality argument; Cube3dBody the cascade). The
    // pairs rows are two ENGINES over one answer — same oracle.
    "q_emd3d_pairs" -> Cube3dPairsSql,
    "q_treeexact3d_pairs" -> Cube3dPairsSql,
    "q_emd3d_topk" -> Cube3dTopKSql,

    "q_rubner_pairs" ->
      (HistCte +
        s""", means AS (
           |  SELECT id, sum(w * bin) AS mean FROM hist GROUP BY id
           |)
           |SELECT a.id AS rid, b.id AS sid, round(abs(a.mean - b.mean), 6) AS dist
           |FROM means a JOIN means b ON a.id < b.id
           |WHERE abs(a.mean - b.mean) <= $RubnerTheta""".stripMargin),

    "q_gen_emd" ->
      """WITH chars AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
        |), buck AS (
        |  SELECT doc_id, ascii(ch) // 32 AS bin, cast(count(*) AS DOUBLE) AS c
        |  FROM chars GROUP BY 1, 2
        |), ids AS (SELECT DISTINCT doc_id FROM documents
        |), dense AS (
        |  SELECT i.doc_id AS id, b.bin, coalesce(k.c, 0.0) AS c
        |  FROM ids i
        |  CROSS JOIN (SELECT cast(range AS INTEGER) AS bin FROM range(8)) b
        |  LEFT JOIN buck k ON k.doc_id = i.doc_id AND k.bin = b.bin
        |), hist AS (
        |  SELECT id, bin, c / sum(c) OVER (PARTITION BY id) AS w FROM dense
        |), cum AS (
        |  SELECT id, bin, sum(w) OVER (PARTITION BY id ORDER BY bin) AS cw
        |  FROM hist
        |), emds AS (
        |  SELECT a.id AS rid, b.id AS sid, sum(abs(a.cw - b.cw)) AS dist
        |  FROM cum a JOIN cum b ON a.bin = b.bin AND a.id < b.id
        |  WHERE a.bin < 7 GROUP BY 1, 2
        |)
        |SELECT rid, sid, round(dist, 6) AS dist FROM emds WHERE dist <= 0.00203""".stripMargin,

    "q_dedup_exact" ->
      s"""SELECT $FingerprintSql AS fp,
         |       min(doc_id) AS keeper, count(*) AS n
         |FROM documents GROUP BY 1""".stripMargin,

    // streaming replay: ascending-id ingestion makes first-seen == min id
    "q_stream_dedup" ->
      s"""WITH k AS (
         |  SELECT $FingerprintSql AS fp,
         |         min(doc_id) AS keeper
         |  FROM documents GROUP BY 1
         |)
         |SELECT d.doc_id, k.keeper, d.doc_id <> k.keeper AS is_dup
         |FROM documents d
         |JOIN k ON ${fingerprintSql("d.text")} = k.fp""".stripMargin,

    "q_token_stats" ->
      """SELECT doc_id,
        |  cast(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  cast(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        |  round(cast(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')), 6) AS avg_len,
        |  round(cast(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')), 6) AS uniq_ratio
        |FROM documents""".stripMargin,

    "q_bpe_tokens" ->
      """SELECT doc_id,
        |  cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+')) AS BIGINT) AS n_bpe
        |FROM documents""".stripMargin,

    // Mirrors TextCols.rollingHash: fold of (acc*31 + md5Bits32(tok)) mod
    // 2^31-1 with seed 7919; list_reduce folds the prepended seed first,
    // exactly like Spark's `aggregate` initial value.
    "q_rolling_fp" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(7919::BIGINT,
        |      list_transform(string_split(text, ' '),
        |                     t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 2147483647) AS fp
        |FROM documents""".stripMargin,

    // Mirrors Dedup.simhash64 (md5Bits64 per token, count-weighted sign
    // bits) then brute-forces all pairs at Hamming <= 7; the Spark side's
    // pigeonhole banding has recall 1.0 by construction, so outputs match.
    "q_simhash_pairs" ->
      ("WITH " + SimhashCteBody +
        """
          |SELECT rid, sid, cast(hamming AS BIGINT) AS hamming
          |FROM pairs WHERE hamming <= 7""".stripMargin),

    // streaming near-dup replay: the pair set is ingestion-order-invariant
    // and equals the batch simhash pair set at the same radius
    "q_stream_neardup" ->
      ("WITH " + SimhashCteBody +
        """
          |SELECT rid, sid, cast(hamming AS BIGINT) AS hamming
          |FROM pairs WHERE hamming <= 7""".stripMargin),

    // Near-dup clustering: simhash pairs -> undirected graph -> connected
    // components with cluster = min reachable doc_id. The oracle computes
    // the transitive closure with a recursive CTE (fine at oracle scale);
    // the Spark side is large-star/small-star contraction — both are
    // deterministic, so outputs match exactly.
    "q_dedup_clusters" ->
      ("WITH RECURSIVE " + SimhashCteBody +
        """, e AS (
          |  SELECT rid AS u, sid AS v FROM pairs WHERE hamming <= 7
          |), """.stripMargin + reachCtes("e") + "\n" +
        """SELECT d.doc_id, least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS cluster
          |FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
          |GROUP BY d.doc_id""".stripMargin),

    // Leak-safe split: the q_dedup_clusters closure + the q_data_split
    // bucket arithmetic applied to the CLUSTER id — one recursive
    // closure, one hash, structurally no straddling.
    "q_leak_split" ->
      ("WITH RECURSIVE " + SimhashCteBody +
        """, e AS (
          |  SELECT rid AS u, sid AS v FROM pairs WHERE hamming <= 7
          |), """.stripMargin + reachCtes("e") + ",\n" +
        """cl AS (
          |  SELECT d.doc_id, least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS cluster
          |  FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
          |  GROUP BY d.doc_id
          |)
          |SELECT doc_id, cluster,
          |  CASE WHEN b < 3435973837 THEN 'train'
          |       WHEN b < 3865470566 THEN 'val' ELSE 'test' END AS split
          |FROM (SELECT doc_id, cluster,
          |        ('0x' || substr(md5('split:' || cast(cluster AS VARCHAR)),
          |                        1, 8))::BIGINT AS b
          |      FROM cl)""".stripMargin),

    // Keep-best: the q_dedup_clusters recursive closure + the q_quality
    // score, ranked (score DESC, id) per cluster.
    "q_keep_best" ->
      ("WITH RECURSIVE " + SimhashCteBody +
        """, e AS (
          |  SELECT rid AS u, sid AS v FROM pairs WHERE hamming <= 7
          |), """.stripMargin + reachCtes("e") + ", " +
        clusterCte("documents") + ", " + qualityScoreCte("documents") +
        """, ranked AS (
          |  SELECT cl.cluster, cl.id,
          |    row_number() OVER (PARTITION BY cl.cluster
          |                       ORDER BY sc.score DESC, cl.id) AS rnk,
          |    count(*) OVER (PARTITION BY cl.cluster) AS n_members
          |  FROM cl JOIN sc ON sc.doc_id = cl.id
          |)
          |SELECT cluster, id AS keeper, cast(n_members AS BIGINT) AS n_members,
          |       cast(n_members - 1 AS BIGINT) AS n_dropped
          |FROM ranked WHERE rnk = 1""".stripMargin),

    // The composed pipeline oracle COMPOSES each stage's shared CTE
    // generator over the staged corpus (one body per stage, used by the
    // standalone oracle AND here — a threshold/score change cannot
    // silently drift between the two): quality-gate keeps (integer
    // cross-multiplied thresholds) -> min-doc_id-per-fingerprint exact
    // dedup -> banded exact shingle-Jaccard >= 0.5 edges (the
    // q_minhash_pairs equality argument carries to any SUBSET of the
    // corpus: fewer docs can only remove pairs, never push a qualifying
    // pair's J down) -> recursive-CTE components + (round(score,6) DESC,
    // id) keep-best -> doc_id-ordered 512-token packing of survivors.
    "q_pipeline" ->
      ("WITH RECURSIVE " + qualityGateCtes("documents") +
        s""", keepq AS (
           |  SELECT doc_id FROM h WHERE $qgKeepPred
           |), gated AS (
           |  SELECT d.* FROM documents d JOIN keepq k ON k.doc_id = d.doc_id
           |), keepers AS (
           |  SELECT min(doc_id) AS doc_id
           |  FROM gated GROUP BY $FingerprintSql
           |), ddocs AS (
           |  SELECT g.* FROM gated g JOIN keepers k ON k.doc_id = g.doc_id
           |), """.stripMargin +
        jaccardBandedCtes(shingleSetSql("ddocs", " ", "text"), 1L, 2L, "m") +
        """, e AS (
          |  SELECT rid AS u, sid AS v FROM mpairs WHERE i / (la + lb - i) >= 0.5
          |), """.stripMargin + reachCtes("e") + ", " +
        clusterCte("ddocs") + ", " + qualityScoreCte("ddocs") +
        """, ranked AS (
          |  SELECT cl.cluster, cl.id,
          |    row_number() OVER (PARTITION BY cl.cluster
          |                       ORDER BY sc.score DESC, cl.id) AS rnk
          |  FROM cl JOIN sc ON sc.doc_id = cl.id
          |), best AS (
          |  SELECT id AS doc_id FROM ranked WHERE rnk = 1
          |), survivors AS (
          |  SELECT d.* FROM ddocs d JOIN best b ON b.doc_id = d.doc_id
          |), """.stripMargin + packCtes("survivors") + "\n" + PackSelect),

    // Exact 3-token-shingle Jaccard join: equals the minhash-LSH output
    // because candidates are verified with the exact shingle Jaccard and
    // the banding is sized for recall 1.0 on this corpus.
    //
    // ORACLE FRAGILITY (not operator correctness): this equality is
    // fixture-dependent. LSH recall is probabilistic; with 2-row bands the
    // per-pair miss prob at Jaccard J is (1 - J^2)^16, negligible at the
    // corpus' lowest qualifying J (0.8) but ~1% at J ~ 0.55. If a future
    // fixture/scale change introduces qualifying pairs near tau, a red row
    // here means the ORACLE'S exactness assumption broke, not the operator
    // — re-derive band sizing from the corpus' minimum qualifying J.
    "q_minhash_pairs" ->
      ("WITH " +
        jaccardBandedCtes(shingleSetSql("documents", " ", "text"), 1L, 2L) +
        """
          |SELECT rid, sid, round(i / (la + lb - i), 6) AS jaccard
          |FROM pairs WHERE i / (la + lb - i) >= 0.5""".stripMargin),

    // Shingle-set Jaccard (the minhash oracle's shingle CTEs with the
    // operator's '_' token joiner), banded exact threshold form;
    // tau = 8969/10000 drives the integer prefix length.
    "q_ngram_jaccard" ->
      ("WITH " +
        jaccardBandedCtes(
          shingleSetSql("documents", "_", "replace(text, ' ', '_')"),
          8969L, 10000L) +
        """
          |SELECT rid, sid, round(i / (la + lb - i), 6) AS jaccard
          |FROM pairs WHERE i / (la + lb - i) >= 0.8969""".stripMargin),

    // Bounded Levenshtein join: the length band |la-lb| <= 4 is the
    // admissible pre-filter (ed >= length difference); distances are
    // integers so both engines agree exactly at the ed = 4 boundary.
    // COALESCE(text, '') mirrors the engine's NULL-is-empty-string rule
    // (EditJoin short legs): a NULL-text row must pair like an empty
    // string in BOTH systems, not NULL-propagate out of the oracle
    "q_edit_pairs" ->
      """WITH d AS (SELECT doc_id, coalesce(text, '') AS text,
        |                  length(coalesce(text, '')) AS l FROM documents),
        |p AS (
        |  SELECT a.doc_id AS rid, b.doc_id AS sid,
        |         levenshtein(a.text, b.text) AS ed
        |  FROM d a JOIN d b
        |    ON a.doc_id < b.doc_id AND b.l BETWEEN a.l - 4 AND a.l + 4
        |)
        |SELECT rid, sid, CAST(ed AS BIGINT) AS ed FROM p WHERE ed <= 4""".stripMargin,

    // integer md5-bucket compare — rates are exact quarter fractions so
    // floor(rate * 2^32) is the same integer in both engines
    "q_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE ('0x' || substr(md5(lang || ':' || cast(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |  < cast(floor((CASE lang WHEN 'en' THEN 0.25 WHEN 'de' THEN 0.5
        |                          WHEN 'es' THEN 0.75 WHEN 'zh' THEN 1.0
        |                          ELSE 0.5 END) * 4294967296) AS BIGINT)""".stripMargin,

    "q_fixed_sample" ->
      """SELECT doc_id, lang, cast(smp_rank AS BIGINT) AS smp_rank FROM (
        |  SELECT doc_id, lang, row_number() OVER (
        |    PARTITION BY lang
        |    ORDER BY ('0x' || substr(md5(lang || ':' || cast(doc_id AS VARCHAR)), 1, 8))::BIGINT,
        |             doc_id) AS smp_rank
        |  FROM documents)
        |WHERE smp_rank <= 30""".stripMargin,

    "q_group_quantiles" ->
      """WITH ranked AS (
        |  SELECT lang, cast(len(string_split(text, ' ')) AS BIGINT) AS value, doc_id,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY len(string_split(text, ' ')), doc_id) AS rnk,
        |         count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents
        |)
        |SELECT lang, q, value, cast(n AS BIGINT) AS n
        |FROM ranked, (SELECT unnest([0.25, 0.5, 0.75, 1.0]::DOUBLE[]) AS q) qs
        |WHERE cast(ceil(q * n) AS BIGINT) = rnk""".stripMargin,

    "q_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
        |)
        |SELECT token, count(*) AS cnt FROM toks GROUP BY 1
        |HAVING count(*) * 1000 > (SELECT count(*) FROM toks)""".stripMargin,

    // streaming replay: batch-by-batch MG sketching + landed recount is
    // corpus-order-invariant, so the batch heavy-hitter oracle replays it
    "q_stream_heavy" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
        |)
        |SELECT token, count(*) AS cnt FROM toks GROUP BY 1
        |HAVING count(*) * 1000 > (SELECT count(*) FROM toks)""".stripMargin,

    "q_approx_distinct" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
        |)
        |SELECT source, count(DISTINCT token) AS n_distinct, TRUE AS hll_ok
        |FROM toks GROUP BY 1""".stripMargin,

    // the bloom audit's exact half: distinct urgent keys, big-side row
    // count, semi-join match count; the filter's guarantees (no false
    // negatives, fp inside the fpp envelope) are the pinned literals
    "q_bloom_join" ->
      """WITH k AS (
        |  SELECT DISTINCT o_orderkey FROM orders
        |  WHERE o_orderpriority = '1-URGENT'
        |)
        |SELECT (SELECT count(*) FROM lineitem) AS n_big,
        |       (SELECT count(*) FROM lineitem l
        |        JOIN k ON l.l_orderkey = k.o_orderkey) AS n_true,
        |       CAST(0 AS BIGINT) AS false_negatives,
        |       TRUE AS fp_ok""".stripMargin,

    "q_cms_audit" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
        |), p AS (
        |  SELECT unnest(['the','and','of','to','in','is','with','for']) AS token
        |)
        |SELECT p.token, cast(coalesce(c.cnt, 0) AS BIGINT) AS cnt,
        |       TRUE AS cms_ok
        |FROM p LEFT JOIN (SELECT token, count(*) AS cnt FROM toks
        |                  GROUP BY 1) c ON c.token = p.token""".stripMargin,

    "q_cooccur" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), pos AS (
        |  SELECT doc_id, generate_subscripts(t, 1) AS i, unnest(t) AS tok
        |  FROM toks
        |), pr AS (
        |  SELECT least(a.tok, b.tok) AS ta, greatest(a.tok, b.tok) AS tb
        |  FROM pos a JOIN pos b
        |    ON a.doc_id = b.doc_id AND b.i > a.i AND b.i <= a.i + 3
        |)
        |SELECT ta, tb, count(*) AS cnt FROM pr GROUP BY 1, 2
        |ORDER BY cnt DESC, ta, tb LIMIT 25""".stripMargin,

    // mirrors TfIdf.bm25TopK term by term: integer tf/dl/df/N, one
    // shared avgdl division, bitlen idf (length(bin(N//df)) — `ln` is
    // not cross-engine ulp-stable, bitlen is exact), addends summed in
    // the same fixed query order so the doubles are bit-identical
    "q_bm25_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents
        |), agg AS (
        |  SELECT doc_id, count(*) AS dl,
        |         sum(CASE WHEN token = 'spark' THEN 1 ELSE 0 END) AS tf0,
        |         sum(CASE WHEN token = 'table' THEN 1 ELSE 0 END) AS tf1,
        |         sum(CASE WHEN token = 'join' THEN 1 ELSE 0 END) AS tf2
        |  FROM toks GROUP BY 1
        |), st AS (
        |  SELECT count(*) AS n,
        |         cast(sum(dl) AS DOUBLE) / count(*) AS avgdl
        |  FROM agg
        |), df AS (
        |  SELECT count(DISTINCT CASE WHEN token = 'spark' THEN doc_id END) AS df0,
        |         count(DISTINCT CASE WHEN token = 'table' THEN doc_id END) AS df1,
        |         count(DISTINCT CASE WHEN token = 'join' THEN doc_id END) AS df2
        |  FROM toks
        |), sc AS (
        |  SELECT a.doc_id,
        |    (CASE WHEN df0 = 0 THEN 0
        |          ELSE length(bin(n // df0)) END)
        |      * (cast(tf0 AS DOUBLE) /
        |         (cast(tf0 AS DOUBLE) +
        |          1.2 * (0.25 + 0.75 * cast(dl AS DOUBLE) / avgdl))) +
        |    (CASE WHEN df1 = 0 THEN 0
        |          ELSE length(bin(n // df1)) END)
        |      * (cast(tf1 AS DOUBLE) /
        |         (cast(tf1 AS DOUBLE) +
        |          1.2 * (0.25 + 0.75 * cast(dl AS DOUBLE) / avgdl))) +
        |    (CASE WHEN df2 = 0 THEN 0
        |          ELSE length(bin(n // df2)) END)
        |      * (cast(tf2 AS DOUBLE) /
        |         (cast(tf2 AS DOUBLE) +
        |          1.2 * (0.25 + 0.75 * cast(dl AS DOUBLE) / avgdl))) AS score
        |  FROM agg a CROSS JOIN st CROSS JOIN df
        |)
        |SELECT doc_id, round(score, 6) AS score FROM sc
        |ORDER BY round(score, 6) DESC, doc_id LIMIT 20""".stripMargin,

    // same md5-bucket arithmetic as the sampling oracles; thresholds are
    // integer literals so membership is exact in both engines
    "q_data_split" ->
      """SELECT doc_id,
        |  CASE WHEN b < 3435973837 THEN 'train'
        |       WHEN b < 3865470566 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        ('0x' || substr(md5('split:' || cast(doc_id AS VARCHAR)),
        |                        1, 8))::BIGINT AS b
        |      FROM documents)""".stripMargin,

    // n = count(value): quantileAudit counts NON-NULL values only (the
    // percentile/rank aggregates ignore nulls) and returns ZERO rows on
    // empty/all-null input — the WHERE mirrors that early return so the
    // engines stay aligned the day events.value grows a null
    "q_approx_quantiles" ->
      """SELECT round(q, 6) AS q, (SELECT count(value) FROM events) AS n,
        |       TRUE AS rank_ok
        |FROM (SELECT unnest([0.5, 0.9, 0.99]::DOUBLE[]) AS q)
        |WHERE (SELECT count(value) FROM events) > 0""".stripMargin,

    "q_zorder_key" -> {
      // unrolled Morton interleave: bit b of col i -> position b*2 + i
      val terms = (for { b <- 0 until 16; (c, i) <- Seq("l_partkey" -> 0, "l_suppkey" -> 1) }
        yield s"(((${c} >> ${b}) & 1) << ${b * 2 + i})").mkString(" + ")
      s"SELECT l_orderkey, l_linenumber, cast($terms AS BIGINT) AS zval FROM lineitem"
    },

    // the tokenizer TRAINERS: full unrolled-merge replays (30 rounds of
    // pair-count/argmax/greedy-apply CTEs — BpeTrainSql scaladoc); the
    // witness rows below stay as additional independent evidence
    "q_bpe_train" -> BpeTrainSql,
    "q_wordpiece_train" -> WordpieceTrainSql,

    "q_bpe_witness" ->
      """SELECT 'q_bpe_train' AS query, CAST(30 AS BIGINT) AS n_merges,
        |       TRUE AS engines_agree""".stripMargin,

    // WordPiece inference replay: greedy longest-match-first per
    // DISTINCT word as a recursive CTE (cursor state (word, pos,
    // pieces, failed); the longest matching piece is a correlated MAX —
    // a no-match round sets failed and jumps the cursor past the end so
    // the recursion terminates), whole-word [UNK] on failure, then the
    // token stream joins the per-word stats. The vocab literal
    // interpolates from the same WordpieceDemoVocab val the Spark
    // encoder uses — one source of truth.
    "q_wordpiece_tokens" -> {
      val vocabVals = WordpieceDemoVocab.map(p => s"('$p')").mkString(", ")
      s"""WITH RECURSIVE vocab AS (
         |  SELECT * FROM (VALUES $vocabVals) AS v(p)
         |), pieces AS (
         |  SELECT p, p LIKE '##%' AS cont,
         |    CASE WHEN p LIKE '##%' THEN substr(p, 3) ELSE p END AS raw
         |  FROM vocab
         |), toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
         |), words AS (
         |  SELECT DISTINCT w FROM toks
         |), st(w, pos, np, failed) AS (
         |  SELECT w, 1, 0, false FROM words
         |  UNION ALL
         |  SELECT w, CASE WHEN l = 0 THEN len(w) + 1 ELSE pos + l END,
         |         CASE WHEN l = 0 THEN 1 ELSE np + 1 END, l = 0
         |  FROM (
         |    SELECT st.w, st.pos, st.np,
         |      coalesce((SELECT max(len(p2.raw)) FROM pieces p2
         |                WHERE p2.cont = (st.pos > 1)
         |                  AND substr(st.w, st.pos, len(p2.raw)) = p2.raw), 0) AS l
         |    FROM st
         |    WHERE st.pos <= len(st.w) AND NOT st.failed
         |  )
         |), wstats AS (
         |  SELECT w, np, failed AS unk FROM st WHERE pos > len(w)
         |)
         |SELECT t.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(ws.np) AS BIGINT) AS n_pieces,
         |  CAST(count(*) FILTER (WHERE ws.unk) AS BIGINT) AS n_unk_words
         |FROM toks t JOIN wstats ws ON t.w = ws.w
         |GROUP BY t.doc_id""".stripMargin
    },

    // Unigram Viterbi replay: per distinct word, a recursive CTE runs
    // the DP left to right carrying TWO lists — sc[i] = best score of
    // the length-(i-1) prefix (NULL = unreachable), pc[i] = min pieces
    // among best — appending one entry per step; the per-step best is a
    // correlated MAX over vocab pieces ending at the new position, and
    // the min-pieces a correlated MIN restricted to pieces achieving
    // that max. The scored-vocab VALUES interpolate from the same
    // UnigramDemoVocab val the Spark kernel uses.
    "q_unigram_tokens" -> {
      val vocabVals = UnigramDemoVocab
        .map { case (p, s) => s"('$p', CAST($s AS BIGINT))" }.mkString(", ")
      s"""WITH RECURSIVE vocab AS (
         |  SELECT * FROM (VALUES $vocabVals) AS v(p, s)
         |), toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
         |), words AS (
         |  SELECT DISTINCT w FROM toks
         |), st(w, l, sc, pc) AS (
         |  SELECT w, 0, [CAST(0 AS BIGINT)], [CAST(0 AS BIGINT)] FROM words
         |  UNION ALL
         |  SELECT w, l + 1, list_append(sc, ns),
         |    list_append(pc, CASE WHEN ns IS NULL THEN NULL ELSE
         |      (SELECT min(pc[l + 2 - len(v.p)] + 1) FROM vocab v
         |       WHERE len(v.p) <= l + 1
         |         AND sc[l + 2 - len(v.p)] IS NOT NULL
         |         AND substr(w, l + 2 - len(v.p), len(v.p)) = v.p
         |         AND sc[l + 2 - len(v.p)] + v.s = ns) END)
         |  FROM (
         |    SELECT w, l, sc, pc,
         |      (SELECT max(sc[l + 2 - len(v.p)] + v.s) FROM vocab v
         |       WHERE len(v.p) <= l + 1
         |         AND sc[l + 2 - len(v.p)] IS NOT NULL
         |         AND substr(w, l + 2 - len(v.p), len(v.p)) = v.p) AS ns
         |    FROM st WHERE l < len(w)
         |  )
         |), wstats AS (
         |  SELECT w,
         |    COALESCE(sc[len(w) + 1], CAST(-10000 AS BIGINT)) AS ws,
         |    CASE WHEN sc[len(w) + 1] IS NULL THEN CAST(1 AS BIGINT)
         |         ELSE pc[len(w) + 1] END AS wp,
         |    sc[len(w) + 1] IS NULL AS unk
         |  FROM st WHERE l = len(w)
         |)
         |SELECT t.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(ws.ws) AS BIGINT) AS total_score,
         |  CAST(sum(ws.wp) AS BIGINT) AS n_pieces,
         |  CAST(count(*) FILTER (WHERE ws.unk) AS BIGINT) AS n_unk_words
         |FROM toks t JOIN wstats ws ON t.w = ws.w
         |GROUP BY t.doc_id""".stripMargin
    },

    "q_wordpiece_witness" ->
      """SELECT * FROM (VALUES
        |  ('q_wordpiece_train', CAST(30 AS BIGINT), TRUE),
        |  ('q_wordpiece_tokens', CAST(30 AS BIGINT), TRUE))
        |AS v(query, n_merges, engines_agree)""".stripMargin,

    "q_funnel" -> FunnelSql,
    // the streaming replay carries the batch twin's exact schema, so the
    // same chained-window oracle checks the cross-batch state carries
    "q_stream_funnel" -> FunnelSql,

    "q_top_ngrams" ->
      """WITH toks AS (
        |  SELECT lang, text, string_split(text, ' ') AS t FROM documents
        |), grams AS (
        |  SELECT lang, unnest(
        |    CASE WHEN len(t) < 2 THEN [replace(text, ' ', '_')]
        |         ELSE list_transform(range(1, len(t)), i -> t[i] || '_' || t[i + 1])
        |    END) AS gram
        |  FROM toks
        |), counts AS (
        |  SELECT lang, gram, count(*) AS cnt FROM grams GROUP BY 1, 2
        |), ranked AS (
        |  SELECT lang, gram, cnt,
        |         row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, gram) AS rank
        |  FROM counts
        |)
        |SELECT lang, gram, cast(cnt AS BIGINT) AS cnt, cast(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 5""".stripMargin,

    "q_span_dedup" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id AS id, unnest(
        |    CASE WHEN len(t) < 3 THEN [replace(text, ' ', '_')]
        |         ELSE list_transform(range(1, len(t) - 1),
        |                i -> t[i] || '_' || t[i + 1] || '_' || t[i + 2])
        |    END) AS gram
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
        |), owners AS (
        |  SELECT gram, min(id) AS owner FROM sh GROUP BY gram
        |)
        |SELECT s.id AS doc_id,
        |       cast(count(*) AS BIGINT) AS n_shingles,
        |       cast(sum(CASE WHEN o.owner = s.id THEN 1 ELSE 0 END) AS BIGINT) AS n_owned,
        |       round(1.0 - cast(sum(CASE WHEN o.owner = s.id THEN 1 ELSE 0 END) AS DOUBLE)
        |             / count(*), 6) AS dup_frac
        |FROM sh s JOIN owners o USING (gram)
        |GROUP BY s.id""".stripMargin,

    // Composed ingestion replay: card derivation + Luhn verdict (the
    // q_pii_luhn CTE shapes, renamed lg*), JSONL serialization over the
    // CARDED text with the % 17 truncation (the q_json_ingest shape),
    // json_valid parse lane, structural scrub replace, then the SHARED
    // qualityGateCtes/qgKeepPred over the scrubbed text — one body per
    // rule, composed not copied (the q_pipeline convention).
    "q_ingest_pipeline" ->
      ("WITH " + ingestScrubCtes + ", gsrc AS (\n" +
        """  SELECT doc_id, clean_text AS text FROM scrub
          |), """.stripMargin + qualityGateCtes("gsrc") +
        s"""
           |SELECT h.doc_id,
           |  ($qgKeepPred) AS keep,
           |  CAST(h.n AS BIGINT) AS n_tokens,
           |  s.n_cards, s.n_rejected,
           |  CAST(len(s.clean_text) AS BIGINT) AS clean_chars
           |FROM h JOIN scrub s ON s.doc_id = h.doc_id""".stripMargin),

    // Streaming ingest replay: stateless per batch, so the landed rows
    // ARE the batch parse+scrub — the shared ingest CTE chain truncated
    // at the scrub stage.
    "q_stream_ingest" ->
      ("WITH " + ingestScrubCtes + "\n" +
        "SELECT doc_id, clean_text, n_cards, n_rejected FROM scrub"),

    // Luhn scrub replay: regenerate the card (id-derived digits), compute
    // the checksum with the same from-the-right doubling (position i is
    // doubled iff 16 - i is odd), and redact structurally — the fixture
    // has exactly one card and one sub-length decoy per planted doc, so
    // replace() reproduces the kernel's span rewrite exactly.
    "q_pii_luhn" ->
      """WITH g AS (
        |  SELECT doc_id, text,
        |    concat('4', lpad(CAST((doc_id * 7919) % 1000000000000000 AS VARCHAR), 15, '0')) AS c16
        |  FROM documents
        |), g2 AS (
        |  SELECT doc_id, text, c16,
        |    CASE WHEN doc_id % 2 = 0
        |         THEN concat(substr(c16, 1, 4), '-', substr(c16, 5, 4), '-',
        |                     substr(c16, 9, 4), '-', substr(c16, 13, 4))
        |         ELSE c16 END AS cardstr,
        |    doc_id % 3 = 0 AS has_card
        |  FROM g
        |), t AS (
        |  SELECT doc_id, cardstr, has_card,
        |    concat(text, CASE WHEN has_card
        |      THEN concat(' pay ', cardstr, ' today ref 12345 ok')
        |      ELSE '' END) AS full_text,
        |    list_sum(list_transform(generate_series(1, 16), i ->
        |      CASE WHEN (16 - i) % 2 = 1
        |           THEN CASE WHEN 2 * CAST(substr(c16, i, 1) AS INT) > 9
        |                     THEN 2 * CAST(substr(c16, i, 1) AS INT) - 9
        |                     ELSE 2 * CAST(substr(c16, i, 1) AS INT) END
        |           ELSE CAST(substr(c16, i, 1) AS INT) END)) % 10 = 0 AS luhn_ok
        |  FROM g2
        |)
        |SELECT doc_id,
        |  CASE WHEN has_card AND luhn_ok THEN replace(full_text, cardstr, '<CARD>')
        |       ELSE full_text END AS clean_text,
        |  CAST(CASE WHEN has_card AND luhn_ok THEN 1 ELSE 0 END AS BIGINT) AS n_cards,
        |  CAST(CASE WHEN has_card AND NOT luhn_ok THEN 1 ELSE 0 END AS BIGINT) AS n_rejected
        |FROM t""".stripMargin,

    // Paragraph dedup replay: the `paras` CTE regenerates Dedup.paraWrap
    // one generated row per paragraph (concat_ws null-skipping = the
    // WHERE-filtered UNION legs); first-occurrence is a window here but a
    // hash-partial min-struct aggregation on the Spark side — the winner
    // is identical because within-doc paragraph collisions are vocabulary-
    // unreachable, so (doc_id, pno) ordering only ever decides by doc_id.
    "q_para_dedup" ->
      ("WITH " + paraDedupCtes("documents") +
        "\nSELECT doc_id, clean_text, kept_paras, dropped_paras FROM rdoc"),

    // Text normalization replay: the `g` CTE regenerates messWrap with
    // chr() codes (769 = combining acute, 160 = NBSP, 8203 = ZWSP); the
    // normalization chain mirrors the kernel's step order exactly — raw
    // char maps innermost, then nfc_normalize, strip_accents (utf8proc ==
    // NFD-minus-Mn on this charset), lower, space-run collapse, trim.
    // Lengths count CODE POINTS in both engines.
    "q_text_norm" ->
      ("WITH " + textNormCtes("documents") +
        """
          |SELECT doc_id, norm_text, norm_text <> raw AS changed,
          |  CAST(len(raw) - len(norm_text) AS BIGINT) AS delta_chars
          |FROM n""".stripMargin),

    // URL normalization replay: regenerate the fixture COMPONENT-WISE
    // (string ops are exact, so the oracle validates the normalization
    // DECISIONS — case folding, default-port strip, tracking filter +
    // sort, fragment drop, suffix match, blocklist — while the generic
    // parser is pinned by UrlOpsSpec's hand cases).
    "q_url_normalize" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END AS scheme,
        |    concat('www.', source, '.',
        |      CASE WHEN doc_id % 11 = 0 THEN 'tracker' ELSE 'example' END, '.',
        |      CASE WHEN doc_id % 3 = 0 THEN 'com'
        |           WHEN doc_id % 3 = 1 THEN 'co.uk' ELSE 'org' END) AS host,
        |    CASE WHEN doc_id % 5 = 0 THEN '80' WHEN doc_id % 5 = 1 THEN '443'
        |         WHEN doc_id % 5 = 2 THEN '8080' ELSE '' END AS port,
        |    concat('/Docs/', CAST(doc_id AS VARCHAR)) AS path,
        |    CASE WHEN doc_id % 4 = 0 THEN
        |           concat('utm_source=feed&q=', CAST(doc_id % 7 AS VARCHAR),
        |                  '&utm_campaign=x&ref=home&page=', CAST(doc_id % 5 AS VARCHAR))
        |         WHEN doc_id % 4 = 2 THEN 'beta=2&alpha=1' ELSE '' END AS q
        |  FROM documents
        |), n AS (
        |  SELECT doc_id, scheme, host, path,
        |    CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
        |              OR (scheme = 'https' AND port = '443') THEN ''
        |         ELSE concat(':', port) END AS portpart,
        |    list_sort(list_filter(string_split(q, '&'), p -> p <> ''
        |      AND NOT starts_with(p, 'utm_')
        |      AND NOT list_contains(['ref','fbclid','gclid','msclkid'],
        |                            split_part(p, '=', 1)))) AS kept,
        |    len(list_filter(string_split(q, '&'), p -> p <> ''
        |      AND (starts_with(p, 'utm_')
        |           OR list_contains(['ref','fbclid','gclid','msclkid'],
        |                            split_part(p, '=', 1))))) AS n_dropped
        |  FROM g
        |), r AS (
        |  SELECT doc_id, scheme, host, portpart, path, kept, n_dropped,
        |    CASE WHEN ends_with(host, '.co.uk')
        |         THEN array_to_string(string_split(host, '.')[-3:], '.')
        |         ELSE array_to_string(string_split(host, '.')[-2:], '.')
        |         END AS registered
        |  FROM n
        |)
        |SELECT doc_id,
        |  concat(scheme, '://', host, portpart, path,
        |    CASE WHEN len(kept) > 0 THEN concat('?', array_to_string(kept, '&'))
        |         ELSE '' END) AS url_norm,
        |  host,
        |  registered AS registered_domain,
        |  list_contains(['tracker.com','tracker.org','tracker.co.uk'],
        |                registered) AS blocked,
        |  CAST(len(kept) AS BIGINT) AS n_params_kept,
        |  CAST(n_dropped AS BIGINT) AS n_params_dropped
        |FROM r""".stripMargin,

    // Frontier replay: regenerate host + registered domain (the compact
    // slice of the URL fixture the scheduler consumes — scheme/port/query
    // are irrelevant to politeness), apply the blocklist, then the
    // admission window. The Spark side is a bounded aggregator, not a
    // window, but the admitted set and slots are identical because the
    // (priority DESC, id) order is a total order per host.
    "q_crawl_frontier" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    concat('www.', source, '.',
        |      CASE WHEN doc_id % 11 = 0 THEN 'tracker' ELSE 'example' END, '.',
        |      CASE WHEN doc_id % 3 = 0 THEN 'com'
        |           WHEN doc_id % 3 = 1 THEN 'co.uk' ELSE 'org' END) AS host,
        |    (doc_id * 37) % 100 AS priority
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, host, priority,
        |    CASE WHEN ends_with(host, '.co.uk')
        |         THEN array_to_string(string_split(host, '.')[-3:], '.')
        |         ELSE array_to_string(string_split(host, '.')[-2:], '.') END AS registered
        |  FROM g
        |), a AS (
        |  SELECT doc_id, host, priority,
        |    row_number() OVER (PARTITION BY host ORDER BY priority DESC, doc_id) AS rn
        |  FROM r
        |  WHERE NOT list_contains(['tracker.com','tracker.org','tracker.co.uk'], registered)
        |)
        |SELECT doc_id AS url_id, host, CAST(priority AS BIGINT) AS priority,
        |  CAST(rn - 1 AS BIGINT) AS slot,
        |  CAST((rn - 1) * 1000 AS BIGINT) AS fetch_at_ms
        |FROM a WHERE rn <= 8""".stripMargin,

    // Hash-classifier replay: rebuild the md5 weight of the md5 bucket of
    // every unigram + adjacent bigram (duplicates kept — bag semantics)
    // and sum as BIGINT. Trailing empty tokens survive string_split in
    // both engines; a 1-token doc has no bigram leg (empty list unnest).
    "q_hash_classify" ->
      ("WITH " + hashClassifyScoreCtes("documents") +
        "\nSELECT doc_id, score, n_features, score >= 0 AS keep FROM s"),

    // the streaming leg is stateless per batch — same score oracle
    "q_stream_classify" ->
      ("WITH " + hashClassifyScoreCtes("documents") +
        "\nSELECT doc_id, score, n_features, score >= 0 AS keep FROM s"),

    // Arrival-pipeline replay: the three shared generators chained —
    // ingestScrubCtes (parse + scrub, %17 corrupt rows drop),
    // hashClassifyScoreCtes over the SCRUBBED text, and the blocklist
    // positional count over the same; admitted = keep AND zero hits.
    "q_arrival_pipeline" -> {
      val pats = blockPatterns.map(p => s"('$p')").mkString(", ")
      "WITH " + ingestScrubCtes + ",\n" +
        "scrub2 AS (SELECT doc_id, clean_text AS text FROM scrub),\n" +
        hashClassifyScoreCtes("scrub2") +
        s""",
           |bpats AS (SELECT * FROM (VALUES $pats) v(pattern)),
           |bh AS (
           |  SELECT s2.doc_id,
           |    CAST(SUM(len(list_filter(
           |      range(1, len(s2.text) - len(p.pattern) + 2),
           |      i -> substr(s2.text, CAST(i AS INTEGER), len(p.pattern)) = p.pattern)))
           |      AS BIGINT) AS block_hits
           |  FROM scrub2 s2 CROSS JOIN bpats p GROUP BY s2.doc_id
           |)
           |SELECT sc.doc_id, sc.n_cards, sc.n_rejected, s.score,
           |  s.score >= 0 AS keep, bh.block_hits,
           |  (s.score >= 0 AND bh.block_hits = 0) AS admitted
           |FROM scrub sc
           |JOIN s ON s.doc_id = sc.doc_id
           |JOIN bh ON bh.doc_id = sc.doc_id""".stripMargin
    },

    // Eval replay: same score CTE chain, label = (lang = 'en'); AUC as
    // the integer pair 2*wins+ties / 2*npos*nneg via a window prefix
    // sum over the score histogram (DuckDB's window replaces the
    // engine's two-phase pass — same arithmetic, different machinery);
    // the sweep VALUES list interpolates from the same Scala Seq.
    "q_classifier_eval" -> {
      val thrRows = evalThresholds.map(t => s"($t)").mkString(", ")
      "WITH " + hashClassifyScoreCtes("documents") +
        s""",
           |lab AS (
           |  SELECT s.doc_id, s.score, (d.lang = 'en') AS label
           |  FROM s JOIN documents d USING (doc_id)
           |), hist AS (
           |  SELECT score,
           |    CAST(count(*) FILTER (label) AS BIGINT) AS pos,
           |    CAST(count(*) FILTER (NOT label) AS BIGINT) AS neg
           |  FROM lab GROUP BY score
           |), c AS (
           |  SELECT score, pos, neg,
           |    CAST(sum(neg) OVER (ORDER BY score
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - neg
           |      AS BIGINT) AS negbelow
           |  FROM hist
           |), tot AS (
           |  SELECT CAST(sum(pos) AS BIGINT) AS totpos,
           |    CAST(sum(neg) AS BIGINT) AS totneg,
           |    CAST(2 * sum(pos * negbelow) + sum(pos * neg) AS BIGINT)
           |      AS auc_num
           |  FROM c
           |), thr AS (SELECT * FROM (VALUES $thrRows) v(threshold))
           |SELECT CAST(th.threshold AS BIGINT) AS threshold,
           |  CAST(coalesce(sum(c.pos) FILTER (c.score >= th.threshold), 0)
           |    AS BIGINT) AS tp,
           |  CAST(coalesce(sum(c.neg) FILTER (c.score >= th.threshold), 0)
           |    AS BIGINT) AS fp,
           |  tot.totpos - CAST(coalesce(sum(c.pos) FILTER (c.score >= th.threshold), 0)
           |    AS BIGINT) AS fn,
           |  tot.totneg - CAST(coalesce(sum(c.neg) FILTER (c.score >= th.threshold), 0)
           |    AS BIGINT) AS tn,
           |  tot.auc_num,
           |  CAST(2 * tot.totpos * tot.totneg AS BIGINT) AS auc_den
           |FROM thr th CROSS JOIN c CROSS JOIN tot
           |GROUP BY th.threshold, tot.totpos, tot.totneg, tot.auc_num""".stripMargin
    },

    // Blocklist replay: position-exact — for each (doc, pattern), count
    // the 1-based i where substr(text, i, len(p)) = p. No leftmost-greedy
    // or non-overlap convention exists to drift: both engines count ALL
    // positions (replace()-based counting would undercount the
    // self-overlapping "batch batch" lane and is deliberately avoided).
    "q_blocklist_match" -> BlocklistSql,

    // the streaming leg is stateless per batch, so the SAME
    // position-exact batch oracle checks the appended stream output
    "q_stream_blocklist" -> BlocklistSql,

    // Phrase-search replay: same postings (generate_subscripts parallel
    // unnest), same anchor-join — word k voting for anchor pos-k, an
    // anchor with all m distinct k's is an occurrence. The phrase VALUES
    // rows are generated from the same Scala Seq the Spark lambda uses.
    "q_phrase_search" -> {
      val valuesRows = searchPhrases.flatMap { p =>
        val ws = p.split(" ")
        ws.zipWithIndex.map { case (w, k) =>
          s"('$p', ${ws.length}, $k, '$w')"
        }
      }.mkString(",\n    ")
      s"""WITH p AS (
         |  SELECT doc_id,
         |    CAST(generate_subscripts(t, 1) - 1 AS BIGINT) AS pos,
         |    unnest(t) AS token
         |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
         |), ph AS (
         |  SELECT * FROM (VALUES
         |    $valuesRows) v(phrase, m, k, token)
         |), votes AS (
         |  SELECT ph.phrase, ph.m, p.doc_id, p.pos - ph.k AS anchor, ph.k
         |  FROM p JOIN ph ON ph.token = p.token
         |  WHERE p.pos - ph.k >= 0
         |), occ AS (
         |  SELECT phrase, m, doc_id, anchor
         |  FROM votes GROUP BY phrase, m, doc_id, anchor
         |  HAVING count(DISTINCT k) = m
         |)
         |SELECT phrase, doc_id, CAST(count(*) AS BIGINT) AS hits
         |FROM occ GROUP BY phrase, doc_id""".stripMargin
    },

    // PageRank replay: rebuild the md5 edge set, then unroll the four
    // damped rounds as CTEs. Every quantity is a BIGINT and every
    // division truncates nonnegative operands, so the recurrence is
    // engine-exact with no rounding convention at all; the CASTs peel
    // DuckDB's HUGEINT SUM back to the engine type.
    "q_pagerank" -> {
      val iters = 4
      val rounds = (1 to iters).map { k =>
        s"""r$k AS (
           |  SELECT r.node,
           |    CAST(150000000000 + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS pr
           |  FROM r${k - 1} r LEFT JOIN (
           |    SELECT ew.dst AS node, CAST(SUM(p.pr // ew.odeg) AS BIGINT) AS s
           |    FROM ew JOIN r${k - 1} p ON ew.src = p.node
           |    GROUP BY ew.dst) c ON c.node = r.node
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH $LinkEdgeCtes,
         |od AS (SELECT src, CAST(count(*) AS BIGINT) AS odeg FROM e GROUP BY src),
         |ew AS (SELECT e.src, e.dst, od.odeg FROM e JOIN od ON od.src = e.src),
         |r0 AS (SELECT doc_id AS node, CAST(1000000000000 AS BIGINT) AS pr
         |       FROM documents),
         |$rounds
         |SELECT r.node AS doc_id, r.pr,
         |  COALESCE(od.odeg, CAST(0 AS BIGINT)) AS out_links
         |FROM r$iters r LEFT JOIN od ON od.src = r.node""".stripMargin
    },

    // HITS replay: same edge CTE, the two half-rounds unrolled per
    // iteration — auth_k from hub_{k-1} over in-edges, hub_k from
    // auth_k over out-edges; h_0 = 1, un-normalized, all BIGINT so the
    // scores match the engine exactly.
    "q_hits" -> {
      val iters = 2
      val rounds = (1 to iters).map { k =>
        s"""a$k AS (
           |  SELECT n.node, CAST(COALESCE(c.s, 0) AS BIGINT) AS s
           |  FROM n LEFT JOIN (
           |    SELECT e.dst AS node, CAST(SUM(h.s) AS BIGINT) AS s
           |    FROM e JOIN h${k - 1} h ON e.src = h.node GROUP BY e.dst) c
           |    ON c.node = n.node
           |), h$k AS (
           |  SELECT n.node, CAST(COALESCE(c.s, 0) AS BIGINT) AS s
           |  FROM n LEFT JOIN (
           |    SELECT e.src AS node, CAST(SUM(a.s) AS BIGINT) AS s
           |    FROM e JOIN a$k a ON e.dst = a.node GROUP BY e.src) c
           |    ON c.node = n.node
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH $LinkEdgeCtes,
         |n AS (SELECT doc_id AS node FROM documents),
         |h0 AS (SELECT node, CAST(1 AS BIGINT) AS s FROM n),
         |$rounds
         |SELECT n.node AS doc_id, a$iters.s AS auth, h$iters.s AS hub
         |FROM n JOIN a$iters ON a$iters.node = n.node
         |JOIN h$iters ON h$iters.node = n.node""".stripMargin
    },

    // Profile replay: the same melt (UNION ALL legs generated from the
    // SAME column lists) + per-column aggregation; numeric min/max on
    // the integer lane, unified to strings at the end.
    "q_profile" -> {
      val legs =
        ProfileNumericCols.map(c =>
          s"SELECT '$c' AS column_name, CAST($c AS BIGINT) AS vnum, " +
            "CAST(NULL AS VARCHAR) AS vstr FROM lineitem") ++
          ProfileStringCols.map(c =>
            s"SELECT '$c' AS column_name, CAST(NULL AS BIGINT) AS vnum, " +
              s"$c AS vstr FROM lineitem")
      s"""WITH m AS (
         |  ${legs.mkString("\n  UNION ALL\n  ")}
         |)
         |SELECT column_name,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CASE WHEN vnum IS NULL AND vstr IS NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT COALESCE(vstr, CAST(vnum AS VARCHAR)))
         |    AS BIGINT) AS n_distinct,
         |  COALESCE(CAST(MIN(vnum) AS VARCHAR), MIN(vstr)) AS min_val,
         |  COALESCE(CAST(MAX(vnum) AS VARCHAR), MAX(vstr)) AS max_val
         |FROM m GROUP BY column_name""".stripMargin
    },

    // Bucketed-join replay: bucketing changes the physical layout, not
    // the answer — the oracle is the plain join+agg on the original
    // tables (the plan assertion lives in LayoutSpec).
    "q_bucketed_join" ->
      """SELECT c.c_nationkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(o.o_orderkey) AS BIGINT) AS sum_okey
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_nationkey""".stripMargin,

    // Incremental content-dedup replay: same arrival derivation, text
    // membership against the history (md5 equality == text equality on
    // the fixture's exact bytes).
    "q_incr_dedup" -> IncrDedupSql,

    // the streaming leg is stateless per batch — same oracle
    "q_stream_incrdedup" -> IncrDedupSql,

    // Snapshot-diff replay: rebuild the derived next-crawl snapshot and
    // full-outer-join on id; content equality replays as direct text
    // comparison (the engine compares md5 fingerprints of the same
    // bytes — equal iff the texts are).
    "q_snapshot_diff" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 3 THEN text || ' updated content'
        |         ELSE text END AS text
        |  FROM documents WHERE doc_id % 23 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |    'new page for ' || CAST(doc_id AS VARCHAR) AS text
        |  FROM documents WHERE doc_id % 11 = 5
        |)
        |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
        |  CASE WHEN a.doc_id IS NULL THEN 'added'
        |       WHEN b.doc_id IS NULL THEN 'removed'
        |       WHEN a.text <> b.text THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id""".stripMargin,

    // Streaming snapshot-diff replay: the batch diff restricted to the
    // arrived (next-crawl) side — removed rows have no arrival event.
    "q_stream_snapshot" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 3 THEN text || ' updated content'
        |         ELSE text END AS text
        |  FROM documents WHERE doc_id % 23 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |    'new page for ' || CAST(doc_id AS VARCHAR) AS text
        |  FROM documents WHERE doc_id % 11 = 5
        |)
        |SELECT b.doc_id,
        |  CASE WHEN a.doc_id IS NULL THEN 'added'
        |       WHEN a.text <> b.text THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM b LEFT JOIN documents a ON a.doc_id = b.doc_id""".stripMargin,

    // Triangle replay: same edge CTE symmetrized + deduped, the same
    // deg*2^32+id rank key orientation, wedge at the lowest-rank
    // vertex, closing-edge equi-join, per-node count over the three
    // corners, zero-filled over all docs.
    "q_triangles" -> {
      s"""WITH $LinkEdgeCtes,
         |und AS (
         |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM e
         |), deg AS (
         |  SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
         |    SELECT a AS n FROM und UNION ALL SELECT b AS n FROM und)
         |  GROUP BY n
         |), o AS (
         |  SELECT CASE WHEN da.d * 4294967296 + u.a < db.d * 4294967296 + u.b
         |              THEN u.a ELSE u.b END AS x,
         |         CASE WHEN da.d * 4294967296 + u.a < db.d * 4294967296 + u.b
         |              THEN u.b ELSE u.a END AS y,
         |         CASE WHEN da.d * 4294967296 + u.a < db.d * 4294967296 + u.b
         |              THEN db.d * 4294967296 + u.b
         |              ELSE da.d * 4294967296 + u.a END AS ry
         |  FROM und u
         |  JOIN deg da ON da.n = u.a JOIN deg db ON db.n = u.b
         |), tri AS (
         |  SELECT e1.x AS u, e1.y AS v, e2.y AS w
         |  FROM o e1
         |  JOIN o e2 ON e1.x = e2.x AND e1.ry < e2.ry
         |  JOIN o e3 ON e3.x = e1.y AND e3.y = e2.y
         |), cnt AS (
         |  SELECT n, CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT u AS n FROM tri UNION ALL
         |    SELECT v AS n FROM tri UNION ALL
         |    SELECT w AS n FROM tri)
         |  GROUP BY n
         |)
         |SELECT d.doc_id, COALESCE(c.c, CAST(0 AS BIGINT)) AS n_triangles
         |FROM documents d LEFT JOIN cnt c ON c.n = d.doc_id""".stripMargin
    },

    // WARC replay: rebuild the same files (string_agg ordered by doc_id
    // mirrors the sorted-struct concat), then walk records with a
    // recursive CTE carrying (off, stop) — each step parses the record
    // at off by its declared Content-Length exactly like the kernel:
    // magic check, CRLF CRLF header split, regexp header extraction,
    // terminator check at off + len; a failed check emits _corrupt and
    // sets stop. The trap payloads (embedded WARC/1.0) parse cleanly
    // because nothing ever scans for magic past the first record.
    "q_warc_ingest" -> WarcIngestSql,

    // the streaming leg is stateless per batch — the SAME oracle
    // checks the appended record set
    "q_stream_warc" -> WarcIngestSql,

    // SQ8 replay: per-dim min/max over the FULL corpus (query row
    // included, matching sq8TopK's stats-before-exclusion), the code
    // map's exact IEEE shape — floor((x - mn) * 255.0 / (mx - mn) + 0.5),
    // left-associated — and integer dot scoring. qdot sums BIGINTs into
    // HUGEINT in DuckDB; the final CAST restores the engine type.
    "q_sq8_topk" ->
      ("WITH " + sq8Ctes +
        "\nSELECT id, qdot FROM scored ORDER BY qdot DESC, id LIMIT 20"),

    // SQ8 recall audit: how many of the quantized top-20 are in the
    // exact round-6 cosine top-20 — the measurement a quantized index
    // ships with. Both legs reuse the hash-checked constructions
    // (sq8Ctes == q_sq8_topk; ex == q_cosine_topk's round-6 rank).
    "q_sq8_recall" ->
      ("WITH " + sq8Ctes +
        """, ex AS (
          |  SELECT e2.vec_id AS id,
          |    round(list_cosine_similarity(e2.embedding::DOUBLE[], q2.qv), 6) AS cosine
          |  FROM embeddings e2,
          |    (SELECT embedding::DOUBLE[] AS qv FROM embeddings
          |     WHERE vec_id = (SELECT min(vec_id) FROM embeddings)) q2
          |  WHERE e2.vec_id <> (SELECT min(vec_id) FROM embeddings)
          |  ORDER BY cosine DESC, id LIMIT 20
          |), s8 AS (
          |  SELECT id FROM scored ORDER BY qdot DESC, id LIMIT 20
          |)
          |SELECT CAST(count(*) AS BIGINT) AS n_common
          |FROM s8 JOIN ex USING (id)""".stripMargin),

    // CSV ingest replay, component-wise (the url_normalize convention):
    // the oracle regenerates the FIELD VALUES the RFC 4180 round-trip
    // must recover — comma and doubled-quote injections land in the
    // parsed text verbatim — and the truncation lane's verdict; the
    // generic parser behavior (quoting, token-count gating) is pinned
    // by CsvIngestSpec hand cases.
    "q_csv_ingest" ->
      """WITH t AS (
        |  SELECT doc_id, lang, source, n_chars,
        |    concat(text,
        |      CASE WHEN doc_id % 6 = 0 THEN ', comma extra' ELSE '' END,
        |      CASE WHEN doc_id % 9 = 4 THEN ' says "hi" ok' ELSE '' END) AS tf,
        |    doc_id % 13 = 7 AS corrupt
        |  FROM documents
        |)
        |SELECT doc_id, NOT corrupt AS valid,
        |  CASE WHEN corrupt THEN NULL ELSE doc_id END AS cid,
        |  CASE WHEN corrupt THEN NULL ELSE lang END AS lang,
        |  CASE WHEN corrupt THEN NULL ELSE source END AS source,
        |  CASE WHEN corrupt THEN NULL ELSE CAST(n_chars AS BIGINT) END AS n_chars_parsed,
        |  CASE WHEN corrupt THEN NULL ELSE CAST(len(tf) AS BIGINT) END AS text_chars
        |FROM t""".stripMargin,

    // Composed cleaning pipeline: the three shared CTE generators chain
    // exactly as the Spark operators do (norm -> paras-over-norm ->
    // dedup -> gate-over-clean), with the para stats joined from rdoc —
    // a pure replay join on doc_id, NOT a lineage re-derivation (the
    // Spark side carries them as passthrough columns).
    "q_clean_pipeline" ->
      ("WITH " + textNormCtes("documents") +
        ", ns AS (SELECT doc_id, norm_text AS text FROM n),\n" +
        paraDedupCtes("ns") +
        ", qsrc AS (SELECT doc_id, clean_text AS text FROM rdoc),\n" +
        qualityGateCtes("qsrc") +
        s""", r AS (
           |  SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           |    $QgLenOk AS len_ok,
           |    $QgDivOk AS diversity_ok,
           |    $QgStopOk AS stop_ok,
           |    $QgTopOk AS toptok_ok,
           |    $QgRepOk AS rep_ok
           |  FROM h
           |)
           |SELECT r.doc_id, n_tokens, len_ok, diversity_ok, stop_ok,
           |  toptok_ok, rep_ok,
           |  len_ok AND diversity_ok AND stop_ok AND toptok_ok AND rep_ok AS keep,
           |  kept_paras, dropped_paras
           |FROM r JOIN rdoc ON r.doc_id = rdoc.doc_id""".stripMargin),

    // JSONL ingest replay: regenerate the record (concat, truncation for
    // doc_id % 17), then json_valid-guarded extraction — CASE guards keep
    // DuckDB from erroring on the planted corrupt rows while yielding the
    // same NULL fields Spark's from_json produces.
    "q_json_ingest" ->
      """WITH gen AS (
        |  SELECT doc_id,
        |    concat('{"id": ', CAST(doc_id AS VARCHAR),
        |           ', "meta": {"lang": "', lang,
        |           '", "source": "', source,
        |           '", "n_chars": ', CAST(n_chars AS VARCHAR),
        |           '}, "tags": ',
        |           CASE WHEN doc_id % 3 = 0 THEN '["wiki", "ref"]'
        |                WHEN doc_id % 3 = 1 THEN '["web"]'
        |                ELSE '[]' END,
        |           ', "text": "', text, '"}') AS fj
        |  FROM documents
        |), rec AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 17 = 0 THEN substr(fj, 1, len(fj) - 5)
        |         ELSE fj END AS j
        |  FROM gen
        |)
        |SELECT doc_id,
        |  json_valid(j) AS valid,
        |  CASE WHEN json_valid(j) THEN CAST(json_extract(j, '$.id') AS BIGINT) END AS jid,
        |  CASE WHEN json_valid(j) THEN json_extract_string(j, '$.meta.lang') END AS lang,
        |  CASE WHEN json_valid(j) THEN json_extract_string(j, '$.meta.source') END AS source,
        |  CASE WHEN json_valid(j) THEN CAST(json_array_length(j, '$.tags') AS BIGINT) END AS n_tags,
        |  CASE WHEN json_valid(j) THEN json_extract_string(j, '$.tags[0]') END AS tag0,
        |  CASE WHEN json_valid(j) THEN CAST(len(json_extract_string(j, '$.text')) AS BIGINT) END AS text_chars
        |FROM rec""".stripMargin,

    // ExactSubstr replay: k-gram anchors with 0-based positions, the
    // duplicated set (min != max doc over postings), and the per-doc
    // merge window pos_next <= pos_prev + k — the same arithmetic SHAPE
    // as the Spark path (lag + running sum of breaks). Docs shorter than
    // k tokens generate no anchor (generate_series upper bound 0).
    "q_exact_substr" -> {
      val k = ExactSubstrK
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
         |), kg0 AS (
         |  SELECT doc_id, ts,
         |         unnest(generate_series(1, greatest(len(ts) - ${k - 1}, 0))) AS i
         |  FROM toks
         |), kg AS (
         |  SELECT doc_id, i - 1 AS pos,
         |         array_to_string(ts[i:i + ${k - 1}], ' ') AS g
         |  FROM kg0
         |), dup AS (
         |  SELECT g FROM kg GROUP BY g HAVING min(doc_id) <> max(doc_id)
         |), dpos AS (
         |  SELECT doc_id, pos FROM kg JOIN dup USING (g)
         |), marked AS (
         |  SELECT doc_id, pos,
         |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $k
         |              THEN 0 ELSE 1 END AS brk
         |  FROM dpos
         |), sp AS (
         |  SELECT doc_id, pos,
         |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
         |  FROM marked
         |), agg AS (
         |  SELECT doc_id, sid, min(pos) AS span_start, max(pos) + $k AS span_end,
         |         count(*) AS n_windows
         |  FROM sp GROUP BY doc_id, sid
         |)
         |SELECT a.doc_id,
         |       CAST(a.span_start AS BIGINT) AS span_start,
         |       CAST(a.span_end AS BIGINT) AS span_end,
         |       CAST(a.span_end - a.span_start AS BIGINT) AS n_tokens,
         |       CAST(a.n_windows AS BIGINT) AS n_windows,
         |       array_to_string(t.ts[a.span_start + 1:a.span_end], ' ') AS span_text
         |FROM agg a JOIN toks t ON a.doc_id = t.doc_id""".stripMargin
    },

    // Span-removal rewrite: occurrence-level spans (start s, inclusive end
    // e) whose gram is owned by an earlier doc mark their covered token
    // positions; surviving tokens re-join with ' '. Short docs (<3 tokens)
    // carry one whole-text span covering every position — the same
    // convention as the Spark shingles() function.
    "q_span_rewrite" ->
      """WITH tt AS (
        |  SELECT doc_id AS id, text, string_split(text, ' ') AS t FROM documents
        |), sh AS (
        |  SELECT id, i AS s, i + 2 AS e, t[i] || '_' || t[i+1] || '_' || t[i+2] AS gram
        |  FROM (SELECT id, t, unnest(range(1, len(t) - 1)) AS i FROM tt WHERE len(t) >= 3)
        |  UNION ALL
        |  SELECT id, 1 AS s, len(t) AS e, replace(text, ' ', '_') AS gram
        |  FROM tt WHERE len(t) < 3
        |), owners AS (
        |  SELECT gram, min(id) AS owner
        |  FROM (SELECT DISTINCT id, gram FROM sh) GROUP BY gram
        |), bad AS (
        |  SELECT DISTINCT sh.id, sh.s, sh.e
        |  FROM sh JOIN owners USING (gram) WHERE owners.owner <> sh.id
        |), pos AS (
        |  SELECT id, i, t[i] AS tok
        |  FROM (SELECT id, t, unnest(range(1, len(t) + 1)) AS i FROM tt)
        |), kept AS (
        |  SELECT p.id, p.i, p.tok FROM pos p
        |  WHERE NOT EXISTS (SELECT 1 FROM bad b
        |                    WHERE b.id = p.id AND p.i BETWEEN b.s AND b.e)
        |)
        |SELECT tt.id AS doc_id,
        |       cast(len(tt.t) AS BIGINT) AS n_tokens,
        |       cast(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
        |       coalesce(k.rewritten, '') AS rewritten
        |FROM tt LEFT JOIN (
        |  SELECT id, count(*) AS n_kept,
        |         string_agg(tok, ' ' ORDER BY i) AS rewritten
        |  FROM kept GROUP BY id) k ON k.id = tt.id""".stripMargin,

    // Capped span rewrite: identical shape, but grams present in more
    // than 2 distinct documents leave the analysis entirely (neither
    // ownership nor dup evidence) before owners/bad are derived.
    "q_span_rewrite_capped" ->
      """WITH tt AS (
        |  SELECT doc_id AS id, text, string_split(text, ' ') AS t FROM documents
        |), sh AS (
        |  SELECT id, i AS s, i + 2 AS e, t[i] || '_' || t[i+1] || '_' || t[i+2] AS gram
        |  FROM (SELECT id, t, unnest(range(1, len(t) - 1)) AS i FROM tt WHERE len(t) >= 3)
        |  UNION ALL
        |  SELECT id, 1 AS s, len(t) AS e, replace(text, ' ', '_') AS gram
        |  FROM tt WHERE len(t) < 3
        |), hot AS (
        |  SELECT gram FROM (SELECT DISTINCT id, gram FROM sh)
        |  GROUP BY gram HAVING count(*) > 2
        |), shc AS (
        |  SELECT * FROM sh WHERE gram NOT IN (SELECT gram FROM hot)
        |), owners AS (
        |  SELECT gram, min(id) AS owner
        |  FROM (SELECT DISTINCT id, gram FROM shc) GROUP BY gram
        |), bad AS (
        |  SELECT DISTINCT shc.id, shc.s, shc.e
        |  FROM shc JOIN owners USING (gram) WHERE owners.owner <> shc.id
        |), pos AS (
        |  SELECT id, i, t[i] AS tok
        |  FROM (SELECT id, t, unnest(range(1, len(t) + 1)) AS i FROM tt)
        |), kept AS (
        |  SELECT p.id, p.i, p.tok FROM pos p
        |  WHERE NOT EXISTS (SELECT 1 FROM bad b
        |                    WHERE b.id = p.id AND p.i BETWEEN b.s AND b.e)
        |)
        |SELECT tt.id AS doc_id,
        |       cast(len(tt.t) AS BIGINT) AS n_tokens,
        |       cast(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
        |       coalesce(k.rewritten, '') AS rewritten
        |FROM tt LEFT JOIN (
        |  SELECT id, count(*) AS n_kept,
        |         string_agg(tok, ' ' ORDER BY i) AS rewritten
        |  FROM kept GROUP BY id) k ON k.id = tt.id""".stripMargin,

    // Winnowing replay: per-start packed key = 32-bit-md5(gram) * 2^30 +
    // position (lexicographic (hash, pos) min under integer order), one
    // list_min per window of 4, distinct selections. Shingle CTE shares
    // the q_span_rewrite shape; the md5-prefix hash is the documented
    // md5Bits32 twin.
    "q_winnow" ->
      """WITH tt AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(t) < 3 THEN [replace(text, ' ', '_')]
        |         ELSE list_transform(range(1, len(t) - 1),
        |                i -> t[i] || '_' || t[i + 1] || '_' || t[i + 2])
        |    END AS g
        |  FROM tt
        |), keys AS (
        |  SELECT doc_id, list_transform(range(len(g)),
        |    i -> ('0x' || substr(md5(g[i + 1]), 1, 8))::BIGINT * 1073741824
        |         + (i + 1)) AS ks
        |  FROM sh
        |), sel AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |      range(greatest(len(ks) - 3, 1)),
        |      j -> list_min(ks[j + 1 : j + 4])))) AS key
        |  FROM keys
        |)
        |SELECT doc_id, cast(key % 1073741824 AS BIGINT) AS pos,
        |       cast(key // 1073741824 AS BIGINT) AS fp
        |FROM sel""".stripMargin,

    // Same winnowing replay, then a distinct-fingerprint self-join.
    "q_winnow_pairs" ->
      """WITH tt AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(t) < 3 THEN [replace(text, ' ', '_')]
        |         ELSE list_transform(range(1, len(t) - 1),
        |                i -> t[i] || '_' || t[i + 1] || '_' || t[i + 2])
        |    END AS g
        |  FROM tt
        |), keys AS (
        |  SELECT doc_id, list_transform(range(len(g)),
        |    i -> ('0x' || substr(md5(g[i + 1]), 1, 8))::BIGINT * 1073741824
        |         + (i + 1)) AS ks
        |  FROM sh
        |), sel AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |      range(greatest(len(ks) - 3, 1)),
        |      j -> list_min(ks[j + 1 : j + 4])))) AS key
        |  FROM keys
        |), fpd AS (
        |  SELECT DISTINCT doc_id, key // 1073741824 AS fp FROM sel
        |)
        |SELECT a.doc_id AS rid, b.doc_id AS sid,
        |       cast(count(*) AS BIGINT) AS n_shared
        |FROM fpd a JOIN fpd b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING count(*) >= 2""".stripMargin,

    // Same winnowing replay with positions kept: per qualifying pair,
    // count(DISTINCT fp) (== q_winnow_pairs' n_shared) + min/max matched
    // positions per side over the (fp, rpos, spos) evidence rows.
    "q_winnow_spans" ->
      """WITH tt AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(t) < 3 THEN [replace(text, ' ', '_')]
        |         ELSE list_transform(range(1, len(t) - 1),
        |                i -> t[i] || '_' || t[i + 1] || '_' || t[i + 2])
        |    END AS g
        |  FROM tt
        |), keys AS (
        |  SELECT doc_id, list_transform(range(len(g)),
        |    i -> ('0x' || substr(md5(g[i + 1]), 1, 8))::BIGINT * 1073741824
        |         + (i + 1)) AS ks
        |  FROM sh
        |), sel AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |      range(greatest(len(ks) - 3, 1)),
        |      j -> list_min(ks[j + 1 : j + 4])))) AS key
        |  FROM keys
        |), fpp AS (
        |  SELECT doc_id, key // 1073741824 AS fp, key % 1073741824 AS pos
        |  FROM sel
        |)
        |SELECT a.doc_id AS rid, b.doc_id AS sid,
        |       cast(count(DISTINCT a.fp) AS BIGINT) AS n_shared,
        |       cast(min(a.pos) AS BIGINT) AS rid_lo,
        |       cast(max(a.pos) AS BIGINT) AS rid_hi,
        |       cast(min(b.pos) AS BIGINT) AS sid_lo,
        |       cast(max(b.pos) AS BIGINT) AS sid_hi
        |FROM fpp a JOIN fpp b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING count(DISTINCT a.fp) >= 2""".stripMargin,

    "q_oov_rate" ->
      """WITH toks AS (
        |  SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok FROM documents
        |), vocab AS (
        |  SELECT tok, 1 AS in_vocab FROM (
        |    SELECT tok, count(*) AS c FROM toks GROUP BY tok
        |    ORDER BY c DESC, tok LIMIT 50)
        |)
        |SELECT t.id AS doc_id,
        |       cast(count(*) AS BIGINT) AS n_tokens,
        |       cast(sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |       round(cast(sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |             / count(*), 6) AS oov_frac
        |FROM toks t LEFT JOIN vocab v USING (tok)
        |GROUP BY t.id""".stripMargin,

    "q_contamination" ->
      """WITH sh AS (
        |  SELECT doc_id, source, unnest(
        |    CASE WHEN len(t) < 3 THEN [replace(text, ' ', '_')]
        |         ELSE list_transform(range(1, len(t) - 1),
        |                i -> t[i] || '_' || t[i + 1] || '_' || t[i + 2])
        |    END) AS gram
        |  FROM (SELECT doc_id, source, text, string_split(text, ' ') AS t FROM documents)
        |), ds AS (
        |  SELECT DISTINCT doc_id, source, gram FROM sh
        |)
        |SELECT e.doc_id AS eval_id, t.doc_id AS train_id,
        |       cast(count(*) AS BIGINT) AS n_shared
        |FROM ds e JOIN ds t ON e.gram = t.gram
        |WHERE e.source = 'src0' AND t.source <> 'src0'
        |GROUP BY 1, 2""".stripMargin,

    // Capped decontamination: identical shape, but grams appearing in
    // more than 2 distinct TRAIN documents are excluded before the join.
    "q_contamination_capped" ->
      """WITH sh AS (
        |  SELECT doc_id, source, unnest(
        |    CASE WHEN len(t) < 3 THEN [replace(text, ' ', '_')]
        |         ELSE list_transform(range(1, len(t) - 1),
        |                i -> t[i] || '_' || t[i + 1] || '_' || t[i + 2])
        |    END) AS gram
        |  FROM (SELECT doc_id, source, text, string_split(text, ' ') AS t FROM documents)
        |), ds AS (
        |  SELECT DISTINCT doc_id, source, gram FROM sh
        |), hot AS (
        |  SELECT gram FROM ds WHERE source <> 'src0'
        |  GROUP BY gram HAVING count(*) > 2
        |)
        |SELECT e.doc_id AS eval_id, t.doc_id AS train_id,
        |       cast(count(*) AS BIGINT) AS n_shared
        |FROM ds e JOIN ds t ON e.gram = t.gram
        |WHERE e.source = 'src0' AND t.source <> 'src0'
        |  AND e.gram NOT IN (SELECT gram FROM hot)
        |GROUP BY 1, 2""".stripMargin,

    "q_shuffle_rank" ->
      """SELECT doc_id, cast(row_number() OVER (
        |  ORDER BY ('0x' || substr(md5('shuf:' || cast(doc_id AS VARCHAR)), 1, 8))::BIGINT,
        |           doc_id) AS BIGINT) AS shuffle_rank
        |FROM documents""".stripMargin,

    // Unigram surprisal: bitlen via binary-string length in both engines
    // (Spark bin(), DuckDB bin() — no leading zeros either side), so the
    // whole score is integer arithmetic plus one rational mean.
    "q_lm_surprisal" ->
      """WITH toks AS (
        |  SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok FROM documents
        |), counts AS (
        |  SELECT tok, count(*) AS c FROM toks GROUP BY tok
        |), tot AS (
        |  SELECT cast(sum(c) AS BIGINT) AS total_c FROM counts
        |)
        |SELECT t.id AS doc_id,
        |       cast(count(*) AS BIGINT) AS n_tokens,
        |       cast(sum(length(bin(tot.total_c)) - length(bin(c.c))) AS BIGINT) AS sum_bits,
        |       round(cast(sum(length(bin(tot.total_c)) - length(bin(c.c))) AS DOUBLE)
        |             / count(*), 6) AS mean_bits
        |FROM toks t JOIN counts c USING (tok) CROSS JOIN tot
        |GROUP BY t.id""".stripMargin,

    "q_retention" ->
      """WITH e AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events
        |), c AS (
        |  SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1
        |)
        |SELECT c.cohort_day, e.day - c.cohort_day AS age_days,
        |       count(DISTINCT e.user_id) AS n_users
        |FROM e JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    "q_salted_join" ->
      """SELECT o.o_orderstatus, count(*) AS n,
        |       round(cast(sum(l.l_quantity) AS DOUBLE), 6) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1""".stripMargin,

    // cut tokens END their chunk: a token's chunk ordinal is the count of
    // cut tokens strictly before it (windowed), which is exactly the
    // operator's sequential chunk assembly
    "q_cdc_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), pos AS (
        |  SELECT doc_id, unnest(t) AS tok, unnest(range(len(t))) AS i FROM toks
        |), flagged AS (
        |  SELECT doc_id, tok, i,
        |         CASE WHEN ('0x' || substr(md5(tok), 1, 8))::BIGINT % 32 = 0
        |              THEN 1 ELSE 0 END AS cut
        |  FROM pos
        |), chunked AS (
        |  SELECT doc_id, tok, i,
        |         coalesce(sum(cut) OVER (PARTITION BY doc_id ORDER BY i
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cidx
        |  FROM flagged
        |), chunks AS (
        |  SELECT doc_id, cast(cidx AS BIGINT) AS chunk_idx,
        |         cast(count(*) AS BIGINT) AS n_tokens,
        |         md5(string_agg(tok, ' ' ORDER BY i)) AS chunk_fp
        |  FROM chunked GROUP BY doc_id, cidx
        |)
        |SELECT doc_id, chunk_idx, n_tokens, chunk_fp,
        |       min(doc_id) OVER (PARTITION BY chunk_fp) AS owner_id
        |FROM chunks""".stripMargin,

    // DSIR importance selection: pure-integer bitlen LLR scores and an
    // integer ceil cut; row_number over (score_bits DESC, doc_id) is the
    // same total order as the engine's (-score, id) rankByKey.
    "q_dsir_select" ->
      """WITH toks AS (
        |  SELECT doc_id AS id, lang, string_split(text, ' ') AS t FROM documents
        |), bgs AS (
        |  SELECT id, lang,
        |         unnest(list_transform(range(1, len(t)),
        |                i -> t[i] || ' ' || t[i + 1])) AS f
        |  FROM toks
        |), counts AS (
        |  SELECT f, cast(count(*) AS BIGINT) AS craw,
        |         cast(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct
        |  FROM bgs GROUP BY f
        |), tot AS (
        |  SELECT cast(sum(craw) AS BIGINT) AS traw,
        |         cast(sum(ct) AS BIGINT) AS tt FROM counts
        |), per AS (
        |  SELECT b.id, cast(count(*) AS BIGINT) AS n_bigrams,
        |         cast(sum(length(bin(c.ct + 1)) - length(bin(tot.tt + 1))
        |                  - length(bin(c.craw)) + length(bin(tot.traw))) AS BIGINT)
        |           AS score_bits
        |  FROM bgs b JOIN counts c USING (f) CROSS JOIN tot
        |  GROUP BY b.id
        |), ranked AS (
        |  SELECT d.doc_id,
        |         cast(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |         cast(coalesce(per.score_bits, 0) AS BIGINT) AS score_bits,
        |         cast(row_number() OVER (
        |           ORDER BY coalesce(per.score_bits, 0) DESC, d.doc_id)
        |           AS BIGINT) AS dsir_rank,
        |         cast(count(*) OVER () AS BIGINT) AS n
        |  FROM documents d LEFT JOIN per ON d.doc_id = per.id
        |)
        |SELECT doc_id, n_bigrams, score_bits, dsir_rank,
        |       dsir_rank <= (n * 1 + 3) // 4 AS keep
        |FROM ranked""".stripMargin,

    "q_bigram_surprisal" ->
      """WITH toks AS (
        |  SELECT doc_id AS id, string_split(text, ' ') AS t FROM documents
        |), bgs AS (
        |  SELECT id, p[1] AS prev, p[2] AS cur FROM (
        |    SELECT id, unnest(list_transform(range(1, len(t)),
        |                  i -> [t[i], t[i + 1]])) AS p
        |    FROM toks)
        |), ctx AS (
        |  SELECT prev, count(*) AS cp FROM bgs GROUP BY 1
        |), pc AS (
        |  SELECT prev, cur, count(*) AS cpc FROM bgs GROUP BY 1, 2
        |), per AS (
        |  SELECT b.id, cast(count(*) AS BIGINT) AS n_bigrams,
        |         cast(sum(length(bin(ctx.cp)) - length(bin(pc.cpc))) AS BIGINT) AS sum_bits
        |  FROM bgs b JOIN pc USING (prev, cur) JOIN ctx USING (prev)
        |  GROUP BY b.id
        |)
        |SELECT d.doc_id,
        |       cast(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |       cast(coalesce(per.sum_bits, 0) AS BIGINT) AS sum_bits,
        |       CASE WHEN per.n_bigrams IS NULL THEN 0.0
        |            ELSE round(cast(per.sum_bits AS DOUBLE) / per.n_bigrams, 6)
        |       END AS mean_bits
        |FROM documents d LEFT JOIN per ON per.id = d.doc_id""".stripMargin,

    // mirrors TfIdf.cosineJoin's arithmetic shape exactly: raw-weight dot
    // divided by the two norms (NOT a dot of pre-normalized weights —
    // FP-distinct); smooth idf = ln((N+1)/(df+1)) + 1
    "q_tfidf_pairs" ->
      """WITH tf AS (
        |  SELECT doc_id AS id, tok, cast(count(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1, 2
        |), dfreq AS (
        |  SELECT tok, cast(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1
        |), nn AS (
        |  SELECT cast(count(*) AS DOUBLE) AS n FROM documents
        |), w AS (
        |  SELECT tf.id, tf.tok, tf.tf * (ln((nn.n + 1) / (dfreq.df + 1)) + 1) AS w
        |  FROM tf JOIN dfreq USING (tok) CROSS JOIN nn
        |), nrm AS (
        |  SELECT id, sqrt(sum(w * w)) AS nd FROM w GROUP BY 1
        |), dots AS (
        |  SELECT a.id AS rid, b.id AS sid, sum(a.w * b.w) AS dot
        |  FROM w a JOIN w b ON a.tok = b.tok AND a.id < b.id
        |  GROUP BY 1, 2
        |)
        |SELECT rid, sid, round(dot / (na.nd * nb.nd), 6) AS cosine
        |FROM dots JOIN nrm na ON na.id = rid JOIN nrm nb ON nb.id = sid
        |WHERE dot / (na.nd * nb.nd) >= 0.9""".stripMargin,

    "q_pack_sequences" ->
      ("WITH " + packCtes("documents") + "\n" + PackSelect),

    // same score arithmetic as q_quality; the running total and the
    // budget cut are pure integers over the (score desc, doc_id) order
    "q_token_budget" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    list_distinct(string_split(text, ' ')) AS dtoks
        |  FROM documents
        |), h AS (
        |  SELECT doc_id, lang, n_tokens, len(dtoks) AS n_distinct,
        |    len(list_filter(['the','and','of','to','in','is','with','for'],
        |        m -> list_contains(dtoks, m))) AS en_hits
        |  FROM t
        |), scored AS (
        |  SELECT doc_id, lang, cast(n_tokens AS BIGINT) AS n_tokens,
        |    round(least(cast(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.3 +
        |          (cast(n_distinct AS DOUBLE) / n_tokens) * 0.4 +
        |          least((cast(en_hits AS DOUBLE) / n_distinct) * 5.0, 1.0) * 0.3, 6)
        |      AS score
        |  FROM h
        |), c AS (
        |  SELECT doc_id, lang, n_tokens, score,
        |    cast(sum(n_tokens) OVER (PARTITION BY lang
        |      ORDER BY score DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM scored
        |)
        |SELECT doc_id, lang, n_tokens, score, cum FROM c WHERE cum <= 2500""".stripMargin,

    // mixture arithmetic is all-integer (// and % on BIGINTs; sum(wt)
    // cast from DuckDB's HUGEINT), the partial-epoch order is the
    // fixed-sample md5 idiom, and the epoch fan-out is range(n_full+1):
    // epochs < n_full are whole, epoch n_full keeps cum <= rem
    "q_domain_mix" ->
      """WITH w(grp, wt) AS (VALUES ('src0', 5), ('src1', 3), ('src2', 2), ('src3', 1)),
        |t AS (
        |  SELECT doc_id AS id, source AS grp,
        |         cast(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT id, grp, n_tokens,
        |         cast(sum(n_tokens) OVER (PARTITION BY grp
        |           ORDER BY ('0x' || substr(md5(grp || ':' || cast(id AS VARCHAR)), 1, 8))::BIGINT, id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM t
        |), g AS (
        |  SELECT t.grp, cast(sum(n_tokens) AS BIGINT) AS tot,
        |         cast(any_value(wt) AS BIGINT) AS wt
        |  FROM t JOIN w ON t.grp = w.grp GROUP BY t.grp
        |), e AS (
        |  SELECT grp,
        |         (20000 * wt) // cast((SELECT sum(wt) FROM w) AS BIGINT) // tot AS n_full,
        |         (20000 * wt) // cast((SELECT sum(wt) FROM w) AS BIGINT) % tot AS rem
        |  FROM g WHERE tot > 0
        |), ep AS (
        |  SELECT unnest(range(cast((SELECT max(n_full) FROM e) AS BIGINT) + 1)) AS epoch
        |)
        |SELECT c.id AS doc_id, c.grp AS source, cast(ep.epoch AS BIGINT) AS epoch,
        |       c.n_tokens, c.cum
        |FROM c JOIN e USING (grp) JOIN ep ON ep.epoch <= e.n_full
        |WHERE ep.epoch < e.n_full OR c.cum <= e.rem""".stripMargin,

    "q_quality" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    list_distinct(string_split(text, ' ')) AS dtoks
        |  FROM documents
        |), h AS (
        |  SELECT doc_id, n_tokens, len(dtoks) AS n_distinct,
        |    len(list_filter(['the','and','of','to','in','is','with','for'],
        |        m -> list_contains(dtoks, m))) AS en_hits
        |  FROM t
        |)
        |SELECT doc_id,
        |  round(least(cast(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.3 +
        |        (cast(n_distinct AS DOUBLE) / n_tokens) * 0.4 +
        |        least((cast(en_hits AS DOUBLE) / n_distinct) * 5.0, 1.0) * 0.3, 6) AS score
        |FROM h""".stripMargin,

    // Quality gate: every rule is integer arithmetic (cross-multiplied
    // ratios), so the booleans are engine-exact — no FP threshold.
    "q_quality_gate" ->
      ("WITH " + qualityGateCtes("documents") +
        s""", r AS (
           |  SELECT doc_id, cast(n AS BIGINT) AS n_tokens,
           |    $QgLenOk AS len_ok,
           |    $QgDivOk AS diversity_ok,
           |    $QgStopOk AS stop_ok,
           |    $QgTopOk AS toptok_ok,
           |    $QgRepOk AS rep_ok
           |  FROM h
           |)
           |SELECT doc_id, n_tokens, len_ok, diversity_ok, stop_ok, toptok_ok,
           |       rep_ok,
           |       len_ok AND diversity_ok AND stop_ok AND toptok_ok AND rep_ok
           |         AS keep
           |FROM r""".stripMargin),

    // patterns interpolated from the SAME constants the operator uses
    // (CorpusOps.EmailPattern etc.), so operator and oracle cannot drift;
    // the three-step CTE chain replays the fixed email->phone->ip order
    "q_pii_scrub" -> {
      val em = CorpusOps.EmailPattern
      val ph = CorpusOps.PhonePattern
      val ip = CorpusOps.Ipv4Pattern
      s"""WITH c AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 5 <> 4 THEN ' contact user' ||
         |      CAST(doc_id AS VARCHAR) || '@mail.example.com now' ELSE '' END ||
         |    CASE WHEN doc_id % 3 = 0 THEN ' call +1-555-' ||
         |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
         |    CASE WHEN doc_id % 7 = 0 THEN ' from 10.' ||
         |      CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
         |      CAST(doc_id % 100 AS VARCHAR) ELSE '' END AS t0
         |  FROM documents
         |), s1 AS (
         |  SELECT doc_id, CAST(len(regexp_extract_all(t0, '$em')) AS BIGINT) AS n_email,
         |         regexp_replace(t0, '$em', '<EMAIL>', 'g') AS t1
         |  FROM c
         |), s2 AS (
         |  SELECT doc_id, n_email,
         |         CAST(len(regexp_extract_all(t1, '$ph')) AS BIGINT) AS n_phone,
         |         regexp_replace(t1, '$ph', '<PHONE>', 'g') AS t2
         |  FROM s1
         |), s3 AS (
         |  SELECT doc_id, n_email, n_phone,
         |         CAST(len(regexp_extract_all(t2, '$ip')) AS BIGINT) AS n_ip,
         |         regexp_replace(t2, '$ip', '<IP>', 'g') AS t3
         |  FROM s2
         |)
         |SELECT doc_id, t3 AS clean_text, n_email, n_phone, n_ip FROM s3""".stripMargin
    },

    // HTML extraction replay: the `lines` CTE regenerates HtmlOps.htmlWrap
    // one block-line per row (concat_ws-joined on the Spark side, so the
    // per-line view is the same document); `ext` replays tag-strip (tags
    // are word separators), whitespace normalization, the 5-entity decode
    // (amp LAST — matches the kernel's single-pass longest-match), anchor
    // link-char sums; the keep rule is integer-exact. script/style blocks
    // carry no text by the kernel's content-skip, so they are excluded
    // from both counts here.
    "q_html_extract" ->
      """WITH lines AS (
        |  SELECT doc_id, 1 AS bno, '<html>' AS ln FROM documents
        |  UNION ALL SELECT doc_id, 2, '<head>' FROM documents
        |  UNION ALL SELECT doc_id, 3,
        |    concat('<title>Doc ', CAST(doc_id AS VARCHAR), ' | corpus</title>') FROM documents
        |  UNION ALL SELECT doc_id, 4,
        |    concat('<script>var page=', CAST(doc_id AS VARCHAR), ';track();</script>') FROM documents
        |  UNION ALL SELECT doc_id, 5, '</head>' FROM documents
        |  UNION ALL SELECT doc_id, 6, '<body>' FROM documents
        |  UNION ALL SELECT doc_id, 7,
        |    '<nav><a href="/home">home</a> <a href="/about">about</a> <a href="/contact">contact</a></nav>' FROM documents
        |  UNION ALL SELECT doc_id, 8, concat('<p>', text, '</p>') FROM documents
        |  UNION ALL SELECT doc_id, 9,
        |    concat('<p>see &amp; read &lt;more&gt; notes in &quot;section&quot; ',
        |           CAST(doc_id % 7 AS VARCHAR), ' today</p>')
        |    FROM documents WHERE doc_id % 4 = 0
        |  UNION ALL SELECT doc_id, 10,
        |    '<p>for background you can consult the <a href="/ref">reference</a> material listed here</p>'
        |    FROM documents WHERE doc_id % 5 = 1
        |  UNION ALL SELECT doc_id, 11,
        |    '<aside>related: <a href="/read">read this other fine article</a></aside>' FROM documents
        |  UNION ALL SELECT doc_id, 12,
        |    '<footer>copyright 2024 <a href="/terms">terms</a> <a href="/privacy">privacy</a></footer>' FROM documents
        |), ext AS (
        |  SELECT doc_id, bno,
        |    lower(regexp_extract(ln, '^<([a-zA-Z0-9]+)', 1)) AS btag,
        |    replace(replace(replace(replace(replace(
        |      trim(regexp_replace(regexp_replace(ln, '<[^>]*>', ' ', 'g'), ' +', ' ', 'g')),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&') AS dtext,
        |    coalesce(list_sum(list_transform(regexp_extract_all(ln, '<a [^>]*>([^<]*)</a>', 1),
        |      t -> len(trim(regexp_replace(t, ' +', ' ', 'g'))))), 0) AS link_chars
        |  FROM lines
        |), judged AS (
        |  SELECT doc_id, bno, dtext, len(dtext) AS chars,
        |    (len(string_split(dtext, ' ')) >= 5 AND 3 * link_chars < len(dtext)) AS keep
        |  FROM ext
        |  WHERE dtext <> '' AND btag NOT IN ('script', 'style')
        |)
        |SELECT doc_id,
        |  coalesce(string_agg(dtext, chr(10) ORDER BY bno) FILTER (WHERE keep), '') AS clean_text,
        |  CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS kept_blocks,
        |  CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS dropped_blocks,
        |  CAST(coalesce(sum(chars) FILTER (WHERE keep), 0) AS BIGINT) AS kept_chars
        |FROM judged GROUP BY doc_id""".stripMargin,

    "q_lang_id" -> {
      val hitExprs = TextCols.LangMarkers.map { case (lang, ms) =>
        val lst = ms.map(m => s"'$m'").mkString("[", ",", "]")
        s"len(list_filter($lst, m -> list_contains(dtoks, m))) AS ${lang}_hits"
      }.mkString(",\n    ")
      val best = TextCols.LangMarkers.map(l => s"${l._1}_hits").mkString("greatest(", ", ", ")")
      val cases = TextCols.LangMarkers.map { case (lang, _) =>
        s"WHEN ${lang}_hits > 0 AND ${lang}_hits = $best THEN '$lang'"
      }.mkString("\n    ")
      s"""WITH t AS (
         |  SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS dtoks
         |  FROM documents
         |), h AS (
         |  SELECT doc_id, lang,
         |    $hitExprs
         |  FROM t
         |)
         |SELECT doc_id, lang,
         |  CASE $cases ELSE 'und' END AS lang_pred
         |FROM h""".stripMargin
    },

    // Banded token-set Jaccard: i/la/lb are the same integer-valued
    // quantities as the all-pairs form (the integer subtraction
    // la + lb - i is exact in DOUBLE), so values and hashes match it.
    "q_jaccard_pairs" ->
      ("WITH " +
        jaccardBandedCtes(
          """SELECT doc_id, list_distinct(string_split(text, ' ')) AS s
            |  FROM documents""".stripMargin, 9L, 10L) +
        """
          |SELECT rid, sid, round(i / (la + lb - i), 6) AS jaccard
          |FROM pairs WHERE i / (la + lb - i) >= 0.9""".stripMargin),

    "q_cosine_topk" ->
      """WITH q AS (
        |  SELECT embedding::DOUBLE[] AS qv FROM embeddings
        |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)
        |), scored AS (
        |  SELECT e.vec_id AS id,
        |    list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS cosine
        |  FROM embeddings e, q
        |  WHERE e.vec_id <> (SELECT min(vec_id) FROM embeddings)
        |)
        |SELECT id, round(cosine, 6) AS cosine FROM scored
        |ORDER BY round(cosine, 6) DESC, id LIMIT 20""".stripMargin,

    "q_emb_neardup_exact" ->
      """SELECT a.vec_id AS rid, b.vec_id AS sid,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45""".stripMargin,

    // Same twin construction as the Spark query; the LSH output equals
    // this exact join because twin recall is 1.0 by sketch scale-invariance
    // and every candidate is exact-verified.
    //
    // ORACLE FRAGILITY (not operator correctness): equality additionally
    // relies on the fixture having NO non-twin pair with cosine >= 0.99
    // inside the probabilistic LSH gap. A different fixture/scale could
    // put a qualifying non-twin pair there and miss all 8 bands; that
    // failure mode is oracle fragility — the operator is still behaving
    // as designed (probabilistic recall, exact verification).
    "q_emb_neardup_lsh" ->
      """WITH base AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), twin AS (
        |  SELECT vec_id + 1000000 AS vec_id, list_transform(v, x -> x * 2.0) AS v
        |  FROM base
        |), allv AS (
        |  SELECT * FROM base UNION ALL SELECT * FROM twin
        |)
        |SELECT a.vec_id AS rid, b.vec_id AS sid,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cosine
        |FROM allv a JOIN allv b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.99""".stripMargin,

    // nProbe = all buckets => IVF is exact; identical to the brute-force
    // top-k oracle.
    "q_cosine_ivf" ->
      """WITH q AS (
        |  SELECT embedding::DOUBLE[] AS qv FROM embeddings
        |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)
        |), scored AS (
        |  SELECT e.vec_id AS id,
        |    list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS cosine
        |  FROM embeddings e, q
        |  WHERE e.vec_id <> (SELECT min(vec_id) FROM embeddings)
        |)
        |SELECT id, round(cosine, 6) AS cosine FROM scored
        |ORDER BY round(cosine, 6) DESC, id LIMIT 20""".stripMargin,

    "q_ann_batch" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |  FROM embeddings ORDER BY vec_id LIMIT 10
        |), scored AS (
        |  SELECT q.qid, e.vec_id AS id,
        |         list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS cosine
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid
        |)
        |SELECT qid, id, round(cosine, 6) AS cosine, cast(rank AS BIGINT) AS rank
        |FROM (SELECT qid, id, cosine, row_number() OVER (
        |        PARTITION BY qid ORDER BY round(cosine, 6) DESC, id) AS rank
        |      FROM scored)
        |WHERE rank <= 5""".stripMargin,

    // Hard-negative replay: q_ann_batch's shape with the label
    // inequality (vec_id % 5) applied before the rank window.
    "q_hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |  FROM embeddings ORDER BY vec_id LIMIT 10
        |), scored AS (
        |  SELECT q.qid, e.vec_id AS id,
        |         list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS cosine
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id <> q.qid AND e.vec_id % 5 <> q.qid % 5
        |)
        |SELECT qid, id, round(cosine, 6) AS cosine, cast(rank AS BIGINT) AS rank
        |FROM (SELECT qid, id, cosine, row_number() OVER (
        |        PARTITION BY qid ORDER BY round(cosine, 6) DESC, id) AS rank
        |      FROM scored)
        |WHERE rank <= 5""".stripMargin,

    "q_multimodal" ->
      """WITH chars AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
        |), buck AS (
        |  SELECT doc_id, ascii(ch) // 32 AS b, cast(count(*) AS DOUBLE) AS c
        |  FROM chars GROUP BY 1, 2
        |), ent AS (
        |  SELECT doc_id, round(-sum((c / n) * log2(c / n)), 6) AS entropy
        |  FROM (SELECT doc_id, b, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM buck)
        |  GROUP BY doc_id
        |)
        |SELECT d.doc_id, cast(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
        |       e.entropy
        |FROM documents d JOIN ent e ON d.doc_id = e.doc_id""".stripMargin,

    // The synthetic 16x16 image's red channel holds text byte (3i % len)
    // at pixel i; bin = byte >> 5; weights = count/256 over the dense
    // 8-bin space (documents are pure ASCII, so char == byte). Empty
    // text mirrors the Spark fallback (Multimodal.withImagePayload):
    // a single zero source byte -> every pixel byte 0 (CASE guards the
    // modulo so a degenerate corpus can't divide by zero).
    "q_image_hist" -> ImageHistSql,
    // byte-lossless bundle roundtrip of the same payloads == the same
    // histograms (Hib scaladoc; corrupt lanes are spec-owned)
    "q_hib_hist" -> ImageHistSql,

    // the binary-file scan re-reads the SAME deterministic PPM payloads
    // from disk, so the q_image_hist byte arithmetic is its oracle too —
    // any file lost in the directory round-trip drops 8 rows and fails
    "q_binary_scan" -> ImageHistSql,

    // aHash replay: 8x8 pixel i sits at (y,x)=(i//8,i%8); nearest-neighbor
    // picks source pixel (2y,2x) whose red byte index is 3*(32y+2x), so
    // v = text byte ((3*(32y+2x)) % len). Mean threshold is the strict
    // integer cross-multiplication 64*v > sum(v).
    "q_image_phash" ->
      """WITH px AS (
        |  SELECT d.doc_id, cast(r.range AS INTEGER) AS i,
        |         CASE WHEN length(d.text) = 0 THEN 0
        |              ELSE ascii(substr(d.text,
        |                ((3 * (32 * (cast(r.range AS INTEGER) // 8)
        |                       + 2 * (cast(r.range AS INTEGER) % 8)))
        |                 % length(d.text)) + 1, 1))
        |         END AS v
        |  FROM documents d CROSS JOIN range(64) r
        |), tot AS (
        |  SELECT doc_id, sum(v) AS s FROM px GROUP BY 1
        |), bits AS (
        |  SELECT p.doc_id,
        |         cast(sum(CASE WHEN p.i >= 32 AND 64 * p.v > t.s
        |                       THEN (1::BIGINT << (p.i - 32)) ELSE 0 END) AS BIGINT) AS hash_hi,
        |         cast(sum(CASE WHEN p.i < 32 AND 64 * p.v > t.s
        |                       THEN (1::BIGINT << p.i) ELSE 0 END) AS BIGINT) AS hash_lo
        |  FROM px p JOIN tot t USING (doc_id) GROUP BY 1
        |)
        |SELECT doc_id, hash_hi, hash_lo,
        |       min(doc_id) OVER (PARTITION BY hash_hi, hash_lo) AS rep_id
        |FROM bits""".stripMargin,

    // JPEG lifecycle: block b (raster order, b = (y//8)*2 + x//8) of the
    // 16x16 gray plane is the constant text byte (b % len); each block
    // contributes 64 pixels to bin v//32. A hash match proves the whole
    // baseline JFIF encode -> Huffman/dequant/IDCT decode chain is
    // exactly lossless on DC-only blocks.
    "q_jpeg_hist" ->
      """WITH bl AS (
        |  SELECT d.doc_id,
        |         CASE WHEN length(d.text) = 0 THEN 0
        |              ELSE ascii(substr(d.text,
        |                (cast(r.range AS INTEGER) % length(d.text)) + 1, 1))
        |         END AS v
        |  FROM documents d CROSS JOIN range(4) r
        |), counts AS (
        |  SELECT doc_id, v // 32 AS bin, cast(64 * count(*) AS DOUBLE) AS c
        |  FROM bl GROUP BY 1, 2
        |), dense AS (
        |  SELECT d.doc_id, bb.bin, coalesce(c.c, 0.0) AS c
        |  FROM (SELECT DISTINCT doc_id FROM documents) d
        |  CROSS JOIN (SELECT cast(range AS BIGINT) AS bin FROM range(8)) bb
        |  LEFT JOIN counts c ON c.doc_id = d.doc_id AND c.bin = bb.bin
        |)
        |SELECT doc_id, bin, round(c / 256.0, 6) AS w FROM dense""".stripMargin,

    // PNG lifecycle: pixel i of the 16x16 gray plane is text byte
    // (i % len) — the q_image_hist cycled layout without the PPM red
    // stride; lossless codec, so the decoded bytes ARE the analytic
    // synthesis (a hash match proves chunk walk + CRC + inflate +
    // unfilter reproduce them exactly).
    "q_png_hist" ->
      """WITH px AS (
        |  SELECT d.doc_id,
        |         CASE WHEN length(d.text) = 0 THEN 0
        |              ELSE ascii(substr(d.text,
        |                (cast(r.range AS INTEGER) % length(d.text)) + 1, 1))
        |         END AS b
        |  FROM documents d CROSS JOIN range(256) r
        |), counts AS (
        |  SELECT doc_id, b // 32 AS bin, cast(count(*) AS DOUBLE) AS c
        |  FROM px GROUP BY 1, 2
        |), dense AS (
        |  SELECT d.doc_id, bb.bin, coalesce(c.c, 0.0) AS c
        |  FROM (SELECT DISTINCT doc_id FROM documents) d
        |  CROSS JOIN (SELECT cast(range AS BIGINT) AS bin FROM range(8)) bb
        |  LEFT JOIN counts c ON c.doc_id = d.doc_id AND c.bin = bb.bin
        |)
        |SELECT doc_id, bin, round(c / 256.0, 6) AS w FROM dense""".stripMargin,

    // Resize lifecycle: output pixel i of the 9x9 plane (y = i//9,
    // x = i%9) samples source pixel (sy, sx) = (y*16//9, x*16//9) of the
    // 16x16 plane, whose red byte is text[(3*(sy*16+sx)) % len] — same
    // cycled-text analytic layout as q_image_hist, composed with the
    // nearest-neighbor floor index math; normalized over the 81 resized
    // pixels.
    "q_resize_hist" ->
      """WITH px AS (
        |  SELECT d.doc_id,
        |         CASE WHEN length(d.text) = 0 THEN 0
        |              ELSE ascii(substr(d.text,
        |                ((3 * (((cast(r.range AS INTEGER) // 9) * 16 // 9) * 16
        |                       + ((cast(r.range AS INTEGER) % 9) * 16 // 9)))
        |                 % length(d.text)) + 1, 1))
        |         END AS b
        |  FROM documents d CROSS JOIN range(81) r
        |), counts AS (
        |  SELECT doc_id, b // 32 AS bin, cast(count(*) AS DOUBLE) AS c
        |  FROM px GROUP BY 1, 2
        |), dense AS (
        |  SELECT d.doc_id, bb.bin, coalesce(c.c, 0.0) AS c
        |  FROM (SELECT DISTINCT doc_id FROM documents) d
        |  CROSS JOIN (SELECT cast(range AS BIGINT) AS bin FROM range(8)) bb
        |  LEFT JOIN counts c ON c.doc_id = d.doc_id AND c.bin = bb.bin
        |)
        |SELECT doc_id, bin, round(c / 81.0, 6) AS w FROM dense""".stripMargin,

    // Payload bytes = the 13-byte "P6\n16 16\n255\n" header + 768 cycled
    // text bytes (16x16 RGB); frames are blocks 0/4/8 of 64 bytes. The
    // prepended seed is folded before its own reduction — congruent mod
    // 2^31-1 with Spark's pre-reduced seed.
    "q_frame_hash" ->
      """WITH payload AS (
        |  SELECT doc_id,
        |    list_concat(
        |      [80,54,10,49,54,32,49,54,10,50,53,53,10]::BIGINT[],
        |      list_transform(range(768),
        |        i -> CASE WHEN length(text) = 0 THEN cast(0 AS BIGINT)
        |             ELSE cast(ascii(substr(text,
        |               (cast(i AS INTEGER) % length(text)) + 1, 1)) AS BIGINT)
        |             END)) AS b
        |  FROM documents
        |), frames AS (SELECT unnest([0, 4, 8]) AS f)
        |SELECT p.doc_id, cast(fr.f AS BIGINT) AS frame_idx,
        |  list_reduce(
        |    list_prepend(1125899906842597 % 2147483647,
        |      p.b[64 * fr.f + 1 : 64 * fr.f + 64]),
        |    (acc, x) -> (acc * 31 + x) % 2147483647) AS frame_hash
        |FROM payload p CROSS JOIN frames fr""".stripMargin,

    // Resampled sample j reads source index (j*4)//3 (320->240 is
    // exactly 4/3), whose value is text byte (idx % len) * 256 - 16384
    // (empty text -> one zero byte -> -16384). Windows are 60 samples;
    // the sum of squares stays a BIGINT (< 2^53) so the DOUBLE division
    // and the IEEE-correctly-rounded sqrt match Spark bit-for-bit; the
    // fingerprint fold over (sample + 32768) shares the q_frame_hash
    // congruence.
    "q_audio_rms" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    list_transform(range(240), j ->
        |      CASE WHEN length(text) = 0 THEN cast(-16384 AS BIGINT)
        |           ELSE cast(ascii(substr(text,
        |             (((cast(j AS INTEGER) * 4) // 3) % length(text)) + 1,
        |             1)) * 256 - 16384 AS BIGINT)
        |      END) AS s
        |  FROM documents
        |), w AS (SELECT unnest([0, 1, 2, 3]) AS wi)
        |SELECT r.doc_id, cast(w.wi AS BIGINT) AS win_idx,
        |  round(sqrt(cast(list_reduce(
        |      list_transform(r.s[60 * w.wi + 1 : 60 * w.wi + 60],
        |        x -> x * x), (a, b) -> a + b) AS DOUBLE) / 60.0), 6) AS rms,
        |  list_reduce(list_prepend(1125899906842597 % 2147483647,
        |      list_transform(r.s[60 * w.wi + 1 : 60 * w.wi + 60],
        |        x -> x + 32768)),
        |    (acc, x) -> (acc * 31 + x) % 2147483647) AS fp
        |FROM r CROSS JOIN w""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id AS eid, value
        |  FROM events
        |), f AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                   OR us - lag(us) OVER w > 86400000000 THEN 1
        |            ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, eid)
        |), s AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, eid
        |    ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM f
        |)
        |SELECT user_id, cast(session_idx AS BIGINT) AS session_idx,
        |       count(*) AS n_events, min(us) AS start_us, max(us) AS end_us,
        |       round(cast(sum(value) AS DOUBLE), 6) AS sum_value
        |FROM s GROUP BY 1, 2""".stripMargin,

    // Windowed event dedup: the same lag-gap arithmetic in integer
    // micros; "any earlier within W" == "latest earlier within W"
    // because a key's events are totally ordered by (us, eid)
    "q_event_dedup" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tus
        |  FROM events
        |), g AS (
        |  SELECT event_id, user_id, event_type,
        |         tus - lag(tus) OVER (PARTITION BY user_id, event_type
        |                              ORDER BY tus, event_id) AS gap_us
        |  FROM e
        |)
        |SELECT event_id, user_id, event_type, CAST(gap_us AS BIGINT) AS gap_us,
        |       coalesce(gap_us <= 1800::BIGINT * 1000000, false) AS is_dup
        |FROM g""".stripMargin,

    // streaming sessionize replay: under the ascending-time feed the
    // closed-session set equals the batch gap split — same SQL as
    // q_sessionize
    "q_stream_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id AS eid, value
        |  FROM events
        |), f AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                   OR us - lag(us) OVER w > 86400000000 THEN 1
        |            ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, eid)
        |), s AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, eid
        |    ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM f
        |)
        |SELECT user_id, cast(session_idx AS BIGINT) AS session_idx,
        |       count(*) AS n_events, min(us) AS start_us, max(us) AS end_us,
        |       round(cast(sum(value) AS DOUBLE), 6) AS sum_value
        |FROM s GROUP BY 1, 2""".stripMargin,

    "q_events_props" ->
      """SELECT event_type, count(*) AS n,
        |       cast(sum(cast(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       min(cast(json_extract(props, '$.k') AS BIGINT)) AS min_k,
        |       max(cast(json_extract(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,

    "q_events_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type, count(*) AS n,
        |       round(cast(sum(value) AS DOUBLE), 6) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // integer-count ratios; shingle CTEs share the q_ngram_jaccard shape
    "q_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
        |), sh AS (
        |  SELECT doc_id, t,
        |    CASE WHEN len(t) < 2 THEN [replace(text, ' ', '_')]
        |         ELSE list_transform(range(1, len(t)), i -> t[i] || '_' || t[i + 1])
        |    END AS g2,
        |    CASE WHEN len(t) < 3 THEN [replace(text, ' ', '_')]
        |         ELSE list_transform(range(1, len(t) - 1),
        |                i -> t[i] || '_' || t[i + 1] || '_' || t[i + 2])
        |    END AS g3
        |  FROM toks
        |)
        |SELECT doc_id,
        |  cast(len(t) AS BIGINT) AS n_tokens,
        |  cast(list_max(list_transform(list_distinct(t),
        |         x -> len(list_filter(t, y -> y = x)))) AS BIGINT) AS top_tok_cnt,
        |  round(cast(list_max(list_transform(list_distinct(t),
        |          x -> len(list_filter(t, y -> y = x)))) AS DOUBLE) / len(t), 6)
        |    AS top_tok_frac,
        |  round(1.0 - cast(len(list_distinct(g2)) AS DOUBLE) / len(g2), 6)
        |    AS dup_2gram_frac,
        |  round(1.0 - cast(len(list_distinct(g3)) AS DOUBLE) / len(g3), 6)
        |    AS dup_3gram_frac
        |FROM sh""".stripMargin,

    // chunk enumeration in exact integer arithmetic; md5 over the
    // space-rejoined slice matches Spark's concat_ws convention
    "q_chunking" ->
      """WITH sized AS (
        |  SELECT doc_id, t, len(t) AS n,
        |         cast(floor((greatest(len(t) - 32, 0) + 23) / 24.0) AS BIGINT) + 1 AS nw
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |), idx AS (
        |  SELECT doc_id, t, n, unnest(range(nw)) AS chunk_idx FROM sized
        |)
        |SELECT doc_id, cast(chunk_idx AS BIGINT) AS chunk_idx,
        |       cast(least(n - chunk_idx * 24, 32) AS BIGINT) AS n_chunk_tokens,
        |       md5(array_to_string(t[chunk_idx * 24 + 1 : least(chunk_idx * 24 + 32, n)], ' '))
        |         AS chunk_fp
        |FROM idx""".stripMargin,

    "q_asof_join" ->
      """SELECT l.event_id, r.event_id AS match_id,
        |       epoch_us(l.ts) - epoch_us(r.ts) AS lag_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id AND r.ts <= l.ts
        |QUALIFY row_number() OVER (
        |  PARTITION BY l.event_id ORDER BY r.ts DESC, r.event_id DESC) = 1""".stripMargin,

    // streaming replay: the in-order feed makes the streaming
    // enrichment output equal the batch as-of join, so the same oracle
    // checks real cross-batch state carries
    "q_stream_asof" ->
      """SELECT l.event_id, r.event_id AS match_id,
        |       epoch_us(l.ts) - epoch_us(r.ts) AS lag_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id AND r.ts <= l.ts
        |QUALIFY row_number() OVER (
        |  PARTITION BY l.event_id ORDER BY r.ts DESC, r.event_id DESC) = 1""".stripMargin,

    "q_range_join" ->
      """SELECT l.event_id AS left_id, r.event_id AS right_id,
        |       epoch_us(l.ts) - epoch_us(r.ts) AS lag_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id
        | AND abs(epoch_us(l.ts) - epoch_us(r.ts)) <= 7200000000""".stripMargin,

    // streaming interval-join replay: pair set identical to the batch
    // bucketed join under ascending feeds — same SQL as q_range_join
    "q_stream_rangejoin" ->
      """SELECT l.event_id AS left_id, r.event_id AS right_id,
        |       epoch_us(l.ts) - epoch_us(r.ts) AS lag_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id
        | AND abs(epoch_us(l.ts) - epoch_us(r.ts)) <= 7200000000""".stripMargin,

    // streaming window-agg replay: append-mode close-once emission under
    // an ascending feed equals the batch groupBy — same SQL as
    // q_events_window
    "q_stream_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type, count(*) AS n,
        |       round(cast(sum(value) AS DOUBLE), 6) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // stream-static EMD match: cum-of-differences form (the cascade's
    // 1-D closed-form kernel, the EmdCte shape), stream side id % 10 <> 0
    // vs the FIXED-SIZE reference side — ids % 10 = 0, hash-spread to
    // StreamEmdRefCap by (md5(id), id) order, mirroring the Spark
    // query's bounded broadcast-index selection
    "q_stream_emd" ->
      (HistCte +
        s""", refsel AS (
           |  SELECT id FROM (SELECT DISTINCT id FROM hist WHERE id % 10 = 0) r
           |  ORDER BY md5(cast(id AS VARCHAR)), id LIMIT $StreamEmdRefCap
           |), diffs AS (
           |  SELECT a.id AS stream_id, b.id AS ref_id, a.bin AS bin, a.w - b.w AS d
           |  FROM hist a JOIN hist b ON a.bin = b.bin
           |  JOIN refsel rs ON b.id = rs.id
           |  WHERE a.id % 10 <> 0
           |), cums AS (
           |  SELECT stream_id, ref_id,
           |         sum(d) OVER (PARTITION BY stream_id, ref_id ORDER BY bin) AS cum
           |  FROM diffs
           |), emds AS (
           |  SELECT stream_id, ref_id, sum(abs(cum)) AS dist FROM cums GROUP BY 1, 2
           |)
           | SELECT stream_id, ref_id, round(dist, 6) AS dist
           | FROM emds WHERE dist <= $Theta""".stripMargin),

    // Stream-static edit match: the same banded-levenshtein arithmetic
    // as q_edit_pairs (COALESCE NULL-is-empty rule included), stream
    // side = ids not divisible by 10, reference side hash-spread to
    // StreamEditRefCap by (md5(id), id) — mirroring the Spark selection
    "q_stream_editmatch" ->
      s"""WITH d AS (SELECT doc_id, coalesce(text, '') AS text,
         |                  length(coalesce(text, '')) AS l FROM documents),
         |refsel AS (
         |  SELECT doc_id FROM d WHERE doc_id % 10 = 0
         |  ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id LIMIT $StreamEditRefCap
         |),
         |r AS (SELECT d.* FROM d JOIN refsel USING (doc_id)),
         |s AS (SELECT * FROM d WHERE doc_id % 10 <> 0)
         |SELECT s.doc_id AS stream_id, r.doc_id AS ref_id,
         |       CAST(levenshtein(s.text, r.text) AS BIGINT) AS ed
         |FROM s JOIN r ON r.l BETWEEN s.l - 4 AND s.l + 4
         |WHERE levenshtein(s.text, r.text) <= 4""".stripMargin,

    "q_cell_assign" ->
      (HistCte +
        """, fitted AS (
          |  SELECT id, sum(w * bin) AS mu,
          |         sqrt(greatest(sum(w * bin * bin) - sum(w * bin) * sum(w * bin), 1e-8)) AS sigma
          |  FROM hist GROUP BY id
          |), hough AS (
          |  SELECT id, mu, sigma, 1.0 / sigma AS m, -mu / sigma AS b FROM fitted
          |), dom AS (
          |  SELECT min(m) AS min_m, max(m) AS max_m,
          |         min(b) AS min_b, max(b) AS max_b FROM hough
          |)
          |SELECT h.id, round(h.mu, 6) AS mu, round(h.sigma, 6) AS sigma,
          |       cast(least(floor((h.m - d.min_m) / ((d.max_m - d.min_m) / 4)), 3.0) * 4 +
          |            least(floor((h.b - d.min_b) / ((d.max_b - d.min_b) / 4)), 3.0) AS BIGINT) AS cell
          |FROM hough h CROSS JOIN dom d""".stripMargin)
  )
}
