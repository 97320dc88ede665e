package graft.operators

import graft.core.Caching._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextCols

/** Corpus-management operators for large-scale training-data pipelines:
  * deterministic stratified sampling (corpus mixing), per-language
  * vocabulary statistics (tokenizer-training input), and benchmark
  * decontamination (train/eval n-gram overlap detection).
  *
  * These extend the engine beyond the reference's surface (the reference
  * is a pure similarity-join engine; a pipeline feeding an LLM needs the
  * corpus plumbing around the joins too). All three are single-shuffle
  * shapes with no driver-side data, and every kernel is a pure Catalyst
  * expression both Spark and DuckDB evaluate identically, so each
  * declared query carries a full hash-checked oracle.
  */
object CorpusOps {

  /** Widen degenerate input parallelism before an explode-heavy stage: a
    * single small parquet file scans as ONE partition, serializing the
    * whole tokenize/explode map side on one core. No-op whenever the scan
    * already has >= default-parallelism partitions — a 100 TB input never
    * pays this shuffle. */
  private[operators] def widen(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Deterministic hash-threshold sampling, stratified by a column:
    * a row survives iff the first 32 bits of md5("<stratum>:<id>") fall
    * below floor(rate(stratum) * 2^32).
    *
    * This is the corpus-mixing primitive (e.g. downweight web crawl,
    * upweight low-resource languages): a pure map-side filter — no
    * shuffle, no window, no global count — so it runs at any scale in
    * one pass, is reproducible across runs/engines (md5, not a seeded
    * RNG), and composes with later stages. Rates are exact binary
    * fractions of 2^32, so the survivor set is engine-independent
    * (integer compare, no FP boundary).
    *
    * @param rates        per-stratum keep rate in [0,1]
    * @param defaultRate  rate for strata not in the map
    */
  def stratifiedSample(docs: DataFrame, strataCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 1.0,
                       idCol: String = "doc_id"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === lit(k), lit(v)).otherwise(acc)
    }
    val bucket = TextCols.md5Bits32(
      concat(col(strataCol), lit(":"), col(idCol).cast("string")))
    docs.filter(bucket < floor(rate * lit(4294967296L)).cast("long"))
  }

  /** Windowed token co-occurrence counts — the corpus statistic behind
    * PMI-style vocabulary filtering and word-vector training: every
    * position pair (i, j) with 1 <= j - i <= window contributes one
    * count to the LEXICOGRAPHICALLY canonical unordered token pair;
    * output is the top k pairs by (cnt DESC, ta, tb).
    *
    * Shape at 100 TB: pairs derive PER ROW in a plain mapPartitions
    * loop over the split array (a positions self-join would shuffle
    * every token occurrence twice; an HOF lambda would evaluate
    * interpreted per element — the pqEncode precedent), then ONE hash
    * aggregation with map-side combine over (ta, tb); the shuffle
    * carries distinct pairs per partition, not occurrences. Top-k is
    * TakeOrderedAndProject. ASCII corpus => Java's UTF-16 compare and
    * DuckDB's binary collation order pairs identically
    * (FixtureContractSpec). */
  def cooccurrence(docs: DataFrame, window: Int = 3, k: Int = 25,
                   textCol: String = "text"): DataFrame = {
    require(window >= 1 && k >= 1, s"cooccurrence: window=$window k=$k")
    val spark = docs.sparkSession
    import spark.implicits._
    val pairs = widen(docs).select(col(textCol)).as[String]
      .mapPartitions { it =>
        it.flatMap { text =>
          // split(" ", -1) keeps empty fields exactly like the oracle's
          // string_split
          val t = text.split(" ", -1)
          val buf = scala.collection.mutable.ArrayBuffer[(String, String)]()
          var i = 0
          while (i < t.length) {
            var j = i + 1
            val jmax = math.min(t.length - 1, i + window)
            while (j <= jmax) {
              if (t(i) <= t(j)) buf += ((t(i), t(j)))
              else buf += ((t(j), t(i)))
              j += 1
            }
            i += 1
          }
          buf
        }
      }.toDF("ta", "tb")
    pairs.groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ta"), col("tb")).limit(k)
  }

  /** Deterministic train/val/test assignment: each row's 32-bit md5
    * bucket of "split:<id>" lands in a fixed integer range — map-side,
    * shuffle-free, and STABLE under corpus growth (a doc's split never
    * changes when other docs arrive or depart, the property random
    * assignment and row_number slicing both lack; the holdout stays a
    * holdout across pipeline re-runs). Thresholds are integer literals
    * (~80% / ~90% of 2^32), so membership is exact integer comparison
    * in both engines — no FP boundary.
    *
    * Output: (id, split) with split in {train, val, test}. */
  /** The md5-bucket split assignment over an arbitrary key column —
    * shared by [[dataSplit]] (key = doc id) and [[leakSafeSplit]]
    * (key = near-dup cluster representative). */
  private def splitExpr(key: Column, thresholds: Seq[(String, Long)],
                        lastName: String): Column = {
    require(thresholds.nonEmpty &&
      thresholds.map(_._2) == thresholds.map(_._2).sorted,
      s"split thresholds must ascend: $thresholds")
    val bucket = TextCols.md5Bits32(concat(lit("split:"), key.cast("string")))
    thresholds.foldRight(lit(lastName): Column) {
      case ((nm, th), acc) => when(bucket < lit(th), lit(nm)).otherwise(acc)
    }
  }

  def dataSplit(docs: DataFrame,
                idCol: String = "doc_id",
                thresholds: Seq[(String, Long)] = Seq(
                  "train" -> 3435973837L, "val" -> 3865470566L),
                lastName: String = "test"): DataFrame =
    docs.select(col(idCol),
      splitExpr(col(idCol), thresholds, lastName).as("split"))

  /** LEAKAGE-SAFE split: the assignment key is the near-dup CLUSTER
    * representative, not the document id — a doc-keyed split puts
    * near-duplicates on both sides of the train/test fence (the
    * contamination a decontamination pass then has to detect after
    * the fact), while a cluster-keyed split makes straddling
    * STRUCTURALLY impossible: every member hashes the same key. Input
    * is the (id, cluster) frame from [[Dedup.connectedComponents]];
    * pure projection, no extra shuffle beyond what clustering paid. */
  def leakSafeSplit(clustered: DataFrame,
                    idCol: String = "doc_id",
                    clusterCol: String = "cluster",
                    thresholds: Seq[(String, Long)] = Seq(
                      "train" -> 3435973837L, "val" -> 3865470566L),
                    lastName: String = "test"): DataFrame =
    clustered.select(col(idCol), col(clusterCol),
      splitExpr(col(clusterCol), thresholds, lastName).as("split"))

  /** Fixed-size deterministic per-group sample: the n rows with the
    * smallest md5("<group>:<id>") per group — the fixed-budget companion
    * to the rate-based stratifiedSample ("give me exactly 10k docs per
    * language, stably across runs and engines"). The rank is the
    * [[groupRunningSum]] two-phase pass (a running count of 1s), never
    * a one-task-per-group window. Determinism comes from the (hash, id)
    * tie-break being a total order — NOT from hash uniqueness: the
    * 32-bit md5 prefix can collide within a group (~50% by ~77k
    * rows/group), and id breaks those ties identically in both engines. */
  def fixedSample(docs: DataFrame, groupCol: String, n: Int,
                  idCol: String = "doc_id"): DataFrame = {
    require(!docs.columns.contains("_fs_h"),
      "fixedSample: input already has a '_fs_h' column")
    val withH = docs.withColumn("_fs_h", TextCols.md5Bits32(
      concat(col(groupCol), lit(":"), col(idCol).cast("string"))))
    val rk = groupRunningSum(withH, groupCol,
      Seq(col("_fs_h"), col(idCol)), lit(1L), "smp_rank")
    freeRanked(rk, rk.filter(col("smp_rank") <= n).drop("_fs_h"))
  }

  /** Materialize the (smaller) selection derived from a corpus-width
    * intermediate cache — a [[groupRunningSum]] frame or a persisted
    * chunk pass — then free that cache: the intermediate's persisted
    * handle is unreachable from a caller that only holds a projection
    * on top of it, and MEMORY_AND_DISK blocks spill rather than evict,
    * so pinning the selection first is sufficient. */
  private def freeRanked(ranked: DataFrame, selection: DataFrame): DataFrame = {
    val out = selection.persistOnce()
    out.count()
    ranked.unpersist(false)
    out
  }

  /** Exact per-group order-statistic quantiles (type 1: the ceil(q*n)-th
    * smallest value, no interpolation — integer in, integer out, so the
    * result is engine-exact, unlike interpolating percentile sketches).
    * Emits one row per (group, q). The rank is the [[groupRunningSum]]
    * two-phase running count (no per-group window); group sizes come
    * from a broadcast aggregate over the materialized ranks. Ranks
    * tie-break on id so duplicate values pick a deterministic row. */
  def groupQuantiles(docs: DataFrame, groupCol: String, valueExpr: Column,
                     qs: Seq[Double], idCol: String = "doc_id"): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0), s"qs $qs")
    val rk = groupRunningSum(
      docs.select(col(groupCol).as("grp"), valueExpr.cast("long").as("value"),
        col(idCol).as("id")),
      "grp", Seq(col("value"), col("id")), lit(1L), "rnk")
    // group sizes read the materialized ranks; groups are bounded, so
    // the join side broadcasts
    val ranked = rk.join(broadcast(
      rk.groupBy(col("grp")).agg(count(lit(1)).as("n"))), "grp")
    freeRanked(rk, ranked
      .select(col("grp"), col("value"), col("rnk"), col("n"),
        explode(array(qs.map(lit): _*)).as("q"))
      .filter(ceil(col("q") * col("n")).cast("long") === col("rnk"))
      .select(col("grp"), col("q"), col("value"), col("n").cast("long").as("n")))
  }

  /** '_'-joined n-token shingles; see TextCols.shingles (shared
    * convention — short texts collapse to one whole-text shingle). */
  def shingles(text: Column, n: Int): Column = TextCols.shingles(text, n)

  /** Sliding-window chunking — the RAG/pretraining segmentation map: each
    * document's token sequence is cut into `window`-token chunks every
    * `stride` tokens (overlap = window - stride; the final chunk may be
    * short; every document yields at least one chunk). Output:
    * (doc_id, chunk_idx, n_chunk_tokens, chunk_fp) where chunk_fp is the
    * md5 of the space-rejoined chunk.
    *
    * Pure map-side explode (no shuffle, no window function): the chunk
    * count per document is ceil(max(n-window,0)/stride)+1, computed in
    * exact integer arithmetic, so the operator runs at any scale in one
    * pass and the oracle enumerates identical chunks. */
  def chunkDocuments(docs: DataFrame, window: Int, stride: Int,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = TextCols.tokens(col(textCol))
    val n = size(toks)
    // ceil(max(n-W,0)/S) + 1, via floor of an exact small-int division
    val nChunks = floor((greatest(n - window, lit(0)) + lit(stride - 1))
      .cast("double") / stride) + lit(1L)
    widen(docs)
      .select(col(idCol).as("doc_id"), toks.as("t"), nChunks.as("nw"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0L), col("nw") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("t"), (col("chunk_idx") * stride + 1).cast("int"), lit(window)).as("c"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("c")).cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", col("c"))).as("chunk_fp"))
  }

  /** Top-k most frequent n-grams per group (vocabulary statistics — the
    * corpus pass a tokenizer-training run starts from). Two-phase:
    * a map-side-combined count over (group, gram) — the only data-sized
    * shuffle — then a [[groupRunningSum]] two-phase rank over the
    * AGGREGATED vocabulary rows (vocab-sized, which still outgrows one
    * task per group at corpus scale). Ties on count break on the
    * gram string so the result is total-order deterministic. */
  def topNgrams(docs: DataFrame, groupCol: String, n: Int, k: Int,
                textCol: String = "text"): DataFrame = {
    val counts = widen(docs)
      .select(col(groupCol).as("grp"), explode(shingles(col(textCol), n)).as("gram"))
      .groupBy(col("grp"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val rk = groupRunningSum(counts, "grp",
      Seq(col("cnt").desc, col("gram")), lit(1L), "rank")
    freeRanked(rk, rk.filter(col("rank") <= k))
  }

  /** Sequence packing — the pretraining concat-and-chunk map: documents
    * are concatenated in id order and cut into fixed `maxLen`-token
    * windows, so each document lands in windows [seq_start, seq_end] at
    * offset seq_offset. All outputs are integers (no FP anywhere).
    *
    * The running token total is a TRUE distributed prefix sum, not an
    * unpartitioned window (which Spark executes as one task): range-
    * partition by id, per-partition totals to the driver (O(partitions)),
    * exclusive offsets broadcast back, second streaming pass adds them.
    * Two passes over the sized rows; the persisted intermediate is freed
    * once the result materializes. */
  def packSequences(docs: DataFrame, maxLen: Long, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(maxLen > 0, s"maxLen $maxLen")
    val spark = docs.sparkSession
    import spark.implicits._
    val sized = docs.select(col(idCol).cast("long").as("id"),
        TextCols.tokenCount(col(textCol)).cast("long").as("n"))
      .repartitionByRange(col("id"))
      .sortWithinPartitions("id")
    // pin ONE evaluation: range boundaries come from sampling, so two
    // independent .rdd materializations could partition differently and
    // the per-index offsets would mis-align
    val rdd = sized.as[(Long, Long)].rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val totals = rdd
        .mapPartitionsWithIndex { (i, it) =>
          var s = 0L; var r = 0L
          it.foreach { e => r += 1; s += e._2 }
          Iterator.single((i, r, s))
        }
        .collect().sortBy(_._1)
      val offsets = totals.map(_._3).scanLeft(0L)(_ + _)
      val offB = spark.sparkContext.broadcast(offsets)
      // phase-1 (rows, sum) per partition, asserted at phase-2
      // exhaustion: a cache-lost partition recomputes through
      // repartitionByRange with freshly SAMPLED boundaries and would
      // otherwise emit silently wrong sequence offsets (the
      // groupRunningSum/rankByKey witness, applied here too)
      val expB = spark.sparkContext.broadcast(
        totals.map { case (_, r, s) => (r, s) })
      val out = rdd.mapPartitionsWithIndex { (i, it) =>
        val first = offB.value(i)
        var cum = first
        var rows = 0L
        val mapped = it.map { case (id, n) =>
          rows += 1
          val start = cum
          cum += n
          (id, n, start / maxLen, (cum - 1) / maxLen, start % maxLen)
        }
        new Iterator[(Long, Long, Long, Long, Long)] {
          def hasNext: Boolean = {
            val h = mapped.hasNext
            if (!h) require(rows == expB.value(i)._1 &&
                cum - first == expB.value(i)._2,
              s"packSequences: phase-2 partition $i diverged from the " +
                s"phase-1 snapshot (rows=$rows/${expB.value(i)._1}, " +
                s"sum=${cum - first}/${expB.value(i)._2}) — the persisted " +
                "range partition was recomputed with freshly sampled " +
                "boundaries (executor loss); offsets misaligned, rerun")
            h
          }
          def next(): (Long, Long, Long, Long, Long) = mapped.next()
        }
      }.toDF("doc_id", "n_tokens", "seq_start", "seq_end", "seq_offset")
        .persistOnce()
      out.count()
      out
    } finally {
      rdd.unpersist(false)
    }
  }

  /** Gopher-style composite quality GATE — the actionable counterpart of
    * the q_quality score (analysis -> action, like spanOwnership ->
    * spanRewrite): per document, one boolean per rule plus the combined
    * keep decision. Every rule is an INTEGER cross-multiplied comparison
    * (5*d >= 2*n instead of d/n >= 0.4), so both engines evaluate the
    * boundary exactly — no FP threshold to probe, no reachable-rational
    * risk. Rule constants are fixture-calibrated so each rule passes AND
    * fails somewhere (non-vacuous at both gate SFs).
    *
    * Pure per-row Catalyst (no shuffle, codegen end-to-end); the rules:
    * length window, lexical diversity >= 0.4, >= 1 English stopword,
    * top-token fraction <= 0.2, duplicate-3-gram fraction <= 0.02. */
  def qualityGate(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text",
                  passthrough: Seq[Column] = Nil): DataFrame = {
    val t = col(textCol)
    val n = TextCols.tokenCount(t).cast("long")
    val d = size(TextCols.distinctTokens(t)).cast("long")
    val stops = TextCols.markerHits(t, TextCols.LangMarkers.head._2).cast("long")
    val m = TextCols.maxTokenCount(t).cast("long")
    val g3 = size(shingles(t, 3)).cast("long")
    val g3d = size(array_distinct(shingles(t, 3))).cast("long")
    val lenOk = n.between(15L, 5000L)
    val divOk = d * 5 >= n * 2
    val stopOk = stops >= 1
    val topOk = m * 5 <= n
    val repOk = (g3 - g3d) * 50 <= g3
    // passthrough columns ride the same projection so a composed
    // pipeline never re-joins (and re-derives) its own lineage to pair
    // gate verdicts with upstream per-row stats
    docs.select((col(idCol) +: n.as("n_tokens") +:
      lenOk.as("len_ok") +: divOk.as("diversity_ok") +: stopOk.as("stop_ok") +:
      topOk.as("toptok_ok") +: repOk.as("rep_ok") +:
      (lenOk && divOk && stopOk && topOk && repOk).as("keep") +:
      passthrough): _*)
  }

  /** Deterministic training-order shuffle: every document gets a stable
    * 1-based global rank in md5-random order ((hash, id) total order —
    * reproducible across runs, engines, and cluster sizes, unlike an
    * rng-seeded shuffle whose partition-order dependence breaks exact
    * reproducibility). The global ranking is range-partition + sort +
    * two-phase per-partition offsets — the same distributed prefix-sum
    * shape as [[packSequences]], NEVER a single-task global window, so
    * the plan holds at any corpus size.
    *
    * Returns (idCol, shuffle_rank). `salt` varies the permutation.
    *
    * The RESULT comes back persisted (and materialized): the rank
    * assignment pins one evaluation — an unpinned re-evaluation could
    * range-partition differently and hand out different ranks. The cache
    * is the caller's to unpersist once consumed (the Dedup
    * materialize-and-free contract); Bench's between-pass
    * cacheManager.clearCache() covers repeat passes. */
  def shuffleRank(docs: DataFrame, idCol: String = "doc_id",
                  salt: String = "shuf"): DataFrame = {
    val keyed = docs.select(col(idCol).cast("long").as("id"))
      .withColumn("k", TextCols.md5Bits32(
        concat(lit(salt), lit(":"), col("id").cast("string"))))
    rankByKey(keyed, idCol, "shuffle_rank")
  }

  /** Distributed 1-based global rank over the (k, id) total order —
    * range-partition + sort + two-phase per-partition offsets, NEVER a
    * single-task global window, so the plan holds at any corpus size.
    * Input must have exactly (id: long, k: long) with unique ids (ties
    * on k break on id, making the order total). The result comes back
    * persisted + materialized: the rank assignment pins one evaluation
    * (an unpinned re-evaluation could range-partition differently);
    * the cache is the caller's to unpersist. */
  /** [[rankByKey]] generalized to CARRY payload columns through the rank
    * pass: input is (id: long, k: long, payload...), output is the input
    * schema plus `rankColOut` — the 1-based global (k, id)-order rank —
    * and the TOTAL row count (so callers needing n for a keep-fraction
    * threshold don't pay a separate count pass). Same two-phase
    * range-partition + per-partition offsets machinery and the same
    * phase-1 row-count alignment witness as [[rankByKey]]; rows are
    * generic (payload schemas vary), so phase 2 streams Rows rather than
    * the typed (Long, Long) pairs. Folding the payload into the rank
    * input drops the scored-frame materialization AND the final
    * rank-attach join the caller otherwise pays (guide §2.1/§2.4 —
    * importanceSelect went from three sequential persisted passes to
    * two). The result comes back persisted + materialized; the cache is
    * the caller's to unpersist. */
  private[operators] def rankByKeyCarry(keyed: DataFrame,
                                        rankColOut: String): (DataFrame, Long) = {
    val spark = keyed.sparkSession
    val hashed = keyed
      .repartitionByRange(col("k"), col("id"))
      .sortWithinPartitions("k", "id")
    // pin ONE evaluation (range boundaries come from sampling — same
    // argument as rankByKey/packSequences)
    val rdd = hashed.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = rdd
        .mapPartitionsWithIndex { (i, it) =>
          var n = 0L; it.foreach(_ => n += 1); Iterator.single((i, n))
        }
        .collect().sortBy(_._1).map(_._2)
      val offsets = counts.scanLeft(0L)(_ + _)
      val total = offsets.last
      val offB = spark.sparkContext.broadcast(offsets)
      val cntB = spark.sparkContext.broadcast(counts)
      val outSchema = hashed.schema.add(rankColOut,
        org.apache.spark.sql.types.LongType, nullable = false)
      val rdd2 = rdd.mapPartitionsWithIndex { (i, it) =>
        var r = offB.value(i)
        val first = offB.value(i)
        new Iterator[org.apache.spark.sql.Row] {
          def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) require(r - first == cntB.value(i),
              s"rankByKeyCarry: phase-2 partition $i streamed ${r - first} " +
                s"rows but phase 1 counted ${cntB.value(i)} — the persisted " +
                "range partition was recomputed with freshly sampled " +
                "boundaries (executor loss); offsets misaligned, rerun")
            h
          }
          def next(): org.apache.spark.sql.Row = {
            val row = it.next(); r += 1
            org.apache.spark.sql.Row.fromSeq(row.toSeq :+ r)
          }
        }
      }
      val out = spark.createDataFrame(rdd2, outSchema).persistOnce()
      out.count()
      (out, total)
    } finally {
      rdd.unpersist(false)
    }
  }

  private[operators] def rankByKey(keyed: DataFrame, idColOut: String,
                                   rankColOut: String): DataFrame = {
    val spark = keyed.sparkSession
    import spark.implicits._
    val hashed = keyed
      .repartitionByRange(col("k"), col("id"))
      .sortWithinPartitions("k", "id")
      .select(col("id"), col("k"))
    // pin ONE evaluation (range boundaries come from sampling — same
    // argument as packSequences)
    val rdd = hashed.as[(Long, Long)].rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = rdd
        .mapPartitionsWithIndex { (i, it) =>
          var n = 0L; it.foreach(_ => n += 1); Iterator.single((i, n))
        }
        .collect().sortBy(_._1).map(_._2)
      val offsets = counts.scanLeft(0L)(_ + _)
      val offB = spark.sparkContext.broadcast(offsets)
      // phase-1 per-partition row counts double as the phase-2 alignment
      // witness: a cache-lost partition recomputed through
      // repartitionByRange re-samples range boundaries and can silently
      // shift rows across partitions, misaligning the broadcast offsets
      // (wrong ranks, no error). Assert the count at exhaustion instead.
      val cntB = spark.sparkContext.broadcast(counts)
      val out = rdd.mapPartitionsWithIndex { (i, it) =>
        var r = offB.value(i)
        val first = offB.value(i)
        new Iterator[(Long, Long)] {
          def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) require(r - first == cntB.value(i),
              s"rankByKey: phase-2 partition $i streamed ${r - first} rows " +
                s"but phase 1 counted ${cntB.value(i)} — the persisted " +
                "range partition was recomputed with freshly sampled " +
                "boundaries (executor loss); offsets misaligned, rerun")
            h
          }
          def next(): (Long, Long) = { val (id, _) = it.next(); r += 1; (id, r) }
        }
      }.toDF(idColOut, rankColOut)
        .persistOnce()
      out.count()
      out
    } finally {
      rdd.unpersist(false)
    }
  }

  /** Distributed per-group running sum in a caller-defined total order
    * — range-partition on (grp, sortCols...) + sort + two-phase
    * per-(partition, group) offsets. NEVER a per-group window: a
    * window partitioned by group sorts EVERY row of a group in one
    * task, so four domains at 100 TB reduce to four serial tasks; here
    * a group spans as many range partitions as its size needs and only
    * the (partitions x groups) offset table crosses the driver —
    * groups must be BOUNDED (domains/languages: they are by
    * construction). `sortCols` must total-order rows within a group
    * (end with the unique id); `cum` is inclusive of the current row.
    * The result comes back persisted + materialized (pins the sampled
    * range boundaries, the rankByKey argument); the cache is the
    * caller's to unpersist. */
  private[operators] def groupRunningSum(df: DataFrame, grpCol: String,
                                         sortCols: Seq[Column], v: Column,
                                         outCol: String): DataFrame = {
    require(!df.columns.contains(outCol) && !df.columns.contains("_grs_v"),
      s"groupRunningSum: input already has '$outCol' or '_grs_v'")
    val spark = df.sparkSession
    val ordered = col(grpCol) +: sortCols
    // null summands count as 0 (the window-sum behavior this replaces:
    // sum() skipped null addends but still emitted the row)
    val pinned = df.withColumn("_grs_v", coalesce(v.cast("long"), lit(0L)))
      .repartitionByRange(ordered: _*)
      .sortWithinPartitions(ordered: _*)
      .persistOnce()
    try {
      val grpIdx = pinned.schema.fieldIndex(grpCol)
      val vIdx = pinned.schema.fieldIndex("_grs_v")
      // phase 1: per-partition per-group totals AND row counts
      // (order-preserving so the offsets accumulate in partition order =
      // global sort order). Row counts are the phase-2 alignment witness.
      val totals = pinned.rdd.mapPartitionsWithIndex { (i, it) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[Any, Long]
        var rows = 0L
        it.foreach { r =>
          rows += 1
          val g = r.get(grpIdx)
          m.update(g, m.getOrElse(g, 0L) + r.getLong(vIdx))
        }
        Iterator.single((i, rows, m.toSeq))
      }.collect().sortBy(_._1)
      val running = scala.collection.mutable.HashMap.empty[Any, Long]
      val offsets: Array[Map[Any, Long]] = totals.map { case (_, _, gs) =>
        val snap = gs.map { case (g, _) => g -> running.getOrElse(g, 0L) }.toMap
        gs.foreach { case (g, t) =>
          running.update(g, running.getOrElse(g, 0L) + t)
        }
        snap
      }
      val offB = spark.sparkContext.broadcast(offsets)
      // phase-1 snapshot per partition: (row count, per-group totals) —
      // asserted at phase-2 exhaustion. MEMORY_AND_DISK survives eviction
      // but NOT executor loss: a lost cached partition recomputes through
      // repartitionByRange with freshly SAMPLED range boundaries, which
      // can silently misalign rows against the broadcast offsets. The
      // assertion turns that silent wrong-rank outcome into a loud retry.
      val expectB = spark.sparkContext.broadcast(
        totals.map { case (_, rows, gs) => (rows, gs.toMap) })
      val outSchema = pinned.schema.add(outCol,
        org.apache.spark.sql.types.LongType, nullable = false)
      // phase 2: stream each partition once, carrying per-group
      // accumulators seeded with the earlier-partition offsets
      val rdd2 = pinned.rdd.mapPartitionsWithIndex { (i, it) =>
        val acc = scala.collection.mutable.HashMap.empty[Any, Long]
        offB.value(i).foreach { case (g, o) => acc.update(g, o) }
        val (expRows, expTotals) = expectB.value(i)
        var rows = 0L
        var verified = false
        def verifyAligned(): Unit = if (!verified) {
          verified = true
          val sumsOk = acc.forall { case (g, c) =>
            expTotals.contains(g) &&
              c == offB.value(i).getOrElse(g, 0L) + expTotals(g)
          } && acc.size == expTotals.size
          require(rows == expRows && sumsOk,
            s"groupRunningSum: phase-2 partition $i diverged from the " +
              s"phase-1 snapshot (rows=$rows expected=$expRows, " +
              s"group-sum match=$sumsOk) — the persisted range partition " +
              "was recomputed with freshly sampled boundaries (executor " +
              "loss), so the broadcast offsets no longer align; rerun the " +
              "operator")
        }
        val mapped = it.map { r =>
          rows += 1
          val g = r.get(grpIdx)
          val c = acc.getOrElse(g, 0L) + r.getLong(vIdx)
          acc.update(g, c)
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ c)
        }
        new Iterator[org.apache.spark.sql.Row] {
          def hasNext: Boolean = {
            val h = mapped.hasNext
            if (!h) verifyAligned()
            h
          }
          def next(): org.apache.spark.sql.Row = mapped.next()
        }
      }
      val out = spark.createDataFrame(rdd2, outSchema)
        .drop("_grs_v").persistOnce()
      out.count()
      out
    } finally pinned.unpersist(false)
  }

  /** Token-budget subset selection: per group, keep the highest-quality
    * documents until the group's token budget is spent ("fill N tokens
    * per language, best first"). Ordering ties break on the 6-decimal
    * ROUNDED score then id — the exact total order the oracle applies —
    * and the running total and cut are pure integers. The running sum is
    * the [[groupRunningSum]] two-phase pass, so a group larger than one
    * task's stream costs nothing but more range partitions. */
  def tokenBudget(docs: DataFrame, groupCol: String, budget: Long,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val scored = docs.select(col(idCol).as("id"), col(groupCol).as("grp"),
      TextCols.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      round(TextCols.qualityScore(col(textCol)), 6).as("score"))
    val rk = groupRunningSum(scored, "grp",
      Seq(col("score").desc, col("id")), col("n_tokens"), "cum")
    freeRanked(rk, rk.filter(col("cum") <= budget))
  }

  /** Domain-mixture sampling with upsampling — the static data-mixing
    * primitive of a pretraining pipeline: hit a TARGET token
    * distribution across sources, repeating small high-weight domains
    * for whole extra epochs and taking a deterministic hash-spread
    * prefix of the final partial epoch. All arithmetic is integer, so
    * the oracle replays it exactly: per-domain budget =
    * totalBudget * w / sum(w) (integer division), whole epochs =
    * budget div domainTokens, and the partial epoch keeps rows whose
    * inclusive running token count over the (md5(grp:id), id) order is
    * <= budget mod domainTokens. Domains absent from `weights` are
    * excluded (weight zero).
    *
    * Shapes: one token-count scan, the [[groupRunningSum]] two-phase
    * per-domain running sum (never a one-task-per-domain window — a
    * domain's rows span as many range partitions as they need), an
    * O(domains) aggregate over the materialized sums joined back by
    * broadcast, and an epoch explode via sequence() — the epoch
    * fan-out happens AFTER the running sum, so each extra epoch is a
    * map-side row copy, not a re-shuffle.
    * Output: (id, grp, epoch, n_tokens, cum). */
  def domainMixSample(docs: DataFrame, weights: Map[String, Long],
                      totalBudget: Long, groupCol: String = "source",
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      s"weights must be non-empty and positive: $weights")
    require(totalBudget >= 0, s"totalBudget=$totalBudget")
    val spark = docs.sparkSession
    import spark.implicits._
    val sumW = weights.values.sum
    val wDf = weights.toSeq.sortBy(_._1).toDF("grp", "wt")
    val t = docs.select(col(idCol).cast("long").as("id"),
      col(groupCol).as("grp"),
      TextCols.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("h", TextCols.md5Bits32(
        concat(col("grp"), lit(":"), col("id").cast("string"))))
    val c = groupRunningSum(t, "grp",
      Seq(col("h"), col("id")), col("n_tokens"), "cum")
    // domain totals read the materialized running sums, not the source
    val g = c.groupBy(col("grp")).agg(sum(col("n_tokens")).as("tot"))
      .join(broadcast(wDf), "grp")
      .filter(col("tot") > 0)
      .withColumn("budget", expr(s"${totalBudget}L * wt div ${sumW}L"))
      .withColumn("n_full", expr("budget div tot"))
      .withColumn("rem", col("budget") % col("tot"))
      .select(col("grp"), col("n_full"), col("rem"))
    // pin the NARROW pre-explode join and free the ranked cache; the
    // epoch fan-out stays lazy (materializing it would multiply storage
    // by the epoch count for a pure per-row map). The fan-out explodes
    // in THREE nested levels of <= 4097-element arrays (hi -> outer ->
    // epoch = outer*4096 + inner): a single sequence(0, n_full) would
    // materialize the whole (n_full+1)-long array per row — unbounded
    // transient memory exactly in the heavy-upsampling regime this
    // operator exists for — and a two-level split merely moved the
    // unbounded array to n_full/4096 elements (large again once a domain
    // repeats tens of millions of times). Three levels keep per-row
    // transients O(chunk) for every n_full <= chunk^3 ~ 6.9e10 epochs
    // per domain, the require-documented envelope (beyond it is a
    // weights bug, not a scale regime).
    val chunk = 4096L
    val maxFull = g.agg(coalesce(max(col("n_full")), lit(0L)).cast("long"))
      .head().getLong(0)
    require(maxFull <= chunk * chunk * chunk,
      s"domainMixSample: a domain would repeat $maxFull whole epochs — " +
        s"past the supported ${chunk * chunk * chunk} (= 4096^3) envelope " +
        "of the three-level epoch explode; a domain upsampled tens of " +
        "billions of times is a weights bug, not a mixture")
    freeRanked(c, c.join(broadcast(g), "grp"))
      .withColumn("hi", explode(sequence(lit(0L),
        expr(s"n_full div ${chunk * chunk}"))))
      .withColumn("outer", explode(sequence(col("hi") * chunk,
        least(expr(s"n_full div $chunk"), col("hi") * chunk + (chunk - 1L)))))
      .withColumn("epoch", explode(sequence(col("outer") * chunk,
        least(col("n_full"), col("outer") * chunk + (chunk - 1L)))))
      .filter(col("epoch") < col("n_full") || col("cum") <= col("rem"))
      .select(col("id"), col("grp"), col("epoch").cast("long").as("epoch"),
        col("n_tokens"), col("cum"))
  }

  /** Luhn mod-10 checksum over a digit sequence (most-significant
    * first): double every second digit from the RIGHT, subtract 9 from
    * two-digit products, valid iff the sum divides by 10. */
  private[operators] def luhnValid(digits: Array[Int]): Boolean = {
    var s = 0
    var dbl = false
    var i = digits.length - 1
    while (i >= 0) {
      var d = digits(i)
      if (dbl) { d *= 2; if (d > 9) d -= 9 }
      s += d
      dbl = !dbl
      i -= 1
    }
    s % 10 == 0
  }

  /** Checksum-validated payment-card scrubbing — the precision upgrade
    * over pattern-only PII removal ([[piiScrub]]): a 13-19 digit run
    * (single ' ' or '-' separators allowed between digits, the common
    * card groupings) redacts to `<CARD>` ONLY when it passes the Luhn
    * mod-10 check; checksum-failing runs of card length stay in the
    * text and are counted as rejected — order numbers, timestamps, and
    * random ids overwhelmingly fail Luhn, so the checksum is what keeps
    * a corpus-scale scrubber from eating every long number (the
    * published PII-redaction practice, e.g. the BigScience/BigCode PII
    * pipelines gate candidates exactly this way).
    *
    * One mapPartitions pass, a single linear scan per row (no regex
    * backtracking); emits (doc_id, clean_text, n_cards, n_rejected). */
  def luhnScrub(df: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"),
        coalesce(col(textCol).cast("string"), lit("")).as("t"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val n = t.length
        val out = new java.lang.StringBuilder(n)
        var cards = 0L
        var rejected = 0L
        var i = 0
        while (i < n) {
          val c = t.charAt(i)
          if (c >= '0' && c <= '9') {
            // maximal digit run with single inter-digit separators
            val digits = scala.collection.mutable.ArrayBuffer.empty[Int]
            var j = i
            var end = i // exclusive end of the last DIGIT consumed
            while (j < n && {
              val cj = t.charAt(j)
              if (cj >= '0' && cj <= '9') {
                digits += (cj - '0'); end = j + 1; j += 1; true
              } else if ((cj == '-' || cj == ' ') && j + 1 < n &&
                t.charAt(j + 1) >= '0' && t.charAt(j + 1) <= '9') {
                j += 1; true
              } else false
            }) {}
            val span = t.substring(i, end)
            if (digits.length >= 13 && digits.length <= 19) {
              if (luhnValid(digits.toArray)) { out.append("<CARD>"); cards += 1 }
              else { out.append(span); rejected += 1 }
            } else out.append(span)
            i = end
          } else {
            out.append(c)
            i += 1
          }
        }
        (id, out.toString, cards, rejected)
      })
      .toDF(idCol, "clean_text", "n_cards", "n_rejected")
  }

  /** Deterministic card fixture over the documents table: docs with
    * doc_id % 3 == 0 append one 16-digit number derived from doc_id
    * ('4' + 15 id-derived digits — dash-grouped for even ids), plus a
    * 5-digit decoy that card-length gating must ignore. Validity is
    * NOT controlled: the id-derived check digit passes Luhn for ~10%
    * of cards naturally, so both redaction lanes stay non-vacuous and
    * the oracle must actually compute the checksum. Carries the
    * fixture metadata columns so jsonWrap composes without a
    * self-join. */
  def cardWrap(docs: DataFrame): DataFrame = {
    val card16 = concat(lit("4"),
      lpad(((col("doc_id") * 7919) % 1000000000000000L).cast("string"),
        15, "0"))
    val grouped = concat(
      substring(card16, 1, 4), lit("-"), substring(card16, 5, 4), lit("-"),
      substring(card16, 9, 4), lit("-"), substring(card16, 13, 4))
    val cardStr = when(col("doc_id") % 2 === 0, grouped).otherwise(card16)
    docs.select(col("doc_id"), concat(col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" pay "), cardStr, lit(" today ref 12345 ok")))
        .otherwise(lit(""))).as("text"),
      col("lang"), col("source"), col("n_chars"))
  }

  /** Unicode text normalization — the CCNet-class cleanup pass every
    * ingestion pipeline runs before tokenization: raw character maps
    * (zero-width removal, NBSP/tab -> space), NFC composition, accent
    * stripping (NFD + combining-mark removal), Unicode lowercase (ROOT
    * locale), whitespace-run collapse + trim. One map-side pass per
    * row, no shuffle, nothing leaves the executor.
    *
    * The step ORDER is part of the contract — the oracle replays it
    * verbatim (char maps innermost, then nfc_normalize, strip_accents,
    * lower, collapse, trim). Engine agreement: NFD-minus-Mn equals
    * DuckDB's utf8proc strip_accents on the Latin range the fixture
    * reaches (pinned by TextNormSpec hand cases); lengths are counted
    * in CODE POINTS on both sides (DuckDB len() counts codepoints —
    * Java String.length counts UTF-16 units and would drift on any
    * supplementary-plane char).
    * Output: (doc_id, norm_text, changed, delta_chars). */
  def normalizeText(df: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"),
        coalesce(col(textCol).cast("string"), lit("")).as("t"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val n = normalizeOneText(t)
        (id, n, n != t,
          t.codePointCount(0, t.length).toLong -
            n.codePointCount(0, n.length))
      })
      .toDF(idCol, "norm_text", "changed", "delta_chars")
  }

  private[operators] def normalizeOneText(raw: String): String = {
    // 1. raw char maps (exact, pre-normalization): zero-width chars
    //    out, NBSP and tab to plain space
    val mapped = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      raw.charAt(i) match {
        case '\u200B' | '\u200C' | '\u200D' | '\uFEFF' => ()
        case '\u00A0' | '\t' => mapped.append(' ')
        case c => mapped.append(c)
      }
      i += 1
    }
    // 2. NFC compose, 3. accent strip = NFD then drop combining marks
    val nfc = java.text.Normalizer.normalize(mapped,
      java.text.Normalizer.Form.NFC)
    val nfd = java.text.Normalizer.normalize(nfc,
      java.text.Normalizer.Form.NFD)
    val stripped = new java.lang.StringBuilder(nfd.length)
    i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK)
        stripped.append(c)
      i += 1
    }
    // 4. lowercase, 5. collapse space runs, 6. trim (trim-then-collapse
    //    equals the oracle's collapse-then-trim: edge runs shrink to
    //    one space either way before trim removes them)
    stripped.toString.toLowerCase(java.util.Locale.ROOT)
      .trim.replaceAll(" +", " ")
  }

  /** Deterministic messy-text wrapper over the documents fixture: the
    * corpus is clean lowercase ASCII, so the Unicode mess (a decomposed
    * combining-acute accent, an NBSP-joined word pair, a zero-width
    * split, tab + double-space runs, whole-document uppercasing,
    * trailing spaces) derives from doc_id alone — replayed verbatim by
    * the q_text_norm oracle with chr() codes. Injected words are
    * outside the corpus vocabulary; docs matching NO branch pass
    * through unchanged, keeping `changed = false` non-vacuous. */
  def messWrap(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    docs.select(col("doc_id"), concat(
      when(id % 3 === 0, concat(lit("Cafe"), lit("\u0301"), lit(" menu ")))
        .otherwise(lit("")),
      when(id % 5 === 1, concat(lit("hot"), lit("\u00A0"), lit("take ")))
        .otherwise(lit("")),
      when(id % 7 === 3, concat(lit("zero"), lit("\u200B"), lit("width ")))
        .otherwise(lit("")),
      when(id % 4 === 2, lit("TAB\tSPACED  OUT ")).otherwise(lit("")),
      when(id % 2 === 0, upper(col("text"))).otherwise(col("text")),
      when(id % 11 === 5, lit("  ")).otherwise(lit(""))).as("text"))
  }

  /** Schema'd JSONL ingestion with a malformed-record policy — the
    * entry step of every jsonl-shaped corpus: parse each record against
    * an explicit schema and DEGRADE PER ROW on corrupt input (valid
    * flag false, NULL fields), never abort the job — at 100 TB some
    * records are always truncated/garbled, and a FAILFAST ingest is an
    * operational non-starter. Spark-first: `from_json` is a codegen'd
    * Catalyst expression (Jackson under the hood, NULL struct on
    * malformed input); nothing leaves the row, no shuffle, no UDF.
    *
    * Output: (doc_id, valid, jid, lang, source, n_tags, tag0,
    * text_chars) — `jid` re-extracts the record's own id so an
    * id/payload mismatch is visible, `tag0` uses ANSI-safe `get()`
    * (element_at THROWS on an empty array under ANSI mode). */
  def jsonIngest(df: DataFrame, idCol: String = "doc_id",
                 jsonCol: String = "json",
                 withText: Boolean = false): DataFrame = {
    // PERMISSIVE from_json yields an all-NULL struct (not a NULL
    // struct) on corrupt input, so validity rides the standard
    // columnNameOfCorruptRecord channel: corrupt rows carry their raw
    // text there, valid rows carry NULL — the same policy surface as
    // the DataFrameReader's json source
    val schema = "id BIGINT, meta STRUCT<lang: STRING, source: STRING, " +
      "n_chars: BIGINT>, tags ARRAY<STRING>, text STRING, _corrupt STRING"
    val base = Seq(col("doc_id"),
      col("j._corrupt").isNull.as("valid"),
      col("j.id").as("jid"),
      col("j.meta.lang").as("lang"),
      col("j.meta.source").as("source"),
      size(col("j.tags")).cast("long").as("n_tags"),
      get(col("j.tags"), lit(0)).as("tag0"),
      length(col("j.text")).cast("long").as("text_chars"))
    val cols = if (withText) base :+ col("j.text").as("text") else base
    df.select(col(idCol).cast("long").as("doc_id"),
        from_json(col(jsonCol), org.apache.spark.sql.types.StructType
            .fromDDL(schema),
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt")).as("j"))
      .select(cols: _*)
  }

  /** Deterministic JSONL wrapper over the documents fixture (the
    * [[graft.operators.HtmlOps.htmlWrap]] convention for JSON): every
    * doc serializes to one schema'd record; docs with doc_id % 17 == 0
    * TRUNCATE five characters short (an unterminated string — invalid
    * under both Jackson and DuckDB's json_valid), planting the corrupt
    * rows the ingest policy exists for. Tag arrays cycle through
    * two/one/zero elements so list extraction sees every shape. */
  def jsonWrap(docs: DataFrame): DataFrame = {
    val idS = col("doc_id").cast("string")
    val tags = when(col("doc_id") % 3 === 0, lit("[\"wiki\", \"ref\"]"))
      .when(col("doc_id") % 3 === 1, lit("[\"web\"]"))
      .otherwise(lit("[]"))
    val full = concat(
      lit("{\"id\": "), idS,
      lit(", \"meta\": {\"lang\": \""), col("lang"),
      lit("\", \"source\": \""), col("source"),
      lit("\", \"n_chars\": "), col("n_chars").cast("string"),
      lit("}, \"tags\": "), tags,
      lit(", \"text\": \""), col("text"), lit("\"}"))
    docs.select(col("doc_id"),
      when(col("doc_id") % 17 === 0,
        full.substr(lit(1), length(full) - 5))
        .otherwise(full).as("json"))
  }

  /** Schema'd CSV ingestion with the jsonIngest malformed-record
    * policy — the other ubiquitous corpus wire format: parse each line
    * against an explicit schema with Spark's codegen'd `from_csv`
    * (univocity under the hood, RFC 4180 quoting: quoted fields,
    * doubled quotes, embedded separators), degrade PER ROW on
    * malformed input via columnNameOfCorruptRecord, never abort.
    * Data fields are nulled when the row is invalid — univocity's
    * PERMISSIVE mode keeps the successfully-parsed prefix fields, and
    * trusting a partial parse is how a truncated record poisons a
    * corpus silently. Zero shuffle, nothing leaves the row.
    * Output: (doc_id, valid, cid, lang, source, n_chars_parsed,
    * text_chars). */
  def csvIngest(df: DataFrame, idCol: String = "doc_id",
                csvCol: String = "line"): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, lang STRING, source STRING, n_chars BIGINT, " +
        "text STRING, _corrupt STRING")
    // escape = '"' selects RFC 4180 quote-doubling; Spark's default
    // escape is backslash, under which a doubled "" inside a quoted
    // field round-trips with its quotes kept literally (measured)
    val parsed = from_csv(col(csvCol), schema,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt",
        "escape" -> "\""))
    // univocity does NOT flag an empty or NULL input line as corrupt —
    // it yields an all-NULL row with _corrupt unset (measured; the CSV
    // twin of the from_json all-NULL-struct lesson), so blank input is
    // gated explicitly
    val valid = col("c._corrupt").isNull &&
      col("_line").isNotNull && col("_line") =!= ""
    def gated(c: Column): Column = when(valid, c)
    df.select(col(idCol), col(csvCol).as("_line"), parsed.as("c"))
      .select(col(idCol),
        valid.as("valid"),
        gated(col("c.id")).as("cid"),
        gated(col("c.lang")).as("lang"),
        gated(col("c.source")).as("source"),
        gated(col("c.n_chars")).as("n_chars_parsed"),
        gated(length(col("c.text")).cast("long")).as("text_chars"))
  }

  /** Deterministic CSV-line fixture over the documents table (the
    * jsonWrap convention): id,lang,source,n_chars,"text" with the text
    * field RFC 4180-quoted; doc_id-derived injections exercise an
    * embedded comma (% 6), a doubled inner quote (% 9), and a
    * truncation to 10 chars (% 13 == 7) that cuts the record down to
    * fewer tokens than the schema — the malformed lane. */
  def csvWrap(docs: DataFrame): DataFrame = {
    val idS = col("doc_id").cast("string")
    val textFull = concat(col("text"),
      when(col("doc_id") % 6 === 0, lit(", comma extra")).otherwise(lit("")),
      when(col("doc_id") % 9 === 4, lit(" says \"hi\" ok")).otherwise(lit("")))
    val quoted = concat(lit("\""),
      regexp_replace(textFull, "\"", "\"\""), lit("\""))
    val line0 = concat_ws(",", idS, col("lang"), col("source"),
      col("n_chars").cast("string"), quoted)
    docs.select(col("doc_id"),
      when(col("doc_id") % 13 === 7, substring(line0, 1, 10))
        .otherwise(line0).as("line"))
  }

  /** Exact substring dedup DETECTION (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better" — the ExactSubstr
    * pass), at token granularity: find, per document, the maximal
    * spans covered by substrings of >= k tokens that appear verbatim
    * in ANOTHER document. The published criterion "remove every
    * substring of length >= k occurring elsewhere" reduces exactly to
    * k-gram anchors: a >= k-token duplicated substring is duplicated
    * in all of its k-token windows, and conversely every duplicated
    * k-token window IS a duplicated substring — so the union of
    * removable text per doc is precisely the union of its duplicated
    * k-gram windows, and the maximal spans are runs of duplicated
    * anchor positions merged while pos_next <= pos_prev + k (windows
    * overlap or touch). No suffix array, no driver state.
    *
    * "Elsewhere" means a DIFFERENT document (min/max doc over the
    * anchor's postings differ) — a within-doc repeat alone is not
    * cross-corpus duplication. Documents shorter than k tokens carry
    * no anchor and produce no span (they cannot host a >= k-token
    * duplicate). Grams are matched as exact STRINGS end to end —
    * detection is exact by construction, never hash-probabilistic (at
    * larger k a 128-bit anchor fingerprint is the leaner shuffle key;
    * exactness here is the operator's contract and the shuffled gram
    * is k short tokens).
    *
    * 100 TB shape: anchor postings (gram, id, pos) are one map-side
    * flatMap; the duplicated-anchor decision is ONE gram-keyed
    * aggregation (min != max doc — high-cardinality keys, near-unique
    * grams, no skew hot-spot) whose semi-join back to the postings is
    * co-partitioned on the same key; only ids+positions of DUPLICATED
    * anchors (the probed ~9% at the fixture, data-dependent) reach the
    * per-doc merge window, which is bounded by one document's token
    * count (the sessionize/dedupEvents data-model argument). The scan
    * of every k-gram is the honest cost of EXACT detection — the
    * suffix-array formulation sorts the same mass.
    *
    * Output: (doc_id, span_start, span_end, n_tokens, n_windows,
    * span_text) with 0-based token positions, end exclusive.
    * [[spanRewrite]]/[[spanOwnership]] own the C4-style removal action;
    * this operator contributes the exact cross-document detection their
    * shingle heuristics approximate. */
  def exactSubstrSpans(docs: DataFrame, k: Int, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(k >= 2, s"anchor length must be >= 2 tokens, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = widen(docs).select(col(idCol).cast("long").as("id"),
      coalesce(col(textCol).cast("string"), lit("")).as("t"))
    // anchor postings: one row per k-token window. Plain-loop kernel
    // (an aggregate/transform HOF pipeline would re-evaluate the split
    // per element — the CLAUDE.md shingle lesson). split(" ", -1)
    // mirrors the oracle's string_split (empty trailing fields kept).
    val kg = toks.as[(Long, String)].mapPartitions(_.flatMap {
      case (id, t) =>
        val ts = t.split(" ", -1)
        if (ts.length < k) Iterator.empty
        else (0 to ts.length - k).iterator.map { p =>
          val sb = new java.lang.StringBuilder
          var j = p
          while (j < p + k) {
            if (j > p) sb.append(' ')
            sb.append(ts(j))
            j += 1
          }
          (sb.toString, id, p)
        }
    }).toDF("g", "id", "pos").persistOnce()
    // duplicated anchors: postings spanning >= 2 distinct docs
    val dup = kg.groupBy(col("g"))
      .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select(col("g"))
    // ids+positions only past this point
    val dpos = kg.join(dup, "g").select(col("id"), col("pos"))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val spans = dpos
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(w) <= k, 0L)
          .otherwise(1L))
      .withColumn("sid", sum(col("brk")).over(w))
      .groupBy(col("id"), col("sid"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + k).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
    val out = spans.join(toks, "id")
      .select(col("id").as("doc_id"),
        col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("n_tokens"),
        col("n_windows"),
        array_join(slice(split(col("t"), " ", -1),
          (col("span_start") + 1).cast("int"),
          (col("span_end") - col("span_start")).cast("int")), " ")
          .as("span_text"))
      .persistOnce()
    out.count()
    kg.unpersist()
    out
  }

  /** C4-style span-ownership analysis — the repeated-span dedup
    * primitive: every distinct n-token shingle is "owned" by the lowest
    * doc_id containing it; per document, how many of its distinct
    * shingles it owns vs duplicates of earlier documents (dup_frac = the
    * fraction a span-dedup pass would remove). Shapes: distinct postings
    * (ids only), a gram-keyed min aggregation, and one id-keyed count —
    * all map-side-combined shuffles, no driver-side data.
    *
    * @param maxDf optional hot-gram cap (0 = uncapped): grams appearing in
    *        more than this many documents leave the analysis entirely
    *        (neither n_shingles nor dup evidence) — the decontaminationJoin
    *        boilerplate mitigation, here for the gram-keyed join's skew:
    *        a navigation-chrome gram in 10M docs is one join key carrying
    *        10M posting rows. Identical output when no gram exceeds the
    *        cap (spec-checked); the hot set is tiny, so the anti-join
    *        broadcasts under AQE. Per-doc contract holds under the cap: a
    *        document whose EVERY gram is hot still gets a row
    *        (n_shingles = 0, dup_frac = 0.0 — nothing attributable to
    *        dedup remains), matching the uncapped one-row-per-doc shape. */
  def spanOwnership(docs: DataFrame, n: Int, idCol: String = "doc_id",
                    textCol: String = "text", maxDf: Int = 0): DataFrame = {
    val postings = capHotGrams(widen(docs)
      .select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("gram"))
      .distinct(), maxDf)
    val owners = postings.groupBy(col("gram")).agg(min(col("id")).as("owner"))
    val perDoc = postings.join(owners, "gram")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("owner") === col("id"), 1L).otherwise(0L)).as("n_owned"))
    widen(docs).select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_owned"), lit(0L)).as("n_owned"),
        when(coalesce(col("n_shingles"), lit(0L)) === 0, lit(0.0))
          .otherwise(lit(1.0) - col("n_owned").cast("double") / col("n_shingles"))
          .as("dup_frac"))
  }

  /** C4-style span REMOVAL — the action [[spanOwnership]] scores: every
    * distinct n-token shingle is owned by the lowest doc_id containing it;
    * a token survives iff NO shingle occurrence covering it belongs to an
    * earlier document. Emits the rewritten text (kept tokens joined by
    * ' ', '' when nothing survives) plus token accounting. Documents
    * shorter than n tokens carry one whole-text shingle covering every
    * position (shingles() convention), so a short duplicate empties.
    *
    * Shapes: ownership is the same ids-only gram-keyed min aggregation as
    * spanOwnership, but over POSITIONED occurrences (posexplode): each
    * document receives back only the 0-based START POSITIONS of its
    * non-owned shingle occurrences as ONE int array (bounded by the doc's
    * own shingle count), and the rewrite itself is pure per-row Catalyst —
    * no further shuffle, and the text column never enters the ownership
    * exchange. Kept token indices are computed as
    * array_except(all indices, union of covered ranges): array_except
    * hashes its second argument (OpenHashSet), so the subtraction is
    * O(tokens + n·|dup_starts|) per row — linear in doc length even when
    * every shingle is a duplicate. (Two prior shapes were quadratic on a
    * fully-duplicated doc: a per-start array_contains scan of the doc's
    * dup-gram set, and its map_from_arrays replacement — Spark map
    * lookups are LINEAR scans over ArrayBasedMapData, not hash probes.
    * Measured evidence in PLANS.md.)
    *
    * @param maxDf optional hot-gram cap (0 = uncapped), as in
    *        [[spanOwnership]]: capped grams are chrome — they never enter
    *        the dup set, so the tokens they cover survive unless another
    *        non-owned gram covers them. Identical output when no gram
    *        exceeds the cap (spec-checked). */
  def spanRewrite(docs: DataFrame, n: Int, idCol: String = "doc_id",
                  textCol: String = "text", maxDf: Int = 0): DataFrame = {
    val occ = widen(docs)
      .select(col(idCol).as("id"),
        posexplode(shingles(col(textCol), n)).as(Seq("b0", "gram")))
    // doc-frequency for the cap is over distinct (id, gram), not
    // occurrences — a gram repeated inside one doc counts once
    val occCapped =
      if (maxDf <= 0) occ
      else occ.join(hotGrams(occ.select(col("id"), col("gram")).distinct(), maxDf),
        Seq("gram"), "left_anti")
    val owners = occCapped.groupBy(col("gram")).agg(min(col("id")).as("owner"))
    val dups = occCapped.join(owners, "gram")
      .filter(col("owner") =!= col("id"))
      .groupBy(col("id")).agg(collect_list(col("b0")).as("dup_starts"))
    val withDups = widen(docs)
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .join(dups, Seq("id"), "left")
      .withColumn("dup_starts",
        coalesce(col("dup_starts"), array().cast("array<int>")))
    // start b0 (0-based) covers tokens [b0+1, b0+n] (1-based); a token
    // survives iff no non-owned start covers it. Short docs have one
    // whole-text shingle at b0=0 covering [1, n] — indices past the last
    // token are harmless (array_except ignores absent values). Token
    // array bound once per row via the 1-element transform.
    val kept = flatten(transform(array(TextCols.tokens(col("text"))), t =>
      when(size(t) === 0, array().cast("array<string>"))
        .otherwise(transform(
          array_except(sequence(lit(1), size(t)),
            flatten(transform(col("dup_starts"),
              b0 => sequence(b0 + 1, b0 + lit(n))))),
          i => element_at(t, i)))))
    withDups.select(col("id").as(idCol),
      size(TextCols.tokens(col("text"))).cast("long").as("n_tokens"),
      size(kept).cast("long").as("n_kept"),
      concat_ws(" ", kept).as("rewritten"))
  }

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
    * — the MOSS algorithm): hash every k-token shingle, slide a window of
    * `w` consecutive hashes, select each window's minimum; the selected
    * (position, hash) set is the document's fingerprint. Guarantee: any
    * shared token run of length >= w + k - 1 between two documents shares
    * at least one selected fingerprint, while only ~2/(w+1) of all grams
    * are kept — the local-fingerprinting dedup primitive between exact
    * hashing (all grams: spanOwnership) and MinHash (no locality).
    *
    * Selection convention: leftmost-lowest — (hash, position) is packed
    * into one long (hash * 2^30 + pos, lexicographic under integer order;
    * positions bounded by 2^30 tokens per document) so the per-window
    * argmin is a single `array_min`. Any fixed tie convention preserves
    * the winnowing guarantee. Pure per-row Catalyst (one md5 per gram,
    * O(shingles * w) per row), no shuffle — the fingerprint table feeds a
    * gram-keyed equijoin exactly like [[decontaminationJoin]]'s postings.
    * Output: (doc_id, pos, fp), pos 1-based shingle start. */
  def winnowFingerprints(docs: DataFrame, k: Int, w: Int,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")
    val Pack = 1073741824L // 2^30
    // (hash, position) packed per shingle start; shingle array bound once
    val keysExpr = flatten(transform(array(shingles(col(textCol), k)), g =>
      transform(sequence(lit(1), size(g)),
        i => TextCols.md5Bits32(element_at(g, i)) * lit(Pack) + i)))
    widen(docs)
      .select(col(idCol).as("doc_id"), keysExpr.as("keys"))
      .select(col("doc_id"),
        explode(array_distinct(
          flatten(transform(array(col("keys")), ks =>
            transform(sequence(lit(1), greatest(size(ks) - (w - 1), lit(1))),
              j => array_min(slice(ks, j, lit(w)))))))).as("key"))
      .select(col("doc_id"),
        pmod(col("key"), lit(Pack)).as("pos"),
        expr(s"key DIV $Pack").as("fp"))
  }

  /** Winnowing near-dup candidate pairs: documents sharing at least
    * `minShared` selected fingerprints, with the shared count — the JOIN
    * use of [[winnowFingerprints]] (MOSS-style containment/plagiarism
    * detection: a shared fingerprint witnesses a shared local token run,
    * so unlike MinHash the evidence is positional and unlike full-gram
    * Jaccard only ~2/(w+1) of grams enter the shuffle).
    *
    * Shape: distinct (doc_id, fp) postings — ids only — self-equijoined
    * on the fingerprint, count per pair; the same postings discipline as
    * [[decontaminationJoin]], with the same optional `maxDf` hot-key cap
    * (a fingerprint selected in >maxDf documents is boilerplate; capped
    * fps leave the evidence entirely, identical output when uncapped). */
  def winnowJoin(docs: DataFrame, k: Int, w: Int, minShared: Int = 1,
                 maxDf: Int = 0, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    import graft.core.Caching._
    // pin the postings: both self-join sides (and the optional hot-fp
    // count) read them — unpinned, the whole scan+hash+window derivation
    // runs once PER SIDE (seen in the explain dump)
    val fps = winnowFingerprints(docs, k, w, idCol, textCol)
      .select(col("doc_id"), col("fp")).distinct()
      .persistOnce()
    try {
      val capped =
        if (maxDf <= 0) fps
        else fps.join(hotGrams(fps, maxDf, keyCol = "fp"), Seq("fp"), "left_anti")
      // O(pairs) result persisted so the postings pin can be freed now;
      // the result cache is the caller's (Dedup materialize-and-free
      // contract)
      val result = capped.select(col("fp"), col("doc_id").as("rid"))
        .join(capped.select(col("fp"), col("doc_id").as("sid")), "fp")
        .filter(col("rid") < col("sid"))
        .groupBy(col("rid"), col("sid"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= minShared)
        .persistOnce()
      result.count()
      result
    } finally {
      fps.unpersist(false)
    }
  }

  /** Winnowing containment SPANS — the positional evidence behind a
    * [[winnowJoin]] pair (MOSS's actual report is matched regions, not
    * bare pair counts): per qualifying pair, the extent of the matched
    * material on EACH side as min/max selected-shingle start positions,
    * plus the shared-fingerprint count (identical to winnowJoin's
    * n_shared for the same pair — evidence consistency is spec-checked).
    * A tight span on one side + a wide span on the other is the
    * containment signature (quote vs quilt); downstream span-dedup
    * (spanRewrite) consumes exactly these extents.
    *
    * Shape: positions are merged to ONE row per (doc, fp) —
    * (lo, hi) extent — BEFORE the fp self-join (VERDICT r15 item 5).
    * Two wins over joining raw (doc, fp, pos) selections: the per-fp
    * fan-out is df^2 instead of (sum m)^2 in position multiplicity, and
    * the pair aggregation becomes a plain count(*) with map-side
    * combine — one row per (fp, pair) side guarantees fp-distinctness,
    * where the previous countDistinct(fp) compiled to an extra dedup
    * Exchange that shipped EVERY join row across the shuffle (the 4x
    * per-output cost rise the 10x gate measured: join rows grow ~130x
    * with the output while pairs compress map-side). min/max of the
    * merged extents equal min/max of the raw positions, so the output
    * is identical row-for-row. `maxDf` caps cross-doc fan-out exactly
    * as in winnowJoin. */
  def winnowSpans(docs: DataFrame, k: Int, w: Int, minShared: Int = 1,
                  maxDf: Int = 0, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    import graft.core.Caching._
    // merged BEFORE the persist: both join sides and the hot-fp count
    // read the collapsed (doc, fp, lo, hi) rows, never raw positions
    val fps = winnowFingerprints(docs, k, w, idCol, textCol)
      .groupBy(col("doc_id"), col("fp"))
      .agg(min(col("pos")).as("lo"), max(col("pos")).as("hi"))
      .persistOnce()
    try {
      val capped =
        if (maxDf <= 0) fps
        else fps.join(
          hotGrams(fps.select(col("doc_id"), col("fp")), maxDf,
            keyCol = "fp"),
          Seq("fp"), "left_anti")
      val a = capped.select(col("fp"), col("doc_id").as("rid"),
        col("lo").as("rlo"), col("hi").as("rhi"))
      val b = capped.select(col("fp"), col("doc_id").as("sid"),
        col("lo").as("slo"), col("hi").as("shi"))
      val result = a.join(b, "fp")
        .filter(col("rid") < col("sid"))
        .groupBy(col("rid"), col("sid"))
        // count(*) is countDistinct(fp) here by construction: each side
        // carries exactly one row per (doc, fp), so a pair sees each
        // shared fp once — and the plain count drops the dedup Exchange
        .agg(count(lit(1)).as("n_shared"),
          min(col("rlo")).as("rid_lo"), max(col("rhi")).as("rid_hi"),
          min(col("slo")).as("sid_lo"), max(col("shi")).as("sid_hi"))
        .filter(col("n_shared") >= minShared)
        .persistOnce()
      result.count()
      result
    } finally {
      fps.unpersist(false)
    }
  }

  /** Tokenizer-coverage analysis: per-document out-of-vocabulary rate
    * against the corpus' top-`vocabSize` tokens (by count desc, token —
    * a total order, so the vocabulary boundary is deterministic). Fully
    * relational (vocab join, no driver collect): one token-count
    * aggregation, a distributed top-k over it (TakeOrderedAndProject —
    * not a single-task global rank window), and a per-document count —
    * the pass a tokenizer-budget decision runs before training. */
  def oovRate(docs: DataFrame, vocabSize: Int, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val toks = widen(docs)
      .select(col(idCol).as("id"), explode(TextCols.tokens(col(textCol))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(1).as("in_vocab"))
    toks.join(vocab, Seq("tok"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("id").as("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_frac"))
  }

  /** CCNet/Gopher-style unigram-LM surprisal score — the "perplexity
    * filter" of a real pretraining pipeline, in ENGINE-EXACT arithmetic:
    * a token's surprisal is measured in whole bits as
    * bitlen(T) - bitlen(c) (T = total corpus token occurrences, c = the
    * token's occurrence count; bitlen = floor(log2)+1 via the binary
    * string length, integer-exact in both Spark and DuckDB — no
    * transcendental log whose last-ulp could diverge between engines).
    * High mean surprisal = rare-token-heavy (gibberish / OCR noise),
    * low = boilerplate — the same decision signal as an LM perplexity
    * gate, on a log2 scale.
    *
    * Shapes: one token-count aggregation (vocabulary-sized), the counts
    * join back to the token stream by token equijoin (AQE handles hot
    * tokens), one per-doc aggregation. No driver-side data, no windows.
    *
    * The RESULT comes back persisted (and materialized) so the
    * vocabulary-sized LM pin can be freed before returning; the result
    * cache is the caller's to unpersist once consumed (the Dedup
    * materialize-and-free contract). */
  def unigramSurprisal(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val toks = widen(docs)
      .select(col(idCol).as("id"), explode(TextCols.tokens(col(textCol))).as("tok"))
    // persisted for the call: the vocabulary-sized LM is consumed twice
    // (grand total, then the token join) — without the pin the corpus
    // would be re-tokenized and re-aggregated for each use
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .persistOnce()
    try {
      val totalRow = counts.agg(sum(col("c"))).head()
      // empty corpus: sum(c) is NULL. Any placeholder total works — the
      // token join over the empty stream yields the (correct) empty
      // result; the NPE from getLong was the only failure mode.
      val total = if (totalRow.isNullAt(0)) 1L else totalRow.getLong(0)
      val bits = (length(bin(lit(total))) - length(bin(col("c")))).cast("long")
      val out = toks.join(counts, "tok")
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_tokens"), sum(bits).as("sum_bits"))
        .select(col("id").as(idCol), col("n_tokens"), col("sum_bits"),
          (col("sum_bits").cast("double") / col("n_tokens")).as("mean_bits"))
        .persistOnce()
      out.count()
      out
    } finally {
      counts.unpersist(false)
    }
  }

  /** Content-defined chunking (LBFS/rsync-style) over the token stream:
    * a token whose 32-bit md5 prefix satisfies `hash % modulus == 0`
    * ENDS its chunk, so boundaries are functions of CONTENT, not
    * position — an insertion or deletion reshuffles only the chunk it
    * touches while every other chunk keeps its fingerprint (the
    * incremental-dedup property fixed-width chunking lacks;
    * spec-proven). Expected chunk length = `modulus` tokens.
    *
    * Output: one row per chunk — (idCol, chunk_idx, n_tokens, chunk_fp
    * = md5 of the space-joined chunk) plus `owner_id` = lowest doc
    * sharing the identical fingerprint (the dedup key: shared chunks
    * across documents are storage/training redundancy).
    *
    * Shape: a pure per-row loop (mapPartitions — the boundary hash +
    * md5 per chunk beat interpreted HOF folds at every scale), then a
    * map-side-combined min aggregate joined back on the fingerprint
    * for owners — NOT a fingerprint-partition window: a boilerplate
    * chunk shared by millions of documents is one window partition =
    * one task, while the aggregate reduces it map-side and the join
    * streams it (AQE splits the skewed key). The cut predicate and
    * fingerprint are md5-derived, so DuckDB replays chunk assembly
    * bit-for-bit (parallel unnest + windowed cut-count). */
  def cdcChunks(docs: DataFrame, modulus: Int = 32,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(modulus >= 2, s"cdcChunks: modulus=$modulus")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val in = widen(docs).select(col(idCol), col(textCol))
    val schema = StructType(Seq(in.schema.head.copy(name = "doc_id"),
      StructField("chunk_idx", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("chunk_fp", StringType, nullable = false)))
    val rows = in.rdd.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
      def cut(tok: String): Boolean = {
        val d = md.digest(tok.getBytes("UTF-8"))
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        h % modulus == 0L
      }
      it.flatMap { r =>
        val toks = r.getString(1).split(" ", -1)
        val out = scala.collection.mutable.ArrayBuffer[Row]()
        var start = 0
        var idx = 0L
        var i = 0
        while (i < toks.length) {
          if (cut(toks(i)) || i == toks.length - 1) {
            val chunk = toks.slice(start, i + 1)
            out += Row(r.get(0), idx, chunk.length.toLong,
              hex(md.digest(chunk.mkString(" ").getBytes("UTF-8"))))
            idx += 1
            start = i + 1
          }
          i += 1
        }
        out
      }
    }
    val spark = docs.sparkSession
    // persist the chunk pass ONCE: it carries a per-token md5 loop, and
    // both the owner aggregate and the probe side of the join read it
    val chunks = spark.createDataFrame(rows, schema).persistOnce()
    val owners = chunks.groupBy(col("chunk_fp"))
      .agg(min(col("doc_id")).as("owner_id"))
    freeRanked(chunks, chunks.join(owners, "chunk_fp")
      .select(chunks.columns.map(col) :+ col("owner_id"): _*))
  }

  /** Bigram-conditional LM surprisal — the second-order companion of
    * [[unigramSurprisal]]: each adjacent token pair (prev, cur) costs
    * `bitlen(count(prev as context)) - bitlen(count(prev, cur))` whole
    * bits, i.e. -log2 P(cur | prev) rounded to the same integer-exact
    * bitlen arithmetic (no transcendental log — identical in both
    * engines). Repetitive machine-generated text scores near 0;
    * incoherent token soup scores near the context entropy. A document
    * with fewer than 2 tokens has no bigrams: it keeps its output row
    * with (0, 0, 0.0) — the one-row-per-doc contract of the other
    * per-doc scores.
    *
    * Shape: two vocabulary-sized aggregations (context counts, pair
    * counts) + one per-doc re-join and sum — the unigram shape plus one
    * join, all map-side-combined shuffles, no driver-side data. */
  def bigramSurprisal(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val t = TextCols.tokens(col(textCol))
    val pairs = widen(docs)
      .select(col(idCol).as("id"),
        explode(arrays_zip(slice(t, lit(1), size(t) - 1),
            slice(t, lit(2), size(t) - 1)))
          .as("bg"))
      .select(col("id"), col("bg").getField("0").as("prev"),
        col("bg").getField("1").as("cur"))
      .persistOnce()
    try {
      val ctx = pairs.groupBy(col("prev")).agg(count(lit(1)).as("cp"))
      val pc = pairs.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("cpc"))
      val bits = (length(bin(col("cp"))) - length(bin(col("cpc")))).cast("long")
      val perDoc = pairs
        .join(pc, Seq("prev", "cur"))
        .join(ctx, Seq("prev"))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(bits).as("sum_bits"))
      val out = widen(docs).select(col(idCol).as("id"))
        .join(perDoc, Seq("id"), "left")
        .select(col("id").as(idCol),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("sum_bits"), lit(0L)).as("sum_bits"),
          when(col("n_bigrams").isNull, lit(0.0))
            .otherwise(col("sum_bits").cast("double") / col("n_bigrams"))
            .as("mean_bits"))
        .persistOnce()
      out.count()
      out
    } finally pairs.unpersist(false)
  }

  /** DSIR-style importance selection (Xie et al.'s data-selection-with-
    * importance-resampling shape, made deterministic and engine-exact):
    * score every document by how much more likely its token bigrams are
    * under a TARGET subcorpus's unigram-of-bigrams distribution than
    * under the raw corpus's, then keep the top ceil(N * keepNum /
    * keepDen) documents by (score desc, id) — the docs that look most
    * like the target domain.
    *
    * Per-bigram importance is whole-bit log-likelihood-ratio
    * arithmetic, exact in both engines (no transcendental log):
    *   imp(f) = [bitlen(ct(f) + 1) - bitlen(Tt + 1)]
    *          - [bitlen(craw(f)) - bitlen(Traw)]
    * where ct/craw are the bigram's occurrence counts in the target /
    * full corpus (craw >= 1 for observed bigrams; the +1 smooths
    * target-unseen bigrams) and Tt/Traw the respective totals. A
    * document's score_bits is the sum over its bigram OCCURRENCES;
    * documents with no bigrams score 0.
    *
    * Shape: two vocabulary-sized aggregations (target counts, raw
    * counts — map-side combined), the per-feature weight joined back to
    * the occurrence stream, one per-doc sum, then the [[rankByKey]]
    * distributed global rank on (-score_bits, id) — range-partition +
    * two-phase offsets, never a single-task window, so the selection
    * holds at any corpus size. Output: one row per document
    * (idCol, n_bigrams, score_bits, dsir_rank, keep). */
  def importanceSelect(docs: DataFrame, targetPred: Column,
                       keepNum: Long, keepDen: Long,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(keepNum >= 0 && keepDen > 0 && keepNum <= keepDen,
      s"keep fraction must be a rational in [0,1]: $keepNum/$keepDen")
    val t = TextCols.tokens(col(textCol))
    val pairs = widen(docs)
      .select(col(idCol).cast("long").as("id"), targetPred.as("is_tgt"),
        explode(arrays_zip(slice(t, lit(1), size(t) - 1),
            slice(t, lit(2), size(t) - 1)))
          .as("bg"))
      .select(col("id"), col("is_tgt"),
        concat(col("bg").getField("0"), lit(" "), col("bg").getField("1")).as("f"))
      .persistOnce()
    try {
      val counts = pairs.groupBy(col("f")).agg(
        count(lit(1)).as("craw"),
        sum(when(col("is_tgt"), 1L).otherwise(0L)).as("ct"))
      val totals = counts.agg(
        coalesce(sum(col("craw")), lit(0L)).cast("long"),
        coalesce(sum(col("ct")), lit(0L)).cast("long")).head()
      val (tRaw, tTgt) = (totals.getLong(0), totals.getLong(1))
      val bitTRaw = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, tRaw))
      val bitTTgt = 64 - java.lang.Long.numberOfLeadingZeros(tTgt + 1)
      val imp = (length(bin(col("ct") + 1)) - lit(bitTTgt)
        - length(bin(col("craw"))) + lit(bitTRaw)).cast("long")
      val perDoc = pairs
        .join(counts.select(col("f"), imp.as("imp")), Seq("f"))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("imp")).as("score_bits"))
      // the scored projection folds INTO the rank pass as carried payload
      // (rankByKeyCarry): one range-partitioned materialization replaces
      // the previous three sequential persisted passes (scored frame +
      // rank frame + the rank-attach join) — VERDICT r16 item 7; the
      // phase-1 row-count alignment witness is unchanged, and the pass's
      // partition counts double as the keep-threshold total n
      // LAZY persist: rankByKeyCarry's range-boundary sampling job is the
      // first action and populates the cache; the shuffle pass then reads
      // it (an unpersisted input would re-run the scoring join twice —
      // RangePartitioning samples its child in a separate job)
      val scored = widen(docs).select(col(idCol).cast("long").as("id"))
        .join(perDoc, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("score_bits"), lit(0L)).as("score_bits"))
        .persistOnce()
      val (ranked, n) = rankByKeyCarry(
        scored.select(col("id"), (-col("score_bits")).as("k"),
          col("n_bigrams"), col("score_bits")),
        "dsir_rank")
      val k = (n * keepNum + keepDen - 1) / keepDen
      val out = ranked
        .select(col("id").as(idCol), col("n_bigrams"), col("score_bits"),
          col("dsir_rank"), (col("dsir_rank") <= k).as("keep"))
        .persistOnce()
      out.count()
      ranked.unpersist()
      scored.unpersist()
      out
    } finally pairs.unpersist(false)
  }

  /** Benchmark decontamination: for every (train, eval) document pair
    * that shares at least one distinct n-token shingle, the number of
    * distinct shingles they share. Any hit means the training document
    * leaks (part of) the eval document and must be dropped or flagged.
    *
    * Shape: per-side distinct (shingle, id) postings — ids only, the
    * text never enters the shuffle — equijoined on the shingle, then a
    * count per pair. One shuffle each for the two distinct-izes, one for
    * the join; hot shingles (boilerplate) are the skew risk at corpus
    * scale, handled by AQE skew splitting.
    *
    * @param maxTrainDf optional hot-shingle cap (0 = uncapped): shingles
    *        appearing in more than this many TRAIN documents are excluded
    *        before the join — the standard boilerplate mitigation (a gram
    *        in 10M training docs is navigation chrome, not leakage, and
    *        its postings product would dominate the join). Exclusion can
    *        only remove shared-gram evidence, so capped n_shared <=
    *        uncapped n_shared and pairs sharing only hot grams vanish;
    *        when no shingle exceeds the cap the output is identical
    *        (spec-checked). The hot set is tiny (boilerplate tail), so
    *        the anti-join broadcasts under AQE. */
  def decontaminationJoin(train: DataFrame, eval: DataFrame, n: Int,
                          idCol: String = "doc_id",
                          textCol: String = "text",
                          maxTrainDf: Int = 0): DataFrame =
    decontaminationJoinOnPostings(
      contaminationPostings(train, n, "train_id", idCol, textCol),
      contaminationPostings(eval, n, "eval_id", idCol, textCol),
      maxTrainDf)

  /** One side's (id, gram)-distinct shingle postings — the
    * [[decontaminationJoin]] per-side derivation, exposed so a caller
    * running several cap variants over the SAME corpus (the
    * q_contamination / q_contamination_capped pairing) can derive and
    * cache each side once; the join is unchanged either way. */
  def contaminationPostings(df: DataFrame, n: Int, out: String,
                            idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame =
    widen(df)
      .select(col(idCol).as(out), explode(shingles(col(textCol), n)).as("gram"))
      .distinct()

  /** [[decontaminationJoin]] over pre-derived postings (columns
    * (train_id, gram) / (eval_id, gram), each (id, gram)-distinct). */
  def decontaminationJoinOnPostings(trainPostings: DataFrame,
                                    evalPostings: DataFrame,
                                    maxTrainDf: Int = 0): DataFrame =
    capHotGrams(trainPostings, maxTrainDf)
      .join(evalPostings, "gram")
      .groupBy(col("eval_id"), col("train_id"))
      .agg(count(lit(1)).as("n_shared"))

  /** Shared hot-gram df-cap: drop grams present in more than `maxDf`
    * input rows' documents (0 = no-op). The hot set is the boilerplate
    * tail — tiny, so the anti-join broadcasts under AQE; dropping it
    * bounds every downstream gram-keyed join key's fan-out. `postings`
    * must be (idLikeCol, gram)-distinct so the count is a document
    * frequency. */
  private def capHotGrams(postings: DataFrame, maxDf: Int): DataFrame =
    if (maxDf <= 0) postings
    else postings.join(hotGrams(postings, maxDf), Seq("gram"), "left_anti")

  /** The keys present in more than `maxDf` rows of `distinctPostings`
    * (which must be (idLike, key)-distinct so the count is a document
    * frequency). */
  private def hotGrams(distinctPostings: DataFrame, maxDf: Int,
                       keyCol: String = "gram"): DataFrame =
    distinctPostings.groupBy(col(keyCol))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col(keyCol))

  /** PII patterns, restricted to the regex subset with identical
    * semantics in Java regex (Spark) and RE2 (DuckDB): character
    * classes, counted repetition, grouping — no lookaround, no
    * backreferences, no `\b`/`\d` shorthands (whose Unicode behavior
    * differs between the engines). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** PII redaction — the pre-training privacy scrub (emails, phone
    * numbers, IPv4 addresses → typed placeholder tokens, plus per-class
    * counts for the removal audit trail).
    *
    * Classes apply in a FIXED order (email, then phone, then IP), each
    * counted on the text as left by the previous class: an address
    * already collapsed to `<EMAIL>` can no longer donate its digit runs
    * to the phone or IP count, so the three counts partition the
    * redacted characters unambiguously — and the oracle replays the
    * same three-step CTE chain, keeping the counts engine-exact.
    *
    * Pure per-row projection: no shuffle, no UDF (regexp_replace /
    * regexp_count are codegen'd) — the shape scales to any corpus size
    * untouched. Output: (idCol, clean_text, n_email, n_phone, n_ip). */
  def piiScrub(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailPattern, "<EMAIL>")
    val t2 = regexp_replace(t1, PhonePattern, "<PHONE>")
    val t3 = regexp_replace(t2, Ipv4Pattern, "<IP>")
    docs.select(col(idCol),
      t3.as("clean_text"),
      regexp_count(t0, lit(EmailPattern)).cast("long").as("n_email"),
      regexp_count(t1, lit(PhonePattern)).cast("long").as("n_phone"),
      regexp_count(t2, lit(Ipv4Pattern)).cast("long").as("n_ip"))
  }

  /** EXACT frequency-fraction heavy hitters — every token whose count
    * strictly exceeds 1/phiDen of the corpus token total — via two-pass
    * Misra–Gries candidate pruning.
    *
    * Why not one `groupBy(token)`? At 100 TB that shuffles EVERY token
    * occurrence key (the full vocabulary, long-tail included) to build
    * counts that are then almost all thrown away. Here:
    *
    *  - pass 1 is shuffle-free: a `treeAggregate` of per-partition
    *    [[graft.core.MisraGries]] sketches (k >= phiDen counters) whose
    *    merge bound guarantees every true heavy hitter survives; the
    *    driver receives ONE k-entry map regardless of cluster size;
    *  - pass 2 re-scans, keeps only the <= k candidate tokens via a
    *    broadcast semi-join, and counts THOSE exactly — the shuffle
    *    carries at most partitions x k map-side-combined rows, not the
    *    vocabulary.
    *
    * The sketch is candidates-only, so the output is EXACT (identical
    * to the full groupBy, spec-checked) and carries a plain SQL oracle:
    * `HAVING count(*) * phiDen > total`. Threshold semantics are
    * integer cross-multiplication — no FP boundary, engine-exact.
    *
    * Guarantee: a token with count c where c * phiDen > n satisfies
    * c > n/phiDen >= n/(k+1) (requires k + 1 >= phiDen, enforced), so
    * it survives pass 1; pass 2 cannot lose or miscount survivors.
    *
    * Output: (token, cnt) for all tokens with cnt * phiDen > n. */
  def heavyHitters(docs: DataFrame, phiDen: Long = 1000L,
                   sketchSize: Int = 2048,
                   textCol: String = "text"): DataFrame = {
    require(phiDen >= 2, s"heavyHitters: phiDen=$phiDen")
    require(sketchSize + 1 >= phiDen,
      s"heavyHitters: sketchSize=$sketchSize breaks the survival " +
        s"guarantee for phiDen=$phiDen (need sketchSize + 1 >= phiDen)")
    val spark = docs.sparkSession
    val toks = widen(docs)
      .select(explode(TextCols.tokens(col(textCol))).as("token"))
    val sketch = toks.rdd.map(_.getString(0))
      .treeAggregate(new graft.core.MisraGries(sketchSize))(
        (mg, t) => mg.add(t), (a, b) => a.merge(b), depth = 2)
    val total = sketch.n
    val candidates = spark.createDataFrame(
      sketch.counts.keysIterator.map(Tuple1(_)).toSeq).toDF("token")
    toks.join(broadcast(candidates), "token")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * phiDen > lit(total))
  }
}
