package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tests for the training-data pipeline operators: recall of the
  * probabilistic dedup/ANN paths against their exact counterparts, and
  * schema/shape of the multimodal plumbing. */
class PipelineOpsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("pipeline-ops-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = {
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Fixtures.documents(spark, "/root/testdata/sf0.001")
  }

  private def embs = graft.sources.Fixtures.embeddings(spark, "/root/testdata/sf0.001")

  test("connected components (large-star/small-star) == brute-force BFS labels") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // adversarial-ish graph: cliques, long chains (stress the O(log n)
    // round bound), isolated vertices, duplicate + self edges
    val n = 400
    val edges = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    for (c <- 0 until 20) { // cliques of 5 at stride 13 (disjoint from chains)
      val base = c * 13
      for (i <- 0 until 5; j <- i + 1 until 5) edges += ((base + i, base + j))
    }
    for (s <- 0 until 4) { // chains of length 30 in the 1000+ range
      val start = 1000 + s * 50
      for (i <- 0 until 29) edges += ((start + i, start + i + 1))
    }
    edges += ((5L, 5L)) // self loop
    edges ++= edges.take(10) // duplicates
    for (_ <- 0 until 50) { // random noise edges
      edges += ((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    }
    val verts = (0L until n.toLong) ++ (1000L until 1200L) ++ Seq(5000L) // 5000 isolated
    // brute-force union-find on the driver
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    verts.foreach(v => find(v))
    edges.foreach { case (a, b) => union(a, b) }
    val expected = verts.map(v => v -> find(v)).toMap
    val got = Dedup.connectedComponents(spark,
        edges.toSeq.toDF("rid", "sid"), verts.toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == verts.size)
    val bad = verts.filter(v => got(v) != expected(v))
    assert(bad.isEmpty, s"label mismatch at ${bad.take(5).map(v => (v, got(v), expected(v)))}")
    // the big-graph DataFrame round engine (forced via catalystCutover = 0)
    // must produce identical labels to the RDD round engine above
    val gotDf = Dedup.connectedComponents(spark,
        edges.toSeq.toDF("rid", "sid"), verts.toDF("id"), catalystCutover = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDf == got, "DataFrame and RDD round engines disagree")
  }

  test("jaccard prefix-filter join finds exactly the brute-force pair set") {
    val tau = 0.85
    val viaPrefix = Dedup.jaccardJoin(docs, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force within Spark
    val toks = docs.select(col("doc_id").as("id"),
      array_distinct(split(col("text"), " ")).as("s"))
    val t2 = toks.select(col("id").as("id_b"), col("s").as("s_b"))
    val inter = size(array_intersect(col("s"), col("s_b"))).cast("double")
    val brute = toks.crossJoin(t2).filter(col("id") < col("id_b"))
      .withColumn("j", inter / (size(col("s")) + size(col("s_b")) - inter))
      .filter(col("j") >= tau)
      .select(col("id"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    assert(viaPrefix == brute,
      s"missed=${(brute -- viaPrefix).size} extra=${(viaPrefix -- brute).size}")
  }

  test("md5-keyed dedup groupBy: exact output on near-identical long documents") {
    // the round-6 shuffle-hygiene fix keys the dedup groupBy on a 16-byte
    // md5 of the canonical set encoding instead of the token array itself;
    // this fixture is the adversarial shape for that change — LONG
    // documents (array-key bytes would dominate the old exchange) in
    // exact-duplicate families plus one-token perturbations right at the
    // threshold boundary — and must produce the identical pair set
    import spark.implicits._
    val base = (0 until 400).map(i => s"tok$i")
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    for (fam <- 0 until 6) {
      val famToks = base.map(t => s"${t}_f$fam")
      // three exact duplicates per family (same token SET, shuffled order)
      rows += ((fam * 10L, famToks.mkString(" ")))
      rows += ((fam * 10L + 1, famToks.reverse.mkString(" ")))
      rows += ((fam * 10L + 2, (famToks.drop(7) ++ famToks.take(7)).mkString(" ")))
      // near-identical: one token replaced (J = 399/401 ~ 0.995)
      rows += ((fam * 10L + 3,
        (famToks.tail :+ s"alt_f$fam").mkString(" ")))
      // distant: half the tokens replaced (J ~ 1/3)
      rows += ((fam * 10L + 4,
        (famToks.take(200) ++ (0 until 200).map(i => s"far${i}_f$fam")).mkString(" ")))
    }
    val longDocs = rows.toSeq.toDF("doc_id", "text")
    val tau = 0.9
    val got = Dedup.jaccardJoin(longDocs, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val toks = longDocs.select(col("doc_id").as("id"),
      array_distinct(split(col("text"), " ")).as("s"))
    val t2 = toks.select(col("id").as("id_b"), col("s").as("s_b"))
    val inter = size(array_intersect(col("s"), col("s_b"))).cast("double")
    val brute = toks.crossJoin(t2).filter(col("id") < col("id_b"))
      .withColumn("j", inter / (size(col("s")) + size(col("s_b")) - inter))
      .filter(col("j") >= tau)
      .select(col("id"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // sanity: the fixture exercises both the intra (exact-dup) and inter
    // (near-identical) paths, and excludes the distant variants
    assert(brute.contains((0L, 1L)) && brute.contains((0L, 3L)))
    assert(!brute.exists { case (a, b) => b % 10 == 4 || a % 10 == 4 })
    assert(got == brute,
      s"missed=${(brute -- got).size} extra=${(got -- brute).size}")
    // simhash on the same fixture: every emitted pair's Hamming distance
    // verified, exact-duplicate families always present (distance 0)
    val sh = Dedup.simhashDedup(spark, longDocs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val shSet = sh.map(t => (t._1, t._2)).toSet
    assert(shSet.contains((0L, 1L)) && shSet.contains((0L, 2L)))
    assert(sh.forall(_._3 <= 3))
  }

  test("minhash LSH recall >= 0.9 at tau 0.5 vs exact shingle jaccard") {
    val lsh = Dedup.minhashLsh(spark, docs, 0.5, numHashes = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty, "no LSH pairs found")
    // every reported pair truly has jaccard >= 0.5 (verified in-op), so
    // precision is 1.0 by construction; check recall against a small
    // brute-force sample of doc pairs
    val sample = docs.orderBy(col("doc_id")).limit(60)
    val lshSample = Dedup.minhashLsh(spark, sample, 0.5, numHashes = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteSample = Dedup.minhashLsh(spark, sample, 0.5,
      numHashes = 64, bands = 64) // 1-row bands => candidate = any shared minhash
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = if (bruteSample.isEmpty) 1.0
      else (bruteSample & lshSample).size.toDouble / bruteSample.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("aHash: reference recomputation, identical-image collision, bit sensitivity") {
    import spark.implicits._
    val payloads = Multimodal.withImagePayload(docs)
    val got = Multimodal.imagePerceptualHash(spark, payloads).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // reference: recompute from the text synthesis rule directly
    val texts = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    texts.foreach { case (id, text) =>
      val src = if (text.isEmpty) Array[Byte](0) else text.getBytes("UTF-8")
      val red = Array.tabulate(64) { i =>
        val y = i / 8; val x = i % 8
        src((3 * (32 * y + 2 * x)) % src.length) & 0xff
      }
      val sum = red.map(_.toLong).sum
      var hi = 0L; var lo = 0L
      for (i <- 0 until 64 if 64L * red(i) > sum)
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      assert(got(id) == ((hi, lo)), s"doc $id hash mismatch")
    }
    // identical text -> identical image -> identical hash, same rep group
    val twins = Seq((1L, "twin text payload"), (2L, "twin text payload"),
      (3L, "a different text")).toDF("doc_id", "text")
    val th = Multimodal.imagePerceptualHash(spark,
        Multimodal.withImagePayload(twins)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(th(1L) == th(2L))
    assert(th(1L) != th(3L), "distinct texts should perturb the hash")
  }

  test("simhash near-dup pairs have verified hamming <= threshold, non-empty") {
    val pairs = Dedup.simhashDedup(spark, docs, maxHamming = 12).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getInt(2) <= 12))
  }

  test("PPM codec: roundtrip, header tolerance, malformed rejection, resize") {
    val rnd = new scala.util.Random(29)
    val rgb = Array.fill(3 * 16 * 16)(rnd.nextInt(256).toByte)
    // roundtrip
    val enc = Multimodal.encodePpm(16, 16, rgb)
    val dec = Multimodal.decodePpm(enc)
    assert(dec.exists { case (w, h, px) => w == 16 && h == 16 && px.sameElements(rgb) })
    // whitespace / comment-tolerant header (the format's real grammar)
    val weird = ("P6 # a comment\n  16\t16 # sizes\n255\n").getBytes("US-ASCII") ++ rgb
    val dec2 = Multimodal.decodePpm(weird)
    assert(dec2.exists { case (w, h, px) => w == 16 && h == 16 && px.sameElements(rgb) })
    // malformed inputs are rejected, not crashed on
    assert(Multimodal.decodePpm(Array[Byte]()).isEmpty)
    assert(Multimodal.decodePpm("P5\n2 2\n255\n".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodePpm("P6\n16 16\n255\n".getBytes("US-ASCII") ++
      rgb.take(10)).isEmpty, "truncated pixel plane")
    assert(Multimodal.decodePpm("P6\n16 16\n65535\n".getBytes("US-ASCII") ++
      rgb).isEmpty, "16-bit maxval out of scope")
    // nearest-neighbor resize: 2x downscale picks every other pixel
    val small = Multimodal.resizeRgb(16, 16, rgb, 8, 8)
    assert(small.length == 3 * 8 * 8)
    for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3)
      assert(small(3 * (y * 8 + x) + c) == rgb(3 * (2 * y * 16 + 2 * x) + c))
    // color histogram: channel-separated, normalized
    val hist = Multimodal.decodeColorHist(rgb)
    assert(hist.length == 3 && hist.forall(ch => math.abs(ch.sum - 1.0) < 1e-9))
  }

  test("keepBest == brute-force per-cluster quality argmax; singletons self-keep") {
    import spark.implicits._
    val edges = Dedup.simhashDedup(spark, docs, maxHamming = 7)
      .select(col("rid"), col("sid"))
    val cc = Dedup.connectedComponents(spark, edges, docs.select(col("doc_id")))
    val members = cc.collect().map(r => (r.getLong(0), r.getLong(1)))
    val scores = docs.select(col("doc_id"),
        round(graft.functions.TextCols.qualityScore(col("text")), 6).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = members.groupBy(_._2).map { case (cl, ms) =>
      val keeper = ms.map(_._1).minBy(id => (-scores(id), id))
      (cl, keeper, ms.length.toLong, ms.length - 1L)
    }.toSet
    val got = Dedup.keepBest(spark, docs, edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    assert(want.exists(_._3 > 1L), "vacuous: need at least one real cluster")
    assert(want.exists(t => t._3 > 1L && t._2 != t._1),
      "vacuous: some keeper must beat the lowest-id member on quality")
    cc.unpersist(); edges.unpersist()
  }

  test("WAV codec: roundtrip, chunk tolerance, malformed rejection, resample") {
    val rnd = new scala.util.Random(31)
    val pcm = Array.fill(320)(rnd.nextInt(65536).toShort)
    // roundtrip
    val enc = Multimodal.encodeWav(8000, pcm)
    assert(enc.length == 44 + 640)
    val dec = Multimodal.decodeWav(enc)
    assert(dec.exists { case (sr, s) => sr == 8000 && s.sameElements(pcm) })
    // unknown chunks between fmt and data are skipped (real files carry
    // LIST/INFO), including an ODD-size chunk exercising word alignment
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5, 0) // 5 + pad
    val withList = enc.take(36) ++ listChunk ++ enc.drop(36)
    val dec2 = Multimodal.decodeWav(withList)
    assert(dec2.exists { case (sr, s) => sr == 8000 && s.sameElements(pcm) })
    // malformed inputs are rejected, not crashed on
    assert(Multimodal.decodeWav(Array[Byte]()).isEmpty)
    assert(Multimodal.decodeWav("RIFF1234AVI ".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodeWav(enc.take(50)).isEmpty, "truncated data chunk")
    assert(Multimodal.decodeWav(enc.updated(20, 2.toByte)).isEmpty,
      "non-PCM format code")
    val noFmt = enc.take(12) ++ enc.drop(36) // data before any fmt chunk
    assert(Multimodal.decodeWav(noFmt).isEmpty)
    // crafted chunk length near Int.MaxValue: pos + 8 + len overflows a
    // 32-bit compare to negative and would slip past the bounds check —
    // the decoder compares in Long, so this must reject, not read OOB
    val hugeLen = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(Int.MaxValue - 4).array()
    val crafted = enc.take(40) ++ hugeLen ++ enc.drop(44)
    assert(Multimodal.decodeWav(crafted).isEmpty, "overflowing chunk length")
    // negative length is rejected outright
    val negLen = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-8).array()
    assert(Multimodal.decodeWav(enc.take(40) ++ negLen ++ enc.drop(44)).isEmpty,
      "negative chunk length")
    // nearest-index resample: 320 -> 240 reads source (j*4)//3; 320 -> 160
    // picks every other sample
    val r = Multimodal.resampleNearest(pcm, 240)
    assert(r.length == 240)
    for (j <- 0 until 240) assert(r(j) == pcm(j * 4 / 3))
    val half = Multimodal.resampleNearest(pcm, 160)
    for (j <- 0 until 160) assert(half(j) == pcm(2 * j))
  }

  test("audioRmsFingerprint == brute force over synthesized payloads") {
    import spark.implicits._
    val all = docs.select("doc_id", "text").as[(Long, String)].collect()
    val got = Multimodal.audioRmsFingerprint(spark,
        Multimodal.withAudioPayload(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    assert(got.size == all.length * 4, "4 windows per document")
    for ((id, text) <- all.take(40)) {
      val raw = text.getBytes("UTF-8")
      val src = if (raw.isEmpty) Array[Byte](0) else raw
      val samples = Array.tabulate(320)(i =>
        ((src(i % src.length) & 0xff) * 256 - 16384).toShort)
      val r = Multimodal.resampleNearest(samples, 240)
      for (wi <- 0 until 4) {
        val win = r.slice(60 * wi, 60 * wi + 60).map(_.toLong)
        val rms = math.sqrt(win.map(s => s * s).sum.toDouble / 60)
        val fp = win.foldLeft(1125899906842597L % 2147483647L)(
          (acc, s) => (31 * acc + (s + 32768L)) % 2147483647L)
        assert(got((id, wi.toLong)) == ((rms, fp)), s"doc $id window $wi")
      }
    }
  }

  test("scaledCentroids derives ~sqrt(N) within clamps") {
    assert(Ann.scaledCentroids(0L) == 16)
    assert(Ann.scaledCentroids(100L) == 16)
    assert(Ann.scaledCentroids(2000L) == 45)      // ceil(sqrt(2000))
    assert(Ann.scaledCentroids(1000000L) == 1000)
    assert(Ann.scaledCentroids(100000000L) == 4096) // upper clamp
  }

  test("IVF top-k has recall >= 0.6 vs brute force at nProbe=6/16") {
    val query = embs.orderBy(col("vec_id")).limit(1)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    val exact = Ann.bruteForceTopK(embs, query, 20)
      .collect().map(_.getLong(0)).toSet
    val centroids = Ann.trainCentroids(spark, embs, numCentroids = 16)
    val index = Ann.ivfIndex(spark, embs, centroids)
    val approx = Ann.ivfTopK(spark, index, centroids, query, 20, nProbe = 6)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall")
  }

  test("PQ: ADC scores == driver-recomputed codebook distances; planted " +
    "exact twin of the query ranks first") {
    import spark.implicits._
    val query = embs.orderBy(col("vec_id")).limit(1)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    // plant an exact copy of the query at a low id: its codes are the
    // query's own argmin codes, so its ADC score is the global minimum
    // sum(lut[m][code_q(m)]) and (score, id) ranks it first
    val planted = embs.select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .union(Seq((-1L, query)).toDF("vec_id", "embedding"))
    val cbs = Ann.pqTrain(spark, planted, numSub = 4, ksub = 8, iters = 2)
    val idx = Ann.pqEncode(planted, cbs)
    val qq = Cluster.quantize(planted.filter(col("vec_id") === -1L), 1000)
      .select(col("v")).head().getSeq[Long](0).toArray
    val top = Ann.pqTopK(idx, cbs, qq, 10).collect()
    assert(top.head.getLong(0) == -1L, s"twin not first: ${top.head}")
    // independently recompute every returned score from the codebooks
    val codes = idx.filter(col("id").isin(top.map(_.getLong(0)): _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    top.foreach { r =>
      val cs = codes(r.getLong(0))
      val want = cs.zipWithIndex.map { case (c, m) =>
        val cent = cbs(m)(c)
        cent.indices.map { i =>
          val t = qq(m * cent.length + i) - cent(i); t * t
        }.sum
      }.sum
      assert(r.getLong(1) == want, s"ADC mismatch for ${r.getLong(0)}")
    }
  }

  test("residual IVF-PQ: probed subset scored only, recall vs exact integer top-20") {
    import spark.implicits._
    val embs = graft.sources.Fixtures.embeddings(spark, "/root/testdata/sf0.001")
    val minId = embs.agg(min(col("vec_id"))).head().getLong(0)
    val rest = embs.filter(col("vec_id") =!= minId)
    val qq = Cluster.quantize(embs.filter(col("vec_id") === minId), 1000)
      .select(col("v")).head().getSeq[Long](0).toArray
    val exact = Cluster.quantize(rest, 1000).collect()
      .map { r =>
        val v = r.getSeq[Long](1).toArray
        var d = 0L; var i = 0
        while (i < v.length) { val t = v(i) - qq(i); d += t * t; i += 1 }
        (d, r.getLong(0))
      }.sorted.take(20).map(_._2).toSet
    val part = Ann.ivfPqTopK(spark, rest, qq, kCoarse = 4, nProbe = 2,
      numSub = 4, ksub = 8, k = 20).collect().map(_.getLong(0)).toSet
    val full = Ann.ivfPqTopK(spark, rest, qq, kCoarse = 4, nProbe = 4,
      numSub = 4, ksub = 8, k = 20).collect().map(_.getLong(0)).toSet
    val rPart = (part & exact).size / 20.0
    val rFull = (full & exact).size / 20.0
    // 8-code 16-dim residual books on 49 tiny-fixture vectors quantize
    // far coarser than the neighbor gaps, so absolute recall here is a
    // data property, not a correctness signal (the q_ivfpq_topk oracle
    // hash-checks the full pipeline at sf0.01) — record it, bound the
    // probe monotonicity, and pin EXACTNESS on a planted twin below
    info(s"recall@20: nProbe=2 $rPart, nProbe=4 $rFull")
    assert(rFull >= rPart - 1e-9, s"full probe recall $rFull < partial $rPart")
    assert(part.size == 20 && full.size == 20)
    // planted twin of the query (lowest id, so ties cannot hide it):
    // identical vector => same coarse cell as the query's first probe,
    // residual == the query's per-cell residual => its code attains the
    // per-subspace LUT minimum => globally minimal ADC => rank 1
    val twin = embs.filter(col("vec_id") === minId)
      .select(lit(-5L).as("vec_id"), col("embedding"))
    val planted = Ann.ivfPqTopK(spark,
      rest.select(col("vec_id"), col("embedding")).unionByName(twin), qq,
      kCoarse = 4, nProbe = 1, numSub = 4, ksub = 8, k = 5).collect()
    assert(planted.head.getLong(0) == -5L,
      s"planted twin not rank-1: ${planted.map(r => (r.getLong(0), r.getLong(1))).toSeq}")
    // rerank tail: with a shortlist covering every probed member, the
    // result IS the exact integer top-k over the probed subset — and the
    // planted twin reranks to d2 = 0 at rank 1
    val rr = Ann.ivfPqTopKRerank(spark,
      rest.select(col("vec_id"), col("embedding")).unionByName(twin), qq,
      kCoarse = 4, nProbe = 1, numSub = 4, ksub = 8, k = 5,
      shortlist = 1000).collect()
    assert(rr.head.getLong(0) == -5L && rr.head.getLong(1) == 0L)
    // rerank distances are exact, so they are sorted and >= the ADC-free
    // lower bound of 0, strictly increasing past the twin
    val d2s = rr.map(_.getLong(1)).toSeq
    assert(d2s == d2s.sorted)
  }

  test("ivfPqBatchTopK: a query set of one reproduces ivfPqTopK row-for-row; " +
    "multi-query returns k ranked rows per query") {
    import spark.implicits._
    val embs = graft.sources.Fixtures.embeddings(spark, "/root/testdata/sf0.001")
    val minId = embs.agg(min(col("vec_id"))).head().getLong(0)
    val rest = embs.filter(col("vec_id") =!= minId)
    val qq = Cluster.quantize(embs.filter(col("vec_id") === minId), 1000)
      .select(col("v")).head().getSeq[Long](0).toArray
    val single = Ann.ivfPqTopK(spark, rest, qq, kCoarse = 4, nProbe = 2,
        numSub = 4, ksub = 8, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val idx = Ann.buildIvfPqIndex(spark, rest, kCoarse = 4, numSub = 4, ksub = 8)
    try {
      val qdf = Seq((minId, qq.toSeq)).toDF("qid", "v")
      val got = Ann.ivfPqBatchTopK(qdf, idx, nProbe = 2, k = 10)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
        .sortBy(identity)
      assert(got == single.sortBy(identity),
        s"batch-of-one != single-query: $got vs $single")
      // multi-query: k rows per query, each list sorted by (adc_d2, id)
      val queries = Cluster.quantize(embs.filter(col("vec_id") % 125 === 0), 1000)
        .select(col("id").as("qid"), col("v"))
      val nq = queries.count()
      val multi = Ann.ivfPqBatchTopK(queries, idx, nProbe = 2, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(multi.length == nq * 5, s"${multi.length} rows for $nq queries")
      assert(multi.groupBy(_._1).forall(_._2.length == 5))
      // the batch path must agree with the single-query path on EVERY
      // query in the set, not just minId
      multi.groupBy(_._1).foreach { case (qid, rows) =>
        val qv = Cluster.quantize(embs.filter(col("vec_id") === qid), 1000)
          .select(col("v")).head().getSeq[Long](0).toArray
        val want = Ann.ivfPqTopK(spark, rest, qv, kCoarse = 4, nProbe = 2,
            numSub = 4, ksub = 8, k = 5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(rows.map(r => (r._2, r._3)).toSet == want,
          s"query $qid: batch != single")
      }
    } finally idx.close()
  }

  test("PQ rerank (16x16 books, ADC top-200 shortlist) recall >= 0.95 vs " +
    "exact integer-L2 top-20; returned distances are the exact ones") {
    val minId = embs.agg(min(col("vec_id"))).head().getLong(0)
    val rest = embs.filter(col("vec_id") =!= minId)
    val cbs = Ann.pqTrain(spark, rest, numSub = 16, ksub = 16, iters = 2)
    val qq = Cluster.quantize(embs.filter(col("vec_id") === minId), 1000)
      .select(col("v")).head().getSeq[Long](0).toArray
    val got = Ann.pqTopKRerank(rest, Ann.pqEncode(rest, cbs), cbs, qq,
        k = 20, shortlist = 200)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val exact = Cluster.quantize(rest, 1000)
      .select(col("id"), aggregate(zip_with(col("v"), lit(qq),
          (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x).as("d2"))
      .orderBy(col("d2"), col("id")).limit(20)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val recall = (exact.map(_._1).toSet & got.map(_._1).toSet).size / 20.0
    assert(recall >= 0.95, s"PQ rerank recall $recall")
    // every returned (id, d2) is the exact distance, not the ADC estimate
    val exactById = exact.toMap
    got.filter(p => exactById.contains(p._1))
      .foreach { case (id, d2) => assert(d2 == exactById(id), s"d2 for $id") }
  }

  test("embedding LSH near-dup: all reported pairs truly >= tau (loose tau " +
    "triggers the adaptive exact fallback, so the answer is also complete)") {
    val pairs = Dedup.embeddingNearDup(spark, embs, 0.4, planes = 16, bands = 8)
      .collect()
    assert(pairs.forall(_.getDouble(2) >= 0.4))
    val exact = Ann.cosineAllPairsExact(spark, embs, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == exact)
  }

  test("embedding LSH near-dup: noisy-twin recall 1.0 in genuine LSH mode") {
    import spark.implicits._
    val base = embs.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
      .as[(Long, Array[Double])].collect()
    // deterministic small perturbation: cosine(v, twin) ~ 0.999
    val rnd = new scala.util.Random(7)
    val twins = base.map { case (id, v) =>
      (id + 1000000L, v.map(x => x + 0.03 * rnd.nextGaussian() * math.abs(x).max(0.01)))
    }
    val all = (base ++ twins).toSeq.toDF("vec_id", "embedding")
      .repartition(4)
    val tau = 0.98
    val lsh = Dedup.embeddingNearDup(spark, all, tau, planes = 64, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Ann.cosineAllPairsBlocked(spark, all, tau, numBlocks = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "perturbation too large: no twin pair above tau")
    assert(lsh == exact, s"missed=${(exact -- lsh).size} extra=${(lsh -- exact).size}")
  }

  test("topKJoinExact == per-query brute-force top-k with rounded-tie order") {
    val qs = embs.orderBy(col("vec_id")).limit(5)
    val got = Ann.topKJoinExact(embs, qs, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
    val all = embs.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = all.sortBy(_._1).take(5).flatMap { case (qid, qv) =>
      all.filter(_._1 != qid)
        .map { case (id, v) =>
          (id, BigDecimal(cos(v, qv)).setScale(6, BigDecimal.RoundingMode.HALF_UP)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(3).zipWithIndex
        .map { case ((id, _), i) => (qid, i + 1, id) }
    }.toSet
    assert(got == want)
  }

  test("hardNegatives == brute-force different-label top-k; filter precedes rank") {
    val labeled = embs.withColumn("label", col("vec_id") % 3)
    val qs = labeled.orderBy(col("vec_id")).limit(5)
    val got = Ann.hardNegatives(labeled, qs, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
    val all = embs.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = all.sortBy(_._1).take(5).flatMap { case (qid, qv) =>
      all.filter { case (id, _) => id != qid && id % 3 != qid % 3 }
        .map { case (id, v) =>
          (id, BigDecimal(cos(v, qv)).setScale(6, BigDecimal.RoundingMode.HALF_UP)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(3).zipWithIndex
        .map { case ((id, _), i) => (qid, i + 1, id) }
    }.toSet
    assert(got == want)
    // no same-label neighbor appears, and k rows per anchor (the filter
    // runs BEFORE the rank window — a post-rank filter would starve)
    assert(got.forall { case (qid, _, id) => id % 3 != qid % 3 })
    assert(got.groupBy(_._1).forall(_._2.size == 3))
  }

  test("blocked exact all-pairs equals broadcast exact all-pairs") {
    val blocked = Ann.cosineAllPairsBlocked(spark, embs, 0.35, numBlocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val bcast = Ann.cosineAllPairsExact(spark, embs, 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(blocked == bcast && blocked.nonEmpty)
  }

  test("cosinePairsWithinGroups == per-group blocked all-pairs; sub-blocking invariant") {
    val base = embs.select(col("vec_id").cast("long").as("id"),
      col("embedding").cast("array<double>").as("v"))
    val grouped = base.withColumn("grp", pmod(col("id"), lit(3)).cast("long"))
    val got = Ann.cosinePairsWithinGroups(spark, grouped, 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = (0 until 3).flatMap { g =>
      Ann.cosineAllPairsBlocked(spark,
        grouped.filter(col("grp") === g)
          .select(col("id").as("vec_id"), col("v").as("embedding")), 0.35)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }.toSet
    assert(got == want && got.nonEmpty)
    // a tiny blockTarget forces the within-group sub-blocking path; the
    // output must not depend on the blocking
    val sub = Ann.cosinePairsWithinGroups(spark, grouped, 0.35, blockTarget = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(sub == got)
  }

  test("semanticDedup: kept/dropped exactly matches the lower-id tau-close rule " +
    "over an independent kmeans assignment + driver-side cosines") {
    val tau = 0.4
    val out = Dedup.semanticDedup(spark, embs, k = 8, iters = 2, tau = tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val assign = Cluster.kmeans(spark, embs, k = 8, iters = 2)
      .collect().map(r => (r.getLong(0), r.getAs[Number]("cluster").longValue())).toMap
    assert(out.length == assign.size)
    out.foreach { case (id, cl, _) => assert(cl == assign(id), s"cluster of $id") }
    val vecs = embs.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = out.map(_._1).sorted
    out.foreach { case (id, cl, kept) =>
      val lowerClose = ids.exists(id2 =>
        id2 < id && assign(id2) == cl && cos(vecs(id2), vecs(id)) >= tau)
      assert(kept == (if (lowerClose) 0L else 1L), s"kept flag of $id")
    }
    assert(out.exists(_._3 == 0L), "fixture should yield at least one semantic drop")
    assert(out.exists(_._3 == 1L))
  }

  test("multimodal payload -> features pipeline shape") {
    val feats = Multimodal.extractFeatures(spark, Multimodal.withPayload(docs))
    val rows = feats.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getSeq[Double](2).length == 8))
    assert(rows.forall(r => r.getDouble(3) >= 0 && r.getDouble(3) <= 3.01))
    val frames = Multimodal.frameSample(spark, Multimodal.withPayload(docs))
    assert(frames.count() > 0)
  }
}
