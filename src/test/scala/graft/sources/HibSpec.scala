package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The image-bundle container's contract: byte-lossless roundtrip on
  * clean data, corrupt-and-STOP on any header inconsistency, and no
  * magic-scan resync (a payload containing the magic must parse
  * cleanly — the [[graft.operators.Warc]] container rule). */
class HibSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("hib-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def payloads(rows: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    rows.toDF("doc_id", "payload")
  }

  test("roundtrip is byte-lossless, ordered, and bundle-keyed") {
    spark.sparkContext.setLogLevel("WARN")
    val rnd = new scala.util.Random(5)
    val rows = (0L until 37L).map { i =>
      (i, Array.fill(rnd.nextInt(200) + 1)(rnd.nextInt(256).toByte))
    }
    val parsed = Hib.parseBundles(spark,
        Hib.bundleWrap(payloads(rows), perBundle = 8))
      .collect()
    assert(parsed.forall(!_.getBoolean(4)))
    val back = parsed.map(r =>
      (r.getLong(2), r.getAs[Array[Byte]](3).toSeq)).toMap
    assert(back.size == 37)
    rows.foreach { case (id, p) =>
      assert(back(id) == p.toSeq, s"payload roundtrip broke at doc $id")
    }
    // members land in their id/perBundle bundle in id order
    parsed.groupBy(_.getLong(0)).foreach { case (bid, ms) =>
      val ids = ms.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(ids.forall(_ / 8 == bid) && ids.sorted.sameElements(ids))
    }
  }

  test("payload containing the magic parses cleanly (no resync scan)") {
    val evil = Hib.Magic ++ "GHB1GHB1 inner".getBytes("US-ASCII") ++ Hib.Magic
    val rows = Seq((1L, evil), (2L, "plain".getBytes("US-ASCII")))
    val parsed = Hib.parseBundles(spark,
        Hib.bundleWrap(payloads(rows), perBundle = 8)).collect()
    assert(parsed.length == 2 && parsed.forall(!_.getBoolean(4)))
    assert(parsed.find(_.getLong(2) == 1L).get
      .getAs[Array[Byte]](3).toSeq == evil.toSeq)
  }

  test("length lie: valid prefix survives, one corrupt row, file stops") {
    import spark.implicits._
    val rows = (0L until 8L).map(i => (i, s"payload-$i".getBytes("US-ASCII")))
    val clean = Hib.bundleWrap(payloads(rows), perBundle = 8)
      .collect().head.getAs[Array[Byte]]("data")
    // member 0's length field starts at offset 4(magic)+4(count)+8(id):
    // inflate it so record 1's header is eaten by record 0's payload
    val lied = clean.clone()
    val lenOff = 4 + 4 + 8
    lied(lenOff + 3) = (lied(lenOff + 3) + 7).toByte
    val parsed = Hib.parseBundles(spark,
        Seq((0L, lied)).toDF("bundle_id", "data")).collect()
    // the lie makes the remaining bytes inconsistent with the declared
    // count — the walk must emit corrupt and STOP, never resync: the
    // eaten record-1 header would otherwise be "found" via magic-less
    // guessing and poison the corpus
    assert(parsed.count(_.getBoolean(4)) == 1, parsed.mkString(";"))
    assert(parsed.length <= 2, s"resync guessing emitted ${parsed.length} rows")
  }

  test("member-count lie and truncation both corrupt-and-stop") {
    import spark.implicits._
    val rows = (0L until 4L).map(i => (i, s"p$i".getBytes("US-ASCII")))
    val clean = Hib.bundleWrap(payloads(rows), perBundle = 8)
      .collect().head.getAs[Array[Byte]]("data")
    // count says 5, data holds 4
    val countLie = clean.clone(); countLie(7) = 5.toByte
    val p1 = Hib.parseBundles(spark,
      Seq((0L, countLie)).toDF("bundle_id", "data")).collect()
    assert(p1.count(_.getBoolean(4)) == 1 && p1.length == 5)
    // truncated mid-record
    val trunc = clean.take(clean.length - 2)
    val p2 = Hib.parseBundles(spark,
      Seq((0L, trunc)).toDF("bundle_id", "data")).collect()
    assert(p2.count(_.getBoolean(4)) == 1 && p2.length == 4)
    // bad magic: nothing but the corrupt marker
    val bad = clean.clone(); bad(0) = 'X'.toByte
    val p3 = Hib.parseBundles(spark,
      Seq((0L, bad)).toDF("bundle_id", "data")).collect()
    assert(p3.length == 1 && p3.head.getBoolean(4))
    // NEGATIVE declared count is a header lie, not an empty bundle —
    // an 8-byte bundle declaring -5 members must be corrupt, not valid
    val neg = java.nio.ByteBuffer.allocate(8)
    neg.put("GHB1".getBytes("US-ASCII")); neg.putInt(-5)
    val p4 = Hib.parseBundles(spark,
      Seq((0L, neg.array())).toDF("bundle_id", "data")).collect()
    assert(p4.length == 1 && p4.head.getBoolean(4),
      "negative member count must corrupt-and-stop")
  }

  test("bundled image pipeline == direct image pipeline on the fixture") {
    val docs = Fixtures.documents(spark, "/root/testdata/sf0.001")
    val withPayload = graft.operators.Multimodal.withImagePayload(docs)
      .select(col("doc_id"), col("payload"))
    val direct = graft.operators.Multimodal
      .imageRedHist(spark, withPayload)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val bundled = graft.operators.Multimodal.imageRedHist(spark,
        Hib.parseBundles(spark, Hib.bundleWrap(withPayload, perBundle = 8))
          .filter(!col("corrupt")).select(col("doc_id"), col("payload")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(direct.nonEmpty && bundled == direct)
  }
}
