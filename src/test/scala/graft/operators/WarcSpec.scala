package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** WARC parsing against hand-built files: the Content-Length walk
  * (embedded magic must NOT split records), the corrupt-stop policy,
  * header extraction, and the wrap fixture's planted lanes. */
class WarcSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("warc-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val CR = "\r\n"

  private def rec(typ: String, uri: Option[String], payload: String,
                  declared: Option[Long] = None): String =
    "WARC/1.0" + CR + s"WARC-Type: $typ" + CR +
      uri.map(u => s"WARC-Target-URI: $u" + CR).getOrElse("") +
      s"Content-Length: ${declared.getOrElse(payload.length.toLong)}" +
      CR + CR + payload + CR + CR

  private def parse(files: (Long, String)*) = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    Warc.parseWarc(spark, files.toSeq.toDF("file_id", "content"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  test("records walk by declared length; embedded WARC/1.0 never splits") {
    val trap = "quoted: WARC/1.0" + CR + "WARC-Type: response" + CR + "fake"
    val f = rec("warcinfo", None, "software: x") +
      rec("response", Some("http://a/1"), trap) +
      rec("response", Some("http://a/2"), "plain body")
    assert(parse((7L, f)) == Seq(
      (7L, 0L, "warcinfo", None, 11L),
      (7L, 1L, "response", Some("http://a/1"), trap.length.toLong),
      (7L, 2L, "response", Some("http://a/2"), 10L)))
  }

  test("zero-length payload parses; missing Content-Length is corrupt") {
    val good = rec("response", Some("http://z/0"), "")
    assert(parse((1L, good)) == Seq((1L, 0L, "response", Some("http://z/0"), 0L)))
    val noLen = "WARC/1.0" + CR + "WARC-Type: response" + CR + CR + "body" + CR + CR
    assert(parse((2L, noLen)) == Seq((2L, 0L, "_corrupt", None, -1L)))
  }

  test("a length lie emits _corrupt and ends the file (no resync guessing)") {
    val f = rec("response", Some("http://a/1"), "first ok") +
      rec("response", Some("http://a/2"), "liar liar", declared = Some(6L)) +
      rec("response", Some("http://a/3"), "never reached")
    assert(parse((3L, f)) == Seq(
      (3L, 0L, "response", Some("http://a/1"), 8L),
      (3L, 1L, "_corrupt", None, -1L)))
  }

  test("bad magic and trailing garbage are corrupt rows") {
    assert(parse((4L, "GARBAGE" + rec("response", None, "x"))) ==
      Seq((4L, 0L, "_corrupt", None, -1L)))
    val f = rec("response", Some("http://a/1"), "ok") + "tail junk"
    assert(parse((5L, f)) == Seq(
      (5L, 0L, "response", Some("http://a/1"), 2L),
      (5L, 1L, "_corrupt", None, -1L)))
  }

  test("payload_md5 matches an independent digest of the extracted payload") {
    import spark.implicits._
    val body = "the exact payload bytes"
    val got = Warc.parseWarc(spark,
        Seq((1L, rec("response", None, body))).toDF("file_id", "content"))
      .collect().head
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest(body.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(got.getString(5) == want)
    assert(got.getLong(6) == body.length.toLong)
  }

  test("warcWrap plants the trap and corrupt lanes and groups by 8") {
    import spark.implicits._
    val docs = Seq((0L, "zero doc zero"), (16L, "sixteen"), (17L, "x17"),
      (31L, "thirtyone doc"), (40L, "forty")).toDF("doc_id", "text")
      // ids 0 and 31 hit %31 (corrupt); 0 and 17 hit %17 (trap)
    val files = Warc.warcWrap(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(files.keySet == Set(0L, 2L, 3L, 5L))
    // file 0 = doc 0 alone (ids group by div 8): trap AND corrupt
    val f0 = files(0L)
    assert(f0.startsWith("WARC/1.0\r\nWARC-Type: warcinfo"))
    assert(f0.contains("WARC/1.0\r\nzero doc zero"), "trap prefix on doc 0")
    assert(f0.contains("Content-Length: " + ("WARC/1.0\r\nzero doc zero".length - 3)),
      "doc 0 declares 3 short")
    // end-to-end: file 0 yields warcinfo then corrupt-stop at doc 0
    assert(parse((0L, f0)) == Seq(
      (0L, 0L, "warcinfo", None, 15L),
      (0L, 1L, "_corrupt", None, -1L)))
    // file 2 = docs 16 (honest) and 17 (trap: 17 % 17 == 0)
    val f2 = files(2L)
    assert(f2.contains("Content-Length: " + "sixteen".length), "doc 16 honest")
    assert(f2.contains("WARC-Target-URI: http://h4.example/p/17"))
    val p2 = parse((2L, f2))
    assert(p2.map(_._3) == Seq("warcinfo", "response", "response"))
    assert(p2(2)._5 == "WARC/1.0\r\nx17".length.toLong, "doc 17 trap length")
  }

  test("header anchor requires a full CRLF; bare-LF Content-Length is corrupt") {
    // the only Content-Length line is preceded by a bare '\n' — the
    // oracle's (^|\r\n) regex does not match there, so the engine must
    // not either (ADVICE r15): no usable length -> corrupt-stop
    val f = "WARC/1.0" + CR + "X-Note: a\nContent-Length: 4" + CR + CR +
      "body" + CR + CR
    assert(parse((11L, f)) == Seq((11L, 0L, "_corrupt", None, -1L)))
  }

  test("Unicode digits in Content-Length are corrupt, not a crash") {
    // U+0663 ARABIC-INDIC THREE passes Character.isDigit but the
    // oracle's [0-9]+/TRY_CAST yields NULL — engine must mirror the
    // NULL (corrupt-stop), and must not throw from .toLong
    val f = "WARC/1.0" + CR + "WARC-Type: response" + CR +
      "Content-Length: ٣٣" + CR + CR + "xxx" + CR + CR
    assert(parse((12L, f)) == Seq((12L, 0L, "_corrupt", None, -1L)))
  }

  test("a 20k-record file parses fully (the walk is linear, never a rescan)") {
    val n = 20000
    val sb = new StringBuilder
    (0 until n).foreach(i => sb.append(rec("response", Some(s"http://b/$i"), s"p$i")))
    val got = parse((9L, sb.toString))
    assert(got.length == n)
    assert(got.head == ((9L, 0L, "response", Some("http://b/0"), 2L)))
    assert(got.last._2 == (n - 1).toLong)
  }
}
