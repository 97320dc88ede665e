package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) container parsing — the wire format
  * Common-Crawl-shaped corpora actually arrive in: a file is a
  * concatenation of records, each `WARC/1.0 CRLF headers CRLF CRLF
  * payload CRLF CRLF`, where the ONLY correct record walk is by the
  * declared `Content-Length` (payloads legally contain `WARC/1.0` —
  * web pages quote WARC files; a magic-scanner mis-splits them, and the
  * fixture plants exactly that trap). Completes the ingestion family
  * next to [[CorpusOps.jsonIngest]] / [[CorpusOps.csvIngest]] with the
  * same malformed-record policy: a record whose declared length does
  * not land on a CRLF CRLF terminator (or whose headers are unparsable)
  * emits a `_corrupt` row and ENDS that file's parse — past a length
  * lie there is no trustworthy resync point, and guessing one is how
  * corrupt payloads leak into a corpus silently.
  *
  * Scale shape: parsing is ONE mapPartitions pass, linear per file,
  * nothing leaves the row — at 100 TB each executor walks its own
  * files. (The [[warcWrap]] fixture assembly pays one groupBy shuffle
  * to build files out of the documents table; deployment WARC files
  * arrive pre-assembled, so that shuffle is fixture-derivation cost,
  * not operator cost.)
  *
  * The kernel works on Strings; the fixture corpus is pure ASCII
  * (probed), where character and octet counts coincide. A deployment
  * build reads bytes and counts octets — same walk, same policy.
  */
object Warc {

  private val Crlf = "\r\n"
  private[operators] val WarcinfoPayload = "software: graft"

  /** Assemble deterministic WARC files from the documents fixture
    * (the jsonWrap/csvWrap convention): 8 docs per file ordered by id,
    * a `warcinfo` leader record, per-doc `response` records with an
    * id-derived target URI. Two planted lanes: doc_id % 17 == 0
    * prefixes the payload with `WARC/1.0 CRLF` (the magic-scanner
    * trap — Content-Length still covers it, so a correct parser is
    * unaffected), and doc_id % 31 == 0 DECLARES three characters short
    * (the corrupt lane: the terminator check must catch it and stop
    * the file). Output: (file_id, content). */
  def warcWrap(docs: DataFrame, docsPerFile: Int = 8): DataFrame = {
    require(docsPerFile >= 1, s"warcWrap: docsPerFile must be >= 1")
    val payload = when(col("doc_id") % 17 === 0,
      concat(lit("WARC/1.0" + Crlf), col("text"))).otherwise(col("text"))
    val declared = (length(col("pl")) -
      when(col("doc_id") % 31 === 0, lit(3)).otherwise(lit(0))).cast("string")
    val rec = concat(
      lit("WARC/1.0" + Crlf + "WARC-Type: response" + Crlf +
        "WARC-Target-URI: http://h"),
      (col("doc_id") % 13).cast("string"),
      lit(".example/p/"), col("doc_id").cast("string"),
      lit(Crlf + "Content-Length: "), declared,
      lit(Crlf + Crlf), col("pl"), lit(Crlf + Crlf))
    val leader = "WARC/1.0" + Crlf + "WARC-Type: warcinfo" + Crlf +
      "Content-Length: " + WarcinfoPayload.length + Crlf + Crlf +
      WarcinfoPayload + Crlf + Crlf
    docs
      .select(col("doc_id"), payload.as("pl"))
      .select(col("doc_id"),
        expr(s"doc_id div $docsPerFile").as("file_id"), rec.as("rec"))
      .groupBy(col("file_id"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("rec"))))
        .as("rs"))
      .select(col("file_id"),
        concat(lit(leader),
          array_join(transform(col("rs"), r => r.getField("rec")), ""))
          .as("content"))
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  /** First LINE-ANCHORED `name: value` header in the block, or None.
    * Anchoring (match only at block start or right after a CRLF) is
    * what real WARC header semantics require: a bare substring match
    * would read `X-Content-Length: 5` as the record length. Mirrors
    * the oracle's `(^|\r\n)name: ` regex exactly. */
  private def header(block: String, name: String): Option[String] = {
    val key = name + ": "
    // anchor means EXACTLY block start or right after a CRLF pair —
    // a bare '\n' (no preceding '\r') is not a WARC line boundary and
    // the oracle's (^|\r\n) regex would not match there either
    var i = block.indexOf(key)
    while (i > 0 && !(block.charAt(i - 1) == '\n' &&
        i >= 2 && block.charAt(i - 2) == '\r'))
      i = block.indexOf(key, i + 1)
    if (i < 0) None
    else {
      val start = i + key.length
      val end = block.indexOf('\r', start)
      Some(block.substring(start, if (end < 0) block.length else end))
    }
  }

  /** Parse `(file_id, content)` WARC files into one row per record:
    * `(file_id, rec_no, warc_type, target_uri, content_length,
    * payload_md5, payload_chars)`; a malformed record emits
    * `warc_type = "_corrupt"` with NULL fields and ends the file. */
  def parseWarc(spark: SparkSession, files: DataFrame): DataFrame = {
    import spark.implicits._
    files.select(col("file_id").cast("long"), col("content"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (fileId, content) =>
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, String, Option[String], Option[Long],
              Option[String], Option[Long])]
          var off = 0
          var rec = 0L
          var stopped = false
          while (!stopped && off < content.length) {
            val hdrEnd = content.indexOf(Crlf + Crlf, off)
            val magicOk = content.regionMatches(off, "WARC/1.0" + Crlf, 0, 10)
            val block = if (hdrEnd < 0) "" else content.substring(off, hdrEnd)
            // ASCII digits only: Character.isDigit accepts Unicode digit
            // classes that .toLong then throws on, while the oracle's
            // [0-9]+/TRY_CAST yields NULL — mirror the oracle exactly
            val clen = header(block, "Content-Length")
              .map(_.takeWhile(c => c >= '0' && c <= '9'))
              .filter(_.nonEmpty).map(_.toLong)
            val pStart = hdrEnd + 4
            val ok = magicOk && hdrEnd >= 0 && clen.exists(l =>
              pStart + l + 4 <= content.length &&
                content.regionMatches((pStart + l).toInt, Crlf + Crlf, 0, 4))
            if (ok) {
              val l = clen.get
              val payload = content.substring(pStart, pStart + l.toInt)
              out += ((fileId, rec,
                header(block, "WARC-Type").getOrElse(""),
                header(block, "WARC-Target-URI"),
                Some(l), Some(md5Hex(payload)), Some(l)))
              off = pStart + l.toInt + 4
            } else {
              out += ((fileId, rec, "_corrupt", None, None, None, None))
              stopped = true
            }
            rec += 1L
          }
          out
        }
      }
      .toDF("file_id", "rec_no", "warc_type", "target_uri",
        "content_length", "payload_md5", "payload_chars")
  }
}
