package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTML boilerplate extraction — the ingestion step every
  * Common-Crawl-shaped training corpus runs before any quality gate or
  * dedup pass: turn raw HTML into main text by dropping boilerplate
  * blocks (navigation, footers, link farms, scripts) and keeping
  * content blocks, using the density rules of the published
  * boilerpipe/jusText line of work (Kohlschuetter et al., WSDM 2010):
  * a block is content iff it carries enough words AND its link density
  * stays under a threshold — tag names only decide SEGMENTATION (and
  * the script/style skip), never content-vs-boilerplate.
  *
  * Extraction contract (deterministic, engine-replayable):
  *  - the document segments into blocks at BLOCK-LEVEL tags (p, div,
  *    nav, title, li, ...); inline tags (a, b, span, ...) keep the
  *    current block open;
  *  - every tag acts as a WORD SEPARATOR; text is whitespace-normalized
  *    (split on whitespace, single-space joined);
  *  - `<script>`/`<style>` element CONTENT is skipped entirely (such
  *    blocks are never counted kept or dropped — they carry no text);
  *  - HTML comments are skipped; attribute values may contain `>`
  *    (quote-aware tag-end scan);
  *  - the five ubiquitous entities `&amp; &lt; &gt; &quot; &#39;` decode
  *    single-pass left-to-right (so `&amp;lt;` yields the literal
  *    `&lt;`, never `<`); unknown entities stay literal text;
  *  - keep rule, integer-exact in every engine: a non-empty block is
  *    KEPT iff `words >= MinWords` and `3 * link_chars < chars`, where
  *    `link_chars` sums the normalized lengths of the block's anchor
  *    (`<a>`) texts and `chars` is the normalized block length
  *    (cross-multiplied density, no FP ratio — the FIXTURES.md rule).
  *
  * 100 TB shape: a pure per-row JVM kernel inside one `mapPartitions`
  * pass — no shuffle, no driver state, O(html length) per row with no
  * regex backtracking; the only data movement is the scan itself.
  * Parity note: higher-order-function/UDF routes would evaluate
  * interpreted per element (see CLAUDE.md); the plain-loop kernel stays
  * a single tight pass.
  *
  * Reference behavior: the reference ingests IMAGE corpora for its EMD
  * joins (`/root/reference/src/com/iojin/melody/mr/generate/GenerateEmd.java`);
  * text acquisition has no analog there. This operator extends the
  * engine's training-data surface per the documented pipeline scope
  * (README coverage map) with the standard public-literature rule set.
  */
object HtmlOps {

  /** Tags that close the current text block when encountered (open or
    * close form). Everything else — `a`, `b`, `i`, `em`, `span`, ... —
    * is inline and keeps the block open. */
  val BlockTags: Set[String] = Set(
    "html", "head", "body", "title", "p", "div", "nav", "aside",
    "footer", "header", "section", "article", "main", "ul", "ol", "li",
    "h1", "h2", "h3", "h4", "h5", "h6", "table", "tr", "td", "th",
    "blockquote", "pre", "form", "figure", "figcaption")

  /** Minimum normalized word count for a content block. */
  val MinWords = 5

  private val Entities: Array[(String, Char)] = Array(
    "&amp;" -> '&', "&lt;" -> '<', "&gt;" -> '>',
    "&quot;" -> '"', "&#39;" -> '\'')

  /** Whitespace-normalize: split on whitespace, join with single
    * spaces. Matches the oracle's trim + collapse replay exactly. */
  private def normalize(t: CharSequence): String = {
    val sb = new java.lang.StringBuilder(t.length)
    var inWs = true
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (Character.isWhitespace(c)) inWs = true
      else {
        if (inWs && sb.length > 0) sb.append(' ')
        sb.append(c)
        inWs = false
      }
      i += 1
    }
    sb.toString
  }

  /** Extract main text from one HTML document. Returns
    * (clean_text, kept_blocks, dropped_blocks, kept_chars):
    * clean_text is the kept blocks' normalized text joined with '\n'
    * in document order (empty string when nothing qualifies); the
    * counts cover non-empty blocks only. */
  def extract(html: String): (String, Long, Long, Long) = {
    val s = if (html == null) "" else html
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    val n = s.length
    val text = new java.lang.StringBuilder
    val anchor = new java.lang.StringBuilder
    var aDepth = 0
    var linkChars = 0L
    val keptBlocks = scala.collection.mutable.ArrayBuffer.empty[String]
    var nKept = 0L
    var nDropped = 0L
    var keptChars = 0L

    def flushAnchor(): Unit = {
      linkChars += normalize(anchor).length
      anchor.setLength(0)
    }
    def flushBlock(): Unit = {
      if (aDepth > 0) { flushAnchor(); aDepth = 0 } // unclosed anchor
      val t = normalize(text)
      if (t.nonEmpty) {
        var words = 1
        var i = 0
        while (i < t.length) { if (t.charAt(i) == ' ') words += 1; i += 1 }
        if (words >= MinWords && 3L * linkChars < t.length) {
          keptBlocks += t
          nKept += 1
          keptChars += t.length
        } else nDropped += 1
      }
      text.setLength(0)
      linkChars = 0L
    }
    def appendText(c: Char): Unit = {
      text.append(c)
      if (aDepth > 0) anchor.append(c)
    }
    def appendSeparator(): Unit = {
      text.append(' ')
      if (aDepth > 0) anchor.append(' ')
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          // comment: skip to the terminator (or EOF on truncation)
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val close = i + 1 < n && s.charAt(i + 1) == '/'
          var j = i + (if (close) 2 else 1)
          val nameStart = j
          while (j < n && Character.isLetterOrDigit(s.charAt(j))) j += 1
          val name = lower.substring(nameStart, j)
          // quote-aware scan for the tag end: '>' inside a quoted
          // attribute value does not terminate the tag
          var k = j
          var quote = 0.toChar
          var end = -1
          while (k < n && end < 0) {
            val ch = s.charAt(k)
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if (ch == '"' || ch == '\'') quote = ch
            else if (ch == '>') end = k
            k += 1
          }
          val after = if (end < 0) n else end + 1
          if ((name == "script" || name == "style") && !close) {
            // element content is never text: skip to the closing tag
            flushBlock()
            val closeIdx = lower.indexOf("</" + name, after)
            if (closeIdx < 0) i = n
            else {
              val gt = s.indexOf('>', closeIdx)
              i = if (gt < 0) n else gt + 1
            }
          } else {
            if (BlockTags.contains(name)) flushBlock()
            else if (name == "a") {
              if (close) {
                if (aDepth > 0) {
                  aDepth -= 1
                  if (aDepth == 0) flushAnchor()
                }
              } else aDepth += 1
            }
            appendSeparator() // every tag separates words
            i = after
          }
        }
      } else if (c == '&') {
        // single-pass entity decode: longest of the five at this
        // position, else the literal '&'
        var e = 0
        var matched = false
        while (e < Entities.length && !matched) {
          val (ent, ch) = Entities(e)
          if (s.startsWith(ent, i)) {
            appendText(ch)
            i += ent.length
            matched = true
          }
          e += 1
        }
        if (!matched) { appendText('&'); i += 1 }
      } else {
        appendText(c)
        i += 1
      }
    }
    flushBlock()
    (keptBlocks.mkString("\n"), nKept, nDropped, keptChars)
  }

  /** DataFrame form: (idCol, htmlCol) -> (idCol, clean_text,
    * kept_blocks, dropped_blocks, kept_chars). One map-side pass. */
  def extractMain(docs: DataFrame, idCol: String = "doc_id",
                  htmlCol: String = "html"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(htmlCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, h) =>
        val (t, k, d, c) = extract(h)
        (id, t, k, d, c)
      })
      .toDF(idCol, "clean_text", "kept_blocks", "dropped_blocks",
        "kept_chars")
  }

  /** Deterministic HTML wrapper over the documents fixture: the corpus
    * carries plain text, so the page structure (nav/aside/footer link
    * blocks, script, title, entity-bearing and link-bearing paragraphs)
    * derives from doc_id alone — replayed verbatim by the q_html_extract
    * oracle CTE, one generated line per block. Conditional lines ride
    * `concat_ws`'s null-skipping. */
  def htmlWrap(docs: DataFrame): DataFrame = {
    val idS = col("doc_id").cast("string")
    docs.select(col("doc_id"), concat_ws("\n",
      lit("<html>"),
      lit("<head>"),
      concat(lit("<title>Doc "), idS, lit(" | corpus</title>")),
      concat(lit("<script>var page="), idS, lit(";track();</script>")),
      lit("</head>"),
      lit("<body>"),
      lit("<nav><a href=\"/home\">home</a> <a href=\"/about\">about</a>" +
        " <a href=\"/contact\">contact</a></nav>"),
      concat(lit("<p>"), col("text"), lit("</p>")),
      when(col("doc_id") % 4 === 0,
        concat(lit("<p>see &amp; read &lt;more&gt; notes in " +
          "&quot;section&quot; "), (col("doc_id") % 7).cast("string"),
          lit(" today</p>"))),
      when(col("doc_id") % 5 === 1,
        lit("<p>for background you can consult the " +
          "<a href=\"/ref\">reference</a> material listed here</p>")),
      lit("<aside>related: <a href=\"/read\">read this other fine " +
        "article</a></aside>"),
      lit("<footer>copyright 2024 <a href=\"/terms\">terms</a> " +
        "<a href=\"/privacy\">privacy</a></footer>"),
      lit("</body>"),
      lit("</html>")).as("html"))
  }
}
