package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins HtmlOps.extract against hand-built pages: block segmentation,
  * the density keep rule at its integer boundaries, script/style
  * content skip, quote-aware tags, comments, entity decode, and
  * truncation — the parser behaviors the generated-corpus oracle
  * cannot distinguish on its own. */
class HtmlOpsSpec extends AnyFunSuite {

  private def keptText(html: String): String = HtmlOps.extract(html)._1

  test("block segmentation with boilerplate dropped and body kept") {
    val page =
      """<html><head><title>My Tiny Page</title>
        |<style>p { color: red; }</style>
        |<script>var x = 1 < 2; track("</scr" + "ipt>");</script>
        |</head><body>
        |<nav><a href="/">home</a> <a href="/a">about</a></nav>
        |<p>this is the one genuine paragraph of body content here</p>
        |<footer>copyright <a href="/t">terms</a> <a href="/p">privacy</a></footer>
        |</body></html>""".stripMargin
    val (txt, kept, dropped, chars) = HtmlOps.extract(page)
    assert(txt == "this is the one genuine paragraph of body content here")
    assert(kept == 1L)
    // title (3 words), style selector text? style content is SKIPPED;
    // dropped blocks: title, nav, footer
    assert(dropped == 3L, s"dropped=$dropped")
    assert(chars == txt.length.toLong)
  }

  test("script and style content never becomes text, even with tag-like innards") {
    val page = "<style>a > b { x: \"</sty\" }</style>" +
      "<script>if (a<b && c>d) { s = \"</scr\"+\"ipt>\"; }</script>" +
      "<p>five words of real content</p>"
    assert(keptText(page) == "five words of real content")
    assert(HtmlOps.extract(page)._3 == 0L) // nothing non-empty was dropped
  }

  test("quote-aware tag scan: '>' inside attribute values does not end the tag") {
    val page = "<p title=\"a>b\" data-x='c>d'>six little words make " +
      "this content</p>"
    assert(keptText(page) == "six little words make this content")
  }

  test("comments are skipped entirely, including tag-bearing ones") {
    val page = "<!-- <p>hidden boilerplate here</p> --><p>kept words " +
      "are these five ones</p><!-- trailing truncated comment"
    assert(keptText(page) == "kept words are these five ones")
  }

  test("entity decode: the five entities, amp-first sequences, unknown stays literal") {
    val page = "<p>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39; " +
      "&amp;lt; &nbsp; end</p>"
    assert(keptText(page) ==
      "A & B <tag> \"q\" 's' &lt; &nbsp; end")
  }

  test("uppercase and mixed-case tags segment like lowercase ones") {
    val page = "<P>one paragraph of five words</P><DIV>another block " +
      "with enough words here</DIV>"
    assert(keptText(page) ==
      "one paragraph of five words\nanother block with enough words here")
  }

  test("word-count boundary: 4 words dropped, 5 words kept") {
    assert(keptText("<p>only four words here</p>") == "")
    assert(keptText("<p>exactly five words right here</p>") ==
      "exactly five words right here")
  }

  test("link-density boundary is the cross-multiplied integer rule 3*link < chars") {
    // total normalized text "aaaa bb cc dd ee" = 16 chars; link text
    // "aaaa" = 4 chars: 3*4 = 12 < 16 -> kept (anchor text retained)
    assert(keptText("<p><a href=\"/x\">aaaa</a> bb cc dd ee</p>") ==
      "aaaa bb cc dd ee")
    // "aaaaaa bb cc dd ee" = 18 chars, link 6: 3*6 = 18, NOT < 18 -> dropped
    assert(keptText("<p><a href=\"/x\">aaaaaa</a> bb cc dd ee</p>") == "")
  }

  test("inline tags keep the block open and act as word separators") {
    val page = "<p>alpha<b>beta</b>gamma delta epsilon zeta</p>"
    assert(keptText(page) == "alpha beta gamma delta epsilon zeta")
  }

  test("nested anchors count all enclosed text once; unclosed anchors flush at block end") {
    // nested: link text "xx yy zz" (8 chars incl separators after
    // normalize) vs total "xx yy zz aa bb cc dd" (20): 24 >= 20 -> dropped
    val nested = "<p><a href='1'>xx <a href='2'>yy</a> zz</a> aa bb cc dd</p>"
    assert(keptText(nested) == "")
    // unclosed anchor spans to block end: whole text is link -> dropped
    val unclosed = "<p><a href='1'>every word sits inside one link</a" +
      "</p><p>second block has five clean words</p>"
    assert(keptText(unclosed).contains("second block has five clean words"))
  }

  test("truncated html flushes the final block; null and empty are empty") {
    assert(keptText("<p>truncated but these five words stay") ==
      "truncated but these five words stay")
    assert(HtmlOps.extract(null) == (("", 0L, 0L, 0L)))
    assert(HtmlOps.extract("") == (("", 0L, 0L, 0L)))
    assert(HtmlOps.extract("plain text with no markup at all") ==
      (("plain text with no markup at all", 1L, 0L, 32L)))
  }

  test("whitespace normalization collapses runs and newlines") {
    assert(keptText("<p>  spaced    out\n\twords   in here  </p>") ==
      "spaced out words in here")
  }
}
