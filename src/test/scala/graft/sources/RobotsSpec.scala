package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins Robots against the public REP specification's documented
  * examples (RFC 9309 / the Google robots.txt reference semantics):
  * pattern matching, longest-match precedence, allow-vs-disallow
  * ties, agent-group selection, and the fail-open conventions. */
class RobotsSpec extends AnyFunSuite {

  private def rules(txt: String, ua: String = "graftbot") =
    Robots.parse(txt, ua)

  test("path patterns: prefixes, wildcards, and end anchors per the REP examples") {
    val r = rules("User-agent: *\nDisallow: /fish")
    assert(!Robots.allowed(r, "/fish"))
    assert(!Robots.allowed(r, "/fishheads/yummy.html"))
    assert(!Robots.allowed(r, "/fish.php?id=anything"))
    assert(Robots.allowed(r, "/Fish.asp")) // byte-exact, case-sensitive
    assert(Robots.allowed(r, "/catfish")) // start-anchored

    val dir = rules("User-agent: *\nDisallow: /fish/")
    assert(Robots.allowed(dir, "/fish"))
    assert(!Robots.allowed(dir, "/fish/salmon.htm"))

    val glob = rules("User-agent: *\nDisallow: /*.php")
    assert(!Robots.allowed(glob, "/index.php"))
    assert(!Robots.allowed(glob, "/folder/filename.php?parameters"))
    assert(Robots.allowed(glob, "/"))
    assert(Robots.allowed(glob, "/windows.PHP"))

    val anchored = rules("User-agent: *\nDisallow: /*.php$")
    assert(!Robots.allowed(anchored, "/filename.php"))
    assert(!Robots.allowed(anchored, "/folder/filename.php"))
    // the greedy-scan trap: the LAST '.php' occurrence must anchor
    assert(!Robots.allowed(anchored, "/a.php.php"))
    assert(Robots.allowed(anchored, "/filename.php?parameters"))
    assert(Robots.allowed(anchored, "/filename.php5"))
  }

  test("longest match wins; Allow beats Disallow on equal specificity") {
    val r = rules("User-agent: *\nAllow: /p\nDisallow: /")
    assert(Robots.allowed(r, "/page"))
    assert(!Robots.allowed(r, "/other"))

    val r2 = rules("User-agent: *\nAllow: /folder/\nDisallow: /folder")
    assert(Robots.allowed(r2, "/folder/page"))

    val tie = rules("User-agent: *\nAllow: /page\nDisallow: /page")
    assert(Robots.allowed(tie, "/page"))

    val r3 = rules("User-agent: *\nAllow: /$\nDisallow: /")
    assert(Robots.allowed(r3, "/"))
    assert(!Robots.allowed(r3, "/page.htm"))
  }

  test("agent-group selection: longest product-token match, '*' fallback, shared groups") {
    val txt =
      """# corpus crawl policy
        |User-agent: googlebot-news
        |Disallow: /news-only
        |
        |User-agent: googlebot
        |Disallow: /bot-wide
        |
        |User-agent: *
        |Disallow: /everyone
        |""".stripMargin
    val news = Robots.parse(txt, "Googlebot-News/2.1")
    assert(!Robots.allowed(news, "/news-only/x"))
    assert(Robots.allowed(news, "/bot-wide/x"), "most specific group ONLY")
    val bot = Robots.parse(txt, "googlebot-image")
    assert(!Robots.allowed(bot, "/bot-wide/x"))
    assert(Robots.allowed(bot, "/everyone/x"))
    val other = Robots.parse(txt, "graftbot")
    assert(!Robots.allowed(other, "/everyone/x"))
    assert(Robots.allowed(other, "/bot-wide/x"))

    // consecutive User-agent lines share one group
    val shared = Robots.parse(
      "User-agent: a\nUser-agent: graftbot\nDisallow: /x", "graftbot")
    assert(!Robots.allowed(shared, "/x/y"))
  }

  test("fail-open conventions: empty Disallow, empty/missing robots, comments") {
    assert(Robots.allowed(rules("User-agent: *\nDisallow:"), "/anything"))
    assert(Robots.allowed(rules(""), "/anything"))
    assert(Robots.allowed(rules(null), "/anything"))
    val commented = rules(
      "User-agent: * # everyone\nDisallow: /secret # hidden\nCrawl-delay: 10")
    assert(!Robots.allowed(commented, "/secret/x"))
    assert(Robots.allowed(commented, "/open"))
  }

  test("filterAllowed admits per host with fail-open for unknown hosts") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val urls = Seq(
      (1L, "http://a.example.com/open/page"),
      (2L, "http://a.example.com/private/page"),
      (3L, "http://a.example.com:8080/private/page"), // port-stripped host
      (4L, "https://unknown.example.org/private"),    // no robots: fail-open
      (5L, "http://a.example.com/private.html?x=1#f") // query matched, frag not
    ).toDF("doc_id", "url")
    val robots = Map(
      "a.example.com" -> "User-agent: *\nDisallow: /private")
    val got = Robots.filterAllowed(urls, robots, "graftbot")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false,
      4L -> true, 5L -> false))
  }
}
