package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins UrlOps.normalizeOne's general parser on hand cases — the
  * behaviors the component-wise fixture oracle cannot distinguish
  * (odd authorities, empty paths, degenerate queries, suffix
  * boundaries, unparseable rows). */
class UrlOpsSpec extends AnyFunSuite {

  private val sfx = UrlOps.DefaultSuffixes

  private def norm(u: String) = UrlOps.normalizeOne(u, sfx)

  test("case folding: scheme and host lowercase, path case preserved") {
    val n = norm("HTTPS://WWW.Example.COM/Some/Path")
    assert(n.url == "https://www.example.com/Some/Path")
    assert(n.host == "www.example.com")
    assert(n.registered == "example.com")
  }

  test("default ports strip per scheme; non-default ports survive") {
    assert(norm("http://a.com:80/x").url == "http://a.com/x")
    assert(norm("https://a.com:443/x").url == "https://a.com/x")
    assert(norm("http://a.com:443/x").url == "http://a.com:443/x")
    assert(norm("https://a.com:80/x").url == "https://a.com:80/x")
    assert(norm("http://a.com:8080/x").url == "http://a.com:8080/x")
  }

  test("empty path canonicalizes to '/'; fragments always drop") {
    assert(norm("http://a.com").url == "http://a.com/")
    assert(norm("http://a.com#frag").url == "http://a.com/")
    assert(norm("http://a.com/p#frag?not-a-query").url == "http://a.com/p")
  }

  test("tracking params drop by name and prefix; survivors sort; empty set drops '?'") {
    val n = norm("http://a.com/p?utm_source=x&z=1&ref=nav&a=2&utm_x=y")
    assert(n.url == "http://a.com/p?a=2&z=1")
    assert(n.kept == 2 && n.dropped == 3)
    assert(norm("http://a.com/p?utm_only=1").url == "http://a.com/p")
    // a bare-name param (no '=') filters by its whole name
    assert(norm("http://a.com/p?fbclid&b=1").url == "http://a.com/p?b=1")
    // empty fields from '&&' vanish, duplicates sort stably
    assert(norm("http://a.com/p?b=2&&b=1").url == "http://a.com/p?b=1&b=2")
    // '=' inside a VALUE stays; only the name decides
    assert(norm("http://a.com/p?q=a=b").url == "http://a.com/p?q=a=b")
  }

  test("registered domain: longest suffix wins at label boundaries") {
    assert(UrlOps.registeredDomain("www.a.example.co.uk", sfx) == "example.co.uk")
    assert(UrlOps.registeredDomain("a.example.uk", sfx) == "example.uk")
    assert(UrlOps.registeredDomain("example.com", sfx) == "example.com")
    // a host that IS a public suffix registers as itself (no label left)
    assert(UrlOps.registeredDomain("co.uk", sfx) == "co.uk")
    // unknown TLD: the host is its own registered domain
    assert(UrlOps.registeredDomain("internal.service.local", sfx) ==
      "internal.service.local")
    // label-boundary: "evilco.uk" must not match the "co.uk" rule as a
    // substring — "uk" matches and registers "evilco.uk"
    assert(UrlOps.registeredDomain("evilco.uk", sfx) == "evilco.uk")
  }

  test("unparseable rows degrade per row: pass-through with empty host") {
    for (bad <- Seq(null, "", "not a url", "://nohost", "ht tp://x.com/")) {
      val n = UrlOps.normalizeOne(bad, sfx)
      assert(n.host == "" && n.registered == "")
    }
    // authorities out of contract scope pass through un-split
    val v6 = norm("http://[::1]:8080/x")
    assert(v6.host == "[::1]:8080" || v6.host.nonEmpty) // un-split, not crashed
  }

  test("blocklist verdicts ride the registered domain") {
    import org.apache.spark.sql.functions._
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = Seq(
      (1L, "http://www.ads.tracker.com/x"),
      (2L, "http://docs.example.com/y"),
      (3L, "https://Tracker.CO.UK:443/z?utm_a=1")
    ).toDF("doc_id", "url")
    val got = UrlOps.normalizeUrls(df,
        blocklist = Set("tracker.com", "tracker.co.uk"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(3), r.getBoolean(4))).toMap
    assert(got(1L) == (("http://www.ads.tracker.com/x", "tracker.com", true)))
    assert(got(2L) == (("http://docs.example.com/y", "example.com", false)))
    assert(got(3L) == (("https://tracker.co.uk/z", "tracker.co.uk", true)))
  }
}
