package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL canonicalization + domain policy — the step between crawl
  * acquisition ([[graft.sources.Crawl]]) and everything downstream:
  * every web-scale corpus dedups, groups, and filters by NORMALIZED
  * URL and REGISTERED DOMAIN (public-suffix rules), and strips
  * tracking parameters so the same page under utm-decorated links is
  * one key, not thousands.
  *
  * Normalization contract (deterministic, engine-replayable):
  *  - scheme and host lowercase; path case PRESERVED (paths are
  *    case-sensitive, authorities are not);
  *  - default ports stripped per scheme (http:80, https:443), other
  *    ports kept;
  *  - fragment dropped (never sent to the server);
  *  - query parameters whose NAME is a known tracker (exact set, e.g.
  *    fbclid/gclid/ref) or carries a tracking prefix (utm_) are
  *    dropped; survivors sort lexicographically (one canonical order)
  *    and rejoin; an empty survivor set drops the '?';
  *  - empty path canonicalizes to "/";
  *  - registered domain = the label before the LONGEST matching
  *    public suffix (label-boundary match, the Mozilla PSL rule
  *    shape); a host equal to (or not covered by) any suffix is its
  *    own registered domain;
  *  - blocked = registered domain in the policy blocklist.
  *
  * Out of scope, documented: userinfo@ authorities, IPv6 literals,
  * percent-encoding equivalence (a corpus pipeline normalizes the
  * dominant shape; exotic authorities pass through un-split).
  *
  * 100 TB shape: a pure per-row JVM kernel in one mapPartitions pass
  * (no shuffle); the suffix and blocklist sets ride the closure (KB —
  * the real PSL is ~10k rules, still closure-sized). Grouping by the
  * emitted registered_domain afterwards is an ordinary hash shuffle.
  *
  * Reference behavior: the reference crawls a URL LIST verbatim
  * (`mr/generate/CrawlReducer.java:104-107` — ids and raw urls split
  * from text lines, no normalization); this operator adds the
  * canonicalization a corpus-scale crawl needs before its fetch/dedup
  * joins, per the documented pipeline scope. */
object UrlOps {

  /** Tracking parameter names dropped exactly. */
  val TrackingNames: Set[String] = Set("ref", "fbclid", "gclid", "msclkid")
  /** Tracking parameter name prefixes. */
  val TrackingPrefixes: Seq[String] = Seq("utm_")
  /** Fixture-scale public-suffix rules (the PSL shape: longest match
    * wins — "co.uk" beats "uk"). */
  val DefaultSuffixes: Set[String] = Set("com", "org", "net", "uk", "co.uk")

  final case class Normalized(url: String, host: String, registered: String,
                              kept: Int, dropped: Int)

  private def isDefaultPort(scheme: String, port: String): Boolean =
    (scheme == "http" && port == "80") || (scheme == "https" && port == "443")

  /** Normalize one URL per the contract above. Rows that do not parse
    * as scheme://... pass through with host/registered empty — the
    * per-row degrade contract. */
  def normalizeOne(raw: String, suffixes: Set[String]): Normalized = {
    val s = if (raw == null) "" else raw.trim
    val sep = s.indexOf("://")
    if (sep <= 0 || !s.substring(0, sep).forall(c =>
        c.isLetterOrDigit || c == '+' || c == '-' || c == '.')) {
      return Normalized(s, "", "", 0, 0)
    }
    val scheme = s.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    val rest = s.substring(sep + 3)
    var i = 0
    while (i < rest.length && rest.charAt(i) != '/' &&
      rest.charAt(i) != '?' && rest.charAt(i) != '#') i += 1
    val authority = rest.substring(0, i).toLowerCase(java.util.Locale.ROOT)
    val (host, port) = {
      val c = authority.lastIndexOf(':')
      // ASCII digits only, mirroring the oracle's [0-9] port test —
      // Character.isDigit also accepts Unicode digit classes
      if (c < 0 || !authority.substring(c + 1).forall(ch => ch >= '0' && ch <= '9') ||
        authority.contains('@') || authority.contains(']'))
        (authority, "")
      else (authority.substring(0, c), authority.substring(c + 1))
    }
    val after = rest.substring(i)
    val hashAt = after.indexOf('#')
    val noFrag = if (hashAt < 0) after else after.substring(0, hashAt)
    val qAt = noFrag.indexOf('?')
    val path0 = if (qAt < 0) noFrag else noFrag.substring(0, qAt)
    val path = if (path0.isEmpty) "/" else path0
    val query = if (qAt < 0) "" else noFrag.substring(qAt + 1)
    val params = if (query.isEmpty) Array.empty[String]
      else query.split("&", -1).filter(_.nonEmpty)
    def isTracking(p: String): Boolean = {
      val eq = p.indexOf('=')
      val name = if (eq < 0) p else p.substring(0, eq)
      TrackingNames.contains(name) || TrackingPrefixes.exists(name.startsWith)
    }
    val (drop, keep) = params.partition(isTracking)
    val keptSorted = keep.sorted
    val portPart =
      if (port.isEmpty || isDefaultPort(scheme, port)) "" else ":" + port
    val qPart = if (keptSorted.isEmpty) "" else "?" + keptSorted.mkString("&")
    val registered = registeredDomain(host, suffixes)
    Normalized(scheme + "://" + host + portPart + path + qPart,
      host, registered, keptSorted.length, drop.length)
  }

  /** Longest-suffix registered domain: the public suffix must match at
    * a label boundary, and the registered domain is one label more. */
  private[operators] def registeredDomain(host: String,
                                          suffixes: Set[String]): String = {
    if (host.isEmpty) return ""
    val labels = host.split('.')
    var best = -1 // label count of the longest matching suffix
    var k = 1
    while (k < labels.length) { // suffix must leave >= 1 label for the domain
      val cand = labels.takeRight(k).mkString(".")
      if (suffixes.contains(cand)) best = k
      k += 1
    }
    if (best < 0) host
    else labels.takeRight(best + 1).mkString(".")
  }

  /** DataFrame form: (idCol, urlCol) -> (doc_id, url_norm, host,
    * registered_domain, blocked, n_params_kept, n_params_dropped).
    * One map-side pass; suffixes/blocklist ride the closure. */
  def normalizeUrls(df: DataFrame,
                    suffixes: Set[String] = DefaultSuffixes,
                    blocklist: Set[String] = Set.empty,
                    idCol: String = "doc_id",
                    urlCol: String = "url"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(urlCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, u) =>
        val n = normalizeOne(u, suffixes)
        (id, n.url, n.host, n.registered,
          blocklist.contains(n.registered),
          n.kept.toLong, n.dropped.toLong)
      })
      .toDF(idCol, "url_norm", "host", "registered_domain", "blocked",
        "n_params_kept", "n_params_dropped")
  }

  /** Deterministic URL fixture over the documents table (the htmlWrap
    * convention): scheme/host case, default and non-default ports,
    * tracking and sortable queries, fragments, and a tracker domain
    * slice all derive from doc_id — replayed verbatim by the
    * q_url_normalize oracle. */
  def urlWrap(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val idS = id.cast("string")
    val scheme = when(id % 2 === 0, lit("http")).otherwise(lit("HTTPS"))
    val dom = when(id % 11 === 0, lit("Tracker")).otherwise(lit("Example"))
    val tld = when(id % 3 === 0, lit("com"))
      .when(id % 3 === 1, lit("co.uk")).otherwise(lit("org"))
    val port = when(id % 5 === 0, lit(":80"))
      .when(id % 5 === 1, lit(":443"))
      .when(id % 5 === 2, lit(":8080")).otherwise(lit(""))
    val query = when(id % 4 === 0,
        concat(lit("?utm_source=feed&q="), (id % 7).cast("string"),
          lit("&utm_campaign=x&ref=home&page="), (id % 5).cast("string")))
      .when(id % 4 === 2, lit("?beta=2&alpha=1"))
      .otherwise(lit(""))
    val frag = when(id % 3 === 0, concat(lit("#Section-"), idS))
      .otherwise(lit(""))
    docs.select(id, concat(scheme, lit("://WWW."), col("source"), lit("."),
      dom, lit("."), tld, port, lit("/Docs/"), idS, query, frag).as("url"))
  }
}
