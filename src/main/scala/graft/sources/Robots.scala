package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** robots.txt crawl policy — the admission rule in front of
  * [[Crawl.fetch]]: a corpus-scale crawler must honor per-host
  * robots.txt, and the policy check is a pure per-row function once
  * each host's rules are parsed (hosts are few; URLs are the corpus).
  *
  * Semantics follow the public REP specification (RFC 9309 and the
  * Google robots.txt documentation — the de-facto reference parser):
  *  - groups start at one or more `User-agent:` lines; a group applies
  *    to the agent with the LONGEST case-insensitive product-token
  *    match, with `*` as the fallback group;
  *  - within the chosen group, the rule with the LONGEST matching
  *    pattern wins; on equal length `Allow` beats `Disallow`;
  *  - patterns anchor at the path start and support `*` (any span)
  *    and a trailing `$` (end anchor); comparison is byte-exact;
  *  - an empty `Disallow:` value disallows nothing; a missing or
  *    unreadable robots.txt allows everything (the crawl-side
  *    fail-open convention the reference crawler implicitly used by
  *    never fetching robots at all — this module adds the policy the
  *    reference lacked, per the documented pipeline scope);
  *  - comments (`#`) strip to end of line; unknown directives and
  *    `Crawl-delay` are ignored here (the inter-request throttle is
  *    [[Crawl.fetch]]'s `throttleMs`).
  *
  * 100 TB shape: rules parse ONCE per host (a broadcast-sized map —
  * hosts are orders of magnitude fewer than URLs) and admission is a
  * per-row closure-local match in one `mapPartitions` pass, no
  * shuffle. */
object Robots {

  /** One admission rule: allow/deny, the pattern's octet length (the
    * REP longest-match specificity), and the compiled matcher. */
  final case class Rule(allow: Boolean, specificity: Int,
                        regex: java.util.regex.Pattern) extends Serializable

  /** One group's rules. */
  final case class Rules(rules: Seq[Rule]) extends Serializable

  /** Compile a REP path pattern: start-anchored, '*' = any span,
    * trailing '$' = end anchor, everything else literal. Built as a
    * full-match regex (quoted literal segments joined by `.*`, plus a
    * trailing `.*` unless end-anchored), so a "slash *.php$" rule
    * correctly matches `/a.php.php` — a greedy left-to-right segment
    * scan picks the FIRST occurrence of the last segment and misses
    * such paths (a measured bug class; regex backtracking handles
    * it). */
  private[sources] def compileRule(allow: Boolean, pattern: String): Rule = {
    val endAnchor = pattern.endsWith("$")
    val body = if (endAnchor) pattern.substring(0, pattern.length - 1)
      else pattern
    val quoted = body.split("\\*", -1)
      .map(s => if (s.isEmpty) "" else java.util.regex.Pattern.quote(s))
    val rx = quoted.mkString(".*") + (if (endAnchor) "" else ".*")
    Rule(allow, pattern.length, java.util.regex.Pattern.compile(rx))
  }

  /** Parse a robots.txt body and select the group for `userAgent`. */
  def parse(robotsTxt: String, userAgent: String): Rules = {
    val ua = userAgent.toLowerCase(java.util.Locale.ROOT)
    var bestLen = -1 // -1 = no group yet; '*' matches at length 0
    val best = scala.collection.mutable.ArrayBuffer.empty[Rule]
    val cur = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var curLen = -1 // longest agent match of the OPEN group
    var inAgentRun = false // consecutive User-agent lines share a group
    def closeGroup(): Unit = {
      if (curLen > bestLen || (curLen == bestLen && curLen >= 0 && best.isEmpty)) {
        if (curLen >= 0) { bestLen = curLen; best.clear(); best ++= cur }
      }
      cur.clear()
      curLen = -1
    }
    val lines = if (robotsTxt == null) Array.empty[String]
      else robotsTxt.split("\n", -1)
    lines.foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h < 0) raw else raw.substring(0, h)
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgentRun) closeGroup()
            inAgentRun = true
            val v = value.toLowerCase(java.util.Locale.ROOT)
            val matchLen =
              if (v == "*") 0
              else if (ua.contains(v) && v.nonEmpty) v.length
              else -1
            if (matchLen > curLen) curLen = matchLen
          case "allow" | "disallow" =>
            inAgentRun = false
            // an empty Disallow disallows nothing; an empty Allow is
            // meaningless — both drop
            if (value.nonEmpty) cur += compileRule(field == "allow", value)
          case _ =>
            inAgentRun = false // Crawl-delay etc.: ignored, ends the run
        }
      }
    }
    closeGroup()
    Rules(best.toSeq)
  }

  /** Admission verdict for one path under parsed rules: longest match
    * wins, Allow beats Disallow at equal length, no match = allowed. */
  def allowed(rules: Rules, path: String): Boolean = {
    val p = if (path == null || path.isEmpty) "/" else path
    var bestLen = -1
    var bestAllow = true
    rules.rules.foreach { r =>
      if ((r.specificity > bestLen ||
          (r.specificity == bestLen && r.allow && !bestAllow)) &&
        r.regex.matcher(p).matches()) {
        bestLen = r.specificity
        bestAllow = r.allow
      }
    }
    bestAllow
  }

  /** DataFrame form: admit/deny each (id, url) row against per-host
    * robots bodies (missing host = fail-open). Rules parse once per
    * host on the driver (hosts are broadcast-sized by definition);
    * admission is one map pass. Output: (doc_id, url, host, allowed). */
  def filterAllowed(urls: DataFrame, robotsByHost: Map[String, String],
                    userAgent: String,
                    idCol: String = "doc_id",
                    urlCol: String = "url"): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    val parsed: Map[String, Rules] =
      robotsByHost.map { case (h, txt) =>
        h.toLowerCase(java.util.Locale.ROOT) -> parse(txt, userAgent)
      }
    val rulesB = spark.sparkContext.broadcast(parsed)
    urls.select(col(idCol).cast("long"), col(urlCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val byHost = rulesB.value
        it.map { case (id, u) =>
          val s = if (u == null) "" else u
          val sep = s.indexOf("://")
          val (host, path) =
            if (sep < 0) ("", "/")
            else {
              val rest = s.substring(sep + 3)
              var i = 0
              while (i < rest.length && rest.charAt(i) != '/' &&
                rest.charAt(i) != '?' && rest.charAt(i) != '#') i += 1
              val auth = rest.substring(0, i).toLowerCase(java.util.Locale.ROOT)
              val c = auth.lastIndexOf(':')
              // ASCII digits only (same rule as UrlOps' port test)
              val h = if (c >= 0 &&
                  auth.substring(c + 1).forall(ch => ch >= '0' && ch <= '9'))
                auth.substring(0, c) else auth
              val hashAt = rest.indexOf('#', i)
              val tail = if (hashAt < 0) rest.substring(i)
                else rest.substring(i, hashAt)
              (h, if (tail.isEmpty) "/" else tail)
            }
          val ok = byHost.get(host).forall(r => allowed(r, path))
          (id, s, host, ok)
        }
      }
      .toDF(idCol, urlCol, "host", "allowed")
  }
}
