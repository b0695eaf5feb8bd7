package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt compliance (RFC 9309) — the crawl-policy filter between
  * ingestion ([[graft.sources.Warc]]) and everything downstream: a corpus
  * that keeps pages a site disallowed is a compliance bug, so the filter
  * is a first-class curation operator, not crawler-internal plumbing.
  *
  * Semantics implemented (RFC 9309 §2):
  *  - group selection: the rules that apply to a crawler are those of the
  *    group(s) whose `User-agent` token equals the crawler's product token
  *    (case-insensitive); only if NO specific group exists does the `*`
  *    group apply. Multiple groups for the same agent merge.
  *  - rule matching: a rule matches when its path pattern matches the URL
  *    path-plus-query from the first octet. `*` matches any octet
  *    sequence; a trailing `$` anchors the end. Everything else is a
  *    literal prefix.
  *  - precedence: the matching rule with the MOST OCTETS in its pattern
  *    wins; at equal length `Allow` wins. No matching rule, an empty
  *    `Disallow:` line, or no robots.txt at all → allowed.
  *
  * Scale posture: parsing is a narrow per-host pass producing one
  * rules-ARRAY row per host (robots files are small by protocol — the RFC
  * caps parsing obligation at 500 KiB — and rules-per-host is tens, not
  * thousands); the verdict is ONE host equi-join (AQE broadcasts the
  * rules side when it is small; at a hundred million hosts it degrades to
  * a plain shuffle join, still one exchange) plus zero-exchange
  * higher-order-function selection over the joined array — no per-URL
  * groupBy, no window, no fan-out join through the rule list. Literal
  * prefix rules (the overwhelming majority in the wild) match with
  * `startswith`; only `*`/`$` rules pay a regex.
  */
object Robots {

  /** Parsed form of one rule: allow flag, RFC-specificity octet length,
    * and either a literal prefix or a translated regex. */
  private[graft] case class RobotsRule(allow: Int, plen: Int, kind: String, pattern: String)

  /** The rules applying to `userAgent` from one robots.txt body. Lines
    * outside any group header, unknown directives, and comments are
    * ignored per RFC; an empty-path Disallow contributes no rule. */
  private[graft] def parseRobotsFor(text: String, userAgent: String): Seq[RobotsRule] = {
    // normalize the crawler's own token the same way the group headers
    // are normalized (a caller passing 'GraftBot/1.0' means 'graftbot')
    val ua = userAgent.toLowerCase(java.util.Locale.ROOT)
      .takeWhile(ch => ch != '/' && !ch.isWhitespace)
    // (agents of the current group header run, rules of the current group)
    val groups = scala.collection.mutable.ArrayBuffer.empty[(Set[String], Vector[RobotsRule])]
    var curAgents = Set.empty[String]
    var curRules = Vector.empty[RobotsRule]
    var inHeader = true // consecutive User-agent lines accumulate one group
    def flush(): Unit = {
      if (curAgents.nonEmpty) groups += ((curAgents, curRules))
      curAgents = Set.empty; curRules = Vector.empty
    }
    text.split("\r?\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (!inHeader) flush()
            // RFC 9309 §2.2.1: crawlers match on the PRODUCT TOKEN — the
            // value's leading token before any '/version' or whitespace
            // comment ('User-agent: graftbot/1.0' selects for 'graftbot'),
            // case-insensitive. Matching the whole line value would
            // silently fall back to the '*' group — compliance drift.
            curAgents += value.toLowerCase(java.util.Locale.ROOT)
              .takeWhile(ch => ch != '/' && !ch.isWhitespace)
            inHeader = true
          case "allow" | "disallow" =>
            inHeader = false
            if (value.nonEmpty && curAgents.nonEmpty)
              curRules :+= toRule(key == "allow", value)
          case _ => inHeader = false // sitemap, crawl-delay, unknown: skip
        }
      }
    }
    flush()
    val specific = groups.filter(_._1.contains(ua)).flatMap(_._2)
    if (groups.exists(_._1.contains(ua))) specific.toSeq
    else groups.filter(_._1.contains("*")).flatMap(_._2).toSeq
  }

  private def toRule(allow: Boolean, path: String): RobotsRule =
    if (path.contains('*') || path.endsWith("$")) {
      val anchored = path.endsWith("$")
      val body = if (anchored) path.dropRight(1) else path
      val rx = "^" + body.split("\\*", -1).map(java.util.regex.Pattern.quote)
        .mkString(".*") + (if (anchored) "$" else "")
      RobotsRule(if (allow) 1 else 0, path.length, "r", rx)
    } else RobotsRule(if (allow) 1 else 0, path.length, "p", path)

  /** URL path-plus-query (the robots match target): everything after the
    * authority, fragment dropped, empty → "/". The authority stops at
    * `/`, `?` or `#`, so a query on a path-less URL
    * (`https://h.example?q=x`) still reaches the target as `/?q=x`. */
  private[graft] def urlPath(u: Column): Column = {
    val p = regexp_extract(regexp_extract(u, "^([^#]*)", 1),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([/?].*)?$", 1)
    when(p === "", lit("/"))
      .when(startswith(p, lit("?")), concat(lit("/"), p))
      .otherwise(p)
  }

  /** One rules-array row per host for `userAgent` — the standing policy
    * frame a crawl pipeline derives once per robots snapshot. Hosts whose
    * robots.txt yields no applicable rules still get a row (empty array:
    * everything allowed) so a join hit never aliases "no policy". */
  def robotsRules(robots: DataFrame, hostCol: String, txtCol: String,
                  userAgent: String): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select(col(hostCol).cast("string"), col(txtCol).cast("string"))
      .as[(String, String)]
      .map { case (host, txt) =>
        (host, parseRobotsFor(if (txt == null) "" else txt, userAgent)
          .map(r => (r.allow, r.plen, r.kind, r.pattern)))
      }
      .toDF(hostCol, "rules")
  }

  /** Verdict per URL row: `allowed` under the host's policy. URLs of
    * hosts absent from `rules` are allowed (no robots.txt = no
    * restriction — the RFC's unreachable-robots default for 4xx). */
  def filterByRobots(urls: DataFrame, urlCol: String,
                     rules: DataFrame, hostCol: String): DataFrame = {
    val host = graft.functions.Url.canonicalHost(col(urlCol))
    val path = urlPath(col(urlCol))
    val matched = filter(col("rules"), r =>
      when(r.getField("_3") === "p", startswith(path, r.getField("_4")))
        .otherwise(regexp_like(path, r.getField("_4"))))
    // RFC precedence in one expression: lexicographic max over
    // (octet length, allow) of the matching rules; allow wins ties
    val best = array_max(transform(matched,
      r => struct(r.getField("_2").as("plen"), r.getField("_1").as("allow"))))
    urls
      .join(rules.withColumnRenamed(hostCol, "__rhost"),
        host === col("__rhost"), "left")
      .withColumn("allowed",
        coalesce(best.getField("allow") === 1, lit(true)))
      .drop("__rhost", "rules")
  }
}
