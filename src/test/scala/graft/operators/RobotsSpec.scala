package graft.operators

import graft.SparkSuite
import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite with SparkSuite {
  import Robots._

  private def verdicts(robotsTxt: String, ua: String,
                       urls: Seq[String]): Seq[(String, Boolean)] = {
    import spark.implicits._
    val rules = robotsRules(
      Seq(("h.example", robotsTxt)).toDF("host", "robots_txt"), "host", "robots_txt", ua)
    filterByRobots(
      urls.map(u => Tuple1(u)).toDF("url"), "url", rules, "host")
      .select("url", "allowed").as[(String, Boolean)].collect().toSeq
      .sortBy(r => urls.indexOf(r._1))
  }

  test("longest match wins and allow beats disallow on ties") {
    val txt = "User-agent: *\nDisallow: /a/\nAllow: /a/b/\nDisallow: /c\nAllow: /c\n"
    val got = verdicts(txt, "anybot", Seq(
      "https://h.example/a/x", // /a/ disallow
      "https://h.example/a/b/x", // longer allow wins
      "https://h.example/c/x", // equal length: allow wins
      "https://h.example/d")) // no rule: allowed
    assert(got.map(_._2) == Seq(false, true, true, true))
  }

  test("a specific user-agent group REPLACES the star group") {
    val txt = "User-agent: *\nDisallow: /\n\nUser-agent: graftbot\nDisallow: /beta/\n"
    // graftbot: only its group applies — the star Disallow:/ must not leak
    assert(verdicts(txt, "graftbot", Seq(
      "https://h.example/anything", "https://h.example/beta/x")).map(_._2) ==
      Seq(true, false))
    // another crawler: the star group's Disallow:/ blocks everything
    assert(verdicts(txt, "otherbot", Seq(
      "https://h.example/anything")).map(_._2) == Seq(false))
  }

  test("a versioned User-agent line still selects its group (RFC 9309 product token)") {
    // group selection matches the value's LEADING product token — before
    // any '/version' or whitespace comment — case-insensitively; whole-line
    // equality would silently fall back to the '*' group (compliance drift)
    val txt = "User-agent: *\nDisallow: /\n\n" +
      "User-agent: GraftBot/1.2 (+https://h.example/bot)\nDisallow: /beta/\n"
    assert(verdicts(txt, "graftbot", Seq(
      "https://h.example/anything", "https://h.example/beta/x")).map(_._2) ==
      Seq(true, false))
    // the crawler's own token normalizes the same way against a bare group
    val bare = "User-agent: graftbot\nDisallow: /b/\n"
    assert(verdicts(bare, "GraftBot/2.0", Seq(
      "https://h.example/b/x", "https://h.example/c")).map(_._2) == Seq(false, true))
  }

  test("wildcards and the $ anchor follow RFC matching") {
    val txt = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /dl/*/raw\nDisallow: /tmp$\n"
    val got = verdicts(txt, "anybot", Seq(
      "https://h.example/docs/a.pdf", // *.pdf$ matches
      "https://h.example/docs/a.pdf?x=1", // $ anchored: query breaks the match
      "https://h.example/dl/v1/raw", // inner * spans a segment
      "https://h.example/dl/v1/rawer", // prefix semantics after the wildcard
      "https://h.example/tmp", // exact via $
      "https://h.example/tmpx")) // $ excludes longer paths
    assert(got.map(_._2) == Seq(false, true, false, false, false, true))
  }

  test("headers, comments, case, CRLF and empty Disallow are handled") {
    val txt = "# top comment\r\nUSER-AGENT: GraftBot # inline\r\nDISALLOW: /x\r\n" +
      "Disallow:\r\nSitemap: https://h.example/sm.xml\r\nDisallow: /y\r\n"
    // empty Disallow contributes nothing; Sitemap does not end the group
    assert(verdicts(txt, "graftbot", Seq(
      "https://h.example/x1", "https://h.example/y2", "https://h.example/z"))
      .map(_._2) == Seq(false, false, true))
  }

  test("consecutive user-agent lines share one group; same-agent groups merge") {
    val txt = "User-agent: abot\nUser-agent: graftbot\nDisallow: /a/\n\n" +
      "User-agent: graftbot\nDisallow: /b/\n"
    assert(verdicts(txt, "graftbot", Seq(
      "https://h.example/a/x", "https://h.example/b/x", "https://h.example/c"))
      .map(_._2) == Seq(false, false, true))
  }

  test("hosts without robots, null text, and rule-free text allow everything") {
    import spark.implicits._
    val rules = robotsRules(Seq(
      ("a.example", null.asInstanceOf[String]),
      ("b.example", "Sitemap: https://b.example/sm.xml\n")).toDF("host", "robots_txt"),
      "host", "robots_txt", "graftbot")
    val got = filterByRobots(Seq(
      Tuple1("https://a.example/x"), Tuple1("https://b.example/x"),
      Tuple1("https://c.example/x")).toDF("url"), "url", rules, "host")
      .select("allowed").as[Boolean].collect().toSeq
    assert(got == Seq(true, true, true))
  }

  test("the match target is path-plus-query with the fragment dropped") {
    val txt = "User-agent: *\nDisallow: /s?q=\n"
    assert(verdicts(txt, "anybot", Seq(
      "https://h.example/s?q=secret", // query participates in matching
      "https://h.example/s", // bare path: no match
      "https://h.example/s#q=frag")) // fragment is NOT part of the target
      .map(_._2) == Seq(false, true, true))
  }

  test("a query on a path-less URL still reaches the match target as /?...") {
    val txt = "User-agent: *\nDisallow: /?q=\n"
    assert(verdicts(txt, "anybot", Seq(
      "https://h.example?q=secret", // no path segment at all
      "https://h.example/?q=secret", // explicit root path
      "https://h.example")) // neither path nor query: just '/'
      .map(_._2) == Seq(false, false, true))
  }
}
