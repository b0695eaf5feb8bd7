package graft.sources

import org.scalatest.funspec.AnyFunSpec

import graft.SparkSuite

/** Frontier feed extraction: sitemap leaf/index rows, RSS vs Atom item
  * structure, the missing-field and damaged-blob contracts. */
class FeedsSpec extends AnyFunSpec with SparkSuite {
  import spark.implicits._

  private def sitemapRows(xml: String): Seq[(String, Long, String, Option[String])] =
    Feeds.sitemapEntries(Seq((1L, xml)).toDF("id", "xml"), "id", "xml")
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getString(3), Option(r.getString(4))))
      .toSeq.sortBy(x => (x._1, x._2))

  it("sitemap leaf: loc + optional lastmod per <url>, in file order") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        | <url><loc> https://a.example/1 </loc><lastmod>2026-01-02</lastmod></url>
        | <url><loc>https://a.example/2</loc></url>
        | <url><lastmod>2026-01-03</lastmod></url>
        | <url><loc>https://a.example/3</loc><lastmod>2026-01-04</lastmod></url>
        |</urlset>""".stripMargin
    // the loc-less third <url> drops; indexes are per-match positions
    assert(sitemapRows(xml) == Seq(
      ("url", 0L, "https://a.example/1", Some("2026-01-02")),
      ("url", 1L, "https://a.example/2", None),
      ("url", 3L, "https://a.example/3", Some("2026-01-04"))))
  }

  it("sitemap index: pointer rows come out kind='sitemap'") {
    val xml =
      """<sitemapindex>
        | <sitemap><loc>https://a.example/sitemap-1.xml</loc><lastmod>2026-02-01</lastmod></sitemap>
        | <sitemap><loc>https://a.example/sitemap-2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    assert(sitemapRows(xml) == Seq(
      ("sitemap", 0L, "https://a.example/sitemap-1.xml", Some("2026-02-01")),
      ("sitemap", 1L, "https://a.example/sitemap-2.xml", None)))
  }

  it("damaged sitemap XML yields only the well-formed blocks, never an error") {
    val xml = "<urlset><url><loc>https://ok.example/x</loc></url><url><loc>https://torn"
    assert(sitemapRows(xml) == Seq(("url", 0L, "https://ok.example/x", None)))
    assert(sitemapRows("not xml at all") == Seq.empty)
  }

  private def feedRows(xml: String): Seq[(String, Long, Option[String], String, Option[String])] =
    Feeds.feedEntries(Seq((1L, xml)).toDF("id", "xml"), "id", "xml")
      .collect()
      .map(r => (r.getString(1), r.getLong(2), Option(r.getString(3)),
        r.getString(4), Option(r.getString(5))))
      .toSeq.sortBy(_._2)

  it("RSS 2.0: title/link/pubDate per <item>; linkless items drop") {
    val xml =
      """<rss version="2.0"><channel>
        | <title>Site feed</title><link>https://b.example/</link>
        | <item><title>First</title><link>https://b.example/p1</link>
        |   <pubDate>Mon, 02 Feb 2026 10:00:00 GMT</pubDate></item>
        | <item><title>No link here</title></item>
        | <item><link>https://b.example/p3</link></item>
        |</channel></rss>""".stripMargin
    // the channel-level <title>/<link> are OUTSIDE any <item>: not rows
    assert(feedRows(xml) == Seq(
      ("rss", 0L, Some("First"), "https://b.example/p1",
        Some("Mon, 02 Feb 2026 10:00:00 GMT")),
      ("rss", 2L, None, "https://b.example/p3", None)))
  }

  it("Atom: href attribute links, <updated> dates; root sniff separates formats") {
    val xml =
      """<feed xmlns="http://www.w3.org/2005/Atom">
        | <title>Blog</title>
        | <entry><title>A</title><link rel="alternate" href="https://c.example/a"/>
        |   <updated>2026-03-04T05:06:07Z</updated></entry>
        | <entry><title>B</title><link href="https://c.example/b"/></entry>
        |</feed>""".stripMargin
    assert(feedRows(xml) == Seq(
      ("atom", 0L, Some("A"), "https://c.example/a", Some("2026-03-04T05:06:07Z")),
      ("atom", 1L, Some("B"), "https://c.example/b", None)))
    // a blob with neither root yields nothing
    assert(feedRows("<html><body>not a feed</body></html>") == Seq.empty)
  }

  it("a blob carrying BOTH root literals parses through its FIRST root only") {
    // an RSS feed whose item content embeds the '<feed ' literal: a pure
    // substring sniff would run it through both branches and emit the
    // same link twice (once as rss, once as atom)
    val xml =
      """<rss version="2.0"><channel>
        | <item><title>about &lt;feed&gt; and <feed xmlns="atom"> markup</title>
        |   <link>https://d.example/p1</link></item>
        |</channel></rss>""".stripMargin
    val rows = feedRows(xml)
    assert(rows.map(_._1).distinct == Seq("rss"))
    assert(rows.map(_._4) == Seq("https://d.example/p1"))
    // ...and the SYMMETRIC case: an Atom feed whose entry content embeds
    // '<rss ' must still parse as atom (an "rss wins" rule would silently
    // drop the whole feed — the real root comes first in document order)
    val atomXml =
      """<feed xmlns="http://www.w3.org/2005/Atom">
        | <entry><title>sample <rss version="2.0"> markup inside</title>
        |   <link href="https://d.example/a1"/></entry>
        |</feed>""".stripMargin
    val atomRows = feedRows(atomXml)
    assert(atomRows.map(_._1).distinct == Seq("atom"))
    assert(atomRows.map(_._4) == Seq("https://d.example/a1"))
  }

  it("a root literal inside a LEADING comment/doctype/CDATA never wins the sniff") {
    // an Atom feed prefixed by a comment that mentions '<rss ' (a converter
    // note, say) must parse as atom — the comment precedes the real root in
    // document order, so a raw first-in-document sniff would pick rss and
    // silently drop every entry
    val commented =
      """<?xml version="1.0"?>
        |<!-- converted from <rss version="2.0"> by feedmigrate -->
        |<feed xmlns="http://www.w3.org/2005/Atom">
        | <entry><title>A</title><link href="https://e.example/a"/></entry>
        |</feed>""".stripMargin
    assert(feedRows(commented).map(r => (r._1, r._4)) ==
      Seq(("atom", "https://e.example/a")))
    // symmetric: RSS behind a doctype + CDATA that both mention <feed
    val cdataed =
      """<!DOCTYPE rss [<!-- <feed> -->]><!--<feed a>-->
        |<rss version="2.0"><channel>
        | <item><title><![CDATA[about <feed xmlns="x"> markup]]></title>
        |   <link>https://e.example/r</link></item>
        |</channel></rss>""".stripMargin
    assert(feedRows(cdataed).map(r => (r._1, r._4)) ==
      Seq(("rss", "https://e.example/r")))
    // a DOCTYPE with an INTERNAL SUBSET strips whole: the subset's own
    // '>' characters must not end the strip early and leak '<rss ' into
    // the sniff source
    val subset =
      """<!DOCTYPE feed [<!ENTITY e "v"> <rss note> ]>
        |<feed xmlns="http://www.w3.org/2005/Atom">
        | <entry><title>S</title><link href="https://e.example/s"/></entry>
        |</feed>""".stripMargin
    assert(feedRows(subset).map(r => (r._1, r._4)) ==
      Seq(("atom", "https://e.example/s")))
    // a ']' inside a QUOTED entity value must not end the subset early:
    // '<!ENTITY e "a]b">' would otherwise leave '"> <rss note> ]>' (with
    // its root-shaped literal) in the sniff source
    val quotedBracket =
      """<!DOCTYPE feed [<!ENTITY e "a]b"> <rss note> ]>
        |<feed xmlns="http://www.w3.org/2005/Atom">
        | <entry><title>Q</title><link href="https://e.example/q"/></entry>
        |</feed>""".stripMargin
    assert(feedRows(quotedBracket).map(r => (r._1, r._4)) ==
      Seq(("atom", "https://e.example/q")))
  }

  it("recrawlSet: new urls fetch, postdating signals go stale, unknown signals stay fresh") {
    val frontier = Seq(
      ("https://a.example/1", Some("2026-02-01T00:00:00Z")), // newer -> stale
      ("https://a.example/2", Some("2025-12-01T00:00:00Z")), // older -> fresh
      ("https://a.example/3", None),                         // no signal -> fresh
      ("https://a.example/4", None),                         // never crawled -> new
      ("https://a.example/5", Some("2026-02-01T00:00:00Z"))  // never crawled -> new
    ).toDF("url", "sig")
    val crawl = Seq(
      ("https://a.example/1", "2026-01-01T00:00:00Z"),
      ("https://a.example/2", "2026-01-01T00:00:00Z"),
      ("https://a.example/3", "2026-01-01T00:00:00Z"),
      // a re-crawled url keeps its LATEST capture date
      ("https://a.example/1", "2025-06-01T00:00:00Z")).toDF("uri", "date")
    val got = Feeds.recrawlSet(frontier, "url", "sig", crawl, "uri", "date")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(
      ("https://a.example/1", "stale"),
      ("https://a.example/4", "new"),
      ("https://a.example/5", "new")))
  }

  it("anchorTexts pairs hrefs with VISIBLE anchor text, aligned match-for-match") {
    import org.apache.spark.sql.functions._
    val html = "<p>intro</p><a href=\"https://t.example/1\">first <b>bold</b> text</a>" +
      "<a name=\"skip\">no href</a>" +
      "<a rel=\"x\" href=\"https://t.example/2\">B &amp; W</a>" +
      "<a href=\"https://t.example/3\"><img src=\"i.png\"/></a>"
    val got = Seq(Tuple1(html)).toDF("html")
      .select(explode(graft.functions.Text.anchorTexts(col("html"))).as("a"))
      .select(col("a.href"), col("a.anchor"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(
      ("https://t.example/1", "first bold text"),
      ("https://t.example/2", "B & W"),
      ("https://t.example/3", "")))
  }
}
