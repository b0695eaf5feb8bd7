package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Crawl-frontier feed sources — the discovery side of the crawl front
 * door: [[graft.sources.Warc]] ingests what was fetched, [[Feeds]] parses
 * what a crawler should fetch NEXT. Two formats carry essentially all of
 * it in practice: XML sitemaps (sitemaps.org protocol — `<urlset>` leaf
 * files and `<sitemapindex>` pointer files, the URLs a SITE declares) and
 * RSS 2.0 / Atom feeds (the URLs a site PUBLISHES over time — the
 * freshness signal re-crawl scheduling keys on).
 *
 * Extraction is deliberately the same posture as
 * [[graft.functions.Text.stripHtml]]: tolerant regex block extraction
 * over native codegen'd HOFs (`regexp_extract_all` → `transform` →
 * `posexplode`), NOT a validating XML parser — real-world feeds are full
 * of namespace soup and unclosed tags, and a malformed entry must degrade
 * to a dropped row, never to a task failure. Every pattern is a shared
 * constant (RE2 ∩ Java subset: no lookarounds) so DuckDB oracles replay
 * the extraction exactly.
 *
 * SCALE SHAPE: both extractors are one narrow pass over the feed blobs —
 * zero exchanges; a 100 TB crawl's frontier refresh is file-parallel and
 * embarrassingly so. Feed documents are small (the sitemap protocol caps
 * a file at 50k URLs / 50 MB), so per-row regex mass is bounded by
 * protocol, not by corpus.
 */
object Feeds {

  /** One `<url>` element of a sitemap leaf file. */
  val sitemapUrlBlockPattern: String = "(?is)<url\\s*>.*?</url\\s*>"

  /** One `<sitemap>` element of a sitemap index file. */
  val sitemapIndexBlockPattern: String = "(?is)<sitemap\\s*>.*?</sitemap\\s*>"

  /** The `<loc>` value inside a block (whitespace-trimmed by pattern). */
  val locPattern: String = "(?is)<loc\\s*>\\s*([^<]*?)\\s*</loc\\s*>"

  /** The optional `<lastmod>` value inside a block. */
  val lastmodPattern: String = "(?is)<lastmod\\s*>\\s*([^<]*?)\\s*</lastmod\\s*>"

  private def field(b: Column, pattern: String): Column = {
    val v = regexp_extract(b, pattern, 1)
    when(v =!= "", v)
  }

  /**
   * Parse sitemap XML blobs into frontier rows `(idCol, kind, entry_idx,
   * loc, lastmod)`: `kind = 'url'` for leaf `<urlset>` entries,
   * `kind = 'sitemap'` for index pointers (a crawler enqueues the former
   * for fetching and the latter for further sitemap parsing). `entry_idx`
   * is the in-file position per kind; entries without a `<loc>` are
   * dropped (a sitemap row IS its loc); missing `<lastmod>` is NULL.
   */
  def sitemapEntries(df: DataFrame, idCol: String, xmlCol: String): DataFrame = {
    def entries(blockPattern: String, kind: String) = df
      .select(col(idCol), posexplode(
        regexp_extract_all(col(xmlCol), lit(blockPattern), lit(0))).as(Seq("entry_idx", "b")))
      .select(col(idCol), lit(kind).as("kind"), col("entry_idx").cast("long"),
        field(col("b"), locPattern).as("loc"),
        field(col("b"), lastmodPattern).as("lastmod"))
      .where(col("loc").isNotNull)
    entries(sitemapUrlBlockPattern, "url")
      .unionByName(entries(sitemapIndexBlockPattern, "sitemap"))
  }

  /** One `<item>` element of an RSS 2.0 channel. */
  val rssItemBlockPattern: String = "(?is)<item[\\s>].*?</item\\s*>"

  /** One `<entry>` element of an Atom feed. */
  val atomEntryBlockPattern: String = "(?is)<entry[\\s>].*?</entry\\s*>"

  /** `<title>` text (shared by both formats). */
  val feedTitlePattern: String = "(?is)<title[^>]*>\\s*([^<]*?)\\s*</title\\s*>"

  /** RSS `<link>` element text. */
  val rssLinkPattern: String = "(?is)<link\\s*>\\s*([^<]*?)\\s*</link\\s*>"

  /** Atom `<link href="...">` attribute (Atom links are attributes, not
    * element text — the one structural divergence that matters). */
  val atomLinkPattern: String = "(?i)<link\\b[^>]*href\\s*=\\s*\"([^\"]*)\""

  /** RSS `<pubDate>` text. */
  val rssDatePattern: String = "(?is)<pubDate\\s*>\\s*([^<]*?)\\s*</pubDate\\s*>"

  /** Atom `<updated>` text. */
  val atomDatePattern: String = "(?is)<updated\\s*>\\s*([^<]*?)\\s*</updated\\s*>"

  /**
   * Parse RSS 2.0 / Atom feed blobs into `(idCol, fmt, item_idx, title,
   * link, published)` — `fmt` sniffs from the root element (`<rss` vs
   * `<feed`); a blob with neither root yields no rows (the damaged-feed
   * contract). The sniff takes the FIRST root-shaped element in document
   * order — a substring sniff alone would parse a blob containing BOTH
   * literals (an RSS feed whose item content embeds `<feed`, or an Atom
   * feed whose entry discusses `<rss`) through both branches and emit
   * duplicate rows, and a bare "rss wins" rule would silently DROP such
   * an Atom feed; the real root element precedes any embedded literal,
   * so first-in-document is the symmetric fix for both.
   * Items without a link are dropped (a frontier row IS its
   * URL); missing title/date are NULL. Dates stay verbatim STRINGS —
   * RFC-822 (RSS) and RFC-3339 (Atom) parsing is the caller's choice, and
   * a malformed date must not kill the row that carries a good URL.
   */
  def feedEntries(df: DataFrame, idCol: String, xmlCol: String): DataFrame = {
    val x = col(xmlCol)
    // sniff over the blob with comments, doctype, CDATA sections, and
    // processing instructions removed: a `<rss`/`<feed` literal inside a
    // LEADING comment/doctype/CDATA would otherwise win the first-root
    // race against the real root element (an Atom feed prefixed by
    // `<!-- converted from <rss> -->` must still parse as Atom); the real
    // root can never live inside any of these sections, so stripping them
    // is sniff-neutral on every well-formed feed
    // the DOCTYPE branch consumes an optional INTERNAL SUBSET ([...])
    // whole: '<!DOCTYPE feed [<!ENTITY e "v"> <rss note> ]>' must strip
    // entirely — a plain [^>]* would stop at the subset's first '>' and
    // leave a root-shaped literal in the sniff source. Inside the subset,
    // quoted runs are opaque: '<!ENTITY e "a]b">' carries a ']' in its
    // VALUE, so the subset scanner skips "..."/'...' wholesale instead of
    // ending the subset at the first raw ']'
    val sniffSrc = regexp_replace(x,
      "(?is)<!--.*?-->|<!\\[CDATA\\[.*?\\]\\]>|" +
        "<!DOCTYPE[^>\\[]*(?:\\[(?:[^\\]\"']|\"[^\"]*\"|'[^']*')*\\])?[^>]*>|<\\?.*?\\?>",
      "")
    val firstRoot = lower(regexp_extract(sniffSrc, "(?is)<(rss|feed)[\\s>]", 1))
    def entries(rootCond: Column, blockPattern: String, fmt: String,
        linkPattern: String, datePattern: String) = df
      .where(rootCond)
      .select(col(idCol), posexplode(
        regexp_extract_all(x, lit(blockPattern), lit(0))).as(Seq("item_idx", "b")))
      .select(col(idCol), lit(fmt).as("fmt"), col("item_idx").cast("long"),
        field(col("b"), feedTitlePattern).as("title"),
        field(col("b"), linkPattern).as("link"),
        field(col("b"), datePattern).as("published"))
      .where(col("link").isNotNull)
    entries(firstRoot === "rss", rssItemBlockPattern, "rss", rssLinkPattern, rssDatePattern)
      .unionByName(
        entries(firstRoot === "feed",
          atomEntryBlockPattern, "atom", atomLinkPattern, atomDatePattern))
  }

  /**
   * The RECRAWL SET — the scheduling decision the frontier exists for:
   * join what sites DECLARE (frontier urls + freshness signals) against
   * what the crawl HOLDS (captured urls + capture dates) and emit what
   * to fetch, with the reason:
   *  - `'new'`   — declared but never captured;
   *  - `'stale'` — captured, but the declared signal postdates the
   *    capture (strict `signal > date` on ISO-8601 strings, which order
   *    lexicographically — the sitemap-lastmod / Atom-updated /
   *    WARC-Date common format; non-ISO signals like RSS pubDate
   *    compare meaninglessly and belong normalized upstream).
   * A frontier row with NO signal against an existing capture stays
   * fresh (an unknown lastmod cannot justify a refetch); unknown urls
   * fetch regardless. One url-keyed join — frontier frames are
   * protocol-small, so the planner broadcasts them against a corpus-
   * sized crawl store and degrades to an AQE-splittable shuffle only
   * when the frontier itself is corpus-sized.
   */
  def recrawlSet(frontier: DataFrame, urlCol: String, signalCol: String,
      crawl: DataFrame, crawlUrlCol: String, dateCol: String): DataFrame = {
    val f = frontier.select(col(urlCol).as("url"), col(signalCol).as("__sig"))
    val c = crawl.groupBy(col(crawlUrlCol).as("url"))
      .agg(max(col(dateCol)).as("__seen"))
    f.join(c, Seq("url"), "left")
      .select(col("url"),
        when(col("__seen").isNull, "new")
          .when(col("__sig").isNotNull && col("__sig") > col("__seen"), "stale")
          .as("reason"))
      .where(col("reason").isNotNull)
      .distinct()
  }
}
