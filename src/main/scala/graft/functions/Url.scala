package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL canonicalization — the crawl-curation kernel that turns the many
 * spellings of one web resource into a single dedup/join key (the first
 * step of any exact-URL dedup or per-site aggregation over a crawl).
 * Rules, in order, all deterministic:
 *
 *   1. scheme and host lowercase;
 *   2. leading `www.` stripped from the host;
 *   3. the scheme's default port stripped (`:80` for http, `:443` for
 *      https) — non-default ports survive;
 *   4. fragment dropped;
 *   5. tracking query parameters dropped ([[trackingParamPattern]]:
 *      `utm_*`, `fbclid`, `gclid`, `msclkid`), remaining parameters
 *      SORTED lexicographically and re-joined — parameter order never
 *      splits a URL's identity;
 *   6. one trailing slash stripped from a non-root path.
 *
 * Everything is codegen'd column arithmetic (regexp_extract + array
 * ops) — zero shuffle, linear in the corpus, exactly replayable by any
 * SQL engine with list lambdas. The shared constants below are the
 * single source of truth for both the Spark kernel and the generated
 * DuckDB oracle fragments ([[trackingFilterSql]], [[domainSql]]) so the
 * two cannot drift.
 */
object Url {

  /** Query parameters that never carry identity: the analytics
    * attribution families. Anchored prefix regex over `key=value`. */
  val trackingParamPattern: String = "^(utm_[a-z0-9]+|fbclid|gclid|msclkid)="

  /** Second-level labels that act as public suffixes under a 2-letter
    * country code (`co.uk`, `com.au`, ...): the tiny fixed subset of the
    * public-suffix list sufficient for a deterministic registrable-domain
    * rule (documented simplification — the full PSL is a data file, not
    * an algorithm). */
  val secondLevelSuffixes: Seq[String] = Seq("co", "com", "net", "org", "gov", "ac", "edu")

  private def schemeOf(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  private def afterScheme(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)

  /** Lowercased host with `www.` and the scheme-default port stripped. */
  def canonicalHost(u: Column): Column = {
    val hostport = lower(regexp_extract(afterScheme(u), "^([^/?#]*)", 1))
    val noWww = regexp_replace(hostport, "^www\\.", "")
    val scheme = schemeOf(u)
    when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
  }

  private def canonicalPath(u: Column): Column = {
    val path = regexp_extract(afterScheme(u), "^[^/?#]*([^?#]*)", 1)
    when(path === "" || path === "/", lit("")).otherwise(regexp_replace(path, "/$", ""))
  }

  private def canonicalQuery(u: Column): Column = {
    // Query lives strictly BEFORE the first '#': a '?' inside the fragment
    // (SPA routes like `#/search?q=x`) is fragment content and must die
    // with rule 4, not resurrect as a query string.
    val q = regexp_extract(regexp_extract(u, "^([^#]*)", 1), "\\?(.*)$", 1)
    val kept = array_sort(filter(split(q, "&"),
      p => p =!= "" && !p.rlike(trackingParamPattern)))
    when(size(kept) > 0, concat(lit("?"), array_join(kept, "&"))).otherwise(lit(""))
  }

  /** The full canonical form (rules 1-6 above). */
  def canonicalizeUrl(u: Column): Column =
    concat(schemeOf(u), lit("://"), canonicalHost(u), canonicalPath(u), canonicalQuery(u))

  /** Registrable domain of a canonical host: last two labels, or last
    * THREE when the second-to-last is a [[secondLevelSuffixes]] member
    * under a 2-letter country code (`example.co.uk`). */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val ccSecond = element_at(labels, -2).isin(secondLevelSuffixes: _*) &&
      length(element_at(labels, -1)) === 2
    when(size(labels) >= 3 && ccSecond, array_join(slice(labels, -3, 3), "."))
      .when(size(labels) >= 2, array_join(slice(labels, -2, 2), "."))
      .otherwise(host)
  }

  /** DuckDB fragment: keep-and-sort filter over the `&`-split query-param
    * list `ps` — generated from [[trackingParamPattern]]. */
  def trackingFilterSql(ps: String): String =
    s"list_sort(list_filter($ps, p -> p <> '' AND NOT regexp_matches(p, '$trackingParamPattern')))"

  /** DuckDB fragment: registrable domain of host expression `h` —
    * generated from [[secondLevelSuffixes]]. */
  def domainSql(h: String): String = {
    val suffixes = secondLevelSuffixes.map(s => s"'$s'").mkString("(", ", ", ")")
    s"""CASE WHEN len(string_split($h, '.')) >= 3
       |          AND string_split($h, '.')[-2] IN $suffixes
       |          AND len(string_split($h, '.')[-1]) = 2
       |     THEN array_to_string(string_split($h, '.')[-3:], '.')
       |     WHEN len(string_split($h, '.')) >= 2
       |     THEN array_to_string(string_split($h, '.')[-2:], '.')
       |     ELSE $h END""".stripMargin
  }
}
