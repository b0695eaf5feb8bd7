package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/**
 * Edge pins for [[Url]] beyond q185's closed-form corpus: non-default
 * ports, root paths, empty queries after tracking-param removal,
 * multi-label hosts, and the second-level-suffix rule boundaries.
 */
class UrlSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u").select(Url.canonicalizeUrl(col("u"))).as[String].head()

  private def domain(h: String): String =
    Seq(h).toDF("h").select(Url.registrableDomain(col("h"))).as[String].head()

  test("case, www, default port, fragment") {
    assert(canon("HTTP://WWW.Example.COM:80/a/b#frag") == "http://example.com/a/b")
    assert(canon("https://www.example.com:443/") == "https://example.com")
    // NON-default port survives
    assert(canon("http://example.com:8080/a") == "http://example.com:8080/a")
    // https on http's default port is not a default: kept
    assert(canon("https://example.com:80/a") == "https://example.com:80/a")
  }

  test("tracking params dropped, the rest sorted; empty query vanishes") {
    assert(canon("http://e.com/p?utm_source=x&b=2&a=1&gclid=abc") ==
      "http://e.com/p?a=1&b=2")
    assert(canon("http://e.com/p?utm_campaign=x&fbclid=1&msclkid=2") ==
      "http://e.com/p")
    // parameter ORDER never splits identity
    assert(canon("http://e.com/p?b=2&a=1") == canon("http://e.com/p?a=1&b=2"))
  }

  test("trailing slash: stripped from non-root, root collapses") {
    assert(canon("http://e.com/a/") == "http://e.com/a")
    assert(canon("http://e.com/") == "http://e.com")
    assert(canon("http://e.com") == "http://e.com")
    // only ONE trailing slash is a spelling variant; deeper structure kept
    assert(canon("http://e.com/a//") == "http://e.com/a/")
  }

  test("a '?' inside the fragment is fragment content, not a query") {
    // SPA-route fragments: everything after '#' dies, including its '?...'
    assert(canon("http://example.com/a#/search?q=x") == "http://example.com/a")
    assert(canon("http://example.com/a?b=1#/search?q=x") == "http://example.com/a?b=1")
    // fragment-only '?' must not split identity from the fragmentless form
    assert(canon("http://example.com/a#?y=2") == canon("http://example.com/a"))
  }

  test("www is stripped only as a leading label") {
    assert(canon("http://www.example.com/x") == "http://example.com/x")
    assert(canon("http://wwwexample.com/x") == "http://wwwexample.com/x")
    assert(canon("http://sub.www.example.com/x") == "http://sub.www.example.com/x")
  }

  test("registrable domain: plain, cc second-level, bare host") {
    assert(domain("a.b.example.com") == "example.com")
    assert(domain("news.example.co.uk") == "example.co.uk")
    assert(domain("example.co.uk") == "example.co.uk")
    // .co under a 3-letter TLD is NOT a cc suffix rule match
    assert(domain("x.co.com") == "co.com")
    assert(domain("localhost") == "localhost")
    assert(domain("example.org") == "example.org")
  }

  test("canonical form is idempotent") {
    val messy = Seq(
      "HTTP://WWW.E.COM:80/a/?utm_source=x&b=2&a=1#f",
      "https://sub.example.co.uk:443/deep/path/",
      "http://e.com:8080/?z=9")
    for (u <- messy) assert(canon(canon(u)) == canon(u))
  }
}
