package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Truth table for URL canonicalization — the third dedup-cluster signal. */
class CanonicalUrlSpec extends SparkTestBase {

  private def canon(s: String): String = {
    import spark.implicits._
    Seq(Tuple1(s)).toDF("u")
      .select(Corpus.canonicalUrl(col("u")).as("c"))
      .collect()(0).getString(0)
  }

  test("scheme/host lowercase, path case preserved") {
    assert(canon("HTTPS://Example.ORG/Path/X") == "https://example.org/Path/X")
    assert(canon("HTTP://A.COM") == "http://a.com")
  }

  test("www and default ports dropped; non-default ports kept") {
    assert(canon("https://www.example.org/a") == "https://example.org/a")
    assert(canon("http://example.org:80/a") == "http://example.org/a")
    assert(canon("https://example.org:443/a?q=1") == "https://example.org/a?q=1")
    assert(canon("http://example.org:8080/a") == "http://example.org:8080/a")
    assert(canon("http://example.org:443/a") == "http://example.org:443/a") // not http's default
    assert(canon("https://example.org:80") == "https://example.org:80")
  }

  test("fragment stripped") {
    assert(canon("https://a.com/x#frag") == "https://a.com/x")
    assert(canon("https://a.com/x?q=1#a=b&c") == "https://a.com/x?q=1")
  }

  test("tracking params removed with separator repair") {
    assert(canon("https://a.com/x?utm_source=f") == "https://a.com/x")
    assert(canon("https://a.com/x?utm_source=f&q=1") == "https://a.com/x?q=1")
    assert(canon("https://a.com/x?q=1&utm_medium=rss") == "https://a.com/x?q=1")
    assert(canon("https://a.com/x?utm_a=1&utm_b=2") == "https://a.com/x")
    assert(canon("https://a.com/x?gclid=z&fbclid=y&q=2") == "https://a.com/x?q=2")
    assert(canon("https://a.com/x?q=1&gclid=z&r=2") == "https://a.com/x?q=1&r=2")
  }

  test("'&' in the PATH is a legal pchar (RFC 3986) — tracker-shaped path " +
    "segments are never stripped, only real query params are") {
    // a path segment that merely LOOKS like a tracker param must survive:
    // stripping it would collide two distinct pages' dedup keys
    assert(canon("http://h/a&utm_b=2/c") == "http://h/a&utm_b=2/c")
    assert(canon("https://a.com/p&gclid=x/q?utm_source=f&r=1")
      == "https://a.com/p&gclid=x/q?r=1")
    // no '?' at all: the '&' variant has no query to act on
    assert(canon("https://a.com/x&utm_a=1") == "https://a.com/x&utm_a=1")
  }

  test("all rules compose on a maximally-flawed URL") {
    assert(canon("HTTPS://WWW.Example.ORG:443/p/7?utm_source=feed&utm_medium=rss#sec")
      == "https://example.org/p/7")
  }

  test("userinfo passes through verbatim; host rules still apply after it") {
    // userinfo is case-sensitive (RFC 3986) — never lowercased
    assert(canon("https://Alice@Example.ORG/x") == "https://Alice@example.org/x")
    // default port and www are host rules and fire despite the userinfo colon
    assert(canon("http://u:p@example.org:80/x") == "http://u:p@example.org/x")
    assert(canon("https://U:P@WWW.Example.ORG:443/x?gclid=1") == "https://U:P@example.org/x")
    // non-default port after userinfo kept
    assert(canon("http://u:p@example.org:8080/x") == "http://u:p@example.org:8080/x")
  }

  test("non-URL strings pass through (minus fragment/tracker rules)") {
    assert(canon("not a url") == "not a url")
    assert(canon("") == "")
    assert(canon("ftp://Host.COM/File") == "ftp://host.com/File") // scheme-generic lowering
  }
}
