package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.UrlOps

/** Branch-by-branch url_normalize cases derived from the reference spec
  * (`etl_merge.py:474-514`) and Python urlparse/parse_qsl/urlencode behavior.
  */
class UrlOpsSpec extends AnyFunSuite {
  private def n(u: String, base: String = "", strip: Boolean = false) =
    UrlOps.normalize(u, base, strip)

  test("host and scheme lowercased, path case preserved") {
    assert(n("HTTPS://Shop.Example.COM/Products/Red-Widget") ==
      "https://shop.example.com/Products/Red-Widget")
  }

  test("utm_* params dropped case-insensitively, others re-encoded in order") {
    assert(n("https://x.com/a?utm_source=g&ref=1&UTM_campaign=c&b=2") ==
      "https://x.com/a?ref=1&b=2")
  }

  test("blank values kept, bare keys gain '='") {
    assert(n("https://x.com/a?k&ref=") == "https://x.com/a?k=&ref=")
  }

  test("param values percent-re-encoded with quote_plus (space→+)") {
    assert(n("https://x.com/a?q=hello%20world&p=a+b") ==
      "https://x.com/a?q=hello+world&p=a+b")
  }

  test("fragment always dropped") {
    assert(n("https://x.com/a#sec") == "https://x.com/a")
    assert(n("https://x.com/a?k=1#sec") == "https://x.com/a?k=1")
  }

  test("trailing slash stripped except root") {
    assert(n("https://x.com/a/") == "https://x.com/a")
    assert(n("https://x.com/") == "https://x.com/")
  }

  test("path-only prefixed with site base (rstrip'd), else left as path") {
    assert(n("/p/1/", base = "https://Example.org/") == "https://example.org/p/1")
    assert(n("/p/1") == "/p/1")
  }

  test("strip-all-params mode") {
    assert(n("https://x.com/a?ref=1&b=2", strip = true) == "https://x.com/a")
  }

  test("whitespace trimmed; null/empty passthrough") {
    assert(n("  https://x.com/a  ") == "https://x.com/a")
    assert(n("") == "")
    assert(n(null) == null)
  }

  test("urlparse params component (;) preserved on last segment") {
    assert(n("https://x.com/a;v=1?utm_a=1") == "https://x.com/a;v=1")
  }

  test("no-scheme host-less strings pass through parse unharmed") {
    assert(n("not a url") == "not a url")
  }

  test("quote_plus/unquote_plus round-trip mirrors Python") {
    assert(UrlOps.quotePlus("a b/c?d=e") == "a+b%2Fc%3Fd%3De")
    assert(UrlOps.unquotePlus("a+b%2Fc") == "a b/c")
    assert(UrlOps.unquotePlus("bad%zz") == "bad%zz") // invalid escape passthrough
  }

  test("looks-url-like predicate shape (string level)") {
    // Column-level predicate is exercised in oracle q10; here pin the spec:
    // startswith http://, https:// or '/' after trim+lower.
    for (ok <- Seq("https://x.com", "HTTP://x.com", "/path", "  /path"))
      assert(UrlOps.normalize(ok, "", false) != null)
  }

  test("idempotence: f(f(x)) == f(x) on representative inputs") {
    val cases = Seq(
      "HTTPS://Shop.Example.COM/Products/Red-Widget/?utm_source=x&ref=1#f",
      "/p/1/", "https://x.com/", "https://x.com/a?k&ref=", "not a url")
    for (c <- cases) {
      val once = n(c)
      assert(n(once) == once, s"not idempotent for $c")
    }
  }

  test("non-BMP characters survive quote/unquote round-trips (byte-level decode)") {
    val emoji = "\ud83d\ude00" // 😀
    assert(UrlOps.unquotePlus(UrlOps.quotePlus(emoji)) == emoji)
    val u = s"https://x.com/a?q=$emoji"
    assert(n(u) == s"https://x.com/a?q=${UrlOps.quotePlus(emoji)}")
  }
}
