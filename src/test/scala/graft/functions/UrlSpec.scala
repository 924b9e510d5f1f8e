package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization contract ([[UrlKernels]]) — the q_url_normalize /
  * q_url_filter oracles emit expected strings directly, so every RFC 3986
  * §6.2 rule here is a hash dependency of those gates. */
class UrlSpec extends AnyFunSuite with SparkTestBase {

  private def n(u: String): String = UrlKernels.normalizeUrl(u)

  test("scheme and host lowercase; path case preserved") {
    assert(n("HTTPS://WWW.Example.COM/Path/File") ==
      "https://www.example.com/Path/File")
  }

  test("default ports drop; explicit non-default ports stay") {
    assert(n("http://a.com:80/x") == "http://a.com/x")
    assert(n("https://a.com:443/x") == "https://a.com/x")
    assert(n("http://a.com:8080/x") == "http://a.com:8080/x")
    assert(n("https://a.com:80/x") == "https://a.com:80/x") // not https default
  }

  test("percent-encoding: unreserved decodes, reserved uppercases, malformed survives") {
    assert(n("http://a.com/%7euser/%41%2fz") == "http://a.com/~user/A%2Fz")
    assert(n("http://a.com/x?q=c%20d&r=%2e") == "http://a.com/x?q=c%20d&r=.")
    assert(n("http://a.com/bad%g1%") == "http://a.com/bad%g1%")
  }

  test("dot segments remove; empty segments and trailing slash preserved") {
    assert(n("http://a.com/a/../b/./c") == "http://a.com/b/c")
    assert(n("http://a.com/a/b/../") == "http://a.com/a/")
    assert(n("http://a.com/a/.") == "http://a.com/a/")
    assert(n("http://a.com/x//y") == "http://a.com/x//y")
    assert(n("http://a.com/../..") == "http://a.com/")
  }

  test("fragment drops; empty path becomes /; query order preserved") {
    assert(n("http://a.com#frag") == "http://a.com/")
    assert(n("http://a.com/p?b=2&a=1#s") == "http://a.com/p?b=2&a=1")
    assert(n("http://a.com?x=1") == "http://a.com/?x=1")
  }

  test("non-URL input passes through unchanged") {
    assert(n("not a url") == "not a url")
    assert(n("mailto:x@y.com") == "mailto:x@y.com")
  }

  test("hostOf strips port and userinfo; null when no authority") {
    assert(UrlKernels.hostOf("https://User@Www.Ex.COM:8443/p") == "www.ex.com")
    assert(UrlKernels.hostOf("http://a.com") == "a.com")
    assert(UrlKernels.hostOf("nope") == null)
  }

  test("registeredDomain: two-level suffixes, plain TLDs, IPs, single labels") {
    assert(UrlKernels.registeredDomain("www.blog.example.co.uk") == "example.co.uk")
    assert(UrlKernels.registeredDomain("a.b.example.com") == "example.com")
    assert(UrlKernels.registeredDomain("example.com") == "example.com")
    assert(UrlKernels.registeredDomain("co.uk") == "co.uk")
    assert(UrlKernels.registeredDomain("192.168.0.1") == "192.168.0.1")
    assert(UrlKernels.registeredDomain("localhost") == "localhost")
  }

  test("resolveUrl: RFC 3986 §5.2 reference resolution forms") {
    val base = "https://www.example.com/dir/page.html?q=1#frag"
    def r(ref: String) = UrlKernels.resolveUrl(base, ref)
    // absolute ref wins outright
    assert(r("http://other.org/x") == "http://other.org/x")
    // protocol-relative adopts the base scheme
    assert(r("//cdn.example.net/a.js") == "https://cdn.example.net/a.js")
    // root-relative replaces the path (dot segments removed)
    assert(r("/a/../b/./c") == "https://www.example.com/b/c")
    // query-only keeps the base path
    assert(r("?page=2") == "https://www.example.com/dir/page.html?page=2")
    // relative merges with the base DIRECTORY
    assert(r("sub/x.html") == "https://www.example.com/dir/sub/x.html")
    assert(r("../up.html") == "https://www.example.com/up.html")
    // empty / fragment-only → base without its fragment
    assert(r("") == "https://www.example.com/dir/page.html?q=1")
    assert(r("#sec") == "https://www.example.com/dir/page.html?q=1")
    // ref fragments drop
    assert(r("/p#s") == "https://www.example.com/p")
    // §5.2.4 operates on the PATH only — dot segments in the query are
    // data, not navigation (review fix: they must not eat path segments)
    assert(r("/p?next=/../top") == "https://www.example.com/p?next=/../top")
    assert(r("page?back=/../x") ==
      "https://www.example.com/dir/page?back=/../x")
    // pathless base roots the merge
    assert(UrlKernels.resolveUrl("https://h.example", "x") ==
      "https://h.example/x")
    // unresolvable: relative ref against a non-hierarchical base
    assert(UrlKernels.resolveUrl("mailto:a@b", "/x") == null)
    assert(UrlKernels.resolveUrl("mailto:a@b", "https://ok.example/") ==
      "https://ok.example/")
  }

  test("column path normalizes and extracts over a scan") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(concat(lit("HTTP://Site-"), col("doc_id") % 97,
        lit(".Example.COM:80/a/../p/"), col("doc_id"), lit("#f")).as("raw"))
      .select(UrlExpressions.urlNormalize(col("raw")).as("u"))
      .select(col("u"), UrlExpressions.registeredDomain(
        UrlExpressions.urlHost(col("u"))).as("d"))
    val r = df.orderBy(col("u")).limit(1).collect()(0)
    assert(r.getString(0).startsWith("http://site-"))
    assert(r.getString(0).contains("/p/"))
    assert(r.getString(1) == "example.com")
  }
}
