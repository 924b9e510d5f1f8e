package graft.sources

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** RFC 9309 robots evaluation ([[RobotsKernels]]): group selection,
  * longest-match precedence, wildcard/anchor patterns, and the sitemap
  * walks — the corners the synthetic gate corpus doesn't reach. */
class RobotsSpec extends AnyFunSuite {
  import RobotsKernels._

  private def eval(txt: String, agent: String, path: String) = {
    val r = evalRobots(UTF8String.fromString(txt),
      UTF8String.fromString(agent), UTF8String.fromString(path))
    (r.getBoolean(0), r.getString(1).toString)
  }

  private val txt =
    """# comment line
      |User-agent: alpha
      |User-agent: beta
      |Disallow: /shared/
      |
      |User-agent: graftbot-news
      |Disallow: /news/
      |
      |User-agent: graftbot
      |Disallow: /a/
      |Allow: /a/b/
      |Disallow: /*.zip$
      |Disallow:
      |
      |User-agent: *
      |Disallow: /
      |Sitemap: https://x.example/s1.xml
      |Sitemap: https://x.example/s2.xml
      |""".stripMargin

  test("group selection: longest agent token wins; * is the fallback") {
    // graftbot-news is the LONGER matching token for this agent
    assert(eval(txt, "GraftBot-News/3.1", "/news/x") == (false, "/news/"))
    // plain graftbot gets its own group — /news/ does not apply
    assert(eval(txt, "graftbot/1.0", "/news/x") == (true, ""))
    // consecutive User-agent lines share one group
    assert(eval(txt, "Alpha/1", "/shared/p") == (false, "/shared/"))
    assert(eval(txt, "BETA crawler", "/shared/p") == (false, "/shared/"))
    // unlisted agent falls to the * group (deny-all here)
    assert(eval(txt, "randombot", "/anything") == (false, "/"))
    // no groups at all → everything allowed
    assert(eval("# empty", "anybot", "/x") == (true, ""))
  }

  test("longest-match precedence; Allow wins length ties; empty Disallow") {
    assert(eval(txt, "graftbot", "/a/x") == (false, "/a/"))
    assert(eval(txt, "graftbot", "/a/b/x") == (true, "/a/b/"))
    // empty Disallow matches nothing — unrelated paths stay allowed
    assert(eval(txt, "graftbot", "/other") == (true, ""))
    // Allow wins an exact length tie
    val tie = "User-agent: *\nDisallow: /d/\nAllow: /d/\n"
    assert(eval(tie, "x", "/d/f") == (true, "/d/"))
  }

  test("wildcards and anchors") {
    assert(eval(txt, "graftbot", "/files/a.zip") == (false, "/*.zip$"))
    // $ anchors: a .zip. path does NOT match
    assert(eval(txt, "graftbot", "/files/a.zip.html") == (true, ""))
    // multiple wildcards
    val w = "User-agent: *\nDisallow: /*/private/*.log$\n"
    assert(eval(w, "x", "/u1/private/a.log") == (false, "/*/private/*.log$"))
    assert(eval(w, "x", "/u1/private/a.log.txt") == (true, ""))
    assert(eval(w, "x", "/u1/public/a.log") == (true, ""))
  }

  test("hostile many-star patterns match in linear time, not exponential") {
    // 9 stars against 300 chars: the recursive walk would explore
    // ~n^9 suffix combinations; the iterative matcher must answer
    // instantly (and correctly) — robots.txt is attacker-supplied
    val hostile = "User-agent: *\nDisallow: /*a*a*a*a*a*a*a*a*a*b$\n"
    val path = "/" + "a" * 300
    val t0 = System.nanoTime()
    assert(eval(hostile, "x", path) == (true, ""))       // no 'b' → no match
    assert(eval(hostile, "x", path + "b")._1 == false)   // matches
    assert((System.nanoTime() - t0) / 1e9 < 2.0, "matcher not linear")
    // star-backtrack correctness: later star must be able to re-expand
    assert(RobotsKernels.ruleMatches("/*ab$", "/aab"))
    assert(RobotsKernels.ruleMatches("/*a*b", "/xxaxxb-and-more"))
    assert(!RobotsKernels.ruleMatches("/*a*b$", "/xxaxx"))
  }

  test("repeated groups for the same token COMBINE (RFC 9309 §2.2.1)") {
    // real robots.txt files commonly repeat 'User-agent: *' blocks —
    // rules in the second block must not be silently ignored
    val rep =
      """User-agent: *
        |Disallow: /one/
        |
        |User-agent: other
        |Disallow: /elsewhere/
        |
        |User-agent: *
        |Disallow: /two/
        |""".stripMargin
    assert(eval(rep, "anybot", "/one/x") == (false, "/one/"))
    assert(eval(rep, "anybot", "/two/x") == (false, "/two/"))
    assert(eval(rep, "anybot", "/elsewhere/x") == (true, ""))
    // same for a NAMED token split across blocks
    val named =
      """User-agent: graftbot
        |Disallow: /a/
        |User-agent: *
        |Disallow: /
        |User-agent: graftbot
        |Disallow: /b/
        |""".stripMargin
    assert(eval(named, "graftbot/1.0", "/a/x") == (false, "/a/"))
    assert(eval(named, "graftbot/1.0", "/b/x") == (false, "/b/"))
    assert(eval(named, "graftbot/1.0", "/c/x") == (true, ""))
  }

  test("octet-wise matching over percent-encoded forms (RFC 9309 §2.2.2)") {
    // pattern spelled percent-encoded, probe path raw — same octets
    val enc = "User-agent: *\nDisallow: /caf%c3%a9/\n"
    assert(eval(enc, "x", "/café/menu")._1 == false)
    assert(eval(enc, "x", "/caf%C3%A9/menu")._1 == false)
    assert(eval(enc, "x", "/cafe/menu")._1 == true)
    // pattern raw, path percent-encoded — the other direction
    val raw = "User-agent: *\nDisallow: /café/\n"
    assert(eval(raw, "x", "/caf%c3%a9/menu")._1 == false)
    // ranking is by OCTET length: the 2-byte é makes the Disallow 10
    // canonical octets ('/caf%C3%A9') vs the 4-octet Allow '/caf' —
    // under UTF-16 char counts they'd be 5 vs 4 and tie-break wrong
    // territory; octets put the Disallow clearly ahead
    val rank = "User-agent: *\nAllow: /caf\nDisallow: /café\n"
    assert(eval(rank, "x", "/café")._1 == false)
    // canonicalOctets: bare % becomes %25, triplets uppercase, ASCII flat
    assert(canonicalOctets("/a%2fb") == "/a%2Fb")
    assert(canonicalOctets("/100%") == "/100%25")
    assert(canonicalOctets("/plain/*$") == "/plain/*$")
    assert(canonicalOctets("/é") == "/%C3%A9")
  }

  test("crawl-delay: captured per group, max across combined, -1 unset") {
    val d =
      """User-agent: graftbot
        |Crawl-delay: 1.5
        |Disallow: /x/
        |
        |User-agent: *
        |Disallow: /y/
        |
        |User-agent: graftbot
        |Crawl-delay: 4
        |""".stripMargin
    val gs = parseGroups(d)
    assert(crawlDelayFor(gs, "graftbot/2.0") == 4000L) // max of 1500, 4000
    assert(crawlDelayFor(gs, "otherbot") == -1L)       // * group sets none
    assert(crawlDelayFor(parseGroups("# none"), "x") == -1L)
    // within one group the LAST occurrence wins; garbage values ignored
    val last = "User-agent: *\nCrawl-delay: 9\nCrawl-delay: nonsense\nCrawl-delay: 2\n"
    assert(crawlDelayFor(parseGroups(last), "x") == 2000L)
    // crawl-delay lines never affect matching
    assert(eval(d, "graftbot", "/x/p") == (false, "/x/"))
  }

  test("sitemap directives and loc extraction") {
    val sm = sitemapsOf(UTF8String.fromString(txt))
    assert(sm.numElements() == 2)
    assert(sm.getUTF8String(0).toString == "https://x.example/s1.xml")
    val xml = """<?xml version="1.0"?><sitemapindex>
      <sitemap><loc>https://x.example/a.xml</loc></sitemap>
      <sitemap><loc> https://x.example/b.xml?x=1&amp;y=2 </loc></sitemap>
      <sitemap><loc>https://x.example/tail""" // malformed tail: fail-soft
    val locs = sitemapLocs(UTF8String.fromString(xml))
    assert(locs.numElements() == 2)
    assert(locs.getUTF8String(1).toString == "https://x.example/b.xml?x=1&y=2")
    assert(sitemapLocs(null).numElements() == 0)
    // nested references decode ONCE: &amp;lt; is the literal text &lt;
    val nested = sitemapLocs(UTF8String.fromString(
      "<urlset><url><loc>https://x.example/?q=a&amp;lt;b</loc></url></urlset>"))
    assert(nested.getUTF8String(0).toString == "https://x.example/?q=a&lt;b")
  }
}
