package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** HTML extraction contract ([[HtmlKernels]]): the q_html_extract /
  * q_warc_extract oracles replay the synth page symbolically, so every
  * rule here (drop-with-contents, entity forms, block segmentation, the
  * density/word-floor boilerplate gate, malformed-input recovery) is a
  * hash dependency of those gates. */
class HtmlExtractSpec extends AnyFunSuite with SparkTestBase {

  private def text(html: String): String =
    HtmlKernels.htmlText(UTF8String.fromString(html)).toString
  private def blocks(html: String) = HtmlKernels.blocks(html)

  test("script/style/noscript contents vanish, incl. fake close tags") {
    val h = """<p>keep me here</p>
      <script>var s = "</p><p>ghost block one two three</p>";</script>
      <style>p > b { color: red }</style>
      <noscript>enable js please now</noscript>
      <p>also keep this</p>"""
    assert(text(h) == "keep me here\nalso keep this")
  }

  test("comments and doctype drop; unterminated comment drops the rest") {
    assert(text("<!DOCTYPE html><p>one two three</p><!-- x --><p>four five six</p>")
      == "one two three\nfour five six")
    assert(text("<p>one two three</p><!-- never closed <p>four five six</p>")
      == "one two three")
  }

  test("entities: named, decimal, hex, nbsp; unknown stays literal") {
    val h = "<p>a &amp; b &lt;c&gt; &#77;&#x21; &quot;q&quot; &apos;s&apos; x&nbsp;y &bogus; z</p>"
    assert(text(h) == "a & b <c> M! \"q\" 's' x y &bogus; z")
  }

  test("surrogate-range numeric references decode to U+FFFD (WHATWG)") {
    // Character.isValidCodePoint(0xD800) is true — appending the raw
    // value would be an unpaired surrogate, ill-formed UTF-16 that
    // UTF8String.fromString encodes as invalid UTF-8 bytes
    assert(text("<p>lead &#xD800; mid &#57343; tail words</p>")
      == "lead � mid � tail words")
    // attribute values go through the same rule
    val as = graft.functions.HtmlKernels.anchors(
      "<a href=\"/x\">t &#xDFFF; u</a>")
    assert(as.head._2 == "t � u")
    // astral references still decode normally (surrogate PAIR output)
    assert(text("<p>ok &#x1F600; emoji here words</p>")
      == "ok 😀 emoji here words")
  }

  test("pageDirectives: meta robots, rel=canonical, decoys, first-wins") {
    import graft.functions.HtmlKernels.pageDirectives
    // basic flags + canonical; case-insensitive everywhere
    assert(pageDirectives(
      "<head><META NAME=\"ROBOTS\" CONTENT=\"NOINDEX, NOFOLLOW\">" +
        "<LINK REL=\"CANONICAL\" HREF=\"https://x.example/c\"></head>")
      == (true, true, "https://x.example/c"))
    // 'none' means both; unquoted attribute values parse
    assert(pageDirectives("<meta name=robots content=none>")
      == (true, true, null))
    // multiple robots metas OR together (most restrictive wins)
    assert(pageDirectives(
      "<meta name=\"robots\" content=\"noindex\">" +
        "<meta name=\"robots\" content=\"nofollow\">")
      == (true, true, null))
    // rel is a token LIST; entity-decoded href; FIRST canonical wins
    assert(pageDirectives(
      "<link rel=\"alternate canonical\" href=\"/a?x=1&amp;y=2\">" +
        "<link rel=\"canonical\" href=\"/b\">")
      == (false, false, "/a?x=1&y=2"))
    // decoys in script strings and comments are NOT directives
    assert(pageDirectives(
      "<script>var s='<link rel=\"canonical\" href=\"/decoy\">';</script>" +
        "<!-- <meta name=\"robots\" content=\"noindex\"> -->" +
        "<p>plain</p>")
      == (false, false, null))
    // a description meta and a stylesheet link are not directives
    assert(pageDirectives(
      "<meta name=\"description\" content=\"noindex nofollow\">" +
        "<link rel=\"stylesheet\" href=\"/s.css\">")
      == (false, false, null))
    // quoted '>' inside attribute values must not end the tag early
    assert(pageDirectives(
      "<meta name=\"robots\" data-x=\"a > b\" content=\"noindex\">")
      == (true, false, null))
    assert(pageDirectives(null) == (false, false, null))
  }

  test("decoded '<' is text, not a tag") {
    assert(text("<p>compare &lt;b&gt;bold&lt;/b&gt; stays</p>")
      == "compare <b>bold</b> stays")
  }

  test("inline tags vanish without splitting; block tags split") {
    assert(text("<p>one <b>two</b> <i>three</i> four</p>")
      == "one two three four")
    assert(text("<div>one two three</div><div>four five six</div>")
      == "one two three\nfour five six")
    assert(text("one two three<br>four five six")
      == "one two three\nfour five six")
  }

  test("case-insensitive tags; attributes may contain '>' in quotes") {
    assert(text("""<P TITLE="a > b">one <B>two</B> three</P>""")
      == "one two three")
    assert(text("<SCRIPT>x = 1; one two three</SCRIPT><p>four five six</p>")
      == "four five six")
  }

  test("literal '<' that is not a tag survives as text") {
    assert(text("<p>3 < 5 and 7 < 9</p>") == "3 < 5 and 7 < 9")
  }

  test("boilerplate: link density over 0.5 drops, word floor drops") {
    val b = blocks("<nav><a href='/'>home</a> <a href='/a'>about</a></nav>")
    assert(b.length == 1 && b.head.linkDensity == 1.0)
    assert(text("<nav><a href='/'>home</a> <a href='/a'>about</a> <a href='/c'>contact</a></nav>") == "")
    // two words, no links → word floor
    assert(text("<h1>short headline</h1>") == "")
    // three words, one short link → kept
    assert(text("<p>see <a href='/x'>x</a> here</p>") == "see x here")
  }

  test("density counts non-whitespace chars only, inside <a> nesting") {
    val b = blocks("<p><a href='/'>linked words here</a> free</p>").head
    // linked: "linkedwordshere" = 15 non-ws, total = 15 + 4
    assert(b.linkNonWs == 15 && b.nonWs == 19)
    assert(text("<p><a href='/'>linked words here</a> free</p>") == "")
  }

  test("whitespace (incl. NBSP, CRLF) normalizes to single spaces") {
    assert(text("<p>one\r\n  two\t\tthree&nbsp;&nbsp;four</p>")
      == "one two three four")
  }

  test("stats bundle counts blocks by outcome") {
    val h = """<h1>two words</h1>
      <nav><a href='/'>a</a><a href='/b'>b</a><a href='/c'>c</a></nav>
      <p>kept one two</p><p>kept three four</p>"""
    val st = HtmlKernels.htmlStats(UTF8String.fromString(h)).toLongArray
    assert(st.toSeq == Seq(4L, 2L, 1L, 1L,
      "kept one two".length.toLong + "kept three four".length))
  }

  test("synth page extracts to the closed-form oracle text") {
    val doc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val html = HtmlKernels.htmlSynth(7L, UTF8String.fromString(doc)).toString
    val expected = "alpha beta gamma delta epsilon zeta eta theta & <tag> M! end\n" +
      "iota kappa & <tag> M! end"
    assert(text(html) == expected)
    val st = HtmlKernels.htmlStats(UTF8String.fromString(html)).toLongArray
    // blocks: title + nav + 2 paragraphs + footer
    assert(st.toSeq == Seq(5L, 2L, 2L, 1L,
      expected.length.toLong - 1)) // minus the joining '\n'
  }

  test("synth handles tiny and empty token lists") {
    assert(text(HtmlKernels.htmlSynth(1L, UTF8String.fromString("solo")).toString)
      == "solo & <tag> M! end")
    assert(text(HtmlKernels.htmlSynth(1L, UTF8String.fromString("  ")).toString)
      == "")
  }

  test("links: hrefs in order; script/comment links excluded; entities decode") {
    val h = """<html><head>
      <script>var a = '<a href="/fake">x</a>';</script>
      </head><body>
      <!-- <a href="/ghost">g</a> -->
      <p><a href="/one">1</a> and <A HREF='/two'>2</A>
      and <a class="x" href=/three>3</a>
      and <a href="/a&amp;b?x=1">amp</a>
      and <a href="/dup" href="/second">first wins</a>
      and <a name="anchor">no href</a>
      and <a href="">empty drops</a></p>
      <style>.x { content: '<a href="/css">c</a>'; }</style>
      </body></html>"""
    val got = HtmlKernels.links(h)
    assert(got == Seq("/one", "/two", "/three", "/a&b?x=1", "/dup"))
    // quoted '>' inside an href does not end the tag
    assert(HtmlKernels.links("""<a href="/q>r" title="t">x</a>""")
      == Seq("/q>r"))
    // null/empty input
    assert(HtmlKernels.links(null).isEmpty && HtmlKernels.links("").isEmpty)
    // unterminated drop-tag fails closed for the rest
    assert(HtmlKernels.links(
      """<a href="/ok">x</a><script><a href="/no">y</a>""") == Seq("/ok"))
  }

  test("synth page links are the closed form the q_link_graph oracle replays") {
    val toks = (1 to 19).map(i => s"tok$i") // chunks: 8, 8, 3 → 3 links
    val h = HtmlKernels.htmlSynth(7L,
      UTF8String.fromString(toks.mkString(" "))).toString
    assert(HtmlKernels.links(h) == Seq("/", "/about", "/contact",
      "/tok3", "/tok11", "/tok19", "/tos", "/privacy"))
    // a 2-token remainder chunk has no link slot
    val h2 = HtmlKernels.htmlSynth(7L,
      UTF8String.fromString((1 to 10).map(i => s"t$i").mkString(" "))).toString
    assert(HtmlKernels.links(h2) == Seq("/", "/about", "/contact",
      "/t3", "/tos", "/privacy"))
  }

  test("anchors: text content, implicit close, nesting, entities, ws") {
    // basic pair + entity decode + whitespace normalization
    assert(HtmlKernels.anchors(
      "<a href=\"/x\">  click &amp;\n go  </a>") == Seq("/x" -> "click & go"))
    // nested inline tags contribute their text
    assert(HtmlKernels.anchors(
      "<a href=\"/b\">read <b>this</b> now</a>") == Seq("/b" -> "read this now"))
    // implicit close at the next <a> (browsers auto-close)
    assert(HtmlKernels.anchors(
      "<a href=\"/1\">one <a href=\"/2\">two</a>") ==
      Seq("/1" -> "one", "/2" -> "two"))
    // unterminated trailing anchor keeps its text
    assert(HtmlKernels.anchors("<a href=\"/t\">tail text") ==
      Seq("/t" -> "tail text"))
    // href-less <a> closes the pending pair and contributes none
    assert(HtmlKernels.anchors(
      "<a href=\"/1\">one</a> <a name=\"x\">label</a>") == Seq("/1" -> "one"))
    // drop-tag subtree inside an anchor contributes no text
    assert(HtmlKernels.anchors(
      "<a href=\"/s\">ok<script>var x='<a href=\"/no\">bad</a>';</script> end</a>")
      == Seq("/s" -> "ok end"))
    // comments inside an anchor contribute no text
    assert(HtmlKernels.anchors(
      "<a href=\"/c\">a<!-- hidden -->b</a>") == Seq("/c" -> "ab"))
    // synth closed form: anchor = the linked token itself
    val h = HtmlKernels.htmlSynth(3L,
      UTF8String.fromString((1 to 10).map(i => s"t$i").mkString(" "))).toString
    assert(HtmlKernels.anchors(h) == Seq("/" -> "home", "/about" -> "about",
      "/contact" -> "contact", "/t3" -> "t3", "/tos" -> "terms",
      "/privacy" -> "privacy"))
  }

  test("column path stays inside whole-stage codegen") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), HtmlExpressions.htmlText(
        HtmlExpressions.htmlSynth(col("doc_id"), col("text"))).as("x"))
    val plan = df.queryExecution.executedPlan.toString
    // the '*(n)' prefix is the simple-string marker for a WholeStageCodegen
    // span — the Project evaluating html_text(html_synth(..)) must carry it
    assert(plan.contains("*(1) Project"), plan)
    assert(df.orderBy(col("doc_id")).limit(1).collect()(0)
      .getString(1).contains("& <tag> M! end"))
  }
}
