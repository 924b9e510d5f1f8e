package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** WARC container contract ([[WarcKernels]]): record walk, HTTP split,
  * multi-member gzip, and the fail-closed boundary — the q_warc_records /
  * q_warc_extract oracles replay the synth symbolically, so every rule
  * here is a hash dependency of those gates. */
class WarcSpec extends AnyFunSuite with SparkTestBase {

  private def synth(id: Long, html: String): Array[Byte] =
    WarcKernels.warcSynth(id, UTF8String.fromString(html))

  test("3 records walk out in order with their types and uris") {
    val recs = WarcKernels.parse(synth(42L, "<p>one two three</p>"))
    assert(recs.map(_.recType) == Seq("request", "response", "metadata"))
    assert(recs.forall(_.uri == "https://site-42.example/page/42"))
    assert(recs.map(_.pos) == Seq(0, 1, 2))
  }

  test("response record: HTTP status, mime, exact body round-trip") {
    val html = "<p>alpha beta gamma</p>"
    val recs = WarcKernels.parse(synth(7L, html))
    val resp = recs.find(_.recType == "response").get
    assert(resp.httpStatus == 200)
    assert(resp.mime == "text/html; charset=utf-8")
    assert(new String(resp.body, "UTF-8") == html)
    assert(WarcKernels.warcBody(synth(7L, html)).toString == html)
  }

  test("request and metadata payloads are exact") {
    val recs = WarcKernels.parse(synth(5L, "x"))
    val req = recs.find(_.recType == "request").get
    assert(new String(req.body, "UTF-8") ==
      "GET /page/5 HTTP/1.1\r\nHost: site-5.example\r\nUser-Agent: graft\r\n\r\n")
    assert(req.httpStatus == -1 && req.mime == null)
    val meta = recs.find(_.recType == "metadata").get
    assert(new String(meta.body, "UTF-8") == "fetchTimeMs: 5\r\n")
  }

  test("fail-closed: truncated gzip, corrupted CRC, garbage bytes") {
    val good = synth(1L, "<p>a b c</p>")
    assert(WarcKernels.parse(java.util.Arrays.copyOf(good, good.length - 5)) == null)
    val flipped = good.clone(); flipped(good.length / 2) = (flipped(good.length / 2) ^ 0x55).toByte
    assert(WarcKernels.parse(flipped) == null)
    assert(WarcKernels.parse("not a warc at all".getBytes) == null)
    assert(WarcKernels.warcBody("junk".getBytes) == null)
    // the expression surface maps null → EMPTY array, never partial
    assert(WarcKernels.warcRecords("junk".getBytes).numElements() == 0)
  }

  test("fail-closed: valid gzip but not WARC, short payload, bad separator") {
    def gz(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close(); bos.toByteArray
    }
    assert(WarcKernels.parse(gz("HTTP/1.1 200 OK\r\n\r\n")) == null)
    // declared length runs past the stream
    assert(WarcKernels.parse(gz(
      "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 9999\r\n\r\nhi")) == null)
    // missing the two-CRLF record separator after the payload
    assert(WarcKernels.parse(gz(
      "WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 2\r\n\r\nhixx")) == null)
  }

  test("a one-record file with exact separator parses") {
    def gz(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close(); bos.toByteArray
    }
    val recs = WarcKernels.parse(gz(
      "WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"))
    assert(recs.length == 1 && recs.head.recType == "metadata" &&
      new String(recs.head.body, "UTF-8") == "hi")
  }

  test("warcPages walks a concatenated multi-archive file (crawler shape)") {
    val cat = synth(1L, "<p>a b c</p>") ++ synth(2L, "<p>d e f</p>") ++
      synth(3L, "<p>g h i</p>")
    val pages = WarcKernels.warcPages(cat)
    assert(pages.numElements() == 3)
    val r0 = pages.getStruct(0, 2)
    assert(r0.getUTF8String(0).toString == "https://site-1.example/page/1")
    assert(r0.getUTF8String(1).toString == "<p>a b c</p>")
    // corrupting any byte of the concatenation fails the WHOLE file closed
    val bad = cat.clone(); bad(cat.length / 3) = (bad(cat.length / 3) ^ 1).toByte
    assert(WarcKernels.warcPages(bad).numElements() == 0)
  }

  test("chunked transfer-encoding: dechunked body equals the plain path") {
    val html = "<p>one two three four five six seven eight nine ten</p>"
    val plain = WarcKernels.parse(synth(9L, html))
      .find(_.recType == "response").get
    val recs = WarcKernels.parse(
      WarcKernels.warcSynthChunked(9L, UTF8String.fromString(html)))
    val resp = recs.find(_.recType == "response").get
    // extensions, uppercase hex, and the trailer header all vanish
    assert(java.util.Arrays.equals(resp.body, plain.body))
    assert(resp.httpStatus == 200)
    // empty body: straight to the 0-chunk terminator
    val empty = WarcKernels.parse(
      WarcKernels.warcSynthChunked(9L, UTF8String.fromString("")))
    assert(empty.find(_.recType == "response").get.body.isEmpty)
  }

  test("fail-closed: a malformed chunk ladder fails the WHOLE file") {
    val good = WarcKernels.warcSynthChunked(3L,
      UTF8String.fromString("<p>alpha beta gamma delta</p>"))
    val recs = WarcKernels.parse(good)
    assert(recs != null && recs.nonEmpty) // the good ladder parses
    // dechunk-level pins: garbage size, short chunk, trailing bytes
    def b(s: String) = s.getBytes("UTF-8")
    assert(WarcKernels.dechunk(b("zz\r\nhi\r\n0\r\n\r\n"), 0) == null)
    assert(WarcKernels.dechunk(b("5\r\nhi\r\n0\r\n\r\n"), 0) == null)
    assert(WarcKernels.dechunk(b("2\r\nhi\r\n0\r\n\r\nextra"), 0) == null)
    // a trailer line without ':' is not a header — fail closed
    assert(WarcKernels.dechunk(b("2\r\nhi\r\n0\r\nnotaheader\r\n\r\n"), 0) == null)
    // the happy ladder with extension + uppercase hex + trailer
    val ok = WarcKernels.dechunk(
      b("2;x=1\r\nhi\r\n2\r\nya\r\n0\r\nX-L: 4\r\n\r\n"), 0)
    assert(ok != null && new String(ok, "UTF-8") == "hiya")
  }

  test("charset: header label, meta sniff, and the no-label fallback") {
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    // header-declared ISO-8859-1 folds to cp1252 (0x93 is a curly quote)
    val even = WarcKernels.parse(
      WarcKernels.warcSynthCharset(2L, UTF8String.fromString("a b c")))
    val evenText = WarcKernels.warcBody(
      WarcKernels.warcSynthCharset(2L, UTF8String.fromString("a b c")))
    assert(even.head.mime == "text/html; charset=ISO-8859-1")
    assert(evenText.toString.contains("café “q” naïve"))
    // odd id: no HTTP charset — the <meta charset> prescan must fire
    val odd = WarcKernels.parse(
      WarcKernels.warcSynthCharset(3L, UTF8String.fromString("a b c")))
    assert(odd.head.mime == "text/html")
    assert(WarcKernels.warcBody(
        WarcKernels.warcSynthCharset(3L, UTF8String.fromString("a b c")))
      .toString.contains("café “q” naïve"))
    // no label anywhere: valid UTF-8 stays UTF-8…
    assert(WarcKernels.bodyText("naïve UTF-8 é".getBytes("UTF-8"), null)
      .toString == "naïve UTF-8 é")
    // …and invalid UTF-8 falls back to cp1252, never mojibake/failure
    assert(WarcKernels.bodyText("café “q”".getBytes(cp1252), null)
      .toString == "café “q”")
    // label parsing corners
    assert(WarcKernels.charsetOf("text/html; charset=\"UTF-8\"") == "utf-8")
    assert(WarcKernels.charsetOf("text/html") == null)
    assert(WarcKernels.sniffMetaCharset(
      ("<html><head><meta http-equiv=\"Content-Type\" " +
        "content=\"text/html; charset=windows-1252\"></head>")
        .getBytes("UTF-8")) == "windows-1252")
  }

  test("UTF-16 labels: HTTP-declared decodes, meta-declared folds to UTF-8") {
    import java.nio.charset.StandardCharsets._
    // HTTP-declared, NO BOM: WHATWG's label table — utf-16/utf-16le → LE,
    // utf-16be → BE
    assert(WarcKernels.bodyText("héllo €".getBytes(UTF_16LE),
      "text/html; charset=utf-16").toString == "héllo €")
    assert(WarcKernels.bodyText("héllo €".getBytes(UTF_16LE),
      "text/html; charset=UTF-16LE").toString == "héllo €")
    assert(WarcKernels.bodyText("héllo €".getBytes(UTF_16BE),
      "text/html; charset=utf-16be").toString == "héllo €")
    // META-declared utf-16 is a lie by construction (an ASCII prescan
    // read it) — WHATWG folds it to UTF-8
    val metaLie = "<meta charset=\"utf-16\"><p>naïve é</p>".getBytes("UTF-8")
    assert(WarcKernels.bodyText(metaLie, null).toString
      == "<meta charset=\"utf-16\"><p>naïve é</p>")
  }

  test("BOM wins over any declared label and never reaches the text") {
    def utf16le(s: String): Array[Byte] =
      Array[Byte](0xff.toByte, 0xfe.toByte) ++
        s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    def utf16be(s: String): Array[Byte] =
      Array[Byte](0xfe.toByte, 0xff.toByte) ++
        s.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
    // a UTF-16 BOM overrides a (wrong) latin-1 label — WHATWG precedence
    assert(WarcKernels.bodyText(utf16le("héllo wörld"),
      "text/html; charset=ISO-8859-1").toString == "héllo wörld")
    assert(WarcKernels.bodyText(utf16be("héllo"), null).toString == "héllo")
    // UTF-8 BOM: stripped, rest decodes as UTF-8
    val bom8 = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      "plain é".getBytes("UTF-8")
    assert(WarcKernels.bodyText(bom8, null).toString == "plain é")
    // FF/FE bytes mid-body are NOT a BOM
    assert(WarcKernels.bodyText("aÿþ".getBytes("UTF-8"), null)
      .toString == "aÿþ")
  }

  test("WET: conversion records round-trip multi-line text exactly") {
    val wet = WarcKernels.warcSynthWet(5L, UTF8String.fromString(
      (1 to 20).map(i => s"tok$i").mkString(" ")))
    val recs = WarcKernels.parse(wet)
    assert(recs.map(_.recType) == Seq("warcinfo", "conversion"))
    val texts = WarcKernels.wetTexts(wet)
    assert(texts.numElements() == 1, "warcinfo must not contribute a row")
    val row = texts.getStruct(0, 2)
    assert(row.getUTF8String(0).toString == "https://site-5.example/page/5")
    assert(row.getUTF8String(1).toString ==
      (1 to 8).map(i => s"tok$i").mkString(" ") + "\n" +
      (9 to 16).map(i => s"tok$i").mkString(" ") + "\n" +
      (17 to 20).map(i => s"tok$i").mkString(" "))
    // corruption fails the whole file closed, like every other walk
    val bad = wet.clone(); bad(wet.length / 2) = (bad(wet.length / 2) ^ 1).toByte
    assert(WarcKernels.wetTexts(bad).numElements() == 0)
  }

  test("Warc.records + Warc.pages read a real .warc.gz from disk") {
    val dir = Files.createTempDirectory("graft-warc").toString
    Files.write(Paths.get(s"$dir/f0.warc.gz"),
      synth(3L, "<p>hello crawl world</p><nav><a href='/'>x</a> <a href='/y'>y</a> <a href='/z'>z</a></nav>"))
    Files.write(Paths.get(s"$dir/f1.warc.gz"), synth(4L, "<p>second page text</p>"))
    Files.write(Paths.get(s"$dir/skip.txt"), "not warc".getBytes)

    val recs = Warc.records(spark, dir)
    assert(recs.count() == 6)
    assert(recs.filter(col("rec_type") === "response")
      .filter(col("http_status") === 200).count() == 2)

    val pages = Warc.pages(spark, dir).orderBy(col("uri")).collect()
    assert(pages.length == 2)
    assert(pages(0).getAs[String]("uri") == "https://site-3.example/page/3")
    assert(pages(0).getAs[String]("text") == "hello crawl world")
    assert(pages(1).getAs[String]("text") == "second page text")
  }
}
