package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** WARC (ISO 28500) container walk — how a web corpus actually arrives.
  *
  * Common Crawl ships ~64k `.warc.gz` files per crawl, each a
  * concatenation of per-record gzip members; a record is a `WARC/1.0`
  * version line, CRLF-separated named headers, a blank line, exactly
  * `Content-Length` payload bytes, and a two-CRLF record separator. A
  * `response` record's payload is a full HTTP response (status line,
  * headers, blank line, body — usually HTML). This kernel is the pure-JVM
  * walk from file bytes to records, built like the media codecs: strict
  * structural validation, fail-closed on any violation (truncated gzip,
  * missing version line, short payload → the whole file parses to zero
  * records rather than to silently-wrong partial data).
  *
  * Scale shape: gzip is not splittable, so the FILE is the unit of
  * parallelism — which is exactly how Common Crawl is laid out (the 64k
  * files of a crawl give a 1000-executor cluster 64 waves of work without
  * any splitting). The walk itself is single-pass and O(file bytes);
  * [[Warc.records]] plans it as a codegen'd scan-side column over
  * `binaryFile` rows.
  *
  * [[warcSynth]] is the gate-side twin: a 3-record (request / response /
  * metadata) `.warc.gz` whose response body is a caller-supplied HTML
  * page, so the driver gate can prove the full front door —
  * gzip member decode → record walk → HTTP split → HTML extraction —
  * equals the symbolic oracle end to end.
  */
object WarcKernels {

  private val Crlf = "\r\n"

  /** One parsed record: (pos, rec_type, uri, http_status, mime).
    * `http_status`/`mime` come from the embedded HTTP response for
    * `response` records and are -1/null otherwise. */
  final case class Rec(pos: Int, recType: String, uri: String,
                       httpStatus: Int, mime: String, body: Array[Byte])

  // ------------------------------------------------------------- synth

  private def gzMember(payload: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(payload.length / 2 + 64)
    val gz = new GZIPOutputStream(bos)
    gz.write(payload); gz.close()
    bos.toByteArray
  }

  private def record(recType: String, id: Long, uri: String,
                     contentType: String, payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(256)
    sb.append("WARC/1.0").append(Crlf)
    sb.append("WARC-Type: ").append(recType).append(Crlf)
    sb.append("WARC-Record-ID: <urn:uuid:")
      .append(f"00000000-0000-4000-8000-$id%012x").append('-').append(recType.charAt(0))
      .append('>').append(Crlf)
    sb.append("WARC-Date: 2026-01-01T00:00:00Z").append(Crlf)
    sb.append("WARC-Target-URI: ").append(uri).append(Crlf)
    sb.append("Content-Type: ").append(contentType).append(Crlf)
    sb.append("Content-Length: ").append(payload.length).append(Crlf)
    sb.append(Crlf)
    val head = sb.toString.getBytes(StandardCharsets.UTF_8)
    val tail = (Crlf + Crlf).getBytes(StandardCharsets.UTF_8)
    val out = new Array[Byte](head.length + payload.length + tail.length)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    System.arraycopy(tail, 0, out, head.length + payload.length, tail.length)
    out
  }

  /** (id, html) → 3-record `.warc.gz` bytes: a `request` (raw HTTP GET),
    * the `response` whose HTTP body is `html`, and a `metadata` record
    * (warc-fields). Each record is its own gzip member, Common
    * Crawl-style. */
  def warcSynth(id: Long, html: UTF8String): Array[Byte] = {
    val host = s"site-${java.lang.Long.remainderUnsigned(id, 97)}.example"
    val uri = s"https://$host/page/$id"
    val req = (s"GET /page/$id HTTP/1.1" + Crlf + s"Host: $host" + Crlf +
      "User-Agent: graft" + Crlf + Crlf).getBytes(StandardCharsets.UTF_8)
    val body =
      if (html == null) Array.emptyByteArray else html.getBytes
    val resp = {
      val head = ("HTTP/1.1 200 OK" + Crlf +
        "Content-Type: text/html; charset=utf-8" + Crlf +
        s"Content-Length: ${body.length}" + Crlf + Crlf)
        .getBytes(StandardCharsets.UTF_8)
      val out = new Array[Byte](head.length + body.length)
      System.arraycopy(head, 0, out, 0, head.length)
      System.arraycopy(body, 0, out, head.length, body.length)
      out
    }
    val meta = (s"fetchTimeMs: ${java.lang.Long.remainderUnsigned(id, 1000)}" +
      Crlf).getBytes(StandardCharsets.UTF_8)
    val bos = new ByteArrayOutputStream(resp.length / 2 + 512)
    bos.write(gzMember(record("request", id, uri,
      "application/http; msgtype=request", req)))
    bos.write(gzMember(record("response", id, uri,
      "application/http; msgtype=response", resp)))
    bos.write(gzMember(record("metadata", id, uri,
      "application/warc-fields", meta)))
    bos.toByteArray
  }

  /** Chunk-frame `body` per RFC 9112 §7.1 in a deterministic adversarial
    * spelling: 46-byte chunks so the hex size carries a letter ("2e"),
    * the first chunk with an extension (`;pin=1`), the second with
    * UPPERCASE hex ("2E"), and a trailer header after the 0-chunk — the
    * three spots a lazy dechunker gets wrong. */
  private def chunkFrame(body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(body.length + body.length / 16 + 64)
    def ascii(s: String): Unit =
      out.write(s.getBytes(StandardCharsets.US_ASCII), 0,
        s.length) // size lines are pure ASCII by construction
    var p = 0
    var i = 0
    while (p < body.length) {
      val sz = math.min(46, body.length - p)
      val hex = java.lang.Integer.toHexString(sz)
      val line =
        if (i == 0) hex + ";pin=1"
        else if (i == 1) hex.toUpperCase(java.util.Locale.ROOT)
        else hex
      ascii(line + Crlf)
      out.write(body, p, sz)
      ascii(Crlf)
      p += sz; i += 1
    }
    ascii("0" + Crlf + s"X-Body-Len: ${body.length}" + Crlf + Crlf)
    out.toByteArray
  }

  /** (id, html) → 2-record `.warc.gz` (request + response) whose
    * response body arrives `Transfer-Encoding: chunked` — the framing
    * real Common Crawl response records frequently carry. Dechunking is
    * transparent, so the extracted text must equal the plain
    * [[warcSynth]] path's byte for byte. */
  def warcSynthChunked(id: Long, html: UTF8String): Array[Byte] = {
    val host = s"site-${java.lang.Long.remainderUnsigned(id, 97)}.example"
    val uri = s"https://$host/page/$id"
    val req = (s"GET /page/$id HTTP/1.1" + Crlf + s"Host: $host" + Crlf +
      "User-Agent: graft" + Crlf + Crlf).getBytes(StandardCharsets.UTF_8)
    val body = if (html == null) Array.emptyByteArray else html.getBytes
    val framed = chunkFrame(body)
    val resp = {
      val head = ("HTTP/1.1 200 OK" + Crlf +
        "Content-Type: text/html; charset=utf-8" + Crlf +
        "Transfer-Encoding: chunked" + Crlf + Crlf)
        .getBytes(StandardCharsets.UTF_8)
      val out = new Array[Byte](head.length + framed.length)
      System.arraycopy(head, 0, out, 0, head.length)
      System.arraycopy(framed, 0, out, head.length, framed.length)
      out
    }
    val bos = new ByteArrayOutputStream(resp.length / 2 + 512)
    bos.write(gzMember(record("request", id, uri,
      "application/http; msgtype=request", req)))
    bos.write(gzMember(record("response", id, uri,
      "application/http; msgtype=response", resp)))
    bos.toByteArray
  }

  /** (id, text) → 1-response `.warc.gz` whose HTML page is encoded
    * windows-1252 with planted non-ASCII bytes (0xE9 'é', 0x93/0x94
    * curly quotes — cp1252-only — and 0xEF 'ï'), exercising BOTH
    * declaration paths: even ids declare `charset=ISO-8859-1` in the
    * HTTP Content-Type (which must decode as cp1252, the WHATWG label
    * folding); odd ids declare nothing in HTTP and carry
    * `<meta charset="windows-1252">` for the prescan sniff. The page is
    * closed-form: paragraphs of 8 tokens, each suffixed with
    * ` café “q” naïve` — so the oracle replays the transcoding exactly
    * and a silent mojibake (UTF-8 misread of the 0x93 byte) can never
    * pass. */
  def warcSynthCharset(id: Long, text: UTF8String): Array[Byte] = {
    val host = s"site-${java.lang.Long.remainderUnsigned(id, 97)}.example"
    val uri = s"https://$host/page/$id"
    val toks: Array[String] =
      if (text == null) Array.empty
      else text.toString.split("[ \t\n\f\r]+").filter(_.nonEmpty)
    val even = java.lang.Long.remainderUnsigned(id, 2) == 0
    val sb = new java.lang.StringBuilder(256)
    sb.append("<html><head>")
    if (!even) sb.append("<meta charset=\"windows-1252\">")
    sb.append("<title>D ").append(id).append("</title></head><body>\n")
    toks.grouped(8).foreach { chunk =>
      sb.append("<p>").append(chunk.mkString(" "))
        .append(" café “q” naïve</p>\n")
    }
    sb.append("</body></html>\n")
    val body = sb.toString.getBytes(Cp1252)
    val contentType =
      if (even) "text/html; charset=ISO-8859-1" else "text/html"
    val resp = {
      val head = ("HTTP/1.1 200 OK" + Crlf +
        s"Content-Type: $contentType" + Crlf +
        s"Content-Length: ${body.length}" + Crlf + Crlf)
        .getBytes(StandardCharsets.UTF_8)
      val out = new Array[Byte](head.length + body.length)
      System.arraycopy(head, 0, out, 0, head.length)
      System.arraycopy(body, 0, out, head.length, body.length)
      out
    }
    gzMember(record("response", id, uri,
      "application/http; msgtype=response", resp))
  }

  /** (id, text) → WET-shaped `.warc.gz` bytes — the EXTRACTED-text
    * sibling of the raw crawl archive (Common Crawl publishes one WET
    * file per WARC; most LLM pipelines consume WET, not WARC): a
    * `warcinfo` member followed by a `conversion` member whose payload
    * is the page's plain text. The text is re-lined into 8-token lines
    * (real WET text is multi-line), so Content-Length framing over
    * embedded newlines round-trips under oracle. */
  def warcSynthWet(id: Long, text: UTF8String): Array[Byte] = {
    val host = s"site-${java.lang.Long.remainderUnsigned(id, 97)}.example"
    val uri = s"https://$host/page/$id"
    val toks: Array[String] =
      if (text == null) Array.empty
      else text.toString.split("[ \t\n\f\r]+").filter(_.nonEmpty)
    val body = toks.grouped(8).map(_.mkString(" ")).mkString("\n")
      .getBytes(StandardCharsets.UTF_8)
    val info = ("software: graft-wet-synth" + Crlf +
      "format: WARC File Format 1.0" + Crlf).getBytes(StandardCharsets.UTF_8)
    val bos = new ByteArrayOutputStream(body.length / 2 + 512)
    bos.write(gzMember(record("warcinfo", id, uri,
      "application/warc-fields", info)))
    bos.write(gzMember(record("conversion", id, uri, "text/plain", body)))
    bos.toByteArray
  }

  /** WET file bytes → array<struct<uri, text>> of every `conversion`
    * record — the extracted-text walk (empty on invalid files,
    * fail-closed like [[warcPages]]). Conversion payloads have no HTTP
    * envelope; the bytes decode through the same BOM/UTF-8/cp1252
    * discipline as response bodies. */
  def wetTexts(bytes: Array[Byte]): ArrayData = {
    val recs = parse(bytes)
    if (recs == null) return new GenericArrayData(Array.empty[Any])
    new GenericArrayData(recs
      .filter(_.recType == "conversion")
      .map { r =>
        new GenericInternalRow(Array[Any](
          if (r.uri == null) null else UTF8String.fromString(r.uri),
          bodyText(r.body, null))): InternalRow
      }.toArray[Any])
  }

  // ------------------------------------------------------------- parse

  /** Manual multi-member gunzip. NOT `GZIPInputStream`: that class
    * treats anything after a member that does not look like another
    * gzip header as ignorable trailing garbage and STOPS SILENTLY — a
    * single flipped byte in a mid-file member header would truncate a
    * crawl archive to a valid-looking prefix, which is exactly the
    * partial decode the fail-closed contract forbids. Here every byte
    * of the file must belong to a well-formed member: header flags
    * (FEXTRA/FNAME/FCOMMENT/FHCRC) walked, raw-deflate inflated, CRC32
    * and ISIZE verified per member, and the next member must start
    * immediately after the trailer. Any violation throws (the caller
    * maps it to the fail vector). */
  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length * 3 + 64)
    var p = 0
    def le32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    while (p < bytes.length) {
      require(p + 10 <= bytes.length, "truncated gzip header")
      require((bytes(p) & 0xff) == 0x1f && (bytes(p + 1) & 0xff) == 0x8b &&
        bytes(p + 2) == 8, "bad gzip member header")
      val flg = bytes(p + 3) & 0xff
      var q = p + 10
      if ((flg & 4) != 0) { // FEXTRA
        require(q + 2 <= bytes.length, "truncated FEXTRA")
        q += 2 + ((bytes(q) & 0xff) | ((bytes(q + 1) & 0xff) << 8))
      }
      if ((flg & 8) != 0) { // FNAME, zero-terminated
        while (q < bytes.length && bytes(q) != 0) q += 1
        q += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT
        while (q < bytes.length && bytes(q) != 0) q += 1
        q += 1
      }
      if ((flg & 2) != 0) q += 2 // FHCRC
      require(q < bytes.length, "truncated member")
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(bytes, q, bytes.length - q)
        val buf = new Array[Byte](65536)
        val crc = new java.util.zip.CRC32
        var msize = 0L
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0 && inf.needsInput())
            throw new java.io.EOFException("truncated deflate stream")
          crc.update(buf, 0, n); out.write(buf, 0, n); msize += n
        }
        val dataEnd = q + inf.getBytesRead.toInt
        require(dataEnd + 8 <= bytes.length, "truncated gzip trailer")
        require(le32(dataEnd) == crc.getValue, "gzip CRC mismatch")
        require(le32(dataEnd + 4) == (msize & 0xffffffffL),
          "gzip ISIZE mismatch")
        p = dataEnd + 8
      } finally inf.end()
    }
    out.toByteArray
  }

  /** RFC 9112 §7.1 chunked transfer decoding, fail-closed: hex size line
    * (chunk extensions after ';' allowed and ignored, case-insensitive
    * hex), exactly `size` data bytes, CRLF; the 0-size terminator may be
    * followed by trailer header lines (each must carry a ':'), ended by
    * an empty line; NOTHING may follow — trailing garbage, a short
    * chunk, or a malformed size line returns null (the caller fails the
    * whole file, mirroring the gunzip contract). */
  private[sources] def dechunk(b: Array[Byte], from: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(math.max(16, b.length - from))
    var p = from
    def crlfAt(q: Int): Boolean =
      q + 1 < b.length && b(q) == '\r' && b(q + 1) == '\n'
    def lineEnd(q: Int): Int = { // index of the CR of the next CRLF
      var i = q
      while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
      if (i + 1 < b.length) i else -1
    }
    while (true) {
      val le = lineEnd(p)
      if (le < 0) return null
      // size field: hex digits up to ';' (extension) or line end
      var q = p
      var size = 0L
      var digits = 0
      var ok = true
      while (ok && q < le && b(q) != ';') {
        val d = Character.digit(b(q).toChar, 16)
        if (d < 0) ok = false
        else { size = size * 16 + d; digits += 1; q += 1 }
        if (digits > 15) ok = false // 2^60 bytes: structurally absurd
      }
      if (!ok || digits == 0) return null
      p = le + 2
      if (size == 0L) {
        // trailer section: header lines until the empty line
        var done = false
        while (!done) {
          if (crlfAt(p)) { p += 2; done = true }
          else {
            val te = lineEnd(p)
            if (te < 0) return null
            // a trailer line must look like a header (fail-closed)
            var hasColon = false
            var i = p
            while (i < te && !hasColon) { if (b(i) == ':') hasColon = true; i += 1 }
            if (!hasColon) return null
            p = te + 2
          }
        }
        if (p != b.length) return null // trailing garbage after terminator
        return out.toByteArray
      }
      if (size > (b.length - p).toLong) return null
      out.write(b, p, size.toInt)
      p += size.toInt
      if (!crlfAt(p)) return null
      p += 2
    }
    null // unreachable
  }

  // --------------------------------------------------- charset handling

  /** The `charset=` parameter of a Content-Type value (null when
    * absent). Quoted and bare forms, case-insensitive key. */
  private[sources] def charsetOf(contentType: String): String = {
    if (contentType == null) return null
    val lower = contentType.toLowerCase(java.util.Locale.ROOT)
    val at = lower.indexOf("charset")
    if (at < 0) return null
    var i = at + 7
    while (i < lower.length && (lower.charAt(i) == ' ' ||
      lower.charAt(i) == '\t')) i += 1
    if (i >= lower.length || lower.charAt(i) != '=') return null
    i += 1
    while (i < lower.length && (lower.charAt(i) == ' ' ||
      lower.charAt(i) == '\t' || lower.charAt(i) == '"' ||
      lower.charAt(i) == '\'')) i += 1
    val start = i
    while (i < lower.length && lower.charAt(i) != ';' &&
      lower.charAt(i) != ' ' && lower.charAt(i) != '"' &&
      lower.charAt(i) != '\'' && lower.charAt(i) != '\t') i += 1
    if (i == start) null else lower.substring(start, i)
  }

  /** HTML5-prescan-style `<meta charset>` sniff over the first 1024
    * body bytes (ASCII-compatible byte walk): handles both
    * `<meta charset="x">` and the `http-equiv` + `content="...;
    * charset=x"` form — because both reduce to finding `charset` `=`
    * `label` inside the prefix, which is exactly what the WHATWG
    * prescan's normative examples require. */
  private[sources] def sniffMetaCharset(body: Array[Byte]): String = {
    val lim = math.min(body.length, 1024)
    val sb = new java.lang.StringBuilder(lim)
    var i = 0
    while (i < lim) {
      val c = (body(i) & 0xff).toChar
      sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      i += 1
    }
    val head = sb.toString
    var from = 0
    while (true) {
      val m = head.indexOf("<meta", from)
      if (m < 0) return null
      val gt = head.indexOf('>', m)
      val end = if (gt < 0) head.length else gt
      val cs = charsetOf(head.substring(m, end))
      if (cs != null) return cs
      from = m + 5
    }
    null // unreachable
  }

  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")

  /** Strict UTF-8 validity scan (RFC 3629: no overlongs, no surrogates,
    * ≤ U+10FFFF) — the cheap gate that keeps valid UTF-8 on the
    * zero-copy fast path while mislabeled legacy bytes fall to cp1252. */
  private[sources] def isValidUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false // continuation byte or overlong lead
      else if (c < 0xe0) { // 2-byte
        if (i + 1 >= n || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c < 0xf0) { // 3-byte
        if (i + 2 >= n || (b(i + 1) & 0xc0) != 0x80 ||
          (b(i + 2) & 0xc0) != 0x80) return false
        val cp = ((c & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f)
        if (cp < 0x800 || (cp >= 0xd800 && cp <= 0xdfff)) return false
        i += 3
      } else if (c < 0xf5) { // 4-byte
        if (i + 3 >= n || (b(i + 1) & 0xc0) != 0x80 ||
          (b(i + 2) & 0xc0) != 0x80 || (b(i + 3) & 0xc0) != 0x80) return false
        val cp = ((c & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
          ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f)
        if (cp < 0x10000 || cp > 0x10ffff) return false
        i += 4
      } else return false
    }
    true
  }

  /** A response record's body as TEXT, charset-aware. Precedence is
    * WHATWG's: a byte-order mark WINS over everything (a server that
    * labels Latin-1 but serves a UTF-16 BOM is serving UTF-16 — every
    * browser agrees); then the HTTP Content-Type's `charset=`; then the
    * `<meta charset>` prescan over the first 1024 bytes; absent all,
    * valid UTF-8 decodes as UTF-8 (zero-copy) and anything else falls
    * back to windows-1252 (browsers treat the latin-1 / ascii label
    * family AS cp1252, so 0x93 is a curly quote, never a C1 control).
    * The BOM itself never reaches the text. Unrecognized labels fall to
    * the sniff-free validate-then-fallback path rather than failing the
    * record: a page with an exotic label is degraded data, not
    * structural corruption. */
  private[sources] def bodyText(body: Array[Byte], mime: String): UTF8String = {
    // BOM first (WHATWG precedence over any declared label)
    if (body.length >= 2) {
      val b0 = body(0) & 0xff; val b1 = body(1) & 0xff
      if (b0 == 0xff && b1 == 0xfe)
        return UTF8String.fromString(new String(body, 2, body.length - 2,
          StandardCharsets.UTF_16LE))
      if (b0 == 0xfe && b1 == 0xff)
        return UTF8String.fromString(new String(body, 2, body.length - 2,
          StandardCharsets.UTF_16BE))
      if (body.length >= 3 && b0 == 0xef && b1 == 0xbb &&
          (body(2) & 0xff) == 0xbf)
        return UTF8String.fromBytes(body, 3, body.length - 3)
    }
    val fromHttp = charsetOf(mime)
    val declared = fromHttp match {
      case null =>
        sniffMetaCharset(body) match {
          // WHATWG prescan: a META-declared UTF-16 label becomes UTF-8 —
          // an ASCII byte-walk prescan could never have READ the meta tag
          // of a document actually encoded in UTF-16
          case "utf-16" | "utf-16le" | "utf-16be" | "unicode" => "utf-8"
          case cs => cs
        }
      case cs => cs
    }
    declared match {
      case "utf-8" | "utf8" =>
        UTF8String.fromBytes(body)
      // HTTP-declared UTF-16 family, no BOM (the BOM path returned above).
      // WHATWG's label table: "utf-16"/"utf-16le"/"unicode" → UTF-16LE,
      // "utf-16be" → UTF-16BE.
      case "utf-16" | "utf-16le" | "unicode" =>
        UTF8String.fromString(new String(body, StandardCharsets.UTF_16LE))
      case "utf-16be" =>
        UTF8String.fromString(new String(body, StandardCharsets.UTF_16BE))
      case "iso-8859-1" | "latin1" | "latin-1" | "iso8859-1" | "l1" |
           "us-ascii" | "ascii" | "windows-1252" | "cp1252" | "x-cp1252" =>
        UTF8String.fromString(new String(body, Cp1252))
      case _ => // none, or a label this table doesn't know
        if (isValidUtf8(body)) UTF8String.fromBytes(body)
        else UTF8String.fromString(new String(body, Cp1252))
    }
  }

  private[sources] def crlfCrlfAt(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }
  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int =
    crlfCrlfAt(b, from)

  /** HTTP response split of a `response` record's payload: (status,
    * mime, body) with the body dechunked when the embedded response
    * says `Transfer-Encoding: chunked`. Non-response records and
    * payloads that don't start with an HTTP status line pass through
    * as (-1, null, payload). THROWS on a malformed chunk ladder —
    * [[parse]] maps that to the file-level fail vector; the streaming
    * walk ([[WarcStream]]) lets it fail the task loudly. */
  private[sources] def httpSplit(recType: String,
      payload: Array[Byte]): (Int, String, Array[Byte]) = {
    if (recType != "response") return (-1, null, payload)
    val he = crlfCrlfAt(payload, 0)
    if (he < 0) return (-1, null, payload)
    val hh = new String(payload, 0, he, StandardCharsets.UTF_8)
    val hl = hh.split("\r\n", -1)
    if (!hl(0).startsWith("HTTP/1.") || hl(0).length < 12)
      return (-1, null, payload)
    val status = try hl(0).substring(9, 12).trim.toInt
                 catch { case _: NumberFormatException => -1 }
    var mime: String = null
    var chunked = false
    hl.iterator.drop(1).foreach { l =>
      val c = l.indexOf(':')
      if (c > 0) {
        val hk = l.substring(0, c).trim
        if (hk.equalsIgnoreCase("content-type"))
          mime = l.substring(c + 1).trim
        else if (hk.equalsIgnoreCase("transfer-encoding") &&
            l.substring(c + 1).trim
              .toLowerCase(java.util.Locale.ROOT).contains("chunked"))
          chunked = true
      }
    }
    val body =
      if (chunked) {
        // real Common Crawl response records frequently carry chunked
        // bodies; a malformed ladder must never leak framing bytes in
        val de = dechunk(payload, he + 4)
        require(de != null, "malformed chunk ladder")
        de
      } else java.util.Arrays.copyOfRange(payload, he + 4, payload.length)
    (status, mime, body)
  }

  /** Strict record walk over the decompressed stream. Returns null (the
    * fail-closed vector) on ANY structural violation. */
  def parse(bytes: Array[Byte]): IndexedSeq[Rec] = {
    val plain =
      try gunzipAll(bytes)
      catch { case _: Exception => return null }
    val out = IndexedSeq.newBuilder[Rec]
    var i = 0
    var pos = 0
    while (i < plain.length) {
      val headEnd = indexOfCrlfCrlf(plain, i)
      if (headEnd < 0) return null
      val head = new String(plain, i, headEnd - i, StandardCharsets.UTF_8)
      val lines = head.split("\r\n", -1)
      if (lines.isEmpty || !lines(0).startsWith("WARC/1.")) return null
      var recType: String = null; var uri: String = null; var len = -1L
      lines.iterator.drop(1).foreach { l =>
        val c = l.indexOf(':')
        if (c > 0) {
          val k = l.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
          val v = l.substring(c + 1).trim
          k match {
            case "warc-type"       => recType = v
            case "warc-target-uri" => uri = v
            case "content-length"  =>
              len = try java.lang.Long.parseLong(v)
                    catch { case _: NumberFormatException => -1L }
            case _ =>
          }
        }
      }
      if (recType == null || len < 0) return null
      val payloadStart = headEnd + 4
      if (payloadStart + len + 4 > plain.length) return null // truncated
      val payload = java.util.Arrays.copyOfRange(
        plain, payloadStart, payloadStart + len.toInt)
      val sepAt = payloadStart + len.toInt
      if (plain(sepAt) != '\r' || plain(sepAt + 1) != '\n' ||
        plain(sepAt + 2) != '\r' || plain(sepAt + 3) != '\n') return null
      // HTTP split (incl. chunked decode): a malformed chunk ladder
      // fails the WHOLE file, same contract as a bad gzip member
      val (status, mime, body) =
        try httpSplit(recType, payload)
        catch { case _: IllegalArgumentException => return null }
      out += Rec(pos, recType, uri, status, mime, body)
      pos += 1
      i = sepAt + 4
    }
    out.result()
  }

  /** File bytes → array<struct<pos, rec_type, uri, http_status, mime>> —
    * the scan-side record listing ([[WarcExpressions.WarcRecords]]).
    * Fail-closed: an invalid file yields an EMPTY array, never partial
    * records. */
  def warcRecords(bytes: Array[Byte]): ArrayData = {
    val recs = parse(bytes)
    if (recs == null) return new GenericArrayData(Array.empty[Any])
    new GenericArrayData(recs.map { r =>
      new GenericInternalRow(Array[Any](
        r.pos,
        UTF8String.fromString(r.recType),
        if (r.uri == null) null else UTF8String.fromString(r.uri),
        r.httpStatus,
        if (r.mime == null) null else UTF8String.fromString(r.mime)))
        : InternalRow
    }.toArray[Any])
  }

  /** File bytes → the FIRST `response` record's HTTP body as UTF-8 text
    * (null when the file is invalid or carries no response). */
  def warcBody(bytes: Array[Byte]): UTF8String = {
    val recs = parse(bytes)
    if (recs == null) return null
    recs.find(r => r.recType == "response" && r.httpStatus >= 0) match {
      case Some(r) => bodyText(r.body, r.mime)
      case None    => null
    }
  }

  /** File bytes → array<struct<uri, body>> of EVERY response record —
    * the multi-page shape of a real crawl archive (thousands of fetches
    * per `.warc.gz`, each its own gzip member). Empty array on invalid
    * files (fail-closed, never partial). */
  def warcPages(bytes: Array[Byte]): ArrayData = {
    val recs = parse(bytes)
    if (recs == null) return new GenericArrayData(Array.empty[Any])
    new GenericArrayData(recs
      .filter(r => r.recType == "response" && r.httpStatus >= 0)
      .map { r =>
        new GenericInternalRow(Array[Any](
          if (r.uri == null) null else UTF8String.fromString(r.uri),
          bodyText(r.body, r.mime))): InternalRow
      }.toArray[Any])
  }

  /** File bytes → struct<uri, body> of the first response record in ONE
    * parse (the [[Warc.pages]] hot path — a 1 GB archive must not be
    * walked twice to read the uri and the body). Null on invalid files
    * or files with no response record. */
  def warcPage(bytes: Array[Byte]): InternalRow = {
    val recs = parse(bytes)
    if (recs == null) return null
    recs.find(r => r.recType == "response" && r.httpStatus >= 0) match {
      case Some(r) => new GenericInternalRow(Array[Any](
        if (r.uri == null) null else UTF8String.fromString(r.uri),
        bodyText(r.body, r.mime)))
      case None => null
    }
  }
}
