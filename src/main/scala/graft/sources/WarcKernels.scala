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

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
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
          val k = l.substring(0, c).trim.toLowerCase
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
      var status = -1; var mime: String = null; var body = payload
      if (recType == "response") {
        val he = indexOfCrlfCrlf(payload, 0)
        if (he >= 0) {
          val hh = new String(payload, 0, he, StandardCharsets.UTF_8)
          val hl = hh.split("\r\n", -1)
          if (hl(0).startsWith("HTTP/1.") && hl(0).length >= 12) {
            status = try hl(0).substring(9, 12).trim.toInt
                     catch { case _: NumberFormatException => -1 }
            hl.iterator.drop(1).foreach { l =>
              val c = l.indexOf(':')
              if (c > 0 && l.substring(0, c).trim.equalsIgnoreCase(
                  "content-type"))
                mime = l.substring(c + 1).trim
            }
            body = java.util.Arrays.copyOfRange(payload, he + 4,
              payload.length)
          }
        }
      }
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
      case Some(r) => UTF8String.fromBytes(r.body)
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
          UTF8String.fromBytes(r.body))): InternalRow
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
        UTF8String.fromBytes(r.body)))
      case None => null
    }
  }
}
