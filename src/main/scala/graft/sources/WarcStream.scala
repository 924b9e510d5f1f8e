package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream, PushbackInputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, Inflater}

import org.apache.spark.unsafe.types.UTF8String

/** STREAMING WARC walk — the bounded-heap twin of [[WarcKernels.parse]].
  *
  * The expression path materializes the whole decompressed archive in
  * one task value: a 1 GB `.warc.gz` (~4 GB raw) costs ~4 GB of task
  * heap — fine for gate corpora, wrong for Common Crawl-sized members.
  * This walk holds O(current record), not O(archive):
  *
  *   - [[MultiMemberGunzipStream]] inflates member by member with the
  *     SAME rigor as `WarcKernels.gunzipAll` (header flags walked, CRC32
  *     + ISIZE verified per member, the next member must start exactly
  *     after the trailer, trailing garbage refused) but through fixed
  *     64 KB buffers;
  *   - [[WarcRecordIterator]] frames records off that stream: the WARC
  *     header block and (for `response` records) the embedded HTTP
  *     header prefix are the only bytes HELD; a listing walk SKIPS
  *     payload bytes through a scratch buffer (heap per record = a few
  *     KB regardless of payload size), while the page walk holds one
  *     body at a time.
  *
  * Fail-closed semantics differ from the expression path BY NECESSITY
  * and loudly: expressions return zero records for an invalid file
  * (all-or-nothing is free when the whole file is parsed before any row
  * is emitted); a streaming iterator cannot retract rows it already
  * yielded, so any structural violation THROWS (task → job failure)
  * rather than silently truncating — at 100 TB you want the job to stop
  * on a corrupt archive, not a quietly shorter corpus. The thrown
  * message names the violation; [[Warc.recordsStream]] wraps it with
  * the file path.
  */
object WarcStream {

  /** One streamed record: listing fields plus a body that is EMPTY when
    * the walk was asked to skip payloads (`withBodies = false`). */
  final case class SRec(pos: Int, recType: String, uri: String,
                        httpStatus: Int, mime: String, body: Array[Byte])

  /** Multi-member gzip InputStream, strict per member: any violation
    * throws (never a silent prefix). Fixed 64 KB buffers. */
  final class MultiMemberGunzipStream(in: InputStream) extends InputStream {
    private val Buf = 1 << 16
    private val pb = new PushbackInputStream(
      new BufferedInputStream(in, Buf), Buf)
    private val inf = new Inflater(true)
    private val crc = new CRC32
    private val inBuf = new Array[Byte](Buf)
    private var inLen = 0
    private var memberSize = 0L
    private var inMember = false
    private var done = false

    private def readByte(): Int = {
      val b = pb.read()
      if (b < 0) throw new EOFException("truncated gzip member")
      b
    }

    private def skipZeroTerminated(): Unit = {
      var b = readByte()
      while (b != 0) b = readByte()
    }

    /** Parse the next member header off `pb`; false at clean archive
      * end (EOF exactly at a member boundary). */
    private def startMember(): Boolean = {
      val first = pb.read()
      if (first < 0) { done = true; return false }
      require(first == 0x1f && readByte() == 0x8b && readByte() == 8,
        "bad gzip member header")
      val flg = readByte()
      var i = 0
      while (i < 6) { readByte(); i += 1 } // mtime, xfl, os
      if ((flg & 4) != 0) { // FEXTRA
        val lo = readByte(); val hi = readByte()
        var n = lo | (hi << 8)
        while (n > 0) { readByte(); n -= 1 }
      }
      if ((flg & 8) != 0) skipZeroTerminated()  // FNAME
      if ((flg & 16) != 0) skipZeroTerminated() // FCOMMENT
      if ((flg & 2) != 0) { readByte(); readByte() } // FHCRC
      inf.reset(); crc.reset(); memberSize = 0L; inLen = 0
      inMember = true
      true
    }

    private def finishMember(): Unit = {
      // push unconsumed bytes back, then read + verify the 8-byte trailer
      val remaining = inf.getRemaining
      if (remaining > 0) pb.unread(inBuf, inLen - remaining, remaining)
      var le = 0L; var i = 0
      while (i < 4) { le |= (readByte().toLong << (8 * i)); i += 1 }
      require(le == crc.getValue, "gzip CRC mismatch")
      le = 0L; i = 0
      while (i < 4) { le |= (readByte().toLong << (8 * i)); i += 1 }
      require(le == (memberSize & 0xffffffffL), "gzip ISIZE mismatch")
      inMember = false
    }

    override def read(): Int = {
      val one = new Array[Byte](1)
      val n = read(one, 0, 1)
      if (n < 0) -1 else one(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      while (true) {
        if (done) return -1
        if (!inMember && !startMember()) return -1
        val n = inf.inflate(b, off, len)
        if (n > 0) {
          crc.update(b, off, n); memberSize += n
          return n
        }
        if (inf.finished()) finishMember()
        else if (inf.needsInput()) {
          val got = pb.read(inBuf)
          if (got < 0) throw new EOFException("truncated deflate stream")
          inLen = got
          inf.setInput(inBuf, 0, got)
        } else throw new IllegalStateException("inflater stalled")
      }
      -1 // unreachable
    }

    override def close(): Unit = { inf.end(); pb.close() }
  }

  /** Frames WARC records off a decompressed stream. `withBodies = false`
    * SKIPS payload bytes (listing mode — heap per record is the header
    * block + ≤64 KB HTTP prefix); `true` holds ONE body at a time (page
    * mode — heap is O(largest record), never O(archive)).
    * [[maxHeldBytes]] reports the walk's high-water mark of bytes held
    * for any single record — the spec pins it on a large archive. */
  final class WarcRecordIterator(in: InputStream, withBodies: Boolean)
      extends Iterator[SRec] {
    private val buf = new BufferedInputStream(in, 1 << 16)
    private val MaxHeaderBlock = 1 << 20 // a 1 MB WARC header block is corrupt
    private val HttpPrefix = 1 << 16
    private var pos = 0
    private var nextRec: SRec = _
    private var finished = false
    private val scratch = new Array[Byte](1 << 16)
    var maxHeldBytes: Long = 0L

    private def readFully(b: Array[Byte], off: Int, len: Int): Unit = {
      var got = 0
      while (got < len) {
        val n = buf.read(b, off + got, len - got)
        if (n < 0) throw new EOFException("truncated record payload")
        got += n
      }
    }

    private def skipFully(len: Long): Unit = {
      var left = len
      while (left > 0) {
        val n = buf.read(scratch, 0, math.min(left, scratch.length.toLong).toInt)
        if (n < 0) throw new EOFException("truncated record payload")
        left -= n
      }
    }

    /** The CRLFCRLF-terminated header block as a String (bounded). */
    private def readHeaderBlock(firstByte: Int): String = {
      val sb = new java.io.ByteArrayOutputStream(512)
      sb.write(firstByte)
      val CR = '\r'.toInt; val LF = '\n'.toInt
      var state = if (firstByte == CR) 1 else 0
      while (state != 4) {
        val b = buf.read()
        if (b < 0) throw new EOFException("truncated WARC header block")
        sb.write(b)
        state =
          if (b == CR) { if (state == 2) 3 else 1 }
          else if (b == LF) { if (state == 1) 2 else if (state == 3) 4 else 0 }
          else 0
        require(sb.size() <= MaxHeaderBlock, "unbounded WARC header block")
      }
      new String(sb.toByteArray, 0, sb.size() - 4, StandardCharsets.UTF_8)
    }

    private def advance(): Unit = {
      if (finished) return
      val first = buf.read()
      if (first < 0) { finished = true; return } // clean end
      val head = readHeaderBlock(first)
      val lines = head.split("\r\n", -1)
      require(lines.nonEmpty && lines(0).startsWith("WARC/1."),
        "missing WARC version line")
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
      require(recType != null && len >= 0, "missing WARC-Type/Content-Length")
      var held = head.length.toLong
      var status = -1; var mime: String = null
      var body: Array[Byte] = Array.emptyByteArray
      if (withBodies) {
        require(len <= Int.MaxValue - 8, "record payload exceeds 2 GiB")
        val payload = new Array[Byte](len.toInt)
        readFully(payload, 0, len.toInt)
        held += len
        // HTTP split mirrors WarcKernels.parse (incl. chunked + charset
        // handled by the caller through bodyText)
        val r = WarcKernels.httpSplit(recType, payload)
        status = r._1; mime = r._2; body = r._3
      } else if (recType == "response") {
        // hold only the HTTP header prefix; skip the rest of the payload.
        // An HTTP response whose header block outgrows the initial 64 KB
        // GROWS the held window (doubling, ≤ MaxHeaderBlock) until the
        // CRLFCRLF is in view — parity with the expression walk's
        // full-payload parse, never a silent status=-1. Past the 1 MiB
        // bound it fails LOUDLY (such a header is corrupt, and a bounded
        // -heap walk cannot hold it).
        var pfx = math.min(len, HttpPrefix.toLong).toInt
        var prefix = new Array[Byte](pfx)
        readFully(prefix, 0, pfx)
        var he = WarcKernels.crlfCrlfAt(prefix, 0)
        def isHttp: Boolean = prefix.length >= 7 &&
          prefix(0) == 'H' && prefix(1) == 'T' && prefix(2) == 'T' &&
          prefix(3) == 'P' && prefix(4) == '/' && prefix(5) == '1' &&
          prefix(6) == '.'
        while (he < 0 && pfx < len && isHttp) {
          require(pfx < MaxHeaderBlock,
            "HTTP header block exceeds 1 MiB (listing-walk bound)")
          val np = math.min(len,
            math.min(pfx.toLong * 2, MaxHeaderBlock.toLong)).toInt
          val grown = java.util.Arrays.copyOf(prefix, np)
          readFully(grown, pfx, np - pfx)
          prefix = grown
          // re-search from just before the old boundary: the CRLFCRLF
          // may straddle it
          he = WarcKernels.crlfCrlfAt(prefix, math.max(0, pfx - 3))
          pfx = np
        }
        skipFully(len - pfx)
        held += pfx
        if (he >= 0) {
          val hh = new String(prefix, 0, he, StandardCharsets.UTF_8)
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
          }
        }
      } else skipFully(len)
      maxHeldBytes = math.max(maxHeldBytes, held)
      // the two-CRLF record separator, exact
      val sep = new Array[Byte](4)
      readFully(sep, 0, 4)
      require(sep(0) == '\r' && sep(1) == '\n' && sep(2) == '\r' &&
        sep(3) == '\n', "missing record separator")
      nextRec = SRec(pos, recType, uri, status, mime, body)
      pos += 1
    }

    override def hasNext: Boolean = {
      if (nextRec == null && !finished) advance()
      nextRec != null
    }

    override def next(): SRec = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRec
      nextRec = null
      r
    }
  }

  /** Streamed records of one archive stream (caller owns `in`). */
  def records(in: InputStream, withBodies: Boolean): WarcRecordIterator =
    new WarcRecordIterator(new MultiMemberGunzipStream(in), withBodies)

  /** Charset-aware page text for a streamed response record. */
  def pageText(r: SRec): UTF8String = WarcKernels.bodyText(r.body, r.mime)
}
