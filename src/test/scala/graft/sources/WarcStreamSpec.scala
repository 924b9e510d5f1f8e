package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileInputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Streaming WARC walk ([[WarcStream]] / [[Warc.recordsStream]] /
  * [[Warc.pagesStream]]): row-for-row parity with the expression path,
  * O(record) heap pinned on a large archive, strict multi-member gunzip,
  * and the throw-on-corruption contract. */
class WarcStreamSpec extends AnyFunSuite with SparkTestBase {

  private def synth(id: Long, html: String): Array[Byte] =
    WarcKernels.warcSynth(id, UTF8String.fromString(html))

  private def gz(payload: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(payload.length / 4 + 64)
    val g = new GZIPOutputStream(bos)
    g.write(payload); g.close()
    bos.toByteArray
  }

  /** One response record with an HTTP envelope and a body of `n` 'a's. */
  private def responseRecord(i: Int, n: Int): Array[Byte] = {
    val body = Array.fill[Byte](n)('a')
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      s"Content-Length: $n\r\n\r\n").getBytes("UTF-8") ++ body
    (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: https://x.example/$i\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("UTF-8") ++
      http ++ "\r\n\r\n".getBytes("UTF-8")
  }

  test("streamed records equal the expression walk, file by file") {
    val cat = synth(1L, "<p>a b c</p>") ++ synth(2L, "<p>d e f</p>")
    val got = WarcStream.records(
      new ByteArrayInputStream(cat), withBodies = false).toSeq
    val want = WarcKernels.parse(cat)
    assert(got.size == want.size)
    got.zip(want).foreach { case (s, e) =>
      assert(s.pos == e.pos && s.recType == e.recType && s.uri == e.uri &&
        s.httpStatus == e.httpStatus && s.mime == e.mime)
    }
    // with bodies: the HTTP split (incl. charset plumbing) matches too
    val gotB = WarcStream.records(
      new ByteArrayInputStream(cat), withBodies = true).toSeq
    gotB.zip(want).foreach { case (s, e) =>
      assert(java.util.Arrays.equals(s.body, e.body)) }
  }

  test("heap high-water mark is O(record), never O(archive)") {
    // 2048 response records x 128 KB bodies = 256 MB decompressed — a
    // multi-hundred-MB archive, the Common Crawl member scale the
    // bounded-heap contract is FOR (the repeated-'a' bodies keep the
    // on-disk gz small; the walk still decompresses every byte)
    val out = new ByteArrayOutputStream(1 << 20)
    (0 until 2048).foreach(i => out.write(gz(responseRecord(i, 128 * 1024))))
    val archive = out.toByteArray
    val dir = Files.createTempDirectory("graft-warc-stream")
    val f = Paths.get(dir.toString, "big.warc.gz")
    Files.write(f, archive)

    // listing mode: held bytes = WARC header + <=64 KB HTTP prefix,
    // REGARDLESS of the 128 KB payloads (they skip through scratch)
    val lst = new FileInputStream(f.toFile)
    try {
      val it = WarcStream.records(lst, withBodies = false)
      assert(it.size == 2048)
      assert(it.maxHeldBytes < 80 * 1024,
        s"listing held ${it.maxHeldBytes} bytes — payloads must skip")
    } finally lst.close()

    // page mode: held = one record (~128 KB), never the 256 MB archive
    val pg = new FileInputStream(f.toFile)
    try {
      val it = WarcStream.records(pg, withBodies = true)
      var n = 0
      it.foreach { r => n += 1; assert(r.body.length == 128 * 1024) }
      assert(n == 2048)
      assert(it.maxHeldBytes < 256 * 1024,
        s"page walk held ${it.maxHeldBytes} bytes — one record at a time")
    } finally pg.close()
  }

  test("listing mode grows past 64 KB header blocks — expression parity") {
    // an HTTP header block of ~100 KB (one fat header line): listing
    // mode must GROW its held prefix and parse status/mime exactly like
    // the expression walk, never silently yield status=-1
    val fat = "x" * (100 * 1024)
    val body = "tiny"
    val http = (s"HTTP/1.1 203 OK\r\nContent-Type: text/fat\r\n" +
      s"X-Fat: $fat\r\n\r\n$body").getBytes("UTF-8")
    val rec = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: https://x.example/fat\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("UTF-8") ++
      http ++ "\r\n\r\n".getBytes("UTF-8")
    val got = WarcStream.records(
      new ByteArrayInputStream(gz(rec)), withBodies = false).toSeq
    val want = WarcKernels.parse(gz(rec))
    assert(got.size == 1 && want.size == 1)
    assert(got.head.httpStatus == 203 && got.head.mime == "text/fat")
    assert(got.head.httpStatus == want.head.httpStatus &&
      got.head.mime == want.head.mime)
    // a non-HTTP payload bigger than the prefix must NOT grow (parity:
    // the expression walk passes it through as status=-1)
    val blob = ("not http " * (20 * 1024)).getBytes("UTF-8")
    val rec2 = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: https://x.example/blob\r\n" +
      s"Content-Length: ${blob.length}\r\n\r\n").getBytes("UTF-8") ++
      blob ++ "\r\n\r\n".getBytes("UTF-8")
    val it2 = WarcStream.records(
      new ByteArrayInputStream(gz(rec2)), withBodies = false)
    val got2 = it2.toSeq
    assert(got2.head.httpStatus == -1 && got2.head.mime == null)
    assert(it2.maxHeldBytes < 80 * 1024,
      s"non-HTTP payload grew the prefix: ${it2.maxHeldBytes}")
    // an HTTP header block with NO terminator past the 1 MiB bound
    // fails loudly (corrupt), never a silent -1
    val huge = ("HTTP/1.1 200 OK\r\nX-H: " + "y" * (2 * 1024 * 1024))
      .getBytes("UTF-8")
    val rec3 = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: https://x.example/huge\r\n" +
      s"Content-Length: ${huge.length}\r\n\r\n").getBytes("UTF-8") ++
      huge ++ "\r\n\r\n".getBytes("UTF-8")
    assertThrows[Exception] {
      WarcStream.records(new ByteArrayInputStream(gz(rec3)),
        withBodies = false).toSeq
    }
  }

  test("strict gunzip: CRC damage and trailing garbage throw, never truncate") {
    val cat = synth(1L, "<p>a b c</p>") ++ synth(2L, "<p>d e f</p>")
    val bad = cat.clone()
    bad(cat.length / 2) = (bad(cat.length / 2) ^ 0x40).toByte
    assertThrows[Exception] {
      WarcStream.records(new ByteArrayInputStream(bad),
        withBodies = false).toSeq
    }
    // garbage after a valid member: GZIPInputStream would stop silently;
    // the strict stream must throw
    val garbage = cat ++ "tail garbage".getBytes("UTF-8")
    assertThrows[Exception] {
      WarcStream.records(new ByteArrayInputStream(garbage),
        withBodies = false).toSeq
    }
  }

  test("Warc.recordsStream / pagesStream match records / pages on disk") {
    val dir = Files.createTempDirectory("graft-warc-stream2").toString
    Files.write(Paths.get(s"$dir/f0.warc.gz"),
      synth(3L, "<p>hello crawl world</p>"))
    Files.write(Paths.get(s"$dir/f1.warc.gz"),
      synth(4L, "<p>second page text</p>") ++
        synth(5L, "<p>third page body</p>"))

    val cols = Seq("file", "pos", "rec_type", "uri", "http_status", "mime")
    val a = Warc.records(spark, dir).orderBy(col("file"), col("pos"))
      .select(cols.map(col): _*).collect().toSeq
    val b = Warc.recordsStream(spark, dir).orderBy(col("file"), col("pos"))
      .select(cols.map(col): _*).collect().toSeq
    assert(a == b && a.size == 9)

    val p = Warc.pages(spark, dir).orderBy(col("uri")).collect().toSeq
    val q = Warc.pagesStream(spark, dir).orderBy(col("uri")).collect().toSeq
    assert(p == q && p.size == 3)

    // corruption: the streaming walk FAILS the job, naming the file.
    // The task failure is the TEST — silence the executor/scheduler
    // ERROR logging for the deliberate failure, then restore.
    Files.write(Paths.get(s"$dir/f2.warc.gz"), "junk".getBytes("UTF-8"))
    import org.apache.logging.log4j.{Level, LogManager}
    val silenced = Seq("org.apache.spark.executor.Executor",
      "org.apache.spark.scheduler.TaskSetManager",
      "org.apache.spark.scheduler.DAGScheduler")
      .map(n => LogManager.getLogger(n)
        .asInstanceOf[org.apache.logging.log4j.core.Logger])
    val prev = silenced.map(l => l -> l.getLevel)
    silenced.foreach(_.setLevel(Level.FATAL))
    val e =
      try intercept[Exception] { Warc.recordsStream(spark, dir).count() }
      finally prev.foreach { case (l, lv) => l.setLevel(lv) }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("f2.warc.gz")), chain(e).mkString(" | "))
  }
}
