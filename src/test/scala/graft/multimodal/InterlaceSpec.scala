package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Interlaced variants of the two compressed raster codecs: GIF's
  * 4-pass row shuffle and PNG's Adam7 seven-pass sub-images. The anchor
  * is invariance — an interlaced encode must decode to exactly the
  * sequential encode's pixels — plus a spatial witness for GIF (row-
  * parity red sums), because GIF's total sums are row-permutation-
  * invariant and would mask an interlace-oblivious decoder. */
class InterlaceSpec extends AnyFunSuite {

  private def vec(p: org.apache.spark.sql.catalyst.util.ArrayData, n: Int) =
    (0 until n).map(p.getLong)

  test("interlaced GIF decodes to the sequential image, parity sums included") {
    for ((id, w, h) <- Seq((5L, 13, 11), (9L, 2, 2), (3L, 1, 1),
      (21L, 7, 20), (8L, 16, 5))) {
      val seqP = vec(MediaKernels.gifParse(MediaKernels.gifSynth(id, w, h)), 9)
      val intP = vec(MediaKernels.gifParse(MediaKernels.gifSynthI(id, w, h)), 9)
      assert(seqP.head == w.toLong, "sequential anchor decodes")
      assert(intP == seqP, s"($id,$w,$h): de-interlaced decode must match")
      // parity sums against the direct formula
      def palR(i: Int) = ((i * 5L + id * 3L) % 239).toInt
      def idx(x: Int, y: Int) = ((x * 7L + y * 13L + id) % 256).toInt
      val even = (for (y <- 0 until h if y % 2 == 0; x <- 0 until w)
        yield palR(idx(x, y)).toLong).sum
      assert(intP(7) == even && intP(8) == intP(4) - even,
        s"($id,$w,$h): parity red sums must match the formulas")
    }
  }

  test("the parity witness really catches an interlace-oblivious read") {
    // flip the interlace flag OFF in an interlaced file: the LZW stream
    // still decodes (row order is not self-describing), total sums still
    // match — ONLY the parity pair reveals the wrong row placement
    val (id, w, h) = (5L, 13, 11)
    val good = vec(MediaKernels.gifParse(MediaKernels.gifSynthI(id, w, h)), 9)
    val bytes = MediaKernels.gifSynthI(id, w, h)
    val desc = bytes.indices.indexWhere(i =>
      i + 10 <= bytes.length && (bytes(i) & 0xff) == 0x2c &&
        ((bytes(i + 5) & 0xff) | ((bytes(i + 6) & 0xff) << 8)) == w &&
        ((bytes(i + 7) & 0xff) | ((bytes(i + 8) & 0xff) << 8)) == h)
    assert(desc >= 0 && (bytes(desc + 9) & 0x40) != 0)
    bytes(desc + 9) = (bytes(desc + 9) & ~0x40).toByte
    val oblivious = vec(MediaKernels.gifParse(bytes), 9)
    assert(oblivious(4) == good(4), "total sums are permutation-invariant")
    assert(oblivious(7) != good(7),
      "the parity pair must differ when rows land unshuffled")
  }

  test("Adam7 PNG decodes to the sequential image across pass-edge shapes") {
    // 1x1 (one pass populated), tiny shapes with most passes empty,
    // sizes straddling the 8-pixel pass grid, and a >=8x8 all-7-passes
    for ((id, w, h) <- Seq((7L, 1, 1), (4L, 2, 2), (11L, 3, 9),
      (13L, 9, 10), (2L, 20, 17), (19L, 8, 8))) {
      val seqP = vec(MediaKernels.pngParse(MediaKernels.pngSynth(id, w, h)), 7)
      val intP = vec(MediaKernels.pngParse(MediaKernels.pngSynthI(id, w, h)), 7)
      assert(seqP.head == w.toLong, "sequential anchor decodes")
      assert(intP == seqP, s"($id,$w,$h): Adam7 decode must match sequential")
    }
    // the stream really declares Adam7
    val png = MediaKernels.pngSynthI(2L, 20, 17)
    val ihdrAt = png.indices.indexWhere(i =>
      i + 4 <= png.length && new String(png, i, 4, "ISO-8859-1") == "IHDR")
    assert((png(ihdrAt + 4 + 12) & 0xff) == 1, "IHDR interlace byte = 1")
  }

  test("Adam7 fail-closed edges: bad interlace byte, truncation") {
    val png = MediaKernels.pngSynthI(3L, 12, 9)
    assert(MediaKernels.pngParse(png.take(png.length / 2)).getLong(0) == -1L)
    // interlace byte 2 is out of spec — patch IHDR and fix its CRC32
    val bad = png.clone()
    val ihdrAt = bad.indices.indexWhere(i =>
      i + 4 <= bad.length && new String(bad, i, 4, "ISO-8859-1") == "IHDR")
    bad(ihdrAt + 4 + 12) = 2
    val crc = new java.util.zip.CRC32
    crc.update(bad, ihdrAt, 4 + 13)
    val cv = crc.getValue.toInt
    bad(ihdrAt + 17) = (cv >>> 24).toByte
    bad(ihdrAt + 18) = (cv >>> 16).toByte
    bad(ihdrAt + 19) = (cv >>> 8).toByte
    bad(ihdrAt + 20) = cv.toByte
    assert(MediaKernels.pngParse(bad).getLong(0) == -1L,
      "interlace method 2 does not exist -> fail closed")
  }
}
