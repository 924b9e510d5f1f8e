package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Progressive (SOF2) JPEG: the multi-scan pipeline — spectral
  * selection, successive approximation, EOB runs, refinement weave,
  * restart resets — against two independent anchors: the exact
  * constant-block contract (shared with the baseline gate) and
  * bit-identical equivalence with the baseline decode of the SAME
  * quantized coefficients. The second anchor is the strong one: both
  * encoders write the same [[MediaKernels.fdctQuant]] blocks and both
  * decode paths run the same dequant+IDCT+sum arithmetic, so any slip
  * anywhere in the progressive entropy layer breaks exact equality on a
  * dense-spectrum image. */
class ProgressiveJpegSpec extends AnyFunSuite {

  private def sums(p: org.apache.spark.sql.catalyst.util.ArrayData) =
    (0 until 7).map(p.getLong)

  test("constant-block planes decode exactly through the progressive pipeline") {
    for ((id, w, h) <- Seq((11L, 36, 35), (2L, 16, 16), (7L, 4, 4),
      (3L, 1, 1), (14L, 33, 17))) {
      val base = sums(MediaKernels.jpegParse(MediaKernels.jpegSynth(id, w, h)))
      val prog = sums(MediaKernels.jpegParse(MediaKernels.jpegSynthProg(id, w, h)))
      assert(base.head == w.toLong, "baseline anchor must itself decode")
      assert(prog == base,
        s"progressive decode of ($id,$w,$h) must equal the baseline decode")
    }
    // and the stream really is progressive with restart markers
    val jpg = MediaKernels.jpegSynthProg(11L, 36, 35)
    assert(jpg.sliding(2).exists(s =>
      (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xc2), "SOF2 present")
    assert(jpg.sliding(2).count(s =>
      (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xda) == 9,
      "the scan script emits 9 SOS segments")
    assert(jpg.sliding(2).count(s =>
      (s(0) & 0xff) == 0xff && (s(1) & 0xff) >= 0xd0 && (s(1) & 0xff) <= 0xd7) >= 9,
      "RSTn markers fire inside the progressive scans")
  }

  test("progressive == baseline decode on dense-spectrum images (all paths)") {
    // three spectral shapes: a smooth gradient (low-freq ACs), an LCG
    // noise plane (dense spectrum, long (r,s) runs), and a sparse
    // high-frequency plane (>=16-zero gaps -> ZRL in first AND refine)
    def grad(k: Int, w: Int, h: Int) = Array.tabulate(w * h)(i =>
      ((i % w) * 2 + (i / w) * 3 + k * 20) % 200 + 20)
    def noise(k: Int, w: Int, h: Int) = {
      var s = 88172645463325252L + k
      Array.fill(w * h) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        ((s & 0x7fffffff) % 256).toInt
      }
    }
    def sparse(k: Int, w: Int, h: Int) = Array.tabulate(w * h)(i =>
      128 + (if ((i % w) % 4 == 3 && (i / w) % 8 == 7) 90 + k else 0))
    val shapes = Seq[(String, (Int, Int, Int) => Array[Int])](
      ("grad", grad), ("noise", noise), ("sparse", sparse))
    for {
      (label, mk) <- shapes
      (w, h) <- Seq((32, 24), (37, 29), (8, 8), (1, 1), (200, 40))
      sub <- Seq(false, true)
      ri <- Seq(0, 2) // ri=0: EOB runs accumulate across whole scans
    } {
      val (y, cb, cr) = (mk(0, w, h), mk(1, w, h), mk(2, w, h))
      val base = sums(MediaKernels.jpegParse(
        MediaKernels.jpegEncode(y, cb, cr, w, h, ri, sub)))
      val prog = sums(MediaKernels.jpegParse(
        MediaKernels.jpegEncodeProgressive(y, cb, cr, w, h, ri, sub)))
      assert(base.head == w.toLong, s"baseline must decode ($label)")
      assert(prog == base,
        s"$label ${w}x$h sub=$sub ri=$ri: progressive decode must be " +
          s"bit-identical to baseline (same coefficients, same IDCT)")
    }
  }

  test("a shortened scan script is a valid partial file; truncation fails closed") {
    val y = Array.tabulate(48 * 40)(i => (i * 7) % 256)
    val cb = Array.tabulate(48 * 40)(i => (i * 3) % 256)
    val cr = Array.tabulate(48 * 40)(i => (i * 11) % 256)
    val full = MediaKernels.jpegEncodeProgressive(y, cb, cr, 48, 40, 2, subsample420 = true)
    // cut after the 5th scan (all first scans, no refinements) + EOI:
    // a legal progressive file at reduced precision — dims decode, no fail
    val sosOffsets = full.indices.dropRight(1).filter(i =>
      (full(i) & 0xff) == 0xff && (full(i + 1) & 0xff) == 0xda)
    assert(sosOffsets.length == 9)
    val partial = full.take(sosOffsets(5)) ++ Array(0xff.toByte, 0xd9.toByte)
    val p = MediaKernels.jpegParse(partial)
    assert(p.getLong(0) == 48L && p.getLong(1) == 40L,
      "first-scans-only is a valid (coarser) progressive file")
    // mid-scan truncation (no EOI, bits run dry) fails closed
    assert(MediaKernels.jpegParse(full.take(full.length / 2)).getLong(0) == -1L)
    assert(MediaKernels.jpegParse(full.take(sosOffsets(2) + 20)).getLong(0) == -1L)
    // headers-only (no scan at all) fails closed
    assert(MediaKernels.jpegParse(
      full.take(sosOffsets(0)) ++ Array(0xff.toByte, 0xd9.toByte)).getLong(0) == -1L)
  }
}
