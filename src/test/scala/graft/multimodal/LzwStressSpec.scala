package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The GIF LZW coder under adversarial load: seeded NOISE forces the
  * dictionary to 4096 over and over, so the encoder's mid-stream CLEAR
  * resets, the decoder's dict-full guard, and every width step 9→10→11→12
  * all fire many times — the paths a small patterned image never reaches.
  * The container is hand-built around the raw stream so the test pins the
  * LZW layer itself, not gifSynth's choices. */
class LzwStressSpec extends AnyFunSuite {

  private def container(w: Int, h: Int, z: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    out.write("GIF89a".getBytes("ISO-8859-1"))
    le16(w); le16(h); out.write(0xf7); out.write(0); out.write(0)
    (0 until 256).foreach { i =>
      out.write(i); out.write(255 - i); out.write((i * 7) % 256)
    }
    out.write(0x2c); le16(0); le16(0); le16(w); le16(h); out.write(0)
    out.write(8)
    var off = 0
    while (off < z.length) {
      val n = math.min(255, z.length - off)
      out.write(n); out.write(z, off, n); off += n
    }
    out.write(0); out.write(0x3b)
    out.toByteArray
  }

  test("noise round-trips through dictionary-full CLEAR resets exactly") {
    val rnd = new scala.util.Random(99)
    val w = 300; val h = 250
    val idx = Array.fill(w * h)(rnd.nextInt(256).toByte)
    // 75k near-incompressible symbols emit ~1 code per ~1.5 symbols, so
    // the dictionary saturates at 4096 roughly every 3.8k codes — a
    // dozen resets, each re-walking the 9→12-bit width ladder
    val gif = container(w, h, MediaKernels.lzwEncode(idx))
    val p = MediaKernels.gifParse(gif)
    assert(p.getLong(0) == w && p.getLong(1) == h)
    val er = idx.map(_ & 0xff)
    assert(p.getLong(4) == er.map(_.toLong).sum, "R channel exact")
    assert(p.getLong(5) == er.map(i => 255L - i).sum, "G channel exact")
    assert(p.getLong(6) == er.map(i => (i * 7L) % 256).sum, "B channel exact")
  }

  test("pathological runs (KwKwK chains) round-trip exactly") {
    // long single-symbol runs maximize the code==nextCode special case
    val w = 256; val h = 64
    val idx = Array.tabulate(w * h)(i => ((i / 1000) % 256).toByte)
    val p = MediaKernels.gifParse(container(w, h, MediaKernels.lzwEncode(idx)))
    assert(p.getLong(0) == w)
    assert(p.getLong(4) == idx.map(b => (b & 0xff).toLong).sum)
  }
}
