package graft.multimodal

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Per-row media container kernels — REAL byte-level construction and
  * parsing of the two classic uncompressed containers (BMP/BITMAPINFOHEADER
  * and RIFF/WAVE PCM), shared by the interpreted and generated paths of
  * [[MediaExpressions]] the same way [[graft.functions.SketchKernels]]
  * backs the sketch expressions.
  *
  * These exist because "multimodal = opaque binary + stubbed decode" is
  * only half a story: for containers that need no external codec the
  * engine decodes REAL bytes — header fields come from parsing the actual
  * little-endian layout (not echoing inputs), pixel/sample aggregates come
  * from walking the actual pixel rows / PCM frames. Compressed codecs
  * (JPEG/MP3/H.264) stay behind the pluggable
  * [[Multimodal.MediaDecoder]] boundary, where a production build drops in
  * its codec libraries.
  *
  * Failure contract: a payload that does not parse (bad magic, truncated,
  * unsupported variant) yields an all(-1) result vector, NOT null — keeps
  * the output array non-null-typed and codegen branch-free; callers gate
  * on `result[0] >= 0`.
  */
object MediaKernels {

  // ---------------- little-endian helpers ----------------

  private def putLE32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
    b(off + 2) = ((v >>> 16) & 0xff).toByte
    b(off + 3) = ((v >>> 24) & 0xff).toByte
  }
  private def putLE16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
  }
  private def getLE32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def getLE16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  // ---------------- BMP (24bpp, BITMAPINFOHEADER) ----------------

  /** Deterministic pixel channels for image row y (top-down), column x of
    * image `id` — the formula the DuckDB oracle mirrors symbolically. */
  @inline private def pxB(id: Long, x: Int, y: Int): Int = ((x * 7L + y * 13L + id) % 256).toInt
  @inline private def pxG(id: Long, x: Int, y: Int): Int = ((x * 11L + y * 3L + id * 5L) % 251).toInt
  @inline private def pxR(id: Long, x: Int, y: Int): Int = ((x * 5L + y * 17L + id * 3L) % 239).toInt

  /** Build a complete, valid 24bpp BMP file: 14-byte BITMAPFILEHEADER +
    * 40-byte BITMAPINFOHEADER + bottom-up pixel rows padded to 4-byte
    * stride. Pixel (x, y) channels are the deterministic id-derived
    * formulas above. */
  def bmpSynth(id: Long, width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, "bmpSynth: dims must be positive")
    // size arithmetic in Long: large-but-positive dims would overflow the
    // Int products to a negative/wrapped size and surface as a
    // NegativeArraySizeException (or a silently corrupt container)
    // instead of a legible error
    val strideL = ((width.toLong * 3 + 3) / 4) * 4
    require(54L + strideL * height <= Int.MaxValue,
      s"bmpSynth: ${width}x$height exceeds the 2 GiB single-payload bound")
    val stride = strideL.toInt
    val fileSize = 54 + stride * height
    val b = new Array[Byte](fileSize)
    b(0) = 'B'; b(1) = 'M'
    putLE32(b, 2, fileSize)
    putLE32(b, 10, 54)            // pixel data offset
    putLE32(b, 14, 40)            // BITMAPINFOHEADER size
    putLE32(b, 18, width)
    putLE32(b, 22, height)        // positive = bottom-up row order
    putLE16(b, 26, 1)             // planes
    putLE16(b, 28, 24)            // bpp
    putLE32(b, 30, 0)             // BI_RGB
    putLE32(b, 34, stride * height)
    putLE32(b, 38, 2835); putLE32(b, 42, 2835) // 72 DPI
    var fileRow = 0
    while (fileRow < height) {
      val y = height - 1 - fileRow  // bottom-up storage
      val base = 54 + fileRow * stride
      var x = 0
      while (x < width) {
        b(base + x * 3) = pxB(id, x, y).toByte
        b(base + x * 3 + 1) = pxG(id, x, y).toByte
        b(base + x * 3 + 2) = pxR(id, x, y).toByte
        x += 1
      }
      fileRow += 1
    }
    b
  }

  private val BmpFail = new GenericArrayData(Array.fill(8)(-1L))

  /** Parse a 24bpp BMP from its actual bytes: header fields from the
    * little-endian layout, pixel-channel sums from walking the stored
    * rows (stride and offset COMPUTED from the parsed header — any
    * misalignment between builder and parser shows up as wrong sums).
    * Returns [width, height, bpp, file_size_declared, file_size_actual,
    * sum_b, sum_g, sum_r]; all(-1) when the payload is not a bottom-up
    * uncompressed 24bpp BMP. */
  def bmpParse(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M')
      return BmpFail
    val declared = getLE32(bytes, 2)
    val pixelOff = getLE32(bytes, 10)
    val width = getLE32(bytes, 18)
    val height = getLE32(bytes, 22)
    val bpp = getLE16(bytes, 28)
    val compression = getLE32(bytes, 30)
    // Adversarial-header safety (the all(-1) contract says NEVER throw):
    // a negative pixelOff, or a width large enough that `width * 3`
    // overflows int, would pass a naive int bound check and then index
    // out of bounds inside a codegen'd expression. All offset arithmetic
    // runs in longs; width/height are additionally bounded by the byte
    // length itself (a real w×h 24bpp image needs ≥ 3wh payload bytes).
    if (width <= 0 || height <= 0 || bpp != 24 || compression != 0 ||
      pixelOff < 54 || width.toLong * height * 3L > bytes.length) return BmpFail
    // stride in Long: width*3 is bounded by bytes.length (checked above)
    // but width*3+3 can still wrap at the Int.MaxValue edge
    val strideL = ((width.toLong * 3 + 3) / 4) * 4
    if (pixelOff.toLong + strideL * height > bytes.length) return BmpFail
    val stride = strideL.toInt
    var sumB = 0L; var sumG = 0L; var sumR = 0L
    var row = 0
    while (row < height) {
      val base = pixelOff + row * stride
      var x = 0
      while (x < width) {
        sumB += bytes(base + x * 3) & 0xff
        sumG += bytes(base + x * 3 + 1) & 0xff
        sumR += bytes(base + x * 3 + 2) & 0xff
        x += 1
      }
      row += 1
    }
    new GenericArrayData(Array(width.toLong, height.toLong, bpp.toLong,
      declared.toLong, bytes.length.toLong, sumB, sumG, sumR))
  }

  private val DhashFail = new GenericArrayData(Array(0L, 0L))

  /** 64-bit perceptual dHash over a decoded 24bpp BMP — the image
    * near-dup sketch (aHash/dHash family; same role SimHash plays for
    * text). The pixel walk bins luminance into a 9-column × 8-row grid
    * (gx = x·9/w, gy = y·8/h — the integer binning the oracle replays),
    * and bit gy·8+gx is 1 iff cell (gx,gy)'s MEAN luminance is strictly
    * below its right neighbour's. Luminance is the integer ITU-R 601
    * weighting 299·R + 587·G + 114·B (unnormalized — only comparisons
    * matter). Gradient-sign bits survive small pixel noise, brightness
    * shifts, and re-encodes, which is exactly what makes dHash a
    * NEAR-dup key where md5 is an exact one.
    *
    * Mean comparison is EXACT integer arithmetic: a/b < c/d decided via
    * quotient-then-remainder (qa < qc, or qa = qc and ra·d < rc·b) — the
    * remainder cross-products are bounded by cell-count squares (≤
    * (wh/72)²), so nothing overflows Long even for gigapixel inputs,
    * where naive sum·count cross-multiplication would. A cell left empty
    * by degenerate dims (w < 9 or h < 8 cannot fill every bin)
    * contributes bit 0. Returns [ok, hash]: ok = 1 with the 64-bit hash
    * for a valid 24bpp BMP, [0, 0] otherwise (same never-throw contract
    * as [[bmpParse]]). */
  def bmpDhash(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M')
      return DhashFail
    val pixelOff = getLE32(bytes, 10)
    val width = getLE32(bytes, 18)
    val height = getLE32(bytes, 22)
    val bpp = getLE16(bytes, 28)
    val compression = getLE32(bytes, 30)
    if (width <= 0 || height <= 0 || bpp != 24 || compression != 0 ||
      pixelOff < 54 || width.toLong * height * 3L > bytes.length) return DhashFail
    val strideL = ((width.toLong * 3 + 3) / 4) * 4
    if (pixelOff.toLong + strideL * height > bytes.length) return DhashFail
    val stride = strideL.toInt
    val sums = new Array[Long](72)
    val cnts = new Array[Long](72)
    var fileRow = 0
    while (fileRow < height) {
      val y = height - 1 - fileRow // bottom-up storage → image row
      val gy = (y.toLong * 8 / height).toInt
      val base = pixelOff + fileRow * stride
      var x = 0
      while (x < width) {
        val b = bytes(base + x * 3) & 0xff
        val g = bytes(base + x * 3 + 1) & 0xff
        val r = bytes(base + x * 3 + 2) & 0xff
        val cell = gy * 9 + (x.toLong * 9 / width).toInt
        sums(cell) += 299L * r + 587L * g + 114L * b
        cnts(cell) += 1
        x += 1
      }
      fileRow += 1
    }
    var hash = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        val a = gy * 9 + gx
        val c = a + 1
        // exact a.mean < c.mean without overflow: quotient first, then
        // remainder cross-products (both < cnt, so products fit Long)
        val lt =
          if (cnts(a) == 0 || cnts(c) == 0) false
          else {
            val qa = sums(a) / cnts(a); val ra = sums(a) % cnts(a)
            val qc = sums(c) / cnts(c); val rc = sums(c) % cnts(c)
            qa < qc || (qa == qc && ra * cnts(c) < rc * cnts(a))
          }
        if (lt) hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    new GenericArrayData(Array(1L, hash))
  }

  /** Minimal ±1 pixel perturbation: bump the FIRST stored pixel's blue
    * channel by +1 mod 256 (image row height-1, column 0 — BMPs store
    * bottom-up). The near-duplicate twin generator for the image-dedup
    * gate: the change moves exactly one grid cell's luminance sum, so
    * the dHash flips AT MOST one bit (the one comparison that cell
    * participates in per row). Non-BMP payloads pass through unchanged. */
  def bmpPerturb(bytes: Array[Byte]): Array[Byte] = {
    if (bytes == null || bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M')
      return bytes
    val pixelOff = getLE32(bytes, 10)
    if (pixelOff < 54 || pixelOff >= bytes.length) return bytes
    val out = bytes.clone()
    out(pixelOff) = (((out(pixelOff) & 0xff) + 1) % 256).toByte
    out
  }

  // ---------------- WAV (RIFF/WAVE, PCM int16) ----------------

  /** Deterministic PCM sample for frame i, channel c of clip `id` —
    * mirrored symbolically by the DuckDB oracle. In [-2000, 2000]. */
  @inline private def sample(id: Long, i: Int, c: Int): Int =
    (((i * 31L + c * 17L + id) % 4001) - 2000).toInt

  /** Build a complete RIFF/WAVE file: 'fmt ' (16-byte PCM), an id-derived
    * 'LIST' junk chunk BETWEEN fmt and data (so a parser must genuinely
    * walk chunks, not assume fixed offsets), then interleaved int16 LE
    * PCM. */
  def wavSynth(id: Long, channels: Int, sampleRate: Int, frames: Int): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && frames >= 0, "wavSynth: bad params")
    val junkLen = 6 + (id % 4).toInt * 2 // even → no RIFF pad byte ambiguity
    // size arithmetic in Long (same overflow contract as bmpSynth): a
    // large-but-positive frames*channels wraps the Int product negative
    val dataBytesL = frames.toLong * channels * 2
    require(12L + (8 + 16) + (8 + junkLen) + (8 + dataBytesL) <= Int.MaxValue,
      s"wavSynth: $frames frames x $channels ch exceeds the 2 GiB single-payload bound")
    val dataBytes = dataBytesL.toInt
    val total = 12 + (8 + 16) + (8 + junkLen) + (8 + dataBytes)
    val b = new Array[Byte](total)
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    putLE32(b, 4, total - 8)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    // fmt chunk
    var o = 12
    b(o) = 'f'; b(o + 1) = 'm'; b(o + 2) = 't'; b(o + 3) = ' '
    putLE32(b, o + 4, 16)
    putLE16(b, o + 8, 1)                      // PCM
    putLE16(b, o + 10, channels)
    putLE32(b, o + 12, sampleRate)
    putLE32(b, o + 16, sampleRate * channels * 2) // byteRate
    putLE16(b, o + 20, channels * 2)          // blockAlign
    putLE16(b, o + 22, 16)                    // bits
    o += 8 + 16
    // junk LIST chunk
    b(o) = 'L'; b(o + 1) = 'I'; b(o + 2) = 'S'; b(o + 3) = 'T'
    putLE32(b, o + 4, junkLen)
    var j = 0
    while (j < junkLen) { b(o + 8 + j) = ((id + j) % 256).toByte; j += 1 }
    o += 8 + junkLen
    // data chunk
    b(o) = 'd'; b(o + 1) = 'a'; b(o + 2) = 't'; b(o + 3) = 'a'
    putLE32(b, o + 4, dataBytes)
    var i = 0
    while (i < frames) {
      var c = 0
      while (c < channels) {
        putLE16(b, o + 8 + (i * channels + c) * 2, sample(id, i, c) & 0xffff)
        c += 1
      }
      i += 1
    }
    b
  }

  private val WavFail = new GenericArrayData(Array.fill(8)(-1L))

  /** Parse a RIFF/WAVE from its actual bytes by WALKING the chunk list
    * (fmt may sit anywhere before data; unknown chunks are skipped with
    * even-size padding, per RIFF). Decodes the int16 PCM frames into a
    * sum-of-absolute-amplitudes. Returns [channels, sample_rate, bits,
    * byte_rate, block_align, data_bytes, duration_ms, sum_abs]; all(-1)
    * for anything that is not PCM-16 RIFF/WAVE. duration_ms =
    * data_bytes * 1000 / byte_rate (integer). */
  def wavParse(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length < 44 ||
      bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F' ||
      bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E')
      return WavFail
    // Chunk walk in LONG arithmetic: RIFF sizes are u32, so a size near
    // Int.MaxValue overflows `o + 8 + size` negative in ints, passes the
    // bound check, and the next iteration indexes out of bounds — the
    // all(-1) contract says NEVER throw on malformed bytes.
    var o = 12L
    var channels = -1; var rate = -1; var bits = -1; var byteRate = -1; var blockAlign = -1
    var dataOff = -1L; var dataLen = -1L
    while (o + 8 <= bytes.length && (dataOff < 0 || channels < 0)) {
      val oi = o.toInt
      val size = getLE32(bytes, oi + 4).toLong & 0xffffffffL // u32 per RIFF
      if (o + 8 + size > bytes.length) return WavFail
      if (bytes(oi) == 'f' && bytes(oi + 1) == 'm' && bytes(oi + 2) == 't' && bytes(oi + 3) == ' ') {
        if (size < 16 || getLE16(bytes, oi + 8) != 1) return WavFail // PCM only
        channels = getLE16(bytes, oi + 10)
        rate = getLE32(bytes, oi + 12)
        byteRate = getLE32(bytes, oi + 16)
        blockAlign = getLE16(bytes, oi + 20)
        bits = getLE16(bytes, oi + 22)
      } else if (bytes(oi) == 'd' && bytes(oi + 1) == 'a' && bytes(oi + 2) == 't' && bytes(oi + 3) == 'a') {
        dataOff = o + 8; dataLen = size
      }
      o += 8 + size + (size & 1) // RIFF chunks pad to even
    }
    if (channels <= 0 || rate <= 0 || bits != 16 || dataOff < 0 || byteRate <= 0)
      return WavFail
    var sumAbs = 0L
    var p = dataOff
    val end = dataOff + dataLen // both bounded ≤ bytes.length by the walk
    while (p + 1 < end) {
      val v = (getLE16(bytes, p.toInt) << 16) >> 16 // sign-extend int16
      sumAbs += math.abs(v)
      p += 2
    }
    new GenericArrayData(Array(channels.toLong, rate.toLong, bits.toLong,
      byteRate.toLong, blockAlign.toLong, dataLen,
      dataLen * 1000L / byteRate, sumAbs))
  }

  /** Shared PCM-16 locator for the fingerprint/perturb kernels: walks the
    * RIFF chunk list (same long-arithmetic bounds as [[wavParse]]) and
    * returns [channels, dataOff, dataLen], or null for anything that is
    * not PCM-16 RIFF/WAVE. [[wavParse]] keeps its own walk because it
    * also surfaces rate/byteRate/blockAlign and the all(-1) contract. */
  private def wavPcm16(bytes: Array[Byte]): Array[Long] = {
    if (bytes == null || bytes.length < 44 ||
      bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F' ||
      bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E')
      return null
    var o = 12L
    var channels = -1; var bits = -1
    var dataOff = -1L; var dataLen = -1L
    while (o + 8 <= bytes.length && (dataOff < 0 || channels < 0)) {
      val oi = o.toInt
      val size = getLE32(bytes, oi + 4).toLong & 0xffffffffL // u32 per RIFF
      if (o + 8 + size > bytes.length) return null
      if (bytes(oi) == 'f' && bytes(oi + 1) == 'm' && bytes(oi + 2) == 't' && bytes(oi + 3) == ' ') {
        if (size < 16 || getLE16(bytes, oi + 8) != 1) return null // PCM only
        channels = getLE16(bytes, oi + 10)
        bits = getLE16(bytes, oi + 22)
      } else if (bytes(oi) == 'd' && bytes(oi + 1) == 'a' && bytes(oi + 2) == 't' && bytes(oi + 3) == 'a') {
        dataOff = o + 8; dataLen = size
      }
      o += 8 + size + (size & 1) // RIFF chunks pad to even
    }
    if (channels <= 0 || bits != 16 || dataOff < 0) null
    else Array(channels.toLong, dataOff, dataLen)
  }

  /** 64-bit energy-contour fingerprint over decoded PCM — the audio
    * member of the perceptual-sketch family ([[bmpDhash]] is the image
    * one, SimHash the text one). The frame walk bins the per-frame
    * channel-summed absolute amplitude into 65 equal-share time bins
    * (bin = i·65/F, integer — the binning the oracle replays), and bit k
    * (k = 0..63) is 1 iff bin k's MEAN energy is strictly below bin
    * k+1's. Gradient-sign bits over the energy envelope survive small
    * sample noise, constant gain shifts, and container rewrites — the
    * same robustness argument as dHash's luminance gradients, in time
    * rather than space.
    *
    * Mean comparison is EXACT integer arithmetic via quotient-then-
    * remainder (identical scheme to [[bmpDhash]]): remainder cross-
    * products are bounded by bin-sample-count squares (≤ (F·ch/65)²,
    * and F·ch ≤ 2³⁰ under the 2 GiB payload bound), so nothing
    * overflows Long where naive sum·count cross-multiplication would.
    * Bins left empty by clips shorter than 65 frames contribute bit 0.
    * Returns [ok, hash]: [1, h64] for PCM-16 RIFF/WAVE, [0, 0]
    * otherwise (never throws on malformed bytes). */
  def wavEfp(bytes: Array[Byte]): ArrayData = {
    val hdr = wavPcm16(bytes)
    if (hdr == null) return DhashFail
    val channels = hdr(0).toInt
    val dataOff = hdr(1)
    val frameBytes = channels * 2L
    val frames = hdr(2) / frameBytes
    val sums = new Array[Long](65)
    val cnts = new Array[Long](65)
    var i = 0L
    while (i < frames) {
      val k = (i * 65 / frames).toInt
      val base = dataOff + i * frameBytes
      var c = 0
      while (c < channels) {
        val v = (getLE16(bytes, (base + c * 2).toInt) << 16) >> 16 // sign-extend
        sums(k) += math.abs(v)
        cnts(k) += 1
        c += 1
      }
      i += 1
    }
    var hash = 0L
    var k = 0
    while (k < 64) {
      val lt =
        if (cnts(k) == 0 || cnts(k + 1) == 0) false
        else {
          val qa = sums(k) / cnts(k); val ra = sums(k) % cnts(k)
          val qc = sums(k + 1) / cnts(k + 1); val rc = sums(k + 1) % cnts(k + 1)
          qa < qc || (qa == qc && ra * cnts(k + 1) < rc * cnts(k))
        }
      if (lt) hash |= 1L << k
      k += 1
    }
    new GenericArrayData(Array(1L, hash))
  }

  // ---------------- GVID (raw 24bpp frame sequence) ----------------
  //
  // A minimal uncompressed video container (magic 'GVID'), defined here
  // the way raw-YUV/uncompressed-AVI pipelines treat video before a codec
  // enters the picture: a fixed header plus frameCount dense 24bpp BGR
  // frames stored top-down with NO row padding (frames don't inherit
  // BMP's 4-byte stride). Compressed codecs (H.264/VP9/AV1) stay behind
  // the pluggable [[Multimodal.MediaDecoder]] boundary, exactly as
  // JPEG/MP3 do for the image/audio kernels.
  //
  // Header (28 bytes, little-endian):
  //   0  'G','V','I','D'
  //   4  version      (= 1)
  //   8  width
  //   12 height
  //   16 frame_count
  //   20 fps_milli    (frames per second × 1000)
  //   24 data_bytes   (= width·height·3·frame_count)
  // Frame f's pixel (x, y) channels are the SAME deterministic formulas
  // as the BMP kernels with a per-frame seed id + 7919·f (7919 = the
  // 1000th prime; any constant coprime-ish odd works — the oracle
  // replays it symbolically).

  @inline private def vidSeed(id: Long, f: Int): Long = id + 7919L * f

  /** Build a complete GVID file. Size arithmetic in Long (same overflow
    * contract as [[bmpSynth]]/[[wavSynth]]). */
  def vidSynth(id: Long, width: Int, height: Int, frames: Int, fpsMilli: Int): Array[Byte] = {
    require(width > 0 && height > 0 && frames >= 0 && fpsMilli > 0,
      "vidSynth: bad params")
    val frameBytesL = width.toLong * height * 3
    require(28L + frameBytesL * frames <= Int.MaxValue,
      s"vidSynth: ${width}x$height x$frames exceeds the 2 GiB single-payload bound")
    val dataBytes = (frameBytesL * frames).toInt
    val b = new Array[Byte](28 + dataBytes)
    b(0) = 'G'; b(1) = 'V'; b(2) = 'I'; b(3) = 'D'
    putLE32(b, 4, 1)
    putLE32(b, 8, width)
    putLE32(b, 12, height)
    putLE32(b, 16, frames)
    putLE32(b, 20, fpsMilli)
    putLE32(b, 24, dataBytes)
    var f = 0
    while (f < frames) {
      val sid = vidSeed(id, f)
      val fbase = 28 + f * frameBytesL.toInt
      var y = 0
      while (y < height) {
        val base = fbase + y * width * 3
        var x = 0
        while (x < width) {
          b(base + x * 3) = pxB(sid, x, y).toByte
          b(base + x * 3 + 1) = pxG(sid, x, y).toByte
          b(base + x * 3 + 2) = pxR(sid, x, y).toByte
          x += 1
        }
        y += 1
      }
      f += 1
    }
    b
  }

  private val VidFail = new GenericArrayData(Array.fill(9)(-1L))

  /** Shared header validation for the GVID kernels: returns
    * [width, height, frames, fpsMilli, dataBytes] or null. All bound
    * checks run STAGED in Long so adversarial u32 header fields (huge
    * dims whose products wrap, negative-as-unsigned sizes) fail the
    * check instead of overflowing into an out-of-bounds walk — the
    * never-throw contract of the other media kernels. */
  private def vidHeader(bytes: Array[Byte]): Array[Long] = {
    if (bytes == null || bytes.length < 28 ||
      bytes(0) != 'G' || bytes(1) != 'V' || bytes(2) != 'I' || bytes(3) != 'D' ||
      getLE32(bytes, 4) != 1) return null
    val w = getLE32(bytes, 8)
    val h = getLE32(bytes, 12)
    val fr = getLE32(bytes, 16)
    val fps = getLE32(bytes, 20)
    val declared = getLE32(bytes, 24).toLong & 0xffffffffL // u32
    if (w <= 0 || h <= 0 || fr < 0 || fps <= 0) return null
    // staged products: after `w.toLong * h > len` passes, w·h ≤ len ≤
    // 2³¹ so ·3 and then ·fr stay far under Long overflow
    if (fr > 0 && (w.toLong * h > bytes.length ||
      w.toLong * h * 3 > bytes.length)) return null
    val dataL = if (fr == 0) 0L else w.toLong * h * 3 * fr
    if (declared != dataL || 28L + dataL > bytes.length) return null
    Array(w.toLong, h.toLong, fr.toLong, fps.toLong, dataL)
  }

  /** Parse a GVID from its actual bytes: header fields from the
    * little-endian layout, per-channel pixel sums from walking every
    * stored frame. Returns [width, height, frames, fps_milli,
    * data_bytes, duration_ms, sum_b, sum_g, sum_r]; all(-1) for
    * anything that is not a well-formed GVID (wrong magic/version,
    * dims/size mismatch, truncation). duration_ms =
    * frames · 1 000 000 / fps_milli (integer). */
  def vidParse(bytes: Array[Byte]): ArrayData = {
    val hdr = vidHeader(bytes)
    if (hdr == null) return VidFail
    val w = hdr(0).toInt; val h = hdr(1).toInt; val fr = hdr(2).toInt
    var sumB = 0L; var sumG = 0L; var sumR = 0L
    var p = 28
    val end = 28 + hdr(4).toInt
    while (p < end) {
      sumB += bytes(p) & 0xff
      sumG += bytes(p + 1) & 0xff
      sumR += bytes(p + 2) & 0xff
      p += 3
    }
    new GenericArrayData(Array(w.toLong, h.toLong, fr.toLong, hdr(3),
      hdr(4), fr.toLong * 1000000L / hdr(3), sumB, sumG, sumR))
  }

  /** 64-bit perceptual video signature — the video member of the sketch
    * family (SimHash:text :: dHash:image :: energy contour:audio). Each
    * frame gets the SAME 9×8-grid gradient-sign dHash as [[bmpDhash]]
    * (frames are stored top-down, so no bottom-up flip), and signature
    * bit k is the strict MAJORITY vote of bit k across frames
    * (2·count > frames; ties → 0). Majority voting is what makes the
    * signature video-shaped: a re-encode that perturbs single frames, a
    * dropped/duplicated frame, or frame-local noise moves individual
    * frame hashes but not the vote — while dHash-per-frame alone would
    * treat every frame jitter as a new video. Mean comparisons use the
    * exact quotient-then-remainder integer scheme of [[bmpDhash]].
    * Returns [ok, hash]: [1, h64] for a well-formed GVID (a zero-frame
    * video votes all bits 0), [0, 0] otherwise; never throws. */
  def vidDhash(bytes: Array[Byte]): ArrayData = {
    val hdr = vidHeader(bytes)
    if (hdr == null) return DhashFail
    val w = hdr(0).toInt; val h = hdr(1).toInt; val fr = hdr(2).toInt
    val frameBytes = w * h * 3
    val bitCnt = new Array[Int](64)
    val sums = new Array[Long](72)
    val cnts = new Array[Long](72)
    var f = 0
    while (f < fr) {
      java.util.Arrays.fill(sums, 0L)
      java.util.Arrays.fill(cnts, 0L)
      val fbase = 28 + f * frameBytes
      var y = 0
      while (y < h) {
        val gy = (y.toLong * 8 / h).toInt
        val base = fbase + y * w * 3
        var x = 0
        while (x < w) {
          val bb = bytes(base + x * 3) & 0xff
          val g = bytes(base + x * 3 + 1) & 0xff
          val r = bytes(base + x * 3 + 2) & 0xff
          val cell = gy * 9 + (x.toLong * 9 / w).toInt
          sums(cell) += 299L * r + 587L * g + 114L * bb
          cnts(cell) += 1
          x += 1
        }
        y += 1
      }
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          val a = gy * 9 + gx
          val c = a + 1
          val lt =
            if (cnts(a) == 0 || cnts(c) == 0) false
            else {
              val qa = sums(a) / cnts(a); val ra = sums(a) % cnts(a)
              val qc = sums(c) / cnts(c); val rc = sums(c) % cnts(c)
              qa < qc || (qa == qc && ra * cnts(c) < rc * cnts(a))
            }
          if (lt) bitCnt(gy * 8 + gx) += 1
          gx += 1
        }
        gy += 1
      }
      f += 1
    }
    var hash = 0L
    var k = 0
    while (k < 64) {
      if (2 * bitCnt(k) > fr) hash |= 1L << k
      k += 1
    }
    new GenericArrayData(Array(1L, hash))
  }

  /** Minimal one-frame perturbation: bump frame 0's first pixel's blue
    * channel by +1 mod 256 — the video near-dup twin generator mirroring
    * [[bmpPerturb]]/[[wavPerturb]]. The change moves exactly one cell's
    * luminance in exactly one frame, so that frame's dHash flips AT MOST
    * one bit (bit 0 — cell (0,0)'s only comparison), so the majority
    * vote's bit-0 count moves by at most 1 and the signature flips AT
    * MOST one bit. Non-GVID or zero-frame payloads pass through
    * unchanged. */
  def vidPerturb(bytes: Array[Byte]): Array[Byte] = {
    val hdr = vidHeader(bytes)
    if (hdr == null || hdr(2) == 0) return bytes
    val out = bytes.clone()
    out(28) = (((out(28) & 0xff) + 1) % 256).toByte
    out
  }

  /** Minimal ±1 sample perturbation: bump frame 0, channel 0's int16
    * sample by +1 (mod 2¹⁶, LE in place) — the audio near-dup twin
    * generator mirroring [[bmpPerturb]]. |s+1| − |s| = ±1 for every
    * int16 including the wrap cases (32767→−32768 and −32768→−32767
    * both move the absolute amplitude by exactly 1), so exactly one
    * time bin's energy sum moves by 1 and the [[wavEfp]] fingerprint
    * flips AT MOST one bit (bit 0, the only comparison bin 0 joins).
    * Non-PCM16-WAV payloads pass through unchanged. */
  def wavPerturb(bytes: Array[Byte]): Array[Byte] = {
    val hdr = wavPcm16(bytes)
    if (hdr == null || hdr(2) < 2) return bytes
    val out = bytes.clone()
    val off = hdr(1).toInt
    val bumped = (getLE16(out, off) + 1) & 0xffff
    putLE16(out, off, bumped)
    out
  }

  // ============================================================= PNG
  // A COMPRESSED image codec in pure JDK (RFC 2083 container walk +
  // java.util.zip inflate/deflate — public knowledge end to end): the
  // proof that the [[Multimodal.MediaDecoder]] boundary carries a
  // real-world compressed format, not only the uncompressed BMP/WAV/GVID
  // containers. Same deterministic pixel formulas as [[bmpSynth]], so
  // the PNG and BMP of one id decode to IDENTICAL channel sums — the
  // cross-codec parity the spec asserts and the oracle replays.

  private def putBE32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  private def getBE32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** One chunk: length + type + data + CRC32(type||data). */
  private def pngChunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + data.length)
    putBE32(out, 0, data.length)
    var i = 0
    while (i < 4) { out(4 + i) = tpe.charAt(i).toByte; i += 1 }
    System.arraycopy(data, 0, out, 8, data.length)
    val crc = new java.util.zip.CRC32
    crc.update(out, 4, 4 + data.length)
    putBE32(out, 8 + data.length, crc.getValue.toInt)
    out
  }

  /** PNG Paeth predictor (RFC 2083 §6.6). */
  @inline private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Build a complete 8-bit truecolor PNG: IHDR, an id-derived ancillary
    * tEXt chunk BETWEEN header and data (the chunk-walk probe, like the
    * WAV junk LIST), the zlib-deflated filtered scanlines split across
    * MULTIPLE IDAT chunks (a parser that assumes one IDAT fails), IEND.
    * Every scanline uses filter type `row % 5`, so a height ≥ 5 image
    * exercises None/Sub/Up/Average/Paeth — un-filtering bugs corrupt the
    * channel sums and hash-mismatch the oracle. Pixels are the exact
    * [[bmpSynth]] formulas in TOP-DOWN row order (PNG's order; sums are
    * order-invariant, which is what the gate compares). */
  def pngSynth(id: Long, width: Int, height: Int): Array[Byte] =
    pngBuild(id, width, height, interlaced = false)

  /** [[pngSynth]] with Adam7 interlacing: the IHDR interlace byte is 1
    * and the zlib stream carries SEVEN independently-filtered
    * sub-images (empty passes omitted, per RFC 2083 §8.2). Unlike GIF's
    * row shuffle, Adam7 is observable through the TOTAL sums already:
    * filters reference within-pass neighbors, so a decoder that ignores
    * the pass structure mis-unfilters nearly every byte. */
  def pngSynthI(id: Long, width: Int, height: Int): Array[Byte] =
    pngBuild(id, width, height, interlaced = true)

  /** Adam7 pass geometry: (x0, y0, dx, dy) per pass. */
  private val Adam7 = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  private def pngBuild(id: Long, width: Int, height: Int,
                       interlaced: Boolean): Array[Byte] = {
    require(width > 0 && height > 0, "pngSynth: dims must be positive")
    val rowBytes = 3L * width
    // the guard admits whatever the DEFLATE worst-case bound below still
    // fits in one array — guard and buffer must agree, or a payload the
    // guard admits can blow the "incompressible bound" require at
    // runtime. Adam7 adds at most one filter byte per pass scanline —
    // ≤ 4·height + 14 extra bytes — covered by the same bound with a
    // small widening.
    val filtLenBound = height.toLong * (1L + rowBytes) + 4L * height + 64L
    require(filtLenBound + filtLenBound / 16383L * 5L + 64L <= Int.MaxValue.toLong,
      s"pngSynth: ${width}x$height exceeds the single-payload bound")
    val rb = rowBytes.toInt
    // unfiltered pixels, top-down (filters reference UNFILTERED
    // neighbors — RFC 2083 §6.2 — so materialize them first)
    val pix = new Array[Byte](height * rb)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = y * rb + x * 3
        pix(o) = pxR(id, x, y).toByte
        pix(o + 1) = pxG(id, x, y).toByte
        pix(o + 2) = pxB(id, x, y).toByte
        x += 1
      }
      y += 1
    }
    // filter scanlines — the whole image as one pass when sequential,
    // the seven Adam7 sub-images when interlaced. Filters reference the
    // UNFILTERED bytes of the SAME pass (prev pixel in the pass row,
    // same column of the pass's previous row); the filter type cycles
    // y%5 over a global scanline counter so every pass mixes all five.
    val passes: Array[(Int, Int, Int, Int)] =
      if (interlaced) Adam7 else Array((0, 0, 1, 1))
    val fOut = new java.io.ByteArrayOutputStream()
    var scan = 0
    passes.foreach { case (x0, y0, dx, dy) =>
      val cols = if (width > x0) (width - x0 + dx - 1) / dx else 0
      val rows = if (height > y0) (height - y0 + dy - 1) / dy else 0
      if (cols > 0 && rows > 0) {
        val prb = 3 * cols
        // the pass's unfiltered bytes, materialized row by row
        val passPix = new Array[Byte](rows * prb)
        var r = 0
        while (r < rows) {
          var c = 0
          while (c < cols) {
            val sy = y0 + r * dy; val sx = x0 + c * dx
            System.arraycopy(pix, sy * rb + sx * 3, passPix, r * prb + c * 3, 3)
            c += 1
          }
          r += 1
        }
        r = 0
        while (r < rows) {
          val ft = scan % 5
          fOut.write(ft)
          var i = 0
          while (i < prb) {
            val cur = passPix(r * prb + i) & 0xff
            val left = if (i >= 3) passPix(r * prb + i - 3) & 0xff else 0
            val up = if (r > 0) passPix((r - 1) * prb + i) & 0xff else 0
            val ul = if (r > 0 && i >= 3) passPix((r - 1) * prb + i - 3) & 0xff else 0
            val f = ft match {
              case 0 => cur
              case 1 => cur - left
              case 2 => cur - up
              case 3 => cur - ((left + up) >> 1)
              case _ => cur - paeth(left, up, ul)
            }
            fOut.write(f & 0xff)
            i += 1
          }
          scan += 1
          r += 1
        }
      }
    }
    val filtered = fOut.toByteArray
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered)
    deflater.finish()
    // standard deflate worst-case bound: stored blocks add ~5 bytes per
    // 16383-byte block (+ slack for the zlib header/trailer). A fixed
    // +1024 slack is NOT enough — stored-block overhead passes 1 KiB
    // once the filtered stream exceeds ~3.3 MB of incompressible data,
    // which the dimension guard above explicitly admits.
    val zbuf = new Array[Byte](
      filtered.length + filtered.length / 16383 * 5 + 64)
    var zlen = 0
    while (!deflater.finished()) {
      val n = deflater.deflate(zbuf, zlen, zbuf.length - zlen)
      zlen += n
      require(deflater.finished() || zlen < zbuf.length,
        "pngSynth: deflate output exceeded the incompressible bound")
    }
    deflater.end()

    val ihdr = new Array[Byte](13)
    putBE32(ihdr, 0, width); putBE32(ihdr, 4, height)
    ihdr(8) = 8  // bit depth
    ihdr(9) = 2  // color type: truecolor RGB
    // compression 0, filter 0 — already zeroed
    ihdr(12) = if (interlaced) 1 else 0
    val text = ("id\u0000" + (id % 1000)).getBytes("ISO-8859-1")
    val idats = (0 until zlen by 64).map { off =>
      pngChunk("IDAT", java.util.Arrays.copyOfRange(zbuf, off,
        math.min(off + 64, zlen)))
    }
    val parts = Seq(PngSig, pngChunk("IHDR", ihdr), pngChunk("tEXt", text)) ++
      idats :+ pngChunk("IEND", Array.emptyByteArray)
    val out = new Array[Byte](parts.map(_.length).sum)
    var o = 0
    parts.foreach { p => System.arraycopy(p, 0, out, o, p.length); o += p.length }
    out
  }

  private val PngFail = new GenericArrayData(Array.fill(7)(-1L))

  /** Parse an 8-bit truecolor PNG from its actual bytes: signature, a
    * REAL chunk walk (CRC32-verified, ancillary chunks skipped, multiple
    * IDAT payloads reassembled in order), zlib inflate, per-row
    * UN-filtering (all five RFC 2083 filter types) — pass by pass with
    * position scatter when the IHDR declares Adam7 interlacing — and
    * channel sums over the reconstructed pixels. Returns [width, height,
    * bit_depth, color_type, sum_r, sum_g, sum_b]; all(-1) for anything
    * that is not a well-formed 8-bit RGB PNG (the same never-throw
    * contract as [[bmpParse]] — corrupt CRCs, truncated streams, and
    * zip-bomb ratios all fail closed). */
  def pngParse(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length < PngSig.length + 12) return PngFail
    var i = 0
    while (i < PngSig.length) {
      if (bytes(i) != PngSig(i)) return PngFail
      i += 1
    }
    var off = PngSig.length
    var width = -1; var height = -1; var depth = -1; var ctype = -1
    var interlace = 0
    var seenEnd = false
    var idat = Array.emptyByteArray
    var idatLen = 0
    while (!seenEnd) {
      if (off + 12 > bytes.length) return PngFail
      val len = getBE32(bytes, off)
      if (len < 0 || off + 12L + len > bytes.length) return PngFail
      val crc = new java.util.zip.CRC32
      crc.update(bytes, off + 4, 4 + len)
      if (crc.getValue.toInt != getBE32(bytes, off + 8 + len)) return PngFail
      val tpe = new String(bytes, off + 4, 4, "ISO-8859-1")
      tpe match {
        case "IHDR" =>
          if (len != 13) return PngFail
          width = getBE32(bytes, off + 8)
          height = getBE32(bytes, off + 12)
          depth = bytes(off + 16) & 0xff
          ctype = bytes(off + 17) & 0xff
          // compression / filter method must be 0; interlace 0 or 1
          if (bytes(off + 18) != 0 || bytes(off + 19) != 0) return PngFail
          interlace = bytes(off + 20) & 0xff
          if (interlace > 1) return PngFail
        case "IDAT" =>
          if (idat.length < idatLen + len) {
            val grown = new Array[Byte](math.max(idatLen + len, idat.length * 2 + 64))
            System.arraycopy(idat, 0, grown, 0, idatLen)
            idat = grown
          }
          System.arraycopy(bytes, off + 8, idat, idatLen, len)
          idatLen += len
        case "IEND" => seenEnd = true
        case _ => () // ancillary (tEXt & friends): CRC-checked, skipped
      }
      off += 12 + len
    }
    if (width <= 0 || height <= 0 || depth != 8 || ctype != 2) return PngFail
    // Adam7 passes present in this image (sequential = one full pass);
    // the zlib payload is each pass's scanlines, filter byte per row
    val passes: Array[(Int, Int, Int, Int)] =
      if (interlace == 1) Adam7 else Array((0, 0, 1, 1))
    val passDims = passes.map { case (x0, y0, dx, dy) =>
      (x0, y0, dx, dy,
        if (width > x0) (width - x0 + dx - 1) / dx else 0,
        if (height > y0) (height - y0 + dy - 1) / dy else 0)
    }.filter { case (_, _, _, _, c, r) => c > 0 && r > 0 }
    val rawLenL = passDims.map { case (_, _, _, _, c, r) =>
      r.toLong * (1L + 3L * c) }.sum
    // zlib's theoretical max ratio is ~1032:1 — anything claiming more
    // is a decompression bomb, refuse before allocating
    if (rawLenL > Int.MaxValue - 8 || rawLenL > idatLen.toLong * 1032L + 64)
      return PngFail
    val raw = new Array[Byte](rawLenL.toInt)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat, 0, idatLen)
    try {
      var got = 0
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        // all input was provided upfront: a zero-progress round means a
        // truncated stream or a preset-dictionary demand — both fail
        if (n == 0) return PngFail
        got += n
      }
      if (got != raw.length) return PngFail
      // a well-formed stream ends exactly at the expected length
      if (!inflater.finished() && inflater.inflate(new Array[Byte](1)) != 0)
        return PngFail
    } catch {
      case _: java.util.zip.DataFormatException => return PngFail
    } finally inflater.end()

    // un-filter pass by pass (filters reference within-pass neighbors),
    // scattering interlaced pass pixels to their image positions
    val rb = 3 * width
    val pix = new Array[Byte](height * rb)
    var rawOff = 0
    passDims.foreach { case (x0, y0, dx, dy, cols, rows) =>
      val prb = 3 * cols
      val passPix = new Array[Byte](rows * prb)
      var r = 0
      while (r < rows) {
        val ft = raw(rawOff) & 0xff
        if (ft > 4) return PngFail
        var j = 0
        while (j < prb) {
          val f = raw(rawOff + 1 + j) & 0xff
          val left = if (j >= 3) passPix(r * prb + j - 3) & 0xff else 0
          val up = if (r > 0) passPix((r - 1) * prb + j) & 0xff else 0
          val ul = if (r > 0 && j >= 3) passPix((r - 1) * prb + j - 3) & 0xff else 0
          val v = ft match {
            case 0 => f
            case 1 => f + left
            case 2 => f + up
            case 3 => f + ((left + up) >> 1)
            case _ => f + paeth(left, up, ul)
          }
          passPix(r * prb + j) = (v & 0xff).toByte
          j += 1
        }
        var c = 0
        while (c < cols) {
          val sy = y0 + r * dy; val sx = x0 + c * dx
          System.arraycopy(passPix, r * prb + c * 3, pix, sy * rb + sx * 3, 3)
          c += 1
        }
        rawOff += 1 + prb
        r += 1
      }
    }
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var o = 0
    while (o < pix.length) {
      sumR += pix(o) & 0xff
      sumG += pix(o + 1) & 0xff
      sumB += pix(o + 2) & 0xff
      o += 3
    }
    new GenericArrayData(Array(width.toLong, height.toLong, depth.toLong,
      ctype.toLong, sumR, sumG, sumB))
  }

  // ============================================================= GIF
  // A SECOND compressed codec in pure JVM code — GIF (CompuServe 87a/89a
  // spec, public knowledge end to end) with a hand-rolled variable-width
  // LZW coder: where PNG proved the boundary carries DEFLATE, this
  // proves it carries a dictionary coder with growing code widths,
  // mid-stream dictionary resets, and the palette-indexed pixel model.
  // GIF is palette-indexed (≤256 colors), so the pixel model differs
  // from BMP/PNG's truecolor formulas by construction: the INDEX plane
  // reuses the pxB formula and the palette entries are their own
  // id-derived formulas — both pure integer arithmetic the oracle
  // replays symbolically.

  @inline private def gifIdx(id: Long, x: Int, y: Int): Int =
    ((x * 7L + y * 13L + id) % 256).toInt
  @inline private def palR(id: Long, i: Int): Int = ((i * 5L + id * 3L) % 239).toInt
  @inline private def palG(id: Long, i: Int): Int = ((i * 11L + id * 5L) % 251).toInt
  @inline private def palB(id: Long, i: Int): Int = ((i * 7L + id) % 256).toInt

  private def putLE16b(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >>> 8) & 0xff)
  }

  /** GIF-variant LZW encode of `idx` (byte symbols), minimum code size 8:
    * 9→12-bit growing codes, LSB-first bit packing, CLEAR emitted first
    * and again whenever the dictionary fills at 4096 (the spec's reset
    * protocol), EOI last. Width grows when the NEXT free code would not
    * fit — one step AFTER the decoder's (the decoder's adds lag the
    * encoder's by exactly one emission, hence its rule is
    * `nextCode == 1<<width` while ours is `== (1<<width)+1`). */
  private[multimodal] def lzwEncode(idx: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val Clear = 256; val Eoi = 257
    var acc = 0L; var nbits = 0
    var width = 9
    def put(code: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8 }
    }
    var dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = 258
    def reset(): Unit = { dict = new java.util.HashMap(); nextCode = 258; width = 9 }
    put(Clear)
    var w = -1
    var i = 0
    while (i < idx.length) {
      val k = idx(i) & 0xff
      if (w < 0) w = k
      else {
        val key = Integer.valueOf((w << 8) | k)
        val hit = dict.get(key)
        if (hit != null) w = hit.intValue()
        else {
          put(w)
          if (nextCode == 4096) { put(Clear); reset() }
          else {
            dict.put(key, Integer.valueOf(nextCode)); nextCode += 1
            if (nextCode == (1 << width) + 1 && width < 12) width += 1
          }
          w = k
        }
      }
      i += 1
    }
    if (w >= 0) put(w)
    put(Eoi)
    if (nbits > 0) out.write((acc & 0xff).toInt) // flush the partial byte
    out.toByteArray
  }

  /** Build a complete GIF89a: header, logical screen descriptor, a
    * 256-entry global color table from the palette formulas, a Graphic
    * Control Extension AND a Comment extension between screen and image
    * (the extension-walk probes, like PNG's tEXt), one non-interlaced
    * image descriptor, the LZW stream split into ≤255-byte sub-blocks,
    * trailer. Index plane = the pxB formula, so decode sums are pure
    * symbolic arithmetic over (x, y, id). */
  def gifSynth(id: Long, width: Int, height: Int): Array[Byte] =
    gifBuild(id, width, height, interlaced = false)

  /** [[gifSynth]] with the GIF87a/89a 4-pass ROW interlace: the image
    * descriptor sets the interlace flag and the LZW stream carries the
    * rows in pass order (0,8,16,… then 4,12,… then 2,6,… then odd rows).
    * The pixel FORMULAS are identical — a decoder that de-interlaces
    * correctly reconstructs the same image, which is what the parity
    * sums in [[gifParse]]'s output make observable (total channel sums
    * alone are row-permutation-invariant and would pass by accident). */
  def gifSynthI(id: Long, width: Int, height: Int): Array[Byte] =
    gifBuild(id, width, height, interlaced = true)

  /** Row emission order of a 4-pass interlaced GIF of height `h`:
    * streamRow → actual y. Identity permutation when h ≤ 1. */
  private def gifRowOrder(h: Int): Array[Int] = {
    val out = new Array[Int](h)
    var k = 0
    var pass = 0
    val starts = Array(0, 4, 2, 1); val steps = Array(8, 8, 4, 2)
    while (pass < 4) {
      var y = starts(pass)
      while (y < h) { out(k) = y; k += 1; y += steps(pass) }
      pass += 1
    }
    out
  }

  private def gifBuild(id: Long, width: Int, height: Int,
                       interlaced: Boolean): Array[Byte] = {
    require(width > 0 && height > 0, "gifSynth: dims must be positive")
    require(width <= 0xffff && height <= 0xffff &&
      width.toLong * height <= (64L << 20),
      s"gifSynth: ${width}x$height exceeds the single-payload bound")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("ISO-8859-1"))
    putLE16b(out, width); putLE16b(out, height)
    out.write(0xf7) // GCT present, color res 7, 2^(7+1)=256 entries
    out.write(0); out.write(0) // bg index, aspect
    var i = 0
    while (i < 256) {
      out.write(palR(id, i)); out.write(palG(id, i)); out.write(palB(id, i))
      i += 1
    }
    // Graphic Control Extension (89a): fixed 4-byte block
    out.write(0x21); out.write(0xf9); out.write(4)
    out.write(0); putLE16b(out, (id % 100).toInt); out.write(0); out.write(0)
    // Comment extension with an id-derived payload
    val comment = s"id ${id % 1000}".getBytes("ISO-8859-1")
    out.write(0x21); out.write(0xfe); out.write(comment.length)
    out.write(comment, 0, comment.length); out.write(0)
    // image descriptor: full-screen, no local table
    out.write(0x2c)
    putLE16b(out, 0); putLE16b(out, 0)
    putLE16b(out, width); putLE16b(out, height)
    out.write(if (interlaced) 0x40 else 0)
    out.write(8) // LZW minimum code size for 256-color data
    val rowOf: Int => Int =
      if (interlaced) { val m = gifRowOrder(height); (r: Int) => m(r) }
      else (r: Int) => r
    val idx = new Array[Byte](width * height)
    var r = 0
    while (r < height) {
      val y = rowOf(r)
      var x = 0
      while (x < width) {
        idx(r * width + x) = gifIdx(id, x, y).toByte
        x += 1
      }
      r += 1
    }
    val z = lzwEncode(idx)
    var off = 0
    while (off < z.length) {
      val n = math.min(255, z.length - off)
      out.write(n); out.write(z, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  private val GifFail = new GenericArrayData(Array.fill(9)(-1L))

  /** Parse a GIF from its actual bytes: 87a/89a header, logical screen
    * descriptor, global color table, a REAL block walk (extensions
    * skipped sub-block by sub-block), the first image's LZW stream
    * reassembled and decoded with a full variable-width decoder (9→12
    * bits, CLEAR resets, the code==next special case), 4-pass
    * de-interlacing when the image descriptor asks for it, and
    * palette-mapped channel sums. Returns [width, height, gct_size,
    * min_code_size, sum_r, sum_g, sum_b, sum_r_even, sum_r_odd] — the
    * row-parity red sums are the spatially-sensitive pair that makes
    * de-interlacing observable (total sums alone are row-permutation-
    * invariant). All(-1) for anything malformed — truncation, bad codes,
    * pixel overruns and underruns all fail closed, the same never-throw
    * contract as bmpParse/pngParse. */
  def gifParse(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length < 14) return GifFail
    val hdr = new String(bytes, 0, 6, "ISO-8859-1")
    if (hdr != "GIF87a" && hdr != "GIF89a") return GifFail
    val sw = getLE16(bytes, 6); val sh = getLE16(bytes, 8)
    val packed = bytes(10) & 0xff
    var off = 13
    var gct: Array[Byte] = null
    var gctSize = 0
    if ((packed & 0x80) != 0) {
      gctSize = 2 << (packed & 7)
      if (off + 3 * gctSize > bytes.length) return GifFail
      gct = java.util.Arrays.copyOfRange(bytes, off, off + 3 * gctSize)
      off += 3 * gctSize
    }
    // block walk to the first image descriptor
    var iw = -1; var ih = -1; var minCode = -1
    var interlaced = false
    var pal: Array[Byte] = null; var palSize = 0
    val z = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      if (off >= bytes.length) return GifFail
      (bytes(off) & 0xff) match {
        case 0x3b => // trailer before any image: malformed for our model
          if (iw < 0) return GifFail
          done = true
        case 0x21 => // extension: label + sub-blocks until terminator
          off += 2
          var n = if (off < bytes.length) bytes(off) & 0xff else return GifFail
          while (n != 0) {
            off += 1 + n
            if (off >= bytes.length) return GifFail
            n = bytes(off) & 0xff
          }
          off += 1
        case 0x2c =>
          if (iw >= 0) return GifFail // a second frame: out of contract
          if (off + 10 > bytes.length) return GifFail
          iw = getLE16(bytes, off + 5); ih = getLE16(bytes, off + 7)
          val ip = bytes(off + 9) & 0xff
          interlaced = (ip & 0x40) != 0
          off += 10
          if ((ip & 0x80) != 0) { // local color table wins over global
            palSize = 2 << (ip & 7)
            if (off + 3 * palSize > bytes.length) return GifFail
            pal = java.util.Arrays.copyOfRange(bytes, off, off + 3 * palSize)
            off += 3 * palSize
          } else { pal = gct; palSize = gctSize }
          if (off >= bytes.length) return GifFail
          minCode = bytes(off) & 0xff
          off += 1
          var n = if (off < bytes.length) bytes(off) & 0xff else return GifFail
          while (n != 0) {
            if (off + 1 + n > bytes.length) return GifFail
            z.write(bytes, off + 1, n)
            off += 1 + n
            if (off >= bytes.length) return GifFail
            n = bytes(off) & 0xff
          }
          off += 1
        case _ => return GifFail
      }
    }
    if (iw <= 0 || ih <= 0 || pal == null || minCode < 2 || minCode > 8 ||
      iw.toLong * ih > (64L << 20)) return GifFail
    if (sw < iw || sh < ih) return GifFail

    // variable-width LZW decode (LSB-first), output capped at iw*ih
    val data = z.toByteArray
    val nPix = iw * ih
    val indices = new Array[Byte](nPix)
    val Clear = 1 << minCode; val Eoi = Clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var nextCode = Eoi + 1
    var width = minCode + 1
    var acc = 0L; var nbits = 0; var pos = 0
    var outPos = 0
    var prev = -1
    var firstChar = 0
    var corrupt = false
    var eoi = false
    def read(): Int = {
      while (nbits < width && pos < data.length) {
        acc |= (data(pos) & 0xffL) << nbits
        nbits += 8; pos += 1
      }
      if (nbits < width) -1
      else {
        val c = (acc & ((1L << width) - 1)).toInt
        acc >>>= width; nbits -= width
        c
      }
    }
    while (!eoi && !corrupt) {
      val c = read()
      if (c < 0) corrupt = true
      else if (c == Clear) {
        nextCode = Eoi + 1; width = minCode + 1; prev = -1
      } else if (c == Eoi) {
        eoi = true
      } else if (prev < 0) { // first code after a clear: a literal
        if (c >= Clear || outPos >= nPix) corrupt = true
        else {
          indices(outPos) = c.toByte; outPos += 1
          firstChar = c; prev = c
        }
      } else if (c > nextCode) corrupt = true
      else {
        // expand c (or the just-about-to-exist code) onto the stack
        var sp = 0
        var cur = c
        if (c == nextCode) { stack(sp) = firstChar.toByte; sp += 1; cur = prev }
        while (cur >= Clear + 2 && sp < stack.length) {
          stack(sp) = suffix(cur); sp += 1; cur = prefix(cur)
        }
        if (cur >= Clear) { corrupt = true }
        else {
          stack(sp) = cur.toByte; sp += 1
          firstChar = cur
          if (outPos + sp > nPix) corrupt = true
          else {
            var j = sp - 1
            while (j >= 0) { indices(outPos) = stack(j); outPos += 1; j -= 1 }
            if (nextCode < 4096) {
              prefix(nextCode) = prev; suffix(nextCode) = firstChar.toByte
              nextCode += 1
              if (nextCode == (1 << width) && width < 12) width += 1
            }
            prev = c
          }
        }
      }
    }
    if (corrupt || !eoi || outPos != nPix) return GifFail

    // de-interlace through the 4-pass row map (identity otherwise);
    // total sums are row-permutation-invariant, so the row-PARITY red
    // sums are what make interlace handling observable — an interlace-
    // oblivious decoder assigns pass-2..4 rows wrong parities
    val rowOf: Int => Int =
      if (interlaced) { val m = gifRowOrder(ih); (r: Int) => m(r) }
      else (r: Int) => r
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var sumREven = 0L; var sumROdd = 0L
    var p = 0
    var streamRow = 0
    var y = rowOf(0)
    while (p < nPix) {
      val ix = indices(p) & 0xff
      if (ix >= palSize) return GifFail
      val r = pal(3 * ix) & 0xff
      sumR += r
      sumG += pal(3 * ix + 1) & 0xff
      sumB += pal(3 * ix + 2) & 0xff
      if ((y & 1) == 0) sumREven += r else sumROdd += r
      p += 1
      if (p % iw == 0 && p < nPix) { streamRow += 1; y = rowOf(streamRow) }
    }
    new GenericArrayData(Array(iw.toLong, ih.toLong, palSize.toLong,
      minCode.toLong, sumR, sumG, sumB, sumREven, sumROdd))
  }

  // ============================================================ JPEG
  // The dominant crawl format, in pure JVM code — baseline sequential
  // JPEG (ITU T.81, public spec end to end): marker walk, DQT/DHT table
  // parsing, canonical Huffman decode over the byte-stuffed entropy
  // stream, zigzag + dequant, separable IDCT, restart intervals. The
  // decoder is GENERAL for the 8-bit 4:4:4 (and grayscale) baseline
  // subset and builds its Huffman tables from the FILE's DHT segments,
  // never from shared constants — so it is not entangled with the
  // encoder below.
  //
  // The encoder exists for the oracle gate and the round-trip spec. Gate
  // exactness rides a number-theoretic choice, not a stub: with DC
  // quantization step 8, a CONSTANT 8×8 block value v has DCT
  // (8·(v−128), 0, …), quantizes to the exact integer v−128, and
  // reconstructs to exactly v through any correct IDCT — so block-
  // constant images round-trip EXACTLY through the full real pipeline
  // (Huffman, zigzag, quant, IDCT), and the oracle replays the sums
  // symbolically. The spec additionally drives the AC path with a full
  // forward-DCT encode of a non-trivial image and bounds the error.

  private val Zig: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // T.81 Annex K example Huffman tables (the spec's own published
  // tables): (bits per code length 1..16, symbol values). The decoder
  // NEVER reads these — it builds tables from the file's DHT bytes.
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).map(_.toByte).toArray
  private val DcChrBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = (0 to 11).map(_.toByte).toArray
  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)
  private val AcChrBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  // quant tables: DC step 8 (the exact-constant-block contract above),
  // AC step 16 — one for luma, one for chroma, emitted via DQT
  private val QLum: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 16)
  private val QChr: Array[Int] = QLum.clone()

  // C(u)·cos((2x+1)uπ/16), shared by the forward and inverse transforms
  // (computed once — a per-coefficient math.cos would dominate the codec)
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8)((x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16) *
      (if (u == 0) 1.0 / math.sqrt(2) else 1.0))

  /** Huffman ENCODE side of one (bits, vals) table: symbol → (code, len)
    * by the canonical T.81 assignment. */
  private def huffEncTable(bits: Array[Int], vals: Array[Byte]): Array[Int] = {
    // packed (len << 16 | code), indexed by symbol
    val out = new Array[Int](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len)) {
        out(vals(k) & 0xff) = (len << 16) | code
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L; private var n = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1)); n += len
      while (n >= 8) {
        val b = ((acc >>> (n - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0) // byte stuffing
        n -= 8
      }
    }
    /** Pad to a byte boundary with 1-bits (T.81's fill convention). */
    def align(): Unit = if (n > 0) put(0xff, 8 - n)
  }

  /** DC/AC coefficient magnitude category (number of magnitude bits). */
  @inline private def cat(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode one quantized block (natural order) into the bit stream;
    * returns the block's DC for the caller's predictor. */
  private def encodeBlock(bw: BitWriter, q: Array[Int], pred: Int,
                          dcTab: Array[Int], acTab: Array[Int]): Int = {
    val diff = q(0) - pred
    val s = cat(diff)
    val dc = dcTab(s)
    bw.put(dc & 0xffff, dc >>> 16)
    if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    var run = 0
    var zi = 1
    while (zi < 64) {
      val v = q(Zig(zi))
      if (v == 0) run += 1
      else {
        while (run >= 16) {
          val zrl = acTab(0xf0); bw.put(zrl & 0xffff, zrl >>> 16); run -= 16
        }
        val sa = cat(v)
        val code = acTab((run << 4) | sa)
        bw.put(code & 0xffff, code >>> 16)
        bw.put(if (v < 0) v + (1 << sa) - 1 else v, sa)
        run = 0
      }
      zi += 1
    }
    if (run > 0) { val eob = acTab(0); bw.put(eob & 0xffff, eob >>> 16) }
    q(0)
  }

  /** Forward 8×8 DCT (double, separable) + quantization — the general
    * encode path the round-trip spec drives; [[jpegSynth]]'s constant
    * blocks are the special case whose DC survives exactly. `px` is the
    * 64-entry block in [0, 255] natural order. */
  private def fdctQuant(px: Array[Int], qt: Array[Int]): Array[Int] = {
    val f = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var sum = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            sum += (px(y * 8 + x) - 128) * CosT(x)(u) * CosT(y)(v)
            y += 1
          }
          x += 1
        }
        f(v * 8 + u) = 0.25 * sum
        v += 1
      }
      u += 1
    }
    Array.tabulate(64)(i => math.round(f(i) / qt(i)).toInt)
  }

  /** Encode an arbitrary 3-plane YCbCr image as a baseline JPEG — SOI,
    * JFIF APP0, two DQTs, four DHTs (the spec's example tables), SOF0,
    * DRI (restart interval in MCUs, 0 = none), SOS, entropy data with
    * RSTn markers, EOI. Planes are w×h row-major in [0, 255].
    * `subsample420` emits the dominant real-world sampling: 2×2 luma
    * blocks per 16×16 MCU with the chroma planes averaged 2×2 down
    * (edge-replicated) — a chroma constant over each 16×16 macroblock
    * survives the downsample exactly, which is what keeps the synth
    * gate's constant-block contract intact under 4:2:0. */
  def jpegEncode(y: Array[Int], cb: Array[Int], cr: Array[Int],
                 w: Int, h: Int, restartInterval: Int,
                 subsample420: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff &&
      y.length == w * h && cb.length == w * h && cr.length == w * h,
      "jpegEncode: bad plane shape")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m); out.write((body.length + 2) >>> 8)
      out.write((body.length + 2) & 0xff); out.write(body, 0, body.length)
    }
    marker(0xd8) // SOI
    seg(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    def dqt(id: Int, q: Array[Int]): Array[Byte] = {
      val b = new Array[Byte](65); b(0) = id.toByte
      var i = 0
      while (i < 64) { b(1 + i) = q(Zig(i)).toByte; i += 1 } // zigzag order
      b
    }
    seg(0xdb, dqt(0, QLum)); seg(0xdb, dqt(1, QChr))
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Byte]): Array[Byte] = {
      val b = new Array[Byte](17 + vals.length)
      b(0) = ((cls << 4) | id).toByte
      var i = 1
      while (i <= 16) { b(i) = bits(i).toByte; i += 1 }
      System.arraycopy(vals, 0, b, 17, vals.length)
      b
    }
    seg(0xc4, dht(0, 0, DcLumBits, DcLumVals))
    seg(0xc4, dht(1, 0, AcLumBits, AcLumVals))
    seg(0xc4, dht(0, 1, DcChrBits, DcChrVals))
    seg(0xc4, dht(1, 1, AcChrBits, AcChrVals))
    // SOF0: 8-bit, h×w, 3 components — luma 2×2 + chroma 1×1 under
    // 4:2:0, all 1×1 under 4:4:4
    val lumaSamp: Byte = if (subsample420) 0x22 else 0x11
    seg(0xc0, Array[Byte](8,
      (h >>> 8).toByte, (h & 0xff).toByte,
      (w >>> 8).toByte, (w & 0xff).toByte, 3,
      1, lumaSamp, 0, 2, 0x11, 1, 3, 0x11, 1))
    if (restartInterval > 0)
      seg(0xdd, Array[Byte]((restartInterval >>> 8).toByte,
        (restartInterval & 0xff).toByte))
    seg(0xda, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))

    val dcLum = huffEncTable(DcLumBits, DcLumVals)
    val acLum = huffEncTable(AcLumBits, AcLumVals)
    val dcChr = huffEncTable(DcChrBits, DcChrVals)
    val acChr = huffEncTable(AcChrBits, AcChrVals)
    val bw = new BitWriter(out)
    val preds = new Array[Int](3)
    var mcu = 0; var rst = 0
    def blockOf(plane: Array[Int], pw: Int, ph: Int,
                x0: Int, y0: Int): Array[Int] = {
      // edge blocks pad by replicating the last row/column (the standard
      // encoder choice; a constant block stays constant under it)
      Array.tabulate(64) { i =>
        val x = math.min(x0 + i % 8, pw - 1); val yy = math.min(y0 + i / 8, ph - 1)
        plane(yy * pw + x)
      }
    }
    // chroma planes: full-res under 4:4:4; 2×2-averaged (edge-replicated,
    // +2 rounding) under 4:2:0 — equal samples average to themselves
    val (cw, chh) = if (subsample420) ((w + 1) / 2, (h + 1) / 2) else (w, h)
    def down(plane: Array[Int]): Array[Int] =
      if (!subsample420) plane
      else Array.tabulate(cw * chh) { i =>
        val x = (i % cw) * 2; val yy = (i / cw) * 2
        val x1 = math.min(x + 1, w - 1); val y1 = math.min(yy + 1, h - 1)
        (plane(yy * w + x) + plane(yy * w + x1) +
          plane(y1 * w + x) + plane(y1 * w + x1) + 2) / 4
      }
    val cbP = down(cb); val crP = down(cr)
    val mcuW = if (subsample420) 16 else 8
    val bx = (w + mcuW - 1) / mcuW; val by = (h + mcuW - 1) / mcuW
    var myy = 0
    while (myy < by) {
      var mx = 0
      while (mx < bx) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.align()
          marker(0xd0 + rst); rst = (rst + 1) % 8
          preds(0) = 0; preds(1) = 0; preds(2) = 0
        }
        if (subsample420) {
          // 4 luma blocks raster-ordered within the 16×16 MCU
          var bj = 0
          while (bj < 2) {
            var bi = 0
            while (bi < 2) {
              preds(0) = encodeBlock(bw, fdctQuant(
                blockOf(y, w, h, mx * 16 + bi * 8, myy * 16 + bj * 8), QLum),
                preds(0), dcLum, acLum)
              bi += 1
            }
            bj += 1
          }
        } else {
          preds(0) = encodeBlock(bw, fdctQuant(
            blockOf(y, w, h, mx * 8, myy * 8), QLum), preds(0), dcLum, acLum)
        }
        preds(1) = encodeBlock(bw, fdctQuant(
          blockOf(cbP, cw, chh, mx * 8, myy * 8), QChr), preds(1), dcChr, acChr)
        preds(2) = encodeBlock(bw, fdctQuant(
          blockOf(crP, cw, chh, mx * 8, myy * 8), QChr), preds(2), dcChr, acChr)
        mcu += 1
        mx += 1
      }
      myy += 1
    }
    bw.align()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Build a baseline 4:2:0 JPEG whose blocks are CONSTANT in YCbCr —
    * luma constant per 8×8 block, chroma constant per 16×16 MACROBLOCK
    * (so the 2×2 chroma downsample is exact) — and the full real
    * pipeline reconstructs every plane EXACTLY (the DC step-8 contract):
    * the oracle replays the sums symbolically. A restart interval
    * derived from id exercises the RSTn path under multi-block MCUs. */
  def jpegSynth(id: Long, width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, "jpegSynth: dims must be positive")
    require(width <= 0xffff && height <= 0xffff &&
      width.toLong * height <= (64L << 20),
      s"jpegSynth: ${width}x$height exceeds the single-payload bound")
    def plane(grid: Int)(f: (Long, Int, Int) => Int): Array[Int] =
      Array.tabulate(width * height)(i =>
        f(id, (i % width) / grid, (i / width) / grid))
    val y = plane(8)((i, bx, by) => ((bx * 5L + by * 17L + i * 3L) % 256).toInt)
    val cb = plane(16)((i, mx, my) => ((mx * 11L + my * 3L + i * 5L) % 256).toInt)
    val cr = plane(16)((i, mx, my) => ((mx * 7L + my * 13L + i) % 256).toInt)
    jpegEncode(y, cb, cr, width, height,
      restartInterval = (id % 3).toInt + 1, subsample420 = true)
  }

  /** File-defined AC Huffman table for the progressive encoder: all 256
    * symbols canonically coded (252 at 8 bits, 4 at 9 — Kraft slack
    * keeps the all-ones code unassigned, T.81 C.2). Annex K's baseline
    * AC tables have NO codes for the EOBn run symbols (r<<4, r=1..14)
    * progressive scans emit, so the encoder ships its own table in DHT —
    * which is also what makes the decoder's build-tables-from-the-file
    * contract load-bearing here. */
  private val FlatAcBits: Array[Int] = {
    val b = new Array[Int](17); b(8) = 252; b(9) = 4; b
  }
  private val FlatAcVals: Array[Byte] = Array.tabulate(256)(_.toByte)

  /** Encode the same 3-plane YCbCr image as a PROGRESSIVE (SOF2) JPEG —
    * T.81 Annex G spectral selection + successive approximation, the
    * scan script shaped like libjpeg's default: interleaved DC first at
    * Al=1, per-component AC first scans at Al=1 (luma split 1–5 / 6–63,
    * chroma 1–63), then one refinement scan per class (DC Ah=1, AC
    * bands Ah=1→Al=0). Every scan honors the restart interval (in that
    * scan's MCU unit — blocks, for the non-interleaved AC scans), with
    * EOB runs and their buffered correction bits flushed at each RSTn.
    * Quantized coefficients are the SAME [[fdctQuant]] blocks the
    * baseline encoder writes, so a progressive and a baseline encode of
    * one image decode to identical sums (ProgressiveJpegSpec pins it). */
  def jpegEncodeProgressive(y: Array[Int], cb: Array[Int], cr: Array[Int],
                            w: Int, h: Int, restartInterval: Int,
                            subsample420: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff &&
      y.length == w * h && cb.length == w * h && cr.length == w * h,
      "jpegEncodeProgressive: bad plane shape")
    require(w.toLong * h <= ProgPixelBound,
      s"jpegEncodeProgressive: ${w}x$h exceeds the progressive bound")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m); out.write((body.length + 2) >>> 8)
      out.write((body.length + 2) & 0xff); out.write(body, 0, body.length)
    }
    marker(0xd8)
    seg(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    def dqt(id: Int, q: Array[Int]): Array[Byte] = {
      val b = new Array[Byte](65); b(0) = id.toByte
      var i = 0
      while (i < 64) { b(1 + i) = q(Zig(i)).toByte; i += 1 }
      b
    }
    seg(0xdb, dqt(0, QLum)); seg(0xdb, dqt(1, QChr))
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Byte]): Array[Byte] = {
      val b = new Array[Byte](17 + vals.length)
      b(0) = ((cls << 4) | id).toByte
      var i = 1
      while (i <= 16) { b(i) = bits(i).toByte; i += 1 }
      System.arraycopy(vals, 0, b, 17, vals.length)
      b
    }
    seg(0xc4, dht(0, 0, DcLumBits, DcLumVals))
    seg(0xc4, dht(0, 1, DcChrBits, DcChrVals))
    seg(0xc4, dht(1, 0, FlatAcBits, FlatAcVals))
    val lumaSamp: Byte = if (subsample420) 0x22 else 0x11
    seg(0xc2, Array[Byte](8,
      (h >>> 8).toByte, (h & 0xff).toByte,
      (w >>> 8).toByte, (w & 0xff).toByte, 3,
      1, lumaSamp, 0, 2, 0x11, 1, 3, 0x11, 1))
    val ri = restartInterval
    if (ri > 0)
      seg(0xdd, Array[Byte]((ri >>> 8).toByte, (ri & 0xff).toByte))

    // quantize every block ONCE (identical geometry + padding to the
    // baseline encoder), then write the scans from the buffered blocks
    def blockOf(plane: Array[Int], pw: Int, ph: Int,
                x0: Int, y0: Int): Array[Int] =
      Array.tabulate(64) { i =>
        val x = math.min(x0 + i % 8, pw - 1)
        val yy = math.min(y0 + i / 8, ph - 1)
        plane(yy * pw + x)
      }
    val (cw, chh) = if (subsample420) ((w + 1) / 2, (h + 1) / 2) else (w, h)
    def down(plane: Array[Int]): Array[Int] =
      if (!subsample420) plane
      else Array.tabulate(cw * chh) { i =>
        val x = (i % cw) * 2; val yy = (i / cw) * 2
        val x1 = math.min(x + 1, w - 1); val y1 = math.min(yy + 1, h - 1)
        (plane(yy * w + x) + plane(yy * w + x1) +
          plane(y1 * w + x) + plane(y1 * w + x1) + 2) / 4
      }
    val cbP = down(cb); val crP = down(cr)
    val hL = if (subsample420) 2 else 1
    val bx = (w + 8 * hL - 1) / (8 * hL); val by = (h + 8 * hL - 1) / (8 * hL)
    val bwPadL = bx * hL; val bhPadL = by * hL
    val lumaQ = Array.tabulate(bwPadL * bhPadL)(i =>
      fdctQuant(blockOf(y, w, h, (i % bwPadL) * 8, (i / bwPadL) * 8), QLum))
    val cbQ = Array.tabulate(bx * by)(i =>
      fdctQuant(blockOf(cbP, cw, chh, (i % bx) * 8, (i / bx) * 8), QChr))
    val crQ = Array.tabulate(bx * by)(i =>
      fdctQuant(blockOf(crP, cw, chh, (i % bx) * 8, (i / bx) * 8), QChr))
    val dcLum = huffEncTable(DcLumBits, DcLumVals)
    val dcChr = huffEncTable(DcChrBits, DcChrVals)
    val flatAc = huffEncTable(FlatAcBits, FlatAcVals)

    def sos(comps: Seq[(Int, Int, Int)], ss: Int, se: Int,
            ah: Int, al: Int): Unit = {
      val b = new Array[Byte](1 + 2 * comps.size + 3)
      b(0) = comps.size.toByte
      comps.zipWithIndex.foreach { case ((cid, td, ta), i) =>
        b(1 + 2 * i) = cid.toByte; b(2 + 2 * i) = ((td << 4) | ta).toByte
      }
      b(1 + 2 * comps.size) = ss.toByte
      b(2 + 2 * comps.size) = se.toByte
      b(3 + 2 * comps.size) = ((ah << 4) | al).toByte
      seg(0xda, b)
    }

    // ---- interleaved DC scans (first at Al, refine at Ah = Al+1)
    def dcScan(al: Int, refine: Boolean): Unit = {
      sos(Seq((1, 0, 0), (2, 1, 0), (3, 1, 0)), 0, 0,
        if (refine) al + 1 else 0, al)
      val bw = new BitWriter(out)
      val preds = new Array[Int](3)
      var rst = 0; var mcu = 0
      def putDc(v: Int, ci: Int, tab: Array[Int]): Unit =
        if (refine) bw.put((v >> al) & 1, 1)
        else {
          val pv = v >> al // DC point transform is an ARITHMETIC shift
          val diff = pv - preds(ci); preds(ci) = pv
          val s = cat(diff)
          val c = tab(s); bw.put(c & 0xffff, c >>> 16)
          if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        }
      var my = 0
      while (my < by) {
        var mx = 0
        while (mx < bx) {
          if (ri > 0 && mcu > 0 && mcu % ri == 0) {
            bw.align(); marker(0xd0 + rst); rst = (rst + 1) % 8
            preds(0) = 0; preds(1) = 0; preds(2) = 0
          }
          var bj = 0
          while (bj < hL) {
            var bi = 0
            while (bi < hL) {
              putDc(lumaQ((my * hL + bj) * bwPadL + mx * hL + bi)(0), 0, dcLum)
              bi += 1
            }
            bj += 1
          }
          putDc(cbQ(my * bx + mx)(0), 1, dcChr)
          putDc(crQ(my * bx + mx)(0), 2, dcChr)
          mcu += 1
          mx += 1
        }
        my += 1
      }
      bw.align()
    }

    // ---- non-interleaved AC scans over the component's REAL block
    //      grid (never the MCU padding blocks — T.81 A.2.2)
    def acScan(blocks: Array[Array[Int]], gridW: Int, gridH: Int,
               padW: Int, cid: Int, ss: Int, se: Int,
               refine: Boolean, al: Int): Unit = {
      sos(Seq((cid, 0, 0)), ss, se, if (refine) al + 1 else 0, al)
      val bw = new BitWriter(out)
      var eobrun = 0
      val beBuf = new scala.collection.mutable.ArrayBuffer[Int]()
      def flushEob(): Unit = if (eobrun > 0) {
        var nb = 0; var t = eobrun
        while ({ t >>= 1; t != 0 }) nb += 1
        val c = flatAc(nb << 4); bw.put(c & 0xffff, c >>> 16)
        if (nb > 0) bw.put(eobrun - (1 << nb), nb)
        eobrun = 0
        beBuf.foreach(bw.put(_, 1)); beBuf.clear()
      }
      var rst = 0; var n = 0
      var gy = 0
      while (gy < gridH) {
        var gx = 0
        while (gx < gridW) {
          if (ri > 0 && n > 0 && n % ri == 0) {
            flushEob(); bw.align()
            marker(0xd0 + rst); rst = (rst + 1) % 8
          }
          val q = blocks(gy * padW + gx)
          if (!refine) { // AC first: point-transformed magnitudes + EOBn
            var r = 0; var k = ss
            while (k <= se) {
              val v = q(Zig(k))
              val t = if (v < 0) -((-v) >> al) else v >> al
              if (t == 0) r += 1
              else {
                flushEob()
                while (r > 15) {
                  val z = flatAc(0xf0); bw.put(z & 0xffff, z >>> 16); r -= 16
                }
                val s = cat(t)
                val c = flatAc((r << 4) | s); bw.put(c & 0xffff, c >>> 16)
                bw.put(if (t < 0) t + (1 << s) - 1 else t, s)
                r = 0
              }
              k += 1
            }
            if (r > 0) { eobrun += 1; if (eobrun == 0x7fff) flushEob() }
          } else { // AC refine: correction bits woven through placement
            var eobIdx = ss - 1 // last NEWLY-nonzero index (|v|>>al == 1)
            var k = ss
            while (k <= se) {
              if ((math.abs(q(Zig(k))) >> al) == 1) eobIdx = k
              k += 1
            }
            var r = 0
            val brBuf = new scala.collection.mutable.ArrayBuffer[Int]()
            k = ss
            while (k <= se) {
              val v = q(Zig(k)); val av = math.abs(v) >> al
              if (av == 0) { r += 1; k += 1 }
              else {
                // ZRLs not foldable into the EOB run go out NOW, each
                // carrying the correction bits buffered so far
                while (r > 15 && k <= eobIdx) {
                  flushEob()
                  val z = flatAc(0xf0); bw.put(z & 0xffff, z >>> 16); r -= 16
                  brBuf.foreach(bw.put(_, 1)); brBuf.clear()
                }
                if (av > 1) { brBuf += (av & 1); k += 1 } // history: buffer
                else {
                  flushEob()
                  val c = flatAc((r << 4) | 1); bw.put(c & 0xffff, c >>> 16)
                  bw.put(if (v < 0) 0 else 1, 1)
                  r = 0
                  brBuf.foreach(bw.put(_, 1)); brBuf.clear()
                  k += 1
                }
              }
            }
            if (r > 0 || brBuf.nonEmpty) {
              eobrun += 1; beBuf ++= brBuf
              if (eobrun == 0x7fff || beBuf.size > 900) flushEob()
            }
          }
          n += 1
          gx += 1
        }
        gy += 1
      }
      flushEob(); bw.align()
    }

    val cbwL = (w + 7) / 8; val cbhL = (h + 7) / 8
    dcScan(al = 1, refine = false)
    acScan(lumaQ, cbwL, cbhL, bwPadL, 1, 1, 5, refine = false, al = 1)
    acScan(cbQ, bx, by, bx, 2, 1, 63, refine = false, al = 1)
    acScan(crQ, bx, by, bx, 3, 1, 63, refine = false, al = 1)
    acScan(lumaQ, cbwL, cbhL, bwPadL, 1, 6, 63, refine = false, al = 1)
    dcScan(al = 0, refine = true)
    acScan(lumaQ, cbwL, cbhL, bwPadL, 1, 1, 63, refine = true, al = 0)
    acScan(cbQ, bx, by, bx, 2, 1, 63, refine = true, al = 0)
    acScan(crQ, bx, by, bx, 3, 1, 63, refine = true, al = 0)
    marker(0xd9)
    out.toByteArray
  }

  /** [[jpegSynth]]'s constant-block planes through the PROGRESSIVE
    * encoder — DC lands exactly via point transform + refinement
    * ((v>>1)<<1 | (v&1) == v in two's complement) and every AC band is
    * pure EOB runs, so the multi-scan pipeline reconstructs the planes
    * exactly and `q_media_jpeg_prog` shares the symbolic oracle. */
  def jpegSynthProg(id: Long, width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, "jpegSynthProg: dims must be positive")
    require(width <= 0xffff && height <= 0xffff &&
      width.toLong * height <= ProgPixelBound,
      s"jpegSynthProg: ${width}x$height exceeds the progressive bound")
    def plane(grid: Int)(f: (Long, Int, Int) => Int): Array[Int] =
      Array.tabulate(width * height)(i =>
        f(id, (i % width) / grid, (i / width) / grid))
    val y = plane(8)((i, bx, by) => ((bx * 5L + by * 17L + i * 3L) % 256).toInt)
    val cb = plane(16)((i, mx, my) => ((mx * 11L + my * 3L + i * 5L) % 256).toInt)
    val cr = plane(16)((i, mx, my) => ((mx * 7L + my * 13L + i) % 256).toInt)
    jpegEncodeProgressive(y, cb, cr, width, height,
      restartInterval = (id % 3).toInt + 1, subsample420 = true)
  }

  private val JpegFail = new GenericArrayData(Array.fill(7)(-1L))

  /** Canonical Huffman DECODE table built from a DHT segment's
    * (bits, vals): arrays of (minCode, maxCode, valPtr) per length. */
  private final class HuffDec(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l); k += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int =
      vals(valPtr(len) + (code - minCode(len))) & 0xff
  }

  /** Parse a baseline JPEG from its actual bytes: marker walk (APPn/COM
    * skipped, DQT/DHT/DRI/SOF0/SOS honored), Huffman tables built FROM
    * THE FILE, byte-stuffed entropy decode with restart handling, zigzag
    * + dequant + separable IDCT per block, per-plane sums over the w×h
    * crop. Supports the 8-bit baseline subset with luma sampling 1..2 ×
    * 1..2 and chroma pinned 1×1 — i.e. 4:4:4, 4:2:2, 4:4:0, 4:2:0, and
    * 1-component grayscale; SOF2 progressive delegates to the
    * multi-scan path ([[jpegParseProgressive]], same sampling subset);
    * everything else — 12-bit, hierarchical/arithmetic SOFs,
    * chroma-subsampled-beyond-1×1, bad codes, truncation, pixel
    * overruns — fails closed. Returns
    * [width, height, n_components, restart_interval, sum_y, sum_cb,
    * sum_cr] (grayscale: cb/cr sums 0). */
  def jpegParse(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length < 4) return JpegFail
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return JpegFail
    var off = 2
    val qtabs = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffDec](4)
    val acTabs = new Array[HuffDec](4)
    var w = -1; var h = -1; var nc = -1
    var ri = 0
    // per component: quant table id, dc/ac table ids, sampling factors
    val compQ = new Array[Int](3); val compDc = new Array[Int](3)
    val compAc = new Array[Int](3)
    val compH = new Array[Int](3); val compV = new Array[Int](3)
    var sosAt = -1
    while (sosAt < 0) {
      if (off + 4 > bytes.length) return JpegFail
      if ((bytes(off) & 0xff) != 0xff) return JpegFail
      val m = bytes(off + 1) & 0xff
      if (m == 0xd9) return JpegFail // EOI before any scan
      val len = ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      if (len < 2 || off + 2 + len > bytes.length) return JpegFail
      val body = off + 4
      val bodyLen = len - 2
      m match {
        case 0xdb => // DQT: one or more 8-bit tables
          var p = body
          while (p < body + bodyLen) {
            val pq = (bytes(p) & 0xff) >>> 4
            val tq = bytes(p) & 0x0f
            if (pq != 0 || tq > 3 || p + 65 > body + bodyLen) return JpegFail
            val q = new Array[Int](64)
            var i = 0
            while (i < 64) { q(Zig(i)) = bytes(p + 1 + i) & 0xff; i += 1 }
            qtabs(tq) = q
            p += 65
          }
        case 0xc4 => // DHT: one or more tables
          var p = body
          while (p < body + bodyLen) {
            if (p + 17 > body + bodyLen) return JpegFail
            val cls = (bytes(p) & 0xff) >>> 4
            val id = bytes(p) & 0x0f
            if (cls > 1 || id > 3) return JpegFail
            val bits = new Array[Int](17)
            var total = 0
            var i = 1
            while (i <= 16) {
              bits(i) = bytes(p + i) & 0xff; total += bits(i); i += 1
            }
            if (total > 256 || p + 17 + total > body + bodyLen) return JpegFail
            val vals = java.util.Arrays.copyOfRange(bytes, p + 17, p + 17 + total)
            val t = new HuffDec(bits, vals)
            if (cls == 0) dcTabs(id) = t else acTabs(id) = t
            p += 17 + total
          }
        case 0xc0 => // SOF0 baseline
          if (bodyLen < 6) return JpegFail
          if ((bytes(body) & 0xff) != 8) return JpegFail
          h = ((bytes(body + 1) & 0xff) << 8) | (bytes(body + 2) & 0xff)
          w = ((bytes(body + 3) & 0xff) << 8) | (bytes(body + 4) & 0xff)
          nc = bytes(body + 5) & 0xff
          if ((nc != 1 && nc != 3) || bodyLen < 6 + 3 * nc) return JpegFail
          var c = 0
          while (c < nc) {
            val samp = bytes(body + 7 + 3 * c) & 0xff
            compH(c) = samp >>> 4; compV(c) = samp & 0x0f
            // supported sampling: luma 1..2 × 1..2 (covers 4:4:4, 4:2:2,
            // 4:4:0, 4:2:0), chroma strictly 1×1; grayscale 1×1
            val ok =
              if (c == 0) compH(0) >= 1 && compH(0) <= 2 &&
                compV(0) >= 1 && compV(0) <= 2 && (nc == 3 || samp == 0x11)
              else samp == 0x11
            if (!ok) return JpegFail
            compQ(c) = bytes(body + 8 + 3 * c) & 0x0f
            c += 1
          }
        case 0xc2 => // SOF2 progressive: the multi-scan path
          return jpegParseProgressive(bytes)
        case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
             0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return JpegFail // other non-baseline SOFs: unsupported subset
        case 0xdd =>
          if (bodyLen < 2) return JpegFail
          ri = ((bytes(body) & 0xff) << 8) | (bytes(body + 1) & 0xff)
        case 0xda =>
          if (w < 0) return JpegFail
          val ns = bytes(body) & 0xff
          if (ns != nc || bodyLen < 1 + 2 * ns + 3) return JpegFail
          var c = 0
          while (c < ns) {
            compDc(c) = (bytes(body + 2 + 2 * c) & 0xff) >>> 4
            compAc(c) = bytes(body + 2 + 2 * c) & 0x0f
            c += 1
          }
          sosAt = body + bodyLen
        case _ => () // APPn, COM, others: skipped
      }
      off += 2 + len
    }
    if (w <= 0 || h <= 0 || w.toLong * h > (64L << 20)) return JpegFail
    var c = 0
    while (c < nc) {
      if (qtabs(compQ(c)) == null || dcTabs(compDc(c)) == null ||
        acTabs(compAc(c)) == null) return JpegFail
      c += 1
    }

    // entropy decode from sosAt: MSB-first bits, 0xFF00 unstuffed, RSTn
    var pos = sosAt
    var acc = 0L; var nbits = 0
    var truncated = false
    def fill(): Unit =
      while (nbits <= 56 && pos < bytes.length && !truncated) {
        val b = bytes(pos) & 0xff
        if (b == 0xff) {
          val nb = if (pos + 1 < bytes.length) bytes(pos + 1) & 0xff else -1
          if (nb == 0) { acc = (acc << 8) | 0xff; nbits += 8; pos += 2 }
          else return // a real marker: stop feeding bits
        } else { acc = (acc << 8) | b; nbits += 8; pos += 1 }
      }
    def bit(): Int = {
      if (nbits == 0) fill()
      if (nbits == 0) { truncated = true; 0 }
      else { nbits -= 1; ((acc >>> nbits) & 1L).toInt }
    }
    def bitsN(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def huff(t: HuffDec): Int = {
      var code = bit(); var l = 1
      while (l <= 16 && (t.maxCode(l) < 0 || code > t.maxCode(l))) {
        code = (code << 1) | bit(); l += 1
      }
      if (l > 16 || truncated) { truncated = true; 0 }
      else t.value(l, code)
    }
    @inline def extend(v: Int, s: Int): Int =
      if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

    // MCU geometry from the sampling factors: hMax/vMax are the luma
    // factors (chroma is pinned 1×1 above), so one MCU spans
    // 8·hMax × 8·vMax pixels and carries hc·vc blocks per component
    val hMax = compH(0); val vMax = compV(0)
    val bx = (w + 8 * hMax - 1) / (8 * hMax)
    val by = (h + 8 * vMax - 1) / (8 * vMax)
    val sums = new Array[Long](3)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    val preds = new Array[Int](3)
    var mcu = 0
    var myy = 0
    while (myy < by && !truncated) {
      var mx = 0
      while (mx < bx && !truncated) {
        if (ri > 0 && mcu > 0 && mcu % ri == 0) {
          // byte-align, expect RSTn, reset predictors
          nbits -= nbits % 8
          fill()
          if (pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff &&
            (bytes(pos + 1) & 0xff) >= 0xd0 && (bytes(pos + 1) & 0xff) <= 0xd7) {
            pos += 2; acc = 0L; nbits = 0
            preds(0) = 0; preds(1) = 0; preds(2) = 0
          } else return JpegFail
        }
        var comp = 0
        while (comp < nc && !truncated) {
          val hc = compH(comp); val vc = compV(comp)
          // a subsampled component's sample covers scaleX×scaleY pixels;
          // its sum contribution is the sample value × covered CROP area
          // (upsample-then-sum, without materializing the upsample)
          val scaleX = hMax / hc; val scaleY = vMax / vc
          var bj = 0
          while (bj < vc && !truncated) {
            var bi = 0
            while (bi < hc && !truncated) {
              java.util.Arrays.fill(coef, 0)
              val s = huff(dcTabs(compDc(comp)))
              if (s > 11) return JpegFail
              preds(comp) += extend(bitsN(s), s)
              coef(0) = preds(comp)
              var zi = 1
              while (zi < 64 && !truncated) {
                val rs = huff(acTabs(compAc(comp)))
                val r = rs >>> 4; val sa = rs & 0x0f
                if (sa == 0) {
                  if (r == 15) zi += 16 // ZRL
                  else zi = 64          // EOB
                } else {
                  zi += r
                  if (zi > 63) return JpegFail
                  coef(Zig(zi)) = extend(bitsN(sa), sa)
                  zi += 1
                }
              }
              // dequant + separable IDCT + level shift, summed over the
              // crop with per-sample pixel coverage
              val qt = qtabs(compQ(comp))
              var i = 0
              while (i < 64) { tmp(i) = coef(i).toDouble * qt(i); i += 1 }
              var x = 0
              while (x < 8) {
                var yy = 0
                while (yy < 8) {
                  val sx = (mx * hc + bi) * 8 + x
                  val sy = (myy * vc + bj) * 8 + yy
                  val px0 = sx * scaleX; val py0 = sy * scaleY
                  val cov = (math.min(px0 + scaleX, w) - px0).max(0).toLong *
                    (math.min(py0 + scaleY, h) - py0).max(0).toLong
                  if (cov > 0) {
                    var sum = 0.0
                    var u = 0
                    while (u < 8) {
                      var v = 0
                      while (v < 8) {
                        sum += CosT(x)(u) * CosT(yy)(v) * tmp(v * 8 + u)
                        v += 1
                      }
                      u += 1
                    }
                    val pix = math.round(sum / 4.0 + 128.0)
                    sums(comp) += math.max(0L, math.min(255L, pix)) * cov
                  }
                  yy += 1
                }
                x += 1
              }
              bi += 1
            }
            bj += 1
          }
          comp += 1
        }
        mcu += 1
        mx += 1
      }
      myy += 1
    }
    if (truncated) return JpegFail
    new GenericArrayData(Array(w.toLong, h.toLong, nc.toLong, ri.toLong,
      sums(0), sums(1), sums(2)))
  }

  // ------------------------------------------------------------------
  // Progressive JPEG (SOF2, ITU T.81 Annex G): spectral selection +
  // successive approximation over the SAME Huffman / zigzag / quant /
  // IDCT machinery as the baseline path. Unlike baseline's one-pass
  // streaming decode, progressive coefficients accumulate across scans,
  // so the decoder buffers every block's 64 coefficients and runs the
  // IDCT once after the last scan — the memory shape every real
  // progressive decoder has, which is why [[ProgPixelBound]] is tighter
  // than the baseline bound.
  // ------------------------------------------------------------------

  /** Progressive decode buffers ~4·w·h bytes of coefficients for luma
    * alone; 16 Mpx keeps the transient under ~100 MB per payload. */
  private val ProgPixelBound = 16L << 20

  /** MSB-first bit reader over byte-stuffed entropy data — the baseline
    * decoder's inline reader as a class, so each progressive scan gets a
    * fresh bit state over the shared byte cursor. */
  private final class JpegBits(bytes: Array[Byte], var pos: Int) {
    private var acc = 0L
    private var nbits = 0
    var truncated = false
    private def fill(): Unit = {
      var stop = false
      while (nbits <= 56 && pos < bytes.length && !truncated && !stop) {
        val b = bytes(pos) & 0xff
        if (b == 0xff) {
          val nb = if (pos + 1 < bytes.length) bytes(pos + 1) & 0xff else -1
          if (nb == 0) { acc = (acc << 8) | 0xff; nbits += 8; pos += 2 }
          else stop = true // a real marker: stop feeding bits
        } else { acc = (acc << 8) | b; nbits += 8; pos += 1 }
      }
    }
    def bit(): Int = {
      if (nbits == 0) fill()
      if (nbits == 0) { truncated = true; 0 }
      else { nbits -= 1; ((acc >>> nbits) & 1L).toInt }
    }
    def bitsN(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def huff(t: HuffDec): Int = {
      var code = bit(); var l = 1
      while (l <= 16 && (t.maxCode(l) < 0 || code > t.maxCode(l))) {
        code = (code << 1) | bit(); l += 1
      }
      if (l > 16 || truncated) { truncated = true; 0 }
      else t.value(l, code)
    }
    /** Byte-align, consume the expected RSTn, reset bit state. False on
      * anything else (fail-closed like the baseline path). */
    def expectRst(): Boolean = {
      nbits -= nbits % 8
      fill()
      if (pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff &&
        (bytes(pos + 1) & 0xff) >= 0xd0 && (bytes(pos + 1) & 0xff) <= 0xd7) {
        pos += 2; acc = 0L; nbits = 0
        true
      } else false
    }
    /** Drop buffered bits and advance the byte cursor to the next real
      * marker (skipping stuffing and stray RSTn) — scan epilogue. */
    def seekMarker(): Int = {
      acc = 0L; nbits = 0
      var p = pos
      var done = false
      while (!done && p + 1 < bytes.length) {
        val b = bytes(p) & 0xff
        val nb = bytes(p + 1) & 0xff
        if (b == 0xff && nb != 0 && !(nb >= 0xd0 && nb <= 0xd7)) done = true
        else p += 1
      }
      pos = p
      p
    }
  }

  /** Parse a PROGRESSIVE (SOF2) JPEG: marker walk with inter-scan table
    * redefinition, all four scan kinds of T.81 G.2 — DC first (point
    * transform), DC refinement (one raw bit), AC first (EOBn run codes,
    * ZRL, spectral bands), AC refinement (correction bits woven through
    * zero-run placement) — restart-interval resets in every scan kind,
    * then one dequant + IDCT + coverage-sum pass over the accumulated
    * coefficients. Sampling subset and return shape match [[jpegParse]];
    * 12-bit, arithmetic coding, hierarchical, bad codes, truncation, and
    * pixel overruns fail closed. */
  private def jpegParseProgressive(bytes: Array[Byte]): ArrayData = {
    var off = 2
    val qtabs = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffDec](4)
    val acTabs = new Array[HuffDec](4)
    var w = -1; var h = -1; var nc = -1
    var ri = 0
    val compId = new Array[Int](3)
    val compQ = new Array[Int](3)
    val compH = new Array[Int](3); val compV = new Array[Int](3)
    // per-component coefficient planes (natural order within a block),
    // over the PADDED MCU grid; non-interleaved scans address only the
    // component's real cbw×cbh sub-grid
    var coefs: Array[Array[Int]] = null
    var bwPad: Array[Int] = null; var bhPad: Array[Int] = null
    var cbw: Array[Int] = null; var cbh: Array[Int] = null
    var bx = 0; var by = 0
    var sawScan = false
    var eoi = false
    while (!eoi) {
      if (off + 2 > bytes.length) return JpegFail
      if ((bytes(off) & 0xff) != 0xff) return JpegFail
      val m = bytes(off + 1) & 0xff
      if (m == 0xd9) { eoi = true }
      else {
        if (off + 4 > bytes.length) return JpegFail
        val len = ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
        if (len < 2 || off + 2 + len > bytes.length) return JpegFail
        val body = off + 4
        val bodyLen = len - 2
        off += 2 + len
        m match {
          case 0xdb =>
            var p = body
            while (p < body + bodyLen) {
              val pq = (bytes(p) & 0xff) >>> 4
              val tq = bytes(p) & 0x0f
              if (pq != 0 || tq > 3 || p + 65 > body + bodyLen) return JpegFail
              val q = new Array[Int](64)
              var i = 0
              while (i < 64) { q(Zig(i)) = bytes(p + 1 + i) & 0xff; i += 1 }
              qtabs(tq) = q
              p += 65
            }
          case 0xc4 =>
            var p = body
            while (p < body + bodyLen) {
              if (p + 17 > body + bodyLen) return JpegFail
              val cls = (bytes(p) & 0xff) >>> 4
              val id = bytes(p) & 0x0f
              if (cls > 1 || id > 3) return JpegFail
              val bits = new Array[Int](17)
              var total = 0
              var i = 1
              while (i <= 16) {
                bits(i) = bytes(p + i) & 0xff; total += bits(i); i += 1
              }
              if (total > 256 || p + 17 + total > body + bodyLen) return JpegFail
              val vals = java.util.Arrays.copyOfRange(bytes, p + 17, p + 17 + total)
              val t = new HuffDec(bits, vals)
              if (cls == 0) dcTabs(id) = t else acTabs(id) = t
              p += 17 + total
            }
          case 0xc2 =>
            if (coefs != null || bodyLen < 6) return JpegFail
            if ((bytes(body) & 0xff) != 8) return JpegFail
            h = ((bytes(body + 1) & 0xff) << 8) | (bytes(body + 2) & 0xff)
            w = ((bytes(body + 3) & 0xff) << 8) | (bytes(body + 4) & 0xff)
            nc = bytes(body + 5) & 0xff
            if ((nc != 1 && nc != 3) || bodyLen < 6 + 3 * nc) return JpegFail
            if (w <= 0 || h <= 0 || w.toLong * h > ProgPixelBound)
              return JpegFail
            var c = 0
            while (c < nc) {
              compId(c) = bytes(body + 6 + 3 * c) & 0xff
              val samp = bytes(body + 7 + 3 * c) & 0xff
              compH(c) = samp >>> 4; compV(c) = samp & 0x0f
              val ok =
                if (c == 0) compH(0) >= 1 && compH(0) <= 2 &&
                  compV(0) >= 1 && compV(0) <= 2 && (nc == 3 || samp == 0x11)
                else samp == 0x11
              if (!ok) return JpegFail
              compQ(c) = bytes(body + 8 + 3 * c) & 0x0f
              c += 1
            }
            val hMax = compH(0); val vMax = compV(0)
            bx = (w + 8 * hMax - 1) / (8 * hMax)
            by = (h + 8 * vMax - 1) / (8 * vMax)
            coefs = new Array[Array[Int]](nc)
            bwPad = new Array[Int](nc); bhPad = new Array[Int](nc)
            cbw = new Array[Int](nc); cbh = new Array[Int](nc)
            c = 0
            while (c < nc) {
              bwPad(c) = bx * compH(c); bhPad(c) = by * compV(c)
              val cw = (w * compH(c) + hMax - 1) / hMax
              val ch = (h * compV(c) + vMax - 1) / vMax
              cbw(c) = (cw + 7) / 8; cbh(c) = (ch + 7) / 8
              coefs(c) = new Array[Int](bwPad(c) * bhPad(c) * 64)
              c += 1
            }
          case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
               0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return JpegFail // only pure SOF2 files take this path
          case 0xdd =>
            if (bodyLen < 2) return JpegFail
            ri = ((bytes(body) & 0xff) << 8) | (bytes(body + 1) & 0xff)
          case 0xda =>
            if (coefs == null) return JpegFail
            val ns = bytes(body) & 0xff
            if (ns < 1 || ns > nc || bodyLen < 1 + 2 * ns + 3) return JpegFail
            val scanComp = new Array[Int](ns)
            val scanDc = new Array[Int](ns); val scanAc = new Array[Int](ns)
            var i = 0
            while (i < ns) {
              val cs = bytes(body + 1 + 2 * i) & 0xff
              var idx = -1
              var c = 0
              while (c < nc) { if (compId(c) == cs) idx = c; c += 1 }
              if (idx < 0) return JpegFail
              scanComp(i) = idx
              scanDc(i) = (bytes(body + 2 + 2 * i) & 0xff) >>> 4
              scanAc(i) = bytes(body + 2 + 2 * i) & 0x0f
              i += 1
            }
            val ss = bytes(body + 1 + 2 * ns) & 0xff
            val se = bytes(body + 2 + 2 * ns) & 0xff
            val ahAl = bytes(body + 3 + 2 * ns) & 0xff
            val ah = ahAl >>> 4; val al = ahAl & 0x0f
            // progressive scan-header algebra (T.81 G.1.1.1.1): DC scans
            // are Ss=Se=0 and the only ones that may interleave; AC
            // scans are single-component bands; refinement steps one bit
            if (ss > 63 || se > 63 || se < ss || al > 13) return JpegFail
            if (ss == 0 && se != 0) return JpegFail
            if (ss > 0 && ns != 1) return JpegFail
            if (ah != 0 && ah != al + 1) return JpegFail
            val next = decodeProgScan(bytes, body + bodyLen, ns, scanComp,
              scanDc, scanAc, ss, se, ah, al, ri, bx, by, nc,
              compH, compV, dcTabs, acTabs, coefs, bwPad, cbw, cbh)
            if (next < 0) return JpegFail
            off = next
            sawScan = true
          case _ => ()
        }
      }
    }
    if (coefs == null || !sawScan) return JpegFail
    var c = 0
    while (c < nc) {
      if (qtabs(compQ(c)) == null) return JpegFail
      c += 1
    }
    // one dequant + IDCT + coverage-sum pass over the accumulated
    // coefficients — identical arithmetic to the baseline path, so a
    // progressive and a baseline encode of the same quantized blocks
    // produce identical sums (ProgressiveJpegSpec pins that)
    val hMax = compH(0); val vMax = compV(0)
    val sums = new Array[Long](3)
    val tmp = new Array[Double](64)
    c = 0
    while (c < nc) {
      val qt = qtabs(compQ(c))
      val scaleX = hMax / compH(c); val scaleY = vMax / compV(c)
      val plane = coefs(c)
      var gby = 0
      while (gby < bhPad(c)) {
        var gbx = 0
        while (gbx < bwPad(c)) {
          val base = (gby * bwPad(c) + gbx) * 64
          var i = 0
          while (i < 64) { tmp(i) = plane(base + i).toDouble * qt(i); i += 1 }
          var x = 0
          while (x < 8) {
            var yy = 0
            while (yy < 8) {
              val sx = gbx * 8 + x
              val sy = gby * 8 + yy
              val px0 = sx * scaleX; val py0 = sy * scaleY
              val cov = (math.min(px0 + scaleX, w) - px0).max(0).toLong *
                (math.min(py0 + scaleY, h) - py0).max(0).toLong
              if (cov > 0) {
                var sum = 0.0
                var u = 0
                while (u < 8) {
                  var v = 0
                  while (v < 8) {
                    sum += CosT(x)(u) * CosT(yy)(v) * tmp(v * 8 + u)
                    v += 1
                  }
                  u += 1
                }
                val pix = math.round(sum / 4.0 + 128.0)
                sums(c) += math.max(0L, math.min(255L, pix)) * cov
              }
              yy += 1
            }
            x += 1
          }
          gbx += 1
        }
        gby += 1
      }
      c += 1
    }
    new GenericArrayData(Array(w.toLong, h.toLong, nc.toLong, ri.toLong,
      sums(0), sums(1), sums(2)))
  }

  /** Entropy-decode ONE progressive scan into the coefficient planes.
    * Returns the byte offset of the next marker, or -1 on any malformed
    * input (fail-closed). */
  private def decodeProgScan(bytes: Array[Byte], entStart: Int, ns: Int,
      scanComp: Array[Int], scanDc: Array[Int], scanAc: Array[Int],
      ss: Int, se: Int, ah: Int, al: Int, ri: Int, bx: Int, by: Int,
      nc: Int, compH: Array[Int], compV: Array[Int],
      dcTabs: Array[HuffDec], acTabs: Array[HuffDec],
      coefs: Array[Array[Int]], bwPad: Array[Int],
      cbw: Array[Int], cbh: Array[Int]): Int = {
    val br = new JpegBits(bytes, entStart)
    @inline def extend(v: Int, s: Int): Int =
      if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    val preds = new Array[Int](ns)
    var eobrun = 0
    val p1 = 1 << al
    val m1 = -1 << al

    // ---- per-block decoders over coefs(comp)(blockBase + natural idx)
    def dcFirst(si: Int, base: Int): Boolean = {
      val t = dcTabs(scanDc(si))
      if (t == null) return false
      val s = br.huff(t)
      if (s > 11 || br.truncated) return false
      preds(si) += extend(br.bitsN(s), s)
      coefs(scanComp(si))(base) = preds(si) << al
      !br.truncated
    }
    def dcRefine(si: Int, base: Int): Boolean = {
      if (br.bit() == 1) {
        val plane = coefs(scanComp(si))
        plane(base) = plane(base) | p1
      }
      !br.truncated
    }
    def acFirst(plane: Array[Int], base: Int, acTab: HuffDec): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      var k = ss
      var ok = true
      var done = false
      while (k <= se && ok && !done) {
        val rs = br.huff(acTab)
        val r = rs >>> 4; val s = rs & 0x0f
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else {
            eobrun = (1 << r) - 1 + (if (r > 0) br.bitsN(r) else 0)
            done = true
          }
        } else {
          k += r
          if (k > se) ok = false
          else {
            plane(base + Zig(k)) = extend(br.bitsN(s), s) << al
            k += 1
          }
        }
        if (br.truncated) ok = false
      }
      ok
    }
    def acRefine(plane: Array[Int], base: Int, acTab: HuffDec): Boolean = {
      var k = ss
      var ok = true
      if (eobrun == 0) {
        var done = false
        while (k <= se && ok && !done) {
          val rs = br.huff(acTab)
          if (br.truncated) { ok = false }
          else {
            var r = rs >>> 4; val s = rs & 0x0f
            var newval = 0
            if (s == 0) {
              if (r < 15) {
                eobrun = (1 << r) + (if (r > 0) br.bitsN(r) else 0)
                done = true
              }
              // r == 15: ZRL — skip 16 zero-history slots below
            } else if (s != 1) ok = false
            else newval = if (br.bit() == 1) p1 else m1
            if (ok && !done) {
              // advance past r zero-history coefficients, weaving the
              // correction bit of every nonzero-history one on the way
              var placed = false
              while (k <= se && ok && !placed) {
                val c0 = plane(base + Zig(k))
                if (c0 != 0) {
                  if (br.bit() == 1 && (c0 & p1) == 0)
                    plane(base + Zig(k)) = c0 + (if (c0 >= 0) p1 else m1)
                  k += 1
                } else {
                  r -= 1
                  if (r < 0) placed = true else k += 1
                }
                if (br.truncated) ok = false
              }
              if (ok) {
                if (newval != 0) {
                  if (k > se) ok = false
                  else plane(base + Zig(k)) = newval
                }
                k += 1
              }
            }
          }
        }
      }
      if (ok && eobrun > 0) {
        // the EOB run still owes correction bits for every nonzero-
        // history coefficient left in the band
        while (k <= se && ok) {
          val c0 = plane(base + Zig(k))
          if (c0 != 0 && br.bit() == 1 && (c0 & p1) == 0)
            plane(base + Zig(k)) = c0 + (if (c0 >= 0) p1 else m1)
          if (br.truncated) ok = false
          k += 1
        }
        if (ok) eobrun -= 1
      }
      ok && !br.truncated
    }

    // ---- MCU walk: interleaved (DC) over bx×by MCUs, or the single
    //      component's REAL cbw×cbh block grid (non-interleaved scans
    //      never code the MCU-alignment padding blocks — T.81 A.2.2)
    val (mcusX, mcusY) =
      if (ns > 1) (bx, by)
      else (cbw(scanComp(0)), cbh(scanComp(0)))
    var mcu = 0
    var ok = true
    var my = 0
    while (my < mcusY && ok) {
      var mx = 0
      while (mx < mcusX && ok) {
        if (ri > 0 && mcu > 0 && mcu % ri == 0) {
          if (!br.expectRst()) ok = false
          else {
            java.util.Arrays.fill(preds, 0)
            eobrun = 0
          }
        }
        if (ok) {
          if (ns > 1) {
            // interleaved DC MCU: hc×vc blocks per scan component
            var si = 0
            while (si < ns && ok) {
              val c = scanComp(si)
              val hc = compH(c); val vc = compV(c)
              var bj = 0
              while (bj < vc && ok) {
                var bi = 0
                while (bi < hc && ok) {
                  val base =
                    (((my * vc + bj) * bwPad(c)) + (mx * hc + bi)) * 64
                  ok = if (ah == 0) dcFirst(si, base) else dcRefine(si, base)
                  bi += 1
                }
                bj += 1
              }
              si += 1
            }
          } else {
            val c = scanComp(0)
            val base = (my * bwPad(c) + mx) * 64
            ok =
              if (ss == 0)
                if (ah == 0) dcFirst(0, base) else dcRefine(0, base)
              else {
                val t = acTabs(scanAc(0))
                if (t == null) false
                else if (ah == 0) acFirst(coefs(c), base, t)
                else acRefine(coefs(c), base, t)
              }
          }
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    if (!ok || br.truncated) -1 else br.seekMarker()
  }
}
