package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row sketch kernels shared by the interpreted (`eval`) and generated
  * (`doGenCode`) paths of [[SketchExpressions]]. Generated code calls these
  * as static one-liners, so whole-stage codegen stays intact (no
  * CodegenFallback barrier) while janino never sees the loop bodies — the
  * JVM JIT compiles them once. */
object SketchKernels {

  def minhashSignature(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashLong(h, i)
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  def simhash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counters = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counters(i) += 1 else counters(i) -= 1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (counters(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  def shingleHashes(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.TreeSet[java.lang.Long]()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val sep = UTF8String.fromString(" ")
    if (n < k) {
      seen.add(hashUtf8(UTF8String.concatWs(sep, toks: _*)))
    } else {
      var s = 0
      while (s <= n - k) {
        val win = java.util.Arrays.copyOfRange(toks, s, s + k)
        seen.add(hashUtf8(UTF8String.concatWs(sep, win: _*)))
        s += 1
      }
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  private def hashUtf8(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)

  /** Whether the code point is a token character — EXACTLY the class
    * `[\p{L}\p{N}]` of the regex tokenizer this kernel replaces:
    * `Character.isLetter` is the Unicode L* categories, and the three
    * number categories are Nd / Nl / No. */
  private def isTokenChar(cp: Int): Boolean =
    Character.isLetter(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
        t == Character.OTHER_NUMBER
    }

  /** CJK code points that tokenize PER CODE POINT (r16): Han ideographs
    * (Unified + Ext A, Ext B–F, Compatibility) plus Hiragana/Katakana.
    * Unsegmented scripts carry no spaces, so a run tokenizer would make
    * an entire Chinese/Japanese sentence ONE token and silently degrade
    * BM25/dedup/n-gram quality on multilingual corpora; per-ideograph
    * tokens (character unigrams — the standard IR baseline for CJK,
    * cf. Lucene's CJK handling) restore meaningful term statistics and
    * make shingles character n-grams. Hangul stays run-based: Korean
    * text IS space-segmented. The leading `>= 0x3040` test keeps the
    * ASCII/Latin hot path at one compare. */
  private def isCjkChar(cp: Int): Boolean =
    cp >= 0x3040 && (
      cp <= 0x30FF ||                      // Hiragana + Katakana
      (cp >= 0x31F0 && cp <= 0x31FF) ||    // Katakana Phonetic Extensions
      (cp >= 0x3400 && cp <= 0x4DBF) ||    // CJK Ext A
      (cp >= 0x4E00 && cp <= 0x9FFF) ||    // CJK Unified Ideographs
      (cp >= 0xF900 && cp <= 0xFAFF) ||    // CJK Compatibility Ideographs
      (cp >= 0x20000 && cp <= 0x2EBEF))    // CJK Ext B–F

  /** Drop-in for `filter(split(s, "[^\\p{L}\\p{N}]+"), length(t) > 0)`
    * EXTENDED with per-code-point CJK emission ([[isCjkChar]]): every
    * maximal run of non-CJK letter/number code points, in order, with
    * each CJK code point its own token. The regex split allocates a
    * matcher + empty-string artifacts per row and (being driven through
    * an interpreted higher-order `filter`) breaks whole-stage codegen;
    * this is one compiled scan. Property-tested equivalent to the
    * CJK-aware regex reference (TokenizeSpec). */
  def tokenize(in: UTF8String): ArrayData = {
    val s = in.toString
    val n = s.length
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    var start = -1
    while (i < n) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      if (isTokenChar(cp)) {
        if (isCjkChar(cp)) {
          if (start >= 0) { out.add(UTF8String.fromString(s.substring(start, i))); start = -1 }
          out.add(UTF8String.fromString(s.substring(i, i + w)))
        } else if (start < 0) start = i
      }
      else if (start >= 0) { out.add(UTF8String.fromString(s.substring(start, i))); start = -1 }
      i += w
    }
    if (start >= 0) out.add(UTF8String.fromString(s.substring(start, n)))
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size())))
  }

  /** One 64-bit hash per LSH band: band j = XXH64-chained over signature
    * slots [j*rows, (j+1)*rows). Replaces an interpreted
    * `transform(sequence, i => hash(slice(sig, ...)))` — band keying only
    * needs slice-equality ⇒ hash-equality, which any per-band hash gives;
    * 64-bit output halves accidental bucket collisions vs murmur3-int. */
  def bandHashes(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var i = 0
      while (i < rows) { h = XXH64.hashLong(sig.getLong(b * rows + i), h); i += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  /** xxhash64 (Spark's default seed 42) of every token — drop-in for
    * `transform(toks, t => xxhash64(t))` without the per-element
    * interpreted lambda dispatch. */
  /** One 64-bit hash per element; a null element hashes to the seed,
    * matching xxhash64(null) under the transform() these kernels replace
    * (callers pass arbitrary array columns, e.g. minhashSignature over
    * user shingles). THE token-identity convention — every sketch that
    * hashes tokens must route through here or gram/shingle identities
    * silently desynchronize. */
  private def tokenHashArray(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      out(i) = if (s == null) 42L else hashUtf8(s)
      i += 1
    }
    out
  }

  def tokenHashes(arr: ArrayData): ArrayData =
    new GenericArrayData(tokenHashArray(arr))

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  // "0:" .. "255:" prefix bytes, allocated once — the per-hash seed prefix
  // of the oracle-portable family (hash i of shingle s = md5("i:" || s)).
  private val md5SeedPrefix: Array[Array[Byte]] =
    Array.tabulate(256)(i => s"$i:".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Oracle-portable MinHash signature over STRING shingles: slot i is the
    * minimum over shingles s of the first 60 bits of `md5("i:" || s)` —
    * bit-equal to the SQL form
    * `conv(substring(md5(concat('i:', s)), 1, 15), 16, 10)` (the first 15
    * hex chars of a big-endian digest are its leading 8 bytes shifted
    * right 4), which is what an independent engine recomputes. One digest
    * per (slot, shingle) is inherent to the family; this kernel removes
    * everything else the HOF chain paid per element — 32 separate
    * interpreted `transform` passes, hex-string materialization, and
    * base-16 string parsing via `conv` (measured 12.2 s → sub-second on
    * the 50 k-doc sf1 probe corpus). Empty array → Long.MaxValue slots;
    * null elements are skipped (SQL md5(null) is null and array_min
    * ignores nulls). */
  def md5MinhashSignature(arr: ArrayData, numHashes: Int): ArrayData = {
    require(numHashes <= 256, "md5 minhash family is seeded 0..255")
    val n = arr.numElements()
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    val md = md5Digest.get()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        val sb = s.getBytes
        var i = 0
        while (i < numHashes) {
          md.reset()
          md.update(md5SeedPrefix(i))
          md.update(sb)
          val d = md.digest()
          val v = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
            ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
            ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
            ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
          if (v < out(i)) out(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  def charStats(in: UTF8String): ArrayData = {
    val s = in.toString
    var letters = 0L; var digits = 0L; var punct = 0L; var ws = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (Character.isLetter(c)) letters += 1
      else if (Character.isDigit(c)) digits += 1
      else if (Character.isWhitespace(c)) ws += 1
      else if (!Character.isISOControl(c)) punct += 1
      i += 1
    }
    new GenericArrayData(Array(n.toLong, letters, digits, punct, ws))
  }

  /** Repetition stats over the token `n`-grams in ONE pass straight from
    * the token array: [total, distinct, maxFreq]. Window identity is the
    * XXH64 chain over the windows' token hashes (order-sensitive,
    * injective up to 64-bit collision — the same trade every sketch here
    * makes). A document shorter than the window contributes one
    * whole-text gram. The frequency map is per-row and bounded by the
    * gram count — no shuffle, no gram-array materialization. */
  def ngramRepStats(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    val th = tokenHashArray(toks)
    val total = if (cnt <= n) 1 else cnt - n + 1
    val freq = new java.util.HashMap[java.lang.Long, Int](Math.max(16, total * 2))
    var maxFreq = 0
    var g = 0
    while (g < total) {
      var h = 42L
      var j = g
      val end = Math.min(g + n, cnt)
      while (j < end) {
        h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(th(j), h)
        j += 1
      }
      val c = freq.merge(java.lang.Long.valueOf(h), 1, (a, b) => a + b)
      if (c > maxFreq) maxFreq = c
      g += 1
    }
    new GenericArrayData(Array(total.toLong, freq.size().toLong, maxFreq.toLong))
  }

  def hyperplaneSig(arr: ArrayData, planes: Array[Array[Double]]): Long = {
    val d = arr.numElements()
    val v = new Array[Double](d)
    var i = 0
    while (i < d) { v(i) = arr.getDouble(i); i += 1 }
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var dotv = 0.0
      var j = 0
      val lim = math.min(d, plane.length)
      while (j < lim) { dotv += v(j) * plane(j); j += 1 }
      if (dotv > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }
}

/** Serializable marker-profile scorer referenced from generated code
  * (`ctx.addReferenceObj`) — carries the prebuilt marker hash sets. */
final class LangProfilesKernel(profiles: Seq[(String, Seq[String])])
    extends Serializable {
  @transient private lazy val names: Array[UTF8String] =
    profiles.map(p => UTF8String.fromString(p._1)).toArray
  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    profiles.map { case (_, markers) =>
      val s = new java.util.HashSet[UTF8String]()
      markers.foreach(m => s.add(UTF8String.fromString(m)))
      s
    }.toArray
  @transient private lazy val und = UTF8String.fromString("und")

  def score(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val counts = new Array[Int](sets.length)
    var j = 0
    while (j < n) {
      val t = arr.getUTF8String(j)
      var i = 0
      while (i < sets.length) {
        if (sets(i).contains(t)) counts(i) += 1
        i += 1
      }
      j += 1
    }
    var best = -1; var bestN = 0
    var i = 0
    while (i < counts.length) {
      if (counts(i) > bestN) { bestN = counts(i); best = i }
      i += 1
    }
    if (best < 0) und else names(best)
  }
}
