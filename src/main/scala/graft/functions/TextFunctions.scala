package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, built entirely
  * from codegen'd Spark expressions (no UDFs — every function here stays
  * inside whole-stage codegen and scales linearly with the scan).
  *
  * Beyond-reference surface (BASELINE.json north star): language ID,
  * quality scoring, token counting, document fingerprinting.
  */
object TextFunctions {

  /** Lowercased word tokens — one compiled scan
    * ([[SketchExpressions.Tokenize]]), exactly equivalent to
    * `filter(split(lower(trim(c)), "[^\\p{L}\\p{N}]+"), length(t) > 0)`
    * (property-tested in TokenizeSpec) but inside whole-stage codegen:
    * the HOF `filter` is CodegenFallback and split pays a regex matcher
    * per row, which made tokenization the hottest interpreted path of
    * every text query. */
  def tokens(c: Column): Column =
    SketchExpressions.tokenize(lower(trim(c)))

  /** Whitespace token count — the fast path used for budget accounting.
    * Edges are trimmed with a REGEX (`trim` strips only spaces in both
    * Spark and DuckDB — a doc starting with `\n` would otherwise split
    * into a phantom leading empty token and overcount by one; caught by
    * GopherPropertySpec's randomized parity). */
  def tokenCount(c: Column): Column = {
    val t = wsTrim(c)
    when(length(t) === 0, lit(0)).otherwise(size(split(t, wsClass + "+")))
  }

  /** The whitespace class, written out EXPLICITLY as RE2's `\s`
    * (`[\t\n\f\r ]`): Java's `\s` additionally matches `\x0B` (vertical
    * tab), so a bare `\\s` here would disagree with every DuckDB oracle
    * on documents containing one. */
  private[graft] val wsClass = "[ \\t\\n\\f\\r]"

  /** Trim ALL whitespace (not just spaces — `trim` strips only spaces in
    * both engines) off both ends. Oracle mirror:
    * `regexp_replace(x, '^\s+|\s+$', '', 'g')` — DuckDB needs the 'g'
    * flag or only the FIRST alternation match is replaced. */
  def wsTrim(c: Column): Column =
    regexp_replace(c, s"^$wsClass+|$wsClass+$$", "")

  /** BPE-ish subword count estimate: words are split at letter/digit
    * boundaries and long words contribute ceil(len/4) pieces — a
    * deterministic proxy for a real tokenizer's piece count. */
  def bpeishTokenCount(c: Column): Column =
    aggregate(tokens(c), lit(0),
      (acc, t) => acc + greatest(lit(1), ceil(length(t) / lit(4.0)).cast("int")))

  /** Ratio of punctuation characters to total characters (0 for empty). */
  def punctRatio(c: Column): Column = {
    val len = length(c)
    when(len === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "[^\\p{Punct}]", "")).cast("double") / len)
  }

  /** Ratio of digit characters to total characters. */
  def digitRatio(c: Column): Column = {
    val len = length(c)
    when(len === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "[^0-9]", "")).cast("double") / len)
  }

  private val englishStopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "it", "this", "that", "be")

  /** Fraction of tokens that are (English) stopwords — a fluency signal;
    * natural text sits roughly in [0.2, 0.6], keyword spam near 0. */
  def stopwordRatio(c: Column, stopwords: Seq[String] = englishStopwords): Column = {
    val toks = tokens(c)
    val sw = array(stopwords.map(lit): _*)
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks))
  }

  /** Mean token length (0 for empty docs). */
  def meanTokenLen(c: Column): Column = {
    val toks = tokens(c)
    when(size(toks) === 0, lit(0.0))
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /** Composite quality score in [0,1] — Gopher-style cheap filters folded
    * into one signal: length in range, sane mean word length, low
    * punctuation/digit noise, plausible stopword density. */
  def qualityScore(c: Column): Column = qualityScoreStaged(c, tokens(c))

  /** Quality score over a pre-tokenized column — the hot-path variant used
    * by [[graft.operators.Curation.annotate]]: character ratios come from
    * ONE [[SketchExpressions.CharStats]] pass (no regexp_replace string
    * rebuilds) and the token array is computed once upstream. */
  def qualityScoreStaged(c: Column, toks: Column): Column = {
    val nTok = tokenCount(c)
    val lenOk = when(nTok.between(10, 100000), lit(1.0))
      .when(nTok.between(3, 9), lit(0.5)).otherwise(lit(0.0))
    val stats = SketchExpressions.charStats(c) // [total, letters, digits, punct, ws]
    val total = element_at(stats, 1)
    val punctR = when(total === 0, lit(0.0))
      .otherwise(element_at(stats, 4).cast("double") / total)
    val digitR = when(total === 0, lit(0.0))
      .otherwise(element_at(stats, 3).cast("double") / total)
    val mwl = when(size(toks) === 0, lit(0.0))
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
    val sw = array(englishStopwords.map(lit): _*)
    val swR = when(size(toks) === 0, lit(0.0))
      .otherwise(size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks))
    val mwlOk = when(mwl.between(2.5, 10.0), lit(1.0)).otherwise(lit(0.3))
    val punctOk = when(punctR < 0.2, lit(1.0)).otherwise(lit(0.0))
    val digitOk = when(digitR < 0.3, lit(1.0)).otherwise(lit(0.0))
    val swOk = when(swR.between(0.05, 0.7), lit(1.0)).otherwise(lit(0.3))
    round((lenOk * 0.3 + mwlOk * 0.2 + punctOk * 0.2 + digitOk * 0.1 + swOk * 0.2), 4)
  }

  /** Marker-word profiles for the n-gram/stopword language heuristic.
    * Small by design — the point is the operator shape (array scoring +
    * argmax), the profile data is swappable. */
  val defaultProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "are"),
    "fr" -> Seq("le", "la", "les", "des", "une", "est", "dans", "pour", "que", "sur"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "sich"),
    "es" -> Seq("el", "los", "las", "una", "es", "que", "para", "con", "por", "del"))

  /** Language ID: CJK script detection by codepoint range, otherwise the
    * profile with the highest marker-token frequency (ties → first profile
    * in sorted order); "und" when no profile scores. The scoring is one
    * custom-expression pass over the token array
    * ([[SketchExpressions.LangScore]]) — one interpreted filter per
    * profile was the second-hottest path in the sf0.1 bench. */
  def langId(c: Column, profiles: Map[String, Seq[String]] = defaultProfiles): Column =
    langIdStaged(c, tokens(c), profiles)

  /** Language ID over a pre-tokenized column (see [[qualityScoreStaged]]). */
  def langIdStaged(c: Column, toks: Column,
                   profiles: Map[String, Seq[String]] = defaultProfiles): Column =
    when(c.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .otherwise(SketchExpressions.langScore(toks, profiles.toSeq.sortBy(_._1)))

  /** Canonical-form document fingerprint: 64-bit hash of the
    * whitespace/punctuation-normalized lowercased text — exact-dup key
    * robust to formatting noise. */
  def fingerprint(c: Column): Column = fingerprintStaged(tokens(c))

  /** Fingerprint over a pre-tokenized column. */
  def fingerprintStaged(toks: Column): Column =
    xxhash64(concat_ws(" ", toks))

  /** HTML page → its main training text ([[HtmlKernels]]): markup
    * stripped, script/style payloads dropped, entities decoded, blocks
    * segmented, and jusText-style boilerplate (link-dense navigation,
    * sub-3-word headlines) removed — the crawl pipeline's step zero as a
    * codegen'd scan-side column. */
  def htmlToText(c: Column): Column = HtmlExpressions.htmlText(c)

  /** HTML page → [n_blocks, n_kept, n_drop_link, n_drop_short,
    * kept_chars] — the extraction audit counters next to [[htmlToText]]. */
  def htmlStats(c: Column): Column = HtmlExpressions.htmlStats(c)

  /** Oracle-portable canonical fingerprint: md5 hex of the same canonical
    * form [[fingerprint]] hashes. The xxhash64 variant is the production
    * fast path (8 bytes, codegen'd, no hex string); this one exists so the
    * fingerprinting CONTRACT — tokenize, single-space join, hash — is
    * cross-checkable against an independent engine (md5 is bit-identical
    * everywhere; xxhash64 has no DuckDB twin). */
  def fingerprintPortable(c: Column): Column =
    fingerprintPortableStaged(tokens(c))

  /** Portable fingerprint over a pre-tokenized column (stage the tokens
    * behind a [[Barrier.evalOnce]] when several fingerprint flavors read
    * the same text — CollapseProject would otherwise re-inline the
    * tokenize regex into every consumer). */
  def fingerprintPortableStaged(toks: Column): Column =
    md5(concat_ws(" ", toks))

  /** Oracle-portable winnowed fingerprint: lexicographic min over the md5
    * hex strings of every `window`-token shingle (hex is ASCII, so string
    * min agrees across engines) — the portable twin of
    * [[winnowFingerprint]]'s min-xxhash64. */
  def winnowFingerprintPortable(c: Column, window: Int = 5): Column =
    winnowFingerprintPortableStaged(tokens(c), window)

  /** Winnowed portable fingerprint over a pre-tokenized column. */
  def winnowFingerprintPortableStaged(toks: Column, window: Int = 5): Column = {
    val n = size(toks)
    val rolled = when(n < window, array(md5(concat_ws(" ", toks))))
      .otherwise(transform(sequence(lit(0), n - lit(window)),
        i => md5(concat_ws(" ", slice(toks, i + 1, lit(window))))))
    array_min(rolled)
  }

  /** Rolling (Rabin-Karp-style) window fingerprints: hash of every
    * `window`-token shingle — the winnowing substrate for near-dup and
    * containment detection. */
  def rollingFingerprints(c: Column, window: Int = 5): Column = {
    val toks = tokens(c)
    val n = size(toks)
    when(n < window, array(xxhash64(concat_ws(" ", toks))))
      .otherwise(transform(sequence(lit(0), n - lit(window)),
        i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(window))))))
  }

  /** Winnowed fingerprint: min rolling hash — one representative per doc. */
  def winnowFingerprint(c: Column, window: Int = 5): Column =
    array_min(rollingFingerprints(c, window))

  /** Linear-bucket histogram key: `width_bucket` shape used by the
    * reference's duration histograms (`runner/locator.ts:47-50`). */
  def widthBucket(c: Column, lo: Double, hi: Double, buckets: Int): Column =
    when(c < lo, lit(0))
      .when(c >= hi, lit(buckets + 1))
      .otherwise(floor((c - lit(lo)) / lit((hi - lo) / buckets)).cast("int") + 1)

  /** Gopher/MassiveText intra-document repetition signals in ONE pass:
    * `[total, distinct, maxFreq]` over the token `n`-grams. Duplicate-gram
    * fraction is `(total - distinct) / total`; top-gram coverage is
    * `maxFreq / total` — the repetition gates of quality filtering,
    * computed per row with a bounded frequency map (no per-doc groupBy,
    * no O(k²) HOF count, no shuffle). */
  def repetitionStats(c: Column, n: Int = 3): Column =
    SketchExpressions.ngramRepStats(tokens(c), n)

  // ---------------- PII scrubbing ----------------

  /** Conservative PII patterns, written in the common subset of Java
    * regex and RE2 (no backreferences, no lookaround) so the same pattern
    * text runs identically in Spark's codegen'd `regexp_replace` and in
    * external engines. Deliberately precision-leaning: a training-data
    * scrub that eats prose is worse than one that misses an oddly
    * formatted phone number. */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern: String = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
  val ipv4Pattern: String = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Redact emails, phone numbers, and IPv4 addresses — a pure
    * `regexp_replace` chain, fully codegen'd, no shuffle: the scan-speed
    * scrub pass a corpus pipeline runs before anything else. */
  def scrubPii(c: Column, replacement: String = "<PII>"): Column = {
    val r = lit(replacement)
    regexp_replace(
      regexp_replace(
        regexp_replace(c, lit(emailPattern), r),
        lit(phonePattern), r),
      lit(ipv4Pattern), r)
  }
}
