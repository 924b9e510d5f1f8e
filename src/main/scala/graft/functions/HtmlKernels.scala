package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → training-text extraction — the crawl pipeline's step zero.
  *
  * A web corpus (Common Crawl and friends) arrives as HTML, and every
  * published curation pipeline (C4, CCNet, RefinedWeb) starts by reducing
  * each page to its main text: strip markup, drop script/style payloads,
  * decode character entities, segment into blocks, and discard boilerplate
  * (navigation, footers) before any quality or dedup signal is computed.
  * This kernel is that step as a single per-row byte walk: no DOM is
  * built, memory is O(page), and the whole thing runs inside whole-stage
  * codegen via [[HtmlExpressions]] — at 100 TB the extraction cost is one
  * linear scan of the payload bytes, embarrassingly parallel.
  *
  * The contract (deliberately deterministic so a symbolic oracle can
  * replay it):
  *
  *   - `<script> <style> <noscript> <template> <svg> <iframe>` are
  *     dropped WITH their contents (a fake `</p>` inside a JS string must
  *     not terminate anything — the scan jumps to the matching close tag,
  *     case-insensitively).
  *   - comments `<!-- … -->`, doctype `<!…>`, and processing
  *     instructions `<?…>` are dropped; an unterminated comment drops the
  *     rest of the page (fail-closed, like the media codecs).
  *   - block-level tags (`p div h1…h6 li ul ol table tr td br …`) end the
  *     current text block; inline tags (`a b i em strong span …` and any
  *     unknown tag) contribute nothing. Tag names are case-insensitive;
  *     attribute values may contain `>` inside quotes.
  *   - character entities decode inline: the named core
  *     (`&amp; &lt; &gt; &quot; &apos; &nbsp;`) plus numeric decimal
  *     `&#NN;` and hex `&#xHH;`. An unrecognized or malformed entity
  *     stays literal text. Decoding happens DURING the scan, so a decoded
  *     `<` is plain text and is never re-parsed as a tag.
  *   - a `<` that does not start a tag, comment, or declaration is
  *     literal text.
  *
  * Each non-empty block is whitespace-normalized (runs of whitespace —
  * including NBSP — collapse to one space, ends trimmed) and then the
  * jusText-style boilerplate rule keeps it only if
  *
  *   words >= 3  AND  linkDensity <= 0.5
  *
  * where linkDensity = non-whitespace chars inside `<a>` / non-whitespace
  * chars of the block. Navigation bars and footers are nearly 100% link
  * text, so the density test removes them without any site-specific
  * rules; headlines shorter than three words go with the word floor.
  *
  * [[htmlSynth]] is the gate-side twin: it wraps a document's text into a
  * full adversarial page (script with fake tags, styles, comments, a nav
  * and a footer of pure links, uppercase tags, attributes containing `>`,
  * inline markup mid-paragraph, and every supported entity form) whose
  * correct extraction is a closed-form function of the original token
  * list — which is what the DuckDB oracle computes symbolically.
  */
object HtmlKernels {

  /** Tags whose open/close ends the current text block. */
  private val BlockTags: Set[String] = Set(
    "html", "head", "body", "title", "p", "div", "section", "article",
    "header", "footer", "nav", "aside", "main", "ul", "ol", "li", "dl",
    "dt", "dd", "table", "thead", "tbody", "tfoot", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "br", "hr",
    "form", "fieldset", "figure", "figcaption", "address")

  /** Elements removed together with everything inside them. */
  private val DropTags: Set[String] = Set(
    "script", "style", "noscript", "template", "svg", "iframe")

  /** One extracted block: normalized text plus the link-density inputs. */
  final case class Block(text: String, nonWs: Int, linkNonWs: Int) {
    def words: Int = if (text.isEmpty) 0 else {
      var n = 1; var i = 0
      while (i < text.length) { if (text.charAt(i) == ' ') n += 1; i += 1 }
      n
    }
    def linkDensity: Double =
      if (nonWs == 0) 0.0 else linkNonWs.toDouble / nonWs
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r' ||
      c == '\u000B' || c == '\u00A0'

  /** Parse + segment: the single-pass scan described above. Never throws
    * on malformed input — recovery rules are part of the contract. */
  def blocks(html: String): IndexedSeq[Block] = {
    val out = IndexedSeq.newBuilder[Block]
    val raw = new java.lang.StringBuilder(128)
    var linkDepth = 0
    var rawLink = 0 // non-ws chars appended while inside <a>

    def flush(): Unit = {
      // collapse whitespace runs, trim ends, count non-ws chars
      val norm = new java.lang.StringBuilder(raw.length)
      var nonWs = 0
      var pendingSpace = false
      var i = 0
      while (i < raw.length) {
        val c = raw.charAt(i)
        if (isWs(c)) { if (norm.length > 0) pendingSpace = true }
        else {
          if (pendingSpace) { norm.append(' '); pendingSpace = false }
          norm.append(c); nonWs += 1
        }
        i += 1
      }
      if (norm.length > 0)
        out += Block(norm.toString, nonWs, math.min(rawLink, nonWs))
      raw.setLength(0)
      rawLink = 0
    }

    def appendText(c: Char): Unit = {
      raw.append(c)
      if (linkDepth > 0 && !isWs(c)) rawLink += 1
    }
    def appendCp(cp0: Int): Unit = {
      // WHATWG maps numeric references in the surrogate range to U+FFFD
      // — Character.isValidCodePoint(0xD800) is TRUE, and appending an
      // unpaired surrogate would make the string ill-formed UTF-16
      // (UTF8String.fromString would encode invalid UTF-8 bytes)
      val cp = if (cp0 >= 0xD800 && cp0 <= 0xDFFF) 0xFFFD else cp0
      if (Character.isValidCodePoint(cp) && cp != 0) {
        if (cp <= Char.MaxValue) appendText(cp.toChar)
        else {
          // surrogate pair: count as ONE char toward link density
          raw.appendCodePoint(cp)
          if (linkDepth > 0) rawLink += 1
        }
      }
    }

    val n = if (html == null) 0 else html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!' && html.regionMatches(i + 1, "!--", 0, 3)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3 // unterminated → drop the rest
        } else if (c1 == '!' || c1 == '?') {
          val end = html.indexOf('>', i + 1)
          i = if (end < 0) n else end + 1
        } else if (c1.isLetter || (c1 == '/' && i + 2 < n &&
            html.charAt(i + 2).isLetter)) {
          val closing = c1 == '/'
          var j = i + (if (closing) 2 else 1)
          val nameStart = j
          while (j < n && (html.charAt(j).isLetter || html.charAt(j).isDigit))
            j += 1
          val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
          // scan to the tag's real '>' honoring quoted attribute values
          var quote = 0.toChar
          while (j < n && (quote != 0 || html.charAt(j) != '>')) {
            val cj = html.charAt(j)
            if (quote != 0) { if (cj == quote) quote = 0 }
            else if (cj == '"' || cj == '\'') quote = cj
            j += 1
          }
          val tagEnd = if (j < n) j + 1 else n
          if (!closing && DropTags.contains(name)) {
            // skip to the matching close tag, case-insensitively
            var k = tagEnd
            var found = -1
            while (found < 0 && k < n) {
              val cand = html.indexOf('<', k)
              if (cand < 0 || cand + name.length + 2 > n) k = n
              else if (html.charAt(cand + 1) == '/' &&
                  html.regionMatches(true, cand + 2, name, 0, name.length) &&
                  // the name must END here — '</scripts>' is not the close
                  // of <script>; only '>', whitespace, or '/' may follow
                  (cand + 2 + name.length >= n || {
                    val after = html.charAt(cand + 2 + name.length)
                    after == '>' || after == '/' || isWs(after)
                  }))
                found = cand
              else k = cand + 1
            }
            if (found < 0) i = n // unterminated → fail-closed on the rest
            else {
              val gt = html.indexOf('>', found)
              i = if (gt < 0) n else gt + 1
            }
            if (BlockTags.contains(name)) flush()
          } else {
            if (name == "a") {
              if (closing) linkDepth = math.max(0, linkDepth - 1)
              else linkDepth += 1
            }
            if (BlockTags.contains(name)) flush()
            i = tagEnd
          }
        } else { appendText(c); i += 1 } // literal '<'
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        val lim = i + 12
        if (semi > i && semi <= lim) {
          val ent = html.substring(i + 1, semi)
          val decoded: Int = ent match {
            case "amp"  => '&'
            case "lt"   => '<'
            case "gt"   => '>'
            case "quot" => '"'
            case "apos" => '\''
            case "nbsp" => ' '
            case _ if ent.length > 1 && ent.charAt(0) == '#' =>
              val num = ent.substring(1)
              try {
                if ((num.charAt(0) == 'x' || num.charAt(0) == 'X') &&
                    num.length > 1)
                  Integer.parseInt(num.substring(1), 16)
                else Integer.parseInt(num)
              } catch { case _: NumberFormatException => -1 }
            case _ => -1
          }
          if (decoded >= 0) { appendCp(decoded); i = semi + 1 }
          else { appendText(c); i += 1 } // unknown entity stays literal
        } else { appendText(c); i += 1 }
      } else { appendText(c); i += 1 }
    }
    flush()
    out.result()
  }

  /** Decode the entity subset the text walk understands, for attribute
    * values (WHATWG decodes character references in attributes too —
    * `href="a&amp;b"` means `a&b`). Unknown entities stay literal. */
  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val lim = i + 12
        if (semi > i && semi <= lim) {
          val ent = s.substring(i + 1, semi)
          val decoded: Int = ent match {
            case "amp"  => '&'
            case "lt"   => '<'
            case "gt"   => '>'
            case "quot" => '"'
            case "apos" => '\''
            case "nbsp" => ' '
            case _ if ent.length > 1 && ent.charAt(0) == '#' =>
              val num = ent.substring(1)
              try {
                if ((num.charAt(0) == 'x' || num.charAt(0) == 'X') &&
                    num.length > 1)
                  Integer.parseInt(num.substring(1), 16)
                else Integer.parseInt(num)
              } catch { case _: NumberFormatException => -1 }
            case _ => -1
          }
          // surrogate-range references → U+FFFD (WHATWG): appending the
          // raw value would be an unpaired surrogate — ill-formed UTF-16
          val cp = if (decoded >= 0xD800 && decoded <= 0xDFFF) 0xFFFD
                   else decoded
          if (cp > 0 && Character.isValidCodePoint(cp)) {
            sb.appendCodePoint(cp); i = semi + 1
          } else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Whitespace-normalize (runs collapse to one space, ends trimmed) —
    * the [[blocks]] flush rule applied to anchor text. */
  private def normalizeWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWs(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Outlink extraction: the `href` of every `<a>` OPENING tag, in
    * document order, entity-decoded and trimmed — the crawl-frontier /
    * link-graph sibling of [[blocks]] under the same recovery rules
    * (comments skipped, drop-tag subtrees skipped with the
    * name-terminator close rule, quoted attribute values may contain
    * `>`). Links inside `<script>`/`<style>`/etc are NOT links; empty
    * hrefs are dropped; the first href attribute wins when duplicated
    * (browser behavior). */
  def links(html: String): IndexedSeq[String] = anchors(html).map(_._1)

  /** [[links]] WITH each link's anchor text — the (href, anchor) pairs
    * an anchor-text corpus / link-quality signal consumes (anchor text
    * is among the strongest relevance features the web gives away for
    * free). The anchor is the `<a>` element's text content up to its
    * matching `</a>` — or an implicit close at the next `<a>` open
    * (HTML forbids nesting; browsers auto-close) or end of input —
    * entity-decoded and whitespace-normalized like a [[blocks]] flush;
    * nested inline tags contribute their text, drop-tag subtrees do
    * not. */
  def anchors(html: String): IndexedSeq[(String, String)] = {
    val out = IndexedSeq.newBuilder[(String, String)]
    var curHref: String = null
    val curText = new java.lang.StringBuilder(64)
    def flush(): Unit = {
      if (curHref != null) {
        out += ((curHref, normalizeWs(decodeEntities(curText.toString))))
        curHref = null
      }
      curText.setLength(0)
    }
    val n = if (html == null) 0 else html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!' && html.regionMatches(i + 1, "!--", 0, 3)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (c1 == '!' || c1 == '?') {
          val end = html.indexOf('>', i + 1)
          i = if (end < 0) n else end + 1
        } else if (c1.isLetter || (c1 == '/' && i + 2 < n &&
            html.charAt(i + 2).isLetter)) {
          val closing = c1 == '/'
          var j = i + (if (closing) 2 else 1)
          val nameStart = j
          while (j < n && (html.charAt(j).isLetter || html.charAt(j).isDigit))
            j += 1
          val name = html.substring(nameStart, j)
            .toLowerCase(java.util.Locale.ROOT)
          // attribute scan to the tag's real '>', capturing href on <a>
          var href: String = null
          var done = false
          while (!done && j < n) {
            val cj = html.charAt(j)
            if (cj == '>') done = true
            else if (isWs(cj) || cj == '/') j += 1
            else {
              val as = j
              while (j < n && { val x = html.charAt(j)
                !isWs(x) && x != '=' && x != '>' && x != '/' }) j += 1
              val aname = html.substring(as, j)
                .toLowerCase(java.util.Locale.ROOT)
              while (j < n && isWs(html.charAt(j))) j += 1
              var aval: String = null
              if (j < n && html.charAt(j) == '=') {
                j += 1
                while (j < n && isWs(html.charAt(j))) j += 1
                if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                  val q = html.charAt(j); j += 1
                  val vs = j
                  while (j < n && html.charAt(j) != q) j += 1
                  aval = html.substring(vs, j)
                  if (j < n) j += 1
                } else {
                  val vs = j
                  while (j < n && { val x = html.charAt(j)
                    !isWs(x) && x != '>' }) j += 1
                  aval = html.substring(vs, j)
                }
              }
              if (!closing && name == "a" && aname == "href" &&
                  href == null && aval != null)
                href = aval
            }
          }
          val tagEnd = if (j < n) j + 1 else n
          if (!closing && DropTags.contains(name)) {
            // skip the subtree exactly like the text walk
            var k = tagEnd
            var found = -1
            while (found < 0 && k < n) {
              val cand = html.indexOf('<', k)
              if (cand < 0 || cand + name.length + 2 > n) k = n
              else if (html.charAt(cand + 1) == '/' &&
                  html.regionMatches(true, cand + 2, name, 0, name.length) &&
                  (cand + 2 + name.length >= n || {
                    val after = html.charAt(cand + 2 + name.length)
                    after == '>' || after == '/' || isWs(after)
                  }))
                found = cand
              else k = cand + 1
            }
            if (found < 0) i = n
            else {
              val gt = html.indexOf('>', found)
              i = if (gt < 0) n else gt + 1
            }
          } else {
            if (name == "a") {
              // any <a> boundary — open, close, or implicit re-open —
              // ends the pending anchor
              flush()
              if (!closing && href != null) {
                val d = decodeEntities(href.trim)
                if (d.nonEmpty) curHref = d
              }
            }
            i = tagEnd
          }
        } else { // literal '<'
          if (curHref != null) curText.append(c)
          i += 1
        }
      } else {
        if (curHref != null) curText.append(c)
        i += 1
      }
    }
    flush() // unterminated trailing anchor keeps its text
    out.result()
  }

  /** In-page crawl directives — the two signals a frontier consults
    * right after robots.txt: `<meta name="robots">` (noindex/nofollow;
    * `none` means both, per the major engines' documented synonym) and
    * `<link rel="canonical">` (the single strongest crawl-dedup signal
    * after URL normalization — the page names its own canonical URL).
    *
    * Same recovery rules as [[anchors]]: comments and drop-tag subtrees
    * are skipped (a canonical inside a `<script>` string is NOT a
    * directive), quoted attribute values may contain `>`, entities
    * decode in attribute values. Multiple robots metas OR their flags
    * (most restrictive wins — that is how crawlers reconcile
    * conflicting metas); the FIRST canonical wins (browser behavior for
    * duplicated rel=canonical). `rel` is a space-separated token list,
    * matched case-insensitively. Returns (noindex, nofollow, canonical
    * href or null). */
  def pageDirectives(html: String): (Boolean, Boolean, String) = {
    var noindex = false
    var nofollow = false
    var canonical: String = null
    val n = if (html == null) 0 else html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!' && html.regionMatches(i + 1, "!--", 0, 3)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (c1 == '!' || c1 == '?') {
          val end = html.indexOf('>', i + 1)
          i = if (end < 0) n else end + 1
        } else if (c1.isLetter || (c1 == '/' && i + 2 < n &&
            html.charAt(i + 2).isLetter)) {
          val closing = c1 == '/'
          var j = i + (if (closing) 2 else 1)
          val nameStart = j
          while (j < n && (html.charAt(j).isLetter || html.charAt(j).isDigit))
            j += 1
          val name = html.substring(nameStart, j)
            .toLowerCase(java.util.Locale.ROOT)
          // attribute scan to the tag's real '>' (quoted values may
          // contain '>'), capturing the first name/content/rel/href
          var aName: String = null
          var aContent: String = null
          var aRel: String = null
          var aHref: String = null
          var done = false
          while (!done && j < n) {
            val cj = html.charAt(j)
            if (cj == '>') done = true
            else if (isWs(cj) || cj == '/') j += 1
            else {
              val as = j
              while (j < n && { val x = html.charAt(j)
                !isWs(x) && x != '=' && x != '>' && x != '/' }) j += 1
              val attr = html.substring(as, j)
                .toLowerCase(java.util.Locale.ROOT)
              while (j < n && isWs(html.charAt(j))) j += 1
              var aval: String = null
              if (j < n && html.charAt(j) == '=') {
                j += 1
                while (j < n && isWs(html.charAt(j))) j += 1
                if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                  val q = html.charAt(j); j += 1
                  val vs = j
                  while (j < n && html.charAt(j) != q) j += 1
                  aval = html.substring(vs, j)
                  if (j < n) j += 1
                } else {
                  val vs = j
                  while (j < n && { val x = html.charAt(j)
                    !isWs(x) && x != '>' }) j += 1
                  aval = html.substring(vs, j)
                }
              }
              if (aval != null) attr match {
                case "name"    => if (aName == null) aName = aval
                case "content" => if (aContent == null) aContent = aval
                case "rel"     => if (aRel == null) aRel = aval
                case "href"    => if (aHref == null) aHref = aval
                case _         =>
              }
            }
          }
          val tagEnd = if (j < n) j + 1 else n
          if (!closing && DropTags.contains(name)) {
            // skip the subtree exactly like the text/anchor walks
            var k = tagEnd
            var found = -1
            while (found < 0 && k < n) {
              val cand = html.indexOf('<', k)
              if (cand < 0 || cand + name.length + 2 > n) k = n
              else if (html.charAt(cand + 1) == '/' &&
                  html.regionMatches(true, cand + 2, name, 0, name.length) &&
                  (cand + 2 + name.length >= n || {
                    val after = html.charAt(cand + 2 + name.length)
                    after == '>' || after == '/' || isWs(after)
                  }))
                found = cand
              else k = cand + 1
            }
            if (found < 0) i = n
            else {
              val gt = html.indexOf('>', found)
              i = if (gt < 0) n else gt + 1
            }
          } else {
            if (!closing && name == "meta" && aName != null &&
                aName.equalsIgnoreCase("robots") && aContent != null) {
              decodeEntities(aContent)
                .split(',').foreach { t =>
                  val tok = t.trim.toLowerCase(java.util.Locale.ROOT)
                  if (tok == "noindex" || tok == "none") noindex = true
                  if (tok == "nofollow" || tok == "none") nofollow = true
                }
            }
            if (!closing && name == "link" && canonical == null &&
                aRel != null && aHref != null &&
                aRel.split("[ \t\n\f\r]+")
                  .exists(_.equalsIgnoreCase("canonical"))) {
              val d = decodeEntities(aHref.trim)
              if (d.nonEmpty) canonical = d
            }
            i = tagEnd
          }
        } else i += 1
      } else i += 1
    }
    (noindex, nofollow, canonical)
  }

  /** [[pageDirectives]] as the expression-kernel shape:
    * struct<noindex boolean, nofollow boolean, canonical string?>. */
  def htmlDirectives(html: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val (ni, nf, canon) =
      pageDirectives(if (html == null) null else html.toString)
    org.apache.spark.sql.catalyst.InternalRow(ni, nf,
      if (canon == null) null else UTF8String.fromString(canon))
  }

  /** [[links]] as the expression-kernel shape. */
  def htmlLinks(html: UTF8String): ArrayData = {
    val ls = links(if (html == null) null else html.toString)
    new GenericArrayData(ls.map(UTF8String.fromString).toArray[Any])
  }

  /** [[anchors]] as the expression-kernel shape:
    * array<struct<href string, anchor string>>. */
  def htmlAnchors(html: UTF8String): ArrayData = {
    val as = anchors(if (html == null) null else html.toString)
    new GenericArrayData(as.map { case (h, t) =>
      org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(h), UTF8String.fromString(t))
    }.toArray[Any])
  }

  private def keep(b: Block): Boolean = b.linkDensity <= 0.5 && b.words >= 3

  /** Kept blocks joined with '\n' — the page's training text. */
  def htmlText(html: UTF8String): UTF8String = {
    if (html == null) return null
    val kept = blocks(html.toString).filter(keep)
    val sb = new java.lang.StringBuilder
    var first = true
    kept.foreach { b =>
      if (!first) sb.append('\n')
      sb.append(b.text); first = false
    }
    UTF8String.fromString(sb.toString)
  }

  /** [n_blocks, n_kept, n_drop_link, n_drop_short, kept_chars] —
    * non-empty blocks total, survivors, dropped by link density, dropped
    * by the word floor, and the survivors' total codepoint count. The
    * density test fires first, matching jusText's precedence (a two-word
    * all-link block is boilerplate, not a short headline). */
  def htmlStats(html: UTF8String): ArrayData = {
    if (html == null) return new GenericArrayData(Array.fill[Long](5)(-1L))
    val bs = blocks(html.toString)
    var keptN = 0L; var dropLink = 0L; var dropShort = 0L; var chars = 0L
    bs.foreach { b =>
      if (b.linkDensity > 0.5) dropLink += 1
      else if (b.words < 3) dropShort += 1
      else { keptN += 1; chars += b.text.codePointCount(0, b.text.length) }
    }
    new GenericArrayData(Array[Long](bs.length, keptN, dropLink, dropShort,
      chars))
  }

  /** Gate-side page builder: wrap a document's text into a full
    * adversarial page whose extraction is closed-form. Tokens chunk into
    * paragraphs of 8; inside each, word 2 is bolded (uppercase tag) and
    * word 3 is a link (inline markup must vanish without splitting the
    * block, and the one linked word must stay under the density bar);
    * every paragraph ends with ` &amp; &lt;tag&gt; &#77;&#x21;&nbsp;end`
    * which must decode to ` & <tag> M! end` — named, decimal, hex, and
    * NBSP entity forms plus a decoded '<' that must not re-parse. The
    * title (2 words) falls to the word floor; the nav (uppercase tag) and
    * footer are pure links and fall to the density rule; the script
    * contains a fake `</p>` inside a string and the style a bare `>`. */
  def htmlSynth(id: Long, text: UTF8String): UTF8String = {
    val toks: Array[String] =
      if (text == null) Array.empty
      else text.toString.split("[ \t\n\f\r]+").filter(_.nonEmpty)
    val sb = new java.lang.StringBuilder(
      (if (text == null) 0 else text.numBytes()) * 2 + 640)
    sb.append("<!DOCTYPE html>\n<html>\n<head>\n<meta charset=\"utf-8\"/>\n")
    sb.append("<title>Doc ").append(id).append("</title>\n")
    sb.append("<script type=\"text/javascript\">var x = ").append(id)
      .append("; if (x > 1) { document.write(\"<p>not content</p>\"); }")
      .append("</script>\n")
    sb.append("<style>.main { color: #222; } /* a > b */</style>\n")
    sb.append("</head>\n<body>\n")
    sb.append("<!-- synthetic page ").append(id).append(" <p>ghost</p> -->\n")
    sb.append("<NAV><a href=\"/\">home</a> <a href=\"/about\">about</a> ")
      .append("<a href=\"/contact\">contact</a></NAV>\n")
    sb.append("<div id=\"main\" title=\"x > y\">\n")
    toks.grouped(8).foreach { chunk =>
      sb.append("  <p class=\"txt\">")
      var j = 0
      while (j < chunk.length) {
        if (j > 0) sb.append(' ')
        if (j == 1) sb.append("<B>").append(chunk(j)).append("</B>")
        else if (j == 2) sb.append("<a href=\"/").append(chunk(j))
          .append("\">").append(chunk(j)).append("</a>")
        else sb.append(chunk(j))
        j += 1
      }
      sb.append(" &amp; &lt;tag&gt; &#77;&#x21;&nbsp;end</p>\n")
    }
    sb.append("</div>\n")
    sb.append("<footer><a href=\"/tos\">terms</a> ")
      .append("<a href=\"/privacy\">privacy</a></footer>\n")
    sb.append("</body>\n</html>\n")
    UTF8String.fromString(sb.toString)
  }
}
