package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** URL normalization and domain extraction — the keys a crawl pipeline
  * dedups and curates on.
  *
  * URL-level dedup is the cheapest dedup a web corpus gets (RefinedWeb
  * removes a double-digit share of Common Crawl by URL alone), but it
  * only works if syntactically-different spellings of the same resource
  * normalize to one key. [[normalize]] applies the RFC 3986 §6.2
  * syntax-based subset — every rule is semantics-preserving:
  *
  *   1. scheme and host lowercase (§6.2.2.1);
  *   2. percent-encoding: decode octets that are unreserved
  *      (ALPHA / DIGIT / `-` `.` `_` `~`), uppercase the hex digits of
  *      every other escape (§6.2.2.2) — `%7e` → `~`, `%2f` → `%2F`;
  *      a malformed escape (`%g1`, trailing `%`) is left untouched;
  *   3. dot-segments removed from the path (§6.2.2.3): `/a/../b/./c` →
  *      `/b/c`;
  *   4. default port dropped (`:80` for http, `:443` for https) and an
  *      empty path with an authority becomes `/` (§6.2.3);
  *   5. the fragment is dropped (never sent to the server, so two URLs
  *      differing only in `#…` are the same fetch).
  *
  * The query string's PARAMETER ORDER is deliberately preserved —
  * reordering is not semantics-preserving in general (servers may care),
  * so callers wanting a coarser key compose their own.
  *
  * [[registeredDomain]] gives the curation unit (blocklists, per-site
  * quotas, graph grouping): the public-suffix idea with an embedded
  * two-level-suffix core (`co.uk` and friends) standing in for the full
  * Mozilla PSL — the list is data, the algorithm is what's exercised.
  * All functions are pure per-row byte walks: codegen'd scan-side
  * columns, embarrassingly parallel at 100 TB.
  */
object UrlKernels {

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Percent-encoding normalization of one component (rule 2). */
  private def normEscapes(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && hexVal(s.charAt(i + 1)) >= 0 &&
          hexVal(s.charAt(i + 2)) >= 0) {
        val v = (hexVal(s.charAt(i + 1)) << 4) | hexVal(s.charAt(i + 2))
        if (isUnreserved(v.toChar)) sb.append(v.toChar)
        else sb.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments (rule 3). Empty segments
    * (`a//b`) are PRESERVED — only `.` and `..` are dot segments; a
    * collapsed double slash would not be semantics-preserving. */
  private def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]
    val absolute = path.startsWith("/")
    val segs = path.split("/", -1)
    var i = if (absolute) 1 else 0 // the leading "" is the root marker
    while (i < segs.length) {
      segs(i) match {
        case "."  => // dropped; a trailing "/." re-adds the slash below
        case ".." => if (out.nonEmpty) out.remove(out.length - 1)
        case seg  => out += seg // includes "" for kept empty segments
      }
      i += 1
    }
    val body = (if (absolute) "/" else "") + out.mkString("/")
    // RFC: a path ending in "/." or "/.." ends in "/" after removal
    if ((path.endsWith("/.") || path.endsWith("/..")) && !body.endsWith("/"))
      body + "/"
    else body
  }

  /** The full §6.2 subset described above. A string with no `://` (not an
    * absolute hierarchical URL) is returned unchanged — normalization is
    * defined on parseable input, and a pass-through never corrupts a key. */
  def normalizeUrl(raw: String): String = {
    val ss = raw.indexOf("://")
    if (ss <= 0) return raw
    val scheme = raw.substring(0, ss).toLowerCase(java.util.Locale.ROOT)
    var i = ss + 3
    // authority ends at the first '/', '?' or '#'
    var j = i
    while (j < raw.length && raw.charAt(j) != '/' && raw.charAt(j) != '?' &&
      raw.charAt(j) != '#') j += 1
    var authority = raw.substring(i, j)
    // userinfo (rare) is preserved as-is; host+port lowercase + default-port
    val at = authority.lastIndexOf('@')
    val userinfo = if (at >= 0) authority.substring(0, at + 1) else ""
    var hostPort = authority.substring(at + 1).toLowerCase(java.util.Locale.ROOT)
    if ((scheme == "http" && hostPort.endsWith(":80")) ||
        (scheme == "https" && hostPort.endsWith(":443")))
      hostPort = hostPort.substring(0, hostPort.lastIndexOf(':'))
    authority = userinfo + hostPort
    // split rest into path / query / fragment
    val rest = raw.substring(j)
    val hash = rest.indexOf('#')
    val noFrag = if (hash >= 0) rest.substring(0, hash) else rest
    val qm = noFrag.indexOf('?')
    val path0 = if (qm >= 0) noFrag.substring(0, qm) else noFrag
    val query = if (qm >= 0) noFrag.substring(qm + 1) else null
    var path = removeDotSegments(normEscapes(path0))
    if (path.isEmpty) path = "/"
    val sb = new java.lang.StringBuilder(raw.length)
    sb.append(scheme).append("://").append(authority).append(path)
    if (query != null) sb.append('?').append(normEscapes(query))
    sb.toString
  }

  /** Host of an absolute URL (lowercased, port and userinfo stripped);
    * null when the input has no authority. */
  def hostOf(raw: String): String = {
    val ss = raw.indexOf("://")
    if (ss <= 0) return null
    var j = ss + 3
    while (j < raw.length && raw.charAt(j) != '/' && raw.charAt(j) != '?' &&
      raw.charAt(j) != '#') j += 1
    val authority = raw.substring(ss + 3, j)
    if (authority.isEmpty) return null
    val at = authority.lastIndexOf('@')
    val hostPort = authority.substring(at + 1).toLowerCase(java.util.Locale.ROOT)
    val colon = hostPort.lastIndexOf(':')
    val host = if (colon >= 0 && hostPort.drop(colon + 1).forall(_.isDigit))
      hostPort.substring(0, colon) else hostPort
    if (host.isEmpty) null else host
  }

  /** The path-and-query a robots rule matches against (RFC 9309 §2.2.2
    * probes the path plus the optional query): everything from the
    * first `/` after the authority to the end, fragment dropped; `/`
    * for a URL with no path; null for a non-hierarchical URL. A
    * query-only URL (`https://h?q=1`) keeps its query behind the
    * implied `/`. */
  def pathOf(raw: String): String = {
    if (raw == null) return null
    val ss = raw.indexOf("://")
    if (ss <= 0) return null
    var j = ss + 3
    while (j < raw.length && raw.charAt(j) != '/' && raw.charAt(j) != '?' &&
      raw.charAt(j) != '#') j += 1
    if (j >= raw.length || raw.charAt(j) == '#') return "/"
    val h = raw.indexOf('#', j)
    val pq = raw.substring(j, if (h >= 0) h else raw.length)
    if (pq.isEmpty) "/"
    else if (pq.charAt(0) == '?') "/" + pq
    else pq
  }

  /** Embedded two-level public-suffix core. The real deployment swaps in
    * the full Mozilla PSL as a data file; the ALGORITHM (longest known
    * suffix + one label) is what the engine owns. */
  private val TwoLevelSuffixes: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.au", "net.au", "org.au",
    "com.br", "com.cn", "com.mx", "com.tr", "com.sg",
    "co.in", "co.nz", "co.kr", "co.za")

  /** The registrable domain of a host: the public suffix plus one label.
    * A host that IS a suffix, has a single label, or is an IPv4 literal
    * returns itself. */
  def registeredDomain(host: String): String = {
    if (host == null) return null
    val labels = host.split("\\.", -1)
    if (labels.length < 2) return host
    if (labels.forall(l => l.nonEmpty && l.forall(_.isDigit))) return host
    val lastTwo = labels(labels.length - 2) + "." + labels(labels.length - 1)
    if (TwoLevelSuffixes.contains(lastTwo)) {
      if (labels.length < 3) host
      else labels(labels.length - 3) + "." + lastTwo
    } else lastTwo
  }

  /** `ref` starts with a URI scheme (`[A-Za-z][A-Za-z0-9+.-]*:`). */
  private def hasScheme(s: String): Boolean = {
    if (s.isEmpty) return false
    val c0 = s.charAt(0)
    if (!((c0 >= 'A' && c0 <= 'Z') || (c0 >= 'a' && c0 <= 'z'))) return false
    var i = 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ':') return true
      if (!((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
            (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'))
        return false
      i += 1
    }
    false
  }

  /** RFC 3986 §5.2 reference resolution, the crawler subset: resolve a
    * (possibly relative) `ref` — as pulled from an `<a href>` — against
    * the absolute hierarchical `base` the page was fetched from.
    * Fragments are DROPPED from the result (crawl identity ignores
    * them, the same policy [[normalizeUrl]] applies); dot segments in
    * the merged path are removed per §5.2.4. Returns null when `base`
    * is not absolute-hierarchical and `ref` carries no scheme of its
    * own — an unresolvable link is degraded data, not a crash. */
  def resolveUrl(base: String, ref0: String): String = {
    if (base == null || ref0 == null) return null
    val h = ref0.indexOf('#')
    val ref = (if (h >= 0) ref0.substring(0, h) else ref0).trim
    if (hasScheme(ref)) return ref
    val ss = base.indexOf("://")
    if (ss <= 0) return null
    val scheme = base.substring(0, ss)
    if (ref.startsWith("//")) return scheme + ":" + ref
    var j = ss + 3
    while (j < base.length && base.charAt(j) != '/' &&
      base.charAt(j) != '?' && base.charAt(j) != '#') j += 1
    val origin = base.substring(0, j)
    // base path+query, fragment stripped
    val rest = base.substring(j)
    val bh = rest.indexOf('#')
    val noFrag = if (bh >= 0) rest.substring(0, bh) else rest
    val qm = noFrag.indexOf('?')
    val bpath = if (qm >= 0) noFrag.substring(0, qm) else noFrag
    if (ref.isEmpty) // same-document reference → base sans fragment
      return origin + (if (noFrag.isEmpty) "/" else noFrag)
    if (ref.charAt(0) == '?')
      return origin + (if (bpath.isEmpty) "/" else bpath) + ref
    // §5.2.4 operates on the PATH only — split the ref's query off
    // before dot-segment removal, or `?next=/../x` would eat real path
    // segments (redirect-target query params are common in crawl data)
    val rq = ref.indexOf('?')
    val refPath = if (rq >= 0) ref.substring(0, rq) else ref
    val refQuery = if (rq >= 0) ref.substring(rq) else ""
    if (ref.charAt(0) == '/')
      return origin + removeDotSegments(refPath) + refQuery
    // relative path: merge with the base path's directory (§5.2.3)
    val sl = bpath.lastIndexOf('/')
    val dir = if (sl >= 0) bpath.substring(0, sl + 1) else "/"
    origin + removeDotSegments(dir + refPath) + refQuery
  }

  // UTF8String adapters (the codegen call sites)
  def normalizeUrl(raw: UTF8String): UTF8String =
    if (raw == null) null else UTF8String.fromString(normalizeUrl(raw.toString))
  def resolveUrl(base: UTF8String, ref: UTF8String): UTF8String = {
    if (base == null || ref == null) return null
    val r = resolveUrl(base.toString, ref.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
  def hostOf(raw: UTF8String): UTF8String = {
    if (raw == null) return null
    val h = hostOf(raw.toString)
    if (h == null) null else UTF8String.fromString(h)
  }
  def registeredDomain(host: UTF8String): UTF8String = {
    if (host == null) return null
    val d = registeredDomain(host.toString)
    if (d == null) null else UTF8String.fromString(d)
  }
  def pathOf(raw: UTF8String): UTF8String = {
    if (raw == null) return null
    val p = pathOf(raw.toString)
    if (p == null) null else UTF8String.fromString(p)
  }
}
