package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Crawl politeness: robots.txt evaluation (RFC 9309, the Robots
  * Exclusion Protocol) and sitemap URL extraction — the two front-door
  * legs a crawler consults BEFORE fetching, completing the crawl tier
  * beside the WARC walk (what was fetched), outlink extraction (what to
  * fetch next), and host ranking (in what order).
  *
  * Scale shape: both are pure per-row byte walks (codegen'd scan-side
  * columns). A real pipeline parses each HOST's robots.txt once —
  * dedupe on host upstream, evaluate the (usually thousands of) frontier
  * paths against the parsed groups via the per-row expression, never
  * refetch per URL.
  *
  * RFC 9309 semantics implemented (§2.2):
  *   - groups = consecutive `User-agent:` lines followed by
  *     `Allow:`/`Disallow:` rules; keys case-insensitive; `#` comments
  *     stripped; unknown lines (Sitemap, extensions) ignored for
  *     matching; `Crawl-delay` is likewise ignored for MATCHING but is
  *     captured per group and surfaced via [[crawlDelayFor]] (the
  *     politeness scheduler needs it next to the verdict);
  *   - group selection (§2.2.1): the most specific matching user-agent
  *     (longest product-token substring match, case-insensitive), else
  *     the `*` groups. Rules of EVERY group carrying the winning token
  *     are COMBINED — real robots.txt files commonly repeat
  *     `User-agent: *` blocks, and ignoring the later blocks would let
  *     a crawler fetch disallowed URLs;
  *   - rule matching (§2.2.2): `*` matches any character sequence, `$`
  *     anchors the end; comparison is OCTET-WISE over the
  *     percent-encoded form — both pattern and path are canonicalized
  *     to uppercase-%XX UTF-8 octets first ([[canonicalOctets]]), so
  *     `/caf%c3%a9` and a raw `/café` are the same path. The LONGEST
  *     (most octets, canonical length) matching rule wins; on a length
  *     tie, Allow wins; an empty Disallow matches nothing; no matching
  *     rule → allowed.
  */
object RobotsKernels {

  /** `canon` is the octet-canonical pattern both matching and the
    * longest-match ranking use; `path` stays the file's spelling (it is
    * what gates/debuggers report as the winning rule). */
  final case class Rule(allow: Boolean, path: String) {
    val canon: String = canonicalOctets(path)
  }

  /** One parsed group: lowercased agent token, match rules, and the
    * group's `Crawl-delay` in integer MILLIS (-1 = none; the last
    * occurrence inside a group wins — later directives override). */
  final case class Group(token: String, rules: IndexedSeq[Rule],
                         delayMillis: Long)

  /** Test/plan-audit hook: total [[parseGroups]] invocations in this
    * JVM. The frontier composition's contract is parse count O(hosts),
    * not O(frontier rows) — a spec asserts the delta across a run. */
  private[graft] val parseCalls = new java.util.concurrent.atomic.LongAdder

  /** Canonical percent-encoded octet form (RFC 9309 §2.2.2 compares
    * octets of the percent-encoded path): existing `%XX` triplets are
    * uppercased, non-ASCII code points are UTF-8 percent-encoded, a
    * bare `%` not starting a valid triplet becomes `%25`. ASCII —
    * including the glob chars `*` and `$` — passes through, so the
    * matcher's semantics are unchanged for ASCII rules and the
    * canonical string's char count IS its octet count. */
  private[sources] def canonicalOctets(s: String): String = {
    var i = 0
    var plain = true
    while (plain && i < s.length) {
      val c = s.charAt(i)
      if (c >= 0x80 || c == '%') plain = false else i += 1
    }
    if (plain) return s
    def isHex(c: Char): Boolean =
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
        (c >= 'A' && c <= 'F')
    val hex = "0123456789ABCDEF"
    val sb = new java.lang.StringBuilder(s.length + 8)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        if (i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
          sb.append('%')
            .append(Character.toUpperCase(s.charAt(i + 1)))
            .append(Character.toUpperCase(s.charAt(i + 2)))
          i += 3
        } else { sb.append("%25"); i += 1 }
      } else if (c < 0x80) { sb.append(c); i += 1 }
      else {
        val cp = s.codePointAt(i)
        val bytes = new String(Character.toChars(cp))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        bytes.foreach { b =>
          sb.append('%').append(hex.charAt((b >> 4) & 0xF))
            .append(hex.charAt(b & 0xF))
        }
        i += Character.charCount(cp)
      }
    }
    sb.toString
  }

  /** Parsed groups in file order. A group naming several agents repeats
    * under each name (each copy carries the group's rules and delay). */
  def parseGroups(txt: String): IndexedSeq[Group] = {
    parseCalls.increment()
    val out = IndexedSeq.newBuilder[Group]
    if (txt == null) return out.result()
    var agents = List.empty[String]
    var rules = IndexedSeq.newBuilder[Rule]
    var delay = -1L
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) {
        val rs = rules.result()
        agents.reverse.foreach(a => out += Group(a, rs, delay))
      }
      agents = Nil
      rules = IndexedSeq.newBuilder[Rule]
      delay = -1L
      inRules = false
    }
    txt.linesIterator.foreach { raw =>
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            // a user-agent line AFTER rules starts a NEW group (RFC
            // 9309: consecutive agent lines share one group)
            if (inRules) flush()
            agents ::= value.toLowerCase(java.util.Locale.ROOT)
          case "allow" if agents.nonEmpty =>
            inRules = true; rules += Rule(allow = true, value)
          case "disallow" if agents.nonEmpty =>
            inRules = true; rules += Rule(allow = false, value)
          case "crawl-delay" if agents.nonEmpty =>
            inRules = true
            // fractional seconds are in the wild ("0.5"); keep integer
            // millis so downstream scheduling stays in exact arithmetic
            try {
              val d = java.lang.Double.parseDouble(value)
              if (d >= 0 && d <= 86400) delay = math.round(d * 1000.0)
            } catch { case _: NumberFormatException => }
          case _ => // Sitemap / unknown: not a match rule
            if (agents.nonEmpty) inRules = true
        }
      }
    }
    flush()
    out.result()
  }

  /** Back-compat shape: (lowercased agent token, rules) in file order. */
  def parse(txt: String): IndexedSeq[(String, IndexedSeq[Rule])] =
    parseGroups(txt).map(g => (g.token, g.rules))

  /** The groups selected for `agent` (RFC 9309 §2.2.1): every group
    * whose token is the LONGEST matching product-token substring
    * (case-insensitive) — all of them, not just the first, since files
    * commonly split one logical group across repeated blocks — else
    * every `*` group; no match → empty (allow everything). */
  def selectGroups(groups: IndexedSeq[Group], agent: String)
      : IndexedSeq[Group] = {
    val a = if (agent == null) "" else
      agent.toLowerCase(java.util.Locale.ROOT)
    var bestLen = -1
    groups.foreach { g =>
      if (g.token != "*" && g.token.nonEmpty && a.contains(g.token) &&
          g.token.length > bestLen)
        bestLen = g.token.length
    }
    if (bestLen >= 0)
      groups.filter(g => g.token.length == bestLen && g.token != "*" &&
        a.contains(g.token))
    else groups.filter(_.token == "*")
  }

  /** The selected groups' rules for `agent`, concatenated in file
    * order. */
  def rulesFor(groups: IndexedSeq[(String, IndexedSeq[Rule])],
               agent: String): IndexedSeq[Rule] =
    selectGroups(groups.map { case (t, rs) => Group(t, rs, -1L) }, agent)
      .flatMap(_.rules)

  /** The effective crawl delay for `agent` in millis (-1 = none): the
    * MAX across the selected groups — when repeated blocks disagree,
    * the polite scheduler takes the most conservative value. */
  def crawlDelayFor(groups: IndexedSeq[Group], agent: String): Long = {
    val sel = selectGroups(groups, agent)
    if (sel.isEmpty) -1L else sel.map(_.delayMillis).max
  }

  /** Whether `path` matches the rule pattern: `*` = any sequence,
    * trailing `$` anchors the end, otherwise prefix semantics.
    * Iterative single-star-backtracking match — O(n·m) worst case, NOT
    * the exponential recursive walk: robots.txt is attacker-supplied by
    * definition, and a hostile many-star pattern must not wedge the
    * executor (all `*`s are equivalent, so on a mismatch it is always
    * sufficient to grow the MOST RECENT star's span by one — the
    * classic glob algorithm). An unanchored pattern is a prefix ask:
    * match against every path prefix ⇔ let the walk succeed when the
    * pattern is exhausted. */
  private[sources] def ruleMatches(pattern: String, path: String): Boolean = {
    if (pattern.isEmpty) return false // empty Disallow matches nothing
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1)
              else pattern
    var p = 0; var s = 0
    var starP = -1; var starS = -1
    while (true) {
      if (p >= pat.length) {
        // pattern exhausted: prefix semantics unless anchored
        if (!anchored || s == path.length) return true
        // anchored and path remains: grow the last star if there is one
        if (starP < 0 || starS >= path.length) return false
        starS += 1; s = starS; p = starP + 1
      } else if (pat.charAt(p) == '*') {
        starP = p; starS = s
        p += 1
      } else if (s < path.length && path.charAt(s) == pat.charAt(p)) {
        p += 1; s += 1
      } else if (starP >= 0 && starS < path.length) {
        starS += 1; s = starS; p = starP + 1
      } else return false
    }
    false // unreachable
  }

  /** The RFC 9309 decision for `path` under `rules`: (allowed, the
    * winning rule's pattern in its ORIGINAL spelling — "" when no rule
    * matched). Matching and ranking run on the canonical octet forms:
    * the longest canonical pattern (octet count) wins; Allow wins
    * length ties. */
  def decide(rules: IndexedSeq[Rule], path: String): (Boolean, String) = {
    val canonPath = canonicalOctets(if (path == null) "" else path)
    var bestLen = -1
    var bestAllow = true
    var bestPat = ""
    rules.foreach { r =>
      if (ruleMatches(r.canon, canonPath)) {
        val len = r.canon.length
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          bestLen = len; bestAllow = r.allow; bestPat = r.path
        }
      }
    }
    if (bestLen < 0) (true, "") else (bestAllow, bestPat)
  }

  /** Full evaluation: parse + group-select + decide. */
  def evalRobots(txt: UTF8String, agent: UTF8String,
                 path: UTF8String): InternalRow = {
    val (allowed, rule) = decide(
      rulesFor(parse(if (txt == null) null else txt.toString),
        if (agent == null) null else agent.toString),
      if (path == null) "" else path.toString)
    InternalRow(allowed, UTF8String.fromString(rule))
  }

  /** Parse + group-select ONCE, returning the selected rules as plain
    * data — array<struct<allow, pattern>> — so a frontier plan can
    * evaluate this on the DEDUPED host frame (O(hosts) parses) and ship
    * the parsed rules through a join to the per-URL [[decideRules]].
    * This is the at-scale shape the scaladoc above prescribes: billions
    * of frontier URLs against millions of hosts must not re-parse per
    * URL. */
  def selectedRules(txt: UTF8String, agent: UTF8String): ArrayData = {
    val rules = rulesFor(parse(if (txt == null) null else txt.toString),
      if (agent == null) null else agent.toString)
    new GenericArrayData(rules.map(r =>
      InternalRow(r.allow, UTF8String.fromString(r.path))).toArray[Any])
  }

  /** The decision over PRE-PARSED rules (the [[selectedRules]] array) —
    * the per-frontier-row leg: no parse, just the canonical-octet match
    * walk over the (few) selected rules. */
  def decideRules(rules: ArrayData, path: UTF8String): InternalRow = {
    val n = rules.numElements()
    val rs = IndexedSeq.newBuilder[Rule]
    var i = 0
    while (i < n) {
      val row = rules.getStruct(i, 2)
      rs += Rule(row.getBoolean(0), row.getUTF8String(1).toString)
      i += 1
    }
    val (allowed, rule) =
      decide(rs.result(), if (path == null) "" else path.toString)
    InternalRow(allowed, UTF8String.fromString(rule))
  }

  /** Parse + group-select + the effective crawl delay in millis
    * (-1 = the selected groups set none). */
  def crawlDelayMillis(txt: UTF8String, agent: UTF8String): Long =
    crawlDelayFor(parseGroups(if (txt == null) null else txt.toString),
      if (agent == null) null else agent.toString)

  /** `Sitemap:` directives of a robots.txt, in file order (RFC 9309
    * treats them as file-wide, group-independent). */
  def sitemapsOf(txt: UTF8String): ArrayData = {
    val out = IndexedSeq.newBuilder[UTF8String]
    if (txt != null) txt.toString.linesIterator.foreach { raw =>
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      val c = line.indexOf(':')
      if (c > 0 && line.substring(0, c).trim
          .equalsIgnoreCase("sitemap")) {
        val v = line.substring(c + 1).trim
        if (v.nonEmpty) out += UTF8String.fromString(v)
      }
    }
    new GenericArrayData(out.result().toArray[Any])
  }

  /** `<loc>` values of a sitemap / sitemap-index XML document, in
    * document order — both `<urlset>` and `<sitemapindex>` reduce to
    * the same loc walk. Entities decoded per XML (`&amp;` etc. appear
    * in real sitemap URLs), values trimmed; malformed tails yield the
    * locs parsed so far (fail-soft: a sitemap is advisory input). */
  def sitemapLocs(xml: UTF8String): ArrayData = {
    val out = IndexedSeq.newBuilder[UTF8String]
    if (xml != null) {
      val s = xml.toString
      var i = 0
      while (i >= 0 && i < s.length) {
        val open = s.indexOf("<loc>", i)
        if (open < 0) i = -1
        else {
          val close = s.indexOf("</loc>", open + 5)
          if (close < 0) i = -1
          else {
            val v = decodeXml(s.substring(open + 5, close).trim)
            if (v.nonEmpty) out += UTF8String.fromString(v)
            i = close + 6
          }
        }
      }
    }
    new GenericArrayData(out.result().toArray[Any])
  }

  /** Single left-to-right entity decode — a replace CHAIN would
    * double-decode nested references (`&amp;lt;` means the literal
    * text `&lt;`, not `<`). */
  private def decodeXml(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val rep = if (semi > i && semi <= i + 6)
          s.substring(i + 1, semi) match {
            case "amp"  => "&"
            case "lt"   => "<"
            case "gt"   => ">"
            case "quot" => "\""
            case "apos" => "'"
            case _      => null
          }
        else null
        if (rep != null) { sb.append(rep); i = semi + 1 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // --------------------------------------------------- gate-side synth

  /** Deterministic robots.txt twin for the gates: a `*` group, a
    * graftbot group with prefix/longer-allow/wildcard-anchor rules
    * keyed by `id`, non-rule lines (Crawl-delay, Sitemap, comments)
    * that must be ignored for matching — plus, for the crawl-delay
    * gate, id-keyed delays: `k.5` s in the first graftbot block, a
    * fixed 2 s in a SECOND (rule-less) graftbot block that the §2.2.1
    * group-combining must merge (effective delay = max of the two),
    * and 1 s on the `*` group. */
  def robotsSynth(id: Long): UTF8String = {
    val k = java.lang.Long.remainderUnsigned(id, 5L)
    UTF8String.fromString(
      s"""# synthetic robots for doc $id
         |User-agent: *
         |Disallow: /private/
         |Allow: /private/pub$$
         |Crawl-delay: 1
         |
         |User-agent: graftbot
         |Disallow: /blocked-$k/
         |Allow: /blocked-$k/ok/
         |Disallow: /*.pdf$$
         |Crawl-delay: $k.5
         |Sitemap: https://site-$k.example/sitemap.xml
         |
         |User-agent: graftbot
         |Crawl-delay: 2
         |""".stripMargin)
  }

  /** Deterministic sitemap twin: three `<url><loc>` entries derived
    * from `id`, one carrying an XML entity. */
  def sitemapSynth(id: Long): UTF8String = {
    val k = java.lang.Long.remainderUnsigned(id, 97L)
    UTF8String.fromString(
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
         |  <url><loc>https://site-$k.example/page/$id</loc>
         |    <lastmod>2026-01-01</lastmod></url>
         |  <url><loc> https://site-$k.example/a?x=$id&amp;y=2 </loc></url>
         |  <url><loc>https://site-$k.example/z/$id</loc></url>
         |</urlset>
         |""".stripMargin)
  }
}

/** Catalyst expressions over [[RobotsKernels]]. */
object RobotsExpressions {

  case class RobotsEval(first: Expression, second: Expression,
                        third: Expression) extends TernaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("allowed", BooleanType, nullable = false),
      StructField("rule", StringType, nullable = false)))
    override def prettyName: String = "robots_eval"

    override def nullSafeEval(txt: Any, agent: Any, path: Any): Any =
      RobotsKernels.evalRobots(txt.asInstanceOf[UTF8String],
        agent.asInstanceOf[UTF8String], path.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (t, a, p) =>
        s"graft.sources.RobotsKernels.evalRobots($t, $a, $p)")

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(first = f, second = s, third = t)
  }

  /** The parsed, group-selected rules as data — the O(hosts) leg of the
    * frontier composition. */
  case class RobotsRules(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("allow", BooleanType, nullable = false),
      StructField("pattern", StringType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "robots_rules"
    override def nullSafeEval(txt: Any, agent: Any): Any =
      RobotsKernels.selectedRules(txt.asInstanceOf[UTF8String],
        agent.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (t, a) =>
        s"graft.sources.RobotsKernels.selectedRules($t, $a)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** The per-URL decision over pre-parsed rules — the O(frontier) leg:
    * no parse, just the match walk. */
  case class RobotsDecide(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("allowed", BooleanType, nullable = false),
      StructField("rule", StringType, nullable = false)))
    override def prettyName: String = "robots_decide"
    override def nullSafeEval(rules: Any, path: Any): Any =
      RobotsKernels.decideRules(rules.asInstanceOf[ArrayData],
        path.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (r, p) =>
        s"graft.sources.RobotsKernels.decideRules($r, $p)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** Effective crawl delay in millis, -1 when the selected groups set
    * none. */
  case class RobotsCrawlDelay(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "robots_crawl_delay"
    override def nullSafeEval(txt: Any, agent: Any): Any =
      RobotsKernels.crawlDelayMillis(txt.asInstanceOf[UTF8String],
        agent.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (t, a) =>
        s"graft.sources.RobotsKernels.crawlDelayMillis($t, $a)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  case class RobotsSitemaps(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def prettyName: String = "robots_sitemaps"
    override def nullSafeEval(txt: Any): Any =
      RobotsKernels.sitemapsOf(txt.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, t =>
        s"graft.sources.RobotsKernels.sitemapsOf($t)")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class SitemapLocs(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def prettyName: String = "sitemap_locs"
    override def nullSafeEval(xml: Any): Any =
      RobotsKernels.sitemapLocs(xml.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x =>
        s"graft.sources.RobotsKernels.sitemapLocs($x)")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class RobotsSynth(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "robots_synth"
    override def nullSafeEval(id: Any): Any =
      RobotsKernels.robotsSynth(id.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, i =>
        s"graft.sources.RobotsKernels.robotsSynth($i)")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class SitemapSynth(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "sitemap_synth"
    override def nullSafeEval(id: Any): Any =
      RobotsKernels.sitemapSynth(id.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, i =>
        s"graft.sources.RobotsKernels.sitemapSynth($i)")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def robotsEval(txt: Column, agent: Column, path: Column): Column =
    column(RobotsEval(expression(txt), expression(agent), expression(path)))
  def robotsRules(txt: Column, agent: Column): Column =
    column(RobotsRules(expression(txt), expression(agent)))
  def robotsDecide(rules: Column, path: Column): Column =
    column(RobotsDecide(expression(rules), expression(path)))
  def robotsCrawlDelay(txt: Column, agent: Column): Column =
    column(RobotsCrawlDelay(expression(txt), expression(agent)))
  def robotsSitemaps(txt: Column): Column =
    column(RobotsSitemaps(expression(txt)))
  def sitemapLocs(xml: Column): Column = column(SitemapLocs(expression(xml)))
  def robotsSynth(id: Column): Column = column(RobotsSynth(expression(id)))
  def sitemapSynth(id: Column): Column = column(SitemapSynth(expression(id)))
}
