package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Randomized parity: the column-algebra Gopher stats must agree with an
  * independent plain-Scala reference implementation on arbitrary ASCII
  * documents — whitespace handling, empty docs, punctuation runs, bullet
  * and ellipsis lines are where split/regex expression semantics drift. */
class GopherPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // ---- independent reference implementation ----
  // whitespace = RE2's \s = [ \t\n\f\r] (the operator's declared class;
  // Java's \s would additionally include \x0B)
  private val WS = " \t\n\f\r"
  private def refStats(text: String): (Long, Double, Double, Double, Long, Double, Double) = {
    val trimmed = text.dropWhile(WS.contains(_)).reverse.dropWhile(WS.contains(_)).reverse
    val words = if (trimmed.isEmpty) Array.empty[String]
      else trimmed.split("[ \\t\\n\\f\\r]+")
    val n = words.length.toLong
    val meanLen = if (n == 0) 0.0 else words.map(_.length.toLong).sum.toDouble / n.toDouble
    def occ(t: String): Double = {
      var c = 0; var i = 0
      while ({ i = text.indexOf(t, i); i >= 0 }) { c += 1; i += t.length }
      c.toDouble
    }
    val symbolRatio = if (n == 0) 0.0 else (occ("#") + occ("...")) / n.toDouble
    val alphaFrac = if (n == 0) 0.0
      else words.count(_.exists(ch => (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z'))).toDouble / n.toDouble
    val toks = trimmed.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet
    val swHits = QualityRules.probeStopwords.count(toks.contains).toLong
    val lines = text.split("\n", -1)
    val bulletFrac = lines.count(l =>
      l.dropWhile(_ == ' ').headOption.exists("-*•".contains(_))).toDouble / lines.length
    val ellipsisFrac = lines.count { l =>
      val r = l.reverse.dropWhile(_ == ' ').reverse
      r.endsWith("...") || r.endsWith("…")
    }.toDouble / lines.length
    (n, meanLen, symbolRatio, alphaFrac, swHits, bulletFrac, ellipsisFrac)
  }

  test("gopherStats agrees with the reference on 300 random ASCII docs") {
    val rnd = new scala.util.Random(4242)
    val pieces = Seq("the", "fox", "#", "...", "…", "12", "a#b", "word", "-",
      "*", "run!!", "of", "and", "zz", "", " ", "\n", "- item", "end ...")
    // separators drawn PER GAP, including the non-LF line endings and tabs
    // that expose Java-vs-RE2 whitespace/terminator drift
    val seps = Seq(" ", "  ", "\n", "\r\n", "\r", "\t", " \n ")
    val docs = (0L until 300L).map { i =>
      val k = rnd.nextInt(40)
      (i, Seq.fill(k)(pieces(rnd.nextInt(pieces.length)))
        .reduceLeftOption((a, b) => a + seps(rnd.nextInt(seps.length)) + b)
        .getOrElse(""))
    }
    val out = QualityRules.gopherStats(docs.toDF("id", "text"), "text")
      .select("id", "n_words", "mean_word_len", "symbol_ratio", "alpha_frac",
        "sw_hits", "bullet_frac", "ellipsis_frac")
      .collect().map(r => r.getLong(0) -> r).toMap
    docs.foreach { case (id, text) =>
      val (n, mean, sym, alpha, sw, bullet, ellipsis) = refStats(text)
      val r = out(id)
      assert(r.getLong(1) == n, s"doc $id n_words: spark=${r.getLong(1)} ref=$n text=${text.take(60)}")
      assert(math.abs(r.getDouble(2) - mean) < 1e-12, s"doc $id mean_word_len")
      assert(math.abs(r.getDouble(3) - sym) < 1e-12, s"doc $id symbol_ratio: spark=${r.getDouble(3)} ref=$sym text=${text.take(80)}")
      assert(math.abs(r.getDouble(4) - alpha) < 1e-12, s"doc $id alpha_frac")
      assert(r.getLong(5) == sw, s"doc $id sw_hits")
      assert(math.abs(r.getDouble(6) - bullet) < 1e-12, s"doc $id bullet_frac text=${text.take(80)}")
      assert(math.abs(r.getDouble(7) - ellipsis) < 1e-12, s"doc $id ellipsis_frac text=${text.take(80)}")
    }
  }
}
