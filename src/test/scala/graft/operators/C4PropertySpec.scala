package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Randomized parity: the line-level C4 cleaner must agree with an
  * independent plain-Scala reference on arbitrary ASCII documents —
  * \r\n line endings, tab/space trims, empty lines, and terminal-punct
  * edge cases are where split/regex expression semantics drift (the
  * GopherPropertySpec lesson). */
class C4PropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // ---- independent reference implementation ----
  private def refClean(text: String, minWords: Int): (Long, Long, String) = {
    val lines = text.split("\n", -1)
    def trim(s: String) = s
      .dropWhile(c => c == ' ' || c == '\t' || c == '\r')
      .reverse.dropWhile(c => c == ' ' || c == '\t' || c == '\r').reverse
    val kept = lines.filter { l =>
      val t = trim(l)
      t.nonEmpty && ".!?\"".contains(t.last) &&
        t.split(" ", -1).count(_.nonEmpty) >= minWords &&
        !l.toLowerCase.contains("lorem ipsum") &&
        !l.contains("{") &&
        !l.toLowerCase.contains("javascript")
    }
    (lines.length.toLong, kept.length.toLong, kept.mkString("\n"))
  }

  test("c4LineClean agrees with the reference on 300 random ASCII docs") {
    val rnd = new scala.util.Random(777)
    val pieces = Seq("the fox runs fast today.", "menu | nav | home",
      "ok fine then.", "a b c d.", "x { y", "Lorem Ipsum dolor sit.",
      "please use JavaScript here.", "what is happening now?", "sure thing!",
      "\"a quoted line indeed.\"", "trailing spaces here.  ", "  leading pad.",
      "a.b. c.d. e.f.", "1 2 3 4!", "", " .", "word", "\tindent tab line.",
      "two words.", "ends with bang !")
    val seps = Seq("\n", "\n", "\r\n", "\n ", "\n\t")
    val docs = (0L until 300L).map { i =>
      val k = rnd.nextInt(12)
      (i, Seq.fill(k)(pieces(rnd.nextInt(pieces.length)))
        .reduceLeftOption((a, b) => a + seps(rnd.nextInt(seps.length)) + b)
        .getOrElse(""))
    }
    val out = QualityRules.c4LineClean(docs.toDF("id", "text"), "text")
      .select("id", "n_lines", "n_kept", "text_clean")
      .collect().map(r => r.getLong(0) -> r).toMap
    docs.foreach { case (id, text) =>
      val (n, k, clean) = refClean(text, 3)
      if (k == 0)
        assert(!out.contains(id), s"doc $id should be dropped: ${text.take(80)}")
      else {
        val r = out(id)
        assert(r.getLong(1) == n, s"doc $id n_lines: spark=${r.getLong(1)} ref=$n")
        assert(r.getLong(2) == k,
          s"doc $id n_kept: spark=${r.getLong(2)} ref=$k text=${text.take(80)}")
        assert(r.getString(3) == clean, s"doc $id text_clean drift: " +
          s"spark=${r.getString(3).take(80)} ref=${clean.take(80)}")
      }
    }
  }
}
