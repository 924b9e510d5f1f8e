package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnicodeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // All non-ASCII below is spelled as \\uXXXX escapes: decomposed inputs
  // (base char + combining mark) versus their precomposed NFC forms must
  // be byte-distinct in SOURCE, which editors silently re-normalize.

  private def nfc(s: String): String =
    Seq(s).toDF("t")
      .select(UnicodeExpressions.nfcNormalize($"t").as("n"))
      .collect()(0).getString(0)

  test("decomposed accents compose to single code points") {
    assert(nfc("cafe\u0301") == "caf\u00E9")
    assert(nfc("A\u030Angstro\u0308m") ==
      java.text.Normalizer.normalize("A\u030Angstro\u0308m",
        java.text.Normalizer.Form.NFC))
  }

  test("already-NFC text is unchanged (fast path) and ASCII is identity") {
    assert(nfc("caf\u00E9") == "caf\u00E9")
    assert(nfc("plain ascii text") == "plain ascii text")
    assert(nfc("") == "")
  }

  test("matches java.text.Normalizer on mixed-form samples") {
    val samples = Seq(
      "\u212B",        // ANGSTROM SIGN: NFC maps it to U+00C5
      "na\u00EFve e\u0301\u0301", // stacked combining marks
      "\uFB01le")        // fi-ligature: NFC keeps it (compat is NFKC's job)
    samples.foreach { s =>
      assert(nfc(s) ==
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC), s)
    }
  }

  test("null flows through, char length contracts on composition") {
    val rows = Seq(Some("e" + "\u0301"), None).toDF("t")
      .select(UnicodeExpressions.nfcNormalize($"t").as("n"),
        length(UnicodeExpressions.nfcNormalize($"t")).as("len"))
      .collect()
    assert(rows(0).getString(0) == "\u00E9" && rows(0).getInt(1) == 1)
    assert(rows(1).isNullAt(0))
  }
}
