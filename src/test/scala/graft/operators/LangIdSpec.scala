package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** [[LangId]] — the trained char-trigram NB router: it must actually
  * identify languages (the oracle gate only proves replay; accuracy is
  * pinned here), exclude evidence-free texts, and stay deterministic. */
class LangIdSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val model = LangId.train(LangId.trainingFixture(spark))

  test("training sentences route back to their own language") {
    val fixture = LangId.trainingFixture(spark)
      .withColumn("id", monotonically_increasing_id())
    val routed = LangId.route(fixture, "text", "id", model)
      .join(fixture, "id")
      .select(col("lang"), col("lang_pred")).collect()
    val wrong = routed.filter(r => r.getString(0) != r.getString(1))
    assert(wrong.isEmpty,
      s"misrouted training sentences: ${wrong.mkString(", ")}")
  }

  test("held-out phrases route correctly (>= 5 of 6; es/pt are close kin)") {
    val held = Seq(
      ("en", "please bring the financial report to the office early tomorrow morning"),
      ("de", "bitte bringen sie den finanzbericht morgen früh ins büro mit"),
      ("fr", "veuillez apporter le rapport financier au bureau demain matin"),
      ("es", "por favor traiga el informe financiero a la oficina temprano"),
      ("it", "per favore porta il rapporto finanziario in ufficio domani mattina"),
      ("pt", "por favor traga o relatório financeiro para o escritório amanhã"))
      .toDF("lang", "text").withColumn("id", monotonically_increasing_id())
    val routed = LangId.route(held, "text", "id", model)
      .join(held, "id").select(col("lang"), col("lang_pred")).collect()
    val right = routed.count(r => r.getString(0) == r.getString(1))
    assert(right >= 5, s"held-out accuracy $right/6: " +
      routed.map(r => s"${r.getString(0)}->${r.getString(1)}").mkString(", "))
  }

  test("texts below one trigram carry no evidence and are excluded") {
    val tiny = Seq((1L, ""), (2L, "ab"), (3L, "abc")).toDF("id", "text")
    val out = LangId.route(tiny, "text", "id", model).collect()
    assert(out.map(_.getLong(0)).toSet == Set(3L))
  }

  test("route is deterministic across repartitionings (integer sums)") {
    val probes = LangId.trainingFixture(spark)
      .withColumn("id", monotonically_increasing_id())
    def run(parts: Int) =
      LangId.route(probes.repartition(parts), "text", "id", model)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    assert(run(1) == run(7))
  }

  test("the trained router beats the stopword probe on accented short text") {
    // the stopword CASE needs marker words; trigram mass works on any
    // in-language span — the reason the trained model is the routed path
    val probe = Seq((1L, "relatório financeiro escritório"))
      .toDF("id", "text")
    val routed = LangId.route(probe, "text", "id", model).collect()
    assert(routed.head.getString(1) == "pt")
  }
}
