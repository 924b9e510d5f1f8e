package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TRAINED language identification — the per-language router CCNet /
  * FineWeb actually run, replacing the stopword-probe CASE
  * (`TextFunctions.langId`, kept as the cheap pre-filter) with a model
  * learned from labeled text.
  *
  * Model: multinomial Naive Bayes over HASHED CHARACTER TRIGRAMS — the
  * classic fastText-shaped linear classifier (score = Σ per-feature
  * weights, argmax over languages) whose training is ONE counting
  * aggregation, which is exactly why it is the right first model at
  * corpus scale: no iteration, no learning rate, and the whole
  * train+score pipeline replays symbolically in an independent engine.
  *
  *   w(ℓ, b) = round(1e6 · ln((c(ℓ,b) + 1) / (n(ℓ) + dim)))
  *
  * — Laplace-smoothed log-likelihood in integer MICRO units (the
  * QualityClassifier integer fixed-point discipline, 1e3 finer because
  * a trigram's |ln p| ≈ 9 and argmax margins live in the 4th decimal).
  * After the one rounded `ln` per (language, bucket), every quantity a
  * shuffle can reorder is an exact integer sum, so predictions are
  * bit-stable under any partitioning and the DuckDB oracle reproduces
  * them term-for-term (the round-6 libm-parity contract covers the ln,
  * as it already does for BM25 idf and the perplexity gate).
  *
  * Scale shape:
  *   - [[train]]: one explode+hash scan over the labeled fixture, one
  *     (lang, bucket) count, one lang total — the DENSE model is
  *     dim × |langs| rows (4096 × 6 ≈ 25k, ~400 KB) and broadcasts
  *     everywhere, the same bounded-by-model-size contract as
  *     [[QualityClassifier]];
  *   - [[route]]: one explode+hash scan over the corpus, a broadcast
  *     join against the dense model (inner — every bucket exists, so
  *     no per-language default logic), one (doc, lang) partial-agg'd
  *     sum, one (doc) argmax fold. TWO shuffles total, both keyed by
  *     doc id, independent of language count.
  *
  * The dense model deliberately materializes unseen buckets at the
  * smoothing floor: it trades a few hundred KB of broadcast for
  * removing the left-join + per-language-default branch from the
  * per-trigram hot path.
  *
  * Reference analog: the pipeline has no language routing (its corpus
  * is English legal text by construction); this is the stage a
  * multilingual crawl inserts before any per-language quality scoring.
  */
object LangId {

  /** Hash-bucket dimension: 4096 keeps the dense 6-language model at
    * ~25k rows while trigram collisions stay rare enough for clean
    * margins (the spec asserts fixture accuracy). */
  val Dim = 4096

  /** The planted training fixture, the SINGLE source for both engines:
    * (language, sentence) — 8 sentences per language, apostrophe-free
    * so the oracle can embed them as SQL literals verbatim. */
  val FixtureSentences: Seq[(String, String)] = Seq(
    "en" -> "the quick brown fox jumps over the lazy dog near the river bank",
    "en" -> "machine learning models require large amounts of training data to work well",
    "en" -> "she walked through the old market looking for fresh bread and cheese",
    "en" -> "the weather this morning was cold with a light rain falling slowly",
    "en" -> "many people believe that reading books improves both memory and focus",
    "en" -> "the committee will meet on thursday to discuss the annual budget report",
    "en" -> "children played football in the park while their parents watched nearby",
    "en" -> "this software update fixes several bugs and improves overall performance",
    "de" -> "der schnelle braune fuchs springt über den faulen hund am flussufer",
    "de" -> "maschinelles lernen benötigt grosse mengen an trainingsdaten um gut zu funktionieren",
    "de" -> "sie ging über den alten markt und suchte frisches brot und käse",
    "de" -> "das wetter heute morgen war kalt mit leichtem regen der langsam fiel",
    "de" -> "viele menschen glauben dass das lesen von büchern das gedächtnis verbessert",
    "de" -> "der ausschuss trifft sich am donnerstag um den jahresbericht zu besprechen",
    "de" -> "kinder spielten fussball im park während ihre eltern in der nähe zusahen",
    "de" -> "dieses software update behebt mehrere fehler und verbessert die leistung deutlich",
    "fr" -> "le rapide renard brun saute par dessus le chien paresseux près de la rivière",
    "fr" -> "l apprentissage automatique nécessite de grandes quantités de données pour bien fonctionner",
    "fr" -> "elle a traversé le vieux marché en cherchant du pain frais et du fromage",
    "fr" -> "le temps ce matin était froid avec une pluie légère qui tombait lentement",
    "fr" -> "beaucoup de gens croient que la lecture des livres améliore la mémoire",
    "fr" -> "le comité se réunira jeudi pour discuter du rapport annuel du budget",
    "fr" -> "les enfants jouaient au football dans le parc pendant que leurs parents regardaient",
    "fr" -> "cette mise à jour corrige plusieurs bogues et améliore les performances globales",
    "es" -> "el rápido zorro marrón salta sobre el perro perezoso cerca del río",
    "es" -> "el aprendizaje automático requiere grandes cantidades de datos para funcionar bien",
    "es" -> "ella caminó por el viejo mercado buscando pan fresco y queso",
    "es" -> "el clima esta mañana era frío con una lluvia ligera que caía lentamente",
    "es" -> "muchas personas creen que leer libros mejora la memoria y la concentración",
    "es" -> "el comité se reunirá el jueves para discutir el informe anual del presupuesto",
    "es" -> "los niños jugaban al fútbol en el parque mientras sus padres miraban cerca",
    "es" -> "esta actualización corrige varios errores y mejora el rendimiento general del sistema",
    "it" -> "la rapida volpe marrone salta sopra il cane pigro vicino al fiume",
    "it" -> "l apprendimento automatico richiede grandi quantità di dati per funzionare bene",
    "it" -> "lei camminava per il vecchio mercato cercando pane fresco e formaggio",
    "it" -> "il tempo questa mattina era freddo con una pioggia leggera che cadeva lentamente",
    "it" -> "molte persone credono che leggere libri migliori la memoria e la concentrazione",
    "it" -> "il comitato si riunirà giovedì per discutere il rapporto annuale del bilancio",
    "it" -> "i bambini giocavano a calcio nel parco mentre i loro genitori guardavano vicino",
    "it" -> "questo aggiornamento corregge diversi errori e migliora le prestazioni complessive del sistema",
    "pt" -> "a rápida raposa marrom pula sobre o cachorro preguiçoso perto do rio",
    "pt" -> "o aprendizado de máquina requer grandes quantidades de dados para funcionar bem",
    "pt" -> "ela caminhou pelo velho mercado procurando pão fresco e queijo",
    "pt" -> "o tempo esta manhã estava frio com uma chuva leve caindo devagar",
    "pt" -> "muitas pessoas acreditam que ler livros melhora a memória e a concentração",
    "pt" -> "o comitê se reunirá na quinta feira para discutir o relatório anual do orçamento",
    "pt" -> "as crianças jogavam futebol no parque enquanto seus pais observavam por perto",
    "pt" -> "esta atualização corrige vários erros e melhora o desempenho geral do sistema")

  /** The fixture languages in sorted order (argmax tie-break order). */
  val Langs: Seq[String] = FixtureSentences.map(_._1).distinct.sorted

  /** The fixture as a frame — in production this is
    * `spark.read.parquet(labeledCorpusPath)` instead. */
  def trainingFixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    FixtureSentences.toDF("lang", "text")
  }

  /** Character trigrams of the lowercased text — empty below 3 chars
    * (guarded: Spark's `sequence(1, 0)` DESCENDS, it is not empty). */
  def charTrigrams(text: Column): Column = {
    val t = lower(text)
    when(length(t) >= 3,
      transform(sequence(lit(1), length(t) - 2), i => t.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))
  }

  /** Feature hash: the engine's oracle-portable md5 fold into `dim`
    * buckets (identical to [[QualityClassifier.tokenBucket]]). */
  def gramBucket(g: Column, dim: Int): Column =
    QualityClassifier.tokenBucket(g, dim)

  /** Train the dense NB model: (lang, bucket, w_micro), dim rows per
    * language. One counting pass; the model is metadata-sized. */
  def train(fixture: DataFrame, dim: Int = Dim): DataFrame = {
    val spark = fixture.sparkSession
    val grams = fixture
      .select(col("lang"), explode(charTrigrams(col("text"))).as("__g"))
      .select(col("lang"), gramBucket(col("__g"), dim).as("bucket"))
    val counts = grams.groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("__c"))
    val totals = grams.groupBy(col("lang")).agg(count(lit(1)).as("__n"))
    spark.range(dim).select(col("id").as("bucket"))
      .crossJoin(broadcast(totals))
      .join(counts, Seq("lang", "bucket"), "left")
      .select(col("lang"), col("bucket"),
        round(log((coalesce(col("__c"), lit(0L)) + 1).cast("double") /
          (col("__n") + dim).cast("double")) * 1e6, 0)
          .cast("long").as("w_micro"))
  }

  /** Route every document to its argmax language. Documents shorter
    * than one trigram carry no evidence and are excluded (the oracle's
    * GROUP BY does the same). Ties break on language ascending.
    *
    * @return (idCol, lang_pred, score_micro) */
  def route(docs: DataFrame, textCol: String, idCol: String,
            model: DataFrame, dim: Int = Dim): DataFrame = {
    val feats = docs
      .select(col(idCol), explode(charTrigrams(col(textCol))).as("__g"))
      .select(col(idCol), gramBucket(col("__g"), dim).as("bucket"))
    feats.join(broadcast(model), Seq("bucket"))
      .groupBy(col(idCol), col("lang"))
      .agg(sum(col("w_micro")).as("score_micro"))
      // argmax fold: min over (-score, lang) = highest score, then
      // lexicographically first language on an exact tie
      .groupBy(col(idCol))
      .agg(min(struct((-col("score_micro")).as("neg"), col("lang").as("l")))
        .as("__m"))
      .select(col(idCol), col("__m.l").as("lang_pred"),
        (-col("__m.neg")).as("score_micro"))
  }
}
