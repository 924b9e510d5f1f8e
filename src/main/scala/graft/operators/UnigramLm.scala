package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) tokenizer training — the other half
  * of the production subword world beside [[Bpe]] (Kudo 2018: T5/Llama
  * lineages train a unigram language model over candidate pieces and
  * prune it by EM, where BPE greedily merges).
  *
  * This is the HARD-EM (Viterbi) variant, chosen — like [[Bpe]]'s
  * fixpoint-replace variant — because every step is exactly expressible
  * in any SQL engine, which keeps the whole training loop
  * oracle-checkable end to end:
  *
  *   1. SEED: every substring of length 1..`maxPieceLen` of every
  *      distinct word (occurrence-counted, weighted by word frequency);
  *      pieces below `minSeedCount` are dropped except single
  *      characters, which are ALWAYS kept (coverage: every word must
  *      stay segmentable). Scores are integer MICRO log-probs,
  *      `round(1e6 · ln(c / total))` — after the one rounded ln per
  *      piece, everything is exact integer arithmetic (the
  *      q_pagerank/q_bpe_train fixed-point contract).
  *   2. E-STEP: Viterbi-segment each distinct word under the current
  *      scores — `best(i) = max over piece lengths l of best(i-l) +
  *      score(w[i-l..i])`; the segmentation is recovered BACKWARD from
  *      the word end, breaking exact score ties toward the LONGEST
  *      piece (deterministic, and replayed identically by the oracle's
  *      unrolled DP).
  *   3. M-STEP + PRUNE: piece counts = Viterbi usage weighted by word
  *      frequency; multi-character pieces with zero usage are PRUNED
  *      (the EM vocabulary-pruning step); single-character pieces get a
  *      count floor of 1 (required-coverage smoothing). Rescore, repeat.
  *
  * Words are truncated to `maxWordLen` characters before training —
  * this bounds the oracle's unrolled DP depth; a production run raises
  * the bound (the Scala Viterbi kernel has no such limit built in).
  *
  * Scale shape, per iteration: the corpus is read ONCE into the
  * distinct-word frequency table (executor-resident at any corpus
  * size); the Viterbi runs as a codegen'd scan-side expression over
  * that frame with the vocabulary attached as a reference object
  * (vocabulary is metadata-sized BY CONSTRUCTION — the seed threshold
  * caps it, `require`-guarded); only the piece-count aggregation
  * (bounded by vocabulary size) reaches the driver — the
  * IVF-centers/BPE-argmax pattern.
  *
  * Reference analog: none — the reference has no tokenizer; this is
  * beyond-reference surface beside q_bpe_train / q_vocab_encode.
  */
object UnigramLm {

  /** One trained piece: final Viterbi count and micro log-prob. */
  final case class Piece(piece: String, count: Long, scoreMicro: Long)

  private def microLog(c: Long, total: Long): Long =
    math.round(math.log(c.toDouble / total.toDouble) * 1e6)

  /** The trained model: final Viterbi counts and micro log-prob scores
    * (both keyed by piece — metadata-sized by the seed threshold). */
  final case class Model(counts: Map[String, Long],
                         scores: Map[String, Long])

  /** The distinct truncated-word frequency frame (`__w`, `__f`) both
    * training and segmentation scan. */
  private def wordFreq(docs: DataFrame, textCol: String,
                       maxWordLen: Int): DataFrame =
    docs
      .select(explode(split(col(textCol), " ")).as("__w0"))
      .filter(col("__w0") =!= "")
      .select(substring(col("__w0"), 1, maxWordLen).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
      .localCheckpoint()

  /** Train over the whitespace words of `textCol`.
    *
    * @return (piece, count, score_micro) — the final vocabulary after
    *         `iters` hard-EM rounds, count/score from the last M-step */
  def train(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
            maxWordLen: Int = 8, minSeedCount: Long = 50,
            iters: Int = 2, maxVocab: Int = 500000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val m = trainModel(docs, textCol, maxPieceLen, maxWordLen,
      minSeedCount, iters, maxVocab)
    m.counts.toSeq.sorted
      .map { case (p, c) => Piece(p, c, m.scores(p)) }
      .toDF("piece", "count", "score_micro")
      .select(col("piece"), col("count"), col("score_micro"))
  }

  /** The inference half (the [[Bpe.segment]] sibling): every distinct
    * corpus word segmented under the trained final scores — one
    * codegen'd Viterbi scan over the distinct-word frame, vocabulary as
    * a codegen reference, no join.
    *
    * @return (word, n_pieces, seq) — seq is the space-joined Viterbi
    *         segmentation, one row per distinct (truncated) word */
  def segmentWords(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
                   maxWordLen: Int = 8, minSeedCount: Long = 50,
                   iters: Int = 2, maxVocab: Int = 500000): DataFrame = {
    val m = trainModel(docs, textCol, maxPieceLen, maxWordLen,
      minSeedCount, iters, maxVocab)
    wordFreq(docs, textCol, maxWordLen)
      .select(col("__w").as("word"),
        unigramSegment(col("__w"), m.scores, maxPieceLen).as("__seg"))
      .select(col("word"),
        size(col("__seg")).cast("long").as("n_pieces"),
        array_join(col("__seg"), " ").as("seq"))
  }

  private def trainModel(docs: DataFrame, textCol: String, maxPieceLen: Int,
                         maxWordLen: Int, minSeedCount: Long,
                         iters: Int, maxVocab: Int): Model = {
    require(iters >= 1, "iters must be positive")
    val words = wordFreq(docs, textCol, maxWordLen)
    // SEED: occurrence-counted substrings, weighted by word frequency
    val w = col("__w")
    val pieces = flatten(transform(
      sequence(lit(1), length(w)),
      i => transform(
        sequence(lit(1), least(lit(maxPieceLen), length(w) - i + 1)),
        l => w.substr(i, l))))
    val seed = words
      .select(col("__f"), explode(pieces).as("__p"))
      .groupBy(col("__p")).agg(sum(col("__f")).as("__c"))
      .filter(col("__c") >= minSeedCount || length(col("__p")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(seed.length <= maxVocab,
      s"unigram seed vocabulary ${seed.length} exceeds $maxVocab — raise " +
        "minSeedCount (the vocabulary must stay metadata-sized)")
    var counts: Map[String, Long] = seed.toMap
    var scores: Map[String, Long] = {
      val total = counts.valuesIterator.sum
      counts.map { case (p, c) => p -> microLog(c, total) }
    }
    for (_ <- 1 to iters) {
      val used = words
        .select(col("__f"),
          explode(unigramSegment(col("__w"), scores, maxPieceLen)).as("__p"))
        .groupBy(col("__p")).agg(sum(col("__f")).as("__c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // prune unused multi-char pieces; floor single chars at 1
      counts = scores.keysIterator.flatMap { p =>
        used.get(p) match {
          case Some(c)                  => Some(p -> c)
          case None if p.codePointCount(0, p.length) == 1 => Some(p -> 1L)
          case None                     => None
        }
      }.toMap
      val total = counts.valuesIterator.sum
      scores = counts.map { case (p, c) => p -> microLog(c, total) }
    }
    Model(counts, scores)
  }

  /** The Viterbi segmentation as a codegen'd scan-side column — the
    * vocabulary rides along as a codegen reference object, so the
    * distinct-word scan stays inside whole-stage codegen. */
  def unigramSegment(word: Column, scores: Map[String, Long],
                     maxPieceLen: Int): Column = {
    val jmap = new java.util.HashMap[String, java.lang.Long](
      math.max(16, scores.size * 2))
    scores.foreach { case (p, s) => jmap.put(p, s) }
    column(UnigramSegmentExpr(expression(word), jmap, maxPieceLen))
  }

  case class UnigramSegmentExpr(
      child: Expression,
      vocab: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int) extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def prettyName: String = "unigram_segment"

    override def nullSafeEval(word: Any): Any =
      UnigramKernels.segment(word.asInstanceOf[UTF8String], vocab,
        maxPieceLen)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("unigramVocab", vocab,
        "java.util.HashMap<String, Long>")
      defineCodeGen(ctx, ev, w =>
        s"graft.operators.UnigramKernels.segment($w, $ref, $maxPieceLen)")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}

/** Static Viterbi kernel (the codegen call target). */
object UnigramKernels {

  /** Viterbi-best segmentation of `word` under `vocab` (piece → micro
    * log-prob): forward DP over CHARACTER positions, backward recovery
    * from the end breaking exact ties toward the longest piece — the
    * exact rule the oracle's unrolled DP replays. Positions are UTF-16
    * chars; pieces are substrings, so surrogate pairs survive as long
    * as the vocabulary was built by the same substring rule (it is).
    * An unreachable position (piece pruned mid-word — cannot happen
    * while single chars are floor-kept) yields an empty array rather
    * than a throw: a tokenizer must not kill the job on one word. */
  def segment(word: UTF8String,
              vocab: java.util.HashMap[String, java.lang.Long],
              maxPieceLen: Int): ArrayData = {
    val s = if (word == null) "" else word.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val NegInf = java.lang.Long.MIN_VALUE / 4
    val best = new Array[Long](n + 1)
    var i = 1
    while (i <= n) {
      var b = NegInf
      var l = 1
      val maxL = math.min(maxPieceLen, i)
      while (l <= maxL) {
        if (best(i - l) > NegInf) {
          val sc = vocab.get(s.substring(i - l, i))
          if (sc != null) {
            val v = best(i - l) + sc.longValue()
            if (v > b) b = v
          }
        }
        l += 1
      }
      best(i) = b
      i += 1
    }
    if (best(n) <= NegInf) return new GenericArrayData(Array.empty[Any])
    // backward recovery: at each position take the candidate that
    // reproduces best(pos), longest piece on an exact tie
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = n
    while (pos > 0) {
      var chosen = -1
      var l = math.min(maxPieceLen, pos)
      var found = false
      while (l >= 1 && !found) {
        if (best(pos - l) > NegInf) {
          val sc = vocab.get(s.substring(pos - l, pos))
          if (sc != null && best(pos - l) + sc.longValue() == best(pos)) {
            chosen = l
            found = true
          }
        }
        l -= 1
      }
      // chosen is always found when best(n) is reachable
      out += UTF8String.fromString(s.substring(pos - chosen, pos))
      pos -= chosen
    }
    new GenericArrayData(out.reverse.toArray)
  }
}
