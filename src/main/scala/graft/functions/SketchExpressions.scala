package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the sketching hot path.
  *
  * Spark's higher-order functions (`transform`/`aggregate`) are evaluated
  * interpreted — one closure dispatch plus boxing per element per lambda.
  * A 32-hash MinHash over ~300 shingles costs ~10k lambda evaluations per
  * row that way. These expressions run the whole sketch as one tight
  * primitive loop per row (measured ~10× on the documents corpus), which
  * is the difference between a feasible and an infeasible 100 TB dedup
  * pass. Semantics (not implementation) follow the standard MinHash /
  * SimHash constructions used by the public Spark/Flink ecosystems.
  *
  * Every expression implements `doGenCode` as a static call into
  * [[SketchKernels]]: the surrounding whole-stage codegen span stays
  * UNBROKEN (a CodegenFallback here would split the stage and route every
  * row through interpreted eval), janino compiles one call instead of the
  * loop body, and the JVM JIT owns the kernel. */
object SketchExpressions {

  /** MinHash signature over pre-hashed shingles: out[i] = min over the
    * input longs h of XXH64(h, seed=i). Null input → null; empty array →
    * Long.MaxValue per slot (empty-set signature). */
  case class MinHashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "minhash_signature"

    override def nullSafeEval(input: Any): Any =
      SketchKernels.minhashSignature(input.asInstanceOf[ArrayData], numHashes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.SketchKernels.minhashSignature($c, $numHashes)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** 64-bit SimHash over pre-hashed tokens: each input long votes ±1 per
    * bit position; output bit i is 1 iff the vote is positive. */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "simhash64"

    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(SketchKernels.simhash64(input.asInstanceOf[ArrayData]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.simhash64($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** k-token shingle hashes straight from the token array: hashes each
    * k-window of tokens (joined with a separator) in one pass — the
    * string-building of `concat_ws(slice(...))` per window without the
    * per-window lambda machinery. Output is the DISTINCT window hashes. */
  case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "shingle_hashes"

    override def nullSafeEval(input: Any): Any =
      SketchKernels.shingleHashes(input.asInstanceOf[ArrayData], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.SketchKernels.shingleHashes($c, $k)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Character-class counts in ONE pass over the string: [total, letters,
    * digits, punctuation, whitespace]. The ratio features of quality
    * scoring otherwise cost a full regexp_replace (string rebuild) per
    * class per row. */
  case class CharStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "char_stats"

    override def nullSafeEval(input: Any): Any =
      SketchKernels.charStats(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.charStats($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Repetition stats over the token n-grams in one pass:
    * [total, distinct, maxFreq] — the Gopher/MassiveText intra-document
    * repetition signals (duplicate-gram fraction, top-gram coverage)
    * straight from the token array, without materializing a gram array,
    * a per-doc groupBy, or an O(k²) HOF count. */
  case class NgramRepStats(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "ngram_rep_stats"

    override def nullSafeEval(input: Any): Any =
      SketchKernels.ngramRepStats(input.asInstanceOf[ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.ngramRepStats($c, $n)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Marker-profile language scoring in one pass over the token array:
    * returns the profile with the most marker hits (ties → first in the
    * given order), or "und" when nothing scores. The HOF equivalent runs
    * one interpreted filter pass per profile. */
  case class LangScore(child: Expression, profiles: Seq[(String, Seq[String])])
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "lang_score"

    @transient private lazy val kernel = new LangProfilesKernel(profiles)

    override def nullSafeEval(input: Any): Any =
      kernel.score(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // profiles ride into generated code as a referenced runtime object
      val ref = ctx.addReferenceObj("langProfiles", new LangProfilesKernel(profiles),
        classOf[LangProfilesKernel].getName)
      defineCodeGen(ctx, ev, c => s"$ref.score($c)")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** All hyperplane sign bits in one pass over the embedding: bit i of the
    * output is 1 iff dot(emb, planes[i]) > 0. The interpreted-HOF
    * equivalent costs numPlanes × dim lambda dispatches per row. */
  case class HyperplaneSig(child: Expression, planes: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "hyperplane_sig"

    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(
        SketchKernels.hyperplaneSig(input.asInstanceOf[ArrayData], planes))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("planes", planes, "double[][]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.SketchKernels.hyperplaneSig($c, $ref)")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** One-pass compiled tokenizer — exact replacement for
    * `filter(split(s, "[^\\p{L}\\p{N}]+"), length(t) > 0)`, which breaks
    * whole-stage codegen (higher-order functions are CodegenFallback) and
    * pays a regex matcher per row. See [[SketchKernels.tokenize]]. */
  case class Tokenize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "tokenize"

    override def nullSafeEval(input: Any): Any =
      SketchKernels.tokenize(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.tokenize($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Per-band LSH keys from a MinHash signature (see
    * [[SketchKernels.bandHashes]]). */
  case class BandHashes(child: Expression, bands: Int, rows: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "band_hashes"

    override def nullSafeEval(input: Any): Any =
      SketchKernels.bandHashes(input.asInstanceOf[ArrayData], bands, rows)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.SketchKernels.bandHashes($c, $bands, $rows)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** xxhash64 per token (Spark's seed) — replacement for
    * `transform(toks, t => xxhash64(t))` (interpreted lambda per element). */
  case class TokenHashes(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "token_hashes"

    override def nullSafeEval(input: Any): Any =
      SketchKernels.tokenHashes(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.tokenHashes($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Oracle-portable md5-family MinHash signature over string shingles
    * (see [[SketchKernels.md5MinhashSignature]]) — the audit twin of
    * [[MinHashSignature]]: same banding machinery, hash family an
    * independent SQL engine can recompute bit-for-bit. */
  case class Md5MinhashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "md5_minhash_signature"

    override def nullSafeEval(input: Any): Any =
      SketchKernels.md5MinhashSignature(input.asInstanceOf[ArrayData], numHashes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.SketchKernels.md5MinhashSignature($c, $numHashes)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Primitive-loop dot product of two double arrays. */
  case class DotProduct(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "dot_product"

    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Double.valueOf(
        SketchKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (x, y) => s"graft.functions.SketchKernels.dot($x, $y)")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // Column wrappers (classic bridge: Column ↔ catalyst Expression)
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def minhashSignature(hashes: Column, numHashes: Int): Column =
    column(MinHashSignature(expression(hashes), numHashes))
  def md5MinhashSignature(shingles: Column, numHashes: Int): Column =
    column(Md5MinhashSignature(expression(shingles), numHashes))
  def tokenize(text: Column): Column =
    column(Tokenize(expression(text)))
  def bandHashes(sig: Column, bands: Int, rows: Int): Column =
    column(BandHashes(expression(sig), bands, rows))
  def tokenHashes(tokens: Column): Column =
    column(TokenHashes(expression(tokens)))
  def simhash64(hashes: Column): Column =
    column(SimHash64(expression(hashes)))
  def shingleHashes(tokens: Column, k: Int): Column =
    column(ShingleHashes(expression(tokens), k))
  def charStats(text: Column): Column =
    column(CharStats(expression(text)))
  def ngramRepStats(tokens: Column, n: Int): Column =
    column(NgramRepStats(expression(tokens), n))
  def langScore(tokens: Column, profiles: Seq[(String, Seq[String])]): Column =
    column(LangScore(expression(tokens), profiles))
  def hyperplaneSig(emb: Column, planes: Array[Array[Double]]): Column =
    column(HyperplaneSig(expression(emb), planes))
  def dotProduct(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** Scan-side Bloom membership probe over a LONG column — Spark's own
    * runtime-filter expression (`BloomFilterMightContain`, codegen'd)
    * fed a pre-built `util.sketch.BloomFilter`. The sketch serializes
    * into the plan as a binary literal: ~10 bits/key at 1% FPP, 16×
    * smaller than broadcasting the exact 64-bit hash set. */
  def bloomMightContain(bloom: org.apache.spark.util.sketch.BloomFilter,
                        value: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(
        bos.toByteArray,
        org.apache.spark.sql.types.BinaryType),
      expression(value)))
  }
}
