package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
  */
object SketchExpressions {

  /** MinHash signature over pre-hashed shingles: out[i] = min over the
    * input longs h of XXH64(h, seed=i). Null input → null; empty array →
    * Long.MaxValue per slot (empty-set signature). */
  case class MinHashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "minhash_signature"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[Long](numHashes)
      java.util.Arrays.fill(out, Long.MaxValue)
      var j = 0
      while (j < n) {
        val h = arr.getLong(j)
        var i = 0
        while (i < numHashes) {
          val v = XXH64.hashLong(h, i)
          if (v < out(i)) out(i) = v
          i += 1
        }
        j += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** 64-bit SimHash over pre-hashed tokens: each input long votes ±1 per
    * bit position; output bit i is 1 iff the vote is positive. */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "simhash64"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counters = new Array[Int](64)
      var j = 0
      while (j < n) {
        val h = arr.getLong(j)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) counters(i) += 1 else counters(i) -= 1
          i += 1
        }
        j += 1
      }
      var out = 0L
      var i = 0
      while (i < 64) {
        if (counters(i) > 0) out |= (1L << i)
        i += 1
      }
      java.lang.Long.valueOf(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** k-token shingle hashes straight from the token array: hashes each
    * k-window of tokens (joined with a separator) in one pass — the
    * string-building of `concat_ws(slice(...))` per window without the
    * per-window lambda machinery. Output is the DISTINCT window hashes. */
  case class ShingleHashes(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "shingle_hashes"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val seen = new java.util.TreeSet[java.lang.Long]()
      if (n == 0) return new GenericArrayData(Array.empty[Long])
      val toks = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var i = 0
      while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
      val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
      if (n < k) {
        val joined = org.apache.spark.unsafe.types.UTF8String.concatWs(sep, toks: _*)
        seen.add(hashUtf8(joined))
      } else {
        var s = 0
        while (s <= n - k) {
          val win = java.util.Arrays.copyOfRange(toks, s, s + k)
          val joined = org.apache.spark.unsafe.types.UTF8String.concatWs(sep, win: _*)
          seen.add(hashUtf8(joined))
          s += 1
        }
      }
      val out = new Array[Long](seen.size())
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      new GenericArrayData(out)
    }

    private def hashUtf8(s: org.apache.spark.unsafe.types.UTF8String): Long =
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Character-class counts in ONE pass over the string: [total, letters,
    * digits, punctuation, whitespace]. The ratio features of quality
    * scoring otherwise cost a full regexp_replace (string rebuild) per
    * class per row. */
  case class CharStats(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "char_stats"

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      var letters = 0L; var digits = 0L; var punct = 0L; var ws = 0L
      var i = 0
      val n = s.length
      while (i < n) {
        val c = s.charAt(i)
        if (Character.isLetter(c)) letters += 1
        else if (Character.isDigit(c)) digits += 1
        else if (Character.isWhitespace(c)) ws += 1
        else if (!Character.isISOControl(c)) punct += 1
        i += 1
      }
      new GenericArrayData(Array(n.toLong, letters, digits, punct, ws))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Marker-profile language scoring in one pass over the token array:
    * returns the profile with the most marker hits (ties → first in the
    * given order), or "und" when nothing scores. The HOF equivalent runs
    * one interpreted filter pass per profile. */
  case class LangScore(child: Expression, profiles: Seq[(String, Seq[String])])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "lang_score"

    @transient private lazy val names: Array[org.apache.spark.unsafe.types.UTF8String] =
      profiles.map(p => org.apache.spark.unsafe.types.UTF8String.fromString(p._1)).toArray
    @transient private lazy val sets: Array[java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]] =
      profiles.map { case (_, markers) =>
        val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
        markers.foreach(m => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(m)))
        s
      }.toArray
    @transient private lazy val und =
      org.apache.spark.unsafe.types.UTF8String.fromString("und")

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Int](sets.length)
      var j = 0
      while (j < n) {
        val t = arr.getUTF8String(j)
        var i = 0
        while (i < sets.length) {
          if (sets(i).contains(t)) counts(i) += 1
          i += 1
        }
        j += 1
      }
      var best = -1; var bestN = 0
      var i = 0
      while (i < counts.length) {
        if (counts(i) > bestN) { bestN = counts(i); best = i }
        i += 1
      }
      if (best < 0) und else names(best)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** All hyperplane sign bits in one pass over the embedding: bit i of the
    * output is 1 iff dot(emb, planes[i]) > 0. The interpreted-HOF
    * equivalent costs numPlanes × dim lambda dispatches per row. */
  case class HyperplaneSig(child: Expression, planes: Array[Array[Double]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "hyperplane_sig"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val d = arr.numElements()
      val v = new Array[Double](d)
      var i = 0
      while (i < d) { v(i) = arr.getDouble(i); i += 1 }
      var sig = 0L
      var p = 0
      while (p < planes.length) {
        val plane = planes(p)
        var dotv = 0.0
        var j = 0
        val lim = math.min(d, plane.length)
        while (j < lim) { dotv += v(j) * plane(j); j += 1 }
        if (dotv > 0) sig |= (1L << p)
        p += 1
      }
      java.lang.Long.valueOf(sig)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Primitive-loop dot product of two double arrays. */
  case class DotProduct(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "dot_product"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      java.lang.Double.valueOf(acc)
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // Column wrappers (classic bridge: Column ↔ catalyst Expression)
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def minhashSignature(hashes: Column, numHashes: Int): Column =
    column(MinHashSignature(expression(hashes), numHashes))
  def simhash64(hashes: Column): Column =
    column(SimHash64(expression(hashes)))
  def shingleHashes(tokens: Column, k: Int): Column =
    column(ShingleHashes(expression(tokens), k))
  def charStats(text: Column): Column =
    column(CharStats(expression(text)))
  def langScore(tokens: Column, profiles: Seq[(String, Seq[String])]): Column =
    column(LangScore(expression(tokens), profiles))
  def hyperplaneSig(emb: Column, planes: Array[Array[Double]]): Column =
    column(HyperplaneSig(expression(emb), planes))
  def dotProduct(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
}
