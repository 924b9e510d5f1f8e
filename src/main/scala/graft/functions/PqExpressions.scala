package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization hot-path kernels ([[graft.operators.Pq]]).
  *
  * The declarative form of PQ assignment is a fold over k codewords of a
  * fold over ds dimensions, per subspace — nested `aggregate`/`zip_with`
  * higher-order functions, which Spark evaluates interpreted (one
  * closure dispatch + boxing per element per lambda). That costs ~3 ms
  * per row at m=4·k=8·D=64 — linear in rows, but a constant that turns a
  * 100 TB encode pass into CPU-bound interpretation. Same lesson as
  * [[SketchKernels]]: run the whole per-row loop as one static-call
  * kernel inside the unbroken whole-stage-codegen span (measured ~5× on
  * the q_ann_pq gate end-to-end; the expression-fold version spent most
  * of its time in ArrayAggregate interpretation).
  *
  * The codebook rides into generated code via `ctx.addReferenceObj` (the
  * [[SketchExpressions.HyperplaneSig]] pattern): a flat `long[]` indexed
  * `(sub·k + cid−1)·ds + pos` — k·D longs, metadata-sized, shipped once
  * per task not per row. All arithmetic is the integer contract of
  * [[graft.operators.Clustering.kmeans]]: milli-unit inputs, micro-unit
  * centroids, exact Long squared distances, ties to the smallest cid. */
object PqKernels {

  /** codes[j] = argmin over cid∈1..k of ‖e[j·ds..)·1000 − c(j,cid)‖²,
    * smallest cid on ties. `e` is the milli-unit embedding (length m·ds,
    * no nulls — callers filter malformed embeddings first). */
  def pqEncode(e: ArrayData, centers: Array[Long], m: Int, k: Int,
               ds: Int): ArrayData = {
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Long.MaxValue
      var bestCid = 1
      var cid = 1
      while (cid <= k) {
        val base = (j * k + cid - 1) * ds
        var d = 0L
        var p = 0
        while (p < ds) {
          val t = e.getLong(j * ds + p) * 1000L - centers(base + p)
          d += t * t
          p += 1
        }
        if (d < best) { best = d; bestCid = cid }
        cid += 1
      }
      out(j) = bestCid
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  /** ADC lookup table for one query: out[j·k + cid−1] = exact distance
    * from the query's j-th milli subvector to micro centroid (j, cid). */
  def pqLut(qe: ArrayData, centers: Array[Long], m: Int, k: Int,
            ds: Int): ArrayData = {
    val out = new Array[Long](m * k)
    var j = 0
    while (j < m) {
      var cid = 1
      while (cid <= k) {
        val base = (j * k + cid - 1) * ds
        var d = 0L
        var p = 0
        while (p < ds) {
          val t = qe.getLong(j * ds + p) * 1000L - centers(base + p)
          d += t * t
          p += 1
        }
        out(j * k + cid - 1) = d
        cid += 1
      }
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  /** ADC distance: Σ_j lut[j·k + codes[j]−1]. m table lookups replace
    * D multiplies — the whole point of PQ search. */
  def pqAdc(codes: ArrayData, lut: ArrayData, k: Int): Long = {
    val m = codes.numElements()
    var s = 0L
    var j = 0
    while (j < m) {
      s += lut.getLong(j * k + codes.getInt(j) - 1)
      j += 1
    }
    s
  }
}

object PqExpressions {

  /** PQ code assignment against a literal codebook — one kernel call per
    * row, codebook as a task-constant reference object. */
  case class PqEncode(child: Expression, centers: Array[Long], m: Int,
                      k: Int, ds: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "pq_encode"
    override def nullSafeEval(e: Any): Any =
      PqKernels.pqEncode(e.asInstanceOf[ArrayData], centers, m, k, ds)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqCenters", centers, "long[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.PqKernels.pqEncode($c, $ref, $m, $k, $ds)")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Per-query ADC lookup table (m·k exact distances). */
  case class PqLut(child: Expression, centers: Array[Long], m: Int,
                   k: Int, ds: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "pq_lut"
    override def nullSafeEval(qe: Any): Any =
      PqKernels.pqLut(qe.asInstanceOf[ArrayData], centers, m, k, ds)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqCenters", centers, "long[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.PqKernels.pqLut($c, $ref, $m, $k, $ds)")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** ADC score: m lookups into the query's table. */
  case class PqAdc(left: Expression, right: Expression, k: Int)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "pq_adc"
    override def nullSafeEval(codes: Any, lut: Any): Any =
      PqKernels.pqAdc(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (c, l) =>
        s"graft.functions.PqKernels.pqAdc($c, $l, $k)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def pqEncode(e: Column, centers: Array[Long], m: Int, k: Int, ds: Int): Column =
    column(PqEncode(expression(e), centers, m, k, ds))
  def pqLut(qe: Column, centers: Array[Long], m: Int, k: Int, ds: Int): Column =
    column(PqLut(expression(qe), centers, m, k, ds))
  def pqAdc(codes: Column, lut: Column, k: Int): Column =
    column(PqAdc(expression(codes), expression(lut), k))
}
