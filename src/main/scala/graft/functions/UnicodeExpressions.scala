package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for the text-cleanup path.
  *
  * Crawl text arrives in mixed normalization forms — decomposed accents
  * (e+U+0301) from mac filesystems, compatibility ligatures, fullwidth
  * ASCII — and every downstream exact/near-dup hash treats byte-different
  * spellings of the SAME string as different documents. Normalizing to
  * NFC before fingerprinting is therefore the first pass of a 100 TB text
  * pipeline. Spark has no built-in for it; this is the custom-Expression
  * version (codegen'd, stays inside the whole-stage span) rather than a
  * UDF (which would box every row and break the span).
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation for
  * text that is already NFC — the overwhelming majority of real corpora —
  * so the expensive normalize allocation only runs on the exceptions.
  */
object UnicodeKernels {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

object UnicodeExpressions {

  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "nfc_normalize"

    override def nullSafeEval(input: Any): Any =
      UnicodeKernels.nfc(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeKernels.nfc($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** NFC-normalize a string column (codegen, null-preserving). */
  def nfcNormalize(c: Column): Column = column(NfcNormalize(expression(c)))
}
