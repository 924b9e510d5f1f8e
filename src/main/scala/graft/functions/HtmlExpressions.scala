package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._

/** Catalyst expressions over [[HtmlKernels]] — HTML text extraction as
  * codegen'd scan-side columns (the [[graft.multimodal.MediaExpressions]]
  * static-call pattern: whole-stage codegen stays unbroken, the JVM JIT
  * owns the per-page scan loop). */
object HtmlExpressions {

  /** (id, text) → full adversarial HTML page (gate-side twin). */
  case class HtmlSynth(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "html_synth"

    override def nullSafeEval(id: Any, text: Any): Any =
      HtmlKernels.htmlSynth(id.asInstanceOf[Long],
        text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (i, t) =>
        s"graft.functions.HtmlKernels.htmlSynth($i, $t)")

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** HTML → extracted main text (kept blocks joined with '\n'). */
  case class HtmlText(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "html_text"

    override def nullSafeEval(html: Any): Any =
      HtmlKernels.htmlText(
        html.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, h => s"graft.functions.HtmlKernels.htmlText($h)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** HTML → [n_blocks, n_kept, n_drop_link, n_drop_short, kept_chars]. */
  case class HtmlStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "html_stats"

    override def nullSafeEval(html: Any): Any =
      HtmlKernels.htmlStats(
        html.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, h => s"graft.functions.HtmlKernels.htmlStats($h)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** HTML → hrefs of every `<a>` opening tag, in document order. */
  case class HtmlLinks(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "html_links"

    override def nullSafeEval(html: Any): Any =
      HtmlKernels.htmlLinks(
        html.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, h => s"graft.functions.HtmlKernels.htmlLinks($h)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** HTML → (href, anchor) of every `<a>` with an href, in order. */
  case class HtmlAnchors(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("href", StringType, nullable = false),
      StructField("anchor", StringType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "html_anchors"

    override def nullSafeEval(html: Any): Any =
      HtmlKernels.htmlAnchors(
        html.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, h => s"graft.functions.HtmlKernels.htmlAnchors($h)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** HTML → in-page crawl directives:
    * struct<noindex, nofollow, canonical?>. */
  case class HtmlDirectives(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("noindex", BooleanType, nullable = false),
      StructField("nofollow", BooleanType, nullable = false),
      StructField("canonical", StringType, nullable = true)))
    override def prettyName: String = "html_directives"

    override def nullSafeEval(html: Any): Any =
      HtmlKernels.htmlDirectives(
        html.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, h =>
        s"graft.functions.HtmlKernels.htmlDirectives($h)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def htmlSynth(id: Column, text: Column): Column =
    column(HtmlSynth(expression(id), expression(text)))
  def htmlText(html: Column): Column = column(HtmlText(expression(html)))
  def htmlStats(html: Column): Column = column(HtmlStats(expression(html)))
  def htmlLinks(html: Column): Column = column(HtmlLinks(expression(html)))
  def htmlAnchors(html: Column): Column = column(HtmlAnchors(expression(html)))
  def htmlDirectives(html: Column): Column =
    column(HtmlDirectives(expression(html)))
}
