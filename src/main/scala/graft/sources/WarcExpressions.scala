package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._

/** Catalyst expressions over [[WarcKernels]] — the WARC container walk as
  * codegen'd scan-side columns (the [[graft.multimodal.MediaExpressions]]
  * static-call pattern). */
object WarcExpressions {

  /** The record-listing struct: position in file, WARC-Type,
    * WARC-Target-URI, and the embedded HTTP response's status + MIME
    * (−1/null for non-response records). */
  val RecordType: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("rec_type", StringType, nullable = false),
    StructField("uri", StringType, nullable = true),
    StructField("http_status", IntegerType, nullable = false),
    StructField("mime", StringType, nullable = true)))

  /** (id, html) → 3-record `.warc.gz` file bytes (gate-side twin). */
  case class WarcSynth(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "warc_synth"

    override def nullSafeEval(id: Any, html: Any): Any =
      WarcKernels.warcSynth(id.asInstanceOf[Long],
        html.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (i, h) =>
        s"graft.sources.WarcKernels.warcSynth($i, $h)")

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** (id, html) → 2-record `.warc.gz` whose response body is
    * Transfer-Encoding: chunked (gate-side twin of the dechunker). */
  case class WarcSynthChunked(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "warc_synth_chunked"

    override def nullSafeEval(id: Any, html: Any): Any =
      WarcKernels.warcSynthChunked(id.asInstanceOf[Long],
        html.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (i, h) =>
        s"graft.sources.WarcKernels.warcSynthChunked($i, $h)")

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** (id, text) → 1-response `.warc.gz` with a windows-1252 page (gate-
    * side twin of the charset-aware body decode). */
  case class WarcSynthCharset(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "warc_synth_charset"

    override def nullSafeEval(id: Any, text: Any): Any =
      WarcKernels.warcSynthCharset(id.asInstanceOf[Long],
        text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (i, t) =>
        s"graft.sources.WarcKernels.warcSynthCharset($i, $t)")

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** `.warc.gz` bytes → array of record structs (empty on any structural
    * violation — fail-closed, never partial). */
  case class WarcRecords(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(RecordType, containsNull = false)
    override def prettyName: String = "warc_records"

    override def nullSafeEval(bytes: Any): Any =
      WarcKernels.warcRecords(bytes.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.sources.WarcKernels.warcRecords($b)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `.warc.gz` bytes → the first response record's HTTP body as text
    * (null when invalid or no response present — the kernel CAN return
    * null for a non-null child, hence nullSafeCodeGen + nullable). */
  case class WarcBody(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "warc_body"

    override def nullSafeEval(bytes: Any): Any =
      WarcKernels.warcBody(bytes.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, b => s"""
        ${ev.value} = graft.sources.WarcKernels.warcBody($b);
        if (${ev.value} == null) { ${ev.isNull} = true; }
      """)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `.warc.gz` bytes → struct<uri, body> of the first response record —
    * one parse for both fields (null when invalid / no response). */
  case class WarcPage(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("uri", StringType, nullable = true),
      StructField("body", StringType, nullable = false)))
    override def nullable: Boolean = true
    override def prettyName: String = "warc_page"

    override def nullSafeEval(bytes: Any): Any =
      WarcKernels.warcPage(bytes.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, b => s"""
        ${ev.value} = graft.sources.WarcKernels.warcPage($b);
        if (${ev.value} == null) { ${ev.isNull} = true; }
      """)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `.warc.gz` bytes → array of (uri, body) for EVERY response record
    * (empty on invalid files — fail-closed). */
  case class WarcPages(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("uri", StringType, nullable = true),
      StructField("body", StringType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "warc_pages"

    override def nullSafeEval(bytes: Any): Any =
      WarcKernels.warcPages(bytes.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.sources.WarcKernels.warcPages($b)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** (id, text) → WET-shaped `.warc.gz` (warcinfo + conversion member). */
  case class WarcSynthWet(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "warc_synth_wet"

    override def nullSafeEval(id: Any, text: Any): Any =
      WarcKernels.warcSynthWet(id.asInstanceOf[Long],
        text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (i, t) =>
        s"graft.sources.WarcKernels.warcSynthWet($i, $t)")

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** WET bytes → array<struct<uri, text>> of every conversion record
    * (empty on invalid files — fail-closed). */
  case class WetTexts(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("uri", StringType, nullable = true),
      StructField("text", StringType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "wet_texts"

    override def nullSafeEval(bytes: Any): Any =
      WarcKernels.wetTexts(bytes.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.sources.WarcKernels.wetTexts($b)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def warcPage(bytes: Column): Column = column(WarcPage(expression(bytes)))
  def warcPages(bytes: Column): Column = column(WarcPages(expression(bytes)))
  def warcSynthWet(id: Column, text: Column): Column =
    column(WarcSynthWet(expression(id), expression(text)))
  def wetTexts(bytes: Column): Column = column(WetTexts(expression(bytes)))

  def warcSynth(id: Column, html: Column): Column =
    column(WarcSynth(expression(id), expression(html)))
  def warcSynthChunked(id: Column, html: Column): Column =
    column(WarcSynthChunked(expression(id), expression(html)))
  def warcSynthCharset(id: Column, text: Column): Column =
    column(WarcSynthCharset(expression(id), expression(text)))
  def warcRecords(bytes: Column): Column =
    column(WarcRecords(expression(bytes)))
  def warcBody(bytes: Column): Column = column(WarcBody(expression(bytes)))
}
