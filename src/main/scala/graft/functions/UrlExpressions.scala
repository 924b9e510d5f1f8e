package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types._

/** Catalyst expressions over [[UrlKernels]] — URL canonicalization as
  * codegen'd scan-side columns. */
object UrlExpressions {

  /** RFC 3986 §6.2 syntax normalization (see [[UrlKernels.normalizeUrl]]);
    * non-URL input passes through unchanged, so the result is never null
    * for a non-null child. */
  case class UrlNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "url_normalize"

    override def nullSafeEval(raw: Any): Any =
      UrlKernels.normalizeUrl(
        raw.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, r => s"graft.functions.UrlKernels.normalizeUrl($r)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Lowercased host (port/userinfo stripped); null when no authority. */
  case class UrlHost(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "url_host"

    override def nullSafeEval(raw: Any): Any =
      UrlKernels.hostOf(
        raw.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, r => s"""
        ${ev.value} = graft.functions.UrlKernels.hostOf($r);
        if (${ev.value} == null) { ${ev.isNull} = true; }
      """)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Registrable domain of a HOST (public suffix + one label). */
  case class RegisteredDomain(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "registered_domain"

    override def nullSafeEval(host: Any): Any =
      UrlKernels.registeredDomain(
        host.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, h => s"""
        ${ev.value} = graft.functions.UrlKernels.registeredDomain($h);
        if (${ev.value} == null) { ${ev.isNull} = true; }
      """)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** RFC 3986 §5.2 resolution of an href against the page's URL. */
  case class UrlResolve(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "url_resolve"

    override def nullSafeEval(base: Any, ref: Any): Any =
      UrlKernels.resolveUrl(
        base.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        ref.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (b, r) => s"""
        ${ev.value} = graft.functions.UrlKernels.resolveUrl($b, $r);
        if (${ev.value} == null) { ${ev.isNull} = true; }
      """)

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** URL → the path-and-query a robots rule matches against. */
  case class UrlPath(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "url_path"

    override def nullSafeEval(raw: Any): Any =
      UrlKernels.pathOf(
        raw.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, r => s"graft.functions.UrlKernels.pathOf($r)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def urlNormalize(raw: Column): Column = column(UrlNormalize(expression(raw)))
  def urlHost(raw: Column): Column = column(UrlHost(expression(raw)))
  def registeredDomain(host: Column): Column =
    column(RegisteredDomain(expression(host)))
  def urlPath(raw: Column): Column = column(UrlPath(expression(raw)))
  def urlResolve(base: Column, ref: Column): Column =
    column(UrlResolve(expression(base), expression(ref)))
}
