package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType

/** An optimizer barrier: evaluates exactly like its child, but is marked
  * non-deterministic so Catalyst will neither inline it through
  * `CollapseProject` nor substitute it into filters via
  * `PushDownPredicates`.
  *
  * Why it exists: expensive derived columns (a parsed JSON variant, a
  * rebuilt document string) that several predicates share get RE-INLINED
  * into every consumer by the project-collapsing rules, and `FilterExec`'s
  * codegen does no cross-predicate subexpression elimination — so a
  * three-predicate JSON filter pays three full parses per row (round 3
  * measured `q_json_array` at 33 s for exactly this reason). Wrapping the
  * shared projection in `evalOnce` pins it to its own Project node: one
  * evaluation per row, consumers read the attribute.
  *
  * The wrapped value IS deterministic — the flag is a planning fence, not
  * a semantics change — so plans stay reproducible. Codegen delegates to
  * the child; the whole-stage span is unbroken.
  */
object Barrier {

  case class EvalOnceExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = child.dataType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "eval_once"
    // planning fence: block CollapseProject / predicate-pushdown inlining
    override lazy val deterministic: Boolean = false

    override def eval(input: InternalRow): Any = child.eval(input)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val c = child.genCode(ctx)
      ev.copy(code = c.code, isNull = c.isNull, value = c.value)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Pin `c` to the projection it appears in: downstream predicates and
    * projections reference the computed attribute instead of re-inlining
    * (and re-evaluating) the expression tree. */
  def evalOnce(c: Column): Column =
    ColumnBridge.column(EvalOnceExpr(ColumnBridge.expression(c)))
}
