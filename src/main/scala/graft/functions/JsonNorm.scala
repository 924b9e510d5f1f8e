package graft.functions

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, DecimalNode, ObjectNode}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JSONB-style canonicalization of a JSON text: object keys sorted,
  * whitespace minified, and — the part `to_json(parse_json(...))` does NOT
  * do — numbers normalized by VALUE (`1`, `1.0`, `1e0` all canonicalize to
  * `1`), the way Postgres JSONB's numeric-typed equality behaves
  * (`src/db/client/commonInputTypes.ts:133` `equals: InputJsonValue` is
  * evaluated by Postgres over JSONB). Duplicate object keys keep the last
  * occurrence, also the JSONB rule.
  *
  * Both sides of an equality must go through THIS function — the canonical
  * text is only meaningful against itself. */
object JsonNormKernel {
  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    // float text parses to BigDecimal directly — no double round-trip, so
    // values beyond double precision still compare by their written value
    m.configure(DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS, true)
    m
  }

  private def normNumber(n: java.math.BigDecimal): DecimalNode = {
    // equal values get equal (unscaledValue, scale) pairs — and therefore
    // equal serializations — after stripTrailingZeros (Java 8+ normalizes
    // zero itself to plain 0)
    new DecimalNode(n.stripTrailingZeros())
  }

  private def canonNode(node: JsonNode): JsonNode = node match {
    case o: ObjectNode =>
      val out = mapper.createObjectNode()
      val names = new java.util.ArrayList[String]()
      o.fieldNames().forEachRemaining(n => names.add(n))
      java.util.Collections.sort(names)
      names.forEach(n => out.set[JsonNode](n, canonNode(o.get(n))))
      out
    case a: ArrayNode =>
      val out = mapper.createArrayNode()
      a.forEach(e => out.add(canonNode(e)))
      out
    case n if n.isNumber => normNumber(n.decimalValue())
    case other => other
  }

  /** Canonical minified text, or null if `json` is not valid JSON. */
  def canonical(json: UTF8String): UTF8String = {
    if (json == null) return null
    try {
      val tree = mapper.readTree(json.toString)
      if (tree == null) null // empty input
      else UTF8String.fromString(mapper.writeValueAsString(canonNode(tree)))
    } catch { case _: Exception => null }
  }

  /** Driver-side canonicalization of a literal; throws on invalid JSON
    * (a malformed FILTER literal is a caller bug, surfaced at plan time —
    * unlike row data, which degrades to null/no-match). */
  def canonicalLiteral(json: String): String = {
    val out = canonical(UTF8String.fromString(json))
    require(out != null, s"equalsJson: not valid JSON: $json")
    out.toString
  }
}

object JsonNorm {
  /** Canonicalize a JSON string column (null for SQL NULL or invalid
    * JSON). Codegen delegates to the kernel, so whole-stage codegen stays
    * intact; the JIT compiles the kernel once. */
  case class JsonCanonical(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "json_canonical"

    override def nullSafeEval(input: Any): Any =
      JsonNormKernel.canonical(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.functions.JsonNormKernel.canonical($c);
        ${ev.isNull} = ${ev.value} == null;
      """)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def jsonCanonical(c: Column): Column = column(JsonCanonical(expression(c)))
}
