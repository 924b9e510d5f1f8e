package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.FunctionRegistration

/** SQL-surface registration for the engine's custom expressions, so the
  * raw-SQL passthrough (§2.A #18) can use them:
  * `SELECT simhash64(transform(tokens, t -> xxhash64(t))) FROM docs`. */
object GraftFunctions {

  /** Register the sketch expressions as session temp functions. */
  def register(spark: SparkSession): Unit = {
    FunctionRegistration.register(spark, "simhash64",
      exprs => SketchExpressions.SimHash64(exprs.head))
    FunctionRegistration.register(spark, "minhash_signature_32",
      exprs => SketchExpressions.MinHashSignature(exprs.head, 32))
    FunctionRegistration.register(spark, "shingle_hashes_3",
      exprs => SketchExpressions.ShingleHashes(exprs.head, 3))
    FunctionRegistration.register(spark, "dot_product",
      exprs => SketchExpressions.DotProduct(exprs(0), exprs(1)))
    FunctionRegistration.register(spark, "html_text",
      exprs => HtmlExpressions.HtmlText(exprs.head))
  }
}
