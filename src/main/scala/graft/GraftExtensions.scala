package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.SketchExpressions

/** SparkSessionExtensions wiring: injects the engine's custom Catalyst
  * expressions into every session built with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`) — the standard way a
  * library ships functions without per-session registration calls. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def inject(e: SparkSessionExtensions, name: String,
                     builder: Seq[Expression] => Expression): Unit =
    e.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo("graft", name), builder))

  override def apply(e: SparkSessionExtensions): Unit = {
    inject(e, "simhash64", exprs => SketchExpressions.SimHash64(exprs.head))
    inject(e, "minhash_signature_32",
      exprs => SketchExpressions.MinHashSignature(exprs.head, 32))
    inject(e, "shingle_hashes_3",
      exprs => SketchExpressions.ShingleHashes(exprs.head, 3))
    inject(e, "dot_product",
      exprs => SketchExpressions.DotProduct(exprs(0), exprs(1)))
    inject(e, "char_stats", exprs => SketchExpressions.CharStats(exprs.head))
    // optimizer tier: naive interval joins rewrite to the bucketed
    // equi-join shape (plans/RangeJoinRewrite.scala); inert until
    // spark.graft.range_join.bucket_width is set
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // physical tier: the multimodal decode boundary plans as a custom
    // operator over Tungsten rows (plans/MediaFeaturesPlan.scala)
    e.injectPlannerStrategy(_ =>
      graft.plans.MediaFeaturesPlan.MediaFeaturesStrategy)
  }
}
