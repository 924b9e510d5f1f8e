package graft.plans

import graft.multimodal.Multimodal.MediaDecoder
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeArrayData, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** The whole-operator tier for the multimodal decode boundary: a custom
  * logical node + planner strategy + physical operator that runs a
  * [[MediaDecoder]] over the child's TUNGSTEN rows directly.
  *
  * The previous implementation ([[graft.multimodal.Multimodal
  * .withFeatures]]'s encoder path, kept as the parity reference) was the
  * tier-(d) `Dataset.mapPartitions` fallback: every row deserializes to an
  * external `Row` (boxing every field), the decoder runs, and the row
  * re-encodes — and because an opaque lambda sits in the plan, Catalyst
  * loses the child's partitioning/ordering AND must assume every column is
  * consumed. This operator fixes all three: rows stay `InternalRow`
  * (payload bytes read in place, one `UnsafeProjection` writes the
  * appended column), [[MediaFeaturesExec]] advertises the child's
  * partitioning and ordering (a downstream groupBy on the pre-decode
  * partitioning key plans with NO new exchange), and the decode cost is
  * the decoder itself, not serialization framing.
  *
  * The decoder stays a per-partition batch boundary by design — a real
  * codec amortizes init across a partition exactly as the reference pools
  * browser contexts (`services/browser.ts:21`).
  */
object MediaFeaturesPlan {

  /** Logical node. `outAttr` rides in the constructor (not derived in
    * `output`) so its exprId is stable across optimizer transforms.
    * `references` claims EVERY child column: the operator forwards the
    * whole row, so column pruning must not reach beneath it. */
  case class MediaFeatures(decoder: MediaDecoder, payloadOrdinal: Int,
                           outAttr: Attribute, child: LogicalPlan)
      extends UnaryNode {
    override def output: Seq[Attribute] = child.output :+ outAttr
    override def references: AttributeSet = child.outputSet
    override def maxRows: Option[Long] = child.maxRows
    override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
      copy(child = newChild)
  }

  /** Planner strategy: one logical node, one physical translation. */
  object MediaFeaturesStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case MediaFeatures(dec, ord, attr, child) =>
        MediaFeaturesExec(dec, ord, attr, planLater(child)) :: Nil
      case _ => Nil
    }

    /** Idempotently add the strategy to a live session's planner. */
    def install(spark: SparkSession): Unit =
      if (!spark.experimental.extraStrategies.contains(this))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ this
  }

  /** Physical operator: decode per partition over InternalRows; the
    * appended array column is built as `UnsafeArrayData` and the output
    * row compacted by one ordinal-bound `UnsafeProjection`. Partitioning
    * and ordering pass through — decoding is row-local. */
  case class MediaFeaturesExec(decoder: MediaDecoder, payloadOrdinal: Int,
                               outAttr: Attribute, child: SparkPlan)
      extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output :+ outAttr
    override def outputPartitioning: Partitioning = child.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = child.outputOrdering

    override protected def doExecute(): RDD[InternalRow] = {
      val dec = decoder
      val ord = payloadOrdinal
      val types = output.map(_.dataType).toArray
      child.execute().mapPartitions({ iter =>
        val proj = UnsafeProjection.create(types)
        val joined = new JoinedRow
        val extra = new GenericInternalRow(1)
        iter.map { row =>
          val feats =
            if (row.isNullAt(ord)) dec.decode(null)
            else dec.decode(row.getBinary(ord))
          extra.update(0,
            if (feats == null) null else UnsafeArrayData.fromPrimitiveArray(feats))
          proj(joined(row, extra))
        }
      }, preservesPartitioning = true)
    }

    override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
      copy(child = newChild)
  }
}
