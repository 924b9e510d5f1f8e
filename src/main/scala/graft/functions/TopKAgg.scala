package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded-heap per-key top-k as a real aggregate function.
  *
  * `row_number() OVER (PARTITION BY key ORDER BY score)` materializes and
  * sorts EVERY candidate row per key before discarding all but k. This
  * aggregate keeps a k-bounded min-heap per key instead, and — because it
  * is an aggregate — Spark runs it partially BEFORE the shuffle: each map
  * task ships at most k candidates per key, not its whole candidate set.
  * For ANN ranking at 100 TB (candidates ≫ k) that is the difference
  * between shuffling the candidate space and shuffling k rows per query.
  *
  * Input: struct(score double, id long). Output: array<struct<id long,
  * score double, rank int>> ranked by (score desc, id asc).
  */
case class TopKAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("rank", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      // FIELD null checks, not just the struct: getDouble/getLong on a
      // null field unbox to 0.0/0L, fabricating a (0.0, id) or (score, 0)
      // candidate — a null score (null embedding → null dot product) or
      // null id must contribute NOTHING, matching the window formulation
      // (desc ordering sorts nulls last, NaN-free rows win). NaN scores
      // are equally excluded: they are not comparable candidates, and the
      // heap's total ordering would otherwise keep them while sortedDesc
      // ranked them last — neither is a defensible "top" element.
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        val score = row.getDouble(0)
        if (!java.lang.Double.isNaN(score)) buf.add(score, row.getLong(1))
      }
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val ranked = buf.sortedDesc
    new GenericArrayData(ranked.zipWithIndex.map { case ((score, id), i) =>
      InternalRow(id, score, i + 1)
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** k-bounded min-heap on (score asc, id desc): the root is the element to
  * evict; survivors are the k best by (score desc, id asc). */
final class TopKBuffer(val k: Int) {
  // explicit comparator, NOT Ordering.by(t => (t._1, -t._2)): negating the
  // id overflows for Long.MinValue (-MinValue == MinValue), silently
  // inverting tie-break eviction for that id
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2) // id desc
    }
  }.reverse
  // scala PriorityQueue dequeues the MAX by ordering; with `reverse` on
  // (score asc, id desc) the dequeued element is the smallest score
  // (largest id on ties) — exactly the one to evict.
  private val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord)

  def add(score: Double, id: Long): Unit = {
    heap.enqueue((score, id))
    if (heap.size > k) heap.dequeue()
  }

  def mergeWith(other: TopKBuffer): Unit =
    other.heap.foreach { case (s, i) => add(s, i) }

  def sortedDesc: Array[(Double, Long)] =
    heap.toArray.sortBy(t => (-t._1, t._2))

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    heap.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush(); bos.toByteArray
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(k)
    val n = in.readInt()
    (0 until n).foreach(_ => buf.add(in.readDouble(), in.readLong()))
    buf
  }
}

object TopK {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  import org.apache.spark.sql.functions.struct

  /** Aggregate column: top-k (id, score, rank) structs per group by
    * (score desc, id asc). */
  def topK(score: Column, id: Column, k: Int): Column =
    column(TopKAgg(expression(struct(score, id)), k).toAggregateExpression())
}
