package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter sketch as a real aggregate function.
  *
  * The exact way to find tokens above a frequency threshold is a full
  * `groupBy(token).count()` — a shuffle keyed on EVERY distinct token. At
  * 100 TB of text the distinct-token space is billions of keys, almost
  * all of them singletons that can never be heavy; shuffling them is pure
  * waste. This aggregate keeps at most `k` counters per partial buffer
  * (the classic Misra–Gries summary), so the map side ships `k` entries
  * per task instead of its whole vocabulary, and the merged sketch
  * guarantees a SUPERSET property: every item with true frequency
  * > N/(k+1) is among the surviving candidates. A second scan-side pass
  * (filter to the ≤k candidates, exact count) turns the superset into the
  * exact answer — sketch-then-verify, the same shape as the Bloom
  * decontamination path.
  *
  * Update is the textbook algorithm (increment / insert / global
  * decrement); merge sums counters then subtracts the (k+1)-th largest
  * count from every entry and drops the non-positive ones, which
  * preserves the N/(k+1) error bound (the mergeable-summaries
  * construction of Agarwal et al., PODS'12).
  *
  * Input: a string column. Output: the candidate tokens, sorted, as
  * array<string> — by construction ≤ k of them, so the eval result is
  * driver-safe to collect.
  */
case class MisraGriesAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesBuffer] {

  require(k > 0, "MisraGriesAgg needs at least one counter")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): MisraGriesBuffer = new MisraGriesBuffer(k)

  override def update(buf: MisraGriesBuffer, input: InternalRow): MisraGriesBuffer = {
    val v = child.eval(input)
    // clone: eval hands back a UTF8String view over a reusable row buffer
    if (v != null) buf.add(v.asInstanceOf[UTF8String].clone())
    buf
  }

  override def merge(buf: MisraGriesBuffer, other: MisraGriesBuffer): MisraGriesBuffer = {
    buf.mergeWith(other); buf
  }

  override def eval(buf: MisraGriesBuffer): Any =
    new GenericArrayData(buf.candidatesSorted.asInstanceOf[Array[Any]])

  override def serialize(buf: MisraGriesBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): MisraGriesBuffer =
    MisraGriesBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** ≤ k counters; the standard summary plus the count-subtracting merge. */
final class MisraGriesBuffer(val k: Int) {
  private[functions] val counts =
    new java.util.HashMap[UTF8String, Long](k * 2)

  /** Live counter count — exposed so specs can pin the ≤k bound DURING
    * the add loop, not just after merge-time shrinking. */
  def size: Int = counts.size
  def contains(token: UTF8String): Boolean = counts.containsKey(token)

  def add(token: UTF8String): Unit = {
    // getOrDefault, NOT get-and-null-check: the map's scala.Long values
    // unbox a missing key's null to 0L, so `cur != null` was a
    // constant-true primitive comparison — every distinct token got a
    // counter and the ≤k bound only held after merge-time shrinking
    // (i.e. per-task memory was UNBOUNDED, the exact OOM this sketch
    // exists to prevent). Live counters are always ≥ 1, so cur > 0 ⇔
    // the token is present.
    val cur = counts.getOrDefault(token, 0L)
    if (cur > 0L) counts.put(token, cur + 1L)
    else if (counts.size < k) counts.put(token, 1L)
    else decrementAll(1L)
  }

  /** Subtract `by` from every counter, dropping the non-positive — the
    * MG "no free counter" step (by=1) and the merge shrink (by=c_{k+1}). */
  private def decrementAll(by: Long): Unit = {
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - by
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  def mergeWith(other: MisraGriesBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counts.put(e.getKey, counts.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (counts.size > k) {
      // subtract the (k+1)-th largest count from everything; ≤ k survive
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      decrementAll(vals(vals.length - k - 1))
    }
  }

  def candidatesSorted: Array[UTF8String] = {
    val arr = counts.keySet().toArray(new Array[UTF8String](counts.size))
    java.util.Arrays.sort(arr.asInstanceOf[Array[Object]]) // UTF8String is Comparable
    arr
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(counts.size)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }
}

object MisraGriesBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): MisraGriesBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MisraGriesBuffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.put(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }
}

object MisraGries {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Aggregate column: the ≤ k Misra–Gries candidate tokens (sorted
    * array<string>); superset of every token with frequency > N/(k+1). */
  def heavyHitterCandidates(token: Column, k: Int): Column =
    column(MisraGriesAgg(expression(token), k).toAggregateExpression())
}
