package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count–min sketch (Cormode & Muthukrishnan 2005) as a mergeable
  * aggregate — the point-frequency complement of [[MisraGriesAgg]]:
  * Misra–Gries answers "which items are heavy", count–min answers "how
  * often does THIS item occur" for any item, with a one-sided guarantee:
  *
  *   true count  ≤  estimate  ≤  true count + (e/width)·N
  *
  * (overestimate only, from hash collisions; the bound holds per row with
  * probability 1 − (1/e)^depth over the hash family — with the FIXED
  * deterministic family below it is simply a measurable property the
  * audit checks, not a random event).
  *
  * Why a sketch at 100 TB: exact per-token counts are a shuffle keyed on
  * the full vocabulary (billions of mostly-singleton keys). The sketch is
  * a fixed `depth × width` grid of longs per partial buffer — the map
  * side ships ~64 KB per task regardless of vocabulary, merge is
  * element-wise addition (associative + commutative, the mergeable-
  * summaries contract), and any item's frequency is answerable after one
  * scan. The companion audit ([[graft.operators.Profile.frequencyAudit]])
  * replays bounded audit keys against exact counts to keep the sketch
  * honest — same sketch-then-verify shape as the HLL cardinality and
  * KLL-style quantile audits.
  *
  * Rows are hashed with Murmur3 over the UTF-8 bytes under `depth` fixed
  * seeds — deterministic across partitions, runs, and engines (the same
  * reproducibility bar every draw in [[graft.operators.Sampling]] meets).
  *
  * Output: `array<long>` of length `depth·width` (row-major) — a plain
  * portable encoding any consumer can index as `row·width + (h mod width)`.
  */
case class CountMinAgg(
    child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"depth $depth outside [1, 16]")
  require(width >= 16, s"width $width too small to bound error usefully")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var d = 0
      while (d < depth) {
        buf(d * width + CountMin.cell(bytes, d, width)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object CountMin {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Cell index for hash row `d`: Murmur3 over the UTF-8 bytes, seeded
    * per row, folded into [0, width). Pure and deterministic. */
  private[functions] def cell(bytes: Array[Byte], d: Int, width: Int): Int = {
    val h = scala.util.hashing.MurmurHash3.bytesHash(bytes, 0x9747b28c + d)
    java.lang.Math.floorMod(h, width)
  }

  /** Aggregate column: the row-major depth×width count grid. The child
    * casts to string HERE (the aggregate's update hashes UTF8String
    * bytes, so an uncast non-string column would ClassCastException at
    * runtime): any type sketches under its string rendering — the same
    * rendering [[estimate]]'s `value.toString` queries with. */
  def sketch(value: Column, depth: Int = 4, width: Int = 2048): Column =
    column(CountMinAgg(expression(value.cast("string")), depth, width)
      .toAggregateExpression())

  /** Point-frequency estimate from a materialized sketch: min over the
    * depth rows — the classic query. Driver-side (the sketch is a small
    * local array by construction). */
  def estimate(grid: Array[Long], depth: Int, width: Int,
               value: String): Long = {
    require(grid.length == depth * width, "grid shape mismatch")
    val bytes = value.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = grid(d * width + cell(bytes, d, width))
      if (c < best) best = c
      d += 1
    }
    best
  }
}
