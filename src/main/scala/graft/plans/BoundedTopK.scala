package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded per-key top-k aggregate — the scale-correct replacement for the
  * `row_number().over(Window.partitionBy(key))` + `filter(rnk <= k)` idiom
  * whose exchange carries EVERY candidate row to the key's reducer before
  * any are discarded.
  *
  * As a declarative aggregate it participates in partial aggregation: each
  * map partition keeps at most `k` rows per key (the buffer is compacted to
  * `k` whenever it exceeds `4k`, and always before serialization), so the
  * shuffle moves ≤ k rows per (key, map-partition) instead of |candidates|.
  * For the ANN coarse pass that turns an all-pairs |Q|·|N| exchange into a
  * |Q|·k·partitions one — the difference between a plan that survives 100 TB
  * and one that doesn't.
  *
  * Input must be a struct with ≥ 2 fields: field 0 is the score (ordered
  * descending when `descFirst`, else ascending), field 1 the deterministic
  * tie-breaker (always ascending — an id), remaining fields ride along as
  * payload. Output is the array of the k best structs in final order, so
  * `posexplode` reconstructs the exact (rank, row) stream the window
  * formulation produced — bit-identical, just without the pair shuffle.
  */
case class BoundedTopK(
    child: Expression,
    k: Int,
    descFirst: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[InternalRow]]
  with UnaryLike[Expression] {

  require(k > 0, s"BoundedTopK: k must be positive, got $k")

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val scoreType: DataType = structType.fields(0).dataType
  private lazy val tieType: DataType = structType.fields(1).dataType
  private lazy val scoreOrd = TypeUtils.getInterpretedOrdering(scoreType)
  private lazy val tieOrd = TypeUtils.getInterpretedOrdering(tieType)

  /** Total order: score (desc when requested), then tie-breaker asc. */
  private lazy val rowOrd: Ordering[InternalRow] = new Ordering[InternalRow] {
    override def compare(a: InternalRow, b: InternalRow): Int = {
      val sa = a.get(0, scoreType); val sb = b.get(0, scoreType)
      val c0 =
        if (sa == null && sb == null) 0
        else if (sa == null) 1 // nulls last in both directions
        else if (sb == null) -1
        else if (descFirst) scoreOrd.compare(sb, sa)
        else scoreOrd.compare(sa, sb)
      if (c0 != 0) c0
      else tieOrd.compare(a.get(1, tieType), b.get(1, tieType))
    }
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ArrayBuffer[InternalRow] =
    new ArrayBuffer[InternalRow]

  private def compact(buf: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    if (buf.length > k) {
      val kept = buf.sorted(rowOrd).take(k)
      buf.clear()
      buf ++= kept
    }
    buf
  }

  override def update(buf: ArrayBuffer[InternalRow], input: InternalRow): ArrayBuffer[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      buf += v.asInstanceOf[InternalRow].copy()
      if (buf.length > 4 * k) compact(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[InternalRow], other: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    buf ++= other
    compact(buf)
  }

  override def eval(buf: ArrayBuffer[InternalRow]): Any =
    new GenericArrayData(buf.sorted(rowOrd).take(k).toArray[Any])

  private lazy val proj = UnsafeProjection.create(structType)

  override def serialize(buf: ArrayBuffer[InternalRow]): Array[Byte] = {
    compact(buf)
    val rows = buf.map(r => proj(r).copy())
    val total = 4 + rows.map(4 + _.getSizeInBytes).sum
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(rows.length)
    rows.foreach { r =>
      bb.putInt(r.getSizeInBytes)
      r.writeTo(bb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[InternalRow] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[InternalRow](n)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val row = new UnsafeRow(structType.length)
      row.pointTo(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + bb.position(), len)
      buf += row
      bb.position(bb.position() + len)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopK =
    copy(child = newChild)

  override def prettyName: String = "bounded_topk"
}
