package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise running sum of a long-array column. `sums` stays null
  * until the first non-null input fixes the dimensionality. */
final class VecSumState {
  var sums: Array[Long] = null

  def add(arr: ArrayData): Unit = {
    val n = arr.numElements()
    if (sums == null) sums = new Array[Long](n)
    var i = 0
    while (i < n) { sums(i) += arr.getLong(i); i += 1 }
  }
}

/** Native element-wise vector-sum aggregate — the exact-centroid
  * carrier ((n, Σ) pairs, never a float mean) computed in ONE pass
  * over the vector column. The previous shape posexploded the gallery
  * into (label, dim, x) rows — dim× the row volume through the
  * aggregate — and re-assembled per-label arrays with
  * `array_sort(collect_list(struct(...)))`; this expression reads each
  * array once into a primitive Long buffer. Map-side partial
  * aggregation applies: the shuffle carries one 8·dim-byte buffer per
  * (group, partition), never a row per element.
  *
  * Exactness bound (same as the exploded form's `sum(x)` Long): per-dim
  * |Σx| ≤ rows · scale · max|x| — at scale 10⁴ and |x| ≤ 10, Long holds
  * a class to ~10¹⁴ rows; larger classes must shard the report.
  * Input rows with a NULL vector are skipped (the exploded form
  * generated no rows for them); a group with only NULL vectors
  * evaluates to NULL.
  */
case class VectorSumAggregate(
    vecChild: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumState] {

  override def children: Seq[Expression] = Seq(vecChild)
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_vecsum"

  override def createAggregationBuffer(): VecSumState = new VecSumState

  override def update(b: VecSumState, input: InternalRow): VecSumState = {
    val raw = vecChild.eval(input)
    if (raw != null) b.add(raw.asInstanceOf[ArrayData])
    b
  }

  override def merge(b: VecSumState, other: VecSumState): VecSumState = {
    if (other.sums != null) {
      if (b.sums == null) b.sums = other.sums.clone()
      else {
        var i = 0
        while (i < b.sums.length) { b.sums(i) += other.sums(i); i += 1 }
      }
    }
    b
  }

  override def eval(b: VecSumState): Any =
    if (b.sums == null) null else new GenericArrayData(b.sums)

  override def serialize(b: VecSumState): Array[Byte] = {
    val n = if (b.sums == null) -1 else b.sums.length
    val buf = ByteBuffer.allocate(4 + math.max(n, 0) * 8)
    buf.putInt(n)
    var i = 0
    while (i < math.max(n, 0)) { buf.putLong(b.sums(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumState = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt()
    val b = new VecSumState
    if (n >= 0) {
      b.sums = new Array[Long](n)
      var i = 0
      while (i < n) { b.sums(i) = buf.getLong(); i += 1 }
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSumAggregate =
    copy(vecChild = newChildren(0))
}
