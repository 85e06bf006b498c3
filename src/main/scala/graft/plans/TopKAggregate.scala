package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Primitive-buffer bounded top-k state: two parallel arrays kept
  * sorted by (direction-adjusted score, id). Insertion is an O(1)
  * reject for non-qualifying rows (the overwhelming majority once the
  * buffer fills) and an O(k) shift otherwise — k is small by contract.
  */
final class TopKState(val k: Int, val distinctIds: Boolean = false) {
  var size: Int = 0
  val keys: Array[Double] = new Array[Double](k)   // adjusted score
  val scores: Array[Double] = new Array[Double](k) // raw score
  val ids: Array[Long] = new Array[Long](k)

  def insert(key0: Double, score: Double, id: Long): Unit = {
    // NaN (e.g. cosine of a zero-norm vector) sorts last instead of
    // poisoning the comparisons below — every branch would evaluate
    // false for NaN and the insert would write past the buffer.
    val key = if (key0.isNaN) Double.PositiveInfinity else key0
    if (size == k &&
        (key > keys(size - 1) ||
          (key == keys(size - 1) && id >= ids(size - 1)))) return
    var pos = size
    while (pos > 0 &&
        (keys(pos - 1) > key || (keys(pos - 1) == key && ids(pos - 1) > id))) {
      pos -= 1
    }
    // distinct-ids mode: the buffer is sorted by (key, id) and the
    // position scan above stops AT an equal (key, id) element, so a
    // duplicate of the incoming row — one a pre-aggregation
    // `.distinct()` would have collapsed — can only sit directly
    // BEFORE the insertion position. One O(1) compare replaces the
    // upstream distinct's whole exchange (scores are deterministic
    // per id, so dedup-by-(key,id) ≡ dedup-by-id here).
    if (distinctIds && pos > 0 && keys(pos - 1) == key && ids(pos - 1) == id)
      return
    var i = math.min(size, k - 1)
    while (i > pos) {
      keys(i) = keys(i - 1); scores(i) = scores(i - 1); ids(i) = ids(i - 1)
      i -= 1
    }
    keys(pos) = key; scores(pos) = score; ids(pos) = id
    if (size < k) size += 1
  }
}

/** Native bounded top-k aggregate — the scale-critical piece of every
  * KNN/ANN query, as a `TypedImperativeAggregate` over PRIMITIVE
  * buffers. The previous `udaf(Aggregator)` wrapper decoded every input
  * row into a case class and re-encoded the whole buffer per update;
  * at 1M gallery rows that wrapper cost ~50× the distance math itself
  * (ScaleProbe: 62 s vs 1.2 s for the scored stream). This expression
  * evaluates two child columns and touches three primitive arrays.
  *
  * Map-side partial aggregation still applies: each task keeps its
  * local k best, so the shuffle stays O(groups · k · partitions).
  * Output: array<struct<id,score>> in rank order (ties → lowest id).
  */
case class TopKAggregate(
    idChild: Expression, scoreChild: Expression, k: Int,
    ascending: Boolean, distinctIds: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(idChild, scoreChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKState =
    new TopKState(k, distinctIds)

  override def update(b: TopKState, input: InternalRow): TopKState = {
    val idRaw = idChild.eval(input)
    val scoreRaw = scoreChild.eval(input)
    if (idRaw != null && scoreRaw != null) {
      val id = idRaw.asInstanceOf[Long]
      val score = scoreRaw.asInstanceOf[Double]
      b.insert(if (ascending) score else -score, score, id)
    }
    b
  }

  override def merge(b: TopKState, other: TopKState): TopKState = {
    var i = 0
    while (i < other.size) {
      b.insert(other.keys(i), other.scores(i), other.ids(i))
      i += 1
    }
    b
  }

  override def eval(b: TopKState): Any = {
    val rows = new Array[Any](b.size)
    var i = 0
    while (i < b.size) {
      rows(i) = InternalRow(b.ids(i), b.scores(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKState): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + b.size * 24)
    buf.putInt(b.size)
    var i = 0
    while (i < b.size) {
      buf.putDouble(b.keys(i)); buf.putDouble(b.scores(i))
      buf.putLong(b.ids(i))
      i += 1
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt()
    val b = new TopKState(k, distinctIds)
    b.size = n
    var i = 0
    while (i < n) {
      b.keys(i) = buf.getDouble(); b.scores(i) = buf.getDouble()
      b.ids(i) = buf.getLong()
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAggregate =
    copy(idChild = newChildren(0), scoreChild = newChildren(1))
}
