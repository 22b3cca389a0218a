package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded k-smallest buffer: a max-heap capped at k elements, so memory
  * per group is O(k) no matter how many rows the group holds. The partial
  * buffers merge by re-offering elements (order-insensitive), which is what
  * makes the aggregate safe under Spark's partial → shuffle → final plan.
  */
final class MinKBuffer(val k: Int) {
  private[functions] val heap =
    new java.util.PriorityQueue[java.lang.Long](
      math.max(k, 1), java.util.Collections.reverseOrder())

  def add(v: Long): Unit =
    if (heap.size < k) heap.add(v)
    else if (k > 0 && v < heap.peek()) { heap.poll(); heap.add(v) }

  def mergeFrom(o: MinKBuffer): Unit = {
    val it = o.heap.iterator()
    while (it.hasNext) add(it.next())
  }

  def sortedArray: Array[Long] = {
    val a = new Array[Long](heap.size)
    val it = heap.iterator()
    var i = 0
    while (it.hasNext) { a(i) = it.next(); i += 1 }
    java.util.Arrays.sort(a)
    a
  }
}

/** graft_min_k(col: bigint, k) → array<bigint>: the k SMALLEST values of
  * the group, ascending — the bounded-buffer top-k aggregate (the exact
  * sibling of the approx sketches: per-group state is O(k), partials merge
  * associatively, plans as ObjectHashAggregate with map-side combine).
  *
  * This is the aggregate the salted two-phase window
  * ([[graft.ops.ScaleOps.topKPerGroup]]) emulates with built-ins: here the
  * bound lives IN the aggregation buffer, so a stopword-sized group costs
  * O(n log k) updates and ships k values, with no second window pass.
  * Nulls are ignored (SQL aggregate convention); an all-null or empty
  * group yields an empty array.
  */
case class MinKLongs(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MinKBuffer] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_min_k expects (bigint, k >= 1), got (${child.dataType}, $k)")

  override def createAggregationBuffer(): MinKBuffer = new MinKBuffer(k)

  override def update(b: MinKBuffer, input: InternalRow): MinKBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: MinKBuffer, o: MinKBuffer): MinKBuffer = {
    b.mergeFrom(o)
    b
  }

  override def eval(b: MinKBuffer): Any = new GenericArrayData(b.sortedArray)

  override def serialize(b: MinKBuffer): Array[Byte] = {
    val arr = b.sortedArray
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * arr.length)
    bb.putInt(arr.length)
    arr.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new MinKBuffer(k)
    var i = 0
    while (i < n) { b.add(bb.getLong); i += 1 }
    b
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): MinKLongs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinKLongs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): MinKLongs =
    copy(child = newChild)
}
