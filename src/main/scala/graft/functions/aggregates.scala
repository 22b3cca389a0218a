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

/** Bounded top-k-by-score buffer: a capped binary heap of (score, id)
  * pairs rooted at the WORST kept element, so admission is one compare
  * and a replace is O(log k). O(k) per group regardless of group size;
  * partials merge by re-offering (order-insensitive). Ordering is the
  * exact `row_number` ordering it replaces — `java.lang.Double.compare`
  * (so NaN sorts as the largest score, like Spark's sort), ties broken
  * on the LOWER id.
  */
final class TopKIdsBuffer(val k: Int, val asc: Boolean) {
  private[functions] var size = 0
  private[functions] val scores = new Array[Double](math.max(k, 1))
  private[functions] val ids = new Array[Long](math.max(k, 1))

  /** a strictly worse than b (the heap roots the worst). */
  private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(sa, sb)
    if (c != 0) { if (asc) c > 0 else c < 0 } else ia > ib
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var w = i
      if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) return
      val ts = scores(i); val ti = ids(i)
      scores(i) = scores(w); ids(i) = ids(w)
      scores(w) = ts; ids(w) = ti
      i = w
    }
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (!worse(scores(i), ids(i), scores(p), ids(p))) return
      val ts = scores(i); val ti = ids(i)
      scores(i) = scores(p); ids(i) = ids(p)
      scores(p) = ts; ids(p) = ti
      i = p
    }
  }

  def add(score: Double, id: Long): Unit =
    if (k > 0) {
      if (size < k) {
        scores(size) = score; ids(size) = id; size += 1
        siftUp(size - 1)
      } else if (worse(scores(0), ids(0), score, id)) {
        scores(0) = score; ids(0) = id
        siftDown(0)
      }
    }

  def mergeFrom(o: TopKIdsBuffer): Unit = {
    var i = 0
    while (i < o.size) { add(o.scores(i), o.ids(i)); i += 1 }
  }

  /** Kept ids, best-first — exactly the `row_number <= k` output order. */
  def rankedIds: Array[Long] = {
    val idx = Array.range(0, size)
    val sorted = idx.sortWith((a, b) =>
      worse(scores(b), ids(b), scores(a), ids(a)))
    sorted.map(ids(_))
  }
}

/** graft_topk_ids(score: double, id: bigint, k, asc) → array<bigint>: the
  * ids of the group's k best rows by (score, id) — `asc = false` ranks
  * highest-score-first (a similarity), `asc = true` lowest-first (a
  * distance); ties always break on the lower id. THE distributed top-k
  * primitive for the ANN/recall family: semantically
  * `row_number() OVER (PARTITION BY grp ORDER BY score [DESC], id) <= k`,
  * but the bound lives in the aggregation buffer, so it plans as
  * ObjectHashAggregate with a MAP-SIDE PARTIAL — every input row is
  * consumed in its scan task (O(log k) heap update) and only O(k)
  * survivors per (task, group) ever shuffle. The window form it replaces
  * shuffles and SORTS the full input twice (even salted, the rank stages
  * dominate at 10⁸-row fan-outs — the measured q137/q139 lesson).
  *
  * Null score or id rows are ignored (SQL aggregate convention): a
  * no-direction cosine or an unencodable vector never makes a top-k. NaN
  * scores follow Spark's sort order (largest), matching the window form.
  */
case class TopKIdsByScore(score: Expression, id: Expression, k: Int,
    asc: Boolean, mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKIdsBuffer] {

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType && k >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk_ids expects (double, bigint, k >= 1), got " +
        s"(${score.dataType}, ${id.dataType}, $k)")

  override def createAggregationBuffer(): TopKIdsBuffer =
    new TopKIdsBuffer(k, asc)

  override def update(b: TopKIdsBuffer, input: InternalRow): TopKIdsBuffer = {
    val s = score.eval(input)
    if (s != null) {
      val i = id.eval(input)
      if (i != null) b.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: TopKIdsBuffer, o: TopKIdsBuffer): TopKIdsBuffer = {
    b.mergeFrom(o)
    b
  }

  override def eval(b: TopKIdsBuffer): Any = new GenericArrayData(b.rankedIds)

  override def serialize(b: TopKIdsBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * b.size)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) {
      bb.putDouble(b.scores(i)); bb.putLong(b.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKIdsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKIdsBuffer(k, asc)
    var i = 0
    while (i < n) { b.add(bb.getDouble, bb.getLong); i += 1 }
    b
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): TopKIdsByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKIdsByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKIdsByScore =
    copy(score = newChildren(0), id = newChildren(1))
}
