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
  * and a replace is O(log k) — with an optional opaque payload slot per
  * kept element that rides along through swaps, merges and serde (THE
  * one heap serving both the ids-only and the row-carrying aggregates;
  * a future ordering/tie-break fix lands once). O(k) per group
  * regardless of group size; partials merge by re-offering
  * (order-insensitive). Ordering is the exact `row_number` ordering it
  * replaces — `java.lang.Double.compare` (so NaN sorts as the largest
  * score, like Spark's sort), ties broken on the LOWER id.
  */
final class TopKIdsBuffer(val k: Int, val asc: Boolean) {
  private[functions] var size = 0
  private[functions] val scores = new Array[Double](math.max(k, 1))
  private[functions] val ids = new Array[Long](math.max(k, 1))
  // lazily allocated on the first non-null payload: the ids-only
  // aggregate (millions of groups on the q137/q139 workloads) never
  // pays the k-slot reference array, nor the two extra reference
  // stores per sift level moving nulls around
  private[functions] var payloads: Array[Any] = null

  /** Payload of kept element `i` (null when no payload ever rode in). */
  def payloadAt(i: Int): Any =
    if (payloads == null) null else payloads(i)

  /** a strictly worse than b (the heap roots the worst). */
  private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(sa, sb)
    if (c != 0) { if (asc) c > 0 else c < 0 } else ia > ib
  }

  /** Would (score, id) be admitted right now? The pre-payload gate: a
    * caller with an expensive payload to materialize checks this FIRST —
    * on the 10⁸-row inputs this aggregate targets, almost every row is
    * rejected here in one compare, before any payload eval/copy.
    */
  def admits(score: Double, id: Long): Boolean =
    k > 0 && (size < k || worse(scores(0), ids(0), score, id))

  private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); val ti = ids(i)
    scores(i) = scores(j); ids(i) = ids(j)
    scores(j) = ts; ids(j) = ti
    if (payloads != null) {
      val tp = payloads(i)
      payloads(i) = payloads(j)
      payloads(j) = tp
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var w = i
      if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) return
      swap(i, w)
      i = w
    }
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (!worse(scores(i), ids(i), scores(p), ids(p))) return
      swap(i, p)
      i = p
    }
  }

  def add(score: Double, id: Long): Unit = add(score, id, null)

  // the admission decision lives ONLY in admits(): if the ordering or
  // tie-break ever changes, the gate callers use to skip payload
  // materialization and the heap's own replacement test move together
  def add(score: Double, id: Long, payload: Any): Unit =
    if (admits(score, id)) {
      if (payload != null && payloads == null)
        payloads = new Array[Any](math.max(k, 1))
      if (size < k) {
        scores(size) = score; ids(size) = id
        if (payloads != null) payloads(size) = payload
        size += 1
        siftUp(size - 1)
      } else {
        scores(0) = score; ids(0) = id
        if (payloads != null) payloads(0) = payload
        siftDown(0)
      }
    }

  def mergeFrom(o: TopKIdsBuffer): Unit = {
    var i = 0
    while (i < o.size) { add(o.scores(i), o.ids(i), o.payloadAt(i)); i += 1 }
  }

  /** Kept element indices, best-first — the `row_number <= k` output
    * order.
    */
  def rankedIdx: Array[Int] =
    Array.range(0, size).sortWith((a, b) =>
      worse(scores(b), ids(b), scores(a), ids(a)))

  /** Kept ids, best-first — exactly the `row_number <= k` output order. */
  def rankedIds: Array[Long] = rankedIdx.map(ids(_))
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

/** graft_topk_rows(score: double, id: bigint[, payload], k, asc) →
  * array<struct<id, score[, payload]>>: [[TopKIdsByScore]] carrying the
  * ranking score — and optionally one payload column (use `struct(...)`
  * to carry several) — THROUGH the aggregation buffer, so a rank-heavy
  * caller recovers the winners' columns without the join-back scan the
  * ids-only form requires (q28/q48 paid a second corpus scan just to
  * re-read the score of ≤ groups·k winners). Same bounded-heap plan
  * shape: ObjectHashAggregate with map-side partials, O(k·|payload|)
  * buffer per group, O(log k) admission.
  *
  * Ordering, null-skip, and NaN contracts are [[TopKIdsByScore]]'s
  * verbatim: (score [desc|asc], id asc), null score or id rows never
  * rank, NaN sorts as the largest score. A NULL payload on a ranking row
  * is kept (the payload is cargo, not a key).
  */
case class TopKRowsByScore(score: Expression, id: Expression,
    payload: Option[Expression], k: Int, asc: Boolean,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKIdsBuffer] {

  override def children: Seq[Expression] = Seq(score, id) ++ payload

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType && k >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk_rows expects (double, bigint[, payload], k >= 1), got " +
        s"(${score.dataType}, ${id.dataType}, $k)")

  override def createAggregationBuffer(): TopKIdsBuffer =
    new TopKIdsBuffer(k, asc)

  override def update(b: TopKIdsBuffer, input: InternalRow): TopKIdsBuffer = {
    val s = score.eval(input)
    if (s != null) {
      val i = id.eval(input)
      if (i != null) {
        val sv = s.asInstanceOf[Double]
        val iv = i.asInstanceOf[Long]
        // admission FIRST: almost every row of a large group is rejected
        // in one compare — the payload (possibly a whole struct) is only
        // evaluated and deep-copied for the O(k log n) admitted rows.
        // The copy matters: the heap outlives the (reused) input row.
        if (b.admits(sv, iv)) {
          val p =
            payload.map(e => InternalRow.copyValue(e.eval(input))).orNull
          b.add(sv, iv, p)
        }
      }
    }
    b
  }

  override def merge(b: TopKIdsBuffer, o: TopKIdsBuffer): TopKIdsBuffer = {
    b.mergeFrom(o)
    b
  }

  override def eval(b: TopKIdsBuffer): Any =
    new GenericArrayData(b.rankedIdx.map { j =>
      val vs = Array[Any](b.ids(j), b.scores(j)) ++
        payload.map(_ => b.payloadAt(j))
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vs)
    })

  // payload serde rides an UnsafeRow over the single payload field — the
  // one serializer that covers every Catalyst type without a per-type
  // switch (null payload = length -1). No schema tag per element is
  // needed because the schema is PLAN-FIXED: the payload expression is
  // part of this aggregate node, every partial of one node serializes
  // the same type, and partials of different call sites never share
  // buffer slots (distinct agg-buffer offsets) — pinned by the
  // two-different-typed-calls-in-one-aggregation FunctionsSpec arm.
  @transient private lazy val payloadSer =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(payload.map(_.dataType).toArray)

  override def serialize(b: TopKIdsBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.size)
    var i = 0
    while (i < b.size) {
      out.writeDouble(b.scores(i))
      out.writeLong(b.ids(i))
      payload.foreach { _ =>
        val p = b.payloadAt(i)
        if (p == null) out.writeInt(-1)
        else {
          val bytes = payloadSer(InternalRow(p)).getBytes
          out.writeInt(bytes.length)
          out.write(bytes)
        }
      }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKIdsBuffer = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new TopKIdsBuffer(k, asc)
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val id0 = in.readLong()
      val p: Any = payload.map { e =>
        val len = in.readInt()
        if (len < 0) null
        else {
          val pb = new Array[Byte](len)
          in.readFully(pb)
          val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(1)
          row.pointTo(pb, len)
          InternalRow.copyValue(row.get(0, e.dataType))
        }
      }.orNull
      b.add(s, id0, p)
      i += 1
    }
    b
  }

  override def dataType: DataType = ArrayType(StructType(
    Seq(StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false)) ++
      payload.map(e => StructField("payload", e.dataType, e.nullable))),
    containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): TopKRowsByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKRowsByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRowsByScore =
    copy(score = newChildren(0), id = newChildren(1),
      payload = payload.map(_ => newChildren(2)))
}
