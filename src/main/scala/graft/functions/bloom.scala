package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Distributed bloom filter as a first-class aggregate + membership
  * expression pair — the explicit, reusable form of the runtime bloom
  * filter Spark's own optimizer injects for shuffle pruning
  * (InjectRuntimeFilter / BloomFilterAggregate in the Spark source).
  *
  * `graft_bloom_agg(key, nBits, k)` folds a column of 64-bit keys into a
  * fixed-size bit array (binary): per-partition partials are plain byte
  * arrays, the merge is a bitwise OR (associative + commutative, so the
  * result is byte-identical regardless of partitioning), and the final
  * value is small enough to broadcast (nBits/8 bytes + 8-byte header).
  * `graft_bloom_contains(filter, key)` then tests membership row-by-row
  * with zero allocation, inside whole-stage codegen.
  *
  * The intended 100 TB pattern (DedupOps.bloomLeakProfile / q90): build
  * the filter over the SMALL side in one pass, broadcast the single-row
  * result, pre-filter the BIG side to candidates (no false negatives ⇒
  * no lost matches), and only shuffle the candidates into the exact
  * confirm join. The big side's shuffle shrinks from |big| to
  * |matches| + FP·|big|; the filter itself can be persisted and reused
  * across pipeline runs (it is just bytes).
  *
  * Layout (canonical, byte-addressed): [k: int32 BE][nBytes: int32 BE]
  * [bit array, bit i at byte 8+(i>>3), mask 1<<(i&7)].
  */
object Bloom {

  /** splitmix64 finalizer — the avalanche mix used across graft kernels. */
  def mix64(v: Long): Long = {
    var z = v + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Set key's k bits in a byte-addressed filter (header included). */
  def add(bf: Array[Byte], nBits: Int, k: Int, key: Long): Unit = {
    val h1 = mix64(key)
    val h2 = mix64(h1) | 1L // odd => walks all of a power-of-two table
    var i = 0
    while (i < k) {
      val bit = ((h1 + i * h2) & (nBits - 1L)).toInt
      bf(8 + (bit >>> 3)) = (bf(8 + (bit >>> 3)) | (1 << (bit & 7))).toByte
      i += 1
    }
  }

  /** Membership test against serialized filter bytes (static so codegen
    * can call it directly). False positives possible, negatives never.
    *
    * `graft_bloom_contains` accepts arbitrary BINARY (persisted filters are
    * just bytes), so the layout is validated before probing: a truncated
    * buffer would index out of bounds inside codegen'd executor code, and a
    * corrupted non-power-of-two bit length would probe with a different
    * mask than the build — silent FALSE NEGATIVES, breaking the filter's
    * one hard guarantee. Both fail fast with the actual defect named.
    */
  def mightContain(bf: Array[Byte], key: Long): Boolean = {
    if (bf.length < 9)
      throw new IllegalArgumentException(
        s"bloom filter too short: ${bf.length} bytes (need 8-byte header + bits)")
    val k = ((bf(0) & 0xff) << 24) | ((bf(1) & 0xff) << 16) |
      ((bf(2) & 0xff) << 8) | (bf(3) & 0xff)
    val hdrBytes = ((bf(4) & 0xff) << 24) | ((bf(5) & 0xff) << 16) |
      ((bf(6) & 0xff) << 8) | (bf(7) & 0xff)
    if (hdrBytes != bf.length - 8)
      throw new IllegalArgumentException(
        s"bloom filter corrupt: header says $hdrBytes payload bytes, " +
          s"buffer has ${bf.length - 8}")
    if (k < 1 || k > 16)
      throw new IllegalArgumentException(
        s"bloom filter corrupt: header k=$k outside [1, 16]")
    if (java.lang.Integer.bitCount(bf.length - 8) != 1)
      throw new IllegalArgumentException(
        s"bloom filter corrupt: bit length ${(bf.length - 8) << 3} is not a " +
          "power of two (probe mask would differ from the build mask)")
    val nBits = (bf.length - 8).toLong << 3
    val h1 = mix64(key)
    val h2 = mix64(h1) | 1L
    var i = 0
    while (i < k) {
      val bit = ((h1 + i * h2) & (nBits - 1L)).toInt
      if ((bf(8 + (bit >>> 3)) & (1 << (bit & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Fresh all-zeros filter with the canonical header. */
  def empty(nBits: Int, k: Int): Array[Byte] = {
    val nBytes = nBits >>> 3
    val bf = new Array[Byte](8 + nBytes)
    bf(0) = (k >>> 24).toByte; bf(1) = (k >>> 16).toByte
    bf(2) = (k >>> 8).toByte; bf(3) = k.toByte
    bf(4) = (nBytes >>> 24).toByte; bf(5) = (nBytes >>> 16).toByte
    bf(6) = (nBytes >>> 8).toByte; bf(7) = nBytes.toByte
    bf
  }
}

/** graft_bloom_agg(key: bigint, nBits, k) → binary: bloom filter over the
  * group's keys. nBits must be a power of two (the double-hash index walk
  * masks instead of mod); nulls are ignored; an empty group yields the
  * all-zeros filter (contains nothing).
  */
case class BloomLongs(child: Expression, nBits: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_agg expects a bigint key, got ${child.dataType}")
    else if (nBits < 64 || nBits > (1 << 30) ||
      java.lang.Integer.bitCount(nBits) != 1)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_agg: nBits must be a power of two in [64, 2^30], got $nBits")
    else if (k < 1 || k > 16)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_agg: k must be in [1, 16], got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Byte] = Bloom.empty(nBits, k)

  override def update(b: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Bloom.add(b, nBits, k, v.asInstanceOf[Long])
    b
  }

  override def merge(b: Array[Byte], o: Array[Byte]): Array[Byte] = {
    var i = 8
    while (i < b.length) { b(i) = (b(i) | o(i)).toByte; i += 1 }
    b
  }

  override def eval(b: Array[Byte]): Any = b

  override def serialize(b: Array[Byte]): Array[Byte] = b
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): BloomLongs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomLongs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): BloomLongs =
    copy(child = newChild)
}

/** graft_bloom_contains(filter: binary, key: bigint) → boolean. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got ($l, $r)")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override protected def nullSafeEval(bf: Any, key: Any): Any =
    Bloom.mightContain(bf.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (bf, key) =>
      s"graft.functions.Bloom.mightContain($bf, $key)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
