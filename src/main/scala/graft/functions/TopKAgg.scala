package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k-per-group state: the k largest (key, id) pairs under
  * the total order (key DESC, id ASC) — `id` both the payload and the
  * deterministic tiebreak.
  *
  * Why this shape at 100 TB: the idiomatic per-group top-k
  * (`row_number() OVER (PARTITION BY g ORDER BY key DESC)` + filter)
  * shuffles EVERY row to its group's reducer and sorts there —
  * `WindowExec` cannot pre-aggregate. This aggregate is associative
  * bounded state, so map-side partial aggregation ships at most k
  * pairs per (partition, group): shuffle volume drops from O(rows) to
  * O(groups × k × 16 bytes) with no sort anywhere (insertion keeps the
  * buffer ordered). The total order makes the result row-identical to
  * the window formulation — proven by the e70 oracle hash.
  */
final class TopKBuffer(val k: Int) {
  // parallel arrays, ordered by (key DESC, id ASC)
  private[functions] var keys: Array[Long] = new Array[Long](math.min(k, 8))
  private[functions] var ids: Array[Long] = new Array[Long](math.min(k, 8))
  private[functions] var n: Int = 0

  /** True when (key, id) ranks strictly better than slot i. */
  @inline private def better(key: Long, id: Long, i: Int): Boolean =
    key > keys(i) || (key == keys(i) && id < ids(i))

  private def grow(): Unit = {
    val cap = math.min(k, math.max(keys.length * 2, 8))
    keys = java.util.Arrays.copyOf(keys, cap)
    ids = java.util.Arrays.copyOf(ids, cap)
  }

  def insert(key: Long, id: Long): Unit = {
    if (n == k && !better(key, id, n - 1)) return // saturated fast reject
    // binary search for the insertion slot in the (DESC, ASC) order
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (better(key, id, mid)) hi = mid else lo = mid + 1
    }
    // the lower-bound loop leaves `lo` one PAST an equal pair (an equal
    // pair is not `better` than itself), so the duplicate to collapse
    // sits at lo-1, never at lo
    if (lo > 0 && keys(lo - 1) == key && ids(lo - 1) == id) return // exact dup pair
    if (n == k) {
      System.arraycopy(keys, lo, keys, lo + 1, k - 1 - lo)
      System.arraycopy(ids, lo, ids, lo + 1, k - 1 - lo)
    } else {
      if (n == keys.length) grow()
      System.arraycopy(keys, lo, keys, lo + 1, n - lo)
      System.arraycopy(ids, lo, ids, lo + 1, n - lo)
      n += 1
    }
    keys(lo) = key
    ids(lo) = id
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) {
      // other is ordered best-first: once one is rejected by the
      // saturated tail bound, all later ones are too
      if (n == k && !better(other.keys(i), other.ids(i), n - 1)) return
      insert(other.keys(i), other.ids(i))
      i += 1
    }
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(keys(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def deserialize(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = new TopKBuffer(k)
    b.keys = new Array[Long](math.max(n, 1))
    b.ids = new Array[Long](math.max(n, 1))
    var i = 0
    while (i < n) { b.keys(i) = bb.getLong(); b.ids(i) = bb.getLong(); i += 1 }
    b.n = n
    b
  }
}

/** `graft_topk(key_long, id_long, k)` → array<struct<key:long,id:long>>
  * ordered (key DESC, id ASC) — duplicate (key, id) PAIRS collapse
  * (set semantics, like every sketch in this package); distinct rows
  * always differ in `id`, so nothing real is lost. */
case class TopKByKey(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with BinaryLike[Expression] {

  require(k >= 1 && k <= 65536, s"graft_topk k out of range [1, 65536]: $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (long, long), got ($a, $b)")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val kv = left.eval(input)
    val id = right.eval(input)
    if (kv != null && id != null) {
      buffer.insert(kv.asInstanceOf[Long], id.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val rows = new Array[Any](buffer.n)
    var i = 0
    while (i < buffer.n) {
      rows(i) = InternalRow(buffer.keys(i), buffer.ids(i))
      i += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    TopKBuffer.deserialize(k, bytes)

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("key", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByKey =
    copy(left = newLeft, right = newRight)
}
