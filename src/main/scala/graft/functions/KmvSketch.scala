package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded KMV (k-minimum-values) distinct-count sketch state: the k
  * smallest DISTINCT long hash values seen so far, kept as a sorted
  * ascending array.
  *
  * Why this shape at 100 TB: exact `COUNT(DISTINCT x)` shuffles every
  * distinct value to the reducer for its group; a KMV sketch caps the
  * per-group state at `k` longs, is merged associatively (set union,
  * re-truncated to the k smallest), and map-side partial aggregation
  * ships at most `k` longs per (partition, group) across the wire —
  * the shuffle volume is bounded by `groups × k × 8` bytes no matter
  * how many distinct values exist. The estimator is the classic
  * Bar-Yossef et al. (2002) / Beyer et al. (2007) unbiased KMV form
  * `(k-1) / F(h_k)` with `F` the fraction of the hash space below the
  * k-th minimum; unlike HLL the sketch is DETERMINISTIC given the hash
  * function, so an independent engine (the DuckDB oracle) restates it
  * exactly with a window `row_number() <= k` over distinct hashes.
  *
  * Per-row cost: once the buffer holds k values, any hash >= the
  * current k-th minimum is rejected with one comparison (the common
  * case on a large stream); an admitted hash costs a binary search
  * plus one bounded memmove.
  */
final class KmvBuffer(val k: Int) {
  private[functions] var vals: Array[Long] = new Array[Long](math.min(k, 16))
  private[functions] var n: Int = 0

  private def grow(): Unit = {
    vals = java.util.Arrays.copyOf(vals, math.min(k, math.max(vals.length * 2, 16)))
  }

  /** Insert one hash: kept iff it is among the k smallest distinct. */
  def insert(h: Long): Unit = {
    if (n == k && h >= vals(n - 1)) return // saturated fast-path reject
    var idx = java.util.Arrays.binarySearch(vals, 0, n, h)
    if (idx >= 0) return // duplicate — KMV is over distinct values
    idx = -idx - 1
    if (n == k) {
      // evict the current maximum (last slot) by shifting the tail
      System.arraycopy(vals, idx, vals, idx + 1, k - 1 - idx)
      vals(idx) = h
    } else {
      if (n == vals.length) grow()
      System.arraycopy(vals, idx, vals, idx + 1, n - idx)
      vals(idx) = h
      n += 1
    }
  }

  /** Set-union with another buffer, re-truncated to the k smallest.
    * `other.vals` is ascending, so once a candidate is >= this
    * buffer's saturated maximum every later one is too. */
  def mergeFrom(other: KmvBuffer): Unit = {
    var i = 0
    while (i < other.n) {
      if (n == k && other.vals(i) >= vals(n - 1)) return
      insert(other.vals(i))
      i += 1
    }
  }

  def toArray: Array[Long] = java.util.Arrays.copyOf(vals, n)

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(vals(i)); i += 1 }
    bb.array()
  }
}

object KmvBuffer {
  def deserialize(k: Int, bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = new KmvBuffer(k)
    b.vals = new Array[Long](math.max(n, 1))
    var i = 0
    while (i < n) { b.vals(i) = bb.getLong(); i += 1 }
    b.n = n
    b
  }
}

/** `graft_kmv(hash_long, k)` → array<long>: the k smallest distinct
  * input values per group, ascending — a mergeable KMV distinct-count
  * sketch (see [[KmvBuffer]]). Compose the estimate downstream with
  * built-ins: `size(s)` (< k means the count is exact) and
  * `element_at(s, -1)` (the k-th minimum) give
  * `(k-1) * 2^60 / kth` for 60-bit hashes.
  *
  * Reference scope: the reference has no approx-distinct capability
  * (SURVEY §2 "Approx distinct: none") — its serving layer counts
  * exactly over the costs view (`/root/reference/sql/init.sql:31-56`),
  * viable single-node, not at 100 TB. Spark's own `approx_count_distinct`
  * (HLL++) is non-deterministic across engines and so excluded from the
  * hash suite; KMV is the sketch that IS exactly restatable.
  *
  * INPUT CONTRACT: hashes must be STRICTLY POSITIVE (the engine's
  * callers all feed `md5-prefix + 1` 60-bit hashes via
  * [[graft.ext.Cardinality.kmvHashFromHex]]). The ascending ordering
  * and the `(k-1) * 2^60 / h_k` estimator both assume a positive hash
  * space — a raw signed hash (e.g. `xxhash64`) would sort its negative
  * half FIRST and yield a negative k-th minimum, and a zero would make
  * the estimator divide by zero: nonsense estimates either way, with
  * no error. `update` rejects non-positive inputs loudly instead
  * (ADVICE r13).
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer]
  with UnaryLike[Expression] {

  require(k >= 2 && k <= 65536, s"graft_kmv k out of range [2, 65536]: $k")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // h == 0 is rejected too: a zero among the k minima makes the
      // estimator divide by a zero k-th minimum — Infinity with no
      // error, the same silent-nonsense mode as a negative hash. The
      // engine's hash convention is `... + 1`, i.e. always >= 1.
      if (h <= 0L)
        throw new IllegalArgumentException(
          s"graft_kmv received a non-positive hash ($h): the sketch ordering and " +
            "the (k-1)*2^60/h_k estimator require hashes >= 1 — feed a " +
            "60-bit hash (e.g. conv(substring(md5(x),1,15),16,10)+1), not a raw " +
            "signed hash like xxhash64")
      buffer.insert(h)
    }
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: KmvBuffer): Any = new GenericArrayData(buffer.toArray)

  override def serialize(buffer: KmvBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): KmvBuffer = KmvBuffer.deserialize(k, bytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a long hash column, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}
