package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch state (Cormode & Muthukrishnan 2005): a d×w grid
  * of counters; each input string increments one cell per row, the
  * cell chosen by an independent 32-bit hash. `estimate(q) = min over
  * rows of the q-cell` — always an OVERcount (collisions only add),
  * within `ε·N` with probability `1−δ` for `w = e/ε`, `d = ln(1/δ)`.
  *
  * Why this completes the sketch family: KMV answers "how many
  * distinct", bloom answers "seen at all?", top-k answers "which are
  * biggest" — CMS answers "how often does THIS one occur" with
  * `d·w` counters of state however many distinct keys exist. Exact
  * per-key counts shuffle every key; the CMS grid merges by vector
  * ADD, so map-side partials ship `d·w` longs per partition.
  *
  * Engine parity: the d row hashes are the four disjoint 8-hex-char
  * slices of `md5(value)` (`('0x' || substr(md5(v), 1+8r, 8))::BIGINT
  * % w` in any SQL engine), so an oracle restates every counter cell
  * and estimate exactly — counters are sums, associative in any
  * merge order.
  */
final class CmsBuffer(val w: Int, val d: Int) {
  private[functions] val counts = new Array[Long](w * d)

  private val md = java.security.MessageDigest.getInstance("MD5")

  def add(v: UTF8String): Unit = {
    md.reset()
    val digest = md.digest(v.getBytes)
    var r = 0
    while (r < d) {
      val o = 4 * r
      val cell = (((digest(o) & 0xffL) << 24) | ((digest(o + 1) & 0xffL) << 16) |
        ((digest(o + 2) & 0xffL) << 8) | (digest(o + 3) & 0xffL)) % w
      counts(r * w + cell.toInt) += 1
      r += 1
    }
  }

  def mergeFrom(other: CmsBuffer): Unit = {
    var i = 0
    while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * counts.length)
    var i = 0
    while (i < counts.length) { bb.putLong(counts(i)); i += 1 }
    bb.array()
  }
}

object CmsBuffer {
  def deserialize(w: Int, d: Int, bytes: Array[Byte]): CmsBuffer = {
    val b = new CmsBuffer(w, d)
    val bb = ByteBuffer.wrap(bytes)
    var i = 0
    while (i < b.counts.length) { b.counts(i) = bb.getLong(); i += 1 }
    b
  }
}

/** `graft_cms(value_string, w, d)` → array<long> of length `d·w`
  * (row-major): the Count-Min grid over the group's values. Estimate
  * downstream with built-ins:
  * `least(element_at(cms, r·w + cell_r(q) + 1) for r in 0..d-1)`. */
case class CmsSketch(
    child: Expression,
    w: Int,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer]
  with UnaryLike[Expression] {

  require(w >= 2 && w <= (1 << 20), s"graft_cms width out of range [2, 2^20]: $w")
  require(d >= 1 && d <= 4, s"graft_cms depth out of range [1, 4]: $d (md5 has 4 slices)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column, got $t")
  }

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(w, d)

  override def update(buffer: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(buffer: CmsBuffer, other: CmsBuffer): CmsBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: CmsBuffer): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buffer.counts, buffer.counts.length))

  override def serialize(buffer: CmsBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): CmsBuffer =
    CmsBuffer.deserialize(w, d, bytes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketch =
    copy(child = newChild)
}
