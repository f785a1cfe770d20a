package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-VALUE portable hashes — the scalar companions of the
  * token/shingle families in [[TokenHashes]]: the top 60 (resp. 24) md5
  * bits of a string's bytes, numerically identical to
  * `conv(substring(md5(x), 1, 15), 16, 10)` (resp. `..., 1, 6)`), the
  * engine-portable hash every sketch/sampler in the library restates in
  * DuckDB as `('0x' || substr(md5(x), 1, 15))::BIGINT`.
  *
  * Why native (optimization r21, guide §4): the built-in formulation
  * allocates three intermediate `UTF8String`s per value (the 32-char md5
  * hex, the substring slice, conv's decimal re-render) and — decisive for
  * the sketch aggregates — runs INTERPRETED when it appears as the input
  * expression of a `TypedImperativeAggregate` ([[KmvDistinct]] forces
  * `ObjectHashAggregateExec`, which evaluates aggregate inputs per row
  * with `Expression.eval`, outside whole-stage codegen). e71's one-pass
  * six-column profile spent 3.4 of its 3.7 s in exactly that interpreted
  * chain. This expression digests the string's bytes straight into a
  * long (thread-local MessageDigest, zero intermediate strings), so both
  * its codegen'd and its interpreted form do one md5 and nothing else.
  */
object PortableValueHash {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5(bytes) as an int64: digest bytes 0-6
    * whole (56 bits), then the high nibble of byte 7 — exactly the value
    * `conv(substring(md5(x),1,15),16,10)` parses (the
    * [[graft.ext.Dedup.portableHash64]] family). */
  def top60(s: UTF8String): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** First 6 hex chars of md5(bytes) as an int64 (the
    * [[graft.ext.Dedup.portableHash24]] family). */
  def top24(s: UTF8String): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    ((d(0) & 0xffL) << 16) | ((d(1) & 0xffL) << 8) | (d(2) & 0xffL)
  }
}

/** [[PortableValueHash]] companion: the full sketch-input vector of one
  * md5 — `[top60+1, slice32(0..3)]` — for the one-scan skew/cardinality
  * measurements (e75/e76). One digest per row feeds FIVE sketch inputs
  * (the KMV hash and the four AMS estimator slices); computed as five
  * separate expressions inside the `ObjectHashAggregate` each aggregate
  * re-parsed the hex per row (no common-subexpression elimination
  * across aggregate inputs), 17 interpreted substring/base16 chains per
  * row. Projected ONCE as an array (a multi-referenced alias survives
  * CollapseProject), each aggregate reads an `element_at` — O(1) on the
  * materialized array. */
object Md5SketchVector {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** `[ (first 15 hex chars of md5)::long + 1,
    *    (hex chars 1-8)::long, (9-16)::long, (17-24)::long, (25-32)::long ]`
    * — numerically identical to [[graft.ext.Cardinality.kmvHashFromHex]]
    * and the four [[graft.ext.Cardinality.amsSliceSql]] slices. */
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String): GenericArrayData = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    var top = 0L
    var i = 0
    while (i < 7) { top = (top << 8) | (d(i) & 0xffL); i += 1 }
    top = (top << 4) | ((d(7) >> 4) & 0xfL)
    def slice(r: Int): Long =
      ((d(4 * r) & 0xffL) << 24) | ((d(4 * r + 1) & 0xffL) << 16) |
        ((d(4 * r + 2) & 0xffL) << 8) | (d(4 * r + 3) & 0xffL)
    new GenericArrayData(Array(top + 1L, slice(0), slice(1), slice(2), slice(3)))
  }
}

/** `graft_md5_sketch(str)` → array<long>[5]: the KMV hash (+1-shifted
  * top-60 md5 bits) and the four 32-bit AMS slices of one digest. */
case class Md5Sketch(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_md5_sketch"
  override def nullSafeEval(input: Any): Any =
    Md5SketchVector.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5SketchVector.compute($c); // graft_md5_sketch")
  override protected def withNewChildInternal(newChild: Expression): Md5Sketch =
    copy(child = newChild)
}

/** `graft_portable_hash60(str)` → long: top 60 md5 bits of the string's
  * bytes ≡ `conv(substring(md5(str),1,15),16,10)::long`. */
case class PortableValueHash60(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_portable_hash60"
  override def nullSafeEval(input: Any): Any =
    PortableValueHash.top60(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PortableValueHash.top60($c); // graft_portable_hash60")
  override protected def withNewChildInternal(newChild: Expression): PortableValueHash60 =
    copy(child = newChild)
}

/** `graft_portable_hash24(str)` → long: top 24 md5 bits of the string's
  * bytes ≡ `conv(substring(md5(str),1,6),16,10)::long`. */
case class PortableValueHash24(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_portable_hash24"
  override def nullSafeEval(input: Any): Any =
    PortableValueHash.top24(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PortableValueHash.top24($c); // graft_portable_hash24")
  override protected def withNewChildInternal(newChild: Expression): PortableValueHash24 =
    copy(child = newChild)
}
