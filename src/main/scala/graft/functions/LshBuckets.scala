package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** `graft_lsh_buckets(vec)` → array<long>: the sign-pattern hyperplane
  * LSH bucket of a vector in EVERY table, from one expression.
  *
  * Why native: the per-plane column formulation builds tables × planes
  * separate dot-product expressions over per-plane literal arrays — at
  * 8×8 that is 64 fused loops across an 8-way union of corpus scans
  * (8× the I/O) and a generated-code/constant-pool blowup that costs
  * seconds of Janino compile per session. This expression carries the
  * whole plane matrix as ONE flat reference object and emits all table
  * buckets in a single pass over the vector — the corpus is scanned
  * once and `posexplode` fans out (table, bucket) rows.
  *
  * Bit parity: each plane dot accumulates f32 products left-to-right in
  * f64 over `min(dim, |vec|)` elements — identical to
  * `graft_dot_f32(planeLit, vec)`, so buckets match the per-plane
  * formulation exactly.
  */
object LshBuckets {
  /** Shared by interpreted eval and generated code. */
  def compute(vec: ArrayData, planes: Array[Float], tables: Int,
      perTable: Int, dim: Int): GenericArrayData = {
    val n = math.min(dim, vec.numElements())
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < perTable) {
        val base = (t * perTable + p) * dim
        var s = 0.0
        var i = 0
        while (i < n) {
          s += planes(base + i).toDouble * vec.getFloat(i).toDouble
          i += 1
        }
        if (s >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

case class LshBuckets(child: Expression, planes: Array[Float],
    tables: Int, perTable: Int, dim: Int) extends UnaryExpression {

  require(tables > 0 && perTable > 0 && perTable <= 63 && dim > 0,
    s"lsh geometry out of range: tables=$tables perTable=$perTable dim=$dim")
  require(planes.length == tables * perTable * dim,
    s"plane matrix length ${planes.length} != $tables*$perTable*$dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  override def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData], planes, tables, perTable, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("graftLshPlanes", planes, "float[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LshBuckets.compute(" +
        s"$c, $planesRef, $tables, $perTable, $dim); // graft_lsh_buckets")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}
