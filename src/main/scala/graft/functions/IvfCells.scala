package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** `graft_ivf_cells(vec, vecNorm)` → array<int>: the `nprobe` nearest
  * IVF cells of a vector (descending cosine; ties prefer the smaller
  * cell id), with the whole centroid matrix carried as ONE flat
  * reference object.
  *
  * Why native: the literal-projection formulation of cell
  * scoring/assignment bakes nlist separate dot-product expressions into
  * the plan — fine at nlist=16, but the generated code (and the plan
  * itself) grows linearly with nlist, and above a few hundred cells the
  * Janino constant pool / method size limits kick whole stages out of
  * codegen. This expression is O(1) generated code at any nlist: one
  * call into [[IvfCells.compute]], which loops the matrix in a tight
  * primitive loop (runtime O(nlist×dim) per row, the same work the
  * literal plan did across its fused loops).
  *
  * Bit parity with the literal path ([[graft.ext.Similarity.ivfTopK]]):
  * each cell's dot accumulates f32 products left-to-right in f64
  * (identical to `graft_dot_f32`), the cosine divides by
  * (vecNorm · cellNorm) with driver-precomputed cell norms, and
  * ranking uses `Double.compare` — NaN greatest, matching Spark's
  * ordering of the (cos, -cid) struct array the literal path sorts.
  */
object IvfCells {
  /** Shared by interpreted eval and generated code. Returns the
    * min(nprobe, nlist) nearest cell ids, best first. */
  def compute(vec: ArrayData, vecNorm: Double, cents: Array[Float],
      norms: Array[Double], nprobe: Int, dim: Int): GenericArrayData = {
    val nlist = norms.length
    val take = math.min(nprobe, nlist)
    val topC = new Array[Double](take)
    val topI = new Array[Int](take)
    var filled = 0
    val n = math.min(dim, vec.numElements())
    var cid = 0
    while (cid < nlist) {
      val base = cid * dim
      var s = 0.0
      var i = 0
      while (i < n) {
        s += vec.getFloat(i).toDouble * cents(base + i).toDouble
        i += 1
      }
      val c = s / (vecNorm * norms(cid))
      // insertion into the running top list: strictly-better only, so
      // equal-cosine candidates keep ascending cid order (the literal
      // path's reverse(array_sort((cos, -cid))) tie rule)
      var pos = filled
      while (pos > 0 && java.lang.Double.compare(c, topC(pos - 1)) > 0) pos -= 1
      if (pos < take) {
        val last = math.min(filled, take - 1)
        var j = last
        while (j > pos) { topC(j) = topC(j - 1); topI(j) = topI(j - 1); j -= 1 }
        topC(pos) = c
        topI(pos) = cid
        if (filled < take) filled += 1
      }
      cid += 1
    }
    val out = new Array[Any](filled)
    var j = 0
    while (j < filled) { out(j) = topI(j); j += 1 }
    new GenericArrayData(out)
  }
}

case class IvfCells(left: Expression, right: Expression, cents: Array[Float],
    norms: Array[Double], nprobe: Int, dim: Int) extends BinaryExpression {

  require(nprobe > 0 && dim > 0, s"ivf geometry out of range: nprobe=$nprobe dim=$dim")
  require(norms.nonEmpty && cents.length == norms.length * dim,
    s"centroid matrix length ${cents.length} != ${norms.length}*$dim")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, double), got ($l, $r)")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_ivf_cells"

  override def nullSafeEval(vec: Any, norm: Any): Any =
    IvfCells.compute(vec.asInstanceOf[ArrayData], norm.asInstanceOf[Double],
      cents, norms, nprobe, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("graftIvfCents", cents, "float[]")
    val normsRef = ctx.addReferenceObj("graftIvfNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, (v, n) =>
      s"${ev.value} = graft.functions.IvfCells.compute(" +
        s"$v, $n, $centsRef, $normsRef, $nprobe, $dim); // graft_ivf_cells")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IvfCells =
    copy(left = newLeft, right = newRight)
}
