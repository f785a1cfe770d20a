package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, StructField, StructType}

/** Product-quantization primitives — the industry 100 TB vector-search
  * shape is IVF + PQ (Jégou/Douze/Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011; FAISS `IVFPQ`): each vector is
  * split into `m` subvectors of `dsub = dim/m` components; each
  * subspace has its own codebook of `ksub` codewords; a vector is
  * stored as `m` small codeword ids (here 64 f32 components → 8 bytes of
  * codes, a 32× compression of the scan/shuffle footprint), and queries
  * score candidates ASYMMETRICALLY — exact query subvector against the
  * candidate's reconstructed codewords — via a per-query lookup table.
  *
  * Both expressions carry the codebook matrix as ONE flat reference
  * object (the [[IvfCells]] discipline): generated code is O(1) in
  * m×ksub×dsub, the per-row loop is primitive and allocation-free.
  * Layout: `books[((j*ksub)+c)*dsub + i]` = component `i` of codeword
  * `c` in subspace `j`.
  *
  * Engine-portable arithmetic, so a SQL oracle can restate encode and
  * score bit-for-bit: all products/sums in f64, accumulated
  * left-to-right; encode picks the minimum squared-L2 codeword with
  * ties to the SMALLER codeword id (strict `<` on the running best).
  * NULL vector elements contribute NOTHING to a distance or dot fold —
  * exactly the SQL restatement's semantics (a null element nulls its
  * LIST_TRANSFORM term and LIST_SUM skips nulls); the embeddings
  * parquet declares nullable elements, so this is the real input type
  * (the QuantizeI8 lesson).
  */
object PqCodes {

  /** Encode: per subspace, the id of the nearest (squared L2) codeword,
    * plus the RECONSTRUCTED vector norm (sqrt of the sum over subspaces
    * of the chosen codeword's squared norm — what ADC scoring divides
    * by). Returns struct<code: array<int>, rnorm: double>; every fold
    * is left-to-right f64 in component/subspace order. */
  def encode(vec: ArrayData, books: Array[Float], m: Int, ksub: Int,
      dsub: Int): InternalRow = {
    val out = new Array[Any](m)
    var rn2 = 0.0
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        val off = j * dsub
        var d = 0.0
        var i = 0
        while (i < dsub) {
          if (!vec.isNullAt(off + i)) {
            val diff = vec.getFloat(off + i).toDouble - books(base + i).toDouble
            d += diff * diff
          }
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best
      val bb = (j * ksub + best) * dsub
      var s = 0.0
      var i = 0
      while (i < dsub) {
        val x = books(bb + i).toDouble
        s += x * x
        i += 1
      }
      rn2 += s
      j += 1
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(out), math.sqrt(rn2)))
  }

  /** Asymmetric-distance lookup table for one query: flat array<double>
    * of length m×ksub, entry [j*ksub + c] = dot(query subvector j,
    * codeword c of subspace j) in the left-to-right f64 fold. */
  def lut(vec: ArrayData, books: Array[Float], m: Int, ksub: Int,
      dsub: Int): GenericArrayData = {
    val out = new Array[Any](m * ksub)
    var j = 0
    while (j < m) {
      val off = j * dsub
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var s = 0.0
        var i = 0
        while (i < dsub) {
          if (!vec.isNullAt(off + i))
            s += vec.getFloat(off + i).toDouble * books(base + i).toDouble
          i += 1
        }
        out(j * ksub + c) = s
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_pq_encode(vec)` → struct<code: array<int>, rnorm: double>. */
case class PqEncode(child: Expression, books: Array[Float], m: Int, ksub: Int,
    dsub: Int) extends UnaryExpression {

  require(m > 0 && ksub > 0 && dsub > 0,
    s"pq geometry out of range: m=$m ksub=$ksub dsub=$dsub")
  require(books.length == m * ksub * dsub,
    s"codebook matrix length ${books.length} != $m*$ksub*$dsub")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("code", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("rnorm", DoubleType, nullable = false)))
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(vec: Any): Any =
    PqCodes.encode(vec.asInstanceOf[ArrayData], books, m, ksub, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("graftPqBooks", books, "float[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqCodes.encode(" +
        s"$v, $booksRef, $m, $ksub, $dsub); // graft_pq_encode")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `graft_pq_lut(vec)` → array<double>, flat m×ksub ADC table. */
case class PqLut(child: Expression, books: Array[Float], m: Int, ksub: Int,
    dsub: Int) extends UnaryExpression {

  require(m > 0 && ksub > 0 && dsub > 0,
    s"pq geometry out of range: m=$m ksub=$ksub dsub=$dsub")
  require(books.length == m * ksub * dsub,
    s"codebook matrix length ${books.length} != $m*$ksub*$dsub")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $t")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  override def nullSafeEval(vec: Any): Any =
    PqCodes.lut(vec.asInstanceOf[ArrayData], books, m, ksub, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("graftPqBooks", books, "float[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqCodes.lut(" +
        s"$v, $booksRef, $m, $ksub, $dsub); // graft_pq_lut")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}
