package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StructField, StructType}

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

  /** Bits per packed code for a `ksub`-codeword codebook and how many
    * codes fit one 63-bit-safe word: big-endian, zero-padded — code j
    * sits at shift `bits·(cpw-1 − j%cpw)` of word `j/cpw`. */
  def bitsPerCode(ksub: Int): Int = {
    var b = 1
    while ((1 << b) < ksub) b += 1
    b
  }
  def codesPerWord(ksub: Int): Int = 60 / bitsPerCode(ksub)

  /** Encode: per subspace, the id of the nearest (squared L2) codeword,
    * plus the same ids PACKED into 64-bit words (the storage form: at
    * m=16/ksub=64 a vector's codes are 2 longs — 16 bytes of candidate
    * state instead of 256 bytes of f32), plus the RECONSTRUCTED vector
    * norm (sqrt of the sum over subspaces of the chosen codeword's
    * squared norm — what ADC scoring divides by). Returns
    * struct<code: array<int>, packed: array<long>, rnorm: double>;
    * every fold is left-to-right f64 in component/subspace order. */
  def encode(vec: ArrayData, books: Array[Float], m: Int, ksub: Int,
      dsub: Int): InternalRow = {
    val out = new Array[Any](m)
    var rn2 = 0.0
    val bits = bitsPerCode(ksub)
    val cpw = codesPerWord(ksub)
    val words = new Array[Any]((m + cpw - 1) / cpw)
    java.util.Arrays.fill(words, 0L)
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
      val w = j / cpw
      words(w) = words(w).asInstanceOf[Long] |
        (best.toLong << (bits * (cpw - 1 - j % cpw)))
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
    new GenericInternalRow(Array[Any](
      new GenericArrayData(out), new GenericArrayData(words), math.sqrt(rn2)))
  }

  /** Asymmetric-distance score from PACKED codes: Σ over subspaces (in
    * j order — the same left-to-right fold the SQL oracle restates) of
    * `lut[j·ksub + code_j]`, with `code_j` unpacked by shift+mask. One
    * allocation-free loop per candidate row — the hot path of ANN
    * serving (the scoring join) stays inside whole-stage codegen where
    * a HOF lambda would run interpreted. */
  def adc(packed: ArrayData, lut: ArrayData, m: Int, ksub: Int): Double = {
    val bits = bitsPerCode(ksub)
    val cpw = codesPerWord(ksub)
    val mask = (1L << bits) - 1
    var s = 0.0
    var j = 0
    while (j < m) {
      val word = packed.getLong(j / cpw)
      val c = ((word >>> (bits * (cpw - 1 - j % cpw))) & mask).toInt
      s += lut.getDouble(j * ksub + c)
      j += 1
    }
    s
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
    StructField("packed", ArrayType(LongType, containsNull = false), nullable = false),
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

/** `graft_pq_adc(packed, lut)` → double: the candidate-scoring kernel
  * over PACKED codes and a per-query LUT (see [[PqCodes.adc]]). */
case class PqAdc(left: Expression, right: Expression, m: Int, ksub: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(m > 0 && ksub > 0, s"pq geometry out of range: m=$m ksub=$ksub")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<double>), got ($l, $r)")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(packed: Any, lut: Any): Any =
    PqCodes.adc(packed.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData], m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, l) =>
      s"${ev.value} = graft.functions.PqCodes.adc($p, $l, $m, $ksub); // graft_pq_adc")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
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
