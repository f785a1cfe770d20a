package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_subword_classes(text)` → array<long> of the four BPE-ish
  * pre-tokenizer class counts `[n_subwords, n_alpha_runs, n_digit_runs,
  * n_marks]` — ONE byte pass over the `UTF8String`, replacing FOUR
  * separate `regexp_extract_all` scans (the e16 hot path; reference
  * semantics mirrored from poet-cloud-cost-etl's token-count quality
  * gates).
  *
  * Why native (the round-19 sf10 probe): the corpus is ~3:1-compressed
  * text, so Java regex at ~5M chars/s/core × 4 scans made e16 the
  * suite's only superlinear-looking text anchor — 110 s at sf10 with
  * the scan parallelism capped by parquet row-group count. One fused
  * byte loop does the same counting at memory speed and keeps the
  * projection inside whole-stage codegen.
  *
  * Exact semantics of the oracle regexes, one pass:
  *  - `n_alpha_runs`  = maximal `[A-Za-z]+` runs (a run starts at an
  *    alpha byte whose previous class was not alpha),
  *  - `n_digit_runs`  = maximal `[0-9]+` runs,
  *  - `n_marks`       = codepoints outside `[A-Za-z0-9 ]` (tabs and
  *    newlines included, exactly like the character class),
  *  - `n_subwords`    = alternation `[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]`
  *    matches — the three classes are disjoint and greedy, so the sum
  *    of the other three IS the alternation count.
  *
  * Unicode: counted per CODEPOINT (UTF-8 continuation bytes skipped;
  * any non-ASCII codepoint is one mark) — the same semantics as the
  * RE2/DuckDB oracle AND as Java regex char classes (which match
  * codepoints, astral pairs included; spec-pinned three ways).
  */
object SubwordClasses {

  def compute(t: UTF8String): GenericArrayData = {
    val bytes = t.getBytes
    val len = bytes.length
    var alphaRuns = 0L
    var digitRuns = 0L
    var marks = 0L
    var prev = 0 // 0 = space/boundary, 1 = alpha, 2 = digit, 3 = mark
    var i = 0
    while (i < len) {
      val b = bytes(i)
      // UTF-8 continuation bytes (10xxxxxx) belong to a codepoint
      // already classified at its lead byte
      if ((b & 0xC0) != 0x80) {
        val cls =
          if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) 1
          else if (b >= '0' && b <= '9') 2
          else if (b == ' ') 0
          // every other codepoint — ASCII punctuation/control or any
          // non-ASCII lead byte (negative in JVM byte order) — is one
          // mark, matching `[^A-Za-z0-9 ]` per codepoint
          else 3
        if (cls == 1) { if (prev != 1) alphaRuns += 1 }
        else if (cls == 2) { if (prev != 2) digitRuns += 1 }
        else if (cls == 3) marks += 1
        prev = cls
      }
      i += 1
    }
    new GenericArrayData(
      Array(alphaRuns + digitRuns + marks, alphaRuns, digitRuns, marks))
  }
}

case class SubwordClasses(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_subword_classes"

  override def nullSafeEval(input: Any): Any =
    SubwordClasses.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SubwordClasses.compute($c); // graft_subword_classes")

  override protected def withNewChildInternal(newChild: Expression): SubwordClasses =
    copy(child = newChild)
}
