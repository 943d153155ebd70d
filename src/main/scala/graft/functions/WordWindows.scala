package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Non-overlapping n-word windows of a document, one string pass — the
  * unitization kernel for [[graft.operators.ParagraphDedup]]'s
  * structureless-text mode.
  *
  * Value-identical to the composite
  * `transform(sequence(0, ceil(W/n)-1), i -> array_join(slice(split(s, sep), i*n+1, n), sep))`
  * but built on one observation: REJOINING split-words with the SAME
  * separator reproduces the original bytes exactly (k consecutive
  * separators split into k-1 empty words and join back to k separators;
  * leading/trailing separators round-trip the same way). A window is
  * therefore a contiguous BYTE SPAN of the input between two word
  * boundaries — no word array, no per-word slices, no join buffers; one
  * boundary scan plus one substring copy per emitted window. The
  * composite is interpreted per element (higher-order functions are
  * CodegenFallback with no subexpression elimination) and measured
  * 2.85 s per corpus pass at sf1 against 0.31 s for the split alone;
  * this kernel removes that constant from all three of the operator's
  * passes. Kernel ≡ composite is spec-pinned (multi-byte UTF-8,
  * consecutive/leading/trailing separators, empty string).
  */
object WordWindows {

  /** Column API: `array<string>` of n-word windows (trailing window may
    * hold fewer words; `""` yields one empty window, matching
    * `split("", sep) == [""]`). `sep` is a LITERAL separator (matched
    * left-to-right, non-overlapping — Java `split(Pattern.quote(sep))`
    * semantics), not a regex.
    */
  def windows(text: Column, n: Int, sep: String): Column = {
    require(n > 0, s"window must be > 0, got $n")
    require(sep.nonEmpty, "separator must be non-empty")
    GraftColumnShim.column(
      WordWindowsExpr(GraftColumnShim.expression(text), n, sep))
  }

  /** Kernel shared by interpreted eval and generated code. */
  def eval(s: UTF8String, n: Int, sepStr: UTF8String): ArrayData = {
    val sep = sepStr.getBytes
    val total = s.numBytes()
    val bytes = s.getBytes // one copy; windows substring from it
    // word starts/ends by scanning non-overlapping separator matches
    var starts = new Array[Int](8)
    var ends = new Array[Int](8)
    var w = 0
    def push(st: Int, en: Int): Unit = {
      if (w == starts.length) {
        starts = java.util.Arrays.copyOf(starts, w * 2)
        ends = java.util.Arrays.copyOf(ends, w * 2)
      }
      starts(w) = st; ends(w) = en; w += 1
    }
    var wordStart = 0
    var i = 0
    while (i + sep.length <= total) {
      var j = 0
      while (j < sep.length && bytes(i + j) == sep(j)) j += 1
      if (j == sep.length) {
        push(wordStart, i)
        wordStart = i + sep.length
        i += sep.length
      } else i += 1
    }
    push(wordStart, total)
    val nWin = (w + n - 1) / n
    val out = new Array[Any](nWin)
    var k = 0
    while (k < nWin) {
      val firstWord = k * n
      val lastWord = math.min(firstWord + n, w) - 1
      val b0 = starts(firstWord)
      val b1 = ends(lastWord)
      out(k) = UTF8String.fromBytes(bytes, b0, b1 - b0)
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<string>` of n-word windows — see [[WordWindows]]. `doGenCode`
  * emits a single static call so the surrounding projection stays inside
  * whole-stage codegen. Elements are non-null by construction, which
  * also keeps `xxhash64(element)` non-nullable — the downstream join
  * then inserts no `isnotnull` filter, preserving exchange reuse between
  * the keep-first aggregation and its join-back branch.
  */
case class WordWindowsExpr(child: Expression, n: Int, sep: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_windows requires a string argument, got ${other.simpleString}")
    }
  }

  private lazy val sepUtf8 = UTF8String.fromString(sep)

  override def nullSafeEval(input: Any): Any =
    WordWindows.eval(input.asInstanceOf[UTF8String], n, sepUtf8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sepUtf8,
      classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordWindows.eval($c, $n, $sepRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordWindowsExpr =
    copy(child = newChild)
}
