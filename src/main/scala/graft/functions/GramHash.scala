package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Stride-sampled character-n-gram hash keys, one document pass.
  *
  * `gramHashes(text, n, stride)` returns `array<long>` where element k
  * is **value-identical to `xxhash64(substring(text, 1 + k*stride, n))`**
  * — the same UTF-8 byte slice fed to the same XXH64 with Spark's seed
  * (42) — but computed by sliding a char-boundary window over the
  * string: no per-position substring materialization, no per-gram
  * allocation, O(len) per document instead of O(len · n / stride)
  * copied bytes. This is the extraction kernel for the exact-substring
  * duplication census ([[graft.operators.SubstringDup]]), where the
  * naive `explode(sequence(...))` + `substring` + `xxhash64` pipeline
  * spends most of its scan time slicing 250M+ transient strings.
  */
object GramHash {

  /** Column API: `array<long>` of XXH64 gram keys. Empty array when the
    * string is shorter than `n` chars (no gram position exists).
    */
  def gramHashes(text: Column, n: Int, stride: Int): Column = {
    require(n > 0 && stride > 0, s"n and stride must be > 0, got n=$n stride=$stride")
    GraftColumnShim.column(
      GramHashesExpr(GraftColumnShim.expression(text), n, stride))
  }

  /** Kernel shared by interpreted eval and generated code. Walks UTF-8
    * char boundaries once, keeping a ring of the last n+1 boundary byte
    * offsets so multi-byte text needs no O(len) offset table.
    */
  def hashes(s: UTF8String, n: Int, stride: Int): ArrayData = {
    val numChars = s.numChars()
    if (numChars < n) return new GenericArrayData(Array.emptyLongArray)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val out = new Array[Long]((numChars - n) / stride + 1)
    val ring = new Array[Int](n + 1) // byte offsets of the last n+1 char boundaries
    var charIdx = 0
    var byteIdx = 0
    var k = 0
    while (charIdx <= numChars) {
      ring(charIdx % (n + 1)) = byteIdx
      if (charIdx >= n && (charIdx - n) % stride == 0 && k < out.length) {
        val b0 = ring((charIdx - n) % (n + 1))
        out(k) = XXH64.hashUnsafeBytes(base, off + b0, byteIdx - b0, 42L)
        k += 1
      }
      if (charIdx < numChars) {
        byteIdx += UTF8String.numBytesForFirstByte(
          org.apache.spark.unsafe.Platform.getByte(base, off + byteIdx))
      }
      charIdx += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<long>` of stride-sampled XXH64 gram keys — see [[GramHash]].
  * `doGenCode` emits a single static call so the surrounding projection
  * stays inside whole-stage codegen.
  */
case class GramHashesExpr(child: Expression, n: Int, stride: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gram_hashes requires a string argument, got ${other.simpleString}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    GramHash.hashes(input.asInstanceOf[UTF8String], n, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramHash.hashes($c, $n, $stride);")

  override protected def withNewChildInternal(newChild: Expression): GramHashesExpr =
    copy(child = newChild)
}
