package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}
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

  /** Column API: `array<struct<gram:long, cnt:long>>` of DISTINCT gram
    * keys with their per-document position counts — the same sampled
    * positions as [[gramHashes]], collapsed to one pair per distinct
    * gram inside the kernel. This is the map-side combine for the
    * substring-dup census's gram-keyed exchange: the shuffle ships
    * O(distinct grams per doc) rows instead of O(positions), so a
    * ubiquitous boilerplate gram's post-shuffle partition is bounded by
    * docs-containing-gram (one row per doc), never by its raw position
    * count. Pair order is deterministic for a given string (open-address
    * table walk), but callers must treat it as unordered.
    */
  def gramHashCounts(text: Column, n: Int, stride: Int): Column = {
    require(n > 0 && stride > 0, s"n and stride must be > 0, got n=$n stride=$stride")
    GraftColumnShim.column(
      GramHashCountsExpr(GraftColumnShim.expression(text), n, stride))
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

  /** Pair-emitting kernel: same single boundary walk as [[hashes]], but
    * the sampled gram keys collapse into a per-document open-addressed
    * count table (≤50% load, linear probing; `cnt == 0` marks an empty
    * slot — counts start at 1 so a legitimate hash value of 0 needs no
    * sentinel). Emits `struct<gram, cnt>` rows, one per DISTINCT gram.
    * Peak extra memory is 2 longs × 2 × positions for the table — the
    * same order as the position array [[hashes]] already allocates.
    */
  def hashCounts(s: UTF8String, n: Int, stride: Int): ArrayData = {
    val numChars = s.numChars()
    if (numChars < n) return new GenericArrayData(Array.empty[Any])
    val total = (numChars - n) / stride + 1
    var cap = 8
    while (cap < total * 2) cap <<= 1
    val mask = cap - 1
    val keys = new Array[Long](cap)
    val cnts = new Array[Long](cap)
    var distinct = 0
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val ring = new Array[Int](n + 1)
    var charIdx = 0
    var byteIdx = 0
    var k = 0
    while (charIdx <= numChars) {
      ring(charIdx % (n + 1)) = byteIdx
      if (charIdx >= n && (charIdx - n) % stride == 0 && k < total) {
        val b0 = ring((charIdx - n) % (n + 1))
        val h = XXH64.hashUnsafeBytes(base, off + b0, byteIdx - b0, 42L)
        var slot = (h ^ (h >>> 32)).toInt & mask
        var placed = false
        while (!placed) {
          if (cnts(slot) == 0L) {
            keys(slot) = h; cnts(slot) = 1L; distinct += 1; placed = true
          } else if (keys(slot) == h) {
            cnts(slot) += 1L; placed = true
          } else slot = (slot + 1) & mask
        }
        k += 1
      }
      if (charIdx < numChars) {
        byteIdx += UTF8String.numBytesForFirstByte(
          org.apache.spark.unsafe.Platform.getByte(base, off + byteIdx))
      }
      charIdx += 1
    }
    val out = new Array[Any](distinct)
    var i = 0
    var j = 0
    while (i < cap) {
      if (cnts(i) != 0L) {
        out(j) = new GenericInternalRow(Array[Any](keys(i), cnts(i)))
        j += 1
      }
      i += 1
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

/** `array<struct<gram:long, cnt:long>>` of DISTINCT sampled gram keys
  * with per-document position counts — the map-side-collapsed variant of
  * [[GramHashesExpr]]; see [[GramHash.gramHashCounts]]. `doGenCode`
  * emits a single static call so the surrounding projection stays inside
  * whole-stage codegen.
  */
case class GramHashCountsExpr(child: Expression, n: Int, stride: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("gram", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gram_hash_counts requires a string argument, got ${other.simpleString}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    GramHash.hashCounts(input.asInstanceOf[UTF8String], n, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramHash.hashCounts($c, $n, $stride);")

  override protected def withNewChildInternal(newChild: Expression): GramHashCountsExpr =
    copy(child = newChild)
}
