package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StructField, StructType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.array.ByteArrayMethods
import org.apache.spark.unsafe.types.UTF8String

/** Per-document query-term statistics in one string pass.
  *
  * `termHits(text, terms)` returns `struct<dl:int, tfs:array<int>>`
  * where `dl` is the single-space-split token count — value-identical
  * to `size(split(text, " "))`, i.e. spaces+1 with empty segments
  * counted — and `tfs(i)` is the number of tokens byte-equal to
  * `terms(i)`. This is the extraction kernel for BM25 retrieval
  * ([[graft.operators.Bm25]]): the equivalent relational pipeline
  * (`split` → `explode` → `filter isin` → `groupBy(doc, term)`)
  * allocates a UTF8String per token and generates a row per token only
  * to discard all non-query terms, then shuffles the survivors; the
  * kernel walks the document's bytes once, allocates nothing per token,
  * and already returns the per-(doc, term) aggregate, so no (doc, term)
  * exchange exists at all. Terms are matched byte-for-byte — pass a
  * lowercased column (and lowercased terms) for case-insensitive
  * retrieval, keeping `lower()`'s exact Spark semantics.
  */
object TermHits {

  /** Column API: `struct<dl:int, tfs:array<int>>`; see [[TermHits]]. */
  def termHits(text: Column, terms: Seq[String]): Column = {
    require(terms.nonEmpty, "need at least one query term")
    require(terms.forall(_.nonEmpty), "query terms must be non-empty")
    GraftColumnShim.column(
      TermHitsExpr(GraftColumnShim.expression(text), terms))
  }

  /** Kernel shared by interpreted eval and generated code: one byte walk.
    * A 0x20 byte never occurs inside a multi-byte UTF-8 sequence, so the
    * raw byte scan finds exactly the segments `split(s, " ")` does.
    */
  def hits(s: UTF8String, terms: Array[UTF8String]): InternalRow = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    val tfs = new Array[Int](terms.length)
    var dl = 1
    var segStart = 0
    var i = 0
    while (i <= nb) {
      if (i == nb || Platform.getByte(base, off + i) == ' ') {
        val segLen = i - segStart
        var t = 0
        while (t < terms.length) {
          val term = terms(t)
          if (term.numBytes == segLen && ByteArrayMethods.arrayEquals(
              term.getBaseObject, term.getBaseOffset, base, off + segStart, segLen))
            tfs(t) += 1
          t += 1
        }
        if (i < nb) dl += 1
        segStart = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](dl, new GenericArrayData(tfs)))
  }
}

/** `struct<dl, tfs>` of single-space token count and per-query-term
  * frequencies — see [[TermHits]]. `doGenCode` emits a single static
  * call (terms ride the references array) so the surrounding projection
  * stays inside whole-stage codegen.
  */
case class TermHitsExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("dl", IntegerType, nullable = false),
    StructField("tfs", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "term_hits"

  @transient private lazy val termBytes: Array[UTF8String] =
    terms.map(UTF8String.fromString).toArray

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"term_hits requires a string argument, got ${other.simpleString}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    TermHits.hits(input.asInstanceOf[UTF8String], termBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val termsRef = ctx.addReferenceObj("terms", termBytes,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TermHits.hits($c, $termsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): TermHitsExpr =
    copy(child = newChild)
}
