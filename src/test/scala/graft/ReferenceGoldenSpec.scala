package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Verbatim execution of the reference's sqllogictest golden corpus —
  * the strongest available parity evidence. Each `query`/`statement`
  * directive runs through `spark.sql` (the `:=` named-arg spelling is
  * handled by AssignSyntaxParser) and row values are compared against
  * the file's expected block.
  *
  * Mechanical spelling translations (semantics-preserving, applied to
  * the SQL text because Spark spells the same construct differently):
  *  - `regexp_matches(col, 'p')` → `(col RLIKE 'p')` (DuckDB function
  *    vs Spark operator for the same RE2-style match)
  *  - `SELECT column_name[, column_type] FROM (DESCRIBE SELECT q)` →
  *    evaluated from `spark.sql(q).schema`, types mapped to DuckDB
  *    names (DuckDB allows DESCRIBE as a subquery; Spark does not)
  *
  * Explicit skip-list (untranslatable, counted and bounded):
  *  - `SIMILAR TO` / `NOT SIMILAR TO` — no Spark SQL spelling exists;
  *    the equivalent RLIKE pushdown is covered by CdxFilterRuleSpec.
  */
class ReferenceGoldenSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.spark

  private case class Tally(ok: Int, skipped: Int, skippedSql: Seq[String])

  private def duckType(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType => "VARCHAR"
      case LongType => "BIGINT"
      case IntegerType => "INTEGER"
      case BooleanType => "BOOLEAN"
      case DoubleType => "DOUBLE"
      case TimestampType => "TIMESTAMP"
      case other => other.sql
    }
  }

  private def render(v: Any): String = v match {
    case null => "NULL"
    case b: Boolean => if (b) "true" else "false"
    case s => s.toString
  }

  private val DescribeRe =
    """(?is)\s*SELECT\s+(column_name(?:\s*,\s*column_type)?)\s+FROM\s*\(\s*DESCRIBE\s+(SELECT\b.*)\)\s*""".r

  /** Run one translated statement, returning rendered result rows. */
  private def runSql(sql: String): Seq[String] = sql match {
    case DescribeRe(cols, inner) =>
      val schema = spark.sql(inner.trim.stripSuffix(";")).schema
      val withType = cols.toLowerCase.contains("column_type")
      schema.fields.toSeq.map(f =>
        if (withType) s"${f.name}\t${duckType(f.dataType)}" else f.name)
    case _ =>
      val translated = sql.replaceAll(
        """(?i)regexp_matches\(\s*(\w+)\s*,\s*('(?:[^']|'')*')\s*\)""", "($1 RLIKE $2)")
      spark.sql(translated).collect().toSeq
        .map(r => (0 until r.length).map(i => render(r.get(i))).mkString("\t"))
  }

  private def untranslatable(sql: String): Boolean =
    sql.toUpperCase.contains("SIMILAR TO")

  /** sqllogictest subset: `require` ignored, `statement ok|error`,
    * `query <types>` with an expected block after `----`.
    */
  private def runFile(path: String): Tally = {
    val lines = scala.io.Source.fromFile(path).getLines().toVector
    var i = 0; var ok = 0
    val skipped = Vector.newBuilder[String]
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    while (i < lines.length) {
      val l = lines(i).trim
      val isQuery = l.startsWith("query ")
      val isStmt = l == "statement ok" || l == "statement error"
      if (isQuery || isStmt) {
        val expectErr = l == "statement error"
        i += 1
        val sqlLines = Vector.newBuilder[String]
        while (i < lines.length && lines(i).trim.nonEmpty && lines(i).trim != "----") {
          sqlLines += lines(i); i += 1
        }
        val expected = if (i < lines.length && lines(i).trim == "----") {
          i += 1
          val exp = Vector.newBuilder[String]
          while (i < lines.length && lines(i).trim.nonEmpty) { exp += lines(i); i += 1 }
          exp.result()
        } else Vector.empty
        val sql = sqlLines.result().mkString("\n").stripSuffix(";")
        if (untranslatable(sql)) skipped += sql.linesIterator.next()
        else if (expectErr) {
          val e = intercept[Exception] { runSql(sql) }
          expected.foreach { exp =>
            assert(messages(e).contains(exp.trim),
              s"[$sql]\nexpected error containing '$exp' in: ${messages(e)}")
          }
          ok += 1
        } else {
          val got = runSql(sql)
          if (isQuery)
            assert(got.map(_.trim) == expected.map(_.trim),
              s"[$sql]\nexpected:\n${expected.mkString("\n")}\ngot:\n${got.mkString("\n")}")
          ok += 1
        }
      } else i += 1
    }
    Tally(ok, skipped.result().size, skipped.result())
  }

  test("internet_archive_pushdown.test runs verbatim (506 lines)") {
    // default endpoints: with debug := true and only cdx_url selected no
    // network request is made (the file's own NOTE), so the expected
    // https://web.archive.org URLs come out exactly
    Graft.registerAll(spark)
    val t = runFile("/root/reference/test/sql/internet_archive_pushdown.test")
    val total = t.ok + t.skipped
    assert(t.ok >= 43, s"executed only ${t.ok} of $total")
    assert(t.ok.toDouble / total >= 0.9,
      s"skipped too much: ${t.skippedSql.mkString("; ")}")
    info(s"executed ${t.ok}/$total statements; skipped ${t.skipped} (SIMILAR TO)")
  }

  test("common_crawl_errors.test runs verbatim (binder parity + LIMIT-0 edge cases)") {
    // every statement is offline-safe: LIMIT 0 plans collapse to an empty
    // relation before any scan, and the error cases fail at bind time —
    // except wayback_machine() LIMIT 1, which must fail with the
    // reference's requires-a-URL-filter wording at plan time
    Graft.registerAll(spark)
    val t = runFile("/root/reference/test/sql/common_crawl_errors.test")
    val total = t.ok + t.skipped
    assert(t.skipped == 0, s"skipped: ${t.skippedSql.mkString("; ")}")
    assert(t.ok >= 20, s"executed only ${t.ok} of $total")
    info(s"executed ${t.ok}/$total statements")
  }
}
