package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, NamedArgumentExpression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParameterContext}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types._

/** SQL table-valued-function surface for the connector sources — the
  * reference exposes `SELECT * FROM common_crawl_index(max_results := 50,
  * debug := true)` (reference test/sql/common_crawl_parameters.test:7-31)
  * and `wayback_machine(...)` with named parameters; this registers REAL
  * table functions in the session's `TableFunctionRegistry` (the same
  * registry `range()` lives in), so Spark's own TVF resolution handles
  * name lookup and the named-argument (`name => value`) call form.
  *
  * Parameter sets mirror the reference bind signatures:
  *  - common_crawl_index: max_results BIGINT, debug BOOLEAN,
  *    timeout BIGINT  (common_crawl_index.cpp:1547-1549)
  *  - wayback_machine:    max_results BIGINT, collapse VARCHAR,
  *    debug BOOLEAN, timeout BIGINT  (internet_archive.cpp:1916-1919)
  *
  * Each invocation builds a fresh DSv2 relation whose reader options are
  * the registration-time defaults (endpoints, secrets) overridden by the
  * call's named arguments — so every pushdown the option-configured scan
  * supports works identically through the SQL spelling, and a pushed
  * LIMIT still overrides max_results exactly as the reference documents.
  */
object GraftTvf {

  private case class Param(name: String, kind: String) // bigint | boolean | varchar

  private val ccParams = Seq(
    Param("max_results", "bigint"), Param("debug", "boolean"), Param("timeout", "bigint"))
  private val wbParams = Seq(
    Param("max_results", "bigint"), Param("collapse", "varchar"),
    Param("debug", "boolean"), Param("timeout", "bigint"))

  /** Register both TVFs; `defaults` carry endpoint/etc reader options. */
  def register(spark: SparkSession,
               waybackOptions: Map[String, String] = Map.empty,
               commonCrawlOptions: Map[String, String] = Map.empty): Unit = {
    registerOne(spark, "common_crawl_index", "commoncrawl", ccParams, commonCrawlOptions)
    registerOne(spark, "wayback_machine", "wayback", wbParams, waybackOptions)
  }

  private def registerOne(spark: SparkSession, fname: String, format: String,
                          params: Seq[Param], defaults: Map[String, String]): Unit =
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(fname),
      new ExpressionInfo(getClass.getName.stripSuffix("$"), fname),
      (args: Seq[Expression]) => build(spark, fname, format, params, defaults, args))

  private def build(spark: SparkSession, fname: String, format: String,
                    params: Seq[Param], defaults: Map[String, String],
                    args: Seq[Expression]): LogicalPlan = {
    val opts = args.map {
      case NamedArgumentExpression(key, value) =>
        val k = key.toLowerCase
        val p = params.find(_.name == k).getOrElse(throw new IllegalArgumentException(
          s"""Invalid named parameter "$key" for function $fname. """ +
            s"Expected: ${params.map(_.name).mkString(", ")}"))
        k -> renderValue(fname, p, value)
      case other => throw new IllegalArgumentException(
        s"$fname does not take positional parameters " +
          s"(got ${other.sql}); use name := value")
    }.toMap
    spark.read.format(format).options(defaults ++ opts).load()
      .queryExecution.logical
  }

  // type checks + error wording follow the reference binder
  // (common_crawl_index.cpp:320-341)
  private def renderValue(fname: String, p: Param, e: Expression): String = (p.kind, e) match {
    case ("bigint", Literal(v, IntegerType | LongType | ShortType)) => v.toString
    case ("bigint", _) =>
      val unit = if (p.name == "timeout") " (seconds)" else ""
      throw new IllegalArgumentException(
        s"$fname ${p.name} parameter must be an integer$unit")
    case ("boolean", Literal(v, BooleanType)) => v.toString
    case ("boolean", _) => throw new IllegalArgumentException(
      s"$fname ${p.name} parameter must be a boolean")
    case ("varchar", Literal(v, StringType)) if v != null => v.toString
    case ("varchar", _) => throw new IllegalArgumentException(
      s"$fname ${p.name} parameter must be a string")
  }
}

/** Delegating parser that accepts DuckDB's `name := value` named-argument
  * spelling by rewriting `:=` to Spark's `name => value` form outside
  * string literals, quoted identifiers, and comments. `:=` has no other
  * meaning anywhere in Spark SQL, so the rewrite is semantics-preserving.
  */
class AssignSyntaxParser(delegate: ParserInterface) extends ParserInterface {

  private[plans] def rewrite(sql: String): String = {
    if (!sql.contains(":=")) return sql
    val out = new java.lang.StringBuilder(sql.length)
    var i = 0
    var state: Char = 'n' // n=normal, '\''=string, '"'=dquote, '`'=bquote, '-'=line comment, '*'=block comment
    while (i < sql.length) {
      val c = sql.charAt(i)
      state match {
        case 'n' =>
          if (c == ':' && i + 1 < sql.length && sql.charAt(i + 1) == '=') {
            out.append("=>"); i += 1
          } else {
            if (c == '\'' || c == '"' || c == '`') state = c
            else if (c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') state = '-'
            else if (c == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*') state = '*'
            out.append(c)
          }
        case q @ ('\'' | '"' | '`') =>
          // doubled quote chars are escapes inside their own literal kind
          if (c == q && i + 1 < sql.length && sql.charAt(i + 1) == q) {
            out.append(c); out.append(c); i += 1
          } else {
            if (c == q) state = 'n'
            out.append(c)
          }
        case '-' =>
          if (c == '\n') state = 'n'
          out.append(c)
        case '*' =>
          if (c == '*' && i + 1 < sql.length && sql.charAt(i + 1) == '/') {
            out.append("*/"); i += 1; state = 'n'
          } else out.append(c)
      }
      i += 1
    }
    out.toString
  }

  override def parsePlan(sqlText: String): LogicalPlan = delegate.parsePlan(rewrite(sqlText))
  override def parsePlanWithParameters(sqlText: String, ctx: ParameterContext): LogicalPlan =
    delegate.parsePlanWithParameters(rewrite(sqlText), ctx)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(rewrite(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(rewrite(sqlText))
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
