package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Golden URL cases ported from the reference's
  * test/sql/internet_archive_pushdown.test — generic LIKE / NOT LIKE /
  * regex pushdown that only the CdxFilterRule can translate.
  */
class CdxFilterRuleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.spark

  def waybackUrl(df: org.apache.spark.sql.DataFrame): String =
    df.select(col("cdx_url")).collect().head.getString(0)

  def wb = spark.read.format("wayback").option("debug", "true").load()

  test("url NOT LIKE multi-%% -> filter=!original:<regex>") {
    // reference: WHERE url LIKE 'example.com/%' AND url NOT LIKE 'example.com/%/%'
    val u = waybackUrl(wb
      .filter(col("url").like("example.com/%") && !col("url").like("example.com/%/%"))
      .limit(1).select(col("cdx_url")))
    assert(u.contains("url=example.com/*"), u)
    assert(u.contains("filter=!original:^example%5C.com/.*/.*"), u)
  }

  test("url NOT LIKE '%test%' -> !original:.*test.* (contains shape)") {
    val u = waybackUrl(wb
      .filter(col("url") === "example.com/*" && !col("url").like("%test%"))
      .limit(1).select(col("cdx_url")))
    assert(u.contains("filter=!original:.*test.*"), u)
  }

  test("urlkey LIKE '%apply' -> urlkey:.*apply$ (suffix via v1)") {
    val u = waybackUrl(wb
      .filter(col("url") === "example.com/*" && col("urlkey").like("%apply"))
      .limit(1).select(col("cdx_url")))
    assert(u.contains("filter=urlkey:.*apply$"), u)
  }

  test("urlkey NOT LIKE with parenthesis passes ) unescaped") {
    // reference: urlkey NOT LIKE 'com,example)/%/%' ->
    // filter=!urlkey:^com,example)/.*/.*
    val u = waybackUrl(wb
      .filter(col("url").like("example.com/%") &&
        !col("urlkey").like("com,example)/%/%"))
      .limit(1).select(col("cdx_url")))
    assert(u.contains("filter=!urlkey:^com,example)/.*/.*"), u)
  }

  test("urlkey rlike / NOT rlike") {
    val u1 = waybackUrl(wb
      .filter(col("url") === "example.com/*" && col("urlkey").rlike(".*test.*"))
      .limit(1).select(col("cdx_url")))
    assert(u1.contains("filter=urlkey:.*test.*"), u1)
    val u2 = waybackUrl(wb
      .filter(col("url") === "example.com/*" && !col("urlkey").rlike(".*spam.*"))
      .limit(1).select(col("cdx_url")))
    assert(u2.contains("filter=!urlkey:.*spam.*"), u2)
  }

  test("wayback url generic LIKE with inner %% becomes url= pattern") {
    val u = waybackUrl(wb
      .filter(col("url").like("example.com/%/about"))
      .limit(1).select(col("cdx_url")))
    assert(u.contains("url=example.com/*/about"), u)
  }

  test("offset pushdown appears in URL") {
    val u = waybackUrl(wb
      .filter(col("url") === "example.com")
      .offset(50).limit(10)
      .select(col("cdx_url")))
    assert(u.contains("&limit=10"), u)
    assert(u.contains("&offset=50"), u)
  }

  test("commoncrawl url NOT LIKE -> !~url: regex") {
    val df = spark.read.format("commoncrawl").option("debug", "true")
      .option("crawl", "CC-MAIN-2024-46")
      .load()
      .filter(col("url").like("example.com/%") && !col("url").like("%admin%"))
      .limit(1).select(col("cdx_url"))
    val u = df.collect().head.getString(0)
    assert(u.contains("url=example.com/*"), u)
    assert(u.contains("filter=!~url:^.*admin.*$"), u)
  }

  test("commoncrawl mimetype LIKE 'text/%' -> ~mime:^text/.* (prefix shape)") {
    // LIKE 'x%' simplifies to a prefix before pushdown — DuckDB does the
    // same (prefix() handler, no trailing $): ~mime:^text/.*
    val df = spark.read.format("commoncrawl").option("debug", "true")
      .option("crawl", "CC-MAIN-2024-46")
      .load()
      .filter(col("url").like("example.com/%") && col("mimetype").like("text/%"))
      .limit(1).select(col("cdx_url"))
    val u = df.collect().head.getString(0)
    assert(u.contains("filter=~mime:^text/.*"), u)
  }

  test("pattern containing ';' is refused (stays a residual filter)") {
    // extra_filters is a ';'-joined list; a regex like '[;,]x' cannot be
    // represented and must stay in the plan instead of being split into
    // garbage CDX filters after deletion.
    import org.apache.spark.sql.catalyst.expressions.RLike
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
    val df = wb
      .filter(col("url") === "example.com/*" && col("urlkey").rlike("[;,]x"))
      .select(col("cdx_url"))
    val analyzed = df.queryExecution.analyzed
    val rels = analyzed.collect { case r: DataSourceV2Relation => r }
    assert(rels.nonEmpty)
    assert(rels.forall(r => !r.options.containsKey("extra_filters")),
      rels.map(_.options).mkString)
    val residualRlikes = analyzed.collect {
      case f: Filter => f.condition.collect { case r: RLike => r }
    }.flatten
    assert(residualRlikes.nonEmpty, analyzed.treeString)
  }

  test("commoncrawl mimetype generic LIKE with inner %% -> ~mime regex with anchors") {
    val df = spark.read.format("commoncrawl").option("debug", "true")
      .option("crawl", "CC-MAIN-2024-46")
      .load()
      .filter(col("url").like("example.com/%") && col("mimetype").like("text/%ml"))
      .limit(1).select(col("cdx_url"))
    val u = df.collect().head.getString(0)
    assert(u.contains("filter=~mime:^text/.*ml$"), u)
  }

  // ---- statuscode LIKE arrives wrapped in Cast(int -> string): neither
  // the v1 path nor LikeSimplification can see through it; the rule
  // consumes every pattern shape here (simple prefixes included).

  test("wayback statuscode LIKE '4%' through Cast -> filter=statuscode:^4.*") {
    val u = waybackUrl(wb
      .filter(col("url") === "example.com/*" && col("statuscode").like("4%"))
      .limit(1).select(col("cdx_url")))
    assert(u.contains("filter=statuscode:^4.*"), u)
  }

  test("wayback statuscode NOT LIKE '3%' through Cast -> filter=!statuscode:^3.*") {
    val u = waybackUrl(wb
      .filter(col("url") === "example.com/*" && !col("statuscode").like("3%"))
      .limit(1).select(col("cdx_url")))
    assert(u.contains("filter=!statuscode:^3.*"), u)
  }

  test("wayback statuscode RLIKE through Cast -> filter=statuscode:<regex>") {
    val u = waybackUrl(wb
      .filter(col("url") === "example.com/*" && col("statuscode").rlike("30[12]"))
      .limit(1).select(col("cdx_url")))
    assert(u.contains("filter=statuscode:30[12]"), u)
  }

  test("commoncrawl statuscode LIKE '2%' through Cast -> ~status:^2.*$") {
    val df = spark.read.format("commoncrawl").option("debug", "true")
      .option("crawl", "CC-MAIN-2024-46")
      .load()
      .filter(col("url").like("example.com/%") && col("statuscode").like("2%"))
      .limit(1).select(col("cdx_url"))
    val u = df.collect().head.getString(0)
    assert(u.contains("filter=~status:^2.*$"), u)
  }

  test("commoncrawl statuscode NOT LIKE through Cast -> !~status regex") {
    val df = spark.read.format("commoncrawl").option("debug", "true")
      .option("crawl", "CC-MAIN-2024-46")
      .load()
      .filter(col("url").like("example.com/%") && !col("statuscode").like("5%"))
      .limit(1).select(col("cdx_url"))
    val u = df.collect().head.getString(0)
    assert(u.contains("filter=!~status:^5.*$"), u)
  }

  test("commoncrawl mimetype LIKE '%html' (suffix) -> ~mime:.*html$ via v1") {
    val df = spark.read.format("commoncrawl").option("debug", "true")
      .option("crawl", "CC-MAIN-2024-46")
      .load()
      .filter(col("url").like("example.com/%") && col("mimetype").like("%html"))
      .limit(1).select(col("cdx_url"))
    val u = df.collect().head.getString(0)
    assert(u.contains("filter=~mime:.*html$"), u)
  }

  test("commoncrawl mimetype LIKE '%xml%' (contains) -> ~mime:.*xml.* via v1") {
    val df = spark.read.format("commoncrawl").option("debug", "true")
      .option("crawl", "CC-MAIN-2024-46")
      .load()
      .filter(col("url").like("example.com/%") && col("mimetype").like("%xml%"))
      .limit(1).select(col("cdx_url"))
    val u = df.collect().head.getString(0)
    assert(u.contains("filter=~mime:.*xml.*"), u)
  }
}
