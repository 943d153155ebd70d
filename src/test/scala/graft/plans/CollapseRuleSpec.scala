package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The collapse rule is observable through the debug `cdx_url` column:
  * when the dedup keys are all collapse-covered, no network request is
  * made and the generated URL must carry `&collapse=` (the reference's
  * internet_archive_pushdown.test collapse cases).
  */
class CollapseRuleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.TestSpark.spark

  def wayback = spark.read.format("wayback").option("debug", "true").load()
    .filter(col("url") === "example.com")

  test("dropDuplicates(year) -> collapse=timestamp:4") {
    val df = wayback.select(col("year"), col("cdx_url"))
      .dropDuplicates("year")
    val url = df.select(col("cdx_url")).collect().head.getString(0)
    assert(url.contains("&collapse=timestamp:4"), url)
  }

  test("dropDuplicates(year, month) -> collapse=timestamp:6") {
    val df = wayback.select(col("year"), col("month"), col("cdx_url"))
      .dropDuplicates("year", "month")
    val url = df.select(col("cdx_url")).collect().head.getString(0)
    assert(url.contains("&collapse=timestamp:6"), url)
  }

  test("dropDuplicates(digest) -> collapse=digest") {
    val df = wayback.select(col("digest"), col("cdx_url")).dropDuplicates("digest")
    val url = df.select(col("cdx_url")).collect().head.getString(0)
    assert(url.contains("&collapse=digest"), url)
  }

  test("dropDuplicates(url) renames to collapse=original") {
    val df = wayback.select(col("url"), col("cdx_url")).dropDuplicates("url")
    val url = df.select(col("cdx_url")).collect().head.getString(0)
    assert(url.contains("&collapse=original"), url)
  }

  test("substring(urlkey,1,6) prefix collapse -> urlkey:6") {
    val df = wayback
      .select(substring(col("urlkey"), 1, 6).as("uk6"), col("cdx_url"))
      .dropDuplicates("uk6")
    val url = df.select(col("cdx_url")).collect().head.getString(0)
    assert(url.contains("&collapse=urlkey:6"), url)
  }

  test("groupBy(year).agg(first(...)) also collapses") {
    val df = wayback.select(col("year"), col("digest"), col("cdx_url"))
      .groupBy(col("year"))
      .agg(first(col("cdx_url")).as("cdx_url"))
    val url = df.select(col("cdx_url")).collect().head.getString(0)
    assert(url.contains("&collapse=timestamp:4"), url)
  }

  test("dropDuplicates(month) alone errors like the reference") {
    val e = intercept[Exception] {
      wayback.select(col("month"), col("cdx_url")).dropDuplicates("month")
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("DISTINCT ON(month) is not supported")), e.getMessage)
  }

  test("qc14 shape: projection above dedup + parquet write") {
    val df = wayback
      .select(col("year"), col("cdx_url"))
      .dropDuplicates("year")
      .select(col("year"), substring_index(col("cdx_url"), "?", -1).as("cdx_query"))
    df.coalesce(1).write.mode("overwrite").parquet("/tmp/qc14_test")
    val row = spark.read.parquet("/tmp/qc14_test").collect().head
    assert(row.getString(1).contains("&collapse=timestamp:4"), row.toString)
  }

  test("non-collapsible keys leave the plan untouched") {
    // dedup on statuscode+response: response is not collapsible; the rule
    // must not fire partially for response but statuscode still collapses
    val df = wayback.select(col("statuscode"), col("cdx_url"))
      .dropDuplicates("statuscode")
    val url = df.select(col("cdx_url")).collect().head.getString(0)
    assert(url.contains("&collapse=statuscode"), url)
  }
}
