package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Tier-1 parity: schema/metadata assertions ported from the reference's
  * DESCRIBE-based tests (test/sql/common_crawl_basic.test:19-74,
  * internet_archive_basic.test:12-63) and error-message checks
  * (common_crawl_errors.test:7-34).
  */
class SchemaParitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.spark

  test("common_crawl_index column list (no debug)") {
    val cols = spark.read.format("commoncrawl").load().schema.fieldNames.sorted.toSeq
    assert(cols == Seq("crawl_id", "digest", "filename", "length", "mimetype",
      "offset", "response", "statuscode", "timestamp", "url", "warc"))
  }

  test("common_crawl_index adds cdx_url when debug") {
    val cols = spark.read.format("commoncrawl").option("debug", "true")
      .load().schema.fieldNames.sorted.toSeq
    assert(cols.contains("cdx_url") && cols.length == 12)
  }

  test("common_crawl_index scalar column types match affinity table") {
    val s = spark.read.format("commoncrawl").load().schema
    assert(s("url").dataType.typeName == "string")
    assert(s("statuscode").dataType.typeName == "integer")
    assert(s("offset").dataType.typeName == "long")
    assert(s("length").dataType.typeName == "long")
    assert(s("crawl_id").dataType.typeName == "string")
    assert(s("timestamp").dataType.typeName == "timestamp")
  }

  test("common_crawl_index struct column types") {
    val s = spark.read.format("commoncrawl").load().schema
    assert(s("warc").dataType.simpleString ==
      "struct<version:string,headers:map<string,string>>")
    assert(s("response").dataType.simpleString ==
      "struct<body:binary,headers:map<string,string>,http_version:string,error:string>")
  }

  test("wayback_machine column list and types") {
    val s = spark.read.format("wayback").load().schema
    assert(s.fieldNames.toSeq == Seq("url", "timestamp", "urlkey", "mimetype",
      "statuscode", "digest", "length", "response", "year", "month"))
    assert(s("response").dataType.simpleString == "struct<body:binary,error:string>")
    assert(s("year").dataType.typeName == "integer")
    assert(s("month").dataType.typeName == "integer")
    val sd = spark.read.format("wayback").option("debug", "true").load().schema
    assert(sd.fieldNames.last == "cdx_url")
  }

  test("error: wayback requires a URL filter (reference message)") {
    val e = intercept[Exception] {
      spark.read.format("wayback").load().select("urlkey").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("wayback_machine() requires a URL filter")))
  }

  test("error: common_crawl requires a URL filter (reference message)") {
    val e = intercept[Exception] {
      spark.read.format("commoncrawl").option("crawl", "CC-MAIN-2024-46")
        .load().select("url").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("common_crawl_index() requires a URL filter")))
  }

  test("LIMIT 0 returns zero rows without network") {
    val n = spark.read.format("wayback").option("url", "example.com")
      .load().limit(0).count()
    assert(n == 0)
  }

  test("non-existent MAP key access returns NULL (schema-level)") {
    import org.apache.spark.sql.functions._
    // LIMIT 0 shape: analyzes the nested access without any fetch
    val df = spark.read.format("commoncrawl").option("crawl", "CC-MAIN-2024-46")
      .option("url", "example.com/*").load()
      .select(element_at(col("response.headers"), "NonExistentHeader"))
      .limit(0)
    assert(df.count() == 0)
  }

  test("d1_databases / d1_tables schemas match reference columns") {
    assert(graft.sources.d1.D1.databasesSchema.fieldNames.toSeq ==
      Seq("uuid", "name", "created_at", "version", "file_size", "num_tables", "region"))
    assert(graft.sources.d1.D1.tablesSchema.fieldNames.toSeq ==
      Seq("schema", "name", "type", "ncol", "writable", "strict"))
  }
}
