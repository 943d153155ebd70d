package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures
import graft.core.Secrets

class ConnectorSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.TestSpark.spark

  lazy val stub = Fixtures.startAll()

  override def afterAll(): Unit = { stub.stop() }

  // ---- wayback: golden cdx_url generation (tier-2 surface, no network)
  test("wayback debug cdx_url: url equality + limit") {
    val df = spark.read.format("wayback")
      .option("debug", "true")
      .load()
      .filter(col("url") === "example.com")
      .limit(5)
      .select(col("cdx_url"))
    val url = df.collect().map(_.getString(0)).head
    assert(url == "https://web.archive.org/cdx/search/cdx?url=example.com&output=csv&limit=5")
    // no network: the stub saw nothing
    assert(!stub.requests.toArray.exists(_.toString.contains("cdx/search")))
  }

  test("wayback debug cdx_url: statuscode + mimetype filters") {
    val df = spark.read.format("wayback").option("debug", "true").load()
      .filter(col("url") === "example.com" && col("statuscode") === 200 &&
        col("mimetype") =!= "text/html")
      .limit(10)
      .select(col("cdx_url"))
    val url = df.collect().head.getString(0)
    assert(url.contains("&filter=statuscode:200"))
    assert(url.contains("&filter=!mimetype:text/html"))
    assert(url.contains("&limit=10"))
  }

  test("wayback debug cdx_url: url prefix via LIKE 'x%' and IN pushdown") {
    val df = spark.read.format("wayback").option("debug", "true").load()
      .filter(col("url").like("example.com/%") && col("statuscode").isin(200, 301, 302))
      .limit(7)
      .select(col("cdx_url"))
    val url = df.collect().head.getString(0)
    assert(url.contains("url=example.com/*"))
    assert(url.contains("&filter=statuscode:(200|301|302)"))
  }

  test("wayback debug cdx_url: ORDER BY timestamp DESC -> fastLatest") {
    // the sort keeps `timestamp` in the scan, so this path does fetch
    // CDX records (as in the reference, whose fastLatest tests require
    // httpfs) — served by the stub here
    val df = spark.read.format("wayback").option("debug", "true")
      .option("cdx_endpoint", s"${stub.base}/cdx/search/cdx")
      .load()
      .filter(col("url") === "example.com")
      .orderBy(col("timestamp").desc)
      .limit(10)
      .select(col("cdx_url"))
    val url = df.collect().head.getString(0)
    assert(url.contains("&fastLatest=true&limit=-10"), url)
  }

  test("wayback debug cdx_url: year range and collapse option") {
    val df = spark.read.format("wayback").option("debug", "true")
      .option("collapse", "timestamp:8").load()
      .filter(col("url") === "example.com" && col("year") >= 2020 && col("year") < 2024)
      .limit(100)
      .select(col("cdx_url"))
    val url = df.collect().head.getString(0)
    assert(url.contains("&from=2020"))
    assert(url.contains("&to=2023"))
    assert(url.contains("&collapse=timestamp:8"))
  }

  test("wayback requires a url filter") {
    val e = intercept[Exception] {
      spark.read.format("wayback").load().select("urlkey").collect()
    }
    assert(e.getMessage.contains("requires a URL filter") ||
      Option(e.getCause).exists(_.getMessage.contains("requires a URL filter")))
  }

  // ---- wayback: end-to-end against the stub --------------------------
  test("wayback scan parses CSV, derives year/month, prunes fl") {
    val df = spark.read.format("wayback")
      .option("cdx_endpoint", s"${stub.base}/cdx/search/cdx")
      .option("url", "example.com")
      .load()
      .select(col("url"), col("statuscode"), col("year"), col("month"))
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows.map(_.getInt(2)).toSet == Set(2024, 2023))
    assert(rows.head.getString(0) == "https://example.com/")
    // fl pruning reached the remote request
    val cdxReq = stub.requests.toArray.map(_.toString).filter(_.contains("/cdx/search/cdx"))
    assert(cdxReq.exists(_.contains("fl=timestamp,original,statuscode")), cdxReq.mkString(";"))
  }

  test("wayback timestamp pushdown is trusted (no residual filter)") {
    val df = spark.read.format("wayback")
      .option("cdx_endpoint", s"${stub.base}/cdx/search/cdx")
      .option("url", "example.com")
      .load()
      .filter(col("timestamp") >= "2020-01-01 00:00:00")
      .select(col("url"))
    // all three fixture rows come back: the remote is trusted, Spark does
    // not re-filter (the 2023 row survives because the stub ignores from=)
    assert(df.count() == 3)
  }

  test("wayback response struct fetches archived page bodies") {
    val df = spark.read.format("wayback")
      .option("cdx_endpoint", s"${stub.base}/cdx/search/cdx")
      .option("page_endpoint", s"${stub.base}/web")
      .option("url", "example.com")
      .load()
      .select(col("url"), col("response.body").as("body"), col("response.error").as("err"))
    val rows = df.collect()
    assert(rows.length == 3)
    val err = if (rows.head.isNullAt(2)) "" else rows.head.getString(2)
    assert(new String(rows.head.getAs[Array[Byte]]("body")) == "<html>archived page</html>",
      s"error field: '$err'")
    assert(rows.head.isNullAt(2))
  }

  // ---- common crawl ---------------------------------------------------
  test("commoncrawl scan end-to-end with warc structs") {
    val df = spark.read.format("commoncrawl")
      .option("index_endpoint", stub.base)
      .option("data_endpoint", stub.base)
      .option("crawl", "CC-MAIN-2024-46")
      .option("url_like", "%.example.com/%")
      .load()
      .select(col("url"), col("crawl_id"), col("warc.version").as("wv"),
        col("response.body").as("body"),
        element_at(col("response.headers"), "Content-Type").as("ct"))
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows.head.getString(1) == "CC-MAIN-2024-46")
    assert(rows.head.getString(2) == "1.0")
    assert(new String(rows.head.getAs[Array[Byte]]("body")) == "<html>hello graft</html>")
    assert(rows.head.getString(4) == "text/html")
    // URL pattern conversion %→* reached the request
    assert(stub.requests.toArray.map(_.toString)
      .exists(_.contains("url=*.example.com/*")))
  }

  test("commoncrawl filter pushdown: status/mime/crawl_id IN fan-out") {
    stub.requests.clear()
    val df = spark.read.format("commoncrawl")
      .option("index_endpoint", stub.base)
      .option("data_endpoint", stub.base)
      .option("url_like", "example.com/%")
      .load()
      .filter(col("crawl_id").isin("CC-MAIN-2024-46", "CC-MAIN-2024-42") &&
        col("statuscode") === 200 && col("mimetype") === "text/html")
      .select(col("url"))
    assert(df.rdd.getNumPartitions == 2) // one partition per crawl
    df.collect()
    val reqs = stub.requests.toArray.map(_.toString).filter(_.contains("-index?"))
    assert(reqs.length == 2)
    assert(reqs.forall(_.contains("filter==status:200")))
    assert(reqs.forall(_.contains("filter==mime:text/html")))
  }

  private def scanPartitions(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.sparkPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputRDD.getNumPartitions
    }.get

  test("commoncrawl partitions=N shards one crawl into pywb page ranges") {
    stub.requests.clear()
    val df = spark.read.format("commoncrawl")
      .option("index_endpoint", stub.base)
      .option("data_endpoint", stub.base)
      .option("crawl", "CC-MAIN-2024-46")
      .option("url_like", "example.com/%")
      .option("partitions", "3")
      .load()
      .limit(8)
      .select(col("url"))
    // probe says 4 pages → 3 shards over page ranges [0,1) [1,2) [2,4)
    assert(scanPartitions(df) == 3)
    val rows = df.collect()
    // partially-pushed limit: the global re-trim still caps the result
    assert(rows.length == 8)
    val reqs = stub.requests.toArray.map(_.toString).filter(_.contains("-index?"))
    assert(reqs.exists(_.contains("showNumPages=true")), reqs.mkString(";"))
    val pageReqs = reqs.filterNot(_.contains("showNumPages"))
    // each shard fetches its pages 0-based; every page request keeps the
    // full per-crawl limit (row distribution across pages is unknown)
    assert(pageReqs.forall(_.contains("limit=8")), pageReqs.mkString(";"))
    val pages = pageReqs.flatMap(r => "page=(\\d+)".r.findFirstMatchIn(r).map(_.group(1).toInt))
    assert(pages.toSet == Set(0, 1, 2, 3), pageReqs.mkString(";"))
  }

  test("commoncrawl partitions clamp to the probed page count") {
    val df = spark.read.format("commoncrawl")
      .option("index_endpoint", stub.base)
      .option("data_endpoint", stub.base)
      .option("crawl", "CC-MAIN-2024-46")
      .option("url_like", "example.com/%")
      .option("partitions", "9")
      .load()
      .limit(2)
      .select(col("url"))
    // only 4 pages exist → 4 shards, and the global limit still trims to 2
    assert(scanPartitions(df) == 4)
    assert(df.collect().length == 2)
  }

  test("commoncrawl falls back to one partition when the page probe fails") {
    val df = spark.read.format("commoncrawl")
      .option("index_endpoint", stub.base)
      .option("data_endpoint", stub.base)
      .option("crawl", "CC-NOPAGES-2019-04")
      .option("url_like", "example.com/%")
      .option("partitions", "3")
      .load()
      .limit(8)
      .select(col("url"))
    // no page-count answer → sharding declined, never duplicate rows
    assert(scanPartitions(df) == 1)
  }

  test("commoncrawl timestamp filter resolves crawls via collinfo and is re-applied") {
    stub.requests.clear()
    val df = spark.read.format("commoncrawl")
      .option("index_endpoint", stub.base)
      .option("data_endpoint", stub.base)
      .option("collinfo_endpoint", s"${stub.base}/collinfo.json")
      .option("url_like", "example.com/%")
      .load()
      .filter(col("timestamp") >= "2024-10-05 00:00:00" && col("timestamp") < "2024-11-02 00:00:00")
      .select(col("url"), col("timestamp"))
    // collinfo: both crawls overlap [oct5, nov2)
    assert(df.rdd.getNumPartitions == 2)
    // fixture rows are from 2024-01, outside the range → Spark re-filters
    // (CC keeps ts filters, unlike wayback)
    assert(df.count() == 0)
    val reqs = stub.requests.toArray.map(_.toString).filter(_.contains("-index?"))
    assert(reqs.forall(r => r.contains("&from=202410") && r.contains("&to=202411")))
  }

  // ---- d1 -------------------------------------------------------------
  def d1Reader = spark.read.format("d1")
    .option("api_base", s"${stub.base}/client/v4")
    .option("account_id", "acct").option("api_token", "tok")
    .option("database_id", "11111111-2222-3333-4444-555555555555")

  test("d1 scan: affinity schema + value conversion + NULLs") {
    val df = d1Reader.option("table", "users").load()
    assert(df.schema.simpleString ==
      "struct<id:bigint,name:string,active:boolean,balance:double>")
    val rows = df.orderBy("id").collect()
    assert(rows.length == 4)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "alice" &&
      rows(0).getBoolean(2) && rows(0).getDouble(3) == 10.5)
    // row 4 has JSON nulls -> "" -> SQL NULL
    assert(rows(3).isNullAt(1) && rows(3).isNullAt(2) && rows(3).isNullAt(3))
    // JSON false -> "0" -> boolean false
    assert(!rows(1).getBoolean(2))
  }

  test("d1 scan: filter + limit pushdown build remote SQL") {
    stub.requests.clear()
    val df = d1Reader.option("table", "users").load()
      .filter(col("active") === true)
      .limit(1)
    val rows = df.collect()
    assert(rows.length == 1)
    val sqls = stub.requests.toArray.map(_.toString).filter(_.contains("SELECT * FROM users"))
    assert(sqls.exists(s => s.contains("WHERE") && s.contains("active = 1") && s.contains("LIMIT 1")),
      sqls.mkString(";"))
  }

  test("d1 query passthrough: all-varchar schema in first-row order") {
    val df = spark.read.format("d1query")
      .option("api_base", s"${stub.base}/client/v4")
      .option("account_id", "acct").option("api_token", "tok")
      .option("database_id", "11111111-2222-3333-4444-555555555555")
      .option("query", "SELECT * FROM orders JOIN users ON user_id = id")
      .load()
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.schema.fieldNames.toSeq == Seq("id", "user_id", "status", "total"))
    assert(df.count() == 2)
  }

  test("d1 catalog: list + load + query through catalog") {
    Secrets.register(Secrets.Secret("cat_test", "d1", "acct", "tok"))
    spark.conf.set("spark.sql.catalog.mydb", "graft.sources.d1.D1Catalog")
    spark.conf.set("spark.sql.catalog.mydb.secret", "cat_test")
    spark.conf.set("spark.sql.catalog.mydb.database_id", "11111111-2222-3333-4444-555555555555")
    spark.conf.set("spark.sql.catalog.mydb.api_base", s"${stub.base}/client/v4")
    val tables = spark.sql("SHOW TABLES IN mydb.main").collect().map(_.getString(1)).toSet
    assert(tables == Set("users", "orders")) // internal tables filtered
    val n = spark.sql("SELECT count(*) AS n FROM mydb.main.users WHERE active = true").collect()
    assert(n.head.getLong(0) == 2L)
  }

  test("d1 metadata + execute + batch session") {
    Secrets.register(Secrets.Secret("d1", "d1", "acct", "tok"))
    val dbs = graft.sources.d1.D1.databases(spark, apiBase = s"${stub.base}/client/v4")
    assert(dbs.collect().map(_.getString(1)).toSet == Set("my-database", "other-db"))
    val tbls = graft.sources.d1.D1.tables(spark,
      "11111111-2222-3333-4444-555555555555", apiBase = s"${stub.base}/client/v4")
    assert(tbls.collect().map(_.getString(1)).toSet == Set("users", "orders"))
    val changes = graft.sources.d1.D1.execute("UPDATE users SET active = 1",
      None, "11111111-2222-3333-4444-555555555555", apiBase = s"${stub.base}/client/v4")
    assert(changes == 1L)
    // batch session: writes buffer, commit posts ONE batch
    stub.requests.clear()
    val sess = graft.sources.d1.D1.batchSession(None,
      "11111111-2222-3333-4444-555555555555", apiBase = s"${stub.base}/client/v4")
    sess.begin()
    sess.execute("INSERT INTO logs VALUES (1, 'a')")
    sess.execute("INSERT INTO logs VALUES (2, 'b')")
    assert(sess.pendingStatements.size == 2)
    assert(stub.requests.toArray.count(_.toString.contains("/query")) == 0)
    sess.commit()
    val batchReqs = stub.requests.toArray.map(_.toString).filter(_.contains("INSERT INTO logs"))
    assert(batchReqs.length == 1) // one HTTP round trip for both statements
  }

  test("d1 write path: df.write.format(d1) batches inserts") {
    stub.requests.clear()
    import spark.implicits._
    Seq((100L, "dave", true, 1.0), (101L, "erin", false, 2.0))
      .toDF("id", "name", "active", "balance")
      .write.format("d1")
      .option("api_base", s"${stub.base}/client/v4")
      .option("account_id", "acct").option("api_token", "tok")
      .option("database_id", "11111111-2222-3333-4444-555555555555")
      .option("table", "users")
      .mode("append").save()
    import scala.jdk.CollectionConverters._
    val batches = stub.requests.asScala.map(_._2).filter(_.contains("INSERT INTO users"))
    assert(batches.nonEmpty)
    assert(batches.exists(_.contains("'dave'")))
  }

  // ---- r2 -------------------------------------------------------------
  test("r2 sql passthrough surfaces") {
    Secrets.register(Secrets.Secret("r2", "r2_sql", "acct", "tok"))
    val df = graft.sources.r2.R2.sqlQuery(spark, "r2", "my-bucket",
      "SELECT * FROM orders", apiBase = stub.base)
    assert(df.columns.toSeq == Seq("response"))
    assert(df.collect().head.getString(0).contains("\"results\""))
    val viaFormat = spark.read.format("r2sql")
      .option("secret", "r2").option("bucket", "b")
      .option("function", "databases").option("api_base", stub.base)
      .load()
    assert(viaFormat.columns.toSeq == Seq("namespace"))
    assert(viaFormat.count() == 1)
  }
}
