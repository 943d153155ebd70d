package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The reference-user migration surface: registered names + SQL queries
  * shaped like the reference's test corpus, plus unknown-parameter
  * binder-error parity.
  */
class GraftSurfaceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.spark

  test("registerAll exposes the reference's table names to SQL") {
    Graft.registerAll(spark)
    val cols = spark.sql("SELECT * FROM common_crawl_index LIMIT 0").schema.fieldNames
    assert(cols.contains("warc") && cols.contains("crawl_id"))
    val u = spark.sql(
      """SELECT cdx_url FROM wayback_machine_debug
        |WHERE url = 'example.com' AND statuscode = 200 LIMIT 5""".stripMargin)
      .collect().head.getString(0)
    assert(u == "https://web.archive.org/cdx/search/cdx?url=example.com&output=csv" +
      "&limit=5&filter=statuscode:200")
    assert(spark.sql("SELECT rolling_hash('abc') AS h").head().getLong(0) != 0L)
  }

  test("createSecret: CREATE SECRET parity — validation wording, SQL UDF, redaction") {
    Graft.registerAll(spark)
    // SQL surface
    spark.sql("SELECT graft_create_secret('sqlsec', 'd1', " +
      "map('account_id', 'acct-1', 'api_token', 'tok-1')) AS ok").collect()
    val sec = graft.core.Secrets.lookup("d1", "sqlsec").get
    assert(sec.accountId == "acct-1")
    assert(!sec.toString.contains("tok-1"), "token must be redacted in rendering")
    // reference error wording (d1_secret.cpp:26-38)
    val e1 = intercept[IllegalArgumentException] {
      Graft.createSecret("x", "d1", Map("account_id" -> "a", "bogus" -> "b"))
    }
    assert(e1.getMessage.contains("Unknown parameter for D1 secret: 'bogus'. Expected: account_id, api_token"))
    val e2 = intercept[IllegalArgumentException] {
      Graft.createSecret("x", "d1", Map("api_token" -> "t"))
    }
    assert(e2.getMessage.contains("D1 secret requires 'account_id' parameter"))
    val e3 = intercept[IllegalArgumentException] {
      Graft.createSecret("x", "r2_sql", Map("account_id" -> "a"))
    }
    assert(e3.getMessage.contains("R2 SQL secret requires 'api_token' parameter"))
    intercept[IllegalArgumentException] {
      Graft.createSecret("x", "nope", Map.empty)
    }
    // drop via SQL
    spark.sql("SELECT graft_drop_secret('sqlsec', 'd1')").collect()
    assert(graft.core.Secrets.lookup("d1", "sqlsec").isEmpty)
  }

  test("unknown option errors like the reference's Invalid named parameter") {
    val e = intercept[Exception] {
      spark.read.format("wayback").option("unknown_param", "10").load()
    }
    assert(e.getMessage.contains("Invalid named parameter 'unknown_param' for wayback_machine"),
      e.getMessage)
    val e2 = intercept[Exception] {
      spark.read.format("commoncrawl").option("unknown_param", "10").load()
    }
    assert(e2.getMessage.contains("Invalid named parameter 'unknown_param' for common_crawl_index"))
  }
}
