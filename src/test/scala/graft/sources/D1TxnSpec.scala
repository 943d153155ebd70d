package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession

import graft.fixtures.Fixtures
import graft.core.Secrets
import graft.sources.d1.{D1, D1Txn}

import scala.jdk.CollectionConverters._

/** `BEGIN`/`COMMIT`/`ROLLBACK` SQL spellings driving the driver-side
  * transaction buffer (reference d1_transaction.cpp:24-58): nothing
  * posts until COMMIT, COMMIT posts ONE batch per touched database,
  * ROLLBACK drops, and the state-error wording is DuckDB's.
  */
class D1TxnSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = graft.TestSpark.spark
  lazy val stub = Fixtures.startAll()

  private val db = "11111111-2222-3333-4444-555555555555"
  private def api = s"${stub.base}/client/v4"

  override def afterAll(): Unit = {
    if (D1Txn.active) D1Txn.rollback()
    stub.stop()
  }

  private def writePosts: Seq[String] =
    stub.requests.asScala.toSeq.collect {
      case (path, body) if path.contains("/query") && body.contains("INSERT INTO kv_test") => body
    }

  test("BEGIN buffers d1_execute, COMMIT posts one batch") {
    Secrets.register(Secrets.Secret("__default_d1", "d1", "acct", "tok"))
    D1.execute("DELETE FROM kv_test", None, db, api)
    stub.requests.clear()

    spark.sql("BEGIN TRANSACTION")
    assert(D1.execute("INSERT INTO kv_test (k, v) VALUES ('t1', 1)", None, db, api) == 0L)
    assert(D1.execute("INSERT INTO kv_test (k, v) VALUES ('t2', 2)", None, db, api) == 0L)
    assert(D1Txn.pending.size == 2)
    assert(writePosts.isEmpty, "statements must not post before COMMIT")

    spark.sql("COMMIT")
    val posts = writePosts
    assert(posts.size == 1, s"expected ONE batch POST, saw ${posts.size}")
    assert(posts.head.trim.startsWith("[") &&
      posts.head.contains("'t1'") && posts.head.contains("'t2'"))
    assert(!D1Txn.active && D1Txn.pending.isEmpty)
  }

  test("ROLLBACK drops the buffer without posting") {
    Secrets.register(Secrets.Secret("__default_d1", "d1", "acct", "tok"))
    D1.execute("DELETE FROM kv_test", None, db, api)
    D1.execute("INSERT INTO kv_test (k, v) VALUES ('keep', 1)", None, db, api)
    stub.requests.clear()

    spark.sql("BEGIN")
    D1.execute("INSERT INTO kv_test (k, v) VALUES ('gone', 9)", None, db, api)
    spark.sql("ROLLBACK")

    assert(writePosts.isEmpty)
    val ks = spark.read.format("d1")
      .option("api_base", api)
      .option("account_id", "acct").option("api_token", "tok")
      .option("database_id", db).option("table", "kv_test")
      .load().collect().map(_.getString(0)).toSeq
    assert(ks == Seq("keep"))
  }

  test("DSv2 d1 writer defers its batch to COMMIT inside a transaction") {
    Secrets.register(Secrets.Secret("__default_d1", "d1", "acct", "tok"))
    D1.execute("DELETE FROM kv_test", None, db, api)
    stub.requests.clear()
    import spark.implicits._

    spark.sql("BEGIN TRANSACTION")
    Seq(("w1", 11L), ("w2", 12L)).toDF("k", "v")
      .write.format("d1")
      .option("api_base", api)
      .option("account_id", "acct").option("api_token", "tok")
      .option("database_id", db).option("table", "kv_test")
      .mode("append").save()
    assert(writePosts.isEmpty, "DSv2 write must not post before COMMIT")
    assert(D1Txn.pending.size == 2)

    spark.sql("COMMIT")
    assert(writePosts.size == 1)
    val ks = spark.read.format("d1")
      .option("api_base", api)
      .option("account_id", "acct").option("api_token", "tok")
      .option("database_id", db).option("table", "kv_test")
      .load().orderBy("k").collect().map(_.getString(0)).toSeq
    assert(ks == Seq("w1", "w2"))
  }

  test("transaction state errors carry DuckDB's wording") {
    assert(intercept[IllegalStateException](spark.sql("COMMIT"))
      .getMessage == "cannot commit - no transaction is active")
    assert(intercept[IllegalStateException](spark.sql("ROLLBACK"))
      .getMessage == "cannot rollback - no transaction is active")
    spark.sql("BEGIN")
    try {
      assert(intercept[IllegalStateException](spark.sql("BEGIN TRANSACTION"))
        .getMessage == "cannot start a transaction within a transaction")
    } finally spark.sql("ROLLBACK")
  }
}
