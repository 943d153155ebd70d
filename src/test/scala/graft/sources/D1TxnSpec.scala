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

  test("COMMIT attempts every touched database and aggregates failures") {
    import graft.core.D1Client
    val cfgA = D1Client.Config(accountId = "acct", apiToken = "tok",
      databaseId = "db-aaa", apiBase = api)
    val cfgB = D1Client.Config(accountId = "acct", apiToken = "tok",
      databaseId = "db-bbb", apiBase = api)
    val posted = scala.collection.mutable.ArrayBuffer.empty[String]
    D1Txn.begin()
    try {
      D1Txn.buffer(cfgA, "INSERT 1")
      D1Txn.buffer(cfgB, "INSERT 2")
    } catch { case e: Throwable => D1Txn.rollback(); throw e }
    // first database's POST blows up; the second must STILL be attempted
    val e = intercept[java.io.IOException] {
      D1Txn.commitWith { (cfg, stmts) =>
        if (cfg.databaseId == "db-aaa") throw new java.io.IOException("boom")
        posted ++= stmts
        stmts.map(_ => D1Client.QueryResult(success = true, Nil, Nil,
          D1Client.Meta(), ""))
      }
    }
    assert(posted == Seq("INSERT 2"),
      "later databases must not be dropped unposted on an earlier failure")
    assert(e.getMessage.contains("db-aaa") && e.getMessage.contains("boom"))
    assert(!D1Txn.active)
  }

  test("executor-side d1_execute inside a transaction fails loudly (cluster guard)") {
    // the guard's decision table: only (in a task) AND (non-driver JVM)
    // AND (transaction flagged) raises — local mode (executorId
    // "driver") and driver-side calls always pass
    D1Txn.assertBufferReachable(inTask = false, executorId = "exec-3", txnFlagged = true)
    D1Txn.assertBufferReachable(inTask = true, executorId = "driver", txnFlagged = true)
    D1Txn.assertBufferReachable(inTask = true, executorId = "exec-3", txnFlagged = false)
    val e = intercept[IllegalStateException] {
      D1Txn.assertBufferReachable(inTask = true, executorId = "exec-3", txnFlagged = true)
    }
    assert(e.getMessage.contains("cannot buffer from a cluster executor"))
    // and the BEGIN/COMMIT commands maintain the propagated flag tasks
    // read — its value is the OWNING session's id, so a local-mode task
    // buffers into exactly the session that issued BEGIN
    spark.sql("BEGIN")
    try assert(spark.sparkContext.getLocalProperty(D1Txn.FlagKey) ==
      org.apache.spark.sql.GraftColumnShim.sessionUUID(spark))
    finally spark.sql("ROLLBACK")
    assert(spark.sparkContext.getLocalProperty(D1Txn.FlagKey) == null)
    // local-mode end-to-end: the task-side UDF still buffers (guard
    // passes because local tasks run in the driver JVM)
    Secrets.register(Secrets.Secret("__default_d1", "d1", "acct", "tok"))
    D1.registerExecuteUdf(spark, api)
    spark.sql("BEGIN")
    try {
      spark.range(2).selectExpr(
        s"d1_execute(concat('INSERT INTO kv_test (k, v) VALUES (''g', id, ''', ', id, ')'), '__default_d1', '$db')")
        .collect()
      assert(D1Txn.pending.size == 2)
    } finally spark.sql("ROLLBACK")
  }

  test("concurrent sessions keep separate transaction buffers") {
    // Two sessions on one driver must not interleave their buffers into
    // one batch (state is keyed by sessionUUID; the reference keys its
    // manager per ClientContext the same way)
    import graft.core.D1Client
    val cfg = D1Client.Config(accountId = "acct", apiToken = "tok",
      databaseId = "db-x", apiBase = api)
    val s2 = spark.newSession()
    val id1 = org.apache.spark.sql.GraftColumnShim.sessionUUID(spark)
    val id2 = org.apache.spark.sql.GraftColumnShim.sessionUUID(s2)
    assert(id1 != id2)
    spark.sql("BEGIN")
    s2.sql("BEGIN") // must NOT throw "within a transaction" — separate state
    try {
      D1Txn.buffer(id1, cfg, "INSERT A")
      D1Txn.buffer(id2, cfg, "INSERT B")
      assert(D1Txn.pending(id1) == Seq("INSERT A"))
      assert(D1Txn.pending(id2) == Seq("INSERT B"))
      // rolling one back leaves the other open and intact
      s2.sql("ROLLBACK")
      assert(!D1Txn.activeFor(id2) && D1Txn.activeFor(id1))
      assert(D1Txn.pending(id1) == Seq("INSERT A"))
    } finally if (D1Txn.activeFor(id1)) spark.sql("ROLLBACK")
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
