package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The reference-user migration surface: registered names + SQL queries
  * shaped like the reference's test corpus, plus unknown-parameter
  * binder-error parity.
  */
class GraftSurfaceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.spark

  test("gate inventory: 139 queries, every one oracled, names well-formed") {
    val qs = SparkEntry.queries
    assert(qs.size == 139, s"gate count drifted: ${qs.size}")
    // every gate carries a DuckDB oracle — a dropped oracle silently
    // downgrades the driver's check to rows-only; fail loudly instead
    assert(SparkEntry.oracleSql.keySet == qs.keySet,
      s"unoracled gates: ${(qs.keySet -- SparkEntry.oracleSql.keySet).toSeq.sorted}")
    assert(qs.keySet.forall(_.matches("q[cs]?\\d+_[a-z0-9_]+")))
  }

  test("tuneForTinyInput flips the thin-session confs below the cutoff and leaves big sessions alone") {
    val s = spark.newSession()
    assert(!Graft.tuneForTinyInput(s, 1L << 30), "1 GB input tuned thin")
    assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(Graft.tuneForTinyInput(s, 24L << 20))
    assert(s.conf.get("spark.sql.adaptive.enabled") == "false")
    assert(s.conf.get("spark.sql.shuffle.partitions") == "8")
    // Bench's file-size heuristic agrees with the cutoff on real dirs
    assert(Bench.thinInput("/root/testdata/sf0.1"))
  }

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
    // curation/analysis functions have SQL spellings built from the same
    // composite expressions as the Scala API (codegen'd builtins, no UDF)
    assert(spark.sql("SELECT pii_redact('mail a@b.co from 10.1.2.3') AS r")
      .head().getString(0) == "mail <EMAIL> from <IP>")
    assert(spark.sql("SELECT pii_counts('a@b.co c@d.org').n_emails AS n")
      .head().getInt(0) == 2)
    assert(spark.sql("SELECT doc_fingerprint('a  b') = doc_fingerprint('A B') AS eq")
      .head().getBoolean(0))
    assert(spark.sql("SELECT lang_id('the cat and the hat') AS l")
      .head().getString(0) == "en")
    assert(spark.sql("SELECT quality_score('the quick fox').n_words AS w")
      .head().getInt(0) == 3)
    assert(spark.sql("SELECT word_windows('a b c d e', 2) AS w")
      .head().getSeq[String](0) == Seq("a b", "c d", "e"))
    assert(spark.sql("SELECT word_windows('x|y|z', 2, '|') AS w")
      .head().getSeq[String](0) == Seq("x|y", "z"))
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

  test("CREATE SECRET / DROP SECRET statements — the literal spelling the error hints advertise") {
    import graft.core.Secrets
    // the exact statement shape the engine's own errors print:
    //   "Create it with: CREATE SECRET n (TYPE d1, ...)"
    spark.sql("CREATE SECRET stmtsec (TYPE d1, ACCOUNT_ID 'acct-9', API_TOKEN 'tok-9')")
    val sec = Secrets.lookup("d1", "stmtsec").get
    assert(sec.accountId == "acct-9" && sec.apiToken == "tok-9")
    // duplicate without OR REPLACE errors; IF NOT EXISTS and OR REPLACE don't
    val dup = intercept[Exception] {
      spark.sql("CREATE SECRET stmtsec (TYPE d1, ACCOUNT_ID 'x', API_TOKEN 'y')")
    }
    assert(dup.getMessage.contains("already exists"), dup.getMessage)
    spark.sql("CREATE SECRET IF NOT EXISTS stmtsec (TYPE d1, ACCOUNT_ID 'x', API_TOKEN 'y')")
    assert(Secrets.lookup("d1", "stmtsec").get.accountId == "acct-9")
    spark.sql("CREATE OR REPLACE SECRET stmtsec (TYPE d1, ACCOUNT_ID 'acct-10', API_TOKEN 'tok-10')")
    assert(Secrets.lookup("d1", "stmtsec").get.accountId == "acct-10")
    // unnamed secret registers the default name the D1 ATTACH probe order
    // already looks up (the ATTACH error hint's own spelling)
    spark.sql("CREATE OR REPLACE SECRET (TYPE d1, ACCOUNT_ID 'defacct', API_TOKEN 'deftok')")
    assert(Secrets.lookup("d1", "__default_d1").get.accountId == "defacct")
    // the reference's parameter validation wording surfaces through SQL
    val e1 = intercept[Exception] {
      spark.sql("CREATE SECRET badsec (TYPE d1, ACCOUNT_ID 'a', BOGUS 'b', API_TOKEN 't')")
    }
    assert(e1.getMessage.contains(
      "Unknown parameter for D1 secret: 'bogus'. Expected: account_id, api_token"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("CREATE SECRET badsec (TYPE r2_sql, ACCOUNT_ID 'a')")
    }
    assert(e2.getMessage.contains("R2 SQL secret requires 'api_token' parameter"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql("CREATE SECRET badsec (TYPE nope, ACCOUNT_ID 'a')")
    }
    assert(e3.getMessage.contains("secret types are: d1, r2_sql"), e3.getMessage)
    // r2_sql secrets flow through the same statement
    spark.sql("CREATE OR REPLACE SECRET stmtr2 (TYPE r2_sql, ACCOUNT_ID 'ra', API_TOKEN 'rt')")
    assert(Secrets.lookup("r2_sql", "stmtr2").isDefined)
    // quoted values may contain commas and doubled-quote escapes — the
    // option list must split on commas OUTSIDE string literals only
    // (DuckDB accepts arbitrary string literals here)
    spark.sql("CREATE OR REPLACE SECRET commasec (TYPE d1, ACCOUNT_ID 'a,cct', API_TOKEN 'to,k''en')")
    val csec = Secrets.lookup("d1", "commasec").get
    assert(csec.accountId == "a,cct" && csec.apiToken == "to,k'en", csec.toString)
    spark.sql("DROP SECRET commasec")
    // DROP SECRET, its not-found error, and IF EXISTS
    spark.sql("DROP SECRET stmtsec")
    assert(Secrets.lookup("d1", "stmtsec").isEmpty)
    val e4 = intercept[Exception] { spark.sql("DROP SECRET stmtsec") }
    assert(e4.getMessage.contains("non-existent secret"), e4.getMessage)
    spark.sql("DROP SECRET IF EXISTS stmtsec") // no-op, no error
    spark.sql("DROP SECRET stmtr2")
    spark.sql("DROP SECRET __default_d1")
  }

  test("named-arg TVF SQL: := spelling, option override, pushdown through the TVF") {
    val stub = graft.queries.Connectors.stub
    Graft.registerAll(spark,
      waybackOptions = Map("cdx_endpoint" -> s"${stub.base}/cdx/search/cdx"),
      commonCrawlOptions = Map(
        "index_endpoint" -> stub.base, "data_endpoint" -> stub.base,
        "collinfo_endpoint" -> s"${stub.base}/collinfo.json"))
    // := is the reference spelling; => (Spark-native) must work too
    val viaAssign = spark.sql(
      """SELECT cdx_url FROM common_crawl_index(max_results := 7, debug := true)
        |WHERE url LIKE 'example.com/%' AND crawl_id = 'CC-MAIN-2024-46'""".stripMargin)
      .collect().head.getString(0)
    assert(viaAssign.contains("limit=7"), viaAssign)
    val viaArrow = spark.sql(
      """SELECT cdx_url FROM common_crawl_index(max_results => 7, debug => true)
        |WHERE url LIKE 'example.com/%' AND crawl_id = 'CC-MAIN-2024-46'""".stripMargin)
      .collect().head.getString(0)
    assert(viaArrow == viaAssign)
    // wayback TVF: collapse is a VARCHAR parameter; WHERE pushdown composes
    val wb = spark.sql(
      """SELECT cdx_url FROM wayback_machine(max_results := 9, debug := true,
        |  collapse := 'timestamp:8')
        |WHERE url = 'example.com'""".stripMargin).collect().head.getString(0)
    assert(wb.contains("limit=9") && wb.contains("collapse=timestamp:8"), wb)
    // := inside a string literal must NOT be rewritten
    val lit = spark.sql("SELECT ':= stays' AS s").collect().head.getString(0)
    assert(lit == ":= stays")
    // a LIMIT overrides max_results via pushdown, as the reference documents
    val lim = spark.sql(
      """SELECT cdx_url FROM common_crawl_index(max_results := 100, debug := true)
        |WHERE url LIKE 'example.com/%' AND crawl_id = 'CC-MAIN-2024-46' LIMIT 3""".stripMargin)
      .collect().head.getString(0)
    assert(lim.contains("limit=3"), lim)
  }

  /** Tier: the reference's named-parameter sqllogictests run VERBATIM
    * through spark.sql (reference test/sql/common_crawl_parameters.test).
    */
  test("reference common_crawl_parameters.test passes through spark.sql") {
    val stub = graft.queries.Connectors.stub
    Graft.registerAll(spark,
      waybackOptions = Map("cdx_endpoint" -> s"${stub.base}/cdx/search/cdx"),
      commonCrawlOptions = Map(
        "index_endpoint" -> stub.base, "data_endpoint" -> stub.base,
        "collinfo_endpoint" -> s"${stub.base}/collinfo.json"))
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val lines = scala.io.Source.fromFile(
      "/root/reference/test/sql/common_crawl_parameters.test").getLines().toVector
    var i = 0; var nOk = 0; var nErr = 0
    while (i < lines.length) {
      val l = lines(i).trim
      if (l == "statement ok" || l == "statement error") {
        val expectErr = l == "statement error"
        i += 1
        val sqlLines = Vector.newBuilder[String]
        while (i < lines.length && lines(i).trim.nonEmpty && lines(i).trim != "----") {
          sqlLines += lines(i); i += 1
        }
        val expected = if (i < lines.length && lines(i).trim == "----") {
          i += 1
          val exp = Vector.newBuilder[String]
          while (i < lines.length && lines(i).trim.nonEmpty) { exp += lines(i).trim; i += 1 }
          exp.result()
        } else Vector.empty
        val sql = sqlLines.result().mkString("\n").stripSuffix(";")
        if (expectErr) {
          val e = intercept[Exception] { spark.sql(sql).collect() }
          expected.foreach { exp =>
            assert(messages(e).contains(exp), s"[$sql] expected '$exp' in: ${messages(e)}")
          }
          nErr += 1
        } else {
          spark.sql(sql).collect()
          nOk += 1
        }
      } else i += 1
    }
    assert(nOk >= 10, s"ran only $nOk ok-statements")
    assert(nErr >= 4, s"ran only $nErr error-statements")
  }

  test("connector TVFs: d1_*/r2_sql_* SQL spellings + reference binder wording") {
    val stub = graft.queries.Connectors.stub
    graft.core.Secrets.register(
      graft.core.Secrets.Secret("tvfsec", "d1", "fixture-acct", "fixture-tok"))
    graft.core.Secrets.register(
      graft.core.Secrets.Secret("tvfr2", "r2_sql", "fixture-acct", "fixture-tok"))
    Graft.registerAll(spark,
      d1ApiBase = s"${stub.base}/client/v4", r2ApiBase = stub.base)
    val dbId = "11111111-2222-3333-4444-555555555555"

    // all seven names resolve through spark.sql with the reference schemas
    assert(spark.sql("SELECT * FROM d1_databases(secret := 'tvfsec')")
      .schema.fieldNames.toSeq ==
      Seq("uuid", "name", "created_at", "version", "file_size", "num_tables", "region"))
    assert(spark.sql(s"SELECT * FROM d1_tables(secret := 'tvfsec', database_id := '$dbId')")
      .schema.fieldNames.toSeq ==
      Seq("schema", "name", "type", "ncol", "writable", "strict"))
    assert(spark.sql("SELECT * FROM d1_query('SELECT * FROM users LIMIT 1', " +
        s"secret := 'tvfsec', database_id := '$dbId')")
      .schema.fieldNames.toSeq == Seq("id", "name", "active", "balance"))
    assert(spark.sql("SELECT * FROM r2_sql_query('tvfr2', 'bkt', 'SELECT 1')")
      .columns.toSeq == Seq("response"))
    assert(spark.sql("SELECT * FROM r2_sql_databases('tvfr2', 'bkt')")
      .columns.toSeq == Seq("namespace"))
    assert(spark.sql("SELECT * FROM r2_sql_tables('tvfr2', 'bkt')")
      .columns.toSeq == Seq("table_name"))
    assert(spark.sql("SELECT * FROM r2_sql_tables('tvfr2', 'bkt', 'ns')")
      .columns.toSeq == Seq("table_name"))
    assert(spark.sql("SELECT * FROM r2_sql_describe('tvfr2', 'bkt', 't')")
      .columns.toSeq == Seq("schema"))

    // binder error wording follows the reference (d1_functions.cpp,
    // r2_functions.cpp, d1_secret.cpp:78, r2_secret.cpp:71)
    def err(sql: String): String = {
      val e = intercept[Exception](spark.sql(sql).collect())
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    }
    assert(err("SELECT * FROM d1_query(secret := 'tvfsec')")
      .contains("d1_query requires at least 'sql' parameter"))
    assert(err("SELECT * FROM d1_databases(account_id := 'a')")
      .contains("api_token required (via secret, parameter, or CLOUDFLARE_API_TOKEN env)"))
    assert(err("SELECT * FROM d1_tables(account_id := 'a', api_token := 't')")
      .contains("database or database_id required"))
    assert(err("SELECT * FROM d1_databases(secret := 'nosuch')")
      .contains("D1 secret 'nosuch' not found. Create it with: CREATE SECRET nosuch (TYPE d1, ...)"))
    assert(err("SELECT * FROM d1_databases(bogus := 'x')")
      .contains("Invalid named parameter \"bogus\" for function d1_databases"))
    assert(err("SELECT * FROM r2_sql_query('tvfr2', 'bkt')")
      .contains("r2_sql_query requires 3 parameters: secret_name, bucket_name, sql_query"))
    assert(err("SELECT * FROM r2_sql_databases('tvfr2')")
      .contains("r2_sql_databases requires 2 parameters: secret_name, bucket_name"))
    assert(err("SELECT * FROM r2_sql_tables('tvfr2', 'b', 'c', 'd')")
      .contains("r2_sql_tables requires 2-3 parameters: secret_name, bucket_name, [namespace]"))
    assert(err("SELECT * FROM r2_sql_describe('tvfr2', 'bkt')")
      .contains("r2_sql_describe requires 3 parameters: secret_name, bucket_name, table_name"))
    assert(err("SELECT * FROM r2_sql_query('nosuch', 'bkt', 'SELECT 1')")
      .contains("R2 SQL secret 'nosuch' not found. Create it with: CREATE SECRET nosuch (TYPE r2_sql, ...)"))
  }

  test("ATTACH SQL: alias default, secret resolution order, reference error wording") {
    val stub = graft.queries.Connectors.stub
    import graft.core.Secrets
    // explicit secret + AS alias + extra option passthrough
    Secrets.register(Secrets.Secret("attspec", "d1", "fixture-acct", "fixture-tok"))
    spark.sql("ATTACH 'my-database' AS attspecdb (TYPE d1, SECRET 'attspec', " +
      s"API_BASE '${stub.base}/client/v4')")
    assert(spark.conf.get("spark.sql.catalog.attspecdb") == "graft.sources.d1.D1Catalog")
    assert(spark.conf.get("spark.sql.catalog.attspecdb.secret") == "attspec")
    val n = spark.sql("SELECT count(*) AS n FROM attspecdb.main.users").head().getLong(0)
    assert(n == 4)
    // no AS clause: alias defaults to the database string (d1_storage.cpp:139)
    spark.sql(s"ATTACH 'my-database' (TYPE d1, SECRET 'attspec', " +
      s"API_BASE '${stub.base}/client/v4')")
    assert(spark.conf.getOption("spark.sql.catalog.my-database").isDefined)
    // default-name probing (d1 → cloudflare → __default_d1) when SECRET omitted
    Secrets.register(Secrets.Secret("cloudflare", "d1", "fixture-acct", "fixture-tok"))
    try {
      spark.sql(s"ATTACH 'my-database' AS attdef (TYPE d1, API_BASE '${stub.base}/client/v4')")
      assert(spark.conf.get("spark.sql.catalog.attdef.secret") == "cloudflare")
    } finally Secrets.drop("d1", "cloudflare")
    // no secret anywhere → the reference's BinderException wording
    val saved = Seq("d1", "cloudflare", "__default_d1")
      .flatMap(n => Secrets.lookup("d1", n).map(n -> _))
    saved.foreach { case (nm, _) => Secrets.drop("d1", nm) }
    try {
      val e = intercept[Exception] {
        spark.sql("ATTACH 'db' AS nosec (TYPE d1)").collect()
      }
      assert(e.getMessage.contains("D1 attach requires a D1 secret. Create one with: " +
        "CREATE SECRET (TYPE d1, ACCOUNT_ID '...', API_TOKEN '...')"))
      assert(e.getMessage.contains(
        "Or specify an existing secret: ATTACH 'db_name' AS alias (TYPE d1, SECRET 'secret_name')"))
    } finally saved.foreach { case (_, sec) => Secrets.register(sec) }
    // unsupported type
    val e2 = intercept[Exception] { spark.sql("ATTACH 'x' AS y (TYPE sqlite)") }
    assert(e2.getMessage.contains("Unsupported TYPE for ATTACH: 'sqlite'"))
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
