package graft.queries

import org.apache.spark.sql.functions._
import graft.fixtures.Fixtures
import graft.core.Secrets

/** Connector-surface correctness entries. Each query drives a real DSv2
  * scan against the in-process fixture stub (zero egress) and yields a
  * deterministic result, verified against a literal-VALUES DuckDB oracle —
  * full-strength hash checks for the federated sources.
  */
object Connectors {

  /** One stub JVM-wide; endpoints are resolved at plan time and the
    * server lives until JVM exit (Verify/Bench are one-shot JVMs).
    */
  lazy val stub: graft.fixtures.Stub = Fixtures.startAll()

  private def d1Opts(r: org.apache.spark.sql.DataFrameReader) = r
    .option("api_base", s"${stub.base}/client/v4")
    .option("account_id", "fixture-acct").option("api_token", "fixture-tok")
    .option("database_id", "11111111-2222-3333-4444-555555555555")

  val defs: Seq[QueryDef] = Seq(

    // Golden URL generation — the reference's tier-2 test surface.
    QueryDef("qc01_wayback_cdx_url",
      (s, _) => s.read.format("wayback").option("debug", "true").load()
        .filter(col("url") === "example.com" && col("statuscode") === 200)
        .limit(5)
        .select(col("cdx_url")),
      Some("SELECT 'https://web.archive.org/cdx/search/cdx?url=example.com&output=csv" +
        "&limit=5&filter=statuscode:200' AS cdx_url")),

    QueryDef("qc02_wayback_fastlatest_url",
      (s, _) => s.read.format("wayback").option("debug", "true")
        .option("cdx_endpoint", s"${stub.base}/cdx/search/cdx").load()
        .filter(col("url") === "example.com")
        .orderBy(col("timestamp").desc).limit(10)
        // port varies per run: compare only the query-string part; all
        // rows share one cdx_url so distinct yields a single row (an
        // outer limit(1) would merge into the TopN and change the URL)
        .select(substring_index(col("cdx_url"), "?", -1).as("cdx_query"))
        .distinct(),
      Some("SELECT 'url=example.com&output=csv&fl=timestamp&fastLatest=true&limit=-10'" +
        " AS cdx_query")),

    QueryDef("qc03_wayback_scan",
      (s, _) => s.read.format("wayback")
        .option("cdx_endpoint", s"${stub.base}/cdx/search/cdx")
        .option("url", "example.com").load()
        .select(col("url"), col("statuscode"), col("year"), col("month"))
        .orderBy(col("url")),
      Some("""SELECT * FROM (VALUES
             |('https://example.com/', 200, 2024, 1),
             |('https://example.com/about', 200, 2024, 1),
             |('https://example.com/missing', 404, 2023, 6))
             |t(url, statuscode, year, month) ORDER BY url""".stripMargin)),

    QueryDef("qc04_cc_scan_warc",
      (s, _) => s.read.format("commoncrawl")
        .option("index_endpoint", stub.base)
        .option("data_endpoint", stub.base)
        .option("crawl", "CC-MAIN-2024-46")
        .option("url_like", "%.example.com/%").load()
        .select(col("url"), col("crawl_id"), col("mimetype"),
          col("warc.version").as("warc_version"),
          col("response.body").cast("string").as("body"),
          element_at(col("response.headers"), "Content-Type").as("content_type"))
        .orderBy(col("url")),
      Some("""SELECT * FROM (VALUES
             |('https://example.com/', 'CC-MAIN-2024-46', 'text/html', '1.0', '<html>hello graft</html>', 'text/html'),
             |('https://example.com/p2', 'CC-MAIN-2024-46', 'text/plain', '1.0', '<html>hello graft</html>', 'text/html'))
             |t(url, crawl_id, mimetype, warc_version, body, content_type) ORDER BY url""".stripMargin)),

    QueryDef("qc05_cc_fanout",
      (s, _) => s.read.format("commoncrawl")
        .option("index_endpoint", stub.base)
        .option("data_endpoint", stub.base)
        .option("url_like", "example.com/%").load()
        .filter(col("crawl_id").isin("CC-MAIN-2024-46", "CC-MAIN-2024-42"))
        .groupBy(col("crawl_id")).agg(count(lit(1)).as("n"))
        .orderBy(col("crawl_id")),
      Some("""SELECT * FROM (VALUES
             |('CC-MAIN-2024-42', CAST(2 AS BIGINT)), ('CC-MAIN-2024-46', CAST(2 AS BIGINT)))
             |t(crawl_id, n) ORDER BY crawl_id""".stripMargin)),

    QueryDef("qc06_d1_scan",
      (s, _) => d1Opts(s.read.format("d1")).option("table", "users").load()
        .orderBy(col("id")),
      Some("""SELECT * FROM (VALUES
             |(CAST(1 AS BIGINT), 'alice', true, 10.5),
             |(CAST(2 AS BIGINT), 'bob', false, 0.0),
             |(CAST(3 AS BIGINT), 'carol', true, 7.25),
             |(CAST(4 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS BOOLEAN), CAST(NULL AS DOUBLE)))
             |t(id, name, active, balance) ORDER BY id""".stripMargin)),

    QueryDef("qc07_d1_pushdown",
      (s, _) => d1Opts(s.read.format("d1")).option("table", "users").load()
        .filter(col("active") === true)
        .select(col("id"), col("name"))
        .orderBy(col("id")),
      Some("""SELECT * FROM (VALUES
             |(CAST(1 AS BIGINT), 'alice'), (CAST(3 AS BIGINT), 'carol'))
             |t(id, name) ORDER BY id""".stripMargin)),

    QueryDef("qc08_d1_query_passthrough",
      (s, _) => d1Opts(s.read.format("d1query"))
        .option("query", "SELECT * FROM orders").load()
        .orderBy(col("id")),
      Some("""SELECT * FROM (VALUES
             |('10', '1', 'shipped', '99.9'), ('11', '3', 'pending', '5.0'))
             |t(id, user_id, status, total) ORDER BY id""".stripMargin)),

    QueryDef("qc09_d1_tables",
      (s, _) => {
        Secrets.register(Secrets.Secret("__default_d1", "d1", "fixture-acct", "fixture-tok"))
        graft.sources.d1.D1.tables(s, "11111111-2222-3333-4444-555555555555",
          apiBase = s"${stub.base}/client/v4")
          .orderBy(col("name"))
      },
      Some("""SELECT * FROM (VALUES
             |('main', 'orders', 'table', 4, true, false),
             |('main', 'users', 'table', 4, true, false))
             |t(schema, name, type, ncol, writable, strict) ORDER BY name""".stripMargin)),

    QueryDef("qc10_d1_databases",
      (s, _) => {
        Secrets.register(Secrets.Secret("__default_d1", "d1", "fixture-acct", "fixture-tok"))
        graft.sources.d1.D1.databases(s, apiBase = s"${stub.base}/client/v4")
          .select(col("uuid"), col("name"), col("num_tables"), col("region"))
          .orderBy(col("name"))
      },
      Some("""SELECT * FROM (VALUES
             |('11111111-2222-3333-4444-555555555555', 'my-database', 2, 'WNAM'),
             |('66666666-7777-8888-9999-000000000000', 'other-db', 5, 'EEUR'))
             |t(uuid, name, num_tables, region) ORDER BY name""".stripMargin)),

    QueryDef("qc11_d1_catalog",
      (s, _) => {
        Secrets.register(Secrets.Secret("__default_d1", "d1", "fixture-acct", "fixture-tok"))
        s.conf.set("spark.sql.catalog.d1fix", "graft.sources.d1.D1Catalog")
        s.conf.set("spark.sql.catalog.d1fix.database_id", "11111111-2222-3333-4444-555555555555")
        s.conf.set("spark.sql.catalog.d1fix.api_base", s"${stub.base}/client/v4")
        s.sql("SELECT count(*) AS n_active FROM d1fix.main.users WHERE active = true")
      },
      Some("SELECT CAST(2 AS BIGINT) AS n_active")),

    QueryDef("qc12_r2_passthrough",
      (s, _) => {
        Secrets.register(Secrets.Secret("r2fix", "r2_sql", "fixture-acct", "fixture-tok"))
        s.read.format("r2sql")
          .option("secret", "r2fix").option("bucket", "bkt")
          .option("api_base", stub.base)
          .option("query", "SELECT * FROM orders").load()
      },
      Some("""SELECT '{"results":[{"order_id":1,"amount":42.5}],"metadata":{"rows":1}}'""" +
        " AS response")),

    QueryDef("qc14_collapse_rule",
      (s, _) => s.read.format("wayback").option("debug", "true").load()
        .filter(col("url") === "example.com")
        .select(col("year"), col("cdx_url"))
        .dropDuplicates("year")
        .select(col("year"), substring_index(col("cdx_url"), "?", -1).as("cdx_query")),
      Some("SELECT 2025 AS year, 'url=example.com&output=csv&fl=timestamp&limit=100" +
        "&collapse=timestamp:4' AS cdx_query")),

    QueryDef("qc13_wayback_collapse_url",
      (s, _) => s.read.format("wayback").option("debug", "true")
        .option("collapse", "timestamp:8").load()
        .filter(col("url") === "example.com" && col("year") >= 2020 && col("year") <= 2023)
        .limit(50)
        .select(col("cdx_url")),
      Some("SELECT 'https://web.archive.org/cdx/search/cdx?url=example.com&output=csv" +
        "&from=2020&to=2023&limit=50&collapse=timestamp:8' AS cdx_url")),

    // Write-path round-trips against the stub's stateful kv_test table:
    // statements mutate real (in-memory) state and the read-back flows
    // through the ordinary d1_scan schema-inference + affinity path.

    QueryDef("qc15_d1_execute_roundtrip",
      (s, _) => {
        Secrets.register(Secrets.Secret("__default_d1", "d1", "fixture-acct", "fixture-tok"))
        val db = "11111111-2222-3333-4444-555555555555"
        val api = s"${stub.base}/client/v4"
        graft.sources.d1.D1.execute("DELETE FROM kv_test", None, db, api)
        graft.sources.d1.D1.execute(
          "INSERT INTO kv_test (k, v) VALUES ('alpha', 1)", None, db, api)
        graft.sources.d1.D1.execute(
          "INSERT INTO kv_test (k, v) VALUES ('beta', 2)", None, db, api)
        d1Opts(s.read.format("d1")).option("table", "kv_test").load()
          .orderBy(col("k"))
      },
      Some("""SELECT * FROM (VALUES
             |('alpha', CAST(1 AS BIGINT)), ('beta', CAST(2 AS BIGINT)))
             |t(k, v) ORDER BY k""".stripMargin)),

    QueryDef("qc16_d1_batch_txn",
      (s, _) => {
        Secrets.register(Secrets.Secret("__default_d1", "d1", "fixture-acct", "fixture-tok"))
        val db = "11111111-2222-3333-4444-555555555555"
        val api = s"${stub.base}/client/v4"
        graft.sources.d1.D1.execute("DELETE FROM kv_test", None, db, api)
        val txn = graft.sources.d1.D1.batchSession(None, db, api)
        txn.begin()
        txn.execute("INSERT INTO kv_test (k, v) VALUES ('x', 10)")
        txn.execute("INSERT INTO kv_test (k, v) VALUES ('y', 20)")
        txn.execute("INSERT INTO kv_test (k, v) VALUES ('z', 30)")
        txn.commit() // one batch POST (reference d1_http.cpp:525-547)
        d1Opts(s.read.format("d1")).option("table", "kv_test").load()
          .orderBy(col("k"))
      },
      Some("""SELECT * FROM (VALUES
             |('x', CAST(10 AS BIGINT)), ('y', CAST(20 AS BIGINT)), ('z', CAST(30 AS BIGINT)))
             |t(k, v) ORDER BY k""".stripMargin)),

    QueryDef("qc17_tvf_named_args",
      (s, _) => {
        // the reference's SQL spelling end-to-end: named-parameter TVF
        // (`:=` form) over a real DSv2 scan with filter pushdown composed
        // on top (reference test/sql/common_crawl_parameters.test:7-31)
        graft.Graft.registerAll(s,
          waybackOptions = Map("cdx_endpoint" -> s"${stub.base}/cdx/search/cdx"),
          commonCrawlOptions = Map(
            "index_endpoint" -> stub.base, "data_endpoint" -> stub.base,
            "collinfo_endpoint" -> s"${stub.base}/collinfo.json"))
        s.sql("""SELECT url, statuscode, mimetype
                |FROM common_crawl_index(max_results := 5)
                |WHERE url LIKE 'example.com/%' AND crawl_id = 'CC-MAIN-2024-46'
                |ORDER BY url""".stripMargin)
      },
      Some("""SELECT * FROM (VALUES
             |('https://example.com/', 200, 'text/html'),
             |('https://example.com/p2', 200, 'text/plain'))
             |t(url, statuscode, mimetype) ORDER BY url""".stripMargin)),

    QueryDef("qc18_r2_native_scan",
      (s, d) => {
        // NATIVE R2 table read (beyond the reference's 1-row JSON
        // passthrough): nation is published as parquet objects in the
        // stub's S3-style bucket, then read back via the read-only
        // r2:// Hadoop filesystem — Spark's own parquet source does the
        // filter pushdown and byte-ranged GETs (R2FileSystemSpec asserts
        // the pushed filter and that no whole-object read ever happens).
        val nation = load(s, d, "nation")
        val tmp = java.nio.file.Files.createTempDirectory("r2lake").toFile
        nation.coalesce(1).write.mode("overwrite")
          .parquet(tmp.getAbsolutePath + "/nation")
        new java.io.File(tmp, "nation").listFiles()
          .filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach { case (f, i) =>
            stub.objects.put(s"tables/nation/part-$i.parquet",
              java.nio.file.Files.readAllBytes(f.toPath))
          }
        val hc = s.sparkContext.hadoopConfiguration
        hc.set("fs.r2.impl", "graft.sources.r2.R2FileSystem")
        hc.set("fs.r2.impl.disable.cache", "true")
        hc.set("fs.r2.endpoint", stub.base)
        s.read.parquet("r2://r2-lake/tables/nation")
          .filter(col("n_regionkey") === 2)
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT n_nationkey, n_name, n_regionkey FROM nation
             |WHERE n_regionkey = 2 ORDER BY n_nationkey""".stripMargin)),

    QueryDef("qc19_connector_tvfs",
      (s, _) => {
        // SQL spellings of the whole D1/R2 metadata + passthrough surface
        // (reference d1_functions.cpp:168,280,406; r2_functions.cpp:
        // 62-241): every call below goes through spark.sql only —
        // d1_tables additionally exercises database-name → UUID
        // resolution, d1_query the named-parameter credential path.
        Secrets.register(Secrets.Secret("qcfix", "d1", "fixture-acct", "fixture-tok"))
        Secrets.register(Secrets.Secret("qcfix_r2", "r2_sql", "fixture-acct", "fixture-tok"))
        graft.plans.GraftTvf.registerConnectors(s,
          d1ApiBase = s"${stub.base}/client/v4", r2ApiBase = stub.base)
        s.sql("""SELECT kind, item FROM (
                |  SELECT 'db' AS kind, name AS item
                |  FROM d1_databases(secret := 'qcfix')
                |  UNION ALL SELECT 'tbl', name
                |  FROM d1_tables(secret := 'qcfix', database := 'my-database')
                |  UNION ALL SELECT 'q', id
                |  FROM d1_query('SELECT * FROM users LIMIT 2', secret := 'qcfix',
                |                database_id := '11111111-2222-3333-4444-555555555555')
                |  UNION ALL SELECT 'r2', response
                |  FROM r2_sql_query('qcfix_r2', 'bkt', 'SELECT * FROM orders')
                |  UNION ALL SELECT 'ns', namespace
                |  FROM r2_sql_databases('qcfix_r2', 'bkt')
                |) ORDER BY kind, item""".stripMargin)
      },
      Some("""SELECT * FROM (VALUES
             |('db', 'my-database'), ('db', 'other-db'),
             |('ns', '{"results":[{"order_id":1,"amount":42.5}],"metadata":{"rows":1}}'),
             |('q', '1'), ('q', '2'),
             |('r2', '{"results":[{"order_id":1,"amount":42.5}],"metadata":{"rows":1}}'),
             |('tbl', 'orders'), ('tbl', 'users'))
             |t(kind, item) ORDER BY kind, item""".stripMargin)),

    QueryDef("qc20_attach_sql",
      (s, _) => {
        // ATTACH SQL spelling end-to-end (reference d1_storage.cpp:
        // 101-144): the database is given by NAME ('my-database'), so the
        // catalog exercises name → UUID resolution too; everything after
        // Secrets.register goes through spark.sql alone.
        Secrets.register(Secrets.Secret("attsec", "d1", "fixture-acct", "fixture-tok"))
        s.sql(s"ATTACH 'my-database' AS attdb (TYPE d1, SECRET 'attsec', " +
          s"API_BASE '${stub.base}/client/v4')")
        s.sql("SELECT count(*) AS n_active FROM attdb.main.users WHERE active = true")
      },
      Some("SELECT CAST(2 AS BIGINT) AS n_active")),

    QueryDef("qc21_iceberg_scan",
      (s, d) => {
        // Iceberg-on-R2 end-to-end (the "real lake" path beyond the
        // reference's 1-row JSON passthrough, r2_functions.cpp:18-65):
        // nation is published as an Iceberg table — parquet data files +
        // Avro manifests/manifest-list + metadata JSON in the stub's S3
        // bucket — then read back purely through SQL over the REST
        // catalog: protocol → metadata → manifests → Spark's own parquet
        // scan with byte-ranged GETs (IcebergCatalogSpec asserts pushdown
        // and ranged reads; this gate pins row-level results vs DuckDB).
        graft.fixtures.IcebergFixture.installRest(stub)
        val hc = s.sparkContext.hadoopConfiguration
        hc.set("fs.r2.impl", "graft.sources.r2.R2FileSystem")
        hc.set("fs.r2.impl.disable.cache", "true")
        hc.set("fs.r2.endpoint", stub.base)
        s.conf.set("spark.sql.catalog.r2lake",
          "graft.sources.iceberg.IcebergRestCatalog")
        s.conf.set("spark.sql.catalog.r2lake.uri", s"${stub.base}/iceberg")
        graft.fixtures.IcebergFixture.publish(stub, "tpch", "nation",
          load(s, d, "nation"))
        s.sql("""SELECT n_nationkey, n_name, n_regionkey
                |FROM r2lake.tpch.nation WHERE n_regionkey <> 1
                |ORDER BY n_nationkey""".stripMargin)
      },
      Some("""SELECT n_nationkey, n_name, n_regionkey FROM nation
             |WHERE n_regionkey <> 1 ORDER BY n_nationkey""".stripMargin)),

    QueryDef("qc22_iceberg_mor",
      (s, d) => {
        // Merge-on-read: position deletes applied via the
        // (_metadata.file_path, _metadata.row_index) anti-join —
        // Iceberg v2 position-delete semantics (a delete row masks the
        // pos-th row of its data file). Rows at positions 0,2,4 of the
        // single data file are tombstoned; the data file preserves the
        // source row order, so the oracle drops the same rows by
        // row_number over the source table's key order.
        graft.fixtures.IcebergFixture.installRest(stub)
        val hc = s.sparkContext.hadoopConfiguration
        hc.set("fs.r2.impl", "graft.sources.r2.R2FileSystem")
        hc.set("fs.r2.impl.disable.cache", "true")
        hc.set("fs.r2.endpoint", stub.base)
        val nation = load(s, d, "nation").orderBy(col("n_nationkey"))
        graft.fixtures.IcebergFixture.publishWithPositionDeletes(
          stub, "tpch", "nation_mor", nation, Seq(0L, 2L, 4L))
        graft.sources.iceberg.Iceberg
          .read(s, s"${stub.base}/iceberg", Seq("tpch"), "nation_mor")
          .select(col("n_nationkey"), col("n_name"))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT n_nationkey, n_name FROM (
             |  SELECT n_nationkey, n_name,
             |    row_number() OVER (ORDER BY n_nationkey) - 1 AS pos
             |  FROM nation)
             |WHERE pos NOT IN (0, 2, 4) ORDER BY n_nationkey""".stripMargin)),

    QueryDef("qc23_iceberg_eq_deletes",
      (s, d) => {
        // Equality deletes (v2 content=2): a delete file whose columns
        // are the equality fields masks every matching data row — the
        // reader anti-joins on the delete file's own column set with
        // null-safe equality. Here supplier rows in nations 1 and 3 are
        // tombstoned.
        graft.fixtures.IcebergFixture.installRest(stub)
        val hc = s.sparkContext.hadoopConfiguration
        hc.set("fs.r2.impl", "graft.sources.r2.R2FileSystem")
        hc.set("fs.r2.impl.disable.cache", "true")
        hc.set("fs.r2.endpoint", stub.base)
        val supplier = load(s, d, "supplier")
        val dels = supplier.sparkSession.createDataFrame(
          java.util.Arrays.asList(
            org.apache.spark.sql.Row(1), org.apache.spark.sql.Row(3)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("s_nationkey",
              supplier.schema("s_nationkey").dataType))))
        graft.fixtures.IcebergFixture.publishWithEqualityDeletes(
          stub, "tpch", "supplier_eq", supplier, dels)
        graft.sources.iceberg.Iceberg
          .read(s, s"${stub.base}/iceberg", Seq("tpch"), "supplier_eq")
          .select(col("s_suppkey"), col("s_nationkey"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, s_nationkey FROM supplier
             |WHERE s_nationkey NOT IN (1, 3) ORDER BY s_suppkey""".stripMargin)),

    QueryDef("qc24_iceberg_evolution",
      (s, d) => {
        // Schema evolution read path: file 1 was written before
        // `ALTER TABLE ... RENAME COLUMN nation_label TO label` and
        // `ADD COLUMN region`, file 2 after. Iceberg resolves columns by
        // FIELD ID, so the renamed column must bind to file 1's physical
        // `nation_label` column (same id) and `region` must come back
        // null there — a name-matching reader would silently null the
        // renamed column instead. Spark's parquet field-id matching does
        // the per-file resolution; the catalog schema carries the ids.
        graft.fixtures.IcebergFixture.installRest(stub)
        val hc = s.sparkContext.hadoopConfiguration
        hc.set("fs.r2.impl", "graft.sources.r2.R2FileSystem")
        hc.set("fs.r2.impl.disable.cache", "true")
        hc.set("fs.r2.endpoint", stub.base)
        s.conf.set("spark.sql.catalog.r2lake",
          "graft.sources.iceberg.IcebergRestCatalog")
        s.conf.set("spark.sql.catalog.r2lake.uri", s"${stub.base}/iceberg")
        val nation = load(s, d, "nation")
        graft.fixtures.IcebergFixture.publishEvolved(stub, "tpch", "nation_evo",
          nation.filter(col("n_nationkey") < 13)
            .select(col("n_nationkey"), col("n_name").as("nation_label")),
          nation.filter(col("n_nationkey") >= 13)
            .select(col("n_nationkey"), col("n_name").as("label"),
              col("n_regionkey").as("region")))
        s.sql("""SELECT n_nationkey, label, region FROM r2lake.tpch.nation_evo
                |ORDER BY n_nationkey""".stripMargin)
      },
      Some("""SELECT n_nationkey, n_name AS label,
             |CASE WHEN n_nationkey < 13 THEN NULL ELSE n_regionkey END AS region
             |FROM nation ORDER BY n_nationkey""".stripMargin)),

    QueryDef("qc25_create_secret_sql",
      (s, _) => {
        // CREATE SECRET / DROP SECRET SQL statements end-to-end
        // (reference d1_secret.cpp:12-67): the secret is created through
        // spark.sql ALONE — the literal spelling the engine's own error
        // hints advertise ("Create it with: CREATE SECRET n (TYPE d1,
        // ...)") — then a d1_query TVF call resolves credentials through
        // it and scans the fixture; DROP SECRET runs after the bind-time
        // credential capture, proving both statements execute.
        graft.plans.GraftTvf.registerConnectors(s,
          d1ApiBase = s"${stub.base}/client/v4", r2ApiBase = stub.base)
        s.sql("CREATE OR REPLACE SECRET qcsql " +
          "(TYPE d1, ACCOUNT_ID 'fixture-acct', API_TOKEN 'fixture-tok')")
        val out = s.sql(
          """SELECT id, name FROM d1_query('SELECT * FROM users LIMIT 2',
            |  secret := 'qcsql',
            |  database_id := '11111111-2222-3333-4444-555555555555')
            |ORDER BY id""".stripMargin)
        s.sql("DROP SECRET qcsql")
        out
      },
      Some("""SELECT * FROM (VALUES ('1', 'alice'), ('2', 'bob'))
             |t(id, name) ORDER BY id""".stripMargin)),

    QueryDef("qc26_iceberg_seq_scoping",
      (s, d) => {
        // v2 sequence-number scoping (Iceberg spec "Sequencing"): insert
        // suppliers (seq 1) → equality-delete nations 1,3 (seq 2) →
        // re-insert those rows (seq 3). The delete masks only the seq-1
        // copies; the seq-3 re-inserts are strictly newer and survive,
        // so a spec-correct read returns the FULL supplier table. A
        // reader applying deletes globally loses the re-inserts; one
        // ignoring deletes duplicates them.
        graft.fixtures.IcebergFixture.installRest(stub)
        val hc = s.sparkContext.hadoopConfiguration
        hc.set("fs.r2.impl", "graft.sources.r2.R2FileSystem")
        hc.set("fs.r2.impl.disable.cache", "true")
        hc.set("fs.r2.endpoint", stub.base)
        val supplier = load(s, d, "supplier")
        val dels = supplier.sparkSession.createDataFrame(
          java.util.Arrays.asList(
            org.apache.spark.sql.Row(1), org.apache.spark.sql.Row(3)),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("s_nationkey",
              supplier.schema("s_nationkey").dataType))))
        graft.fixtures.IcebergFixture.publishDeleteThenReinsert(
          stub, "tpch", "supplier_seq", supplier, dels,
          supplier.filter(col("s_nationkey").isin(1, 3)))
        graft.sources.iceberg.Iceberg
          .read(s, s"${stub.base}/iceberg", Seq("tpch"), "supplier_seq")
          .select(col("s_suppkey"), col("s_nationkey"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, s_nationkey FROM supplier
             |ORDER BY s_suppkey""".stripMargin)),

    QueryDef("qc27_d1_txn_sql",
      (s, _) => {
        // BEGIN / COMMIT transaction spelling end-to-end (reference
        // d1_transaction.cpp:24-48): two d1_execute writes buffer inside
        // the transaction — nothing posts until COMMIT flushes both as
        // ONE batch POST (D1TxnSpec asserts the wire shape) — then the
        // read-back flows through the ordinary d1_scan path.
        Secrets.register(Secrets.Secret("__default_d1", "d1", "fixture-acct", "fixture-tok"))
        val db = "11111111-2222-3333-4444-555555555555"
        val api = s"${stub.base}/client/v4"
        graft.sources.d1.D1.execute("DELETE FROM kv_test", None, db, api)
        graft.sources.d1.D1.registerExecuteUdf(s, api)
        s.sql("BEGIN TRANSACTION")
        s.sql("SELECT d1_execute('INSERT INTO kv_test (k, v) VALUES (''p'', 7)', " +
          s"'__default_d1', '$db')").collect()
        s.sql("SELECT d1_execute('INSERT INTO kv_test (k, v) VALUES (''q'', 8)', " +
          s"'__default_d1', '$db')").collect()
        s.sql("COMMIT")
        d1Opts(s.read.format("d1")).option("table", "kv_test").load()
          .orderBy(col("k"))
      },
      Some("""SELECT * FROM (VALUES ('p', CAST(7 AS BIGINT)), ('q', CAST(8 AS BIGINT)))
             |t(k, v) ORDER BY k""".stripMargin))
  )
}
