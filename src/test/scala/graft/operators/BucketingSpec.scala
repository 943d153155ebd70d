package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence for the SCALE.md claim: co-bucketed fact tables join without
  * any Exchange (the shuffle is paid once at ingest, not per query).
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.spark

  test("co-bucketed fact-fact join plans with zero exchanges") {
    // clear any stale managed-table state from aborted runs
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val dir = "/root/testdata/sf0.001"
    val li = graft.queries.load(spark, dir, "lineitem")
    val o = graft.queries.load(spark, dir, "orders")
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", numBuckets = 8)
    Bucketing.writeBucketed(o, "o_bucketed", "o_orderkey", numBuckets = 8)

    // pin a sort-merge join: at this fixture size AQE would broadcast,
    // which hides the property under test (real fact-fact joins are far
    // above any broadcast threshold)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "li_bucketed", "o_bucketed",
        "l_orderkey", "o_orderkey")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val viaBuckets = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // post-execution: the adaptive plan is final; AQE appends the
      // pre-adaptive "Initial Plan" section below — exclude it
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val smj = plan.indexOf("SortMergeJoin")
      assert(smj >= 0, "expected a sort-merge join:\n" + plan.take(2000))
      // the join's subtree must be exchange-free: the only exchange in the
      // whole plan is the one feeding the final aggregation, which sits
      // ABOVE the join in the plan string
      val joinSection = plan.substring(smj)
      assert(!joinSection.contains("Exchange"),
        "bucketed join still shuffles:\n" + plan.take(2000))
      val direct = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaBuckets == direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("ivf cluster-partitioned corpus: probes read only the probed cells' files") {
    // Evidence for the SCALE.md claim: write the corpus partitioned by
    // the IVF cell and a probe becomes a partition-PRUNED scan — the
    // fraction of data read scales with nprobe/nlist, not corpus size.
    val dir = java.nio.file.Files.createTempDirectory("ivf_parts").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    SimilaritySearch.ivfAssign(emb, "embedding", "vec_id", nlist = 8)
      .write.partitionBy("cluster").mode("overwrite").parquet(dir)

    val corpus = spark.read.parquet(dir)
    val probe = corpus.filter(col("cluster").isin(0, 3))
      .select(col("vec_id"), col("embedding"))
    // the partition filter must reach the scan (pruned file listing), not
    // survive as a post-scan row filter
    val scan = probe.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("cluster"),
      "cluster probe must be a partition filter:\n" + scan.take(1500))
    // and the pruned read returns exactly the probed cells' rows
    val expected = SimilaritySearch.ivfAssign(emb, "embedding", "vec_id", nlist = 8)
      .filter(col("cluster").isin(0, 3)).count()
    assert(probe.count() == expected && expected > 0)
  }

  test("bench bucketed variants match their plain queries; fact hop stays exchange- and sort-free") {
    val dir = "/root/testdata/sf0.001"
    val tables = Seq("bench_lineitem_bo", "bench_orders_bo",
      "bench_customer_bc", "bench_orders_bc", "bench_events_bu")
    tables.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // a probe run in a PREVIOUS session leaves warehouse dirs the new
      // session's in-memory catalog knows nothing about — clear them or
      // saveAsTable fails on LOCATION_ALREADY_EXISTS
      val loc = new java.io.File(s"spark-warehouse/$t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      if (loc.exists()) rm(loc)
    }
    val li = graft.queries.load(spark, dir, "lineitem")
    val o = graft.queries.load(spark, dir, "orders")
    val c = graft.queries.load(spark, dir, "customer")
    Bucketing.writeBucketed(li, "bench_lineitem_bo", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "bench_orders_bo", "o_orderkey", 8)
    Bucketing.writeBucketed(c, "bench_customer_bc", "c_custkey", 8)
    // same covering projection the bench ingests (q05/q08/q28 joins +
    // q12/q16/q17 windows share it)
    Bucketing.writeBucketed(
      o.select(col("o_custkey"), col("o_totalprice"), col("o_orderstatus"),
        col("o_orderkey"), col("o_orderdate")),
      "bench_orders_bc", "o_custkey", 8)
    Bucketing.writeBucketed(
      graft.queries.load(spark, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type")),
      "bench_events_bu", "user_id", 8)
    // disable auto-broadcast so the fixture-sized tables take the same
    // join strategies the bench takes at fact scale
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
      // flatten the FINAL adaptive plan, descending through query stages
      def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
        case q: QueryStageExec => q +: flatten(q.plan)
        case other => other +: other.children.flatMap(flatten)
      }
      // the fact hop must be a ShuffledHashJoin whose subtree holds no
      // shuffle and no sort: its hash partitioning comes from the bucket
      // layout, the hash build replaces the merge sort the aggregated
      // (order-destroyed) side would otherwise need
      def assertHashJoinOnBuckets(df: org.apache.spark.sql.DataFrame): Unit = {
        val shjs = flatten(df.queryExecution.executedPlan)
          .collect { case j: ShuffledHashJoinExec => j }
        assert(shjs.nonEmpty, "expected a shuffle-hash join:\n" +
          df.queryExecution.executedPlan.toString.take(2000))
        val subtree = shjs.flatMap(flatten)
        assert(!subtree.exists(_.isInstanceOf[ShuffleExchangeLike]),
          "bucketed fact hop still shuffles")
        assert(!subtree.exists(_.isInstanceOf[org.apache.spark.sql.execution.SortExec]),
          "bucketed fact hop still sorts")
      }
      val q06b = graft.Bench.extras("q06_join_5way_bucketed")(spark, dir)
      val q06 = graft.SparkEntry.queries("q06_join_5way")(spark, dir)
      def key06(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
      assert(key06(q06b) == key06(q06))
      assertHashJoinOnBuckets(q06b)

      val q08b = graft.Bench.extras("q08_semi_join_bucketed")(spark, dir)
      val q08 = graft.SparkEntry.queries("q08_semi_join")(spark, dir)
      def key08(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Number](0).longValue(), r.getAs[Number](1).longValue())).toSet
      assert(key08(q08b) == key08(q08))
      assertHashJoinOnBuckets(q08b)

      val q05b = graft.Bench.extras("q05_join_agg_bucketed")(spark, dir)
      val q05 = graft.SparkEntry.queries("q05_join_agg")(spark, dir)
      def key05(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
      assert(key05(q05b) == key05(q05))
      assertHashJoinOnBuckets(q05b)

      val q28b = graft.Bench.extras("q28_in_subquery_bucketed")(spark, dir)
      val q28 = graft.SparkEntry.queries("q28_in_subquery")(spark, dir)
      def key28(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getAs[Number](1).longValue())).toSet
      assert(key28(q28b) == key28(q28))
      assertHashJoinOnBuckets(q28b)

      // bucket-key-partitioned windows/aggregates on the bucketed
      // copies: identical rows to the plain queries, and NO exchange
      // hash-partitioned ON THE BUCKET KEY anywhere in the plan (the
      // layout satisfies the window's/aggregate's distribution; only
      // the within-partition sort runs). Exchanges on OTHER keys are
      // legitimate — q36's tiny 8-group funnel fold, for instance.
      for ((name, key) <- Seq(
          "q12_distinct_on" -> "o_custkey",
          "q16_window_topk_per_group" -> "o_custkey",
          "q17_window_running_sum" -> "o_custkey",
          "q34_events_sessions" -> "user_id",
          "q36_events_funnel" -> "user_id")) {
        val b = graft.Bench.extras(name + "_bucketed")(spark, dir)
        val plain = graft.SparkEntry.queries(name)(spark, dir)
        assert(b.collect().toSeq == plain.collect().toSeq, name)
        val pw = b.queryExecution.executedPlan.toString
        assert(!pw.contains(s"hashpartitioning($key"),
          s"$name bucketed plan still shuffles on $key:\n" + pw.take(1500))
      }

      // q02 bucketed: the distinct-count half runs on the bucket key, so
      // the whole query plans WITHOUT any hash-partitioned exchange (the
      // only exchanges left are the global aggregates' single-partition
      // folds); results must match the plain shape exactly
      val q02b = graft.Bench.extras("q02_global_agg_bucketed")(spark, dir)
      val q02 = graft.SparkEntry.queries("q02_global_agg")(spark, dir)
      assert(q02b.collect().toSeq == q02.collect().toSeq)
      val p02 = q02b.queryExecution.executedPlan.toString
      assert(!p02.contains("Exchange hashpartitioning"),
        "bucketed distinct still hash-shuffles:\n" + p02.take(2000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
