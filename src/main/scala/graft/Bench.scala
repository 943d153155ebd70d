package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line:
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * The headline set covers every operator family (scan/agg, joins,
  * windows, dedup incl. MinHash-LSH and SimHash over the full corpus,
  * vector search, events sessionization) and excludes the fixture-backed
  * connector queries (those measure a localhost stub, not the engine).
  * A session warmup runs first so JVM/codegen startup is not billed to
  * the first query.
  */
object Bench {

  /** Materialize every row and every column of `df`.
    *
    * `count()` is NOT a valid way to time a query: Catalyst prunes any
    * projection the count does not need, so a projection-heavy pipeline
    * collapses to a row-count of the scan. The `noop` write format
    * evaluates the full plan (all columns, all rows) and discards the
    * output without driver-side collection.
    */
  private def exec(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Representative heavy queries; names from SparkEntry.queries. */
  val headline: Seq[String] = Seq(
    "q01_pricing_summary", "q02_global_agg", "q03_filter_topn",
    "q05_join_agg", "q06_join_5way", "q08_semi_join",
    "q12_distinct_on", "q16_window_topk_per_group", "q17_window_running_sum",
    "q19_rollup", "q25_date_parts", "q28_in_subquery",
    "q33_events_hourly", "q34_events_sessions", "q36_events_funnel",
    "q40_doc_tokens", "q44_dedup_exact", "q46_ngram_jaccard",
    "q47_minhash_lsh_neardup", "q49_simhash_pairs",
    "q50_cosine_topk", "q52_embedding_near_dup", "q59_embedding_lsh_neardup",
    "q53_multimodal_decode", "q56_rolling_hash", "q57_quality_signals")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: touch every table + exercise codegen/shuffle machinery once.
    Seq("lineitem", "orders", "customer", "part", "supplier", "nation",
      "region", "documents", "embeddings").foreach { t =>
      graft.queries.load(spark, sfDir, t).count()
    }
    graft.queries.load(spark, sfDir, "events").count()
    exec(SparkEntry.queries("q01_pricing_summary")(spark, sfDir))

    val all = SparkEntry.queries
    val results = headline.filter(all.contains).map { name =>
      val t0 = System.nanoTime()
      val ok = try { exec(all(name)(spark, sfDir)); true }
               catch { case _: Throwable => false }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val sf = sfDir.split("/").last.stripPrefix("sf")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sf"}""")
    spark.stop()
    sys.exit(0)
  }
}
