package graft

import org.apache.spark.sql.SparkSession

/** One-call SQL-surface setup: after `Graft.registerAll(spark)` a user of
  * the reference extension can run the same queries over the same names —
  * `SELECT * FROM wayback_machine WHERE url = '...'`,
  * `SELECT * FROM common_crawl_index WHERE url LIKE '...'`,
  * `SELECT rolling_hash(text) ...` — with the session extensions
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) supplying the
  * DISTINCT-ON collapse and generic-LIKE pushdowns.
  *
  * (Spark has no user table-valued functions; registered temp views over
  * the DSv2 sources are the idiomatic equivalent — named parameters
  * become session-level options on the registered view's reader.)
  */
object Graft {

  def registerAll(spark: SparkSession,
                  waybackOptions: Map[String, String] = Map.empty,
                  commonCrawlOptions: Map[String, String] = Map.empty): Unit = {
    spark.read.format("wayback").options(waybackOptions)
      .load().createOrReplaceTempView("wayback_machine")
    // debug applied AFTER user options: the _debug view is debug by name
    spark.read.format("wayback").options(waybackOptions).option("debug", "true")
      .load().createOrReplaceTempView("wayback_machine_debug")
    spark.read.format("commoncrawl").options(commonCrawlOptions)
      .load().createOrReplaceTempView("common_crawl_index")
    spark.read.format("commoncrawl").options(commonCrawlOptions).option("debug", "true")
      .load().createOrReplaceTempView("common_crawl_index_debug")

    graft.functions.TextFunctions.registerAll(spark)
    graft.sources.d1.D1.registerExecuteUdf(spark)
  }
}
