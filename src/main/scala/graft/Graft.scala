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
    var wb = spark.read.format("wayback")
    waybackOptions.foreach { case (k, v) => wb = wb.option(k, v) }
    wb.load().createOrReplaceTempView("wayback_machine")

    var wbd = spark.read.format("wayback").option("debug", "true")
    waybackOptions.foreach { case (k, v) => wbd = wbd.option(k, v) }
    wbd.load().createOrReplaceTempView("wayback_machine_debug")

    var cc = spark.read.format("commoncrawl")
    commonCrawlOptions.foreach { case (k, v) => cc = cc.option(k, v) }
    cc.load().createOrReplaceTempView("common_crawl_index")

    var ccd = spark.read.format("commoncrawl").option("debug", "true")
    commonCrawlOptions.foreach { case (k, v) => ccd = ccd.option(k, v) }
    ccd.load().createOrReplaceTempView("common_crawl_index_debug")

    graft.functions.TextFunctions.registerAll(spark)
    graft.sources.d1.D1.registerExecuteUdf(spark)
  }
}
