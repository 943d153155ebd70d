package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.Connectors

/** Prints formatted plans for pushdown-sensitive queries so the scan-level
  * pushdown (PushedFilters / ReadSchema / DSv2 description) is observable.
  * `sbt "runMain graft.tools.PlanCheck"`.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println("==== collapse rule: dropDuplicates(year) over wayback ====")
    spark.read.format("wayback").option("debug", "true").load()
      .filter(col("url") === "example.com")
      .select(col("year"), col("cdx_url")).dropDuplicates("year")
      .select(col("cdx_url")).show(truncate = false)
    println("==== collapse rule probe: month without year errors ====")
    try {
      spark.read.format("wayback").option("debug", "true").load()
        .filter(col("url") === "example.com")
        .select(col("month"), col("cdx_url")).dropDuplicates("month").collect()
    } catch { case e: Exception =>
      def root(t: Throwable): Throwable = if (t.getCause == null) t else root(t.getCause)
      println("error: " + root(e).getMessage.linesIterator.next()) }
    println("==== collapse rule probe: non-wayback dedup untouched ====")
    val plainDedup = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .dropDuplicates("o_orderstatus")
    println("rows: " + plainDedup.count())

    println("==== parquet scan: filter+column pushdown ====")
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_shipdate") <= "1995-01-01" && col("l_quantity") < 10)
      .select("l_orderkey", "l_extendedprice")
      .explain("formatted")

    println("==== d1 scan: WHERE + LIMIT pushed into remote SQL ====")
    val d1 = spark.read.format("d1")
      .option("api_base", s"${Connectors.stub.base}/client/v4")
      .option("account_id", "a").option("api_token", "t")
      .option("database_id", "11111111-2222-3333-4444-555555555555")
      .option("table", "users").load()
      .filter(col("active") === true).limit(1)
    d1.explain("formatted")
    println("rows: " + d1.collect().length)

    println("==== wayback debug: no-network cdx_url plan ====")
    val wb = spark.read.format("wayback").option("debug", "true").load()
      .filter(col("url") === "example.com").limit(5).select(col("cdx_url"))
    wb.explain("formatted")
    wb.show(truncate = false)

    println("==== error probe: d1 without table option ====")
    try {
      spark.read.format("d1")
        .option("api_base", s"${Connectors.stub.base}/client/v4")
        .option("account_id", "a").option("api_token", "t")
        .option("database_id", "11111111-2222-3333-4444-555555555555")
        .load()
    } catch { case e: Exception => println("error: " + e.getMessage) }

    println("==== error probe: wayback scan without url filter ====")
    try {
      spark.read.format("wayback").load().select("urlkey").collect()
    } catch { case e: Exception =>
      println("error: " + Option(e.getCause).getOrElse(e).getMessage.linesIterator.next()) }

    spark.stop()
    sys.exit(0)
  }
}
