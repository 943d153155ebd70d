package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Physical-plan assertions: the shapes that matter at 100 TB (broadcasts
  * for dims, partial aggregation, parquet filter/column pushdown, Top-N
  * without global sort) must actually appear in the executed plans — not
  * just be intended.
  */
class PlanQualitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q06 5-way join broadcasts the dimension tables") {
    val p = planOf("q06_join_5way")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("q01 aggregation is partial before the exchange") {
    val p = planOf("q01_pricing_summary")
    assert(p.contains("HashAggregate"), p.take(500))
    assert(p.contains("Exchange hashpartitioning"), p.take(500))
    // partial agg appears below the exchange (two HashAggregate nodes)
    assert("HashAggregate".r.findAllIn(p).length >= 2)
  }

  test("q03 parquet scan pushes filters and prunes columns; TopN without global sort") {
    val p = planOf("q03_filter_topn")
    assert(p.contains("PushedFilters: [IsNotNull(l_discount)") ||
      p.contains("PushedFilters: [IsNotNull"), p.take(1200))
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
    // column pruning: the scan must not read all 11 lineitem columns
    assert(!p.contains("l_returnflag"), "scan read unneeded columns")
  }

  test("q12 distinct-on uses a single window, not groupBy-collect") {
    val p = planOf("q12_distinct_on")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p.take(500))
    assert(!p.contains("CollectList"))
  }

  test("wayback debug scan plans zero input partitions work without exchange") {
    val df = spark.read.format("wayback").option("debug", "true").load()
      .filter(org.apache.spark.sql.functions.col("url") === "example.com")
      .limit(5).select("cdx_url")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BatchScan wayback_machine"), p.take(500))
    assert(!p.contains("Exchange"), "debug URL scan should be exchange-free")
  }

  test("whole-stage codegen covers the rolling-hash expression") {
    val df = graft.queries.load(spark, dir, "documents")
      .select(graft.functions.TextFunctions.rollingHash(
        org.apache.spark.sql.functions.col("text")))
    val p = df.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark whole-stage-codegen stages; the custom
    // expression must sit inside one, not fall back to interpreted eval
    assert(p.contains("*(1) Project [rollinghashexpr"), p.take(500))
  }
}
