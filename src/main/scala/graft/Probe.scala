package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plan-variant probe: times alternative physical strategies for the
  * bench laggards side by side on one dataset dir. Dev tool — the bench
  * artifact stays `graft.Bench`; this exists to measure WHY a plan is
  * slow and which rewrite wins before promoting it into the query defs.
  *
  * Usage: runMain graft.Probe <sfDir> [variant,variant,...]
  */
object Probe {

  private def load(s: SparkSession, d: String, t: String): DataFrame =
    graft.queries.load(s, d, t)

  /** q06 as shipped: 5-way join, fact-fact SMJ on l_orderkey. */
  def q06v0(s: SparkSession, d: String): DataFrame = {
    val li = load(s, d, "lineitem")
    val o = load(s, d, "orders")
    val c = load(s, d, "customer")
    val n = broadcast(load(s, d, "nation"))
    val r = broadcast(load(s, d, "region"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("r_name"))
  }

  /** q06 rewritten: push the aggregation below every join. Each shuffle
    * carries the reduced cardinality of the previous one (60M lineitem →
    * 15M per-order partials → 1.5M per-customer partials → 25 per-nation
    * rows), instead of shuffling and joining full fact rows three times.
    */
  def q06v1(s: SparkSession, d: String): DataFrame = {
    val li = load(s, d, "lineitem")
    val o = load(s, d, "orders")
    val c = load(s, d, "customer")
    val n = broadcast(load(s, d, "nation"))
    val r = broadcast(load(s, d, "region"))
    val perOrder = li
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("rev")).as("rev"), count(lit(1)).as("n_lines"))
    val perCust = perOrder
      .join(o.select(col("o_orderkey"), col("o_custkey")),
        perOrder("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev")).as("rev"), sum(col("n_lines")).as("n_lines"))
    val perNation = perCust
      .join(c.select(col("c_custkey"), col("c_nationkey")),
        perCust("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(sum(col("rev")).as("rev"), sum(col("n_lines")).as("n_lines"))
    perNation
      .join(n, perNation("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(round(sum(col("rev")), 2).as("revenue"),
        sum(col("n_lines")).as("n_lines"))
      .orderBy(col("r_name"))
  }

  /** q08 as shipped: left-semi SMJ customer ⋈ orders. */
  def q08v0(s: SparkSession, d: String): DataFrame = {
    val c = load(s, d, "customer")
    val o = load(s, d, "orders")
    c.join(o.select(col("o_custkey")), c("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_nationkey"))
  }

  /** q08 rewritten: reduce the build side to distinct keys FIRST — the
    * semi join only consumes key existence — then let AQE broadcast the
    * shrunken side so customer never shuffles.
    */
  def q08v1(s: SparkSession, d: String): DataFrame = {
    val c = load(s, d, "customer")
    val keys = load(s, d, "orders").select(col("o_custkey")).distinct()
    c.join(keys, c("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_nationkey"))
  }

  /** q02 as shipped: count/countDistinct/sum/min/max in one agg —
    * Spark plans the distinct via Expand (doubles rows into the first
    * HashAggregate).
    */
  def q02v0(s: SparkSession, d: String): DataFrame = {
    val li = load(s, d, "lineitem")
    li.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      round(sum(col("l_quantity")), 2).as("total_qty"),
      round(min(col("l_extendedprice")), 2).as("min_price"),
      round(max(col("l_extendedprice")), 2).as("max_price"))
  }

  /** q02 rewritten: pre-aggregate per orderkey (no Expand), then fold
    * the partials — n_rows = sum of group counts, n_orders = count of
    * groups.
    */
  def q02v1(s: SparkSession, d: String): DataFrame = {
    val li = load(s, d, "lineitem")
    li.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("c"), sum(col("l_quantity")).as("q"),
        min(col("l_extendedprice")).as("mn"), max(col("l_extendedprice")).as("mx"))
      .agg(
        sum(col("c")).as("n_rows"),
        count(lit(1)).as("n_orders"),
        round(sum(col("q")), 2).as("total_qty"),
        round(min(col("mn")), 2).as("min_price"),
        round(max(col("mx")), 2).as("max_price"))
  }

  private def time(label: String, warm: Int = 3)(f: => DataFrame): Unit = {
    def once(): Double = {
      val t0 = System.nanoTime(); f.collect(); (System.nanoTime() - t0) / 1e9
    }
    val cold = once()
    val runs = (1 to warm).map(_ => once()).sorted
    val med = runs(runs.length / 2)
    println(f"PROBE $label%-28s cold=$cold%6.2fs warm_median=$med%6.2fs")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val only: Set[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSet else Set.empty
    val preferSmj = sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "true")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.join.preferSortMergeJoin", preferSmj)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Seq("lineitem", "orders", "customer", "nation", "region")
      .foreach(t => load(spark, sfDir, t).count())

    val variants: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q06v0" -> (q06v0 _), "q06v1" -> (q06v1 _),
      "q08v0" -> (q08v0 _), "q08v1" -> (q08v1 _),
      "q02v0" -> (q02v0 _), "q02v1" -> (q02v1 _))
    variants.filter { case (k, _) => only.isEmpty || only(k) }.foreach {
      case (k, q) =>
        if (sys.env.contains("SPARK_GRAFT_PROBE_EXPLAIN"))
          q(spark, sfDir).explain("formatted")
        time(s"$k smj=$preferSmj")(q(spark, sfDir))
    }
    spark.stop()
    sys.exit(0)
  }
}
