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

  /** q06 staged with SHUFFLE_HASH builds on the PK sides: same
    * aggregation pushdown as q06v1, but the two fact-side joins hash
    * instead of sort-merging — the aggregate output can never reuse a
    * sort order, so every SMJ here pays two full sorts (45M partials +
    * 45M orders at sf30) that a hash build (bounded per partition by
    * rows/32) avoids. */
  def q06v2(s: SparkSession, d: String): DataFrame = {
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
      .join(o.select(col("o_orderkey"), col("o_custkey")).hint("SHUFFLE_HASH"),
        perOrder("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev")).as("rev"), sum(col("n_lines")).as("n_lines"))
    val perNation = perCust
      .join(c.select(col("c_custkey"), col("c_nationkey")).hint("SHUFFLE_HASH"),
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

  /** q06 join-first: no per-order pre-aggregate at all. lineitem's
    * narrow (l_orderkey, rev) projection hash-joins orders directly
    * (one 180M-row×16B exchange), and the custkey reduction happens as
    * the NEXT aggregate's map-side partial (180M→≤45M per the partition's
    * key count) — trading the 45M-entry per-task hash of the per-order
    * aggregate for one larger but narrow exchange. */
  def q06v3(s: SparkSession, d: String): DataFrame = {
    val li = load(s, d, "lineitem")
    val o = load(s, d, "orders")
    val c = load(s, d, "customer")
    val n = broadcast(load(s, d, "nation"))
    val r = broadcast(load(s, d, "region"))
    val joined = li
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .join(o.select(col("o_orderkey"), col("o_custkey")).hint("SHUFFLE_HASH"),
        col("l_orderkey") === col("o_orderkey"))
    val perCust = joined
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev")).as("rev"), count(lit(1)).as("n_lines"))
    val perNation = perCust
      .join(c.select(col("c_custkey"), col("c_nationkey")).hint("SHUFFLE_HASH"),
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

  /** q02 round-8/9 shipped shape: split the distinct count into its own
    * scan and cross-join the two 1-row results — Expand-free but reads
    * lineitem TWICE; the distinct exchange ships bare keys (~16 B/row)
    * vs q02v1's 5-column partials (~48 B/row).
    */
  def q02v2(s: SparkSession, d: String): DataFrame = {
    val li = load(s, d, "lineitem")
    val basic = li.agg(
      count(lit(1)).as("n_rows"),
      round(sum(col("l_quantity")), 2).as("total_qty"),
      round(min(col("l_extendedprice")), 2).as("min_price"),
      round(max(col("l_extendedprice")), 2).as("max_price"))
    val nd = li.select(col("l_orderkey")).filter(col("l_orderkey").isNotNull)
      .distinct().agg(count(lit(1)).as("n_orders"))
    basic.crossJoin(nd)
      .select(col("n_rows"), col("n_orders"), col("total_qty"),
        col("min_price"), col("max_price"))
  }

  /** q05 round-9 shipped shape: un-aggregated SHUFFLE_HASH chain — the
    * fact side ships every (o_custkey, o_totalprice) row through the
    * exchange to produce 5 groups.
    */
  def q05v0(s: SparkSession, d: String): DataFrame = {
    val o = load(s, d, "orders"); val c = load(s, d, "customer")
    val cProj = c.select(col("c_custkey"), col("c_mktsegment"))
    o.join(cProj.hint("SHUFFLE_HASH"), o("o_custkey") === cProj("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"), count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))
  }

  /** q05 round-10 shape: partial aggregate below the join — the fact
    * exchange ships |custkeys| (sum, count) partials instead.
    */
  def q05v1(s: SparkSession, d: String): DataFrame = {
    val o = load(s, d, "orders"); val c = load(s, d, "customer")
    val cProj = c.select(col("c_custkey"), col("c_mktsegment"))
    val perCust = o.select(col("o_custkey"), col("o_totalprice"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("tp"), count(lit(1)).as("cnt"))
    perCust.join(cProj.hint("SHUFFLE_HASH"),
        perCust("o_custkey") === cProj("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(round(sum(col("tp")), 2).as("revenue"), sum(col("cnt")).as("n"))
      .orderBy(col("c_mktsegment"))
  }

  /** q02 with the distinct count on the ORDERKEY-BUCKETED lineitem copy
    * (requires `buckets` mode): a distinct on the bucket key needs no
    * exchange at all — partial and final aggregate fuse into the scan
    * stage — so the 600M-bare-key shuffle that dominates the plain shape
    * (and whose map-side combine is at the mercy of the file's key
    * adjacency: the round-11 regenerated unordered sf100 lineitem made
    * the plain distinct 2.8x slower in one pass) disappears. The plain
    * aggregate half is already exchange-free on the raw table.
    */
  def q02b(s: SparkSession, d: String): DataFrame = {
    val li = load(s, d, "lineitem")
    val basic = li.agg(
      count(lit(1)).as("n_rows"),
      round(sum(col("l_quantity")), 2).as("total_qty"),
      round(min(col("l_extendedprice")), 2).as("min_price"),
      round(max(col("l_extendedprice")), 2).as("max_price"))
    val nd = s.table("bench_lineitem_bo").select(col("l_orderkey"))
      .filter(col("l_orderkey").isNotNull)
      .distinct().agg(count(lit(1)).as("n_orders"))
    basic.crossJoin(nd)
      .select(col("n_rows"), col("n_orders"), col("total_qty"),
        col("min_price"), col("max_price"))
  }

  /** q19 as shipped: finest-grouping pre-aggregate, then rollup the tiny
    * aggregate. */
  def q19v0(s: SparkSession, d: String): DataFrame = {
    val base = load(s, d, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
    base.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("n")).as("n"))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("flag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("status"), col("n"))
      .orderBy(col("flag"), col("status"))
  }

  /** q19 floor decomposition: the base aggregate WITHOUT the rollup —
    * isolates the Expand-on-6-rows cost (difference vs q19v0). */
  def q19base(s: SparkSession, d: String): DataFrame =
    load(s, d, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))

  /** q19 floor decomposition: raw 2-column scan, no aggregation — the
    * parquet string-decode floor (difference vs q19base = hash-agg cost). */
  def q19scan(s: SparkSession, d: String): DataFrame =
    load(s, d, "lineitem").select(col("l_returnflag"), col("l_linestatus"))

  /** q19 floor decomposition: count(*) — reads no columns; the pure
    * scan-scheduling floor over the same splits. */
  def q19count(s: SparkSession, d: String): DataFrame =
    load(s, d, "lineitem").agg(count(lit(1)).as("n"))

  /** q28 shuffle-path decomposition (run under SPARK_GRAFT_PROBE_BCAST=-1
    * to suppress the broadcast that wins while the key side fits):
    * v0 = unhinted; v1 = plain semi join, SHUFFLE_HASH build on the
    * filtered key side; v2 = pre-aggregate orders per (custkey, status)
    * below the semi join. v2's hazard is the q02 lesson: with ~10 orders
    * per customer the partials are |rows|/10 two-key groups — map-side
    * combine barely reduces and the agg CPU rides on top. */
  def q28v0(s: SparkSession, d: String): DataFrame = {
    val o = load(s, d, "orders"); val c = load(s, d, "customer")
    val rich = c.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
    o.join(rich, o("o_custkey") === rich("c_custkey"), "left_semi")
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
  }
  def q28v1(s: SparkSession, d: String): DataFrame = {
    val o = load(s, d, "orders"); val c = load(s, d, "customer")
    val rich = c.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
    o.select(col("o_custkey"), col("o_orderstatus"))
      .join(rich.hint("SHUFFLE_HASH"), col("o_custkey") === rich("c_custkey"), "left_semi")
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
  }
  def q28v2(s: SparkSession, d: String): DataFrame = {
    val o = load(s, d, "orders"); val c = load(s, d, "customer")
    val rich = c.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
    val perCS = o.select(col("o_custkey"), col("o_orderstatus"))
      .groupBy(col("o_custkey"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"))
    perCS.join(rich.hint("SHUFFLE_HASH"),
        perCS("o_custkey") === rich("c_custkey"), "left_semi")
      .groupBy(col("o_orderstatus")).agg(sum(col("cnt")).as("n"))
      .orderBy(col("o_orderstatus"))
  }

  /** q40 as shipped: split() materializes a token ARRAY per row just to
    * take its size, on every row, before the TopN trims to 500. */
  def q40v0(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"),
        length(col("text")).as("n_chars_computed"))
      .orderBy(col("doc_id")).limit(500)

  /** q40 array-free: n_tokens == (#separators)+1 exactly (split with
    * limit -1 and single-char sep keeps empty pieces, so pieces are
    * always separators+1; DuckDB string_split matches) — count
    * separators by length difference, no per-row array allocation. */
  def q40v1(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents")
      .select(col("doc_id"),
        (length(col("text")) - length(translate(col("text"), " ", "")) + 1)
          .as("n_tokens"),
        length(col("text")).as("n_chars_computed"))
      .orderBy(col("doc_id")).limit(500)

  /** q40 TopN-first: take the 500 smallest doc_ids (carrying text), THEN
    * tokenize 500 rows instead of the whole corpus — the projection a
    * cost-based engine would defer past the limit. */
  def q40v2(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).limit(500)
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"),
        length(col("text")).as("n_chars_computed"))
      .orderBy(col("doc_id"))

  /** q44 as shipped: group on the 32-char md5 hex STRING. */
  def q44v0(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents")
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .orderBy(col("keeper"))

  /** q44 binary-key: group on the 16-byte unhex(md5) binary — halves the
    * exchange's key bytes; hex back only on the surviving dup groups. */
  def q44v1(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents")
      .groupBy(unhex(md5(col("text"))).as("hb"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select(lower(hex(col("hb"))).as("h"), col("keeper"), col("n_copies"))
      .orderBy(col("keeper"))

  /** q17's running-sum window over the CUSTKEY-BUCKETED orders copy
    * (requires `buckets` mode): the window's partitionBy(o_custkey) is
    * satisfied by the bucket layout, so the full-row exchange the plain
    * plan pays disappears — only the within-partition (custkey,
    * orderdate) sort remains.
    */
  def q17b(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Long.MinValue, 0)
    s.table("bench_orders_bc")
      .withColumn("running", round(sum(col("o_totalprice")).over(w), 2))
      .select(col("o_custkey"), col("o_orderkey"), col("running"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
      .limit(300)
  }

  /** q17 as shipped, for the side-by-side. */
  def q17v0(s: SparkSession, d: String): DataFrame =
    graft.SparkEntry.queries("q17_window_running_sum")(s, d)

  /** q12's DISTINCT ON (latest order per customer) on the bucketed copy:
    * same exchange elimination, window row_number()=1. */
  def q12b(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    s.table("bench_orders_bc")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("o_custkey"))
      .limit(200)
  }

  def q12v0(s: SparkSession, d: String): DataFrame =
    graft.SparkEntry.queries("q12_distinct_on")(s, d)

  /** q34 sessionization on the USER-BUCKETED events copy: the window's
    * partitionBy(user_id) and the per-user aggregate both inherit the
    * bucket distribution — the whole query runs exchange-free up to the
    * final sort. */
  def q34b(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    s.table("bench_events_bu")
      .withColumn("sec", col("ts").cast("long"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .withColumn("new_session",
        when(col("gap").isNull || col("gap") > 1800, 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  def q34v0(s: SparkSession, d: String): DataFrame =
    graft.SparkEntry.queries("q34_events_sessions")(s, d)

  /** q36 funnel on the user-bucketed copy: per-user flags aggregate
    * exchange-free; only the tiny 8-group fold shuffles. */
  def q36b(s: SparkSession, d: String): DataFrame =
    s.table("bench_events_bu")
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "signup", 1).otherwise(0)).as("did_signup"),
        max(when(col("event_type") === "click", 1).otherwise(0)).as("did_click"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("did_purchase"))
      .groupBy(col("did_signup"), col("did_click"), col("did_purchase"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("did_signup"), col("did_click"), col("did_purchase"))

  def q36v0(s: SparkSession, d: String): DataFrame =
    graft.SparkEntry.queries("q36_events_funnel")(s, d)

  /** q44 floor decomposition: the md5 compute alone (binary, no
    * group-by, no exchange) — the delta vs q44v1 is the dedup machinery
    * (hash aggregate + exchange of the all-unique key set). */
  def q44scan(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents")
      .select(unhex(md5(col("text"))).as("hb"), col("doc_id"))

  /** xxhash64 floor: same scan shape as q44scan but with the 8-byte
    * hardware-speed hash — the delta vs q44scan is the pure
    * md5-vs-xxhash compute gap that the prehash rewrite banks on. */
  def q44xscan(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents")
      .select(xxhash64(col("text")).as("xh"), col("doc_id"))

  /** q44 cheap-prehash: pass 1 groups on xxhash64(text) (8 bytes,
    * codegen'd xxHash, no MessageDigest) to find COLLIDING hash groups
    * (~0.16% of rows in this corpus at every SF); pass 2 re-scans,
    * broadcast-semi filters to colliding rows, and computes md5 only on
    * those. Oracle semantics unchanged — md5 still decides group
    * identity and emits the output hash; any md5-dup pair has equal
    * text, hence equal xxhash64, hence survives the prefilter. Trades a
    * second text scan + xxhash for skipping md5 on 99.8% of bytes. */
  def q44v2(s: SparkSession, d: String): DataFrame = {
    val docs = load(s, d, "documents")
    val colliding = docs
      .groupBy(xxhash64(col("text")).as("xh"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .select(col("xh"))
    docs
      .join(broadcast(colliding),
        xxhash64(col("text")) === colliding("xh"), "left_semi")
      .groupBy(unhex(md5(col("text"))).as("hb"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select(lower(hex(col("hb"))).as("h"), col("keeper"), col("n_copies"))
      .orderBy(col("keeper"))
  }

  /** q44 prehash without the broadcast hint — the shape for a corpus
    * whose dup-group count outgrows the broadcast budget. */
  def q44v3(s: SparkSession, d: String): DataFrame = {
    val docs = load(s, d, "documents")
    val colliding = docs
      .groupBy(xxhash64(col("text")).as("xh"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .select(col("xh"))
    docs
      .join(colliding, xxhash64(col("text")) === colliding("xh"), "left_semi")
      .groupBy(unhex(md5(col("text"))).as("hb"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select(lower(hex(col("hb"))).as("h"), col("keeper"), col("n_copies"))
      .orderBy(col("keeper"))
  }

  /** q44 SHIPPED shape (round 14): count-gated broadcast — the colliding
    * set is materialized with a capped limit+collect and broadcast as a
    * driver literal when it fits (no probe-side shuffle, no recompute),
    * falling back to q44v3's unhinted semi on overflow. The timed region
    * includes the eager probe job.
    */
  def q44v4(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup
      .collidingTextPrefilter(load(s, d, "documents"), "text")
      .groupBy(unhex(md5(col("text"))).as("hb"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select(lower(hex(col("hb"))).as("h"), col("keeper"), col("n_copies"))
      .orderBy(col("keeper"))

  /** Stage decomposition of the BUCKETED q06 — with no exchange left to
    * blame, attribute its cost to scan vs per-order aggregate vs fact
    * join vs the dimension tail. Requires the bench bucketed tables
    * (built by `buckets` mode in main). Each step adds one plan stage on
    * top of the previous, so the per-stage cost is the delta.
    */
  def q06bScan(s: SparkSession, d: String): DataFrame =
    s.table("bench_lineitem_bo")

  def q06bPerOrder(s: SparkSession, d: String): DataFrame =
    s.table("bench_lineitem_bo")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("rev")).as("rev"), count(lit(1)).as("n_lines"))

  def q06bJoin(s: SparkSession, d: String): DataFrame = {
    val o = s.table("bench_orders_bo").select(col("o_orderkey"), col("o_custkey"))
    q06bPerOrder(s, d)
      .join(o.hint("shuffle_hash"), col("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev")).as("rev"), sum(col("n_lines")).as("n_lines"))
  }

  def q06bFull(s: SparkSession, d: String): DataFrame =
    graft.Bench.extras("q06_join_5way_bucketed")(s, d)

  /** q06 bucketed WITHOUT the per-order pre-aggregate: both bucketed
    * scans are single-file sorted-by-key buckets, so a MERGE join here
    * needs no exchange AND no sort — a pure streaming merge of
    * pre-sorted files. Trades the pre-agg's 180M→45M reduction (which
    * only feeds the join, not an exchange) for skipping the 45M-group
    * hash aggregate and the per-bucket hash build entirely.
    */
  def q06bSmj(s: SparkSession, d: String): DataFrame = {
    val li = s.table("bench_lineitem_bo")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    val o = s.table("bench_orders_bo").select(col("o_orderkey"), col("o_custkey"))
    val c = load(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
    val n = broadcast(load(s, d, "nation"))
    val r = broadcast(load(s, d, "region"))
    val perCust = li.join(o.hint("merge"), col("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev")).as("rev"), count(lit(1)).as("n_lines"))
    perCust.join(c, perCust("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(round(sum(col("rev")), 2).as("revenue"),
        sum(col("n_lines")).as("n_lines"))
      .orderBy(col("r_name"))
  }

  /** q06 bucketed JOIN-FIRST: skip the per-order pre-aggregate entirely
    * and aggregate once, by custkey, after the fact join — one hash
    * aggregate over 600M rows instead of a 150M-group aggregate PLUS a
    * 150M-row join plus a second aggregate. The join itself stays
    * exchange-free (both sides bucketed on orderkey, shuffle_hash
    * builds orders per bucket); this is the shape a single-node
    * columnar engine runs, so it measures whether the pre-agg is
    * paying for itself on the bucketed layout.
    */
  def q06bJoinFirst(s: SparkSession, d: String): DataFrame = {
    val li = s.table("bench_lineitem_bo")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    val o = s.table("bench_orders_bo").select(col("o_orderkey"), col("o_custkey"))
    val c = load(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
    val n = broadcast(load(s, d, "nation"))
    val r = broadcast(load(s, d, "region"))
    val perCust = li
      .join(o.hint("shuffle_hash"), col("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev")).as("rev"), count(lit(1)).as("n_lines"))
    perCust.join(c, perCust("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(round(sum(col("rev")), 2).as("revenue"),
        sum(col("n_lines")).as("n_lines"))
      .orderBy(col("r_name"))
  }

  /** The customer→region dim chain collapsed to one narrow broadcastable
    * map: customer(c_custkey, c_nationkey) ⋈ nation ⋈ region →
    * (c_custkey, r_name). |customer| rows × (long, short string).
    */
  private def custRegionMap(s: SparkSession, d: String): DataFrame = {
    val c = load(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
    val n = broadcast(load(s, d, "nation"))
    val r = broadcast(load(s, d, "region"))
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .select(col("c_custkey"), col("r_name"))
  }

  /** q06 bucketed, DIM CHAIN BROADCAST AS ONE MAP (round 19, VERDICT r18
    * #4 audit): the colocated li⋈o hash join flows through a broadcast
    * (c_custkey → r_name) lookup straight into the 5-group aggregate —
    * ZERO exchanges end to end (no 600M-row custkey exchange, no perCust
    * hash aggregate, no customer-side exchange; the 5-group agg is
    * map-side-combined to ≤5 rows/partition). Price: one broadcast build
    * of |customer| entries (15M × two narrow columns at sf100) — the
    * standard dim-broadcast a 1000-executor cluster makes when the dim
    * fits executor memory; per-executor cost is the same hash table the
    * shuffled join would build, minus the exchange.
    */
  def q06bBcastMap(s: SparkSession, d: String): DataFrame = {
    val li = s.table("bench_lineitem_bo")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    val o = s.table("bench_orders_bo").select(col("o_orderkey"), col("o_custkey"))
    val cr = custRegionMap(s, d)
    li.join(o.hint("shuffle_hash"), col("l_orderkey") === o("o_orderkey"))
      .join(broadcast(cr), col("o_custkey") === cr("c_custkey"))
      .groupBy(col("r_name"))
      .agg(round(sum(col("rev")), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("r_name"))
  }

  /** Decomposition control for [[q06bBcastMap]]: KEEP the per-custkey
    * aggregate (the shipped shape's 600M→15M exchange) but broadcast the
    * dim map for the second hop — isolates whether the gap is the
    * custkey exchange+aggregate or the customer-side join.
    */
  def q06bAggBcast(s: SparkSession, d: String): DataFrame = {
    val li = s.table("bench_lineitem_bo")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    val o = s.table("bench_orders_bo").select(col("o_orderkey"), col("o_custkey"))
    val cr = custRegionMap(s, d)
    val perCust = li
      .join(o.hint("shuffle_hash"), col("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev")).as("rev"), count(lit(1)).as("n_lines"))
    perCust.join(broadcast(cr), perCust("o_custkey") === cr("c_custkey"))
      .groupBy(col("r_name"))
      .agg(round(sum(col("rev")), 2).as("revenue"),
        sum(col("n_lines")).as("n_lines"))
      .orderBy(col("r_name"))
  }

  /** Cross-corpus MinHash dedup at bench scale: split documents odd/even
    * on doc_id (new batch vs reference) and count verified cross pairs —
    * the at-scale timing point for q96's kernel (the gate runs at
    * sf0.01). Replicated SFs make every odd doc a near-dup of its even
    * replicas, so pair volume here is an upper bound on real-corpus
    * density at the same size.
    */
  /** SPARK_GRAFT_PROBE_Q96_SPLIT=m: batch = doc_id % m == 1, reference =
    * the rest. m=2 (default) is the symmetric kernel point; m=10 is the
    * deployment shape (daily batch ≈ lake/10) where the index A/B's
    * question — does batch cost still include lake signature time? —
    * actually has a measurable answer.
    */
  private def q96split(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val m = sys.env.getOrElse("SPARK_GRAFT_PROBE_Q96_SPLIT", "2").toInt
    val docs = load(s, d, "documents")
    (docs.filter(col("doc_id") % m === 1), docs.filter(col("doc_id") % m =!= 1))
  }

  def q96scale(s: SparkSession, d: String): DataFrame = {
    val (batch, ref) = q96split(s, d)
    graft.operators.Dedup.minhashLshAgainstPairs(
        batch, ref, "text", "doc_id", threshold = 0.8)
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** q96 through the PERSISTED index (Dedup.lshBuild +
    * minhashLshIndexPairs): same split and pair count as q96scale, but
    * the reference side's signatures come from the stored index. The
    * one-time build is timed separately (and skipped when a
    * provenance-matching index survives from a previous pass), so the
    * warm timings here are the per-BATCH cost a daily ingest pays — the
    * A/B against q96scale is exactly the lake-signature recompute the
    * index removes. At SPLIT=10 the batch's band rows cross the 1M
    * broadcast gate between sf10 (50k docs × 16 = 800k: broadcast the
    * batch, zero lake shuffle) and sf30 (150k × 16 = 2.4M: sort-merge),
    * so the two SFs exercise both join regimes; sf100 is the density
    * pathology where the path-independent verify stage dominates every
    * shape (round-15 numbers + analysis in SCALE.md).
    */
  /** The expected provenance stamp's docs count, memoized per dataset
    * dir for the JVM lifetime — within one JVM the corpus at a path is
    * immutable, and without the memo every warm q96index invocation
    * paid a count() job the old _SUCCESS-exists check did not.
    */
  private val probeStampCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build-or-reuse the probe's persisted LSH index for `d`'s reference
    * half, PROVENANCE-GUARDED (the registerExisting pattern): the cache
    * key is (dataset dir name, split modulus, bucket count), but a
    * surviving index is reused only if its stamp matches the corpus
    * actually AT that path now — absolute sfDir plus the documents row
    * count (footer-only) — so a regenerated corpus under the same dir
    * name forces a rebuild instead of silently joining a stale index.
    * SPARK_GRAFT_PROBE_IDX_BUCKETS=nb builds the (band, bucket)-bucketed
    * layout (separate cache entry). Returns (indexPath, buildSeconds —
    * 0 when reused).
    */
  private def ensureProbeIndex(s: SparkSession, d: String): (String, Double) = {
    val m = sys.env.getOrElse("SPARK_GRAFT_PROBE_Q96_SPLIT", "2")
    val nb = sys.env.getOrElse("SPARK_GRAFT_PROBE_IDX_BUCKETS", "0").toInt
    val idx = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_probe_lsh_idx_${new java.io.File(d).getName}_m${m}_b$nb")
      .getAbsolutePath
    val dAbs = new java.io.File(d).getAbsolutePath
    def expected: String = probeStampCache.computeIfAbsent(dAbs,
      _ => s"sfDir=$dAbs;docs=${load(s, d, "documents").count()}")
    val stampFile = new java.io.File(idx, "_GRAFT_PROVENANCE")
    val stamp = scala.util.Try(scala.util.Using.resource(
      scala.io.Source.fromFile(stampFile))(_.mkString.trim)).toOption
    // cheap existence checks FIRST; the count behind `expected` runs
    // only when there is a surviving index to adjudicate (then once per
    // JVM), or when a rebuild must write a fresh stamp
    if (new java.io.File(s"$idx/meta/_SUCCESS").exists() &&
        stamp.isDefined && stamp.contains(expected)) (idx, 0.0)
    else {
      if (new java.io.File(idx).exists())
        println(s"PROBE q96index_reuse_refused stamp=$stamp expected=$expected")
      val (_, ref) = q96split(s, d)
      val t0 = System.nanoTime()
      graft.operators.Dedup.lshBuild(ref, "text", "doc_id", idx,
        bandBuckets = nb)
      val sec = (System.nanoTime() - t0) / 1e9
      val w = new java.io.PrintWriter(stampFile)
      try w.print(expected) finally w.close()
      println(f"PROBE q96index_build nb=$nb%-4d       $sec%6.2fs -> $idx")
      (idx, sec)
    }
  }

  def q96index(s: SparkSession, d: String): DataFrame = {
    val (batch, _) = q96split(s, d)
    val (idx, _) = ensureProbeIndex(s, d)
    graft.operators.Dedup.minhashLshIndexPairs(
        batch, idx, "text", "doc_id", threshold = 0.8)
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** RECRAWL-shaped ingest batch: ~5/6 byte-identical refetches of lake
    * docs (re-ided — the daily-crawl reality, where most fetches return
    * what the lake already holds) + a novel tail (every 5th original
    * batch doc). The q96recrawl A/B prices the same batch through the
    * LSH-only loop (signs ALL of it) vs the fingerprint loop's exact
    * stages + LSH on survivors (signs the novel tail only).
    */
  private def recrawlBatch(s: SparkSession, d: String): DataFrame =
    recrawlBatchCols(s, d, Seq("doc_id", "text"))

  /** The same recrawl shape with a caller-chosen projection — qs12pipe
    * needs (lang, source) for the curation tail; recrawlBatch keeps its
    * historical 2-column scan so the committed q96recrawl_* numbers stay
    * comparable.
    */
  private def recrawlBatchCols(s: SparkSession, d: String,
                               cols: Seq[String]): DataFrame = {
    val m = sys.env.getOrElse("SPARK_GRAFT_PROBE_Q96_SPLIT", "2").toInt
    val docs = load(s, d, "documents").select(cols.map(col): _*)
    val novel = docs.filter(col("doc_id") % (5 * m) === 1)
    val refetch = docs.filter(col("doc_id") % m =!= 1 && col("doc_id") % 9 === 2)
      .withColumn("doc_id", col("doc_id") + lit(2000000000L))
    novel.unionByName(refetch)
  }

  /** Ensure the probe index carries the fingerprint sidecar (built once
    * from the same reference half; reused passes skip it like the index
    * build itself).
    */
  private def ensureProbeFps(s: SparkSession, d: String): String = {
    val (idx, _) = ensureProbeIndex(s, d)
    if (!new java.io.File(idx, "fps").exists()) {
      val (_, ref) = q96split(s, d)
      val t0 = System.nanoTime()
      graft.operators.Dedup.lshWriteFingerprints(ref, "text", idx)
      println(f"PROBE q96recrawl_sidecar_build ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    idx
  }

  def q96recrawlLsh(s: SparkSession, d: String): DataFrame = {
    val (idx, _) = ensureProbeIndex(s, d)
    graft.operators.Dedup.dedupAgainstIndex(
        recrawlBatch(s, d), idx, "text", "doc_id")
      .agg(count(lit(1)).as("n_kept"))
  }

  def q96recrawlFp(s: SparkSession, d: String): DataFrame = {
    val idx = ensureProbeFps(s, d)
    graft.operators.Dedup.dedupAgainstIndexFingerprinted(
        recrawlBatch(s, d).withColumn("fp", xxhash64(col("text"))),
        idx, "text", "doc_id", "fp")
      .agg(count(lit(1)).as("n_kept"))
  }

  /** Paragraph-dedup A/B (round 17): q87full prices the CCNet
    * boilerplate pass as the FULL-CORPUS recompute (keep-first over
    * lake ∪ batch — what a non-incremental pipeline re-runs every
    * ingest), q87store prices the same batch (the q96split batch half)
    * as the DAY-2 stage: one membership join of the batch's unit keys
    * against the prebuilt seen-unit store plus the batch-internal
    * keeper. Both force the complete rewrite (the aggregate reads
    * `clean_text`, so the reassembly cannot be pruned). The two differ
    * in tie-break priority (the store gives the lake's copy priority;
    * the recompute uses global `(id, pos)`) — a cost A/B, not an output
    * diff; output equivalence with lake-priority ids is spec-pinned.
    * 16-word windows — the replicated fixture's structureless mode.
    */
  private def paraUnits = graft.operators.ParagraphDedup.unitsByWordWindow(_: org.apache.spark.sql.Column, 16)

  private def ensureProbeUnitStore(s: SparkSession, d: String): String = {
    val m = sys.env.getOrElse("SPARK_GRAFT_PROBE_Q96_SPLIT", "2")
    val store = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_probe_unit_store_${new java.io.File(d).getName}_m$m")
      .getAbsolutePath
    val dAbs = new java.io.File(d).getAbsolutePath
    def expected: String = probeStampCache.computeIfAbsent(dAbs,
      _ => s"sfDir=$dAbs;docs=${load(s, d, "documents").count()}")
    val stampFile = new java.io.File(store, "_GRAFT_PROVENANCE")
    val stamp = scala.util.Try(scala.util.Using.resource(
      scala.io.Source.fromFile(stampFile))(_.mkString.trim)).toOption
    if (new java.io.File(s"$store/meta/_SUCCESS").exists() &&
        stamp.isDefined && stamp.contains(expected)) store
    else {
      val (_, ref) = q96split(s, d)
      val t0 = System.nanoTime()
      graft.operators.ParagraphDedup.unitStoreBuild(ref, "doc_id", "text",
        paraUnits, store, buckets = 32)
      println(f"PROBE q87store_build              ${(System.nanoTime() - t0) / 1e9}%6.2fs -> $store")
      val w = new java.io.PrintWriter(stampFile)
      try w.print(expected) finally w.close()
      store
    }
  }

  private def paraSummary(df: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("n_docs"),
      sum(col("n_units")).as("n_units"),
      sum(col("n_dropped")).as("n_dropped"),
      sum(length(col("clean_text"))).as("sum_clean_chars"))

  /** The qs11 pipeline's per-batch accept computation end to end on the
    * recrawl-shaped batch — exact stages (stored fp) → LSH vs the
    * persisted index → paragraph rewrite vs the seen-unit store — to
    * measure the composition claim (SCALE.md: "costs the sum of its
    * stages") against the stage probes q96recrawl_fp and q87store.
    */
  def q87pipe(s: SparkSession, d: String): DataFrame = {
    val idx = ensureProbeFps(s, d)
    val store = ensureProbeUnitStore(s, d)
    val batch = recrawlBatch(s, d).withColumn("fp", xxhash64(col("text")))
    // run ONE full per-batch cycle eagerly, exactly as the loop does —
    // accepted PERSISTED across the paragraph stage's consumers then
    // released (a lazy composition would recompute the accept per
    // consumer and measure a shape the loop never runs)
    val accepted = graft.operators.Dedup.dedupAgainstIndexFingerprinted(
      batch, idx, "text", "doc_id", "fp").persist()
    try {
      val rows = paraSummary(graft.operators.ParagraphDedup.dedupAgainstStore(
        accepted, "doc_id", "text", paraUnits, " ", store)).collect()
      s.createDataFrame(
        s.sparkContext.parallelize(rows.toIndexedSeq, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("n_docs",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_units",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_dropped",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("sum_clean_chars",
            org.apache.spark.sql.types.LongType))))
    } finally accepted.unpersist(): Unit
  }

  def q87full(s: SparkSession, d: String): DataFrame =
    paraSummary(graft.operators.ParagraphDedup.dedup(
      load(s, d, "documents"), "doc_id", "text", paraUnits, " "))

  // ---- qs12 composition pricing (round 19, VERDICT r18 #3) -----------
  // The shards pipeline's per-batch cost was argued from its stages'
  // prices but never measured as a composition. qs12tail prices the
  // CURATION TAIL alone (q86 chain on a pre-landed cleaned batch →
  // sorted language-partitioned shards); qs12pipe prices the whole
  // per-batch cycle (fp-exact → LSH-vs-index → paragraph rewrite →
  // cleaned files → tail), exactly the foreachBatch body of
  // runIngestPipelineToShardsAsStream minus the two store APPENDS
  // (batch-proportional writes priced by their own loops — the q87pipe
  // precedent). Composition claim to check: qs12pipe ≈ q96recrawl_fp +
  // q87store + qs12tail + the accept-set persist barrier.

  /** q86 params exactly as the qs12 gate wires them. */
  private def qs12Bench(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents").filter(col("doc_id") % 31 === 0)
      .select(col("text").as("clean_text"))

  private def qs12Tail(s: SparkSession, d: String, cleaned: DataFrame,
                       attrs: DataFrame, shardsDir: String): Unit = {
    val curInput = cleaned.join(attrs, "doc_id")
    val curated = graft.operators.Curate.curate(
      curInput, qs12Bench(s, d), "doc_id", "clean_text", "lang", "source",
      minWords = 20, minUniqRatio = 0.25, sampleNumerator = 128,
      weights = Map("src0" -> 2.0, "src1" -> 0.5), packBudget = 2000L)
    graft.operators.ShardWriter.writeShards(curated, shardsDir, "lang",
      Seq("bin", "doc_id", "replica")): Unit
  }

  /** One-time landing of a paragraph-stage output for the tail-only
    * probe: cleaned files + (lang, source) attributes — the tail's two
    * inputs, stamped like the other probe fixtures. Input is the
    * q96split BATCH HALF through the store rewrite (q87store's exact
    * stage), NOT the recrawl batch: at replicated SFs the recrawl
    * batch's LSH accept set collapses to ~nothing (every novel doc
    * near-dups its lake replicas — the disclosed replica-density
    * artifact), and a tail priced on an empty set measures only
    * machinery. The batch half stays batch-proportional at every SF.
    */
  private def ensureProbeCleanBatch(s: SparkSession, d: String): String = {
    val m = sys.env.getOrElse("SPARK_GRAFT_PROBE_Q96_SPLIT", "2")
    val base = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_probe_clean_batch_${new java.io.File(d).getName}_m$m")
      .getAbsolutePath
    val dAbs = new java.io.File(d).getAbsolutePath
    def expected: String = probeStampCache.computeIfAbsent(dAbs,
      _ => s"sfDir=$dAbs;docs=${load(s, d, "documents").count()}")
    val stampFile = new java.io.File(base, "_GRAFT_PROVENANCE")
    val stamp = scala.util.Try(scala.util.Using.resource(
      scala.io.Source.fromFile(stampFile))(_.mkString.trim)).toOption
    if (new java.io.File(s"$base/cleaned/_SUCCESS").exists() &&
        stamp.isDefined && stamp.contains(expected)) base
    else {
      val store = ensureProbeUnitStore(s, d)
      val t0 = System.nanoTime()
      val mInt = m.toInt
      val batch = load(s, d, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
        .filter(col("doc_id") % mInt === 1)
      graft.operators.ParagraphDedup.dedupAgainstStore(
          batch, "doc_id", "text", paraUnits, " ", store)
        .write.mode("overwrite").parquet(s"$base/cleaned")
      batch.select(col("doc_id"), col("lang"), col("source"))
        .write.mode("overwrite").parquet(s"$base/attrs")
      println(f"PROBE qs12_clean_batch_build      ${(System.nanoTime() - t0) / 1e9}%6.2fs -> $base")
      val w = new java.io.PrintWriter(stampFile)
      try w.print(expected) finally w.close()
      base
    }
  }

  /** One-row shard summary, collected eagerly so `time`'s noop write
    * re-runs nothing (the q87pipe return pattern). Schema is explicit so
    * an EMPTY shard landing (the recrawl batch's accept set at
    * replicated SFs) reads as zero rows instead of failing inference.
    */
  private def shardSummary(s: SparkSession, shardsDir: String): DataFrame = {
    val rows = s.read
      .schema("bin LONG, tokens INT") // Curate: bin=floor() long, tokens=size() int
      .parquet(shardsDir)
      .agg(count(lit(1)).as("n_packed"),
        sum(col("tokens")).cast("long").as("sum_tokens")).collect()
    s.createDataFrame(
      s.sparkContext.parallelize(rows.toIndexedSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n_packed",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("sum_tokens",
          org.apache.spark.sql.types.LongType))))
  }

  def qs12tail(s: SparkSession, d: String): DataFrame = {
    val base = ensureProbeCleanBatch(s, d)
    val shards = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_probe_qs12tail_shards").getAbsolutePath
    qs12Tail(s, d, s.read.parquet(s"$base/cleaned"),
      s.read.parquet(s"$base/attrs"), shards)
    shardSummary(s, shards)
  }

  def qs12pipe(s: SparkSession, d: String): DataFrame = {
    val idx = ensureProbeFps(s, d)
    val store = ensureProbeUnitStore(s, d)
    val batch = recrawlBatchCols(s, d, Seq("doc_id", "text", "lang", "source"))
      .withColumn("fp", xxhash64(col("text")))
    // one full per-batch cycle eagerly, exactly as the loop runs it:
    // accepted persisted across its three consumers (LSH stage output →
    // paragraph stage → attribute join-back), cleaned landed to files
    // and the tail reading them BACK (the pipeline's own shape — no
    // recompute of the rewrite join)
    val accepted = graft.operators.Dedup.dedupAgainstIndexFingerprinted(
      batch, idx, "text", "doc_id", "fp").persist()
    try {
      val out = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_probe_qs12pipe_cleaned").getAbsolutePath
      graft.operators.ParagraphDedup.dedupAgainstStore(
          accepted, "doc_id", "text", paraUnits, " ", store)
        .write.mode("overwrite").parquet(out)
      val shards = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_probe_qs12pipe_shards").getAbsolutePath
      // schema-explicit read: at replicated SFs the recrawl batch's
      // accept set is ~empty (replica-density artifact, disclosed) and
      // an empty landing must measure as zero rows, not fail inference
      qs12Tail(s, d, s.read
          .schema("doc_id LONG, n_units LONG, n_dropped LONG, clean_text STRING")
          .parquet(out),
        accepted.select(col("doc_id"), col("lang"), col("source")), shards)
      shardSummary(s, shards)
    } finally accepted.unpersist(): Unit
  }

  /** VERDICT r18 probe #4: q87's keep-first aggregate, `min(struct)`
    * (plans as a SORT aggregate — struct buffers aren't hash-agg
    * mutable) vs a PACKED-LONG `min(id·2²¹ + pos)` that hash-aggregates.
    * The packed form is an upper bound on the decomposition win: it is
    * only valid when ids < 2⁴² and per-doc unit counts < 2²¹ (true of
    * every bench fixture; NOT general — arbitrary long ids overflow),
    * so it ships only if the A/B shows a real margin worth a guarded
    * fallback. Same unit-keys exchange, same join-back/drops/rewrite.
    */
  def q87aggPacked(s: SparkSession, d: String): DataFrame = {
    import graft.operators.ParagraphDedup
    val df = load(s, d, "documents")
    val keyed = ParagraphDedup.unitKeys(df, "doc_id", "text", paraUnits)
      .repartition(col("__h"))
    val packed = col("__id") * lit(1L << 21) + col("__pos")
    val firsts = keyed.groupBy(col("__h")).agg(min(packed).as("__firstp"))
    val drops = keyed
      .join(firsts.hint("SHUFFLE_HASH"), Seq("__h"))
      .filter(packed =!= col("__firstp"))
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(col("__pos"))).as("__drop"))
    paraSummary(ParagraphDedup.rewriteWithDrops(
      df, "doc_id", "text", paraUnits, " ", drops))
  }

  /** VERDICT r18 #7 A/B: the rewrite's drop-list membership on a
    * HIGH-DROP fixture — the old per-element `array_contains` probe
    * (O(units × drops) per doc) vs the shipped `array_except`
    * set-difference (O(units + drops)). Synthetic worst case: every doc
    * ~all boilerplate (2000 units, 87.5% dropped) — the shape the old
    * code went quadratic on. Ignores `d`.
    */
  private def q87rwFixture(s: SparkSession): DataFrame =
    s.range(200).select(col("id"),
      expr("transform(sequence(0, 1999), i -> concat('unit_', CAST(i % 7 AS STRING)))").as("__us"),
      expr("filter(sequence(0, 1999), i -> i % 8 != 0)").as("__drop"))

  private def q87rwTail(df: DataFrame, keptIdx: org.apache.spark.sql.Column): DataFrame =
    df.select(col("id"),
      length(array_join(transform(keptIdx,
        i => element_at(col("__us"), i + lit(1))), " ")).as("n"))
      .agg(sum(col("n")).as("sum_chars"))

  def q87rwLinear(s: SparkSession, d: String): DataFrame = {
    val kept = filter(sequence(lit(0), size(col("__us")) - lit(1)),
      i => not(array_contains(col("__drop"), i)))
    q87rwTail(q87rwFixture(s), kept)
  }

  def q87rwExcept(s: SparkSession, d: String): DataFrame = {
    val kept = array_except(
      sequence(lit(0), size(col("__us")) - lit(1)), col("__drop"))
    q87rwTail(q87rwFixture(s), kept)
  }

  /** VERDICT r18 probe #3: the MinHash signature pass — ScalaUDF vs the
    * native [[graft.functions.MinHashSig]] expression — over the full
    * documents table at q47's default family (numPerm=128, k=3). The
    * arithmetic is identical; the delta is the UDF wrapper (catalyst↔
    * Scala converters incl. 128 boxed longs per row on output, per-row
    * closure dispatch). Ship bar: ≥15% under campaign methodology.
    */
  def q47sigUdf(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents").select(
      graft.operators.Dedup.signatureForProfile(128, 3)(col("text")).as("sig"))

  def q47sigKern(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents").select(
      graft.functions.MinHashSig.sig(col("text"), 128, 3).as("sig"))

  /** Same A/B for the VERIFY-HASH pass (sorted distinct 64-bit shingle
    * hashes) — the other per-doc UDF of the LSH family.
    */
  def q47hashUdf(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents").select(
      graft.operators.Dedup.shingleHashesForProfile(3)(col("text")).as("sh"))

  def q47hashKern(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents").select(
      graft.functions.MinHashSig.shingleHashes(col("text"), 3).as("sh"))

  /** Same A/B for the SIMHASH fold (q49's signature pass): the UDF
    * chain (Spark split → array→Seq conversion → fold) vs the kernel
    * (one Java split + fold, long out).
    */
  def q49sigUdf(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents").select(
      graft.operators.Dedup.simhashUdfForParity(col("text")).as("sig"))

  def q49sigKern(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents").select(
      graft.functions.MinHashSig.simhash64(lower(trim(col("text")))).as("sig"))

  /** r19 plan-fix A/B (filter-pushdown kernel duplication): the
    * rounds-1..18 bandRows spelling — an explicit filter(sig.isNotNull)
    * that the optimizer pushes below the repartition exchange as
    * `isnotnull(minhash_sig(text))`, (a) running the signature kernel
    * TWICE per doc and (b) splitting the corpus scan into two
    * un-reusable text exchanges (the verify branch's scan filter no
    * longer matches). The shipped shape (q47pairs_new) guards the band
    * explode with `when(sig.isNotNull, …)` instead — posexplode of a
    * null array emits nothing, so band rows are byte-identical with no
    * pushable predicate. Interleave old/new in one JVM.
    */
  def q47pairsOld(s: SparkSession, d: String): DataFrame = {
    val par = s.conf.get("spark.sql.shuffle.partitions").toInt
    val src = load(s, d, "documents")
    val base = src.select(col("doc_id").as("id"), col("text").as("__text"))
      .repartition(math.max(par, src.rdd.getNumPartitions))
    val banded = base
      .withColumn("sig", graft.functions.MinHashSig.sig(col("__text"), 128, 3))
      .filter(col("sig").isNotNull)
      .select(col("id"), posexplode(transform(sequence(lit(0), lit(15)),
        b => hash(slice(col("sig"), b * lit(8) + 1, lit(8)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val left = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val right = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val candidates = left.join(right.hint("MERGE"), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).dropDuplicates("id_a", "id_b")
    val hashed = base.select(col("id"),
      graft.operators.Dedup.shingleHashesForProfile(3)(col("__text")).as("__sh"))
    val ta = hashed.select(col("id").as("id_a"), col("__sh").as("__sh_a"))
    val tb = hashed.select(col("id").as("id_b"), col("__sh").as("__sh_b"))
    candidates.join(ta, "id_a").join(tb, "id_b")
      .select(col("id_a"), col("id_b"),
        graft.functions.JaccardExpressions.sortedJaccard(
          col("__sh_a"), col("__sh_b")).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
  }

  def q47pairsNew(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup.minhashLshPairs(
      load(s, d, "documents"), "text", "doc_id", 0.8)

  /** r19 plan-fix A/B for q49: the old spelling had no explicit null
    * filter, but the hamming filter's isnotnull(sig) constraint was
    * INFERRED and pushed below the repartition as
    * `isnotnull(simhash64(...))` — kernel twice per doc. The shipped
    * shape filters text.isNotNull explicitly (cheap, parquet-pushed)
    * and declares the signature KnownNotNull, so nothing is inferred.
    */
  def q49pairsOld(s: SparkSession, d: String): DataFrame = {
    val par = s.conf.get("spark.sql.shuffle.partitions").toInt
    val df = load(s, d, "documents")
    graft.operators.Dedup.simhashPairsOnSigs(
      df.repartition(math.max(par, df.rdd.getNumPartitions))
        .select(col("doc_id").as("id"),
          graft.operators.Dedup.simhash(col("text")).as("sig")),
      maxDistance = 3, pieces = 8)
  }

  def q49pairsNew(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup.simhashPairs(
      load(s, d, "documents"), "text", "doc_id", maxDistance = 3, pieces = 8)

  /** r19 plan-fix A/B for q81: the old filter referenced __tfs once per
    * term (OR-chain), and pushdown through the projection substituted
    * the term_hits kernel into every reference — 5 kernel evals per doc
    * at 4 terms. The shipped filter is `exists(__tfs, _ > 0)` — one
    * reference, one pushed eval.
    */
  def q81bm25Old(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TermHits
    val terms = Seq("spark", "vector", "hash", "stream")
    val (k1, b) = (1.2, 0.75)
    val docs = load(s, d, "documents").select(col("doc_id"),
      TermHits.termHits(lower(col("text")), terms).as("__h"))
      .select(col("doc_id"), col("__h.dl").cast("double").as("__dl"),
        col("__h.tfs").as("__tfs"))
    val dfCols = terms.indices.map(i => sum(when(col("__tfs")(i) > 0, 1)
      .otherwise(0)).cast("double").as(s"__df$i"))
    val stats = docs.agg(count(lit(1)).cast("double").as("__n"),
      (avg(col("__dl")).as("__avgdl") +: dfCols): _*)
    val score: org.apache.spark.sql.Column = terms.indices.map { i =>
      val tf = col("__tfs")(i).cast("double")
      val idf = log(lit(1.0) +
        (col("__n") - col(s"__df$i") + 0.5) / (col(s"__df$i") + 0.5))
      when(col("__tfs")(i) > 0,
        idf * tf * lit(k1 + 1.0) / (tf + lit(k1) *
          (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    docs.filter(terms.indices.map(i => col("__tfs")(i) > 0).reduce(_ || _))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), round(score, 3).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  def q81bm25New(s: SparkSession, d: String): DataFrame =
    graft.operators.Bm25.topK(load(s, d, "documents"),
      "doc_id", "text", Seq("spark", "vector", "hash", "stream"), k = 20)

  /** r19 exchange-sharing probe for q80: the census branch (per-gram
    * doc-count) prunes to [gram] only, so its extraction subtree cannot
    * reuse the join branch's repartition exchange — the gram-extraction
    * kernel runs twice and the corpus crosses two exchanges. Variant:
    * count `struct(__id, __cnt)` instead of `lit(1)` — identical count
    * (a struct is never null), but the aggregate now references every
    * column of the shared projection, pruning matches, and the second
    * subtree becomes a ReusedExchange of the first: ONE extraction, ONE
    * gram exchange for the whole census.
    */
  def q80reuse(s: SparkSession, d: String): DataFrame = {
    val docs = load(s, d, "documents")
    val n = 16
    val gramCounts = docs.filter(length(col("text")) >= n)
      .select(col("doc_id").as("__id"),
        explode(graft.functions.GramHash.gramHashCounts(col("text"), n, 4))
          .as("__g"))
      .select(col("__id"), col("__g.gram").as("gram"), col("__g.cnt").as("__cnt"))
      .repartition(col("gram"))
    val dupGrams = gramCounts.groupBy(col("gram"))
      .agg(count(struct(col("__id"), col("__cnt"))).as("__nd"))
      .filter(col("__nd") >= 2)
      .select(col("gram"), lit(1).as("__dup"))
    gramCounts.join(dupGrams.hint("SHUFFLE_HASH"), Seq("gram"), "left")
      .groupBy(col("__id").as("doc_id"))
      .agg(sum(col("__cnt")).as("n_grams"),
        sum(when(col("__dup").isNotNull, col("__cnt")).otherwise(lit(0L)))
          .cast("long").as("n_dup"))
      .withColumn("dup_frac",
        round(col("n_dup").cast("double") / col("n_grams"), 4))
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_dup")).cast("long").as("total_dup"),
        round(avg(col("dup_frac")), 4).as("avg_dup_frac"))
      .orderBy(col("lang"))
  }

  /** The rounds-8..18 q80 shape, inlined so the A/B survives shipping
    * the reuse fix: dupGrams counts `lit(1)`, pruning its branch to
    * [gram] — the extraction subtree diverges from the join branch's
    * and the kernel+exchange run twice.
    */
  def q80old(s: SparkSession, d: String): DataFrame = {
    val docs = load(s, d, "documents")
    val n = 16
    val gramCounts = docs.filter(length(col("text")) >= n)
      .select(col("doc_id").as("__id"),
        explode(graft.functions.GramHash.gramHashCounts(col("text"), n, 4))
          .as("__g"))
      .select(col("__id"), col("__g.gram").as("gram"), col("__g.cnt").as("__cnt"))
      .repartition(col("gram"))
    val dupGrams = gramCounts.groupBy(col("gram"))
      .agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= 2)
      .select(col("gram"), lit(1).as("__dup"))
    gramCounts.join(dupGrams.hint("SHUFFLE_HASH"), Seq("gram"), "left")
      .groupBy(col("__id").as("doc_id"))
      .agg(sum(col("__cnt")).as("n_grams"),
        sum(when(col("__dup").isNotNull, col("__cnt")).otherwise(lit(0L)))
          .cast("long").as("n_dup"))
      .withColumn("dup_frac",
        round(col("n_dup").cast("double") / col("n_grams"), 4))
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_dup")).cast("long").as("total_dup"),
        round(avg(col("dup_frac")), 4).as("avg_dup_frac"))
      .orderBy(col("lang"))
  }

  /** The shipped q80 shape (whatever dupSpanStats currently plans). */
  def q80cur(s: SparkSession, d: String): DataFrame = {
    val docs = load(s, d, "documents")
    graft.operators.SubstringDup
      .dupSpanStats(docs, "doc_id", "text", n = 16, stride = 4,
        hashGrams = true)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_dup")).cast("long").as("total_dup"),
        round(avg(col("dup_frac")), 4).as("avg_dup_frac"))
      .orderBy(col("lang"))
  }

  /** r19 shuffle-removal probe (guide §2.4): skip the round-robin
    * parallelism repartition when the parquet scan already has >= the
    * session's shuffle partitions — at sf10 the documents scan fans out
    * to ~70 byte-balanced splits on 32 cores, so the full-text exchange
    * buys nothing the scan doesn't already provide. Trade under test
    * for q47: the repartition exchange is REUSED by the bands and
    * verify branches (one scan + one text shuffle + two shuffle reads)
    * vs no-repartition's two parquet scans (page-cached locally;
    * remote-but-compressed on a lake). q49 has a single consumer below
    * the exchange, so skipping is a pure removal there.
    */
  def q47norr(s: SparkSession, d: String): DataFrame = {
    val src = load(s, d, "documents")
    val base = src.select(col("doc_id").as("id"), col("text").as("__text"))
    val banded = base
      .withColumn("sig", graft.functions.MinHashSig.sig(col("__text"), 128, 3))
      .select(col("id"), posexplode(when(col("sig").isNotNull,
        transform(sequence(lit(0), lit(15)),
          b => hash(slice(col("sig"), b * lit(8) + 1, lit(8)), b)))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val left = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val right = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val candidates = left.join(right.hint("MERGE"), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).dropDuplicates("id_a", "id_b")
    val hashed = base.select(col("id"),
      graft.operators.Dedup.shingleHashesForProfile(3)(col("__text")).as("__sh"))
    val ta = hashed.select(col("id").as("id_a"), col("__sh").as("__sh_a"))
    val tb = hashed.select(col("id").as("id_b"), col("__sh").as("__sh_b"))
    candidates.join(ta, "id_a").join(tb, "id_b")
      .select(col("id_a"), col("id_b"),
        graft.functions.JaccardExpressions.sortedJaccard(
          col("__sh_a"), col("__sh_b")).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
  }

  def q49norr(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "documents")
    graft.operators.Dedup.simhashPairsOnSigs(
      df.filter(col("text").isNotNull)
        .select(col("doc_id").as("id"),
          org.apache.spark.sql.GraftColumnShim.column(
            org.apache.spark.sql.catalyst.expressions.KnownNotNull(
              org.apache.spark.sql.GraftColumnShim.expression(
                graft.operators.Dedup.simhash(col("text"))))).as("sig")),
      maxDistance = 3, pieces = 8)
  }

  /** r19 plan-fix A/B for q95: the shadow anti-join's `===` on cluster
    * inferred isnotnull(cluster) and pushed it through the assignment
    * projection as isnotnull(argmax_cosine(...).cluster) — the fused
    * argmax kernel ran twice per shadow row. The shipped operator keys
    * the join on `<=>` (no inference, same kept set). This variant
    * inlines the old `===` spelling.
    */
  def q95dupOld(s: SparkSession, d: String): DataFrame = {
    import graft.operators.{KMeans, SemDeDup}
    val emb = load(s, d, "embeddings")
    val cents = KMeans.initCentroids(emb, "embedding", "vec_id", 8)
    val assigned = SemDeDup.assignWithSim(emb, "embedding", cents)
    val xv = col("embedding").cast("array<double>")
    val shadow = assigned.select(
      col("cluster").as("y_cluster"), xv.as("y_v"),
      col("cent_sim").as("y_cs"), col("vec_id").cast("long").as("y_id"))
    assigned.join(shadow,
      col("cluster") === col("y_cluster") &&
        (col("y_cs") < col("cent_sim") ||
          (col("y_cs") === col("cent_sim") &&
            col("y_id") < col("vec_id").cast("long"))) &&
        nanvl(graft.functions.VectorExpressions.cosineSim(xv, col("y_v")),
          lit(-1.0)) >= lit(0.35),
      "left_anti")
      .agg(count(lit(1)).as("n_kept"))
  }

  def q95dupNew(s: SparkSession, d: String): DataFrame = {
    val emb = load(s, d, "embeddings")
    graft.operators.SemDeDup.semDedup(emb, "embedding", "vec_id", 8, 0.35)
      .agg(count(lit(1)).as("n_kept"))
  }

  /** Same A/B for the embedding-LSH signature pass (q59's): one boxed
    * UDF per table vs the all-tables kernel in one primitive pass.
    */
  def q59sigUdf(s: SparkSession, d: String): DataFrame = {
    val v = col("embedding").cast("array<double>")
    val sigCols = (0 until 4).map(t => graft.operators.SimilaritySearch
      .signatureUdfForParity(12, 64, 7L + t)(v).as(s"sig_$t"))
    load(s, d, "embeddings").select(col("vec_id").as("id") +: sigCols: _*)
  }

  def q59sigKern(s: SparkSession, d: String): DataFrame = {
    val planes = graft.operators.SimilaritySearch.hyperplanesFor(12, 4, 64, 7L)
    load(s, d, "embeddings").select(col("vec_id").as("id"),
      graft.functions.VectorExpressions.hyperplaneSigs(
        col("embedding").cast("array<double>"), planes).as("sigs"))
  }

  /** Same A/B for the IVF cell-assignment pass (q82's build/append and
    * qs08's per-batch term): the boxed-Seq assignment UDF vs the fused
    * argmax kernel. Both sides share one deterministic quantizer sample
    * (deployment nlist=16) so the A/B isolates the per-row pass.
    */
  private def ivfProbeCents(s: SparkSession, d: String): Array[Array[Double]] =
    graft.operators.SimilaritySearch.sampleCentroids(
      load(s, d, "embeddings"), "embedding", "vec_id", 16)

  def q82assignUdf(s: SparkSession, d: String): DataFrame =
    graft.operators.SimilaritySearch.assignWithUdf(
      load(s, d, "embeddings").select(col("vec_id"), col("embedding")),
      "embedding", ivfProbeCents(s, d)).select(col("vec_id"), col("cluster"))

  def q82assignKern(s: SparkSession, d: String): DataFrame =
    graft.operators.SimilaritySearch.assignWithKernel(
      load(s, d, "embeddings").select(col("vec_id"), col("embedding")),
      "embedding", ivfProbeCents(s, d)).select(col("vec_id"), col("cluster"))

  /** TrainOrder scaling: the full-row range-sort permutation (what a
    * shard rewrite pays) vs the positions-only projection (id + 8-byte
    * key through the exchange — the audit/resume query's shape).
    */
  def q100full(s: SparkSession, d: String): DataFrame =
    graft.operators.TrainOrder.permute(load(s, d, "documents"), "doc_id", 7L)

  def q100pos(s: SparkSession, d: String): DataFrame =
    graft.operators.TrainOrder.withPosition(
      load(s, d, "documents").select("doc_id"), "doc_id", 7L)

  /** Kernel≡UDF parity SWEEPS, runnable at any SF (the unit specs pin
    * the same contracts on sf0.001 + adversarial edges; these recheck
    * them over full replicated corpora — expected output: one row,
    * every mismatch count 0).
    */
  def parityKernels(s: SparkSession, d: String): DataFrame = {
    val docs = load(s, d, "documents").select(col("doc_id"), col("text"))
    val sig = docs.select(
      graft.operators.Dedup.signatureForProfile(128, 3)(col("text")).as("u"),
      graft.functions.MinHashSig.sig(col("text"), 128, 3).as("k"))
      .filter((col("u").isNull =!= col("k").isNull) ||
        (col("u").isNotNull && col("u") =!= col("k"))).count()
    val sim = docs.select(
      graft.operators.Dedup.simhashUdfForParity(col("text")).as("u"),
      graft.functions.MinHashSig.simhash64(lower(trim(col("text")))).as("k"))
      .filter(col("u") =!= col("k")).count()
    val emb = load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = graft.operators.SimilaritySearch.sampleCentroids(
      emb.withColumnRenamed("v", "embedding"), "embedding", "vec_id", 16)
    val ivf = graft.operators.SimilaritySearch
      .assignWithUdf(emb, "v", cents).withColumnRenamed("cluster", "u")
      .join(graft.operators.SimilaritySearch.assignWithKernel(emb, "v", cents)
        .withColumnRenamed("cluster", "k").select("vec_id", "k"), "vec_id")
      .filter(col("u") =!= col("k")).count()
    val planes = graft.operators.SimilaritySearch.hyperplanesFor(12, 4, 64, 7L)
    val hyp = emb.select(
      (graft.functions.VectorExpressions.hyperplaneSigs(col("v"), planes).as("k") +:
        (0 until 4).map(t => graft.operators.SimilaritySearch
          .signatureUdfForParity(12, 64, 7L + t)(col("v")).as(s"u_$t"))): _*)
      .filter((0 until 4).map(t =>
        element_at(col("k"), t + 1) =!= col(s"u_$t")).reduce(_ || _)).count()
    import s.implicits._
    System.err.println(s"[parity] minhash_sig=$sig simhash=$sim " +
      s"ivf_assign=$ivf hyperplane=$hyp (all must be 0)")
    Seq((sig, sim, ivf, hyp)).toDF(
      "minhash_sig_mismatch", "simhash_mismatch",
      "ivf_assign_mismatch", "hyperplane_mismatch")
  }

  def q87store(s: SparkSession, d: String): DataFrame = {
    val (batch, _) = q96split(s, d)
    val store = ensureProbeUnitStore(s, d)
    paraSummary(graft.operators.ParagraphDedup.dedupAgainstStore(
      batch, "doc_id", "text", paraUnits, " ", store))
  }

  /** SemDeDup shadow-leg A/B (VERDICT r13 What's-wrong #2): the anti-join
    * derives both legs from `assigned`, so the cosine-argmax assignment
    * runs once per leg unless persisted. `SPARK_GRAFT_PROBE_Q95=persist`
    * materializes `assigned` to MEMORY_AND_DISK first; default
    * recomputes. The embeddings table scales with SF (200k × 64-dim at
    * sf10, 600k at sf30), so this is a real at-scale point, k=64
    * matching the sum-|c|²-bounded pair-volume contract.
    */
  def q95persist(s: SparkSession, d: String): DataFrame = {
    import graft.operators.{KMeans, SemDeDup}
    val emb = load(s, d, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val cents = KMeans.initCentroidsSampled(emb, "embedding", "vec_id",
      k = 64, seed = 7L)
    val assigned = SemDeDup.assignWithSim(emb, "embedding", cents)
    if (sys.env.get("SPARK_GRAFT_PROBE_Q95").contains("persist")) {
      val p = assigned.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      SemDeDup.semDedupOnAssigned(p, "embedding", "vec_id", tau = 0.35)
        .agg(count(lit(1)).as("n_kept"))
    } else {
      SemDeDup.semDedupOnAssigned(assigned, "embedding", "vec_id", tau = 0.35)
        .agg(count(lit(1)).as("n_kept"))
    }
  }

  /** Materialize via the noop sink (same as graft.Bench.exec): evaluates
    * every row and column without driver collection — collect() on the
    * scan-only probes would pull the whole table into the driver. */
  private def time(label: String, warm: Int = 3)(f: => DataFrame): Unit = {
    def once(): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = once()
    val runs = (1 to warm).map(_ => once()).sorted
    val med = runs(runs.length / 2)
    println(f"PROBE $label%-28s cold=$cold%6.2fs warm_median=$med%6.2fs")
  }

  /** Per-query constant-cost decomposition for the sf0.1 floor: time the
    * DataFrame build, Catalyst phases (analysis/optimization/planning),
    * and execution separately on WARM reruns of the smallest headline
    * queries — the sf0.1 bench is ~25 × this constant, so knowing whether
    * it is planning, scheduling, or AQE stage-materialization decides
    * which knob is worth turning.
    */
  def floorProfile(s: SparkSession, d: String, names: Seq[String]): Unit = {
    for (q <- names) {
      val warm = SparkEntry.queries(q)(s, d)
      warm.write.format("noop").mode("overwrite").save()
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(s, d)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // analysis + optimization + physical planning
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e6, (t2 - t1) / 1e6, (t3 - t2) / 1e6)
      }
      val (b, p, e) = runs.minBy(r => r._1 + r._2 + r._3)
      println(f"FLOOR $q%-28s build=$b%6.0fms plan=$p%6.0fms exec=$e%6.0fms")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val only: Set[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSet else Set.empty
    val preferSmj = sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "true")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_PARFIRST", "true"))
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_LOCALDIR",
          System.getProperty("java.io.tmpdir")))
      // mirror graft.Bench's volume-proportional split sizing so probe
      // timings are comparable to the bench artifact at every SF
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAXPART", Bench.autoMaxPartitionBytes(sfDir, 32)))
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_BCAST", "64m"))
      .config("spark.sql.join.preferSortMergeJoin", preferSmj)
      // SPARK_GRAFT_PROBE_HUGEMETHOD: A/B the whole-stage-codegen
      // fallback threshold. HotSpot refuses to JIT methods over 8000
      // bytecodes (DontCompileHugeMethods), so a generated stage bigger
      // than that runs INTERPRETED; setting the limit to 8000 makes
      // Spark fall back to the (JIT-able) non-fused operators instead.
      // Question for q06b: is the fused 5-way stage past the JIT cliff?
      .config("spark.sql.codegen.hugeMethodLimit",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_HUGEMETHOD", "65535"))
      // SPARK_GRAFT_PROBE_BLOOM=1: runtime bloom-filter A/B for the
      // shuffle semi joins (q28). The default thresholds would exclude
      // the case outright — applicationSideScanSizeThreshold (10 GB)
      // exceeds every local SF's orders scan and creationSideThreshold
      // (10 MB) is smaller than the filtered key side from sf30 up — so
      // the probe opens both: the question is whether an injected
      // might_contain prunes the fact exchange, not whether the stock
      // thresholds fire.
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled",
        if (sys.env.get("SPARK_GRAFT_PROBE_BLOOM").contains("1")) "true" else "false")
      .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "512MB")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // hhvocab: the heavy-hitters two-regime measurement. sfDir is a
    // make_vocab.py output dir (tokens_u*.parquet, fixed rows, swept key
    // universe); for each file, time the exact q77 shape (one shuffle of
    // the distinct-key universe) against HeavyHitters.topK (two scans,
    // candidate-bounded shuffles) and report per-run SHUFFLE WRITE BYTES
    // from a stage listener — the claim under test is that the exact
    // shape's shuffle grows with the universe while MG's stays constant,
    // with a wall-clock crossover once the universe outweighs MG's
    // second scan.
    if (only.contains("hhvocab")) {
      val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
      // The listener bus is async: a fixed sleep can cut off late
      // stage-completed events under GC or bus backlog, losing bytes or
      // attributing them to the neighboring run. Poll until the counter
      // has been STABLE for 500 ms (10 s cap) instead — drained means
      // nothing landed for a full stability window, not "300 ms passed".
      def drainListenerBus(): Unit = {
        val t0 = System.nanoTime()
        var last = shuffleBytes.get()
        var stableSince = System.nanoTime()
        while ((System.nanoTime() - stableSince) < 500e6.toLong &&
               (System.nanoTime() - t0) < 10e9.toLong) {
          Thread.sleep(100)
          val cur = shuffleBytes.get()
          if (cur != last) { last = cur; stableSince = System.nanoTime() }
        }
      }
      def measure(label: String)(q: => DataFrame): Unit = {
        def once(): Double = {
          val t0 = System.nanoTime()
          q.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warm (page cache + codegen)
        val timed = (1 to 3).map { _ =>
          drainListenerBus(); shuffleBytes.set(0L)
          val t = once()
          drainListenerBus()
          (t, shuffleBytes.get())
        }
        val (sec, bytes) = timed.minBy(_._1)
        println(f"HHVOCAB $label%-28s sec=$sec%7.2f shuffle_mb=${bytes / 1e6}%9.2f")
      }
      val files = Option(new java.io.File(sfDir).listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter(_.getName.matches("tokens_u\\d+\\.parquet"))
        .sortBy(f => f.getName.stripPrefix("tokens_u").stripSuffix(".parquet").toLong)
      require(files.nonEmpty, s"no tokens_u*.parquet under $sfDir — run tools/make_vocab.py")
      for (f <- files) {
        val u = f.getName.stripPrefix("tokens_u").stripSuffix(".parquet")
        val df = spark.read.parquet(f.getAbsolutePath)
        measure(s"u=$u exact") {
          df.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
            .orderBy(col("cnt").desc, col("word")).limit(50)
        }
        measure(s"u=$u mg") {
          graft.operators.HeavyHitters.topK(df, "word", k = 50, capacity = 4096)
        }
      }
      spark.stop(); sys.exit(0)
    }

    // q96append: the day-2 index-maintenance cost point. Build the lake
    // index (timed — delete any cached dir first so build_sec is real),
    // then time lshAppend of the batch into a fresh COPY of the index
    // per run (append mutates; copies keep runs independent; the copy
    // itself is outside the timed region). Claim under test: day-2 cost
    // is batch-proportional — append_sec tracks the batch (lake/(m-1)
    // of the corpus at split m), not the lake that build_sec paid for.
    if (only.contains("q96append")) {
      import java.nio.file.{Files, Paths}
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      def copyDir(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
        val walk = Files.walk(src)
        try walk.forEach { p =>
          val t = dst.resolve(src.relativize(p).toString)
          if (Files.isDirectory(p)) Files.createDirectories(t): Unit
          else {
            Files.createDirectories(t.getParent)
            Files.copy(p, t): Unit
          }
        } finally walk.close()
      }
      val (batch, _) = q96split(spark, sfDir)
      val batchN = batch.count()
      val m = sys.env.getOrElse("SPARK_GRAFT_PROBE_Q96_SPLIT", "2")
      val nb = sys.env.getOrElse("SPARK_GRAFT_PROBE_IDX_BUCKETS", "0").toInt
      rm(new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_probe_lsh_idx_${new java.io.File(sfDir).getName}_m${m}_b$nb"))
      val (idx, buildSec) = ensureProbeIndex(spark, sfDir)
      val runs = (1 to 3).map { _ =>
        val dst = Files.createTempDirectory("graft_probe_lsh_append")
        copyDir(Paths.get(idx), dst)
        val t0 = System.nanoTime()
        graft.operators.Dedup.lshAppend(batch, "text", "doc_id", dst.toString)
        val sec = (System.nanoTime() - t0) / 1e9
        rm(dst.toFile)
        sec
      }
      println(f"PROBE q96append nb=$nb m=$m build=$buildSec%.2fs " +
        f"append_med=${runs.sorted.apply(runs.length / 2)}%.2fs " +
        s"batch_rows=$batchN runs=${runs.map(r => f"$r%.2f").mkString(",")}")
      spark.stop(); sys.exit(0)
    }

    // q96compact: the small-file story of index maintenance. Build the
    // lake index UNBUCKETED (append accumulates whole files per write;
    // with file bin-packing the scan cost shows up as openCostInBytes-
    // driven partition growth), append the batch in 5 slices (5 days of
    // ingest), measure band-file count / scan partitions / warm query,
    // then lshCompact and re-measure. Claims under test: compaction
    // restores the file count and scan-partition count to build-time
    // shape, and pair results are unchanged (count printed both sides).
    if (only.contains("q96compact")) {
      import java.nio.file.{Files, Paths}
      def rmDir(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmDir)
        f.delete(): Unit
      }
      def copyDir(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
        val walk = Files.walk(src)
        try walk.forEach { p =>
          val t = dst.resolve(src.relativize(p).toString)
          if (Files.isDirectory(p)) Files.createDirectories(t): Unit
          else { Files.createDirectories(t.getParent); Files.copy(p, t): Unit }
        } finally walk.close()
      }
      val (batch, _) = q96split(spark, sfDir)
      val (idx0, _) = ensureProbeIndex(spark, sfDir)
      val idx = Files.createTempDirectory("graft_probe_lsh_compact")
      copyDir(Paths.get(idx0), idx)
      // a surviving pre-round-16 probe index has no attempt column —
      // lshCompact upgrades it in place (the documented migration path)
      if (!spark.read.parquet(s"$idx/bands").columns.contains("append_attempt")) {
        graft.operators.Dedup.lshCompact(spark, idx.toString)
        println("PROBE q96compact upgraded legacy-format index via lshCompact")
      }
      (0 until 5).foreach { k =>
        graft.operators.Dedup.lshAppend(
          batch.filter(col("doc_id") % 5 === k), "text", "doc_id",
          idx.toString, appendId = Some(s"day$k"))
      }
      def stats(): (Int, Int) = {
        val files = Option(new java.io.File(idx.toFile, "bands").listFiles())
          .getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
        (files, spark.read.parquet(s"$idx/bands").rdd.getNumPartitions)
      }
      def warmQuery(): (Double, Long) = {
        def once(): (Double, Long) = {
          val t0 = System.nanoTime()
          val n = graft.operators.Dedup.minhashLshIndexPairs(
            batch, idx.toString, "text", "doc_id", threshold = 0.8).count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        once()
        val runs = (1 to 3).map(_ => once())
        (runs.map(_._1).sorted.apply(1), runs.head._2)
      }
      val (filesB, partsB) = stats()
      val (secB, pairsB) = warmQuery()
      val t0 = System.nanoTime()
      graft.operators.Dedup.lshCompact(spark, idx.toString)
      val compactSec = (System.nanoTime() - t0) / 1e9
      val (filesA, partsA) = stats()
      val (secA, pairsA) = warmQuery()
      println(f"PROBE q96compact files=$filesB->$filesA scan_parts=$partsB->$partsA " +
        f"query=$secB%.2f->$secA%.2fs pairs=$pairsB->$pairsA compact=$compactSec%.2fs")
      rmDir(idx.toFile)
      spark.stop(); sys.exit(0)
    }

    Seq("lineitem", "orders", "customer", "nation", "region", "documents")
      .foreach(t => load(spark, sfDir, t).count())

    // Build the bench bucketed tables (same recipe as graft.Bench setup)
    // whenever any requested variant reads them: the q06b* decomposition,
    // the *_bucketed bench variants, and the single-letter probe shapes
    // (q02b/q12b/q17b/q34b/q36b) all scan bench_* managed tables. An
    // empty `only` runs EVERY variant, so it needs the build too.
    val bucketReaders = Set("buckets", "q02b", "q12b", "q17b", "q34b", "q36b")
    val bucketKeys = Seq(
      "bench_lineitem_bo" -> "l_orderkey", "bench_orders_bo" -> "o_orderkey",
      "bench_orders_bc" -> "o_custkey", "bench_customer_bc" -> "c_custkey",
      "bench_events_bu" -> "user_id")
    // SPARK_GRAFT_PROBE_REUSE_BUCKETS=1: re-register a PREVIOUS probe
    // run's bucketed warehouse dirs as external bucketed tables instead
    // of rebuilding (~270 s at sf100) — the bucket count is read from
    // the _GRAFT_NB_<n> marker the build path writes (counting parquet
    // files is NOT safe: an empty bucket writes no file, and a declared
    // bucket count below the real one makes Spark's bucketed scan
    // silently DROP the out-of-range buckets' rows). The marker's
    // CONTENT stamps provenance — source sfDir and the bucketed table's
    // row count — and reuse REFUSES on mismatch: a surviving warehouse
    // built from a different sfDir (or a different
    // SPARK_GRAFT_PROBE_NBUCKETS run at the same nb) re-registers only
    // if it provably holds this sfDir's data, instead of silently
    // benchmarking the wrong corpus. Row-count verification is a
    // parquet metadata-only count (footers, no data pages). A dir with
    // no marker, a legacy content-less marker, or any mismatch forces
    // the rebuild path.
    def registerExisting(): Boolean = {
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      val sfKey = new java.io.File(sfDir).getAbsolutePath
      bucketKeys.forall { case (t, key) =>
        val loc = new java.io.File(wh, t)
        val all = Option(loc.listFiles()).getOrElse(Array.empty[java.io.File])
        val marker = all.find(_.getName.startsWith("_GRAFT_NB_"))
        val nbMarker = marker.map(_.getName.stripPrefix("_GRAFT_NB_").toInt)
        val nFiles = all.count(_.getName.endsWith(".parquet"))
        val stamp: Map[String, String] = marker.map { f =>
          scala.util.Try(scala.util.Using.resource(scala.io.Source.fromFile(f)) {
            src =>
              src.getLines().flatMap { l =>
                l.split("=", 2) match {
                  case Array(a, b) => Some(a -> b)
                  case _ => None
                }
              }.toMap
          }).getOrElse(Map.empty)
        }.getOrElse(Map.empty)
        val provenanceOk = stamp.get("sfDir").contains(sfKey) &&
          stamp.get("rows").exists { r =>
            scala.util.Try(r.toLong).toOption
              .contains(spark.read.parquet(loc.getAbsolutePath).count())
          }
        if (marker.nonEmpty && !provenanceOk)
          println(s"PROBE bucket_reuse_refused $t stamp=$stamp expected_sfDir=$sfKey")
        nbMarker.exists(nb => nFiles > 0 && nFiles <= nb) && provenanceOk && {
          val nb = nbMarker.get
          val schema = spark.read.parquet(loc.getAbsolutePath).schema.toDDL
          spark.sql(s"DROP TABLE IF EXISTS $t")
          spark.sql(s"CREATE TABLE $t ($schema) USING PARQUET " +
            s"CLUSTERED BY ($key) SORTED BY ($key) INTO $nb BUCKETS " +
            s"LOCATION '${loc.getAbsolutePath}'")
          println(s"PROBE bucket_reuse $t nb=$nb files=$nFiles rows=${stamp("rows")}")
          true
        }
      }
    }
    // Stamp a table dir with its true bucket count (filename) plus
    // provenance content (source sfDir + footer-counted rows) so a later
    // reuse run cannot mis-declare OR mis-source it.
    def stampNb(t: String, nb: Int): Unit = {
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      val loc = new java.io.File(wh, t)
      val rows = spark.read.parquet(loc.getAbsolutePath).count()
      val f = new java.io.File(loc, s"_GRAFT_NB_$nb")
      val w = new java.io.PrintWriter(f)
      try {
        w.println(s"sfDir=${new java.io.File(sfDir).getAbsolutePath}")
        w.println(s"rows=$rows")
      } finally w.close()
    }
    if (only.isEmpty || only.exists(v => bucketReaders(v) ||
        v.startsWith("q06b") || v.endsWith("_bucketed"))) {
      import graft.operators.Bucketing
      if (sys.env.get("SPARK_GRAFT_PROBE_REUSE_BUCKETS").contains("1") &&
          registerExisting()) {
        // reuse path: tables registered in-place, skip the rebuild
      } else {
      // a fresh session's in-memory catalog has no record of a previous
      // probe run's managed tables, but their warehouse directories
      // survive and block saveAsTable — clear them first
      Seq("bench_lineitem_bo", "bench_orders_bo", "bench_orders_bc",
          "bench_customer_bc", "bench_events_bu").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new java.io.File(
          spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        if (loc.exists()) rm(loc)
      }
      val li = load(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val orders = load(spark, sfDir, "orders")
      val cust = load(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
      val t0 = System.nanoTime()
      // SPARK_GRAFT_PROBE_NBUCKETS overrides autoBuckets for bucket-count
      // A/Bs (the 64 MB/bucket target is itself a measured choice — see
      // Bucketing.autoBuckets; this knob lets a probe re-test it per SF)
      val nbOverride = sys.env.get("SPARK_GRAFT_PROBE_NBUCKETS").map(_.toInt)
      val nbBo = nbOverride.getOrElse(Bucketing.autoBuckets(li))
      Bucketing.writeBucketed(li, "bench_lineitem_bo", "l_orderkey", nbBo)
      Bucketing.writeBucketed(orders.select(col("o_orderkey"), col("o_custkey")),
        "bench_orders_bo", "o_orderkey", nbBo)
      val nbBc = nbOverride.getOrElse(Bucketing.autoBuckets(orders))
      Bucketing.writeBucketed(
        orders.select(col("o_custkey"), col("o_totalprice"), col("o_orderstatus"),
          col("o_orderkey"), col("o_orderdate")),
        "bench_orders_bc", "o_custkey", nbBc)
      Bucketing.writeBucketed(cust, "bench_customer_bc", "c_custkey", nbBc)
      val ev = load(spark, sfDir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val nbEu = nbOverride.getOrElse(Bucketing.autoBuckets(ev))
      Bucketing.writeBucketed(ev, "bench_events_bu", "user_id", nbEu)
      Seq("bench_lineitem_bo" -> nbBo, "bench_orders_bo" -> nbBo,
        "bench_orders_bc" -> nbBc, "bench_customer_bc" -> nbBc,
        "bench_events_bu" -> nbEu).foreach { case (t, nb) => stampNb(t, nb) }
      println(f"PROBE bucket_setup nbBo=$nbBo nbBc=$nbBc nbEu=$nbEu ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }

    if (only.contains("floor")) {
      floorProfile(spark, sfDir, Seq(
        "q36_events_funnel", "q28_in_subquery", "q08_semi_join",
        "q05_join_agg", "q19_rollup", "q53_multimodal_decode"))
      spark.stop(); sys.exit(0)
    }

    val variants: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q06v0" -> (q06v0 _), "q06v1" -> (q06v1 _), "q06v2" -> (q06v2 _),
      "q06v3" -> (q06v3 _),
      "q08v0" -> (q08v0 _), "q08v1" -> (q08v1 _),
      "q02v0" -> (q02v0 _), "q02v1" -> (q02v1 _), "q02v2" -> (q02v2 _),
      "q02b" -> (q02b _),
      "q28v0" -> (q28v0 _), "q28v1" -> (q28v1 _), "q28v2" -> (q28v2 _),
      "q05v0" -> (q05v0 _), "q05v1" -> (q05v1 _),
      "q19v0" -> (q19v0 _), "q19base" -> (q19base _),
      "q19scan" -> (q19scan _), "q19count" -> (q19count _),
      "q40v0" -> (q40v0 _), "q40v1" -> (q40v1 _), "q40v2" -> (q40v2 _),
      "q44v0" -> (q44v0 _), "q44v1" -> (q44v1 _), "q44scan" -> (q44scan _),
      "q44xscan" -> (q44xscan _), "q44v2" -> (q44v2 _), "q44v3" -> (q44v3 _),
      "q44v4" -> (q44v4 _),
      "q17b" -> (q17b _), "q17v0" -> (q17v0 _),
      "q12b" -> (q12b _), "q12v0" -> (q12v0 _),
      "q34b" -> (q34b _), "q34v0" -> (q34v0 _),
      "q36b" -> (q36b _), "q36v0" -> (q36v0 _),
      "q06b_scan" -> (q06bScan _), "q06b_perorder" -> (q06bPerOrder _),
      "q06b_join" -> (q06bJoin _), "q06b_full" -> (q06bFull _),
      "q06b_smj" -> (q06bSmj _), "q06b_joinfirst" -> (q06bJoinFirst _),
      "q06b_bcastmap" -> (q06bBcastMap _), "q06b_aggbcast" -> (q06bAggBcast _),
      "q96scale" -> (q96scale _),
      "q96index" -> (q96index _),
      "q96recrawl_lsh" -> (q96recrawlLsh _),
      "q96recrawl_fp" -> (q96recrawlFp _),
      "q87full" -> (q87full _),
      "q87agg_packed" -> (q87aggPacked _),
      "q87rw_linear" -> (q87rwLinear _),
      "q87rw_except" -> (q87rwExcept _),
      "q95dup_old" -> (q95dupOld _),
      "q95dup_new" -> (q95dupNew _),
      "q80old" -> (q80old _),
      "q80cur" -> (q80cur _),
      "q80reuse" -> (q80reuse _),
      "q47norr" -> (q47norr _),
      "q49norr" -> (q49norr _),
      "q47pairs_old" -> (q47pairsOld _),
      "q47pairs_new" -> (q47pairsNew _),
      "q49pairs_old" -> (q49pairsOld _),
      "q49pairs_new" -> (q49pairsNew _),
      "q81bm25_old" -> (q81bm25Old _),
      "q81bm25_new" -> (q81bm25New _),
      "q47sig_udf" -> (q47sigUdf _),
      "q47sig_kern" -> (q47sigKern _),
      "q47hash_udf" -> (q47hashUdf _),
      "q47hash_kern" -> (q47hashKern _),
      "q49sig_udf" -> (q49sigUdf _),
      "q49sig_kern" -> (q49sigKern _),
      "q59sig_udf" -> (q59sigUdf _),
      "q59sig_kern" -> (q59sigKern _),
      "q82assign_udf" -> (q82assignUdf _),
      "q82assign_kern" -> (q82assignKern _),
      "q100full" -> (q100full _),
      "q100pos" -> (q100pos _),
      "parity_kernels" -> (parityKernels _),
      "q87store" -> (q87store _),
      "q87pipe" -> (q87pipe _),
      "qs12tail" -> (qs12tail _),
      "qs12pipe" -> (qs12pipe _),
      "q95persist" -> (q95persist _),
      "q05_join_agg_bucketed" -> ((s: SparkSession, d: String) =>
        graft.Bench.extras("q05_join_agg_bucketed")(s, d)),
      "q28_in_subquery_bucketed" -> ((s: SparkSession, d: String) =>
        graft.Bench.extras("q28_in_subquery_bucketed")(s, d)))
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
