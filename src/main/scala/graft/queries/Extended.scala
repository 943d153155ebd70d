package graft.queries

import org.apache.spark.sql.functions._

/** Extended relational coverage: ordered string aggregation, CUBE,
  * statistical aggregates, and two more TPC-H-shaped analytics queries.
  */
object Extended {

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q37_string_agg",
      (s, d) => load(s, d, "nation")
        .groupBy(col("n_regionkey"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n"))
        .orderBy(col("n_regionkey")),
      Some("""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations,
             |count(*) AS n
             |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)),

    QueryDef("q38_cube",
      (s, d) => load(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"), col("n"))
        .orderBy(col("status"), col("priority")),
      Some("""SELECT COALESCE(o_orderstatus,'(all)') AS status,
             |COALESCE(o_orderpriority,'(all)') AS priority, count(*) AS n
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)),

    QueryDef("q39_stats_agg",
      (s, d) => load(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_discount")), 6).as("var_disc"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |round(stddev_samp(l_quantity),4) AS sd_qty,
             |round(var_samp(l_discount),6) AS var_disc,
             |round(corr(l_quantity, l_extendedprice),4) AS corr_qty_price,
             |round(covar_samp(l_quantity, l_extendedprice),2) AS covar
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    QueryDef("q60_shipping_priority",
      (s, d) => {
        // TPC-H Q3 shape: unshipped revenue by order
        val c = load(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = load(s, d, "orders")
        val l = load(s, d, "lineitem")
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .filter(o("o_orderdate") < lit("1995-03-15") && l("l_shipdate") > lit("1995-03-15"))
          .groupBy(l("l_orderkey"), o("o_orderdate"), o("o_orderpriority"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .select(col("l_orderkey"), col("revenue"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
            col("o_orderpriority"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(20)
      },
      Some("""SELECT l_orderkey, revenue, orderdate, o_orderpriority FROM (
             |SELECT l_orderkey,
             |round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
             |strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
             |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority)
             |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin)),

    QueryDef("q61_returned_items",
      (s, d) => {
        // TPC-H Q10 shape: top customers by returned-item revenue
        val c = load(s, d, "customer")
        val o = load(s, d, "orders")
        val l = load(s, d, "lineitem").filter(col("l_returnflag") === "R")
        val n = broadcast(load(s, d, "nation"))
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, n_name, revenue FROM (
             |SELECT c_custkey, c_name, n_name,
             |round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE l_returnflag = 'R'
             |GROUP BY c_custkey, c_name, n_name)
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    QueryDef("q62_array_collect",
      (s, d) => load(s, d, "lineitem")
        .filter(col("l_orderkey") <= 100)
        .groupBy(col("l_orderkey"))
        .agg(array_join(array_sort(collect_set(col("l_returnflag"))), "").as("flags"),
          size(collect_list(col("l_linenumber"))).as("n_lines"))
        .orderBy(col("l_orderkey")),
      Some("""SELECT l_orderkey,
             |array_to_string(list_sort(list_distinct(list(l_returnflag))), '') AS flags,
             |CAST(len(list(l_linenumber)) AS INT) AS n_lines
             |FROM lineitem WHERE l_orderkey <= 100
             |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)),

    QueryDef("q64_asof_join",
      (s, d) => {
        // custom operator Spark lacks: for each purchase, the most recent
        // signup at-or-before it (same user) — DuckDB expresses this as
        // ASOF LEFT JOIN, our engine as graft.operators.AsOfJoin
        val events = load(s, d, "events")
        val purchases = events.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val signups = events.filter(col("event_type") === "signup")
          .select(col("event_id").as("signup_id"), col("user_id"), col("ts"))
        graft.operators.AsOfJoin.asofJoin(purchases, signups,
            byCol = "user_id", leftTs = "ts", rightTs = "ts",
            rightCols = Seq("signup_id"))
          .select(col("event_id"), col("user_id"), col("asof_signup_id"))
          .orderBy(col("event_id"))
          .limit(500)
      },
      Some("""SELECT p.event_id, p.user_id, s.event_id AS asof_signup_id
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
             |ON p.user_id = s.user_id AND s.ts <= p.ts
             |ORDER BY p.event_id LIMIT 500""".stripMargin)),

    QueryDef("q66_asof_forward",
      (s, d) => {
        // forward as-of: for each signup, the user's FIRST purchase
        // at-or-after it (DuckDB `ON p.ts >= s.ts`)
        val events = load(s, d, "events")
        val signups = events.filter(col("event_type") === "signup")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = events.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
        graft.operators.AsOfJoin.asofJoin(signups, purchases,
            byCol = "user_id", leftTs = "ts", rightTs = "ts",
            rightCols = Seq("purchase_id"), direction = "forward")
          .select(col("event_id"), col("user_id"), col("asof_purchase_id"))
          .orderBy(col("event_id"))
          .limit(500)
      },
      Some("""SELECT s.event_id, s.user_id, p.event_id AS asof_purchase_id
             |FROM (SELECT * FROM events WHERE event_type = 'signup') s
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
             |ON s.user_id = p.user_id AND p.ts >= s.ts
             |ORDER BY s.event_id LIMIT 500""".stripMargin)),

    QueryDef("q63_percentile",
      (s, d) => load(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("median_price"),
          round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90_price"))
        .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus,
             |round(quantile_cont(o_totalprice, 0.5),2) AS median_price,
             |round(quantile_cont(o_totalprice, 0.9),2) AS p90_price
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))
  )
}
