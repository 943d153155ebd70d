package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the canonical iterative
  * graph workload, here used over document-similarity graphs (central
  * docs in a near-dup neighborhood are canonical-representative
  * candidates; authority over a link graph ranks seed URLs for
  * crawling).
  *
  * Each iteration is one join (ranks onto out-edges) + one
  * map-side-combined aggregation (contributions by destination) — the
  * classic two-shuffle round, narrow keys only (ids + doubles), no
  * vertex-program framework needed. Iteration count is FIXED (the
  * training-pipeline uses want bounded, reproducible work, not
  * convergence detection whose round count data-depends); ranks after
  * k rounds are a pure function of the edge list, so the q91 oracle
  * unrolls the identical k iterations in SQL.
  *
  * Dangling (sink) nodes are handled the standard way: n counts the
  * distinct endpoints of the edge list (sources AND destinations), every
  * node gets init mass and a rank row each round, and the aggregate rank
  * of zero-out-degree nodes is redistributed uniformly (the dangling
  * term d·Σ_sinks pr/n), so rank mass is conserved at 1.0 per round on
  * ANY edge list — directed with sinks included, not just the symmetric
  * graphs the gates feed. On a symmetric edge list the dangling term is
  * identically 0 and this reduces to the classic formulation the q91
  * SQL oracle unrolls.
  */
object PageRank {

  /** Ranks after `iters` rounds with teleport `1−damping`:
    * (id, pr). Nodes are the distinct endpoints of `edges`
    * (directed: u→v contributes u's rank to v).
    */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            damping: Double = 0.85, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"))
    val deg = e.groupBy(col("u")).agg(count(lit(1)).as("dg"))
    // node set = distinct endpoints (a sink appears only as a v)
    val nodes = e.select(col("u")).union(e.select(col("v").as("u"))).distinct()
    val n = nodes.agg(count(lit(1)).cast("double").as("n"))
    var pr = nodes.crossJoin(broadcast(n))
      .select(col("u"), (lit(1.0) / col("n")).as("pr"))
    var i = 0
    while (i < iters) {
      // in-flow per destination: only nodes with out-edges contribute
      val contribs = e.join(pr, "u").join(deg, "u")
        .groupBy(col("v").as("u"))
        .agg(sum(col("pr") / col("dg")).as("__in"))
      // aggregate sink rank (nodes with no out-edge) — a 1-row broadcast,
      // redistributed uniformly so no mass leaks out of the graph
      val dangling = pr.join(deg, Seq("u"), "left_anti")
        .agg(coalesce(sum(col("pr")), lit(0.0)).as("__dm"))
      pr = nodes.join(contribs, Seq("u"), "left")
        .crossJoin(broadcast(n)).crossJoin(broadcast(dangling))
        .select(col("u"),
          (lit(1.0 - damping) / col("n") + lit(damping) *
            (coalesce(col("__in"), lit(0.0)) + col("__dm") / col("n"))).as("pr"))
      // truncate lineage every few rounds — an unbounded iteration chain
      // re-plans the whole history each action and eventually overwhelms
      // the optimizer (same reason ConnectedComponents checkpoints)
      if (i % 5 == 4) pr = pr.localCheckpoint()
      i += 1
    }
    pr
  }
}
