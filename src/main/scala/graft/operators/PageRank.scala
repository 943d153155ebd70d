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
  * Dangling nodes: callers pass edges; nodes appear iff they have an
  * edge. With a symmetric (undirected) edge list every node has
  * in-degree ≥ 1 and rank mass is conserved per round.
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
    val n = deg.agg(count(lit(1)).cast("double").as("n"))
    var pr = deg.crossJoin(broadcast(n))
      .select(col("u"), (lit(1.0) / col("n")).as("pr"))
    var i = 0
    while (i < iters) {
      pr = e.join(pr, "u").join(deg, "u")
        .groupBy(col("v").as("u"))
        .agg(sum(col("pr") / col("dg")).as("__in"))
        .crossJoin(broadcast(n))
        .select(col("u"),
          (lit(1.0 - damping) / col("n") + lit(damping) * col("__in")).as("pr"))
      // truncate lineage every few rounds — an unbounded iteration chain
      // re-plans the whole history each action and eventually overwhelms
      // the optimizer (same reason ConnectedComponents checkpoints)
      if (i % 5 == 4) pr = pr.localCheckpoint()
      i += 1
    }
    pr
  }
}
