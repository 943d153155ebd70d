package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair/edge list — the
  * transitive-closure step a dedup pipeline needs between "near-dup
  * PAIRS" and "duplicate CLUSTERS".
  *
  * Pair-drop dedup (drop every `id_b`) keeps one doc per *pair*, but a
  * transitive chain can over-keep: edges {5–10, 1–10} form one cluster
  * {1,5,10} with min 1, yet 5 never appears as the larger id of a pair
  * and survives a pair-drop. Component labeling is the correct
  * cluster-level semantics: every doc gets its component's minimum id,
  * and keep-min dedup then keeps exactly one doc per cluster.
  *
  * Algorithm: alternating Large-Star / Small-Star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — converges
  * in O(log n) rounds on any graph, each round a pair of narrow
  * (key, min) shuffles with map-side partial mins. No adjacency lists
  * are ever materialized (no `collect_list`), so hot nodes with millions
  * of neighbors cost linear emit, not executor memory. Lineage is cut
  * every round with `localCheckpoint` (swap for `checkpoint` + a
  * reliable checkpoint dir on a real cluster).
  */
object ConnectedComponents {

  /** Label every node of the pair graph with its component's minimum id.
    *
    * @param pairs edge list; self-loops and duplicates are fine
    * @param aCol  left id column (numeric/orderable)
    * @param bCol  right id column
    * @return DataFrame(id, component) — one row per distinct node that
    *         appears in `pairs`; `component` = min id of its component
    */
  def components(pairs: DataFrame, aCol: String, bCol: String,
                 maxIter: Int = 30): DataFrame = {
    val spark = pairs.sparkSession
    // canonical directed edges u > v (each edge lives at its larger end)
    var edges = pairs
      .select(col(aCol).cast("long").as("x"), col(bCol).cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .select(greatest(col("x"), col("y")).as("u"), least(col("x"), col("y")).as("v"))
      .distinct()
      .localCheckpoint()

    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(sum(hash(col("u"), col("v")).cast("long")), lit(0L)))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    var converged = false
    var iter = 0
    var sig = signature(edges)
    while (!converged && iter < maxIter) {
      // Large-Star: group the symmetrized graph at each node u; connect
      // every STRICTLY LARGER neighbor to m = min(Γ(u) ∪ {u}).
      val sym = edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val lsMins = sym.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      val large = sym.join(lsMins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()

      // Small-Star: group edges (u > v) at u; connect u and all its
      // smaller neighbors to m = min of that group.
      val ssMins = large.groupBy("u").agg(min(col("v")).as("m"))
      val small = large.join(ssMins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .union(ssMins.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint()

      val newSig = signature(small)
      converged = newSig == sig
      sig = newSig
      edges = small
      iter += 1
    }
    // fixpoint: every edge points a node at its component min. Nodes
    // that ARE the min appear only on the v side — add their self rows.
    edges.select(col("u").as("id"), col("v").as("component"))
      .union(edges.select(col("v").as("id"), col("v").as("component")))
      .distinct()
  }

  /** Keep exactly one row per duplicate cluster (the component-minimum
    * id); rows never appearing in `pairs` are kept untouched.
    */
  def dedupByComponents(df: DataFrame, idCol: String, pairs: DataFrame,
                        aCol: String, bCol: String): DataFrame = {
    val comp = components(pairs, aCol, bCol)
    val losers = comp.where(col("id") =!= col("component")).select(col("id").as("__drop"))
    df.join(losers, df(idCol) === col("__drop"), "left_anti")
  }
}
