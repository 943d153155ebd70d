package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key salting — the join-skew remedy you reach for when AQE's
  * runtime skew split can't help: streaming joins (no AQE), a hot key
  * the optimizer underestimates, or a deterministic plan you need to
  * pin at ingest time. (For plain batch joins, AQE's OptimizeSkewedJoin
  * is the first answer — proven in PlanQualitySpec; this operator is
  * the manual override.)
  *
  * Mechanics: each big-side row gets one of `salt` pseudo-random salt
  * values, the small side is replicated `salt`× (one narrow explode —
  * small side only, so the cost is salt × |small|), and the join key
  * becomes (key, salt). A key whose rows filled one reducer now spreads
  * over `salt` reducers. The result set is identical to the unsalted
  * join by construction — every big row still meets every matching
  * small row exactly once.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key` with the big side spread across
    * `salt` sub-partitions per key. Inner and left_outer semantics
    * (the salted small side would multiply right_outer/full unmatched
    * rows; the API rejects those).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salt > 0, s"salt must be > 0, got $salt")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salted join supports inner/left_outer, got $joinType " +
        "(unmatched small-side rows would appear once per salt replica)")
    // salt assignment only needs to SPREAD same-key rows, not be stable:
    // any big row meets the full small side for its key whatever salt it
    // draws, so the join result is salt-invariant
    val b = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    b.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
