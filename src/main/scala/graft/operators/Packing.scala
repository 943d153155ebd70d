package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-token-budget bins in a stable order — the "concatenate the
  * corpus, chunk at the budget boundary" layout LLM pretraining uses.
  * A document's bin is where its first token lands:
  * bin = floor(exclusive-prefix-sum(weight) / budget).
  *
  * Deterministic by construction (pure function of the shard/order
  * columns), so re-runs, engines, and cluster sizes produce identical
  * bins — and the assignment is auditable as one SQL window expression.
  *
  * Scale: a single global prefix sum would be one window partition; the
  * shard column keeps it parallel — packing runs independently per
  * shard (per language/source/date in practice), one shuffle on the
  * shard key, each shard's cumsum local to its partition. Skew follows
  * the shard histogram, same remedy as any hot key (split the shard).
  */
object Packing {

  /** Add a `bin` column: per-shard fixed-budget bin assignment.
    *
    * @param shardCol  independent packing domains (packing never crosses
    *                  a shard boundary)
    * @param orderCol  stable total order within a shard
    * @param weightCol per-row cost (token count); rows wider than
    *                  `budget` start in their natural bin and spill into
    *                  subsequent bin ranges, exactly like a long document
    *                  chunked across training sequences
    */
  def packBins(df: DataFrame, shardCol: String, orderCol: String,
               weightCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("bin",
      floor(coalesce(sum(col(weightCol)).over(w), lit(0L)) / lit(budget.toDouble)))
  }

  /** Per-bin summary: rows and total weight per (shard, bin). */
  def binStats(df: DataFrame, shardCol: String, orderCol: String,
               weightCol: String, budget: Long): DataFrame =
    packBins(df, shardCol, orderCol, weightCol, budget)
      .groupBy(col(shardCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(weightCol)).cast("long").as("sum_weight"))
}
