package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus mixing for training-data pipelines: upsample each source to a
  * target weight (epochs), the way pretraining mixes under- and
  * over-represented sources. A weight of 2.5 means every doc appears
  * twice, plus a deterministic 50% Bernoulli third copy.
  *
  * Determinism: the fractional copy is kept by comparing an md5 prefix
  * of the id against the fraction's fixed-point threshold — the same
  * auditable coin as [[Sampling.hashSample]], so the mixed corpus is a
  * pure function of (ids, weights): identical across engines, re-runs,
  * and cluster sizes, and reproducible for dataset cards.
  *
  * Scale: replication is one narrow `explode` (no shuffle, no driver
  * data); output volume is sum(weight_s × |source_s|), the same row
  * count any engine must produce. Downstream shuffles see the
  * replicated volume — mix as late as possible (after filtering/dedup),
  * or keep the `replica` column virtual until sequence packing.
  */
object Mixing {

  /** Replicate rows per-source: floor(weight) full copies plus one
    * md5-Bernoulli fractional copy. Sources absent from `weights`
    * default to 1.0. Adds a `replica` column (0-based copy index).
    */
  def upsample(df: DataFrame, sourceCol: String, idCol: String,
               weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(_ >= 0.0), "weights must be >= 0")
    val w: Column = weights.foldLeft(lit(1.0)) { case (acc, (src, wt)) =>
      when(col(sourceCol) === src, lit(wt)).otherwise(acc)
    }
    val full = floor(w).cast("long")
    // keep the fractional extra copy iff the first 4 md5 hex digits of
    // the id sort below frac * 0x10000 (hex-string compare == numeric
    // compare at fixed width; lowercase on both engines). The explicit
    // floor() pins truncation semantics: a bare cast-to-long truncates
    // in Spark but CAST AS BIGINT rounds in DuckDB, so a non-integer
    // frac*65536 (e.g. 0.1 → 6553.6) would pick different thresholds
    // and break the cross-engine determinism contract.
    val fracThreshold = lpad(lower(hex(floor((w - full) * 65536).cast("long"))), 4, "0")
    val copies = full +
      when(substring(md5(col(idCol).cast("string")), 1, 4) < fracThreshold, 1L)
        .otherwise(0L)
    df.withColumn("__n_copies", copies)
      .filter(col("__n_copies") > 0)
      .withColumn("replica", explode(sequence(lit(0L), col("__n_copies") - 1)))
      .drop("__n_copies")
  }
}
