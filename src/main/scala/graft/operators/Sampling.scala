package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * Both operators are REPRODUCIBLE BY CONSTRUCTION: the sampling decision
  * is a pure function of a stable id (a content hash prefix), not of an
  * RNG seed + partition layout. `df.sample()` changes its row set when
  * partitioning changes; a curation pipeline needs the same corpus subset
  * on every rerun, engine, and cluster size — and needs the decision
  * auditable per row (`WHERE substr(md5(id),1,2) < 'xx'` is re-runnable
  * anywhere, including the oracle engine).
  */
object Sampling {

  /** The sampling key: first byte of md5(id) as a hex string. Uniform over
    * ids, engine-portable (md5 of the decimal string form).
    */
  private def hashKey(idCol: Column): Column =
    substring(md5(idCol.cast("string")), 1, 2)

  /** Keep rows whose hash key falls below numerator/256 — a deterministic
    * Bernoulli(p) sample with p in 256ths. Pure codegen'd filter: no
    * shuffle, no RNG state, so at 100 TB it fuses into the scan stage and
    * composes with partition pruning.
    */
  def hashSample(df: DataFrame, idCol: String, numerator: Int): DataFrame = {
    require(numerator >= 0 && numerator <= 256,
      s"numerator must be in [0, 256], got $numerator")
    // 256/256 keeps everything — "100" is 3 chars and would break the
    // 2-hex-char string comparison
    if (numerator == 256) df
    else df.filter(hashKey(col(idCol)) < lit(f"$numerator%02x"))
  }

  /** Exactly min(n, |stratum|) rows per stratum, chosen by hash order —
    * deterministic stratified sampling (class-balanced subsets, per-source
    * caps). One shuffle on the stratum key; rows beyond rank n are
    * discarded by the window filter. Skewed strata cost one hot partition
    * here — for pathological strata (one stratum = half the corpus), cap
    * with [[hashSample]] first, then take the exact n.
    */
  def stratifiedFixed(df: DataFrame, stratumCol: String, idCol: String,
                      n: Int): DataFrame = {
    require(n > 0, s"per-stratum sample size must be > 0, got $n")
    // rank by the FULL md5 string: the 2-hex-char hashKey prefix is fine
    // as a Bernoulli threshold but collides ~1/256 per pair as a rank
    // order, and a prefix collision straddling rank n makes the picked
    // set tie-break-dependent instead of a pure function of the hash
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
