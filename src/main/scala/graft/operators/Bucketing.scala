package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-located join support: bucket fact tables on their join key at
  * ingest so repeated fact-fact joins skip the shuffle entirely — the
  * single biggest lever for the 100 TB lineitem⋈orders-shaped workload
  * (SCALE.md). Bucketed layout persists through the session catalog;
  * both sides bucketed on the same key with the same count ⇒ Spark plans
  * a sort-merge join with NO Exchange on either side (asserted in
  * BucketingSpec).
  */
object Bucketing {

  /** Bucket count from source size, holding per-bucket volume constant
    * (~`targetBytesPerBucket` of source data per bucket) so the layout
    * scales with the data instead of the other way around. A fixed
    * count silently fails at scale: 32 buckets were exchange-free AND
    * faster than the shuffled plan at sf10 (~64 MB/bucket) but LOST to
    * it at sf30 (~190 MB/bucket — each merge task overflows memory and
    * the single-file-per-bucket sort dominates). Both sides of a
    * co-located join must use the SAME count — size from the pair's
    * dominant table (see Bench setup).
    *
    * `minBuckets` should be at least 2× the cluster's total parallelism:
    * a bucket count equal to the core count runs the join as ONE wave
    * with zero scheduling slack, so a single slow task extends the whole
    * stage. Measured at sf30 on 32 cores (round-11 probe, q06 bucketed):
    * 16 buckets 6.8 s, 32 → 5.0 s, 64 → 4.3 s, 128 → 4.7 s — two waves
    * of half-size tasks absorb stragglers and halve the per-task hash
    * build; past that, per-file overhead wins. The library default stays
    * a layout-safe 32 (callers know their parallelism; the bench passes
    * 2× its core count).
    */
  def autoBuckets(df: DataFrame, targetBytesPerBucket: Long = 64L << 20,
                  minBuckets: Int = 32): Int = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = (bytes + (targetBytesPerBucket - 1)) / targetBytesPerBucket
    n.max(minBuckets).min(1 << 20).toInt
  }

  /** Write `df` as a bucketed+sorted managed table. `numBuckets <= 0`
    * (the default) derives the count from the source size via
    * [[autoBuckets]].
    *
    * The pre-write `repartition(numBuckets, key)` uses the same
    * murmur3/pmod hash as bucket assignment, so every write task holds
    * exactly one bucket's rows and each bucket is ONE file. That matters
    * beyond tidiness: Spark only treats a bucket as sorted when it is a
    * single file (multi-file buckets forfeit the sortBy), so one file per
    * bucket lets a sort-merge join drop BOTH the Exchange and the Sort —
    * without it the read side re-sorts every bucket on every query.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int = 0): Unit = {
    val nb = if (numBuckets > 0) numBuckets else autoBuckets(df)
    df.repartition(nb, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite")
      .bucketBy(nb, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-key bucketed tables — shuffle-free when bucket counts
    * match.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
