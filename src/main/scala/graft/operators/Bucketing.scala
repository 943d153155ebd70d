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

  /** Write `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int = 32): Unit = {
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
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
