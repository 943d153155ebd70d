package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the ANALYZE pass a curation pipeline runs before
  * and after every transform (schema drift, null explosions, cardinality
  * collapse are how upstream corruption shows up first at 100 TB).
  *
  * One aggregation job per profiled column, unioned; every branch is a
  * full-scan count + exact distinct. Exact `count(DISTINCT)` shuffles
  * the distinct values of each column — that is the honest price of an
  * exact answer and what the oracle can verify; a production sweep over
  * wide tables would swap in HLL sketches (`approx_count_distinct`),
  * which no longer oracle-match across engines and so stay out of the
  * gate. min/max are cast to string so heterogeneous columns stack in
  * one result (profile numeric columns separately when exact types
  * matter).
  */
object Profile {

  /** Per-column stats: (column, n_rows, n_null, n_distinct, min, max). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        count_distinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_val"),
        max(col(c)).cast("string").as("max_val"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_ unionAll _)
  }
}
