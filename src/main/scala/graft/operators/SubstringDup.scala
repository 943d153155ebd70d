package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-substring duplication signals (the Lee et al. 2022
  * "Deduplicating Training Data Makes Language Models Better" family,
  * re-expressed relationally): for each document, the share of its
  * character n-gram start positions whose n-gram also occurs in at
  * least one OTHER document. High shares mark boilerplate and
  * cross-document copy-paste that doc-level near-dedup (MinHash) keeps.
  *
  * Instead of a suffix array (a global sorted structure that doesn't
  * shard), the relational shape is: stride-sampled n-gram extraction
  * (one narrow pass, O(chars/stride) rows) → distinct (doc, gram) →
  * gram-count — two map-side-combined shuffles keyed on the gram. At
  * 100 TB the gram key should be `xxhash64(gram)` (8 B vs n B keys, the
  * count is collision-tolerant); the gate keeps raw grams so the DuckDB
  * oracle is byte-identical. Stride trades recall for volume exactly
  * like the paper's sampled suffix scans.
  */
object SubstringDup {

  /** Per-document duplicated-span stats: `n_grams` sampled positions,
    * `n_dup` positions whose n-gram occurs in ≥2 distinct docs,
    * `dup_frac` their ratio. Docs shorter than `n` chars are dropped
    * (they have no n-gram position).
    *
    * `hashGrams=true` keys the shuffle on `xxhash64(gram)` (8-byte
    * fixed-width keys instead of n-byte strings) — the doc-count is
    * collision-tolerant, so this is the 100 TB deployment shape; the
    * oracle gate keeps raw grams for byte-identical DuckDB comparison.
    */
  def dupSpanStats(df: DataFrame, idCol: String, textCol: String,
                   n: Int, stride: Int, hashGrams: Boolean = false): DataFrame = {
    require(n > 0 && stride > 0, s"n and stride must be > 0, got n=$n stride=$stride")
    // collapse positions to (doc, gram, position-count) FIRST: the
    // groupBy is map-side-combined, so repetitive text (the common case
    // in a dup-heavy corpus) shrinks the shuffled volume from
    // O(positions) to O(distinct grams per doc), and the doc-count join
    // below runs on the collapsed set
    // explode INT positions and slice the gram after: the per-doc array
    // holds 4-byte ints, not materialized strings, and the substring
    // fuses into the aggregation's codegen stage
    val rawGram = expr(s"substring(__t, __i, $n)")
    val gramKey = if (hashGrams) xxhash64(rawGram) else rawGram
    val gramCounts = df.filter(length(col(textCol)) >= n)
      .select(col(idCol).as("__id"), col(textCol).as("__t"),
        explode(expr(s"sequence(1, length($textCol) - ${n - 1}, $stride)"))
          .as("__i"))
      .select(col("__id"), gramKey.as("gram"))
      .groupBy(col("__id"), col("gram"))
      .agg(count(lit(1)).as("__cnt"))
    // shared-gram set via groupBy + join back, NOT a gram-partitioned
    // window: a window forces every row of a gram into ONE task, and a
    // ubiquitous boilerplate gram (present in a large fraction of a
    // dup-heavy corpus) becomes an unsplittable straggler — AQE's skew
    // handling applies to joins, not window partitions. The join back
    // costs one more gram-keyed exchange, but both its sides are
    // AQE-skew-splittable, and the probe side is only the grams that
    // ARE shared (one row per dup gram — tiny, often broadcastable).
    // Spark reuses gramCounts' exchange across the two consumers
    // (ReusedExchange), so the extraction pass still runs once.
    val dupGrams = gramCounts.groupBy(col("gram"))
      .agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= 2)
      .select(col("gram"), lit(1).as("__dup"))
    gramCounts.join(dupGrams, Seq("gram"), "left")
      .groupBy(col("__id").as(idCol))
      .agg(sum(col("__cnt")).as("n_grams"),
        sum(when(col("__dup").isNotNull, col("__cnt")).otherwise(lit(0L)))
          .cast("long").as("n_dup"))
      .withColumn("dup_frac",
        round(col("n_dup").cast("double") / col("n_grams"), 4))
  }
}
