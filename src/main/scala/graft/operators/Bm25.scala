package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 full-text relevance scoring (Robertson et al.; the Lucene
  * `1 + (N - df + 0.5)/(df + 0.5)` idf variant) — the retrieval side of
  * a data pipeline: scoring documents against benchmark queries,
  * building hard-negative mining sets, keyword-driven corpus slicing.
  *
  * Relational shape (no index structure, no driver loops):
  *   1. tokenize + filter to the query's terms — the explode never
  *      materializes non-query terms, so the shuffled volume is
  *      O(query hits), not O(corpus tokens);
  *   2. per-(doc, term) tf and per-term df — two map-side-combined
  *      aggregations on narrow keys;
  *   3. corpus stats (N, avgdl) ride along as a broadcast 1-row join,
  *      never a driver constant baked into the plan;
  *   4. score = Σ_t idf(t) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)).
  *
  * At 100 TB this is the inverted-index build restricted to the query
  * vocabulary; persisting step-2's (term, doc, tf) table IS the
  * inverted index, amortized across query batches.
  */
object Bm25 {

  /** Top-k documents by BM25 score for `terms`. Returns (idCol, score)
    * with `score` rounded to `scale` decimals (ordering uses the
    * rounded value + id so results are reproducible across engines).
    */
  def topK(df: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75,
           scale: Int = 3): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    // ONE tokenize pass carries both the exploded terms and the doc
    // length: __dl rides through the (doc, term) aggregation as a
    // constant-per-doc max, so no full-corpus lengths table is ever
    // built or joined — only docs that hit a query term have a length
    // row downstream. Corpus stats (N, avgdl) come from a separate
    // scan-and-reduce with no split-array materialization beyond
    // size(): a cheap full scan, zero shuffle, broadcast as one row.
    val stats = df.agg(
      count(lit(1)).cast("double").as("__n"),
      avg(size(split(col(textCol), " ")).cast("double")).as("__avgdl"))
    val tf = df
      .select(col(idCol), split(lower(col(textCol)), " ").as("__w"))
      .select(col(idCol), size(col("__w")).cast("double").as("__dl"),
        explode(col("__w")).as("__term"))
      .filter(col("__term").isin(terms: _*))
      .groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).cast("double").as("__tf"), max(col("__dl")).as("__dl"))
    val dfreq = tf.groupBy(col("__term"))
      .agg(count(lit(1)).cast("double").as("__df")) // tf rows are distinct per doc
    tf.join(broadcast(dfreq), "__term")
      .crossJoin(broadcast(stats))
      .withColumn("__idf", log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5)))
      .withColumn("__s", col("__idf") * col("__tf") * lit(k1 + 1.0) /
        (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col(idCol))
      .agg(round(sum(col("__s")), scale).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
