package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TermHits

/** BM25 full-text relevance scoring (Robertson et al.; the Lucene
  * `1 + (N - df + 0.5)/(df + 0.5)` idf variant) — the retrieval side of
  * a data pipeline: scoring documents against benchmark queries,
  * building hard-negative mining sets, keyword-driven corpus slicing.
  *
  * Plan shape (no index structure, no driver loops, no explode):
  *   1. one kernel pass per document ([[graft.functions.TermHits]])
  *      yields `(dl, tf per query term)` — the (doc, term) aggregate
  *      the relational `split`→`explode`→`groupBy` pipeline needs a
  *      full-token Generate and a shuffle to produce;
  *   2. corpus stats (N, avgdl) AND per-term df all ride ONE 1-row
  *      aggregate, broadcast to the scoring scan — never a driver
  *      constant baked into the plan;
  *   3. score = Σ_t idf(t) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)),
  *      unrolled over the literal term list inside one projection;
  *   4. top-k is a TakeOrderedAndProject — per-partition heaps, no
  *      global sort.
  *
  * The only exchanges are the 1-row stats reduce and the O(k)
  * TakeOrdered gather: the corpus itself is never shuffled, so the plan
  * is scan-bound at any scale. At 100 TB, persisting the kernel output
  * keyed by doc IS the query-restricted inverted index, amortized
  * across query batches.
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
    val docs = df.select(col(idCol),
      TermHits.termHits(lower(col(textCol)), terms.map(_.toLowerCase)).as("__h"))
      .select(col(idCol), col("__h.dl").cast("double").as("__dl"),
        col("__h.tfs").as("__tfs"))
    // One scan, one 1-row reduce: corpus size, average length, and every
    // term's document frequency together. Null-text docs count toward N
    // (as in a bare count(*)) but carry no length or hits.
    val dfCols = terms.indices.map(i => sum(when(col("__tfs")(i) > 0, 1)
      .otherwise(0)).cast("double").as(s"__df$i"))
    val statCols = avg(col("__dl")).as("__avgdl") +: dfCols
    val stats = docs.agg(count(lit(1)).cast("double").as("__n"),
      statCols: _*)
    // Second scan: keep docs hitting any term, score against the
    // broadcast stats row with the sum unrolled over the term list.
    val score: Column = terms.indices.map { i =>
      val tf = col("__tfs")(i).cast("double")
      val idf = log(lit(1.0) +
        (col("__n") - col(s"__df$i") + 0.5) / (col(s"__df$i") + 0.5))
      when(col("__tfs")(i) > 0,
        idf * tf * lit(k1 + 1.0) / (tf + lit(k1) *
          (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    // ONE reference to __tfs in the filter: the per-index OR-chain
    // referenced it `terms.size` times, and predicate pushdown through
    // the projection substituted the term_hits kernel into EVERY
    // reference — at 4 terms the kernel ran 5x per doc (4 filter + 1
    // project; r19 plan audit, plans/r19/q81_bm25_search_before.txt).
    // `exists` is the same predicate with a single reference, so the
    // pushed filter evaluates the kernel once. Null-text docs: __tfs is
    // null, exists(null) is null — filtered, exactly as the OR-chain.
    docs.filter(exists(col("__tfs"), t => t > 0))
      .crossJoin(broadcast(stats))
      .select(col(idCol), round(score, scale).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
