package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perplexity-proxy quality scoring (the CCNet/Wikipedia-LM filtering
  * shape, made engine-native and deterministic): score each document by
  * its character-trigram cross-entropy against the corpus's own trigram
  * distribution — boilerplate and in-domain text scores low, junk
  * (wrong language, mojibake, random bytes) scores high. A real KenLM
  * is an external binary model; this is the relational stand-in with
  * the same pipeline role, and the plumbing (two-pass: build LM counts,
  * score docs) is exactly what a production LM-filter job looks like.
  *
  * Pass 1 (the "LM"): trigram → count over the corpus, one map-side-
  * combined shuffle keyed on the trigram; the total rides a broadcast
  * 1-row join. Pass 2: each doc's trigrams join the count table (shuffle
  * keyed on trigram again — co-partitioned with pass 1's output) and
  * average −ln p(trigram). Persisting pass 1 IS the language model:
  * scoring a new corpus against a reference LM is `score(newDocs,
  * lmCounts)` with no rebuild — the CCNet deployment shape.
  */
object Perplexity {

  private def trigrams(df: DataFrame, idCol: String, textCol: String) =
    df.filter(length(col(textCol)) >= 3)
      .select(col(idCol).as("__id"),
        explode(expr(
          s"transform(sequence(1, length($textCol) - 2), " +
            s"i -> substring(lower($textCol), i, 3))")).as("tri"))

  /** The trigram LM: (tri, cnt) over the reference corpus. */
  def buildLm(reference: DataFrame, idCol: String, textCol: String): DataFrame =
    trigrams(reference, idCol, textCol)
      .groupBy(col("tri")).agg(count(lit(1)).as("cnt"))

  /** Per-doc cross-entropy against `lm`: avg over positions of
    * −ln(cnt/total), with unseen trigrams smoothed to count 1 (additive
    * floor — deterministic, engine-portable). Returns
    * (idCol, n_tris, entropy rounded to `scale`).
    */
  def score(docs: DataFrame, lm: DataFrame, idCol: String, textCol: String,
            scale: Int = 3): DataFrame = {
    val total = lm.agg(sum(col("cnt")).cast("double").as("__total"))
    trigrams(docs, idCol, textCol)
      .join(lm, Seq("tri"), "left")
      .crossJoin(broadcast(total))
      .select(col("__id"),
        (-log(coalesce(col("cnt"), lit(1L)).cast("double") / col("__total")))
          .as("__nll"))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_tris"),
        round(avg(col("__nll")), scale).as("entropy"))
  }

  /** One-corpus convenience: score every doc against the corpus's own
    * distribution (self-perplexity — outliers are the quality signal).
    */
  def selfScore(df: DataFrame, idCol: String, textCol: String,
                scale: Int = 3): DataFrame =
    score(df, buildLm(df, idCol, textCol), idCol, textCol, scale)
}
