package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking — split documents into overlapping
  * fixed-token windows (the RAG-ingest / long-doc-training shape:
  * embedding models and context windows take N tokens, documents
  * don't).
  *
  * Chunk starts step by (maxTokens − overlap); each chunk takes
  * maxTokens words from its start; generation stops at the first chunk
  * that reaches the document's end, so every word is covered exactly
  * once beyond the declared overlap and no trailing fragment is a
  * subset of its predecessor. Pure per-row computation — one narrow
  * explode, no shuffle, no state; chunk ids are (doc, index), so the
  * output is deterministic and joins back to its source trivially.
  */
object Chunking {

  /** Explode (idCol, textCol) into (idCol, chunk_idx, chunk_text,
    * chunk_tokens) windows of `maxTokens` words overlapping by
    * `overlap`.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be > 0, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val step = maxTokens - overlap
    df.select(col(idCol), split(col(textCol), " ").as("__w"))
      .select(col(idCol), col("__w"),
        explode(expr(
          // last start K is the first whose chunk reaches the end:
          // K = ceil((n − maxTokens) / step), 0 when the doc fits whole
          s"sequence(0, CASE WHEN size(__w) <= $maxTokens THEN 0 " +
            s"ELSE (size(__w) - $maxTokens + ${step - 1}) div $step END)"))
          .as("__k"))
      .select(col(idCol), col("__k").as("chunk_idx"),
        expr(s"slice(__w, __k * $step + 1, $maxTokens)").as("__cw"))
      .filter(size(col("__cw")) > 0)
      .select(col(idCol), col("chunk_idx"),
        array_join(col("__cw"), " ").as("chunk_text"),
        size(col("__cw")).as("chunk_tokens"))
  }
}
