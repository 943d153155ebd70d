package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Streaming document curation — the ingestion-time shape of the batch
  * curation operators: documents arrive as files (the streaming file
  * source), each micro-batch is planted/redacted/sampled by the SAME
  * Column expressions and operators the batch gates use (stateless
  * map/filter — no watermark or state store needed), and a
  * complete-mode aggregation summarizes the retained corpus.
  *
  * At scale this is the kappa-style curation front door: the map stage
  * is embarrassingly parallel per file split, the only stateful node is
  * the final aggregation (tiny — one row per language), and the exact
  * same expressions serve the backfill batch job, so batch and stream
  * can never drift.
  */
object DocsStream {

  /** Plant synthetic PII → redact → deterministic md5-prefix sample →
    * per-language counts over the redacted text, as a real Structured
    * Streaming query (parquet file source → memory sink,
    * `processAllAvailable`).
    */
  def runCurationAsStream(spark: SparkSession, inputDir: String,
                          queryName: String): DataFrame = {
    val schema = spark.read.parquet(inputDir).schema
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    val curated = graft.operators.Sampling.hashSample(
      stream
        .withColumn("t", graft.queries.Curation.plantPii(col("doc_id"), col("text")))
        .withColumn("redacted", TextFunctions.piiRedact(col("t"))),
      "doc_id", numerator = 20)
    val agg = curated.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(length(col("redacted"))).cast("long").as("sum_chars"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(queryName).start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
