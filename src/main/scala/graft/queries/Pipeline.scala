package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, SimilaritySearch}
import graft.functions.TextFunctions

/** Training-data-pipeline operators as correctness-gate entries: MinHash
  * LSH near-dup (exact-verified, so the oracle is the exact all-pairs
  * computation), SimHash, multimodal decode plumbing, frame sampling, ANN,
  * and the native rolling-hash Expression. Queries without an oracle are
  * deterministic but not SQL-expressible (seeded hashes) — the driver
  * records rows-only checks; their semantics are pinned by DedupSpec /
  * MultimodalSpec planted fixtures.
  */
object Pipeline {

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q47_minhash_lsh_neardup",
      (s, d) => Dedup.minhashLshPairs(
          load(s, d, "documents"), "text", "doc_id",
          threshold = 0.8, numPerm = 128, bands = 16, shingleK = 3)
        .orderBy(col("id_a"), col("id_b")),
      // LSH recall with 16 bands × 8 rows is 1-(1-j^8)^16: ≈0.9999 at the
      // corpus's planted j≥0.9 pairs — verified output equals exact all-pairs.
      Some("""WITH t AS (
             |  SELECT doc_id, list_distinct([array_to_string(w[i:i+2], ' ')
             |         for i in range(1, greatest(len(w)-2,0)+1)]) AS sh
             |  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents))
             |SELECT id_a, id_b, jaccard FROM (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
             |          len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
             |  FROM t a JOIN t b ON a.doc_id < b.doc_id)
             |WHERE jaccard >= 0.8 ORDER BY id_a, id_b""".stripMargin)),

    QueryDef("q48_minhash_dedup_count",
      (s, d) => {
        val docs = load(s, d, "documents")
        val kept = Dedup.minhashLshDedup(docs, "text", "doc_id", threshold = 0.8)
        kept.agg(count(lit(1)).as("n_kept"))
      },
      // every near-dup pair drops its larger id; with the exact pair set
      // the kept count is total - |distinct larger ids|
      Some("""WITH t AS (
             |  SELECT doc_id, list_distinct([array_to_string(w[i:i+2], ' ')
             |         for i in range(1, greatest(len(w)-2,0)+1)]) AS sh
             |  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents)),
             |pairs AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM t a JOIN t b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
             |        len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8)
             |SELECT (SELECT count(*) FROM documents) -
             |       (SELECT count(DISTINCT id_b) FROM pairs) AS n_kept""".stripMargin)),

    QueryDef("q49_simhash_pairs",
      (s, d) => Dedup.simhashPairs(load(s, d, "documents"), "text", "doc_id", maxDistance = 3)
        .orderBy(col("id_a"), col("id_b")),
      None), // seeded 64-bit murmur signature: not SQL-expressible

    QueryDef("q53_multimodal_decode",
      (s, d) => {
        // Binary plumbing: wrap each doc as a fake GIMG asset whose
        // header dims derive from doc fields, decode executor-side.
        val docs = load(s, d, "documents")
          .withColumn("img", concat(
            concat_ws("|", lit("GIMG"), (col("n_chars") % 640).cast("string"),
              (col("doc_id") % 480).cast("string"), lit("3")),
            lit("|"), col("text")).cast("binary"))
        Multimodal.decodeImageMeta(docs.select(col("doc_id"), col("img")), "img")
          .select(col("doc_id"),
            col("image_meta.width").as("width"),
            col("image_meta.height").as("height"),
            col("image_meta.channels").as("channels"),
            col("image_meta.n_bytes").as("n_bytes"))
          .orderBy(col("doc_id"))
          .limit(500)
      },
      Some("""SELECT doc_id,
             |CAST(n_chars % 640 AS INT) AS width,
             |CAST(doc_id % 480 AS INT) AS height,
             |3 AS channels,
             |CAST(length('GIMG|' || CAST(n_chars % 640 AS VARCHAR) || '|' ||
             |  CAST(doc_id % 480 AS VARCHAR) || '|3|' || text) AS BIGINT) AS n_bytes
             |FROM documents ORDER BY doc_id LIMIT 500""".stripMargin)),

    QueryDef("q54_frame_sample",
      (s, d) => {
        val docs = load(s, d, "documents").filter(col("doc_id") < 100)
          .withColumn("vid", col("text").cast("binary"))
        Multimodal.sampleFrames(docs, "vid", "doc_id", frameSize = 64, stride = 2)
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_frames"))
          .orderBy(col("doc_id"))
      },
      // frames kept = ceil(ceil(len/64) / 2)
      Some("""SELECT doc_id,
             |CAST(ceil(ceil(length(text) / 64.0) / 2.0) AS BIGINT) AS n_frames
             |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin)),

    QueryDef("q55_ann_topk",
      (s, d) => {
        val emb = load(s, d, "embeddings")
        val query = emb.filter(col("vec_id") === 0)
          .select(transform(col("embedding"), _.cast("double")))
          .head().getSeq[Double](0).toArray
        SimilaritySearch.annTopK(emb.filter(col("vec_id") =!= 0),
          "embedding", "vec_id", query, k = 10, nBits = 8, nTables = 8)
      },
      None), // seeded hyperplane LSH: deterministic, not SQL-expressible

    QueryDef("q56_rolling_hash",
      (s, d) => load(s, d, "documents")
        .select(col("doc_id"), TextFunctions.rollingHash(col("text")).as("rh"))
        .orderBy(col("doc_id"))
        .limit(100),
      None), // 64-bit wrapping arithmetic overflows DuckDB BIGINT

    QueryDef("q57_quality_signals",
      (s, d) => load(s, d, "documents")
        .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("q"))
        .select(col("doc_id"), col("q.n_words").as("n_words"),
          col("q.uniq_ratio").as("uniq_ratio"),
          col("q.stopword_ratio").as("stopword_ratio"))
        .orderBy(col("doc_id"))
        .limit(500),
      Some("""SELECT doc_id, CAST(len(w) AS INT) AS n_words,
             |round(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 4) AS uniq_ratio,
             |round(CAST(len(list_filter(w, x -> list_contains(
             |  ['the','a','an','and','or','of','to','in','is','it'], lower(x)))) AS DOUBLE)
             |  / len(w), 4) AS stopword_ratio
             |FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)
             |ORDER BY doc_id LIMIT 500""".stripMargin)),

    QueryDef("q58_langid_ngram",
      (s, d) => load(s, d, "documents")
        .select(col("doc_id"), TextFunctions.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang_pred")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang_pred")),
      None), // marker-argmax heuristic pinned by TextFunctionsSpec

    QueryDef("q59_embedding_lsh_neardup",
      (s, d) => SimilaritySearch.cosineNearDupPairs(
          load(s, d, "embeddings").filter(col("vec_id") < 300),
          "embedding", "vec_id", threshold = 0.3, nBits = 6, nTables = 8)
        .orderBy(col("id_a"), col("id_b")),
      None) // LSH-blocked candidate set (recall < 1 at 0.3): rows-only
  )
}
