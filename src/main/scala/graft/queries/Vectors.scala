package graft.queries

import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  * Brute-force cosine top-k is the exact baseline; the LSH-bucketed
  * variant (graft.operators.SimilaritySearch) is the 100 TB path.
  *
  * Cosines run through the native codegen'd [[graft.functions.CosineSimExpr]]
  * (one fused loop over primitive doubles — HOF lambdas are interpreted
  * per element and were the bottleneck of the brute-force path). Vectors
  * are cast float→double before arithmetic so the math matches DuckDB's
  * double-precision list functions.
  */
object Vectors {

  private def cosineSim(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.VectorExpressions.cosineSim(a, b)

  private def norm(a: org.apache.spark.sql.Column) =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q50_cosine_topk",
      (s, d) => {
        val emb = load(s, d, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val target = broadcast(emb.filter(col("vec_id") === 0)
          .select(col("v").as("t")))
        emb.filter(col("vec_id") =!= 0)
          .crossJoin(target)
          .select(col("vec_id"),
            round(cosineSim(col("v"), col("t")), 4).as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("vec_id"))
          .limit(20)
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |t AS (SELECT v AS tv FROM e WHERE vec_id = 0)
             |SELECT vec_id,
             |round(list_dot_product(v, tv) /
             |  (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(tv, tv))), 4) AS cos_sim
             |FROM e, t WHERE vec_id <> 0
             |ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin)),

    QueryDef("q51_norms_by_label",
      (s, d) => load(s, d, "embeddings")
        .select(col("label"), col("embedding").cast("array<double>").as("v"))
        .select(col("label"), norm(col("v")).as("nrm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), round(avg(col("nrm")), 4).as("avg_norm"))
        .orderBy(col("label")),
      Some("""SELECT label, count(*) AS n,
             |round(avg(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))), 4) AS avg_norm
             |FROM embeddings GROUP BY label ORDER BY label""".stripMargin)),

    QueryDef("q52_embedding_near_dup",
      (s, d) => {
        // Embedding-cosine near-dup pairs on a blocked candidate set.
        val emb = load(s, d, "embeddings").filter(col("vec_id") < 100)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val a = emb.select(col("vec_id").as("id_a"), col("v").as("va"))
        val b = emb.select(col("vec_id").as("id_b"), col("v").as("vb"))
        a.join(b, col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            round(cosineSim(col("va"), col("vb")), 4).as("cos_sim"))
          .filter(col("cos_sim") > 0.3)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |          FROM embeddings WHERE vec_id < 100)
             |SELECT id_a, id_b, cos_sim FROM (
             |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  round(list_dot_product(a.v, b.v) /
             |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cos_sim
             |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
             |WHERE cos_sim > 0.3
             |ORDER BY id_a, id_b""".stripMargin)),

    QueryDef("q78_kmeans_step",
      (s, d) => {
        // One distributed Lloyd iteration (graft.operators.KMeans):
        // deterministic init (8 smallest-id vectors), broadcast-literal
        // cosine assignment (codegen'd, no shuffle), posexplode update
        // (k×dim partial sums per partition). The oracle recomputes the
        // identical iteration relationally in DuckDB — assignment via
        // windowed argmax, update via aligned unnest.
        val emb = load(s, d, "embeddings")
        val cs = graft.operators.KMeans.initCentroids(emb, "embedding", "vec_id", 8)
        graft.operators.KMeans.lloydStep(emb, "embedding", cs)
          .select(col("cluster"), col("n_members"),
            round(sqrt(aggregate(col("centroid"), lit(0.0),
              (acc, x) => acc + x * x)), 4).as("centroid_norm"))
          .orderBy(col("cluster"))
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
             |      FROM e ORDER BY vec_id LIMIT 8),
             |a AS (SELECT vec_id, v, cid, row_number() OVER (PARTITION BY vec_id
             |        ORDER BY list_dot_product(v, cv) /
             |          (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) DESC,
             |        cid) AS rn
             |      FROM e CROSS JOIN c),
             |m AS (SELECT cid AS cluster, vec_id, v FROM a WHERE rn = 1),
             |n AS (SELECT cluster, count(*) AS n_members FROM m GROUP BY cluster),
             |dims AS (SELECT cluster, unnest(generate_series(0, len(v) - 1)) AS dim,
             |               unnest(v) AS x FROM m),
             |g AS (SELECT cluster, dim, avg(x) AS mx FROM dims GROUP BY cluster, dim)
             |SELECT g.cluster, n.n_members,
             |  round(sqrt(sum(mx * mx)), 4) AS centroid_norm
             |FROM g JOIN n USING (cluster)
             |GROUP BY g.cluster, n.n_members ORDER BY g.cluster""".stripMargin)),

    QueryDef("q95_semdedup",
      (s, d) => {
        // SemDeDup (graft.operators.SemDeDup): cluster on the k=8
        // deterministic init centroids, then drop any vector whose
        // cluster holds a higher-priority member (farther from the
        // centroid; id tie-break) within cosine >= 0.35. The fixture has
        // no planted embedding near-dups (max pairwise cosine ~0.51), so
        // the gate threshold sits below dedup practice on purpose: it
        // exercises assignment + the shadow anti-join on both the drop
        // and keep paths (79 of 500 dropped at sf0.01); the
        // planted-duplicate semantics are spec-tested (OperatorsSpec).
        val emb = load(s, d, "embeddings")
        graft.operators.SemDeDup
          .semDedup(emb, "embedding", "vec_id", k = 8, tau = 0.35)
          .select(col("vec_id"), col("cluster"),
            round(col("cent_sim"), 4).as("cent_sim"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
             |      FROM e ORDER BY vec_id LIMIT 8),
             |a AS (SELECT vec_id, v, cid,
             |        list_dot_product(v, cv) /
             |          (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) AS sim,
             |        row_number() OVER (PARTITION BY vec_id
             |        ORDER BY list_dot_product(v, cv) /
             |          (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) DESC,
             |        cid) AS rn
             |      FROM e CROSS JOIN c),
             |m AS (SELECT cid AS cl, vec_id, v, sim AS cent_sim FROM a WHERE rn = 1),
             |dropped AS (SELECT DISTINCT x.vec_id
             |  FROM m x JOIN m y ON x.cl = y.cl
             |   AND (y.cent_sim < x.cent_sim
             |        OR (y.cent_sim = x.cent_sim AND y.vec_id < x.vec_id))
             |  WHERE list_dot_product(x.v, y.v) /
             |    (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) >= 0.35)
             |SELECT vec_id, cl AS cluster, round(cent_sim, 4) AS cent_sim
             |FROM m WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
             |ORDER BY vec_id""".stripMargin))
  )
}
