package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch

/** Diagnostic: measures ANN/LSH recall against the exact computation at a
  * given SF dir, across parameter settings — used to pick gate-query
  * parameters where the approximate path achieves full recall on the
  * deterministic test corpus (so the gate can use a value-level oracle).
  * `sbt "runMain graft.tools.RecallProbe /root/testdata/sf0.01"`.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.queries.load(spark, sfDir, "embeddings")
    val query = emb.filter(col("vec_id") === 0)
      .select(transform(col("embedding"), _.cast("double")))
      .head().getSeq[Double](0).toArray

    val exact = SimilaritySearch.bruteForceTopK(
      emb.filter(col("vec_id") =!= 0), "embedding", "vec_id", query, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

    for ((nBits, nTables, mp) <- Seq((8, 8, 2), (8, 8, 3), (8, 16, 2), (4, 24, 1), (6, 16, 2))) {
      val ann = SimilaritySearch.annTopK(
        emb.filter(col("vec_id") =!= 0), "embedding", "vec_id", query,
        k = 10, nBits = nBits, nTables = nTables, multiprobe = mp)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      val hit = ann.intersect(exact).size
      println(s"[probe] annTopK nBits=$nBits nTables=$nTables mp=$mp recall=$hit/10 equal=${ann == exact}")
    }

    // ---- IVF nprobe sweep -------------------------------------------
    // (a) the raw corpus (near-uniform random embeddings — the WORST case
    // for IVF: the true top-k scatters across cells, recall must climb
    // roughly linearly in probed fraction), and (b) a planted-cluster
    // corpus (the realistic case: 40 near-copies of the query vector —
    // recall should hit 1.0 at nprobe=1 because the cluster shares the
    // query's cell).
    val exactIds = exact.map(_._1)
    for (nprobe <- Seq(1, 2, 4, 8, 16)) {
      val got = SimilaritySearch.ivfTopK(emb.filter(col("vec_id") =!= 0),
        "embedding", "vec_id", query, k = 10, nlist = 16, nprobe = nprobe)
        .collect().map(_.getLong(0)).toSet
      println(s"[probe] ivfTopK uniform nlist=16 nprobe=$nprobe recall=${got.intersect(exactIds).size}/10")
    }

    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = Array.fill(64)(rnd.nextGaussian())
    def jitter(eps: Double): Array[Float] =
      base.map(v => (v + eps * rnd.nextGaussian()).toFloat)
    val planted = ((0 until 2000).map(i => (1000L + i, Array.fill(64)(rnd.nextGaussian().toFloat))) ++
      (0 until 40).map(i => (5000L + i, jitter(0.05)))).toDF("vec_id", "embedding")
    val pExact = SimilaritySearch.bruteForceTopK(planted, "embedding", "vec_id",
      base, k = 10).collect().map(_.getLong(0)).toSet
    for (nprobe <- Seq(1, 2, 4, 8)) {
      val got = SimilaritySearch.ivfTopK(planted, "embedding", "vec_id", base,
        k = 10, nlist = 16, nprobe = nprobe)
        .collect().map(_.getLong(0)).toSet
      println(s"[probe] ivfTopK planted nlist=16 nprobe=$nprobe recall=${got.intersect(pExact).size}/10")
    }

    spark.stop()
    sys.exit(0)
  }
}
