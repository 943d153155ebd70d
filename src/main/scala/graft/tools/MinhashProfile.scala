package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the MinHash-LSH pipeline. */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mh] $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val docs = graft.queries.load(spark, sfDir, "documents")
    val pairs = Dedup.minhashLshPairs(docs, "text", "doc_id", threshold = 0.8)
    t("full pipeline")(pairs.write.format("noop").mode("overwrite").save())
    t("full again")(pairs.write.format("noop").mode("overwrite").save())
    // stage decomposition via the internal shapes
    val par = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val base = docs.select(col("doc_id").as("id"), col("text").as("__text")).repartition(par)
    val sig = base.withColumn("sig", Dedup.signatureForProfile(128, 3)(col("__text"))).filter(col("sig").isNotNull)
    t("signatures only")(sig.select("id", "sig").write.format("noop").mode("overwrite").save())
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => hash(slice(col("sig"), b * lit(8) + 1, lit(8)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val cand = l.join(r, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    val nc = t("candidates")(cand.count())
    println(s"[mh] candidates: $nc")
    val hashed = base.withColumn("__sh", Dedup.shingleHashesForProfile(3)(col("__text"))).select("id", "__sh")
    t("shingle arrays only")(hashed.write.format("noop").mode("overwrite").save())
    spark.stop(); sys.exit(0)
  }
}
