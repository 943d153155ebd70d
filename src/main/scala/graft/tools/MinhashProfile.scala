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
    val n = t("pair count")(pairs.count())
    println(s"[mh] verified pairs: $n")
    spark.stop(); sys.exit(0)
  }
}
