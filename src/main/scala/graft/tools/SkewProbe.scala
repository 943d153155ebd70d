package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostics: input-partition counts and simhash piece-bucket skew. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.load(spark, sfDir, "documents")
    println(s"[skew] documents input partitions: ${docs.rdd.getNumPartitions}")
    val sigs = docs.select(col("doc_id").as("id"),
      graft.operators.Dedup.simhash(col("text")).as("sig"))
    // 4x16-bit narrow pieces: bucket histogram of the hottest piece
    val t0 = System.nanoTime()
    val pieceCounts = (0 until 4).map { i =>
      val piece = shiftright(col("sig"), i * 16).bitwiseAND(lit(0xffffL))
      val top = sigs.groupBy(piece.as("p")).count()
        .orderBy(desc("count")).limit(5).collect()
      (i, top.map(r => r.getLong(1)).toSeq)
    }
    println(f"[skew] sig+hist time ${(System.nanoTime()-t0)/1e9}%.1f s")
    pieceCounts.foreach { case (i, top) =>
      println(s"[skew] piece $i top bucket sizes: ${top.mkString(",")}")
    }
    spark.stop(); sys.exit(0)
  }
}
