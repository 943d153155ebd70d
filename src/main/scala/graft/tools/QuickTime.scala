package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one named gate query with the Bench session config — the
  * iterate-on-one-plan loop (`Bench` runs the whole headline set).
  *
  * Usage: runMain graft.tools.QuickTime <query> <sfDir> [runs=3]
  */
object QuickTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    def run(): Double = {
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      df.collect()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = run()
    val warms = Seq.fill(runs)(run()).sorted
    println(f"[quicktime] $name cold=$cold%.2f warm_median=${warms(warms.length / 2)}%.2f all=${warms.map(w => f"$w%.2f").mkString(",")}")
    spark.stop()
    sys.exit(0)
  }
}
