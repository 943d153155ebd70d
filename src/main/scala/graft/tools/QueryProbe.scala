package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query runner: `runMain graft.tools.QueryProbe <sfDir>
  * <name> [explain]` — times one SparkEntry query with the bench's noop
  * materialization and optionally dumps the formatted plan.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val explain = args.length > 2 && args(2) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", sys.env.getOrElse("SPARK_GRAFT_PARFIRST", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    if (explain) df.explain("formatted")
    val t0 = System.nanoTime()
    try {
      df.write.format("noop").mode("overwrite").save()
      val warm = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val hot = (System.nanoTime() - t1) / 1e9
      println(f"[probe] $name ok cold=$warm%.2f s hot=$hot%.2f s")
    } catch {
      case e: Throwable =>
        println(s"[probe] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
        var c = e.getCause
        while (c != null) { println(s"[probe]   caused by: ${c.getClass.getName}: ${c.getMessage}"); c = c.getCause }
    }
    spark.stop()
    sys.exit(0)
  }
}
