package graft

import org.apache.spark.sql.SparkSession

/** Measurement harness (optimization rounds): write `.explain("formatted")`
  * for named queries to `plans/<tag>/<query>_<suffix>.txt` so plan-shape
  * claims in OPTIMIZATION_r*.md are checkable without running Spark.
  *
  * Usage: runMain graft.PlanDump <tag> <suffix> [q1,q2,... | all-headline]
  * Session config mirrors graft.Bench at the same SF (thin-input profile,
  * auto split sizing) so the dumped plan is the plan the bench executes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "r19"
    val suffix = if (args.length > 1) args(1) else "before"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val thin = Bench.thinInput(sfDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", if (thin) "8" else cpus))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", if (thin) "false" else "true"))
      .config("spark.sql.files.maxPartitionBytes",
        Bench.autoMaxPartitionBytes(sfDir, cpus.toInt))
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val all = SparkEntry.queries ++ Bench.extras
    val names: Seq[String] =
      if (args.length > 2 && args(2) != "all-headline")
        args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Bench.headline
    val dir = new java.io.File(s"plans/$tag")
    dir.mkdirs()
    names.foreach { n =>
      all.get(n) match {
        case None => System.err.println(s"[plandump] unknown query: $n")
        case Some(fn) =>
          // bucketed variants read bench-setup tables that only exist in a
          // bench run; skip them rather than fake the setup here
          val txt =
            try {
              val df = fn(spark, sfDir)
              df.queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode)
            } catch {
              case e: Throwable => s"UNAVAILABLE OUTSIDE BENCH SETUP: $e"
            }
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"plans/$tag/${n}_$suffix.txt"), txt)
          System.err.println(s"[plandump] wrote plans/$tag/${n}_$suffix.txt")
      }
    }
    spark.stop()
    sys.exit(0)
  }
}
