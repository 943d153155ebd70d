package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession for the whole test JVM. Extensions must be configured
  * on the FIRST session created — getOrCreate silently ignores them
  * afterwards — so every suite must use this object instead of building
  * its own.
  */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
