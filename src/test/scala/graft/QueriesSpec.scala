package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Smoke: every SparkEntry query plans and executes on sf0.001. Value
  * correctness is checked against DuckDB by the driver (and locally via
  * tools/oracle_check.py).
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.TestSpark.spark

  val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dir).collect(); None }
      catch { case e: Exception => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("oracle SQL exists for the SQL-expressible inventory") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs))
    assert(os.size >= 40)
  }
}
