package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Direction/strictness semantics of the as-of join on a hand fixture
  * with exact ties and null keys/timestamps (the gate queries q64/q66
  * hold the backward and forward variants to DuckDB ASOF oracles on the
  * events table; this spec pins the tie and strict edges those corpora
  * don't plant).
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  // left probes at ts 5, 10; right refs at ts 5 (tie), 7, 12; one null-ts
  // and one null-key right row that must never match; a null-ts LEFT row
  // must match nothing in either direction
  private lazy val left = Seq(
    (1L, "u", Some(5L)), (2L, "u", Some(10L)), (3L, "v", Some(6L)),
    (4L, "u", None))
    .toDF("id", "k", "ts")
  private lazy val right = Seq(
    (Some(100L), Some("u"), Some(5L)),
    (Some(101L), Some("u"), Some(7L)),
    (Some(102L), Some("u"), Some(12L)),
    (Some(103L), Some("u"), None),
    (Some(104L), None, Some(1L)))
    .toDF("rid", "k", "ts")

  private def run(direction: String, strict: Boolean): Map[Long, Option[Long]] =
    AsOfJoin.asofJoin(left, right, "k", "ts", "ts", Seq("rid"),
        direction = direction, strict = strict)
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap

  test("backward <=: exact tie visible, latest at-or-before wins") {
    assert(run("backward", strict = false) ==
      Map(1L -> Some(100L), 2L -> Some(101L), 3L -> None, 4L -> None))
  }

  test("backward < strict: exact tie excluded") {
    assert(run("backward", strict = true) ==
      Map(1L -> None, 2L -> Some(101L), 3L -> None, 4L -> None))
  }

  test("forward >=: earliest at-or-after wins, tie visible") {
    assert(run("forward", strict = false) ==
      Map(1L -> Some(100L), 2L -> Some(102L), 3L -> None, 4L -> None))
  }

  test("forward > strict: exact tie excluded, next-later wins") {
    assert(run("forward", strict = true) ==
      Map(1L -> Some(101L), 2L -> Some(102L), 3L -> None, 4L -> None))
  }

  test("invalid direction rejected") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(left, right, "k", "ts", "ts", Seq("rid"), direction = "sideways")
    }
  }
}
