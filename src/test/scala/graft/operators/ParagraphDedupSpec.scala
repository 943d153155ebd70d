package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ParagraphDedupSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  // Paragraph corpus: "boilerplate" repeats across docs 0/1/2 and twice
  // INSIDE doc 3; doc 4 is entirely units seen earlier (drops to empty);
  // doc 5 is unique.
  lazy val paraDocs = Seq(
    (0L, "alpha first\nboilerplate banner\nunique tail zero"),
    (1L, "boilerplate banner\nunique body one"),
    (2L, "unique body two\nboilerplate banner"),
    (3L, "repeat me\nrepeat me\nunique body three"),
    (4L, "boilerplate banner\nrepeat me"),
    (5L, "entirely unique document five"))
    .toDF("doc_id", "text")

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, String)] =
    df.collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))
    }.toMap

  test("paragraphs: keep-first across and within docs, rewrite preserves order") {
    val got = rowsOf(ParagraphDedup.paragraphs(paraDocs, "doc_id", "text"))
    assert(got(0L) == ((3L, 0L, "alpha first\nboilerplate banner\nunique tail zero")))
    assert(got(1L) == ((2L, 1L, "unique body one")))
    assert(got(2L) == ((2L, 1L, "unique body two")))
    // within-doc duplicate: first occurrence kept, second dropped
    assert(got(3L) == ((3L, 1L, "repeat me\nunique body three")))
    // every unit seen earlier -> empty rewrite, not null
    assert(got(4L) == ((2L, 2L, "")))
    assert(got(5L) == ((1L, 0L, "entirely unique document five")))
  }

  test("word-window units match a brute-force reference on structureless text") {
    val docs = Seq(
      (10L, "a b c d e f g h"),   // windows of 3: "a b c","d e f","g h"
      (11L, "d e f x y z"),        // "d e f" dup, "x y z" novel
      (12L, "g h"),                // exact window dup of doc 10's tail
      (13L, "a b c d e f g h"))    // full duplicate of doc 10
      .toDF("doc_id", "text")
    val got = rowsOf(ParagraphDedup.dedup(docs, "doc_id", "text",
      ParagraphDedup.unitsByWordWindow(_, 3), " "))
    assert(got(10L) == ((3L, 0L, "a b c d e f g h")))
    assert(got(11L) == ((2L, 1L, "x y z")))
    assert(got(12L) == ((1L, 1L, "")))
    assert(got(13L) == ((3L, 3L, "")))
  }

  test("unitsByWordWindow: trailing short window and single-window text") {
    val u = Seq(("a b c d e", 0)).toDF("t", "x")
      .select(ParagraphDedup.unitsByWordWindow(col("t"), 2).as("u"))
      .collect().head.getSeq[String](0)
    assert(u == Seq("a b", "c d", "e"))
    val one = Seq(("hi", 0)).toDF("t", "x")
      .select(ParagraphDedup.unitsByWordWindow(col("t"), 16).as("u"))
      .collect().head.getSeq[String](0)
    assert(one == Seq("hi"))
  }

  test("unit text never reaches an exchange; doc text is never repartitioned") {
    // The 100 TB contract: the only wide shuffles carry (id, pos, hash) /
    // drop-lists — no string column named for the unit or the doc text
    // appears under any Exchange in the physical plan.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = ParagraphDedup.dedup(paraDocs, "doc_id", "text",
      ParagraphDedup.unitsBySeparator(_, "\\n"), "\n")
      .queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      val cols = e.child.output.map(_.name).toSet
      assert(!cols.contains("__u") && !cols.contains("text"),
        s"unit/doc text crossed an exchange: $cols")
    }
  }
}
