package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join — an operator Spark SQL lacks natively (DuckDB ships it as
  * `ASOF JOIN`). For every left row, attach the nearest right row in the
  * chosen direction (backward: latest with ts <= left's; forward:
  * earliest with ts >= left's; strict variants use < / >), within the
  * same `by` partition — the full DuckDB ASOF comparison surface.
  *
  * Implementation is the scalable union+window form (preference (a) from
  * the build guide: compose built-ins before custom plan nodes):
  * union-tag both sides, sort within (by, ts) once, and carry the last
  * right payload forward with `last(ignoreNulls)` over an unbounded-
  * preceding window. ONE shuffle on the `by` key, no range join, no
  * per-row probing — at 100 TB this is a single sort-merge pass, and a
  * skewed `by` key can be salted upstream.
  */
object AsOfJoin {

  /** @param left      left (probe) side
    * @param right     right (reference) side
    * @param byCol     equi-partition key name present on both sides
    * @param leftTs    left time column name
    * @param rightTs   right time column name
    * @param rightCols right payload columns to attach (null when no right
    *                  row qualifies)
    * @param direction "backward" (latest right with ts <= left ts — the
    *                  default, DuckDB's `ON r.ts <= l.ts`) or "forward"
    *                  (earliest right with ts >= left ts, `ON r.ts >=
    *                  l.ts`)
    * @param strict    exclude exact-tie rows (`<` / `>` instead of
    *                  `<=` / `>=`)
    */
  def asofJoin(left: DataFrame, right: DataFrame, byCol: String,
               leftTs: String, rightTs: String,
               rightCols: Seq[String],
               direction: String = "backward",
               strict: Boolean = false): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asofJoin direction must be 'backward' or 'forward', got '$direction'")
    val leftCols = left.columns.toSeq

    // the whole right payload rides in ONE struct so the carried values
    // always come from the same (latest) right row, even when individual
    // payload columns are null
    val rightStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))

    // ASOF semantics: a right row with NULL time or NULL key can never
    // satisfy `right.ts <= left.ts AND by = by` — exclude it up front
    // (otherwise NULLS-FIRST sorting would carry its payload to every
    // left row, and NULL keys would spuriously match each other).
    val rightClean = right.filter(right(rightTs).isNotNull && right(byCol).isNotNull)

    val l = left.select(
      (col(byCol).as("__by") +: col(leftTs).as("__ts") +: lit(1).as("__is_left") +:
        lit(null).cast(rightStructType).as("__r") +:
        leftCols.map(c => left(c).as(s"__l_$c"))): _*)
    val r = rightClean.select(
      (col(byCol).as("__by") +: col(rightTs).as("__ts") +: lit(0).as("__is_left") +:
        struct(rightCols.map(c => rightClean(c).as(c)): _*).as("__r") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c"))): _*)

    // Direction decides the scan order (backward: ascending ts, carry the
    // LATEST right seen so far; forward: descending ts, carry the
    // EARLIEST right at-or-after). Tie order decides strictness: a right
    // row at equal ts sorts BEFORE the left row for <=/>= (visible to it)
    // and AFTER it for the strict </> variants (not visible).
    val tsOrder = if (direction == "backward") col("__ts").asc else col("__ts").desc
    val tieOrder = if (strict) col("__is_left").desc else col("__is_left").asc
    val w = Window.partitionBy(col("__by"))
      .orderBy(tsOrder, tieOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      // A NULL left ts can never satisfy `right.ts <= left.ts` in either
      // direction, but the window still hands it whatever sorted next to
      // the NULLs (forward's desc order puts them last, inheriting the
      // earliest right row) — null the carried payload out explicitly.
      .withColumn("__r_carried",
        when(col("__ts").isNotNull, last(col("__r"), ignoreNulls = true).over(w)))

    carried.filter(col("__is_left") === 1)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++
        rightCols.map(c => col(s"__r_carried.$c").as(s"asof_$c")): _*)
  }
}
