package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Paragraph-level (unit-level) deduplication with keep-first semantics —
  * the CCNet / Dolma web-corpus boilerplate pass: split every document
  * into units (paragraphs, lines, or fixed word windows), drop every unit
  * occurrence except the globally FIRST one (min `(id, pos)` across the
  * corpus), and reassemble each document's surviving units in order.
  * Doc-level dedup (exact q44/q99, MinHash q47) keeps boilerplate that
  * repeats INSIDE otherwise-distinct pages (nav bars, cookie banners,
  * license blocks); this operator removes it while keeping one canonical
  * copy, which is how CCNet-style pipelines prepare Common Crawl text.
  * `SubstringDup` (q80) is the read-only census cousin; this one rewrites.
  *
  * Scale shape (100 TB): unit TEXT never crosses an exchange. The
  * exploded pass reduces each unit to `(id, pos, xxhash64(unit))` before
  * the one hash-keyed shuffle (24-byte rows); keep-first is a partial-agg
  * `min(struct(id, pos))` plus a colocated join back (the SubstringDup
  * pattern — no window over the hash, AQE cannot split a window
  * partition, and a ubiquitous boilerplate unit is exactly the skewed
  * key). The drop-list shuffle is DUP-proportional, and the final
  * rewrite joins docs against per-doc drop lists (AQE broadcasts the
  * dup-proportional side when small) and rebuilds the text with pure
  * codegen'd array functions — the corpus is scanned, never reshuffled.
  *
  * Unit identity is `xxhash64(unit)` — two distinct units merge only on
  * a 64-bit collision (p ≈ n²/2⁻⁶⁵; the q80/q99-precedent bound), which
  * at gate scale is ~1e-11, so the DuckDB oracle grouping raw unit
  * strings still matches byte-for-byte.
  */
object ParagraphDedup {

  /** Units = separator-delimited spans (paragraph mode; deployment
    * default `"\n"`-split web text). `sepRegex` is a Java regex.
    */
  def unitsBySeparator(text: Column, sepRegex: String): Column =
    split(coalesce(text, lit("")), sepRegex)

  /** Units = non-overlapping `n`-word windows (for text without
    * paragraph structure; the trailing window may be short). Words are
    * `wordSep`-delimited; units rejoin with the same separator.
    */
  def unitsByWordWindow(text: Column, n: Int, wordSep: String = " "): Column = {
    require(n > 0, s"window must be > 0, got $n")
    val words = split(coalesce(text, lit("")), java.util.regex.Pattern.quote(wordSep))
    val nWin = floor((size(words) + lit(n - 1)).cast("double") / lit(n)).cast("long")
    transform(sequence(lit(0L), nWin - lit(1L)),
      i => array_join(slice(words, (i * n + 1).cast("int"), lit(n)), wordSep))
  }

  /** Keep-first unit dedup + rewrite. Returns one row per input doc:
    * `(idCol, n_units, n_dropped, clean_text)` where `clean_text` is the
    * surviving units joined by `joinSep` in original order (`""` when
    * every unit was seen earlier elsewhere). `unitize` maps the text
    * column to an array of unit strings ([[unitsBySeparator]] /
    * [[unitsByWordWindow]] or any custom Column function); `ids` must be
    * unique and orderable — "first" is the `(id, pos)` minimum.
    */
  def dedup(df: DataFrame, idCol: String, textCol: String,
            unitize: Column => Column, joinSep: String): DataFrame = {
    val units = df
      .select(col(idCol).as("__id"),
        posexplode(unitize(col(textCol))).as(Seq("__pos", "__u")))
    // One hash-keyed exchange, reused by the agg and the join-back
    // (identical subplans → ReusedExchange); unit text is already gone.
    val keyed = units
      .select(col("__id"), col("__pos"), xxhash64(col("__u")).as("__h"))
      .repartition(col("__h"))
    val firsts = keyed.groupBy(col("__h"))
      .agg(min(struct(col("__id"), col("__pos"))).as("__first"))
    val drops = keyed
      .join(firsts.hint("SHUFFLE_HASH"), Seq("__h"))
      .filter(struct(col("__id"), col("__pos")) =!= col("__first"))
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(col("__pos"))).as("__drop"))
    val us = unitize(col(textCol))
    val dropSafe = coalesce(col("__drop"), expr("CAST(array() AS array<int>)"))
    val keptIdx = filter(sequence(lit(0), size(us) - lit(1)),
      i => not(array_contains(dropSafe, i)))
    df.join(drops, df(idCol) === drops("__id"), "left")
      .select(col(idCol),
        size(us).cast("long").as("n_units"),
        coalesce(size(col("__drop")), lit(0)).cast("long").as("n_dropped"),
        array_join(transform(keptIdx, i => element_at(us, i + lit(1))), joinSep)
          .as("clean_text"))
  }

  /** Paragraph-mode convenience: newline-split units, newline rejoin. */
  def paragraphs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    dedup(df, idCol, textCol, unitsBySeparator(_, "\\n"), "\n")
}
