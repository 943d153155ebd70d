package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Seed-stable global training-order shuffle.
  *
  * After curation/packing, a training pipeline wants its examples in a
  * pseudo-random but REPRODUCIBLE order — the run that resumes from a
  * checkpoint, the ablation that re-reads the same corpus, and the audit
  * that asks "what did step N train on" must all see the same
  * permutation. RNG-state approaches (rand() columns, shuffled file
  * lists) are neither reproducible across cluster sizes nor resumable;
  * the scalable spelling is a TOTAL ORDER on a seeded hash of a unique
  * id: `sort by (hash(seed, id), id)`. That is a range-partitioned sort
  * — every partition sorts locally after one exchange, no single-reducer
  * bottleneck, and the order is a pure function of (seed, ids): stable
  * across runs, cluster sizes, and input partitionings at 100 TB.
  *
  * Two surfaces:
  *  - [[permute]] — the ordered frame itself (compose with
  *    [[ShardWriter]] to land order-implicit shards: shard index +
  *    in-file position IS the training order, no per-row position
  *    needed);
  *  - [[withPosition]] — adds a contiguous 0-based `train_pos`, the
  *    checkpoint/resume and audit currency ("skip to example N").
  *    Contiguous global rank is inherently two passes (partition sizes
  *    must be known before any partition can number itself); this is
  *    `zipWithIndex`'s count-then-offset on ONE sorted lineage — no
  *    global-window single-partition exchange, no driver-side data, the
  *    offsets are O(partitions) longs. The per-row cost is one
  *    row-deserialization pass (the RDD hop exits codegen for the final
  *    zip only — the honest price of contiguous ranks; pipelines that
  *    only need the ORDER should use [[permute]] and keep whole-stage
  *    codegen end to end).
  *
  * Key spellings: the default is `xxhash64(seed, id)` — codegen'd, 8
  * bytes, the deployment key. [[md5Key]] is the portable spelling the
  * q100 oracle recomputes verbatim in DuckDB (both engines emit the
  * same lowercase-hex md5 of the same `"<seed>:<id>"` string, so the
  * full permutation — not just its shape — is oracle-checked); the
  * xxhash64 default is pinned by TrainOrderSpec instead (bijective
  * contiguous positions, run-to-run and partitioning-independent
  * determinism, seed sensitivity).
  */
object TrainOrder {

  /** Deployment permutation key: `xxhash64(seed, id)`, codegen'd. */
  def defaultKey(seed: Long)(id: Column): Column = xxhash64(lit(seed), id)

  /** Portable permutation key — identical lowercase-hex md5 in Spark and
    * DuckDB, so correctness gates can recompute the exact order.
    */
  def md5Key(seed: Long)(id: Column): Column =
    md5(concat(lit(s"$seed:"), id.cast("string")).cast("binary"))

  private def sortedByKey(df: DataFrame, idCol: String,
                          keyFn: Column => Column): DataFrame = {
    require(!df.columns.contains("__tk"),
      "input already carries the internal sort-key column __tk")
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    // ids must be unique AND NON-NULL (ADVICE r18): a null id nulls the
    // md5 key (Spark's concat is null-propagating where DuckDB's skips
    // nulls — the oracle would diverge) and leaves the tie-break column
    // null too, so the permutation stops being total. Fail loudly per
    // offending row instead of emitting a nondeterministic order; the
    // branch is codegen'd and costs one null check next to the hash.
    val id = col(idCol)
    val key = when(id.isNull, raise_error(lit(
      s"TrainOrder: null $idCol — the seed-stable permutation requires " +
        "unique, non-null ids"))).otherwise(keyFn(id))
    df.withColumn("__tk", key)
      .repartitionByRange(parts, col("__tk"), col(idCol))
      .sortWithinPartitions(col("__tk"), col(idCol))
  }

  /** The corpus in seed-stable shuffled order (ties on the hash broken
    * by `idCol`, so the permutation is total for unique, NON-NULL ids —
    * a null id raises at runtime rather than untying the order). Plan:
    * one range exchange + local sort; stays in whole-stage codegen.
    */
  def permute(df: DataFrame, idCol: String, seed: Long): DataFrame =
    permute(df, idCol, defaultKey(seed) _)

  def permute(df: DataFrame, idCol: String,
              keyFn: Column => Column): DataFrame =
    sortedByKey(df, idCol, keyFn).drop("__tk")

  /** [[permute]] plus a contiguous 0-based global `posCol` — see the
    * scaladoc above for the two-pass rank mechanics and cost.
    */
  def withPosition(df: DataFrame, idCol: String, seed: Long,
                   posCol: String = "train_pos"): DataFrame =
    withPosition(df, idCol, defaultKey(seed) _, posCol)

  /** Order-implicit shard index for [[permuteToShards]]: the TOP
    * log2(nShards) bits of the permutation key, shifted into [0,
    * nShards). Because it is a RANGE split of the key space (not a hash
    * of it), ascending shard index refines ascending key — which is what
    * makes `(shard, in-file position)` a spelling of the training order.
    * `nShards` must be a power of two ≥ 2 so the split is exact integer
    * bit arithmetic (no 2⁶⁴ division); uniform by construction since the
    * key is a 64-bit hash.
    */
  def shardIndex(idCol: Column, seed: Long, nShards: Int): Column = {
    require(nShards >= 2 && (nShards & (nShards - 1)) == 0,
      s"nShards must be a power of two >= 2, got $nShards")
    val bits = java.lang.Integer.numberOfTrailingZeros(nShards)
    // arithmetic shift keeps key order: [-n/2, n/2) ascending in the
    // signed key; +n/2 maps to [0, n)
    (shiftright(defaultKey(seed)(idCol), 64 - bits) + lit(nShards / 2))
      .cast("int").as("shard")
  }

  /** The 100 TB deployment composition, first-class: land the permuted
    * corpus as ORDER-IMPLICIT training shards — `shard index + in-file
    * position IS the training order`, so no per-row position column (and
    * no [[withPosition]] RDD hop) is ever materialized. One
    * [[ShardWriter]] pass: shard by the key's top bits (range split —
    * see [[shardIndex]]), sort each file by `(key, id)`; a loader that
    * reads shard directories in index order and files in row order
    * replays exactly [[withPosition]]'s permutation (spec-gated in
    * TrainOrderSpec). Scale shape: one hash exchange on the shard column
    * + in-partition sort — no global sort, no single-reducer stage; the
    * `__tk` key column persists in the shard files as the loader's
    * resume cursor. Returns the shard count read back off the layout.
    */
  def permuteToShards(df: DataFrame, idCol: String, seed: Long,
                      path: String, nShards: Int): Long = {
    require(!df.columns.contains("__tk"),
      "input already carries the internal sort-key column __tk")
    // withColumn would silently REPLACE a caller's "shard" column (and
    // its data would be lost in the landed layout) — same loud-failure
    // contract as __tk/posCol
    require(!df.columns.contains("shard"),
      "input already carries a 'shard' column — rename it before " +
        "permuteToShards (the layout's partition column uses that name)")
    val id = col(idCol)
    val key = when(id.isNull, raise_error(lit(
      s"TrainOrder: null $idCol — the seed-stable permutation requires " +
        "unique, non-null ids"))).otherwise(defaultKey(seed)(id))
    val keyed = df.withColumn("__tk", key)
      .withColumn("shard", shardIndex(id, seed, nShards))
    ShardWriter.writeShards(keyed, path, "shard", Seq("__tk", idCol))
  }

  def withPosition(df: DataFrame, idCol: String, keyFn: Column => Column,
                   posCol: String): DataFrame = {
    require(!df.columns.contains(posCol),
      s"input already carries a '$posCol' column — pass a different posCol")
    val s = sortedByKey(df, idCol, keyFn)
    val schema = s.schema.add(posCol, LongType, nullable = false)
    // zipWithIndex = per-partition counts (one job) + offset map on ONE
    // lineage: the second pass numbers the same partitions it counted
    val indexed = s.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    s.sparkSession.createDataFrame(indexed, schema)
      .select(df.columns.map(col) :+ col(posCol): _*)
  }
}
