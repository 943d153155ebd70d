package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard layout writer — the last mile after [[Curate]]: the
  * packed corpus lands as `path/<shardCol>=<v>/part-*.parquet` with rows
  * SORTED by the order columns inside every file, so a training loader
  * streams each shard sequentially (bin after bin) with zero shuffling
  * at read time. Directory partitioning doubles as the pruning key —
  * resuming epoch 3 of shard `lang=de` opens exactly one directory.
  *
  * One `repartition(shardCol)` shuffle + an in-partition sort; no
  * global sort. Hot shards follow the shard histogram (same remedy as
  * any hot key: split the shard, e.g. partition on (lang, bin range)).
  */
object ShardWriter {

  /** Write `df` partitioned by `shardCol`, each file sorted by
    * `orderCols`. Returns the distinct shard count, read from the
    * written directory layout — NOT by re-running the input plan (a
    * recompute is a harmless second job locally but a full second pass
    * over the corpus at scale; the writer already materialized every
    * shard as a `<shardCol>=<v>` directory, so listing is O(shards)).
    */
  def writeShards(df: DataFrame, path: String, shardCol: String,
                  orderCols: Seq[String]): Long = {
    require(orderCols.nonEmpty, "need at least one order column")
    df.repartition(col(shardCol))
      .sortWithinPartitions((shardCol +: orderCols).map(col): _*)
      .write.mode("overwrite").partitionBy(shardCol).parquet(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .count(s => s.isDirectory && s.getPath.getName.startsWith(shardCol + "="))
      .toLong
  }
}
