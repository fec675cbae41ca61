package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output sinks. Parquet is the default interchange format; partitioned
  * layout is the 100 TB workhorse: `partitionBy` turns downstream
  * equality filters on those columns into partition pruning (directories
  * skipped at planning time), and per-partition file sizing is controlled
  * upstream via `repartition(n, cols)` so writers don't produce small
  * files (one task per output partition per directory).
  */
object Sinks {

  def parquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def csv(df: DataFrame, path: String, header: Boolean = true,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", header.toString).csv(path)

  def json(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** Write-ready training shards: rows carrying (shardCol, posCol) — e.g.
    * [[graft.operators.Sampling.shuffleShards]] output — land as one
    * `shardCol=N` directory per shard, each holding ONE file whose row
    * order is the shard's position order (repartition by shard gives one
    * task per shard; sortWithinPartitions makes the task's file ordered;
    * parquet preserves in-file row order). A training job reads shard
    * directories independently and streams rows in shuffle order.
    */
  def trainingShards(df: DataFrame, path: String, shardCol: String = "shard",
      posCol: String = "shard_pos", mode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), col(posCol))
      .write.mode(mode).partitionBy(shardCol).parquet(path)
  }
}
