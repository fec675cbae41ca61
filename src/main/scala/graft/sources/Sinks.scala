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
}
