package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions

/** Sequence packing for training-batch preparation: documents are packed
  * into fixed token-budget sequences — the step that turns a filtered,
  * deduped corpus into dense training rows (no padding waste).
  *
  * Packing is inherently SEQUENTIAL (each pack depends on what preceded
  * it), so at scale it runs inside deterministic hash shards:
  * `shard = polyHash(salt, id) % shards` is layout- and run-independent
  * (the q19/q20 guarantee), each shard packs its documents greedily in
  * id order inside one `flatMapGroups` call, and shards are mutually
  * independent — one shuffle on the shard id, parallelism = `shards`,
  * sized to the cluster. Within a shard the greedy rule is first-fit in
  * id order: a document that would overflow the open pack closes it and
  * starts the next; a document LARGER than the budget gets its own
  * oversized pack — packing must never drop data (cap or split long
  * documents upstream). Each shard's documents are buffered in memory to
  * sort by id — `shards` is the memory knob (docs-per-shard ≈ n/shards).
  *
  * Output: idCol, shard, pack (per-shard pack counter), pack_pos
  * (position within the pack) — all BIGINT, deterministic.
  */
object Packing {

  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, shards: Int = 0, salt: String = ""): DataFrame = {
    require(budget > 0, "token budget must be positive")
    // the in-shard greedy order is NUMERIC id order; a silent cast of a
    // string id would null out and crash deep in the encoder instead
    require(df.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"packSequences orders by numeric id; '$idCol' is " +
        s"${df.schema(idCol).dataType.simpleString} — map string ids to a " +
        "stable numeric surrogate (e.g. polyHash) first")
    val spark = df.sparkSession
    import spark.implicits._
    GraftExpressions.register(spark)
    val sh = if (shards > 0) shards else spark.sparkContext.defaultParallelism
    df.select(
        Sampling.hashBucket(col(idCol), sh, salt).cast("int").as("_shard"),
        col(idCol).cast("long").as("_id"),
        col(tokenCol).cast("long").as("_n"))
      .as[(Int, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val docs = it.toArray.sortBy(_._2)
        var pack = 0L
        var fill = 0L
        var pos = 0L
        docs.iterator.map { case (_, id, n) =>
          if (fill > 0 && fill + n > budget) { pack += 1; fill = 0L; pos = 0L }
          fill += n
          pos += 1
          (id, shard.toLong, pack, pos - 1)
        }
      }
      .toDF(idCol, "shard", "pack", "pack_pos")
  }
}
