package graft.streaming

import scala.collection.mutable
import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming first-seen gate with BOUNDED state — the bloom-filter twin
  * of the exact streaming dedup path ([[StreamingDedup]] / E2) and the
  * live counterpart of the batch bloom gate
  * ([[graft.operators.Dedup.bloomSeen]] / d11): flag each arriving row
  * `novel` (never seen in any prior batch, and the canonical first of
  * its key within this batch) or not, with per-shard state FIXED at
  * `bits/8` bytes forever. `dropDuplicates` state grows with the key
  * universe and `dropDuplicatesWithinWatermark` trades eviction for
  * re-admission; the bloom trades a bounded false-"seen" rate instead —
  * the right trade when the key universe is unbounded (URLs, content
  * fingerprints) and a lost novel costs more than a duplicate let
  * through... which is exactly the bloom's asymmetry, stated precisely:
  *
  * CONTRACT (the d11 contract, streamed): a key seen in ANY prior batch
  * is NEVER flagged novel again (the filter has no false negatives); a
  * genuinely novel key is flagged novel except with ~fpp probability
  * (bit collisions — route "not novel" rows through the exact batch
  * backstop d11-style when exactness matters downstream). Within a
  * micro-batch the verdict is BATCH-GRAINED prequential (the E9/E10
  * lesson — post-shuffle iterator order is fetch order, not a
  * well-defined sequence): every key judges against the filter state of
  * PRIOR batches only, then the whole batch folds in; duplicate
  * occurrences of a key inside one batch resolve deterministically to
  * the MINIMUM id (order-free), which alone carries the novel flag.
  *
  * Keys hash-shard across `shards` group states ([[StreamingHeavyHitters]]'
  * sharding: every occurrence of a key lands on the same shard, so a
  * shard's filter is globally complete for its keys and no cross-shard
  * merge exists). Bit positions use Kirsch–Mitzenmacher double hashing
  * (h1 + i·h2 over two independent murmur seeds, h2 forced odd so the
  * probe sequence covers a power-of-2 table). Sizing: per-shard fpp at
  * n keys ≈ (1 − e^(−kn/bits))^k — 10⁶ keys/shard at the default
  * 2²⁰ bits / 5 hashes ≈ 2%; scale `bits` with expected keys, the state
  * stays byte-array-cheap per shard.
  */
object StreamingBloom {

  final case class Novelty(id: Long, key: String, novel: Boolean)

  private val stateEnc: Encoder[Array[Byte]] = Encoders.BINARY
  implicit private val outEnc: Encoder[Novelty] = Encoders.product[Novelty]

  private val SeedShard = 0x5bd1e995
  private val SeedH1 = 0x9747b28c
  private val SeedH2 = 0x1b873593

  private def mightContain(arr: Array[Byte], key: String, numHashes: Int): Boolean = {
    val bits = arr.length.toLong * 8
    val h1 = MurmurHash3.stringHash(key, SeedH1).toLong
    val h2 = MurmurHash3.stringHash(key, SeedH2).toLong | 1L
    (0 until numHashes).forall { i =>
      val pos = java.lang.Math.floorMod(h1 + i * h2, bits)
      (arr((pos / 8).toInt) & (1 << (pos % 8).toInt)) != 0
    }
  }

  private def insert(arr: Array[Byte], key: String, numHashes: Int): Unit = {
    val bits = arr.length.toLong * 8
    val h1 = MurmurHash3.stringHash(key, SeedH1).toLong
    val h2 = MurmurHash3.stringHash(key, SeedH2).toLong | 1L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Math.floorMod(h1 + i * h2, bits)
      arr((pos / 8).toInt) = (arr((pos / 8).toInt) | (1 << (pos % 8).toInt)).toByte
      i += 1
    }
  }

  /** rows = (id, key). Output: one [[Novelty]] row per input row. */
  def firstSeenFlags(rows: Dataset[(Long, String)], shards: Int = 32,
      bits: Int = 1 << 20, numHashes: Int = 5): Dataset[Novelty] = {
    require(shards > 0, "shards must be positive")
    require(bits >= 64 && bits % 8 == 0 && Integer.bitCount(bits) == 1,
      s"bits must be a power of 2 >= 64, got $bits")
    require(numHashes >= 1, "numHashes must be >= 1")
    import rows.sparkSession.implicits._
    rows
      .map { case (id, k) =>
        (java.lang.Math.floorMod(MurmurHash3.stringHash(k, SeedShard), shards), id, k)
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)({
        (_: Int, it: Iterator[(Int, Long, String)], state: GroupState[Array[Byte]]) =>
          val arr = state.getOption.filter(_.length == bits / 8)
            .getOrElse(new Array[Byte](bits / 8))
          val batch = it.toVector
          // batch-grained prequential: judge every key against the PRIOR
          // batches' filter, resolve within-batch dups to the min id,
          // THEN fold the batch in — verdicts are iterator-order-free
          val minId = mutable.HashMap.empty[String, Long]
          batch.foreach { case (_, id, k) =>
            val cur = minId.getOrElse(k, Long.MaxValue)
            if (id < cur) minId.update(k, id)
          }
          val priorSeen = minId.keysIterator
            .map(k => k -> mightContain(arr, k, numHashes)).toMap
          minId.keysIterator.foreach(k => insert(arr, k, numHashes))
          state.update(arr)
          batch.iterator.map { case (_, id, k) =>
            Novelty(id, k, !priorSeen(k) && id == minId(k))
          }
      })(stateEnc, outEnc)
  }
}
