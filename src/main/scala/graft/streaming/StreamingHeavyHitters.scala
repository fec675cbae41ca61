package graft.streaming

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Running heavy hitters over a live stream — the streaming twin of the
  * batch frequent-items path ([[graft.operators.Sketches.heavyHitters]] /
  * q53): "what are the top items so far" continuously, with BOUNDED state.
  *
  * Items hash-shard across `shards` grouping keys; each shard keeps ONE
  * frequent-items sketch as its `flatMapGroupsWithState` state (serialized
  * — ~16 B × maxMapSize per shard, fixed forever, vs. an exact streaming
  * count whose state grows with the item universe). Hash sharding means
  * every occurrence of an item lands on the SAME shard, so a shard's
  * estimates are globally complete for its items — per-shard frequent
  * rows ARE global rows, no cross-shard merge stage. After each
  * micro-batch every updated shard re-emits its current frequent items
  * (Append mode: downstream keeps the latest row per item, q40
  * semantics). Estimates carry the batch sketch's exact-while-unpurged /
  * bounded-error-after contract; `shards` sizes parallelism exactly like
  * q30's shard count.
  */
object StreamingHeavyHitters {

  final case class HeavyHitter(item: String, est: Long, lb: Long, ub: Long)

  private val stateEnc: Encoder[Array[Byte]] = Encoders.BINARY
  implicit private val outEnc: Encoder[HeavyHitter] = Encoders.product[HeavyHitter]

  private object StringSerDe extends ArrayOfStringsSerDe

  def runningHeavyHitters(items: Dataset[String], shards: Int = 32,
      maxMapSize: Int = 1024, minEst: Long = 1L): Dataset[HeavyHitter] = {
    require(shards > 0, "shards must be positive")
    require(maxMapSize >= 2 && Integer.bitCount(maxMapSize) == 1,
      s"maxMapSize must be a power of 2, got $maxMapSize")
    import items.sparkSession.implicits._
    items
      .map(i => (math.floorMod(i.##, shards), i))
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)({
        (_: Int, it: Iterator[(Int, String)], state: GroupState[Array[Byte]]) =>
          val sk = state.getOption.filter(_.nonEmpty)
            .map(b => ItemsSketch.getInstance(Memory.wrap(b), StringSerDe))
            .getOrElse(new ItemsSketch[String](maxMapSize))
          it.foreach(t => sk.update(t._2))
          state.update(sk.toByteArray(StringSerDe))
          sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES).iterator
            .filter(_.getEstimate >= minEst)
            .map(r => HeavyHitter(r.getItem, r.getEstimate,
              r.getLowerBound, r.getUpperBound))
      })(stateEnc, outEnc)
  }
}
