package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming k-anonymity release gate — q108's batch audit applied LIVE
  * at ingest: a row may only leave the pipeline once its
  * quasi-identifier cell covers at least k individuals, so early
  * arrivals in a rare cell are HELD, not leaked, and released the
  * moment the cell crosses k. The batch audit answers "is this corpus
  * releasable"; this answers "release each row as soon as it is safe"
  * — the shape a continuous export (privacy-gated CDC feed, live
  * analytics share) actually needs.
  *
  * State per cell is ONE count plus at most k−1 buffered ids — bounded
  * forever, independent of stream length (once a cell crosses k the
  * buffer is empty and stays empty; rows pass straight through).
  *
  * Ordering contract (the E9/E10/E15/E18 arrival-order discipline):
  * within a micro-batch rows process in ascending id order, buffered
  * rows release in arrival order ahead of the row that crossed k, so
  * output is a pure function of (batch arrival pattern, ids, k).
  * Stream-end parity: the union of all released rows ≡ the batch
  * filter "cell count ≥ k" over everything that arrived
  * (spec-asserted) — suppressed rows are exactly the final sub-k
  * cells' rows.
  */
object StreamingKAnonymity {

  final case class Released(cell: String, id: Long)

  private val stateEnc: Encoder[(Long, List[Long])] =
    Encoders.tuple(Encoders.scalaLong, Encoders.kryo[List[Long]])
  implicit private val outEnc: Encoder[Released] = Encoders.product[Released]

  /** rows = (cell, id): cell is the concatenated quasi-identifier tuple,
    * id the row's key. Emits rows only once their cell has ≥ k members.
    */
  def gate(rows: Dataset[(String, Long)], k: Int): Dataset[Released] = {
    require(k >= 1, s"k must be >= 1, got $k")
    implicit val strEnc: Encoder[String] = Encoders.STRING
    rows
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)({
        (cell: String, it: Iterator[(String, Long)],
            state: GroupState[(Long, List[Long])]) =>
          var (n, held) = state.getOption.getOrElse((0L, List.empty[Long]))
          val out = Vector.newBuilder[Released]
          it.toVector.sortBy(_._2).foreach { case (_, id) =>
            n += 1
            if (n < k) held = id :: held // buffer: cell not yet safe
            else if (n == k) {           // crossing row: flush, oldest first
              (held.reverse :+ id).foreach(i => out += Released(cell, i))
              held = Nil
            } else out += Released(cell, id)
          }
          state.update((n, held))
          out.result().iterator
      })(stateEnc, outEnc)
  }
}
