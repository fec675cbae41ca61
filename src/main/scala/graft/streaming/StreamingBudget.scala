package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-group budget admission — the continuous twin of the
  * batch mixer's [[graft.operators.Sampling.takeToBudget]] (X10): each
  * group admits arriving rows while its cumulative admitted weight is
  * below budget, the CROSSING row is kept (the batch rule `cum − w <
  * budget`, so a rich group fills its budget exactly-or-over by one
  * row), and later arrivals drop. Groups absent from the budget map
  * drop entirely (the explicit-mix rule). This is the ingest-time shape
  * of corpus curation: "stop taking from this source once its token
  * budget is spent" decided as shards land, not in a batch pass over
  * stored history.
  *
  * Ordering contract: a stream cannot reorder history, so admission is
  * ARRIVAL order across micro-batches — but post-shuffle iterator order
  * within a batch is fetch order, not a well-defined sequence (the
  * E9/E10 lesson), so within each micro-batch rows admit in ascending
  * `id` order. Output is then a pure function of (batch arrival
  * pattern, ids, weights) — replayable and spec-checkable. Fed in
  * scrambled-hash id order, it reproduces batch takeToBudget's kept set
  * EXACTLY (spec-asserted parity) — the lambda-architecture check that
  * the live gate and the batch backstop agree.
  *
  * State: ONE Long per group (weight spent) — |groups| longs forever,
  * no eviction needed; checkpoint/restart resumes the running totals
  * exactly-once. Scale shape: one shuffle on the group key (parallelism
  * = |groups|, same as the batch window), per-row work O(1).
  */
object StreamingBudget {

  final case class Admitted(id: Long, group: String, weight: Long)

  private val stateEnc: Encoder[Long] = Encoders.scalaLong
  implicit private val outEnc: Encoder[Admitted] = Encoders.product[Admitted]

  /** rows = (id, group, weight); weights must be non-negative. */
  def admitToBudget(rows: Dataset[(Long, String, Long)],
      budgets: Map[String, Long]): Dataset[Admitted] = {
    require(budgets.nonEmpty, "admitToBudget needs at least one group budget")
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    import rows.sparkSession.implicits._
    val b = budgets // avoid closing over the enclosing object
    rows
      .filter(r => b.contains(r._2))
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)({
        (group: String, it: Iterator[(Long, String, Long)], state: GroupState[Long]) =>
          val budget = b(group)
          var spent = state.getOption.getOrElse(0L)
          // ascending-id admission inside the batch: verdicts are
          // iterator-order-free (post-shuffle order is fetch order)
          val admitted = it.toVector.sortBy(_._1).flatMap { case (id, _, w) =>
            require(w >= 0, s"negative weight $w for id=$id")
            if (spent < budget) { // crossing row kept, the batch rule
              spent += w
              Some(Admitted(id, group, w))
            } else None
          }
          state.update(spent)
          admitted.iterator
      })(stateEnc, outEnc)
  }
}
