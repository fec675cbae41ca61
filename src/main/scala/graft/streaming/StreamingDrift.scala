package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distribution-drift detection — the streaming twin of the
  * batch KS operator ([[graft.operators.Relational.ksTest]]): per key,
  * the Kolmogorov–Smirnov gap between the values seen SO FAR and a
  * static reference sample, re-emitted each micro-batch.
  *
  * State is BOUNDED by the reference, not the stream: the reference's
  * distinct snapped units form a fixed evaluation grid, and each key's
  * state is one long array of per-grid-slot counts (plus the total) —
  * |ref units| + 2 longs forever, while the exact alternative logs every
  * stream value. A stream value only moves the count of the grid slot
  * it falls into (binary search), so updates are O(log G).
  *
  * The statistic is GRID-EVALUATED KS: D = max over grid points of
  * |F_stream − F_ref|, exact at every reference jump point (the true
  * sup can exceed it only between reference jumps — the standard
  * binned-monitor trade, cf. PSI; at the reference's own granularity it
  * IS the KS statistic). Computed the q72 way: cross-multiplied longs
  * |cumS·nR − cumR·nS| so no float enters the max; one closing division
  * per emitted row. Both the reference CDF and the snapping rule
  * (floor(v·scale + 0.5)) are the batch family's, so a streaming
  * readout over a prefix equals the batch ksTest of that prefix against
  * the reference on the same grid.
  *
  * The reference arrives as a plain map of per-key samples: it is the
  * SMALL side by definition (a validation slice, last month's
  * histogram) and ships to executors once in the task closure exactly
  * like a broadcast dim. Keys without a reference are dropped (no
  * baseline to drift from). Output per updated key per batch: key,
  * n_stream, d_num, d — downstream keeps latest per key (q40
  * semantics). Long-range bound: n_stream·n_ref must stay below 2^63
  * (a 10⁶-row reference allows ~9·10¹² stream rows per key).
  */
object StreamingDrift {

  final case class DriftRow(key: String, nStream: Long, dNum: Long, d: Double)

  private val stateEnc: Encoder[(Long, Array[Long])] =
    Encoders.product[(Long, Array[Long])]
  implicit private val outEnc: Encoder[DriftRow] = Encoders.product[DriftRow]

  /** Per-key reference grid: ascending distinct units + cumulative
    * counts + total, prebuilt once from the raw sample.
    */
  final case class RefCdf(units: Array[Long], cum: Array[Long], n: Long)

  def buildReference(samples: Map[String, Seq[Double]],
      scale: Long = 100L): Map[String, RefCdf] = {
    require(scale >= 1, s"scale must be >= 1, got $scale")
    samples.collect { case (k, vs) if vs.nonEmpty =>
      val units = vs.map(v => math.floor(v * scale + 0.5).toLong)
      val grid = units.distinct.sorted.toArray
      val counts = units.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cum = new Array[Long](grid.length)
      var run = 0L
      var i = 0
      while (i < grid.length) { run += counts(grid(i)); cum(i) = run; i += 1 }
      k -> RefCdf(grid, cum, run)
    }
  }

  def drift(pairs: Dataset[(String, Double)], reference: Map[String, RefCdf],
      scale: Long = 100L): Dataset[DriftRow] = {
    require(scale >= 1, s"scale must be >= 1, got $scale")
    require(reference.nonEmpty, "reference must cover at least one key")
    reference.foreach { case (k, r) =>
      require(r.n > 0 && r.units.length == r.cum.length,
        s"malformed reference for key $k")
      // RefCdf is a public case class — a hand-built one (not via
      // buildReference) with unsorted units or non-increasing cum would
      // silently land stream values in wrong slots and emit a wrong D
      var i = 1
      while (i < r.units.length) {
        require(r.units(i - 1) < r.units(i),
          s"reference units for key $k must be strictly ascending")
        require(r.cum(i - 1) < r.cum(i),
          s"reference cum counts for key $k must be strictly increasing")
        i += 1
      }
      require(r.units.isEmpty || (r.cum(0) > 0 && r.cum.last == r.n),
        s"reference cum for key $k must start positive and end at n")
    }
    pairs
      .groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)({
        (key: String, it: Iterator[(String, Double)],
            state: GroupState[(Long, Array[Long])]) =>
          reference.get(key) match {
            case None => Iterator.empty // no baseline, nothing to drift from
            case Some(ref) =>
              val grid = ref.units
              // slot i counts stream units u with grid[i-1] < u <= grid[i];
              // slot |grid| holds units above every grid point (they move
              // n_stream but no grid-point CDF)
              val (n0, counts) = state.getOption
                .getOrElse((0L, new Array[Long](grid.length + 1)))
              var n = n0
              it.foreach { case (_, v) =>
                val u = math.floor(v * scale + 0.5).toLong
                var lo = 0
                var hi = grid.length // lowerBound: first i with grid(i) >= u
                while (lo < hi) {
                  val mid = (lo + hi) >>> 1
                  if (grid(mid) >= u) hi = mid else lo = mid + 1
                }
                counts(lo) += 1L
                n += 1L
              }
              state.update((n, counts))
              if (n == n0) Iterator.empty // no new data for this key
              else {
                var dNum = 0L
                var cumS = 0L
                var i = 0
                while (i < grid.length) {
                  cumS += counts(i)
                  val gap = math.abs(cumS * ref.n - ref.cum(i) * n)
                  if (gap > dNum) dNum = gap
                  i += 1
                }
                Iterator.single(DriftRow(key, n, dNum,
                  dNum.toDouble / (n.toDouble * ref.n.toDouble)))
              }
          }
      })(stateEnc, outEnc)
  }
}
