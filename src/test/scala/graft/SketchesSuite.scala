package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

class SketchesSuite extends SparkSpec {
  import spark.implicits._

  test("quantile sketch: estimates within KLL rank error; store-and-rollup path") {
    // two groups with known order statistics: g=a is 0..999, g=b is 0..99
    val rows = (0 until 1000).map(i => ("a", i.toDouble)) ++
      (0 until 100).map(i => ("b", i.toDouble))
    val df = rows.toDF("g", "v").repartition(7) // partials span partitions
    val est = Sketches.quantileEstimate(
        Sketches.quantileSketchBuild(df, "v", Seq("g"), k = 200),
        Seq(0.1, 0.5, 0.9))
      .select("g", "n", "quantiles").as[(String, Long, Seq[Double])]
      .collect().map(t => t._1 -> t).toMap
    assert(est("a")._2 == 1000L && est("b")._2 == 100L)
    // k=200 → ~1.65% max rank error; allow 2% of each range
    val a = est("a")._3
    assert(math.abs(a(0) - 100) <= 20 && math.abs(a(1) - 500) <= 20 &&
      math.abs(a(2) - 900) <= 20, s"$a")
    val b = est("b")._3
    assert(math.abs(b(1) - 50) <= 2, s"$b")

    // store per-shard sketches, roll up WITHOUT raw data: same bounds
    val sharded = df.withColumn("shard", pmod(hash(col("v")), lit(4)))
    val perShard = Sketches.quantileSketchBuild(sharded, "v", Seq("g", "shard"))
    assert(perShard.count() == 8) // 2 groups × 4 shards materialized
    val rolled = Sketches.quantileEstimate(
        Sketches.quantileRollup(perShard, Seq("g")), Seq(0.5))
      .select("g", "n", "quantiles").as[(String, Long, Seq[Double])]
      .collect().map(t => t._1 -> t).toMap
    assert(rolled("a")._2 == 1000L, s"rollup must see every shard's stream")
    assert(math.abs(rolled("a")._3.head - 500) <= 20, s"${rolled("a")}")
    assert(math.abs(rolled("b")._3.head - 50) <= 2, s"${rolled("b")}")
  }

  test("quantile sketch: null values skipped, empty build yields no rows") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)))
      .toDF("g", "v")
    val est = Sketches.quantileEstimate(
        Sketches.quantileSketchBuild(df, "v", Seq("g")), Seq(0.5))
      .select("n").as[Long].collect()
    assert(est.toSeq == Seq(2L)) // the null never entered the stream
    val empty = Sketches.quantileSketchBuild(
      Seq.empty[(String, Double)].toDF("g", "v"), "v", Seq("g"))
    assert(empty.count() == 0)
  }

  test("frequent items: exact while unpurged; no-false-negatives when undersized") {
    // skewed stream: hot item 500×, warm 80×, tail 40 items × 2
    val items = Seq.fill(500)("hot") ++ Seq.fill(80)("warm") ++
      (0 until 40).flatMap(i => Seq.fill(2)(s"tail$i"))
    val df = items.map(Tuple1(_)).toDF("item").repartition(5)
    // map sized above distinct count (42 < 0.75·128): estimates EXACT
    val exact = Sketches.heavyHitters(df, "item", Nil, maxMapSize = 128)
      .select("item", "est", "lb", "ub").as[(String, Long, Long, Long)]
      .collect().map(t => t._1 -> t).toMap
    assert(exact("hot")._2 == 500L && exact("warm")._2 == 80L)
    assert(exact.size == 42 && exact.forall { case (_, t) => t._3 == t._4 },
      "unpurged sketch must be exact (lb == ub)")
    // undersized map (8): the two heavy keys still surface with true
    // count inside [lb, ub] — the no-false-negatives contract
    val approx = Sketches.heavyHitters(df, "item", Nil, maxMapSize = 8)
      .select("item", "est", "lb", "ub").as[(String, Long, Long, Long)]
      .collect().map(t => t._1 -> t).toMap
    assert(approx.contains("hot") && approx.contains("warm"), s"${approx.keySet}")
    assert(approx("hot")._3 <= 500L && 500L <= approx("hot")._4, s"${approx("hot")}")
    assert(approx("warm")._3 <= 80L && 80L <= approx("warm")._4, s"${approx("warm")}")
  }

  test("theta sketches: union/intersect/difference set algebra over stored periods") {
    // day1 users 0..99, day2 users 50..149: |∪|=150, |∩|=50, |d1\d2|=50.
    // Below 2^lgK entries a theta sketch is in exact mode — estimates
    // are exact, so the algebra is checkable with equality.
    val rows = (0 until 100).map(u => ("d1", s"u$u")) ++
      (50 until 150).map(u => ("d2", s"u$u"))
    val df = rows.toDF("day", "user").repartition(5)
    val perDay = Sketches.thetaSketchBuild(df, "user", Seq("day"))
    def est(d: org.apache.spark.sql.DataFrame): Double =
      Sketches.thetaEstimate(d).select("distinct_est").as[Double].head()
    assert(est(Sketches.thetaRollup(perDay, Nil, "union")) == 150.0)
    assert(est(Sketches.thetaRollup(perDay, Nil, "intersect")) == 50.0)
    // difference via the two sketch columns joined side by side
    val wide = perDay.filter($"day" === "d1").select($"tsketch".as("a"))
      .crossJoin(perDay.filter($"day" === "d2").select($"tsketch".as("b")))
    val diff = Sketches.thetaEstimate(Sketches.thetaANotB(wide, "a", "b"), "anotb")
      .select("distinct_est").as[Double].head()
    assert(diff == 50.0)
    // per-day estimates themselves are exact too
    val each = Sketches.thetaEstimate(perDay).select("day", "distinct_est")
      .as[(String, Double)].collect().toMap
    assert(each == Map("d1" -> 100.0, "d2" -> 100.0), s"$each")
    // intersect of a single-sketch group is that sketch (identity holds)
    val one = Sketches.thetaRollup(perDay.filter($"day" === "d1"), Nil, "intersect")
    assert(est(one) == 100.0)
  }

  test("streaming heavy hitters: counts accumulate across batches, exact while unpurged") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingHeavyHitters
    implicit val sc = spark.sqlContext
    val source = MemoryStream[String]
    val out = StreamingHeavyHitters.runningHeavyHitters(
      source.toDS(), shards = 4, maxMapSize = 64, minEst = 3L)
    val query = out.writeStream.format("memory").queryName("hh_out")
      .outputMode("append").start()
    try {
      source.addData(Seq.fill(5)("x") ++ Seq.fill(2)("y"): _*)
      query.processAllAvailable()
      // y (2 < minEst) suppressed; x visible at its exact running count
      val b1 = spark.table("hh_out").as[StreamingHeavyHitters.HeavyHitter]
        .collect().groupBy(_.item).map { case (k, v) => k -> v.map(_.est).max }
      assert(b1 == Map("x" -> 5L), s"$b1")
      // next batch: y crosses the threshold, x's running count grows —
      // sketch state carried across batches, not per-batch counts
      source.addData(Seq.fill(4)("y") ++ Seq.fill(1)("x"): _*)
      query.processAllAvailable()
      val b2 = spark.table("hh_out").as[StreamingHeavyHitters.HeavyHitter]
        .collect().groupBy(_.item).map { case (k, v) => k -> v.map(_.est).max }
      assert(b2 == Map("x" -> 6L, "y" -> 6L), s"$b2")
    } finally query.stop()
  }

  test("streaming quantiles: exact while uncompacted, state carries across batches, per-key isolation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingQuantiles
    implicit val sc = spark.sqlContext
    val source = MemoryStream[(String, Double)]
    // k=64 > total n per key: the sketch never compacts -> exact order stats
    val out = StreamingQuantiles.runningQuantiles(
      source.toDS(), ranks = Seq(0.5, 1.0), k = 64)
    val query = out.writeStream.format("memory").queryName("qq_out")
      .outputMode("append").start()
    try {
      source.addData((1 to 10).map(i => ("a", i.toDouble)) ++ Seq(("b", 100.0)): _*)
      query.processAllAvailable()
      def latest(): Map[(String, Double), (Long, Double)] =
        spark.table("qq_out").as[StreamingQuantiles.QuantileRow].collect()
          .groupBy(r => (r.key, r.rank))
          .map { case (k, v) => k -> { val m = v.maxBy(_.n); (m.n, m.value) } }
      val b1 = latest()
      // inclusive rank: p50 of 1..10 is the 5th value
      assert(b1(("a", 0.5)) == ((10L, 5.0)), s"$b1")
      assert(b1(("a", 1.0)) == ((10L, 10.0)), s"$b1")
      assert(b1(("b", 0.5)) == ((1L, 100.0)), s"$b1")
      // second batch shifts a's distribution upward; b is untouched this
      // batch (no re-emit) but its prior rows remain the latest
      source.addData((11 to 20).map(i => ("a", i.toDouble)): _*)
      query.processAllAvailable()
      val b2 = latest()
      assert(b2(("a", 0.5)) == ((20L, 10.0)), s"$b2") // median of 1..20
      assert(b2(("a", 1.0)) == ((20L, 20.0)), s"$b2")
      assert(b2(("b", 0.5)) == ((1L, 100.0)), s"$b2")
      // streaming readout == batch sketch readout over the same data
      val batch = Sketches.quantileSketchBuild(
        (1 to 20).map(i => ("a", i.toDouble)).toDF("k", "v"), "v", Seq("k"), k = 64)
      val est = Sketches.quantileEstimate(batch, Seq(0.5, 1.0))
        .select("quantiles").as[Seq[Double]].head()
      assert(est == Seq(b2(("a", 0.5))._2, b2(("a", 1.0))._2), s"$est")
    } finally query.stop()
  }

  test("frequent items: per-group isolation and rollup equivalence") {
    val df = (Seq.fill(10)(("g1", "x")) ++ Seq.fill(3)(("g1", "y")) ++
      Seq.fill(7)(("g2", "y"))).toDF("g", "item").repartition(3)
    val r = Sketches.heavyHitters(df, "item", Seq("g"), maxMapSize = 16)
      .select("g", "item", "est").as[(String, String, Long)].collect().toSet
    assert(r == Set(("g1", "x", 10L), ("g1", "y", 3L), ("g2", "y", 7L)), s"$r")
    // rollup of per-group sketches to global == sketch of the whole stream
    val perGroup = Sketches.frequentItemsBuild(df, "item", Seq("g"), maxMapSize = 16)
    val global = Sketches.frequentItemsRollup(perGroup, Nil)
    val bytes = global.select("fsketch").as[Array[Byte]].head()
    import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
    import org.apache.datasketches.memory.Memory
    val sk = ItemsSketch.getInstance(Memory.wrap(bytes),
      new org.apache.datasketches.common.ArrayOfStringsSerDe)
    val got = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .map(row => row.getItem -> row.getEstimate).toMap
    assert(got == Map("x" -> 10L, "y" -> 10L), s"$got")
  }
}
