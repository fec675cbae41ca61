package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKAggregate

class TopKAggregateSuite extends SparkSpec {

  test("K1: heap keeps the k largest (score, id) pairs; serde roundtrips mid-stream") {
    val h = new TopKAggregate.Heap(3)
    Seq((1.0, 10L), (5.0, 2L), (3.0, 7L), (5.0, 9L), (0.5, 99L)).foreach {
      case (s, i) => h.offer(s, i)
    }
    assert(h.sortedDesc.map(c => (c.score, c.id)) == Seq((5.0, 9L), (5.0, 2L), (3.0, 7L)))
    // roundtrip through the partial-agg wire format, then keep folding
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = TopKAggregate.TopKByScore(Literal(0.0), Literal(0L), Literal(3))
    val h2 = agg.deserialize(agg.serialize(h))
    h2.offer(4.0, 1L)
    assert(h2.sortedDesc.map(c => (c.score, c.id)) == Seq((5.0, 9L), (5.0, 2L), (4.0, 1L)))
    // merge is order-insensitive
    val a = new TopKAggregate.Heap(2); a.offer(1.0, 1L); a.offer(9.0, 1L)
    val b = new TopKAggregate.Heap(2); b.offer(9.0, 2L); b.offer(2.0, 5L)
    a.mergeIn(b)
    assert(a.sortedDesc.map(c => (c.score, c.id)) == Seq((9.0, 2L), (9.0, 1L)))
  }

  test("K2: randomized parity with the window top-k under heavy score ties") {
    import spark.implicits._
    TopKAggregate.register(spark)
    val rnd = new scala.util.Random(11)
    // tiny score domain forces ties in every group; ids unique
    val df = (1L to 2000L).map(i => ("g" + rnd.nextInt(17), rnd.nextInt(6).toDouble, i))
      .toDF("g", "s", "id").repartition(8)
    val viaHeap = df.groupBy("g")
      .agg(TopKAggregate.topK(col("s"), col("id"), lit(4)).as("top"))
      .select(col("g"), explode(col("top")).as("e"))
      .select(col("g"), col("e.score").as("s"), col("e.id").as("id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(desc("s"), desc("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
      .select("g", "s", "id")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(viaHeap == viaWindow && viaHeap.size == 17 * 4)
  }

  test("K3: plan is partial/final ObjectHashAggregate — no Window, no per-group sort") {
    import spark.implicits._
    TopKAggregate.register(spark)
    val df = (1L to 500L).map(i => ("g" + i % 3, i.toDouble, i)).toDF("g", "s", "id")
      .groupBy("g").agg(TopKAggregate.topK(col("s"), col("id"), lit(2)).as("top"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_graft_topk") || plan.contains("partial graft_topk")
      || plan.toLowerCase.contains("partial"), plan)
    assert(!plan.contains("Window"), plan)
    // nulls in either column are ignored, not NPEs and not winners
    val withNulls = Seq(("g", Some(9.0), Some(1L)), ("g", None, Some(2L)),
        ("g", Some(8.0), None), ("g", Some(7.0), Some(3L)))
      .toDF("g", "s", "id")
      .groupBy("g").agg(TopKAggregate.topK(col("s"), col("id"), lit(5)).as("top"))
      .select(explode(col("top")).as("e")).select(col("e.id"))
      .collect().map(_.getLong(0)).toSeq
    assert(withNulls == Seq(1L, 3L))
  }
}
