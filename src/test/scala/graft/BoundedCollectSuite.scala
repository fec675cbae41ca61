package graft

import org.apache.spark.sql.functions._

import graft.functions.BoundedCollect

/** The size-capped collect aggregate behind the banded-LSH dedup caps:
  * exact retention below the cap, exact refusal at it, bounded state on
  * hot keys, generic over the element type.
  */
class BoundedCollectSuite extends SparkSpec {

  private def registered() = { BoundedCollect.register(spark); () }

  test("BC1: groups below the cap collect completely; at/over the cap they mark by size") {
    import spark.implicits._
    registered()
    // key a: 3 values, key b: 6 values; cap 5 => a complete, b capped at 5
    val df = ((1 to 3).map(i => ("a", i.toLong)) ++ (1 to 6).map(i => ("b", i.toLong)))
      .toDF("k", "v")
      .repartition(8) // force partial buffers + merges across tasks
    val got = df.groupBy("k")
      .agg(array_sort(BoundedCollect.boundedCollect(col("v"), lit(5))).as("vs"))
      .orderBy("k")
      .as[(String, Seq[Long])].collect().toSeq
    assert(got.head == (("a", Seq(1L, 2L, 3L))), got.head)
    assert(got(1)._1 == "b" && got(1)._2.length == 5, got(1))
    // the caller's refusal contract: cap = maxDf+1, keep size <= maxDf
    val kept = df.groupBy("k")
      .agg(BoundedCollect.boundedCollect(col("v"), lit(5)).as("vs"))
      .filter(size(col("vs")) <= 4)
      .select("k").as[String].collect().toSeq
    assert(kept == Seq("a"), "the 6-value group must be refused at maxDf=4")
  }

  test("BC2: hot key bounded everywhere — a degenerate key collects cap, never its row count") {
    import spark.implicits._
    registered()
    val hot = (1 to 10000).map(i => ("hot", i.toLong)).toDF("k", "v").repartition(16)
    val got = hot.groupBy("k")
      .agg(BoundedCollect.boundedCollect(col("v"), lit(101)).as("vs"))
      .select(size(col("vs"))).as[Int].collect().head
    assert(got == 101, s"retained $got — cap must bind")
  }

  test("BC3: struct elements and nulls — copies are deep, nulls ignored") {
    import spark.implicits._
    registered()
    val df = Seq(("a", Some(1L), "x"), ("a", Some(2L), "y"), ("a", None, "z"))
      .toDF("k", "id", "s")
    val got = df.groupBy("k")
      .agg(array_sort(BoundedCollect.boundedCollect(
        when(col("id").isNotNull, struct(col("id"), col("s"))), lit(10))).as("ms"))
      .select(explode(col("ms")).as("m"))
      .select(col("m.id"), col("m.s"))
      .as[(Long, String)].collect().toSeq.sorted
    assert(got == Seq((1L, "x"), (2L, "y")), got)
  }

  test("BC4: SQL surface + analysis-time cap validation") {
    registered()
    import spark.implicits._
    Seq((1L, 2L)).toDF("k", "v").createOrReplaceTempView("bc4")
    val viaSql = spark.sql(
      "SELECT graft_bounded_collect(v, 3) AS vs FROM bc4 GROUP BY k")
      .selectExpr("size(vs)").collect().head.getInt(0)
    assert(viaSql == 1)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_bounded_collect(v, k) FROM bc4 GROUP BY k").collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable") ||
      e.getMessage.toLowerCase.contains("literal"), e.getMessage)
  }
}
