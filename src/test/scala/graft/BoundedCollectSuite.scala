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

  test("BC5: bounded collect_set — distinct retention, duplicate collapse, cap refusal") {
    import spark.implicits._
    registered()
    // key a: 3 distinct values each repeated 50x; key b: 8 distinct.
    // cap 5: a collects its complete distinct set (duplicates collapse,
    // never counting toward the cap), b marks at 5
    val rows = (1 to 3).flatMap(v => Seq.fill(50)(("a", v.toLong))) ++
      (1 to 8).map(v => ("b", v.toLong))
    val df = rows.toDF("k", "v").repartition(8)
    val got = df.groupBy("k")
      .agg(array_sort(BoundedCollect.boundedCollectSet(col("v"), lit(5))).as("vs"))
      .orderBy("k").as[(String, Seq[Long])].collect().toSeq
    assert(got.head == (("a", Seq(1L, 2L, 3L))), got.head)
    assert(got(1)._1 == "b" && got(1)._2.length == 5, got(1))
    // set semantics on strings too (UTF8String equality)
    val s = Seq(("k", "x"), ("k", "x"), ("k", "y")).toDF("g", "t")
      .groupBy("g")
      .agg(array_sort(BoundedCollect.boundedCollectSet(col("t"), lit(10))).as("ts"))
      .as[(String, Seq[String])].collect().head._2
    assert(s == Seq("x", "y"))
    // struct elements refuse at analysis, not per-task
    val e = intercept[Exception] {
      Seq((1L, 2L)).toDF("k", "v").groupBy("k")
        .agg(BoundedCollect.boundedCollectSet(struct(col("v")), lit(3))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("atomic"), e.getMessage)
  }

  test("BC6: the basket family refuses hot entities exactly, agrees with the uncapped build") {
    import spark.implicits._
    registered()
    import graft.operators.Relational
    // entity 1: 3 items (kept); entity 2: 50 distinct items with heavy
    // duplication (dropped at maxBasket 10 — refusal counts DISTINCT
    // items, duplicates of one item never inflate toward the cap)
    val rows = Seq((1L, 10L), (1L, 11L), (1L, 12L)) ++
      (1 to 50).flatMap(i => Seq.fill(20)((2L, 100L + i)))
    val df = rows.toDF("e", "item")
    val co = Relational.cooccurrence(df, "e", "item", maxBasket = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(co == Set((10L, 11L, 1L), (10L, 12L, 1L), (11L, 12L, 1L)),
      s"only entity 1's pairs survive: $co")
    // and a duplicated-but-small basket is complete, not truncated
    val dup = Seq((1L, 5L), (1L, 5L), (1L, 6L)).toDF("e", "item")
    assert(Relational.cooccurrence(dup, "e", "item", maxBasket = 10)
      .as[(Long, Long, Long)].collect().toSeq == Seq((5L, 6L, 1L)))
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
