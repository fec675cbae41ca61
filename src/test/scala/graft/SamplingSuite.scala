package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic sampling/split semantics beyond the oracle bindings. */
class SamplingSuite extends SparkSpec {

  test("split is deterministic, disjoint, exhaustive, and roughly proportional") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("id")
    val splits = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val a = Sampling.split(df, "id", splits).as[(Long, String)].collect().toMap
    val b = Sampling.split(df.repartition(7), "id", splits).as[(Long, String)].collect().toMap
    assert(a == b, "membership must not depend on run or partitioning")
    assert(a.size == 1000, "every row gets exactly one split")
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("test") > 50)
  }

  test("sample is a subset consistent with the split buckets; salt decorrelates") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("id")
    val s1 = Sampling.sample(df, "id", pct = 20, salt = "a:").as[Long].collect().toSet
    val s2 = Sampling.sample(df, "id", pct = 20, salt = "a:").as[Long].collect().toSet
    assert(s1 == s2, "same salt → same sample")
    assert(s1.size > 120 && s1.size < 280, s"~20% expected, got ${s1.size}")
    val other = Sampling.sample(df, "id", pct = 20, salt = "b:").as[Long].collect().toSet
    assert(other != s1, "a different salt draws a different sample")
    // nested fractions: a 10% sample with the same salt is inside the 20%
    val inner = Sampling.sample(df, "id", pct = 10, salt = "a:").as[Long].collect().toSet
    assert(inner.subsetOf(s1), "smaller pct with the same salt nests")
  }

  test("group-stable split: hashing an entity key keeps its rows together") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (i, i % 30)) // 30 users, 10 rows each
    val df = rows.toDF("row_id", "user_id")
    val got = Sampling.split(df, "user_id", Seq("train" -> 90, "test" -> 10))
      .select("user_id", "split").as[(Long, String)].collect().toSeq
    val perUser = got.groupBy(_._1).values
    assert(perUser.forall(_.map(_._2).distinct.size == 1),
      "all rows of a user must land in the same split — the leakage guard")
  }

  test("split validates weights") {
    import spark.implicits._
    val df = (1L to 10L).toDF("id")
    intercept[IllegalArgumentException] {
      Sampling.split(df, "id", Seq("a" -> 50, "b" -> 40)) // sums to 90, not 100
    }
  }
}
