package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Generic-surface behaviors of the dedup operators not covered by the
  * oracle queries (which bind numeric ids).
  */
class DedupOpsSuite extends SparkSpec {

  test("clusters works with string ids and finds components") {
    import spark.implicits._
    val all = Seq("a", "b", "c", "d", "e").toDF("id")
    val pairs = Seq(("a", "b"), ("b", "c"), ("d", "e")).toDF("id_a", "id_b")
    val got = Dedup.clusters(all, "id", pairs)
      .orderBy("id").as[(String, String, Boolean)].collect().toSeq
    assert(got == Seq(
      ("a", "a", true), ("b", "a", false), ("c", "a", false),
      ("d", "d", true), ("e", "d", false)))
  }

  test("clusters throws instead of silently truncating at maxRounds") {
    import spark.implicits._
    // a 5-node chain needs 4 propagation hops; 1 round cannot converge
    val all = (1 to 5).map(_.toLong).toDF("id")
    val pairs = (1 to 4).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      Dedup.clusters(all, "id", pairs, maxRounds = 1)
    }
    assert(ex.getMessage.contains("did not converge"))
    // and with enough rounds the same chain collapses to one component
    val ok = Dedup.clusters(all, "id", pairs, maxRounds = 10)
    assert(ok.filter(col("keep")).count() == 1)
  }
}
