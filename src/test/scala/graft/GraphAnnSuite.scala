package graft

import org.apache.spark.sql.functions._

import graft.operators.{GraphAnn, Similarity}

/** Sharded HNSW graph ANN: recall pinned against the exact brute-force
  * scorer on the real embeddings table, determinism across rebuilds and
  * a parquet round-trip of the index, self-match/degenerate discipline,
  * and the loud corrupted-index guard.
  */
class GraphAnnSuite extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val queries = emb.orderBy("vec_id").limit(20)

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toSeq }

  private def recallAt(k: Int, got: Map[Long, Seq[Long]], truth: Map[Long, Seq[Long]]): Double = {
    val hits = truth.keys.toSeq.map { q =>
      got.getOrElse(q, Nil).toSet.intersect(truth(q).toSet).size.toDouble / k
    }
    hits.sum / hits.size
  }

  test("G1: recall@10 >= 0.9 vs exact brute force, 1-shard and 4-shard") {
    val truth = asMap(Similarity.knnBruteForce(emb, queries, "vec_id", "embedding", 10))
    val one = asMap(GraphAnn.hnswKnn(emb, queries, "vec_id", "embedding",
      k = 10, shards = 1, m = 8, efConstruction = 64, efSearch = 64))
    val four = asMap(GraphAnn.hnswKnn(emb, queries, "vec_id", "embedding",
      k = 10, shards = 4, m = 8, efConstruction = 64, efSearch = 64))
    val r1 = recallAt(10, one, truth)
    val r4 = recallAt(10, four, truth)
    assert(r1 >= 0.9, s"1-shard recall@10 = $r1")
    // sharded search queries EVERY shard (smaller graphs, same beam), so
    // recall must not degrade with sharding
    assert(r4 >= 0.9, s"4-shard recall@10 = $r4")
    // every query answered with a full k list
    assert(one.size == 20 && one.values.forall(_.size == 10))
  }

  test("G2: deterministic rebuilds; index survives a parquet round-trip bit-identically") {
    val a = GraphAnn.hnswKnn(emb, queries, "vec_id", "embedding", k = 5, shards = 3)
      .collect().map(_.toString).sorted.toSeq
    val b = GraphAnn.hnswKnn(emb, queries, "vec_id", "embedding", k = 5, shards = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b, "two builds of the same corpus must answer identically")
    val idx = GraphAnn.hnswIndex(emb, "vec_id", "embedding", shards = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_hnsw").toString
    idx.write.mode("overwrite").parquet(dir)
    val reloaded = GraphAnn.hnswSearch(spark.read.parquet(dir), queries,
      "vec_id", "embedding", k = 5).collect().map(_.toString).sorted.toSeq
    assert(reloaded == a, "a persisted index must answer like the in-flight one")
  }

  test("G3: self-matches excluded, k > corpus clamps, zero vectors rank last not NaN") {
    import spark.implicits._
    val tiny = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f)),
      (4L, Array(0.0f, 0.0f))) // zero vector: cos defined as 0, never NaN
      .toDF("vec_id", "embedding")
    val out = GraphAnn.hnswKnn(tiny, tiny.filter(col("vec_id") === 1L),
      "vec_id", "embedding", k = 10, shards = 1)
    val rows = out.collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(!rows.map(_._1).contains(1L), "query must not match itself")
    assert(rows.length == 3, "k clamps to the reachable corpus")
    assert(rows.forall(r => !r._2.isNaN))
    // nearest is the almost-parallel vector, zero vector scores 0
    assert(rows.head._1 == 2L)
    assert(rows.map(_._1).last == 4L && rows.last._2 == 0.0)
  }

  test("G4: a corrupted index (dangling neighbor) fails loud, never binds arbitrarily") {
    val idx = GraphAnn.hnswIndex(emb, "vec_id", "embedding", shards = 1)
    // drop one node that others reference -> its id dangles in their adjacency
    val referenced = idx.select(explode(flatten(col("layers"))).as("nb"))
      .groupBy("nb").count().orderBy(desc("count")).limit(1)
      .collect().head.getLong(0)
    val corrupted = idx.filter(col("id") =!= referenced)
    val e = intercept[Exception] {
      GraphAnn.hnswSearch(corrupted, queries, "vec_id", "embedding", k = 5).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).mkString(" | ").contains("dangling neighbor"), msgs(e).mkString(" | "))
  }

  test("G5: a corpus-sized query side refuses loud at maxQueries; the boundary passes") {
    val idx = GraphAnn.hnswIndex(emb, "vec_id", "embedding", shards = 2)
    // over the cap: loud refusal naming the distributed alternatives
    val e = intercept[IllegalArgumentException] {
      GraphAnn.hnswSearch(idx, emb, "vec_id", "embedding", k = 3, maxQueries = 10)
    }
    assert(e.getMessage.contains("maxQueries") &&
      e.getMessage.contains("hnswSearchDistributed"), e.getMessage)
    // exactly at the cap: allowed
    val ok = GraphAnn.hnswSearch(idx, emb.orderBy("vec_id").limit(10),
      "vec_id", "embedding", k = 3, maxQueries = 10)
    assert(ok.select("query_id").distinct().count() == 10)
    // Int.MaxValue is the disable sentinel (annLsh's maxBucketDf
    // convention): must not wrap the fetch limit negative
    val all = GraphAnn.hnswSearch(idx, emb.orderBy("vec_id").limit(5),
      "vec_id", "embedding", k = 3, maxQueries = Int.MaxValue)
    assert(all.select("query_id").distinct().count() == 5)
    // null-id rows never count toward the cap (the guard rides the
    // filtered collect, not a raw count)
    import org.apache.spark.sql.functions.lit
    val withNull = emb.orderBy("vec_id").limit(10)
      .select(col("vec_id"), col("embedding"))
      .unionByName(emb.limit(1).select(lit(null).cast("long").as("vec_id"),
        col("embedding")))
    val atCap = GraphAnn.hnswSearch(idx, withNull, "vec_id", "embedding",
      k = 3, maxQueries = 10)
    assert(atCap.select("query_id").distinct().count() == 10)
  }

  test("G6: distributed-query search is bit-identical to the broadcast path " +
      "and recalls vs brute force — no driver collect, no query ceiling") {
    val idx = GraphAnn.hnswIndex(emb, "vec_id", "embedding", shards = 4)
    val viaBroadcast = asMap(GraphAnn.hnswSearch(
      idx, emb, "vec_id", "embedding", k = 10))
    // the WHOLE corpus as the query side — over any reasonable broadcast
    // cap, streamed through the cogroup instead
    val viaCogroup = asMap(GraphAnn.hnswSearchDistributed(
      idx, emb, "vec_id", "embedding", k = 10, shards = 4))
    assert(viaCogroup == viaBroadcast)
    // and the merged result still recalls against exact truth
    val truth = asMap(Similarity.knnBruteForce(emb, queries, "vec_id", "embedding", 10))
    val got = asMap(GraphAnn.hnswSearchDistributed(
      idx, queries, "vec_id", "embedding", k = 10, shards = 4))
    assert(recallAt(10, got, truth) >= 0.9)
  }
}
