package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{Sinks, Tables}

class SinksSuite extends SparkSpec {

  test("partitioned parquet sink enables partition pruning on read") {
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "lang", "n_chars")
    val tmp = Files.createTempDirectory("graft-sink").toString
    Sinks.parquet(docs, s"$tmp/by_lang", partitionBy = Seq("lang"))
    // hive-style layout: one directory per lang value
    val dirs = new java.io.File(s"$tmp/by_lang").listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(dirs.nonEmpty)
    val back = spark.read.parquet(s"$tmp/by_lang")
    assert(back.count() == docs.count())
    // an equality filter on the partition column prunes at planning time
    val en = back.filter(col("lang") === "en")
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    assert(en.count() == docs.filter(col("lang") === "en").count())
  }

  test("trainingShards: one ordered file per shard directory") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toLong, s"doc$i")).toDF("id", "text")
    val sharded = graft.operators.Sampling.shuffleShards(df, "id", shards = 4, salt = "w:")
    val tmp = Files.createTempDirectory("graft-shards").toString
    Sinks.trainingShards(sharded, s"$tmp/out")
    val shardDirs = new java.io.File(s"$tmp/out").listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("shard="))
    assert(shardDirs.length == 4)
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: one file per shard, got ${files.length}")
      // parquet preserves in-file row order: the shard streams in shuffle order
      val pos = spark.read.parquet(files.head.getPath).select("shard_pos").as[Long].collect()
      assert(pos.toSeq == (0L until pos.length).toSeq, s"${d.getName} not in position order")
    }
    val back = spark.read.parquet(s"$tmp/out")
    assert(back.count() == 500)
  }

  test("bucketed tables join with ZERO exchange (co-located join)") {
    import spark.implicits._
    val facts = (0 until 2000).map(i => (i.toLong % 100, i.toLong)).toDF("key", "a")
    val dims = (0 until 1000).map(i => (i.toLong % 100, s"v$i")).toDF("key", "b")
    val tmp = Files.createTempDirectory("graft-bucketed").toString
    Sinks.bucketed(facts, "bt_facts", "key", 8, sortCols = Seq("key"),
      path = Some(s"$tmp/facts"))
    Sinks.bucketed(dims, "bt_dims", "key", 8, sortCols = Seq("key"),
      path = Some(s"$tmp/dims"))
    val prevThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      // disable broadcast so the exchange-free plan is bucketing's doing,
      // not a small-table special case
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bt_facts").join(spark.table("bt_dims"), "key")
      val n = j.count()
      assert(n == 2000L * 10) // 20 fact rows x 10 dim rows per key
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n${plan.take(2000)}")
      // same join WITHOUT bucketing shuffles both sides
      val raw = facts.join(dims, "key")
      raw.count()
      assert(raw.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
      spark.sql("DROP TABLE IF EXISTS bt_facts")
      spark.sql("DROP TABLE IF EXISTS bt_dims")
    }
  }
}
