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
}
