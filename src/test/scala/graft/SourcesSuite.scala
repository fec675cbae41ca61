package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Generic source readers: pipelines aren't parquet-only. */
class SourcesSuite extends SparkSpec {

  test("csv and json round-trip the documents sample") {
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "lang", "source", "n_chars").limit(50)
    val tmp = Files.createTempDirectory("graft-sources").toString

    docs.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    val csv = Tables.csv(spark, s"$tmp/csv")
    assert(csv.count() == 50)
    assert(csv.columns.sorted.toSeq == docs.columns.sorted.toSeq)
    assert(csv.agg(sum("n_chars")).head.getLong(0) ==
      docs.agg(sum("n_chars")).head.getLong(0))

    docs.write.mode("overwrite").json(s"$tmp/json")
    val json = Tables.json(spark, s"$tmp/json")
    assert(json.count() == 50)
    assert(json.agg(sum("n_chars")).head.getLong(0) ==
      docs.agg(sum("n_chars")).head.getLong(0))
  }

  test("events reader rebuilds microsecond timestamps from ns parquet") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType.typeName == "timestamp")
    assert(ev.count() > 0)
  }
}
