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

  test("text reader: line mode and whole-file mode") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-text")
    java.nio.file.Files.write(tmp.resolve("a.txt"), "one\ntwo\nthree".getBytes)
    java.nio.file.Files.write(tmp.resolve("b.txt"), "four".getBytes)
    assert(Tables.text(spark, tmp.toString).count() == 4)
    val whole = Tables.text(spark, tmp.toString, wholeFile = true)
    assert(whole.count() == 2)
    assert(whole.collect().map(_.getString(0)).toSet == Set("one\ntwo\nthree", "four"))
  }

  test("binaryFiles: payload + metadata rows, glob prunes at listing time") {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft-bin")
    val payload = Array[Byte](0xFF.toByte, 0xD8.toByte, 1, 2, 3)
    java.nio.file.Files.write(tmp.resolve("x.jpg"), payload)
    java.nio.file.Files.write(tmp.resolve("x.json"), "{\"caption\":\"hi\"}".getBytes)
    val all = Tables.binaryFiles(spark, tmp.toString)
    assert(all.count() == 2)
    val jpgs = Tables.binaryFiles(spark, tmp.toString, glob = "*.jpg")
    val rows = jpgs.select("path", "length", "content").collect()
    assert(rows.length == 1, "sidecar json pruned by the listing-time glob")
    assert(rows.head.getLong(1) == 5L)
    assert(rows.head.getAs[Array[Byte]](2).toSeq == payload.toSeq)
    // the binary source feeds the m01 shape directly: payload magic routing
    assert(jpgs.filter(col("length") > 0).count() == 1)
  }

  test("orc round-trips with pushdown-compatible schema") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5)).toDF("id", "g", "v")
    graft.sources.Sinks.orc(df, s"$dir/t")
    val back = Tables.orc(spark, s"$dir/t")
    // names/types survive (nullability widens on read, as with parquet)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5)))
    // filters reach the ORC scan (same pushdown contract as parquet)
    val plan = back.filter($"g" === "a").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("g"), plan.take(500))
  }
}
