package graft

import org.apache.spark.sql.functions._

/** The eager-materialization switch (Ckpt.eagerPin): default mode is the
  * executor-local checkpoint every operator always used; the
  * cluster-deployment flag reroutes the SAME sites through reliable
  * checkpoints so an executor loss recomputes instead of failing.
  */
class CkptSuite extends SparkSpec {

  test("eagerPin reliable mode: same results, checkpoints land in the reliable dir") {
    import spark.implicits._
    import graft.operators.Dedup
    val all = (1L to 8L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    def run(): Set[(Long, Long, Boolean)] =
      Dedup.clusters(all, "id", pairs)
        .as[(Long, Long, Boolean)].collect().toSet
    val local = run()
    val dir = java.nio.file.Files.createTempDirectory("graft-reliable-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    spark.conf.set("spark.graft.reliableCheckpoints", "true")
    try {
      assert(run() == local) // identical labels under reliable checkpoints
      def files(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(files) else Seq(f)
      assert(files(dir.toFile).nonEmpty,
        "reliable mode must write checkpoint data to the checkpoint dir")
    } finally spark.conf.unset("spark.graft.reliableCheckpoints")
  }
}
