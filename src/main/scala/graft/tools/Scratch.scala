package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch harness for plan inspection while iterating (not part of the
  * driver contract; runMain graft.tools.Scratch <query> [sfDir]).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("p03_curation_e2e")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.filtered(Some(name)).head
    val df = q.fn(spark, sfDir)
    df.explain("formatted")
    // timed passes
    val profile = sys.env.get("SCRATCH_PROFILE").isDefined
    if (profile) {
      import org.apache.spark.sql.functions._
      val e = graft.sources.Tables(spark, sfDir, "embeddings")
      def t[A](n: String)(f: => A): A = { val t0 = System.nanoTime(); val r = f; println(f"  piece $n: ${(System.nanoTime()-t0)/1e9}%.3f s"); r }
      val cells = graft.operators.Similarity.centroidVectors(e, "label", "embedding")
      t("cells count")(cells.count())
      val cb = graft.operators.Similarity.labelCodebooks(e, "label", "embedding", 64, 4)
      t("cb count")(cb.count())
      val idx = graft.operators.Similarity.ivfPqIndex(e, "vec_id", "embedding", cells, cb, 64, 4)
      t("index noop")(idx.write.format("noop").mode("overwrite").save())
      t("index noop2")(idx.write.format("noop").mode("overwrite").save())
      val knn = graft.operators.Similarity.ivfPqKnn(e, "vec_id", "embedding", cells, cb, col("vec_id") < 40, 64, 4, 10)
      t("knn noop")(knn.write.format("noop").mode("overwrite").save())
      t("knn noop2")(knn.write.format("noop").mode("overwrite").save())
    }
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
