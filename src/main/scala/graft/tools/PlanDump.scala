package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan/timing snapshot tool for the optimization rounds (not part of the
  * driver contract): for each named query, write its `explain("formatted")`
  * to `<outDir>/<name>_<suffix>.txt` and print the solo median of 3 noop
  * passes plus the per-query driver job count (the barrier profile).
  *
  *   runMain graft.tools.PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args(2)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    for (q <- graft.SparkEntry.filtered(Some(names))) {
      spark.sparkContext.setJobDescription(q.name)
      val df = q.fn(spark, sfDir)
      // queryExecution.explainString is what explain("formatted") prints
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${q.name}_$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      val ts = (1 to 3).map { _ =>
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graftbridge.ListenerDrain.drain(spark.sparkContext)
        val dj = jobs.get() - j0
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        (dt, dj)
      }
      val med = ts.map(_._1).sorted.apply(1)
      println(f"[plandump] ${q.name} median=$med%.3f s passes=${ts.map(t => f"${t._1}%.3f").mkString("/")} jobs=${ts.map(_._2).max}")
    }
    spark.stop()
  }
}
