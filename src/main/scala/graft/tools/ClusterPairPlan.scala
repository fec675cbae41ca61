package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** VERDICT r13 item 4: the paired fixpoint rounds in Dedup.clusters()
  * reference the INNER round's plan twice (join side + self-message
  * union arm) and lean on exchange reuse to evaluate it once. The
  * checkpoint-truncated after-plans cannot show that, so this probe
  * builds the exact paired-round plan LAZILY on a d06-scale synthetic
  * edge set, dumps the pre-execution plan (two references visible) and
  * the post-execution adaptive plan (reuse visible), and prints whether
  * the inner round's exchange was in fact reused.
  *
  *   runMain graft.tools.ClusterPairPlan [outDir]
  */
object ClusterPairPlan {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(if (args.nonEmpty) args(0) else "plans/r14")
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // a chain-heavy pair set (worst case for propagation rounds)
    val n = 2000000L
    val pairs = spark.range(n).select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
      .filter(col("id_a") % 5 =!= 4) // chains of length 5
    val inAll = pairs.select(col("id_a"), col("id_b"))
    val edges = inAll.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(inAll.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    val labels = edges.groupBy(col("dst"))
      .agg(min(col("src")).as("_m"))
      .select(col("dst").as("id"), least(col("dst"), col("_m")).as("comp"))
      .localCheckpoint(true)
    val paired = graft.operators.Dedup.clusterPropagate(edges,
      graft.operators.Dedup.clusterPropagate(edges, labels).select("id", "comp"))
    Files.write(outDir.resolve("clusters_paired_round_plan_initial.txt"),
      paired.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
        .getBytes(StandardCharsets.UTF_8))
    // the noop write runs its OWN QueryExecution — capture the executed
    // (AQE-finalized) plan through the listener, not the lazy original
    @volatile var finalPlan: String = null
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        finalPlan = qe.executedPlan.toString
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })
    paired.write.format("noop").mode("overwrite").save()
    var waited = 0
    while (finalPlan == null && waited < 100) { Thread.sleep(100); waited += 1 }
    require(finalPlan != null, "listener never delivered the executed plan")
    Files.write(outDir.resolve("clusters_paired_round_plan_final.txt"),
      finalPlan.getBytes(StandardCharsets.UTF_8))
    val reused = "ReusedExchange|ReusedQueryStage|ReusedShuffle".r
      .findAllIn(finalPlan).toSeq
    val stages = "ShuffleQueryStage (\\d+)".r.findAllMatchIn(finalPlan)
      .map(_.group(1)).toSeq
    println(s"[clusterpairplan] reuse markers: ${reused.size} " +
      reused.take(5).mkString("[", ", ", "]") +
      s"; shuffle stage refs ${stages.size}, distinct ${stages.distinct.size}")
    spark.stop()
  }
}
