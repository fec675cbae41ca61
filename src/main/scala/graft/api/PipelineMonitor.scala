package graft.api

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Per-stage stats for a compiled pipeline stage. Holds only accumulators
  * (serializable), so it can be captured by the stage's task closure
  * without dragging the session along.
  */
final class StageStats private[api] (
    val rowsIn: LongAccumulator,
    val rowsOut: LongAccumulator,
    val batches: LongAccumulator,
    val failures: LongAccumulator,
    val processNanos: LongAccumulator) extends Serializable

/** Per-stage pipeline statistics (reference: pipelines/private/monitoring.py —
  * per-stage rows in/out, batch counts, processing time). Spark-native:
  * driver-registered `LongAccumulator`s that executors update in-flight, so
  * stats are live while the job runs.
  *
  * Accuracy contract: these accumulators update inside TRANSFORMATIONS
  * (the compiled `mapPartitions`), so Spark guarantees at-least-once, not
  * exactly-once — a retried or speculatively re-executed task counts its
  * rows again. That is the right trade for monitoring (live visibility,
  * zero extra actions); treat the numbers as progress telemetry, not an
  * audit total. Under a healthy run (no task retries) they are exact.
  */
final class PipelineMonitor(spark: SparkSession) {

  private val stages = TrieMap.empty[String, StageStats]

  private[api] def forStage(name: String): StageStats =
    stages.getOrElseUpdate(name, {
      val sc = spark.sparkContext
      new StageStats(
        sc.longAccumulator(s"$name.rowsIn"),
        sc.longAccumulator(s"$name.rowsOut"),
        sc.longAccumulator(s"$name.batches"),
        sc.longAccumulator(s"$name.failures"),
        sc.longAccumulator(s"$name.processNanos"))
    })

  /** Snapshot: stage → (rowsIn, rowsOut, batches, failures, processMillis). */
  def snapshot: Map[String, (Long, Long, Long, Long, Long)] =
    stages.map { case (n, s) =>
      n -> (s.rowsIn.value.longValue, s.rowsOut.value.longValue,
        s.batches.value.longValue, s.failures.value.longValue,
        s.processNanos.value.longValue / 1000000L)
    }.toMap

  def report: String =
    snapshot.toSeq.sortBy(_._1).map { case (n, (in, out, b, f, ms)) =>
      f"$n%-32s in=$in%-8d out=$out%-8d batches=$b%-6d failures=$f%-4d ${ms}ms"
    }.mkString("\n")
}
