package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

import graft.api.{ExecutionMode, Pipeline, PipelineConfig, PipelineMonitor}

/** SERVING-mode execution (reference: specs.py:65, ContinuousInterface in
  * ray_utils/continuous_stage.py:69): stages stay up indefinitely and
  * process requests as they arrive.
  *
  * Spark-native mapping: the SAME compiled `Stage` chain (graft.api.Pipeline)
  * applied to a Structured Streaming `Dataset`. The reference's source queue
  * is the stream source (Kafka/files/memory), its sink queue the stream sink;
  * micro-batches are the continuous-batching analogue, and worker liveness /
  * restart is the streaming runtime's job, not user code.
  */
object ServingPipeline {

  /** Compile a stage chain over a streaming Dataset. The returned Dataset
    * is unbounded; attach a sink via [[start]] or `writeStream`.
    */
  def compile[I](stream: Dataset[I], config: PipelineConfig = PipelineConfig(ExecutionMode.Serving),
      monitor: Option[PipelineMonitor] = None): Pipeline[I] = {
    require(stream.isStreaming, "ServingPipeline requires a streaming Dataset")
    Pipeline.from(stream, config.copy(mode = ExecutionMode.Serving), monitor)
  }

  /** Convenience sink: run the served output into an in-memory table (the
    * "sink queue"), returning the query handle.
    */
  def start[O](out: Dataset[O], queryName: String): StreamingQuery =
    out.writeStream.format("memory").queryName(queryName)
      .outputMode("append").start()

  def startWriter[O](out: Dataset[O]): DataStreamWriter[O] = out.writeStream
}

/** Event-time streaming analytics over the events schema (E1): watermarked
  * tumbling-window aggregation — the streaming twin of q10_events_hourly.
  * At scale, state is bounded by the watermark: late data beyond `delay`
  * is dropped and window state evicted.
  */
object EventStreams {

  def hourlyCounts(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("hour"), col("event_type"), col("n_events"))

  /** File/rate-source helper so the same query runs against a directory of
    * parquet events as an unbounded stream.
    */
  def fromParquetDir(spark: SparkSession, dir: String, schemaFrom: DataFrame): DataFrame =
    spark.readStream.schema(schemaFrom.schema).parquet(dir)
}
