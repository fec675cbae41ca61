package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Named serving-queue surface for SERVING mode (reference:
  * pipelines/private/specs.py:512 `ServingQueues` and
  * v1/test_serving.py): online serving wires a pipeline between a source
  * queue clients put requests on and a sink queue they poll for results.
  *
  * Spark-native mapping: an input queue is a driver-enqueued streaming
  * source (`MemoryStream` — the `multiprocessing.Queue` analogue; in
  * production the name becomes a Kafka topic / file-source directory and
  * nothing else changes), an output queue is a named in-memory sink
  * table. A [[ServingHub]] hosts any number of named
  * (input queue → stage chain → output queue) routes over ONE
  * SparkSession — the multi-queue generalization of the reference's
  * single source/sink pair — with each route running as its own
  * StreamingQuery, so per-route state, watermarks, and restarts are
  * isolated while the routes share cluster resources. Backpressure is
  * the streaming runtime's: micro-batches pull from the source at the
  * rate the chain drains (reference: bounded queue `maxsize`).
  */
final class ServingHub(spark: SparkSession) extends AutoCloseable {

  private val routes = mutable.LinkedHashMap.empty[String, StreamingQuery]
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  /** Open a named input queue. Clients `put` rows on it; the pipeline
    * consumes them as an unbounded stream via `queue.stream`.
    */
  def openInput[I: Encoder](name: String): ServingInput[I] =
    new ServingInput[I](name, MemoryStream[I])

  /** Route a served streaming Dataset — a Stage chain compiled over an
    * input queue's stream (see [[ServingPipeline.compile]]) — into the
    * named output queue, starting its StreamingQuery. One route per
    * output queue name.
    */
  def route[O](outputQueue: String, served: Dataset[O]): StreamingQuery = {
    require(served.isStreaming, "route() takes a streaming Dataset — compile the " +
      "stage chain over an input queue's stream")
    require(!routes.contains(outputQueue), s"output queue '$outputQueue' is already routed")
    val q = served.writeStream.format("memory").queryName(outputQueue)
      .outputMode("append").start()
    routes(outputQueue) = q
    q
  }

  /** Poll a named output queue: everything served into it so far. */
  def output(name: String): DataFrame = {
    require(routes.contains(name), s"no route serves output queue '$name'")
    spark.table(name)
  }

  /** Block until every route has drained all requests enqueued so far —
    * the deterministic test/drain barrier (queries keep running after).
    */
  def processAllAvailable(): Unit = routes.valuesIterator.foreach(_.processAllAvailable())

  /** Are all routes still live? (the reference test's `is_alive` check) */
  def isActive: Boolean = routes.nonEmpty && routes.valuesIterator.forall(_.isActive)

  def activeRoutes: Seq[String] = routes.keysIterator.toSeq

  def stop(): Unit = routes.valuesIterator.foreach(_.stop())

  override def close(): Unit = stop()
}

/** A named input queue: `put` enqueues requests (driver-side, like the
  * reference's `input_queue.put`); `stream` is the unbounded Dataset a
  * stage chain compiles over.
  */
final class ServingInput[I] private[streaming] (val name: String, ms: MemoryStream[I]) {
  def put(rows: I*): Unit = ms.addData(rows)
  def stream: Dataset[I] = ms.toDS()
}
