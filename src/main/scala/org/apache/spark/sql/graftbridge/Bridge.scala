package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** The one `private[sql]` doorway graft's Catalyst extensions need:
  * wrapping a hand-built [[LogicalPlan]] back into a user-facing
  * [[DataFrame]]. `Dataset.ofRows` is `private[sql]`, so this lives in a
  * subpackage of `org.apache.spark.sql` — the standard pattern Spark
  * extension libraries (Delta, Sedona, Iceberg's runtime) use for the
  * same doorway. Everything else graft's plans touch (`queryExecution`,
  * Catalyst expression/plan classes, `SparkSessionExtensions`) is
  * reachable from ordinary packages.
  */
object Bridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** Spec doorway: what strategies would a session built with these
    * extensions get? (`buildPlannerStrategies` is `private[sql]`.)
    */
  def plannerStrategies(e: org.apache.spark.sql.SparkSessionExtensions,
      spark: org.apache.spark.sql.SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    e.buildPlannerStrategies(spark)

  /** Spec doorway: install the extensions' injected function builders
    * into a live session's registry — the same `registerFunctions` call
    * session construction makes for `.withExtensions(...)` sessions, so
    * specs can exercise the injected SQL surface without building a
    * second SparkContext. (`registerFunctions` is `private[sql]`.)
    */
  def registerInjectedFunctions(e: org.apache.spark.sql.SparkSessionExtensions,
      spark: org.apache.spark.sql.SparkSession): Unit =
    e.registerFunctions(spark.sessionState.functionRegistry)

  /** Spec doorway: block until every queued listener event is delivered
    * (`listenerBus` is `private[spark]`) — monitor specs assert on
    * listener-fed gauges, and the bus posts asynchronously.
    */
  def waitForListeners(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
