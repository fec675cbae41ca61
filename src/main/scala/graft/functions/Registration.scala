package graft.functions

import java.util.{Collections, WeakHashMap}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Once-per-session guard for temp-function registration.
  *
  * Every operator entry point calls its family's `register(spark)` so a
  * bare `import graft.operators._` user never sees an unresolved
  * `graft_*` function — but `createOrReplaceTempFunction` on an
  * already-registered name logs a `SimpleFunctionRegistry: ... replaced a
  * previously registered function` WARN and re-does registry work on
  * every call. Across a 197-query benchmark session that is hundreds of
  * WARN lines and measurable catalog churn (VERDICT r10 flagged both).
  * This guard makes re-registration a lock-free no-op after the first
  * call per (session, family).
  *
  * Keyed by SparkSession IDENTITY in a WeakHashMap: a stopped session's
  * entry is collectable, and a cloned session (`spark.newSession()`) gets
  * its own registration pass (its SessionState copies the registry at
  * clone time, so functions registered on the parent BEFORE the clone
  * carry over, but registering again is still correct — idempotent
  * replace of an identical builder).
  */
private[graft] object Registration {
  private val done =
    Collections.synchronizedMap(new WeakHashMap[SparkSession, mutable.Set[String]]())

  /** Run `body` exactly once per (session, key); later calls no-op. A
    * FAILED body un-marks the key so the next call retries instead of
    * silently skipping forever (an artifact rejected by quota, a
    * transient FS error). Concurrent callers of the same key may race a
    * failing body into one extra no-op — callers here are driver-side
    * compile/registration paths where that window is acceptable.
    */
  def once(spark: SparkSession, key: String)(body: => Unit): Unit = {
    val keys = done.synchronized {
      var s = done.get(spark)
      if (s == null) { s = mutable.Set.empty[String]; done.put(spark, s) }
      s
    }
    val first = keys.synchronized { keys.add(key) }
    if (first) {
      try body
      catch {
        case t: Throwable =>
          keys.synchronized { keys.remove(key) }
          throw t
      }
    }
  }
}
