package graft.api

import scala.collection.mutable

/** Rate limiting, rate-limited calling, and rolling rate estimation
  * (reference: utils/timing.py:35–204). Stages use these inside `process`
  * to pace calls to external services (a model endpoint, an object store)
  * — per-worker pacing composes across the cluster exactly like the
  * reference's per-actor pacing.
  *
  * Time is injectable (`clock` returns seconds, `sleeper` takes seconds)
  * so specs run instantly; defaults use the wall clock.
  */
object Timing {
  val systemClock: () => Double = () => System.nanoTime() / 1e9
  val systemSleep: Double => Unit = s => Thread.sleep(math.max(0L, (s * 1000).toLong))
}

/** Enforces a maximum call frequency: `sleep()` blocks just long enough
  * that successive calls run at most `freqHz` per second (reference:
  * timing.py:35 RateLimiter — first call never sleeps).
  */
final class RateLimiter(
    freqHz: Double,
    clock: () => Double = Timing.systemClock,
    sleeper: Double => Unit = Timing.systemSleep) {
  // the reference raises ZeroDivisionError on freqHz=0; 1.0/0 in Scala is
  // Infinity, which would silently sleep(Long.MaxValue) — fail fast instead
  require(freqHz > 0, s"RateLimiter frequency must be positive, got $freqHz")
  private var lastTime = 0.0

  def sleep(): Unit = {
    if (lastTime == 0.0) { lastTime = clock(); return }
    val toSleep = lastTime + 1.0 / freqHz - clock()
    if (toSleep > 0) sleeper(toSleep)
    lastTime = clock()
  }
}

/** Invokes a function at no more than `freqHz`; calls arriving early are
  * skipped, not queued (reference: timing.py:74 RateLimitedCaller —
  * `freqHz = 0` never calls).
  */
final class RateLimitedCaller(
    freqHz: Double,
    clock: () => Double = Timing.systemClock) {
  private var nextTime = 0.0

  def maybeDo[T](f: => T): Option[T] = {
    val now = clock()
    if (freqHz > 0 && now >= nextTime) {
      nextTime = now + 1.0 / freqHz
      Some(f)
    } else None
  }
}

/** Pollable twin of [[RateLimitedCaller]]: `canCall()` returns whether the
  * rate budget allows a call now, and consumes the slot unless
  * `checkOnly` (reference: timing.py:118 RateLimitChecker).
  */
final class RateLimitChecker(
    freqHz: Double,
    clock: () => Double = Timing.systemClock) {
  require(freqHz > 0, s"RateLimitChecker frequency must be positive, got $freqHz")
  private var nextTime = 0.0

  def canCall(checkOnly: Boolean = false): Boolean = {
    val now = clock()
    if (now >= nextTime) {
      if (!checkOnly) nextTime = now + 1.0 / freqHz
      true
    } else false
  }
}

/** Rolling event-rate estimate over the trailing `windowSeconds`
  * (reference: timing.py:158 RateEstimator): rate = (n-1) / (last-first)
  * over in-window event timestamps; 0 with fewer than 2 events; n if all
  * events share one timestamp.
  */
final class RateEstimator(
    windowSeconds: Double,
    clock: () => Double = Timing.systemClock) {
  private val timestamps = mutable.ArrayDeque.empty[Double]

  private def removeOld(now: Double): Unit =
    while (timestamps.nonEmpty && now - timestamps.head > windowSeconds)
      timestamps.removeHead()

  def update(): Unit = {
    val now = clock()
    timestamps.append(now)
    removeOld(now)
  }

  def getRate(): Double = {
    removeOld(clock())
    if (timestamps.length < 2) return 0.0
    val span = timestamps.last - timestamps.head
    if (span == 0) timestamps.length.toDouble
    else (timestamps.length - 1) / span
  }
}

/** Rate from average event DURATION over a trailing window (reference:
  * timing.py:204 RateEstimatorDuration): rate = 1 / mean(duration) over
  * retained events. `minNumEvents` (>= 1 when set) keeps at least that
  * many events even past the window, so infrequent events still yield a
  * rate. Explicit `currentTime` overloads mirror the reference's
  * testability seam.
  */
final class RateEstimatorDuration(
    windowSeconds: Double,
    minNumEvents: Option[Int] = None,
    clock: () => Double = Timing.systemClock) {
  require(minNumEvents.forall(_ >= 1), "minNumEvents must be at least 1 if provided")
  private val events = mutable.ArrayDeque.empty[(Double, Double)] // (ts, duration)

  private def removeOld(now: Double): Unit = {
    var go = true
    while (go && events.nonEmpty) {
      val tooOld = now - events.head._1 > windowSeconds
      val removableByCount = minNumEvents.forall(events.length > _)
      if (tooOld && removableByCount) events.removeHead() else go = false
    }
  }

  def update(duration: Double): Unit = update(duration, clock())
  def update(duration: Double, currentTime: Double): Unit = {
    events.append((currentTime, duration))
    removeOld(currentTime)
  }

  def getRate(): Double = getRate(clock())
  def getRate(currentTime: Double): Double =
    maybeGetRate(currentTime).getOrElse(0.0)

  def maybeGetRate(): Option[Double] = maybeGetRate(clock())
  def maybeGetRate(currentTime: Double): Option[Double] = {
    removeOld(currentTime)
    if (events.isEmpty) return None
    val mean = events.iterator.map(_._2).sum / events.length
    if (mean > 0) Some(1.0 / mean) else None
  }
}
