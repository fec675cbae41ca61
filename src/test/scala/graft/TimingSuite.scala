package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.{RateEstimator, RateEstimatorDuration, RateLimitChecker, RateLimitedCaller, RateLimiter, Stats}

/** Mirrors the reference timing/stats test cases (utils/test_timing.py,
  * utils/test_stats.py) — with an injected clock so nothing sleeps.
  */
class TimingSuite extends AnyFunSuite {

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol

  // fake wall clock: `now` advances only via explicit bumps or fake sleeps
  private class FakeClock(var now: Double = 1000.0) {
    var slept = 0.0
    val clock: () => Double = () => now
    val sleeper: Double => Unit = s => { slept += s; now += s }
  }

  test("RateLimiter: first call never sleeps, second sleeps to the period") {
    val c = new FakeClock
    val limiter = new RateLimiter(1.0, c.clock, c.sleeper)
    limiter.sleep()
    assert(c.slept == 0.0) // first call only records the time
    c.now += 0.1 // 100ms of "work"
    limiter.sleep()
    assert(approx(c.slept, 0.9)) // sleeps the remaining 0.9s of the 1s period
  }

  test("RateLimiter: a slow caller is never delayed") {
    val c = new FakeClock
    val limiter = new RateLimiter(1.0, c.clock, c.sleeper)
    limiter.sleep()
    c.now += 2.0 // slower than the period
    limiter.sleep()
    assert(c.slept == 0.0)
  }

  test("RateLimitedCaller: executes, skips within the period, executes after it") {
    val c = new FakeClock
    val caller = new RateLimitedCaller(1.0, c.clock)
    assert(caller.maybeDo(true).contains(true))
    assert(caller.maybeDo(true).isEmpty) // too soon: skipped, not queued
    c.now += 1.1
    assert(caller.maybeDo(true).contains(true))
  }

  test("RateLimitedCaller: zero hz never calls") {
    val c = new FakeClock
    val caller = new RateLimitedCaller(0.0, c.clock)
    assert(caller.maybeDo(true).isEmpty)
    assert(caller.maybeDo(true).isEmpty)
  }

  test("RateLimitChecker: consumes the slot unless checkOnly") {
    val c = new FakeClock
    val checker = new RateLimitChecker(1.0, c.clock)
    assert(checker.canCall(checkOnly = true)) // peek: timer not moved
    assert(checker.canCall())                 // consume
    assert(!checker.canCall())
    c.now += 1.0
    assert(checker.canCall())
  }

  test("RateEstimator: (n-1)/span within the window; old events age out") {
    val c = new FakeClock
    val est = new RateEstimator(10.0, c.clock)
    assert(est.getRate() == 0.0) // no events
    est.update(); c.now += 0.5
    est.update(); c.now += 0.5
    est.update()
    assert(approx(est.getRate(), 2.0)) // 3 events over 1s
    c.now += 20.0 // everything falls out of the window
    assert(est.getRate() == 0.0)
  }

  test("RateEstimatorDuration: rate is inverse mean duration") {
    val est = new RateEstimatorDuration(10.0)
    val t0 = 1000.0
    est.update(0.5, t0)
    assert(approx(est.getRate(t0 + 0.05), 1.0 / 0.5))
    est.update(0.7, t0 + 0.1)
    assert(approx(est.getRate(t0 + 0.2), 1.0 / 0.6))
    assert(est.maybeGetRate(t0 + 0.2).exists(approx(_, 1.0 / 0.6)))
  }

  test("RateEstimatorDuration: minNumEvents keeps old events alive") {
    val est = new RateEstimatorDuration(1.0, minNumEvents = Some(2))
    val t0 = 1000.0
    est.update(0.5, t0)
    assert(approx(est.getRate(t0 + 0.1), 2.0))
    est.update(0.7, t0 + 2) // first event now older than the 1s window
    assert(approx(est.getRate(t0 + 2.1), 1.0 / 0.6)) // kept: min 2 events
    est.update(0.9, t0 + 4)
    // now 3 events > min 2 → the too-old first one (0.5) is dropped
    assert(approx(est.getRate(t0 + 4.1), 1.0 / 0.8))
  }

  test("RateEstimatorDuration: window still prunes above minNumEvents") {
    val est = new RateEstimatorDuration(1.0, minNumEvents = Some(3))
    val t0 = 1000.0
    est.update(0.2, t0)
    est.update(0.3, t0 + 0.5)
    est.update(0.4, t0 + 1.0)
    est.update(0.5, t0 + 1.5) // first event now >1s old, 4 > min 3 → dropped
    assert(approx(est.getRate(t0 + 1.6), 1.0 / 0.4))
  }

  test("RateEstimatorDuration: empty / single / zero-duration edge cases") {
    val empty = new RateEstimatorDuration(10.0)
    assert(empty.getRate(1000.0) == 0.0)
    assert(empty.maybeGetRate(1000.0).isEmpty)

    val single = new RateEstimatorDuration(10.0)
    single.update(0.5, 1000.0)
    assert(approx(single.getRate(1000.1), 2.0))

    val zero = new RateEstimatorDuration(10.0)
    zero.update(0.0, 1000.0)
    assert(zero.getRate(1000.1) == 0.0)
    assert(zero.maybeGetRate(1000.1).isEmpty)
    zero.update(0.5, 1000.3)
    assert(approx(zero.getRate(1000.4), 1.0 / (0.5 / 2))) // mean of (0, 0.5)

    val keep1 = new RateEstimatorDuration(1.0, minNumEvents = Some(1))
    keep1.update(0.5, 1000.0)
    assert(approx(keep1.getRate(1005.0), 2.0)) // kept far past the window

    intercept[IllegalArgumentException] {
      new RateEstimatorDuration(10.0, minNumEvents = Some(0))
    }
  }

  // ------------------------------------------------------------- binomCdf

  test("binomCdf: standard cases match the reference values") {
    assert(approx(Stats.binomCdf(5, 10, 0.5), 0.623046875, 1e-5))
    assert(approx(Stats.binomCdf(15, 20, 0.7), 0.7624949477, 1e-5))
    assert(approx(Stats.binomCdf(2, 8, 0.2), 0.79691776, 1e-5))
  }

  test("binomCdf: k edge cases") {
    assert(Stats.binomCdf(-1, 10, 0.5) == 0.0)
    assert(approx(Stats.binomCdf(0, 10, 0.5), math.pow(0.5, 10)))
    assert(Stats.binomCdf(10, 10, 0.5) == 1.0)
    assert(Stats.binomCdf(11, 10, 0.5) == 1.0)
    assert(approx(Stats.binomCdf(9, 10, 0.5), 1.0 - math.pow(0.5, 10)))
  }

  test("binomCdf: p edge cases") {
    assert(Stats.binomCdf(0, 10, 0) == 1.0)
    assert(Stats.binomCdf(1, 10, 0) == 1.0)
    assert(Stats.binomCdf(-1, 10, 0) == 0.0)
    assert(Stats.binomCdf(9, 10, 1) == 0.0)
    assert(Stats.binomCdf(10, 10, 1) == 1.0)
    assert(Stats.binomCdf(11, 10, 1) == 1.0)
  }

  test("binomCdf: float k floors") {
    assert(Stats.binomCdf(5.3, 10, 0.5) == Stats.binomCdf(5, 10, 0.5))
    assert(Stats.binomCdf(5.9, 10, 0.5) == Stats.binomCdf(5, 10, 0.5))
    assert(Stats.binomCdf(0.1, 10, 0.5) == Stats.binomCdf(0, 10, 0.5))
    assert(Stats.binomCdf(-0.1, 10, 0.5) == 0.0)
  }

  test("binomCdf: invalid inputs throw") {
    intercept[IllegalArgumentException] { Stats.binomCdf(5, -1, 0.5) }
    intercept[IllegalArgumentException] { Stats.binomCdf(5, 10, -0.1) }
    intercept[IllegalArgumentException] { Stats.binomCdf(5, 10, 1.1) }
  }

  test("binomCdf: larger n and zero trials") {
    assert(approx(Stats.binomCdf(25, 50, 0.5), 0.5561446, 1e-4))
    assert(approx(Stats.binomCdf(10, 30, 0.2), 0.9744794, 1e-4))
    assert(Stats.binomCdf(0, 0, 0.5) == 1.0)
    assert(Stats.binomCdf(-1, 0, 0.5) == 0.0)
    assert(Stats.binomCdf(1, 0, 0.5) == 1.0)
  }
}
