package graft.api

import scala.util.control.NonFatal

/** Batching/grouping helpers (reference: utils/grouping.py) — the same
  * shapes stages use when re-batching inside `process`.
  */
object Grouping {

  /** Split into chunks of at most `chunkSize`; `dropIncompleteChunk`
    * discards a short tail (reference: split_by_chunk_size).
    */
  def splitByChunkSize[T](xs: Seq[T], chunkSize: Int,
      dropIncompleteChunk: Boolean = false): Seq[Seq[T]] = {
    require(chunkSize > 0, "chunkSize must be positive")
    val chunks = xs.grouped(chunkSize).toSeq
    if (dropIncompleteChunk && chunks.nonEmpty && chunks.last.length < chunkSize)
      chunks.init
    else chunks
  }

  /** Split into `n` chunks with sizes differing by at most one. Mirrors
    * the reference exactly (split_into_n_chunks): when the input has no
    * more than `n` elements, each element becomes its own chunk — the
    * reference never yields empty chunks.
    */
  def splitIntoNChunks[T](xs: Seq[T], n: Int): Seq[Seq[T]] = {
    require(n > 0, "n must be positive")
    if (xs.length <= n) return xs.map(Seq(_))
    val base = xs.length / n
    val extra = xs.length % n
    val out = Seq.newBuilder[Seq[T]]
    var i = 0
    var k = 0
    while (k < n) {
      val size = base + (if (k < extra) 1 else 0)
      out += xs.slice(i, i + size)
      i += size
      k += 1
    }
    out.result()
  }

  /** Adjacent pairs (reference: pairwise). */
  def pairwise[T](xs: Seq[T]): Seq[(T, T)] =
    if (xs.length < 2) Seq.empty else xs.zip(xs.tail)

  /** Zip two maps over their (required-identical) key sets (reference:
    * dict_zip).
    */
  def dictZip[K, V1, V2](m1: Map[K, V1], m2: Map[K, V2]): Map[K, (V1, V2)] = {
    require(m1.keySet == m2.keySet,
      s"key sets differ: ${(m1.keySet diff m2.keySet) ++ (m2.keySet diff m1.keySet)}")
    m1.map { case (k, v1) => k -> (v1, m2(k)) }
  }
}

/** Epsilon-tolerant float comparisons (reference: utils/approx.py) — the
  * scheduler-side helpers stages reuse for resource math.
  */
object Approx {
  val Epsilon = 1e-6

  def floatEq(a: Double, b: Double, epsilon: Double = Epsilon): Boolean =
    math.abs(a - b) < epsilon
  def floatGt(a: Double, b: Double, epsilon: Double = Epsilon): Boolean =
    (a - b) > epsilon
  def floatLt(a: Double, b: Double, epsilon: Double = Epsilon): Boolean =
    (b - a) > epsilon
  def floatGte(a: Double, b: Double, epsilon: Double = Epsilon): Boolean =
    !floatLt(a, b, epsilon)
  def floatLte(a: Double, b: Double, epsilon: Double = Epsilon): Boolean =
    !floatGt(a, b, epsilon)
  def isAlmostWhole(x: Double, epsilon: Double = Epsilon): Boolean =
    math.abs(x - math.round(x)) < epsilon
}

/** Bounded retry with optional backoff and an exception filter (reference:
  * utils/retry.py do_with_retries, which retries only listed exception
  * types) — the same policy the pipeline applies around `Stage.process`
  * (`numRunAttempts`).
  */
object Retry {
  def withRetries[A](attempts: Int, backoffMillis: Long = 0,
      onFailure: Throwable => Unit = _ => (),
      retryOn: Throwable => Boolean = _ => true)(body: => A): A = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < math.max(attempts, 1)) {
      try return body
      catch {
        // NonFatal only: retrying after an OutOfMemoryError or a
        // task-kill interrupt would mask fatal JVM state / fight
        // cancellation — those propagate immediately.
        case NonFatal(e) =>
          last = e
          onFailure(e)
          if (!retryOn(e)) throw e // unlisted exceptions propagate at once
          attempt += 1
          if (backoffMillis > 0 && attempt < attempts)
            Thread.sleep(backoffMillis * attempt)
      }
    }
    throw last
  }
}
