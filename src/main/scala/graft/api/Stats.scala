package graft.api

/** Small numeric helpers (reference: utils/stats.py). */
object Stats {

  /** Binomial CDF P(X <= floor(k)) for X ~ B(n, p), computed from scratch
    * (reference: stats.py:21 binom_cdf — same edge-case contract: k < 0
    * → 0, k >= n → 1, p = 0 → 1, p = 1 → 0 for k < n; float k floored).
    */
  def binomCdf(k: Double, n: Int, p: Double): Double = {
    require(n >= 0, "'n' must be a non-negative integer")
    require(p >= 0.0 && p <= 1.0, "Probability 'p' must be between 0 and 1")
    val kf = math.floor(k)
    if (kf < 0) return 0.0
    if (kf >= n) return 1.0
    if (p == 0.0) return 1.0
    if (p == 1.0) return 0.0
    val kk = kf.toInt
    var cumulative = 0.0
    var i = 0
    while (i <= kk) {
      cumulative += comb(n, i) * math.pow(p, i) * math.pow(1 - p, n - i)
      i += 1
    }
    math.max(0.0, math.min(1.0, cumulative))
  }

  /** C(n, i) as a double (exact for the magnitudes a CDF sum meets before
    * the p^i terms underflow; iterative product avoids factorials).
    */
  private def comb(n: Int, i0: Int): Double = {
    val i = if (i0 > n / 2) n - i0 else i0
    var res = 1.0
    var j = 0
    while (j < i) {
      res = res * (n - j) / (j + 1)
      j += 1
    }
    res
  }
}
