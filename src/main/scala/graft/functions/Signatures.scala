package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash / SimHash signature machinery for scalable dedup.
  *
  * Both the Spark `Column` builders and the DuckDB SQL fragments are
  * generated from the SAME deterministic coefficient tables, so the oracle
  * sees literally the same hash family. All hashing is polynomial mod
  * P = 1e9+7 (< 2^31, so `a*h + b` with a,h < P stays within a signed 64-bit
  * long).
  *
  * Scale design (100 TB): signatures are per-row map-side work; candidate
  * generation is an equi-join on (band-key) / (chunk-key) — never an O(n²)
  * cross product. See SURVEY.md §4.
  */
object Signatures {
  val P: Long = TextFunctions.P // 1e9+7
  val B: Long = 1000003L        // token-hash combiner base
  val B2: Long = 1000033L       // independent second base (span-key pairs)

  /** THE order-shuffling multiplier (Knuth's 2^32/φ): every scrambled-hash
    * site — sampling buckets, k-means/PQ seeds, classifier/DSIR feature
    * buckets — multiplies by this constant mod [[P]] so the formula stays
    * bit-identical across operators AND across the SQL oracles that embed
    * it as a literal. Change it nowhere or everywhere.
    */
  val Scramble: Long = 2654435761L

  val NumMinhash = 32
  val BandRows = 4  // 8 bands x 4 rows
  val NumBands: Int = NumMinhash / BandRows

  val SimBits = 60
  val SimChunks = 4 // 15-bit chunks -> pigeonhole guarantee for hamming <= 3

  /** Deterministic 64-bit LCG (public-domain constants) → coefficients in
    * [1, P-1]. Seeds are fixed so Spark and DuckDB share the exact family.
    */
  private def coeffs(seed: Long, n: Int): IndexedSeq[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L)
      .drop(1).map(x => Math.floorMod(x, P - 1) + 1).take(n).toIndexedSeq

  val minA: IndexedSeq[Long] = coeffs(42L, NumMinhash)
  val minB: IndexedSeq[Long] = coeffs(43L, NumMinhash)
  val simA: IndexedSeq[Long] = coeffs(7L, SimBits)
  val simB: IndexedSeq[Long] = coeffs(8L, SimBits)

  // ---------------------------------------------------------------- Spark

  /** Per-token polynomial hashes (codegen'd PolyHash inside the lambda). */
  def tokenHashes(toks: Column): Column =
    transform(toks, t => GraftExpressions.polyHash(t))

  /** Distinct 3-gram shingle hashes combined from token hashes:
    * ((h1*B + h2) mod P * B + h3) mod P.
    */
  def shingleHashes(th: Column): Column =
    when(size(th) >= 3,
      array_distinct(transform(sequence(lit(0), size(th) - 3), i =>
        ((element_at(th, i + 1) * B + element_at(th, i + 2)) % P * B
          + element_at(th, i + 3)) % P)))
      .otherwise(array().cast("array<bigint>"))

  /** 32-slot MinHash signature over a shingle-hash array. */
  def minhashSig(sh: Column): Column =
    array((0 until NumMinhash).map(k =>
      array_min(transform(sh, h => (h * minA(k) + minB(k)) % P))): _*)

  /** Positioned n-gram span keys over token-hash column `th`: element at
    * 0-based index s is a struct of TWO independent polynomial folds of
    * th(s..s+n-1) (combiner bases [[B]] and [[B2]], same modulus [[P]]).
    * One fold mod 1e9+7 collides at corpus scale (birthday bound ≈ √P
    * distinct grams ≈ 30k); the PAIR has ~2^60 effective space, so span
    * join/shuffle keys stay 16 bytes with negligible collision odds at
    * 100 TB — the reason the scrub never shuffles gram STRINGS. Empty
    * array when the document has fewer than n tokens.
    */
  def spanKeys(th: Column, n: Int): Column = {
    require(n >= 2, "span length must be >= 2")
    def fold(base: Long)(s: Column): Column =
      (1 until n).foldLeft(element_at(th, s + 1)) { (acc, k) =>
        (acc * base + element_at(th, s + k + 1)) % P
      }
    when(size(th) >= n,
      transform(sequence(lit(0), size(th) - n), s =>
        struct(fold(B)(s).as("h1"), fold(B2)(s).as("h2"))))
      .otherwise(array().cast("array<struct<h1:bigint,h2:bigint>>"))
  }

  /** LSH band keys: one string per band, prefixed with the band index so a
    * single equi-join column suffices.
    */
  def bandKeys(sig: Column): Column =
    array((0 until NumBands).map(j =>
      concat_ws("_", lit(j.toString) +:
        (0 until BandRows).map(r => element_at(sig, j * BandRows + r + 1)): _*)): _*)

  /** 60-bit SimHash over token hashes (term-frequency weighted: repeated
    * tokens vote repeatedly). Bit b is the sign of the sum of per-token
    * pseudo-random ±1 votes derived from hash family (simA(b), simB(b)).
    */
  def simhash(th: Column): Column =
    (0 until SimBits).map { b =>
      val vote = aggregate(th, lit(0L), (acc, h) =>
        acc + when((h * simA(b) + simB(b)) % P * 2 < P, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Pigeonhole chunk keys: SimChunks strings "<k>_<15-bit chunk>"; two
    * signatures within Hamming distance SimChunks-1 share >= 1 chunk.
    */
  def simChunkKeys(sim: Column): Column =
    array((0 until SimChunks).map(k =>
      concat_ws("_", lit(k.toString),
        shiftright(sim, k * (SimBits / SimChunks)) % (1L << (SimBits / SimChunks)))): _*)

  // --------------------------------------------------------------- DuckDB

  /** token list from `text` */
  val sqlToks = "string_split(text, ' ')"

  /** polynomial hash of a string column/expression `c` (mirror of
    * GraftExpressions.polyHash / the t04 fingerprint fold)
    */
  def sqlPolyHashStr(c: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       | list_transform(range(1, length($c)+1), i -> CAST(ascii($c[i]) AS BIGINT))),
       | (acc, x) -> (acc*31 + x) % $P)""".stripMargin.replace("\n", "")

  /** per-token polynomial hashes (mirror of tokenHashes) over column `toks` */
  def sqlTokenHashes(toks: String): String =
    s"""list_transform($toks, t -> list_reduce(list_prepend(CAST(0 AS BIGINT),
       | list_transform(range(1, length(t)+1), i -> CAST(ascii(t[i]) AS BIGINT))),
       | (acc, c) -> (acc*31 + c) % $P))""".stripMargin.replace("\n", "")

  /** distinct shingle hashes over token-hash column `th` */
  def sqlShingleHashes(th: String): String =
    s"""CASE WHEN len($th) >= 3 THEN list_distinct(list_transform(
       | range(1, len($th)-1),
       | i -> (($th[i]*$B + $th[i+1]) % $P * $B + $th[i+2]) % $P))
       | ELSE CAST([] AS BIGINT[]) END""".stripMargin.replace("\n", "")

  /** DuckDB mirror of one [[spanKeys]] fold at 0-based start expression `s`
    * over token-hash list column `th` (1-based list indexing).
    */
  def sqlSpanFold(th: String, s: String, n: Int, base: Long): String =
    (1 until n).foldLeft(s"$th[$s+1]") { (acc, k) =>
      s"(($acc)*$base + $th[$s+${k + 1}]) % $P"
    }

  /** list of band-key strings over shingle-hash column `sh` */
  def sqlBandKeys(sh: String): String = {
    def mh(k: Int) = s"list_min(list_transform($sh, h -> (h*${minA(k)} + ${minB(k)}) % $P))"
    val bands = (0 until NumBands).map { j =>
      val parts = (0 until BandRows).map(r => mh(j * BandRows + r))
      s"concat_ws('_', '$j', ${parts.mkString(", ")})"
    }
    s"[${bands.mkString(", ")}]"
  }

  /** 60-bit simhash over token-hash column `th` (mirror of simhash) */
  def sqlSimhash(th: String): String = {
    val bits = (0 until SimBits).map { b =>
      s"""CASE WHEN list_sum(list_transform($th, h -> CASE WHEN
         | (h*${simA(b)} + ${simB(b)}) % $P * 2 < $P THEN 1 ELSE -1 END)) > 0
         | THEN ${1L << b} ELSE 0 END""".stripMargin.replace("\n", "")
    }
    s"CAST(${bits.mkString(" + ")} AS BIGINT)"
  }

  /** list of chunk-key strings over simhash column `sim` */
  def sqlSimChunkKeys(sim: String): String = {
    val w = SimBits / SimChunks
    val parts = (0 until SimChunks).map(k =>
      s"concat_ws('_', '$k', ($sim >> ${k * w}) % ${1L << w})")
    s"[${parts.mkString(", ")}]"
  }
}
