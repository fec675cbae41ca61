package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the text-analysis and dedup
  * operators. Everything here is pure `org.apache.spark.sql.functions`
  * composition (codegen'd by Catalyst) — no UDFs — and every function has
  * an exact DuckDB-SQL equivalent so results are oracle-checkable.
  */
object TextFunctions {

  /** Modulus for all polynomial hashing (1e9+7, prime). Kept < 2^31 so
    * `acc * 31 + c` never overflows a signed 64-bit long.
    */
  val P = 1000000007L

  /** Whitespace tokenization that keeps empty tokens — same semantics as
    * DuckDB `string_split(text, ' ')` (and Scala `split(" ", -1)`).
    */
  def tokens(text: Column): Column = split(text, " ", -1)

  /** THE exact-dup content fingerprint (d01 semantics): md5 of the
    * lowercased, trimmed text — 16 bytes on the wire, never the text.
    * Single definition shared by every consumer (exact dedup, bloom
    * gate, corpus report) so the normalization can never drift between
    * them.
    */
  def contentFingerprint(text: Column): Column =
    md5(lower(trim(text)).cast("binary"))

  /** Polynomial rolling hash over characters: fold h = (h*31 + ascii(c)) mod P.
    * DuckDB equivalent:
    * `list_reduce(list_prepend(0, list_transform(range(1, length(s)+1),
    *    i -> ascii(s[i]))), (acc, c) -> (acc*31 + c) % 1000000007)`
    * ASCII inputs only (the test corpus is ASCII); see PolyHash for the
    * codegen'd fast path with identical semantics.
    */
  def polyHashSlow(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, ch) => (acc * lit(31L) + ascii(ch)) % lit(P))

  /** Word n-gram shingles as strings ("w1 w2 w3"). Empty array when the
    * document has fewer than n tokens.
    */
  def shingles(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (1 to n).map(k => element_at(toks, i + k)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Count of tokens that appear in `words`. */
  def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => words.map(w => t === w).reduce(_ || _))).cast("long")
}
