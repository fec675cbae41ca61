package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.sqlFoldSum

/** Random-hyperplane LSH banding for embedding near-dup candidate
  * generation (d05's scale path — the equi-join analogue of d03's minhash
  * banding). Two vectors collide in band j iff all [[Bits]] plane signs of
  * that band agree; with p = 1 - angle/pi per plane, pair recall is
  * 1 - (1 - p^Bits)^Bands — tuned here for true near-dups (cos >= 0.9:
  * recall 0.9999+); at loose thresholds the operator's contract is
  * "band-colliding pairs", exactly like d03/d04's banded semantics.
  *
  * The plane table is generated from a fixed LCG (public-domain constants)
  * with small-integer components, exactly representable as doubles — the
  * DuckDB oracle embeds the same literals, so bucket assignment is
  * bit-identical on both engines (see graft-oracle-parity rules).
  */
object EmbeddingLsh {

  // Geometry tuned for SELECTIVITY first (round-3 scale probe: at 10×
  // near-dup density, 6-bit buckets produced 66M distinct candidates for
  // 193k true pairs — verification swamped everything). 2^10 bucket ids
  // per band keeps clustered corpora spread thin; 32 bands restore
  // recall: at cos 0.9, p = 0.856 per plane → 1-(1-p^10)^32 ≈ 0.9995.
  val Bits = 10    // planes per band -> 2^10 bucket ids per band
  val Bands = 32   // OR across bands
  val Dim = 64     // plane dimensionality; must cover the vector dim

  /** Bands*Bits deterministic hyperplanes, components in [-5, 5]. */
  val planes: IndexedSeq[IndexedSeq[Int]] = {
    val it = Iterator.iterate(777L)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)
    IndexedSeq.fill(Bands * Bits)(IndexedSeq.fill(Dim)(Math.floorMod(it.next(), 11L).toInt - 5))
  }

  /** Spark column: array<long> of Bands keys, key = (band << 32) | signBits. */
  def bandKeys(vec: Column): Column = {
    val planesLit = array(planes.map(p => array(p.map(v => lit(v.toDouble)): _*)): _*)
    call_function("graft_hyperplane_bands", vec, lit(Bits), planesLit)
  }

  /** DuckDB mirror of [[bandKeys]] over embedding column `e` — the same
    * plane literals, the same sequential-fold dot products.
    */
  def sqlBandKeys(e: String): String = {
    val keys = (0 until Bands).map { j =>
      val bits = (0 until Bits).map { k =>
        val p = planes(j * Bits + k)
        val planeLit = s"[${p.map(v => s"CAST($v AS DOUBLE)").mkString(", ")}]"
        val dot = sqlFoldSum(
          s"list_transform(range(1, len($e) + 1), i -> CAST($e[i] AS DOUBLE) * ($planeLit)[i])")
        s"CASE WHEN $dot > 0 THEN ${1L << k} ELSE 0 END"
      }
      s"(CAST(${j.toLong << 32} AS BIGINT) + ${bits.mkString(" + ")})"
    }
    s"[${keys.mkString(", ")}]"
  }
}
