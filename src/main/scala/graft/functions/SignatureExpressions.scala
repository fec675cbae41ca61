package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native twins of the [[Signatures]] HOF builders.
  *
  * Why these exist: Catalyst higher-order functions (`transform`/
  * `aggregate`) are CodegenFallback — every lambda element is interpreted —
  * and composing them by expression inlining re-evaluates the child chain
  * per element reference (e.g. `element_at(tokenHashes(...), i)` inside the
  * shingle lambda recomputes ALL token hashes for every shingle: a
  * quadratic blowup measured at ~1 ms/row). Each expression below computes
  * the whole signature step in a single compiled pass over the row.
  *
  * Semantics are IDENTICAL to the HOF versions (same constants, same fold
  * order — spec-tested equal), so the DuckDB oracle mirrors are unchanged.
  * They evaluate via compiled `eval` (CodegenFallback): the surrounding
  * operators stay in whole-stage codegen and the per-row work here is a
  * primitive loop, which is what matters at 100 TB.
  */
object SignatureExpressions {
  import Signatures._

  private[graft] def polyHash(s: UTF8String): Long = polyHashString(s.toString)

  /** The shared codepoint fold. NOTE an unpaired surrogate can only reach
    * this via a raw JVM String (Spark's UTF8String encode already replaces
    * it with '?'): the guard advances past a surrogate PAIR only when the
    * low half is really there — an unpaired high surrogate hashes alone
    * and must not swallow the following char.
    */
  private[graft] def polyHashString(str: String): Long = {
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = if (Character.isHighSurrogate(str.charAt(i)) && i + 1 < str.length &&
          Character.isLowSurrogate(str.charAt(i + 1))) {
        val v = str.codePointAt(i); i += 1; v
      } else str.charAt(i).toInt
      h = (h * 31L + cp) % P
      i += 1
    }
    h
  }

  private def tokenHashArray(toks: ArrayData): Array[Long] = {
    val n = toks.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = if (toks.isNullAt(i)) 0L else polyHash(toks.getUTF8String(i))
      i += 1
    }
    out
  }

  private def shingleHashArray(th: Array[Long]): Array[Long] = {
    if (th.length < 3) return Array.emptyLongArray
    val seen = new mutable.LinkedHashSet[Long]
    var i = 0
    while (i + 2 < th.length) {
      seen.add(((th(i) * B + th(i + 1)) % P * B + th(i + 2)) % P)
      i += 1
    }
    seen.toArray
  }

  /** array<string> tokens → array<long> distinct 3-gram shingle hashes. */
  case class ShingleHash(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_shingle_hash"
    protected override def nullSafeEval(input: Any): Any =
      new GenericArrayData(shingleHashArray(tokenHashArray(input.asInstanceOf[ArrayData])))
    override protected def withNewChildInternal(c: Expression): ShingleHash = copy(child = c)
  }

  /** array<long> shingle hashes → array<string> of NumBands LSH band keys
    * ("<band>_<m0>_..._<m3>"); all 32 minhashes computed in one pass.
    * Null for empty input (callers filter empties, like the HOF path).
    */
  case class MinhashBandKeys(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    // empty input -> null result even when the child is non-nullable
    override def nullable: Boolean = true
    override def prettyName: String = "graft_minhash_bands"
    protected override def nullSafeEval(input: Any): Any = {
      val sh = input.asInstanceOf[ArrayData]
      val n = sh.numElements()
      if (n == 0) return null
      val mins = Array.fill(NumMinhash)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val h = sh.getLong(i)
        var k = 0
        while (k < NumMinhash) {
          val v = (h * minA(k) + minB(k)) % P
          if (v < mins(k)) mins(k) = v
          k += 1
        }
        i += 1
      }
      val keys = new Array[AnyRef](NumBands)
      var j = 0
      while (j < NumBands) {
        val sb = new java.lang.StringBuilder
        sb.append(j)
        var r = 0
        while (r < BandRows) { sb.append('_').append(mins(j * BandRows + r)); r += 1 }
        keys(j) = UTF8String.fromString(sb.toString)
        j += 1
      }
      new GenericArrayData(keys)
    }
    override protected def withNewChildInternal(c: Expression): MinhashBandKeys = copy(child = c)
  }

  /** array<string> tokens → 60-bit SimHash (term-frequency weighted). */
  case class Simhash(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash"
    protected override def nullSafeEval(input: Any): Any = {
      val th = tokenHashArray(input.asInstanceOf[ArrayData])
      val votes = new Array[Long](SimBits)
      var i = 0
      while (i < th.length) {
        val h = th(i)
        var b = 0
        while (b < SimBits) {
          if ((h * simA(b) + simB(b)) % P * 2 < P) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        i += 1
      }
      var sim = 0L
      var b = 0
      while (b < SimBits) { if (votes(b) > 0) sim |= (1L << b); b += 1 }
      sim
    }
    override protected def withNewChildInternal(c: Expression): Simhash = copy(child = c)
  }

  /** array<string> tokens → count of DISTINCT 3-gram STRING shingles (t05's
    * exact string semantics — no hashing, so no collision risk vs the
    * oracle's list_distinct of joined strings).
    */
  case class DistinctShingleCount(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_shingle_count"
    protected override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val n = toks.numElements()
      if (n < 3) return 0L
      def tok(i: Int): String =
        if (toks.isNullAt(i)) "" else toks.getUTF8String(i).toString
      val seen = new mutable.HashSet[String]
      var i = 0
      while (i + 2 < n) {
        seen.add(tok(i) + " " + tok(i + 1) + " " + tok(i + 2))
        i += 1
      }
      seen.size.toLong
    }
    override protected def withNewChildInternal(c: Expression): DistinctShingleCount = copy(child = c)
  }

  def register(spark: SparkSession): Unit =
    Registration.once(spark, "graft-signatures") {
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction("graft_shingle_hash",
        { es: Seq[Expression] => ShingleHash(es.head) }, "built-in")
      reg.createOrReplaceTempFunction("graft_minhash_bands",
        { es: Seq[Expression] => MinhashBandKeys(es.head) }, "built-in")
      reg.createOrReplaceTempFunction("graft_simhash",
        { es: Seq[Expression] => Simhash(es.head) }, "built-in")
      reg.createOrReplaceTempFunction("graft_shingle_count",
        { es: Seq[Expression] => DistinctShingleCount(es.head) }, "built-in")
    }

  def shingleHash(toks: Column): Column = call_function("graft_shingle_hash", toks)
  def minhashBandKeys(sh: Column): Column = call_function("graft_minhash_bands", sh)
  def simhash(toks: Column): Column = call_function("graft_simhash", toks)
  def distinctShingleCount(toks: Column): Column = call_function("graft_shingle_count", toks)
}
