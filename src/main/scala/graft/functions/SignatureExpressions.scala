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

  /** array<long> token hashes → array<struct<h1,h2>> of ALL n-token span
    * keys — the native one-pass twin of [[Signatures.spanKeys]]'s HOF
    * (identical values, ascending start order; size < n → EMPTY array,
    * exactly the HOF's otherwise-branch): both polynomial folds roll
    * incrementally (H′ = (H − th[s]·B^{n−1})·B + th[s+n] mod P, the same
    * residue the per-window left fold reduces to), so the per-row work is
    * O(len) with two multiplies per position instead of the HOF's
    * O(len·n) interpreted element_at fold per window (the d16
    * WindowHashes lesson applied to the q31/d15/d17/d18 span family).
    * `nExpr` must be a foldable int ≥ 2.
    */
  case class SpanKeys(th: Expression, nExpr: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
    override def left: Expression = th
    override def right: Expression = nExpr
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))), containsNull = false)
    override def prettyName: String = "graft_span_keys"

    // n is evaluated ONCE via eval(null) below — misuse from SQL (a
    // non-literal column, n < 2) must fail at ANALYSIS time, not as a
    // runtime NPE mid-job (ADVICE r13)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      (th.dataType, nExpr.dataType) match {
        case (ArrayType(LongType, _), IntegerType | LongType) =>
          if (!nExpr.foldable)
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName requires a foldable (literal) span length")
          else if (nExpr.eval(null) == null)
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName requires a non-null span length")
          else if (n < 2)
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName requires span length >= 2, got $n")
          else TypeCheckResult.TypeCheckSuccess
        case (t, nd) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, integral literal), got ${t.sql} and ${nd.sql}")
      }
    }

    @transient private lazy val n: Int = nExpr.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
    }

    private val emptyResult = new GenericArrayData(Array.empty[Any])

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = th.eval(input)
      if (v == null) return emptyResult // HOF: null size fails `when` -> empty
      val ad = v.asInstanceOf[ArrayData]
      val m = ad.numElements()
      if (m < n) return emptyResult
      val hs = ad.toLongArray()
      var pw1 = 1L; var pw2 = 1L
      var k = 1
      while (k < n) { pw1 = pw1 * B % P; pw2 = pw2 * B2 % P; k += 1 }
      var h1 = 0L; var h2 = 0L
      var j = 0
      while (j < n) {
        // first window: the HOF's left fold starts at th(s) unmultiplied
        h1 = if (j == 0) hs(0) else (h1 * B + hs(j)) % P
        h2 = if (j == 0) hs(0) else (h2 * B2 + hs(j)) % P
        j += 1
      }
      val out = new Array[Any](m - n + 1)
      out(0) = org.apache.spark.sql.catalyst.InternalRow(h1, h2)
      var s = 1
      while (s <= m - n) {
        h1 = ((h1 - hs(s - 1) * pw1 % P + P) % P * B + hs(s + n - 1)) % P
        h2 = ((h2 - hs(s - 1) * pw2 % P + P) % P * B2 + hs(s + n - 1)) % P
        out(s) = org.apache.spark.sql.catalyst.InternalRow(h1, h2)
        s += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): SpanKeys = copy(th = l, nExpr = r)
  }

  def register(spark: SparkSession): Unit =
    Registration.once(spark, "graft-signatures") {
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction("graft_span_keys",
        { es: Seq[Expression] => SpanKeys(es(0), es(1)) }, "built-in")
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
  def spanKeys(th: Column, n: Int): Column =
    call_function("graft_span_keys", th, org.apache.spark.sql.functions.lit(n))
  def minhashBandKeys(sh: Column): Column = call_function("graft_minhash_bands", sh)
  def simhash(toks: Column): Column = call_function("graft_simhash", toks)
  def distinctShingleCount(toks: Column): Column = call_function("graft_shingle_count", toks)
}
