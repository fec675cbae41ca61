package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the per-row hot paths: polynomial text
  * hashing and vector cosine similarity. Both implement `doGenCode`, so the
  * dedup / similarity operators stay inside whole-stage codegen — primitive
  * loops, no intermediate array allocation (vs the `transform`/`aggregate`
  * higher-order-function formulation, which materializes lambda arrays per
  * row). Semantics exactly mirror the DuckDB oracle folds (sequential left
  * fold, same constants), see [[TextFunctions.polyHashSlow]] and
  * [[VectorFunctions.cosine]].
  */
object GraftExpressions {

  /** h = fold((h, c) => (h*31 + codepoint(c)) mod P) over the string. */
  case class PolyHash(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_poly_hash"

    protected override def nullSafeEval(input: Any): Any =
      SignatureExpressions.polyHash(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val s = ctx.freshName("s")
        val i = ctx.freshName("i")
        val h = ctx.freshName("h")
        val cp = ctx.freshName("cp")
        s"""
        String $s = $c.toString();
        long $h = 0L;
        int $i = 0;
        while ($i < $s.length()) {
          int $cp;
          if (Character.isHighSurrogate($s.charAt($i)) && $i + 1 < $s.length()
              && Character.isLowSurrogate($s.charAt($i + 1))) {
            $cp = $s.codePointAt($i); $i++;
          } else { $cp = (int) $s.charAt($i); }
          $h = ($h * 31L + $cp) % ${TextFunctions.P}L;
          $i++;
        }
        ${ev.value} = $h;
        """
      })

    override protected def withNewChildInternal(newChild: Expression): PolyHash =
      copy(child = newChild)
  }

  /** cosine(a, b) = dot(a,b) / (||a|| * ||b||) over two float arrays, all
    * three sums accumulated as sequential double left-folds (bit-identical
    * to the DuckDB `list_reduce` mirror).
    */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_cosine"

    // getFloat on a non-float ArrayData silently reads garbage bytes —
    // reject anything but array<float> at analysis time (the generic HOF
    // VectorFunctions.cosine handles other numeric element types).
    override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got ${l.sql} and ${r.sql}")
    }

    protected override def nullSafeEval(a: Any, b: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      val ys = b.asInstanceOf[ArrayData]
      val n = math.min(xs.numElements(), ys.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = xs.getFloat(i).toDouble
        val y = ys.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $x = (double) $a.getFloat($i);
          double $y = (double) $b.getFloat($i);
          $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        }
        ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineSim =
      copy(left = newLeft, right = newRight)
  }

  /** Double-array twin of [[CosineSim]] — for model-side vectors
    * (centroids, codebook entries) that are averages and therefore
    * array<double>. Accumulation order matches the HOF composition
    * `dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b)))` exactly (each
    * accumulator is an ascending-index sequential sum), so swapping
    * one for the other cannot move a bit. Exists because the IVF/PQ
    * argmax folds evaluate a cosine per (row, centroid) INSIDE a
    * CodegenFallback higher-order function — with the HOF cosine that
    * was ~10 closure-built arrays per comparison; this is one
    * primitive loop per call (measured 2.1x on the s10 index build).
    */
  case class CosineSimD(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_cosine_d"

    override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got ${l.sql} and ${r.sql}")
    }

    protected override def nullSafeEval(a: Any, b: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      val ys = b.asInstanceOf[ArrayData]
      val n = math.min(xs.numElements(), ys.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = xs.getDouble(i)
        val y = ys.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $x = $a.getDouble($i);
          double $y = $b.getDouble($i);
          $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        }
        ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineSimD =
      copy(left = newLeft, right = newRight)
  }

  /** Squared Euclidean distance between two array<double> columns — the
    * native twin of the HOF fold `Σ (x−y)²` with the same ascending
    * sequential accumulation (bit-identical); used inside the PQ
    * encode/distance-table folds for the same reason as [[CosineSimD]].
    */
  case class SqDistD(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_sq_dist"

    override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got ${l.sql} and ${r.sql}")
    }

    protected override def nullSafeEval(a: Any, b: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      val ys = b.asInstanceOf[ArrayData]
      val n = math.min(xs.numElements(), ys.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = xs.getDouble(i) - ys.getDouble(i)
        acc += d * d
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val d = ctx.freshName("d")
        s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $d = $a.getDouble($i) - $b.getDouble($i);
          $acc += $d * $d;
        }
        ${ev.value} = $acc;
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SqDistD =
      copy(left = newLeft, right = newRight)
  }

  /** Hyperplane-LSH band keys over a float vector: one long per band,
    * (bandIndex << 32) | sign-bit pattern of that band's `bits` planes.
    * `bitsExpr` and `planesExpr` (array<array<double>>) must be foldable —
    * they're evaluated once per executor, not per row. One pass per row
    * (bands x bits x dim primitive loop); CodegenFallback, but the
    * surrounding operators stay in whole-stage codegen. Dot-product fold
    * order matches the DuckDB mirror ([[EmbeddingLsh.sqlBandKeys]]) so
    * bucket assignment is bit-identical across engines.
    */
  case class HyperplaneBandKeys(vec: Expression, bitsExpr: Expression, planesExpr: Expression)
      extends TernaryExpression with CodegenFallback {
    override def first: Expression = vec
    override def second: Expression = bitsExpr
    override def third: Expression = planesExpr
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_hyperplane_bands"

    @transient private lazy val bits: Int = bitsExpr.eval(null).asInstanceOf[Int]
    @transient private lazy val planes: Array[Array[Double]] = {
      val ad = planesExpr.eval(null).asInstanceOf[ArrayData]
      Array.tabulate(ad.numElements())(j => ad.getArray(j).toDoubleArray())
    }

    protected override def nullSafeEval(v: Any, b: Any, p: Any): Any = {
      val xs = v.asInstanceOf[ArrayData]
      val nBands = planes.length / bits
      val keys = new Array[Long](nBands)
      var j = 0
      while (j < nBands) {
        var key = j.toLong << 32
        var k = 0
        while (k < bits) {
          val pl = planes(j * bits + k)
          val n = math.min(xs.numElements(), pl.length)
          var dot = 0.0
          var i = 0
          while (i < n) { dot += xs.getFloat(i).toDouble * pl(i); i += 1 }
          if (dot > 0) key |= (1L << k)
          k += 1
        }
        keys(j) = key
        j += 1
      }
      new GenericArrayData(keys)
    }

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): HyperplaneBandKeys =
      copy(vec = f, bitsExpr = s, planesExpr = t)
  }

  /** Distinct sampled sliding-window polynomial hashes in ONE pass —
    * the native twin of
    * `array_distinct(filter(transform(sequence(1, len-w+1),
    *    i => polyHash(substr(i, w))), h => h % mod == 0))`
    * with IDENTICAL values and first-occurrence order: the w-codepoint
    * window hash rolls incrementally (h' = (h − c₀·31^{w−1})·31 + c_w
    * mod P, the same residue the left fold reduces to), so the per-row
    * work is O(len) instead of the HOF chain's O(len·w) interpreted
    * lambda evaluations plus a len-sized intermediate array per step
    * (measured 3.3× on d16_containment at sf0.1, window=20).
    * `windowExpr`/`modExpr` must be foldable ints; strings shorter than
    * the window yield an empty array (callers filter on size, exactly
    * as they filtered the HOF result).
    */
  case class WindowHashes(text: Expression, windowExpr: Expression, modExpr: Expression)
      extends TernaryExpression with CodegenFallback {
    override def first: Expression = text
    override def second: Expression = windowExpr
    override def third: Expression = modExpr
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_window_hashes"

    // window/mod are evaluated ONCE via eval(null) below — misuse from
    // SQL (a non-literal column, mod 0) must fail at ANALYSIS time, not
    // as a runtime NPE/ArithmeticException mid-job (ADVICE r13)
    override def checkInputDataTypes(): TypeCheckResult = {
      if (text.dataType != StringType)
        return TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${text.dataType.sql}")
      (windowExpr.dataType, modExpr.dataType) match {
        case (IntegerType | LongType, IntegerType | LongType) =>
          if (!windowExpr.foldable || !modExpr.foldable)
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName requires foldable (literal) window and mod arguments")
          else if (windowExpr.eval(null) == null || modExpr.eval(null) == null)
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName requires non-null window and mod arguments")
          else if (w < 1)
            TypeCheckResult.TypeCheckFailure(s"$prettyName requires window >= 1, got $w")
          else if (m < 1L)
            TypeCheckResult.TypeCheckFailure(s"$prettyName requires mod >= 1, got $m")
          else TypeCheckResult.TypeCheckSuccess
        case (wd, md) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires integral window and mod arguments, got ${wd.sql} and ${md.sql}")
      }
    }

    @transient private lazy val w: Int = windowExpr.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
    }
    @transient private lazy val m: Long = modExpr.eval(null) match {
      case i: Int => i.toLong
      case l: Long => l
    }

    protected override def nullSafeEval(t: Any, wi: Any, mo: Any): Any = {
      val P = TextFunctions.P
      val str = t.asInstanceOf[UTF8String].toString
      // decode to codepoints with the polyHashString surrogate guard, so
      // windows count codepoints exactly like Spark's substring
      var n = 0
      val cps = new Array[Int](str.length)
      var i = 0
      while (i < str.length) {
        val cp = if (Character.isHighSurrogate(str.charAt(i)) && i + 1 < str.length &&
            Character.isLowSurrogate(str.charAt(i + 1))) {
          val v = str.codePointAt(i); i += 1; v
        } else str.charAt(i).toInt
        cps(n) = cp; n += 1
        i += 1
      }
      if (n < w) return new GenericArrayData(Array.emptyLongArray)
      var pw = 1L // 31^(w-1) mod P
      var k = 1
      while (k < w) { pw = pw * 31L % P; k += 1 }
      var h = 0L
      var j = 0
      while (j < w) { h = (h * 31L + cps(j)) % P; j += 1 }
      val seen = new mutable.LinkedHashSet[Long]
      if (h % m == 0L) seen.add(h)
      var s = 1
      while (s <= n - w) {
        h = (h - cps(s - 1) * pw % P + P) % P
        h = (h * 31L + cps(s + w - 1)) % P
        if (h % m == 0L) seen.add(h)
        s += 1
      }
      new GenericArrayData(seen.toArray)
    }

    override protected def withNewChildrenInternal(
        f: Expression, sE: Expression, tE: Expression): WindowHashes =
      copy(text = f, windowExpr = sE, modExpr = tE)
  }

  /** Σ cᵢ · weights[bucketᵢ] over a per-document (bucket, count) profile
    * array — the perceptron margin as ONE compiled pass per document row.
    * The groupBy-sum margin re-shuffled the whole exploded feature table
    * every training round; with per-doc profiles aggregated once, the
    * margin is per-row arithmetic and a round's only exchange is the tiny
    * per-bucket delta aggregation. `weights` must be a FOLDABLE
    * array<long> (the dense dim-sized weight array rebuilt per round,
    * evaluated once per query, not per row); buckets index it 0-based and
    * must be < its length (the caller's `% dim`). Exact long sums —
    * identical in any profile order, so collect_list order never matters.
    */
  case class BucketMargin(pairs: Expression, weightsExpr: Expression)
      extends BinaryExpression with CodegenFallback {
    override def left: Expression = pairs
    override def right: Expression = weightsExpr
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_bucket_margin"

    override def checkInputDataTypes(): TypeCheckResult =
      (pairs.dataType, weightsExpr.dataType) match {
        case (ArrayType(st: StructType, _), ArrayType(LongType, _))
            if st.fields.length == 2 &&
              st.fields.forall(_.dataType == LongType) =>
          if (weightsExpr.foldable) TypeCheckResult.TypeCheckSuccess
          else TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires a foldable (literal) weights array")
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<struct<long,long>>, array<long>), " +
            s"got ${l.sql} and ${r.sql}")
      }

    @transient private lazy val weights: Array[Long] =
      weightsExpr.eval(null).asInstanceOf[ArrayData].toLongArray()

    protected override def nullSafeEval(p: Any, w: Any): Any = {
      val ad = p.asInstanceOf[ArrayData]
      val n = ad.numElements()
      var s = 0L
      var i = 0
      while (i < n) {
        val st = ad.getStruct(i, 2)
        s += st.getLong(1) * weights(st.getLong(0).toInt)
        i += 1
      }
      s
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): BucketMargin =
      copy(pairs = l, weightsExpr = r)
  }

  /** Idempotently register the expressions in the session's function
    * registry; callers then use the `Column` helpers below.
    */
  def register(spark: SparkSession): Unit =
    Registration.once(spark, "graft-expressions") {
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction("graft_poly_hash",
        { es: Seq[Expression] => PolyHash(es.head) }, "built-in")
      reg.createOrReplaceTempFunction("graft_window_hashes",
        { es: Seq[Expression] => WindowHashes(es(0), es(1), es(2)) }, "built-in")
      reg.createOrReplaceTempFunction("graft_bucket_margin",
        { es: Seq[Expression] => BucketMargin(es(0), es(1)) }, "built-in")
      reg.createOrReplaceTempFunction("graft_cosine",
        { es: Seq[Expression] => CosineSim(es(0), es(1)) }, "built-in")
      reg.createOrReplaceTempFunction("graft_cosine_d",
        { es: Seq[Expression] => CosineSimD(es(0), es(1)) }, "built-in")
      reg.createOrReplaceTempFunction("graft_sq_dist",
        { es: Seq[Expression] => SqDistD(es(0), es(1)) }, "built-in")
      reg.createOrReplaceTempFunction("graft_hyperplane_bands",
        { es: Seq[Expression] => HyperplaneBandKeys(es(0), es(1), es(2)) }, "built-in")
    }

  def polyHash(text: Column): Column = call_function("graft_poly_hash", text)
  def windowHashes(text: Column, window: Int, sampleMod: Long): Column =
    call_function("graft_window_hashes", text,
      org.apache.spark.sql.functions.lit(window), org.apache.spark.sql.functions.lit(sampleMod))
  def bucketMargin(pairs: Column, weights: Column): Column =
    call_function("graft_bucket_margin", pairs, weights)
  def cosineSim(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
  def cosineSimD(a: Column, b: Column): Column = call_function("graft_cosine_d", a, b)
  def sqDistD(a: Column, b: Column): Column = call_function("graft_sq_dist", a, b)
}
