package graft.functions

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

  /** Idempotently register the expressions in the session's function
    * registry; callers then use the `Column` helpers below.
    */
  def register(spark: SparkSession): Unit =
    Registration.once(spark, "graft-expressions") {
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction("graft_poly_hash",
        { es: Seq[Expression] => PolyHash(es.head) }, "built-in")
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
  def cosineSim(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
  def cosineSimD(a: Column, b: Column): Column = call_function("graft_cosine_d", a, b)
  def sqDistD(a: Column, b: Column): Column = call_function("graft_sq_dist", a, b)
}
