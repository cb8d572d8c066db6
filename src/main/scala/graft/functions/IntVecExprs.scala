package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Shared shape for the integer-vector kernels: two `array<int>` inputs,
  * one exact BIGINT result, accumulated left-to-right in LONG — bit-exact
  * on any engine and any partitioning (integer arithmetic, no FP).
  *
  * These exist for the same reason as [[FloatVecDot]]: the higher-order
  * `aggregate(zip_with(...))` formulation is CodegenFallback — interpreted
  * per row with a lambda frame and an intermediate array allocation per
  * element pair. In the k-means/SemDeDup hot loops (q109/q110) that
  * evaluates K+3 times per vector, the interpreted form measured ~40× the
  * runtime of this compiled loop at the sf1 soak. Same null contract as
  * FloatVecDot: a null ELEMENT inside the compared prefix yields NULL, so
  * the HOF fallback and the native path stay interchangeable.
  */
abstract class IntVecFold extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = LongType
  // Null elements force NULL even with non-nullable children (see
  // FloatVecDot.nullable for the codegen failure mode this avoids).
  override def nullable: Boolean = true

  /** Java source for one element's contribution given int vars a, b. */
  protected def termJava(a: String, b: String): String
  /** Interpreted twin of [[termJava]]. */
  protected def termEval(a: Int, b: Int): Long

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += termEval(x.getInt(i), y.getInt(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val bad = ctx.freshName("hasNullElem")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |boolean $bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
         |  $acc += ${termJava(s"$x.getInt($i)", s"$y.getInt($i)")};
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })
}

/** Per-vector symmetric int8 quantization: `array<float>` →
  * `array<int>` with each element `floor(x / scale + 0.5)` for
  * `scale = absmax/127` (1.0 when the vector is all-zero) — bit-identical
  * to the q78 higher-order-function chain (`abs` fold for absmax in a
  * DOUBLE accumulator, float→double promotion per element, one IEEE
  * divide + floor), but a single compiled pass instead of three chained
  * interpreted HOFs. At the sf1 soak the HOF chain cost ~0.6 ms/vector —
  * 11.7 s of the k-means pipeline's 21 s cold build; this loop removes
  * that entirely. A null element yields a NULL result — deliberately
  * STRICTER than the HOF chain (whose `when` fold skips nulls and emits a
  * null slot instead): a silently part-null quantized vector would poison
  * every downstream distance, so failing the whole vector is the safer
  * contract. The two forms agree on null-free input, the only input the
  * oracle contract covers. Evaluation is a primitive loop either way;
  * codegen wraps the same loop so the projection stays inside whole-stage
  * codegen.
  */
case class QuantizeInt8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = GraftFunctions.quantizeI8Name

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    QuantizeInt8.quantize(x)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val out = ctx.freshName("qout")
      s"""
         |Object $out = graft.functions.QuantizeInt8.quantize($x);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeInt8 {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** Shared interpreted/codegen kernel; returns null on a null element. */
  def quantize(x: ArrayData): ArrayData = {
    val n = x.numElements()
    var absmax = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      // float abs promoted to double, compared against the double fold —
      // the exact op tree of the HOF absmax
      val a = java.lang.Math.abs(x.getFloat(i)).toDouble
      if (a > absmax) absmax = a
      i += 1
    }
    val scale = if (absmax == 0.0) 1.0 else absmax / 127.0
    val out = new Array[Int](n)
    i = 0
    while (i < n) {
      out(i) = java.lang.Math.floor(x.getFloat(i) / scale + 0.5).toInt
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Σ aᵢ·bᵢ over two `array<int>` columns, exact BIGINT. */
case class IntVecDot(left: Expression, right: Expression) extends IntVecFold {
  override def prettyName: String = GraftFunctions.intDotName
  override protected def termJava(a: String, b: String): String =
    s"(long) ($a) * (long) ($b)"
  override protected def termEval(a: Int, b: Int): Long = a.toLong * b.toLong
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² over two `array<int>` columns, exact BIGINT. */
case class IntVecSqDist(left: Expression, right: Expression) extends IntVecFold {
  override def prettyName: String = GraftFunctions.intSqDistName
  override protected def termJava(a: String, b: String): String =
    s"(((long) ($a) - (long) ($b)) * ((long) ($a) - (long) ($b)))"
  override protected def termEval(a: Int, b: Int): Long = {
    val d = a.toLong - b.toLong
    d * d
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
