package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd signed random projection: quantize each component to
  * `round(x · scale)` (HALF_UP, exactly Spark's `Round`-on-double
  * semantics, which DuckDB's `round` mirrors), then fold with the
  * deterministic ±1 hash `(j·2654435761 + i·40503) mod 97 < 48` into
  * `outDim` 64-bit integer sums.
  *
  * Versus the composed `array(aggregate(transform(...)))` form — which
  * runs interpreted (higher-order functions have no codegen) and
  * re-walks the input once per output row — this is one fused loop:
  * components quantize ONCE, then `outDim × d` long adds. Identical
  * output by construction (integer arithmetic end to end).
  */
case class SignedProjection(child: Expression, outDim: Int, scale: Int)
    extends UnaryExpression {

  require(outDim > 0 && scale > 0, "outDim and scale must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"signed_projection expects array<float|double>, got $other")
    }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x = (if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)) * scale
      q(i) = SignedProjection.roundHalfUp(x)
      i += 1
    }
    val out = new Array[Long](outDim)
    var j = 0
    while (j < outDim) {
      var s = 0L
      i = 0
      while (i < n) {
        if ((j.toLong * 2654435761L + i.toLong * 40503L) % 97L < 48L) s += q(i)
        else s -= q(i)
        i += 1
      }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val q = ctx.freshName("q")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val get = if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val cls = classOf[SignedProjection].getName
      s"""
         |int $n = $a.numElements();
         |long[] $q = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $q[$i] = $cls.roundHalfUp($get * $scale);
         |}
         |long[] $out = new long[$outDim];
         |for (int $j = 0; $j < $outDim; $j++) {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (((long) $j * 2654435761L + (long) $i * 40503L) % 97L < 48L) $s += $q[$i];
         |    else $s -= $q[$i];
         |  }
         |  $out[$j] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignedProjection {
  import org.apache.spark.sql.GraftBridge

  /** Spark's `Round`-on-double semantics: decimal HALF_UP over the
    * shortest decimal representation — agrees with C-library
    * `round()` (away from zero) for every double, including the
    * `x + 0.5 == 1.0` rounding trap that `Math.round` gets wrong.
    */
  def roundHalfUp(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** Column-API entry point: `signed_projection(vec, outDim, scale)`. */
  def apply(vec: Column, outDim: Int, scale: Int): Column =
    GraftBridge.column(SignedProjection(GraftBridge.expression(vec), outDim, scale))
}
