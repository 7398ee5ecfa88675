package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd bounded edit-distance predicate:
  * `within_edit1(a, b)` ⇔ `levenshtein(a, b) <= 1`.
  *
  * The general Levenshtein expression fills an O(|a|·|b|) DP matrix and
  * only afterwards gets compared to the bound — at a fuzzy-join verify
  * step that's quadratic work per candidate pair for a boolean whose
  * answer is decidable in one linear walk: length gap > 1 is an instant
  * no; equal lengths admit at most one substitution; gap-1 lengths admit
  * one skip in the longer string. ASCII strings (the fuzzy-vocabulary
  * case — candidates are pre-filtered to `[a-z]+`) take the zero-copy
  * byte walk; anything multibyte falls back to the exact Levenshtein so
  * the semantics are IDENTICAL to `levenshtein(a,b) <= 1` for every
  * input. Same preference ladder as [[CosineSim]]: native Expression >
  * functions composition > UDF.
  */
case class WithinEdit1(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"within_edit1 expects two string columns, got ($a, $b)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    WithinEdit1Impl.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.WithinEdit1Impl.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WithinEdit1 {
  import org.apache.spark.sql.GraftBridge
  /** Column-API entry point: `within_edit1(a, b)`. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(WithinEdit1(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Single-pass implementation, called from both interpreted eval and the
  * generated code (one static call keeps the expression inside the
  * surrounding WholeStageCodegen span).
  */
object WithinEdit1Impl {
  import org.apache.spark.unsafe.Platform

  def compute(a: UTF8String, b: UTF8String): Boolean = {
    val na = a.numBytes
    val nb = b.numBytes
    // multibyte input → edit distance is over code points, not bytes;
    // delegate to the exact implementation (identical semantics)
    if (na != a.numChars || nb != b.numChars)
      return a.levenshteinDistance(b) <= 1
    if (na == nb) {
      // at most one substitution
      val (ba, oa) = (a.getBaseObject, a.getBaseOffset)
      val (bb, ob) = (b.getBaseObject, b.getBaseOffset)
      var i = 0
      var diffs = 0
      while (i < na) {
        if (Platform.getByte(ba, oa + i) != Platform.getByte(bb, ob + i)) {
          diffs += 1
          if (diffs > 1) return false
        }
        i += 1
      }
      true
    } else if (math.abs(na - nb) == 1) {
      // one insertion/deletion: walk both, allow one skip in the longer
      val (long, short) = if (na > nb) (a, b) else (b, a)
      val (bl, ol) = (long.getBaseObject, long.getBaseOffset)
      val (bs, os) = (short.getBaseObject, short.getBaseOffset)
      val nl = long.numBytes
      var i = 0 // long index
      var j = 0 // short index
      var skipped = false
      while (j < short.numBytes) {
        if (Platform.getByte(bl, ol + i) == Platform.getByte(bs, os + j)) {
          i += 1; j += 1
        } else if (!skipped) {
          skipped = true; i += 1 // consume the extra char of the longer
        } else return false
      }
      // if the skip was used mid-walk nothing may remain; otherwise the
      // single trailing byte of the longer string IS the one edit
      !skipped || i == nl
    } else false
  }
}
