package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Jaro–Winkler similarity — the entity-resolution
  * scorer for short identifier-like strings (names, SKUs), where edit
  * distance over-penalizes transpositions and embedding similarity is
  * absurd overkill. Textbook construction (Winkler's prefix boost with
  * scale 0.1, max prefix 4, boost threshold 0.7) — the same constants
  * DuckDB's `jaro_winkler_similarity` implements, so oracle parity is a
  * rounding, not a semantics, question.
  *
  * Same preference ladder as [[CosineSim]]/[[WithinEdit1]]: a native
  * Expression with `doGenCode` keeps the verify step of a blocked ER
  * join inside WholeStageCodegen; a Scala UDF would box every row.
  */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects two string columns, got ($a, $b)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinklerImpl.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  import org.apache.spark.sql.GraftBridge
  /** Column-API entry point: `jaro_winkler(a, b)`. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinkler(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Shared by interpreted eval and generated code (one static call keeps
  * the expression inside the surrounding WholeStageCodegen span).
  */
object JaroWinklerImpl {

  /** Textbook Jaro–Winkler over UTF-16 code units (names in this
    * engine's ER paths are ASCII; code-unit matching equals code-point
    * matching there, and stays deterministic everywhere else).
    */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val s1 = ua.toString
    val s2 = ub.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: aligned walk over the matched characters
    var t = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (s1.charAt(i) != s2.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t / 2) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (prefix < maxP && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
