package graft.functions

import graft.ops.TextOps
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}

/** Engine function surface, exposed two ways:
  *
  *   - [[GraftExtensions]] — a `SparkSessionExtensions` injector for
  *     `spark.sql.extensions=graft.functions.GraftExtensions`, making the
  *     functions available to every session of a cluster;
  *   - [[GraftFunctions.register]] — runtime registration on an existing
  *     session (tests, notebooks).
  *
  * SQL users then call `cosine_sim(a, b)`, `graft_fingerprint(text)`,
  * `graft_lang_id(text)`, `graft_token_count(text)` directly. Only
  * `cosine_sim` needs a custom Expression; the text functions compose
  * built-ins, so their SQL registration just re-expresses the Column
  * pipeline as an expression tree (still fully codegen'd).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.injections.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // the engine's own physical operators (grouped top-k)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}

object GraftFunctions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[CosineSim].getName, null, name, usage, "")

  import org.apache.spark.sql.GraftBridge

  /** Lift a Column→Column composition into an expression builder. */
  private def colFn(f: Column => Column): Seq[Expression] => Expression =
    es => GraftBridge.expression(f(GraftBridge.column(es.head)))

  private[functions] val injections: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim",
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two numeric arrays"),
      (es: Seq[Expression]) => CosineSim(es(0), es(1))),
    ("jaro_winkler",
      info("jaro_winkler", "jaro_winkler(a, b) - Jaro-Winkler similarity of two strings"),
      (es: Seq[Expression]) => JaroWinkler(es(0), es(1))),
    ("graft_fingerprint",
      info("graft_fingerprint", "graft_fingerprint(text) - md5 of canonicalized text"),
      colFn(TextOps.fingerprint)),
    ("graft_lang_id",
      info("graft_lang_id", "graft_lang_id(text) - heuristic language id"),
      colFn(TextOps.langIdHeuristic)),
    ("graft_token_count",
      info("graft_token_count", "graft_token_count(text) - whitespace token count"),
      colFn(c => TextOps.tokenCount(c).cast("long"))),
    ("repetition_ratio",
      info("repetition_ratio", "repetition_ratio(text[, k]) - repeated k-shingle fraction"),
      (es: Seq[Expression]) => es match {
        // k must be a foldable integer (it shapes the generated code);
        // reject anything else loudly rather than silently computing k=3
        case Seq(text) => RepetitionRatio(text, 3)
        case Seq(text, org.apache.spark.sql.catalyst.expressions.Literal(v: Number,
            org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
            org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType)) =>
          RepetitionRatio(text, v.intValue())
        case Seq(_, other) => throw new IllegalArgumentException(
          s"repetition_ratio: k must be an integer literal, got $other")
        case other => throw new IllegalArgumentException(
          s"repetition_ratio expects (text[, k]), got ${other.size} arguments")
      }),
    ("within_edit1",
      info("within_edit1",
        "within_edit1(a, b) - true iff levenshtein(a, b) <= 1, in one linear walk"),
      (es: Seq[Expression]) => WithinEdit1(es(0), es(1))),
    ("signed_projection",
      info("signed_projection",
        "signed_projection(vec, outDim, scale) - integer signed random projection"),
      (es: Seq[Expression]) => es match {
        // outDim/scale shape the generated code, so they must be
        // foldable integer literals, like repetition_ratio's k
        case Seq(vec,
            org.apache.spark.sql.catalyst.expressions.Literal(d: Number, _),
            org.apache.spark.sql.catalyst.expressions.Literal(s: Number, _)) =>
          SignedProjection(vec, d.intValue(), s.intValue())
        case other => throw new IllegalArgumentException(
          "signed_projection expects (vec, outDim literal, scale literal), " +
            s"got ${other.size} arguments")
      }))

  /** Column-level helpers (no registration needed). */
  def cosine_sim(a: Column, b: Column): Column = CosineSim(a, b)
  def graft_fingerprint(text: Column): Column = TextOps.fingerprint(text)
  def graft_lang_id(text: Column): Column = TextOps.langIdHeuristic(text)
  def graft_token_count(text: Column): Column = TextOps.tokenCount(text)

  /** Register the SQL-callable functions on a live session. */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
