package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Vector-column preparation operators for an embedding pipeline: L2
  * normalization, int8 scalar quantization, and signed random projection
  * (Johnson–Lindenstrauss flavored dimensionality reduction).
  *
  * All three are pure codegen'd array expressions (`transform` /
  * `aggregate` higher-order functions) — no UDF, no shuffle, evaluated at
  * scan speed, so they compose into an ingest projection that a
  * 1000-executor job applies while writing the table.
  *
  * Cross-engine determinism discipline (the reason these oracle exactly):
  * every operation is either pure integer arithmetic or one of the
  * IEEE-754 correctly-rounded primitives (`sqrt`, `*`, `/`) applied in
  * identical order, so Spark and any other engine produce bit-equal
  * values. Order-dependent double folds (e.g. summing normalized
  * components) are avoided in favor of min/max/integer sums.
  */
object Embeddings {

  /** Euclidean norm of a float/double array column, computed in double
    * with a sequential fold (matches DuckDB's `list_dot_product` order).
    */
  def l2Norm(vec: Column): Column = Similarity.norm(vec)

  /** Let-binding for a per-row scalar used inside a per-element lambda:
    * higher-order array functions are interpreted (no codegen), so an
    * O(d) scalar like `maxAbs` referenced in a `transform` body would
    * re-evaluate per element — O(d²) per row. Wrapping the scalar in a
    * one-element array and binding it as the outer lambda variable
    * evaluates it exactly once.
    */
  private def bindScalar(scalar: Column)(body: Column => Column): Column =
    element_at(transform(array(scalar), body), 1)

  /** The vector scaled to unit L2 norm (double components). A zero
    * vector normalizes to all-zero rather than NaN, so downstream cosine
    * treats it as orthogonal-to-everything.
    */
  def l2Normalize(vec: Column): Column =
    bindScalar(l2Norm(vec)) { n =>
      transform(vec, x => when(n === 0.0, lit(0.0)).otherwise(x.cast("double") / n))
    }

  /** Symmetric per-vector int8 quantization: `q_i = round(127·v_i /
    * max|v|)`, the standard storage tier that cuts an embedding table to
    * a quarter of float32 (the per-vector `max|v| / 127` scale, see
    * [[int8Scale]], dequantizes). Zero vectors quantize to all-zero.
    * |q_i| ≤ 127 by construction — `127·|v_i|/max|v| ≤ 127` and
    * half-up rounding cannot exceed it.
    */
  def quantizeInt8(vec: Column): Column =
    bindScalar(maxAbs(vec)) { m =>
      transform(vec, x =>
        when(m === 0.0, lit(0)).otherwise(
          round(x.cast("double") * 127.0 / m).cast("int")))
    }

  /** Dequantization scale paired with [[quantizeInt8]]: `v_i ≈ q_i · scale`. */
  def int8Scale(vec: Column): Column = maxAbs(vec) / 127.0

  private def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Signed random projection to `outDim` dimensions over integer-
    * quantized components — the JL-style dimensionality reduction that
    * preserves angular structure at a fraction of the width (sign-pattern
    * matrix instead of Gaussian, per Achlioptas' database-friendly
    * construction).
    *
    * Components are first quantized to integers at `scale` (default
    * 1e4 — four decimal digits, well past float32 embedding precision),
    * then folded with a deterministic ±1 hash of `(output row j, input
    * index i)`, so the whole projection is exact 64-bit integer
    * arithmetic: bit-identical on any engine, partitioning, or platform.
    * Output is an `array<long>` of length `outDim`; callers wanting the
    * conventional double projection divide by `scale·sqrt(outDim)`.
    *
    * Delegates to the native [[graft.functions.SignedProjection]]
    * expression (fused codegen loop: components quantize once, then
    * `outDim × d` integer adds) — the composed
    * `array(aggregate(transform(...)))` form ran interpreted and
    * re-walked the input per output row.
    */
  def projectSigned(vec: Column, outDim: Int, scale: Int = 10000): Column =
    graft.functions.SignedProjection(vec, outDim, scale)

  /** Element-wise vector sum as a typed Aggregator — the grouped
    * "centroid numerator" primitive (per-label/per-cluster mean = sum
    * div count). The aggregation state is ONE long[] per group per
    * partition, so shuffle traffic is groups × d longs; the textbook
    * posexplode+groupBy formulation multiplies every row by d before
    * the exchange — a 64× row blow-up at embedding widths. Integer
    * input (e.g. [[quantizeInt8]] vectors) keeps the sums
    * aggregation-order-independent, hence exactly oracle-able.
    */
  final class SumIntVectors
      extends org.apache.spark.sql.expressions.Aggregator[Seq[Int], Array[Long], Seq[Long]] {
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(b: Array[Long], v: Seq[Int]): Array[Long] = {
      val a = if (b.length == 0) new Array[Long](v.length) else b
      // ragged inputs would otherwise truncate silently (or blow up at
      // merge) — a wrong centroid is worse than a loud failure
      require(v.length == a.length,
        s"SumIntVectors: ragged vector widths in one group (${v.length} vs ${a.length})")
      var i = 0
      while (i < v.length) { a(i) += v(i); i += 1 }
      a
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      if (a.length == 0) b
      else if (b.length == 0) a
      else {
        require(a.length == b.length,
          s"SumIntVectors: ragged vector widths across partitions (${a.length} vs ${b.length})")
        var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a
      }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.Encoders.kryo[Array[Long]]
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Untyped-DataFrame form of [[SumIntVectors]]. */
  def sumIntVectorsUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new SumIntVectors)
}
