package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * A table range-partitioned and sorted by a single column gives file-level
  * min/max skipping on that column only; predicates on a second dimension
  * scan everything. Interleaving the bits of two dimensions into one
  * z-value and laying the table out by it bounds BOTH dimensions' min/max
  * ranges per file, so a 100 TB scan with a predicate on either (or both)
  * dimensions prunes most files from parquet footer stats alone. The
  * z-value is a pure per-row expression (stays inside WholeStageCodegen);
  * the layout itself is one range exchange — the same cost as any sorted
  * write.
  *
  * The reference has no layout operators at all (single-process ETL,
  * `/root/reference/src/DataMigration/DataMigrationExecutor.php:121-126`);
  * this is part of the engine's 100 TB surface.
  */
object Layout {

  /** Morton z-value of two non-negative dimensions: interleaves the low
    * `bits` bits of `x` (even positions) and `y` (odd positions) into one
    * long. Composed from shift/mask/add functions so Catalyst codegens a
    * single fused expression — no UDF.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Quantize a numeric column into [0, 2^bits) given fixed domain bounds
    * (the caller supplies bounds — table-level stats at real scale —
    * keeping the expression deterministic and data-independent).
    */
  def quantize(c: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    val buckets = 1L << bits
    least(lit(buckets - 1), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(buckets.toDouble)).cast("long")))
  }

  /** Lay `df` out by the z-value of two dimensions: one range exchange on
    * the z-value, sorted within partitions, ready for a stats-pruned
    * write. `numFiles` bounds output file count (at 100 TB: size so each
    * file lands near the rowgroup/file sweet spot).
    */
  def zOrderLayout(df: DataFrame, x: Column, y: Column,
      numFiles: Int, bits: Int = 16): DataFrame = {
    val z = zValue(x, y, bits)
    df.withColumn("zval", z)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
  }
}
