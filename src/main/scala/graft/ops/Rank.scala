package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact global order statistics without a single-partition window.
  *
  * `Window.orderBy(...)` with no partition key collapses the whole
  * input onto ONE task — the classic 100 TB scale-killer hiding behind
  * an innocent `row_number()`/`ntile()`. These helpers compute the
  * identical exact answer distributed: a range-partitioned sort (Spark's
  * ordinary distributed sort machinery) plus an O(partitions)
  * per-partition seed table (row-count prefix sums / prefix maxima)
  * joined back broadcast. Same shape as the token-budget prefix sum in
  * [[TextOps.budgetSelect]], generalized to rank assignment.
  *
  * Two-job consistency (r13 advice): pass 1 (the seed collect) and
  * pass 2 (the final mapPartitions) traverse the SAME RDD instance, so
  * the range exchange's map stage runs ONCE — the DAGScheduler registers
  * the shuffle output at the first job and SKIPS the map stage in the
  * second, which therefore reads the identical shuffle files (the same
  * guarantee a persist would buy, without pinning blocks the returned
  * lazy plan has no owner to unpersist — see the no-self-persist
  * precedent in [[Dedup.ngramJaccardPairs]]). The one path where the
  * partitioning could still diverge — shuffle-output loss forcing a
  * recompute of a nondeterministic input between the jobs — is guarded
  * by a hard tripwire: pass 1 records each partition's row count and
  * pass 2 re-counts as it streams, failing the task loudly on any
  * mismatch instead of emitting silently corrupt seeds.
  *
  * Determinism contract: `sortCols` must be a total order (callers
  * append a unique tiebreak column); ranks are then reproducible across
  * partitionings and engines.
  */
object Rank {

  /** Wrap a partition's mapped output with the pass-1/pass-2
    * consistency tripwire: count rows while streaming and fail the
    * task if the partition does not hold exactly `expected` rows —
    * i.e. if this evaluation's partitioning diverged from the one the
    * broadcast seeds were computed from.
    */
  private def counted(
      it: Iterator[Row], expected: Long, pi: Int, op: String)(
      f: Iterator[Row] => Iterator[Row]): Iterator[Row] = {
    var seen = 0L
    f(it.map { r => seen += 1L; r }) ++ {
      if (seen != expected)
        sys.error(s"$op: partition $pi re-evaluated to $seen rows but its " +
          s"broadcast seed was computed from $expected — the range shuffle " +
          "was recomputed with a different row placement (nondeterministic " +
          "input); rerun, or stabilize the input")
      Iterator.empty
    }
  }

  /** [[rankGlobal]] plus the exact total row count, read off pass 1's
    * per-partition counts — so callers needing n (NTILE sizing) get it
    * from the SAME evaluation that seeded the ranks, not a separate
    * `df.count()` scan that re-evaluates the upstream a third time and
    * could disagree with the ranked rows on a nondeterministic input.
    */
  def rankGlobalWithCount(
      df: DataFrame, sortCols: Seq[Column], rankCol: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    val ordered = df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    val rdd = ordered.rdd // ONE instance: both jobs below share its shuffle
    // pass 1: per-partition row counts (the range shuffle is reused below)
    val counts = rdd.mapPartitionsWithIndex { case (pi, it) =>
      Iterator(pi -> it.size.toLong)
    }.collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(counts.scanLeft(0L)(_ + _))
    val expected = spark.sparkContext.broadcast(counts)
    val schema = StructType(ordered.schema.fields :+ StructField(rankCol, LongType))
    val out = spark.createDataFrame(
      rdd.mapPartitionsWithIndex { case (pi, it) =>
        counted(it, expected.value(pi), pi, "rankGlobal") { rows =>
          var r = offsets.value(pi)
          rows.map { row => r += 1L; Row.fromSeq(row.toSeq :+ r) }
        }
      }, schema)
    (out, counts.sum)
  }

  /** Append `rankCol` = exact 1-based global rank under `sortCols`.
    * One range-shuffle + one O(partitions) collect; never a
    * single-partition exchange.
    */
  def rankGlobal(df: DataFrame, sortCols: Seq[Column], rankCol: String): DataFrame =
    rankGlobalWithCount(df, sortCols, rankCol)._1

  /** Append `outCol` = the EXCLUSIVE running maximum of long column
    * `valueCol` under the total order `sortCols` (null for the first
    * row) — `MAX(v) OVER (ORDER BY … ROWS UNBOUNDED PRECEDING TO 1
    * PRECEDING)` without the single-partition window it would plan as:
    * the same range-shuffle + O(partitions) collect as [[rankGlobal]],
    * with per-partition maxima broadcast as prefix seeds and the same
    * re-count tripwire guarding the two-job consistency. The dominance
    * primitive for skyline/Pareto queries.
    */
  def runningMaxExclusive(
      df: DataFrame, sortCols: Seq[Column], valueCol: String,
      outCol: String): DataFrame = {
    val spark = df.sparkSession
    val ordered = df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    val rdd = ordered.rdd // ONE instance: both jobs below share its shuffle
    val vIdx = ordered.schema.fieldIndex(valueCol)
    val partStats = rdd.mapPartitionsWithIndex { case (pi, it) =>
      var m = Long.MinValue
      var any = false
      var n = 0L
      it.foreach { r =>
        n += 1L
        if (!r.isNullAt(vIdx)) { any = true; m = math.max(m, r.getLong(vIdx)) }
      }
      Iterator(pi -> ((if (any) Some(m) else None, n)))
    }.collect().sortBy(_._1).map(_._2)
    val prefix = partStats.map(_._1).scanLeft(Option.empty[Long]) {
      case (acc, cur) => (acc.toSeq ++ cur.toSeq).reduceOption((a, b) => math.max(a, b))
    }
    val offsets = spark.sparkContext.broadcast(prefix)
    val expected = spark.sparkContext.broadcast(partStats.map(_._2))
    val schema = StructType(ordered.schema.fields :+
      StructField(outCol, LongType, nullable = true))
    spark.createDataFrame(
      rdd.mapPartitionsWithIndex { case (pi, it) =>
        counted(it, expected.value(pi), pi, "runningMaxExclusive") { rows =>
          var run: Option[Long] = offsets.value(pi)
          rows.map { row =>
            val out = Row.fromSeq(row.toSeq :+ run.map(Long.box).orNull)
            if (!row.isNullAt(vIdx))
              run = Some(run.fold(row.getLong(vIdx))(math.max(_, row.getLong(vIdx))))
            out
          }
        }
      }, schema)
  }

  /** Append, for each long column in `valueCols` (nulls add 0), its
    * INCLUSIVE running sum under the total order `sortCols` — the
    * distributed cumulative-distribution primitive: `SUM(v) OVER
    * (ORDER BY … ROWS UNBOUNDED PRECEDING)` without the
    * single-partition window it would plan as. Same range shuffle +
    * O(partitions) prefix-seed broadcast + re-count tripwire as
    * [[rankGlobal]]; all columns share ONE pass, so a CDF pair (the
    * KS-test shape) costs exactly one sort.
    */
  def runningSumsInclusive(
      df: DataFrame, sortCols: Seq[Column], valueCols: Seq[String],
      outSuffix: String = "_cum"): DataFrame = {
    val spark = df.sparkSession
    val ordered = df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    val rdd = ordered.rdd // ONE instance: both jobs below share its shuffle
    val idxs = valueCols.map(ordered.schema.fieldIndex).toArray
    val partStats = rdd.mapPartitionsWithIndex { case (pi, it) =>
      val sums = Array.fill(idxs.length)(0L)
      var n = 0L
      it.foreach { r =>
        n += 1L
        var i = 0
        while (i < idxs.length) {
          if (!r.isNullAt(idxs(i))) sums(i) += r.getLong(idxs(i))
          i += 1
        }
      }
      Iterator(pi -> ((sums, n)))
    }.collect().sortBy(_._1).map(_._2)
    val prefixes = partStats.map(_._1).scanLeft(Array.fill(idxs.length)(0L)) {
      (acc, cur) => acc.zip(cur).map { case (a, b) => a + b }
    }
    val offsets = spark.sparkContext.broadcast(prefixes)
    val expected = spark.sparkContext.broadcast(partStats.map(_._2))
    val schema = StructType(ordered.schema.fields ++
      valueCols.map(c => StructField(c + outSuffix, LongType)))
    spark.createDataFrame(
      rdd.mapPartitionsWithIndex { case (pi, it) =>
        counted(it, expected.value(pi), pi, "runningSumsInclusive") { rows =>
          val run = offsets.value(pi).clone()
          rows.map { row =>
            var i = 0
            while (i < idxs.length) {
              if (!row.isNullAt(idxs(i))) run(i) += row.getLong(idxs(i))
              i += 1
            }
            Row.fromSeq(row.toSeq ++ run.toSeq)
          }
        }
      }, schema)
  }

  /** SQL NTILE semantics from an exact rank: with n rows and b buckets,
    * the first n % b buckets hold n/b + 1 rows, the rest n/b. Pure
    * integer arithmetic — replayable verbatim by any SQL engine's
    * NTILE over the same total order.
    */
  def ntileOfRank(rank: Column, n: Long, buckets: Int): Column = {
    val q = n / buckets
    val m = n % buckets
    val cut = m * (q + 1) // ranks 1..cut land in the fat buckets
    when(rank <= cut, (rank - 1) / (q + 1) + 1)
      .otherwise(
        if (q == 0) lit(buckets) // degenerate n < buckets: never reached past cut
        else lit(m) + (rank - cut - 1) / q + 1)
      .cast("int")
  }

  /** Append `tileCol` = exact NTILE(buckets) under `sortCols`,
    * distributed. `n` comes from the rank pass's own per-partition
    * counts — no separate `df.count()` scan, and bucket sizing can
    * never disagree with the evaluation that assigned the ranks.
    */
  def ntileExact(df: DataFrame, sortCols: Seq[Column], buckets: Int, tileCol: String): DataFrame = {
    val (ranked, n) = rankGlobalWithCount(df, sortCols, s"__rank_$tileCol")
    ranked
      .withColumn(tileCol, ntileOfRank(col(s"__rank_$tileCol"), n, buckets))
      .drop(s"__rank_$tileCol")
  }
}
