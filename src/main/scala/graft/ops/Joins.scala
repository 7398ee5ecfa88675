package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Join operators Spark lacks as built-ins, composed scale-correctly from
  * existing primitives (preference (a) of the custom-operator ladder —
  * no planner extension needed).
  */
object Joins {

  /** Match direction for [[asof]]: backward = latest right row at or
    * before the left time (tick-data "prevailing quote"); forward =
    * earliest right row at or after it ("next event").
    */
  sealed trait AsofDirection
  case object AsofBackward extends AsofDirection
  case object AsofForward extends AsofDirection

  /** As-of join: for every left row, the latest right row with
    * `rightTime <= leftTime` (backward, default) — or the earliest with
    * `rightTime >= leftTime` (forward) — within the same `partitionKey`.
    *
    * Implementation is the union + windowed last-value pattern, NOT a
    * range join: tag both sides, union them, sort within each key by
    * (time, side) — time descending for the forward direction — and
    * carry the most recent right payload forward with
    * `last(ignoreNulls)`. One shuffle on the key, linear in rows —
    * where a naive `l.join(r, l.t >= r.t)` range join is quadratic and
    * a per-key collect is driver-bound. This is how as-of joins stay
    * viable on 100 TB tick/event data.
    *
    * @param valueCols right-side columns to carry (renamed as given)
    */
  def asof(
      left: DataFrame, right: DataFrame,
      partitionKey: String, leftTime: String, rightTime: String,
      valueCols: Map[String, String],
      direction: AsofDirection = AsofBackward): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1)) // right sorts before left on ties
    val rTagged = valueCols.foldLeft(
      right.select((col(partitionKey) +: col(rightTime).as("__t") +:
        valueCols.keys.toSeq.map(col)): _*)
        .withColumn("__side", lit(0))) { case (df, (from, to)) =>
      df.withColumnRenamed(from, s"__v_$to")
    }
    val unioned = lTagged.unionByName(
      rTagged, allowMissingColumns = true)
    val timeOrder = direction match {
      case AsofBackward => col("__t").asc
      case AsofForward  => col("__t").desc
    }
    val w = Window.partitionBy(col(partitionKey))
      .orderBy(timeOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.values.foldLeft(unioned) { (df, to) =>
      df.withColumn(to, last(col(s"__v_$to"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.values.map(col): _*)
  }

  /** Range (interval) join: every left "point" row paired with every
    * right interval row satisfying `start <= point < end`, with NO
    * equi-key required. A naive `points.join(intervals, pt >= lo && pt <
    * hi)` plans as a broadcast-nested-loop / cartesian product —
    * quadratic and undistributable. Here both sides are binned into
    * fixed-width buckets of `binSize` (same unit as the point column):
    * each interval explodes into every bin it covers, each point lands
    * in exactly one bin, and a bucket equi-join + residual predicate
    * finds each qualifying pair exactly once (a pair can only meet in
    * the point's own bin — no distinct pass needed). The shuffle is
    * keyed on the bin, so parallelism follows the value/time domain;
    * `binSize` should be on the order of the typical interval width so
    * intervals explode into O(1) bins. Optional `equiKeys` (columns
    * present on both sides) tighten the join key further.
    *
    * Both range columns and the point column must be numeric (callers
    * convert timestamps via `unix_micros`). End is exclusive; empty
    * intervals (end <= start) are dropped.
    */
  def rangeJoin(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binSize: Long, equiKeys: Seq[String] = Nil): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val p = points.withColumn("__bin", floor(col(pointCol) / binSize))
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bin",
        explode(sequence(floor(col(startCol) / binSize),
          floor((col(endCol) - 1) / binSize))))
    p.join(iv, Seq("__bin") ++ equiKeys)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }

  /** Skew-safe equi-join of a skewed big side against a smaller (but not
    * broadcastable) side: the big side's hot keys are spread over
    * `saltBuckets` sub-keys and the small side replicated across them,
    * so no single reducer receives a whole hot key. AQE's skew-join
    * handles this adaptively when enabled; explicit salting is the
    * deterministic fallback for pathological keys and for engines/runs
    * without AQE. Inner-join semantics.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame,
      key: String, saltBuckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)).cast("int"))
    val salts = spread(small, saltBuckets)
    saltedBig.join(salts, Seq(key, "__salt")).drop("__salt")
  }

  private def spread(small: DataFrame, saltBuckets: Int): DataFrame =
    small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1)).cast("array<int>")))

  /** Run `body` with AQE's skew-join split reachable at test scale: the
    * default skewed-partition thresholds target ~256 MB shuffle
    * partitions, which nothing at validation scale ever trips, so the
    * adaptive path would go permanently unexercised. Lowers the byte
    * thresholds, disables broadcast so the join stays sort-merge (the
    * only shape OptimizeSkewedJoin rewrites), and forces the split even
    * when it adds a downstream shuffle. Every touched conf is restored
    * after. At production scale the DEFAULTS are right — this helper
    * exists so the adaptive first line of defense (before explicit
    * [[saltedJoin]]) can be asserted in gates, not just trusted.
    */
  def withSkewTunedAqe[T](spark: org.apache.spark.sql.SparkSession,
      thresholdBytes: Long = 65536)(body: => T): T = {
    val tuned = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> thresholdBytes.toString,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> (thresholdBytes / 4).toString,
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Bloom-prefiltered equi-join: when `small` is selective but too big
    * to broadcast as a hash relation, build a Bloom filter over its join
    * keys (one pass, fixed bits) and prefilter `big` BEFORE the shuffle —
    * at the 100 TB design point this is the difference between shuffling
    * the whole fact table and shuffling only the ~matching slice (plus
    * the false-positive margin `fpp`). No false negatives, so the final
    * equi-join result is byte-identical to the unfiltered join; the
    * filter evaluates inside the scan stage, pushdown-adjacent.
    */
  def bloomPrefilteredJoin(
      big: DataFrame, small: DataFrame, key: String,
      expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    // bloom_filter_agg yields a null buffer over zero rows (NPE in
    // BloomFilter.readFrom) — an empty small side means an empty join
    if (small.isEmpty) return big.limit(0).join(small, Seq(key))
    val bloom = small.stat.bloomFilter(key, expectedKeys, fpp)
    val bytes = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bytes)
    // Native BloomFilterMightContain (SQL `might_contain`) instead of a
    // Scala UDF: the expression codegens to a direct mightContainLong call
    // inside the scan's WholeStageCodegen span — a UDF at this exact spot
    // breaks codegen fusion at the point whose whole purpose is scan
    // throughput. The filter travels as a constant binary literal, the
    // same shape Spark's own InjectRuntimeFilter produces.
    val mightContain = org.apache.spark.sql.GraftBridge.column(
      new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(
          bytes.toByteArray, org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.GraftBridge.expression(col(key).cast("long"))))
    big.filter(mightContain).join(small, Seq(key))
  }
}
