package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.{DataFrame, GraftBridge}

/** Grouped top-k as a first-class operator — rung (c) of the
  * custom-operator ladder (`LogicalPlan` + `SparkStrategy` + `SparkPlan`),
  * used where composition genuinely loses: the standard
  * `row_number().over(Window.partitionBy(key).orderBy(ord)) <= k`
  * formulation SORTS EVERY GROUP IN FULL and shuffles every row to do it.
  * This operator keeps a bounded heap of k rows per key:
  *
  *   - a PARTIAL pass runs before the exchange, reducing each input
  *     partition to ≤ k rows per key — at the 100 TB design point the
  *     shuffle then carries `k × keys × partitions` rows instead of the
  *     whole fact table (the same partial-aggregation shape Spark gives
  *     `max()`, applied to "k best rows");
  *   - a FINAL pass after a hash exchange on the key merges the
  *     partials exactly.
  *
  * Top-k is a semilattice reduction (merge of per-partition top-ks is
  * the global top-k), so the two-phase split is exact, not approximate.
  * Ties are broken by the caller-supplied sort columns; supply a unique
  * tie-breaker (e.g. the row id) for fully deterministic output.
  */
final case class TopKPerKey(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    maxKeysInMemory: Int = TopKPerKey.DefaultMaxKeysInMemory) extends UnaryNode {
  require(k > 0, "k must be positive")
  require(maxKeysInMemory > 0, "maxKeysInMemory must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKey {
  /** Keys held in memory per partition before the operator flushes its
    * heaps downstream (see [[TopKPerKeyExec]]). Override per session via
    * `graft.topk.maxKeysPerPartition`.
    */
  val DefaultMaxKeysInMemory: Int = 1 << 20
}

/** Bounded-memory execution, different strategy per phase:
  *
  *   - PARTIAL (pre-exchange): per-partition key→heap map capped at
  *     `maxKeysInMemory` keys — when a high-cardinality key space
  *     exceeds it, the current heaps are EMITTED downstream and the map
  *     resets (the same reason Spark's hash aggregate spills). A flushed
  *     partial may emit more than k rows for a key from one partition;
  *     the exchange re-clusters them and the final phase merges exactly.
  *     The flush path is spec-covered with maxKeysInMemory = 1.
  *   - FINAL (post-exchange): SORT-BASED streaming — required child
  *     ordering on (keys, sort order) means rows of one key arrive
  *     adjacent and already ranked, so the operator just emits the
  *     first k per key group in O(1) memory; the sort itself runs over
  *     the pre-reduced partials through Spark's spill-safe external
  *     sort. No unbounded state in either phase.
  */
final case class TopKPerKeyExec(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    isPartial: Boolean,
    maxKeysInMemory: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (isPartial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (isPartial) Seq(Nil)
    else Seq(groupExprs.map(SortOrder(_, Ascending)) ++ sortOrder)

  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    if (isPartial) Nil
    else groupExprs.map(SortOrder(_, Ascending)) ++ sortOrder

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numGroups" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of key groups"))

  protected override def doExecute(): RDD[InternalRow] =
    if (isPartial) doExecutePartial() else doExecuteFinal()

  private def doExecutePartial(): RDD[InternalRow] = {
    val out = child.output
    val keyExprs = groupExprs
    val so = sortOrder
    val kk = k
    val maxKeys = maxKeysInMemory
    val outputRows = longMetric("numOutputRows")
    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(keyExprs, out)
      val ord = RowOrdering.create(so, out)
      // heap head = the WORST kept row (largest under the sort order):
      // evict it when a better row arrives and the heap is full
      val rev: java.util.Comparator[InternalRow] = ord.reverse
      new Iterator[InternalRow] {
        private var heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        private var pending: Iterator[InternalRow] = Iterator.empty

        private def drain(): Iterator[InternalRow] = {
          import scala.jdk.CollectionConverters._
          val h = heaps
          heaps = new java.util.HashMap()
          h.values().iterator().asScala.flatMap { q =>
            outputRows += q.size().toLong
            q.iterator().asScala
          }
        }

        private def refill(): Unit =
          while (!pending.hasNext && (rows.hasNext || !heaps.isEmpty)) {
            var flushed = false
            while (!flushed && rows.hasNext) {
              val r = rows.next()
              val key = keyProj(r)
              var h = heaps.get(key)
              if (h == null) {
                h = new java.util.PriorityQueue[InternalRow](kk + 1, rev)
                heaps.put(key.copy(), h)
              }
              if (h.size < kk) h.offer(r.copy())
              else if (ord.compare(r, h.peek()) < 0) { h.poll(); h.offer(r.copy()) }
              if (heaps.size() >= maxKeys) { pending = drain(); flushed = true }
            }
            if (!flushed && !rows.hasNext) pending = drain()
          }

        override def hasNext: Boolean = { if (!pending.hasNext) refill(); pending.hasNext }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          pending.next()
        }
      }
    }, preservesPartitioning = true)
  }

  private def doExecuteFinal(): RDD[InternalRow] = {
    val out = child.output
    val keyExprs = groupExprs
    val kk = k
    val outputRows = longMetric("numOutputRows")
    val groups = longMetric("numGroups")
    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(keyExprs, out)
      // input is clustered AND sorted by (keys, order): stream key
      // groups, emit the first k rows of each
      var currentKey: UnsafeRow = null
      var emitted = 0
      rows.flatMap { r =>
        val key = keyProj(r)
        if (currentKey == null || key != currentKey) {
          currentKey = key.copy()
          emitted = 0
          groups += 1
        }
        if (emitted < kk) { emitted += 1; outputRows += 1; Some(r) }
        else None
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] as partial → (exchange via required
  * distribution) → final.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child, maxKeys) =>
      val partial = TopKPerKeyExec(keys, order, k, isPartial = true, maxKeys, planLater(child))
      TopKPerKeyExec(keys, order, k, isPartial = false, maxKeys, partial) :: Nil
    case _ => Nil
  }
}

/** Library entry point: top `k` rows per key group under `orderBy`
  * (`(column, ascending)`), registered on the session's experimental
  * strategies on first use (also injectable cluster-wide through
  * `graft.functions.GraftExtensions`).
  */
object GroupedTopK {
  def apply(
      df: DataFrame, keys: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(keys.nonEmpty && orderBy.nonEmpty)
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.experimental.extraStrategies.exists(_ eq TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute = child.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not among ${child.output.map(_.name).mkString(", ")}"))
    val sorts = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    val maxKeys = spark.conf.getOption("graft.topk.maxKeysPerPartition")
      .map(_.toInt).getOrElse(TopKPerKey.DefaultMaxKeysInMemory)
    GraftBridge.dataset(spark, TopKPerKey(keys.map(attr), sorts, k, child, maxKeys))
  }
}
