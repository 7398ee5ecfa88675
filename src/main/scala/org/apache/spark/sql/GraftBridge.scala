/* Bridge into Spark's private[sql] Column internals.
 *
 * Spark 4 made `Column` implementation-agnostic (ColumnNode-based); the
 * classic Expression<->Column converters live behind private[sql]. Like
 * many Spark extension libraries, we place one tiny accessor in the
 * org.apache.spark.sql package to lift custom Catalyst Expressions into
 * Columns and back. No Spark behavior is modified.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftBridge {
  /** Wrap a Catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = Column(classic.ExpressionColumnNode(e))

  /** Resolve a Column back to its Catalyst Expression (classic engine). */
  def expression(c: Column): Expression = classic.ColumnConversions.expression(c)

  /** Block until the listener bus has delivered every queued event —
    * lets callers read SparkListener-maintained counters right after an
    * action without racing the asynchronous bus. Best-effort with a
    * bounded wait: `waitUntilEmpty` waits on EVERY queue of the shared
    * bus (UI, event log, unrelated listeners), so on a busy session it
    * can time out long after the caller's own events landed — and a
    * drain hiccup must never fail work that already completed. Callers
    * read marginally-stale counters in that case, nothing worse.
    */
  def drainListenerBus(spark: SparkSession, timeoutMs: Long = 10000L): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }

  /** Wrap a LogicalPlan as a DataFrame (for custom logical operators). */
  def dataset(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
