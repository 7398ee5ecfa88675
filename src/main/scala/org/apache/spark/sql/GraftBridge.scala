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
    * action without racing the asynchronous bus.
    */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Wrap a LogicalPlan as a DataFrame (for custom logical operators). */
  def dataset(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
