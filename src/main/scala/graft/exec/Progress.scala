package graft.exec

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Live migration progress — the distributed replacement for the
  * reference's per-row console progress bar
  * (`/root/reference/src/Command/MigrateCommand.php:186` counts the
  * source up front and advances a bar per transformed row).
  *
  * A per-row bar is meaningless on a cluster (rows stream through many
  * executors inside fused stages), so the honest signal is scheduler
  * progress: tasks completed / tasks submitted across every job the
  * migration triggers, throttled to one line per `everyMs`. The
  * reference's up-front `count()` survives as `SourceDriver.count`
  * (pushed down to the database where the driver supports a user COUNT
  * statement) and can be printed alongside by the caller.
  *
  * Scale note: listener callbacks run on the driver's listener bus —
  * O(1) work per task event, no executor involvement, safe at any
  * cluster size.
  */
final class MigrationProgressListener(
    label: String,
    everyMs: Long = 2000L,
    out: String => Unit = s => System.err.println(s)) extends SparkListener {
  private val tasksDone = new java.util.concurrent.atomic.AtomicLong
  private val tasksTotal = new java.util.concurrent.atomic.AtomicLong
  private val lastPrint = new java.util.concurrent.atomic.AtomicLong(0L)
  private val startedAt = System.currentTimeMillis

  def done: Long = tasksDone.get
  def total: Long = tasksTotal.get

  override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
    tasksTotal.addAndGet(s.stageInfo.numTasks.toLong)
    ()
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val d = tasksDone.incrementAndGet()
    val now = System.currentTimeMillis
    val prev = lastPrint.get
    if (now - prev >= everyMs && lastPrint.compareAndSet(prev, now)) {
      val t = math.max(tasksTotal.get, d)
      out(f"[a2b-spark] $label: tasks $d/$t (${d * 100 / t}%%), ${(now - startedAt) / 1000}s")
    }
  }

  /** Final summary line (always printed, regardless of throttle). */
  def summary(): String =
    f"[a2b-spark] $label: done — ${tasksDone.get} tasks in ${(System.currentTimeMillis - startedAt) / 1000}s"
}

object MigrationProgress {
  /** Run `body` with a progress listener attached for `label`; always
    * detaches, prints a final summary through `out`.
    */
  def withProgress[T](
      spark: SparkSession, label: String,
      everyMs: Long = 2000L,
      out: String => Unit = s => System.err.println(s))(body: => T): T = {
    val l = new MigrationProgressListener(label, everyMs, out)
    spark.sparkContext.addSparkListener(l)
    try body
    finally {
      spark.sparkContext.removeSparkListener(l)
      out(l.summary())
    }
  }
}
