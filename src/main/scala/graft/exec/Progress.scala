package graft.exec

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Live migration progress — the distributed replacement for the
  * reference's per-row console progress bar
  * (`/root/reference/src/Command/MigrateCommand.php:186` counts the
  * source up front and advances a bar per transformed row).
  *
  * A per-row bar is meaningless on a cluster (rows stream through many
  * executors inside fused stages), so the honest signal is scheduler
  * progress: tasks completed / tasks submitted across the jobs the
  * migration triggers, throttled to one line per `everyMs`. Counting is
  * scoped by a JOB GROUP: [[MigrationProgress.withProgress]] tags the
  * calling thread with a unique group id and the listener counts only
  * stages of jobs carrying that id — so concurrent migrations under
  * `executeAll(parallelism > 1)` (or any unrelated session activity)
  * never inflate each other's numbers. With `jobGroup = None` the
  * listener counts everything (whole-session mode).
  *
  * Totals come from each job's planned stages, so skipped/reused stages
  * can make the denominator an over-estimate — progress may finish
  * "early", never late.
  *
  * Scale note: listener callbacks run on the driver's listener bus —
  * O(1) work per event, no executor involvement, safe at any cluster
  * size.
  */
final class MigrationProgressListener(
    label: String,
    everyMs: Long = 2000L,
    out: String => Unit = s => System.err.println(s),
    jobGroup: Option[String] = None) extends SparkListener {
  private val tasksDone = new java.util.concurrent.atomic.AtomicLong
  private val tasksTotal = new java.util.concurrent.atomic.AtomicLong
  private val lastPrint = new java.util.concurrent.atomic.AtomicLong(0L)
  private val startedAt = System.currentTimeMillis
  private val myStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  // distinct (stageId, partition index) completions: under speculative
  // execution BOTH successful attempts of one task emit a Success
  // TaskEnd (likewise a task re-run by a stage re-attempt), and raw
  // increments would push `done` past the planned total
  private val doneTasks = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()

  def done: Long = tasksDone.get
  def total: Long = tasksTotal.get

  override def onJobStart(j: SparkListenerJobStart): Unit = {
    val grp = Option(j.properties).map(_.getProperty("spark.jobGroup.id")).orNull
    if (jobGroup.forall(_ == grp)) {
      j.stageInfos.foreach { si =>
        myStages.add(si.stageId)
        tasksTotal.addAndGet(si.numTasks.toLong)
      }
    }
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
    // successful completions only: a failed attempt emits a TaskEnd too,
    // and counting it would push `done` past the planned total on any
    // retry (tasksTotal counts each planned task once) — progress must
    // track work finished, not attempts made. Success alone is not
    // enough: a speculative duplicate attempt ALSO ends in Success, so
    // completions are deduplicated on (stageId, partition index).
    if (e.reason == org.apache.spark.Success &&
        (jobGroup.isEmpty || myStages.contains(e.stageId)) &&
        doneTasks.add((e.stageId.toLong << 32) | (e.taskInfo.index.toLong & 0xffffffffL))) {
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
  private val seq = new java.util.concurrent.atomic.AtomicLong

  /** Run `body` with a progress listener attached for `label`, counting
    * only the Spark jobs submitted from this thread inside `body` (a
    * unique job-group id is set for the duration and restored after —
    * nesting-safe). Always detaches the listener and prints a final
    * summary through `out`.
    */
  def withProgress[T](
      spark: SparkSession, label: String,
      everyMs: Long = 2000L,
      out: String => Unit = s => System.err.println(s))(body: => T): T =
    withProgressCounters(spark, label, everyMs, out)(body)._1

  /** [[withProgress]], additionally returning the listener's final
    * (tasksDone, tasksTotal) so programmatic callers — and the
    * correctness gate — can assert on the counters instead of parsing
    * console lines. Invariants on a completed body: done > 0 for any
    * body that ran a job, and done ≤ total (successful task completions
    * are deduplicated on (stage, partition), so a retried OR
    * speculatively duplicated task lands once, and totals come from
    * planned stages, so skipped/reused stages make the denominator an
    * over-estimate: progress finishes "early", never late).
    */
  def withProgressCounters[T](
      spark: SparkSession, label: String,
      everyMs: Long = 2000L,
      out: String => Unit = s => System.err.println(s))(body: => T): (T, Long, Long) = {
    val sc = spark.sparkContext
    val group = s"a2b-progress-$label-${seq.incrementAndGet()}"
    val l = new MigrationProgressListener(label, everyMs, out, Some(group))
    sc.addSparkListener(l)
    val prevGroup = sc.getLocalProperty("spark.jobGroup.id")
    sc.setLocalProperty("spark.jobGroup.id", group)
    try {
      val r = body
      // listener-bus events are asynchronous — drain before reading
      // the counters so a fast body can't observe a stale zero
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      (r, l.done, l.total)
    } finally {
      sc.setLocalProperty("spark.jobGroup.id", prevGroup)
      sc.removeSparkListener(l)
      out(l.summary())
    }
  }
}
