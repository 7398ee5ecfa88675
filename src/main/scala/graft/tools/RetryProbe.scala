package graft.tools

import graft.ops.Rank
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Task-retry determinism proof for the Rank two-job primitives and the
  * gates built on them. The primitives share one range shuffle across
  * two jobs (seed collect + final mapPartitions) with a re-count
  * tripwire instead of a persist; what no ordinary run exercises is a
  * TASK RETRY — a first attempt failing and the partition recomputing.
  * This probe runs under `local[8,2]` (spark.task.maxFailures = 2) and
  * injects a first-attempt failure via `TaskContext.attemptNumber`:
  *
  *   - upstream of the range shuffle (a MAP task retries before the
  *     shuffle registers);
  *   - downstream of the primitive (a RESULT task retries and re-reads
  *     the registered shuffle);
  *   - downstream of the full `q_exact_quantiles` / `q_ks_test` gates.
  *
  * Every poisoned run must produce BYTE-IDENTICAL output to its clean
  * twin, and the injection counter must prove the failure actually
  * fired. Exit 0 = all pass. The companion spec
  * (`graft.exec.RetryDeterminismSpec`) shells this out, because
  * maxFailures is a SparkContext-construction property the shared suite
  * session cannot change.
  *
  * Run: `java -cp "<spark jars glob>:target/scala-2.13/classes"
  * graft.tools.RetryProbe [sfdir]`
  */
object RetryProbe {

  /** Counts fired injections. A static, not an accumulator: Spark
    * deliberately DISCARDS accumulator updates from failed task
    * attempts, which is precisely the attempt this probe fires in;
    * local mode shares one JVM, so a plain static sees it.
    */
  val injected = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Re-emit `df` through a pass-through partition whose task THROWS on
    * its first attempt for partition 0 — the retry then streams the
    * rows untouched. Row order is preserved (pure pass-through).
    */
  private def poisonFirstAttempt(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    spark.createDataFrame(df.rdd.mapPartitions { it =>
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0) {
        RetryProbe.injected.incrementAndGet()
        throw new RuntimeException("RetryProbe: injected first-attempt task failure")
      }
      it
    }, schema)
  }

  /** Run `body`, requiring it to fire ≥1 injected failure. */
  private def withInjection(body: => Boolean): Boolean = {
    val before = injected.get()
    val ok = body
    ok && injected.get() > before
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8,2]") // the ,2 IS the point: task retries allowed
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var failures = 0
    def check(name: String)(body: => Boolean): Unit = {
      val ok =
        try body
        catch { case e: Throwable =>
          println(s"[retryprobe] $name threw: ${e.getMessage}"); false
        }
      println(s"[retryprobe] $name ${if (ok) "PASS" else "FAIL"}")
      if (!ok) failures += 1
    }

    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("q"))
    val sortCols = Seq(col("q"), col("l_orderkey"), col("l_linenumber"))

    val (baseRanked, nBase) = Rank.rankGlobalWithCount(li, sortCols, "r")
    val base = baseRanked.orderBy(col("r")).collect().map(_.toSeq).toSeq

    check("rankGlobal/map-stage-retry") {
      withInjection {
        val (ranked, n) = Rank.rankGlobalWithCount(poisonFirstAttempt(li), sortCols, "r")
        val out = ranked.orderBy(col("r")).collect().map(_.toSeq).toSeq
        n == nBase && out == base
      }
    }
    check("rankGlobal/result-stage-retry") {
      withInjection {
        val (ranked, n) = Rank.rankGlobalWithCount(li, sortCols, "r")
        val out = poisonFirstAttempt(ranked).orderBy(col("r")).collect().map(_.toSeq).toSeq
        n == nBase && out == base
      }
    }

    val sumsBase = Rank.runningSumsInclusive(li, sortCols, Seq("q"))
      .orderBy(col("q_cum")).collect().map(_.toSeq).toSeq
    check("runningSums/map-stage-retry") {
      withInjection {
        Rank.runningSumsInclusive(poisonFirstAttempt(li), sortCols, Seq("q"))
          .orderBy(col("q_cum")).collect().map(_.toSeq).toSeq == sumsBase
      }
    }
    check("runningSums/result-stage-retry") {
      withInjection {
        val sums = Rank.runningSumsInclusive(li, sortCols, Seq("q"))
        poisonFirstAttempt(sums).orderBy(col("q_cum"))
          .collect().map(_.toSeq).toSeq == sumsBase
      }
    }

    // the full gates the primitives serve (both totally ordered, so a
    // plain collect is a deterministic byte sequence)
    Seq("q_exact_quantiles", "q_ks_test").foreach { q =>
      val clean = graft.SparkEntry.queries(q)(spark, sf).collect().map(_.toSeq).toSeq
      check(s"$q/poisoned-retry") {
        withInjection {
          poisonFirstAttempt(graft.SparkEntry.queries(q)(spark, sf))
            .collect().map(_.toSeq).toSeq == clean
        }
      }
    }

    println(if (failures == 0) "[retryprobe] ALL PASS"
      else s"[retryprobe] $failures CHECK(S) FAILED")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
