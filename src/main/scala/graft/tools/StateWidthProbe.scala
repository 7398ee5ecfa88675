package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev probe (r22, streaming state-width right-sizing): run registry
  * streaming gates and report, from the engine's own progress events,
  * what the optimization actually changes and what it must NOT change —
  * per stateful operator: the state/shuffle partition width and state
  * store instance count (the fixed cost), and per query: the number of
  * triggers/batches executed (the semantics — must be identical before
  * and after). `GRAFT_STREAM_SHUFFLE_PARTITIONS` pins the width for the
  * "before" leg (32 = the old cpus-coupled behavior); unset, the gates
  * run the adaptive volume-derived width.
  *
  * Usage: graft.tools.StateWidthProbe <sfDir> <gate1,gate2,...>
  */
object StateWidthProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val gates = (if (args.length > 1) args(1) else "stream_recovery")
      .split(',').filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // progress accounting across every streaming query the gate starts
    val batches = new java.util.concurrent.atomic.AtomicLong
    val opLines = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        batches.incrementAndGet()
        e.progress.stateOperators.foreach { op =>
          opLines.add(s"op=${op.operatorName} shufflePartitions=${op.numShufflePartitions} " +
            s"stateStoreInstances=${op.numStateStoreInstances}")
        }
      }
    })
    val width = sys.env.get("GRAFT_STREAM_SHUFFLE_PARTITIONS")
      .map(w => s"pinned=$w").getOrElse("adaptive")
    println(s"# StateWidthProbe sf=$sfDir cpus=$cpus width=$width")
    gates.foreach { g =>
      batches.set(0L); opLines.clear()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(g)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"$g: rows=$n wall=$wall%.2f triggers_with_progress=${batches.get}")
      import scala.jdk.CollectionConverters._
      opLines.asScala.toSeq.sorted.foreach(l => println(s"  $l"))
    }
    spark.stop()
  }
}
