package graft.tools

import graft.drivers.{DestinationDriver, ParquetDestinationDriver, SourceDriver}
import graft.exec.{KeepOrphans, Migration, MigrationExecutor, TransformContext}
import graft.mapper.MappingStore
import graft.spec.{ConcurrentPublishException, IdField, LongId, MigrationSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ONE optimistic writer process for the cross-JVM CAS contention probe
  * (r16 verdict task 8: `etl_concurrent_writers` races two threads in
  * one JVM; the real lost-update risk is two spark-submits, where no
  * shared JVM lock can save a broken protocol — only the filesystem
  * CAS markers can).
  *
  * Launched twice (markers `a`/`b`) by DriversSpec's companion test
  * against one seeded destination. Both processes observe the SAME base
  * generation before either writes — a file barrier inside the
  * destination wrapper's `snapshot()` (`_snap_<marker>` handshake)
  * pins the interleave — so exactly one CAS flip must lose. The loser
  * re-reads, re-merges, retries through the plain driver (the
  * ConcurrentPublishException contract). Each process emits one JSON
  * line: marker, conflict count, final published generation.
  *
  * Mapping dirs are per-writer: the destination CAS is the contended
  * surface under test; the mapping table (bookkeeping only here — the
  * transform emits natural ids) has its own per-JVM serialization that
  * a cross-process mapping race would need its own protocol for.
  *
  * Usage: `graft.tools.CasWriterProbe <base> <sfDir> <a|b> <mod>`
  */
object CasWriterProbe {
  def main(args: Array[String]): Unit = {
    val Array(base, sfDir, marker, modS) = args.take(4)
    val mod = modS.toInt
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val theSpec = MigrationSpec("cas_upsert", source = "", sourceDriver = "inline",
      destination = s"$base/dest", destinationDriver = "parquet",
      sourceIds = Seq(IdField("c_custkey", LongId)),
      destinationIds = Seq(IdField("id", LongId)))
    val shape: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (marker == "a") upper(_) else lower(_)
    val mig = new Migration {
      def spec: MigrationSpec = theSpec
      def transform(src: DataFrame, ctx: TransformContext): DataFrame =
        src.select(col("c_custkey"), col("c_custkey").as("id"),
          shape(col("c_name")).as("name"), lit(marker).as("marker"))
    }
    val src = new SourceDriver {
      def read(s: SparkSession, sp: MigrationSpec): DataFrame =
        s.read.parquet(s"$sfDir/customer.parquet")
          .filter(col("c_custkey") % 5 === 0 && col("c_custkey") % mod === 0)
    }
    val dest = new ParquetDestinationDriver(optimistic = true)
    val other = if (marker == "a") "b" else "a"
    val mine = java.nio.file.Paths.get(base, s"_snap_$marker")
    val theirs = java.nio.file.Paths.get(base, s"_snap_$other")
    val barriered = new AtomicBoolean(false)
    val sync = new DestinationDriver {
      def snapshot(s: SparkSession, sp: MigrationSpec): Option[DataFrame] = {
        val snap = dest.snapshot(s, sp)
        if (barriered.compareAndSet(false, true)) {
          // both writers have now OBSERVED the same published base;
          // neither may write until the other has observed it too
          java.nio.file.Files.createFile(mine)
          val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
          while (!java.nio.file.Files.exists(theirs) && System.nanoTime() < deadline)
            Thread.sleep(50)
        }
        snap
      }
      def write(df: DataFrame, sp: MigrationSpec): Unit = dest.write(df, sp)
      override def overwriteIsReadSafe: Boolean = dest.overwriteIsReadSafe
      override def snapshotIsStableAcrossWrites: Boolean = dest.snapshotIsStableAcrossWrites
    }
    val mapper = new MappingStore(s"$base/map_$marker")
    val refs = new graft.exec.ReferenceStore(mapper)
    val exec = new MigrationExecutor(mapper, refs, KeepOrphans)
    // Retry-until-published, the real optimistic-concurrency contract:
    // a single retry is NOT enough cross-process — the loser's re-read
    // can land in the window after the winner created its CAS marker
    // but before the pointer flip, where the loser rolls the winner
    // forward (the redo stance) and must concede a SECOND time before
    // it finally observes the advanced pointer. Progress is guaranteed
    // (each concession means a rival published), so the bound is just
    // a tripwire against protocol livelock.
    var conflicts = 0
    try {
      var published = false
      var drv = sync: DestinationDriver
      while (!published) {
        try { exec.execute(spark, mig, src, drv): Unit; published = true }
        catch {
          case _: ConcurrentPublishException =>
            conflicts += 1
            require(conflicts <= 10,
              s"writer $marker conceded 10 times against one rival - livelock")
            drv = dest // re-read + re-merge + retry (no barrier on retries)
        }
      }
    } finally { exec.release(); refs.release() }
    val finalGen = dest.currentGeneration(spark, theSpec).getOrElse(-1L)
    // single JSON line on stdout — the DriversSpec companion parses it
    println(s"""{"marker":"$marker","conflicts":$conflicts,"final_gen":$finalGen}""")
    spark.stop()
  }

  private type AtomicBoolean = java.util.concurrent.atomic.AtomicBoolean
}
