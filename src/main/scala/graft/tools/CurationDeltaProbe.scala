package graft.tools

import graft.drivers.ParquetDestinationDriver
import graft.streaming.StreamingCuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: decompose the incremental curation pipeline's per-batch
  * wall time — land + runDagIncremental per batch, timed per phase, with
  * the mix stage's share isolated by timing a run that stops after
  * langid. Run via `java -cp "<spark jars>:target/scala-2.13/classes"
  * graft.tools.CurationDeltaProbe [sfDir]`.
  */
object CurationDeltaProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val base = java.nio.file.Files.createTempDirectory("cur_probe").toString
    val mm = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1) + 1L)
    val step = math.max(1L, (hi - lo + 2) / 3)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    (0 until 3).foreach { i =>
      println(s"batch $i:")
      t("land") {
        docs.filter(col("doc_id") >= lo + i * step && col("doc_id") < lo + (i + 1) * step)
          .write.mode("overwrite").parquet(s"$base/landed/batch_$i")
      }
      // replicate runDagIncremental's loop with per-stage timing
      t("runDagIncremental (per stage)") {
        val migs0 = graft.exec.CurationPipeline.incrementalMigrations(s"$base/stages")
        val mapper = new graft.mapper.MappingStore(s"$base/map")
        val refs = new graft.exec.ReferenceStore(mapper)
        val ex = new graft.exec.MigrationExecutor(mapper, refs, graft.exec.PruneOrphans)
        val d = new ParquetDestinationDriver
        try {
          var delta = spark.read.parquet(s"$base/landed/batch_$i").persist()
          migs0.init.foreach { m =>
            val stageIn = delta
            val res = t(s"  ${m.spec.name}") {
              ex.executeDelta(spark, m, new graft.drivers.SourceDriver {
                def read(s: SparkSession, sp: graft.spec.MigrationSpec) = stageIn
              }, d)
            }
            delta = res.finalSnapshot
          }
          val mix = migs0.last
          val langidState2 = d.morSnapshot(spark, migs0(3).spec).get
          t(s"  ${mix.spec.name} (full recompute)") {
            ex.execute(spark, mix, new graft.drivers.SourceDriver {
              def read(s: SparkSession, sp: graft.spec.MigrationSpec) = langidState2
            }, d)
          }
        } finally { ex.release(); refs.release() }
      }
    }
    // isolate mix: a second identical run timed with per-stage prints via
    // a poor-man's wrapper is overkill; instead time the mix recompute
    // alone against the final langid state
    val dest = new ParquetDestinationDriver
    val migs = graft.exec.CurationPipeline.migrations(s"$base/stages")
    val langidState = dest.morSnapshot(spark, migs(3).spec).get
    t("mix recompute alone (4th run)") {
      val mapper = new graft.mapper.MappingStore(s"$base/map")
      val refs = new graft.exec.ReferenceStore(mapper)
      val ex = new graft.exec.MigrationExecutor(mapper, refs, graft.exec.PruneOrphans)
      try ex.execute(spark, migs.last, new graft.drivers.SourceDriver {
        def read(s: SparkSession, sp: graft.spec.MigrationSpec) = langidState
      }, dest) finally { ex.release(); refs.release() }
    }
    t("mapping record alone (ingest table re-record)") {
      val mapper = new graft.mapper.MappingStore(s"$base/map")
      val m = mapper.load(spark, migs.head.spec).get
      mapper.record(spark, migs.head.spec,
        m.select(col("source_doc_id"), col("dest_did")), "migrated")
    }
    spark.stop()
  }
}
