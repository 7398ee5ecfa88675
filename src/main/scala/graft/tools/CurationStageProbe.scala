package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (r22, r21 verdict task 3): run the stream_llm_pipeline
  * gate with per-stage wall logging on (`graft.curation.logStages`) so
  * the gate's aggregate wall attributes to its curation stages — the
  * layout-split pattern applied to the suite's biggest single entry.
  *
  * Usage: graft.tools.CurationStageProbe [sfDir]
  */
object CurationStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("graft.curation.logStages", "true")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("stream_llm_pipeline")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      System.err.println(f"[probe] run$i total=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
