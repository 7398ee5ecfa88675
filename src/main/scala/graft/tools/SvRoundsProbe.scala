package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Dev probe (r20 verdict task 5): per-round cost of the DISTRIBUTED
  * Shiloach–Vishkin components path across corpus decades. The r20
  * sf100 leg proved the edge LAYOUT linear, but components ran inside
  * EdgeScaleProbe's staged harness with no per-round attribution; this
  * probe builds the bounded near-dup edge layout at the given SF,
  * forces the distributed path (collectThreshold = 0) with per-round
  * logging on (`graft.clusters.logRounds` — merge+hook+compression
  * wall, inner jump count, labels still moving), and prints
  * rounds-to-converge and total wall: the O(log n) outer-bound
  * evidence with the checkpoint overhead included.
  *
  * Usage: graft.tools.SvRoundsProbe [sfDir]
  */
object SvRoundsProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("graft.clusters.logRounds", "true")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // DISK_ONLY staging: the decade corpora exceed single-JVM storage
    // memory (the r18 GC-thrash lesson); driver SFs just pay a cheap
    // local reread
    val sh = graft.ops.Dedup.shingleTable(docs, "text", "doc_id", 5)
      .persist(StorageLevel.DISK_ONLY)
    val t0 = System.nanoTime()
    val edges = graft.ops.Dedup.ngramJaccardEdgesBounded(
      docs, "text", "doc_id", k = 5, minJaccard = 0.8,
      precomputedShingles = Some(sh)).persist(StorageLevel.DISK_ONLY)
    val nEdges = edges.count()
    val tEdges = (System.nanoTime() - t0) / 1e9
    println(f"[svrounds] sf=$sf edges=$nEdges buildWall=$tEdges%.1f s")
    val t1 = System.nanoTime()
    val comps = graft.ops.Dedup.clusters(edges, collectThreshold = 0L)
    val nDocs = comps.count()
    println(f"[svrounds] sf=$sf docs=$nDocs svWall=${(System.nanoTime() - t1) / 1e9}%.1f s" +
      " (per-round breakdown on stderr: [clusters] lines)")
    spark.stop()
  }
}
