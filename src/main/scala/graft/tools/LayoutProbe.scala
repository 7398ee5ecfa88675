package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Dev probe (r19 task 1): time the three shared dedup staging frames
  * SEPARATELY at a given SF and storage tier, so the layout entry's
  * wall time attributes to its components (shingle explode vs near-dup
  * pair join vs window explode) instead of one opaque number.
  *
  * Usage: graft.tools.LayoutProbe <sfDir> [mem|disk] [nopairs]
  * (`nopairs` skips the near-dup pair join — at sf100 the ScaleUp
  * replica cliques make its OUTPUT ~C(1000,2)·5000 ≈ 2.5 B pair rows,
  * output-quadratic by corpus construction; the shingle/window
  * components are the cache-capacity story this probe attributes.)
  */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/tmp/graft_sf10")
    val tier = if (args.length > 1 && args(1) == "mem")
      StorageLevel.MEMORY_AND_DISK else StorageLevel.DISK_ONLY
    val noPairs = args.contains("nopairs")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def timed(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[layout] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s, $n rows")
      n
    }
    val sh = graft.ops.Dedup.shingleTable(docs, "text", "doc_id", 5).persist(tier)
    timed("shingles")(sh.count())
    // the bounded EDGE layout (r20: the production cluster path) — its
    // row count against `pairs` below IS the task-1 economics claim:
    // edges grow ~linearly with the corpus while the full pair set is
    // output-quadratic in clique size
    val edges = graft.ops.Dedup.ngramJaccardEdgesBounded(
      docs, "text", "doc_id", k = 5, minJaccard = 0.8,
      precomputedShingles = Some(sh)).persist(tier)
    timed("edges")(edges.count()): Unit
    if (!noPairs) {
      val pairs = graft.ops.Dedup.ngramJaccardPairs(
        docs, "text", "doc_id", k = 5, minJaccard = 0.8,
        precomputedShingles = Some(sh)).persist(tier)
      timed("pairs")(pairs.count()): Unit
    }
    val win = graft.ops.Dedup.windowTable(docs, "text", "doc_id", 20).persist(tier)
    timed("windows")(win.count())
    spark.stop()
  }
}
