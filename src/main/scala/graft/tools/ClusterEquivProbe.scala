package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r20 task 1): component equivalence of the BOUNDED
  * near-dup edge set (Dedup.ngramJaccardEdgesBounded — per-bucket
  * neighbor chains, linear output) against the FULL verified pair set
  * (Dedup.ngramJaccardPairs — quadratic in clique size) at a given SF:
  * edge/pair row counts, component labelings diffed exactly, and the
  * count of true pairs whose endpoints split across bounded components
  * (the only possible failure mode — bounded edges are a subset, so
  * components can only split, never merge).
  *
  * Usage: graft.tools.ClusterEquivProbe [sfDir] [maxLead[,maxLead...]]
  * (a comma list sweeps maxLead over ONE shared pair set — the r20
  * verdict's task-7 sensitivity curve: the certificate's residual as a
  * measured function of maxLead, not a point at 2)
  */
object ClusterEquivProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val maxLeads = (if (args.length > 1) args(1) else "2")
      .split(',').map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sh = graft.ops.Dedup.shingleTable(docs, "text", "doc_id", 5).persist()
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[equiv] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val pairs = graft.ops.Dedup.ngramJaccardPairs(
      docs, "text", "doc_id", k = 5, minJaccard = 0.8,
      precomputedShingles = Some(sh)).persist()
    val nPairs = timed("full pairs")(pairs.count())
    val full = graft.ops.Dedup.clusters(pairs).persist()
    for (maxLead <- maxLeads) {
      val edges = graft.ops.Dedup.ngramJaccardEdgesBounded(
        docs, "text", "doc_id", k = 5, minJaccard = 0.8,
        precomputedShingles = Some(sh), maxLead = maxLead).persist()
      val nEdges = timed(s"bounded edges maxLead=$maxLead")(edges.count())
      val bounded = graft.ops.Dedup.clusters(edges).persist()
      val diff = full.withColumnRenamed("rep", "rep_full")
        .join(bounded.withColumnRenamed("rep", "rep_bounded"), Seq("doc_id"), "full")
        .filter(not(col("rep_full") <=> col("rep_bounded")))
        .count()
      // true pairs whose endpoints land in different bounded components
      val split = pairs.select(col("a"), col("b"))
        .join(bounded.select(col("doc_id").as("a"), col("rep").as("ra")), Seq("a"), "left")
        .join(bounded.select(col("doc_id").as("b"), col("rep").as("rb")), Seq("b"), "left")
        .filter(not(col("ra") <=> col("rb")))
        .count()
      println(s"[equiv] sf=$sf maxLead=$maxLead pairs=$nPairs edges=$nEdges " +
        s"(${if (nPairs == 0) 1.0 else nEdges.toDouble / nPairs}) " +
        s"labelDiffs=$diff splitTruePairs=$split " +
        s"equivalent=${diff == 0 && split == 0}")
      edges.unpersist(); bounded.unpersist()
    }
    spark.stop()
  }
}
