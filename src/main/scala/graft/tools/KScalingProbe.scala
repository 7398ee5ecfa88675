package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev microbench (r20 task 2): assignment cost vs cluster count k at
  * FIXED n — the exponent behind the scaledClusterCount rebalance.
  * Routed assignment does O(k^(3/4)) candidate distances per vector
  * (⌈√kCoarse⌉ cells × ~√k fine centroids per cell), so doubling k
  * should multiply assignment wall time by ~2^(3/4) ≈ 1.68, not 2 —
  * and the sizing rule k = min(n/500, n^(4/7)) then bounds the total
  * at O(n·k^(3/4)) = O(n^(10/7)), balanced against the per-cluster
  * verify quadratic n²/k. Each k is timed twice (warm JVM), best-of-2,
  * counting the assignment output to force the full flatMap.
  *
  * Usage: graft.tools.KScalingProbe [sfDir] [k1,k2,...]
  */
object KScalingProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/tmp/graft_sf10")
    val ks = (if (args.length > 1) args(1) else "500,1000,2000,4000,8000")
      .split(",").map(_.trim.toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sf/embeddings.parquet").persist()
    val n = e.count()
    println(s"[kscale] sf=$sf n=$n ks=${ks.mkString(",")}")
    var prev = Option.empty[(Int, Double)]
    for (k <- ks) {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.ops.Similarity.clusterAssignments(
          e, "vec_id", "embedding",
          nClusters = k, nProbe = graft.ops.Similarity.scaledNProbe(k)).count()
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      val ratio = prev.map { case (pk, pt) =>
        f" ratio=${best / pt}%.2f (k x${k.toDouble / pk}%.1f, k^0.75 predicts x${math.pow(k.toDouble / pk, 0.75)}%.2f)"
      }.getOrElse("")
      println(f"[kscale] k=$k nprobe=${graft.ops.Similarity.scaledNProbe(k)} best=$best%.1f s$ratio")
      prev = Some((k, best))
    }
    spark.stop()
  }
}
