package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r19 task 4): the sampled semantic certificate's internals
  * at a given SF — sampled-truth size, assignment-recall hits, the
  * recall point estimate and its Wilson 95% lower bound — so an empty
  * emission at a probe decade attributes to "truth sample empty" vs
  * "Wilson gate failed" (routing recall loss), instead of one opaque
  * zero. Mirrors DedupQueries.sampledSemanticCertificate exactly.
  *
  * Usage: graft.tools.CertProbe [sfDir]
  */
object CertProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val truth = graft.ops.Similarity.sampledExactPairs(
      e, "vec_id", "embedding", minSim = 0.4, pairBudget = 200000L).persist()
    val m = truth.count()
    val nVec = e.count()
    val kc = graft.ops.Similarity.scaledClusterCount(nVec)
    val assign = graft.ops.Similarity.clusterAssignments(
      e, "vec_id", "embedding",
      nClusters = kc, nProbe = graft.ops.Similarity.scaledNProbe(kc)).persist()
    val hits = truth.select(col("a"), col("b"))
      .join(assign.select(col("id").as("a"), col("cluster")), Seq("a"))
      .join(assign.select(col("id").as("b"), col("cluster")), Seq("b", "cluster"))
      .select(col("a"), col("b")).distinct().count()
    val p = if (m == 0) Double.NaN else hits.toDouble / m
    val z2 = 3.841459
    // m = 0 mirrors production's vacuous pass (certRow.isNullAt -> 1.0),
    // NOT a gate failure — the distinction this probe exists to make
    val wilson = if (m == 0) 1.0 else
      (p + z2 / (2.0 * m) - math.sqrt(z2) *
        math.sqrt(p * (1 - p) / m + z2 / (4.0 * m * m))) / (1 + z2 / m)
    println(f"[cert] sf=$sf nVec=$nVec k=${graft.ops.Similarity.scaledClusterCount(nVec)} " +
      f"truth=$m hits=$hits p=$p%.4f wilson_lower=$wilson%.4f emits=${wilson >= 0.7}")
    assign.unpersist(); truth.unpersist()
    spark.stop()
  }
}
