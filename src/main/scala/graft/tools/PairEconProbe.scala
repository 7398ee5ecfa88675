package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measured candidate ratio and recall of the coarse-band
  * embedding-pair scale path (`Similarity.bandCandidates` +
  * `verifyPairs`) against the exact verification tier, at a given
  * banding — the measurement behind `dedup_embedding_cosine_cut`'s
  * gate bounds. Run via `java -cp "<spark jars glob>:target/...classes"
  * graft.tools.PairEconProbe [sfdir] [bands] [bitsPerBand]`.
  */
object PairEconProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bands = if (args.length > 1) args(1).toInt else 10
    val bits = if (args.length > 2) args(2).toInt else 6
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val n = e.count()
    val exact = graft.ops.Similarity.cosinePairs(
      e, "vec_id", "embedding", dim = 64, minSim = 0.4)
    val cand = graft.ops.Similarity.bandCandidates(
      e, "vec_id", "embedding", dim = 64, bands = bands, bitsPerBand = bits)
    val cut = graft.ops.Similarity.verifyPairs(e, "vec_id", "embedding", cand, 0.4)
    val nExact = exact.count()
    val nCand = cand.count()
    val nHit = exact.select(col("a"), col("b"))
      .join(cut.select(col("a"), col("b")), Seq("a", "b")).count()
    val allPairs = n.toDouble * (n - 1) / 2
    println(f"sf=$sf bands=$bands bits=$bits n=$n exact=$nExact " +
      f"cand=$nCand ratio=${nCand / allPairs}%.4f recall=${nHit.toDouble / nExact}%.4f")
    spark.stop()
  }
}
