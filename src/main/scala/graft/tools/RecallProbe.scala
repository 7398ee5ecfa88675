package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: recall@5 of the IVF+PQ tiers (raw codes vs residual codes)
  * at a given nlist/nprobe against the exact brute-force top-k — the
  * measurement behind the residual-coding gate configuration. Run via
  * `java -cp "<spark jars glob>:target/scala-2.13/classes"
  * graft.tools.RecallProbe [sfdir] [nlist] [nprobe]`.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nlist = if (args.length > 1) args(1).toInt else 64
    val nprobe = if (args.length > 2) args(2).toInt else 12
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = corpus.filter(col("vec_id") < 10)
    val exact = graft.ops.Similarity
      .bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id"))
    def recall(res: Boolean): Double = {
      val ann = graft.ops.Similarity.ivfPqTopK(corpus, queries, "vec_id", "embedding",
        k = 5, nlist = nlist, nprobe = nprobe, m = 16, ksub = 32,
        rerankFactor = 8, residual = res)
      val hits = ann.select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id")).count()
      hits / 50.0
    }
    println(s"nlist=$nlist nprobe=$nprobe: raw=${recall(false)} residual=${recall(true)}")
    spark.stop()
  }
}
