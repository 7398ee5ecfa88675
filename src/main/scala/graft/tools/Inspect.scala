package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: time a named query and optionally dump its formatted plan.
  * Run via `java -cp "<spark jars glob>:target/scala-2.13/classes"
  * graft.tools.Inspect <queryName> <sfDir> [explain]`.
  */
object Inspect {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val explain = args.contains("explain")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    if (explain) fn(spark, sfDir).explain("formatted")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[$name] run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}

/** Stage-level profiling scratchpad (edit as needed per investigation). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Similarity
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val e = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val queries = e.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((m, ksub, rf) <- Seq((8, 16, 4), (8, 32, 8), (16, 32, 8), (8, 16, 16))) {
        val pq = Similarity.pqTopK(e, queries, "vec_id", "embedding", k = 5,
            m = m, ksub = ksub, rerankFactor = rf)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"$sf m=$m ksub=$ksub rf=$rf: recall=${pq.intersect(exact).size.toDouble / exact.size}%.3f")
      }
    }
    spark.stop()
  }
}
