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
    import graft.ops.{Dedup, TextOps}
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    t("warm read")(docs.count())
    t("shingleHashes")(docs.select(col("doc_id"), TextOps.shingleHashes(col("text"), 5)).count())
    t("minHashBands")(Dedup.minHashBands(docs, "text", "doc_id", 5, Dedup.MinHashParams()).count())
    t("candidates")(Dedup.minHashCandidates(docs, "text", "doc_id").count())
    t("verified")(Dedup.minHashVerifiedPairs(docs, "text", "doc_id").count())
    t("verified again")(Dedup.minHashVerifiedPairs(docs, "text", "doc_id").count())
    spark.stop()
  }
}
