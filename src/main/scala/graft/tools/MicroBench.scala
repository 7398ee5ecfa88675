package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: head-to-head filter-predicate micro-benchmark over a
  * generated candidate-pair table (the fuzzy-join verify shape). Run via
  * `java -cp "<spark jars glob>:target/scala-2.13/classes"
  * graft.tools.MicroBench [nPairs]`.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(n).select(
      concat(lit("term"), (col("id") % 99991).cast("string")).as("a"),
      concat(lit("term"), ((col("id") * 7) % 99991).cast("string")).as("b"))
      .persist()
    df.count()
    def time(tag: String)(c: org.apache.spark.sql.Column): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val matches = df.filter(c).count()
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs matches=$matches")
      }
    time("levenshtein<=1")(levenshtein(col("a"), col("b")) <= 1)
    time("within_edit1  ")(graft.functions.WithinEdit1(col("a"), col("b")))
    spark.stop()
  }
}
