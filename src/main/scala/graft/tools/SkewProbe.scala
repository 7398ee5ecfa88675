package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: verify AQE's OptimizeSkewedJoin fires on the synthesized
  * hot-key join shape used by q_skew_aqe_join. Run via `java -cp
  * "<spark jars glob>:target/scala-2.13/classes" graft.tools.SkewProbe
  * [sfdir] [thresholdBytes]`.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(sys.env.getOrElse("PROBE_MASTER", "local[16]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("PROBE_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val t = args.lift(1).map(_.toLong).getOrElse(65536L)
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"),
        when(col("event_id") % 5 =!= 0, lit(0L))
          .otherwise(pmod(col("user_id"), lit(25L))).as("skew_key"),
        col("event_type"),
        md5(col("event_id").cast("string")).as("pad"))
    val dim = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey").cast("long").as("skew_key"), col("n_regionkey"))
    val agg = ev.repartition(16).join(dim, Seq("skew_key"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("n_regionkey")).as("sum_region"), max(col("pad")).as("max_pad"))
    graft.ops.Joins.withSkewTunedAqe(spark, thresholdBytes = t) {
      agg.collect()
      val p = agg.queryExecution.executedPlan.toString
      println(s"threshold=$t skewMarkers=${"skew=true".r.findAllIn(p).size}")
      println(p.linesIterator.filter(_.contains("SortMergeJoin")).mkString("\n"))
    }
    spark.stop()
  }
}
