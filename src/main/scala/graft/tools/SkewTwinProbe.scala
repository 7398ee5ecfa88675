package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: the skew-vs-uniform TWIN comparison behind the
  * etl_skewed_upsert / dedup_skewed gates — same data volume, same
  * pipeline, one run with the power-law key (hot key ≈ 10% of rows /
  * a 10% byte-identical duplicate cluster) and one with uniform keys —
  * timed under skew-tuned AQE, with the number of skew-split
  * sort-merge joins in each executed plan. The acceptance bar the
  * round notes record: skewed wall-clock < 2× uniform, and the skewed
  * plans actually contain isSkewJoin splits.
  *
  * Run: `java -cp "<spark jars glob>:target/scala-2.13/classes"
  * graft.tools.SkewTwinProbe [sfdir] [amplify]`
  */
object SkewTwinProbe {
  private def skewSmjCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case q: QueryStageExec => p +: allNodes(q.plan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    df.queryExecution.executedPlan.collectFirst { case a: AdaptiveSparkPlanExec => a }
      .map(a => allNodes(a.executedPlan).count {
        case j: SortMergeJoinExec => j.isSkewJoin
        case j: ShuffledHashJoinExec => j.isSkewJoin // AQE may demote SMJ → SHJ
        case _ => false
      }).getOrElse(0)
  }

  private def timed(label: String, df: DataFrame): Unit = {
    df.count() // warm-up: JIT + codegen + file index, discarded
    val t0 = System.nanoTime()
    val n = df.count()
    val secs = (System.nanoTime() - t0) / 1e9
    // count() executes a derived aggregate plan; re-execute the frame
    // itself (now warm) for the structural split count
    df.queryExecution.toRdd.foreach(_ => ())
    println(f"$label%-24s rows=$n%10d  secs=$secs%7.2f  skewSmj=${skewSmjCount(df)}")
    if (sys.env.contains("PROBE_DEBUG"))
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("AQEShuffleRead"))
        .foreach(l => println("  " + l.trim.take(160)))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("PROBE_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("PROBE_SHUFFLE", "256"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val amplify = args.lift(1).map(_.toInt).getOrElse(2)
    val threshold = args.lift(2).map(_.toLong).getOrElse(65536L)

    // --- upsert-enrichment twin (events × per-key dim) ---------------
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val dim = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_custkey") < 97)
      .select(col("c_custkey").cast("long").as("skew_key"),
        col("c_nationkey").cast("long").as("region"))
    def enrich(key: org.apache.spark.sql.Column): DataFrame =
      ev.select(col("event_id"), key.as("skew_key"), col("event_type"),
          md5(col("event_id").cast("string")).as("pad"))
        .repartition(16).join(dim, Seq("skew_key"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), max(col("pad")).as("max_pad"))
    val skewKey = when(col("event_id") % 10 === 0, lit(0L))
      .otherwise(pmod(col("user_id"), lit(96L)) + 1L)
    // event_id is dense → a true uniform spread (user_id's own
    // distribution may carry natural skew, which would contaminate the
    // control arm)
    val uniformKey = pmod(col("event_id"), lit(97L))

    // --- minhash bucket-join twin (documents, duplicate cluster) -----
    def corpus(withCluster: Boolean): DataFrame = {
      val base = spark.read.parquet(s"$sf/documents.parquet")
        .select(explode(array((0 until amplify).map(lit): _*)).as("rep"),
          col("doc_id"), col("text"))
        .select((col("doc_id") * amplify + col("rep")).as("doc_id"), col("text"))
      if (!withCluster) base
      else base.select(col("doc_id"),
        when(col("doc_id") % 10 === 0, lit(graft.queries.Shared.SkewTemplate))
          .otherwise(col("text")).as("text"))
    }

    graft.ops.Joins.withSkewTunedAqe(spark, thresholdBytes = threshold) {
      timed("enrich/uniform", enrich(uniformKey))
      timed("enrich/skewed", enrich(skewKey))
      timed("minhash/uniform",
        graft.ops.Dedup.minHashCandidates(corpus(withCluster = false), "text", "doc_id"))
      timed("minhash/skewed",
        graft.ops.Dedup.minHashCandidates(corpus(withCluster = true), "text", "doc_id"))
      // the scale-honest order for a byte-identical cluster (what the
      // curation DAG does: exact fingerprint dedup BEFORE fuzzy) — the
      // quadratic candidate mass vanishes with the cluster
      timed("minhash/skew_prededup",
        graft.ops.Dedup.minHashCandidates(
          corpus(withCluster = true)
            .withColumn("fp", md5(col("text")))
            .dropDuplicates("fp").drop("fp"),
          "text", "doc_id"))
    }
    spark.stop()
  }
}
