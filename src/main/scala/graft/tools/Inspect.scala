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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.{Retrieval, Similarity}
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val sf = "/root/testdata/sf0.1"
    val docs = graft.queries.Tables.load(spark, sf, "documents")
    val emb = graft.queries.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val probes = emb.select(col("doc_id").as("probe_id")).filter(col("probe_id") % 100 === 7)
    val corpus = emb.select(col("doc_id"), col("embedding").as("cv"))
    val terms = docs.select(col("doc_id"),
      explode(array_distinct(filter(split(lower(col("text")), "[^a-z]+"), t => t =!= ""))).as("term"))
    val nDocsV = docs.count().toDouble
    val probeTermSet = terms.join(probes, terms("doc_id") === col("probe_id")).select("term").distinct()
    val dfreq = terms.join(broadcast(probeTermSet), Seq("term"))
      .groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    // stage dirs (same trick as StreamingQueries)
    def staged(table: String): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"prof_$table")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/$table.parquet"), dir.resolve(s"$table.parquet"))
      dir.toString
    }
    val eSchema = spark.read.parquet(s"$sf/embeddings.parquet").schema
    val probeVecStream = spark.readStream.schema(eSchema).parquet(staged("embeddings"))
      .filter(col("vec_id") % 100 === 7)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val denseScored = probeVecStream
      .join(corpus, col("doc_id") =!= col("probe_id"))
      .select(col("probe_id"), col("doc_id"),
        round(Similarity.cosine(col("pv"), col("cv")), 6).as("sim"))
    val q1 = denseScored.writeStream.format("memory").queryName("pd")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q1.awaitTermination() finally q1.stop()
    val dSchema = spark.read.parquet(s"$sf/documents.parquet").schema
    val probeTermStream = spark.readStream.schema(dSchema).parquet(staged("documents"))
      .filter(col("doc_id") % 100 === 7)
      .select(col("doc_id").as("probe_id"),
        explode(array_distinct(filter(split(lower(col("text")), "[^a-z]+"), t => t =!= ""))).as("term"))
    val sparseScored = probeTermStream
      .join(terms.join(broadcast(dfreq), Seq("term")), Seq("term"))
      .filter(col("doc_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("doc_id"))
      .agg(round(sum(log(lit(nDocsV) / col("df"))), 6).as("score"))
    val q2 = sparseScored.writeStream.format("memory").queryName("ps")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    try q2.awaitTermination() finally q2.stop()
    println("dense sink rows: " + spark.table("pd").count())
    println("sparse sink rows: " + spark.table("ps").count())
    // compare sinks to batch-side scored frames
    val denseBatch = corpus.crossJoin(broadcast(
        emb.select(col("doc_id").as("probe_id"), col("embedding").as("pv"))
          .join(broadcast(probes.select(col("probe_id"))), Seq("probe_id"))))
      .filter(col("doc_id") =!= col("probe_id"))
      .select(col("probe_id"), col("doc_id"),
        round(Similarity.cosine(col("pv"), col("cv")), 6).as("sim"))
    println("dense scored diff: " + spark.table("pd").exceptAll(denseBatch)
      .unionAll(denseBatch.exceptAll(spark.table("pd"))).count())
    val probeTerms2 = terms.join(probes, terms("doc_id") === col("probe_id"))
      .select(col("probe_id"), col("term"))
    val sparseBatch = probeTerms2
      .join(terms.join(broadcast(dfreq), Seq("term")), Seq("term"))
      .filter(col("doc_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("doc_id"))
      .agg(round(sum(log(lit(nDocsV) / col("df"))), 6).as("score"))
    val sdiff = spark.table("ps").exceptAll(sparseBatch)
      .unionAll(sparseBatch.exceptAll(spark.table("ps")))
    println("sparse scored diff: " + sdiff.count())
    sdiff.orderBy("probe_id", "doc_id").show(30, false)
    val fusedStream = Retrieval.rrfFuse(
      Retrieval.rankTopK(spark.table("pd"), "sim", 20),
      Retrieval.rankTopK(spark.table("ps"), "score", 20), 60, 10)
    val fusedBatch = Retrieval.hybridRrf(docs, emb, probes)
    val fdiff = fusedStream.exceptAll(fusedBatch).withColumn("side", lit("stream"))
      .unionAll(fusedBatch.exceptAll(fusedStream).withColumn("side", lit("batch")))
    println("fused diff: " + fdiff.count())
    fdiff.orderBy("probe_id", "fused_rank", "side").show(40, false)
    spark.stop()
  }
}
