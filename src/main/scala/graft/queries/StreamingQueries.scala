package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming queries that run inside the batch correctness gate: the
  * events table is consumed through a real Structured Streaming file
  * source (`readStream` → watermark → windowed agg → memory sink,
  * `Trigger.AvailableNow`), and the result must hash-match the same
  * DuckDB SQL as the batch path — stream/batch parity, verified.
  */
object StreamingQueries {
  import Tables._

  private val counter = new java.util.concurrent.atomic.AtomicInteger

  private val stagedCache = scala.collection.concurrent.TrieMap.empty[String, String]

  /** The file streaming source lists a *directory*; the corpus tables are
    * single parquet files — stage a per-sf copy once.
    */
  private def stagedDir(spark: SparkSession, sf: String, table: String): String =
    stagedCache.getOrElseUpdate(s"$sf/$table", {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_stream_$table")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(path(sf, table)),
        dir.resolve(s"$table.parquet"))
      dir.toString
    })

  val defs: Seq[QueryDef] = Seq(

    QueryDef("stream_time_window",
      (spark, sf) => {
        val schema = spark.read.parquet(path(sf, "events")).schema
        val raw = spark.readStream.schema(schema).parquet(stagedDir(spark, sf, "events"))
        val events =
          if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
            raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          else raw
        val agg = graft.streaming.StreamingIngest.windowedCounts(
            events, "ts", watermarkDelay = "1 hour", windowLen = "1 hour")
          .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
            col("event_type"), col("n_events"), col("value_cents"))
        val table = s"stream_tw_${counter.incrementAndGet()}"
        val q = agg.writeStream.format("memory").queryName(table)
          .outputMode("complete").trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination() finally q.stop()
        spark.table(table).orderBy(col("hour"), col("event_type"))
      },
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
             |  COUNT(*) AS n_events,
             |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_cents
             |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin)),

    // Streaming dedup: drop exact duplicate doc fingerprints within the
    // stream (stateful dropDuplicates with watermark-bounded state) —
    // result equals batch exact-dedup's survivor count per source.
    QueryDef("stream_dedup",
      (spark, sf) => {
        val schema = spark.read.parquet(path(sf, "documents")).schema
        val docs = spark.readStream.schema(schema).parquet(stagedDir(spark, sf, "documents"))
        val deduped = docs
          .withColumn("fp", graft.ops.TextOps.fingerprint(col("text")))
          .dropDuplicates("fp")
        val table = s"stream_dd_${counter.incrementAndGet()}"
        val q = deduped.groupBy(col("source")).agg(count(lit(1)).as("n_unique"))
          .writeStream.format("memory").queryName(table)
          .outputMode("complete").trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination() finally q.stop()
        spark.table(table).orderBy(col("source"))
      },
      Some("""SELECT source, COUNT(*) AS n_unique FROM (
             |  SELECT source, ROW_NUMBER() OVER (
             |    PARTITION BY md5(regexp_replace(lower(text), '\s+', ' ', 'g'))
             |    ORDER BY doc_id) AS rn
             |  FROM documents) t WHERE rn = 1
             |GROUP BY source ORDER BY source""".stripMargin)),

    // Stream-stream interval join with event-time bounds + watermarks
    // (the streaming twin of the batch q_range_join, same oracle): error
    // events joined to signups they trail within 15 min. Spark refuses a
    // stream-stream join with no equality predicate
    // (streamJoinStreamWithoutEqualityPredicateUnsupportedError — a
    // range-only condition can't key the join state store), so the range
    // is binned exactly like the batch q_range_join: signups key on their
    // 15-min bucket, errors explode to the two buckets a qualifying
    // signup can occupy, and the exact range predicate filters within
    // the bucket-equal pairs — same result set, and the equality key
    // makes the state store hash-partitioned while watermarks GC both
    // buffers, the property that keeps an unbounded 100 TB/day stream
    // join in fixed memory.
    QueryDef("stream_interval_join",
      (spark, sf) => {
        val schema = spark.read.parquet(path(sf, "events")).schema
        def stream = {
          val raw = spark.readStream.schema(schema).parquet(stagedDir(spark, sf, "events"))
          if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
            raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          else raw
        }
        val errors = stream.filter(col("event_type") === "error")
          .select(col("event_id"), col("ts"))
          .withColumn("bucket", explode(array(
            floor(unix_timestamp(col("ts")) / 900),
            floor(unix_timestamp(col("ts")) / 900) - 1)))
          .withWatermark("ts", "1 hour")
        val signups = stream.filter(col("event_type") === "signup")
          .select(col("event_id").as("signup_id"), col("ts").as("s_ts"))
          .withColumn("s_bucket", floor(unix_timestamp(col("s_ts")) / 900))
          .withWatermark("s_ts", "1 hour")
        val joined = errors.join(signups,
          expr("bucket = s_bucket AND ts >= s_ts AND ts < s_ts + interval 15 minutes"))
        val table = s"stream_ij_${counter.incrementAndGet()}"
        val q = joined.select(col("event_id"), col("signup_id"))
          .writeStream.format("memory").queryName(table)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination() finally q.stop()
        spark.table(table).orderBy(col("event_id"), col("signup_id"))
      },
      Some("""SELECT e.event_id, s.event_id AS signup_id
             |FROM events e JOIN events s
             |  ON e.ts >= s.ts AND e.ts < s.ts + INTERVAL 15 MINUTE
             |WHERE e.event_type = 'error' AND s.event_type = 'signup'
             |ORDER BY e.event_id, signup_id""".stripMargin)),
  )
}
