package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev probe (r19 task 7): split stream_outer_join / stream_recovery's
  * ~14 s sf0.1 wall into FIXED (per-trigger + query-startup + state
  * scaffolding) vs PER-ROW cost, with two controlled axes:
  *
  *   - axis "triggers": same corpus (sfDir), chunk counts 4 / 8 / 16 —
  *     if wall grows ~linearly with chunk count at fixed data, the cost
  *     is per-trigger scaffolding;
  *   - axis "data": same 8-chunk staging, three SF dirs — if wall is
  *     ~flat across 100× rows, the per-row cost is negligible.
  *
  * Shapes replicated from the gates (8 state partitions, 1 h
  * watermarks, sentinel chunks, AvailableNow, one kill+restart for the
  * recovery shape); staging is NOT timed (the gates' staging is cached
  * across bench runs too).
  *
  * Usage: graft.tools.StreamFixedCostProbe <shape:join|agg> <axis:triggers|data> [sfDir]
  */
object StreamFixedCostProbe {
  def main(args: Array[String]): Unit = {
    val shape = args.headOption.getOrElse("join")
    val axis = if (args.length > 1) args(1) else "triggers"
    val baseSf = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def stage(sf: String, n: Int): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_fcp_chunks")
      val df = graft.queries.Tables.normalizeTs(
        spark.read.parquet(s"$sf/events.parquet"))
      val mm = df.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1) + 1L)
      val step = math.max(1L, (hi - lo + n - 1) / n)
      val base = System.currentTimeMillis() - (n + 2) * 10000L
      for (i <- 0 until n) {
        val chunk = df.filter(unix_micros(col("ts")) >= lo + i * step &&
          unix_micros(col("ts")) < lo + (i + 1) * step)
        graft.queries.Tables.writeChunkFile(
          chunk, dir, f"chunk_$i%03d.parquet", base + i * 10000L)
      }
      for (j <- 0 until 2) { // sentinels, as in stagedTimeChunks
        val row = df.limit(1)
          .withColumn("event_type", explode(array(lit("error"), lit("purchase"))))
          .withColumn("event_id",
            when(col("event_type") === "error", lit(-1L - 2 * j)).otherwise(lit(-2L - 2 * j)))
          .withColumn("ts", expr(s"timestamp_micros(${hi - 1L} + ${7200000000L * (j + 1)})"))
          .withColumn("user_id", lit(-1L))
        graft.queries.Tables.writeChunkFile(
          row, dir, s"chunk_zz$j.parquet", base + (n + j) * 10000L)
      }
      dir.toString
    }

    def withStateParts[T](body: => T): T = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    def runJoin(dir: String): Long = {
      val schema = spark.read.parquet(dir).schema
      def raw = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val errors = raw.withWatermark("ts", "1 hour")
        .filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = raw.withWatermark("ts", "1 hour")
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
      val joined = errors.join(purchases,
        expr("user_id = p_user AND p_ts >= ts AND p_ts < ts + interval 30 minutes"),
        "leftOuter")
      val out = java.nio.file.Files.createTempDirectory("graft_fcp_out").toString
      withStateParts {
        val q = joined
          .select(col("event_id"), coalesce(col("p_event_id"), lit(-1L)).as("p_event_id"))
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("graft_fcp_ck").toString)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination() finally q.stop()
      }
      spark.read.parquet(out).count()
    }

    def runAgg(dir: String): Long = {
      val schema = spark.read.parquet(dir).schema
      val ckpt = java.nio.file.Files.createTempDirectory("graft_fcp_ck").toString
      val out = java.nio.file.Files.createTempDirectory("graft_fcp_out").toString
      def start() = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      withStateParts {
        val q1 = start()
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (q1.isActive && q1.lastProgress == null && System.nanoTime() < deadline)
          Thread.sleep(25)
        q1.stop(); q1.awaitTermination()
        val q2 = start()
        try q2.awaitTermination() finally q2.stop()
      }
      spark.read.parquet(out).count()
    }

    val legs: Seq[(String, String)] = axis match {
      case "triggers" => Seq("4", "8", "16").map(n => (baseSf, n))
      case _ => Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1").map(sf => (sf, "8"))
    }
    // one warmup pass so the first timed leg doesn't absorb JIT
    val warmDir = stage("/root/testdata/sf0.001", 2)
    if (shape == "join") runJoin(warmDir) else runAgg(warmDir)
    for ((sf, nStr) <- legs) {
      val n = nStr.toInt
      val dir = stage(sf, n)
      val t0 = System.nanoTime()
      val rows = if (shape == "join") runJoin(dir) else runAgg(dir)
      println(f"[fcp] shape=$shape sf=$sf chunks=$n: " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s, $rows out rows")
    }
    spark.stop()
  }
}
