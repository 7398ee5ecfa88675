package graft.streaming

import graft.drivers.DestinationDriver
import graft.exec.{Migration, MigrationExecutor, TransformContext}
import graft.mapper.MappingStore
import graft.spec.MigrationSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming extension (SURVEY §7.5 — the reference is batch-only;
  * everything here is new capability, not parity).
  *
  * Structured Streaming end: `readStream` → transform → watermark →
  * either (a) windowed/stateful aggregation, or (b) `foreachBatch`
  * micro-batch upsert through the *same* set-oriented executor the batch
  * path uses — each micro-batch is one keyed merge, so a stream and a
  * backfill produce byte-identical destination snapshots.
  *
  * At scale: state is bounded by the watermark; the per-batch upsert
  * shuffles only the micro-batch (existing snapshot joined by key);
  * exactly-once lands on the sink's atomic snapshot flip plus Spark's
  * checkpointed offsets.
  */
object StreamingIngest {

  /** Event-time tumbling-window aggregation with a watermark — the
    * streaming twin of the batch `q_time_window` query.
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      windowLen: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("value_cents"))

  /** Continuous keyed ingestion: every micro-batch flows through the
    * batch executor's upsert merge (mapping table + orphan-free
    * incremental mode). Returns the started query; caller owns lifecycle.
    */
  def upsertStream(
      stream: DataFrame,
      migration: Migration,
      dest: DestinationDriver,
      mapper: MappingStore,
      executor: MigrationExecutor,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val src = new graft.drivers.SourceDriver {
            def read(s: SparkSession, sp: MigrationSpec): DataFrame = batch
          }
          executor.execute(spark, migration, src, dest): Unit
        }
      }
      .start()
}
