package graft.streaming

import graft.drivers.DestinationDriver
import graft.exec.{Migration, MigrationExecutor, TransformContext}
import graft.mapper.MappingStore
import graft.spec.MigrationSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

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

  /** A closed user session: bounded by `gapSeconds` of inactivity. */
  final case class SessionOut(userId: Long, sessionStart: java.sql.Timestamp,
      nEvents: Long, valueCentsSum: Long)

  /** Internal per-key state (public: Spark encoders need an accessible
    * constructor for the state serializer). */
  final case class SessionState(start: Long, lastSeen: Long,
      nEvents: Long, valueCents: Long)

  /** Session state machine as a `StatefulProcessor` — Spark 4's
    * `transformWithState` arbitrary-state API (RocksDB-backed): gap
    * splits sessions on input, a processing-time timer closes trailing
    * sessions after `stateTimeoutMs` of inactivity. This is the stateful
    * tier beyond built-in windowed aggregation — arbitrary per-key state
    * machines with timer-bounded state, the tool for streaming logic SQL
    * can't express.
    */
  final class SessionProcessor(gapSeconds: Long, stateTimeoutMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Long, Long), SessionOut] {
    import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.{Encoders => E}

    @transient private var state: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState]("session",
        E.product[SessionState], TTLConfig.NONE)

    private def closeOut(userId: Long, s: SessionState): SessionOut =
      SessionOut(userId, new java.sql.Timestamp(s.start / 1000), s.nEvents, s.valueCents)

    override def handleInputRows(
        userId: Long, rows: Iterator[(Long, Long, Long)],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val gapUs = gapSeconds * 1000000L
      var closed = List.empty[SessionOut]
      var cur = if (state.exists()) Some(state.get()) else None
      rows.toSeq.sortBy(_._2).foreach { case (_, ts, cents) =>
        cur match {
          case Some(s) if ts - s.lastSeen <= gapUs =>
            cur = Some(s.copy(lastSeen = ts, nEvents = s.nEvents + 1,
              valueCents = s.valueCents + cents))
          case Some(s) =>
            closed ::= closeOut(userId, s)
            cur = Some(SessionState(ts, ts, 1, cents))
          case None =>
            cur = Some(SessionState(ts, ts, 1, cents))
        }
      }
      cur.foreach(state.update)
      // idle timer closes the trailing session; re-registered per batch
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(timerValues.getCurrentProcessingTimeInMs() + stateTimeoutMs)
      closed.reverseIterator
    }

    override def handleExpiredTimer(
        userId: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionOut] =
      if (state.exists()) {
        val s = state.get()
        state.clear()
        Iterator.single(closeOut(userId, s))
      } else Iterator.empty
  }

  /** Streaming session windows with inactivity gap via the
    * [[SessionProcessor]]. Requires the RocksDB state store
    * (`spark.sql.streaming.stateStore.providerClass`), which
    * `transformWithState` mandates.
    */
  def sessionize(
      events: DataFrame,
      tsCol: String,
      userCol: String,
      valueCol: String,
      gapSeconds: Long,
      stateTimeoutMs: Long = 60000L): Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(
        col(userCol).cast("long"), unix_micros(col(tsCol)),
        round(col(valueCol) * 100).cast("long"))
      .as[(Long, Long, Long)]
    typed.groupByKey(_._1)
      .transformWithState(new SessionProcessor(gapSeconds, stateTimeoutMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

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
