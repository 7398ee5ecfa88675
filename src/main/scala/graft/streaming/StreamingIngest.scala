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

  /** One output row per input event: the raw (nullable) reading and the
    * forward-filled value. */
  final case class GapFillOut(eventId: Long, userId: Long,
      readingCents: Option[Long], filledCents: Option[Long])

  /** Per-key carry state: last known reading (public for the state
    * encoder). `has` distinguishes "no reading yet" from a real 0. */
  final case class GapFillState(last: Long, has: Boolean)

  /** Streaming forward-fill (`LAST_VALUE IGNORE NULLS` at ingest): the
    * classic last-known-value gap fill as a keyed `StatefulProcessor` —
    * state is ONE (long, bool) per user, O(active users) at 100 TB, no
    * timers (a carry never closes). Rows are event-time-sorted within
    * each batch and the carry crosses batches through the value state;
    * like [[FunnelProcessor]], cross-batch stragglers arriving after a
    * later event was processed are the documented approximation (the
    * gate's single-file AvailableNow replay never splits a user's
    * timeline out of order).
    */
  final class GapFillProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Long, Option[Long]), GapFillOut] {
    import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.{Encoders => E}

    @transient private var state: ValueState[GapFillState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[GapFillState]("gapfill",
        E.product[GapFillState], TTLConfig.NONE)

    override def handleInputRows(
        userId: Long, rows: Iterator[(Long, Long, Long, Option[Long])],
        timerValues: TimerValues): Iterator[GapFillOut] = {
      var (last, has) =
        if (state.exists()) { val s = state.get(); (s.last, s.has) }
        else (0L, false)
      val out = rows.toSeq.sortBy(r => (r._2, r._3)).map {
        case (_, _, eventId, reading) =>
          reading.foreach { v => last = v; has = true }
          GapFillOut(eventId, userId, reading, if (has) Some(last) else None)
      }
      state.update(GapFillState(last, has))
      out.iterator
    }

    override def handleExpiredTimer(
        userId: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[GapFillOut] =
      Iterator.empty
  }

  /** Streaming gap fill via the [[GapFillProcessor]]. `readingCol` must
    * already be the nullable long to carry forward (null = gap).
    * Requires the RocksDB state store, which `transformWithState`
    * mandates.
    */
  def gapFill(
      events: DataFrame,
      tsCol: String,
      userCol: String,
      eventIdCol: String,
      readingCol: String): Dataset[GapFillOut] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(
        col(userCol).cast("long"), unix_micros(col(tsCol)),
        col(eventIdCol).cast("long"), col(readingCol).cast("long"))
      .as[(Long, Long, Long, Option[Long])]
    typed.groupByKey(_._1)
      .transformWithState(new GapFillProcessor,
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** Per-user cumulative funnel flags (one per stage, `fk` = "reached
    * stage k"). Emitted after every input batch for the key. */
  final case class FunnelOut(userId: Long, f1: Int, f2: Int, f3: Int, f4: Int)

  /** Internal per-key state (public: Spark encoders need an accessible
    * constructor for the state serializer). */
  final case class FunnelState(f1: Boolean, f2: Boolean, f3: Boolean, f4: Boolean)

  /** Ordered-funnel state machine (stage k counts only after stage k-1
    * was reached by an EARLIER event): the second per-key
    * `StatefulProcessor` next to [[SessionProcessor]], and a simpler
    * one — flags are MONOTONE, so there is nothing to close and no
    * timer to register; the processor re-emits the key's current flags
    * after each batch and a downstream max-per-key is exact however
    * many times a key emits. State is four booleans per user — at
    * 100 TB the store is O(active users), not O(events). Rows are
    * event-time-sorted within each batch; cross-batch stragglers that
    * arrive AFTER a later stage's event was processed are the
    * documented approximation (exact late-data handling would buffer
    * per key until a watermark — the sessionize sentinel pattern —
    * which the gate's single-batch AvailableNow replay never needs).
    */
  final class FunnelProcessor(stages: Seq[String])
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Long, Long, String), FunnelOut] {
    require(stages.length == 4, "FunnelState carries exactly four stages")
    import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.{Encoders => E}

    @transient private var state: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FunnelState]("funnel",
        E.product[FunnelState], TTLConfig.NONE)

    override def handleInputRows(
        userId: Long, rows: Iterator[(Long, Long, Long, String)],
        timerValues: TimerValues): Iterator[FunnelOut] = {
      val s = if (state.exists()) state.get() else FunnelState(false, false, false, false)
      val flags = Array(s.f1, s.f2, s.f3, s.f4)
      rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, tpe) =>
        val i = stages.indexOf(tpe)
        if (i == 0 || (i > 0 && flags(i - 1))) flags(i) = true
      }
      state.update(FunnelState(flags(0), flags(1), flags(2), flags(3)))
      def b(x: Boolean) = if (x) 1 else 0
      Iterator.single(FunnelOut(userId, b(flags(0)), b(flags(1)), b(flags(2)), b(flags(3))))
    }

    override def handleExpiredTimer(
        userId: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[FunnelOut] =
      Iterator.empty
  }

  /** Streaming ordered-funnel flags via the [[FunnelProcessor]].
    * Requires the RocksDB state store, which `transformWithState`
    * mandates. Events whose type is not a funnel stage are filtered
    * before the shuffle — they cannot change any flag.
    */
  def funnelFlags(
      events: DataFrame,
      tsCol: String,
      userCol: String,
      eventIdCol: String,
      typeCol: String,
      stages: Seq[String]): Dataset[FunnelOut] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .filter(col(typeCol).isin(stages: _*))
      .select(col(userCol).cast("long"), unix_micros(col(tsCol)),
        col(eventIdCol).cast("long"), col(typeCol))
      .as[(Long, Long, Long, String)]
    typed.groupByKey(_._1)
      .transformWithState(new FunnelProcessor(stages),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** One attributed purchase: the first/last click-or-view the user had
    * made at the time of purchase ('none' when no touch preceded it). */
  final case class AttributedPurchase(firstT: String, lastT: String, cents: Long)

  /** Internal per-key state (public: Spark encoders need an accessible
    * constructor for the state serializer). "" = no touch yet. */
  final case class TouchState(first: String, last: String)

  /** Streaming multi-touch attribution state machine — the live twin of
    * the batch running first/last ignoreNulls window: per-user state is
    * TWO strings (first and last touch type so far), each purchase emits
    * its attribution at arrival. Events are (ts, event_id)-sorted within
    * the batch; like [[FunnelProcessor]], cross-batch stragglers are the
    * documented approximation the AvailableNow replay never hits. State
    * is O(active users), not O(events), and needs no timer — touches
    * never expire.
    */
  final class AttributionProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Long, Long, String, Long), AttributedPurchase] {
    import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.{Encoders => E}

    @transient private var state: ValueState[TouchState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TouchState]("touch",
        E.product[TouchState], TTLConfig.NONE)

    override def handleInputRows(
        userId: Long, rows: Iterator[(Long, Long, Long, String, Long)],
        timerValues: TimerValues): Iterator[AttributedPurchase] = {
      var s = if (state.exists()) state.get() else TouchState("", "")
      val out = List.newBuilder[AttributedPurchase]
      rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, tpe, cents) =>
        if (tpe == "purchase")
          out += AttributedPurchase(
            if (s.first.isEmpty) "none" else s.first,
            if (s.last.isEmpty) "none" else s.last, cents)
        else
          s = TouchState(if (s.first.isEmpty) tpe else s.first, tpe)
      }
      state.update(s)
      out.result().iterator
    }

    override def handleExpiredTimer(
        userId: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[AttributedPurchase] =
      Iterator.empty
  }

  /** Streaming attribution via the [[AttributionProcessor]]. Only the
    * three relevant event types reach the shuffle.
    */
  def attributePurchases(
      events: DataFrame,
      tsCol: String,
      userCol: String,
      eventIdCol: String,
      typeCol: String,
      valueCol: String): Dataset[AttributedPurchase] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .filter(col(typeCol).isin("click", "view", "purchase"))
      .select(col(userCol).cast("long"), unix_micros(col(tsCol)),
        col(eventIdCol).cast("long"), col(typeCol),
        round(col(valueCol) * 100).cast("long"))
      .as[(Long, Long, Long, String, Long)]
    typed.groupByKey(_._1)
      .transformWithState(new AttributionProcessor,
        TimeMode.ProcessingTime(), OutputMode.Append())
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

  /** Final EWMA readout for one event type (mirrors q_exp_smoothing's
    * output row). */
  final case class EwmaOut(eventType: String, nHours: Long,
      levelMicro: Long, nAnomalies: Long)

  /** Per-type EWMA state: the hour currently accumulating and the
    * BIGINT-packed (level·2²⁸ + anomalies·2¹⁴ + hours) fold accumulator
    * (−1 = no hour folded yet). Public for the state encoder. */
  final case class EwmaState(pendingHour: Long, pendingN: Long, packed: Long)

  /** Incremental exponential smoothing (α = 1/4, integer micro-units —
    * the q_exp_smoothing recurrence verbatim) as a keyed
    * `StatefulProcessor`: each micro-batch's events extend the
    * current hour or fold completed hours into the packed accumulator,
    * so the model updates ACROSS batches from O(1) state per key — the
    * online form of the batch fold, and the shape an always-on
    * monitoring pipeline runs. A sentinel event at/after
    * `sentinelHourFrom` closes the trailing hour and emits the final
    * readout (the stream_sessionize sentinel pattern — no timers, so
    * AvailableNow drains normally); state is cleared on emission.
    *
    * Exactness contract: input chunks must arrive in non-overlapping
    * ascending time ranges (the time-chunked staging guarantees it);
    * rows are sorted within each batch, so the fold sees hours in the
    * same order as the batch computation and the result is
    * bit-identical to q_exp_smoothing's.
    */
  final class EwmaProcessor(sentinelHourFrom: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, (String, Long), EwmaOut] {
    import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.{Encoders => E}

    @transient private var state: ValueState[EwmaState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[EwmaState]("ewma",
        E.product[EwmaState], TTLConfig.NONE)

    private def fold(packed: Long, x: Long): Long = {
      // Strict-mode bound guard mirroring q_exp_smoothing's: past these
      // bounds the packing wraps silently into adjacent bit fields, so
      // fail loudly (level·10⁶ < 2³⁵ ⇒ hourly count ≤ 34 000; the two
      // counters are 14-bit fields).
      require(x <= 34000L,
        s"EWMA packed state: hourly count $x > 34000 overflows the level field")
      if (packed < 0) x * 1000000L * 268435456L + 1L
      else {
        val level = packed / 268435456L
        val na = (packed / 16384L) % 16384L
        val n = packed % 16384L
        val newLevel = (x * 1000000L + 3L * level) / 4L
        val anom = if (math.abs(x * 1000000L - level) * 2L > level) 1L else 0L
        require(n + 1L < 16384L && na + anom < 16384L,
          s"EWMA packed state: counter field overflow (n=$n, anomalies=$na)")
        newLevel * 268435456L + (na + anom) * 16384L + (n + 1L)
      }
    }

    override def handleInputRows(
        key: String, rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[EwmaOut] = {
      var s = if (state.exists()) state.get() else EwmaState(-1L, 0L, -1L)
      var out = List.empty[EwmaOut]
      rows.toSeq.map(_._2).sorted.foreach { tsMicros =>
        val h = tsMicros / 3600000000L
        if (h >= sentinelHourFrom) {
          if (s.pendingHour >= 0) s = EwmaState(-1L, 0L, fold(s.packed, s.pendingN))
          if (s.packed >= 0 && out.isEmpty)
            out ::= EwmaOut(key, s.packed % 16384L, s.packed / 268435456L,
              (s.packed / 16384L) % 16384L)
        } else if (h == s.pendingHour) {
          s = s.copy(pendingN = s.pendingN + 1L)
        } else {
          val packed = if (s.pendingHour >= 0) fold(s.packed, s.pendingN) else s.packed
          s = EwmaState(h, 1L, packed)
        }
      }
      if (out.nonEmpty) state.clear() else state.update(s)
      out.iterator
    }
  }

  /** Streaming EWMA level tracking via the [[EwmaProcessor]]. Requires
    * the RocksDB state store, which `transformWithState` mandates.
    */
  def ewmaLevels(
      events: DataFrame, tsCol: String, typeCol: String,
      sentinelHourFrom: Long): Dataset[EwmaOut] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(typeCol), unix_micros(col(tsCol)))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new EwmaProcessor(sentinelHourFrom),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** Final Holt readout for one event type (mirrors q_holt_winters's
    * output row). */
  final case class HoltOut(eventType: String, nHours: Long,
      levelMicro: Long, trendMicro: Long, nAnomalies: Long)

  /** Per-type Holt state: the hour currently accumulating plus the
    * UNPACKED (level, trend, hours, anomalies) accumulator — trend is
    * signed, so no bit-packing (the q_holt_winters layout). n = 0 marks
    * "no hour folded yet". Public for the state encoder. */
  final case class HoltState(pendingHour: Long, pendingN: Long,
      l: Long, b: Long, n: Long, m: Long)

  /** Incremental Holt double exponential smoothing (α = β = 1/4,
    * integer micro-units — the q_holt_winters recurrence verbatim;
    * Java's `/` truncates toward zero exactly like Spark `div` and
    * DuckDB `//`) as a keyed `StatefulProcessor`: the level+trend model
    * updates ACROSS micro-batches from O(1) state per key. Sentinel
    * handling, ordering contract and the emit-once/clear discipline are
    * [[EwmaProcessor]]'s exactly; the trend field is what lets the
    * one-step forecast level+trend track a drifting series without
    * reading sustained growth as a permanent anomaly.
    */
  final class HoltProcessor(sentinelHourFrom: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, (String, Long), HoltOut] {
    import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.{Encoders => E}

    @transient private var state: ValueState[HoltState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[HoltState]("holt",
        E.product[HoltState], TTLConfig.NONE)

    private def fold(s: HoltState, x: Long): HoltState = {
      require(x <= 1000000000L,
        s"Holt state: hourly count $x > 1e9 — micro-unit state would overflow")
      if (s.n == 0L) s.copy(l = x * 1000000L, b = 0L, n = 1L, m = 0L)
      else {
        val l2 = (x * 1000000L + 3L * (s.l + s.b)) / 4L
        val b2 = (l2 - s.l + 3L * s.b) / 4L
        val anom =
          if (math.abs(x * 1000000L - (s.l + s.b)) * 2L > math.abs(s.l + s.b)) 1L
          else 0L
        s.copy(l = l2, b = b2, n = s.n + 1L, m = s.m + anom)
      }
    }

    override def handleInputRows(
        key: String, rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[HoltOut] = {
      var s = if (state.exists()) state.get()
        else HoltState(-1L, 0L, 0L, 0L, 0L, 0L)
      var out = List.empty[HoltOut]
      rows.toSeq.map(_._2).sorted.foreach { tsMicros =>
        val h = tsMicros / 3600000000L
        if (h >= sentinelHourFrom) {
          if (s.pendingHour >= 0) {
            s = fold(s, s.pendingN).copy(pendingHour = -1L, pendingN = 0L)
          }
          if (s.n > 0 && out.isEmpty)
            out ::= HoltOut(key, s.n, s.l, s.b, s.m)
        } else if (h == s.pendingHour) {
          s = s.copy(pendingN = s.pendingN + 1L)
        } else {
          val folded = if (s.pendingHour >= 0) fold(s, s.pendingN) else s
          s = folded.copy(pendingHour = h, pendingN = 1L)
        }
      }
      if (out.nonEmpty) state.clear() else state.update(s)
      out.iterator
    }
  }

  /** Streaming Holt level+trend tracking via the [[HoltProcessor]].
    * Requires the RocksDB state store, which `transformWithState`
    * mandates.
    */
  def holtLevels(
      events: DataFrame, tsCol: String, typeCol: String,
      sentinelHourFrom: Long): Dataset[HoltOut] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(typeCol), unix_micros(col(tsCol)))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new HoltProcessor(sentinelHourFrom),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** Final SPRT readout for one event type (None decision stats =
    * boundary never crossed → 'continue'). */
  final case class SprtOut(eventType: String, nTotal: Long, llrFinal: Long,
      nDecision: Option[Long], llrDecision: Option[Long], decision: String)

  /** Per-type SPRT monitor state: trials seen, cumulative LLR in
    * micro-units, and the frozen decision point (nDec = -1 until a
    * boundary is crossed). Public for the state encoder. */
  final case class SprtState(n: Long, llr: Long, nDec: Long, llrDec: Long)

  /** Incremental Wald SPRT (q_sprt's fold, per key) as a keyed
    * `StatefulProcessor`: each micro-batch's trials extend an O(1)
    * (n, llr, decision) state — the always-valid experiment monitor
    * shape, decisions available MID-STREAM rather than at a fixed
    * horizon. The LLR increments arrive as integer micro-units computed
    * upstream (hardcoded ⌊10⁶·ln⌉ constants), so the fold is exact
    * integer addition; the boundary test |llr| ≥ `boundaryMicro` is an
    * exact integer comparison; and the decision point freezes at the
    * FIRST crossing while totals keep accumulating (Wald's stopped
    * process, reported next to the full-stream tally). Ordering
    * contract, sentinel handling (a row at/after `sentinelFromMicros`
    * triggers the single final emission) and the emit-once/clear
    * discipline are [[EwmaProcessor]]'s exactly.
    */
  final class SprtProcessor(sentinelFromMicros: Long, boundaryMicro: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, (String, Long, Long, Long), SprtOut] {
    import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.{Encoders => E}

    @transient private var state: ValueState[SprtState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SprtState]("sprt",
        E.product[SprtState], TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[(String, Long, Long, Long)],
        timerValues: TimerValues): Iterator[SprtOut] = {
      var s = if (state.exists()) state.get() else SprtState(0L, 0L, -1L, 0L)
      var out = List.empty[SprtOut]
      // (type, us, event_id, incMicro) sorted on the (us, event_id)
      // total order within the batch; chunks arrive in ascending
      // non-overlapping time ranges, so the fold sees the stream order.
      rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, us, _, inc) =>
        if (us >= sentinelFromMicros) {
          if (out.isEmpty)
            out ::= SprtOut(key, s.n, s.llr,
              if (s.nDec >= 0) Some(s.nDec) else None,
              if (s.nDec >= 0) Some(s.llrDec) else None,
              if (s.nDec < 0) "continue"
              else if (s.llrDec >= boundaryMicro) "accept_h1"
              else "accept_h0")
        } else {
          val n = s.n + 1L
          val llr = s.llr + inc
          s = if (s.nDec < 0 &&
              (llr >= boundaryMicro || llr <= -boundaryMicro))
            SprtState(n, llr, n, llr)
          else s.copy(n = n, llr = llr)
        }
      }
      if (out.nonEmpty) state.clear() else state.update(s)
      out.iterator
    }
  }

  /** Streaming per-key SPRT via the [[SprtProcessor]]. `incCol` must
    * already hold each trial's integer micro-unit LLR increment.
    * Requires the RocksDB state store (transformWithState mandates it).
    */
  def sprtMonitors(
      events: DataFrame, tsCol: String, idCol: String, typeCol: String,
      incCol: String, sentinelFromMicros: Long,
      boundaryMicro: Long): Dataset[SprtOut] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(typeCol), unix_micros(col(tsCol)), col(idCol), col(incCol))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SprtProcessor(sentinelFromMicros, boundaryMicro),
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
