package graft.streaming

import graft.drivers.{DeltaDestination, DestinationDriver, ParquetDestinationDriver, SourceDriver}
import graft.exec.{CurationPipeline, Migration, PruneOrphans}
import graft.spec.MigrationSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming LLM-corpus curation — the engine's two flagship halves run
  * as ONE system: documents arrive as a stream, and every micro-batch
  * drives the 5-stage curation DAG ([[CurationPipeline]]: ingest →
  * exact dedup → quality gate → langid → mixture rebalance) through the
  * SAME `MigrationExecutor` the one-shot pipeline uses, with the SAME
  * persistent mapping tables upserting across batches.
  *
  * Per micro-batch, inside `foreachBatch`:
  *
  *   1. LAND — the batch is written to `landed/batch_<batchId>`
  *      (overwrite keyed by batchId: a crash-replayed batch rewrites its
  *      own directory, never doubles — the standard idempotent
  *      foreachBatch sink discipline). The landed set is the pipeline's
  *      bronze table: the cumulative corpus as of this batch.
  *   2. DELTA-PROPAGATE ([[runDagIncremental]], the default) — ONLY the
  *      batch's rows flow through the four per-document stages
  *      (`MigrationExecutor.executeDelta`: mapping-assigned dense dids
  *      extend the historical id space, the incremental dedup variant
  *      anti-joins the batch against its historical fingerprint state,
  *      quality and langid are per-row) and each stage lands its delta
  *      as an O(batch) merge-on-read segment. Only the genuinely global
  *      mix stage recomputes, over the langid state it already
  *      maintains — one snapshot read, never the raw corpus. After the
  *      final batch the destination state is BYTE-IDENTICAL to the
  *      one-shot batch pipeline over the same corpus — the property the
  *      `stream_llm_pipeline` gate hashes against `etl_llm_pipeline`'s
  *      oracle, and StreamingSpec proves against a [[runDag]] twin.
  *      Per-stage processed-row counts land in `metrics/batch_<id>` —
  *      the recorded evidence that the non-global stages are O(batch).
  *
  * [[runDag]] — full re-derivation of the whole DAG over the cumulative
  * landed corpus — remains available as the one-shot twin (and for
  * schema-evolving reprocessing, where incremental deltas are the wrong
  * tool by the MOR contract).
  *
  * Exactly-once: the file source's checkpoint replays a failed batch
  * with the same id and files; landing is idempotent by construction,
  * and every stage write is an idempotent keyed upsert — executeDelta
  * records mappings BEFORE appending data, so a replayed batch resolves
  * the same dids, recomputes the same deltas, and the destination's
  * latest-wins reconcile folds the duplicate segments away. A crash at
  * ANY point — after landing, mid-DAG with some stages committed, or
  * before the batch commit — therefore converges to the same final
  * state on restart; StreamingSpec proves the mid-DAG case with an
  * injected one-shot stage failure.
  *
  * Scale shape: landing + the four per-document stages cost O(batch) in
  * both compute and bytes written; dedup's history is scanned once per
  * batch but never shuffled (broadcast semi-join on the batch's
  * fingerprints); mix re-derives over the curated-survivor state — the
  * one O(corpus) stage, inherent to its global-cap semantics. The
  * mapping upsert is a read-merge-write of a narrow (source_id,
  * dest_id) table — at true scale, compact the stage delta logs on a
  * schedule ([[ParquetDestinationDriver.compactDeltas]]) to bound the
  * reconcile tax.
  */
object StreamingCuration {

  /** The DAG's ingest source: every landed batch directory, read as one
    * cumulative corpus (recursive lookup — a glob path here would make
    * Spark's FileStreamSink.hasMetadata stat the literal glob string
    * and log a spurious FileNotFoundException warning per read).
    */
  def landedCorpus(spark: SparkSession, base: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(s"$base/landed")

  /** Re-run the curation DAG over the cumulative landed corpus. The
    * `dests` override is the StreamingSpec failure-injection hook;
    * production callers use the default.
    */
  def runDag(spark: SparkSession, base: String,
      dest: ParquetDestinationDriver = new ParquetDestinationDriver,
      dests: Migration => DestinationDriver = null): Unit = {
    val migs = CurationPipeline.migrations(s"$base/stages")
    val mapper = new graft.mapper.MappingStore(s"$base/map")
    val refs = new graft.exec.ReferenceStore(mapper)
    val executor = new graft.exec.MigrationExecutor(mapper, refs, PruneOrphans)
    val destFor = Option(dests).getOrElse((_: Migration) => dest)
    try executor.executeAll(spark, migs,
      CurationPipeline.sourcesFrom(landedCorpus(_, base), s"$base/stages", dest),
      m => { val d = destFor(m); refs.register(m.spec, d); d }): Unit
    finally { executor.release(); refs.release() }
  }

  /** Delta-propagate ONE landed batch through the DAG — the incremental
    * path (default since r17; full re-derivation per batch made the
    * incremental cost O(corpus), the r16 verdict's one weak component).
    * The four per-document stages run through
    * `MigrationExecutor.executeDelta` chained on each other's delta
    * output (the chain IS the dependency order — no topo sort needed);
    * mix recomputes over the cumulative langid state under
    * [[PruneOrphans]] (its md5-ordered per-source cap can evict
    * previously published rows as the corpus grows). Per-stage
    * (input_rows, output_rows) land in `metrics/batch_<batchId>`
    * (overwrite — replay-idempotent like everything else here).
    */
  def runDagIncremental(spark: SparkSession, base: String, batchId: Long,
      dest: ParquetDestinationDriver = new ParquetDestinationDriver,
      dests: Migration => DestinationDriver = null): Unit = {
    val migs = CurationPipeline.incrementalMigrations(s"$base/stages")
    val mapper = new graft.mapper.MappingStore(s"$base/map")
    val refs = new graft.exec.ReferenceStore(mapper)
    val executor = new graft.exec.MigrationExecutor(mapper, refs, PruneOrphans)
    val destFor = Option(dests).getOrElse((_: Migration) => (dest: DestinationDriver))
    def deltaDest(m: Migration): DeltaDestination = destFor(m) match {
      case dd: DeltaDestination => dd
      case other => sys.error(s"incremental curation needs a DeltaDestination " +
        s"for ${m.spec.name}, got ${other.getClass.getName}")
    }
    val metrics = scala.collection.mutable.ListBuffer.empty[(Long, String, Long, Long)]
    // opt-in per-stage wall attribution (graft.curation.logStages) — the
    // r21 verdict's task 3: the gate's 20+ s was a single aggregate with
    // nothing localizing WHICH stage costs what; probes read these
    // stderr lines (BENCH_NOTES r22), production would emit them as
    // metrics. Timing-only: no behavior depends on it.
    val logStages = spark.conf.getOption("graft.curation.logStages").contains("true")
    def timed[T](stage: String)(body: => T): T =
      if (!logStages) body
      else {
        val t0 = System.nanoTime()
        try body
        finally System.err.println(f"[curation] batch=$batchId stage=$stage " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    val landed = spark.read.parquet(s"$base/landed/batch_$batchId").persist()
    try {
      var delta: DataFrame = landed
      var deltaRows: Option[Long] = None // stage k's counted output = k+1's input
      migs.init.foreach { m =>
        val d = deltaDest(m)
        refs.register(m.spec, d)
        val stageIn = delta
        val inRows = deltaRows.getOrElse(stageIn.count())
        val res = timed(m.spec.name)(executor.executeDelta(spark, m, new SourceDriver {
          def read(s: SparkSession, sp: MigrationSpec): DataFrame = stageIn
        }, d))
        metrics += ((batchId, m.spec.name, inRows, res.migrated))
        delta = res.finalSnapshot // the persisted stage delta, next stage's input
        deltaRows = Some(res.migrated)
      }
      val mix = migs.last
      val mixDest = destFor(mix)
      refs.register(mix.spec, mixDest)
      val langid = migs(3)
      val langidState = deltaDest(langid).morSnapshot(spark, langid.spec)
        .getOrElse(sys.error("incremental curation: no langid state for mix"))
      val mixRes = timed(mix.spec.name)(executor.execute(spark, mix, new SourceDriver {
        def read(s: SparkSession, sp: MigrationSpec): DataFrame = langidState
      }, mixDest))
      metrics += ((batchId, mix.spec.name, langidState.count(), mixRes.migrated))
      val sp = spark
      import sp.implicits._
      metrics.toSeq.toDF("batch_id", "stage", "input_rows", "output_rows")
        .coalesce(1).write.mode("overwrite").parquet(s"$base/metrics/batch_$batchId")
    } finally { landed.unpersist(); executor.release(); refs.release() }
  }

  /** The recorded per-batch per-stage processed-row evidence, across all
    * completed batches: (batch_id, stage, input_rows, output_rows).
    */
  def batchMetrics(spark: SparkSession, base: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(s"$base/metrics")

  /** Start the streaming curation pipeline over `docs` (a streaming
    * DataFrame of document rows). Caller owns the query lifecycle; a
    * restart with the same `checkpointDir` resumes exactly-once.
    * `incremental = false` restores the full per-batch re-derivation
    * (the pre-r17 behavior — every batch recomputes the whole DAG over
    * the cumulative corpus).
    */
  def start(docs: DataFrame, base: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      dests: Migration => DestinationDriver = null,
      incremental: Boolean = true): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          batch.write.mode("overwrite").parquet(s"$base/landed/batch_$batchId")
          if (incremental) runDagIncremental(spark, base, batchId, dests = dests)
          else runDag(spark, base, dests = dests)
        }
      }
      .start()

  /** The current curated corpus (the mix stage's published snapshot),
    * if any batch has completed.
    */
  def curated(spark: SparkSession, base: String,
      dest: ParquetDestinationDriver = new ParquetDestinationDriver): Option[DataFrame] =
    dest.snapshot(spark,
      CurationPipeline.migrations(s"$base/stages").last.spec)

  /** Per-stage generation counts. Under [[runDag]] (full re-derivation)
    * every batch publishes one generation per stage; under
    * [[runDagIncremental]] only the mix stage does — the per-document
    * stages land merge-on-read deltas instead (see
    * [[ParquetDestinationDriver.deltaSegments]] and the
    * `metrics/batch_*` processed-row evidence).
    */
  def stageGenerations(spark: SparkSession, base: String,
      dest: ParquetDestinationDriver = new ParquetDestinationDriver): Map[String, Int] =
    CurationPipeline.migrations(s"$base/stages")
      .map(m => m.spec.name -> dest.generations(spark, m.spec).size)
      .toMap

  /** Convenience for specs: the mix-stage spec rooted at `base`. */
  private[graft] def mixSpec(base: String): MigrationSpec =
    CurationPipeline.migrations(s"$base/stages").last.spec

  /** Dense-id sanity used by gate and spec: (#rows, #distinct dids,
    * min did, max did) of the current curated snapshot.
    */
  private[graft] def didShape(df: DataFrame): (Long, Long, Long, Long) = {
    val r = df.agg(
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
      org.apache.spark.sql.functions.countDistinct(col("did")),
      org.apache.spark.sql.functions.min(col("did")),
      org.apache.spark.sql.functions.max(col("did"))).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }
}
