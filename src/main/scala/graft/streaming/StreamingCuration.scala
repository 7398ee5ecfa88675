package graft.streaming

import graft.drivers.{DestinationDriver, ParquetDestinationDriver, SourceDriver}
import graft.exec.{CurationPipeline, Migration, PruneOrphans}
import graft.spec.MigrationSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming LLM-corpus curation — the engine's two flagship halves run
  * as ONE system: documents arrive as a stream, and every micro-batch
  * drives the full 5-stage curation DAG ([[CurationPipeline]]: ingest →
  * exact dedup → quality gate → langid → mixture rebalance) through the
  * SAME batch `MigrationExecutor.executeAll` the one-shot pipeline uses,
  * with the SAME persistent mapping tables upserting across batches.
  *
  * Per micro-batch, inside `foreachBatch`:
  *
  *   1. LAND — the batch is written to `landed/batch_<batchId>`
  *      (overwrite keyed by batchId: a crash-replayed batch rewrites its
  *      own directory, never doubles — the standard idempotent
  *      foreachBatch sink discipline). The landed set is the pipeline's
  *      bronze table: the cumulative corpus as of this batch.
  *   2. DERIVE — the whole DAG re-runs over the cumulative landed
  *      corpus under [[PruneOrphans]]. Ingest takes the upsert path:
  *      already-mapped doc ids KEEP their mapping-assigned `did`
  *      (ExecutorSpec's idempotence proof), new docs extend the dense
  *      id space; downstream stages re-derive and prune rows their
  *      shrinking upstream no longer supports (a batch-2 duplicate can
  *      evict nothing, but a new mixture cap can). After the final
  *      batch the destination state is BYTE-IDENTICAL to the one-shot
  *      batch pipeline over the same corpus — the property the
  *      `stream_llm_pipeline` gate hashes against `etl_llm_pipeline`'s
  *      oracle.
  *
  * Exactly-once: the file source's checkpoint replays a failed batch
  * with the same id and files; landing is idempotent by construction,
  * and the DAG is an idempotent keyed upsert (re-running any prefix of
  * stages re-merges to the same state). A crash at ANY point — after
  * landing, mid-DAG with some stages committed, or before the batch
  * commit — therefore converges to the same final state on restart;
  * StreamingSpec proves the mid-DAG case with an injected one-shot
  * stage failure.
  *
  * Scale shape: landing costs O(batch); the DAG re-derivation is the
  * batch pipeline's own cost profile (1-2 key shuffles per stage over
  * the cumulative corpus — at true 100 TB cadence one would re-derive
  * on a schedule rather than every micro-batch, which is a trigger
  * choice, not a code change).
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

  /** Start the streaming curation pipeline over `docs` (a streaming
    * DataFrame of document rows). Caller owns the query lifecycle; a
    * restart with the same `checkpointDir` resumes exactly-once.
    */
  def start(docs: DataFrame, base: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      dests: Migration => DestinationDriver = null): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          batch.write.mode("overwrite").parquet(s"$base/landed/batch_$batchId")
          runDag(spark, base, dests = dests)
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

  /** Per-stage generation counts — the incrementality evidence (each
    * completed batch publishes one generation per stage).
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
