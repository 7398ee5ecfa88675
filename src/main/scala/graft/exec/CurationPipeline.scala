package graft.exec

import graft.drivers.{ParquetDestinationDriver, SourceDriver}
import graft.ops.TextOps
import graft.spec.{IdField, LongId, MigrationSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The LLM-corpus curation pipeline AS a migration DAG — the composition
  * point of the engine's two halves: the reference-shaped ETL core
  * (dependent [[MigrationSpec]]s with mapping tables, upsert re-runs and
  * orphan semantics, `/root/reference/tests/src/Command/
  * MigrateCommandTest.php:91-501`'s end-to-end shape) running the
  * LLM-data operators (fingerprint dedup, quality gating, language ID,
  * mixture rebalancing) as its stage transforms.
  *
  * Five dependent migrations over the `documents` corpus, each stage's
  * source the previous stage's generation-pointer destination:
  *
  * {{{
  * llm_ingest  : documents → (did, src_doc_id, source, text, fp, n_tokens)
  *               did is MAPPING-ASSIGNED (generated ids: dense rank by
  *               doc_id on first run, stable via the mapping table on
  *               re-runs — the executor's assignGeneratedIds path)
  * llm_dedup   : exact dedup — first document per canonical fingerprint
  *               (GroupedTopK k=1 per fp: bounded heaps, partial phase
  *               before the exchange — never a per-group full sort)
  * llm_quality : the rule-based quality gate (length band, word-length
  *               band, stopword evidence, dominant-token cap — the
  *               text_quality_filters predicate, integer-exact)
  * llm_langid  : script/stopword language annotation (langIdHeuristic)
  * llm_mix     : mixture rebalance — every source capped to the minimum
  *               per-source survivor count by deterministic md5 order
  *               (uniform source mixture, reproducible across runs)
  * }}}
  *
  * Every stage runs through [[MigrationExecutor]] — mapping rows are
  * recorded per stage, re-runs take the upsert path (unchanged rows
  * merge, mapped ids stay stable), and a shrunk re-run under
  * `PruneOrphans` propagates deletions down the whole DAG because each
  * stage's source IS the previous stage's post-prune snapshot
  * (ExecutorSpec proves both).
  *
  * Scale shape: the corpus is read once (ingest); each stage is one or
  * two key shuffles (fp / did / source) over progressively smaller data;
  * the only driver-side values are two O(#sources) scalars (the mixture
  * cap and per-stage counts). Nothing here is gate-specific — this is
  * the production curation entry point.
  */
object CurationPipeline {

  /** Stage names, in dependency order. */
  val StageNames: Seq[String] =
    Seq("llm_ingest", "llm_dedup", "llm_quality", "llm_langid", "llm_mix")

  private def spec(base: String, name: String, deps: Seq[String],
      srcId: String, destIds: Seq[IdField]): MigrationSpec =
    MigrationSpec(name, source = "", sourceDriver = "inline",
      destination = s"$base/$name", destinationDriver = "parquet",
      sourceIds = Seq(IdField(srcId, LongId)), destinationIds = destIds,
      depends = deps)

  /** The five stage migrations rooted at `base` (one generation-pointer
    * destination directory per stage under it).
    */
  def migrations(base: String): Seq[Migration] = {
    val ingestSpec = spec(base, "llm_ingest", Nil, "doc_id",
      Seq(IdField("did", LongId)))
    val dedupSpec = spec(base, "llm_dedup", Seq("llm_ingest"), "did",
      Seq(IdField("did", LongId)))
    val qualitySpec = spec(base, "llm_quality", Seq("llm_dedup"), "did",
      Seq(IdField("did", LongId)))
    val langidSpec = spec(base, "llm_langid", Seq("llm_quality"), "did",
      Seq(IdField("did", LongId)))
    val mixSpec = spec(base, "llm_mix", Seq("llm_langid"), "did",
      Seq(IdField("did", LongId)))

    Seq(
      // ingest: normalize + fingerprint + token-count. No `did` column is
      // emitted, so the executor resolves destination ids through the
      // mapping table and generates dense ids for unmapped rows (rank by
      // doc_id — the distributed zipWithIndex path, no global window);
      // re-runs find every doc_id mapped and keep its did.
      new Migration {
        def spec: MigrationSpec = ingestSpec
        def transform(src: DataFrame, ctx: TransformContext): DataFrame =
          src.select(col("doc_id"), col("doc_id").as("src_doc_id"),
            col("source"), col("text"),
            TextOps.fingerprint(col("text")).as("fp"),
            TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      },
      // exact dedup: ONE survivor per canonical fingerprint — the
      // smallest did (= earliest doc_id). GroupedTopK is the engine's
      // own two-phase physical operator: per-partition bounded heaps
      // reduce before the fp exchange, so the shuffle carries at most
      // one row per (fp, input partition), not the whole corpus sorted.
      new Migration {
        def spec: MigrationSpec = dedupSpec
        def transform(src: DataFrame, ctx: TransformContext): DataFrame =
          graft.plans.GroupedTopK(src, keys = Seq("fp"),
              orderBy = Seq(("did", true)), k = 1)
            // fp stays in the survivor table: the dedup state doubles as
            // the historical fingerprint set the incremental path
            // anti-joins new batches against (downstream stages drop it)
            .select(col("did"), col("src_doc_id"), col("source"),
              col("text"), col("n_tokens"), col("fp"))
      },
      // quality gate: the integer-exact rule set of text_quality_filters
      // (token-count band, 3..10 avg word length via cross-multiplied
      // integers, ≥2 distinct stopwords, dominant token ≤ 20%). The
      // dominant-token feature is the one aggregation: explode → two
      // keyed aggs → join back on did.
      new Migration {
        def spec: MigrationSpec = qualitySpec
        def transform(src: DataFrame, ctx: TransformContext): DataFrame = {
          val maxTok = src
            .select(col("did"), explode(split(col("text"), " ")).as("tok"))
            .groupBy(col("did"), col("tok")).agg(count(lit(1)).as("c"))
            .groupBy(col("did")).agg(max(col("c")).as("max_tok"))
          val n = col("n_tokens")
          val ch = length(col("text")).cast("long")
          val ds = size(array_distinct(filter(split(col("text"), " "),
            t => t.isInCollection(TextOps.DefaultStopwords)))).cast("long")
          src.join(maxTok, Seq("did"))
            .filter(n >= 50 && n <= 100000L &&
              ch - n + 1 >= n * 3 && ch - n + 1 <= n * 10 &&
              ds >= 2 && col("max_tok") * 5 <= n)
            .select(col("did"), col("src_doc_id"), col("source"),
              col("text"), col("n_tokens"))
        }
      },
      // language annotation: pure per-row projection, scan speed.
      new Migration {
        def spec: MigrationSpec = langidSpec
        def transform(src: DataFrame, ctx: TransformContext): DataFrame =
          src.select(col("did"), col("src_doc_id"), col("source"),
            col("text"), col("n_tokens"),
            TextOps.langIdHeuristic(col("text")).as("predicted_lang"))
      },
      // mixture rebalance: uniform source mixture — cap every source at
      // the minimum per-source survivor count, members chosen by
      // deterministic md5(doc_id ‖ 'mix') order so the sample is
      // reproducible run-over-run. The cap is an O(#sources) scalar
      // gate; the per-source selection is GroupedTopK again (bounded
      // heaps, no per-source full sort).
      new Migration {
        def spec: MigrationSpec = mixSpec
        def transform(src: DataFrame, ctx: TransformContext): DataFrame = {
          val cap = src.groupBy(col("source")).agg(count(lit(1)).as("c"))
            .agg(min(col("c"))).head() match {
              case r if r.isNullAt(0) => 0L
              case r                  => r.getLong(0)
            }
          if (cap == 0L) src.limit(0)
          else graft.plans.GroupedTopK(
              src.withColumn("mix_key",
                md5(concat(col("src_doc_id").cast("string"), lit("mix")))),
              keys = Seq("source"),
              orderBy = Seq(("mix_key", true), ("src_doc_id", true)),
              k = math.min(cap, Int.MaxValue.toLong).toInt)
            .select(col("did"), col("src_doc_id"), col("source"),
              col("text"), col("n_tokens"), col("predicted_lang"))
        }
      })
  }

  /** The stage set for INCREMENTAL (micro-batch delta) execution —
    * identical to [[migrations]] except the dedup stage, the one whose
    * batch transform is only correct over the full universe. Ingest,
    * quality and langid are per-document functions: applied to a delta
    * they produce exactly the delta of their full-corpus output.
    * Dedup over a delta alone would miss cross-batch duplicates, so the
    * incremental variant checks survivors-within-the-batch against the
    * HISTORICAL fingerprint set (its own reconciled state, handed in as
    * `ctx.snapshot` by [[MigrationExecutor.executeDelta]]).
    *
    * Correctness hinges on arrival order: dids are assigned densely in
    * batch order, so every historical did < every delta did, and
    * "fp seen before this batch" ⇔ "this doc loses the global min-did
    * race" — the incremental survivor set equals the batch pipeline's.
    * Replay safety: history rows carrying one of THIS batch's own dids
    * (a crashed earlier attempt) are excluded before the fingerprint
    * anti-join, so a replayed batch recomputes the identical delta.
    *
    * Scale shape: the history is never shuffled — the batch's
    * fingerprints broadcast into a semi-join that reduces the history
    * scan to the handful of colliding rows, and both anti-joins
    * broadcast the (small) batch side.
    */
  def incrementalMigrations(base: String): Seq[Migration] = {
    val batch = migrations(base)
    val batchDedup = batch(1)
    batch.updated(1, new Migration {
      def spec: MigrationSpec = batchDedup.spec
      def transform(src: DataFrame, ctx: TransformContext): DataFrame = {
        val inBatch = batchDedup.transform(src, ctx)
        ctx.snapshot match {
          case None => inBatch
          case Some(hist) =>
            val batchFps = src.select(col("fp")).distinct()
            val collisions = hist
              .join(broadcast(batchFps), Seq("fp"), "left_semi")
              .join(broadcast(src.select(col("did"))), Seq("did"), "left_anti")
              .select(col("fp")).distinct()
            inBatch.join(broadcast(collisions), Seq("fp"), "left_anti")
        }
      }
    })
  }

  /** Stage sources: ingest reads the corpus parquet; every later stage
    * reads the previous stage's CURRENT generation snapshot through the
    * same destination driver the DAG writes with.
    */
  def sources(documentsPath: String, base: String,
      dest: ParquetDestinationDriver): Migration => SourceDriver =
    sourcesFrom(s => s.read.parquet(documentsPath), base, dest)

  /** [[sources]] with an arbitrary corpus reader for the ingest stage —
    * what the streaming pipeline uses to read its cumulative landed
    * directory (recursive lookup, no glob).
    */
  def sourcesFrom(readDocs: SparkSession => DataFrame, base: String,
      dest: ParquetDestinationDriver): Migration => SourceDriver = {
    val prevOf = StageNames.zip(StageNames.drop(1)).map(_.swap).toMap
    val specsByName = migrations(base).map(m => m.spec.name -> m.spec).toMap
    m => m.spec.name match {
      case "llm_ingest" => new SourceDriver {
        def read(s: SparkSession, sp: MigrationSpec): DataFrame = readDocs(s)
      }
      case n => new SourceDriver {
        val prev = specsByName(prevOf(n))
        def read(s: SparkSession, sp: MigrationSpec): DataFrame =
          dest.snapshot(s, prev).getOrElse(
            sys.error(s"curation pipeline: no snapshot for ${prev.name}"))
      }
    }
  }
}
