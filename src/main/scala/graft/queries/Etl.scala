package graft.queries

import graft.drivers._
import graft.exec._
import graft.mapper.MappingStore
import graft.spec._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ETL/migration operator parity queries (SURVEY §2.1–2.3): each runs the
  * real library surface — drivers, mapping store, executor, reference
  * store, stubber — against scratch dirs, producing a result that is also
  * expressible as plain SQL over the input parquet for the DuckDB oracle.
  * This makes the correctness gate an *end-to-end* check of the engine,
  * not just of Spark built-ins.
  */
object Etl {
  import Tables._

  /** customer-derived upsert scenario used by several queries:
    * existing snapshot = custkey % 3 == 0 (marker 'old'),
    * incoming         = custkey % 2 == 0 (marker 'new').
    */
  private def upsertSpec(dest: String, mapping: String) = MigrationSpec(
    name = "cust_upsert",
    source = "", sourceDriver = "inline",
    destination = dest, destinationDriver = "parquet",
    sourceIds = Seq(IdField("c_custkey", LongId)),
    destinationIds = Seq(IdField("id", LongId)))

  private val scenarioCache = scala.collection.concurrent.TrieMap
    .empty[String, (MigrationResult, MigrationExecutor, MappingStore, MigrationSpec)]

  /** Memoized per sfDir: four queries share one executor run. */
  private def upsertScenario(spark: SparkSession, sf: String) =
    scenarioCache.getOrElseUpdate(sf, runUpsertScenario(spark, sf))

  /** Same scenario through the opt-in hash-bucketed mapping layout
    * (mapping joins shuffle-free on the mapping side).
    */
  private def bucketedScenario(spark: SparkSession, sf: String) =
    scenarioCache.getOrElseUpdate(s"bucketed:$sf",
      runUpsertScenario(spark, sf, "graft_upsert_bucketed", buckets = Some(8)))

  /** Release an executor's pinned caches before handing the gate's lazy
    * result out: the eager run (writes, counts, mapping records) is
    * done, every gate sink here is a stable generation-pointer parquet,
    * so the result recomputes correctly without the pins — and the
    * 170-query suite no longer accumulates one storage entry per
    * executor run (the r9 bench-tail contamination). The memoized
    * upsert scenario keeps its pins: four queries share that run
    * (TrieMap shared-layout precedent).
    */
  private def releasing(owners: AnyRef*)(df: DataFrame): DataFrame = {
    owners.foreach {
      case e: MigrationExecutor => e.release()
      case r: ReferenceStore => r.release()
      case o => throw new IllegalArgumentException(s"not releasable: $o")
    }
    df
  }

  /** Cold side of the skewed enrichment: one row per skew key (97
    * customers). A plain filtered SCAN — AQE's OptimizeSkewedJoin
    * pattern needs a Sort-over-shuffle-over-scan child; an aggregate
    * here would break the rewrite (SkewProbe-learned, see
    * q_skew_aqe_join's notes).
    */
  private[queries] def skewDim(cust: DataFrame): DataFrame =
    cust.filter(col("c_custkey") < 97)
      .select(col("c_custkey").cast("long").as("skew_key"),
        col("c_nationkey").cast("long").as("region"))

  /** The skewed-corpus enrichment join (hot key 0 ≈ 10% of events,
    * Shared.skewedEventKey): the join inside etl_skewed_upsert's
    * transform and the exact shape PlanAudit re-executes under
    * skew-tuned AQE thresholds to prove the hot partition splits. The
    * md5 pad keeps shuffle bytes tracking row counts (constant-key
    * partitions otherwise compress the size signal away); the
    * repartition(16) gives the fact side the >1 upstream map task real
    * multi-split inputs have for free (splits are map-index ranges).
    */
  private[queries] def skewedEnrichment(ev: DataFrame, dim: DataFrame): DataFrame =
    ev.select(col("event_id"),
        Shared.skewedEventKey(col("event_id"), col("user_id")).as("skew_key"),
        col("event_type"), md5(col("event_id").cast("string")).as("pad"))
      .repartition(16)
      .join(dim, Seq("skew_key"))

  private def runUpsertScenario(
      spark: SparkSession, sf: String,
      tag: String = "graft_upsert",
      buckets: Option[Int] = None): (MigrationResult, MigrationExecutor, MappingStore, MigrationSpec) = {
    val base = scratch(tag)
    val spec = upsertSpec(s"$base/dest", s"$base/map")
    val mapper = new MappingStore(s"$base/map", buckets = buckets)
    val refs = new ReferenceStore(mapper)
    val exec = new MigrationExecutor(mapper, refs, KeepOrphans)
    val dest = new ParquetDestinationDriver
    val cust = load(spark, sf, "customer")
    // seed the pre-existing destination snapshot (custkey % 3 == 0)
    dest.write(
      cust.filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("id"), upper(col("c_name")).as("name_upper"),
          lit("old").as("marker")),
      spec)
    val source = new SourceDriver {
      def read(s: SparkSession, sp: MigrationSpec): DataFrame =
        load(s, sf, "customer").filter(col("c_custkey") % 2 === 0)
    }
    val theSpec = spec
    val migration = new Migration {
      def spec: MigrationSpec = theSpec
      def transform(src: DataFrame, ctx: TransformContext): DataFrame =
        src.select(col("c_custkey"), col("c_custkey").as("id"),
          upper(col("c_name")).as("name_upper"), lit("new").as("marker"))
    }
    (exec.execute(spark, migration, source, dest), exec, mapper, spec)
  }

  val defs: Seq[QueryDef] = Seq(

    // §2.3 upsert merge: full-outer semantics with incoming-wins — the
    // heart of the engine (`DataMigrationExecutor.php:211-221` +
    // `DataMigrationMapper.php:90-135`), run twice-in-one (pre-seeded
    // snapshot) through the real executor.
    QueryDef("etl_upsert_merge",
      (spark, sf) => {
        val (res, _, _, _) = upsertScenario(spark, sf)
        res.finalSnapshot.select(col("id"), col("name_upper"), col("marker"))
          .orderBy(col("id"))
      },
      Some("""WITH existing AS (
             |  SELECT c_custkey AS id, UPPER(c_name) AS name_upper, 'old' AS marker
             |  FROM customer WHERE c_custkey % 3 = 0),
             |incoming AS (
             |  SELECT c_custkey AS id, UPPER(c_name) AS name_upper, 'new' AS marker
             |  FROM customer WHERE c_custkey % 2 = 0)
             |SELECT COALESCE(i.id, e.id) AS id,
             |  COALESCE(i.name_upper, e.name_upper) AS name_upper,
             |  COALESCE(i.marker, e.marker) AS marker
             |FROM incoming i FULL OUTER JOIN existing e ON i.id = e.id
             |ORDER BY id""".stripMargin),
      bench = true),

    // CDC apply (engine-native extension): compact an I/U/D operation
    // log (latest op per key wins across sequence numbers) and merge it
    // into a keyed snapshot — explicit deletes, the complement of the
    // executor's orphan INFERENCE. One log-compaction window + one
    // full-outer merge, both on the key. The log deliberately overlaps:
    // every even key gets an update, every 10th a LATER delete that must
    // win over it.
    QueryDef("etl_cdc_apply",
      (spark, sf) => {
        val (snapshot, log) = Shared.cdcScenario(spark, sf)
        graft.ops.Cdc.applyLog(snapshot, log, "id", "op", Seq("seq"))
          .orderBy(col("id"))
      },
      Some(Shared.CdcOracle)),

    // Incremental view maintenance (engine-native lakehouse extension):
    // a grouped aggregate (count + sum per bucket) maintained from the
    // CDC op log ALONE — old contributions come from a semi-join of the
    // base against the delta's keys (point lookups, bucket/bloom-
    // prunable at scale), never a rescan of the base table; the delta
    // aggregate is ⊕-merged into the old view. At 100 TB this is the
    // difference between touching the changed keys and re-aggregating
    // the world. The oracle recomputes the view from the fully patched
    // table, so the maintenance algebra (insert/update/delete, upsert
    // on absent keys, group emptying) is verified end to end.
    QueryDef("etl_ivm_agg",
      (spark, sf) => {
        import org.apache.spark.sql.expressions.Window
        val (snapshot, log) = Shared.cdcScenario(spark, sf)
        // compact the DELTA (latest op per key) — window over the log
        // only, which is the small side by IVM's premise
        val wSeq = Window.partitionBy(col("id")).orderBy(col("seq").desc)
        val compacted = log.withColumn("rn", row_number().over(wSeq))
          .filter(col("rn") === 1).drop("rn")
        val mvOld = snapshot.groupBy((col("id") % 7).as("g"))
          .agg(count(lit(1)).as("n"), sum(col("bal_cents")).as("s"))
        val oldAff = snapshot
          .join(compacted.select(col("id")), Seq("id"), "left_semi")
          .groupBy((col("id") % 7).as("g"))
          .agg(count(lit(1)).as("n_o"), sum(col("bal_cents")).as("s_o"))
        val newAff = compacted.filter(col("op") =!= "D")
          .groupBy((col("id") % 7).as("g"))
          .agg(count(lit(1)).as("n_n"), sum(col("bal_cents")).as("s_n"))
        val delta = oldAff.join(newAff, Seq("g"), "full_outer")
        mvOld.join(delta, Seq("g"), "full_outer")
          .na.fill(0L, Seq("n", "s", "n_o", "s_o", "n_n", "s_n"))
          .select(col("g"),
            (col("n") + col("n_n") - col("n_o")).as("n_members"),
            (col("s") + col("s_n") - col("s_o")).as("bal_sum"))
          .filter(col("n_members") > 0)
          .orderBy(col("g"))
      },
      Some(Shared.IvmOracle)),

    // Generation time travel (engine-native lakehouse extension): the
    // parquet sink's retained generations stay readable after the
    // pointer flips, so an audit can read the pre-run snapshot (gen0),
    // the post-run snapshot (gen1) and their keyed diff — without any
    // extra storage beyond what the sink already keeps. The diff join
    // identifies exactly the upsert-updated rows.
    QueryDef("etl_time_travel",
      (spark, sf) => {
        val (_, _, _, spec) = upsertScenario(spark, sf)
        val dest = new ParquetDestinationDriver
        val g0 = dest.snapshotAt(spark, spec, 0).get
        val g1 = dest.snapshotAt(spark, spec, 1).get
        val stats = (df: DataFrame, tag: String) => df.agg(
          lit(tag).as("tag"), count(lit(1)).as("n"), sum(col("id")).as("id_sum"))
        val updated = g0.select(col("id"), col("marker").as("m0"))
          .join(g1.select(col("id"), col("marker").as("m1")), "id")
          .filter(col("m0") =!= col("m1"))
        stats(g0, "gen0")
          .unionByName(stats(g1, "gen1"))
          .unionByName(stats(updated, "updated"))
          .orderBy(col("tag"))
      },
      Some("""WITH g0 AS (
             |  SELECT c_custkey AS id FROM customer WHERE c_custkey % 3 = 0),
             |g1 AS (
             |  SELECT c_custkey AS id FROM customer
             |  WHERE c_custkey % 2 = 0 OR c_custkey % 3 = 0),
             |updated AS (
             |  SELECT c_custkey AS id FROM customer WHERE c_custkey % 6 = 0)
             |SELECT 'gen0' AS tag, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(id) AS BIGINT) AS id_sum FROM g0
             |UNION ALL SELECT 'gen1', COUNT(*), CAST(SUM(id) AS BIGINT) FROM g1
             |UNION ALL SELECT 'updated', COUNT(*), CAST(SUM(id) AS BIGINT) FROM updated
             |ORDER BY tag""".stripMargin)),

    // Generation rollback (engine-native lakehouse extension): the undo
    // button on the generation-pointer sink. `_CURRENT` flips back to a
    // retained older generation with ONE atomic metadata write — no
    // data moves at any table size — while the abandoned newer
    // generation stays time-travelable until vacuum, and the next
    // write() branches to max(gen)+1 (the directory listing, never the
    // pointer, names the next generation — the WAP-race rule), so the
    // abandoned branch is never silently overwritten. The gate proves
    // the whole lifecycle: overwrite, rollback, a branched write
    // derived from the rolled-back snapshot, the abandoned branch
    // still readable, and the retained-generation ledger.
    QueryDef("etl_rollback",
      (spark, sf) => {
        import graft.drivers.ParquetDestinationDriver
        import graft.spec.{IdField, LongId, MigrationSpec}
        val dir = scratch("graft_rollback") + "/dest"
        val spec = MigrationSpec("rollback", source = dir,
          sourceDriver = "parquet",
          destination = dir, destinationDriver = "parquet",
          sourceIds = Seq(IdField("id", LongId)),
          destinationIds = Seq(IdField("id", LongId)))
        val d = new ParquetDestinationDriver()
        val cust = load(spark, sf, "customer")
          .select(col("c_custkey").cast("long").as("id"))
        d.write(cust.filter(col("id") % 3 === 0)
          .withColumn("marker", lit("a")), spec)                  // gen0
        d.write(cust.filter(col("id") % 2 === 0)
          .withColumn("marker", lit("b")), spec)                  // gen1
        d.rollback(spark, spec, 0L)                               // undo gen1
        val branched = d.snapshot(spark, spec).get                // = gen0
          .unionByName(cust
            .filter(col("id") % 5 === 0 && col("id") % 3 =!= 0)
            .withColumn("marker", lit("c")))
        d.write(branched, spec)                                   // gen2
        val stats = (df: DataFrame, tag: String) => df.agg(
          lit(tag).as("tag"), count(lit(1)).as("n"),
          sum(col("id")).as("id_sum"))
        val gens = d.generations(spark, spec)
        val ledger = spark.range(1).select(lit("history").as("tag"),
          lit(gens.size.toLong).as("n"), lit(gens.sum).as("id_sum"))
        stats(d.snapshot(spark, spec).get, "current")
          .unionByName(stats(d.snapshotAt(spark, spec, 1).get,
            "gen1_abandoned"))
          .unionByName(ledger)
          .orderBy(col("tag"))
      },
      Some("""WITH cur AS (
             |  SELECT c_custkey AS id FROM customer
             |  WHERE c_custkey % 3 = 0 OR c_custkey % 5 = 0),
             |g1 AS (SELECT c_custkey AS id FROM customer
             |       WHERE c_custkey % 2 = 0)
             |SELECT 'current' AS tag, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(id) AS BIGINT) AS id_sum FROM cur
             |UNION ALL
             |SELECT 'gen1_abandoned', COUNT(*), CAST(SUM(id) AS BIGINT) FROM g1
             |UNION ALL
             |SELECT 'history', CAST(3 AS BIGINT), CAST(3 AS BIGINT)
             |ORDER BY tag""".stripMargin)),

    // Multi-table atomic publish (engine-native lakehouse extension,
    // [[graft.drivers.TxnPublish]]): a derived-table pair (rows +
    // their per-nation rollup) must commit together or not at all.
    // The gate runs the WORST case: both candidates staged, the
    // write-ahead manifest made durable, then a simulated crash after
    // only the FIRST pointer flip — and recovery rolls the transaction
    // forward, so the cross-table invariant (rollup totals == row
    // count) holds at the end. All transaction machinery is
    // O(#participants) driver metadata; the staged data was already
    // written once by the ordinary WAP path.
    QueryDef("etl_txn_publish",
      (spark, sf) => {
        import graft.drivers.{ParquetDestinationDriver, TxnPublish}
        import graft.spec.{IdField, LongId, MigrationSpec, StringId}
        val base = scratch("graft_txn")
        def mkSpec(name: String, dir: String, ids: Seq[IdField]) =
          MigrationSpec(name, source = dir, sourceDriver = "parquet",
            destination = dir, destinationDriver = "parquet",
            sourceIds = ids, destinationIds = ids)
        val specA = mkSpec("txn_rows", s"$base/a",
          Seq(IdField("id", LongId)))
        val specB = mkSpec("txn_rollup", s"$base/b",
          Seq(IdField("nation", LongId)))
        val d = new ParquetDestinationDriver()
        val cust = load(spark, sf, "customer")
          .select(col("c_custkey").cast("long").as("id"),
            col("c_nationkey").cast("long").as("nation"))
        def pair(p: org.apache.spark.sql.Column)
            : (DataFrame, DataFrame) = {
          val rows = cust.filter(p)
          (rows, rows.groupBy(col("nation")).agg(count(lit(1)).as("cnt")))
        }
        val (a0, b0) = pair(col("id") % 3 === 0)
        d.write(a0, specA); d.write(b0, specB)              // gen0 pair
        val (a1, b1) = pair(col("id") % 2 === 0)
        val gA = d.stage(a1, specA)                          // candidates
        val gB = d.stage(b1, specB)
        TxnPublish.prepare(spark,
          Seq((d, specA, gA), (d, specB, gB)), s"$base/txn")
        d.publish(spark, specA, gA)     // CRASH: only one flip landed
        val recovered = TxnPublish.recover(spark, s"$base/txn",
          Seq((d, specA), (d, specB)))  // rolls the txn FORWARD
        val aStats = d.snapshot(spark, specA).get
          .agg(count(lit(1)).as("n"), sum(col("id")).as("v"))
          .select(lit("a").as("tag"), col("n"), col("v"))
        val bStats = d.snapshot(spark, specB).get
          .agg(count(lit(1)).as("n_rows"), sum(col("cnt")).as("total"))
          .select(lit("b").as("tag"), col("n_rows").as("n"),
            col("total").as("v"))
        val aCnt = d.snapshot(spark, specA).get.count()
        val bTot = d.snapshot(spark, specB).get
          .agg(sum(col("cnt"))).collect()(0).getLong(0)
        val txnRow = spark.range(1).select(lit("txn").as("tag"),
          lit(recovered.toLong).as("n"),
          lit(if (aCnt == bTot) 1L else 0L).as("v"))
        aStats.unionByName(bStats).unionByName(txnRow)
          .orderBy(col("tag"))
      },
      Some("""WITH a AS (
             |  SELECT c_custkey AS id, c_nationkey AS nation
             |  FROM customer WHERE c_custkey % 2 = 0)
             |SELECT 'a' AS tag, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(id) AS BIGINT) AS v FROM a
             |UNION ALL
             |SELECT 'b', CAST(COUNT(DISTINCT nation) AS BIGINT),
             |  CAST(COUNT(*) AS BIGINT) FROM a
             |UNION ALL
             |SELECT 'txn', CAST(1 AS BIGINT), CAST(1 AS BIGINT)
             |ORDER BY tag""".stripMargin)),

    // Named tags on the generation sink (the Iceberg tag semantic):
    // tag a retained generation, read it BY NAME, survive N-newest
    // vacuums regardless of age (tag-protected — untagged peers of the
    // same age are reclaimed), anchor rollback by name, and lose
    // protection the moment the tag drops. The gate choreographs the
    // whole lifecycle — tag gen0 'baseline', write past it under
    // keepGenerations=2 (vacuum reclaims untagged gen1/gen2 but never
    // the baseline), roll back BY TAG, branch forward, drop the tag,
    // and watch the next vacuum finally reclaim gen0 — folding each
    // invariant into a lit-guard. All tag machinery is O(1) driver-side
    // files; no data moves at any table size.
    QueryDef("etl_tags",
      (spark, sf) => {
        val base = scratch("graft_tags") + "/dest"
        val sp = MigrationSpec("tags", source = "", sourceDriver = "inline",
          destination = base, destinationDriver = "parquet",
          sourceIds = Seq(IdField("id", LongId)),
          destinationIds = Seq(IdField("id", LongId)))
        val d = new ParquetDestinationDriver(keepGenerations = Some(2))
        val cust = load(spark, sf, "customer")
        def gen(mod: Int) = cust.filter(col("c_custkey") % mod === 0)
          .select(col("c_custkey").cast("long").as("id"))
        d.write(gen(3), sp)                          // gen0
        d.tag(spark, sp, "baseline", 0L)
        val tagUnretained = try { d.tag(spark, sp, "bogus", 7L); false }
          catch { case _: IllegalArgumentException => true }
        d.write(gen(4), sp)                          // gen1 (keep {0,1})
        d.write(gen(5), sp)                          // gen2: vacuum spares tagged gen0
        d.write(gen(6), sp)                          // gen3: vacuum drops gen1 only
        val protectedOk = d.generations(spark, sp) == Seq(0L, 2L, 3L)
        // materialized NOW: gen0's files die in the post-dropTag vacuum
        // below, and a lazy plan over them would read deleted files
        val bs = d.snapshotAtTag(spark, sp, "baseline").get
          .agg(count(lit(1)).as("n"), sum(col("id")).as("id_sum")).head()
        val baseStats = spark.range(1)
          .select(lit(bs.getLong(0)).as("n"), lit(bs.getLong(1)).as("id_sum"))
        d.rollbackToTag(spark, sp, "baseline")
        val rolledOk = d.currentGeneration(spark, sp).contains(0L)
        d.write(gen(7), sp)                          // gen4 branches past gen3
        d.dropTag(spark, sp, "baseline")
        d.write(gen(8), sp)                          // gen5: gen0 now reclaimable
        val endGens = d.generations(spark, sp)
        val ok = tagUnretained && protectedOk && rolledOk &&
          endGens == Seq(4L, 5L) && d.tags(spark, sp).isEmpty
        val cur = d.snapshot(spark, sp).get
          .agg(count(lit(1)).as("n"), sum(col("id")).as("id_sum"))
        val ledger = spark.range(1).select(lit(endGens.size.toLong).as("n"),
          lit(endGens.sum).as("id_sum"))
        baseStats.select(lit("baseline").as("tag"), col("n"), col("id_sum"))
          .unionByName(cur.select(lit("current").as("tag"), col("n"), col("id_sum")))
          .unionByName(ledger.select(lit("history").as("tag"), col("n"), col("id_sum")))
          .filter(lit(ok))
          .orderBy(col("tag"))
      },
      Some("""SELECT 'baseline' AS tag, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(c_custkey) AS BIGINT) AS id_sum
             |FROM customer WHERE c_custkey % 3 = 0
             |UNION ALL
             |SELECT 'current', COUNT(*), CAST(SUM(c_custkey) AS BIGINT)
             |FROM customer WHERE c_custkey % 8 = 0
             |UNION ALL
             |SELECT 'history', CAST(2 AS BIGINT), CAST(9 AS BIGINT)
             |ORDER BY tag""".stripMargin)),

    // Named BRANCHES on the generation sink (the Nessie/Iceberg-branch
    // semantic — multi-commit write isolation, where WAP's single
    // staged generation is a one-commit special case): fork from main,
    // commit twice on the branch while every main reader stays pinned,
    // FAST-FORWARD main to the branch head in one atomic flip (legal
    // only while main still sits at the fork base — ancestry by
    // construction), and prove the conflict path: a branch whose base
    // was overtaken by a later main commit must refuse to merge
    // (re-fork and re-apply is the caller's move, the CAS discipline at
    // branch granularity). All branch machinery is O(1) driver-side
    // files; generation numbers stay globally unique via the shared
    // listing rule.
    QueryDef("etl_branches",
      (spark, sf) => {
        val base = scratch("graft_branches") + "/dest"
        val sp = MigrationSpec("branches", source = "", sourceDriver = "inline",
          destination = base, destinationDriver = "parquet",
          sourceIds = Seq(IdField("id", LongId)),
          destinationIds = Seq(IdField("id", LongId)))
        val d = new ParquetDestinationDriver
        val cust = load(spark, sf, "customer")
        def rows(mod: Int, marker: String) =
          cust.filter(col("c_custkey") % mod === 0)
            .select(col("c_custkey").cast("long").as("id"), lit(marker).as("marker"))
        d.write(rows(3, "main"), sp)                          // gen0 = main
        d.createBranch(spark, sp, "exp", 0L)
        // two commits on the branch; main readers never see them
        d.writeToBranch(rows(4, "exp1"), sp, "exp")           // gen1 (head)
        val mainStable = d.currentGeneration(spark, sp).contains(0L)
        d.writeToBranch(rows(4, "exp2"), sp, "exp")           // gen2 (head)
        val isolated = d.snapshot(spark, sp).get               // still gen0
          .agg(count(lit(1))).head().getLong(0) ==
          rows(3, "main").count()
        val merged = d.fastForward(spark, sp, "exp")           // main -> gen2
        val ffOk = merged == 2L && d.currentGeneration(spark, sp).contains(2L) &&
          d.branches(spark, sp).isEmpty
        // conflict path: fork, then main moves, merge must refuse
        d.createBranch(spark, sp, "late", 2L)
        d.writeToBranch(rows(5, "late1"), sp, "late")         // gen3
        d.write(rows(6, "hot"), sp)                           // gen4: main overtakes
        val conflicted = try { d.fastForward(spark, sp, "late"); false }
          catch { case _: ConcurrentPublishException => true }
        // re-fork from the new main and re-apply — the retry discipline
        d.dropBranch(spark, sp, "late")
        d.createBranch(spark, sp, "late2", 4L)
        d.writeToBranch(rows(5, "late1"), sp, "late2")        // gen5
        d.fastForward(spark, sp, "late2")                     // main -> gen5
        val ok = mainStable && isolated && ffOk && conflicted &&
          d.currentGeneration(spark, sp).contains(5L)
        releasing()(
          d.snapshot(spark, sp).get.filter(lit(ok))
            .select(col("id"), col("marker")).orderBy(col("id")))
      },
      Some("""SELECT CAST(c_custkey AS BIGINT) AS id, 'late1' AS marker
             |FROM customer WHERE c_custkey % 5 = 0
             |ORDER BY id""".stripMargin)),

    // Optimistic concurrency on the generation pointer
    // (ParquetDestinationDriver optimistic=true): two executor runs
    // upsert the SAME destination from overlapping snapshots — the
    // lost-update anomaly TxnPublish cannot catch (it serializes
    // distinct tables, not rival writers of one table). Writer B reads
    // its snapshot, then writer A's ENTIRE run lands (the deterministic
    // interleave: B's post-snapshot hook runs A to completion); B's
    // publish must CAS-fail — its merge no longer contains A's rows —
    // and the retry (re-read, re-merge through a fresh executor run)
    // lands both writers' updates. The gate hashes the final corpus and
    // pins exactly one conflict + the {seed, A, B-retry} generation
    // ledger via a lit-guard filter. All CAS machinery is O(1) driver
    // file metadata per publish — nothing table-sized.
    QueryDef("etl_concurrent_writers",
      (spark, sf) => {
        val base = scratch("graft_cas_writers")
        val theSpec = MigrationSpec("cas_upsert", source = "", sourceDriver = "inline",
          destination = s"$base/dest", destinationDriver = "parquet",
          sourceIds = Seq(IdField("c_custkey", LongId)),
          destinationIds = Seq(IdField("id", LongId)))
        val cust = load(spark, sf, "customer")
        // seed generation: the %5 universe, untouched names
        new ParquetDestinationDriver().write(
          cust.filter(col("c_custkey") % 5 === 0)
            .select(col("c_custkey").as("id"), col("c_name").as("name"),
              lit("base").as("marker")), theSpec)
        val mapper = new MappingStore(s"$base/map")
        val refs = new ReferenceStore(mapper)
        def mig(marker: String, shape: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
          new Migration {
            def spec: MigrationSpec = theSpec
            def transform(src: DataFrame, ctx: TransformContext): DataFrame =
              src.select(col("c_custkey"), col("c_custkey").as("id"),
                shape(col("c_name")).as("name"), lit(marker).as("marker"))
          }
        def src(mod: Int) = new SourceDriver {
          def read(s: SparkSession, sp: MigrationSpec): DataFrame =
            load(s, sf, "customer")
              .filter(col("c_custkey") % 5 === 0 && col("c_custkey") % mod === 0)
        }
        val execA = new MigrationExecutor(mapper, refs, KeepOrphans)
        val execB = new MigrationExecutor(mapper, refs, KeepOrphans)
        val destA = new ParquetDestinationDriver(optimistic = true)
        val destB = new ParquetDestinationDriver(optimistic = true)
        // writer B's destination: after B reads (and observes) its
        // snapshot, writer A's whole run executes — the interleave that
        // makes a last-wins pointer silently drop A's rows
        var fired = false
        val interleaved = new DestinationDriver {
          def snapshot(s: SparkSession, sp: MigrationSpec): Option[DataFrame] = {
            val snap = destB.snapshot(s, sp)
            if (!fired) {
              fired = true
              execA.execute(s, mig("a", upper), src(2), destA): Unit
            }
            snap
          }
          def write(df: DataFrame, sp: MigrationSpec): Unit = destB.write(df, sp)
          override def overwriteIsReadSafe: Boolean = destB.overwriteIsReadSafe
          override def snapshotIsStableAcrossWrites: Boolean = destB.snapshotIsStableAcrossWrites
        }
        var conflicts = 0
        try execB.execute(spark, mig("b", lower), src(3), interleaved): Unit
        catch { case _: ConcurrentPublishException =>
          conflicts += 1
          execB.execute(spark, mig("b", lower), src(3), destB): Unit // re-read + re-merge
        }
        val gens = destB.generations(spark, theSpec)
        val ok = conflicts == 1 && gens == Seq(0L, 1L, 2L) &&
          destB.currentGeneration(spark, theSpec).contains(2L)
        releasing(execA, execB, refs)(
          destB.snapshot(spark, theSpec).get
            .filter(lit(ok))
            .select(col("id"), col("name"), col("marker"))
            .orderBy(col("id")))
      },
      Some("""SELECT CAST(c_custkey AS BIGINT) AS id,
             |  CASE WHEN c_custkey % 3 = 0 THEN lower(c_name)
             |       WHEN c_custkey % 2 = 0 THEN upper(c_name)
             |       ELSE c_name END AS name,
             |  CASE WHEN c_custkey % 3 = 0 THEN 'b'
             |       WHEN c_custkey % 2 = 0 THEN 'a'
             |       ELSE 'base' END AS marker
             |FROM customer WHERE c_custkey % 5 = 0
             |ORDER BY id""".stripMargin)),

    // Upsert merge under a POWER-LAW key: the migration's transform
    // enriches every event through a join on Shared.skewedEventKey
    // (key 0 owns ~10% of all rows — the hot-partition shape that
    // stalls a 1000-executor stage on one straggler task), then flows
    // through the full executor pipeline: seed snapshot, full-outer
    // merge on unique event ids, orphan keep. Correctness is this hash
    // gate; the PLAN property — AQE actually splitting the hot
    // partition when thresholds are at data scale — is asserted
    // structurally in PlanAudit over the identical skewedEnrichment
    // shape, and the skew-vs-uniform wall-clock twin (sub-2×) is the
    // SkewTwinProbe entry in BENCH_NOTES.
    QueryDef("etl_skewed_upsert",
      (spark, sf) => {
        val base = scratch("graft_skewup")
        val theSpec = MigrationSpec("skew_upsert", source = "", sourceDriver = "inline",
          destination = s"$base/dest", destinationDriver = "parquet",
          sourceIds = Seq(IdField("event_id", LongId)),
          destinationIds = Seq(IdField("id", LongId)))
        val mapper = new MappingStore(s"$base/map")
        val exec = new MigrationExecutor(mapper, new ReferenceStore(mapper), KeepOrphans)
        val dest = new ParquetDestinationDriver
        val ev = load(spark, sf, "events")
        // seed: %3 events, not yet enriched (region −1)
        dest.write(ev.filter(col("event_id") % 3 === 0)
          .select(col("event_id").as("id"),
            Shared.skewedEventKey(col("event_id"), col("user_id")).as("skew_key"),
            lit(-1L).as("region"), col("event_type"),
            md5(col("event_id").cast("string")).as("pad"),
            lit("old").as("marker")), theSpec)
        val mig = new Migration {
          def spec: MigrationSpec = theSpec
          def transform(src: DataFrame, ctx: TransformContext): DataFrame =
            skewedEnrichment(src, skewDim(load(ctx.spark, sf, "customer")))
              .select(col("event_id"), col("event_id").as("id"), col("skew_key"),
                col("region"), col("event_type"), col("pad"), lit("new").as("marker"))
        }
        val res = exec.execute(spark, mig,
          new SourceDriver {
            def read(s: SparkSession, sp: MigrationSpec): DataFrame =
              load(s, sf, "events").filter(col("event_id") % 2 === 0)
          }, dest)
        releasing(exec)(res.finalSnapshot
          .select(col("id"), col("skew_key"), col("region"), col("event_type"),
            col("pad"), col("marker"))
          .orderBy(col("id")))
      },
      Some(s"""WITH dim AS (
             |  SELECT CAST(c_custkey AS BIGINT) sk, CAST(c_nationkey AS BIGINT) region
             |  FROM customer WHERE c_custkey < 97),
             |inc AS (
             |  SELECT CAST(event_id AS BIGINT) AS id,
             |    ${Shared.SkewedEventKeySql} AS skew_key,
             |    event_type, md5(CAST(event_id AS VARCHAR)) AS pad
             |  FROM events WHERE event_id % 2 = 0)
             |SELECT id, skew_key, region, event_type, pad, 'new' AS marker
             |FROM inc JOIN dim ON skew_key = sk
             |UNION ALL
             |SELECT CAST(event_id AS BIGINT), ${Shared.SkewedEventKeySql},
             |  CAST(-1 AS BIGINT), event_type, md5(CAST(event_id AS VARCHAR)), 'old'
             |FROM events WHERE event_id % 3 = 0 AND event_id % 2 <> 0
             |ORDER BY id""".stripMargin),
      bench = true),

    // §2.3 orphan detection (left_anti): destination rows whose source
    // disappeared (`DataMigrationExecutor.php:368-382`).
    QueryDef("etl_orphan_detect",
      (spark, sf) => {
        val (res, _, _, _) = upsertScenario(spark, sf)
        res.orphans.select(col("id"), col("marker")).orderBy(col("id"))
      },
      Some("""SELECT c_custkey AS id, 'old' AS marker FROM customer
             |WHERE c_custkey % 3 = 0 AND c_custkey % 2 <> 0
             |ORDER BY id""".stripMargin)),

    // §2.3 mapping table: persisted sourceIds↔destIds rows with status
    // (`DataMigrationMapper.php:90-135`; orphan-keep rows have NULL
    // source ids, `DataMigrationExecutor.php:320-326`).
    QueryDef("etl_mapping_table",
      (spark, sf) => {
        val (_, _, mapper, spec) = upsertScenario(spark, sf)
        mapper.load(spark, spec).get
          .select(col("source_c_custkey"), col("dest_id"), col("status"))
          .orderBy(col("dest_id"), col("source_c_custkey"))
      },
      Some("""SELECT c_custkey AS source_c_custkey, c_custkey AS dest_id,
             |  'migrated' AS status
             |FROM customer WHERE c_custkey % 2 = 0
             |UNION ALL
             |SELECT NULL AS source_c_custkey, c_custkey AS dest_id, 'migrated' AS status
             |FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 2 <> 0
             |ORDER BY dest_id, source_c_custkey""".stripMargin)),

    // §2.3 mapping lookup as a broadcast join (the set-wise
    // `getDestIdsFromSourceIds`, `DataMigrationMapper.php:433-475`):
    // unmapped rows yield NULL dest ids.
    QueryDef("etl_mapping_lookup",
      (spark, sf) => {
        val (_, _, mapper, spec) = upsertScenario(spark, sf)
        val allCust = load(spark, sf, "customer").select(col("c_custkey"))
        mapper.lookupDest(allCust, spec)
          .select(col("c_custkey"), col("dest_id"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
             |  CASE WHEN c_custkey % 2 = 0 THEN c_custkey ELSE NULL END AS dest_id
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // §2.3 + SURVEY §7.1 100 TB layout: the same upsert flow through the
    // hash-bucketed mapping store — generations written
    // `bucketBy(8, source ids)`, so the mapping side of every lookup and
    // merge join carries its partitioning from the files (no exchange; a
    // PlanSpec test pins that). Result must be identical to the plain
    // layout, byte for byte.
    QueryDef("etl_bucketed_mapping",
      (spark, sf) => {
        val (_, _, mapper, spec) = bucketedScenario(spark, sf)
        val allCust = load(spark, sf, "customer").select(col("c_custkey"))
        mapper.lookupDest(allCust, spec)
          .select(col("c_custkey"), col("dest_id"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
             |  CASE WHEN c_custkey % 2 = 0 THEN c_custkey ELSE NULL END AS dest_id
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // §2.1 CSV scan + §2.2 CSV sink: header semantics + atomic-commit
    // write, round-tripped (`CsvSourceDriver.php:39-72`,
    // `CsvDestinationDriver.php:61-203`).
    QueryDef("etl_csv_roundtrip",
      (spark, sf) => {
        val base = scratch("graft_csv")
        val spec = MigrationSpec("csv_rt", source = s"$base/out", sourceDriver = "csv",
          destination = s"$base/out", destinationDriver = "csv",
          sourceIds = Seq(IdField("n_nationkey", LongId)),
          destinationIds = Seq(IdField("n_nationkey", LongId)))
        val nation = load(spark, sf, "nation")
          .select(col("n_nationkey").cast("long"), col("n_name"), col("n_regionkey").cast("long"))
        new CsvDestinationDriver().write(nation, spec)
        new CsvSourceDriver(Some(nation.schema)).read(spark, spec)
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
             |  CAST(n_regionkey AS BIGINT) AS n_regionkey
             |FROM nation ORDER BY n_nationkey""".stripMargin)),

    // §2 named connections: the migration spec says `source = "shared_db"`
    // and the registry supplies URI + driver, with `%param%` placeholder
    // substitution in the URI — config shape
    // (`/root/reference/src/DependencyInjection/Configuration.php:31-54`)
    // resolved per-migration in `DataMigrationManager.php:155-183`. The
    // round-trip below exercises the full chain: name → connection →
    // placeholder expansion → scheme-consistent driver → read-back.
    QueryDef("etl_named_connection",
      (spark, sf) => {
        val base = scratch("graft_namedconn")
        ConnectionRegistry.setParameter("graft.scratch_root", base)
        ConnectionRegistry.addSource("shared_store", "csv://%graft.scratch_root%/conn", "csv")
        ConnectionRegistry.addDestination("shared_store", "csv://%graft.scratch_root%/conn", "csv")
        val spec = ConnectionRegistry.resolveSpec(MigrationSpec("named_conn",
          source = "shared_store", destination = "shared_store",
          sourceIds = Seq(IdField("r_regionkey", LongId)),
          destinationIds = Seq(IdField("r_regionkey", LongId))))
        assert(spec.source == s"csv://$base/conn" && spec.sourceDriver == "csv",
          s"named connection did not resolve: $spec")
        val region = load(spark, sf, "region")
          .select(col("r_regionkey").cast("long"), col("r_name"))
        graft.cli.DriverRegistry.destination(spec.destinationDriver).write(region, spec)
        new CsvSourceDriver(Some(region.schema)).read(spark, spec)
          .orderBy(col("r_regionkey"))
      },
      Some("""SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
             |FROM region ORDER BY r_regionkey""".stripMargin)),

    // §2.1 YAML directory scan + §2.2 YAML sink: path⇔key codec — id
    // values become the directory/file path, are removed from the body on
    // write and re-derived+re-injected on read
    // (`YamlDriverTrait.php:28-85`).
    QueryDef("etl_yaml_roundtrip",
      (spark, sf) => {
        val base = scratch("graft_yaml")
        val spec = MigrationSpec("yaml_rt", source = s"$base/out", sourceDriver = "yaml",
          destination = s"$base/out", destinationDriver = "yaml",
          sourceIds = Seq(IdField("n_regionkey", LongId), IdField("n_nationkey", LongId)),
          destinationIds = Seq(IdField("n_regionkey", LongId), IdField("n_nationkey", LongId)))
        val nation = load(spark, sf, "nation")
          .select(col("n_regionkey").cast("long"), col("n_nationkey").cast("long"), col("n_name"))
        new YamlDestinationDriver().write(nation, spec)
        new YamlSourceDriver().read(spark, spec)
          .select(col("n_regionkey"), col("n_nationkey"), col("n_name"))
          .orderBy(col("n_regionkey"), col("n_nationkey"))
      },
      Some("""SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
             |  CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name
             |FROM nation ORDER BY n_regionkey, n_nationkey""".stripMargin)),

    // §2.2 consolidated YAML layout (r17 verdict task 5 — the escape
    // hatch from the per-entity small-files hazard): ONE multi-document
    // file per path prefix (region), each document carrying the last id
    // (nationkey) inline, reread through the SAME YamlFileFormat
    // machinery by declaring the prefix as the tree's ids — the last id
    // surfaces as an ordinary body column, prefix filters still prune
    // the listing. File count: |regions|, not |nations|. The cap guard
    // itself (per-entity write > maxEntities fails loudly) is
    // DriversSpec's test.
    QueryDef("etl_yaml_consolidated",
      (spark, sf) => {
        val base = scratch("graft_yaml_cons")
        val spec = MigrationSpec("yaml_cons", source = s"$base/out", sourceDriver = "yaml",
          destination = s"$base/out", destinationDriver = "yaml",
          sourceIds = Seq(IdField("n_regionkey", LongId), IdField("n_nationkey", LongId)),
          destinationIds = Seq(IdField("n_regionkey", LongId), IdField("n_nationkey", LongId)))
        val nation = load(spark, sf, "nation")
          .select(col("n_regionkey").cast("long"), col("n_nationkey").cast("long"), col("n_name"))
        new YamlDestinationDriver(consolidate = true).write(nation, spec)
        // one file per region on disk — the layout the write exists for
        val files = new java.io.File(s"$base/out").listFiles()
          .count(_.getName.endsWith(".yaml"))
        val regions = nation.select(col("n_regionkey")).distinct().count()
        require(files == regions,
          s"consolidated layout must write one file per prefix: $files files, $regions regions")
        new YamlSourceDriver().read(spark, spec.copy(sourceIds = spec.sourceIds.init))
          .select(col("n_regionkey"), col("n_nationkey").cast("long").as("n_nationkey"),
            col("n_name"))
          .orderBy(col("n_regionkey"), col("n_nationkey"))
      },
      Some("""SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
             |  CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name
             |FROM nation ORDER BY n_regionkey, n_nationkey""".stripMargin)),

    // Pruned read through the YAML file-source relation: an id-column
    // predicate travels to the custom FileIndex's PartitionFilters and
    // prunes the FILE LISTING (one region's files opened, the rest
    // never touched — PlanSpec pins files-read=1 for a point lookup).
    // This gate verifies the pruned path returns exactly the right
    // rows, not just the right plan.
    QueryDef("etl_yaml_pruned_read",
      (spark, sf) => {
        val base = scratch("graft_yaml_pr")
        val spec = MigrationSpec("yaml_pr", source = s"$base/out", sourceDriver = "yaml",
          destination = s"$base/out", destinationDriver = "yaml",
          sourceIds = Seq(IdField("n_regionkey", LongId), IdField("n_nationkey", LongId)),
          destinationIds = Seq(IdField("n_regionkey", LongId), IdField("n_nationkey", LongId)))
        val nation = load(spark, sf, "nation")
          .select(col("n_regionkey").cast("long"), col("n_nationkey").cast("long"), col("n_name"))
        new YamlDestinationDriver().write(nation, spec)
        new YamlSourceDriver().read(spark, spec)
          .filter(col("n_regionkey") === 2L)
          .select(col("n_regionkey"), col("n_nationkey"), col("n_name"))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
             |  CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name
             |FROM nation WHERE n_regionkey = 2 ORDER BY n_nationkey""".stripMargin)),

    // Range + IN-list pruning through the same relation: the FileIndex
    // evaluates ARBITRARY interpreted predicates over the path-encoded
    // id columns per file, so BETWEEN and IN prune the listing exactly
    // like equality (PlanSpec pins files-read == 5 for this range and
    // == 3 for an IN-list; a stray non-entity YAML dropped into the
    // tree is skipped at listing time, also spec-covered). This gate
    // verifies the range-pruned read returns exactly the right rows.
    QueryDef("etl_yaml_range_read",
      (spark, sf) => {
        val base = scratch("graft_yaml_rg")
        val spec = MigrationSpec("yaml_rg", source = s"$base/out", sourceDriver = "yaml",
          destination = s"$base/out", destinationDriver = "yaml",
          sourceIds = Seq(IdField("n_regionkey", LongId), IdField("n_nationkey", LongId)),
          destinationIds = Seq(IdField("n_regionkey", LongId), IdField("n_nationkey", LongId)))
        val nation = load(spark, sf, "nation")
          .select(col("n_regionkey").cast("long"), col("n_nationkey").cast("long"), col("n_name"))
        new YamlDestinationDriver().write(nation, spec)
        new YamlSourceDriver().read(spark, spec)
          .filter(col("n_nationkey").between(5L, 9L))
          .select(col("n_regionkey"), col("n_nationkey"), col("n_name"))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
             |  CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name
             |FROM nation WHERE n_nationkey BETWEEN 5 AND 9
             |ORDER BY n_nationkey""".stripMargin)),

    // §2.1 arbitrary-SQL scan (DBAL-source parity): user-supplied SQL *is*
    // the row stream (`DbalSourceDriver.php:105-113`), here executed by
    // Catalyst over registered views.
    QueryDef("etl_sql_scan",
      (spark, sf) => {
        Tables.registerViews(spark, sf)
        val stmt =
          """SELECT o_orderpriority, COUNT(*) AS n_orders
            |FROM orders WHERE o_totalprice > 100000
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
        new SqlSourceDriver(stmt).read(spark,
          MigrationSpec("sql_scan", source = "spark-sql", sourceDriver = "sql",
            destination = "none", destinationDriver = "console",
            sourceIds = Seq(IdField("o_orderpriority", StringId)),
            destinationIds = Seq(IdField("o_orderpriority", StringId))))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n_orders
             |FROM orders WHERE o_totalprice > 100000
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // §2.3 cross-migration reference lookup: per-row RPC-style
    // `referenceStore.get(...)` (`MigrationReferenceStore.php:65-120`)
    // becomes one broadcast join against the referenced migration's
    // mapping⋈snapshot relation.
    QueryDef("etl_reference_lookup",
      (spark, sf) => {
        val base = scratch("graft_ref")
        val mapper = new MappingStore(s"$base/map")
        val refs = new ReferenceStore(mapper)
        val exec = new MigrationExecutor(mapper, refs, KeepOrphans)
        val custSpec = MigrationSpec("cust_mig", source = "", sourceDriver = "inline",
          destination = s"$base/cust", destinationDriver = "parquet",
          sourceIds = Seq(IdField("c_custkey", LongId)),
          destinationIds = Seq(IdField("id", LongId)))
        val dest = new ParquetDestinationDriver
        exec.execute(spark,
          new Migration {
            def spec: MigrationSpec = custSpec
            def transform(src: DataFrame, ctx: TransformContext): DataFrame =
              src.select(col("c_custkey"), (col("c_custkey") + 1000000L).as("id"),
                col("c_name"))
          },
          new SourceDriver {
            def read(s: SparkSession, sp: MigrationSpec): DataFrame = load(s, sf, "customer")
          },
          dest)
        refs.register(custSpec, dest)
        val orders = load(spark, sf, "orders").filter(col("o_orderkey") % 10 === 0)
        releasing(exec, refs)(refs.resolve(orders, "cust_mig",
            keyMap = Map("o_custkey" -> "c_custkey"),
            select = Seq("id" -> "customer_dest_id"))
          .select(col("o_orderkey"), col("customer_dest_id"))
          .orderBy(col("o_orderkey")))
      },
      Some("""SELECT o_orderkey, c_custkey + 1000000 AS customer_dest_id
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE o_orderkey % 10 = 0 ORDER BY o_orderkey""".stripMargin)),

    // §2.3 stub creation, two-phase set job (`Stubber.php:34-48`,
    // write-ahead `DataMigrationExecutor.php:194-209`): only even custkeys
    // are "migrated"; orders referencing odd custkeys force stubs with
    // deterministic defaults and status='stub'.
    QueryDef("etl_stub_create",
      (spark, sf) => {
        val base = scratch("graft_stub")
        val mapper = new MappingStore(s"$base/map")
        val refs = new ReferenceStore(mapper)
        val exec = new MigrationExecutor(mapper, refs, KeepOrphans)
        val custSpec = MigrationSpec("cust_stub", source = "", sourceDriver = "inline",
          destination = s"$base/cust", destinationDriver = "parquet",
          sourceIds = Seq(IdField("c_custkey", LongId)),
          destinationIds = Seq(IdField("c_custkey", LongId)))
        val dest = new ParquetDestinationDriver(stubs = true)
        exec.execute(spark,
          new Migration {
            def spec: MigrationSpec = custSpec
            def transform(src: DataFrame, ctx: TransformContext): DataFrame =
              src.filter(col("c_custkey") % 2 === 0)
                .select(col("c_custkey"), col("c_name"))
          },
          new SourceDriver {
            def read(s: SparkSession, sp: MigrationSpec): DataFrame = load(s, sf, "customer")
          },
          dest)
        val stubber = new Stubber(mapper)
        val referring = load(spark, sf, "orders")
        val missing = stubber.missingKeys(referring, custSpec, Map("o_custkey" -> "c_custkey"))
        stubber.writeStubs(spark, custSpec, dest, missing, Map("c_name" -> "STUB"))
        releasing(exec)(mapper.load(spark, custSpec).get
          .filter(col("status") === MappingStore.StatusStub)
          .select(col("source_c_custkey"), col("dest_c_custkey"), col("status"))
          .orderBy(col("source_c_custkey")))
      },
      Some("""SELECT DISTINCT o_custkey AS source_c_custkey,
             |  o_custkey AS dest_c_custkey, 'stub' AS status
             |FROM orders WHERE o_custkey % 2 <> 0
             |ORDER BY source_c_custkey""".stripMargin)),

    // §2.3 auto-stub-on-miss reference resolution — the one-call
    // `referenceStore->get(…, stub=true)` composition
    // (`MigrationReferenceStore.php:65-120`): a partially-run customer
    // migration (evens only), then an ORDERS TRANSFORM that calls
    // resolveOrStub — odd custkeys are stubbed transparently mid-
    // transform and resolve to the stub entity ('STUB') — and finally
    // the full customer run flips every stub's mapping status to
    // migrated. The output carries both proofs: cust_name shows which
    // rows resolved via stubs, status shows the post-run flip.
    QueryDef("etl_stub_resolve",
      (spark, sf) => {
        val base = scratch("graft_stubres")
        val mapper = new MappingStore(s"$base/map")
        val refs = new ReferenceStore(mapper)
        val exec = new MigrationExecutor(mapper, refs, KeepOrphans)
        val custSpec = MigrationSpec("cust_sr", source = "", sourceDriver = "inline",
          destination = s"$base/cust", destinationDriver = "parquet",
          sourceIds = Seq(IdField("c_custkey", LongId)),
          destinationIds = Seq(IdField("c_custkey", LongId)))
        val custDest = new ParquetDestinationDriver(stubs = true)
        val custSource = new SourceDriver {
          def read(s: SparkSession, sp: MigrationSpec): DataFrame = load(s, sf, "customer")
        }
        def custMigration(onlyEven: Boolean) = new Migration {
          def spec: MigrationSpec = custSpec
          def transform(src: DataFrame, ctx: TransformContext): DataFrame = {
            val in = if (onlyEven) src.filter(col("c_custkey") % 2 === 0) else src
            in.select(col("c_custkey"), col("c_name"))
          }
        }
        exec.execute(spark, custMigration(onlyEven = true), custSource, custDest)
        refs.register(custSpec, custDest)
        // orders migration: resolveOrStub INSIDE the transform — odd
        // custkeys have no mapping yet, get stubbed write-ahead, and the
        // re-resolve joins them to the just-written stub entities
        val ordersSpec = MigrationSpec("orders_sr", source = "", sourceDriver = "inline",
          destination = s"$base/orders", destinationDriver = "parquet",
          sourceIds = Seq(IdField("o_orderkey", LongId)),
          destinationIds = Seq(IdField("o_orderkey", LongId)))
        val ordersRes = exec.execute(spark,
          new Migration {
            def spec: MigrationSpec = ordersSpec
            def transform(src: DataFrame, ctx: TransformContext): DataFrame =
              ctx.references.resolveOrStub(
                src.filter(col("o_orderkey") % 10 === 0),
                "cust_sr",
                keyMap = Map("o_custkey" -> "c_custkey"),
                select = Seq("c_name" -> "cust_name"),
                defaults = Map("c_name" -> "STUB"))
                .select(col("o_orderkey"), col("o_custkey"), col("cust_name"))
          },
          new SourceDriver {
            def read(s: SparkSession, sp: MigrationSpec): DataFrame = load(s, sf, "orders")
          },
          new ParquetDestinationDriver)
        // the real (full) customer migration overwrites the stubs by key
        // and flips their mapping status stub → migrated
        exec.execute(spark, custMigration(onlyEven = false), custSource, custDest)
        val mapping = mapper.load(spark, custSpec).get
          .select(col(s"${MappingStore.SourcePrefix}c_custkey").as("o_custkey"),
            col(MappingStore.StatusCol))
        releasing(exec, refs)(ordersRes.finalSnapshot
          .select(col("o_orderkey"), col("o_custkey"), col("cust_name"))
          .join(mapping, Seq("o_custkey"))
          .select(col("o_orderkey"), col("cust_name"), col("status"))
          .orderBy(col("o_orderkey")))
      },
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_custkey % 2 = 0 THEN c_name ELSE 'STUB' END AS cust_name,
             |  'migrated' AS status
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE o_orderkey % 10 = 0 ORDER BY o_orderkey""".stripMargin)),

    // §2.3 dependency DAG: three chained migrations resolved in topo
    // order (`DataMigrationManager.php:271-326`), the last one consuming
    // the previous two through the reference store.
    // Diamond DAG under executeAll(parallelism=4): m_nation roots, the
    // customer and supplier migrations run CONCURRENTLY in level 2 (both
    // resolve references into the nation output), and the result is
    // oracle-verified — the parallel scheduling path through the gate,
    // not just specs.
    QueryDef("etl_parallel_pipeline",
      (spark, sf) => {
        val base = scratch("graft_par")
        val mapper = new MappingStore(s"$base/map")
        val refs = new ReferenceStore(mapper)
        val dest = new ParquetDestinationDriver
        def spec(n: String, srcId: String, deps: Seq[String]) = MigrationSpec(n, source = "",
          sourceDriver = "inline", destination = s"$base/$n", destinationDriver = "parquet",
          sourceIds = Seq(IdField(srcId, LongId)), destinationIds = Seq(IdField("sid", LongId)),
          depends = deps)
        val nationSpec = spec("m_nation", "n_nationkey", Nil)
        val custSpec = spec("m_cust", "c_custkey", Seq("m_nation"))
        val suppSpec = spec("m_supp", "s_suppkey", Seq("m_nation"))
        def leaf(theSpec: MigrationSpec, fk: String, keep: String) = new Migration {
          def spec: MigrationSpec = theSpec
          def transform(src: DataFrame, ctx: TransformContext): DataFrame = {
            val n = ctx.references.entitiesBySourceIds(ctx.spark, "m_nation")
              .select(col("sid").as("nk"), col("n_name"))
            src.join(n, src(fk) === n("nk"))
              .select(col(theSpec.sourceIds.head.name),
                col(theSpec.sourceIds.head.name).as("sid"), col(keep), col("n_name"))
          }
        }
        val migs = Seq(
          leaf(custSpec, "c_nationkey", "c_name"),
          leaf(suppSpec, "s_nationkey", "s_name"),
          new Migration {
            def spec: MigrationSpec = nationSpec
            def transform(src: DataFrame, ctx: TransformContext): DataFrame =
              src.select(col("n_nationkey"), col("n_nationkey").as("sid"), col("n_name"))
          })
        val srcTables = Map("m_nation" -> "nation", "m_cust" -> "customer", "m_supp" -> "supplier")
        val exec = new MigrationExecutor(mapper, refs, KeepOrphans)
        val results = exec.executeAll(spark, migs,
          m => new SourceDriver {
            def read(s: SparkSession, sp: MigrationSpec): DataFrame =
              load(s, sf, srcTables(sp.name))
          },
          m => { refs.register(m.spec, dest); dest },
          parallelism = 4)
        val nation = results("m_nation").finalSnapshot.select(col("n_name"))
        val nc = results("m_cust").finalSnapshot
          .groupBy(col("n_name")).agg(count(lit(1)).as("n_custs"))
        val ns = results("m_supp").finalSnapshot
          .groupBy(col("n_name")).agg(count(lit(1)).as("n_supps"))
        releasing(exec, refs)(
          nation.join(nc, Seq("n_name"), "left").join(ns, Seq("n_name"), "left")
            .select(col("n_name"),
              coalesce(col("n_custs"), lit(0L)).as("n_custs"),
              coalesce(col("n_supps"), lit(0L)).as("n_supps"))
            .orderBy(col("n_name")))
      },
      Some("""WITH c AS (SELECT c_nationkey k, COUNT(*) nc FROM customer GROUP BY 1),
             |s AS (SELECT s_nationkey k, COUNT(*) ns FROM supplier GROUP BY 1)
             |SELECT n_name, COALESCE(nc, 0) AS n_custs, COALESCE(ns, 0) AS n_supps
             |FROM nation LEFT JOIN c ON n_nationkey = c.k LEFT JOIN s ON n_nationkey = s.k
             |ORDER BY n_name""".stripMargin)),

    QueryDef("etl_dag_pipeline",
      (spark, sf) => {
        val base = scratch("graft_dag")
        val mapper = new MappingStore(s"$base/map")
        val refs = new ReferenceStore(mapper)
        val dest = new ParquetDestinationDriver
        def spec(n: String, srcId: String, deps: Seq[String]) = MigrationSpec(n, source = "",
          sourceDriver = "inline", destination = s"$base/$n", destinationDriver = "parquet",
          sourceIds = Seq(IdField(srcId, LongId)), destinationIds = Seq(IdField("sid", LongId)),
          depends = deps)
        val regionSpec = spec("m_region", "r_regionkey", Nil)
        val nationSpec = spec("m_nation", "n_nationkey", Seq("m_region"))
        val custSpec = spec("m_cust", "c_custkey", Seq("m_nation"))
        val migs = Seq(
          new Migration {
            def spec: MigrationSpec = custSpec
            def transform(src: DataFrame, ctx: TransformContext): DataFrame = {
              val n = ctx.references.entitiesBySourceIds(ctx.spark, "m_nation")
                .select(col("sid").as("nk"), col("n_name"), col("r_name"))
              src.join(broadcast(n), src("c_nationkey") === n("nk"))
                .select(col("c_custkey"), col("c_custkey").as("sid"),
                  col("c_name"), col("n_name"), col("r_name"))
            }
          },
          new Migration {
            def spec: MigrationSpec = nationSpec
            def transform(src: DataFrame, ctx: TransformContext): DataFrame = {
              val r = ctx.references.entitiesBySourceIds(ctx.spark, "m_region")
                .select(col("sid").as("rk"), col("r_name"))
              src.join(broadcast(r), src("n_regionkey") === r("rk"))
                .select(col("n_nationkey"), col("n_nationkey").as("sid"),
                  col("n_name"), col("r_name"))
            }
          },
          new Migration {
            def spec: MigrationSpec = regionSpec
            def transform(src: DataFrame, ctx: TransformContext): DataFrame =
              src.select(col("r_regionkey"), col("r_regionkey").as("sid"), col("r_name"))
          })
        // deliberately unordered input; executeAll topo-sorts and registers
        val srcTables = Map("m_region" -> "region", "m_nation" -> "nation", "m_cust" -> "customer")
        val exec = new MigrationExecutor(mapper, refs, KeepOrphans)
        val results = exec.executeAll(spark, migs,
          m => new SourceDriver {
            def read(s: SparkSession, sp: MigrationSpec): DataFrame =
              load(s, sf, srcTables(sp.name))
          },
          m => { refs.register(m.spec, dest); dest })
        releasing(exec, refs)(results("m_cust").finalSnapshot
          .select(col("sid"), col("n_name"), col("r_name"))
          .orderBy(col("sid")))
      },
      Some("""SELECT c_custkey AS sid, n_name, r_name
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |ORDER BY sid""".stripMargin)),

    // The engine's two halves composed: the LLM curation pipeline
    // (ingest → exact dedup → quality gate → langid → mixture rebalance)
    // run AS five dependent MigrationSpecs through graft.Engine.migrate
    // → MigrationExecutor.executeAll, with real mapping tables (ingest
    // ids are mapping-ASSIGNED — the generated-ids path — and every
    // stage records its mapping rows), each stage's source being the
    // previous stage's generation-pointer snapshot. The gate rolls up
    // the final curated corpus per (source, predicted_lang); min/max of
    // the mapping-assigned dense ids pin the id-assignment path into the
    // hash. Idempotent re-runs and PruneOrphans propagation down the DAG
    // are ExecutorSpec's "curation pipeline" tests. Scale: the corpus is
    // read once; each stage is 1-2 key shuffles over shrinking data; the
    // only driver scalars are O(#sources) (mixture cap).
    QueryDef("etl_llm_pipeline",
      (spark, sf) => {
        val base = scratch("graft_llm")
        val dest = new ParquetDestinationDriver
        val run = graft.Engine(spark, sf, attach = false).migrate(
          CurationPipeline.migrations(base),
          CurationPipeline.sources(path(sf, "documents"), base, dest),
          _ => dest,
          mappingDir = s"$base/map")
        releasing(run.executor, run.references)(
          run.results("llm_mix").finalSnapshot
            .groupBy(col("source"), col("predicted_lang"))
            .agg(count(lit(1)).as("n_docs"),
              sum(col("n_tokens")).as("total_tokens"),
              min(col("did")).as("min_did"),
              max(col("did")).as("max_did"))
            .orderBy(col("source"), col("predicted_lang")))
      },
      Some(Shared.LlmCurationRollupSql)),

    // Destination-side schema evolution across generations — the
    // generation sink's analog of the mapping store's conform: gen0 is
    // written with schema A (bal INT cents), gen1 with a WIDENED schema B
    // (bal BIGINT + a new nation column); a narrowing write (bal back to
    // INT) must be rejected BEFORE any directory lands (no burned
    // generation number — the gate asserts exactly {gen0, gen1} remain);
    // time travel across the boundary reads gen0 CONFORMED to the
    // current schema (typed-NULL nation, up-cast bal) and full-outer
    // diffs it against the current snapshot. Metadata-only evolution: no
    // old bytes are rewritten.
    QueryDef("etl_schema_evolution",
      (spark, sf) => {
        import Shared.cents
        val base = scratch("graft_schemaevo") + "/dest"
        val sp = MigrationSpec("schema_evo", source = "", sourceDriver = "inline",
          destination = base, destinationDriver = "parquet",
          sourceIds = Seq(IdField("id", LongId)),
          destinationIds = Seq(IdField("id", LongId)))
        val d = new ParquetDestinationDriver
        val cust = load(spark, sf, "customer")
        d.write(cust.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey").cast("long").as("id"),
            cents(col("c_acctbal")).cast("int").as("bal")), sp)
        d.write(cust.filter(col("c_custkey") % 2 === 0)
          .select(col("c_custkey").cast("long").as("id"),
            cents(col("c_acctbal")).as("bal"),
            col("c_nationkey").cast("long").as("nation")), sp)
        val rejected = try {
          d.write(cust.limit(1).select(col("c_custkey").cast("long").as("id"),
            cents(col("c_acctbal")).cast("int").as("bal")), sp)
          false
        } catch { case _: graft.spec.SchemaEvolutionException => true }
        val ok = rejected && d.generations(spark, sp) == Seq(0L, 1L)
        val old = d.snapshotAtConformed(spark, sp, 0L).get
        val cur = d.snapshot(spark, sp).get
        old.select(col("id"), col("bal").as("bal0"), col("nation").as("nation0"))
          .join(cur.select(col("id"), col("bal").as("bal1"),
            col("nation").as("nation1")), Seq("id"), "full_outer")
          .filter(lit(ok))
          .select(col("id"), col("bal0"), col("bal1"),
            col("nation0"), col("nation1"),
            when(col("bal0").isNull, "added")
              .when(col("bal1").isNull, "removed")
              .otherwise("kept").as("status"))
          .orderBy(col("id"))
      },
      Some("""WITH g0 AS (
             |  SELECT CAST(c_custkey AS BIGINT) id,
             |    CAST(ROUND(c_acctbal * 100) AS INT) bal
             |  FROM customer WHERE c_custkey % 3 = 0),
             |g1 AS (
             |  SELECT CAST(c_custkey AS BIGINT) id,
             |    CAST(ROUND(c_acctbal * 100) AS BIGINT) bal,
             |    CAST(c_nationkey AS BIGINT) nation
             |  FROM customer WHERE c_custkey % 2 = 0)
             |SELECT COALESCE(g0.id, g1.id) AS id,
             |  CAST(g0.bal AS BIGINT) AS bal0, g1.bal AS bal1,
             |  CAST(NULL AS BIGINT) AS nation0, g1.nation AS nation1,
             |  CASE WHEN g0.id IS NULL THEN 'added'
             |       WHEN g1.id IS NULL THEN 'removed'
             |       ELSE 'kept' END AS status
             |FROM g0 FULL OUTER JOIN g1 ON g0.id = g1.id
             |ORDER BY id""".stripMargin)),

    // Partition-SPEC evolution across generations (the Iceberg headline
    // feature on the generation sink): gen0 is hive-partitioned by
    // region alone; gen1 EVOLVES the spec to (region, quarter) — and
    // because generations are immutable snapshots, the evolution
    // rewrites zero old bytes: each generation keeps (and is read/pruned
    // by) its own layout, recovered structurally via layoutOf (a k=v
    // directory walk, no data scan — asserted for both gens in the
    // emission gate). The output diffs one region's per-quarter rollup
    // across the boundary: the current snapshot (two-level pruning —
    // the region filter reaches the directory listing) against the
    // time-traveled gen0 (one-level pruning, quarter still a data
    // column). DriversSpec pins the pruned-scan shape structurally.
    QueryDef("etl_partition_evolution",
      (spark, sf) => {
        import Shared.cents
        val base = scratch("graft_partevo") + "/dest"
        val sp = MigrationSpec("part_evo", source = "", sourceDriver = "inline",
          destination = base, destinationDriver = "parquet",
          sourceIds = Seq(IdField("id", LongId)),
          destinationIds = Seq(IdField("id", LongId)))
        val d = new ParquetDestinationDriver
        val f = load(spark, sf, "orders")
          .join(load(spark, sf, "customer")
            .select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
            Seq("o_custkey"))
          .join(load(spark, sf, "nation")
            .select(col("n_nationkey").as("c_nationkey"), col("n_regionkey")),
            Seq("c_nationkey"))
          .join(load(spark, sf, "region")
            .select(col("r_regionkey").as("n_regionkey"),
              col("r_name").as("region")), Seq("n_regionkey"))
          .select(col("o_orderkey").cast("long").as("id"),
            cents(col("o_totalprice")).as("cents"), col("region"),
            concat(year(col("o_orderdate")).cast("string"), lit("Q"),
              quarter(col("o_orderdate")).cast("string")).as("quarter"),
            col("o_orderdate").as("od"))
        d.writePartitioned(f.filter(col("od") < lit("1996-01-01")).drop("od"),
          sp, Seq("region"))
        d.writePartitioned(f.drop("od"), sp, Seq("region", "quarter"))
        val ok = d.layoutOf(spark, sp, 0L) == Seq("region") &&
          d.layoutOf(spark, sp, 1L) == Seq("region", "quarter") &&
          d.generations(spark, sp) == Seq(0L, 1L)
        val old = d.snapshotAt(spark, sp, 0L).get
          .filter(col("region") === "ASIA")
          .groupBy(col("quarter"))
          .agg(count(lit(1)).as("n_old"), sum(col("cents")).as("cents_old"))
        val cur = d.snapshot(spark, sp).get
          .filter(col("region") === "ASIA")
          .groupBy(col("quarter"))
          .agg(count(lit(1)).as("n_cur"), sum(col("cents")).as("cents_cur"))
        old.join(cur, Seq("quarter"), "full_outer")
          .filter(lit(ok))
          .select(col("quarter"), col("n_old"), col("cents_old"),
            col("n_cur"), col("cents_cur"))
          .orderBy(col("quarter"))
      },
      Some("""WITH f AS (
             |  SELECT o_orderkey AS id,
             |    CAST(ROUND(o_totalprice * 100) AS BIGINT) cents,
             |    r_name AS region,
             |    CAST(year(o_orderdate) AS VARCHAR) || 'Q' ||
             |      CAST(quarter(o_orderdate) AS VARCHAR) AS quarter,
             |    o_orderdate AS od
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |    JOIN nation ON c_nationkey = n_nationkey
             |    JOIN region ON n_regionkey = r_regionkey),
             |og AS (SELECT quarter, CAST(COUNT(*) AS BIGINT) n_old,
             |    CAST(SUM(cents) AS BIGINT) cents_old
             |  FROM f WHERE od < DATE '1996-01-01' AND region = 'ASIA'
             |  GROUP BY 1),
             |cg AS (SELECT quarter, CAST(COUNT(*) AS BIGINT) n_cur,
             |    CAST(SUM(cents) AS BIGINT) cents_cur
             |  FROM f WHERE region = 'ASIA' GROUP BY 1)
             |SELECT COALESCE(og.quarter, cg.quarter) AS quarter,
             |  n_old, cents_old, n_cur, cents_cur
             |FROM og FULL OUTER JOIN cg ON og.quarter = cg.quarter
             |ORDER BY quarter""".stripMargin)),

    // Merge-on-read (engine-native lakehouse extension): two upsert
    // DELTAS appended against the base generation at O(|delta|) write
    // cost each, reconciled at read by a latest-wins window per key,
    // then compacted into the next COW generation. The gate proves the
    // whole lifecycle distributed (exceptAll, no driver collects):
    // reconciled view == compacted generation, and the delta log is
    // retired by the pointer flip (post-compaction morSnapshot ==
    // snapshot). Rows emit only when all three invariants hold.
    QueryDef("etl_merge_on_read",
      (spark, sf) => {
        import Shared.cents
        val base = scratch("graft_mor") + "/dest"
        val sp = MigrationSpec("mor", source = "", sourceDriver = "inline",
          destination = base, destinationDriver = "parquet",
          sourceIds = Seq(IdField("id", LongId)),
          destinationIds = Seq(IdField("id", LongId)))
        val d = new ParquetDestinationDriver
        val cust = load(spark, sf, "customer")
        def slice(m: Int, plus: Int) = cust.filter(col("c_custkey") % m === 0)
          .select(col("c_custkey").cast("long").as("id"),
            (cents(col("c_acctbal")) + plus).as("bal"))
        d.write(slice(3, 0), sp)
        d.appendDelta(slice(4, 1), sp)
        d.appendDelta(slice(6, 2), sp)
        val mor = d.morSnapshot(spark, sp).get.localCheckpoint()
        val gen = d.compactDeltas(spark, sp)
        val compacted = d.snapshotAt(spark, sp, gen).get
        val retired = d.morSnapshot(spark, sp).get
        val ok = mor.exceptAll(compacted).isEmpty &&
          compacted.exceptAll(mor).isEmpty &&
          retired.exceptAll(compacted).isEmpty && gen == 1L
        mor.filter(lit(ok)).orderBy(col("id"))
      },
      Some("""WITH segs AS (
             |  SELECT CAST(c_custkey AS BIGINT) id,
             |    CAST(ROUND(c_acctbal * 100) AS BIGINT) bal, 0 seq
             |  FROM customer WHERE c_custkey % 3 = 0
             |  UNION ALL
             |  SELECT CAST(c_custkey AS BIGINT),
             |    CAST(ROUND(c_acctbal * 100) AS BIGINT) + 1, 1
             |  FROM customer WHERE c_custkey % 4 = 0
             |  UNION ALL
             |  SELECT CAST(c_custkey AS BIGINT),
             |    CAST(ROUND(c_acctbal * 100) AS BIGINT) + 2, 2
             |  FROM customer WHERE c_custkey % 6 = 0),
             |r AS (SELECT id, bal,
             |  ROW_NUMBER() OVER (PARTITION BY id ORDER BY seq DESC) rn
             |  FROM segs)
             |SELECT id, bal FROM r WHERE rn = 1 ORDER BY id""".stripMargin)),

    // §2.2 JDBC (database) sink + §2.1 JDBC source: write through the
    // JDBC destination driver into embedded Derby, read back via the
    // arbitrary-SQL JDBC source — the DbalSourceDriver /
    // DoctrineDestinationDriver pairing end-to-end.
    QueryDef("etl_jdbc_roundtrip",
      (spark, sf) => {
        val db = scratch("graft_derby") + "/db"
        val url = s"jdbc:derby:$db;create=true"
        val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver",
          "createTableColumnTypes" -> "r_name VARCHAR(64)")
        val spec = MigrationSpec("jdbc_rt", source = url, sourceDriver = "jdbc",
          destination = url, destinationDriver = "jdbc",
          sourceIds = Seq(IdField("r_regionkey", LongId)),
          destinationIds = Seq(IdField("r_regionkey", LongId)))
        val region = load(spark, sf, "region")
          .select(col("r_regionkey").cast("long"), col("r_name"))
        new JdbcDestinationDriver("region_t", props).write(region, spec)
        new JdbcSourceDriver(
          """SELECT "r_regionkey", "r_name" FROM region_t""",
          None, Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
          .read(spark, spec)
          .select(col("r_regionkey"), trim(col("r_name")).as("r_name"))
          .orderBy(col("r_regionkey"))
      },
      Some("""SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
             |FROM region ORDER BY r_regionkey""".stripMargin)),

    // JSON roundtrip (engine-native format breadth): nation written
    // through the staged JSON sink with a NESTED struct column, read
    // back through the recursive JSON source, nested fields re-flattened
    // — proving nested serialization survives the trip.
    QueryDef("etl_json_roundtrip",
      (spark, sf) => {
        val dir = scratch("graft_json") + "/out"
        val spec = MigrationSpec("json_rt", source = dir, sourceDriver = "json",
          destination = dir, destinationDriver = "json",
          sourceIds = Seq(IdField("n_nationkey", LongId)),
          destinationIds = Seq(IdField("n_nationkey", LongId)))
        val nation = load(spark, sf, "nation")
          .select(col("n_nationkey").cast("long"), col("n_name"),
            struct(col("n_regionkey").cast("long").as("rk"),
              lower(col("n_name")).as("lname")).as("meta"))
        new JsonDestinationDriver().write(nation, spec)
        new JsonSourceDriver().read(spark, spec)
          .select(col("n_nationkey"), col("n_name"),
            col("meta.rk").as("rk"), col("meta.lname").as("lname"))
          .orderBy(col("n_nationkey"))
      },
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
             |  CAST(n_regionkey AS BIGINT) AS rk, lower(n_name) AS lname
             |FROM nation ORDER BY n_nationkey""".stripMargin)),

    // §2.1/2.2 engine-native ORC breadth, resolved from the `orc://` URI
    // scheme (no declared driver key) — exercises scheme dispatch AND the
    // columnar staged-swap sink/scan pair in one end-to-end pass. Money
    // survives the trip as integer cents (the corpus-wide numeric
    // discipline), long/string/timestamp-free columns round-trip exactly.
    QueryDef("etl_orc_roundtrip",
      (spark, sf) => {
        val uri = "orc://" + scratch("graft_orc") + "/out"
        val spec = MigrationSpec("orc_rt", source = uri, sourceDriver = "",
          destination = uri, destinationDriver = "",
          sourceIds = Seq(IdField("s_suppkey", LongId)),
          destinationIds = Seq(IdField("s_suppkey", LongId)))
        val supplier = load(spark, sf, "supplier")
          .select(col("s_suppkey").cast("long"), col("s_name"),
            expr("CAST(ROUND(s_acctbal*100) AS BIGINT)").as("acctbal_cents"),
            col("s_nationkey").cast("long"))
        graft.cli.DriverRegistry.destinationForUri(uri).write(supplier, spec)
        graft.cli.DriverRegistry.sourceForUri(uri).read(spark, spec)
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
             |  CAST(ROUND(s_acctbal*100) AS BIGINT) AS acctbal_cents,
             |  CAST(s_nationkey AS BIGINT) AS s_nationkey
             |FROM supplier ORDER BY s_suppkey""".stripMargin)),

    // §2.2 Doctrine/database sink, MERGE mode — the only scale-viable
    // JDBC write path (O(batch) per-partition `MERGE INTO`, not a
    // truncate-rewrite of the whole destination;
    // `DoctrineDestinationDriver.php:156-173` batches the same way).
    // Update-then-insert through two incremental merges; oracle is the
    // equivalent plain-SQL upsert state.
    QueryDef("etl_jdbc_merge",
      (spark, sf) => {
        val db = scratch("graft_derby_merge") + "/db"
        val url = s"jdbc:derby:$db;create=true"
        val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
        val spec = MigrationSpec("jdbc_merge", source = url, sourceDriver = "jdbc",
          destination = url, destinationDriver = "jdbc",
          sourceIds = Seq(IdField("id", LongId)),
          destinationIds = Seq(IdField("id", LongId)))
        val nation = load(spark, sf, "nation")
          .select(col("n_nationkey").cast("long").as("id"), col("n_name").as("name"))
        val d = new JdbcDestinationDriver("nation_m", props, merge = true)
        d.write(nation, spec)
        // second merge: UPDATE keys < 10 (lowercase), INSERT keys +100
        val delta = nation.filter(col("id") < 10)
          .select(col("id"), lower(col("name")).as("name"))
          .unionByName(nation.filter(col("id") < 5)
            .select((col("id") + 100).as("id"), upper(col("name")).as("name")))
        d.write(delta, spec)
        new JdbcSourceDriver(
          """SELECT "id", "name" FROM nation_m""",
          None, props)
          .read(spark, spec)
          .select(col("id"), trim(col("name")).as("name"))
          .orderBy(col("id"))
      },
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS id,
             |  CASE WHEN n_nationkey < 10 THEN lower(n_name) ELSE n_name END AS name
             |FROM nation
             |UNION ALL
             |SELECT CAST(n_nationkey + 100 AS BIGINT), upper(n_name)
             |FROM nation WHERE n_nationkey < 5
             |ORDER BY id""".stripMargin)),

    // §2.2 Debug sink / --simulate (`DebugDestinationDriver.php:50-100`,
    // `MigrateCommand.php:192-195`): the destination is swapped for a
    // console dump and nothing persists — the returned rows are what
    // would have been written.
    QueryDef("etl_simulate",
      (spark, sf) => {
        val base = scratch("graft_sim")
        val theSpec = MigrationSpec("sim", source = "", sourceDriver = "inline",
          destination = "console", destinationDriver = "console",
          sourceIds = Seq(IdField("n_nationkey", LongId)),
          destinationIds = Seq(IdField("id", LongId)))
        val mapper = new MappingStore(s"$base/map")
        val exec = new MigrationExecutor(mapper, new ReferenceStore(mapper), KeepOrphans)
        val res = exec.execute(spark,
          new Migration {
            def spec: MigrationSpec = theSpec
            def transform(src: DataFrame, ctx: TransformContext): DataFrame =
              src.select(col("n_nationkey"), col("n_nationkey").as("id"),
                lower(col("n_name")).as("name_lower"))
          },
          new SourceDriver {
            def read(s: SparkSession, sp: MigrationSpec): DataFrame = load(s, sf, "nation")
          },
          new ConsoleDestinationDriver(numRows = 5))
        releasing(exec)(
          res.finalSnapshot.select(col("id"), col("name_lower")).orderBy(col("id")))
      },
      Some("""SELECT n_nationkey AS id, LOWER(n_name) AS name_lower
             |FROM nation ORDER BY id""".stripMargin)),

    // §2.3 destination read-back: the transform's second argument
    // (current dest entity, `DataMigrationExecutor.php:177-189`) as a
    // ctx.currentFor left join; insert path sees nulls → defaultResult
    // via coalesce.
    QueryDef("etl_current_readback",
      (spark, sf) => {
        val base = scratch("graft_cur")
        val theSpec = MigrationSpec("cur", source = "", sourceDriver = "inline",
          destination = s"$base/dest", destinationDriver = "parquet",
          sourceIds = Seq(IdField("c_custkey", LongId)),
          destinationIds = Seq(IdField("id", LongId)))
        val mapper = new MappingStore(s"$base/map")
        val exec = new MigrationExecutor(mapper, new ReferenceStore(mapper), KeepOrphans)
        val dest = new ParquetDestinationDriver
        val mig = new Migration {
          def spec: MigrationSpec = theSpec
          def transform(src: DataFrame, ctx: TransformContext): DataFrame = {
            val withIds = mapper.lookupDest(src, theSpec)
            val cur = ctx.currentFor(withIds)
            // insert path (first run): no snapshot yet, so the __current
            // column is absent — the set-wise defaultResult()
            val prevSeen =
              if (cur.columns.contains("times_seen__current")) col("times_seen__current")
              else lit(null).cast("long")
            cur.select(
              col("c_custkey"),
              coalesce(col("dest_id"), col("c_custkey")).as("id"),
              (coalesce(prevSeen, lit(0L)) + 1L).as("times_seen"))
          }
        }
        val source = new SourceDriver {
          def read(s: SparkSession, sp: MigrationSpec): DataFrame =
            load(s, sf, "customer").filter(col("c_custkey") % 4 === 0)
        }
        exec.execute(spark, mig, source, dest)  // run 1: all times_seen=1
        exec.execute(spark, mig, source, dest)  // run 2: update path → 2
        releasing(exec)(
          dest.snapshot(spark, theSpec).get.select(col("id"), col("times_seen"))
            .orderBy(col("id")))
      },
      Some("""SELECT c_custkey AS id, CAST(2 AS BIGINT) AS times_seen
             |FROM customer WHERE c_custkey % 4 = 0 ORDER BY id""".stripMargin)),

    // §2.3 orphan disposition = prune (`MigrateCommand.php:124-133`,
    // `DataMigrationExecutor.php:275-328`): vanished rows dropped from
    // the final snapshot.
    QueryDef("etl_orphan_prune",
      (spark, sf) => {
        val base = scratch("graft_prune")
        val spec = upsertSpec(s"$base/dest", s"$base/map")
        val mapper = new MappingStore(s"$base/map")
        val exec = new MigrationExecutor(mapper, new ReferenceStore(mapper), PruneOrphans)
        val dest = new ParquetDestinationDriver
        val cust = load(spark, sf, "customer")
        dest.write(
          cust.filter(col("c_custkey") % 3 === 0)
            .select(col("c_custkey").as("id"), upper(col("c_name")).as("name_upper"),
              lit("old").as("marker")), spec)
        val theSpec = spec
        val res = exec.execute(spark,
          new Migration {
            def spec: MigrationSpec = theSpec
            def transform(src: DataFrame, ctx: TransformContext): DataFrame =
              src.select(col("c_custkey"), col("c_custkey").as("id"),
                upper(col("c_name")).as("name_upper"), lit("new").as("marker"))
          },
          new SourceDriver {
            def read(s: SparkSession, sp: MigrationSpec): DataFrame =
              load(s, sf, "customer").filter(col("c_custkey") % 2 === 0)
          }, dest)
        releasing(exec)(
          res.finalSnapshot.select(col("id"), col("marker")).orderBy(col("id")))
      },
      Some("""SELECT c_custkey AS id, 'new' AS marker FROM customer
             |WHERE c_custkey % 2 = 0 ORDER BY id""".stripMargin)),

    // §2.3 orphan semantics ON THE INCREMENTAL PATH (r17 verdict task
    // 3): executeDelta never reports orphans (absence from a delta
    // means nothing), so a delta-fed destination silently diverges from
    // the reference's orphan contract (`DataMigrationExecutor.php:
    // 368-382`) until reconciled. This gate drives four CDC-style
    // batches (customer activity sliced by o_orderkey % 4) through
    // executeDelta as TWO micro-batch windows of two batches each
    // (per-key later-batch-wins inside a window — the upsert merge a
    // CDC reader applies when it coalesces its queue; r18 verdict task
    // 6 halved the executor runs, the final view and oracle are
    // UNCHANGED), then runs reconcileDeltaOrphans under PruneOrphans
    // with a two-batch retention horizon: destination keys whose source
    // never appeared in batches 2-3 are orphans, deleted O(orphans) via
    // a TOMBSTONE delta segment (never a state rewrite — the 100 TB
    // prune). The emitted snapshot is each survivor's latest-batch row,
    // which DuckDB replays exactly; a reconcile that misses orphans (or
    // prunes a live key) flips the hash. Replay safety across a real
    // restart is the stream_orphan_reconcile gate; same-JVM replay +
    // resurrect are ExecutorSpec's reconcile test.
    QueryDef("etl_delta_orphans",
      (spark, sf) => {
        val base = scratch("graft_delta_orphans")
        val spec = MigrationSpec(
          name = "cust_activity_delta",
          source = "", sourceDriver = "inline",
          destination = s"$base/dest", destinationDriver = "parquet",
          sourceIds = Seq(IdField("o_custkey", LongId)),
          destinationIds = Seq(IdField("id", LongId)))
        val mapper = new MappingStore(s"$base/map")
        val exec = new MigrationExecutor(mapper, new ReferenceStore(mapper), PruneOrphans)
        val dest = new ParquetDestinationDriver
        val theSpec = spec
        // batches lo and lo+1 coalesced: per key, the LATER batch's row
        // wins — exactly what executeDelta's segment order would produce
        // had the two batches run separately
        def window2(lo: Int): DataFrame = load(spark, sf, "orders")
          .filter(col("o_orderkey") % 4 >= lo && col("o_orderkey") % 4 <= lo + 1)
          .groupBy(col("o_custkey"), (col("o_orderkey") % 4).cast("int").as("b"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("o_custkey"))
          .agg(max(struct(col("b"), col("cnt"))).as("s"))
          .select(col("o_custkey"), col("s.b").as("last_batch"), col("s.cnt").as("cnt"))
        val migration = new Migration {
          def spec: MigrationSpec = theSpec
          def transform(src: DataFrame, ctx: TransformContext): DataFrame =
            src.select(col("o_custkey"), col("o_custkey").as("id"),
              col("last_batch"), col("cnt"))
        }
        Seq(0, 2).foreach { lo =>
          exec.executeDelta(spark, migration, new SourceDriver {
            def read(s: SparkSession, sp: MigrationSpec): DataFrame = window2(lo)
          }, dest): Unit
        }
        val recent = load(spark, sf, "orders")
          .filter(col("o_orderkey") % 4 >= 2)
          .select(col("o_custkey")).distinct()
        val res = exec.reconcileDeltaOrphans(spark, migration, recent, dest)
        releasing(exec)(
          res.finalSnapshot.select(col("id"), col("last_batch"), col("cnt"))
            .orderBy(col("id")))
      },
      Some("""WITH per AS (
             |  SELECT o_custkey AS id, CAST(o_orderkey % 4 AS INT) AS b,
             |    CAST(COUNT(*) AS BIGINT) AS cnt
             |  FROM orders GROUP BY 1, 2),
             |last AS (SELECT id, MAX(b) AS b FROM per GROUP BY 1),
             |recent AS (SELECT DISTINCT id FROM per WHERE b >= 2)
             |SELECT p.id, p.b AS last_batch, p.cnt
             |FROM per p JOIN last USING (id, b) JOIN recent USING (id)
             |ORDER BY p.id""".stripMargin)),

    // §2.3 `extends`: a second-pass migration shares the parent's mapping
    // table (`Annotations/DataMigration.php:107-113`,
    // `DataMigrationExecutor.php:172-175`) — after parent (even keys) and
    // extension (odd keys) run, one mapping table holds both.
    QueryDef("etl_extends",
      (spark, sf) => {
        val base = scratch("graft_ext")
        val mapper = new MappingStore(s"$base/map")
        val exec = new MigrationExecutor(mapper, new ReferenceStore(mapper), IgnoreOrphans)
        val dest = new ParquetDestinationDriver
        def mkSpec(n: String, ext: Option[String]) = MigrationSpec(n, source = "",
          sourceDriver = "inline", destination = s"$base/shared", destinationDriver = "parquet",
          sourceIds = Seq(IdField("c_custkey", LongId)),
          destinationIds = Seq(IdField("c_custkey", LongId)), extendsMigration = ext)
        val parentSpec = mkSpec("ext_parent", None)
        val childSpec = mkSpec("ext_child", Some("ext_parent"))
        def mig(sp: MigrationSpec, parity: Int) = new Migration {
          def spec: MigrationSpec = sp
          def transform(src: DataFrame, ctx: TransformContext): DataFrame =
            src.filter(col("c_custkey") % 2 === parity)
              .select(col("c_custkey"), col("c_name"))
        }
        val source = new SourceDriver {
          def read(s: SparkSession, sp: MigrationSpec): DataFrame = load(s, sf, "customer")
        }
        exec.execute(spark, mig(parentSpec, 0), source, dest)
        exec.execute(spark, mig(childSpec, 1), source, dest)
        assert(childSpec.mappingKey == "ext_parent")
        releasing(exec)(mapper.load(spark, parentSpec).get
          .select(col("source_c_custkey"), col("dest_c_custkey"))
          .orderBy(col("source_c_custkey")))
      },
      Some("""SELECT c_custkey AS source_c_custkey, c_custkey AS dest_c_custkey
             |FROM customer ORDER BY source_c_custkey""".stripMargin)),

    // §2.3 flush control: chunked sequential merges (the set-oriented
    // `flush=true`, `Annotations/DataMigration.php:96-105`) — result must
    // equal the single-pass migration for non-self-referencing data.
    QueryDef("etl_flush_chunks",
      (spark, sf) => {
        val base = scratch("graft_flush")
        val spec = MigrationSpec("flush_m", source = "", sourceDriver = "inline",
          destination = s"$base/dest", destinationDriver = "parquet",
          sourceIds = Seq(IdField("n_nationkey", LongId)),
          destinationIds = Seq(IdField("n_nationkey", LongId)), flush = true)
        val mapper = new MappingStore(s"$base/map")
        val exec = new MigrationExecutor(mapper, new ReferenceStore(mapper), KeepOrphans)
        val theSpec = spec
        val res = exec.executeChunked(spark,
          new Migration {
            def spec: MigrationSpec = theSpec
            def transform(src: DataFrame, ctx: TransformContext): DataFrame =
              src.select(col("n_nationkey"), upper(col("n_name")).as("name_upper"))
          },
          new SourceDriver {
            def read(s: SparkSession, sp: MigrationSpec): DataFrame = load(s, sf, "nation")
          },
          new ParquetDestinationDriver, numChunks = 4)
        releasing(exec)(
          res.finalSnapshot.select(col("n_nationkey"), col("name_upper"))
            .orderBy(col("n_nationkey")))
      },
      Some("""SELECT n_nationkey, UPPER(n_name) AS name_upper
             |FROM nation ORDER BY n_nationkey""".stripMargin)),

    // flush=true THROUGH the JDBC MERGE sink — the reference's actual
    // self-referencing shape (`/root/reference/src/Annotations/
    // DataMigration.php:96-105` exists precisely so ORM rows written
    // earlier in a run are visible to later rows): each customer row
    // references its predecessor (id-10), the run is chunked 4 ways by
    // key range, and chunk i's transform reads the predecessor's name
    // BACK FROM THE DATABASE (JdbcDestinationDriver merge mode — per-
    // chunk MERGE INTO, O(chunk) rows to the DB, never a truncate).
    // A predecessor in the SAME chunk is not yet visible (NULL) — the
    // oracle replays the exact chunk-boundary arithmetic
    // (rank*nChunks/total, integer division) to pin that visibility
    // frontier into the hash. Proves executeChunked's earlier-chunk
    // visibility contract holds on a sink with NO stable snapshots
    // (the barrier path), not just on generation-pointer parquet.
    QueryDef("etl_jdbc_flush",
      (spark, sf) => {
        val db = scratch("graft_derby_flush") + "/db"
        val url = s"jdbc:derby:$db;create=true"
        val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
        val theSpec = MigrationSpec("jdbc_flush", source = url, sourceDriver = "jdbc",
          destination = url, destinationDriver = "jdbc",
          sourceIds = Seq(IdField("c_custkey", LongId)),
          destinationIds = Seq(IdField("id", LongId)), flush = true)
        val mapper = new MappingStore(scratch("graft_derby_flush") + "/map")
        val exec = new MigrationExecutor(mapper, new ReferenceStore(mapper), KeepOrphans)
        val d = new JdbcDestinationDriver("cust_flush", props, merge = true)
        val mig = new Migration {
          def spec: MigrationSpec = theSpec
          def transform(src: DataFrame, ctx: TransformContext): DataFrame = {
            val named = src.select(col("c_custkey"), col("c_custkey").as("id"),
              col("c_name").as("name"))
            ctx.snapshot match {
              case Some(snap) => named.join(
                  snap.select(col("id").as("pid"), col("name").as("prev_name")),
                  named("id") - 10 === col("pid"), "left")
                .select(col("c_custkey"), col("id"), col("name"), col("prev_name"))
              case None => named.withColumn("prev_name", lit(null).cast("string"))
            }
          }
        }
        exec.executeChunked(spark, mig,
          new SourceDriver {
            def read(s: SparkSession, sp: MigrationSpec): DataFrame =
              load(s, sf, "customer").filter(col("c_custkey") % 10 === 0)
          },
          d, numChunks = 4)
        releasing(exec)(
          new JdbcSourceDriver(
            """SELECT "id", "name", "prev_name" FROM cust_flush""", None, props)
            .read(spark, theSpec)
            .select(col("id"), col("name"), col("prev_name"))
            .orderBy(col("id")))
      },
      Some("""WITH u AS (
             |  SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name,
             |    ROW_NUMBER() OVER (ORDER BY c_custkey) - 1 AS r
             |  FROM customer WHERE c_custkey % 10 = 0),
             |n AS (SELECT COUNT(*) AS total FROM u)
             |SELECT u.id, u.name,
             |  CASE WHEN u.r >= 1
             |        AND (u.r - 1) * 4 // n.total < u.r * 4 // n.total
             |       THEN p.name END AS prev_name
             |FROM u CROSS JOIN n LEFT JOIN u p ON p.id = u.id - 10
             |ORDER BY u.id""".stripMargin)),

    // §2.3 DB-generated destination ids, set-wise
    // (`DoctrineDestinationDriver.php:156-173`, SURVEY §7.4): transforms
    // that emit no dest id get max(existing) + dense row_number over the
    // source order — reproducible as SQL ROW_NUMBER.
    QueryDef("etl_generated_ids",
      (spark, sf) => {
        val base = scratch("graft_genid")
        val theSpec = MigrationSpec("genid", source = "", sourceDriver = "inline",
          destination = s"$base/dest", destinationDriver = "parquet",
          sourceIds = Seq(IdField("n_nationkey", LongId)),
          destinationIds = Seq(IdField("id", LongId)))
        val mapper = new MappingStore(s"$base/map")
        val exec = new MigrationExecutor(mapper, new ReferenceStore(mapper), KeepOrphans)
        exec.execute(spark,
          new Migration {
            def spec: MigrationSpec = theSpec
            def transform(src: DataFrame, ctx: TransformContext): DataFrame =
              src.select(col("n_nationkey"), col("n_name")) // no dest id
          },
          new SourceDriver {
            def read(s: SparkSession, sp: MigrationSpec): DataFrame = load(s, sf, "nation")
          },
          new ParquetDestinationDriver)
        releasing(exec)(mapper.load(spark, theSpec).get
          .select(col("source_n_nationkey"), col("dest_id"))
          .orderBy(col("source_n_nationkey")))
      },
      Some("""SELECT n_nationkey AS source_n_nationkey,
             |  ROW_NUMBER() OVER (ORDER BY n_nationkey) AS dest_id
             |FROM nation ORDER BY source_n_nationkey""".stripMargin)),

    // §2.3 key extraction + cast (`DataMigrationExecutor.php:340-356`):
    // declared id columns cast per IdField type, null keys rejected.
    QueryDef("etl_key_cast",
      (spark, sf) => load(spark, sf, "nation")
        .select(col("n_nationkey").cast("long").as("key_long"),
          col("n_name").cast("string").as("key_string"))
        .filter(col("key_long").isNotNull && col("key_string").isNotNull)
        .orderBy(col("key_long")),
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS key_long, n_name AS key_string
             |FROM nation WHERE n_nationkey IS NOT NULL AND n_name IS NOT NULL
             |ORDER BY key_long""".stripMargin)),

    // §2.3 group / selection filter (`DataMigrationManager.php:256-266`,
    // `MigrateCommand.php --group`): a three-migration registry spanning
    // two groups is filtered through MigrationRegistry.byGroups and ONLY
    // the selected group's migrations execute; the output unions every
    // executed migration's snapshot under its name. If the filter ever
    // selected the wrong set, extra (or missing) rows flip the driver's
    // row/hash check — the CLI surface's semantics, gated end-to-end.
    QueryDef("etl_group_filter",
      (spark, sf) => {
        val base = scratch("graft_grp")
        val mapper = new MappingStore(s"$base/map")
        val refs = new ReferenceStore(mapper)
        val dest = new ParquetDestinationDriver
        def mkSpec(n: String, srcId: String, grp: String) = MigrationSpec(n,
          source = "", sourceDriver = "inline",
          destination = s"$base/$n", destinationDriver = "parquet",
          sourceIds = Seq(IdField(srcId, LongId)),
          destinationIds = Seq(IdField("sid", LongId)), group = grp)
        def mkMig(theSpec: MigrationSpec, name: String) = new Migration {
          def spec: MigrationSpec = theSpec
          def transform(src: DataFrame, ctx: TransformContext): DataFrame =
            src.select(col(theSpec.sourceIds.head.name),
              col(theSpec.sourceIds.head.name).as("sid"), col(name))
        }
        val migs = Seq(
          mkMig(mkSpec("m_nation", "n_nationkey", "dims"), "n_name"),
          mkMig(mkSpec("m_region", "r_regionkey", "dims"), "r_name"),
          mkMig(mkSpec("m_cust", "c_custkey", "facts"), "c_name"))
        val registry = new MigrationRegistry
        migs.foreach(m => registry.add(m.spec))
        val selected = registry.byGroups(Set("dims")).map(_.name).toSet
        val srcTables = Map("m_nation" -> "nation", "m_region" -> "region",
          "m_cust" -> "customer")
        val exec = new MigrationExecutor(mapper, refs, KeepOrphans)
        val results = exec
          .executeAll(spark, migs.filter(m => selected(m.spec.name)),
            m => new SourceDriver {
              def read(s: SparkSession, sp: MigrationSpec): DataFrame =
                load(s, sf, srcTables(sp.name))
            },
            m => dest)
        releasing(exec)(results.toSeq.sortBy(_._1).map { case (name, res) =>
          res.finalSnapshot.select(lit(name).as("migration"), col("sid"),
            col(if (name == "m_nation") "n_name" else "r_name").as("entity_name"))
        }.reduce(_ unionByName _).orderBy(col("migration"), col("sid")))
      },
      Some("""SELECT 'm_nation' AS migration, n_nationkey AS sid, n_name AS entity_name
             |FROM nation
             |UNION ALL
             |SELECT 'm_region', r_regionkey, r_name FROM region
             |ORDER BY migration, sid""".stripMargin)),

    // §2.3 count / progress (`MigrateCommand.php:186` pre-counts the
    // source and advances a bar per row): the distributed replacement is
    // scheduler-truth — a job-group-scoped listener counting tasks
    // done/planned. The gate runs a real migration under
    // withProgressCounters and emits its snapshot count ONLY when the
    // counters hold the invariants (done > 0, done ≤ total — totals are
    // planned stages, so reuse can only over-estimate). A listener
    // regression (zero counts, group leakage inflating done past total)
    // empties the result and fails the driver check; the closed-form
    // oracle is the migrated row count.
    QueryDef("etl_progress",
      (spark, sf) => {
        val base = scratch("graft_prog")
        val mapper = new MappingStore(s"$base/map")
        val refs = new ReferenceStore(mapper)
        val theSpec = MigrationSpec("m_prog", source = "", sourceDriver = "inline",
          destination = s"$base/dest", destinationDriver = "parquet",
          sourceIds = Seq(IdField("n_nationkey", LongId)),
          destinationIds = Seq(IdField("sid", LongId)))
        val exec = new MigrationExecutor(mapper, refs, KeepOrphans)
        val (nRows, done, total) = MigrationProgress.withProgressCounters(
            spark, "etl_progress", out = _ => ()) {
          val res = exec.execute(spark,
            new Migration {
              def spec: MigrationSpec = theSpec
              def transform(src: DataFrame, ctx: TransformContext): DataFrame =
                src.select(col("n_nationkey"), col("n_nationkey").as("sid"),
                  col("n_name"))
            },
            new SourceDriver {
              def read(s: SparkSession, sp: MigrationSpec): DataFrame =
                load(s, sf, "nation")
            },
            new ParquetDestinationDriver)
          res.finalSnapshot.count()
        }
        releasing(exec)(spark.range(1)
          .select(lit("m_prog").as("migration"), lit(nRows).as("n_rows"))
          .filter(lit(done) > 0L && lit(done) <= lit(total)))
      },
      Some("""SELECT 'm_prog' AS migration, COUNT(*) AS n_rows
             |FROM nation""".stripMargin)),

    // §2.3 mapping-table schema conform
    // (`DataMigrationMapper.php:189-257` — diff-based CREATE/ALTER run
    // before every migration): run once, then WIDEN the spec (a second
    // source id column, the "user added an id field between runs" case)
    // and run again against the same mapping table. The conform step
    // aligns the old generation at read time — the added column appears
    // as a typed NULL on the pre-widening rows, the reference's nullable
    // ADD COLUMN — so the second run's merge unions cleanly and the new
    // generation is durably widened. Without conform this second run
    // dies inside unionByName with a column-resolution error.
    // (The companion incompatible-change path — same column, different
    // declared type — throws MappingSchemaMismatchException; pinned in
    // MapperSpec, not expressible as a result set.)
    QueryDef("etl_schema_conform",
      (spark, sf) => {
        val base = scratch("graft_conform")
        def mkSpec(srcIds: Seq[IdField]) = MigrationSpec("cust_conform",
          source = "", sourceDriver = "inline",
          destination = s"$base/dest", destinationDriver = "parquet",
          sourceIds = srcIds, destinationIds = Seq(IdField("id", LongId)))
        val spec1 = mkSpec(Seq(IdField("c_custkey", LongId)))
        val spec2 = mkSpec(Seq(IdField("c_custkey", LongId),
          IdField("c_nationkey", LongId)))
        val mapper = new MappingStore(s"$base/map")
        val exec = new MigrationExecutor(mapper, new ReferenceStore(mapper),
          IgnoreOrphans)
        val dest = new ParquetDestinationDriver
        def mig(theSpec: MigrationSpec, parity: Int, withNation: Boolean) =
          new Migration {
            def spec: MigrationSpec = theSpec
            def transform(src: DataFrame, ctx: TransformContext): DataFrame = {
              val rows = src.filter(col("c_custkey") % 3 === parity)
              val ids = Seq(col("c_custkey")) ++
                (if (withNation) Seq(col("c_nationkey")) else Nil)
              rows.select(ids ++ Seq(col("c_custkey").as("id"),
                upper(col("c_name")).as("name_upper")): _*)
            }
          }
        val source = new SourceDriver {
          def read(s: SparkSession, sp: MigrationSpec): DataFrame =
            load(s, sf, "customer")
        }
        exec.execute(spark, mig(spec1, 0, withNation = false), source, dest)
        exec.execute(spark, mig(spec2, 1, withNation = true), source, dest)
        releasing(exec)(mapper.load(spark, spec2).get
          .select(col("source_c_custkey"), col("source_c_nationkey"),
            col("dest_id"))
          .orderBy(col("source_c_custkey")))
      },
      Some("""SELECT c_custkey AS source_c_custkey,
             |  CAST(NULL AS BIGINT) AS source_c_nationkey,
             |  c_custkey AS dest_id
             |FROM customer WHERE c_custkey % 3 = 0
             |UNION ALL
             |SELECT c_custkey, c_nationkey, c_custkey
             |FROM customer WHERE c_custkey % 3 = 1
             |ORDER BY source_c_custkey""".stripMargin)),

    // Encoding-drift canary (the round-12 lesson made a GATE): the
    // driver has shipped `events.ts` as nanos-as-long, TIMESTAMP_NTZ
    // and TIMESTAMP across regenerations; Tables.normalizeTs maps all
    // three onto TimestampType at ingest. This query pins the
    // POST-NORMALIZATION schema against a closed-form oracle, so the
    // next silent testdata re-encoding fails loudly in one obvious
    // place instead of scattering analysis errors across the
    // event-time tier. TablesSpec covers the per-encoding unit paths;
    // this covers the live testdata.
    QueryDef("etl_events_schema",
      (spark, sf) => {
        import spark.implicits._
        val ev = load(spark, sf, "events")
        val nonEmpty = !ev.isEmpty
        ev.schema.fields.toSeq
          .map(f => (f.name, f.dataType.simpleString, nonEmpty))
          .toDF("col_name", "dtype", "nonempty")
          .orderBy(col("col_name"))
      },
      Some("""SELECT * FROM (VALUES
             |  ('event_id', 'bigint', TRUE),
             |  ('event_type', 'string', TRUE),
             |  ('props', 'string', TRUE),
             |  ('ts', 'timestamp', TRUE),
             |  ('user_id', 'bigint', TRUE),
             |  ('value', 'double', TRUE))
             |AS t(col_name, dtype, nonempty) ORDER BY col_name""".stripMargin)),

    // Source-side schema evolution: a long-lived dataset accretes
    // columns across generations, and a reader must union the physical
    // schemas without rewriting history. Generation 1 is (key, name);
    // generation 2 adds comment_len. `mergeSchema` reconciles the
    // footers at plan time — old files surface the new column as null,
    // which the aggregate proves (exactly half the rows carry a
    // length). Per-file footer merging is metadata-only; no data file
    // is read twice or rewritten, so the pattern is free at 100 TB.
    QueryDef("etl_schema_merge",
      (spark, sf) => {
        val dir = scratch("graft_schevo")
        val nation = load(spark, sf, "nation")
        nation.select(col("n_nationkey").cast("long").as("key"), col("n_name"))
          .write.mode("overwrite").parquet(s"$dir/g1")
        nation.select(col("n_nationkey").cast("long").as("key"), col("n_name"),
            (col("n_regionkey") * 10 + length(col("n_name"))).cast("long")
              .as("comment_len"))
          .write.mode("overwrite").parquet(s"$dir/g2")
        spark.read.option("mergeSchema", "true").parquet(s"$dir/g1", s"$dir/g2")
          .agg(count(lit(1)).as("n_rows"),
            count(col("comment_len")).as("n_with_len"),
            sum(col("comment_len")).as("sum_len"),
            countDistinct(col("key")).as("n_keys"))
      },
      Some("""WITH both_gens AS (
             |  SELECT n_nationkey AS key, NULL AS comment_len FROM nation
             |  UNION ALL
             |  SELECT n_nationkey, n_regionkey * 10 + LENGTH(n_name)
             |  FROM nation)
             |SELECT COUNT(*) AS n_rows,
             |  COUNT(comment_len) AS n_with_len,
             |  CAST(SUM(comment_len) AS BIGINT) AS sum_len,
             |  CAST(COUNT(DISTINCT key) AS BIGINT) AS n_keys
             |FROM both_gens""".stripMargin)),

    // Generation GC: the retention half of the time-travel story
    // (etl_time_travel proves old generations stay readable; this
    // proves vacuum BOUNDS them). Three writes under keepGenerations=2:
    // the oldest directory must be gone, the newest two readable, the
    // current snapshot still exactly the last write, and time travel to
    // the vacuumed generation must report absence, not garbage. Vacuum
    // is O(#generations) directory deletes — pure metadata at any data
    // size.
    QueryDef("etl_vacuum",
      (spark, sf) => {
        import graft.drivers.ParquetDestinationDriver
        import graft.spec.{IdField, LongId, MigrationSpec}
        val dir = scratch("graft_vacuum") + "/dest"
        val spec = MigrationSpec("vac", source = dir, sourceDriver = "parquet",
          destination = dir, destinationDriver = "parquet",
          sourceIds = Seq(IdField("n_nationkey", LongId)),
          destinationIds = Seq(IdField("n_nationkey", LongId)))
        val d = new ParquetDestinationDriver(keepGenerations = Some(2))
        val nation = load(spark, sf, "nation")
          .select(col("n_nationkey").cast("long"), col("n_name"))
        // three generations of decreasing size: 25, 20, 15 rows
        Seq(25, 20, 15).foreach(k =>
          d.write(nation.filter(col("n_nationkey") < k), spec))
        val retained = d.generations(spark, spec)
        val currentRows = d.snapshot(spark, spec).map(_.count()).getOrElse(-1L)
        val vacuumedReadable = d.snapshotAt(spark, spec, 0L).isDefined
        val prevRows = d.snapshotAt(spark, spec, 1L).map(_.count()).getOrElse(-1L)
        spark.createDataFrame(Seq((retained.size.toLong, retained.mkString(","),
            currentRows, prevRows, vacuumedReadable)))
          .toDF("n_retained", "retained", "current_rows", "prev_rows",
            "gen0_readable")
      },
      Some("""SELECT CAST(2 AS BIGINT) AS n_retained, '1,2' AS retained,
             |  (SELECT COUNT(*) FROM nation WHERE n_nationkey < 15)
             |    AS current_rows,
             |  (SELECT COUNT(*) FROM nation WHERE n_nationkey < 20)
             |    AS prev_rows,
             |  FALSE AS gen0_readable""".stripMargin)),

    // Small-file compaction (lakehouse OPTIMIZE): a 64-way-fragmented
    // generation is rewritten bin-packed to 256 KiB-target files in a
    // NEW generation — pointer flip last, so the fragmented snapshot
    // stays readable throughout (asserted via time travel). The gates:
    // post-compaction file count equals the byte-derived plan exactly
    // and strictly shrinks; row count and exact cents total survive the
    // rewrite; gen0 is intact. At 100 TB this is the nightly job that
    // keeps scan task counts proportional to DATA, not to ingest
    // micro-batch history — and it's measured-bytes-driven, so the same
    // code packs correctly at any row width.
    QueryDef("etl_compact_small_files",
      (spark, sf) => {
        import graft.drivers.ParquetDestinationDriver
        import graft.spec.{IdField, LongId, MigrationSpec}
        val dir = scratch("graft_compact") + "/dest"
        val spec = MigrationSpec("cmp", source = dir, sourceDriver = "parquet",
          destination = dir, destinationDriver = "parquet",
          sourceIds = Seq(IdField("o_orderkey", LongId)),
          destinationIds = Seq(IdField("o_orderkey", LongId)))
        val d = new ParquetDestinationDriver()
        val orders = load(spark, sf, "orders")
          .select(col("o_orderkey").cast("long"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
        d.write(orders.repartition(64), spec)
        val (filesBefore, _, filesAfter, planned) =
          d.compact(spark, spec, targetBytes = 256L * 1024)
        val snap = d.snapshot(spark, spec).get
          .agg(count(lit(1)).as("rows"), sum(col("cents")).as("total_cents"))
          .collect()(0)
        val gen0Rows = d.snapshotAt(spark, spec, 0L).map(_.count()).getOrElse(-1L)
        spark.createDataFrame(Seq((filesBefore,
            filesAfter == planned && filesAfter < filesBefore,
            snap.getLong(0), snap.getLong(1), gen0Rows == snap.getLong(0))))
          .toDF("files_before", "compact_ok", "rows", "total_cents",
            "gen0_intact")
      },
      Some("""SELECT CAST(64 AS BIGINT) AS files_before, TRUE AS compact_ok,
             |  CAST(COUNT(*) AS BIGINT) AS rows,
             |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents,
             |  TRUE AS gen0_intact
             |FROM orders""".stripMargin)),

    // Right-to-erasure propagation (GDPR art. 17): filtered-rewrite of
    // the current generation WITHOUT the subject's rows, pointer flip,
    // then purge of all older generations — erasure is only real once
    // the bytes are unreachable, which the gate verifies structurally
    // (pre-erasure snapshot gone, only the post-erasure generation
    // retained, zero erased keys readable). One filtered scan-and-write
    // plus one counting aggregate: at 100 TB this is the same cost as
    // any compaction rewrite, and partition pruning on a keyed layout
    // would cut it further.
    QueryDef("etl_erasure",
      (spark, sf) => {
        import graft.drivers.ParquetDestinationDriver
        import graft.spec.{IdField, LongId, MigrationSpec}
        val dir = scratch("graft_erasure") + "/dest"
        val spec = MigrationSpec("gdpr", source = dir, sourceDriver = "parquet",
          destination = dir, destinationDriver = "parquet",
          sourceIds = Seq(IdField("id", LongId)),
          destinationIds = Seq(IdField("id", LongId)))
        val d = new ParquetDestinationDriver()
        val users = load(spark, sf, "customer")
          .select(col("c_custkey").cast("long").as("id"),
            col("c_mktsegment").as("seg"),
            round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
        d.write(users, spec)
        val (before, erased, after) = d.erase(spark, spec, col("id") % 97 === 0)
        val snap = d.snapshot(spark, spec).get
        val leftover = snap.filter(col("id") % 97 === 0).count()
        val idSum = snap.agg(coalesce(sum(col("id")), lit(0L))).head().getLong(0)
        val gens = d.generations(spark, spec)
        spark.createDataFrame(Seq((before, erased, after,
            d.snapshotAt(spark, spec, 0L).isEmpty && gens == Seq(1L),
            leftover == 0L, idSum)))
          .toDF("rows_before", "rows_erased", "rows_after",
            "history_purged", "no_erased_survivors", "id_sum_after")
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS rows_before,
             |  CAST(SUM(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS rows_erased,
             |  CAST(SUM(CASE WHEN c_custkey % 97 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS rows_after,
             |  TRUE AS history_purged, TRUE AS no_erased_survivors,
             |  CAST(SUM(CASE WHEN c_custkey % 97 <> 0 THEN c_custkey ELSE 0 END) AS BIGINT)
             |    AS id_sum_after
             |FROM customer""".stripMargin)),

    // Dynamic partition overwrite — the INSERT OVERWRITE contract a
    // partitioned lake table needs: rewriting ONE partition's data must
    // replace only the partitions present in the incoming batch and
    // leave every other directory untouched (static mode would wipe the
    // whole table). The click partition is rewritten with doubled
    // values under partitionOverwriteMode=dynamic (conf restored
    // after); the read-back per-type totals prove click changed and the
    // other four partitions survived byte-for-value. At 100 TB this is
    // the daily-partition backfill path — IO proportional to the
    // touched partition, not the table.
    QueryDef("etl_dynamic_partition_overwrite",
      (spark, sf) => {
        val out = scratch("graft_dpo") + "/events"
        val e = load(spark, sf, "events")
          .select(col("event_type"), col("event_id"),
            round(col("value") * 1000).cast("long").as("milli"))
        e.write.partitionBy("event_type").mode("overwrite").parquet(out)
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try e.filter(col("event_type") === "click")
          .withColumn("milli", col("milli") * 2)
          .write.partitionBy("event_type").mode("overwrite").parquet(out)
        finally prev match {
          case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
        spark.read.parquet(out)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("milli")).as("sum_milli"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(CAST(ROUND(value*1000) AS BIGINT) *
             |    CASE WHEN event_type = 'click' THEN 2 ELSE 1 END) AS BIGINT)
             |    AS sum_milli
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // In-flight pipeline metrics through the engine's Observation API —
    // the dq counters a production write job publishes WITHOUT a second
    // scan: observe() attaches metric aggregates to the write's own
    // pass, so row count / money total / violation count come out of
    // the sink action itself. The gate cross-checks the observed counts
    // against the written data (read-back count parity), then emits the
    // metrics for the oracle to recompute — proving the zero-extra-pass
    // numbers equal the ground truth.
    QueryDef("dq_observe",
      (spark, sf) => {
        val obs = new org.apache.spark.sql.Observation()
        val out = scratch("graft_observe") + "/out"
        val orders = load(spark, sf, "orders")
          .select(col("o_orderkey"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .observe(obs, count(lit(1)).as("rows"),
            sum(col("cents")).as("total_cents"),
            sum(when(col("cents") <= 0, 1L).otherwise(0L)).as("bad_rows"))
        orders.write.mode("overwrite").parquet(out)
        val m = obs.get
        val written = spark.read.parquet(out).count()
        spark.createDataFrame(Seq((m("rows").asInstanceOf[Long],
            m("total_cents").asInstanceOf[Long],
            m("bad_rows").asInstanceOf[Long],
            written == m("rows").asInstanceOf[Long])))
          .toDF("rows", "total_cents", "bad_rows", "write_parity")
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS rows,
             |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents,
             |  CAST(0 AS BIGINT) AS bad_rows, TRUE AS write_parity
             |FROM orders""".stripMargin)),

    // Generation history report (DESCRIBE HISTORY): per retained
    // generation, row count and file count straight from the sink's
    // layout — the introspection surface an operator reads before a
    // time-travel, diff, vacuum, or compaction decision. Three writes
    // with known shapes (coalesce-controlled file counts); listing is
    // O(#generations × #files) driver metadata, rows one count per
    // generation.
    QueryDef("etl_generation_stats",
      (spark, sf) => {
        import graft.drivers.ParquetDestinationDriver
        import graft.spec.{IdField, LongId, MigrationSpec}
        val dir = scratch("graft_genstats") + "/dest"
        val spec = MigrationSpec("gs", source = dir, sourceDriver = "parquet",
          destination = dir, destinationDriver = "parquet",
          sourceIds = Seq(IdField("n_nationkey", LongId)),
          destinationIds = Seq(IdField("n_nationkey", LongId)))
        val nation = load(spark, sf, "nation")
          .select(col("n_nationkey").cast("long"), col("n_name"))
        Seq(25 -> 1, 20 -> 2, 15 -> 3).foreach { case (k, parts) =>
          // repartition wide first so the sink's writePartitions coalesce
          // (which can only shrink) actually lands on `parts` files
          new ParquetDestinationDriver(writePartitions = Some(parts))
            .write(nation.filter(col("n_nationkey") < k).repartition(8), spec)
        }
        val d = new ParquetDestinationDriver()
        val rows = d.generations(spark, spec).map { g =>
          val snap = d.snapshotAt(spark, spec, g).get
          val files = new java.io.File(s"$dir/gen$g").listFiles()
            .count(_.getName.startsWith("part-"))
          (g, snap.count(), files.toLong, g == 2L)
        }
        spark.createDataFrame(rows)
          .toDF("generation", "rows", "files", "is_current")
          .orderBy(col("generation"))
      },
      Some("""SELECT g AS generation,
             |  CAST((SELECT COUNT(*) FROM nation WHERE n_nationkey < k) AS BIGINT) AS rows,
             |  CAST(f AS BIGINT) AS files, (g = 2) AS is_current
             |FROM (VALUES (0, 25, 1), (1, 20, 2), (2, 15, 3)) v(g, k, f)
             |ORDER BY generation""".stripMargin)),

    // Generation diff (table_changes): derive the change log BETWEEN two
    // retained generations by one co-partitioned full-outer join — the
    // audit/incremental-consumer op time travel makes possible (what
    // changed since the snapshot I last read?). The scenario writes a
    // baseline and an evolved generation with known modular insert/
    // delete/update rules; the diff's per-class counts replay closed-
    // form in the oracle. Cost is one join of the two snapshots — no
    // row hashing on the driver, no full-history log required.
    QueryDef("etl_snapshot_diff",
      (spark, sf) => {
        import graft.drivers.ParquetDestinationDriver
        import graft.spec.{IdField, LongId, MigrationSpec}
        val dir = scratch("graft_sdiff") + "/dest"
        val spec = MigrationSpec("sdiff", source = dir, sourceDriver = "parquet",
          destination = dir, destinationDriver = "parquet",
          sourceIds = Seq(IdField("o_orderkey", LongId)),
          destinationIds = Seq(IdField("o_orderkey", LongId)))
        val d = new ParquetDestinationDriver()
        val orders = load(spark, sf, "orders")
          .select(col("o_orderkey").cast("long"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
        d.write(orders.filter(col("o_orderkey") % 2 === 0), spec)
        d.write(orders.filter(col("o_orderkey") % 3 =!= 0)
          .withColumn("cents", when(col("o_orderkey") % 5 === 0,
            col("cents") + 7).otherwise(col("cents"))), spec)
        graft.ops.Cdc.snapshotDiff(
            d.snapshotAt(spark, spec, 0L).get, d.snapshotAt(spark, spec, 1L).get,
            keys = Seq("o_orderkey"), valueCols = Seq("cents"))
          .groupBy(col("change")).agg(count(lit(1)).as("n"))
          .orderBy(col("change"))
      },
      Some("""WITH k AS (SELECT o_orderkey AS key FROM orders)
             |SELECT change, n FROM (
             |  SELECT 'deleted' AS change, CAST(COUNT(*) AS BIGINT) AS n
             |  FROM k WHERE key % 2 = 0 AND key % 3 = 0
             |  UNION ALL
             |  SELECT 'inserted', CAST(COUNT(*) AS BIGINT)
             |  FROM k WHERE key % 2 = 1 AND key % 3 <> 0
             |  UNION ALL
             |  SELECT 'unchanged', CAST(COUNT(*) AS BIGINT)
             |  FROM k WHERE key % 2 = 0 AND key % 3 <> 0 AND key % 5 <> 0
             |  UNION ALL
             |  SELECT 'updated', CAST(COUNT(*) AS BIGINT)
             |  FROM k WHERE key % 2 = 0 AND key % 3 <> 0 AND key % 5 = 0)
             |ORDER BY change""".stripMargin)),

    // Write-audit-publish — the lakehouse deployment pattern that makes
    // the dq tier OPERATIONAL: candidate data is staged as an
    // unpublished generation, audited in place (row-constraint scan, the
    // dq_expectations shape), and only a clean audit flips the pointer;
    // a dirty batch is aborted with production readers never exposed.
    // Here a poisoned batch (one negative-price row) stages, fails its
    // audit, and aborts — snapshot still the baseline; then the clean
    // full batch stages, passes, and publishes. The commit is the
    // pointer flip, so audit cost is one scan of the staged data and
    // abort is one directory delete — O(audit) + O(1) at any size.
    QueryDef("etl_wap",
      (spark, sf) => {
        import graft.drivers.ParquetDestinationDriver
        import graft.spec.{IdField, LongId, MigrationSpec}
        val dir = scratch("graft_wap") + "/dest"
        val spec = MigrationSpec("wap", source = dir, sourceDriver = "parquet",
          destination = dir, destinationDriver = "parquet",
          sourceIds = Seq(IdField("o_orderkey", LongId)),
          destinationIds = Seq(IdField("o_orderkey", LongId)))
        val d = new ParquetDestinationDriver()
        val orders = load(spark, sf, "orders")
          .select(col("o_orderkey").cast("long"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
        val baseline = orders.filter(col("o_orderkey") % 2 === 0)
        d.write(baseline, spec)
        def audit(gen: String): Boolean =
          d.snapshotAt(spark, spec, gen.stripPrefix("gen").toLong).get
            .filter(col("cents") <= 0 || col("o_orderkey").isNull)
            .limit(1).count() == 0
        // dirty candidate: full batch + one poisoned row
        val dirty = orders.unionByName(
          spark.range(1).select(lit(-1L).as("o_orderkey"), lit(-500L).as("cents")))
        val g1 = d.stage(dirty, spec)
        val dirtyClean = audit(g1)
        if (!dirtyClean) d.abortStaged(spark, spec, g1)
        val afterAbortRows = d.snapshot(spark, spec).get.count()
        // clean candidate: the full batch
        val g2 = d.stage(orders, spec)
        val cleanOk = audit(g2)
        if (cleanOk) d.publish(spark, spec, g2)
        val fin = d.snapshot(spark, spec).get
          .agg(count(lit(1)).as("rows"), sum(col("cents")).as("total_cents"))
          .collect()(0)
        val baseRows = baseline.count()
        spark.createDataFrame(Seq((
            !dirtyClean && afterAbortRows == baseRows,
            cleanOk, fin.getLong(0), fin.getLong(1))))
          .toDF("dirty_aborted", "clean_published", "rows", "total_cents")
      },
      Some("""SELECT TRUE AS dirty_aborted, TRUE AS clean_published,
             |  CAST(COUNT(*) AS BIGINT) AS rows,
             |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
             |FROM orders""".stripMargin)),

    // Bad-row quarantine routing — the ETL split dq_expectations only
    // AUDITS: every input row either passes all row-level rules into
    // the generation sink or lands in a quarantine sink carrying the
    // FULL comma-joined list of violated rules (multi-violation rows
    // keep every reason — triage needs them all). Dirt is injected
    // deterministically (every 97th key loses its date, every 89th
    // negates its price, every 83rd corrupts its status), so the
    // routing decision, the reason strings and both sinks' contents
    // are exactly SQL-replayable. The emission gate re-reads BOTH
    // sinks and requires (a) the two row counts to partition the input
    // and (b) zero rule violations in the published generation — the
    // quarantine contract, proven on the readback, not the plan.
    // One scan, one split, two writes; reasons build at scan speed.
    QueryDef("etl_quarantine",
      (spark, sf) => {
        import Shared.cents
        val base = scratch("graft_quarantine")
        val sp = MigrationSpec("quarantine", source = "", sourceDriver = "inline",
          destination = s"$base/dest", destinationDriver = "parquet",
          sourceIds = Seq(IdField("id", LongId)),
          destinationIds = Seq(IdField("id", LongId)))
        val d = new ParquetDestinationDriver
        val dirty = load(spark, sf, "orders").select(
          col("o_orderkey").cast("long").as("id"),
          when(col("o_orderkey") % 97 === 0, lit(null))
            .otherwise(col("o_orderdate")).as("od"),
          when(col("o_orderkey") % 89 === 0, -col("o_totalprice"))
            .otherwise(col("o_totalprice")).as("price"),
          when(col("o_orderkey") % 83 === 0, lit("X"))
            .otherwise(col("o_orderstatus")).as("status"))
        val flagged = dirty.withColumn("reasons", concat_ws(",",
          filter(array(
            when(col("price") <= 0, "bad_price"),
            when(!col("status").isin("O", "F", "P"), "bad_status"),
            when(col("od").isNull, "null_date")), r => r.isNotNull)))
        d.write(flagged.filter(col("reasons") === "")
          .select(col("id"), cents(col("price")).as("cents"),
            col("status"), col("od")), sp)
        flagged.filter(col("reasons") =!= "")
          .select(col("id"), cents(col("price")).as("cents"), col("reasons"))
          .write.mode("overwrite").parquet(s"$base/quarantine")
        val goodBack = d.snapshot(spark, sp).get
        val badBack = spark.read.parquet(s"$base/quarantine")
        val ok = goodBack.count() + badBack.count() == dirty.count() &&
          goodBack.filter(col("cents") <= 0 ||
            !col("status").isin("O", "F", "P") || col("od").isNull)
            .count() == 0L
        badBack.groupBy(col("reasons"))
          .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
          .unionByName(goodBack.agg(count(lit(1)).as("n_rows"),
            sum(col("cents")).as("sum_cents"))
            .select(lit("ok").as("reasons"), col("n_rows"), col("sum_cents")))
          .filter(lit(ok))
          .orderBy(col("reasons"))
      },
      Some("""WITH dirty AS (
             |  SELECT o_orderkey AS id,
             |    CASE WHEN o_orderkey % 97 = 0 THEN NULL
             |         ELSE o_orderdate END AS od,
             |    CASE WHEN o_orderkey % 89 = 0 THEN -o_totalprice
             |         ELSE o_totalprice END AS price,
             |    CASE WHEN o_orderkey % 83 = 0 THEN 'X'
             |         ELSE o_orderstatus END AS status
             |  FROM orders),
             |flagged AS (
             |  SELECT id, CAST(ROUND(price * 100) AS BIGINT) AS cents,
             |    COALESCE(array_to_string(list_filter([
             |      CASE WHEN price <= 0 THEN 'bad_price' END,
             |      CASE WHEN status NOT IN ('O','F','P') THEN 'bad_status' END,
             |      CASE WHEN od IS NULL THEN 'null_date' END],
             |      r -> r IS NOT NULL), ','), '') AS reasons
             |  FROM dirty),
             |bad AS (SELECT reasons, CAST(COUNT(*) AS BIGINT) n_rows,
             |    CAST(SUM(cents) AS BIGINT) sum_cents
             |  FROM flagged WHERE reasons <> '' GROUP BY 1),
             |good AS (SELECT 'ok' AS reasons, CAST(COUNT(*) AS BIGINT) n_rows,
             |    CAST(SUM(cents) AS BIGINT) sum_cents
             |  FROM flagged WHERE reasons = '')
             |SELECT * FROM bad UNION ALL SELECT * FROM good
             |ORDER BY reasons""".stripMargin)),

    // Data-quality expectations (the Great-Expectations/Deequ-style
    // constraint audit a pipeline runs before publishing a table): all
    // row-level checks — key/date non-null, enum membership, value
    // range, cross-column sanity — evaluate in ONE scan as summed flag
    // columns unpivoted via explode(map(...)) (the q_attribution trick:
    // a UNION of per-constraint aggregates would clone the scan per
    // constraint); the one set-level check (key uniqueness) is its own
    // keyed aggregate, unioned after. Integer counts end to end.
    QueryDef("dq_expectations",
      (spark, sf) => {
        val o = load(spark, sf, "orders")
        def bad(c: org.apache.spark.sql.Column) =
          sum(when(c, 1L).otherwise(0L))
        val rowLevel = o.agg(
            count(lit(1)).as("n"),
            bad(col("o_orderkey").isNull).as("null_key"),
            bad(col("o_orderdate").isNull).as("null_date"),
            bad(!col("o_orderstatus").isin("O", "F", "P")).as("bad_status"),
            bad(col("o_totalprice") <= 0).as("bad_price"),
            bad(col("o_orderdate") < to_timestamp(lit("1995-01-01"))).as("early_date"))
          .select(col("n"), explode(map(
            lit("null_key"), col("null_key"),
            lit("null_date"), col("null_date"),
            lit("bad_status"), col("bad_status"),
            lit("bad_price"), col("bad_price"),
            lit("early_date"), col("early_date")))
            .as(Seq("constraint", "n_violations")))
        val unique = o.groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("c"))
          .agg(sum(col("c")).as("n"),
            sum(col("c") - 1).as("n_violations"))
          .select(col("n"), lit("dup_key").as("constraint"),
            col("n_violations"))
        rowLevel.unionByName(unique)
          .select(col("constraint"), col("n"), col("n_violations"))
          .orderBy(col("constraint"))
      },
      Some("""WITH row_level AS (
             |  SELECT COUNT(*) n,
             |    SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) null_key,
             |    SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) null_date,
             |    SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
             |        THEN 1 ELSE 0 END) bad_status,
             |    SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) bad_price,
             |    SUM(CASE WHEN o_orderdate < TIMESTAMP '1995-01-01'
             |        THEN 1 ELSE 0 END) early_date
             |  FROM orders),
             |uniq AS (
             |  SELECT SUM(c) n, SUM(c - 1) dup_key
             |  FROM (SELECT COUNT(*) c FROM orders GROUP BY o_orderkey)),
             |un AS (
             |  SELECT 'null_key' AS constraint, n, null_key v FROM row_level
             |  UNION ALL SELECT 'null_date', n, null_date FROM row_level
             |  UNION ALL SELECT 'bad_status', n, bad_status FROM row_level
             |  UNION ALL SELECT 'bad_price', n, bad_price FROM row_level
             |  UNION ALL SELECT 'early_date', n, early_date FROM row_level
             |  UNION ALL SELECT 'dup_key', n, dup_key FROM uniq)
             |SELECT "constraint", CAST(n AS BIGINT) AS n,
             |  CAST(v AS BIGINT) AS n_violations
             |FROM un ORDER BY "constraint"""".stripMargin)),

    // Referential-integrity audit: orphan counts for every foreign key
    // in the schema — each a null-safe LEFT ANTI join where the parent
    // key side is the (broadcast-able) dimension. The per-relation
    // aggregates are one row each, so the union is free; at 100 TB each
    // audit is one scan of the child + one broadcast.
    QueryDef("dq_referential",
      (spark, sf) => {
        def audit(rel: String, child: DataFrame, key: String,
            parent: DataFrame, pkey: String) = {
          val orphans = child.select(col(key))
            .join(broadcast(parent.select(col(pkey).as(key))), Seq(key), "left_anti")
            .count()
          (rel, child.count(), orphans)
        }
        val rows = Seq(
          audit("lineitem->orders", load(spark, sf, "lineitem"), "l_orderkey",
            load(spark, sf, "orders"), "o_orderkey"),
          audit("orders->customer", load(spark, sf, "orders"), "o_custkey",
            load(spark, sf, "customer"), "c_custkey"),
          audit("nation->region", load(spark, sf, "nation"), "n_regionkey",
            load(spark, sf, "region"), "r_regionkey"),
          audit("supplier->nation", load(spark, sf, "supplier"), "s_nationkey",
            load(spark, sf, "nation"), "n_nationkey"))
        spark.createDataFrame(rows)
          .toDF("relation", "n_child_rows", "n_orphans")
          .orderBy(col("relation"))
      },
      Some("""SELECT relation, CAST(n_child_rows AS BIGINT) AS n_child_rows,
             |  CAST(n_orphans AS BIGINT) AS n_orphans FROM (
             |  SELECT 'lineitem->orders' relation, COUNT(*) n_child_rows,
             |    SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) n_orphans
             |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
             |  UNION ALL
             |  SELECT 'orders->customer', COUNT(*),
             |    SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
             |  FROM orders r LEFT JOIN customer c ON r.o_custkey = c.c_custkey
             |  UNION ALL
             |  SELECT 'nation->region', COUNT(*),
             |    SUM(CASE WHEN g.r_regionkey IS NULL THEN 1 ELSE 0 END)
             |  FROM nation n LEFT JOIN region g ON n.n_regionkey = g.r_regionkey
             |  UNION ALL
             |  SELECT 'supplier->nation', COUNT(*),
             |    SUM(CASE WHEN x.n_nationkey IS NULL THEN 1 ELSE 0 END)
             |  FROM supplier s LEFT JOIN nation x ON s.s_nationkey = x.n_nationkey)
             |ORDER BY relation""".stripMargin)),

    // Daily-volume anomaly monitor — the pipeline-health twin of the
    // row-level dq checks: per-day arrival counts scored against the
    // median/3×MAD band of the corpus' own daily history (robust to the
    // very anomalies it hunts, unlike a mean/σ band). All-integer lower
    // medians over the POST-AGGREGATION day table (bounded by calendar
    // days, not data), every day emitted with its verdict so quiet
    // periods still produce an auditable report.
    QueryDef("dq_volume_anomaly",
      (spark, sf) => {
        val daily = load(spark, sf, "events")
          .groupBy(to_date(col("ts")).as("event_day"))
          .agg(count(lit(1)).as("n"))
        val med = daily
          .agg(sort_array(collect_list(col("n"))).as("xs"), count(lit(1)).as("nd"))
          .select(expr("xs[CAST((nd-1) div 2 AS INT)]").as("med"))
        val withMed = daily.crossJoin(broadcast(med))
          .withColumn("dev", abs(col("n") - col("med")))
        val mad = withMed
          .agg(sort_array(collect_list(col("dev"))).as("ds"), count(lit(1)).as("nd"))
          .select(expr("ds[CAST((nd-1) div 2 AS INT)]").as("mad"))
        withMed.crossJoin(broadcast(mad))
          .select(col("event_day"), col("n"), col("med"), col("mad"),
            (col("mad") > 0 && col("dev") > col("mad") * 3).as("anomaly"))
          .orderBy(col("event_day"))
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) event_day, CAST(COUNT(*) AS BIGINT) n
             |  FROM events GROUP BY 1),
             |m AS (SELECT list_sort(list(n)) xs, COUNT(*) nd FROM daily),
             |med AS (SELECT xs[CAST((nd-1)//2 AS INT) + 1] med FROM m),
             |d AS (SELECT event_day, n, med, ABS(n - med) dev FROM daily CROSS JOIN med),
             |m2 AS (SELECT list_sort(list(dev)) ds, COUNT(*) nd FROM d),
             |mad AS (SELECT ds[CAST((nd-1)//2 AS INT) + 1] mad FROM m2)
             |SELECT event_day, n, med, mad,
             |  (mad > 0 AND dev > 3*mad) AS anomaly
             |FROM d CROSS JOIN mad ORDER BY event_day""".stripMargin)),

    // Freshness / completeness audit — the third leg of the dq tier
    // (expectations = row constraints, referential = cross-table, this =
    // arrival): per-stream lag behind the globally freshest event, volume
    // in the trailing 24 h, and a staleness verdict. Lag is exact integer
    // microsecond arithmetic (unix_micros both engines) floor-divided to
    // seconds — no timezone or boundary-crossing semantics to disagree
    // on. ONE scan + one agg on a bounded key domain; the global
    // watermark is a 1-row broadcast, not a second pass per stream.
    QueryDef("dq_freshness",
      (spark, sf) => {
        val e = load(spark, sf, "events")
          .select(col("event_type"), col("ts"),
            expr("unix_micros(ts)").as("us"))
        val g = e.agg(max(col("us")).as("gus"))
        e.crossJoin(broadcast(g))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), max(col("ts")).as("max_ts"),
            max(col("us")).as("mus"), max(col("gus")).as("gus"),
            sum(when(col("us") >= col("gus") - 86400000000L, 1L)
              .otherwise(0L)).as("n_last_24h"))
          .select(col("event_type"), col("n"), col("max_ts"),
            expr("(gus - mus) div 1000000").as("lag_s"),
            col("n_last_24h"),
            (expr("(gus - mus) div 1000000") > 3600L).as("stale"))
          .orderBy(col("event_type"))
      },
      Some("""WITH g AS (SELECT MAX(epoch_us(ts)) AS gus FROM events)
             |SELECT event_type, COUNT(*) AS n, MAX(ts) AS max_ts,
             |  CAST((g.gus - MAX(epoch_us(ts))) // 1000000 AS BIGINT) AS lag_s,
             |  CAST(SUM(CASE WHEN epoch_us(ts) >= g.gus - 86400000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_last_24h,
             |  ((g.gus - MAX(epoch_us(ts))) // 1000000) > 3600 AS stale
             |FROM events CROSS JOIN g GROUP BY event_type, g.gus
             |ORDER BY event_type""".stripMargin)),

    // Benford first-digit audit — the fraud/synthetic-data smell test
    // on a money column: the observed first-significant-digit
    // distribution of the order totals against Benford's law. The
    // expected shares are the SAME integer ppm literals in both engines
    // (log10(1+1/d)·1e6, summing to exactly 1 000 000), so no libm log
    // is evaluated anywhere; observed shares are truncating integer
    // division (Spark `div` ≡ DuckDB `//`), exact to ±1 ppm. Shape: ONE
    // scan + a 9-key aggregate; the digit spine left-join keeps absent
    // digits visible as zero rows and the 1-row total attaches as a
    // broadcast scalar gate. obs·1e6 stays under 2⁶³ to ~9e12 orders —
    // two decimal orders past a 100 TB order table.
    QueryDef("dq_benford",
      (spark, sf) => {
        val obs = load(spark, sf, "orders")
          .select(expr("CAST(substring(CAST(CAST(ROUND(o_totalprice*100)" +
            " AS BIGINT) AS STRING), 1, 1) AS INT)").as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("obs"))
        val n = obs.agg(sum(col("obs")).as("n"))
        val expPpm = "CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091" +
          " WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181" +
          " WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153" +
          " ELSE 45757 END"
        spark.range(1, 10).select(col("id").cast("int").as("digit"))
          .join(obs, Seq("digit"), "left")
          .na.fill(0L, Seq("obs"))
          .crossJoin(broadcast(n))
          .select(col("digit"), col("obs"), expr(expPpm).as("exp_ppm"),
            expr("obs * 1000000 div n").as("obs_ppm"),
            (expr("obs * 1000000 div n") - expr(expPpm)).as("dev_ppm"))
          .orderBy(col("digit"))
      },
      Some("""WITH obs AS (
             |  SELECT CAST(substring(CAST(CAST(ROUND(o_totalprice*100)
             |      AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
             |    CAST(COUNT(*) AS BIGINT) AS obs
             |  FROM orders GROUP BY 1),
             |spine AS (SELECT unnest(generate_series(1, 9)) AS digit),
             |n AS (SELECT SUM(obs) AS n FROM obs),
             |f AS (
             |  SELECT CAST(s.digit AS INT) AS digit,
             |    COALESCE(o.obs, 0) AS obs,
             |    CASE s.digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
             |      WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181
             |      WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153
             |      ELSE 45757 END AS exp_ppm,
             |    COALESCE(o.obs, 0) * 1000000 // n.n AS obs_ppm
             |  FROM spine s LEFT JOIN obs o ON s.digit = o.digit CROSS JOIN n)
             |SELECT digit, obs, exp_ppm, CAST(obs_ppm AS BIGINT) AS obs_ppm,
             |  CAST(obs_ppm - exp_ppm AS BIGINT) AS dev_ppm
             |FROM f ORDER BY digit""".stripMargin)),

    // SHALLOW CLONE — the zero-copy table fork every lakehouse ships
    // (dev/test forks, what-if branches): the clone's gen0 HARDLINKS
    // the source's published files (O(files) metadata ops, zero bytes
    // moved — an object-store deployment writes a manifest instead),
    // then the two destinations evolve independently: an upsert to the
    // clone lands gen1 in the clone's own base while the source stays
    // byte-identical, safe because published generation files are
    // immutable (the invariant time travel already rests on). The gate
    // proves the full lifecycle in one SQL-replayable frame: source
    // state after the clone's divergent write (unchanged), clone state
    // (diverged), and the zero-copy bit itself (raise_error if the
    // filesystem silently fell back to copying — the in-query
    // assertion pattern the ANN/sketch gates use).
    QueryDef("etl_shallow_clone",
      (spark, sf) => {
        import graft.drivers.ParquetDestinationDriver
        import graft.spec.{IdField, LongId, MigrationSpec}
        val root = scratch("graft_clone")
        def mkSpec(name: String) = MigrationSpec(name, source = "",
          sourceDriver = "inline",
          destination = s"$root/$name", destinationDriver = "parquet",
          sourceIds = Seq(IdField("id", LongId)),
          destinationIds = Seq(IdField("id", LongId)))
        val srcSpec = mkSpec("src")
        val cloneSpec = mkSpec("clone")
        val d = new ParquetDestinationDriver()
        val seed = load(spark, sf, "customer")
          .filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey").cast("long").as("id"),
            Shared.cents(col("c_acctbal")).as("bal_cents"))
        d.write(seed, srcSpec)
        val zeroCopy = d.shallowClone(spark, srcSpec, cloneSpec)
        // diverge the CLONE: +$10 to every even id (read clone, upsert)
        val diverged = d.snapshot(spark, cloneSpec).get
          .select(col("id"),
            when(col("id") % 2 === 0, col("bal_cents") + 1000L)
              .otherwise(col("bal_cents")).as("bal_cents"))
        d.write(diverged, cloneSpec)
        val out = d.snapshot(spark, srcSpec).get
          .select(lit("src").as("side"), col("id"), col("bal_cents"))
          .unionByName(d.snapshot(spark, cloneSpec).get
            .select(lit("clone").as("side"), col("id"), col("bal_cents")))
        out.withColumn("zero_copy",
            when(lit(zeroCopy), lit(1)).otherwise(expr(
              "raise_error('etl_shallow_clone: filesystem fell back to " +
                "copying - the clone moved bytes')")))
          .orderBy(col("side"), col("id"))
      },
      Some("""WITH seed AS (
             |  SELECT CAST(c_custkey AS BIGINT) AS id,
             |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
             |  FROM customer WHERE c_custkey % 3 = 0)
             |SELECT 'clone' AS side, id,
             |  CASE WHEN id % 2 = 0 THEN bal_cents + 1000
             |       ELSE bal_cents END AS bal_cents,
             |  1 AS zero_copy
             |FROM seed
             |UNION ALL
             |SELECT 'src', id, bal_cents, 1 FROM seed
             |ORDER BY side, id""".stripMargin)),
  )
}
