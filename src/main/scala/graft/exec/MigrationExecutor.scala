package graft.exec

import graft.drivers.{DestinationDriver, SourceDriver}
import graft.mapper.MappingStore
import graft.spec.MigrationSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** What to do with destination rows whose source row disappeared —
  * keep/prune; the reference's interactive "ask"
  * (`DataMigrationExecutor.php:275-307`) is replaced by an explicit policy
  * because per-row prompts are incompatible with a distributed batch job
  * (SURVEY §7.4).
  */
sealed trait OrphanPolicy
case object KeepOrphans extends OrphanPolicy
case object PruneOrphans extends OrphanPolicy
/** Incremental/streaming merges: the source is a *delta*, not the full
  * universe, so "existing key absent from this batch" means nothing —
  * existing rows are retained and no orphan bookkeeping happens. Without
  * this mode a micro-batch ingest would mark every previously-ingested
  * key as an orphan (and PruneOrphans would destroy data).
  */
case object IgnoreOrphans extends OrphanPolicy

/** User-facing migration: declarative spec + a whole-DataFrame transform.
  *
  * The reference's per-row `transform(sourceRow, currentDestEntity)`
  * (`/root/reference/src/DataMigration/DataMigrationInterface.php:30-51`)
  * becomes a set-level `DataFrame => DataFrame`: row-skip (`return null`)
  * is a `filter`, per-row mutation is `select`/`withColumn`, and the
  * "current destination entity" argument is available as
  * `ctx.currentFor(df)` — a left join against the destination snapshot
  * instead of a point read per row
  * (`DataMigrationExecutor.php:177-189`).
  */
trait Migration {
  def spec: MigrationSpec
  def transform(source: DataFrame, ctx: TransformContext): DataFrame

  /** Per-migration driver configuration hooks — parity with the
    * reference's `configureSource`/`configureDestination` (e.g. setting
    * the SQL statement on a DBAL source;
    * `/root/reference/src/Command/MigrateCommand.php:197-202`,
    * `doc/usage/creating_migrations.rst` "Configuration"). Default:
    * driver used as resolved.
    */
  def configureSource(driver: SourceDriver): SourceDriver = driver
  def configureDestination(driver: DestinationDriver): DestinationDriver = driver
}

/** Context handed to transforms: the destination snapshot (update path)
  * and cross-migration reference lookups (§3.3), both as joins.
  */
final class TransformContext(
    val spark: SparkSession,
    val spec: MigrationSpec,
    val snapshot: Option[DataFrame],
    val references: ReferenceStore) {

  /** Left-join the current destination entity columns (suffixed
    * `__current`) onto `df` by mapped destination ids — the set-oriented
    * `dest.read(dIds) ?? defaultResult()` (`Executor.php:178-183`).
    * Columns are null for the insert path; `coalesce(col, default)` in the
    * transform plays the role of `defaultResult()`.
    */
  def currentFor(df: DataFrame): DataFrame = snapshot match {
    case None => df
    case Some(snap) =>
      val renamed = snap.columns.foldLeft(snap)((a, c) => a.withColumnRenamed(c, c + "__current"))
      val cond = spec.destinationIds
        .map(f => df(s"${MappingStore.DestPrefix}${f.name}") <=> renamed(f.name + "__current"))
        .reduce(_ && _)
      df.join(renamed, cond, "left")
  }
}

final case class MigrationResult(
    migrated: Long,
    orphans: DataFrame,
    orphanCount: Long,
    finalSnapshot: DataFrame)

/** The per-migration pipeline of `DataMigrationExecutor::execute`
  * (`/root/reference/src/DataMigration/DataMigrationExecutor.php:108-135`),
  * collapsed from a row-at-a-time loop into ~4 declarative Spark steps:
  *
  * {{{
  * incoming = transform(source)                        // user map
  * incoming = mapping.lookupDest(incoming)             // broadcast join, not per-row SELECT
  * merged   = snapshot FULL OUTER incoming ON destIds  // insert-vs-update decided set-wise
  * orphans  = snapshot LEFT ANTI incoming              // Executor.php:368-382
  * write(merged); mapping.record(...)                  // upsert + bookkeeping
  * }}}
  *
  * Every step is a Catalyst plan: filters/pruning push into the scans, the
  * mapping join broadcasts (mapping ≪ fact data), and the full-outer merge
  * is one shuffle on the destination key — the minimum possible for an
  * upsert. No driver-side collects anywhere, so the same code runs on
  * 1000 executors against 100 TB.
  */
final class MigrationExecutor(
    mapper: MappingStore,
    references: ReferenceStore,
    orphanPolicy: OrphanPolicy = KeepOrphans) {

  def execute(
      spark: SparkSession,
      migration: Migration,
      source: SourceDriver,
      dest: DestinationDriver): MigrationResult = {
    val spec = migration.spec
    val destIdCols = spec.destinationIds.map(_.name)

    // 1. scan + key extraction/cast (`Executor.php:340-356`): declared id
    //    columns cast per IdField type; unset keys are an error.
    val raw = source.read(spark, spec)
    val keyed = spec.sourceIds.foldLeft(raw)((df, f) =>
      df.withColumn(f.name, col(f.name).cast(f.idType.sparkType)))

    val snapshot = dest.snapshot(spark, spec)
    val ctx = new TransformContext(spark, spec, snapshot, references)

    // 2. user transform (row-skip ⇒ the transform filters)
    val transformed = migration.transform(keyed, ctx)

    // 3. resolve destination ids through the mapping table. Transforms
    //    that already emit dest id columns (natural keys) keep them;
    //    otherwise mapped ids apply, and still-unmapped rows get generated
    //    ids (the set-wise replacement for ORM-populated auto ids,
    //    `DoctrineDestinationDriver.php:156-173`, SURVEY §7.4).
    val hasNaturalIds = destIdCols.forall(transformed.columns.contains)
    val incoming =
      if (hasNaturalIds) transformed
      else {
        val mapped = mapper.lookupDest(transformed, spec)
        assignGeneratedIds(mapped, spec, snapshot)
      }

    // 4. orphans: existing dest keys with no surviving incoming row —
    //    exact `left_anti` parity with `Executor.php:368-382`. (Under
    //    IgnoreOrphans the anti-join still feeds the merge as survivors,
    //    but is not *reported* as orphans.)
    val orphans = snapshot match {
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        incoming.select(destIdCols.map(col): _*).schema)
      case Some(snap) =>
        snap.join(incoming, joinCond(snap, incoming, destIdCols), "left_anti")
    }

    // 5. merge: incoming wins over existing on key equality; kept orphans
    //    ride along under KeepOrphans, vanish under PruneOrphans.
    val body = incoming.select(
      (destIdCols ++ transformedValueCols(incoming, spec)).map(col): _*)
    val merged = snapshot match {
      case None => body
      case Some(snap) =>
        val survivors = orphanPolicy match {
          case KeepOrphans | IgnoreOrphans =>
            orphans.select(body.columns.map(c => col(c)): _*)
          case PruneOrphans => orphans.limit(0).select(body.columns.map(c => col(c)): _*)
        }
        body.unionByName(survivors)
    }

    // 6. write destination, then record mappings (status=migrated), and
    //    all-NULL-source rows for kept orphans (`Executor.php:320-326`).
    val persistedMerged = merged.persist()
    val migratedCount = body.count()
    dest.write(persistedMerged, spec)

    val mappingRows = incoming.select(
      spec.sourceIds.map(f => col(f.name).as(s"${MappingStore.SourcePrefix}${f.name}")) ++
        spec.destinationIds.map(f => col(f.name).as(s"${MappingStore.DestPrefix}${f.name}")): _*)
    mapper.record(spark, spec, mappingRows, MappingStore.StatusMigrated)
    val reported = if (orphanPolicy == IgnoreOrphans) orphans.limit(0) else orphans
    val orphansPersisted = reported.persist()
    val orphanCount = orphansPersisted.count()
    if (orphanPolicy == KeepOrphans && orphanCount > 0) {
      mapper.recordOrphansKept(spark, spec,
        orphansPersisted.select(spec.destinationIds.map(f =>
          col(f.name).as(s"${MappingStore.DestPrefix}${f.name}")): _*))
    }
    persistedMerged.unpersist()
    MigrationResult(migratedCount, orphansPersisted, orphanCount, merged)
  }

  /** Chunked execution — the set-oriented form of the reference's
    * `flush=true` per-row flushing
    * (`/root/reference/src/Annotations/DataMigration.php:96-105`,
    * `DataMigrationExecutor.php:212-214`), which exists so
    * self-referencing datasets can observe rows written earlier in the
    * same run. Here the source is split into `numChunks` ordered chunks
    * (ntile over the source keys) and merged sequentially: chunk i's
    * transform sees a snapshot containing chunks < i. Orphans are
    * computed once against the pre-run snapshot, exactly like the
    * single-pass path.
    *
    * The ordering window funnels the source through one partition to
    * assign chunks — inherent to "process in declared order" semantics;
    * datasets needing flush mode are by nature modest (the reference
    * warns of "massive performance issues" for the same reason).
    */
  def executeChunked(
      spark: SparkSession,
      migration: Migration,
      source: SourceDriver,
      dest: DestinationDriver,
      numChunks: Int): MigrationResult = {
    import org.apache.spark.sql.expressions.Window
    val spec = migration.spec
    val destIdCols = spec.destinationIds.map(_.name)
    // generation pointers make this a stable pre-run view even as chunk
    // writes land new generations
    val pre = dest.snapshot(spark, spec)
    val keyed = spec.sourceIds.foldLeft(source.read(spark, spec))((df, f) =>
      df.withColumn(f.name, col(f.name).cast(f.idType.sparkType)))
    val w = Window.orderBy(spec.sourceIds.map(f => col(f.name)): _*)
    val chunked = keyed.withColumn("__chunk", ntile(numChunks).over(w)).persist()
    val inner = new MigrationExecutor(mapper, references, IgnoreOrphans)
    var migrated = 0L
    (1 to numChunks).foreach { c =>
      val chunkDf = chunked.filter(col("__chunk") === c).drop("__chunk")
      val chunkSource = new SourceDriver {
        def read(s: SparkSession, sp: MigrationSpec): DataFrame = chunkDf
      }
      migrated += inner.execute(spark, migration, chunkSource, dest).migrated
    }
    chunked.unpersist()
    // one orphan pass against the pre-run snapshot, as the single-pass
    // path does (`Executor.php:119,130-135`)
    val post = dest.snapshot(spark, spec).get
    val mapping = mapper.load(spark, spec).get
    val runKeys = mapping.filter(
      spec.sourceIds.map(f => col(s"${MappingStore.SourcePrefix}${f.name}").isNotNull).reduce(_ && _))
      .select(spec.destinationIds.map(f =>
        col(s"${MappingStore.DestPrefix}${f.name}").as(f.name)): _*)
    val orphans = pre match {
      case None => post.limit(0)
      case Some(p) =>
        p.join(runKeys, destIdCols.map(k => p(k) <=> runKeys(k)).reduce(_ && _), "left_anti")
    }
    val orphansPersisted = orphans.persist()
    val orphanCount = orphansPersisted.count()
    val finalSnap = orphanPolicy match {
      case PruneOrphans if orphanCount > 0 =>
        val pruned = post.join(orphansPersisted,
          destIdCols.map(k => post(k) <=> orphansPersisted(k)).reduce(_ && _), "left_anti")
        dest.write(pruned, spec)
        pruned
      case KeepOrphans if orphanCount > 0 =>
        mapper.recordOrphansKept(spark, spec,
          orphansPersisted.select(spec.destinationIds.map(f =>
            col(f.name).as(s"${MappingStore.DestPrefix}${f.name}")): _*))
        post
      case _ => post
    }
    MigrationResult(migrated, orphansPersisted, orphanCount, finalSnap)
  }

  /** Run a set of migrations in dependency order
    * (`DataMigrationManager.php:271-326` + `MigrateCommand.php:181-205`).
    */
  def executeAll(
      spark: SparkSession,
      migrations: Seq[Migration],
      sources: Migration => SourceDriver,
      dests: Migration => DestinationDriver): Map[String, MigrationResult] = {
    val registry = new graft.spec.MigrationRegistry
    migrations.foreach(m => registry.add(m.spec))
    val (ordered, _) = registry.resolveOrder(migrations.map(_.spec.name))
    val byName = migrations.map(m => m.spec.name -> m).toMap
    ordered.map { spec =>
      val m = byName(spec.name)
      spec.name -> execute(spark, m, sources(m), dests(m))
    }.toMap
  }

  private def joinCond(l: DataFrame, r: DataFrame, keys: Seq[String]): Column =
    keys.map(k => l(k) <=> r(k)).reduce(_ && _)

  /** DB-generated ids, set-wise: rows with no mapped dest id get
    * `max(existing) + dense row_number` — one window over the new rows,
    * no per-row ORM round trips (SURVEY §7.4 hard part).
    */
  private def assignGeneratedIds(
      mapped: DataFrame, spec: MigrationSpec, snapshot: Option[DataFrame]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(spec.destinationIds.size == 1,
      "generated ids supported for single-column destination keys")
    val idCol = spec.destinationIds.head.name
    val destCol = s"${MappingStore.DestPrefix}${spec.destinationIds.head.name}"
    val maxExisting: Long = snapshot
      .map(_.agg(max(col(idCol)).cast("long")).head() match {
        case r if r.isNullAt(0) => 0L
        case r                  => r.getLong(0)
      }).getOrElse(0L)
    // Number ONLY the still-unmapped rows (mapped rows keep their ids
    // across re-runs). NOTE: the row_number window funnels new rows
    // through one partition — new-row batches are typically ≪ snapshot
    // size; for huge initial loads prefer natural keys.
    // monotonically_increasing_id is not used because ids must stay
    // dense and stable across re-runs.
    val w = Window.partitionBy(col(destCol).isNull)
      .orderBy(spec.sourceIds.map(f => col(f.name)): _*)
    mapped
      .withColumn(idCol,
        coalesce(col(destCol),
          (row_number().over(w) + lit(maxExisting)).cast(spec.destinationIds.head.idType.sparkType)))
      .drop(destCol)
  }

  private def transformedValueCols(df: DataFrame, spec: MigrationSpec): Seq[String] =
    df.columns.filterNot(spec.destinationIds.map(_.name).contains)
      .filterNot(spec.sourceIds.map(_.name).contains).toSeq
}
