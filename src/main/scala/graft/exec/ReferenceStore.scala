package graft.exec

import graft.drivers.DestinationDriver
import graft.mapper.MappingStore
import graft.spec.{MigrationSpec, NoMappingForIdsException}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-migration reference lookups — the declarative replacement for
  * `MigrationReferenceStore::get(migrationId, sourceIds)`
  * (`/root/reference/src/DataMigration/MigrationReferenceStore.php:65-120`),
  * which did two DB round trips *per row per cold lookup* (mapping SELECT
  * then destination point read, `:92-101`) — the reference's biggest
  * scalability cliff (SURVEY §3.3).
  *
  * Here the referenced migration's entire `sourceIds → destination entity`
  * relation is materialized once as a DataFrame (mapping table joined to
  * destination snapshot), memoized per migration like the reference's memo
  * cache (`:67-84`), and handed to transforms to join against — broadcast
  * when small, sort-merge when not; Catalyst decides.
  */
final class ReferenceStore(mapper: MappingStore) {
  // concurrent: executeAll(parallelism > 1) resolves references from
  // multiple migration threads
  private val registry = scala.collection.concurrent.TrieMap
    .empty[String, (MigrationSpec, DestinationDriver)]
  private val memo = scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  def register(spec: MigrationSpec, dest: DestinationDriver): Unit =
    registry(spec.name) = (spec, dest)

  /** The referenced migration's rows keyed by *source* ids: columns
    * `source_<k>…` plus the destination entity columns.
    */
  def entitiesBySourceIds(spark: SparkSession, migrationName: String): DataFrame =
    memo.getOrElseUpdate(migrationName, {
      val (spec, dest) = registry.getOrElse(migrationName,
        throw new NoMappingForIdsException(s"migration not registered: $migrationName"))
      val mapping = mapper.load(spark, spec).getOrElse(
        throw new NoMappingForIdsException(s"no mapping table for $migrationName"))
      val snap = dest.snapshot(spark, spec).getOrElse(
        throw new NoMappingForIdsException(s"no destination snapshot for $migrationName"))
      val cond = spec.destinationIds
        .map(f => mapping(s"${MappingStore.DestPrefix}${f.name}") <=> snap(f.name))
        .reduce(_ && _)
      mapping
        .select(
          spec.sourceIds.map(f => col(s"${MappingStore.SourcePrefix}${f.name}")) ++
            spec.destinationIds.map(f => col(s"${MappingStore.DestPrefix}${f.name}")): _*)
        .join(snap, cond, "inner")
        .persist() // memoized across transforms, like the reference's entity cache
    })

  /** Resolve references for every row of `df` in one join:
    * `keyMap` maps df's FK columns → the referenced migration's source id
    * columns. Unresolved references yield nulls (the per-row
    * `NoMappingForIdsException` becomes a null-checkable column; callers
    * needing strictness can assert no-nulls set-wise, and forward
    * references go through [[Stubber]]).
    */
  def resolve(
      df: DataFrame,
      migrationName: String,
      keyMap: Map[String, String],
      select: Seq[(String, String)]): DataFrame = {
    val ref = entitiesBySourceIds(df.sparkSession, migrationName)
    val cond = keyMap.map { case (fk, srcId) =>
      df(fk) <=> ref(s"${MappingStore.SourcePrefix}$srcId")
    }.reduce(_ && _)
    // No broadcast hint: `ref` is mapping ⋈ full destination snapshot —
    // unbounded at the 100 TB design point. Catalyst/AQE broadcasts when
    // its size estimate allows and sort-merges otherwise.
    val picked = select.foldLeft(df.join(ref, cond, "left")) {
      case (acc, (refCol, asCol)) => acc.withColumn(asCol, ref(refCol))
    }
    picked.drop(ref.columns.filterNot(select.map(_._2).contains): _*)
  }

  /** [[resolve]] with transparent stub creation for unresolved references
    * — the one-call composition of the reference's
    * `referenceStore->get(…, stub=true)`
    * (`/root/reference/src/DataMigration/MigrationReferenceStore.php:65-120`):
    * FK tuples with no mapping row in the target are stubbed (write-ahead
    * entities + `status='stub'` mapping rows) BEFORE the join, so a
    * forward/self reference resolves in the same pass; the target's own
    * run later overwrites by key and flips status to migrated.
    *
    * Gating mirrors the reference (`:86-90`): a destination that does not
    * support stubs silently downgrades the request — this behaves as
    * plain [[resolve]] (missing references stay null) rather than
    * erroring.
    *
    * @param defaults values for the target's required non-key fields on
    *                 stub rows (the reference random-fills; deterministic
    *                 values keep re-runs idempotent)
    */
  def resolveOrStub(
      df: DataFrame,
      migrationName: String,
      keyMap: Map[String, String],
      select: Seq[(String, String)],
      defaults: Map[String, Any] = Map.empty): DataFrame = {
    val (spec, dest) = registry.getOrElse(migrationName,
      throw new NoMappingForIdsException(s"migration not registered: $migrationName"))
    if (dest.supportsStubs) {
      val stubber = new Stubber(mapper)
      val missing = stubber.missingKeys(df, spec, keyMap)
      val stubbed = stubber.writeStubs(df.sparkSession, spec, dest, missing, defaults)
      if (stubbed > 0) invalidate(migrationName) // memo now stale: re-join below sees the stubs
    }
    resolve(df, migrationName, keyMap, select)
  }

  def invalidate(migrationName: String): Unit =
    memo.remove(migrationName).foreach(_.unpersist())

  /** Drop every memoized entity cache (each entry re-materializes from
    * the mapping + snapshot parquet on next use). Callers that outlive
    * a migration run — or gate queries handing lazy results out —
    * release here so the memo's persists don't pin storage for the
    * session lifetime.
    */
  def release(): Unit = memo.keys.toSeq.foreach(invalidate)
}
