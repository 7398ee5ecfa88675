package graft.exec

import graft.drivers.DestinationDriver
import graft.mapper.MappingStore
import graft.spec.MigrationSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Forward/self references via stubs, as a two-phase *set* job — parity
  * with `/root/reference/src/DataMigration/Stubber.php:34-48` (random-fill
  * of required fields), the stub buffer + dedupe
  * (`DataMigrationMapper.php:140-164`) and write-ahead
  * (`DataMigrationExecutor.php:194-209`), but with no per-row mutation:
  *
  *   1. collect unresolved foreign keys (`left_anti` vs the target's
  *      mapping table), deduplicated;
  *   2. synthesize one stub entity per missing key from deterministic
  *      defaults (the reference uses random values for non-nullable
  *      fields — deterministic sentinels are strictly better for a
  *      distributed engine: idempotent re-runs, reproducible plans);
  *   3. union-write them into the target destination and record mappings
  *      with `status='stub'`; the target migration's own run later
  *      overwrites by key, flipping status to migrated
  *      (`DataMigrationMapper.php:106-131`).
  */
final class Stubber(mapper: MappingStore) {

  /** Missing-reference keys: distinct FK tuples in `referring` with no
    * mapping row in `target`'s table. `fkToSourceId` maps referring-side
    * FK columns → target source id columns.
    */
  def missingKeys(
      referring: DataFrame,
      target: MigrationSpec,
      fkToSourceId: Map[String, String]): DataFrame = {
    val spark = referring.sparkSession
    val fks = referring
      .select(fkToSourceId.map { case (fk, sid) => col(fk).as(sid) }.toSeq: _*)
      .na.drop("any").distinct()
    mapper.load(spark, target) match {
      case None => fks
      case Some(m) =>
        val cond: Column = fkToSourceId.values.map(sid =>
          fks(sid) <=> m(s"${MappingStore.SourcePrefix}$sid")).reduce(_ && _)
        fks.join(m, cond, "left_anti")
    }
  }

  /** Phase 2+3: write stub entities for `missing` (keyed by target source
    * ids) and record `status='stub'` mappings. `defaults` supplies values
    * for required non-key fields; dest ids are taken equal to source ids
    * (natural-key targets) unless `destIdFromSourceId` overrides.
    */
  def writeStubs(
      spark: SparkSession,
      target: MigrationSpec,
      dest: DestinationDriver,
      missing: DataFrame,
      defaults: Map[String, Any]): Long = {
    require(dest.supportsStubs, s"destination driver for ${target.name} does not support stubs")
    val destIds = target.destinationIds.map(_.name)
    val srcIds = target.sourceIds.map(_.name)
    require(destIds.size == srcIds.size, "stub id arity mismatch")
    var stub = srcIds.zip(destIds).foldLeft(missing) { case (df, (s, d)) =>
      if (s == d) df else df.withColumn(d, col(s))
    }
    defaults.foreach { case (c, v) => stub = stub.withColumn(c, lit(v)) }
    val persisted = stub.persist()
    val n = persisted.count()
    if (n > 0) {
      val merged = dest.snapshot(spark, target) match {
        case None => persisted.select(persisted.columns.map(col): _*)
        case Some(snap) =>
          val aligned = persisted.select(snap.columns.map(c =>
            (if (persisted.columns.contains(c)) col(c) else lit(null)).as(c)): _*)
          snap.unionByName(aligned)
      }
      dest.write(merged, target)
      val mappingRows = persisted.select(
        target.sourceIds.map(f => col(f.name).as(s"${MappingStore.SourcePrefix}${f.name}")) ++
          target.destinationIds.map(f => col(f.name).as(s"${MappingStore.DestPrefix}${f.name}")): _*)
      mapper.record(spark, target, mappingRows, MappingStore.StatusStub)
    }
    persisted.unpersist()
    n
  }
}
