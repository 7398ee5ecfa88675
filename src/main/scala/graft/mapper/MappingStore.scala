package graft.mapper

import graft.spec.MigrationSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** Persistent per-migration `sourceIds ↔ destIds` mapping table — parity
  * with the reference's side-SQLite mapper
  * (`/root/reference/src/DataMigration/DataMigrationMapper.php:24-30,90-135,189-257`):
  * columns `source_<k>…`, `dest_<k>…`, an `updated` timestamp and a
  * `status` ∈ {migrated, stub} (status constants `:28-30`).
  *
  * The reference does one SQL point SELECT per row (`:433-475`) — its
  * biggest scalability cliff. Here every lookup is a join and every
  * insert-vs-update decision (`:366-383`) is one set-wise merge, so a
  * 100 TB run does O(1) shuffles per migration instead of O(rows) round
  * trips. Tables are plain Parquet keyed by migration name ("extends"
  * shares the parent's table via `MigrationSpec.mappingKey`).
  */
/** @param keepGenerations when set, every write vacuums all but the
  *   newest N generation directories. Off by default: a vacuum is only
  *   safe when N exceeds the number of writes that can land while an
  *   older snapshot is still lazily referenced (e.g. `numChunks + 1`
  *   for chunked runs) — generation storage is otherwise unbounded,
  *   which is the operational trade a deployment must pick explicitly.
  */
final class MappingStore(basePath: String, keepGenerations: Option[Int] = None) {
  import MappingStore._

  def tablePath(spec: MigrationSpec): String = s"$basePath/${spec.mappingKey}"

  def load(spark: SparkSession, spec: MigrationSpec): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(tablePath(spec), "_CURRENT")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val gen = try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
      finally in.close()
      Some(spark.read.parquet(s"${tablePath(spec)}/$gen"))
    }
  }

  /** Left-join `df` (carrying the source id columns) against the mapping
    * table, adding `dest_*` columns (null where unmapped) — the set-wise
    * form of `getDestIdsFromSourceIds` (`DataMigrationMapper.php:433-475`).
    * The mapping table has one row per migrated entity, so it is NOT
    * guaranteed small: no broadcast hint — Catalyst/AQE broadcasts when the
    * size estimate allows and falls back to sort-merge otherwise. Null-safe
    * equality mirrors the reference's `IS NULL` special-casing (`:394-401`).
    */
  def lookupDest(df: DataFrame, spec: MigrationSpec): DataFrame =
    load(df.sparkSession, spec) match {
      case None => spec.destinationIds.foldLeft(df)((acc, f) =>
        acc.withColumn(s"$DestPrefix${f.name}", lit(null).cast(f.idType.sparkType)))
      case Some(m) =>
        val mapped = m.select(
          spec.sourceIds.map(f => col(s"$SourcePrefix${f.name}")) ++
            spec.destinationIds.map(f => col(s"$DestPrefix${f.name}")): _*)
        val cond = spec.sourceIds
          .map(f => df(f.name) <=> mapped(s"$SourcePrefix${f.name}"))
          .reduce(_ && _)
        df.join(mapped, cond, "left")
          .drop(spec.sourceIds.map(f => s"$SourcePrefix${f.name}"): _*)
    }

  /** Reverse lookup: left-join `df` (carrying the DESTINATION id
    * columns) against the mapping table, adding `source_*` columns
    * (null where unmapped) — the set-wise form of
    * `getSourceIdsFromDestIds` (`DataMigrationMapper.php:477-519`),
    * used when auditing destination rows back to their origin.
    */
  def lookupSource(df: DataFrame, spec: MigrationSpec): DataFrame =
    load(df.sparkSession, spec) match {
      case None => spec.sourceIds.foldLeft(df)((acc, f) =>
        acc.withColumn(s"$SourcePrefix${f.name}", lit(null).cast(f.idType.sparkType)))
      case Some(m) =>
        val mapped = m.select(
          spec.destinationIds.map(f => col(s"$DestPrefix${f.name}")) ++
            spec.sourceIds.map(f => col(s"$SourcePrefix${f.name}")): _*)
        val cond = spec.destinationIds
          .map(f => df(f.name) <=> mapped(s"$DestPrefix${f.name}"))
          .reduce(_ && _)
        df.join(mapped, cond, "left")
          .drop(spec.destinationIds.map(f => s"$DestPrefix${f.name}"): _*)
    }

  /** Insert-or-update a batch of mappings in one merge: rows in `incoming`
    * replace existing rows with the same source-id tuple (null-safely),
    * everything else is preserved; `updated` is stamped and `status` set —
    * set-wise parity with `addMapping` (`DataMigrationMapper.php:90-135`).
    * `incoming` must carry `source_*` and `dest_*` columns.
    */
  def record(spark: SparkSession, spec: MigrationSpec, incoming: DataFrame, status: String): Unit =
    // serialize read-merge-write per mapping table: `extends` siblings
    // share the parent's table and may run concurrently under
    // executeAll(parallelism > 1)
    MappingStore.lockFor(tablePath(spec)).synchronized {
      val stamped = incoming
        .withColumn(UpdatedCol, current_timestamp())
        .withColumn(StatusCol, lit(status))
      val merged = load(spark, spec) match {
        case None => stamped
        case Some(existing) =>
          val keys: Seq[Column] = spec.sourceIds.map(f =>
            existing(s"$SourcePrefix${f.name}") <=> stamped(s"$SourcePrefix${f.name}"))
          val keep = existing.join(stamped, keys.reduce(_ && _), "left_anti")
          keep.unionByName(stamped)
      }
      writeGen(spark, spec, merged)
    }

  /** Orphan-keep bookkeeping: mapping rows whose source ids are all NULL
    * (`DataMigrationExecutor.php:320-326`). */
  def recordOrphansKept(spark: SparkSession, spec: MigrationSpec, destIds: DataFrame): Unit = {
    val incoming = spec.sourceIds.foldLeft(destIds)((acc, f) =>
      acc.withColumn(s"$SourcePrefix${f.name}", lit(null).cast(f.idType.sparkType)))
    record(spark, spec, incoming, StatusMigrated)
  }

  private def writeGen(spark: SparkSession, spec: MigrationSpec, df: DataFrame): Unit = {
    val cur = new org.apache.hadoop.fs.Path(tablePath(spec), "_CURRENT")
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next =
      if (!fs.exists(cur)) "gen0"
      else {
        val in = fs.open(cur)
        val g = try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
        finally in.close()
        s"gen${g.stripPrefix("gen").toLong + 1}"
      }
    df.write.mode(SaveMode.Overwrite).parquet(s"${tablePath(spec)}/$next")
    val out = fs.create(cur, true)
    try out.write(next.getBytes("UTF-8")) finally out.close()
    keepGenerations.foreach(k =>
      GenerationVacuum.vacuum(fs, new org.apache.hadoop.fs.Path(tablePath(spec)), k))
  }
}

/** Shared generation-directory vacuum for generation-pointer stores. */
private[graft] object GenerationVacuum {
  def vacuum(fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path, keep: Int): Unit = {
    require(keep >= 1, "must keep at least the current generation")
    val gens = fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen"))
      .map(s => (s.getPath.getName.stripPrefix("gen").toLong, s.getPath))
      .sortBy(_._1)
    gens.dropRight(keep).foreach { case (_, p) => fs.delete(p, true) }
  }
}

object MappingStore {
  private val locks = scala.collection.concurrent.TrieMap.empty[String, Object]
  private def lockFor(path: String): Object = locks.getOrElseUpdate(path, new Object)

  val SourcePrefix = "source_"
  val DestPrefix = "dest_"
  val UpdatedCol = "updated"
  val StatusCol = "status"
  val StatusMigrated = "migrated" // DataMigrationMapper.php:28-30
  val StatusStub = "stub"
}
