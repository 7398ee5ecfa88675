package graft.drivers

import graft.spec.MigrationSpec
import org.apache.spark.sql.SparkSession

/** Multi-table atomic publish over generation-pointer sinks — the
  * cross-table transaction the single-table WAP flow (stage → audit →
  * publish) cannot express: a pipeline that derives table B from table
  * A must never let a reader see new-A with old-B.
  *
  * Two-phase commit with a write-ahead manifest, the classic redo-log
  * construction (what Iceberg/Delta do per-table with their commit
  * logs, lifted to a transaction across tables):
  *
  *   1. PREPARE — every participant stages its candidate generation
  *      (data fully written, pointer untouched), then one manifest
  *      listing (destination, generation) pairs is written to the
  *      transaction log via create-temp-then-rename. The RENAME is the
  *      commit point: no manifest ⇒ the transaction never happened
  *      (staged candidates are invisible and abortStaged GCs them);
  *      manifest present ⇒ the transaction is durable.
  *   2. COMPLETE — flip each participant's `_CURRENT` pointer (each
  *      flip is the sink's own atomic publish), then delete the
  *      manifest. Pointer flips are idempotent redo actions: a crash
  *      after any prefix of flips leaves the manifest in place, and
  *      [[recover]] simply replays every flip before deleting it.
  *
  * Readers of a SINGLE table always see a consistent snapshot (the
  * pointer flip is atomic). Cross-table readers get atomicity at the
  * recovery boundary: after a crash, the next `recover` (run at engine
  * startup, the reference's migration-registry moment) rolls the
  * transaction FORWARD — never half-abandoned. All metadata operations
  * are O(#participants) driver-side file moves; no data is rewritten.
  */
object TxnPublish {

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Phase 1: write the durable manifest for already-staged
    * generations. Returns the manifest file name (the transaction id).
    */
  def prepare(spark: SparkSession,
      parts: Seq[(ParquetDestinationDriver, MigrationSpec, String)],
      logDir: String): String = {
    require(parts.nonEmpty, "empty transaction")
    val dir = new org.apache.hadoop.fs.Path(logDir)
    val f = fs(spark, dir)
    f.mkdirs(dir)
    val id = s"txn_${java.util.UUID.randomUUID().toString}"
    val tmp = new org.apache.hadoop.fs.Path(dir, s".$id.tmp")
    val wal = new org.apache.hadoop.fs.Path(dir, id)
    val body = parts.map { case (_, spec, gen) =>
      s"${UriSchemes.path(spec.destination)}\t$gen"
    }.mkString("\n")
    val out = f.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    require(f.rename(tmp, wal), s"manifest rename failed for $id")
    id
  }

  /** Phase 2: flip every participant pointer, then retire the
    * manifest. Safe to re-run after a partial crash (flips are
    * idempotent).
    */
  def complete(spark: SparkSession,
      parts: Seq[(ParquetDestinationDriver, MigrationSpec, String)],
      logDir: String, id: String): Unit = {
    parts.foreach { case (d, spec, gen) => d.publish(spark, spec, gen) }
    // The manifest MUST die with the transaction: a manifest that
    // outlives its completed flips is a live redo record, and a later
    // recover() replaying it would re-flip pointers across whatever has
    // been published since. The epoch guard in recover() defuses that
    // replay, but a failed delete is still a broken invariant — fail
    // loudly instead of leaving a zombie redo record on disk.
    val wal = new org.apache.hadoop.fs.Path(logDir, id)
    if (!f(spark, logDir).delete(wal, false))
      throw new java.io.IOException(
        s"txn $id: completed all pointer flips but could not retire the manifest $wal — " +
          "remove it manually before the next recover()")
  }

  /** prepare + complete: the no-crash path. */
  def commit(spark: SparkSession,
      parts: Seq[(ParquetDestinationDriver, MigrationSpec, String)],
      logDir: String): Unit =
    complete(spark, parts, logDir, prepare(spark, parts, logDir))

  /** Redo pass: roll FORWARD every durable (manifest-present)
    * transaction whose pointer flips did not all land — matched
    * against the engine's known participants by destination path —
    * then retire the manifests. Returns the number of transactions
    * completed. Unknown destinations in a manifest fail loudly: a
    * recovery that silently skips a participant would un-atomize the
    * transaction it exists to finish.
    *
    * Two guards keep the redo a REDO and never a rollback:
    *   - epoch guard — generation numbers are monotonic (write/stage
    *     derive them from the directory listing), so a participant whose
    *     published generation is already >= the manifest's target has
    *     either been flipped by this transaction or superseded by a
    *     later publish; replaying the flip would move the pointer
    *     BACKWARD past committed data. Such flips are skipped — which
    *     also makes a zombie manifest (complete() crashed after all
    *     flips but before the delete) harmless;
    *   - staging guard — a flip whose target generation directory no
    *     longer exists (aborted/vacuumed candidate) would leave the
    *     pointer dangling and every subsequent snapshot() read failing
    *     on a missing path. That state is unrecoverable-by-redo and
    *     fails with a descriptive error instead of publishing it.
    */
  def recover(spark: SparkSession, logDir: String,
      participants: Seq[(ParquetDestinationDriver, MigrationSpec)]): Int = {
    val dir = new org.apache.hadoop.fs.Path(logDir)
    val f = fs(spark, dir)
    if (!f.exists(dir)) return 0
    val byBase = participants
      .map(p => UriSchemes.path(p._2.destination) -> p).toMap
    val wals = f.listStatus(dir).toSeq
      .filter(_.getPath.getName.startsWith("txn_"))
    wals.foreach { st =>
      val in = f.open(st.getPath)
      val body =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        finally in.close()
      body.split("\n").filter(_.nonEmpty).foreach { line =>
        val Array(base, gen) = line.split("\t")
        val (d, spec) = byBase.getOrElse(base, throw new IllegalStateException(
          s"txn recovery: no registered participant for $base"))
        val target = gen.stripPrefix("gen").toLong
        val alreadyAtOrPast = d.currentGeneration(spark, spec).exists(_ >= target)
        if (!alreadyAtOrPast) {
          val genDir = new org.apache.hadoop.fs.Path(base, gen)
          if (!fs(spark, genDir).exists(genDir))
            throw new IllegalStateException(
              s"txn recovery (${st.getPath.getName}): staged generation $gen for $base " +
                "is missing (aborted or vacuumed) — publishing it would leave the pointer " +
                "dangling; resolve the manifest manually")
          d.publish(spark, spec, gen)
        }
      }
      if (!f.delete(st.getPath, false))
        throw new java.io.IOException(
          s"txn recovery: could not retire manifest ${st.getPath} after replaying it")
    }
    wals.size
  }

  private def f(spark: SparkSession, logDir: String) =
    fs(spark, new org.apache.hadoop.fs.Path(logDir))
}
