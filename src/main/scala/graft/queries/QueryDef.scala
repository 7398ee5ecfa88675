package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus an equivalent
  * DuckDB SQL oracle over the same parquet tables. Every registered
  * query carries a full oracle — operators whose raw output is not
  * SQL-expressible (sketches, LSH, ANN) are gated through in-query
  * error/recall bounds whose PASS/FAIL result IS SQL-replayable, so
  * the registry has had zero rows-only entries since round 10.
  *
  * Numeric discipline for oracle parity: money/double aggregations are
  * computed in integer cents (`CAST(ROUND(x*100) AS BIGINT)`) so sums are
  * exact and order-independent in both engines; averages are one final
  * double division of identical integers (bit-exact cross-engine); every
  * query has a deterministic total ORDER BY.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object Tables {
  val all = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(path(sfDir, name))
    if (name == "events") normalizeTs(df) else df
  }

  /** Normalize `events.ts` to TimestampType across the three parquet
    * encodings the driver has shipped over time:
    *   - TIMESTAMP(NANOS), which Spark only reads as long under
    *     `spark.sql.legacy.parquet.nanosAsLong` — converted at µs
    *     precision (integer division, no fp loss);
    *   - `timestamp[us]` with no isAdjustedToUTC flag, which Spark 4
    *     reads as TIMESTAMP_NTZ — a value-preserving relabel under the
    *     pinned UTC session timezone (DuckDB reads the same file as a
    *     naive timestamp, so oracle parity holds by construction);
    *   - plain TIMESTAMP — already right.
    * Works on batch and streaming DataFrames alike.
    */
  def normalizeTs(df: DataFrame, c: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(c).dataType match {
      case LongType         => df.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
      case TimestampNTZType => df.withColumn(c, col(c).cast(TimestampType))
      case _                => df
    }
  }

  /** Register every test table as a temp view (idempotent) so SQL-driver
    * queries can reference them by name, mirroring how the DuckDB oracle
    * sees them.
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Fresh scratch dir for ETL queries that exercise real sinks. */
  def scratch(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Stable scratch dir reused across sessions — for ingest-time storage
    * layouts (bucketed/partitioned copies) that are written once per
    * dataset, the way a real deployment lays out tables at ingest.
    */
  def stableScratch(name: String): String = {
    val d = new java.io.File(System.getProperty("java.io.tmpdir"), name)
    d.mkdirs()
    d.toString
  }

  /** Stage `df` as ONE parquet part file at `dir/fileName` with an
    * explicit modification time — the file-streaming-source staging
    * idiom (ascending mtimes are the source's replay order, one file
    * per micro-batch under maxFilesPerTrigger=1). An empty frame
    * writes no part file and stages nothing. One definition for the
    * five call sites that previously each hand-rolled the
    * write-find-move-stamp sequence (r19 self-review finding).
    */
  private[graft] def writeChunkFile(
      df: DataFrame, dir: java.nio.file.Path, fileName: String, mtime: Long,
      required: Boolean = false): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_chunk")
    val part = {
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      new java.io.File(tmp.toString).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    }
    // `required` distinguishes SENTINEL chunks (a missing file silently
    // starves a watermark and mis-attributes the failure to the query
    // under test — fail loudly at staging instead) from data chunks
    // (an empty range legitimately stages nothing)
    require(part.isDefined || !required,
      s"staging produced no part file for required chunk $fileName")
    part.foreach { p =>
      val dst = dir.resolve(fileName)
      java.nio.file.Files.move(p.toPath, dst)
      // ascending mtimes ARE the file source's replay order — a silent
      // false here (perms, FS quirks) scrambles ordering into a
      // confusing downstream watermark failure, so fail at the cause
      require(dst.toFile.setLastModified(mtime),
        s"setLastModified($mtime) failed for staged chunk $dst")
    }
    // drop the write debris (_SUCCESS, .crc, and any leftover
    // _temporary/ dir from an interrupted write) and the temp dir
    // itself — the inline copies this helper replaced leaked one dir
    // per chunk. Recursive + non-fatal: File.delete() fails on a
    // non-empty subdirectory, and a dirty temp dir must never mask the
    // real write failure with a DirectoryNotEmptyException.
    // Files.walk holds directory handles until closed — leaked fds
    // under repeated chunk staging (r20 advice), so close it in finally
    try {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(f => java.nio.file.Files.deleteIfExists(f): Unit)
      finally walk.close()
    } catch { case scala.util.control.NonFatal(_) => () }
  }
}
