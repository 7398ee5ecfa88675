package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (usually) an
  * equivalent DuckDB SQL oracle over the same parquet tables. Queries with
  * no SQL-expressible oracle (sketches, LSH, ANN) get a rows-only check.
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
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads as
    // long (spark.sql.legacy.parquet.nanosAsLong) — convert to a real
    // timestamp at µs precision (integer division, no fp loss).
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
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
}
