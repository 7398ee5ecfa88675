package graft.drivers

import graft.spec.{EmptySourceException, MigrationSpec}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A source yields a bounded row stream as a DataFrame — the Spark-native
  * equivalent of the reference's iterable+countable
  * `SourceDriverInterface` (`/root/reference/src/Drivers/SourceDriverInterface.php:18-37`).
  *
  * Unlike the reference (one row at a time through a generator), a source
  * here returns a *lazy declarative scan*: Catalyst pushes filters and
  * column pruning into it, and `count` is a distributed aggregate rather
  * than an up-front materialization.
  */
trait SourceDriver {
  def read(spark: SparkSession, spec: MigrationSpec): DataFrame
  def count(spark: SparkSession, spec: MigrationSpec): Long =
    read(spark, spec).count()
}

/** Parquet scan — the engine's native columnar format (not in the
  * reference; required for the test corpus and the 100 TB design point).
  */
final class ParquetSourceDriver extends SourceDriver {
  def read(spark: SparkSession, spec: MigrationSpec): DataFrame =
    spark.read.parquet(UriSchemes.path(spec.source))
}

/** CSV scan: first row = header, error on empty/header-only file —
  * parity with `/root/reference/src/Drivers/Source/CsvSourceDriver.php:39-72`
  * (empty check `:51-54`, header `:55`).
  *
  * @param schema optional declared schema; the reference yields all-string
  *               rows (league/csv), which is the default here too.
  */
final class CsvSourceDriver(schema: Option[StructType] = None) extends SourceDriver {
  def read(spark: SparkSession, spec: MigrationSpec): DataFrame = {
    val base = spark.read.option("header", "true")
    val df = schema.fold(base)(s => base.schema(s)).csv(UriSchemes.path(spec.source))
    // ≤ header-only ⇒ BadUriException in the reference (:51-54). head(1)
    // scans a single partition split — cheap even on huge inputs.
    if (df.head(1).isEmpty)
      throw new EmptySourceException(s"CSV source has no data rows: ${spec.source}")
    df
  }
}

/** Arbitrary-SQL scan over a JDBC database — parity with the reference's
  * DBAL source, which executes a user-supplied SQL statement as the row
  * stream (`/root/reference/src/Drivers/Source/DbalSourceDriver.php:67-139`).
  * The whole SQL text is pushed down to the database
  * (`option("query", …)`), so joins/aggregates in the statement run
  * remotely, exactly as in the reference. The separate user-supplied COUNT
  * statement (`setCountStatement`) becomes a pushed-down count query.
  */
final class JdbcSourceDriver(
    statement: String,
    countStatement: Option[String] = None,
    properties: Map[String, String] = Map.empty)
    extends SourceDriver {
  // Embedded URLs (in-process Derby) are reachable from exactly one
  // JVM — the driver's — so their statements execute driver-side (see
  // [[DriverLocalJdbc]]); network databases keep the executor-side scan.
  private def frame(spark: SparkSession, url: String, sql: String): DataFrame =
    if (DriverLocalJdbc.isEmbedded(url))
      DriverLocalJdbc.read(spark, url, sql, properties.get("driver"))
    else {
      val r = spark.read.format("jdbc").option("url", url).option("query", sql)
      properties.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
    }

  def read(spark: SparkSession, spec: MigrationSpec): DataFrame = {
    require(statement.nonEmpty,
      s"JDBC source for ${spec.source} has no SQL statement — a scheme-resolved " +
        "JDBC source must be configured via Migration.configureSource returning " +
        "new JdbcSourceDriver(sql) (reference parity: DbalSourceDriver::setStatement)")
    frame(spark, UriSchemes.jdbcUrl(spec.source), statement)
  }

  override def count(spark: SparkSession, spec: MigrationSpec): Long =
    countStatement match {
      case Some(sql) =>
        frame(spark, UriSchemes.jdbcUrl(spec.source), sql)
          .head().get(0).asInstanceOf[Number].longValue()
      case None => read(spark, spec).count()
    }
}

/** Arbitrary Spark-SQL statement over registered tables/views — the same
  * "user supplies the SQL, engine streams the result" contract as the DBAL
  * source, executed by Catalyst instead of a remote database. This is the
  * idiomatic in-engine equivalent when data is already in the lake.
  */
final class SqlSourceDriver(statement: String) extends SourceDriver {
  def read(spark: SparkSession, spec: MigrationSpec): DataFrame =
    spark.sql(statement)
}

/** ORC scan — engine-native columnar breadth (ORC support ships inside
  * spark-sql; no extra jars). Same lazy declarative-scan contract as the
  * parquet source: filters and column pruning push into the reader.
  */
final class OrcSourceDriver extends SourceDriver {
  def read(spark: SparkSession, spec: MigrationSpec): DataFrame =
    spark.read.orc(UriSchemes.path(spec.source))
}

/** JSON-lines scan (file or directory, recursive) — engine-native breadth
  * beyond the reference's format set; nested objects surface as
  * struct/array columns like the YAML source.
  *
  * @param schema optional declared schema (preferred at scale — skips the
  *               inference pass and pins types across drifting files)
  */
final class JsonSourceDriver(schema: Option[StructType] = None) extends SourceDriver {
  def read(spark: SparkSession, spec: MigrationSpec): DataFrame = {
    val base = spark.read.option("recursiveFileLookup", "true")
    schema.fold(base)(s => base.schema(s)).json(UriSchemes.path(spec.source))
  }
}
