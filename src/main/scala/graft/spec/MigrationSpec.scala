package graft.spec

import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Key-column type universe.
  *
  * The reference restricts id columns to int|string
  * (`/root/reference/src/Annotations/IdField.php:26-47`). We widen int to
  * Spark `LongType` for 100 TB-scale key spaces.
  */
sealed trait IdType { def sparkType: DataType }
case object LongId extends IdType { val sparkType: DataType = LongType }
case object StringId extends IdType { val sparkType: DataType = StringType }

/** One declared id column (`/root/reference/src/Annotations/IdField.php`). */
final case class IdField(name: String, idType: IdType = LongId)

/** Declarative migration definition — the engine's whole "logical plan"
  * format, mirroring the reference's `@DataMigration` annotation
  * (`/root/reference/src/Annotations/DataMigration.php:15-113`):
  * source/destination URIs + driver keys, key columns, group, DAG edges,
  * flush mode and `extends` second-pass linkage.
  */
final case class MigrationSpec(
    name: String,
    source: String,
    /** Driver key/FQCN; empty ⇒ resolved from the `source` URI scheme
      * (reference parity: migrations may omit the driver and declare
      * `csv://…`/`sqlite://…` URIs — `DriverManager` resolution model).
      */
    sourceDriver: String = "",
    destination: String,
    /** Empty ⇒ resolved from the `destination` URI scheme. */
    destinationDriver: String = "",
    sourceIds: Seq[IdField],
    destinationIds: Seq[IdField],
    group: String = "default",
    depends: Seq[String] = Nil,
    flush: Boolean = false,
    extendsMigration: Option[String] = None) {
  require(name.nonEmpty, "migration name must be non-empty")
  require(sourceIds.nonEmpty, "at least one source id field required")
  require(destinationIds.nonEmpty, "at least one destination id field required")

  /** Mapping-table key: extensions share the parent's mapping table
    * (`/root/reference/src/DataMigration/DataMigrationExecutor.php:172-175`).
    */
  def mappingKey: String = extendsMigration.getOrElse(name)
}

class CircularDependencyException(msg: String) extends RuntimeException(msg)
class MissingMigrationException(msg: String) extends RuntimeException(msg)
class ExtendsMismatchException(msg: String) extends RuntimeException(msg)
class EmptySourceException(msg: String) extends RuntimeException(msg)
/** A destination write's schema is incompatible with the published
  * generation's (a shared column changed to a non-widening type) — the
  * destination-side analog of the mapping store's conform error
  * (`DataMigrationMapper.php:189-257` ↔ `MappingStore.conform`).
  */
class SchemaEvolutionException(msg: String) extends RuntimeException(msg)
/** An optimistic (compare-and-swap) publish lost its race: the
  * destination's published generation moved past the base this writer
  * staged against. The staged candidate has been aborted; the loser must
  * RE-READ the (now newer) snapshot, re-merge, and retry — publishing
  * anyway would silently drop every row the winner committed (the
  * lost-update anomaly this exception exists to prevent).
  */
class ConcurrentPublishException(msg: String) extends RuntimeException(msg)
class NonUniqueKeyException(msg: String) extends RuntimeException(msg)
class NoMappingForIdsException(msg: String) extends RuntimeException(msg)

/** No registered driver claims the URI's scheme — parity with
  * `/root/reference/src/Exception/NoDriverForSchemeException.php:1`. */
class NoDriverForSchemeException(val scheme: String)
  extends RuntimeException(s"""No driver was found for the scheme "$scheme".""")

/** More than one driver claims the scheme — parity with
  * `/root/reference/src/Exception/UnclearDriverException.php:1`. */
class UnclearDriverException(val scheme: String, val driverNames: Seq[String])
  extends RuntimeException(
    s"""More than one driver implements the scheme "$scheme": """ +
      driverNames.mkString(", ") + ". Specify the driver explicitly via " +
      "sourceDriver/destinationDriver in the MigrationSpec.")

/** Scheme resolution was requested but the URI has no scheme — parity
  * with `/root/reference/src/Exception/BadUriException.php:1`. */
class BadUriException(val uri: String)
  extends RuntimeException(s"""The URI "$uri" is not valid.""")
