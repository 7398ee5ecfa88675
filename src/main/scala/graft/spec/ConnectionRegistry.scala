package graft.spec

import scala.collection.concurrent.TrieMap

/** A `%param%` placeholder referenced a parameter that was never set —
  * parity with the reference's container `ParameterNotFoundException`
  * surfaced through `ParameterBag::resolveValue`
  * (`/root/reference/src/DataMigration/DataMigrationManager.php:181`).
  */
class UnknownParameterException(val parameter: String)
  extends RuntimeException(s"""You have requested a non-existent parameter "$parameter".""")

/** Named source/destination connection registry with `%param%`
  * placeholder substitution — the engine-side form of the reference's
  * `a2b.sources` / `a2b.destinations` config blocks
  * (`/root/reference/src/DependencyInjection/Configuration.php:31-54`,
  * user doc `doc/usage/configuration.rst` "Sources and Destinations")
  * resolved per-migration in
  * `/root/reference/src/DataMigration/DataMigrationManager.php:155-183`.
  *
  * Resolution order matches the reference exactly:
  *   1. if the migration's `source`/`destination` value equals a
  *      registered connection *name*, substitute that connection's URI
  *      **and driver** (`:178-181` — the key map supplies both);
  *   2. then resolve `%param%` placeholders in the resulting value
  *      (`:182` — `parameterBag->resolveValue`), recursively, with `%%`
  *      escaping a literal percent (Symfony parameter-bag semantics).
  *
  * First registration of a name wins (`addSource`/`addDestination`'s
  * `if (!isset(...))` guard, `DataMigrationManager.php:88-110`).
  *
  * Everything here is driver-side metadata resolution — no Spark jobs,
  * no executor involvement — so a plain process-wide registry is the
  * right scale shape even on a 1000-executor cluster.
  */
object ConnectionRegistry {

  /** One named connection: `name`/`uri`/`driver`, the exact config shape
    * of `Configuration.php:35-40`. An empty driver leaves the spec's own
    * driver (or URI-scheme resolution) in charge.
    */
  final case class Connection(name: String, uri: String, driver: String = "")

  private val sources = TrieMap.empty[String, Connection]
  private val destinations = TrieMap.empty[String, Connection]
  private val parameters = TrieMap.empty[String, String]

  /** Register a named source connection; first registration wins. */
  def addSource(name: String, uri: String, driver: String = ""): Unit =
    sources.putIfAbsent(name, Connection(name, uri, driver))

  /** Register a named destination connection; first registration wins. */
  def addDestination(name: String, uri: String, driver: String = ""): Unit =
    destinations.putIfAbsent(name, Connection(name, uri, driver))

  /** Set a `%name%`-substitutable parameter (container parameter bag). */
  def setParameter(name: String, value: String): Unit =
    parameters.put(name, value)

  /** Test/benchmark hook: drop all registrations. */
  def clear(): Unit = { sources.clear(); destinations.clear(); parameters.clear() }

  private val Placeholder = "%([^%\\s]+)%".r
  private val MaxDepth = 16

  /** Resolve `%param%` placeholders in `value`. `%%` escapes a literal
    * `%`; parameter values may themselves contain placeholders (resolved
    * recursively, cycle-capped); an unset parameter throws
    * [[UnknownParameterException]].
    */
  def resolveValue(value: String): String = resolveValue(value, MaxDepth)

  private def resolveValue(value: String, depth: Int): String = {
    if (depth <= 0)
      throw new IllegalStateException(
        s"""Circular parameter reference while resolving "$value".""")
    // split on the %% escape first so escaped percents never pair with
    // placeholder delimiters, then rejoin with a literal %
    value.split("%%", -1).map { segment =>
      Placeholder.replaceAllIn(segment, m => {
        val name = m.group(1)
        val v = parameters.getOrElse(name, throw new UnknownParameterException(name))
        scala.util.matching.Regex.quoteReplacement(resolveValue(v, depth - 1))
      })
    }.mkString("%")
  }

  private def resolveOne(
      value: String, driver: String,
      registry: TrieMap[String, Connection]): (String, String) =
    registry.get(value) match {
      case Some(c) =>
        (resolveValue(c.uri), if (c.driver.nonEmpty) c.driver else driver)
      case None => (resolveValue(value), driver)
    }

  /** Resolve a spec's `source`/`destination` through the name maps and
    * parameter bag — the per-migration half of
    * `DataMigrationManager::resolveDefinitionProperty` (`:155-183`).
    * Idempotent for specs that use neither names nor placeholders.
    */
  def resolveSpec(spec: MigrationSpec): MigrationSpec = {
    val (srcUri, srcDrv) = resolveOne(spec.source, spec.sourceDriver, sources)
    val (dstUri, dstDrv) = resolveOne(spec.destination, spec.destinationDriver, destinations)
    if (srcUri == spec.source && srcDrv == spec.sourceDriver &&
        dstUri == spec.destination && dstDrv == spec.destinationDriver) spec
    else spec.copy(source = srcUri, sourceDriver = srcDrv,
      destination = dstUri, destinationDriver = dstDrv)
  }
}
