package graft

import graft.functions.GraftFunctions
import graft.queries.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing library entry point for the query tiers.
  *
  * [[SparkEntry]] is the DRIVER contract (a flat name→function gate
  * registry); this facade is how a library user reaches the same 260+
  * verified capabilities from their own session in one call:
  *
  * {{{
  * val engine = graft.Engine(spark, "/data/tables")   // views + functions
  * engine.run("q_rfm")                                 // registry lookup
  * engine.sql("SELECT graft_lang_id(text) FROM documents")
  * }}}
  *
  * Construction attaches everything a session needs:
  *   - every table under `dataDir` as a temp view ([[Tables.registerViews]]),
  *   - the engine's SQL functions ([[GraftFunctions.register]]: native
  *     `cosine_sim`/`jaro_winkler`/`within_edit1`/… expressions),
  *   - the `TopKPerKey` planner strategy (so grouped-ranking queries plan
  *     the engine's two-phase heap operator, not a window sort).
  *
  * Cluster-wide deployments can instead set
  * `spark.sql.extensions=graft.functions.GraftExtensions` and call
  * [[Engine.attach]]-free `Engine(spark, dir, attach = false)` — the
  * facade never requires its own session, and attaching twice is
  * idempotent (view/function registration is createOrReplace; the
  * strategy injection checks reference identity).
  */
final class Engine private (val spark: SparkSession, val dataDir: String) {

  /** Every registered query, stable-sorted by name. */
  def names: Seq[String] = Engine.defs.keys.toSeq.sorted

  /** Run a registry query by name against this engine's `dataDir`. */
  def run(name: String): DataFrame = {
    val d = Engine.defs.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown query '$name' — ${Engine.defs.size} registered; nearest: " +
          names.filter(_.contains(name.take(math.max(3, name.length / 2)))).take(5).mkString(", ")))
    d.fn(spark, dataDir)
  }

  /** The query's reference SQL (DuckDB dialect over the same tables),
    * when SQL-expressible — the executable documentation of its
    * semantics.
    */
  def referenceSql(name: String): Option[String] =
    Engine.defs.get(name).flatMap(_.oracle)

  /** SQL over the registered views with the engine functions available. */
  def sql(query: String): DataFrame = spark.sql(query)

  /** Run a migration DAG through the ETL core — the facade's composition
    * point between the engine's two halves (the query/curation operators
    * and the reference-shaped migration executor). Resolves dependency
    * order, registers every destination with the reference store (so any
    * stage can `ctx.references`-lookup a sibling), and executes through
    * [[graft.exec.MigrationExecutor.executeAll]] with real mapping
    * tables under `mappingDir`. Returns the per-migration results plus
    * the run's executor so the caller can `release()` its pinned caches
    * once the results are consumed (the nightly-loop discipline).
    */
  def migrate(
      migrations: Seq[graft.exec.Migration],
      sources: graft.exec.Migration => graft.drivers.SourceDriver,
      dests: graft.exec.Migration => graft.drivers.DestinationDriver,
      mappingDir: String,
      orphanPolicy: graft.exec.OrphanPolicy = graft.exec.KeepOrphans,
      parallelism: Int = 1): Engine.MigrateRun = {
    val mapper = new graft.mapper.MappingStore(mappingDir)
    val refs = new graft.exec.ReferenceStore(mapper)
    val executor = new graft.exec.MigrationExecutor(mapper, refs, orphanPolicy)
    val results = executor.executeAll(spark, migrations,
      sources,
      m => { val d = dests(m); refs.register(m.spec, d); d },
      parallelism)
    Engine.MigrateRun(results, executor, mapper, refs)
  }
}

object Engine {

  /** One [[Engine.migrate]] run: per-migration results plus the owning
    * executor/mapper/reference store for post-consumption release.
    */
  final case class MigrateRun(
      results: Map[String, graft.exec.MigrationResult],
      executor: graft.exec.MigrationExecutor,
      mapper: graft.mapper.MappingStore,
      references: graft.exec.ReferenceStore)

  private[graft] lazy val defs: Map[String, QueryDef] =
    SparkEntry.allDefs.map(d => d.name -> d).toMap

  /** Build a facade: register views for `dataDir` and (by default)
    * attach the engine functions + planner strategy to the session.
    */
  def apply(spark: SparkSession, dataDir: String, attach: Boolean = true): Engine = {
    if (attach) this.attach(spark)
    Tables.registerViews(spark, dataDir)
    new Engine(spark, dataDir)
  }

  /** Attach engine functions and the TopKPerKey planner strategy to a
    * live session (idempotent). For builder-time wiring use
    * `spark.sql.extensions=graft.functions.GraftExtensions` instead.
    */
  def attach(spark: SparkSession): Unit = {
    GraftFunctions.register(spark)
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!classic.experimental.extraStrategies.exists(_ eq graft.plans.TopKPerKeyStrategy))
      classic.experimental.extraStrategies =
        classic.experimental.extraStrategies :+ graft.plans.TopKPerKeyStrategy
  }
}
