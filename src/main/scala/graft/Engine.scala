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
}

object Engine {

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
