package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 (and the LLM-pipeline
  * extensions) surfaces here as a named query with, where SQL-expressible,
  * a DuckDB oracle. Query groups live in `graft.queries.*`.
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    Relational.defs ++ Etl.defs ++ TextQueries.defs ++ DedupQueries.defs ++
      SimilarityQueries.defs ++ EmbeddingQueries.defs ++ CurationQueries.defs ++
      EvalQueries.defs ++ GeoQueries.defs ++ InferenceQueries.defs ++
      StreamingQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap

  /** Headline subset timed by Bench (heavier, representative queries). */
  def benchNames: Seq[String] = allDefs.filter(_.bench).map(_.name)
}
