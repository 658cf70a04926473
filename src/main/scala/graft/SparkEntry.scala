package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers a [[QueryDef]]
  * in one of the `graft.queries.*` catalogs; this object aggregates them
  * for the driver's smoke / correctness / bench harnesses.
  */
object SparkEntry {

  def registry: Seq[QueryDef] =
    CoreQueries.qs ++ DecomposeQueries.qs ++ PipelineQueries.qs ++
      MiningQueries.qs ++ SketchQueries.qs ++ AnalyticsQueries.qs ++
      TimeSeriesQueries.qs ++ StatsQueries.qs ++ EnvProbes.qs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The flagship is the composed training-data prep pipeline — the
    * library end to end in one plan (quality/lang gate → PII redact →
    * exact + near-dup dedup → chunking).
    */
  def entry(spark: SparkSession): DataFrame =
    registry.find(_.name == "pipeline_e2e_prep")
      .getOrElse(registry.head).fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
