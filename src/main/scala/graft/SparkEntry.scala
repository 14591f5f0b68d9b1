package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.pipeline.ExtractPipeline
import graft.sources.PagesSynth
import graft.queries.{AdvancedOps, ClusterOps, CurationOps, LmOps, NlpOps, Relational, TextOps, VectorOps, PagesOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full tokenize → node-array → boilerplate-strip → extract
    * pipeline over a deterministically synthesized Common-Crawl-style pages
    * table (BASELINE.json:15 schema). Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    ExtractPipeline.extractDF(PagesSynth.pagesDF(spark, 300L), numParts = 8)

  /** One entry per implemented operator from SURVEY.md §2:
    * relational (q01–q14), text/training-data (q15–q23), vector similarity
    * (q24–q27), extraction pipeline (q30–q33, rows-only).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextOps.queries ++ VectorOps.queries ++
      PagesOps.queries ++ AdvancedOps.queries ++ ClusterOps.queries ++
      LmOps.queries ++ CurationOps.queries ++ NlpOps.queries

  /** DuckDB-equivalent ANSI SQL per query (same column names/values); the
    * extraction queries are intentionally absent — not SQL-expressible.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextOps.oracles ++ VectorOps.oracles ++
      PagesOps.oracles ++ AdvancedOps.oracles ++ ClusterOps.oracles ++
      LmOps.oracles ++ CurationOps.oracles ++ NlpOps.oracles
}
