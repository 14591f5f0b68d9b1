package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.pipeline.ExtractPipeline
import graft.sources.PagesSynth
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the full tokenize → node-array → boilerplate-strip → extract
    * pipeline over a deterministically synthesized Common-Crawl-style pages
    * table (BASELINE.json:15 schema). Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    ExtractPipeline.extractDF(PagesSynth.pagesDF(spark, 300L), numParts = 8)
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map()
}
