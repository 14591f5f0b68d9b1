package graft.sources

import org.apache.spark.sql.DataFrame

/** Storage-bucketed co-located joins — the "pre-partitioning/bucketing" leg
  * of SURVEY.md §2.k that the round-1..3 code only exercised at runtime via
  * `repartition`: write both sides bucketed AND sorted by the join key into
  * the session catalog, and every later equi-join or aggregate on that key
  * plans with ZERO Exchange — the shuffle is paid once at write time and
  * amortized over each subsequent use. Spark's file scan advertises the
  * bucket spec as its output partitioning, so SortMergeJoin (and
  * HashAggregate) consume both sides in place; BucketingSpec pins the
  * no-Exchange plans and value-equality against the shuffled formulation.
  *
  * This is the batch-pipeline pattern for a repeatedly-joined 100 TB
  * table (pages and node tables bucketed by url-hash, documents by
  * doc_id): the N-executor cluster reads bucket i of both tables on the
  * same task with no network movement. In production on Iceberg the same
  * property comes from the `bucket(N, col)` partition transform plus
  * storage-partitioned joins; this session-catalog parquet form is the
  * in-sandbox equivalent (docs/ICEBERG.md).
  *
  * Constraints worth knowing at scale: both sides must agree on bucket
  * COUNT (or be integer multiples with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`), the key must be
  * the join key exactly, and bucket pruning applies to point filters on
  * the bucket column.
  */
object BucketedTables {

  /** Write `df` as a bucketed+sorted parquet table in the session catalog.
    * Overwrites any existing table of the same name.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
