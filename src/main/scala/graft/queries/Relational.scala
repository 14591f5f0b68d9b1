package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the driver-checked query suite (SparkEntry.queries).
  *
  * Determinism rules (the driver hash-compares against DuckDB on the same
  * parquet — see Verify.scala):
  *  - every query ORDERs BY a unique key, so row order is pinned;
  *  - no raw DOUBLE ever reaches an output or an aggregate: money/metric
  *    doubles go through [[Q.cents]] (per-row round to integer cents, then
  *    exact integer SUM — order-independent, engine-independent);
  *  - column names are aliased identically in the Spark plan and the oracle
  *    SQL (driver sorts columns by name before hashing).
  */
object Q {
  /** Driver-side cache of input FILE LENGTHS (immutable metadata, the same
    * class of information Spark's own file-index cache holds — never query
    * results).
    */
  private val fileBytes =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Scan widening for HASH-HEAVY pre-shuffle pipelines only (optimization
    * guide §2.5 "input skew" / §6 split sizing): the harness fact tables
    * are single parquet files well under `maxPartitionBytes`, so a scan —
    * and all per-row work before the first Exchange — plans as ONE task
    * regardless of session parallelism. Where that pre-shuffle work is
    * multiple md5/shingle evaluations per row (MinHash signatures,
    * winnowing gram hashes), one deterministic round-robin repartition to
    * `defaultParallelism` recovers the lost cores; the condition is
    * scale-adaptive — at any real corpus size the natural split count
    * exceeds the core count and the plan is byte-identical to a plain
    * read, so this adds NO exchange at 100 TB.
    *
    * Deliberately OPT-IN per call site, not the default read path: an A/B
    * over the full suite showed the extra blocking AQE stage costs
    * 0.2–0.5 s per materialization and REGRESSES every query whose
    * pre-shuffle work is light or whose driver loop re-executes the scan
    * subtree per round (k-means, GD, PageRank: each action would re-pay
    * the exchange) — q141 1.6 s → 5.3 s, q92 0.75 s → 1.86 s under a
    * blanket version of this. Only the measured winners call it.
    * Results are unaffected: no query derives values from partitioning
    * (no rand()/monotonically_increasing_id/spark_partition_id anywhere
    * in the query surface) and the driver compare is order-insensitive.
    */
  def tblWide(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val df = spark.read.parquet(path)
    val bytes: Long = fileBytes.computeIfAbsent(path, p => {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(hp).getLength
    })
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val naturalSplits = math.max(1L, (bytes + maxSplit - 1) / maxSplit)
    val cores = spark.sparkContext.defaultParallelism
    // measurement surface: GRAFT_SCAN_WIDEN=0 restores the plain read
    val widen = sys.env.getOrElse("GRAFT_SCAN_WIDEN", "1") != "0"
    if (widen && naturalSplits < cores) df.repartition(cores) else df
  }

  /** Exact integer cents of a positive double column: round(x*100) per row
    * (IEEE-identical in Spark and DuckDB), summed as BIGINT.
    */
  def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c * 100).cast("long")
}

/** Relational operator coverage over the TPC-H-ish harness tables
  * (SURVEY.md §2.B c–h): aggregation, joins (broadcast/anti/semi), windows,
  * top-k, set ops, rollup, scalar/date/json functions. All Catalyst
  * built-ins — scans stay pruned/pushed-down, dims are broadcast, and the
  * plans survive a 100× scale-up because every shuffle is on the natural
  * group/join key.
  */
object Relational {
  import Q._

  /** TPC-H Q1-flavor pricing summary: partial (map-side) agg + final agg on
    * the two low-cardinality keys — at 100 TB this is the canonical
    * "shuffle only 4 groups" plan.
    */
  def q01PricingAgg(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(cents(col("l_quantity"))).as("sum_qty_c"),
        sum(cents(col("l_extendedprice"))).as("sum_base_c"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_c"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Filter + projection: both pushed into the parquet scan (PushedFilters /
    * ReadSchema show only 4 of 16 lineitem columns read).
    */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R" && col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("qty"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Revenue per nation: fact-fact shuffle join lineitem⋈orders on the join
    * key, then two explicitly broadcast dim joins (customer/nation are tiny
    * relative to any cluster). At 100 TB only the l⋈o shuffle remains.
    */
  def q03JoinRevenue(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .join(tbl(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(tbl(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(tbl(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_c"),
        count(lit(1)).as("cnt"))
      .orderBy(col("n_name"))

  /** Broadcast dim join + agg by part type. */
  def q04BroadcastParts(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .join(broadcast(tbl(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .filter(col("p_size") <= 10)
      .groupBy(col("p_type"))
      .agg(sum(cents(col("l_quantity"))).as("sum_qty_c"), count(lit(1)).as("cnt"))
      .orderBy(col("p_type"))

  /** Anti join: customers with no URGENT-priority order (the same shape as
    * the pipeline's resume anti-join, SURVEY.md §2.l).
    */
  def q05AntiJoin(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "customer")
      .join(tbl(s, dir, "orders").filter(col("o_orderpriority").startsWith("1")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Semi join: suppliers with at least one 1998 shipment. */
  def q06SemiJoin(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "supplier")
      .join(tbl(s, dir, "lineitem").filter(col("l_shipdate") >= lit("1998-01-01")),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))

  /** Latest event per user — window dedup (row_number over user_id), the
    * latest-capture-per-url pattern of SURVEY.md §2.B.e. One shuffle on the
    * partition key; no self-join.
    */
  def q07WindowLatest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    tbl(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"))
      .orderBy(col("user_id"))
  }

  /** Running aggregates per user (frame spec: unbounded preceding → current). */
  def q08WindowRunning(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tbl(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("running_cnt"),
        sum(cents(col("value"))).over(w).as("running_value_c"))
      .orderBy(col("event_id"))
  }

  /** Top-k: Catalyst rewrites orderBy+limit to TakeOrderedAndProject — no
    * global sort at scale.
    */
  def q09TopkOrders(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("totalprice_c"))
      .orderBy(col("totalprice_c").desc, col("o_orderkey"))
      .limit(10)

  /** Set op: early-window error-users with no purchase in the window (EXCEPT). */
  def q10ExceptUsers(s: SparkSession, dir: String): DataFrame = {
    val ev = tbl(s, dir, "events").filter(col("ts") < lit("2024-01-03"))
    ev.filter(col("event_type") === "error").select(col("user_id"))
      .except(ev.filter(col("event_type") === "purchase").select(col("user_id")))
      .orderBy(col("user_id"))
  }

  /** Rollup over (lang, source) — grouping-sets coverage. */
  def q11RollupDocs(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
      .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)

  /** CUBE over (lang, source) — the full grouping-sets lattice (rollup's
    * sibling; q11 covers the hierarchical prefix sets).
    */
  def q45CubeDocs(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
      .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)

  /** Distinct (dropDuplicates) — exact distinct on a composite key. */
  def q12DistinctPairs(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("lang"), col("source"))
      .distinct()
      .orderBy(col("lang"), col("source"))

  /** Scalar function coverage: date parts/format, string fns, conditional. */
  def q13ScalarFns(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mon"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        upper(col("o_orderstatus")).as("status_up"),
        substring(col("o_orderpriority"), 1, 1).cast("int").as("prio"),
        length(col("o_orderpriority")).as("prio_len"),
        concat(lit("o"), col("o_orderkey")).as("tag"))
      .orderBy(col("o_orderkey"))

  /** JSON extraction from the events props column. */
  def q14JsonExtract(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy(col("event_id"))

  /** Pivot: per-user event-type counts as columns (explicit value list so
    * the schema is static — an unlisted pivot scans twice to discover it).
    */
  def q40PivotEvents(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .count()
      .na.fill(0L)
      .orderBy(col("user_id"))

  /** Set op: shard-merge via unionByName + distinct (dedup across shards). */
  def q28UnionShards(s: SparkSession, dir: String): DataFrame = {
    val ev = tbl(s, dir, "events")
    val a = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_type"))
    val b = ev.filter(col("event_type") === "view")
      .select(col("event_type"), col("user_id")) // reordered: unionByName
    a.unionByName(b).distinct().orderBy(col("user_id"), col("event_type"))
  }

  /** Set op: INTERSECT — first-day users who both erred and purchased. */
  def q29IntersectUsers(s: SparkSession, dir: String): DataFrame = {
    val ev = tbl(s, dir, "events").filter(col("ts") < lit("2024-01-02"))
    ev.filter(col("event_type") === "error").select(col("user_id"))
      .intersect(ev.filter(col("event_type") === "purchase").select(col("user_id")))
      .orderBy(col("user_id"))
  }

  /** Exact + per-type distinct counts (the metrics-report shape; the
    * streaming/report variant uses approx_count_distinct, oracled here with
    * the exact form so both engines agree).
    */
  def q35DistinctCounts(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"),
        count(lit(1)).as("events"))
      .orderBy(col("event_type"))

  /** Tumbling time-window aggregation (the streaming metrics-rollup shape,
    * SURVEY.md §2.B.j, run in batch): Spark's `window()` function; the
    * window start is emitted as a formatted string so both engines hash the
    * same value (raw timestamps differ in tz-awareness across engines).
    */
  def q39TumblingWindow(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(cents(col("value"))).as("value_c"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"), col("cnt"), col("value_c"))
      .orderBy(col("hour"), col("event_type"))

  /** Gap-based sessionization (SURVEY.md §2.B.e composed-window shape; the
    * classic web-analytics operator): a session breaks after a >30 min gap
    * per user; session ids are a running sum of the break flags. Scale
    * shape: ONE exchange on user_id feeds the lag window, the running-sum
    * window AND the final (user_id, session_id) aggregate — Spark
    * recognizes hash(user_id) as satisfying the subset-clustered
    * distribution, so no further shuffles. Gap/duration math is
    * whole-second floors (`unix_timestamp`) — the exact semantics of the
    * oracle's `datediff('second', …)` boundary count.
    */
  def q47Sessionize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    tbl(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(unix_timestamp(col("ts"))) - min(unix_timestamp(col("ts"))))
          .as("dur_s"),
        sum(floor(col("value")).cast("long")).as("val_sum"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** q128: ORDERED FUNNEL analysis (view → click → purchase), the other
    * classic web-analytics operator next to q47's sessionization: per
    * user, the earliest view, the earliest click strictly AFTER that
    * view, and the earliest purchase strictly after that click — order
    * matters, so a purchase before any view does not count (the property
    * that distinguishes a funnel from three independent mins).
    *
    * Scale shape: ONE exchange on user_id feeds all three stacked
    * min-windows (each conditions on the previous stage's timestamp) and
    * the final per-user distinct — the q47/q122 shared-partition-key
    * discipline. Timestamps travel as exact epoch micros (unix_micros /
    * epoch_us), never engine-formatted strings.
    */
  def q128Funnel(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    tbl(s, dir, "events")
      // ts is TIMESTAMP_NTZ in the parquet; the session is pinned UTC, so
      // the cast interprets it exactly as DuckDB's epoch_us on naive ts
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("us") > col("t_view"),
          col("us"))).over(w))
      .withColumn("t_buy",
        min(when(col("event_type") === "purchase" && col("us") > col("t_click"),
          col("us"))).over(w))
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_buy"))
      .distinct()
      .withColumn("stage",
        when(col("t_buy").isNotNull, 3)
          .when(col("t_click").isNotNull, 2)
          .when(col("t_view").isNotNull, 1)
          .otherwise(0))
      .orderBy(col("user_id"))
  }

  /** q131: SCD-2 SNAPSHOT RECONSTRUCTION — turn an append-only event
    * history into validity intervals ([valid_from, valid_to), open tail =
    * NULL) with one lead window, then answer "state as of T" with a pure
    * interval filter. This is the recurring-crawl temporal query: the
    * extraction history of a url is exactly such a history, and "the
    * corpus as the crawler saw it on date T" is the as-of read a
    * reproducible training run needs (q69's delta table is the
    * two-snapshot special case).
    *
    * Scale shape: ONE entity-keyed Exchange feeds the lead window, the
    * version count, and the as-of filter; zero-length intervals (equal
    * timestamps, deterministically tie-broken by event_id) can never
    * match an as-of probe, identically in both engines.
    */
  def q131Scd2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val asOf = lit(1704153600000000L) // 2024-01-02T00:00:00Z in micros
    tbl(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        cents(col("value")).as("val_c"))
      .withColumn("valid_to", lead(col("us"), 1).over(w))
      .withColumn("n_versions", count(lit(1)).over(
        Window.partitionBy(col("user_id"))))
      .where(col("us") <= asOf &&
        (col("valid_to").isNull || col("valid_to") > asOf))
      .select(col("user_id"), col("n_versions"),
        col("event_id").as("asof_event"), col("us").as("valid_from"),
        col("valid_to"), col("val_c"))
      .orderBy(col("user_id"))
  }

  /** q132: SLIDING-WINDOW rates — events counted into 1-hour windows
    * sliding every 15 minutes (each event lands in exactly 4 overlapping
    * windows), the per-host fetch-rate / traffic-burst monitor shape that
    * tumbling windows (q39) cannot express. Spark's `window(ts, dur,
    * slide)` generates the window set inline (a Generate, not a join);
    * the oracle rebuilds the same epoch-aligned window starts with
    * integer floor arithmetic, so the two engines agree exactly.
    */
  def q132SlidingRate(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(cents(col("value"))).as("value_c"))
      .select(unix_micros(col("w.start").cast("timestamp")).as("w_start_us"),
        col("event_type"), col("cnt"), col("value_c"))
      .orderBy(col("w_start_us"), col("event_type"))

  /** URL decomposition at scale (host / path-depth / key extraction): urls
    * are synthesized deterministically from lineitem keys IN THE QUERY (the
    * harness tables carry no url column), identically in the oracle, then
    * parsed back with regexps — the operator under test is the parse, which
    * stays inside whole-stage codegen; one aggregate exchange on host.
    */
  def q48UrlParse(s: SparkSession, dir: String): DataFrame = {
    val url = concat(lit("https://sup"),
      (col("l_suppkey") % 50).cast("string"),
      lit(".example.com/order/"), col("l_orderkey").cast("string"),
      lit("/item/"), col("l_linenumber").cast("string"))
    tbl(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_linenumber"))
      .withColumn("url", url)
      .select(
        regexp_extract(col("url"), "^https://([^/]+)/", 1).as("host"),
        regexp_extract(col("url"), "^https://[^/]+/order/([0-9]+)", 1)
          .cast("long").as("ord"),
        (size(split(col("url"), "/")) - 3).cast("long").as("depth"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("hits"),
        countDistinct(col("ord")).as("orders"),
        max(col("depth")).as("max_depth"))
      .orderBy(col("host"))
  }

  /** q135: DOMAIN-SUFFIX blocklist — the other half of URL screening
    * (q119 scans url STRINGS for word fragments; category blocklists like
    * UT1 are published as DOMAIN lists applied over the registrable-domain
    * hierarchy): a host is blocked iff it equals a listed domain or ends
    * with "." + a listed domain. The label-boundary rule is the point —
    * `notspam.net` string-ends-with "spam.net" but is NOT blocked, so a
    * naive endswith is wrong and the fixture plants exactly that trap.
    *
    * Scale shape: each host explodes into its ≤ #labels suffix chain (a
    * stateless Generate, fan-out bounded by hostname depth), the suffixes
    * equi-join the BROADCAST blocklist (a million-entry list is a few MB —
    * always broadcast-able), one doc-keyed min-aggregate picks the
    * deterministic winning entry, and the corpus left-joins the small hit
    * set back. No shuffle ever carries more than (doc_id, suffix).
    */
  def q135DomainBlocklist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = element_at(
      array(lit("ads.example.com"), lit("cdn.spam.net"), lit("blog.io"),
        lit("tracker.io"), lit("notspam.net")),
      (col("doc_id") % 5 + 1).cast("int"))
    val hosts = tbl(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 3 === 0, base)
        .otherwise(concat(lit("w"), (col("doc_id") % 7).cast("string"),
          lit("."), base)).as("host"))
    val bl = Seq("ads.example.com", "spam.net", "tracker.io").toDF("entry")
    val parts = split(col("host"), "\\.")
    val sfx = hosts.select(col("doc_id"),
      explode(transform(sequence(lit(1), size(parts)),
        i => array_join(slice(parts, i, size(parts) - i + 1), "."))).as("sfx"))
    val hits = sfx.join(broadcast(bl), col("sfx") === col("entry"))
      .groupBy(col("doc_id")).agg(min(col("entry")).as("hit"))
    hosts.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("host"),
        col("hit").isNotNull.as("blocked"), col("hit"))
      .orderBy(col("doc_id"))
  }

  /** q136: TRACKING-PARAM detection — DATA-DRIVEN url canonicalization.
    * q68's RFC 3986 normalizer can only apply syntax rules; which query
    * parameters are content-irrelevant (utm_*, session ids) is an
    * empirical property of the crawl. Detection: for each parameter p,
    * group fetches by the serialization of every OTHER parameter (in
    * production: host+path+rest); p is a tracking param iff some group
    * saw ≥ 2 distinct values of p (evidence the crawler actually varied
    * it) and NO group saw the content hash change while only p varied
    * (counter-evidence it is load-bearing). The fixture wires page/ord
    * into the content hash and leaves sess/utm free, so the verdict row
    * set is exact and fully oracled.
    *
    * Scale shape: one stacked projection (4 unions, stateless), ONE
    * shuffle keyed (param, restkey) with map-combined distinct counts,
    * then a 4-row rollup. The content hash travels, never the content.
    */
  def q136TrackingParams(s: SparkSession, dir: String): DataFrame = {
    val rows = tbl(s, dir, "lineitem")
      .select((col("l_orderkey") * 4 + col("l_linenumber")).as("k"))
      .select(
        (col("k") % 5).cast("string").as("page"),
        (col("k") % 7).cast("string").as("sess"),
        (col("k") % 3).cast("string").as("utm"),
        (col("k") % 2).cast("string").as("ord"))
      .withColumn("content",
        md5(concat(lit("c"), col("page"), lit("|"), col("ord"))
          .cast("binary")))
    def arm(p: String, rest: Seq[String]) =
      rows.select(lit(p).as("param"), col(p).as("value"),
        concat_ws("|", rest.map(col): _*).as("restkey"), col("content"))
    val stacked = arm("page", Seq("sess", "utm", "ord"))
      .union(arm("sess", Seq("page", "utm", "ord")))
      .union(arm("utm", Seq("page", "sess", "ord")))
      .union(arm("ord", Seq("page", "sess", "utm")))
    stacked.groupBy(col("param"), col("restkey"))
      .agg(countDistinct(col("value")).as("nv"),
        countDistinct(col("content")).as("nc"))
      .groupBy(col("param"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("nv") >= 2, 1L).otherwise(0L)).as("multi_val_groups"),
        sum(when(col("nc") > 1, 1L).otherwise(0L)).as("inconsistent_groups"))
      .withColumn("tracking",
        col("inconsistent_groups") === 0 && col("multi_val_groups") > 0)
      .orderBy(col("param"))
  }

  /** q119: URL BLOCKLIST screening — the UT1-style word-fragment filter
    * (the URL-level quality gate FineWeb-class pipelines run before
    * fetching): urls synthesized from the documents table (path embeds
    * the text head, q48's discipline) are scanned by ONE Aho–Corasick
    * automaton walk per url ([[graft.functions.BlocklistHits]], codegen'd)
    * counting every overlapping/nested pattern occurrence — O(|url|) per
    * row regardless of blocklist size, where a contains() loop pays
    * O(|url|·patterns). The pattern set deliberately contains nested
    * ("can" in "scan", "win" in "window") and hyphen-spanning fragments
    * so the oracle (a position×pattern substring join in DuckDB — counts
    * the same overlapping occurrences) checks the automaton's suffix
    * links, not just plain containment. Scale shape: stateless projection,
    * automaton built once and shipped as a plan reference, zero shuffles
    * before the final order.
    */
  def q119UrlBlocklist(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(s)
    val url = concat(lit("https://h"), (col("doc_id") % 37).cast("string"),
      lit(".example.com/"),
      regexp_replace(substring(lower(col("text")), 1, 60), " ", "-"),
      lit("/"), col("doc_id").cast("string"))
    tbl(s, dir, "documents")
      .select(col("doc_id"), url.as("url"))
      .select(col("doc_id"),
        expr("blocklist_hits(url, array('scan','can','win','window'," +
          "'merge','a-a','spark','ar'))").as("hits"))
      .withColumn("kept", col("hits") === 0)
      .orderBy(col("doc_id"))
  }

  /** q59: robots.txt crawl-politeness filter — the url admission stage of
    * a crawler/extraction pipeline. Per-host robots.txt BODIES are
    * synthesized deterministically in the query and parsed by the
    * clean-room [[graft.core.RobotsTxt]] (RFC 9309 subset) into a rules
    * table; url admission is a longest-matching-prefix decision (Allow
    * wins length ties) packed as `len*2 + allowBit` so the argmax is one
    * HashAggregate-able MAX. The DuckDB oracle constructs the SAME rules
    * directly — group selection (exact-agent group suppresses the `*`
    * group) and every parse detail are therefore oracle-checked end to
    * end: a parser bug changes the rules, the decisions, and the hash.
    * Scale shape: rules are per-host tiny (broadcast); one aggregate on
    * the url identity.
    */
  def q59RobotsFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val botGroup = concat(
      lit("# synthetic robots\nUser-agent: graftbot\nDisallow: /order/\nAllow: /order/pub\n"),
      when(col("h") % 2 === 1, lit("Disallow: /item/\n")).otherwise(lit("")))
    val txt = concat(
      when(col("h") % 5 =!= 0, botGroup).otherwise(lit("")),
      lit("User-agent: *\nDisallow: /private/\nSitemap: https://x/s.xml\n"))
    val rules = s.range(0, 20).toDF("h")
      .select(col("h"), txt.as("robots"))
      .as[(Long, String)]
      .flatMap { case (h, body) =>
        graft.core.RobotsTxt.rulesFor(body, "graftbot")
          .map(r => (h, r.path, r.allow))
      }
      .toDF("h", "rpath", "rallow")
    // (measured: tblWide regressed this 1.37 -> 1.58 s — the rules-join
    // argmax is cheap enough that the extra exchange loses; plain read)
    val urls = tbl(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_suppkey") % 20).as("h"),
        concat(
          when(col("l_orderkey") % 4 === 0, lit("/order/"))
            .when(col("l_orderkey") % 4 === 1, lit("/order/pub/"))
            .when(col("l_orderkey") % 4 === 2, lit("/item/"))
            .otherwise(lit("/private/")),
          col("l_orderkey").cast("string")).as("path"))
    val pk = when(expr("startswith(path, rpath)"),
      length(col("rpath")).cast("long") * 2 +
        when(col("rallow"), 1L).otherwise(0L))
    urls.join(broadcast(rules), Seq("h"), "left")
      .groupBy(col("l_orderkey"), col("l_linenumber"), col("h"), col("path"))
      .agg(max(pk).as("pk"))
      .select(col("l_orderkey"), col("l_linenumber"), col("h"), col("path"),
        coalesce(col("pk") % 2 === 1, lit(true)).as("allowed"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("h"))
  }

  /** q61: robots.txt admission with RFC 9309 §2.2.3 WILDCARD rules (`*`
    * any-sequence, final-`$` end anchor — the Google-extension semantics
    * real crawl corpora depend on). The robots bodies are synthesized with
    * wildcard patterns, parsed by [[graft.core.RobotsTxt]], and each
    * pattern is compiled to an anchored regex via
    * [[graft.core.RobotsTxt.patternToRegex]] so the admission decision
    * stays a codegen-friendly `regexp_like` + the same packed
    * `len*2 + allowBit` argmax as q59 (precedence = as-written pattern
    * length, Allow wins ties). The DuckDB oracle constructs the SAME rules
    * and derives the regex with the same escaping rules in SQL, so the
    * wildcard matcher's semantics are value-checked end to end. Scale
    * shape: per-host rules are tiny (broadcast); one aggregate on the url
    * identity; patternMatches itself is property-tested against a regex
    * model in RobotsSpec.
    */
  def q61RobotsWildcard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val txt = concat(
      lit("# wildcard robots\nUser-agent: graftbot\n" +
        "Disallow: /*.pdf$\nAllow: /order/*/pub\nDisallow: /order/\n"),
      when(col("h") % 2 === 1, lit("Disallow: /item/*temp\n")).otherwise(lit("")),
      lit("User-agent: *\nDisallow: /\n"))
    val rules = s.range(0, 20).toDF("h")
      .select(col("h"), txt.as("robots"))
      .as[(Long, String)]
      .flatMap { case (h, body) =>
        graft.core.RobotsTxt.rulesFor(body, "graftbot")
          .map(r => (h, r.path, r.allow, graft.core.RobotsTxt.patternToRegex(r.path)))
      }
      .toDF("h", "rpath", "rallow", "rregex")
    // (measured: tblWide regressed this 1.19 -> 1.44 s; plain read kept)
    val urls = tbl(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_suppkey") % 20).as("h"),
        concat(
          when(col("l_orderkey") % 6 === 0,
            concat(lit("/order/"), col("l_orderkey").cast("string"), lit("/pub")))
            .when(col("l_orderkey") % 6 === 1,
              concat(lit("/order/"), col("l_orderkey").cast("string")))
            .when(col("l_orderkey") % 6 === 2,
              concat(lit("/docs/"), col("l_orderkey").cast("string"), lit(".pdf")))
            .when(col("l_orderkey") % 6 === 3,
              concat(lit("/docs/"), col("l_orderkey").cast("string"), lit(".pdfx")))
            .when(col("l_orderkey") % 6 === 4,
              concat(lit("/item/"), col("l_orderkey").cast("string"), lit("temp")))
            .otherwise(concat(lit("/misc/"), col("l_orderkey").cast("string")))
          ).as("path"))
    val pk = when(regexp_like(col("path"), col("rregex")),
      length(col("rpath")).cast("long") * 2 +
        when(col("rallow"), 1L).otherwise(0L))
    urls.join(broadcast(rules), Seq("h"), "left")
      .groupBy(col("l_orderkey"), col("l_linenumber"), col("h"), col("path"))
      .agg(max(pk).as("pk"))
      .select(col("l_orderkey"), col("l_linenumber"), col("h"), col("path"),
        coalesce(col("pk") % 2 === 1, lit(true)).as("allowed"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("h"))
  }

  /** q66: crawl-politeness SCHEDULING — after q59/q61 decide *whether* a
    * url may be fetched, this decides *when*: per-host robots.txt bodies
    * carry a Crawl-delay (the de-facto Bing/Yandex extension,
    * [[graft.core.RobotsTxt.crawlDelayFor]] — group selection
    * value-checked through the oracle exactly like q59's rules), and each
    * host's urls get sequential fetch offsets `(rank-1) × delay`. Hosts
    * with no graftbot group fall to the `*` group's delay. Scale shape:
    * one window shuffle keyed on the host — per-host sequencing is
    * inherently serial (that is the politeness contract); hot hosts bound
    * throughput by design, which is why crawl schedulers partition by
    * host, exactly as this plan does.
    */
  def q66PolitenessSchedule(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val txt = concat(
      when(col("h") % 4 =!= 0,
        concat(lit("User-agent: graftbot\nCrawl-delay: "),
          (col("h") % 5 + 1).cast("string"),
          lit("\nDisallow: /private/\n"))).otherwise(lit("")),
      lit("User-agent: *\nCrawl-delay: 9\nDisallow: /tmp/\n"))
    val delays = s.range(0, 20).toDF("h")
      .select(col("h"), txt.as("robots"))
      .as[(Long, String)]
      .map { case (h, body) =>
        (h, graft.core.RobotsTxt.crawlDelayFor(body, "graftbot")
          .map(d => (d * 1000).toLong).getOrElse(0L))
      }
      .toDF("h", "delay_ms")
    val urls = tbl(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_suppkey") % 20).as("h"))
    val w = Window.partitionBy(col("h"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
    urls.join(broadcast(delays), "h")
      .select(col("h"), col("l_orderkey"), col("l_linenumber"),
        ((row_number().over(w) - 1).cast("long") * col("delay_ms")).as("fetch_ms"))
      .orderBy(col("h"), col("l_orderkey"), col("l_linenumber"))
  }

  /** q154: URL-TEMPLATE trap mining — collapse every url to host + the
    * digit-erased path TEMPLATE and flag templates whose DISTINCT-url
    * count blows past a per-template crawl budget (IRLbot's budget
    * enforcement, Lee et al. WWW'09, moved from site to template grain):
    * calendars, session-id urls and unbounded pagination all mint fresh
    * urls under one template forever, and an unmetered crawler spends its
    * whole host budget inside the trap. Three planted path families make
    * both shapes measurable: `/article/K` draws from a FIXED pool of 40
    * ids per host (a real site's finite content — can never exceed the
    * budget at any corpus scale), while `/cal/Y/M/D` and
    * `/item/K?session=S` mint distinct urls proportional to crawl volume
    * (the session family crosses the budget at every harness scale).
    *
    * Scale shape: the template projection is stateless; one map-combined
    * (host, template) aggregate; host totals are a ≤#hosts-row rollup
    * that re-enters BROADCAST. The url corpus shuffles once, on the
    * (host, template) key it groups by.
    */
  def q154UrlTemplates(s: SparkSession, dir: String): DataFrame = {
    val url = concat(lit("https://sup"), (col("l_suppkey") % 40).cast("string"),
      lit(".example.com"),
      when(col("l_linenumber") % 3 === 0,
        concat(lit("/article/"), (col("l_orderkey") % 40).cast("string")))
        .when(col("l_linenumber") % 3 === 1,
          concat(lit("/cal/"), (col("l_orderkey") % 25 + 1995).cast("string"),
            lit("/"), (col("l_orderkey") % 12 + 1).cast("string"),
            lit("/"), (col("l_partkey") % 28 + 1).cast("string")))
        .otherwise(concat(lit("/item/"), col("l_partkey").cast("string"),
          lit("?session="), col("l_orderkey").cast("string"))))
    // tblWide: two regexp_extract + regexp_replace per row over the 600 k
    // single-split lineitem scan (guide §2.5 input-skew class)
    val u = tblWide(s, dir, "lineitem")
      .select(url.as("url"))
      .select(regexp_extract(col("url"), "^https://([^/]+)", 1).as("host"),
        regexp_replace(regexp_extract(col("url"), "^https://[^/]+(.*)$", 1),
          "[0-9]+", "N").as("template"),
        col("url"))
    // materialized once: feeds the host rollup AND the join left side
    // (without this the scan + distinct-count subtree runs twice)
    val byTpl = u.groupBy(col("host"), col("template"))
      .agg(countDistinct(col("url")).as("uniq_urls"), count(lit(1)).as("hits"))
      .localCheckpoint()
    val byHost = byTpl.groupBy(col("host"))
      .agg(sum(col("uniq_urls")).as("host_urls"))
    byTpl.join(broadcast(byHost), "host")
      .select(col("host"), col("template"), col("uniq_urls"), col("hits"),
        expr("uniq_urls * CAST(10000 AS BIGINT) DIV host_urls").as("share_bp"),
        (col("uniq_urls") > lit(45L)).as("trap"))
      .orderBy(col("host"), col("template"))
  }

  /** q155: RE-VISIT SCHEDULING — estimate each page's change rate from
    * its crawl history and derive the re-crawl interval (the freshness
    * policy of Cho & Garcia-Molina, TOIT 2003: pages that change on
    * every visit get re-crawled at the observed gap; pages that never
    * change back off exponentially). The change-rate estimator is the
    * repo's floor-log₂ surrogate of the C&G-M MLE λ̂·T = −ln((n−X)/n):
    * `lam_bits = bitlen(n+1) − bitlen(n−X+1)` (q84/q103 discipline —
    * bit-identical in both engines), and the interval is the observed
    * mean gap arithmetic-shifted right by lam_bits, floored at one day.
    * Visit histories are synthesized from orders (page = custkey-bucket,
    * visit day = epoch-day of o_orderdate, changed = an orderkey residue
    * against a per-page planted rate 1/7…6/7 — so the interval spread is
    * a real signal, not noise).
    *
    * Scale shape: one map-combined page-keyed aggregate over a stateless
    * projection; everything after is per-group O(1) arithmetic. This is
    * the whole-web-history shape: the crawl log never shuffles twice.
    */
  def q155RevisitSchedule(s: SparkSession, dir: String): DataFrame = {
    val v = tbl(s, dir, "orders")
      .select((col("o_custkey") % 250).as("page"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("day"),
        col("o_orderkey"))
      .withColumn("chg",
        when(col("o_orderkey") % 7 < (col("page") % 6 + 1), 1L).otherwise(0L))
    v.groupBy(col("page"))
      .agg(count(lit(1)).as("n"), sum(col("chg")).as("x"),
        (max(col("day")) - min(col("day"))).as("span"))
      .filter(col("n") >= 2)
      .withColumn("gap_days", expr("span DIV (n - 1)"))
      .withColumn("lam_bits",
        (length(bin(col("n") + 1)) - length(bin(col("n") - col("x") + 1)))
          .cast("long"))
      .select(col("page"), col("n"), col("x"),
        expr("x * CAST(10000 AS BIGINT) DIV n").as("p_bp"),
        col("lam_bits"), col("gap_days"),
        expr("GREATEST(CAST(1 AS BIGINT), SHIFTRIGHT(gap_days, CAST(lam_bits AS INT)))")
          .as("interval_days"))
      .orderBy(col("page"))
  }

  /** Deterministic per-host fixtures of the q73 frontier: robots.txt with
    * a Sitemap: pointer, and the sitemap XML that pointer names. Used by
    * both the distributed query (inside flatMap) and LinkGraphSpec's
    * sequential replay.
    */
  private[queries] object FrontierSynth {
    def host(h: Long): String = s"site$h.example"
    def robots(h: Long): String =
      s"""User-agent: graftbot
         |Disallow: /private/
         |Crawl-delay: ${h % 5 + 1}
         |Sitemap: https://${host(h)}/sitemap.xml
         |User-agent: *
         |Disallow: /
         |""".stripMargin
    def sitemapXml(h: Long): Array[Byte] = {
      val sb = new StringBuilder(1024)
      sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      sb.append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
      for (n <- 0 until 10) {
        sb.append("<url><loc>https://").append(host(h)).append("/page/").append(n)
          .append("</loc><lastmod>2026-0").append(n % 9 + 1)
          .append("-01</lastmod><priority>0.").append((h + n) % 10)
          .append("</priority></url>\n")
      }
      for (n <- 0 until 3) // planted: robots-disallowed entries
        sb.append("<url><loc>https://").append(host(h)).append("/private/")
          .append(n).append("</loc></url>\n")
      sb.append("</urlset>\n")
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }
  }

  /** q73: the composed CRAWL FRONTIER — the full discovery → admission →
    * scheduling loop a recurring crawler runs, chaining four engines this
    * library already certifies separately: candidate urls come from each
    * host's sitemap ([[graft.core.SitemapParser]] parsing real XML named
    * by the robots body's `Sitemap:` pointer) unioned with
    * extracted-link-style candidates (lineitem-derived paths, q61's
    * shape); already-crawled urls are removed by anti-join; admission
    * evaluates the PARSED robots rules ([[graft.core.RobotsTxt]] →
    * `patternToRegex`, q61's machinery); and surviving urls get
    * politeness offsets `(rank-1) × Crawl-delay` per host, ranked by
    * sitemap priority (links carry the protocol-default 0.5). Flag
    * `frontier_ok` certifies the planted invariants per row: no
    * `/private/` url admitted, nothing already crawled, and the fetch
    * offset sits on the host's delay grid below the host's row count;
    * LinkGraphSpec replays the whole frontier sequentially and compares
    * row-for-row. Scale shape: per-host robots/sitemap fixtures are tiny
    * (broadcast); the candidate set shuffles once for the anti-join and
    * once for the per-host window — the politeness contract itself.
    */
  def q73Frontier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val hosts = s.range(0, 20)
    // sitemap leg: robots Sitemap: pointer → XML → entries, via the real
    // parsers inside the flatMap (driver ships only the host ids)
    val smCands = hosts.flatMap { h =>
      val ptr = graft.core.SitemapParser.sitemapUrls(FrontierSynth.robots(h))
      require(ptr.nonEmpty, "fixture must carry a Sitemap pointer")
      graft.core.SitemapParser.parse(FrontierSynth.sitemapXml(h))
        .map(e => (h, e.loc, e.priority))
    }.toDF("h", "url", "priority")
    // link leg: extracted-outlink-style candidates with default priority.
    // r6: ONE lineitem scan + ONE distinct feeds both the candidate leg
    // and the crawled-order leg (was two scans + two distinct shuffles);
    // `was_crawled` is a function of l_orderkey, which the url embeds
    // bijectively, so the distinct's cardinality and both derived sets
    // are unchanged.
    val ordBase = tbl(s, dir, "lineitem")
      .select((col("l_suppkey") % 20).cast("long").as("h"),
        concat(lit("https://site"), (col("l_suppkey") % 20).cast("string"),
          lit(".example/order/"), col("l_orderkey").cast("string")).as("url"),
        (col("l_orderkey") % 3 === 0).as("was_crawled"))
      .distinct()
      .localCheckpoint()
    val linkCands = ordBase
      .select(col("h"), col("url"), lit(0.5).as("priority"))
    val cands = smCands.unionByName(linkCands)
    // already crawled: /page/N with N%4=0 and /order/K with K%3=0 (what a
    // previous run's manifest would list)
    val crawled = hosts.flatMap { h =>
      (0 until 10).filter(_ % 4 == 0)
        .map(n => s"https://${FrontierSynth.host(h)}/page/$n")
    }.toDF("url").unionByName(
      ordBase.filter(col("was_crawled")).select(col("url")))
    // admission: the host's PARSED rules, q61's regex machinery
    val rules = hosts.flatMap { h =>
      graft.core.RobotsTxt.rulesFor(FrontierSynth.robots(h), "graftbot")
        .map(r => (h, r.path, r.allow, graft.core.RobotsTxt.patternToRegex(r.path)))
    }.toDF("h", "rpath", "rallow", "rregex")
    val delays = hosts.map { h =>
      val d = graft.core.RobotsTxt.crawlDelayFor(FrontierSynth.robots(h), "graftbot")
      (h, (d.getOrElse(9.0) * 1000).toLong)
    }.toDF("h", "delay_ms")
    val path = regexp_replace(col("url"), "^https://[^/]+", "")
    val pk = when(regexp_like(path, col("rregex")),
      length(col("rpath")).cast("long") * 2 +
        when(col("rallow"), 1L).otherwise(0L))
    val admitted = cands
      .join(crawled, Seq("url"), "left_anti")
      .join(broadcast(rules), Seq("h"), "left")
      .groupBy(col("h"), col("url"), col("priority"))
      .agg(max(pk).as("pkk"))
      .filter(coalesce(col("pkk") % 2 === 1, lit(true)))
    val w = Window.partitionBy(col("h"))
      .orderBy(col("priority").desc, col("url"))
    val cnt = Window.partitionBy(col("h"))
    admitted.join(broadcast(delays), "h")
      .select(col("h"), col("url"), col("priority"),
        ((row_number().over(w) - 1).cast("long") * col("delay_ms")).as("fetch_ms"),
        col("delay_ms"), count(lit(1)).over(cnt).as("host_n"))
      .select(col("h"), col("url"), col("priority"), col("fetch_ms"),
        {
          // planted invariants, each checkable from the url alone:
          // robots exclusion, crawled exclusion (page N%4=0 / order K%3=0
          // were planted as already-crawled), politeness grid membership
          val tail = regexp_extract(col("url"), "([0-9]+)$", 1).cast("long")
          (!col("url").contains("/private/") &&
            (!col("url").contains("/page/") || tail % 4 =!= 0) &&
            (!col("url").contains("/order/") || tail % 3 =!= 0) &&
            col("fetch_ms") % col("delay_ms") === 0 &&
            col("fetch_ms") / col("delay_ms") < col("host_n")).as("frontier_ok")
        })
      .orderBy(col("h"), col("fetch_ms"), col("url"))
  }

  /** q68: URL canonicalization (rows-only; RFC 3986 §6 normalization is
    * not expressible in DuckDB SQL, so the query SELF-CERTIFIES): two
    * deliberately different messy spellings of the same logical url —
    * uppercase scheme/host, explicit default port, fragment, lowercase
    * reserved percent-escape, encoded-unreserved octet vs the literal —
    * must canonicalize to the SAME string (`twin` leg), and a second
    * canonicalization pass must be a fixpoint (`idem` leg). `canon_ok` is
    * the conjunction, asserted all-true in QueriesSpec. Stateless per-row;
    * the codegen'd `url_canon` is the dedup/partition-key normalizer the
    * pipeline applies before any url-keyed operation.
    */
  def q68UrlCanon(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(s)
    val a = concat(lit("HTTP://Sup"), (col("l_suppkey") % 50).cast("string"),
      lit(".Example.COM:80/Order/"), col("l_orderkey").cast("string"),
      lit("%2fitem%7e"), lit("?b=2&a=%41#frag"))
    val b = concat(lit("http://sup"), (col("l_suppkey") % 50).cast("string"),
      lit(".example.com/Order/"), col("l_orderkey").cast("string"),
      lit("%2Fitem~"), lit("?b=2&a=A"))
    val canon = call_function("url_canon", a)
    val canonB = call_function("url_canon", b)
    val again = call_function("url_canon", canon)
    tbl(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        canon.as("canon_url"),
        (canon === canonB && again === canon).as("canon_ok"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** q83: SURT index keys ([[graft.core.Surt]], codegen'd `surt_key`) —
    * the web-archive sort key CDX(J) indexes use: reversed comma-joined
    * host after canonicalization, `www.` alias stripped, non-default port
    * kept, scheme dropped. Planted urls exercise every rule: mixed-case
    * scheme/host, a `www.` prefix on doc%3==0, a 4th host label on %5==0,
    * `:80` (dropped) vs `:8080` (kept), and percent-encodings the
    * canonicalizer must normalize (`%2f`→`%2F`, `%7e`→`~`). The DuckDB
    * oracle derives the key INDEPENDENTLY — generic
    * `list_reverse(string_split(host,'.'))`, not a hard-coded literal —
    * so label reversal, www-strip, port policy, and the embedded
    * canonicalization are all value-checked per row.
    *
    * Scale: stateless per-row projection (WSCG); sorting by `surt`
    * instead of raw url is what turns "all of example.com" into one
    * contiguous range scan of a 100 TB crawl index.
    */
  def q83SurtKeys(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(s)
    val www = when(col("l_orderkey") % 3 === 0, lit("www.")).otherwise(lit(""))
    val sub = when(col("l_orderkey") % 5 === 0, lit("Static.")).otherwise(lit(""))
    val port = when(col("l_orderkey") % 4 === 0, lit(":8080"))
      .when(col("l_orderkey") % 4 === 1, lit(":80")).otherwise(lit(""))
    val url = concat(lit("HTTP://"), www, sub,
      lit("Sup"), (col("l_suppkey") % 50).cast("string"), lit(".Example.COM"),
      port, lit("/o%2fr%7e/"), col("l_orderkey").cast("string"),
      lit("?item="), col("l_linenumber").cast("string"))
    tbl(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        call_function("surt_key", url).as("surt"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** q85: SURT-index build + pruned prefix lookup
    * ([[graft.sources.SurtIndex]]) — the same url derivation as q83 is
    * range-shuffled into a SURT-sorted parquet index with a per-file
    * key-range manifest, then "every URL of host sup7.example.com and its
    * subdomains" is answered by reading ONLY the manifest-qualifying
    * files. The DuckDB oracle recomputes the SURT keys independently
    * (q83's generic derivation) and applies the prefix as a LIKE over the
    * FULL table — oracle equality proves the pruned read loses nothing.
    * SurtIndexSpec additionally asserts the pruning itself (subset of
    * files touched, disjoint manifest ranges).
    *
    * Scale: one range shuffle at build; lookups schedule tasks for the
    * 2–3 matching files of a 100 TB index, not all of them.
    */
  def q85SurtLookup(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(s)
    val www = when(col("l_orderkey") % 3 === 0, lit("www.")).otherwise(lit(""))
    val sub = when(col("l_orderkey") % 5 === 0, lit("Static.")).otherwise(lit(""))
    val port = when(col("l_orderkey") % 4 === 0, lit(":8080"))
      .when(col("l_orderkey") % 4 === 1, lit(":80")).otherwise(lit(""))
    val url = concat(lit("HTTP://"), www, sub,
      lit("Sup"), (col("l_suppkey") % 50).cast("string"), lit(".Example.COM"),
      port, lit("/o%2fr%7e/"), col("l_orderkey").cast("string"),
      lit("?item="), col("l_linenumber").cast("string"))
    val src = tblWide(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), url.as("url"))
    val out = java.nio.file.Files.createTempDirectory("graft-surtindex")
      .toString
    graft.sources.SurtIndex.build(s, src, "url", out, 8)
    graft.sources.SurtIndex.lookupPrefix(s, out, "com,example,sup7")
      .select(col("l_orderkey"), col("l_linenumber"), col("surt"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_politeness_schedule" -> q66PolitenessSchedule _,
    "q83_surt_keys" -> q83SurtKeys _,
    "q85_surt_lookup" -> q85SurtLookup _,
    "q73_frontier" -> q73Frontier _,
    "q68_url_canon" -> q68UrlCanon _,
    "q47_sessionize" -> q47Sessionize _,
    "q128_funnel" -> q128Funnel _,
    "q131_scd2" -> q131Scd2 _,
    "q132_sliding_rate" -> q132SlidingRate _,
    "q48_url_parse" -> q48UrlParse _,
    "q154_url_templates" -> q154UrlTemplates _,
    "q155_revisit_schedule" -> q155RevisitSchedule _,
    "q119_url_blocklist" -> q119UrlBlocklist _,
    "q135_domain_blocklist" -> q135DomainBlocklist _,
    "q136_tracking_params" -> q136TrackingParams _,
    "q59_robots_filter" -> q59RobotsFilter _,
    "q61_robots_wildcard" -> q61RobotsWildcard _,
    "q39_tumbling_window" -> q39TumblingWindow _,
    "q40_pivot_events" -> q40PivotEvents _,
    "q28_union_shards" -> q28UnionShards _,
    "q29_intersect_users" -> q29IntersectUsers _,
    "q35_distinct_counts" -> q35DistinctCounts _,
    "q01_pricing_agg" -> q01PricingAgg _,
    "q02_filter_project" -> q02FilterProject _,
    "q03_join_revenue" -> q03JoinRevenue _,
    "q04_broadcast_parts" -> q04BroadcastParts _,
    "q05_anti_join" -> q05AntiJoin _,
    "q06_semi_join" -> q06SemiJoin _,
    "q07_window_latest" -> q07WindowLatest _,
    "q08_window_running" -> q08WindowRunning _,
    "q09_topk_orders" -> q09TopkOrders _,
    "q10_except_users" -> q10ExceptUsers _,
    "q11_rollup_docs" -> q11RollupDocs _,
    "q45_cube_docs" -> q45CubeDocs _,
    "q12_distinct_pairs" -> q12DistinctPairs _,
    "q13_scalar_fns" -> q13ScalarFns _,
    "q14_json_extract" -> q14JsonExtract _,
  )

  val oracles: Map[String, String] = Map(
    "q85_surt_lookup" ->
      """WITH u AS (
        |  SELECT l_orderkey, l_linenumber,
        |    lower(CASE WHEN l_orderkey % 5 = 0 THEN 'static.' ELSE '' END
        |      || 'sup' || CAST(l_suppkey % 50 AS VARCHAR) || '.example.com') AS host,
        |    CASE WHEN l_orderkey % 4 = 0 THEN ':8080' ELSE '' END AS prt,
        |    '/o%2Fr~/' || CAST(l_orderkey AS VARCHAR) ||
        |      '?item=' || CAST(l_linenumber AS VARCHAR) AS rest
        |  FROM lineitem),
        |k AS (
        |  SELECT l_orderkey, l_linenumber,
        |    array_to_string(list_reverse(string_split(host, '.')), ',')
        |      || prt || ')' || rest AS surt
        |  FROM u)
        |SELECT l_orderkey, l_linenumber, surt FROM k
        |WHERE surt LIKE 'com,example,sup7%'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q83_surt_keys" ->
      """WITH u AS (
        |  SELECT l_orderkey, l_linenumber,
        |    lower(CASE WHEN l_orderkey % 5 = 0 THEN 'static.' ELSE '' END
        |      || 'sup' || CAST(l_suppkey % 50 AS VARCHAR) || '.example.com') AS host,
        |    CASE WHEN l_orderkey % 4 = 0 THEN ':8080' ELSE '' END AS prt,
        |    '/o%2Fr~/' || CAST(l_orderkey AS VARCHAR) ||
        |      '?item=' || CAST(l_linenumber AS VARCHAR) AS rest
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  array_to_string(list_reverse(string_split(host, '.')), ',')
        |    || prt || ')' || rest AS surt
        |FROM u ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q66_politeness_schedule" ->
      """WITH d AS (
        |  SELECT h, CASE WHEN h % 4 = 0 THEN 9000
        |                 ELSE (h % 5 + 1) * 1000 END AS delay_ms
        |  FROM range(0, 20) t(h)),
        |u AS (
        |  SELECT l_orderkey, l_linenumber, l_suppkey % 20 AS h FROM lineitem)
        |SELECT u.h, u.l_orderkey, u.l_linenumber,
        |  CAST((ROW_NUMBER() OVER (PARTITION BY u.h
        |          ORDER BY u.l_orderkey, u.l_linenumber) - 1)
        |       * d.delay_ms AS BIGINT) AS fetch_ms
        |FROM u JOIN d USING (h)
        |ORDER BY u.h, u.l_orderkey, u.l_linenumber""".stripMargin,
    "q47_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR datediff('second', lag(ts) OVER w, ts) > 1800
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  datediff('second', MIN(ts), MAX(ts)) AS dur_s,
        |  CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS val_sum
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    // windows chain through subqueries (DuckDB rejects a window over
    // another window expression in one SELECT, same as Spark)
    "q128_funnel" ->
      """WITH a AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
        |        OVER (PARTITION BY user_id) AS t_view FROM a),
        |c AS (SELECT *, min(CASE WHEN event_type = 'click' AND us > t_view
        |        THEN us END) OVER (PARTITION BY user_id) AS t_click FROM v),
        |p AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND us > t_click
        |        THEN us END) OVER (PARTITION BY user_id) AS t_buy FROM c)
        |SELECT DISTINCT user_id, t_view, t_click, t_buy,
        |  CASE WHEN t_buy IS NOT NULL THEN 3
        |       WHEN t_click IS NOT NULL THEN 2
        |       WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS stage
        |FROM p ORDER BY user_id""".stripMargin,
    "q131_scd2" ->
      """WITH h AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CAST(round(value * 100) AS BIGINT) AS val_c,
        |    lead(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS valid_to,
        |    CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_versions
        |  FROM events)
        |SELECT user_id, n_versions, event_id AS asof_event,
        |  us AS valid_from, valid_to, val_c
        |FROM h
        |WHERE us <= 1704153600000000
        |  AND (valid_to IS NULL OR valid_to > 1704153600000000)
        |ORDER BY user_id""".stripMargin,
    // every event lands in exactly dur/slide = 4 epoch-aligned windows:
    // starts floor(us/slide)*slide − i·slide, i ∈ 0..3 — Spark's window()
    // alignment rebuilt with integer floor arithmetic
    "q132_sliding_rate" ->
      """SELECT (epoch_us(ts) // 900000000) * 900000000
        |         - i * 900000000 AS w_start_us,
        |  event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
        |FROM events, generate_series(0, 3) t(i)
        |GROUP BY 1, 2 ORDER BY w_start_us, event_type""".stripMargin,
    // suffix chain rebuilt with 1-based list slicing; the label-boundary
    // trap (notspam.net) must stay unblocked in both engines
    "q135_domain_blocklist" ->
      """WITH hosts AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN base
        |         ELSE 'w' || CAST(doc_id % 7 AS VARCHAR) || '.' || base END AS host
        |  FROM (SELECT doc_id,
        |      (['ads.example.com','cdn.spam.net','blog.io','tracker.io','notspam.net'])[CAST(doc_id % 5 AS INT) + 1] AS base
        |    FROM documents)),
        |bl(entry) AS (SELECT * FROM (VALUES ('ads.example.com'), ('spam.net'), ('tracker.io'))),
        |sfx AS (
        |  SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(string_split(host, '.'))),
        |      i -> array_to_string(string_split(host, '.')[i:], '.'))) AS s
        |  FROM hosts),
        |hits AS (SELECT doc_id, min(entry) AS hit
        |         FROM sfx JOIN bl ON sfx.s = bl.entry GROUP BY doc_id)
        |SELECT h.doc_id, h.host, hits.hit IS NOT NULL AS blocked, hits.hit AS hit
        |FROM hosts h LEFT JOIN hits ON h.doc_id = hits.doc_id
        |ORDER BY h.doc_id""".stripMargin,
    "q136_tracking_params" ->
      """WITH r AS (
        |  SELECT CAST((l_orderkey*4 + l_linenumber) % 5 AS VARCHAR) AS page,
        |         CAST((l_orderkey*4 + l_linenumber) % 7 AS VARCHAR) AS sess,
        |         CAST((l_orderkey*4 + l_linenumber) % 3 AS VARCHAR) AS utm,
        |         CAST((l_orderkey*4 + l_linenumber) % 2 AS VARCHAR) AS ord
        |  FROM lineitem),
        |c AS (SELECT *, md5('c' || page || '|' || ord) AS content FROM r),
        |stacked AS (
        |  SELECT 'page' AS param, page AS value,
        |         sess || '|' || utm || '|' || ord AS restkey, content FROM c
        |  UNION ALL SELECT 'sess', sess, page || '|' || utm || '|' || ord, content FROM c
        |  UNION ALL SELECT 'utm', utm, page || '|' || sess || '|' || ord, content FROM c
        |  UNION ALL SELECT 'ord', ord, page || '|' || sess || '|' || utm, content FROM c),
        |g AS (SELECT param, restkey, COUNT(DISTINCT value) AS nv,
        |             COUNT(DISTINCT content) AS nc
        |      FROM stacked GROUP BY param, restkey)
        |SELECT param,
        |  CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(CASE WHEN nv >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS multi_val_groups,
        |  CAST(SUM(CASE WHEN nc > 1 THEN 1 ELSE 0 END) AS BIGINT) AS inconsistent_groups,
        |  (SUM(CASE WHEN nc > 1 THEN 1 ELSE 0 END) = 0
        |    AND SUM(CASE WHEN nv >= 2 THEN 1 ELSE 0 END) > 0) AS tracking
        |FROM g GROUP BY param ORDER BY param""".stripMargin,
    "q119_url_blocklist" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://h' || CAST(doc_id % 37 AS VARCHAR) || '.example.com/' ||
        |    replace(substr(lower(text), 1, 60), ' ', '-') || '/' ||
        |    CAST(doc_id AS VARCHAR) AS url
        |  FROM documents),
        |p AS (SELECT unnest(['scan','can','win','window','merge','a-a',
        |                     'spark','ar']) AS pat),
        |h AS (
        |  SELECT u.doc_id,
        |    CAST(SUM(list_sum(list_transform(generate_series(1, len(u.url)),
        |      i -> CASE WHEN substr(u.url, i, len(p.pat)) = p.pat
        |           THEN 1 ELSE 0 END))) AS BIGINT) AS hits
        |  FROM u, p GROUP BY u.doc_id)
        |SELECT u.doc_id, COALESCE(h.hits, 0) AS hits,
        |  COALESCE(h.hits, 0) = 0 AS kept
        |FROM u LEFT JOIN h USING (doc_id) ORDER BY u.doc_id""".stripMargin,
    "q48_url_parse" ->
      """WITH u AS (
        |  SELECT 'https://sup' || CAST(l_suppkey % 50 AS VARCHAR) ||
        |    '.example.com/order/' || CAST(l_orderkey AS VARCHAR) ||
        |    '/item/' || CAST(l_linenumber AS VARCHAR) AS url
        |  FROM lineitem)
        |SELECT regexp_extract(url, '^https://([^/]+)/', 1) AS host,
        |  COUNT(*) AS hits,
        |  COUNT(DISTINCT CAST(regexp_extract(url, '^https://[^/]+/order/([0-9]+)', 1)
        |    AS BIGINT)) AS orders,
        |  CAST(MAX(len(string_split(url, '/')) - 3) AS BIGINT) AS max_depth
        |FROM u GROUP BY host ORDER BY host""".stripMargin,
    "q154_url_templates" ->
      """WITH u AS (
        |  SELECT 'https://sup' || CAST(l_suppkey % 40 AS VARCHAR) || '.example.com' ||
        |    CASE WHEN l_linenumber % 3 = 0
        |           THEN '/article/' || CAST(l_orderkey % 40 AS VARCHAR)
        |         WHEN l_linenumber % 3 = 1
        |           THEN '/cal/' || CAST(l_orderkey % 25 + 1995 AS VARCHAR) ||
        |                '/' || CAST(l_orderkey % 12 + 1 AS VARCHAR) ||
        |                '/' || CAST(l_partkey % 28 + 1 AS VARCHAR)
        |         ELSE '/item/' || CAST(l_partkey AS VARCHAR) ||
        |              '?session=' || CAST(l_orderkey AS VARCHAR) END AS url
        |  FROM lineitem),
        |t AS (
        |  SELECT regexp_extract(url, '^https://([^/]+)', 1) AS host,
        |    regexp_replace(regexp_extract(url, '^https://[^/]+(.*)$', 1),
        |      '[0-9]+', 'N', 'g') AS template, url
        |  FROM u),
        |bt AS (SELECT host, template, COUNT(DISTINCT url) AS uniq_urls,
        |         COUNT(*) AS hits FROM t GROUP BY 1, 2),
        |bh AS (SELECT host, CAST(SUM(uniq_urls) AS BIGINT) AS host_urls
        |       FROM bt GROUP BY 1)
        |SELECT host, template, uniq_urls, hits,
        |  uniq_urls * CAST(10000 AS BIGINT) // host_urls AS share_bp,
        |  uniq_urls > 45 AS trap
        |FROM bt JOIN bh USING (host) ORDER BY host, template""".stripMargin,
    "q155_revisit_schedule" ->
      """WITH v AS (
        |  SELECT o_custkey % 250 AS page,
        |    epoch_us(o_orderdate) // 86400000000 AS day,
        |    CASE WHEN o_orderkey % 7 < (o_custkey % 250) % 6 + 1
        |         THEN 1 ELSE 0 END AS chg
        |  FROM orders),
        |a AS (SELECT page, COUNT(*) AS n, CAST(SUM(chg) AS BIGINT) AS x,
        |        MAX(day) - MIN(day) AS span FROM v GROUP BY 1),
        |b AS (SELECT page, n, x, span // (n - 1) AS gap_days,
        |        CAST(length(bin(n + 1)) - length(bin(n - x + 1)) AS BIGINT)
        |          AS lam_bits
        |      FROM a WHERE n >= 2)
        |SELECT page, n, x, x * CAST(10000 AS BIGINT) // n AS p_bp,
        |  lam_bits, gap_days,
        |  greatest(CAST(1 AS BIGINT), gap_days >> lam_bits) AS interval_days
        |FROM b ORDER BY page""".stripMargin,
    // The oracle constructs the rules the robots.txt PARSE must produce:
    // graftbot group (order/order-pub, odd hosts add /item/) on h%5<>0
    // hosts; h%5=0 hosts have no graftbot group, so the `*` group's
    // /private/ rule governs — RFC group selection, checked by value.
    "q59_robots_filter" ->
      """WITH hosts AS (SELECT h FROM range(0, 20) t(h)),
        |rules AS (
        |  SELECT h, '/order/' AS rpath, false AS rallow FROM hosts WHERE h % 5 <> 0
        |  UNION ALL SELECT h, '/order/pub', true FROM hosts WHERE h % 5 <> 0
        |  UNION ALL SELECT h, '/item/', false FROM hosts WHERE h % 5 <> 0 AND h % 2 = 1
        |  UNION ALL SELECT h, '/private/', false FROM hosts WHERE h % 5 = 0),
        |urls AS (
        |  SELECT l_orderkey, l_linenumber, l_suppkey % 20 AS h,
        |    (CASE l_orderkey % 4 WHEN 0 THEN '/order/' WHEN 1 THEN '/order/pub/'
        |          WHEN 2 THEN '/item/' ELSE '/private/' END)
        |      || CAST(l_orderkey AS VARCHAR) AS path
        |  FROM lineitem)
        |SELECT u.l_orderkey, u.l_linenumber, u.h, u.path,
        |  COALESCE(MAX(CASE WHEN starts_with(u.path, r.rpath)
        |    THEN length(r.rpath)*2 + CASE WHEN r.rallow THEN 1 ELSE 0 END END) % 2 = 1,
        |    true) AS allowed
        |FROM urls u LEFT JOIN rules r ON u.h = r.h
        |GROUP BY u.l_orderkey, u.l_linenumber, u.h, u.path
        |ORDER BY u.l_orderkey, u.l_linenumber, u.h""".stripMargin,
    "q61_robots_wildcard" ->
      s"""WITH hosts AS (SELECT h FROM range(0, 20) t(h)),
         |rules AS (
         |  SELECT h, '/*.pdf$$' AS rpath, false AS rallow FROM hosts
         |  UNION ALL SELECT h, '/order/*/pub', true FROM hosts
         |  UNION ALL SELECT h, '/order/', false FROM hosts
         |  UNION ALL SELECT h, '/item/*temp', false FROM hosts WHERE h % 2 = 1),
         |rx AS (
         |  SELECT h, rpath, rallow,
         |    CASE WHEN rpath LIKE '%$$'
         |      THEN '^' || replace(replace(substr(rpath, 1, length(rpath)-1), '.', '\\.'), '*', '[\\s\\S]*') || '\\z'
         |      ELSE '^' || replace(replace(rpath, '.', '\\.'), '*', '[\\s\\S]*') END AS rregex
         |  FROM rules),
         |urls AS (
         |  SELECT l_orderkey, l_linenumber, l_suppkey % 20 AS h,
         |    (CASE l_orderkey % 6
         |       WHEN 0 THEN '/order/' || CAST(l_orderkey AS VARCHAR) || '/pub'
         |       WHEN 1 THEN '/order/' || CAST(l_orderkey AS VARCHAR)
         |       WHEN 2 THEN '/docs/' || CAST(l_orderkey AS VARCHAR) || '.pdf'
         |       WHEN 3 THEN '/docs/' || CAST(l_orderkey AS VARCHAR) || '.pdfx'
         |       WHEN 4 THEN '/item/' || CAST(l_orderkey AS VARCHAR) || 'temp'
         |       ELSE '/misc/' || CAST(l_orderkey AS VARCHAR) END) AS path
         |  FROM lineitem)
         |SELECT u.l_orderkey, u.l_linenumber, u.h, u.path,
         |  COALESCE(MAX(CASE WHEN regexp_matches(u.path, r.rregex)
         |    THEN length(r.rpath)*2 + CASE WHEN r.rallow THEN 1 ELSE 0 END END) % 2 = 1,
         |    true) AS allowed
         |FROM urls u LEFT JOIN rx r ON u.h = r.h
         |GROUP BY u.l_orderkey, u.l_linenumber, u.h, u.path
         |ORDER BY u.l_orderkey, u.l_linenumber, u.h""".stripMargin,
    "q40_pivot_events" ->
      """SELECT user_id,
        | CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        | CAST(SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        | CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        | CAST(SUM(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        | CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q39_tumbling_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
        | event_type, COUNT(*) AS cnt,
        | CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q28_union_shards" ->
      """SELECT DISTINCT user_id, event_type FROM (
        |  SELECT user_id, event_type FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, event_type FROM events WHERE event_type = 'view')
        |ORDER BY user_id, event_type""".stripMargin,
    "q29_intersect_users" ->
      """SELECT user_id FROM events
        | WHERE event_type = 'error' AND ts < TIMESTAMP '2024-01-02'
        |INTERSECT SELECT user_id FROM events
        | WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-02'
        |ORDER BY user_id""".stripMargin,
    "q35_distinct_counts" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS users, COUNT(*) AS events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q01_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_c,
        | CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
        | COUNT(*) AS cnt
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_join_revenue" ->
      """SELECT n_name,
        | CAST(SUM(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c,
        | COUNT(*) AS cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q04_broadcast_parts" ->
      """SELECT p_type,
        | CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        | COUNT(*) AS cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 10 GROUP BY p_type ORDER BY p_type""".stripMargin,
    "q05_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority LIKE '1%')
        |ORDER BY c_custkey""".stripMargin,
    "q06_semi_join" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_suppkey = s_suppkey AND l_shipdate >= TIMESTAMP '1998-01-01')
        |ORDER BY s_suppkey""".stripMargin,
    "q07_window_latest" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    "q08_window_running" ->
      """SELECT event_id, user_id,
        | COUNT(*) OVER w AS running_cnt,
        | CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER w AS BIGINT) AS running_value_c
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q09_topk_orders" ->
      """SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_c
        |FROM orders ORDER BY totalprice_c DESC, o_orderkey LIMIT 10""".stripMargin,
    "q10_except_users" ->
      """SELECT user_id FROM events
        | WHERE event_type = 'error' AND ts < TIMESTAMP '2024-01-03'
        |EXCEPT SELECT user_id FROM events
        | WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-03'
        |ORDER BY user_id""".stripMargin,
    "q11_rollup_docs" ->
      """SELECT lang, source, COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY ROLLUP(lang, source)
        |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin,
    "q45_cube_docs" ->
      """SELECT lang, source, COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY CUBE(lang, source)
        |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin,
    "q12_distinct_pairs" ->
      """SELECT DISTINCT lang, source FROM documents ORDER BY lang, source""".stripMargin,
    "q13_scalar_fns" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INT) AS yr,
        | CAST(month(o_orderdate) AS INT) AS mon,
        | strftime(o_orderdate, '%Y-%m') AS ym,
        | upper(o_orderstatus) AS status_up,
        | CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio,
        | CAST(length(o_orderpriority) AS INT) AS prio_len,
        | 'o' || o_orderkey AS tag
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q14_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
