package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** Suite-wide invariants for the driver-checked queries: every oracle key
  * has a query, every query runs, and every query is RUN-TO-RUN
  * DETERMINISTIC (collected rows identical across two executions) — the
  * property the driver's hash compare silently depends on.
  */
class QueriesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  /** The extraction queries certify themselves with a boolean flag column
    * (typed path == SQL path, sha path == native sha2, spans in bounds, …).
    * The driver only records row counts for these no-oracle queries, so
    * without this test a flag silently flipping to false would go unseen —
    * this is the correctness gate for the non-SQL-expressible operators.
    */
  test("every self-certifying flag column is all-true") {
    import org.apache.spark.sql.functions.col
    val flags = Seq(
      "q30_extract_pages" -> "sha_ok",
      "q31_node_table" -> "span_ok",
      "q32_tag_histogram" -> "twin_ok",
      "q33_binary_features" -> "decode_ok",
      "q34_sql_extract" -> "twin_sha_ok",
      "q36_sql_nodes" -> "twin_ok",
      "q37_outlinks" -> "twin_ok",
      "q38_pdf_extract" -> "roundtrip_ok",
      "q46_titles" -> "twin_ok",
      "q52_ann_ivf" -> "ivf_ok",
      "q68_url_canon" -> "canon_ok",
      "q71_link_graph" -> "links_ok",
      "q72_link_rank" -> "rank_ok",
      "q73_frontier" -> "frontier_ok",
      "q74_markdown" -> "md_ok",
      "q75_compress_quality" -> "compress_ok",
      "q76_selectors" -> "sel_ok",
      "q77_tables" -> "tbl_ok",
      "q78_feeds" -> "feed_ok",
      "q79_charset" -> "charset_ok",
      "q80_langid_ngram" -> "lang_ok",
      "q87_hll_distinct" -> "hll_ok",
      "q89_anchor_text" -> "agg_ok",
      "q93_bpe_train" -> "bpe_ok",
      "q94_semdedup" -> "sem_ok",
      "q95_hits" -> "hits_ok",
      "q98_bpe_encode" -> "enc_ok",
      "q117_quality_classifier" -> "clf_ok",
      "q99_exact_repeats" -> "sa_ok",
      "q100_exactsubstr_cut" -> "es_ok",
      "q104_cdc_dedup" -> "cdc_ok",
      "q108_canonical" -> "cons_ok",
      "q110_crawl_hops" -> "bfs_ok",
      "q123_mojibake" -> "moji_ok",
      "q124_pca" -> "pca_ok",
      "q125_fuzzy_decontaminate" -> "fuzzy_ok",
      "q126_bin_pack" -> "pack_ok",
      "q127_template_cluster" -> "tpl_ok",
      "q129_kcore" -> "core_ok",
      "q141_pq_ann" -> "pq_ok",
      "q142_jsonld" -> "ld_ok",
      "q145_image_neardup" -> "img_ok",
      "q157_exif" -> "exif_ok",
      "q160_subtitles" -> "sub_ok",
      "q161_mp3" -> "mp3_ok",
      "q164_extract_any" -> "any_ok",
      "q165_boilerpipe" -> "bp_ok",
      "q146_heading_outline" -> "outline_ok",
      "q148_audio_neardup" -> "aud_ok",
      "q169_alt_text" -> "pair_ok",
      "q173_pub_date" -> "date_ok",
      "q174_license" -> "lic_ok",
      "q176_gale_church" -> "gc_ok",
      "q177_dehyphenate" -> "dehyph_ok",
      "q179_microdata" -> "micro_ok",
      "q185_og_cards" -> "og_ok",
      "q186_paywall" -> "pw_ok",
      "q190_hreflang" -> "hl_ok",
      "q193_idn_spoof" -> "idn_ok",
      "q195_fragment_links" -> "frag_ok",
      "q221_fertility" -> "fert_ok")
    flags.foreach { case (name, flag) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      assert(df.columns.contains(flag), s"$name lost its $flag column")
      val bad = df.filter(!col(flag)).count()
      assert(bad === 0L, s"$name: $bad rows with $flag = false")
    }
    // every rows-only (no-oracle) query must carry a flag — a new query
    // without one would silently weaken the gate
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val unflagged = rowsOnly -- flags.map(_._1).toSet
    assert(unflagged.isEmpty,
      s"rows-only queries without a self-certifying flag: $unflagged")
  }

  test("q55/q56 join their vocabulary side by BROADCAST (Zipf-head skew defense)") {
    // a shuffled token-keyed join puts ~5-7% of all (doc, token) rows on
    // one task at corpus scale; the plan must broadcast the small side
    for (q <- Seq("q55_surprisal", "q56_tfidf_top")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$q lost its broadcast join:\n$plan")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"$q has a shuffled join on the token key:\n$plan")
    }
  }

  test("q92 plans as TakeOrderedAndProject with a broadcast df side (no global sort)") {
    val plan = SparkEntry.queries("q92_bm25_topk")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"q92 lost its top-k plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"q92 lost the broadcast df join:\n$plan")
  }

  test("q118 plans shuffle-free: TakeOrderedAndProject, no Exchange") {
    val plan = SparkEntry.queries("q118_weighted_sample")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"q118 lost top-k:\n$plan")
    assert(!plan.contains("Exchange"), s"q118 grew a shuffle:\n$plan")
  }

  test("q118 weighting: heavy docs overrepresented vs their corpus share") {
    import org.apache.spark.sql.functions._
    val sampleMeanW = SparkEntry.queries("q118_weighted_sample")(spark, sfDir)
      .agg(avg(col("w"))).head.getDouble(0)
    val corpusMeanW = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(least(lit(8), lit(1) + floor(size(split(lower(trim(
        col("text"))), "[ \\t\\n\\f\\r\\x0B]+")) / 64).cast("int")).as("w"))
      .agg(avg(col("w"))).head.getDouble(0)
    assert(sampleMeanW > corpusMeanW,
      s"weighted draw not biased: sample $sampleMeanW vs corpus $corpusMeanW")
  }

  test("q218 margin bitext: every join is broadcast (no shuffled join)") {
    // sides and kNN-sum tables are broadcast-sized by construction; a
    // SortMergeJoin appearing here means the explicit broadcasts regressed
    val plan = SparkEntry.queries("q218_margin_bitext")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"q218 grew a shuffled join:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), s"q218 lost its broadcasts:\n$plan")
  }

  test("q219 hard negatives: token-keyed joins stay broadcast (Zipf defense)") {
    val plan = SparkEntry.queries("q219_hard_negatives")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // dl/fp join on doc_id (the natural corpus key) may shuffle; the
    // token-keyed term/df joins must not — count the broadcasts instead
    val nBhj = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBhj >= 3, s"q219 lost its broadcast joins ($nBhj):\n$plan")
  }

  test("q243 incremental dedup: candidates stay equi-joined — no all-pairs") {
    val plan = SparkEntry.queries("q243_incremental_dedup")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the frozen×batch comparison must ride the fp and (band_idx, digest)
    // equi-joins; a nested-loop/cartesian here is the O(n·m) cliff the
    // signature index exists to avoid
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"q243 grew an all-pairs join:\n$plan")
  }

  test("q231 readability: pure projection — no join, no aggregate exchange") {
    val plan = SparkEntry.queries("q231_readability")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"q231 grew a join:\n$plan")
    assert(!plan.contains("HashAggregate"), s"q231 grew an aggregate:\n$plan")
  }

  test("q237/q238/q239: vocabulary-keyed joins stay broadcast, never shuffled") {
    Seq("q237_sppmi_neighbors", "q238_maxscore_audit", "q239_gate_auc")
      .foreach { q =>
        val plan = SparkEntry.queries(q)(spark, sfDir)
          .queryExecution.executedPlan.toString
        assert(!plan.contains("SortMergeJoin") &&
          !plan.contains("ShuffledHashJoin"),
          s"$q grew a shuffled join:\n$plan")
        assert(plan.contains("BroadcastHashJoin"),
          s"$q lost its broadcasts:\n$plan")
      }
    // q238's theta must come from a top-k operator, not a global sort
    val p238 = SparkEntry.queries("q238_maxscore_audit")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p238.contains("TakeOrderedAndProject"),
      s"q238 theta lost its top-k plan:\n$p238")
  }

  test("every query runs, returns rows, and is run-to-run deterministic") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      def snapshot(): (Int, Seq[String]) = {
        val rows = fn(spark, sfDir).collect()
        (rows.length, rows.take(500).map(_.toString).toSeq)
      }
      val a = snapshot()
      val b = snapshot()
      assert(a._1 > 0, s"$name returned no rows")
      assert(a === b, s"$name is not deterministic across runs")
    }
  }
}
