package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{HtmlScanner, NodeType}
import graft.pipeline.{ExtractPipeline, PageSlice}
import graft.sources.PagesSynth
import graft.functions.Multimodal

/** One row of the exploded analytical node table (SURVEY.md §1.3). */
final case class NodeRow(
    url: String,
    idx: Int,
    ntype: String,
    tag: String,
    self_closing: Boolean,
    cdata: Boolean,
    start: Int,
    end: Int,
    n_attrs: Int,
    span_ok: Boolean)

/** Extraction-pipeline queries over the deterministically synthesized pages
  * table (BASELINE.json:15 schema). Not SQL-expressible in DuckDB (the
  * tokenizer is the operator), so these are rows-only checks per the driver
  * contract; byte-level correctness is pinned by the fixture suite and the
  * parallelism-invariance test instead.
  */
object PagesOps {

  /** Fixed corpus size for the driver's verify pass — small enough to stay
    * fast, large enough to include giants (id 0, 211, …).
    */
  val VerifyDocs = 2000L

  private def pages(s: SparkSession): DataFrame =
    PagesSynth.pagesDF(s, VerifyDocs)

  /** The flagship pipeline: tokenize → node array → boilerplate strip →
    * extract, as one typed narrow map after an explicit url-hash spread.
    *
    * Driver-facing projection: the `spans` array-of-struct column crashes
    * the harness's pandas column sort (CORRECTNESS_r01 q30 err), so it is
    * reduced to `n_spans`; byte-level span checks live in the fixture
    * suite. `sha_ok` self-certifies the typed sha path against Spark's
    * native `sha2` over the extracted text (all-true ⇒ text and text_sha
    * agree byte-for-byte).
    */
  def q30ExtractPages(s: SparkSession, dir: String): DataFrame =
    ExtractPipeline.extractDF(pages(s), numParts = 16)
      .select(col("url"), col("text_sha"), col("node_count"),
        size(col("spans")).as("n_spans"), col("part_id"),
        (sha2(col("text"), 256) === col("text_sha")).as("sha_ok"))
      .orderBy(col("url"))

  /** Exploded node table: the reference's flat node array lifted to a
    * relational view (url, idx, type, tag, span, attr count).
    */
  def q31NodeTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    pages(s).select(col("url"), col("html"))
      .withColumn("part_id", lit(0))
      .as[PageSlice]
      .flatMap { p =>
        val bytes = if (p.html == null) Array.emptyByteArray else p.html
        val len = bytes.length
        HtmlScanner.parse(bytes).iterator.map { nd =>
          NodeRow(p.url, nd.idx, NodeType.name(nd.nodeType), nd.tagName,
            nd.selfClosing, nd.isCdata, nd.start, nd.end,
            if (nd.nodeType == NodeType.StartTag) nd.attrs.length else 0,
            // self-certifying span sanity: every node span is in-bounds
            nd.start >= 0 && nd.end >= nd.start && nd.end <= len)
        }
      }.toDF()
      .orderBy(col("url"), col("idx"))
  }

  /** q127: TEMPLATE CLUSTERING — group pages by structural fingerprint
    * (md5 of the ordered start/close tag-name sequence, text and
    * attributes excluded), the standard first move of site-template
    * detection: pages sharing a template share a tag skeleton even when
    * every text node differs, and per-template clusters are what
    * boilerplate-removal models train on (cf. the CleanEval/boilerplate
    * literature — structure, not content, identifies the template).
    *
    * Scale shape: ONE scanner pass per page inside the scan stage (the
    * native `html_nodes` generator), one md5-keyed aggregate whose key
    * is 16 bytes regardless of page size — never the raw sequence — and
    * the per-group output is O(#templates), not O(#pages).
    *
    * Self-certifying `tpl_ok` per template group: (a) hash grouping ==
    * exact grouping — every member's FULL tag sequence is identical
    * (count_distinct(tag_seq) == 1 within the group; an md5 collision or
    * a non-injective fingerprint would fail it), and (b) the generator
    * path's sequence equals the typed-Dataset scanner path's sequence on
    * every member page (independent evaluation twin, the q32 pattern).
    */
  def q127TemplateCluster(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.register(s)
    pages(s).createOrReplaceTempView("pages_tpl")
    val gen = s.sql(
      """SELECT url, concat_ws(' ', transform(
        |    array_sort(collect_list(struct(n.idx AS i,
        |      concat(n.ntype, ':', lower(n.tag)) AS t))), x -> x.t)) AS tag_seq
        |FROM pages_tpl LATERAL VIEW html_nodes(html) n
        |WHERE n.ntype IN ('START', 'CLOSE')
        |GROUP BY url""".stripMargin)
    val typed = q31NodeTable(s, dir)
      .filter(col("ntype").isin("START", "CLOSE"))
      .groupBy(col("url"))
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("idx").as("i"),
          concat(col("ntype"), lit(":"), lower(col("tag"))).as("t")))),
        x => x.getField("t"))).as("t_seq"))
    gen.join(typed, Seq("url"))
      .select(col("url"), md5(col("tag_seq").cast("binary")).as("template_id"),
        col("tag_seq"), (col("tag_seq") === col("t_seq")).as("page_ok"))
      .groupBy(col("template_id"))
      .agg(count(lit(1)).as("n_pages"),
        min(col("url")).as("exemplar_url"),
        ((count_distinct(col("tag_seq")) === 1) && min(col("page_ok").cast("int")) === 1)
          .as("tpl_ok"))
      .orderBy(col("template_id"))
  }

  /** Corpus tag histogram from the node table — explode + hash agg.
    * Composes on q31 (Catalyst eliminates q31's global sort under the
    * aggregate); the pages are re-parsed here, which is the point of the
    * query — at production scale the node table would be a materialized
    * intermediate, not a re-parse.
    */
  def q32TagHistogram(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.register(s)
    pages(s).createOrReplaceTempView("pages_hist")
    // twin self-certification: the same histogram from the native Generator
    // path (size() on the attrs map counts duplicates too — ArrayBasedMapData
    // keeps them — so it equals the typed n_attrs sum exactly)
    val gen = s.sql(
      """SELECT lower(n.tag) AS g_tag, count(1) AS g_cnt,
        |  sum(size(n.attrs)) AS g_attrs
        |FROM pages_hist LATERAL VIEW html_nodes(html) n
        |WHERE n.ntype = 'START' GROUP BY lower(n.tag)""".stripMargin)
    q31NodeTable(s, dir)
      .filter(col("ntype") === "START")
      .groupBy(lower(col("tag")).as("tag"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_attrs")).as("attrs"))
      .join(gen, col("tag") === col("g_tag"), "full_outer")
      .select(coalesce(col("tag"), col("g_tag")).as("tag"),
        col("cnt"), col("attrs"),
        (col("tag").isNotNull && col("g_tag").isNotNull &&
          col("cnt") === col("g_cnt") && col("attrs") === col("g_attrs"))
          .as("twin_ok"))
      .orderBy(col("tag"))
  }

  /** Multimodal plumbing over the opaque binary column: REAL PNG/JPEG/GIF
    * header parse (dims from the container's own header fields), REAL
    * RIFF/WAVE parse (rate/channels from the fmt chunk), and REAL
    * content-level decode for the uncompressed families — BMP/PPM pixels
    * (mean/peak luma) and s16le PCM WAV samples (frames, mean/peak
    * amplitude) — against a synthesized media set whose ground truth is
    * computed from the raw pixels/samples BEFORE encoding. Stub features
    * for other bytes. `decode_ok` self-certifies: media rows must report
    * the exact synthesized kind/dims/rate/channels AND, for the decoded
    * kinds, the exact frames/mean/peak content stats with decoded = true;
    * page rows must not be classified as media.
    */
  def q33BinaryFeatures(s: SparkSession, dir: String): DataFrame = {
    val media = graft.sources.MediaSynth.mediaDF(s, 60)
    val input = pages(s).select(col("url"), col("html"))
      .unionByName(media.select(col("url"), col("html")))
    val truth = media.select(col("url").as("m_url"),
      col("exp_kind"), col("exp_w"), col("exp_h"), col("exp_rate"), col("exp_ch"),
      col("exp_frames"), col("exp_mean_x1000"), col("exp_peak"), col("exp_decoded"))
    Multimodal.features(input).toDF()
      .join(truth, col("url") === col("m_url"), "left")
      .select(col("url"), col("byte_len"), col("kind"), col("width"),
        col("height"), col("sample_rate"), col("channels"),
        col("entropy_x1000"), col("head_hex"),
        col("frames"), col("mean_x1000"), col("peak"), col("decoded"),
        when(col("m_url").isNull,
          !col("kind").isin("png", "jpeg", "gif", "wav", "bmp", "ppm", "mp4", "webp") &&
            !col("decoded"))
          .otherwise(col("kind") === col("exp_kind") &&
            col("width") === col("exp_w") && col("height") === col("exp_h") &&
            col("sample_rate") === col("exp_rate") &&
            col("channels") === col("exp_ch") &&
            col("decoded") === col("exp_decoded") &&
            // JPEG is lossy: frames (pixel count) stays exact, but the
            // reconstructed luma stats carry a small bounded compression
            // error (the fixtures are smooth gradients at quality 0.95,
            // so the bound is tight); every other kind is bit-exact
            when(col("exp_kind") === "jpeg" && col("exp_decoded"),
              col("frames") === col("exp_frames") &&
                abs(col("mean_x1000") - col("exp_mean_x1000")) <= 1500 &&
                abs(col("peak") - col("exp_peak")) <= 8)
              .otherwise(col("frames") === col("exp_frames") &&
                col("mean_x1000") === col("exp_mean_x1000") &&
                col("peak") === col("exp_peak")))
          .as("decode_ok"))
      .orderBy(col("url"))
  }

  /** SQL surface: the same extraction through the registered native
    * Catalyst expressions (graft.functions.GraftExtensions) — what a
    * SQL-first user of the engine runs.
    */
  def q34SqlExtract(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.register(s)
    pages(s).createOrReplaceTempView("pages_sql")
    val viaSql = s.sql(
      """SELECT url, extract_text(html) AS text, html_node_count(html) AS node_count
        |FROM pages_sql WHERE lang = 'en'""".stripMargin)
    // twin self-certification: the native-Expression path must produce the
    // same bytes as the typed Dataset pipeline — sha2 of the SQL-extracted
    // text vs the pipeline's text_sha, per url (all-true is the check)
    val typed = ExtractPipeline.extractDF(pages(s), numParts = 16)
      .select(col("url"), col("text_sha"))
    viaSql.join(typed, Seq("url"))
      .select(col("url"), col("text"), col("node_count"),
        (sha2(col("text"), 256) === col("text_sha")).as("twin_sha_ok"))
      .orderBy(col("url"))
  }

  /** Node table via the native Generator (UDTF) — the relational twin of
    * q31's typed flatMap, streamed out of the scanner with no per-page
    * node-array materialization.
    */
  def q36SqlNodes(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.register(s)
    pages(s).createOrReplaceTempView("pages_gen")
    val gen = s.sql(
      """SELECT url, n.idx, n.ntype, n.tag, n.self_closing, n.start, n.end
        |FROM pages_gen LATERAL VIEW html_nodes(html) n
        |WHERE n.ntype = 'START'""".stripMargin)
    // twin self-certification vs the typed flatMap node table (q31): a full
    // outer join on (url, idx) flags any row present in only one path or
    // differing in tag/flags/span — all-true twin_ok ⇒ Generator == typed.
    val typed = q31NodeTable(s, dir).filter(col("ntype") === "START")
      .select(col("url").as("t_url"), col("idx").as("t_idx"),
        col("tag").as("t_tag"), col("self_closing").as("t_sc"),
        col("start").as("t_start"), col("end").as("t_end"))
    gen.join(typed,
        col("url") === col("t_url") && col("idx") === col("t_idx"), "full_outer")
      .select(
        coalesce(col("url"), col("t_url")).as("url"),
        coalesce(col("idx"), col("t_idx")).as("idx"),
        col("ntype"), col("tag"), col("self_closing"), col("start"), col("end"),
        (col("url").isNotNull && col("t_url").isNotNull &&
          col("tag") === col("t_tag") && col("self_closing") === col("t_sc") &&
          col("start") === col("t_start") && col("end") === col("t_end")).as("twin_ok"))
      .orderBy(col("url"), col("idx"))
  }

  /** Outlink extraction — the reference's classic consumer pattern (walk
    * the node array, read `href` off anchor tags [R: testHtmlParser.cpp]),
    * as one SQL statement over the Generator + lazy attrs.
    */
  def q37Outlinks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    pages(s).createOrReplaceTempView("pages_lnk")
    val gen = s.sql(
      """SELECT url, n.idx, n.attrs['href'] AS href
        |FROM pages_lnk LATERAL VIEW html_nodes(html) n
        |WHERE n.ntype = 'START' AND lower(n.tag) = 'a'
        |  AND n.attrs['href'] IS NOT NULL""".stripMargin)
    // twin self-certification: href via the typed HNode.attrs path (first
    // name-exact match, bare attrs excluded — the same semantics as the map
    // lookup, which also returns the first duplicate key)
    val typed = pages(s).select(col("url"), col("html"))
      .withColumn("part_id", lit(0))
      .as[PageSlice]
      .flatMap { p =>
        val bytes = if (p.html == null) Array.emptyByteArray else p.html
        HtmlScanner.parse(bytes).iterator
          .filter(nd => nd.nodeType == NodeType.StartTag &&
            nd.tagName.toLowerCase(java.util.Locale.ROOT) == "a")
          .map(nd => (p.url, nd.idx,
            nd.attrs.find(_.name == "href").map(_.value).orNull))
          .filter(_._3 != null)
      }.toDF("t_url", "t_idx", "t_href")
    gen.join(typed,
        col("url") === col("t_url") && col("idx") === col("t_idx"), "full_outer")
      .select(
        coalesce(col("url"), col("t_url")).as("url"),
        coalesce(col("idx"), col("t_idx")).as("idx"),
        col("href"),
        (col("url").isNotNull && col("t_url").isNotNull &&
          col("href") === col("t_href")).as("twin_ok"))
      .orderBy(col("url"), col("idx"))
  }

  /** PDF text extraction (the north_rule's "PDF/layout parse" leg):
    * deterministic structurally-complete PDFs (alternating raw and
    * FlateDecode content streams) → PdfTextScanner, with a per-row
    * roundtrip_ok flag self-certifying the extraction against the known
    * synthesized text.
    */
  def q38PdfExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.core.PdfTextScanner
    import graft.sources.PdfSynth
    s.range(0L, 500L).as[Long].mapPartitions(_.map { id =>
      val flate = id % 2 == 0
      val pdf = PdfSynth.pdfFor(id, flate)
      val txt = PdfTextScanner.extractText(pdf)
      (id, flate, pdf.length, txt.length, txt == PdfSynth.textFor(id))
    }).toDF("doc_id", "flate", "pdf_bytes", "text_chars", "roundtrip_ok")
      .orderBy(col("doc_id"))
  }

  /** Title/metadata extraction with a twin self-certification: the
    * early-stop `extract_title` expression must equal the SAME value
    * derived relationally from the full `html_nodes` stream (content node
    * immediately after the first non-self-closing title start, decoded and
    * whitespace-collapsed) — all-true `twin_ok` is the check.
    */
  def q46Titles(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.register(s)
    pages(s).createOrReplaceTempView("pages_t")
    // ONE generator pass: the first-title index is distributed to every
    // node row by a per-url window min, so marking + content lookup share
    // the same explode (a tstart/tcontent CTE pair would tokenize twice —
    // Spark inlines CTEs). extract_title itself early-stops, so the outer
    // select's re-scan reads only each page's prologue.
    s.sql(
      """WITH marked AS (
        |  SELECT p.url, n.idx, n.ntype, n.text,
        |    min(CASE WHEN n.ntype = 'START' AND lower(n.tag) = 'title'
        |             AND NOT n.self_closing THEN n.idx END)
        |      OVER (PARTITION BY p.url) AS tidx
        |  FROM pages_t p LATERAL VIEW html_nodes(p.html) n),
        |tcontent AS (
        |  SELECT url,
        |    trim(regexp_replace(decode_entities(text),
        |         '[\\s\\x{00A0}]+', ' ')) AS derived
        |  FROM marked WHERE idx = tidx + 1 AND ntype = 'TEXT')
        |SELECT url, title, title <=> derived AS twin_ok FROM (
        |  SELECT p.url, extract_title(p.html) AS title,
        |    coalesce(c.derived, '') AS derived
        |  FROM pages_t p LEFT JOIN tcontent c ON p.url = c.url)
        |ORDER BY url""".stripMargin)
  }

  /** q142: STRUCTURED-DATA (schema.org JSON-LD) extraction — the Web Data
    * Commons operator: pull every `<script type="application/ld+json">`
    * block out of the page head/body and parse entity type + name from it
    * (the knowledge-graph feed a web corpus derives alongside text).
    *
    * One `html_nodes` generator pass; the payload is the TEXT node that
    * follows the script start tag (raw-text mode makes it a single node),
    * paired by a per-url `lead` window — bounded by one page's node count,
    * embarrassingly parallel across pages. JSON parsing is Spark's native
    * `get_json_object` (codegen'd; malformed JSON yields null, never
    * throws). Rows-only (the tokenizer is the operator); `ld_ok` checks
    * every page against the synthesized planted truth — block count,
    * first entity type, first name — covering the absence (no block),
    * multi-block, and malformed-JSON paths by construction
    * ([[PagesSynth.jsonldPayloads]]); the truth side enters as a
    * broadcast-size local table (test harness only, not the scale path).
    */
  def q142Jsonld(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.register(s)
    val n = 600L
    val corp = PagesSynth.structuredPagesDF(s, n)
    corp.createOrReplaceTempView("pages_ld")
    val ext = s.sql(
      """WITH nodes AS (
        |  SELECT p.url, n.idx, n.ntype, n.tag, n.attrs,
        |    lead(n.text) OVER (PARTITION BY p.url ORDER BY n.idx) AS nxt,
        |    lead(n.ntype) OVER (PARTITION BY p.url ORDER BY n.idx) AS nxt_t
        |  FROM pages_ld p LATERAL VIEW html_nodes(p.html) n),
        |ld AS (
        |  SELECT url, idx,
        |    CASE WHEN nxt_t = 'TEXT' THEN nxt ELSE '' END AS payload
        |  FROM nodes
        |  WHERE ntype = 'START' AND lower(tag) = 'script'
        |    AND attrs['type'] = 'application/ld+json')
        |SELECT url, count(*) AS n_ld,
        |  get_json_object(min_by(payload, idx), '$[''@type'']') AS ld_type,
        |  get_json_object(min_by(payload, idx), '$.name') AS ld_name
        |FROM ld GROUP BY url""".stripMargin)
    val truth = {
      import s.implicits._
      (0L until n).map { id =>
        val (c, t, nm) = PagesSynth.jsonldTruth(id)
        (PagesSynth.urlFor(id), c, Option(t), Option(nm))
      }.toDF("t_url", "exp_n", "exp_type", "exp_name")
    }
    corp.select(col("url"))
      .join(ext, Seq("url"), "left")
      .select(col("url"), coalesce(col("n_ld"), lit(0L)).as("n_ld"),
        col("ld_type"), col("ld_name"))
      .join(broadcast(truth), col("url") === col("t_url"))
      .select(col("url"), col("n_ld"), col("ld_type"), col("ld_name"),
        (col("n_ld") === col("exp_n") &&
          (col("ld_type") <=> col("exp_type")) &&
          (col("ld_name") <=> col("exp_name"))).as("ld_ok"))
      .orderBy(col("url"))
  }

  /** q71: LINK-GRAPH extraction — the crawl-frontier/ranking input a web
    * pipeline derives from every page: per link its entity-decoded href,
    * visible anchor text, `rel=nofollow` bit
    * ([[graft.core.LinkExtractor]], one scanner pass, no node array), and
    * the RFC 3986-resolved + §6-canonicalized absolute target
    * ([[graft.core.UrlCanon.resolve]]; null for fragment-only/non-http
    * refs). Self-certification is three-way: `twin_ok` compares the
    * scanner's per-url href SEQUENCE against an INDEPENDENT extraction by
    * `regexp_extract_all` over the decoded html (exact on the synthesized
    * corpus, whose links are all double-quoted), and the canonical
    * fixpoint of every abs_url is asserted through the codegen'd
    * `url_canon` expression. Scale shape: one narrow flatMap, one
    * per-url aggregate for the twin, broadcast-size flags join.
    */
  def q71LinkGraph(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    val links = pages(s).select(col("url"), col("html"))
      .withColumn("part_id", lit(0))
      .as[PageSlice]
      .flatMap { p =>
        val bytes = if (p.html == null) Array.emptyByteArray else p.html
        graft.core.LinkExtractor.outlinks(bytes).zipWithIndex.map {
          case (l, i) =>
            (p.url, i, l.href, l.anchor, l.nofollow,
              graft.core.UrlCanon.resolve(p.url, l.href).orNull)
        }
      }
      .toDF("url", "link_idx", "href", "anchor", "nofollow", "abs_url")
    val twin = pages(s).select(col("url"),
      expr("""regexp_extract_all(decode(html, 'UTF-8'), '<a href="([^"]*)"', 1)""")
        .as("rx_hrefs"))
    val flags = links.groupBy(col("url"))
      .agg(transform(array_sort(collect_list(struct(col("link_idx"), col("href")))),
        x => x.getField("href")).as("hrefs"))
      .join(twin, Seq("url"))
      .select(col("url"), (col("hrefs") === col("rx_hrefs")).as("t_ok"))
    links.join(flags, Seq("url"))
      .select(col("url"), col("link_idx"), col("href"), col("anchor"),
        col("nofollow"), col("abs_url"),
        (col("t_ok") && col("href") =!= "" &&
          (col("abs_url").isNull ||
            expr("url_canon(abs_url)") === col("abs_url"))).as("links_ok"))
      .orderBy(col("url"), col("link_idx"))
  }

  /** q89: ANCHOR-TEXT aggregation per link target — the classic
    * relevance/quality signal (how the web describes a page) used by
    * search ranking and by corpus curation as document-level metadata:
    * for every canonicalized link target, the incoming-link count,
    * distinct linking pages, nofollow count, and the dominant anchor
    * text (most frequent; ties broken lexicographically).
    *
    * Self-certification (`agg_ok`): the dominant anchor is computed twice
    * through INDEPENDENT aggregation paths — a per-target window rank
    * over (target, anchor) counts, and a `min_by` over the inverted sort
    * key — and must agree row-for-row, with the count invariants
    * (1 ≤ top_cnt ≤ n_links, n_pages ≤ n_links) asserted alongside.
    *
    * Scale: one map-combined (target, anchor) aggregate, then per-target
    * work only — anchors per target is bounded data (counts, not text
    * concatenation), so no hot-target blowup; the window runs over the
    * aggregated counts, not the raw links.
    */
  def q89AnchorText(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val la = pages(s).select(col("url"), col("html"))
      .withColumn("part_id", lit(0))
      .as[PageSlice]
      .flatMap { p =>
        val bytes = if (p.html == null) Array.emptyByteArray else p.html
        graft.core.LinkExtractor.outlinks(bytes).iterator
          .flatMap(l => graft.core.UrlCanon.resolve(p.url, l.href)
            .map(abs => (p.url, abs, l.anchor.trim, l.nofollow)))
      }
      .toDF("src", "dst", "anchor", "nofollow")
      .where(col("anchor") =!= "")
    val counts = la.groupBy(col("dst"), col("anchor"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("nofollow"), 1L).otherwise(0L)).as("nf"))
      .localCheckpoint() // one aggregate feeds both top-anchor paths
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("dst"))
      .orderBy(col("cnt").desc, col("anchor").asc)
    val viaWindow = counts
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("dst"), col("anchor").as("top_anchor"), col("cnt").as("top_cnt"))
    val viaMinBy = counts.groupBy(col("dst"))
      .agg(min_by(col("anchor"), struct((-col("cnt")).as("nc"), col("anchor")))
        .as("top_anchor2"),
        max(col("cnt")).as("top_cnt2"),
        sum(col("cnt")).as("n_links"), sum(col("nf")).as("n_nofollow"))
    val pagesPer = la.groupBy(col("dst"))
      .agg(countDistinct(col("src")).as("n_pages"))
    viaWindow.join(viaMinBy, Seq("dst")).join(pagesPer, Seq("dst"))
      .select(col("dst"), col("n_links"), col("n_pages"), col("n_nofollow"),
        col("top_anchor"), col("top_cnt"),
        (col("top_anchor") === col("top_anchor2") &&
          col("top_cnt") === col("top_cnt2") &&
          col("top_cnt") >= 1 && col("top_cnt") <= col("n_links") &&
          col("n_pages") <= col("n_links")).as("agg_ok"))
      .orderBy(col("dst"))
  }

  /** Nofollow-excluded, canonicalized, distinct extracted edges — the
    * shared input of q72 (PageRank) and q95 (HITS). */
  private def linkEdges(s: SparkSession): DataFrame = {
    import s.implicits._
    pages(s).select(col("url"), col("html"))
      .withColumn("part_id", lit(0))
      .as[PageSlice]
      .flatMap { p =>
        val bytes = if (p.html == null) Array.emptyByteArray else p.html
        graft.core.LinkExtractor.outlinks(bytes).iterator
          .filter(!_.nofollow)
          .flatMap(l => graft.core.UrlCanon.resolve(p.url, l.href)
            .map(abs => (p.url, abs)))
      }
      .toDF("src", "dst")
      .where(col("src") =!= col("dst"))
      .distinct()
      // r6: pre-partition on src — the BFS frontier join (q110) and the
      // PageRank/HITS contribution joins (q72/q95) are src-keyed every
      // round; localCheckpoint preserves the partitioning so only the
      // small rank/frontier side reshuffles per round
      .repartition(col("src"))
      .localCheckpoint()
  }

  /** q110: crawl-depth BFS — minimum hop distance from a seed set over
    * the extracted link graph: the frontier-scheduling computation of a
    * real crawler (how deep must the crawl go, which pages are reachable
    * within budget k), run as iterative frontier expansion: per round ONE
    * equi-join of the edge table against the current frontier + one
    * distinct + one anti-join against the visited set, localCheckpointed
    * (flat lineage, the PageRank/closure discipline), with an O(1)
    * frontier-count read-back deciding termination. Rounds = graph
    * diameter from the seeds — small on web graphs — and the frontier
    * SHRINKS once the reachable set saturates, so the per-round cost is
    * bounded by the edge join, never by round count.
    *
    * Seeds are the deterministic id%97==0 slice of the corpus. Rows-only;
    * `bfs_ok` is a Bellman-Ford OPTIMALITY CERTIFICATE computed inside
    * the query: a node at hop 0 must be a seed; a node at hop h>0 must
    * have min(reached in-neighbor hop)+1 == h (both minimality — no
    * shorter path exists — and validity — some h-1 in-neighbor exists);
    * and a node with a reached in-neighbor that is itself missing from
    * the result surfaces as a row with null hop, failing the flag
    * (completeness). LinkGraphSpec additionally replays the whole BFS
    * against an independent driver-side model, node-for-node.
    *
    * Scale shape: visited-set state is ids-only (urls, never html); at
    * 100 TB bucket both edge and visited tables on the node key so the
    * per-round anti-join is co-located ([[graft.sources.BucketedTables]]
    * is the implemented seam).
    */
  def q110CrawlHops(s: SparkSession, dir: String): DataFrame = {
    val e = linkEdges(s)
    val isSeed =
      regexp_extract(col("node"), "/page/([0-9]+)$", 1).cast("long") % 97 === 0
    val seeds = pages(s).select(col("url").as("node"))
      .where(isSeed).distinct()
    var dist = seeds.select(col("node"), lit(0L).as("hop")).localCheckpoint()
    var frontier = dist
    val MaxHops = 20
    var h = 1L
    var more = true
    while (more && h <= MaxHops) {
      val next = e.join(frontier.select(col("node").as("src")), "src")
        .select(col("dst").as("node")).distinct()
        .join(dist.select("node"), Seq("node"), "left_anti")
        .select(col("node"), lit(h).as("hop"))
        .localCheckpoint()
      if (next.count() == 0L) more = false // O(1) read-back per round
      else {
        dist = dist.union(next).localCheckpoint()
        frontier = next
        h += 1
      }
    }
    // the q49 closure discipline: a frontier still alive at the cap is a
    // hard failure, never a silently-truncated answer
    require(!more, s"BFS frontier still expanding after $MaxHops hops")
    val inMin = e
      .join(dist.select(col("node").as("src"), col("hop").as("sh")), "src")
      .groupBy(col("dst")).agg(min(col("sh")).as("min_in"))
    dist.join(inMin, col("node") === col("dst"), "full_outer")
      .select(coalesce(col("node"), col("dst")).as("node"), col("hop"),
        coalesce(when(col("hop") === 0, isSeed)
          .otherwise(col("min_in") + 1 === col("hop")), lit(false)).as("bfs_ok"))
      .orderBy(col("node"))
  }

  /** q95: HITS hubs & authorities (Kleinberg 1999, "Authoritative sources
    * in a hyperlinked environment") over the same extracted link graph as
    * q72 — the other classic link-quality signal (a good hub links to good
    * authorities; a good authority is linked from good hubs). Three
    * mutual-reinforcement iterations, L1-normalized each half-step with
    * q72's 1e-9 grid snap (the accepted determinism contract for floating
    * aggregation).
    *
    * Rows-only; `hits_ok` certifies: scores in [0, 1], both score vectors
    * L1-sum to 1 within grid slack, a node with no in-edges has authority
    * exactly 0 and a node with no out-edges has hub exactly 0.
    * LinkGraphSpec replays the full iteration against an independent
    * driver-side model, node-for-node.
    *
    * Scale shape: per half-step one equi-join + one groupBy on the edge
    * key (exactly PageRank's shape ×2) and an O(1)-row normalization
    * aggregate broadcast back; edges distinct once and checkpointed.
    */
  def q95Hits(s: SparkSession, dir: String): DataFrame = {
    def round9(c: org.apache.spark.sql.Column) = round(c * 1e9) / 1e9
    val e = linkEdges(s)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val nn = nodes.count().toDouble
    var h = nodes.select(col("node"), round9(lit(1.0) / nn).as("h"))
      .localCheckpoint()
    var a = nodes.select(col("node"), lit(0.0).as("a"))
    for (_ <- 1 to 3) {
      val rawA = e.join(h, col("src") === col("node"))
        .groupBy(col("dst")).agg(round9(sum(col("h"))).as("ra"))
      val aTot = rawA.agg(round9(sum(col("ra"))).as("tot"))
      // r6: no checkpoint on the half-step — each localCheckpoint is an
      // eager ~0.2 s job on a tiny table; `h`'s end-of-iteration
      // checkpoint bounds the lineage (a's plan is one join over the
      // checkpointed h), and the final a-join recomputes one cheap step
      a = nodes.join(rawA, col("node") === col("dst"), "left")
        .crossJoin(broadcast(aTot))
        .select(col("node"),
          round9(coalesce(col("ra"), lit(0.0)) / col("tot")).as("a"))
      val rawH = e.join(a, col("dst") === col("node"))
        .groupBy(col("src")).agg(round9(sum(col("a"))).as("rh"))
      val hTot = rawH.agg(round9(sum(col("rh"))).as("tot"))
      h = nodes.join(rawH, col("node") === col("src"), "left")
        .crossJoin(broadcast(hTot))
        .select(col("node"),
          round9(coalesce(col("rh"), lit(0.0)) / col("tot")).as("h"))
        .localCheckpoint()
    }
    val inDeg = e.groupBy(col("dst")).agg(count(lit(1)).as("in_deg"))
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    val scored = nodes
      .join(a, "node").join(h, "node")
      .join(inDeg, col("node") === col("dst"), "left").drop("dst")
      .join(outDeg, col("node") === col("src"), "left").drop("src")
      .select(col("node"),
        round(col("a") * 1e9).cast("long").as("auth_x1e9"),
        round(col("h") * 1e9).cast("long").as("hub_x1e9"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"))
    val totals = scored.agg(sum(col("auth_x1e9")).as("ta"),
      sum(col("hub_x1e9")).as("th"))
    val slack = 1000L // 1e-9 grid residue over ≤1e6 nodes
    scored.crossJoin(broadcast(totals))
      .select(col("node"), col("auth_x1e9"), col("hub_x1e9"),
        col("in_deg"), col("out_deg"),
        (col("auth_x1e9").between(0L, 1000000000L) &&
          col("hub_x1e9").between(0L, 1000000000L) &&
          (col("in_deg") > 0 || col("auth_x1e9") === 0L) &&
          (col("out_deg") > 0 || col("hub_x1e9") === 0L) &&
          abs(col("ta") - 1000000000L) <= slack &&
          abs(col("th") - 1000000000L) <= slack).as("hits_ok"))
      .orderBy(col("auth_x1e9").desc, col("hub_x1e9").desc, col("node"))
  }

  /** q72: PageRank over the REAL extracted link graph — q53's power
    * iteration applied to q71's resolved edges instead of a synthetic
    * integer table, closing the extract → resolve → rank loop a search /
    * crawl-prioritization pipeline runs. Nofollow links are excluded
    * (their original public purpose). `rank_ok` certifies the exact
    * per-node floor of the damped formulation — rank = 0.15/n +
    * 0.85·contrib ≥ 0.15/n, with dangling targets (linked-to urls never
    * crawled) legitimately sitting at the floor; LinkGraphSpec
    * additionally replays the whole iteration against an independent
    * driver-side model. Scale shape: edges distinct once and
    * checkpointed; per iteration one equi-join + one groupBy (q53's
    * shape); node count is the only collect.
    */
  def q72LinkRank(s: SparkSession, dir: String): DataFrame = {
    def round9(c: org.apache.spark.sql.Column) = round(c * 1e9) / 1e9
    val e = linkEdges(s)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val nn = nodes.count().toDouble
    val od = e.groupBy(col("src")).agg(count(lit(1)).cast("double").as("deg"))
    var r = nodes.select(col("node"), round9(lit(1.0) / nn).as("r"))
      .localCheckpoint()
    for (_ <- 1 to 3) {
      val contrib = e.join(r, col("src") === col("node")).join(od, "src")
        .groupBy(col("dst")).agg(sum(col("r") / col("deg")).as("c"))
      r = nodes
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          round9(lit(0.15) / nn + lit(0.85) * coalesce(col("c"), lit(0.0))).as("r"))
        .localCheckpoint()
    }
    val floor = math.floor(0.15 / nn * 1e9).toLong - 1 // grid rounding slack
    r.select(col("node"), round(col("r") * 1e9).cast("long").as("rank_x1e9"))
      .select(col("node"), col("rank_x1e9"),
        (col("rank_x1e9") >= floor && col("rank_x1e9") <= lit(1000000000L))
          .as("rank_ok"))
      .orderBy(col("rank_x1e9").desc, col("node"))
  }

  /** q74: Markdown corpus export — the page rendered as Markdown through
    * the codegen'd `extract_markdown` Expression (the SQL surface a
    * corpus-export user runs), twin-certified against the typed
    * [[graft.core.MarkdownExtractor]] path byte-for-byte per url, with
    * structural no-raw-tag checks folded into the flag. Output carries
    * sha/length/head instead of the full markdown so the driver artifact
    * stays small. Stateless per-row; the semantics themselves are pinned
    * by MarkdownExtractorSpec's golden fixtures.
    */
  def q74Markdown(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    pages(s).createOrReplaceTempView("pages_md")
    val viaSql = s.sql(
      "SELECT url, extract_markdown(html) AS md FROM pages_md")
    val typed = pages(s).select(col("url"), col("html"))
      .withColumn("part_id", lit(0))
      .as[PageSlice]
      .map(p => (p.url, graft.core.MarkdownExtractor.markdown(
        if (p.html == null) Array.emptyByteArray else p.html)))
      .toDF("t_url", "t_md")
    viaSql.join(typed, col("url") === col("t_url"))
      .select(col("url"), sha2(col("md"), 256).as("md_sha"),
        length(col("md")).as("md_len"),
        substring(col("md"), 1, 80).as("md_head"),
        (col("md") === col("t_md") && length(col("md")) > 0 &&
          !col("md").contains("<p>") && !col("md").contains("<div") &&
          !col("md").contains("<script")).as("md_ok"))
      .orderBy(col("url"))
  }

  /** q76: CSS-SELECTOR query surface ([[graft.core.Selector]] through the
    * `html_select` Generator) — the "give me `article > p a[href]`" API an
    * HTML-parser user reaches for first. Certification is three-way per
    * url: (1) the SQL Generator's `a[href]` match count equals the TYPED
    * `Selector.select` count equals an INDEPENDENT relational derivation
    * from the full `html_nodes` stream; (2) the same for a `[attr^=]`
    * prefix test vs a relational LIKE; (3) structural containment
    * invariants a correct matcher cannot violate (`article > p` ⊆
    * `article p` ⊆ `p`, `nav li > a` ⊆ `li a`) plus list additivity
    * (`p, a[href]` = `p` + `a[href]` — disjoint tags). Scale shape: one
    * scanner pass per page per path, counts aggregate per url, the joins
    * are url-keyed.
    */
  def q76Selectors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    pages(s).createOrReplaceTempView("pages_sel")
    val viaSql = s.sql(
      """SELECT p.url, count(m.idx) AS sql_a_href
        |FROM pages_sel p LATERAL VIEW OUTER html_select(p.html, 'a[href]') m
        |GROUP BY p.url""".stripMargin)
    val rel = s.sql(
      """SELECT url,
        |  count(CASE WHEN lower(n.tag) = 'a' AND n.attrs['href'] IS NOT NULL
        |        THEN 1 END) AS rel_a_href,
        |  count(CASE WHEN lower(n.tag) = 'a' AND n.attrs['href'] LIKE '/cat/%'
        |        THEN 1 END) AS rel_cat
        |FROM pages_sel LATERAL VIEW html_nodes(html) n
        |WHERE n.ntype = 'START' GROUP BY url""".stripMargin)
    val typed = pages(s).select(col("url"), col("html"))
      .withColumn("part_id", lit(0))
      .as[PageSlice]
      .map { p =>
        val nodes = HtmlScanner.parse(
          if (p.html == null) Array.emptyByteArray else p.html)
        def c(q: String) = graft.core.Selector.select(nodes, q).length
        (p.url, c("a[href]"), c("a[href^='/cat/']"), c("p"), c("article p"),
          c("article > p"), c("li a"), c("nav li > a"), c("p, a[href]"))
      }
      .toDF("t_url", "t_a_href", "t_cat", "t_p", "t_art_p", "t_art_child_p",
        "t_li_a", "t_nav_li_a", "t_p_or_a")
    viaSql.join(rel, Seq("url"))
      .join(typed, col("url") === col("t_url"))
      .select(col("url"), col("sql_a_href"), col("t_cat").as("n_cat"),
        col("t_p").as("n_p"), col("t_art_p").as("n_article_p"),
        col("t_art_child_p").as("n_article_child_p"),
        (col("sql_a_href") === col("t_a_href") &&
          col("t_a_href") === col("rel_a_href") &&
          col("t_cat") === col("rel_cat") &&
          col("t_art_child_p") <= col("t_art_p") &&
          col("t_art_p") <= col("t_p") &&
          col("t_nav_li_a") <= col("t_li_a") &&
          col("t_p_or_a") === col("t_p") + col("t_a_href")).as("sel_ok"))
      .orderBy(col("url"))
  }

  /** q77: TABLE extraction ([[graft.core.TableExtractor]] through the
    * `html_tables` Generator) — the structured-data leg of web mining.
    * Truth is PLANTED: each synthesized doc renders known cell grids in
    * three markup styles (well-formed with `thead`/`th`, sloppy with NO
    * `</td>`/`</tr>` closes — the implicit-close path real crawl data
    * exercises constantly — and colspan'd first columns), and the
    * extracted (table, row, col, header, text) rows must reproduce the
    * planted grid exactly, checked by a full-outer join (rows missing
    * from either side fail the flag). Scale shape: stateless per-row
    * explode, one (url, grid-key) join at planted-truth granularity.
    */
  def q77Tables(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    // (url, html, expected cells) — grids are deterministic in the doc id
    val docs = s.range(0L, 500L).as[Long].map { id =>
      val sb = new java.lang.StringBuilder()
      val exp = Seq.newBuilder[(Int, Int, Int, Boolean, String)]
      sb.append("<html><body><p>prologue ").append(id).append("</p>")
      val nTables = 1 + (id % 3).toInt
      var t = 0
      while (t < nTables) {
        val rows = 2 + ((id + t) % 3).toInt
        val cols = 2 + ((id + t) % 2).toInt
        val style = ((id + t) % 3).toInt
        sb.append("<table>")
        if (style == 0) { // well-formed, thead + th header row
          sb.append("<thead><tr>")
          var k = 0
          while (k < cols) {
            sb.append("<th>h").append(id).append('-').append(t).append('-')
              .append(k).append("</th>")
            exp += ((t, 0, k, true, s"h$id-$t-$k"))
            k += 1
          }
          sb.append("</tr></thead><tbody>")
          var r = 1
          while (r < rows) {
            sb.append("<tr>")
            k = 0
            while (k < cols) {
              sb.append("<td>v").append(id).append('-').append(t).append('-')
                .append(r).append('-').append(k).append("</td>")
              exp += ((t, r, k, false, s"v$id-$t-$r-$k"))
              k += 1
            }
            sb.append("</tr>")
            r += 1
          }
          sb.append("</tbody>")
        } else if (style == 1) { // sloppy: no </td>, no </tr>
          var r = 0
          while (r < rows) {
            sb.append("<tr>")
            var k = 0
            while (k < cols) {
              sb.append("<td>v").append(id).append('-').append(t).append('-')
                .append(r).append('-').append(k)
              exp += ((t, r, k, false, s"v$id-$t-$r-$k"))
              k += 1
            }
            r += 1
          }
        } else { // colspan'd first column: grid cols 0, 2, 3, …
          var r = 0
          while (r < rows) {
            sb.append("<tr>")
            var k = 0
            var gc = 0
            while (k < cols) {
              if (k == 0) { sb.append("<td colspan=2>"); }
              else sb.append("<td>")
              sb.append('v').append(id).append('-').append(t).append('-')
                .append(r).append('-').append(k).append("</td>")
              exp += ((t, r, gc, false, s"v$id-$t-$r-$k"))
              gc += (if (k == 0) 2 else 1)
              k += 1
            }
            sb.append("</tr>")
            r += 1
          }
        }
        sb.append("</table>")
        t += 1
      }
      sb.append("<p>epilogue &amp; ").append(id).append("</p></body></html>")
      (s"table://doc/$id", sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        exp.result())
    }.toDF("url", "html", "exp")
    docs.createOrReplaceTempView("pages_tbl")
    val got = s.sql(
      """SELECT url, t.table_idx, t.row, t.col, t.header, t.text
        |FROM pages_tbl LATERAL VIEW html_tables(html) t""".stripMargin)
    val exp = docs.select(col("url").as("e_url"), explode(col("exp")).as("e"))
      .select(col("e_url"), col("e._1").as("e_tbl"), col("e._2").as("e_row"),
        col("e._3").as("e_col"), col("e._4").as("e_hdr"), col("e._5").as("e_text"))
    got.join(exp,
        col("url") === col("e_url") && col("table_idx") === col("e_tbl") &&
          col("row") === col("e_row") && col("col") === col("e_col"), "full_outer")
      .select(
        coalesce(col("url"), col("e_url")).as("url"),
        coalesce(col("table_idx"), col("e_tbl")).as("table_idx"),
        coalesce(col("row"), col("e_row")).as("row"),
        coalesce(col("col"), col("e_col")).as("col"),
        coalesce(col("text"), col("e_text")).as("text"),
        (col("url").isNotNull && col("e_url").isNotNull &&
          col("header") === col("e_hdr") && col("text") === col("e_text"))
          .as("tbl_ok"))
      .orderBy(col("url"), col("table_idx"), col("row"), col("col"))
  }

  /** q78: RSS/Atom FEED parsing ([[graft.core.FeedParser]]) — the
    * freshness-discovery leg of a crawl pipeline (poll feeds between full
    * crawls, frontier the new links). Truth is PLANTED: each synthesized
    * doc renders a known item list as either RSS 2.0 (CDATA titles,
    * guid-or-link fallback, pubDate) or Atom (href-attribute links with a
    * rel=self decoy before the alternate, updated timestamps), and every
    * parsed field must reproduce the planted item exactly via a
    * full-outer join on (url, item ordinal). Scale shape: stateless
    * per-row parse, one planted-grain join.
    */
  def q78Feeds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = s.range(0L, 400L).as[Long].map { id =>
      val atom = id % 2 == 1
      val n = 1 + (id % 4).toInt
      val sb = new java.lang.StringBuilder()
      val exp = Seq.newBuilder[(Int, String, String, String, String, String)]
      if (atom) {
        sb.append("<feed xmlns=\"http://www.w3.org/2005/Atom\"><title>feed ")
          .append(id).append("</title>\n")
        var k = 0
        while (k < n) {
          val link = s"https://f$id.example/e$k"
          sb.append("<entry><title>entry ").append(id).append('-').append(k)
            .append("</title><id>tag:f").append(id).append(':').append(k)
            .append("</id><link href=\"https://f").append(id)
            .append(".example/self\" rel=\"self\"/><link href=\"").append(link)
            .append("\" rel=\"alternate\"/><updated>2024-01-0")
            .append(1 + k % 9).append("T00:00:00Z</updated><summary>s")
            .append(k).append("</summary></entry>\n")
          exp += ((k, s"entry $id-$k", link, s"tag:f$id:$k",
            s"2024-01-0${1 + k % 9}T00:00:00Z", s"s$k"))
          k += 1
        }
        sb.append("</feed>")
      } else {
        sb.append("<rss version=\"2.0\"><channel><title>feed ").append(id)
          .append("</title>\n")
        var k = 0
        while (k < n) {
          val link = s"https://f$id.example/p$k"
          val hasGuid = k % 2 == 1
          sb.append("<item><title><![CDATA[post ").append(id).append('-')
            .append(k).append(" & more]]></title><link>").append(link)
            .append("</link>")
          if (hasGuid) sb.append("<guid>g-").append(id).append('-').append(k).append("</guid>")
          sb.append("<pubDate>Mon, 0").append(1 + k % 9)
            .append(" Jan 2024 00:00:00 GMT</pubDate><description>d &amp; ")
            .append(k).append("</description></item>\n")
          exp += ((k, s"post $id-$k & more", link,
            if (hasGuid) s"g-$id-$k" else link,
            s"Mon, 0${1 + k % 9} Jan 2024 00:00:00 GMT", s"d & $k"))
          k += 1
        }
        sb.append("</channel></rss>")
      }
      (s"feed://doc/$id", if (atom) "atom" else "rss", s"feed $id",
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        exp.result())
    }.toDF("url", "exp_kind", "exp_title", "xml", "exp")
    val parsed = docs.select(col("url").as("p_url"), col("xml")).as[(String, Array[Byte])]
      .flatMap { case (u, xml) =>
        val f = graft.core.FeedParser.parse(xml)
        f.items.zipWithIndex.map { case (it, k) =>
          (u, f.kind, f.title, k, it.title, it.link, it.id, it.ts, it.summary)
        }
      }
      .toDF("p_url", "kind", "title", "k", "i_title", "i_link", "i_id", "i_ts", "i_sum")
    val exp = docs.select(col("url"), col("exp_kind"), col("exp_title"),
        explode(col("exp")).as("e"))
      .select(col("url"), col("exp_kind"), col("exp_title"),
        col("e._1").as("e_k"), col("e._2").as("e_title"), col("e._3").as("e_link"),
        col("e._4").as("e_id"), col("e._5").as("e_ts"), col("e._6").as("e_sum"))
    exp.join(parsed, col("url") === col("p_url") && col("e_k") === col("k"), "full_outer")
      .select(
        coalesce(col("url"), col("p_url")).as("url"),
        coalesce(col("e_k"), col("k")).as("item"),
        coalesce(col("i_link"), col("e_link")).as("link"),
        (col("url").isNotNull && col("p_url").isNotNull &&
          col("kind") === col("exp_kind") && col("title") === col("exp_title") &&
          col("i_title") === col("e_title") && col("i_link") === col("e_link") &&
          col("i_id") === col("e_id") && col("i_ts") === col("e_ts") &&
          col("i_sum") === col("e_sum")).as("feed_ok"))
      .orderBy(col("url"), col("item"))
  }

  /** q79: CHARSET sniff + transcode ([[graft.core.CharsetSniffer]]) made
    * first-class — real crawl corpora are NOT all UTF-8 (the input_hint's
    * Common-Crawl shape), and a wrong decode silently corrupts every
    * downstream hash/dedup/token op. Truth is PLANTED: the same known
    * text is rendered in five wire forms (bare UTF-8; BOM'd UTF-8 with a
    * meta tag; meta-declared ISO-8859-1; http-equiv windows-1252 with a
    * €-sign that only cp1252 maps at 0x80; BOM'd UTF-16LE), and per doc
    * the sniffed name must equal the planted declaration AND the full
    * extract(toUtf8(bytes)) must be byte-identical to extracting the
    * UTF-8 reference rendering — transcode-then-scan equals
    * native-UTF-8-scan, end to end. Scale shape: stateless per-row.
    */
  def q79Charset(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.range(0L, 500L).as[Long].map { id =>
      val style = (id % 5).toInt
      // Latin-1-encodable base text; € only where the charset can carry it
      val text = s"Café número $id - piñata ${id * 7}" +
        (if (style != 2) " €9" else " E9")
      def page(decl: String) =
        s"<html><head>$decl<title>T$id</title></head><body><nav>skip</nav>" +
          s"<p>$text</p></body></html>"
      val utf8Ref = page("").getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val (bytes, expSniff) = style match {
        case 0 => (utf8Ref, "")
        case 1 =>
          val body = page("<meta charset=\"utf-8\">")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          (Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ body, "utf-8")
        case 2 =>
          (page("<meta charset=iso-8859-1>")
            .getBytes(java.nio.charset.Charset.forName("ISO-8859-1")), "iso-8859-1")
        case 3 =>
          (page("<meta http-equiv=\"Content-Type\" " +
            "content=\"text/html; charset=windows-1252\">")
            .getBytes(java.nio.charset.Charset.forName("windows-1252")), "windows-1252")
        case _ =>
          val body = page("").getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
          (Array[Byte](0xFF.toByte, 0xFE.toByte) ++ body, "utf-16le")
      }
      val sniffed = graft.core.CharsetSniffer.sniff(bytes)
        .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("")
      val got = graft.core.Extractor.extractBytes(
        graft.core.CharsetSniffer.toUtf8(bytes)).text
      val want = graft.core.Extractor.extractBytes(utf8Ref).text
      // the declaration tag itself must not leak into the extraction
      (s"charset://doc/$id", style, sniffed, got.length,
        sniffed == expSniff && got == want && got.contains("Café") &&
          !got.contains("charset"))
    }.toDF("url", "style", "sniffed", "text_chars", "charset_ok")
      .orderBy(col("url"))
  }

  /** q108: rel=canonical CONSOLIDATION + robots-meta page gate — the
    * crawl-side dedup a web pipeline must run BEFORE any content dedup:
    * the site itself declares which of its N urls is the page
    * (`<link rel="canonical">`), and whether the page may be kept at all
    * (`<meta name="robots" content="noindex">`). Canonical links and
    * robots metas are planted deterministically into the synthesized
    * heads (ids with id%5≠0 point at the id−id%5 master via a RELATIVE
    * href — exercising RFC 3986 resolution; ids with id%11=0 carry
    * noindex), then recovered with [[graft.core.LinkExtractor.headDirectives]]
    * (one early-stop scan bounded by the head) and consolidated: every
    * page maps to `target` = its resolved canonical (or itself), and the
    * group size is the variant count a consolidation pass would collapse.
    *
    * `cons_ok` certifies four independent ways: the scanner's href
    * equals a `regexp_extract` twin over the raw html; the noindex bit
    * equals its substring twin; the resolved absolute target equals the
    * PLANTED truth reconstructed from url arithmetic alone; and every
    * non-null target is a `url_canon` fixpoint.
    *
    * Scale shape: the directive scan never leaves the narrow map stage
    * (the html blob is not shuffled — only urls and hrefs travel); the
    * consolidation is one target-keyed window. At 100 TB the target key
    * is url-cardinality with bounded group sizes (a site's variant fan-in),
    * so no hot key; noindex pages drop before the shuffle in a real run.
    */
  def q108Canonical(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    val planted = pages(s).select(col("url"), col("html"))
      .withColumn("part_id", lit(0)).as[PageSlice]
      .map { p =>
        val id = p.url.substring(p.url.lastIndexOf('/') + 1).toLong
        val ins = new java.lang.StringBuilder
        if (id % 5 != 0)
          ins.append("<link rel=\"canonical\" href=\"/page/")
            .append(id - id % 5).append("\">")
        if (id % 11 == 0)
          ins.append("<meta name=\"robots\" content=\"noindex, follow\">")
        val h = new String(p.html, java.nio.charset.StandardCharsets.UTF_8)
        val headAt = h.indexOf("<head>")
        val at = if (headAt >= 0) headAt + "<head>".length else 0 // headless: prepend
        val out = h.substring(0, at) + ins + h.substring(at)
        val hd = graft.core.LinkExtractor.headDirectives(
          out.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val abs = hd.canonical.flatMap(c => graft.core.UrlCanon.resolve(p.url, c))
        (p.url, out, hd.canonical.orNull, abs.orNull, hd.noindex)
      }.toDF("url", "html_s", "canon_href", "abs_canon", "noindex")
    val id = regexp_extract(col("url"), "([0-9]+)$", 1).cast("long")
    val master = (id - pmod(id, lit(5L))).cast("string")
    val expAbs = when(pmod(id, lit(5L)) =!= 0,
      concat(regexp_replace(col("url"), "/page/[0-9]+$", "/page/"), master))
    val rxHref = regexp_extract(col("html_s"),
      "<link rel=\"canonical\" href=\"([^\"]*)\"", 1)
    val rxNoindex = col("html_s").contains("content=\"noindex")
    val consOk = (coalesce(col("canon_href"), lit("")) === rxHref) &&
      (col("noindex") === rxNoindex) &&
      (col("abs_canon") <=> expAbs) &&
      (col("noindex") === (pmod(id, lit(11L)) === 0)) &&
      (col("abs_canon").isNull ||
        expr("url_canon(abs_canon)") === col("abs_canon"))
    val perPage = planted.select(col("url"), col("canon_href"),
      col("abs_canon"), col("noindex"),
      coalesce(col("abs_canon"), col("url")).as("target"),
      consOk.as("cons_ok"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("target"))
    perPage
      .withColumn("is_master", col("abs_canon").isNull)
      .withColumn("n_variants", count(lit(1)).over(w))
      .orderBy(col("url"))
  }

  /** q145: PERCEPTUAL IMAGE NEAR-DUP DETECTION — dHash + banded hamming
    * join. Every image reduces, inside the scan stage, to a 64-bit
    * difference hash ([[Multimodal.dhash64]]: ONE streaming decode pass
    * into a 9×8 block-mean luma grid, then 64 horizontal gradient signs
    * compared as exact integer cross-products). Near-dups are then found
    * EXACTLY for radius ≤ 3 by the pigeonhole band join the text side
    * uses for SimHash (q23/q41): 4 disjoint 16-bit bands — any pair
    * within hamming 3 leaves ≥ 1 band untouched — then exact `bit_count`
    * on candidates only. The image blob itself never shuffles: only
    * (url, 8-byte hash) rows leave the scan stage, so the join cost is
    * independent of image size at 100 TB.
    *
    * Planted truth ([[graft.sources.MediaSynth.neardupImagesDF]]): per
    * group a base PNG, a sum-cancelling-noise PNG (planted hamming 0), a
    * one-block-bumped PNG (planted hamming ≤ 2), and the SAME picture
    * re-encoded as a BMP — the cross-container duplicate that certifies
    * the hash is container-independent — plus unrelated singletons.
    * `img_ok` is a full-outer equality of detected vs planted pairs:
    * all-true ⇔ exact recall AND exact precision on the planted corpus.
    */
  def q145ImageNeardup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val imgs = graft.sources.MediaSynth.neardupImagesDF(s, 20, 12)
    val hashed = imgs.select(col("url"), col("group_id"), col("bytes"))
      .as[(String, Long, Array[Byte])]
      .map { case (url, gid, bytes) =>
        (url, gid, Multimodal.dhash64(bytes).getOrElse(Long.MinValue))
      }
      .toDF("url", "group_id", "dhash")
      .filter(col("dhash") =!= Long.MinValue)
      // tiny signature table, materialized once for both self-join sides
      // (the q63 discipline)
      .localCheckpoint()
    val bands = hashed.select(col("url"), col("group_id"), col("dhash"),
      explode(array((0 until 4).map(i => struct(lit(i).as("band"),
        shiftrightunsigned(col("dhash"), i * 16)
          .bitwiseAND(lit(0xFFFFL)).as("key"))): _*)).as("bk"))
      .select(col("url"), col("group_id"), col("dhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.url") < col("b.url"))
      .select(col("a.url").as("url_a"), col("b.url").as("url_b"),
        col("a.group_id").as("ga"), col("b.group_id").as("gb"),
        col("a.dhash").as("ha"), col("b.dhash").as("hb"))
      .distinct()
    val detected = cand
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int"))
      .filter(col("hamming") <= 3)
    val members = hashed.filter(col("group_id") >= 0)
      .select(col("url"), col("group_id"))
    val planted = members.as("x").join(members.as("y"),
        col("x.group_id") === col("y.group_id") &&
          col("x.url") < col("y.url"))
      .select(col("x.url").as("p_a"), col("y.url").as("p_b"))
    detected.join(planted,
        col("url_a") === col("p_a") && col("url_b") === col("p_b"),
        "full_outer")
      .select(
        coalesce(col("url_a"), col("p_a")).as("url_a"),
        coalesce(col("url_b"), col("p_b")).as("url_b"),
        coalesce(col("hamming"), lit(-1)).as("hamming"),
        (col("url_a").isNotNull && col("p_a").isNotNull &&
          col("ga") === col("gb")).as("img_ok"))
      .orderBy(col("url_a"), col("url_b"))
  }

  /** q146: DOCUMENT OUTLINE EXTRACTION — hierarchical section numbering
    * (1, 1.1, 1.1.1, 1.2, 2, …) over the h1–h6 heading sequence of every
    * page, the structural skeleton a layout-aware chunker or TOC builder
    * consumes. Skipped levels render as 0 (an h3 directly under an h1 is
    * `1.0.1`), headings before any ancestor count from 0 (`0.1`) — both
    * conventions pinned by planted literals.
    *
    * Two INDEPENDENT implementations certify each other (`outline_ok`):
    * a relational one — for each level k, a running `Σ[lvl<k]` window
    * assigns the reset-group and a running `Σ[lvl=k]` within (url, group)
    * numbers it, the label being the first `lvl` components — and a
    * sequential counter fold per url (groupByKey; the obvious
    * single-pass algorithm). Window partitions all share the url prefix,
    * so a url-bucketed layout co-locates every one of them; heading rows
    * are O(10) per document, the only thing shuffled.
    */
  def q146HeadingOutline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // hand-planted docs with LITERAL expected outlines (skipped-level and
    // orphan-heading conventions)
    val plantedDocs = Seq(
      ("plant://outline/a",
        "<h1>A</h1><p>x</p><h2>B</h2><h3>C</h3><h2>D</h2><h1>E</h1><h2>F</h2>"),
      ("plant://outline/b",
        "<h2>pre</h2><h1>A</h1><h3>deep</h3><h3>deep2</h3><h2>up</h2>"),
      ("plant://outline/c", "<p>no headings at all</p>"))
    val expected = Seq(
      ("plant://outline/a", Seq("1", "1.1", "1.1.1", "1.2", "2", "2.1")),
      ("plant://outline/b", Seq("0.1", "1", "1.0.1", "1.0.2", "1.1")))
    // seed-derived deep-outline corpus: 60 docs of 12 headings over
    // levels 1..4 — volume for the twin beyond the synth pages' single h1
    val deepDocs = (0 until 60).map { i =>
      val sb = new StringBuilder("<html><body>")
      for (j <- 0 until 12) {
        val lvl = 1 + Math.floorMod(i * 31 + j * 17 + (i * j) % 7, 4)
        sb.append(s"<h$lvl>s$j</h$lvl><p>t</p>")
      }
      (f"plant://outline/deep/$i%02d", sb.append("</body></html>").toString)
    }
    val input = pages(s).select(col("url"), col("html"))
      .unionByName((plantedDocs ++ deepDocs).toDF("url", "html_str")
        .select(col("url"), col("html_str").cast("binary").as("html")))
    val hset = Set("h1", "h2", "h3", "h4", "h5", "h6")
    val heads = input.as[(String, Array[Byte])].flatMap { case (url, html) =>
      val bytes = if (html == null) Array.emptyByteArray else html
      HtmlScanner.parse(bytes).iterator.collect {
        case nd if nd.nodeType == NodeType.StartTag &&
            hset(nd.tagName.toLowerCase) =>
          (url, nd.idx, nd.tagName.toLowerCase.charAt(1) - '0')
      }
    }.toDF("url", "idx", "lvl")
    // relational path: per level k, reset-group then running rank
    val wBase = Window.partitionBy(col("url")).orderBy(col("idx"))
    var df = heads
    for (k <- 1 to 6)
      df = df.withColumn(s"g$k",
        sum(when(col("lvl") < k, 1).otherwise(0)).over(wBase))
    for (k <- 1 to 6)
      df = df.withColumn(s"c$k",
        sum(when(col("lvl") === k, 1).otherwise(0))
          .over(Window.partitionBy(col("url"), col(s"g$k")).orderBy(col("idx"))))
    val sqlPath = df.withColumn("label",
        concat_ws(".", slice(
          transform(array((1 to 6).map(k => col(s"c$k")): _*),
            x => x.cast("string")),
          lit(1), col("lvl"))))
      .withColumn("rank", row_number().over(wBase))
      .withColumn("n_heads", count(lit(1)).over(Window.partitionBy(col("url"))))
      .select(col("url"), col("idx"), col("lvl"), col("label"),
        col("rank"), col("n_heads"))
    // independent sequential-counter reference (the obvious algorithm)
    val typed = heads.as[(String, Int, Int)].groupByKey(_._1)
      .flatMapGroups { (url: String, it: Iterator[(String, Int, Int)]) =>
        val hs = it.toArray.sortBy(_._2)
        val cnt = new Array[Int](6)
        hs.iterator.map { case (_, idx, lvl) =>
          cnt(lvl - 1) += 1
          var j = lvl
          while (j < 6) { cnt(j) = 0; j += 1 }
          (url, idx, cnt.take(lvl).mkString("."))
        }
      }.toDF("t_url", "t_idx", "t_label")
    val exp = expected.flatMap { case (u, ls) =>
      ls.zipWithIndex.map { case (l, i) => (u, i + 1, l, ls.length) }
    }.toDF("e_url", "e_rank", "e_label", "e_n")
    sqlPath
      .join(typed, col("url") === col("t_url") && col("idx") === col("t_idx"))
      .join(exp, col("url") === col("e_url") && col("rank") === col("e_rank"),
        "left")
      .select(col("url"), col("idx"), col("lvl"), col("label"),
        (col("label") === col("t_label") &&
          (col("e_label").isNull ||
            (col("e_label") === col("label") && col("e_n") === col("n_heads"))))
          .as("outline_ok"))
      .orderBy(col("url"), col("idx"))
  }

  /** q148: AUDIO NEAR-DUP DETECTION — envelope hash + banded hamming
    * join, the q145 discipline on the audio axis. Every PCM clip reduces
    * in the scan stage to a 64-bit envelope hash
    * ([[Multimodal.ahash64]]: 65 equal time windows of Σ|sample|, 64
    * gradient signs by exact integer cross-products) that is invariant
    * by construction to uniform VOLUME scaling (every window scales
    * together) and to micro TIME-JITTER within a window (order-free
    * sums) — the two transformations a re-encoded copy of the same
    * material actually undergoes. Near-dups via the 4×16-bit pigeonhole
    * band join, exact for radius ≤ 3, `bit_count` on candidates only;
    * the waveform never shuffles.
    *
    * Planted truth ([[graft.sources.MediaSynth.neardupAudioDF]]): per
    * group the base clip, a 5/8-volume re-master (planted hamming 0), a
    * within-window jitter variant (hamming 0), a one-window level bump
    * (hamming ≤ 2), plus unrelated singletons. `aud_ok` = full-outer
    * detected==planted equality: exact recall AND precision.
    */
  /** q157: EXIF/TIFF metadata extraction ([[Multimodal.exifMeta]]) over a
    * mixed corpus of standalone TIFFs, Exif-carrying JPEGs (both byte
    * orders, varied orientation, GPS planted on half) and EXIF-free
    * blobs — the metadata sibling of q33's content decode. The
    * curation-relevant outputs: orientation (rotation-aware dedup/
    * display), capture timestamp, camera make, and the GPS-presence bit
    * every public corpus must scrub before release. `exif_ok` compares
    * all eight fields to the planted truth (EXIF-free rows must yield
    * nothing); MultimodalSpec cross-checks the same parse against the
    * JDK's independent ImageIO TIFF decoder (pixels, dims AND the
    * 271/274/306 metadata-tree fields) plus truncation/bit-flip fuzz.
    *
    * Scale shape: stateless per-row parse; the blob never shuffles —
    * only the parsed scalar fields reach the edge ORDER BY.
    */
  def q157Exif(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = graft.sources.MediaSynth.exifDF(s, 60)
    docs.select(col("url"), col("bytes"), col("exp_container"),
        col("exp_big"), col("exp_orient"), col("exp_w"), col("exp_h"),
        col("exp_make"), col("exp_dt"), col("exp_gps"))
      .as[(String, Array[Byte], String, Boolean, Int, Int, Int, String, String, Boolean)]
      .map { case (url, bytes, ec, eb, eo, ew, eh, em, ed, eg) =>
        Multimodal.exifMeta(bytes) match {
          case Some(m) =>
            (url, m.container, m.bigEndian, m.orientation, m.width,
              m.height, m.make, m.dateTime, m.gpsPresent,
              ec.nonEmpty && m.container == ec && m.bigEndian == eb &&
                m.orientation == eo && m.width == ew && m.height == eh &&
                m.make == em && m.dateTime == ed && m.gpsPresent == eg)
          case None =>
            (url, "", false, 0, 0, 0, "", "", false, ec.isEmpty)
        }
      }
      .toDF("url", "container", "big_endian", "orientation", "width",
        "height", "make", "datetime", "gps_present", "exif_ok")
      .orderBy(col("url"))
  }

  /** q160: SUBTITLE TEXT EXTRACTION ([[graft.core.SubtitleParser]]) —
    * SRT and WebVTT caption files parsed into cues and clean transcript
    * text (captions are punctuated human prose, a prized webtext source
    * crawls surface next to the media files the multimodal family
    * header-parses). Fixtures plant the CLEAN text first and wrap it in
    * each format's markup (`<i>`/`<c.cls>`/karaoke stamps/`{\an8}`/
    * `&amp;`/NOTE blocks/cue ids/cue settings/a malformed timing line),
    * so `sub_ok` proves the parser recovers the plant: kind, cue count,
    * summed duration AND the md5 of the rebuilt transcript.
    *
    * Scale shape: stateless per-row parse; only scalars + the text md5
    * leave the scan.
    */
  def q160Subtitles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.sources.MediaSynth.subtitleDF(s, 60)
      .as[graft.sources.MediaSynth.SubDoc]
      .map { d =>
        val cues = graft.core.SubtitleParser.parse(d.bytes)
        val kind = graft.core.SubtitleParser.kind(d.bytes)
        val text = graft.core.SubtitleParser.text(d.bytes)
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
        (d.url, kind, cues.length.toLong,
          cues.map(c => c.endMs - c.startMs).sum, md5,
          kind == d.exp_kind && cues.length == d.exp_cues &&
            cues.map(c => c.endMs - c.startMs).sum == d.exp_dur_ms &&
            text == d.exp_text)
      }
      .toDF("url", "kind", "n_cues", "dur_ms", "text_md5", "sub_ok")
      .orderBy(col("url"))
  }

  /** q161: MP3 METADATA ([[Multimodal.mp3Meta]]) — ID3v2 title/artist
    * (both tag majors, latin-1/UTF-16/UTF-8 text encodings) plus
    * frame-header bitrate/samplerate/channel-mode and the CBR duration
    * estimate; the audio sibling of q157's EXIF leg. Non-MP3 blobs must
    * yield nothing. `mp3_ok` compares every field to the planted truth.
    */
  def q161Mp3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.sources.MediaSynth.mp3DF(s, 60)
      .as[graft.sources.MediaSynth.Mp3Doc]
      .map { d =>
        Multimodal.mp3Meta(d.bytes) match {
          case Some(m) =>
            (d.url, m.bitrateKbps, m.sampleRate, m.channels, m.durMs,
              m.title, m.artist,
              d.exp_kbps > 0 && m.bitrateKbps == d.exp_kbps &&
                m.sampleRate == d.exp_rate && m.channels == d.exp_ch &&
                m.durMs == d.exp_dur_ms && m.title == d.exp_title &&
                m.artist == d.exp_artist)
          case None =>
            (d.url, 0, 0, 0, 0L, "", "", d.exp_kbps == 0)
        }
      }
      .toDF("url", "kbps", "sample_rate", "channels", "dur_ms", "title",
        "artist", "mp3_ok")
      .orderBy(col("url"))
  }

  /** q164: CONTENT-TYPE DISPATCH extraction ([[graft.core.AnyExtract]])
    * — one entry point over the mixed payloads a real crawl segment
    * interleaves: HTML pages, PDFs, RSS/Atom feeds, subtitle assets,
    * plus junk and empty blobs. Sniffing is structural (magic bytes or a
    * successful skeleton parse), never extension-based. Each branch
    * delegates to its separately-certified extractor, so `any_ok`
    * certifies exactly the ROUTING: the sniffed kind matches the planted
    * kind AND the text equals what the format's own extractor produces
    * (PDF/subtitle/feed rows carry generator-side ground truth).
    */
  def q164ExtractAny(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.range(0L, 500L).as[Long].map { id =>
      val (url, bytes, expKind, expText) = (id % 5) match {
        case 0 =>
          val p = PagesSynth.pageFor(id)
          (p.url, p.html, "html",
            graft.core.Extractor.extractBytes(p.html).text)
        case 1 =>
          val pdf = graft.sources.PdfSynth.pdfFor(id, id % 4 == 1)
          (f"any://pdf/$id%05d.bin", pdf, "pdf",
            graft.sources.PdfSynth.textFor(id))
        case 2 =>
          val d = graft.sources.MediaSynth.subDocFor(id.toInt)
          (d.url, d.bytes, "subtitle", d.exp_text)
        case 3 =>
          val xml = s"<rss><channel><title>c$id</title>" +
            s"<item><title>item $id a</title><description>sum $id a</description></item>" +
            s"<item><title>item $id b</title><description>sum $id b</description></item>" +
            "</channel></rss>"
          (f"any://feed/$id%05d.bin", xml.getBytes("UTF-8"), "feed",
            s"item $id a\nsum $id a\nitem $id b\nsum $id b")
        case _ =>
          if (id % 20 == 4) (f"any://junk/$id%05d.bin", Array.emptyByteArray, "empty", "")
          else (f"any://junk/$id%05d.bin", s"plain payload $id 0123456789".getBytes("UTF-8"),
            "other", "")
      }
      val (kind, text) = graft.core.AnyExtract.extract(bytes)
      (url, kind, text.length.toLong, kind == expKind && text == expText)
    }.toDF("url", "kind", "text_chars", "any_ok")
      .orderBy(col("url"))
  }

  /** Block-level element names that delimit text blocks for q165 —
    * boilerpipe's segmentation grain.
    */
  private val BpBlockTags = Seq("p", "div", "h1", "h2", "h3", "h4", "h5",
    "h6", "ul", "ol", "li", "table", "tr", "td", "nav", "footer", "header",
    "article", "section", "blockquote", "br", "form", "title", "body")

  /** q165: DENSITOMETRIC boilerplate classification (Kohlschütter,
    * Fankhauser & Nejdl, "Boilerplate Detection using Shallow Text
    * Features", WSDM 2010 — the boilerpipe NumWordsRulesClassifier
    * stump): segment each page's node stream into text blocks at
    * block-level tags, compute per-block word count and LINK DENSITY
    * (words inside `<a>` ÷ words), then classify with the published
    * decision stump — curr ld > 1/3 ⇒ boilerplate; prev ld > 5/9 ⇒
    * content iff curr > 40 words or next > 17; else content iff curr >
    * 16 or next > 15 or prev > 4. All thresholds are the paper's own
    * rationals, so every comparison is exact integer (3·lw > w,
    * 9·plw > 5·pw). This is the feature-based complement to the
    * extractor's tag-rule boilerplate stripping — the classifier that
    * works on pages whose chrome is NOT inside nav/footer tags.
    *
    * Certification (`bp_ok`, q146's twin discipline): the relational
    * path — ONE url-keyed Exchange serving three running sums (block id,
    * `<a>` nesting, raw-text nesting) + one block rollup + one lag/lead
    * window — must md5-equal an independent sequential per-page fold
    * over the same scanner stream, block-for-block.
    */
  def q165Boilerpipe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftExtensions.register(s)
    pages(s).createOrReplaceTempView("pages_bp")
    val nodes = s.sql(
      """SELECT url, n.idx, n.ntype, n.tag, n.text
        |FROM pages_bp LATERAL VIEW html_nodes(html) n""".stripMargin)
    val w = Window.partitionBy(col("url")).orderBy(col("idx"))
    val anno = nodes
      .withColumn("blk", sum(when(col("ntype").isin("START", "CLOSE") &&
        col("tag").isin(BpBlockTags: _*), 1).otherwise(0)).over(w))
      .withColumn("in_a",
        sum(when(col("ntype") === "START" && col("tag") === "a", 1)
          .when(col("ntype") === "CLOSE" && col("tag") === "a", -1)
          .otherwise(0)).over(w))
      .withColumn("in_raw",
        sum(when(col("ntype") === "START" && col("tag").isin("script", "style"), 1)
          .when(col("ntype") === "CLOSE" && col("tag").isin("script", "style"), -1)
          .otherwise(0)).over(w))
    val blocks = anno.filter(col("ntype") === "TEXT" && col("in_raw") <= 0)
      // count non-empty split tokens: immune to the Spark-trim (space
      // only) vs Java-trim (all controls) divergence at text-node edges
      .withColumn("wcnt",
        size(filter(split(col("text"), TextOps.WS), x => length(x) > 0))
          .cast("long"))
      .filter(col("wcnt") > 0)
      .groupBy(col("url"), col("blk"))
      .agg(sum(col("wcnt")).as("words"),
        sum(when(col("in_a") > 0, col("wcnt")).otherwise(0L)).as("lw"))
    val bw = Window.partitionBy(col("url")).orderBy(col("blk"))
    val cls = blocks
      .withColumn("pw", coalesce(lag(col("words"), 1).over(bw), lit(0L)))
      .withColumn("plw", coalesce(lag(col("lw"), 1).over(bw), lit(0L)))
      .withColumn("nw", coalesce(lead(col("words"), 1).over(bw), lit(0L)))
      .withColumn("content",
        when(col("lw") * 3 > col("words"), lit(false))
          .otherwise(when(col("plw") * 9 > col("pw") * 5,
            col("words") > 40 || col("nw") > 17)
            .otherwise(col("words") > 16 || col("nw") > 15 || col("pw") > 4)))
    val sig = cls.groupBy(col("url"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("content"), 1L).otherwise(0L)).as("content_blocks"),
        sum(when(col("content"), col("words")).otherwise(0L)).as("content_words"),
        md5(array_join(transform(
          sort_array(collect_list(struct(col("blk"), col("words"), col("lw"),
            col("content")))),
          x => concat_ws(":", x.getField("blk").cast("string"),
            x.getField("words").cast("string"), x.getField("lw").cast("string"),
            x.getField("content").cast("string"))), "|").cast("binary"))
          .as("blocks_md5"))
    val twin = pages(s).select(col("url"), col("html"))
      .as[(String, Array[Byte])]
      .map { case (url, html) => (url, bpSequential(html)) }
      .toDF("t_url", "t_md5")
    sig.join(twin, col("url") === col("t_url"))
      .select(col("url"), col("n_blocks"), col("content_blocks"),
        col("content_words"), (col("blocks_md5") === col("t_md5")).as("bp_ok"))
      .orderBy(col("url"))
  }

  /** The q165 twin: an independent SEQUENTIAL fold over the scanner's
    * node stream — plain counters, no windows, no shared code with the
    * relational path — producing the same per-block
    * `blk:words:lw:content` line and its md5.
    */
  private def bpSequential(html: Array[Byte]): String = {
    val tags = BpBlockTags.toSet
    var blk = 0L
    var inA = 0
    var inRaw = 0
    val order = scala.collection.mutable.ArrayBuffer[Long]()
    val words = scala.collection.mutable.HashMap[Long, Long]()
    val links = scala.collection.mutable.HashMap[Long, Long]()
    for (nd <- HtmlScanner.parse(html)) {
      nd.nodeType match {
        case NodeType.StartTag | NodeType.CloseTag =>
          val t = nd.tagName
          if (tags(t)) blk += 1
          val d = if (nd.nodeType == NodeType.StartTag) 1 else -1
          if (t == "a") inA += d
          if (t == "script" || t == "style") inRaw += d
        case NodeType.Content if inRaw <= 0 =>
          val wc = nd.text.split("[ \t\n\f\r\u000B]+").count(_.nonEmpty)
          if (wc > 0) {
            if (!words.contains(blk)) order += blk
            words(blk) = words.getOrElse(blk, 0L) + wc
            if (inA > 0) links(blk) = links.getOrElse(blk, 0L) + wc
          }
        case _ =>
      }
    }
    val arr = order.sorted.toArray
    val parts = arr.indices.map { i =>
      val b = arr(i)
      val w = words(b)
      val l = links.getOrElse(b, 0L)
      val (pw, pl) =
        if (i > 0) (words(arr(i - 1)), links.getOrElse(arr(i - 1), 0L))
        else (0L, 0L)
      val nw = if (i + 1 < arr.length) words(arr(i + 1)) else 0L
      val content =
        if (l * 3 > w) false
        else if (pl * 9 > pw * 5) w > 40 || nw > 17
        else w > 16 || nw > 15 || pw > 4
      s"$b:$w:$l:$content"
    }
    java.security.MessageDigest.getInstance("MD5")
      .digest(parts.mkString("|").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  def q148AudioNeardup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val auds = graft.sources.MediaSynth.neardupAudioDF(s, 20, 12)
    val hashed = auds.select(col("url"), col("group_id"), col("bytes"))
      .as[(String, Long, Array[Byte])]
      .map { case (url, gid, bytes) =>
        (url, gid, Multimodal.ahash64(bytes).getOrElse(Long.MinValue))
      }
      .toDF("url", "group_id", "ahash")
      .filter(col("ahash") =!= Long.MinValue)
      .localCheckpoint()
    val bands = hashed.select(col("url"), col("group_id"), col("ahash"),
      explode(array((0 until 4).map(i => struct(lit(i).as("band"),
        shiftrightunsigned(col("ahash"), i * 16)
          .bitwiseAND(lit(0xFFFFL)).as("key"))): _*)).as("bk"))
      .select(col("url"), col("group_id"), col("ahash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.url") < col("b.url"))
      .select(col("a.url").as("url_a"), col("b.url").as("url_b"),
        col("a.group_id").as("ga"), col("b.group_id").as("gb"),
        col("a.ahash").as("ha"), col("b.ahash").as("hb"))
      .distinct()
    val detected = cand
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int"))
      .filter(col("hamming") <= 3)
    val members = hashed.filter(col("group_id") >= 0)
      .select(col("url"), col("group_id"))
    val planted = members.as("x").join(members.as("y"),
        col("x.group_id") === col("y.group_id") &&
          col("x.url") < col("y.url"))
      .select(col("x.url").as("p_a"), col("y.url").as("p_b"))
    detected.join(planted,
        col("url_a") === col("p_a") && col("url_b") === col("p_b"),
        "full_outer")
      .select(
        coalesce(col("url_a"), col("p_a")).as("url_a"),
        coalesce(col("url_b"), col("p_b")).as("url_b"),
        coalesce(col("hamming"), lit(-1)).as("hamming"),
        (col("url_a").isNotNull && col("p_a").isNotNull &&
          col("ga") === col("gb")).as("aud_ok"))
      .orderBy(col("url_a"), col("url_b"))
  }

  /** q169: IMAGE–ALT-TEXT PAIR MINING — the LAION-style multimodal
    * harvesting step (Schuhmann et al., NeurIPS 2022 datasets track:
    * image–text pairs from Common Crawl come from exactly this walk):
    * every `<img>` yields (src, entity-decoded alt, figure caption,
    * in_figure), where the caption is the raw concatenation of the TEXT
    * nodes inside the `<figcaption>` of the most recently OPENED
    * `<figure>` (nested/stray markup policy is that one sentence, applied
    * identically in both paths below; stray `</figure>` may drive the
    * depth negative rather than being "fixed").
    *
    * Not SQL-expressible (the scanner is the operator) → self-certifying
    * `pair_ok`: the RELATIONAL path (html_nodes generator → running
    * figure/figcaption depth windows → one groupBy per figure) must agree
    * null-safely on every field with an independent SEQUENTIAL
    * single-pass walker, and the four hand-planted docs must additionally
    * equal their literal expected pairs (entity alt, empty-vs-missing
    * alt, two imgs sharing one caption, img outside any figure, figure
    * with no img yielding nothing). The organic synth pages carry no
    * `<img>` at all — a 2000-page negative control.
    *
    * Scale shape: one generator pass, one url-keyed window, one
    * (url, figure) groupBy, broadcast-joined literal expectations; no
    * all-pairs, no driver loops. At 100 TB this is the extract-stage
    * sibling that feeds image fetch + CLIP-filter stages downstream.
    */
  def q169AltText(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftExtensions.register(s)
    val plantedDocs = Seq(
      ("plant://alt/a",
        "<figure><img src=\"/a.png\" alt=\"dog &amp; cat\">" +
          "<figcaption>A dog <b>and</b> cat.</figcaption></figure>"),
      ("plant://alt/b",
        "<p><img src=\"/b1.png\"><img src=\"/b2.png\" alt=\"\"></p>"),
      ("plant://alt/c",
        "<figure><img src=\"/c1.png\" alt=\"one\"/>" +
          "<img src=\"/c2.png\" alt=\"two\"/>" +
          "<figcaption>shared cap</figcaption></figure>"),
      ("plant://alt/d",
        "<img src=\"/d.png\" alt=\"lonely\">" +
          "<figure><figcaption>no image here</figcaption></figure>"))
    val volume = (0 until 60).map { i =>
      val sb = new StringBuilder("<html><body>")
      for (j <- 0 until 6) {
        sb.append("<figure><img src=\"/img/").append(i).append('_').append(j)
          .append(".jpg\" alt=\"alt ").append((i * 7 + j) % 50)
          .append(" &amp; ").append(j)
          .append("\"><figcaption>cap ").append(i).append(" <i>").append(j)
          .append("</i> end</figcaption></figure>")
      }
      sb.append("<img src=\"/bare/").append(i).append(".png\" alt=\"bare ")
        .append(i).append("\">")
      if (i % 5 == 0)
        sb.append("<img src=\"/noalt/").append(i).append(".png\">")
      (f"plant://alt/vol/$i%02d", sb.append("</body></html>").toString)
    }
    val input = pages(s).select(col("url"), col("html"))
      .unionByName((plantedDocs ++ volume).toDF("url", "html_str")
        .select(col("url"), col("html_str").cast("binary").as("html")))
    input.createOrReplaceTempView("pages_alt")
    val nodes = s.sql(
      """SELECT url, n.idx, n.ntype, lower(n.tag) AS tag, n.text, n.attrs,
        |       n.self_closing
        |FROM pages_alt LATERAL VIEW html_nodes(html) n
        |WHERE (n.ntype = 'START'
        |       AND lower(n.tag) IN ('figure', 'figcaption', 'img'))
        |   OR (n.ntype = 'CLOSE' AND lower(n.tag) IN ('figure', 'figcaption'))
        |   OR n.ntype = 'TEXT'""".stripMargin)
    val w = Window.partitionBy(col("url")).orderBy(col("idx"))
    def depth(tag: String): org.apache.spark.sql.Column = sum(
      when(col("ntype") === "START" && col("tag") === tag &&
        !col("self_closing"), 1)
        .when(col("ntype") === "CLOSE" && col("tag") === tag, -1)
        .otherwise(0)).over(w)
    val ev = nodes
      .withColumn("figd", depth("figure"))
      .withColumn("capd", depth("figcaption"))
      .withColumn("fig", sum(when(col("ntype") === "START" &&
        col("tag") === "figure", 1).otherwise(0)).over(w))
    val caps = ev
      .filter(col("ntype") === "TEXT" && col("capd") > 0 && col("figd") > 0)
      .groupBy(col("url"), col("fig"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("idx"), col("text")))),
        x => x.getField("text")), "").as("caption"))
    val rel = ev.filter(col("ntype") === "START" && col("tag") === "img")
      .select(col("url"), col("idx"), col("attrs").getItem("src").as("src"),
        expr("decode_entities(attrs['alt'])").as("alt"),
        (col("figd") > 0).as("in_figure"), col("fig"))
      .join(caps, Seq("url", "fig"), "left")
      .withColumn("caption",
        when(col("in_figure"), col("caption")).otherwise(lit(null)))
      .select(col("url"), col("idx"), col("src"), col("alt"),
        col("caption"), col("in_figure"))
    // independent sequential single-pass walker (the obvious algorithm)
    val typed = input.as[(String, Array[Byte])].flatMap { case (url, html) =>
      val nds = HtmlScanner.parse(
        if (html == null) Array.emptyByteArray else html)
      var figd = 0; var capd = 0; var fig = 0
      val capBuf = scala.collection.mutable.LinkedHashMap[Int, StringBuilder]()
      val imgs = scala.collection.mutable.ArrayBuffer
        .empty[(Int, String, String, Int, Boolean)]
      def attrVal(nd: graft.core.HNode, name: String): String =
        nd.attrs.find(_.name == name).map(_.value).orNull
      nds.foreach { nd =>
        nd.nodeType match {
          case NodeType.StartTag =>
            nd.tagName.toLowerCase match {
              case "figure" =>
                fig += 1; if (!nd.selfClosing) figd += 1
              case "figcaption" => if (!nd.selfClosing) capd += 1
              case "img" =>
                imgs += ((nd.idx, attrVal(nd, "src"),
                  Option(attrVal(nd, "alt"))
                    .map(v => graft.core.Entities.decode(v)).orNull,
                  fig, figd > 0))
              case _ =>
            }
          case NodeType.CloseTag =>
            nd.tagName.toLowerCase match {
              case "figure" => figd -= 1
              case "figcaption" => capd -= 1
              case _ =>
            }
          case NodeType.Content =>
            if (capd > 0 && figd > 0)
              capBuf.getOrElseUpdate(fig, new StringBuilder).append(nd.text)
          case _ =>
        }
      }
      imgs.iterator.map { case (idx, src, alt, figId, inFig) =>
        val cap =
          if (inFig) capBuf.get(figId).map(_.toString).orNull else null
        (url, idx, src, alt, cap, inFig)
      }
    }.toDF("t_url", "t_idx", "t_src", "t_alt", "t_caption", "t_in_figure")
    val expected = Seq[(String, String, String, String, Boolean)](
      ("plant://alt/a", "/a.png", "dog & cat", "A dog and cat.", true),
      ("plant://alt/b", "/b1.png", null, null, false),
      ("plant://alt/b", "/b2.png", "", null, false),
      ("plant://alt/c", "/c1.png", "one", "shared cap", true),
      ("plant://alt/c", "/c2.png", "two", "shared cap", true),
      ("plant://alt/d", "/d.png", "lonely", null, false))
      .toDF("e_url", "e_src", "e_alt", "e_cap", "e_fig")
    rel.join(typed,
        col("url") === col("t_url") && col("idx") === col("t_idx"),
        "full_outer")
      .join(broadcast(expected),
        col("url") === col("e_url") && col("src") <=> col("e_src"), "left")
      .select(
        coalesce(col("url"), col("t_url")).as("url"),
        coalesce(col("idx"), col("t_idx")).as("idx"),
        col("src"), col("alt"), col("caption"), col("in_figure"),
        (col("url").isNotNull && col("t_url").isNotNull &&
          col("src") <=> col("t_src") && col("alt") <=> col("t_alt") &&
          col("caption") <=> col("t_caption") &&
          col("in_figure") <=> col("t_in_figure") &&
          (!col("url").startsWith("plant://alt/") ||
            col("url").startsWith("plant://alt/vol/") ||
            (col("e_src").isNotNull && col("alt") <=> col("e_alt") &&
              col("caption") <=> col("e_cap") &&
              col("in_figure") <=> col("e_fig")))).as("pair_ok"))
      .orderBy(col("url"), col("idx"))
  }

  /** ISO publication-date prefix with calendar bounds (month 01–12, day
    * 01–31) — the validation both q173 paths share, as a SQL-safe regex.
    */
  private val IsoDateRe =
    "^(\\d{4}-(?:0[1-9]|1[0-2])-(?:0[1-9]|[12]\\d|3[01]))"

  /** URL date-path pattern: /YYYY/MM/DD/ with the same calendar bounds. */
  private val UrlDateRe =
    "/((?:19|20)\\d{2})/(0[1-9]|1[0-2])/(0[1-9]|[12]\\d|3[01])/"

  /** q173: PUBLICATION-DATE EXTRACTION — the htmldate cascade (Barbaresi,
    * EACL-demos 2020: date signals in priority order, structured markup
    * before URL heuristics). Three signals per page:
    * `<meta property="article:published_time" content=…>` (OpenGraph),
    * the first `<time datetime=…>`, and a /YYYY/MM/DD/ URL path segment —
    * each reduced to a calendar-validated ISO date prefix; consensus is
    * the cascade `meta > time > url` with the winning source recorded.
    * "First" is by node index; invalid dates (month 13, malformed) are
    * treated as absent, NOT as blockers for lower-priority signals.
    *
    * Not SQL-expressible (the scanner is the operator) → self-certifying
    * `date_ok`: the RELATIONAL path (html_nodes generator → conditional
    * min-by-idx aggregates → coalesce cascade) must agree null-safely on
    * every field with an independent SEQUENTIAL single-pass walker, and
    * the hand-planted docs must equal their literal expected dates
    * (conflicting signals → meta wins; timestamp suffixes stripped;
    * month-13 rejected while the URL signal still lands; no-signal pages
    * stay null). The organic synth pages carry no date markup at all — a
    * 2000-page negative control that must come out all-null.
    *
    * Scale shape: one generator pass filtered to meta/time starts, one
    * url-keyed aggregate, a stateless URL regex — no joins beyond the
    * planted-expectation broadcast, no windows. At 100 TB this is the
    * temporal-filtering prerequisite (corpus dating, dedup tie-breaks,
    * contamination cutoffs) and runs inside the extract stage.
    */
  def q173PubDate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    val plantedDocs = Seq(
      ("https://p.example.org/2019/03/09/a",
        "<html><head><meta property=\"article:published_time\" " +
          "content=\"2021-07-05T12:30:00Z\"></head>" +
          "<body><time datetime=\"2020-01-02\">Jan 2</time></body></html>"),
      ("https://p.example.org/b",
        "<html><body><p>x</p><time datetime=\"2018-11-30T08:00:00+02:00\">" +
          "then</time><time datetime=\"2017-01-01\">earlier but later in " +
          "the doc</time></body></html>"),
      ("https://p.example.org/2016/05/20/c",
        "<html><body><time datetime=\"2016-13-01\">bad month</time>" +
          "</body></html>"),
      ("https://p.example.org/d",
        "<html><body><p>no date anywhere</p></body></html>"),
      ("https://p.example.org/e",
        "<html><head><meta property=\"og:title\" content=\"not a date\">" +
          "<meta property=\"article:published_time\" content=\"garbage\">" +
          "</head><body><time datetime=\"2022-02-28\">ok</time>" +
          "</body></html>"))
    val volume = (0 until 60).map { i =>
      val d = f"20${10 + i % 15}%02d-${1 + i % 12}%02d-${1 + i % 28}%02d"
      val sb = new StringBuilder("<html><head>")
      if (i % 3 == 0)
        sb.append("<meta property=\"article:published_time\" content=\"")
          .append(d).append("T06:00:00Z\">")
      sb.append("</head><body>")
      if (i % 2 == 0)
        sb.append("<time datetime=\"").append(d).append("\">d</time>")
      sb.append("<p>body ").append(i).append("</p></body></html>")
      val url =
        if (i % 5 == 0) f"https://v.example.org/${2000 + i}/01/15/post$i%02d"
        else f"https://v.example.org/post$i%02d"
      (url, sb.toString)
    }
    val input = pages(s).select(col("url"), col("html"))
      .unionByName((plantedDocs ++ volume).toDF("url", "html_str")
        .select(col("url"), col("html_str").cast("binary").as("html")))
    input.createOrReplaceTempView("pages_date")
    val nodes = s.sql(
      """SELECT url, n.idx, lower(n.tag) AS tag, n.attrs
        |FROM pages_date LATERAL VIEW html_nodes(html) n
        |WHERE n.ntype = 'START' AND lower(n.tag) IN ('meta', 'time')
        |""".stripMargin)
    def iso(c: org.apache.spark.sql.Column) = {
      val d = regexp_extract(c, IsoDateRe, 1)
      when(d =!= "", d)
    }
    val sig = nodes
      .withColumn("meta_iso", when(col("tag") === "meta" &&
        lower(col("attrs").getItem("property")) ===
          "article:published_time", iso(col("attrs").getItem("content"))))
      .withColumn("time_iso",
        when(col("tag") === "time", iso(col("attrs").getItem("datetime"))))
      .groupBy(col("url"))
      .agg(
        min(when(col("meta_iso").isNotNull,
          struct(col("idx"), col("meta_iso").as("d"))))
          .getField("d").as("date_meta"),
        min(when(col("time_iso").isNotNull,
          struct(col("idx"), col("time_iso").as("d"))))
          .getField("d").as("date_time"))
    val rel = input.select(col("url"))
      .join(sig, Seq("url"), "left")
      .withColumn("date_url",
        when(regexp_extract(col("url"), UrlDateRe, 1) =!= "",
          concat_ws("-",
            regexp_extract(col("url"), UrlDateRe, 1),
            regexp_extract(col("url"), UrlDateRe, 2),
            regexp_extract(col("url"), UrlDateRe, 3))))
      .withColumn("pub_date",
        coalesce(col("date_meta"), col("date_time"), col("date_url")))
      .withColumn("date_src",
        when(col("date_meta").isNotNull, "meta")
          .when(col("date_time").isNotNull, "time")
          .when(col("date_url").isNotNull, "url"))
    // independent sequential single-pass walker (the obvious algorithm)
    val isoRe = IsoDateRe.r
    val urlRe = UrlDateRe.r
    val typed = input.as[(String, Array[Byte])].map { case (url, html) =>
      val nds = HtmlScanner.parse(
        if (html == null) Array.emptyByteArray else html)
      var dMeta: String = null
      var dTime: String = null
      def isoOf(v: String): String =
        if (v == null) null
        else isoRe.findFirstMatchIn(v).map(_.group(1)).orNull
      nds.foreach { nd =>
        if (nd.nodeType == NodeType.StartTag) {
          val tag = nd.tagName.toLowerCase
          if (tag == "meta" && dMeta == null) {
            val prop = nd.attrs.find(_.name == "property").map(_.value)
            if (prop.exists(_.equalsIgnoreCase("article:published_time"))) {
              val c = nd.attrs.find(_.name == "content").map(_.value).orNull
              val d = isoOf(c)
              if (d != null) dMeta = d
            }
          } else if (tag == "time" && dTime == null) {
            val d = isoOf(
              nd.attrs.find(_.name == "datetime").map(_.value).orNull)
            if (d != null) dTime = d
          }
        }
      }
      val dUrl = urlRe.findFirstMatchIn(url)
        .map(m => s"${m.group(1)}-${m.group(2)}-${m.group(3)}").orNull
      val pub = if (dMeta != null) dMeta
        else if (dTime != null) dTime else dUrl
      val src = if (dMeta != null) "meta"
        else if (dTime != null) "time"
        else if (dUrl != null) "url" else null
      (url, dMeta, dTime, dUrl, pub, src)
    }.toDF("t_url", "t_meta", "t_time", "t_url_d", "t_pub", "t_src")
    val expected = Seq(
      ("https://p.example.org/2019/03/09/a", "2021-07-05", "meta"),
      ("https://p.example.org/b", "2018-11-30", "time"),
      ("https://p.example.org/2016/05/20/c", "2016-05-20", "url"),
      ("https://p.example.org/d", null, null),
      ("https://p.example.org/e", "2022-02-28", "time"))
      .toDF("e_url", "e_pub", "e_src")
    rel.join(typed, col("url") === col("t_url"), "full_outer")
      .join(broadcast(expected), col("url") === col("e_url"), "left")
      .select(
        coalesce(col("url"), col("t_url")).as("url"),
        col("date_meta"), col("date_time"), col("date_url"),
        col("pub_date"), col("date_src"),
        (col("url").isNotNull && col("t_url").isNotNull &&
          col("date_meta") <=> col("t_meta") &&
          col("date_time") <=> col("t_time") &&
          col("date_url") <=> col("t_url_d") &&
          col("pub_date") <=> col("t_pub") &&
          col("date_src") <=> col("t_src") &&
          (col("e_url").isNull ||
            (col("pub_date") <=> col("e_pub") &&
              col("date_src") <=> col("e_src"))) &&
          // organic synth pages are the negative control: all-null
          (!col("url").contains("example.org/page/") ||
            col("pub_date").isNull)).as("date_ok"))
      .orderBy(col("url"))
  }

  /** q174: LICENSE DETECTION — the Creative-Commons REL harvest (the CC
    * REL spec expresses a page's license as `rel="license"` on `<a>` or
    * `<link>`; C4/LAION-class corpora mine exactly these markers for
    * license-aware filtering). Every page's FIRST license link (by node
    * index) is normalized to a license id: creativecommons.org/licenses/
    * {by,by-sa,by-nc,…}/{ver} → `CC-BY…-ver`, /publicdomain/zero/{ver} →
    * `CC0-ver`, any other href → `other`. The `rel` attribute is a
    * space-separated token list matched case-insensitively
    * (`rel="license nofollow"` counts), per the HTML link-types spec.
    *
    * Not SQL-expressible → self-certifying `lic_ok`: relational path
    * (generator → rel-token filter → min-by-idx) must agree null-safely
    * with an independent sequential walker on every field, planted docs
    * must equal their literal expected ids, and the organic synth pages
    * (no license markup) are an all-null negative control.
    *
    * Scale shape: one generator pass filtered to a/link starts, one
    * url-keyed aggregate, stateless href regexes. At 100 TB this is the
    * compliance gate that decides which documents may train at all.
    */
  def q174License(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    val ccRe = "creativecommons\\.org/licenses/([a-z-]+)/(\\d\\.\\d)"
    val cc0Re = "creativecommons\\.org/publicdomain/zero/(\\d\\.\\d)"
    val plantedDocs = Seq(
      ("plant://lic/a",
        "<a rel=\"license nofollow\" " +
          "href=\"https://creativecommons.org/licenses/by-sa/4.0/\">cc</a>"),
      ("plant://lic/b",
        "<html><head><link rel=\"LICENSE\" href=\"http://creativecommons" +
          ".org/licenses/by-nc-nd/3.0/deed.en\"></head><body>x</body></html>"),
      ("plant://lic/c",
        "<a rel=\"license\" href=\"https://creativecommons.org/" +
          "publicdomain/zero/1.0/\">cc0</a>"),
      ("plant://lic/d",
        "<a rel=\"license\" href=\"https://example.com/my-eula\">eula</a>"),
      ("plant://lic/e",
        "<a rel=\"nofollow\" href=\"https://creativecommons.org/licenses/" +
          "by/4.0/\">mentioned, not declared</a><p>no rel=license</p>"),
      ("plant://lic/f",
        "<a rel=\"license\" href=\"https://creativecommons.org/licenses/" +
          "by/2.0/\">first</a><a rel=\"license\" " +
          "href=\"https://creativecommons.org/licenses/by-nd/4.0/\">second</a>"))
    val kinds = Vector("by", "by-sa", "by-nc", "by-nc-sa", "by-nd", "by-nc-nd")
    val volume = (0 until 60).map { i =>
      val sb = new StringBuilder("<html><body><p>doc ")
      sb.append(i).append("</p>")
      if (i % 4 != 3) {
        if (i % 2 == 0)
          sb.append("<a rel=\"license\" href=\"https://creativecommons.org/")
            .append("licenses/").append(kinds(i % kinds.length))
            .append(if (i % 3 == 0) "/4.0/" else "/3.0/").append("\">L</a>")
        else
          sb.append("<link rel=\"license etc\" href=\"https://")
            .append("creativecommons.org/publicdomain/zero/1.0/\">")
      }
      (f"plant://lic/vol/$i%02d", sb.append("</body></html>").toString)
    }
    val input = pages(s).select(col("url"), col("html"))
      .unionByName((plantedDocs ++ volume).toDF("url", "html_str")
        .select(col("url"), col("html_str").cast("binary").as("html")))
    input.createOrReplaceTempView("pages_lic")
    val nodes = s.sql(
      """SELECT url, n.idx, n.attrs['rel'] AS rel, n.attrs['href'] AS href
        |FROM pages_lic LATERAL VIEW html_nodes(html) n
        |WHERE n.ntype = 'START' AND lower(n.tag) IN ('a', 'link')
        |  AND n.attrs['rel'] IS NOT NULL AND n.attrs['href'] IS NOT NULL
        |""".stripMargin)
    def licenseId(href: org.apache.spark.sql.Column) = {
      val kind = regexp_extract(href, ccRe, 1)
      val ver = regexp_extract(href, ccRe, 2)
      val zver = regexp_extract(href, cc0Re, 1)
      when(kind =!= "", concat(lit("CC-"), upper(kind), lit("-"), ver))
        .when(zver =!= "", concat(lit("CC0-"), zver))
        .otherwise("other")
    }
    val rel = nodes
      .filter(array_contains(split(lower(col("rel")), "\\s+"), "license"))
      .groupBy(col("url"))
      .agg(min(struct(col("idx"), col("href"))).as("first"))
      .select(col("url"), col("first").getField("href").as("license_href"),
        licenseId(col("first").getField("href")).as("license"))
    val relAll = input.select(col("url")).join(rel, Seq("url"), "left")
    // independent sequential walker twin
    val ccR = ("(?s).*" + ccRe + ".*").r
    val cc0R = ("(?s).*" + cc0Re + ".*").r
    val typed = input.as[(String, Array[Byte])].map { case (url, html) =>
      val nds = HtmlScanner.parse(
        if (html == null) Array.emptyByteArray else html)
      var href: String = null
      nds.foreach { nd =>
        if (href == null && nd.nodeType == NodeType.StartTag) {
          val tag = nd.tagName.toLowerCase
          if (tag == "a" || tag == "link") {
            val r = nd.attrs.find(_.name == "rel").map(_.value).orNull
            val h = nd.attrs.find(_.name == "href").map(_.value).orNull
            if (r != null && h != null &&
              r.toLowerCase.split("\\s+").contains("license")) href = h
          }
        }
      }
      val lic =
        if (href == null) null
        else href match {
          case ccR(kind, ver) => s"CC-${kind.toUpperCase}-$ver"
          case cc0R(ver) => s"CC0-$ver"
          case _ => "other"
        }
      (url, href, lic)
    }.toDF("t_url", "t_href", "t_license")
    val expected = Seq(
      ("plant://lic/a", "CC-BY-SA-4.0"),
      ("plant://lic/b", "CC-BY-NC-ND-3.0"),
      ("plant://lic/c", "CC0-1.0"),
      ("plant://lic/d", "other"),
      ("plant://lic/e", null),
      ("plant://lic/f", "CC-BY-2.0"))
      .toDF("e_url", "e_license")
    relAll.join(typed, col("url") === col("t_url"), "full_outer")
      .join(broadcast(expected), col("url") === col("e_url"), "left")
      .select(
        coalesce(col("url"), col("t_url")).as("url"),
        col("license_href"), col("license"),
        (col("url").isNotNull && col("t_url").isNotNull &&
          col("license_href") <=> col("t_href") &&
          col("license") <=> col("t_license") &&
          (col("e_url").isNull || col("license") <=> col("e_license")) &&
          (!col("url").contains("example.org/page/") ||
            col("license").isNull)).as("lic_ok"))
      .orderBy(col("url"))
  }

  /** q179: SCHEMA.ORG MICRODATA EXTRACTION — the itemscope/itemprop
    * harvest (WHATWG HTML §5 "Microdata"; the other half of what q142
    * does for JSON-LD: product cards, article bylines, ratings embedded
    * as HTML attributes rather than script payloads). Policy, applied
    * identically in both paths: scopes are FLAT — each `itemscope` start
    * opens scope k (a running count; closes are not tracked) and carries
    * its `itemtype`; every `itemprop` start belongs to the most recent
    * scope (props before any scope are dropped); a prop's value is the
    * first present of content/href/src/datetime, else the raw
    * concatenation of the TEXT nodes immediately following it (the run
    * ends at the next tag node), else NULL. Bare `itemscope` is detected
    * by key presence (the generator surfaces bare attributes as
    * NULL-valued map entries — q36's contract).
    *
    * Not SQL-expressible → self-certifying `micro_ok`: the RELATIONAL
    * path (generator → running-count/last-anchor windows → text-run
    * groupBy) must agree null-safely field-for-field with an independent
    * SEQUENTIAL walker, the planted Product/Article cards must equal
    * their literal expected triples, and the organic synth pages (no
    * microdata) are a zero-row negative control.
    *
    * Scale shape: one generator pass, one url-keyed window set, one
    * (url, anchor) groupBy for text runs — the q169 discipline; no
    * all-pairs, no driver loops.
    */
  def q179Microdata(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftExtensions.register(s)
    val plantedDocs = Seq(
      ("plant://micro/a",
        "<div itemscope itemtype=\"https://schema.org/Product\">" +
          "<span itemprop=\"name\">Widget X</span>" +
          "<meta itemprop=\"sku\" content=\"S-123\">" +
          "<a itemprop=\"url\" href=\"/w\">buy</a></div>"),
      ("plant://micro/b",
        "<article itemscope itemtype=\"https://schema.org/Article\">" +
          "<h1 itemprop=\"headline\">Big News</h1>" +
          "<time itemprop=\"datePublished\" datetime=\"2023-09-01\">then</time>" +
          "</article>" +
          "<div itemscope itemtype=\"https://schema.org/Person\">" +
          "<span itemprop=\"name\">Ada</span></div>"),
      ("plant://micro/c",
        "<span itemprop=\"orphan\">before any scope</span>" +
          "<div itemscope><span itemprop=\"empty\"></span></div>"))
    val volume = (0 until 60).map { i =>
      val sb = new StringBuilder("<html><body>")
      for (j <- 0 until 3) {
        sb.append("<div itemscope itemtype=\"https://schema.org/Thing")
          .append((i + j) % 7).append("\">")
          .append("<span itemprop=\"p").append(j).append("\">v")
          .append(i).append('_').append(j).append("</span>")
          .append("<meta itemprop=\"m").append(j).append("\" content=\"c")
          .append((i * 3 + j) % 50).append("\"></div>")
      }
      (f"plant://micro/vol/$i%02d", sb.append("</body></html>").toString)
    }
    val input = pages(s).select(col("url"), col("html"))
      .unionByName((plantedDocs ++ volume).toDF("url", "html_str")
        .select(col("url"), col("html_str").cast("binary").as("html")))
    input.createOrReplaceTempView("pages_micro")
    val nodes = s.sql(
      """SELECT url, n.idx, n.ntype, n.text,
        |       map_contains_key(n.attrs, 'itemscope') AND n.ntype = 'START'
        |         AS has_scope,
        |       n.attrs['itemtype'] AS itemtype,
        |       CASE WHEN n.ntype = 'START' THEN n.attrs['itemprop'] END
        |         AS prop,
        |       coalesce(n.attrs['content'], n.attrs['href'],
        |                n.attrs['src'], n.attrs['datetime']) AS attr_val
        |FROM pages_micro LATERAL VIEW html_nodes(html) n""".stripMargin)
    val w = Window.partitionBy(col("url")).orderBy(col("idx"))
    val ev = nodes
      .withColumn("scope",
        sum(when(col("has_scope"), 1).otherwise(0)).over(w))
      .withColumn("anchor",
        last(when(col("ntype") =!= "TEXT", col("idx")), ignoreNulls = true)
          .over(w))
    val scopeTypes = ev.filter(col("has_scope"))
      .select(col("url").as("st_url"), col("scope").as("st_scope"),
        col("itemtype").as("st_itemtype"))
    val textRuns = ev.filter(col("ntype") === "TEXT" && col("anchor").isNotNull)
      .groupBy(col("url").as("tr_url"), col("anchor").as("tr_anchor"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("idx"), col("text")))),
        x => x.getField("text")), "").as("lead_text"))
    val rel = ev.filter(col("prop").isNotNull && col("scope") >= 1)
      .join(scopeTypes,
        col("url") === col("st_url") && col("scope") === col("st_scope"),
        "left")
      .join(textRuns,
        col("url") === col("tr_url") && col("idx") === col("tr_anchor"),
        "left")
      .select(col("url"), col("idx"), col("scope"),
        col("st_itemtype").as("itemtype"), col("prop"),
        coalesce(col("attr_val"), col("lead_text")).as("value"))
    // independent sequential single-pass walker (the obvious algorithm)
    val typed = input.as[(String, Array[Byte])].flatMap { case (url, html) =>
      val nds = HtmlScanner.parse(
        if (html == null) Array.emptyByteArray else html)
      var scope = 0
      val types = scala.collection.mutable.Map.empty[Int, String]
      final case class P(idx: Int, scope: Int, prop: String,
        var value: String, var collecting: Boolean)
      val out = scala.collection.mutable.ArrayBuffer.empty[P]
      var pending: P = null
      val buf = new StringBuilder
      def attrVal(nd: graft.core.HNode, name: String): String =
        nd.attrs.find(_.name == name).map(_.value).orNull
      def finish(): Unit = if (pending != null) {
        if (buf.nonEmpty) pending.value = buf.toString
        pending = null
        buf.clear()
      }
      nds.foreach { nd =>
        nd.nodeType match {
          case NodeType.Content =>
            if (pending != null) buf.append(nd.text)
          case NodeType.StartTag =>
            finish()
            if (nd.attrs.exists(_.name == "itemscope")) {
              scope += 1
              val t = attrVal(nd, "itemtype")
              if (t != null) types(scope) = t
            }
            val prop = attrVal(nd, "itemprop")
            if (prop != null && scope >= 1) {
              val av = Seq("content", "href", "src", "datetime")
                .flatMap(a => Option(attrVal(nd, a))).headOption.orNull
              val p = P(nd.idx, scope, prop, av, collecting = av == null)
              out += p
              if (av == null) pending = p
            }
          case _ => finish()
        }
      }
      finish()
      out.iterator.map(p =>
        (url, p.idx, p.scope, types.get(p.scope).orNull, p.prop, p.value))
    }.toDF("t_url", "t_idx", "t_scope", "t_itemtype", "t_prop", "t_value")
    val expected = Seq(
      ("plant://micro/a", 1, "https://schema.org/Product", "name", "Widget X"),
      ("plant://micro/a", 1, "https://schema.org/Product", "sku", "S-123"),
      ("plant://micro/a", 1, "https://schema.org/Product", "url", "/w"),
      ("plant://micro/b", 1, "https://schema.org/Article", "headline",
        "Big News"),
      ("plant://micro/b", 1, "https://schema.org/Article", "datePublished",
        "2023-09-01"),
      ("plant://micro/b", 2, "https://schema.org/Person", "name", "Ada"),
      ("plant://micro/c", 1, null, "empty", null))
      .toDF("e_url", "e_scope", "e_itemtype", "e_prop", "e_value")
    rel.join(typed,
        col("url") === col("t_url") && col("idx") === col("t_idx"),
        "full_outer")
      .join(broadcast(expected),
        col("url") === col("e_url") && col("prop") <=> col("e_prop"),
        "left")
      .select(
        coalesce(col("url"), col("t_url")).as("url"),
        coalesce(col("idx"), col("t_idx")).as("idx"),
        col("scope"), col("itemtype"), col("prop"), col("value"),
        (col("url").isNotNull && col("t_url").isNotNull &&
          col("scope") <=> col("t_scope") &&
          col("itemtype") <=> col("t_itemtype") &&
          col("prop") <=> col("t_prop") &&
          col("value") <=> col("t_value") &&
          (col("e_url").isNull ||
            (col("scope") <=> col("e_scope") &&
              col("itemtype") <=> col("e_itemtype") &&
              col("value") <=> col("e_value"))) &&
          // planted doc c's orphan prop must NOT appear; organic pages
          // carry no microdata at all
          col("prop") =!= "orphan" &&
          !col("url").contains("example.org/page/")).as("micro_ok"))
      .orderBy(col("url"), col("idx"))
  }

  /** q185: OPENGRAPH / TWITTER CARD HARVEST — the social-share metadata
    * every title/description/preview-image pipeline reads first
    * (ogp.me; Twitter card markup uses `name=` where OG uses
    * `property=`). Policy, applied identically in both paths: consider
    * `<meta>` start tags only; key = lowercase of `property` if present
    * else `name`; keep only the card keys of interest; value =
    * `content` (NULL when the attribute is absent); the FIRST occurrence
    * of a key per page wins — even when its content is missing — because
    * that is what social scrapers do (first-match, head-ordered).
    *
    * Not SQL-expressible → self-certifying `og_ok`: the relational path
    * (generator → min-idx window) must agree null-safely with an
    * independent sequential first-wins walker, the planted cards must
    * equal their literal expected pairs (duplicate og:title → first
    * wins; missing content → NULL beats a later valued duplicate;
    * uppercase OG:Title lowercased; property beats name on one tag), and
    * the organic synth pages (no card metadata at all) are a zero-row
    * negative control.
    *
    * Scale shape: one generator pass + one (url, key) min-idx aggregate —
    * a single url-keyed Exchange; the head-bounded early-stop variant is
    * [[graft.core.LinkExtractor.headDirectives]]'s seam if a user wants
    * to skip body scans entirely.
    */
  def q185OgCards(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    val cardKeys = Seq("og:title", "og:description", "og:image", "og:url",
      "og:site_name", "twitter:card", "twitter:title", "twitter:description")
    val plantedDocs = Seq(
      ("plant://og/a",
        "<head><meta property=\"og:title\" content=\"A Title\">" +
          "<meta property=\"og:description\" content=\"A desc.\">" +
          "<meta property=\"og:image\" content=\"https://x/a.png\">" +
          "<meta property=\"og:site_name\" content=\"X\"></head>"),
      ("plant://og/b",
        "<meta name=\"twitter:card\" content=\"summary\">" +
          "<meta name=\"twitter:title\" content=\"B Title\">" +
          "<meta name=\"description\" content=\"not a card key\">"),
      ("plant://og/c",
        "<meta property=\"og:title\" content=\"first\">" +
          "<meta property=\"og:title\" content=\"second\">" +
          "<meta property=\"og:image\">" +
          "<meta property=\"og:image\" content=\"https://x/late.png\">"),
      ("plant://og/d",
        "<meta property=\"OG:Title\" content=\"upper\">" +
          "<meta property=\"og:url\" name=\"twitter:title\" content=\"both\">"))
    val volume = (0 until 60).map { i =>
      val sb = new StringBuilder("<html><head>")
      sb.append("<meta property=\"og:title\" content=\"vol title ")
        .append(i).append("\">")
      if (i % 2 == 0)
        sb.append("<meta name=\"twitter:card\" content=\"summary_large_image\">")
      if (i % 3 == 0)
        sb.append("<meta property=\"og:image\" content=\"https://v/")
          .append(i).append(".jpg\">")
      (f"plant://og/vol/$i%02d", sb.append("</head><body>x</body></html>").toString)
    }
    val input = pages(s).select(col("url"), col("html"))
      .unionByName((plantedDocs ++ volume).toDF("url", "html_str")
        .select(col("url"), col("html_str").cast("binary").as("html")))
    input.createOrReplaceTempView("pages_og")
    val rel = s.sql(
      s"""SELECT url, k, idx, v FROM (
         |  SELECT url, k, idx, v,
         |    row_number() OVER (PARTITION BY url, k ORDER BY idx) AS rn
         |  FROM (
         |    SELECT url, n.idx,
         |      lower(coalesce(n.attrs['property'], n.attrs['name'])) AS k,
         |      n.attrs['content'] AS v
         |    FROM pages_og LATERAL VIEW html_nodes(html) n
         |    WHERE n.ntype = 'START' AND n.tag = 'meta'))
         |WHERE rn = 1
         |  AND k IN (${cardKeys.map(k => s"'$k'").mkString(",")})""".stripMargin)
    val keySet = cardKeys.toSet
    val typed = input.as[(String, Array[Byte])].flatMap { case (url, html) =>
      val nds = HtmlScanner.parse(
        if (html == null) Array.emptyByteArray else html)
      val seen = scala.collection.mutable.Map.empty[String, (Int, String)]
      nds.foreach { nd =>
        if (nd.nodeType == NodeType.StartTag && nd.tagName == "meta") {
          def a(n: String) = nd.attrs.find(_.name == n).map(_.value).orNull
          val k0 = Option(a("property")).getOrElse(a("name"))
          if (k0 != null) {
            val k = k0.toLowerCase(java.util.Locale.ROOT)
            if (keySet(k) && !seen.contains(k)) seen(k) = (nd.idx, a("content"))
          }
        }
      }
      seen.iterator.map { case (k, (idx, v)) => (url, k, idx, v) }
    }.toDF("t_url", "t_k", "t_idx", "t_v")
    val expected = Seq(
      ("plant://og/a", "og:title", "A Title"),
      ("plant://og/a", "og:description", "A desc."),
      ("plant://og/a", "og:image", "https://x/a.png"),
      ("plant://og/a", "og:site_name", "X"),
      ("plant://og/b", "twitter:card", "summary"),
      ("plant://og/b", "twitter:title", "B Title"),
      ("plant://og/c", "og:title", "first"),
      ("plant://og/c", "og:image", null),
      ("plant://og/d", "og:title", "upper"),
      ("plant://og/d", "og:url", "both"))
      .toDF("e_url", "e_k", "e_v")
    rel.join(typed,
        col("url") === col("t_url") && col("k") === col("t_k"),
        "full_outer")
      .join(broadcast(expected),
        coalesce(col("url"), col("t_url")) === col("e_url") &&
          coalesce(col("k"), col("t_k")) === col("e_k"),
        "left")
      .select(
        coalesce(col("url"), col("t_url")).as("url"),
        coalesce(col("k"), col("t_k")).as("k"),
        col("v"),
        (col("url").isNotNull && col("t_url").isNotNull &&
          col("idx") <=> col("t_idx") && col("v") <=> col("t_v") &&
          (col("e_url").isNull || col("v") <=> col("e_v")) &&
          !coalesce(col("url"), col("t_url")).contains("example.org/page/"))
          .as("og_ok"))
      .orderBy(col("url"), col("k"))
  }

  /** q186: PAYWALL / LOGIN-WALL DETECTION — the access-gate screen a
    * training-data pipeline runs before trusting extracted text (a
    * paywall page yields teaser text that poisons quality stats). The
    * decision stump, applied identically in both paths:
    * `walled = password input present OR (gate phrase present AND
    * visible text < html_len/10)` — structural evidence (a login form),
    * or textual evidence (the gate phrasing) corroborated by the thin
    * teaser body that an interstitial leaves behind. Phrase counting is
    * the codegen'd Aho–Corasick `blocklist_hits` (q119's automaton — one
    * O(len) walk at any phrase-list size); the thick-article control
    * plants a QUOTED gate phrase inside a long body to pin that phrases
    * alone do not condemn a page.
    *
    * Not SQL-expressible → self-certifying `pw_ok`: the relational path
    * must agree with an independent sequential twin (core AhoCorasick +
    * Extractor + node walk) on every signal AND the verdict, and the
    * planted wall/login/control pages must match their literal expected
    * verdicts; organic synth pages carry no password inputs.
    *
    * Scale shape: stateless per-row (one parse feeding all three
    * signals); no shuffle at all before the ORDER BY.
    */
  def q186Paywall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    val phrases = Seq("subscribe to continue", "sign in to read",
      "already a subscriber", "free articles remaining")
    val longBody = (0 until 120).map(i => s"sentence $i of the article body.")
      .mkString(" ")
    val plantedDocs = Seq(
      ("plant://pw/wall",
        "<html><body><div class=\"gate\">Subscribe to continue reading." +
          " Already a subscriber?</div>" +
          "<p>Teaser only.</p>" + "<!-- " + ("pad " * 200) + " --></body></html>"),
      ("plant://pw/login",
        s"<html><body><form><input type=\"text\" name=\"u\">" +
          s"<input type=\"PASSWORD\" name=\"p\"></form><p>$longBody</p></body></html>"),
      ("plant://pw/control",
        s"<html><body><p>The banner said “subscribe to continue”, " +
          s"which critics mocked. $longBody</p></body></html>"),
      ("plant://pw/plain",
        s"<html><body><p>$longBody</p></body></html>"))
    val input = pages(s).select(col("url"), col("html"))
      .unionByName(plantedDocs.toDF("url", "html_str")
        .select(col("url"), col("html_str").cast("binary").as("html")))
    input.createOrReplaceTempView("pages_pw")
    val phraseArr = phrases.map(p => s"'$p'").mkString("array(", ",", ")")
    val relReal = s.sql(
      s"""WITH n AS (
         |  SELECT url, sum(CASE WHEN n.ntype = 'START' AND n.tag = 'input'
         |      AND lower(coalesce(n.attrs['type'], '')) = 'password'
         |      THEN 1 ELSE 0 END) AS pw_inputs
         |  FROM pages_pw LATERAL VIEW html_nodes(html) n GROUP BY url),
         |t AS (
         |  SELECT url, length(html) AS html_len,
         |    length(extract_text(html)) AS text_len,
         |    blocklist_hits(lower(extract_text(html)), $phraseArr) AS hits
         |  FROM pages_pw)
         |SELECT t.url, n.pw_inputs, t.hits, t.html_len, t.text_len,
         |  (n.pw_inputs > 0 OR (t.hits >= 1 AND t.text_len * 10 < t.html_len))
         |    AS walled
         |FROM t JOIN n ON t.url = n.url""".stripMargin)
    val ac = graft.core.AhoCorasick.buildStrings(phrases)
    val typed = input.as[(String, Array[Byte])].map { case (url, html) =>
      val h = if (html == null) Array.emptyByteArray else html
      val nds = HtmlScanner.parse(h)
      var pw = 0L
      nds.foreach { nd =>
        if (nd.nodeType == NodeType.StartTag && nd.tagName == "input") {
          val t = nd.attrs.find(_.name == "type").map(_.value).getOrElse("")
          if (t != null && t.toLowerCase(java.util.Locale.ROOT) == "password")
            pw += 1
        }
      }
      val text = graft.core.Extractor.extractBytes(h).text
      val hits = ac.count(text.toLowerCase(java.util.Locale.ROOT))
      // Spark's length(string) counts code points, not UTF-16 units
      val tlen = text.codePointCount(0, text.length).toLong
      val walled = pw > 0 || (hits >= 1 && tlen * 10 < h.length)
      (url, pw, hits, h.length.toLong, tlen, walled)
    }.toDF("t_url", "t_pw", "t_hits", "t_hlen", "t_tlen", "t_walled")
    val expected = Seq(
      ("plant://pw/wall", true), ("plant://pw/login", true),
      ("plant://pw/control", false), ("plant://pw/plain", false))
      .toDF("e_url", "e_walled")
    relReal.join(typed, col("url") === col("t_url"), "full_outer")
      .join(broadcast(expected), col("url") === col("e_url"), "left")
      .select(col("url"), col("pw_inputs"), col("hits"), col("walled"),
        (col("url").isNotNull && col("t_url").isNotNull &&
          col("pw_inputs") <=> col("t_pw") && col("hits") <=> col("t_hits") &&
          col("html_len") <=> col("t_hlen") && col("text_len") <=> col("t_tlen") &&
          col("walled") <=> col("t_walled") &&
          (col("e_url").isNull || col("walled") <=> col("e_walled")))
          .as("pw_ok"))
      .orderBy(col("url"))
  }

  /** q190: HREFLANG ALTERNATE-CLUSTER MINING + RETURN-TAG VALIDATION —
    * `<link rel="alternate" hreflang="…" href="…">` declares the
    * language variants of a page (the bitext-mining entry point a
    * multilingual curation pipeline trusts FIRST, before any content
    * comparison), and the annotation is only valid when RECIPROCAL:
    * page A listing B requires B to list A back (Google's documented
    * return-tag rule — non-reciprocal pairs are ignored by consumers
    * and flagged by auditors). Policy, identical in both paths: START
    * `link` tags with rel exactly `alternate` (case-folded) and BOTH
    * hreflang and a non-NULL href; duplicates of (url, hreflang, href)
    * collapse; `reciprocal` = the target page declares any hreflang
    * back to this url; self-references (href == own url) are reciprocal
    * by definition.
    *
    * Not SQL-expressible → self-certifying `hl_ok`: relational
    * (generator + distinct + self-join) must match the sequential
    * walker row-for-row, the planted reciprocal trio / one-way pair /
    * self-reference must equal their literal expected verdicts, and
    * organic pages contribute nothing.
    *
    * Scale shape: one generator pass → distinct on (url, hreflang,
    * href) → ONE self equi-join on the (href→url) edge to test
    * reciprocity — exactly a directed-graph mutual-edge check, keyed by
    * url; no windows, no all-pairs.
    */
  def q190Hreflang(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    def link(hl: String, href: String) =
      s"<link rel=\"alternate\" hreflang=\"$hl\" href=\"$href\">"
    val plantedDocs = Seq(
      ("plant://hl/a/en", "<head>" + link("en", "plant://hl/a/en") +
        link("fr", "plant://hl/a/fr") + link("de", "plant://hl/a/de") + "</head>"),
      ("plant://hl/a/fr", "<head>" + link("en", "plant://hl/a/en") +
        link("fr", "plant://hl/a/fr") + link("de", "plant://hl/a/de") + "</head>"),
      ("plant://hl/a/de", "<head>" + link("en", "plant://hl/a/en") +
        link("fr", "plant://hl/a/fr") + link("de", "plant://hl/a/de") + "</head>"),
      ("plant://hl/b/en", "<head>" + link("fr", "plant://hl/b/fr") +
        "<link rel=\"ALTERNATE\" hreflang=\"es\" href=\"plant://hl/b/es\">" +
        "<link rel=\"alternate\" hreflang=\"x-no-href\">" +
        "<link rel=\"stylesheet\" hreflang=\"xx\" href=\"plant://hl/ignored\">" +
        "</head>"),
      ("plant://hl/b/fr", "<head><p>no links back</p></head>"),
      ("plant://hl/c", "<head>" + link("en", "plant://hl/c") + "</head>"))
    val volume = (0 until 40).map { i =>
      val base = f"plant://hl/vol/$i%02d"
      val langs = Seq("en", "fr", "de").take(1 + i % 3)
      // every volume page lists the full reciprocal family
      val body = langs.map(l => link(l, s"$base/$l")).mkString
      // the family members themselves (reciprocal by construction)
      langs.map(l => (s"$base/$l", s"<head>$body</head>"))
    }.flatten ++ (0 until 40).map { i =>
      (f"plant://hl/vol/$i%02d", "<head></head>") // listing page, no links needed
    }
    val input = pages(s).select(col("url"), col("html"))
      .unionByName(((plantedDocs ++ volume)).toDF("url", "html_str")
        .select(col("url"), col("html_str").cast("binary").as("html")))
    input.createOrReplaceTempView("pages_hl")
    val decl = s.sql(
      """SELECT DISTINCT url, n.attrs['hreflang'] AS hreflang,
        |       n.attrs['href'] AS href
        |FROM pages_hl LATERAL VIEW html_nodes(html) n
        |WHERE n.ntype = 'START' AND n.tag = 'link'
        |  AND lower(coalesce(n.attrs['rel'], '')) = 'alternate'
        |  AND n.attrs['hreflang'] IS NOT NULL
        |  AND n.attrs['href'] IS NOT NULL""".stripMargin)
      .localCheckpoint()
    val back = decl.select(col("url").as("b_url"), col("href").as("b_href"))
      .distinct()
    val rel = decl.join(back,
        col("href") === col("b_url") && col("url") === col("b_href"),
        "left")
      .select(col("url"), col("hreflang"), col("href"),
        (col("href") === col("url") || col("b_url").isNotNull).as("reciprocal"))
      .distinct()
    val typed = input.as[(String, Array[Byte])].flatMap { case (url, html) =>
      val nds = HtmlScanner.parse(
        if (html == null) Array.emptyByteArray else html)
      nds.iterator.collect {
        case nd if nd.nodeType == NodeType.StartTag && nd.tagName == "link" =>
          def a(n: String) = nd.attrs.find(_.name == n).map(_.value).orNull
          (a("rel"), a("hreflang"), a("href"))
      }.collect {
        case (rel0, hl, href)
          if rel0 != null && hl != null && href != null &&
            rel0.toLowerCase(java.util.Locale.ROOT) == "alternate" =>
          (url, hl, href)
      }.toSeq.distinct
    }.toDF("t_url", "t_hreflang", "t_href")
    val tEdges = typed.select(col("t_url"), col("t_href")).distinct()
    val tRel = typed.join(
        tEdges.select(col("t_url").as("tb_url"), col("t_href").as("tb_href")),
        col("t_href") === col("tb_url") && col("t_url") === col("tb_href"),
        "left")
      .select(col("t_url"), col("t_hreflang"), col("t_href"),
        (col("t_href") === col("t_url") || col("tb_url").isNotNull)
          .as("t_reciprocal"))
      .distinct()
    val expected = Seq(
      ("plant://hl/a/en", "fr", "plant://hl/a/fr", true),
      ("plant://hl/b/en", "fr", "plant://hl/b/fr", false),
      ("plant://hl/b/en", "es", "plant://hl/b/es", false),
      ("plant://hl/c", "en", "plant://hl/c", true))
      .toDF("e_url", "e_hl", "e_href", "e_rec")
    rel.join(tRel,
        col("url") === col("t_url") && col("hreflang") === col("t_hreflang") &&
          col("href") === col("t_href"),
        "full_outer")
      .join(broadcast(expected),
        coalesce(col("url"), col("t_url")) === col("e_url") &&
          coalesce(col("hreflang"), col("t_hreflang")) === col("e_hl"),
        "left")
      .select(
        coalesce(col("url"), col("t_url")).as("url"),
        coalesce(col("hreflang"), col("t_hreflang")).as("hreflang"),
        coalesce(col("href"), col("t_href")).as("href"),
        col("reciprocal"),
        (col("url").isNotNull && col("t_url").isNotNull &&
          col("reciprocal") <=> col("t_reciprocal") &&
          (col("e_url").isNull ||
            (col("href") <=> col("e_href") &&
              col("reciprocal") <=> col("e_rec"))) &&
          !coalesce(col("url"), col("t_url")).contains("example.org/page/"))
          .as("hl_ok"))
      .orderBy(col("url"), col("hreflang"), col("href"))
  }

  /** q195: FRAGMENT-LINK INTEGRITY AUDIT — intra-page `href="#…"`
    * anchors against the page's `id=` population: broken fragments are
    * an extraction-quality signal (a table-of-contents whose targets
    * were boilerplate-stripped) and a crawl-trap tell (generated TOCs
    * pointing nowhere). Policy, identical in both paths: fragment links
    * are `<a>` START tags whose href begins with `#` (absolute URLs
    * with fragments are NOT intra-page links and are excluded); the
    * bare `#` resolves to the top of the page by definition; any other
    * fragment resolves iff some start tag on the page carries exactly
    * that `id`. Duplicate (url, frag) pairs collapse.
    *
    * Not SQL-expressible → self-certifying `frag_ok`: relational
    * (generator → anchor/id sets → left semi test) == sequential
    * walker, planted ok/broken/top/external cases pinned.
    *
    * Scale shape: one generator pass → two url-keyed distinct sets →
    * one url+frag equi-join; all keys page-scoped.
    */
  def q195FragmentLinks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    val plantedDocs = Seq(
      ("plant://frag/a",
        "<h2 id=\"intro\">Intro</h2><a href=\"#intro\">jump</a>" +
          "<a href=\"#missing\">broken</a><a href=\"#\">top</a>" +
          "<a href=\"https://x.example/#frag\">external</a>"),
      ("plant://frag/b",
        "<div id=\"x\"></div><a href=\"#x\">one</a><a href=\"#x\">dup</a>"))
    val volume = (0 until 50).map { i =>
      val sb = new StringBuilder("<html><body>")
      for (j <- 0 until 4) {
        sb.append("<h3 id=\"sec").append(j).append("\">s</h3>")
        sb.append("<a href=\"#sec").append((i + j) % 6).append("\">go</a>")
      }
      (f"plant://frag/vol/$i%02d", sb.append("</body></html>").toString)
    }
    val input = pages(s).select(col("url"), col("html"))
      .unionByName((plantedDocs ++ volume).toDF("url", "html_str")
        .select(col("url"), col("html_str").cast("binary").as("html")))
    input.createOrReplaceTempView("pages_frag")
    val frags = s.sql(
      """SELECT DISTINCT url, substring(n.attrs['href'], 2) AS frag
        |FROM pages_frag LATERAL VIEW html_nodes(html) n
        |WHERE n.ntype = 'START' AND n.tag = 'a'
        |  AND n.attrs['href'] IS NOT NULL
        |  AND startswith(n.attrs['href'], '#')""".stripMargin)
    val ids = s.sql(
      """SELECT DISTINCT url AS i_url, n.attrs['id'] AS i_id
        |FROM pages_frag LATERAL VIEW html_nodes(html) n
        |WHERE n.ntype = 'START' AND n.attrs['id'] IS NOT NULL""".stripMargin)
    val rel = frags.join(ids,
        col("url") === col("i_url") && col("frag") === col("i_id"), "left")
      .select(col("url"), col("frag"),
        (col("frag") === "" || col("i_url").isNotNull).as("resolved"))
      .distinct()
    val typed = input.as[(String, Array[Byte])].flatMap { case (url, html) =>
      val nds = HtmlScanner.parse(
        if (html == null) Array.emptyByteArray else html)
      val ids0 = scala.collection.mutable.Set.empty[String]
      val fr = scala.collection.mutable.Set.empty[String]
      nds.foreach { nd =>
        if (nd.nodeType == NodeType.StartTag) {
          def a(n: String) = nd.attrs.find(_.name == n).map(_.value).orNull
          val id = a("id")
          if (id != null) ids0 += id
          if (nd.tagName == "a") {
            val href = a("href")
            if (href != null && href.startsWith("#")) fr += href.substring(1)
          }
        }
      }
      fr.iterator.map(f => (url, f, f.isEmpty || ids0(f)))
    }.toDF("t_url", "t_frag", "t_resolved")
    val expected = Seq(
      ("plant://frag/a", "intro", true), ("plant://frag/a", "missing", false),
      ("plant://frag/a", "", true), ("plant://frag/b", "x", true))
      .toDF("e_url", "e_frag", "e_res")
    rel.join(typed,
        col("url") === col("t_url") && col("frag") === col("t_frag"),
        "full_outer")
      .join(broadcast(expected),
        coalesce(col("url"), col("t_url")) === col("e_url") &&
          coalesce(col("frag"), col("t_frag")) === col("e_frag"),
        "left")
      .select(
        coalesce(col("url"), col("t_url")).as("url"),
        coalesce(col("frag"), col("t_frag")).as("frag"),
        col("resolved"),
        (col("url").isNotNull && col("t_url").isNotNull &&
          col("resolved") <=> col("t_resolved") &&
          (col("e_url").isNull || col("resolved") <=> col("e_res")) &&
          // the planted external link must never appear as a fragment
          !(coalesce(col("url"), col("t_url")) === "plant://frag/a" &&
            coalesce(col("frag"), col("t_frag")).contains("frag")))
          .as("frag_ok"))
      .orderBy(col("url"), col("frag"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q195_fragment_links" -> q195FragmentLinks _,
    "q190_hreflang" -> q190Hreflang _,
    "q185_og_cards" -> q185OgCards _,
    "q186_paywall" -> q186Paywall _,
    "q179_microdata" -> q179Microdata _,
    "q173_pub_date" -> q173PubDate _,
    "q174_license" -> q174License _,
    "q169_alt_text" -> q169AltText _,
    "q148_audio_neardup" -> q148AudioNeardup _,
    "q157_exif" -> q157Exif _,
    "q160_subtitles" -> q160Subtitles _,
    "q161_mp3" -> q161Mp3 _,
    "q164_extract_any" -> q164ExtractAny _,
    "q165_boilerpipe" -> q165Boilerpipe _,
    "q146_heading_outline" -> q146HeadingOutline _,
    "q145_image_neardup" -> q145ImageNeardup _,
    "q108_canonical" -> q108Canonical _,
    "q79_charset" -> q79Charset _,
    "q78_feeds" -> q78Feeds _,
    "q77_tables" -> q77Tables _,
    "q76_selectors" -> q76Selectors _,
    "q74_markdown" -> q74Markdown _,
    "q71_link_graph" -> q71LinkGraph _,
    "q142_jsonld" -> q142Jsonld _,
    "q127_template_cluster" -> q127TemplateCluster _,
    "q72_link_rank" -> q72LinkRank _,
    "q89_anchor_text" -> q89AnchorText _,
    "q95_hits" -> q95Hits _,
    "q110_crawl_hops" -> q110CrawlHops _,
    "q30_extract_pages" -> q30ExtractPages _,
    "q31_node_table" -> q31NodeTable _,
    "q32_tag_histogram" -> q32TagHistogram _,
    "q33_binary_features" -> q33BinaryFeatures _,
    "q34_sql_extract" -> q34SqlExtract _,
    "q36_sql_nodes" -> q36SqlNodes _,
    "q37_outlinks" -> q37Outlinks _,
    "q38_pdf_extract" -> q38PdfExtract _,
    "q46_titles" -> q46Titles _,
  )

  /** No DuckDB oracles — the scanner itself is the operator under test. */
  val oracles: Map[String, String] = Map.empty
}
