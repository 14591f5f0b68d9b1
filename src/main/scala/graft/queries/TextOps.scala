package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data text operators over the `documents` table: exact dedup,
  * n-gram Jaccard near-dup, MinHash+LSH, SimHash, token stats, quality
  * scoring, language-ID heuristic, document fingerprinting.
  *
  * All hashing is md5 (identical in Spark and DuckDB) so every operator here
  * has a full DuckDB oracle. Determinism rules as in [[Q]]: integer-only
  * outputs (ratios become `*_x1000` BIGINTs), unique-key ORDER BY.
  *
  * Scale notes (100 TB): every op is a single explode→groupBy shuffle keyed
  * on doc_id or shingle — embarrassingly parallel. The LSH band join is the
  * scale path for near-dup (candidate pairs only, never the O(n²) cross
  * product); the plain Jaccard query is deliberately restricted to a sampled
  * id stripe because an all-pairs shingle join does not survive 100× growth.
  */
object TextOps {
  import Q._

  /** EXPLICIT whitespace class, same byte-set in Java regex and RE2: Java's
    * `\s` includes U+000B (vertical tab), RE2's does not, so every regex
    * that must agree with the DuckDB oracle spells the class out (the
    * oracle strings use the literal-backslash RE2 spelling `[ \t\n\f\r\x0B]`).
    */
  private[graft] val WS = "[ \\t\\n\\f\\r\\x0B]+"

  private def tokens(c: Column): Column = split(lower(trim(c)), WS)

  /** Distinct word-bigram shingles of the lowercased text. */
  private[queries] def bigrams(c: Column): Column = {
    val t = tokens(c)
    array_distinct(zip_with(
      slice(t, lit(1), size(t) - 1),
      slice(t, lit(2), size(t) - 1),
      (a, b) => concat(a, lit(" "), b)))
  }

  private def md5s(c: Column): Column = md5(c.cast("binary"))

  private[queries] val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** Exact dedup by content hash: one hash-groupBy shuffle on the md5 key;
    * keeper = min(doc_id). At 100 TB: group on the 128-bit digest, never on
    * the raw text bytes.
    */
  def q15DedupExact(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .groupBy(md5s(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("dupes"))
      .orderBy(col("fp"))

  /** Token statistics per document. */
  def q16TokenStats(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("doc_id"),
        size(tokens(col("text"))).as("n_tokens"),
        size(array_distinct(tokens(col("text")))).as("n_uniq"),
        length(col("text")).as("chars"),
        length(regexp_replace(col("text"), WS, "")).as("chars_nows"))
      .orderBy(col("doc_id"))

  /** Quality scoring: length bounds + stopword-ratio floor, integer-only
    * arithmetic (stop_cnt*20 >= words ⇔ ratio ≥ 5%).
    */
  def q17QualityScore(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val words = size(toks)
    val stopCnt = size(filter(toks, t => t.isin(stopwords: _*)))
    tbl(s, dir, "documents")
      .select(col("doc_id"), words.as("words"), stopCnt.as("stop_cnt"),
        length(col("text")).as("chars"),
        (words >= 20 && words <= 5000 && stopCnt * 20 >= words).as("is_quality"))
      .orderBy(col("doc_id"))
  }

  /** q75: COMPRESSION-RATIO quality signal — the CCNet-style gate:
    * deflate(text)/|text| ×1000 through the codegen'd
    * `deflate_ratio_x1000` Expression. Machine-generated/boilerplate text
    * compresses far below natural prose; near-random noise sits near (or
    * above) 1000. Rows-only (DuckDB ships no deflate): `compress_ok`
    * self-certifies with (a) positivity on non-empty text, (b) a hard
    * upper bound (deflate stored-block overhead caps expansion well under
    * 2×), and (c) the SELF-DOUBLING property — deflate finds the
    * repetition in text∥text, so ratio(text∥text) ≤ ratio(text) + slack
    * whenever the doc fits the 32 KB deflate window (longer docs skip
    * that leg: the duplicate lies beyond the window by construction).
    * Stateless per-row; the gate column `keep_compress` is the band a
    * curation pipeline keeps.
    */
  def q75CompressQuality(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(s)
    val ratio = expr("deflate_ratio_x1000(text)")
    val doubled = expr("deflate_ratio_x1000(concat(text, text))")
    tbl(s, dir, "documents")
      .select(col("doc_id"), length(col("text")).as("chars"),
        ratio.as("ratio_x1000"), doubled.as("doubled_x1000"))
      .select(col("doc_id"), col("chars"), col("ratio_x1000"),
        col("doubled_x1000"),
        (col("ratio_x1000") >= 200 && col("ratio_x1000") <= 1100)
          .as("keep_compress"),
        ((col("chars") === 0 || col("ratio_x1000") > 0) &&
          col("ratio_x1000") <= 1500 &&
          (col("chars") >= 30000 ||
            col("doubled_x1000") <= col("ratio_x1000") + 10))
          .as("compress_ok"))
      .orderBy(col("doc_id"))
  }

  /** Language-ID heuristic: CJK codepoint presence, else stopword density.
    * (The harness corpus is a shared-vocabulary word salad, so this pins the
    * deterministic heuristic, not classifier accuracy.)
    */
  def q18LangId(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val words = size(toks)
    val stopCnt = size(filter(toks, t => t.isin(stopwords: _*)))
    tbl(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        when(regexp_count(col("text"), lit("[一-鿿]")) > 0, "cjk")
          .when(stopCnt * 100 >= words * 3, "en")
          .otherwise("other").as("lang_guess"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprints: md5 of whitespace-normalized text + md5 of the
    * sorted distinct token set (word-order-insensitive).
    */
  def q19Fingerprint(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("doc_id"),
        md5s(lower(regexp_replace(trim(col("text")), WS, " "))).as("fp"),
        md5s(array_join(array_sort(array_distinct(tokens(col("text")))), " ")).as("tok_fp"))
      .orderBy(col("doc_id"))

  /** Gopher-style repetition/composition filters (public: Rae et al.,
    * "Scaling Language Models: … Gopher", 2021, Table A1): duplicate-token
    * fraction, most-frequent-bigram fraction, mean word length, and the
    * composed `keep` decision. All ratios are integer ‰/% so the DuckDB
    * twin hashes identically. One explode→two-level groupBy for the bigram
    * mode (partial aggregation keeps the shuffle at (doc, bigram) grain);
    * everything else is per-row — embarrassingly parallel at 100 TB.
    */
  def q50QualityGopher(s: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val base = tbl(s, dir, "documents").select(
      col("doc_id"),
      size(t).as("words"),
      size(array_distinct(t)).as("uniq"),
      length(regexp_replace(col("text"), WS, "")).as("cnw"),
      // non-distinct bigram list: repetition is the signal here
      zip_with(
        slice(t, lit(1), size(t) - 1),
        slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b)).as("bg"))
    val mode = base.select(col("doc_id"), explode(col("bg")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("topc"), sum(col("c")).as("totc"))
    val dupTok = round(lit(1000.0) * (col("words") - col("uniq")) / col("words")).cast("long")
    val topBg = round(lit(1000.0) * col("topc") / col("totc")).cast("long")
    val meanWl = round(lit(100.0) * col("cnw") / col("words")).cast("long")
    base.join(mode, "doc_id")
      .select(col("doc_id"), col("words"),
        dupTok.as("dup_tok_x1000"),
        topBg.as("top_bigram_x1000"),
        meanWl.as("mean_wlen_x100"),
        (col("words") >= 30 && dupTok <= 600 && topBg <= 60).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Training-set materialization: the composed end-of-pipeline decision —
    * exact-dedup keeper (md5 window) ∧ quality (q17's predicate) — rolled
    * up per (lang, source) with kept/dropped accounting. This is the
    * accounting query a 100 TB curation run emits per snapshot: one window
    * shuffle on the 128-bit digest + one partial-aggregated groupBy on two
    * low-cardinality keys.
    */
  def q51CorpusKept(s: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val words = size(t)
    val stopCnt = size(filter(t, x => x.isin(stopwords: _*)))
    val d = tbl(s, dir, "documents").select(
      col("doc_id"), col("lang"), col("source"), col("n_chars"),
      (words >= 20 && words <= 5000 && stopCnt * 20 >= words).as("is_quality"),
      md5s(col("text")).as("fp"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val keep = col("doc_id") === col("keeper") && col("is_quality")
    d.withColumn("keeper", min(col("doc_id")).over(w))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("doc_id") =!= col("keeper"), 1L).otherwise(0L)).as("n_dup_dropped"),
        sum(when(col("doc_id") === col("keeper") && !col("is_quality"), 1L)
          .otherwise(0L)).as("n_lowq_dropped"),
        sum(when(keep, col("n_chars")).otherwise(0L)).as("kept_chars"))
      .orderBy(col("lang"), col("source"))
  }

  /** Distributed sequence packing — the "concat-and-chunk" layout step
    * that turns a curated corpus into fixed-length training sequences:
    * documents are concatenated in global `doc_id` order and the token
    * stream is cut every `seqLen` tokens, so each document occupies
    * `[start_off, start_off+tok_len)` of the stream and spans sequences
    * `first_seq..last_seq`.
    *
    * The global running offset is a prefix sum, computed in the SCALABLE
    * two-level form instead of one `Window.orderBy(doc_id)` (which moves
    * the whole corpus to a single reducer): documents land in contiguous
    * doc_id-range buckets, each bucket computes its local cumulative sum
    * in parallel, and only the B bucket TOTALS (B ≈ parallelism, a
    * few-hundred-row table) pay a single-partition window before being
    * broadcast back as per-bucket offsets. The DuckDB oracle computes the
    * straight global window — equality proves the decomposition exact.
    */
  def packSequences(docs: DataFrame, seqLen: Int, buckets: Int): DataFrame = {
    require(seqLen > 0 && buckets > 0)
    import org.apache.spark.sql.expressions.Window
    val lens = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("tok_len"))
    val r = lens.agg(min(col("doc_id")), max(col("doc_id"))).head()
    if (r.isNullAt(0)) return lens.select(col("doc_id"), col("tok_len"),
      lit(0L).as("start_off"), lit(0L).as("first_seq"),
      lit(0L).as("last_seq"), lit(0L).as("n_seqs"))
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val span = hi - lo + 1
    val bucketed = lens.withColumn("bucket",
      expr(s"((doc_id - $lo) * $buckets) div $span"))
    val localW = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
    val local = bucketed.withColumn("local_end",
      sum(col("tok_len")).over(localW))
    // B rows total: the only single-partition window in the plan
    val offW = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("bucket"))
      .agg(sum(col("tok_len")).as("btot"))
      .withColumn("boff", coalesce(sum(col("btot")).over(offW), lit(0L)))
      .select(col("bucket"), col("boff"))
    local.join(broadcast(offsets), "bucket")
      .withColumn("start_off", col("boff") + col("local_end") - col("tok_len"))
      .withColumn("first_seq", expr(s"start_off div ${seqLen}L"))
      .withColumn("last_seq", when(col("tok_len") > 0,
        expr(s"(start_off + tok_len - 1) div ${seqLen}L"))
        .otherwise(col("first_seq")))
      .withColumn("n_seqs", when(col("tok_len") > 0,
        col("last_seq") - col("first_seq") + 1).otherwise(lit(0L)))
      .select(col("doc_id"), col("tok_len"), col("start_off"),
        col("first_seq"), col("last_seq"), col("n_seqs"))
  }

  /** q86: sequence packing over the documents table at seqLen=512 —
    * see [[packSequences]]; the oracle is the straight global-window
    * form, so every offset/boundary of the distributed decomposition is
    * value-checked.
    */
  def q86SeqPack(s: SparkSession, dir: String): DataFrame =
    packSequences(tbl(s, dir, "documents"), 512, 8)
      .orderBy(col("doc_id"))

  /** q138: SENTENCE-BOUNDARY training chunks — split each document into
    * training sequences of ≤ N tokens WITHOUT cutting mid-sentence (the
    * context-window prep step: q86 packs whole docs into offsets, q126
    * bins them; this is the within-doc splitter for docs longer than the
    * window, greedy first-fit in reading order, mono-sentence overflow
    * kept whole — the no-split integrity rule of q126 applied one level
    * down). Greedy reset-on-overflow is inherently sequential PER DOC and
    * embarrassingly parallel ACROSS docs, so it runs as ONE stateless
    * projection: an `aggregate` HOF folds the per-sentence token counts
    * into chunk ids inside the row — no shuffle, no window, nothing
    * driver-side. The only Exchange is the (doc, chunk) rollup that
    * rebuilds chunk text (md5-verified against the oracle's
    * string_agg rebuild — boundary placement AND text integrity in one
    * hash). The oracle replays the same greedy scan as a recursive CTE:
    * a different evaluation strategy entirely, so agreement checks the
    * fold, not its transcription.
    */
  def q138SentenceChunks(s: SparkSession, dir: String): DataFrame = {
    val cap = 32
    // the harness docs carry no punctuation, so sentence boundaries are
    // PLANTED in-query (the q48/q53 convention, identical in the oracle):
    // sentence k of a doc = tokens [k·g+1 .. (k+1)·g], g = 3 + doc_id%37
    // — sentence lengths 3..39 straddle the cap, so the corpus exercises
    // multi-chunk docs AND the mono-sentence-overflow (kept-whole) rule
    val toks = split(trim(col("text")), WS)
    val g = (col("doc_id") % 37 + 3).cast("int")
    val sents = transform(
      sequence(lit(0),
        floor((size(toks) - 1).cast("double") / g).cast("int")),
      k => array_join(slice(toks, k * g + 1, g), " "))
    val tks = transform(col("sents"), x => size(split(trim(x), WS)))
    val assigned = aggregate(
      col("tks"),
      struct(expr("cast(array() as array<int>)").as("ch"),
        lit(0).as("c"), lit(0).as("run"), lit(true).as("first")),
      (a, t) => {
        val newChunk = !a.getField("first") &&
          (a.getField("run") + t > lit(cap))
        val c = when(newChunk, a.getField("c") + 1)
          .otherwise(a.getField("c"))
        struct(concat(a.getField("ch"), array(c)).as("ch"),
          c.as("c"),
          when(newChunk, t).otherwise(a.getField("run") + t).as("run"),
          lit(false).as("first"))
      },
      a => a.getField("ch"))
    tbl(s, dir, "documents")
      .select(col("doc_id"), sents.as("sents"))
      .withColumn("tks", tks)
      .withColumn("chunks", assigned)
      .select(col("doc_id"),
        posexplode(arrays_zip(col("sents"), col("chunks"), col("tks"))))
      .select(col("doc_id"), col("pos"),
        col("col.sents").as("sent"), col("col.chunks").as("chunk"),
        col("col.tks").as("tk"))
      .groupBy(col("doc_id"), col("chunk").cast("long").as("chunk"))
      .agg(count(lit(1)).as("n_sents"),
        sum(col("tk")).cast("long").as("chunk_tokens"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("sent")))),
            x => x.getField("sent")), ". ").cast("binary")).as("text_md5"))
      .orderBy(col("doc_id"), col("chunk"))
  }

  /** q88: token-budget corpus MIXING — the "data recipe" step of training
    * set assembly (per-source mixture weights à la The Pile / Dolma): given
    * a global token budget and per-source weights, compute each source's
    * deterministic keep-rate and sample by content-stable hash. All
    * arithmetic is integer (rates in basis points, floor division) so the
    * DuckDB oracle reproduces every row bit-for-bit; the md5-bucket
    * sampling is the q54 discipline — adding documents never flips an
    * existing doc's keep decision, so the recipe is reproducible across
    * snapshots.
    *
    * Scale: one map-combined per-source token aggregate (S rows), the
    * S-row rate table broadcast back — the corpus itself pays one scan
    * and no shuffle beyond the aggregate.
    */
  def q88MixtureSample(s: SparkSession, dir: String): DataFrame = {
    val budget = 200000L
    val lens = tbl(s, dir, "documents").select(col("doc_id"), col("source"),
      size(tokens(col("text"))).cast("long").as("tok_len"))
    val w = expr("(CAST(substring(source, 4, 10) AS INT) % 4) + 1")
    val per = lens.groupBy(col("source"))
      .agg(sum(col("tok_len")).as("toks")).withColumn("w", w)
    val wsum = per.agg(sum(col("w")).as("wsum"))
    val rates = per.crossJoin(wsum) // S rows × 1 row
      .withColumn("rate_bp",
        least(lit(10000L),
          expr(s"(CAST($budget AS BIGINT) * w * 10000) div (wsum * toks)")))
      .select(col("source"), col("rate_bp"))
    val bucket = (conv(substring(md5(col("doc_id").cast("string")
      .cast("binary")), 1, 4), 16, 10).cast("long") % 10000).as("bucket")
    lens.join(broadcast(rates), "source")
      .select(col("doc_id"), col("source"), col("tok_len"), bucket,
        col("rate_bp"))
      .withColumn("keep", col("bucket") < col("rate_bp"))
      .orderBy(col("doc_id"))
  }

  /** q139: TEMPERATURE-based mixture sampling — the α-weighted corpus
    * draw (budget share ∝ n_s^α) that upweights small sources relative to
    * q88's linear weights: the multilingual standard (mT5/UNIMAX family)
    * for keeping head domains from drowning tail ones. α = 1/2, and the
    * whole computation stays EXACT-INTEGER so every row oracle-matches:
    * n^(1/2) is an exact integer sqrt (double-sqrt floor with a ±1
    * integer correction — floor(sqrt) alone can be off by one ulp-flip),
    * rates are basis points by integer floor division, the keep decision
    * is q88's md5-bucket discipline, and the per-source rollup carries
    * kept docs/tokens as evidence the rates actually applied.
    *
    * Scale shape: one map-combined per-source aggregate (S rows), an
    * S-row weight table broadcast back, one scan deciding keeps, one
    * low-cardinality rollup. The corpus never shuffles.
    */
  def q139TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    // token budget 15000 — below the corpus size at every harness scale,
    // so rates stay sub-unit and the α-upweighting is visible per source
    val lens = tbl(s, dir, "documents").select(col("doc_id"), col("source"),
      size(tokens(col("text"))).cast("long").as("tok_len"))
    val per = lens.groupBy(col("source"))
      .agg(sum(col("tok_len")).as("toks"))
    val r0 = floor(sqrt(col("toks").cast("double"))).cast("long")
    val w = per.withColumn("r0", r0)
      .withColumn("w",
        col("r0") -
          when(col("r0") * col("r0") > col("toks"), 1L).otherwise(0L) +
          when((col("r0") + 1) * (col("r0") + 1) <= col("toks"), 1L)
            .otherwise(0L))
      .drop("r0")
    val wsum = w.agg(sum(col("w")).as("wsum"))
    val rates = w.crossJoin(broadcast(wsum))
      // `div` (integer floor), never `/` (double — a quotient rounding up
      // across an integer boundary would truncate to the wrong rate)
      .withColumn("rate_bp",
        least(lit(10000L), expr(
          "(CAST(10000 AS BIGINT) * CAST(15000 AS BIGINT) * w) div (wsum * toks)")))
      .select(col("source"), col("toks"), col("w"), col("rate_bp"))
    val bucket = (conv(substring(md5(col("doc_id").cast("string")
      .cast("binary")), 1, 4), 16, 10).cast("long") % 10000).as("bucket")
    lens.select(col("doc_id"), col("source"), col("tok_len"), bucket)
      .join(broadcast(rates), "source")
      .withColumn("kept", col("bucket") < col("rate_bp"))
      .groupBy(col("source"), col("toks"), col("w"), col("rate_bp"))
      .agg(count(lit(1)).as("docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("kept_docs"),
        sum(when(col("kept"), col("tok_len")).otherwise(0L)).as("kept_tokens"))
      .orderBy(col("source"))
  }

  /** q217: DATA-CONSTRAINED EPOCH ALLOCATION — when the training token
    * budget B exceeds the unique corpus size U, data is REPEATED, and
    * repeating up to ~4 epochs costs almost nothing while further epochs
    * decay fast (Muennighoff et al., NeurIPS 2023, "Scaling
    * Data-Constrained Language Models"). The operator every
    * budget-planning run needs: given per-source unique token counts and
    * a quality ranking, allocate B as a 1-epoch base for everyone plus a
    * quality-ordered WATERFALL of extra epochs capped at 4 total per
    * source — the best sources repeat first, the partially-funded source
    * at the waterline gets an exact fractional epoch in basis points.
    *
    * The waterfall is sequential by definition, but over S sources, not
    * N docs: extra_s = clamp(R − Σ_{rank<s} 3·n_t, 0, 3·n_s) with
    * R = B − U, so one cumulative-sum window over the S-row per-source
    * table computes the whole allocation — the corpus itself pays one
    * map-combined aggregate and never shuffles. Every number is exact
    * integer (B = 5·U div 2, ranks by integer mean-length quality), so
    * the DuckDB oracle matches bit-for-bit.
    */
  def q217EpochAlloc(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lens = tbl(s, dir, "documents").select(col("source"),
      size(tokens(col("text"))).cast("long").as("tok_len"))
    val per = lens.groupBy(col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("tok_len")).as("toks"))
      .withColumn("quality_x1000", expr("(1000 * toks) div docs"))
    val u = per.agg(sum(col("toks")).as("u_toks"))
    // S rows from here on — the window is over the per-source table only
    val rankW = Window.orderBy(col("quality_x1000").desc, col("source"))
    val cumW = rankW.rowsBetween(Window.unboundedPreceding, -1)
    per.crossJoin(broadcast(u))
      .withColumn("budget", expr("(5 * u_toks) div 2"))
      .withColumn("rank", row_number().over(rankW))
      .withColumn("cum_before",
        coalesce(sum(lit(3L) * col("toks")).over(cumW), lit(0L)))
      .withColumn("extra",
        greatest(lit(0L), least(col("budget") - col("u_toks") - col("cum_before"),
          lit(3L) * col("toks"))))
      .select(col("source"), col("docs"), col("toks"),
        col("quality_x1000"), col("rank"),
        (lit(1L) + expr("extra div toks")).as("epochs_full"),
        expr("((extra % toks) * 10000) div toks").as("partial_bp"),
        (col("toks") + col("extra")).as("toks_alloc"))
      .orderBy(col("rank"))
  }

  /** q87: HyperLogLog distinct sketches
    * ([[graft.functions.HllBuild]]/[[graft.functions.HllUnion]]) — per
    * (lang, source) distinct-text cardinality as a constant-size mergeable
    * sketch, PLUS a total row whose sketch is the UNION of the group
    * sketches (never re-reads the documents — the manifest-rollup path).
    * The exact `countDistinct` twin rides along only as verification:
    * `hll_ok` asserts every estimate within 5 % (+3 absolute for tiny
    * groups) of exact, including the rolled-up total. Production keeps the
    * sketch column and drops the exact twin — that is the point: at 100 TB
    * the exact form shuffles every distinct key, the sketch form shuffles
    * 4 KiB per group and yesterday's sketches union with today's for free.
    */
  def q87HllDistinct(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(s)
    val d = tbl(s, dir, "documents")
      .select(col("lang"), col("source"), xxhash64(col("text")).as("h"))
    val groups = d.groupBy(col("lang"), col("source"))
      .agg(countDistinct(col("h")).as("exact_distinct"),
        graft.functions.HllBuild.udafColumn(col("h"), 12).as("sketch"))
    val globalExact = d.agg(countDistinct(col("h")).as("exact_distinct"))
    val total = groups
      .agg(graft.functions.HllUnion.udafColumn(col("sketch")).as("sketch"))
      .crossJoin(globalExact) // both sides are ONE row
      .select(lit("*").as("lang"), lit("*").as("source"),
        col("exact_distinct"), col("sketch"))
    groups.select(col("lang"), col("source"), col("exact_distinct"), col("sketch"))
      .unionByName(total)
      .withColumn("est", call_function("hll_estimate", col("sketch")))
      .withColumn("hll_ok",
        abs(col("est") - col("exact_distinct")) <=
          col("exact_distinct") * 0.05 + 3)
      .select(col("lang"), col("source"), col("exact_distinct"),
        col("est"), col("hll_ok"))
      .orderBy(col("lang"), col("source"))
  }

  /** Deterministic train/val/test split assignment — the held-out-split
    * operator every training pipeline needs: bucket = first 16 md5 bits of
    * the doc id mod 100, split by 80/10/10 ranges. Hash-based (not random)
    * so the split is stable under corpus growth, re-runs, and engine
    * changes — adding documents never moves an existing one across splits.
    * Stateless per-row; at 100 TB this is a free projection fused into
    * whatever scan precedes it.
    */
  def q54HashSplit(s: SparkSession, dir: String): DataFrame = {
    val bucket = (conv(substring(md5(col("doc_id").cast("string")
      .cast("binary")), 1, 4), 16, 10).cast("long") % 100).as("bucket")
    tbl(s, dir, "documents")
      .select(col("doc_id"), bucket)
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))
      .orderBy(col("doc_id"))
  }

  /** Unigram surprisal scoring — the language-model-quality proxy of a
    * curation pipeline (docs full of corpus-rare tokens score high,
    * boilerplate-repetitive docs score low) with an EXACT cross-engine
    * contract: per-token surprisal is the integer log2 proxy
    * `len(bin(N)) - len(bin(cnt))` (floor-log2 of N/cnt, exactly
    * computable in both engines — a float `ln` would differ in the last
    * ulp between libms). Scale shape: one token-frequency aggregate, one
    * join keyed on the token (the frequency table broadcasts when the
    * vocabulary is small; shuffles cleanly when it isn't), one per-doc
    * aggregate.
    */
  def q55Surprisal(s: SparkSession, dir: String): DataFrame = {
    val tk = tbl(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val freq = tk.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    // corpus total from the vocabulary-sized frequency table — summing tk
    // again would re-scan and re-explode every document
    val total = freq.agg(sum(col("cnt")).as("total"))
    val bits = length(bin(col("total"))) - length(bin(col("cnt")))
    // EXPLICIT broadcast of the vocabulary side (round-3 verdict): the
    // (doc, token) side joins on the token key, and Zipf's head ("the")
    // carries ~5-7% of all rows — a guaranteed straggler under a shuffled
    // equi-join at corpus scale. The vocabulary is orders of magnitude
    // smaller than the corpus; if it ever outgrows broadcast range,
    // salt the top-k hot tokens instead of falling back to a plain
    // token-keyed shuffle.
    tk.join(broadcast(freq), "tok")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("words"),
        sum(bits.cast("long")).as("surprisal_bits"))
      .select(col("doc_id"), col("words"), col("surprisal_bits"),
        round(lit(100.0) * col("surprisal_bits") / col("words"))
          .cast("long").as("avg_bits_x100"))
      .orderBy(col("doc_id"))
  }

  /** TF-IDF top terms per document (integer idf via the same log2 proxy as
    * q55; ties broken on the token so the top-3 is engine-independent).
    * Scale shape: (doc, token) aggregate → document-frequency aggregate →
    * window top-k per doc (WindowGroupLimit prunes before the shuffle).
    */
  def q56TfidfTop(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = tbl(s, dir, "documents")
    val nDocs = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok"))
    // document-frequency table broadcast for the same Zipf-head-skew
    // reason as q55's frequency table (round-3 verdict)
    tf.join(broadcast(df), "tok")
      .crossJoin(broadcast(nDocs))
      .withColumn("idf_bits",
        (length(bin(col("n_docs"))) - length(bin(col("df")))).cast("long"))
      .withColumn("score", col("tf") * col("idf_bits"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("tok"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** BPE-ish token counting: a GPT-2-flavored pretokenizer pattern (letter
    * runs | digit runs | single punctuation) alongside the whitespace
    * count — the token-budget estimate a training pipeline runs before the
    * real (vocab-bound) tokenizer. The pattern is RE2-safe, lookahead-free
    * and uses an EXPLICIT whitespace class — Java's `\s` includes \x0B,
    * RE2's does not, so a shorthand class would silently diverge between
    * the engines on vertical-tab input. Stateless per-row.
    */
  def q57BpeTokens(s: SparkSession, dir: String): DataFrame = {
    val pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\f\\r\\x0B]"
    tbl(s, dir, "documents")
      .select(col("doc_id"),
        size(tokens(col("text"))).as("ws_tokens"),
        regexp_count(col("text"), lit(pat)).as("bpe_tokens"))
      .withColumn("ratio_x100",
        round(lit(100.0) * col("bpe_tokens") / col("ws_tokens")).cast("long"))
      .orderBy(col("doc_id"))
  }

  /** Winnowing fingerprints (public: Schleimer/Wilkerson/Aiken, "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
    * scheme): rolling 8-char-gram hashes, minimum per 4-gram window,
    * distinct minima = the document sketch. Guarantees any shared run of
    * ≥ 11 chars contributes a shared fingerprint, position-robustly —
    * the rolling-hash fingerprint leg of the checklist. One explode over
    * char positions + one window min + distinct: all shuffles keyed on
    * (doc_id, chunk) — see [[winnowFingerprints]] for the giant-doc
    * chunking.
    */
  def q58Winnow(s: SparkSession, dir: String): DataFrame =
    winnowFingerprints(tblWide(s, dir, "documents"),
      // tuning surface: larger chunks trade skew protection for less
      // per-chunk overhead (results identical at ANY value — exactness
      // property); default 4096 bounds a task at ~4 KB of grams
      chunkChars = sys.env.getOrElse("GRAFT_WINNOW_CHUNK", "4096").toInt)
      .orderBy(col("doc_id"), col("fp"))

  /** Chunked winnowing core (k = 8-char grams, window w = 4, guarantee
    * t = w + k - 1 = 11 chars). Giant-doc skew defense (round-3 verdict):
    * the normalized text is split into `chunkChars`-sized chunks
    * overlapping by t - 1 = 10 chars and window minima are computed within
    * (doc, chunk) partitions, so the window-sort key is (doc_id, chunk)
    * and a single giant document spreads over ~len/chunkChars tasks
    * instead of owning one. EXACT by winnowing's locality: every complete
    * window spans exactly 11 chars, so with step = chunkChars - 10 each
    * global window lies wholly inside ≥ 1 chunk, chunk-local minima equal
    * the global ones, and boundary duplicates collapse in the final
    * distinct — chunked == unchunked fingerprint sets (property-tested in
    * NeardupSpec across random texts and chunk sizes).
    */
  private[queries] def winnowFingerprints(docs: DataFrame, chunkChars: Int): DataFrame = {
    require(chunkChars >= 11, s"chunkChars=$chunkChars cannot hold one 11-char window")
    import org.apache.spark.sql.expressions.Window
    val step = chunkChars - 10
    val norm = lower(regexp_replace(trim(col("text")), WS, " "))
    // len >= 11 ⇔ at least one complete window (8..10-char docs emitted
    // zero rows under the unchunked formulation too: grams but no window)
    val base = docs
      .select(col("doc_id"), norm.as("s"))
      .where(length(col("s")) >= 11)
    // chunk c covers global window starts (c*step, c*step + clen - 10];
    // floor((len-11)/step)+1 = ceil((len-10)/step) chunks cover every
    // complete window, and the last chunk always holds ≥ 11 chars
    val chunks = base
      .select(col("doc_id"),
        explode(sequence(lit(0),
          ((length(col("s")) - lit(11)) / lit(step)).cast("int"))).as("c"),
        col("s"))
      .select(col("doc_id"), col("c"),
        col("s").substr(col("c") * lit(step) + lit(1), lit(chunkChars)).as("ch"))
    val grams = chunks
      .select(col("doc_id"), col("c"), col("ch"),
        explode(sequence(lit(1), length(col("ch")) - 7)).as("p"))
      .select(col("doc_id"), col("c"), col("p"),
        conv(substring(md5(expr("cast(substring(ch, p, 8) as binary)")), 1, 15),
          16, 10).cast("long").as("h"),
        (length(col("ch")) - 7).as("nk"))
    val w = Window.partitionBy(col("doc_id"), col("c")).orderBy(col("p"))
      .rowsBetween(Window.currentRow, 3)
    grams
      .withColumn("fp", min(col("h")).over(w))
      .where(col("p") <= col("nk") - 3) // complete windows only
      .select(col("doc_id"), col("fp")).distinct()
      // unordered: q58 sorts at its edge; q63's self-join doesn't need it
  }

  /** q63: cross-document shared-fingerprint pairs — the substring-overlap
    * near-dup detector built on the winnowing sketch (public: the MOSS
    * comparison step, Schleimer et al. SIGMOD'03; the sketch-level analog
    * of Lee et al. 2021's substring dedup): two docs sharing ≥ `minShared`
    * winnow fingerprints share that many ≥ 11-char runs. The ubiquity cap
    * is the scale guard: a fingerprint present in more than `maxDf` docs is
    * boilerplate (headers, licence text, "the of the") and is DROPPED
    * before the self-join — without it the hot fingerprint creates a
    * quadratic bucket exactly like an unsalted hot key. Scale shape:
    * fingerprint df aggregate → capped fingerprint self-join (each bucket
    * ≤ maxDf²/2 pairs) → pair count. All shuffles keyed on the 60-bit
    * fingerprint or the pair.
    */
  def q63WinnowPairs(s: SparkSession, dir: String): DataFrame = {
    // materialize the sketch once: it feeds the df aggregate AND both
    // sides of the self-join — without this the whole explode+window
    // winnow pipeline would run three times (measured 4.5 s → ~2 s at
    // sf0.1); a checkpoint/temp table in prod
    val fps = winnowFingerprints(tblWide(s, dir, "documents"), chunkChars = 4096)
      .localCheckpoint()
    val ok = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .where(col("df") <= 20)
      .select(col("fp"))
    val kept = fps.join(ok, "fp")
    kept.as("a").join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= 2)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** q70: C4-style SPAN dedup (public: Raffel et al. 2020 §2.2 — "we
    * discarded all but one of any three-sentence span occurring more than
    * once"): global first-occurrence dedup at sub-document grain, the step
    * that removes boilerplate shared across pages without dropping whole
    * documents. The harness corpus has no sentence punctuation, so the
    * span unit is 10-token chunks (the adaptation is the unit, not the
    * algorithm); the trailing <10-token remainder is kept unconditionally.
    * First occurrence = smallest (doc_id, position) — deterministic in
    * both engines. Output per doc: span counts, spans dropped, and the
    * md5 of the REBUILT text, so the reconstruction is value-checked too.
    * Scale shape: one explode to (span-text, doc, pos) rows, one window
    * shuffle keyed on the span hash (the global-first rule is exactly a
    * min over that key), one per-doc rebuild aggregate. At corpus scale
    * the span key is the md5, never the text.
    */
  def q70SpanDedup(s: SparkSession, dir: String): DataFrame =
    spanDedup(tbl(s, dir, "documents").select(col("doc_id"), col("text")),
      "doc_id", spanTokens = 10)
      .select(col("doc_id"), col("n_spans"), col("n_dropped"),
        md5s(col("clean_text")).as("new_sha"))
      .orderBy(col("doc_id"))

  /** Generic span-dedup core behind q70 and
    * [[graft.pipeline.SpanCleanStage]]: input `(idCol, text)` →
    * `(idCol, n_spans, n_dropped, clean_text)` where clean_text is the
    * rebuilt document keeping only globally-first span occurrences (plus
    * the trailing partial span unconditionally). First occurrence =
    * smallest (id, position) under the id column's natural ordering —
    * deterministic for both numeric and string keys.
    */
  private[graft] def spanDedup(docs: DataFrame, idCol: String,
                               spanTokens: Int): DataFrame = {
    require(spanTokens >= 2, s"spanTokens=$spanTokens")
    import org.apache.spark.sql.expressions.Window
    val st = spanTokens
    val base = docs
      .select(col(idCol), tokens(col("text")).as("tk"))
      .select(col(idCol), col("tk"), size(col("tk")).as("n"))
    val chunks = base
      .where(col("n") >= st)
      .select(col(idCol), col("tk"),
        explode(sequence(lit(1), col("n") - (st - 1), lit(st))).as("p"))
      .select(col(idCol), col("p"),
        array_join(slice(col("tk"), col("p"), lit(st)), " ").as("chunk"))
    val w = Window.partitionBy(col("chunk")).orderBy(col(idCol), col("p"))
    val agg = chunks.withColumn("rk", row_number().over(w))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("rk") > 1, 1L).otherwise(0L)).as("n_dropped"),
        array_join(transform(array_sort(collect_list(
          when(col("rk") === 1, struct(col("p"), col("chunk"))))),
          x => x.getField("chunk")), " ").as("kept_joined"))
    val trailing = array_join(
      slice(col("tk"), col("n") - pmod(col("n"), lit(st)) + 1,
        pmod(col("n"), lit(st))), " ")
    base.join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        concat_ws(" ",
          when(length(col("kept_joined")) > 0, col("kept_joined")),
          when(length(trailing) > 0, trailing)).as("clean_text"))
  }

  /** q69: re-crawl DELTA accounting — the incremental-ingest primitive: a
    * full-outer join of the previous snapshot's (url → content-sha) map
    * against the new crawl classifies every document as
    * unchanged / changed / new / gone, and the counts drive what actually
    * gets re-extracted (changed ∪ new) versus carried forward. Here both
    * snapshots derive deterministically from `documents` (drop ids
    * ≡0 mod 97 = gone, mutate text for ids ≡0 mod 31 = changed, inject
    * shifted ids = new) so the oracle constructs the identical delta.
    * Scale shape: one full-outer hash join on the doc key over (id, sha)
    * projections — the 128-bit sha travels, never the text — plus a
    * 4-group aggregate.
    */
  def q69CrawlDelta(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val prev = docs.select(col("doc_id"), md5s(col("text")).as("old_sha"))
    val next = docs.where(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"),
        md5s(when(col("doc_id") % 31 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text"))).as("new_sha"))
      .unionByName(docs.where(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          md5s(concat(lit("new "), col("doc_id").cast("string"))).as("new_sha")))
    prev.join(next, Seq("doc_id"), "full_outer")
      .select(
        when(col("old_sha").isNull, "new")
          .when(col("new_sha").isNull, "gone")
          .when(col("old_sha") =!= col("new_sha"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("docs"))
      .orderBy(col("status"))
  }

  /** q67: deterministic stratified sampling — exact per-stratum quotas
    * (here: 20 docs per (lang, source) cell) selected by hash order, the
    * way an eval/holdout set is carved from a 100 TB corpus: stable under
    * re-runs AND under corpus growth (a doc's rank only changes if docs
    * hashing lower join its cell), unlike rand()-based sampling which
    * reshuffles everything every run. Scale shape: one window shuffle
    * keyed on the stratum; Spark 4's WindowGroupLimit prunes to the top-k
    * per cell BEFORE the exchange, so the shuffle carries ~quota×cells
    * rows, not the corpus.
    */
  def q67StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(md5s(col("doc_id").cast("string")), col("doc_id"))
    tbl(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 20)
      .select(col("lang"), col("source"), col("rk").cast("long").as("rk"),
        col("doc_id"))
      .orderBy(col("lang"), col("source"), col("rk"))
  }

  /** Benchmark decontamination — the 13-gram overlap stage every serious
    * training-data pipeline runs (public: GPT-3 appendix C / PaLM): a doc
    * is contaminated if it shares any 13-token contiguous gram with an
    * eval-set item. The eval set here is synthesized in-query (token
    * windows [6, 18] of the first 10 docs with ≥ 40 tokens — deterministic
    * and identically constructible in the oracle), so contamination is
    * planted and the overlap join is value-checked. Scale shape: both
    * sides explode to (gram-hash, id) rows and meet in ONE equi-join on
    * the 128-bit gram hash — eval grams are tiny and broadcast; the
    * corpus side is linear in corpus tokens.
    */
  /** q101: per-document contamination FRACTION — the decision-grade form
    * of q60's match list (the Dolma/Lee-style rule a pipeline actually
    * applies): for every document, its distinct 13-gram count, how many
    * of those appear anywhere in the eval set, the overlap fraction
    * (x1000), and the strict keep decision (any shared gram ⇒ drop).
    * q60 tells you WHICH eval items leaked; q101 is the gate that drops
    * the leaking documents.
    *
    * Scale: same shape as q60 — eval grams broadcast (they are the small
    * side by construction), the corpus pays one gram explode + one
    * doc-keyed map-combined aggregate; the left join keeps uncontaminated
    * docs flowing through the same single pass.
    */
  def q101ContaminationFrac(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val eg = decontamEvalGrams(docs).select(col("eg")).distinct()
    tokenGrams(docs, "doc_id", 13)
      .join(broadcast(eg), col("g") === col("eg"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("grams"),
        sum(when(col("eg").isNotNull, 1L).otherwise(0L)).as("shared_grams"))
      .select(col("doc_id"), col("grams"), col("shared_grams"),
        round(lit(1000.0) * col("shared_grams") / col("grams"))
          .cast("long").as("frac_x1000"))
      .withColumn("kept", col("shared_grams") === 0L)
      .orderBy(col("doc_id"))
  }

  /** q111: cross-source SYNDICATION / mirror detection — the crawl-side
    * question "which sources republish each other's content": for every
    * source pair, the number of distinct 10-token spans they share and
    * the overlap fraction against the smaller span set; pairs at ≥ 5 %
    * are flagged syndicated (wire-service reprints, scraped mirrors —
    * the sources a curation run should collapse or down-weight as a
    * GROUP, complementing doc-level dedup which only sees one pair of
    * texts at a time).
    *
    * Scale shape (the q63 discipline): the span table is materialized
    * ONCE (localCheckpoint) feeding the per-source sizes, the span-df
    * aggregate, and both self-join sides; spans present in more than
    * [[SyndMaxSrcDf]] sources are dropped BEFORE the join (corpus-wide
    * boilerplate — at web scale a universal span would otherwise pair
    * every host with every host), bounding every join bucket at
    * ≤ C(SyndMaxSrcDf, 2) pairs; per-source span sets ride ids-only
    * (md5, never text).
    */
  private val SyndMaxSrcDf = 10
  def q111Syndication(s: SparkSession, dir: String): DataFrame = {
    // (measured: tblWide regressed this query 2.35 → 2.72 s — the md5-per-
    // window work here sits AFTER the distinct's exchange repartitions it,
    // so widening only added a blocking stage; plain read kept)
    val tk = tbl(s, dir, "documents")
      .select(col("source"), tokens(col("text")).as("t"))
      .where(size(col("t")) >= 10)
    val g = tk
      .select(col("source"),
        explode(sequence(lit(1), size(col("t")) - 9)).as("p"), col("t"))
      .select(col("source"),
        md5s(array_join(slice(col("t"), col("p"), lit(10)), " ")).as("g"))
      .distinct()
      .localCheckpoint() // one materialization: sizes + df + both join sides
    val sizes = g.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val srcDf = g.groupBy(col("g")).agg(count(lit(1)).as("src_df"))
    // r6: materialized — both self-join sides otherwise re-run the
    // g⋈src_df cap join (the band-table discipline of LshParams)
    val capped = g.join(srcDf.where(col("src_df") <= SyndMaxSrcDf), "g")
      .localCheckpoint()
    val pairs = capped.select(col("g"), col("source").as("src_a"))
      .join(capped.select(col("g"), col("source").as("src_b")), "g")
      .where(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("shared_spans"))
    pairs
      .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("spans_a"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("spans_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("shared_spans"),
        col("spans_a"), col("spans_b"),
        round(lit(1000.0) * col("shared_spans") / least(col("spans_a"), col("spans_b")))
          .cast("long").as("overlap_x1000"))
      .withColumn("syndicated", col("overlap_x1000") >= 50L)
      .orderBy(col("src_a"), col("src_b"))
  }

  /** The invisible/control characters a curation pass must strip before
    * training: zero-width (ZWSP/ZWNJ/ZWJ/BOM), bidirectional override and
    * isolate controls (the Trojan-Source spoofing vectors, CVE-2021-42574
    * class), and C0/DEL controls other than \t \n \r. One Java/RE2
    * character class, identical in both engines.
    */
  private val InvisibleClass =
    "[\\x{200B}-\\x{200D}\\x{FEFF}\\x{202A}-\\x{202E}\\x{2066}-\\x{2069}" +
      "\\x{0000}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}\\x{007F}]"

  /** q113: TEXT SANITIZATION — strip zero-width, bidi-control and C0
    * characters from every document (the Dolma/CCNet cleanup step, and
    * the defense against Trojan-Source-style bidi spoofing in training
    * text). The harness corpus is clean ASCII, so the dirt is PLANTED
    * deterministically per doc_id residue (RLO prefix / embedded ZWSP /
    * trailing C0 control / untouched), then removed; the md5 of the
    * cleaned text crosses to the oracle, so the exact rebuilt bytes are
    * verified, and the removed-count column pins that each class was
    * actually present and actually stripped.
    *
    * Scale: a stateless codegen'd projection — no shuffle at all beyond
    * the ORDER BY the driver contract requires.
    */
  /** q151: PII DETECTION + REDACTION — emails, E.164-style phone numbers
    * and IPv4 addresses found by anchored ASCII regex classes and masked
    * to typed placeholders, the scrubbing pass every
    * publicly-releasable training corpus runs (the C4/Dolma pipelines
    * ship exactly this email/phone/IP regex family). Patterns use only
    * the regex-dialect intersection of Java (Spark) and RE2 (the DuckDB
    * oracle): ASCII classes, bounded repetition, `\b` word boundaries —
    * no lookaround, so both engines provably match the same spans and
    * the redacted text hashes identically.
    *
    * PII is PLANTED deterministically on top of the corpus text (doc_id
    * keyed: every 3rd doc an email, every 5th an IP, every 7th a phone —
    * ids divisible by 15/21/35/105 carry several kinds), so recall is
    * checkable while the original prose exercises the false-positive
    * surface. Scale shape: stateless per-row projection, no shuffle but
    * the final ORDER BY; the redacted text never leaves the row.
    */
  def q151PiiRedact(s: SparkSession, dir: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\+[0-9]{2} [0-9]{3} [0-9]{6}"
    val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val d = tbl(s, dir, "documents")
    val wired = d.select(col("doc_id"),
      concat(col("text"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" contact user"), col("doc_id"),
            lit("@mail.example.org now"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit(" from 10."), pmod(col("doc_id"), lit(200)),
            lit(".3.44 logged"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit(" call +44 207 "),
            lpad(pmod(col("doc_id"), lit(1000000)).cast("string"), 6, "0"),
            lit(" today"))).otherwise(lit(""))).as("wire"))
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(col("wire"), emailRe, "[EMAIL]"),
        phoneRe, "[PHONE]"),
      ipRe, "[IP]")
    wired.select(col("doc_id"),
        size(regexp_extract_all(col("wire"), lit(emailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("wire"), lit(phoneRe), lit(0)))
          .cast("long").as("n_phones"),
        size(regexp_extract_all(col("wire"), lit(ipRe), lit(0)))
          .cast("long").as("n_ips"),
        md5(redacted.cast("binary")).as("redacted_md5"),
        (length(col("wire")) - length(redacted)).cast("long").as("shrunk"))
      .orderBy(col("doc_id"))
  }

  def q113TextSanitize(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents")
    // NB literal codepoints, NOT Spark SQL char(n): char() wraps at n%256
    // (char(8238) is '.'), where DuckDB's chr() is a true codepoint
    val wire = when(pmod(col("doc_id"), lit(4)) === 0,
        concat(lit("\u202E"), col("text")))                  // RLO
      .when(pmod(col("doc_id"), lit(4)) === 1,
        concat(col("text"), lit("\u200B"), lit("tail")))     // ZWSP
      .when(pmod(col("doc_id"), lit(4)) === 2,
        concat(col("text"), lit("\u0001")))                  // C0 SOH
      .otherwise(col("text"))
    d.select(col("doc_id"), wire.as("wire"))
      .select(col("doc_id"),
        length(col("wire")).cast("long").as("wire_chars"),
        regexp_replace(col("wire"), InvisibleClass, "").as("clean"))
      .select(col("doc_id"), col("wire_chars"),
        length(col("clean")).cast("long").as("clean_chars"),
        (col("wire_chars") - length(col("clean"))).as("removed"),
        md5(col("clean").cast("binary")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  /** q114: EXACT corpus-wide order statistics WITHOUT a global sort —
    * the distributed selection problem: p50/p90/p99 of the document
    * token-length distribution, each found by BISECTION on the value
    * domain (the smallest v with count(len ≤ v) ≥ ⌈q·n⌉). Every probe
    * is one map-combined count aggregate with an O(1) read-back, so an
    * exact quantile costs O(log range) corpus scans and ZERO shuffles —
    * versus a global sort's full-corpus range exchange, or
    * approx_percentile's error bars. The q44 histogram-sketch UDAF is
    * the one-pass approximate complement; this is the exact path when
    * the answer must be right (SLA cutoffs, billing tiers).
    *
    * All probes for all three quantiles share ONE cached length
    * projection (ids are never touched — just the length column).
    */
  def q114ExactQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lens = tbl(s, dir, "documents")
      .select(size(tokens(col("text"))).cast("long").as("len"))
      .localCheckpoint() // one narrow projection feeds every probe
    val n = lens.count()
    val maxLen = lens.agg(max(col("len"))).head().getLong(0)
    def countLe(v: Long): Long =
      lens.where(col("len") <= v).count() // map-combined, O(1) read-back
    def kth(k: Long): Long = { // smallest v with count(<=v) >= k
      var lo = 0L
      var hi = maxLen
      while (lo < hi) {
        val mid = (lo + hi) / 2
        if (countLe(mid) >= k) hi = mid else lo = mid + 1
      }
      lo
    }
    Seq(("p50", 50L), ("p90", 90L), ("p99", 99L))
      .map { case (name, pct) =>
        val k = (pct * n + 99L) / 100L // ceil(pct*n/100)
        (name, kth(k))
      }
      .toDF("stat", "len")
      .orderBy(col("stat"))
  }

  /** q118: DETERMINISTIC WEIGHTED SAMPLING — the quality-weighted corpus
    * draw behind data-mixing recipes, as a lottery-ticket race: a doc with
    * integer weight w holds w hash tickets md5(doc_id#i), its key is the
    * MINIMUM ticket, and the sample is the k smallest keys. For the first
    * draw this is EXACTLY probability-proportional-to-weight
    * (P(min of w uniforms beats min of v uniforms) = w/(w+v)); later draws
    * are near-exact (the uniform-min race is the integer-exact analog of
    * the Efraimidis–Spirakis exponential race, which needs logs — floats —
    * that no cross-engine oracle can replay bit-for-bit). Unlike
    * rand()-based sampling the draw is REPLAYABLE: same corpus, same
    * sample, on any engine.
    *
    * Scale shape: ZERO shuffles — the w ≤ 8 tickets are a per-row
    * transform+array_min (never an explode), and the global top-k is
    * TakeOrderedAndProject (per-partition heaps, O(k) to the driver).
    */
  def q118WeightedSample(s: SparkSession, dir: String): DataFrame = {
    val ntok = size(tokens(col("text")))
    val w = least(lit(8), lit(1) + floor(ntok / lit(64)).cast("int")).as("w")
    val ticket = (i: Column) => conv(substring(md5(
      concat(col("doc_id").cast("string"), lit("#"), i.cast("string"))
        .cast("binary")), 1, 15), 16, 10).cast("long")
    tbl(s, dir, "documents")
      .select(col("doc_id"), w)
      .select(col("doc_id"), col("w").cast("long").as("w"),
        array_min(transform(sequence(lit(0), col("w") - 1), ticket))
          .as("key"))
      .orderBy(col("key"), col("doc_id"))
      .limit(40)
  }

  /** q115: VOCABULARY-GROWTH accounting — the Heaps-law corpus-sizing
    * curve: with documents in the deterministic global hash order (the
    * q109 ingestion order), how many of each document's distinct tokens
    * are FIRST occurrences — the marginal-novelty signal that tells a
    * corpus builder when more of the same source stops buying new
    * vocabulary. Per-token first occurrence is a single min aggregate
    * over the (hash, doc_id) order key — no sequential scan, no global
    * window: the order is encoded in the min, not in row traversal.
    *
    * Scale: one distinct-token explode, one vocabulary-keyed
    * map-combined min, and the vocabulary-sized first-occurrence table
    * re-enters BROADCAST (the q55/q56 Zipf-head discipline; saltedJoin
    * is the beyond-broadcast fallback).
    */
  def q115VocabGrowth(s: SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(col("doc_id").cast("string").cast("binary")),
      1, 12), 16, 10).cast("long")
    val tk = tbl(s, dir, "documents")
      .select(col("doc_id"), h.as("h"), explode(tokens(col("text"))).as("tok"))
      .distinct()
    val first = tk.groupBy(col("tok"))
      .agg(min(struct(col("h"), col("doc_id"))).as("f"))
      .select(col("tok"), col("f.doc_id").as("first_doc"))
    tk.join(broadcast(first), "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("distinct_toks"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("new_toks"))
      .orderBy(col("doc_id"))
  }

  /** q122: KEYWORD-STUFFING spam signal — per document, the single most
    * frequent token (deterministic tie-break: highest count, then
    * lexicographically smallest term) and the fraction of total token
    * mass it carries; `stuffed` fires when one term is ≥20% of the
    * document. SEO spam ("cheap pills cheap pills cheap pills…") is the
    * classic web-corpus poison this screens; the Gopher battery's
    * top-bigram fraction (q90) is the adjacent published rule, this is
    * the unigram argmax with the term itself surfaced for auditing.
    *
    * Scale: one (doc, term) map-combined count, then ONE doc-keyed
    * Exchange shared by the row_number argmax and the total-mass window
    * (same partition key → Catalyst reuses the Exchange). Integer
    * arithmetic (cnt·100 ≥ tot·20) keeps the flag float-free and
    * hash-stable.
    */
  def q122KeywordStuffing(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = tbl(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("cnt"))
    val byDoc = Window.partitionBy(col("doc_id"))
    tf.withColumn("rn", row_number().over(
        byDoc.orderBy(col("cnt").desc, col("term").asc)))
      .withColumn("tot", sum(col("cnt")).over(byDoc))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("term").as("top_term"),
        col("cnt").as("top_cnt"), col("tot").as("n_tokens"),
        (col("cnt") * 100 >= col("tot") * 20).as("stuffed"))
      .orderBy(col("doc_id"))
  }

  /** q123: MOJIBAKE REPAIR (ftfy-style, public: the ftfy docs / WHATWG
    * encoding standard) — fix text that went through the classic web
    * corruption of UTF-8 bytes mis-decoded as Latin-1/CP1252 ("cafÃ©").
    * The repair is the codegen'd `fix_mojibake` expression
    * (functions/ExtractExpressions.scala): sloppy-CP1252 re-encode +
    * strict UTF-8 re-decode, accepted only when the whole string decodes
    * cleanly — so genuine Latin-1 text can't be "repaired" into garbage.
    *
    * Self-certifying (not SQL-expressible — DuckDB has no CP1252 codec):
    * each row plants a known-clean string with 2- and 3-byte UTF-8
    * sequences, corrupts it END-TO-END IN SPARK SQL
    * (`decode(encode(clean,'UTF-8'),'ISO-8859-1')` — an independent codec
    * path, not the repair code), corrupts it TWICE for the
    * double-encoding case, and asserts: repaired == clean, double-repair
    * == clean, and fix_mojibake(clean) == clean (no false positive; the
    * planted '№' is deliberately outside CP1252 so the no-op proof is
    * structural, not probabilistic).
    *
    * Scale: stateless per-row projection, WSCG end-to-end; the repair
    * belongs immediately after charset decode (q79) in a curation chain.
    */
  def q123Mojibake(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.register(s)
    tbl(s, dir, "documents")
      .select(col("doc_id"),
        concat(substring(col("text"), 1, 40),
          lit(" café — don’t № ±5€")).as("clean"))
      .withColumn("corrupted", expr("decode(encode(clean, 'UTF-8'), 'ISO-8859-1')"))
      .withColumn("corrupted2", expr("decode(encode(corrupted, 'UTF-8'), 'ISO-8859-1')"))
      .select(col("doc_id"),
        substring(col("corrupted"), 1, 24).as("corrupted_head"),
        substring(expr("fix_mojibake(corrupted)"), 1, 24).as("repaired_head"),
        (expr("fix_mojibake(corrupted)") === col("clean") &&
          expr("fix_mojibake(corrupted2)") === col("clean") &&
          expr("fix_mojibake(clean)") === col("clean")).as("moji_ok"))
      .orderBy(col("doc_id"))
  }

  /** q125: FUZZY train-test decontamination — q60 catches verbatim
    * 13-gram overlap, but a paraphrased/lightly-edited eval item (the
    * documented real-world leak mode, e.g. Yang et al. 2023 "Rethinking
    * Benchmark and Contamination") shares almost no 13-grams. This op
    * finds eval items whose bigram-shingle Jaccard against ANY corpus
    * doc clears 0.5, using the cross-corpus LSH shape: 32 min-hashes →
    * 16 bands × 2 rows, eval-side band table broadcast (the eval corpus
    * is always tiny next to training data), band equi-join instead of
    * doc×eval cross product, and EXACT Jaccard verification on the
    * surviving candidates only.
    *
    * Self-certifying: the eval set is synthesized as perturbed variants
    * of 20 corpus docs (every 10th token replaced ⇒ bigram Jaccard
    * ≈ (1−2/10)/(1+2/10) ≈ 0.67 by construction), and the output rows
    * are the BRUTE-FORCE exact-Jaccard pairs (the 20-row broadcast cross
    * product — affordable precisely because it is the certifying twin,
    * not the production path), each flagged `fuzzy_ok` = the LSH path
    * found it too. Verified-LSH ⊆ brute holds structurally (both end at
    * the same exact-Jaccard filter), so all-true flags mean recall 1.0
    * AND precision 1.0 against ground truth. Banding gives P(miss) =
    * (1−0.67²)^16 ≈ 8e-5 per pair — and min-hashes are deterministic,
    * so a green run is green forever.
    */
  def q125FuzzyDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val fd = 500L // round(1000·J) threshold
    // r6: shingle ARRAYS are computed once per doc and materialized —
    // the old shape re-evaluated bigrams(text) four times per compared
    // pair inside the twin's cross product and the LSH verify (2 M+
    // tokenize+shingle evaluations at sf0.1); every consumer below
    // (signatures, LSH verify, brute twin) now reads the same array.
    val docs = tblWide(s, dir, "documents") // 32 md5/shingle below — widen pays
      .select(col("doc_id"), col("text"))
      .where(size(tokens(col("text"))) >= 20)
      .select(col("doc_id"), bigrams(col("text")).as("dsh"))
      .localCheckpoint()
    val evalDocs = tbl(s, dir, "documents")
      .where(size(tokens(col("text"))) >= 40)
      .orderBy(col("doc_id")).limit(20)
      .select((col("doc_id") + 1000000L).as("eval_id"),
        array_join(
          zip_with(tokens(col("text")),
            sequence(lit(1), size(tokens(col("text")))),
            (t, i) => when(i % 10 === 0,
              concat(lit("evalvar"), i.cast("string"))).otherwise(t)),
          " ").as("etext"))
      .select(col("eval_id"), bigrams(col("etext")).as("esh"))
      .localCheckpoint() // tiny; feeds signatures, verify, and the twin
    val nh = 32
    val bands = 16
    def sigOf(df: DataFrame, idc: String, shc: String): DataFrame = {
      val ex = df.select(col(idc), explode(col(shc)).as("sh"))
      val aggs = (0 until nh).map(i => min(seededHash(i, col("sh"))).as(s"h$i"))
      ex.groupBy(col(idc)).agg(aggs.head, aggs.tail: _*)
    }
    def melt(sig: DataFrame, idc: String): DataFrame = sig
      .select(col(idc), posexplode(array((0 until bands).map(b =>
        md5s(concat_ws("|", col(s"h${2 * b}"), col(s"h${2 * b + 1}")))): _*)))
      .toDF(idc, "band_idx", "k")
    val docBands = melt(sigOf(docs, "doc_id", "dsh"), "doc_id")
    val evalBands = melt(sigOf(evalDocs, "eval_id", "esh"), "eval_id")
    val candidates = docBands
      .join(broadcast(evalBands), Seq("band_idx", "k"))
      .select(col("doc_id"), col("eval_id")).distinct()
    def jacX1000: Column = round(lit(1000) *
      size(array_intersect(col("dsh"), col("esh"))) /
      size(array_union(col("dsh"), col("esh")))).cast("long")
    val lshFound = candidates
      .join(docs, "doc_id").join(broadcast(evalDocs), "eval_id")
      .select(col("doc_id"), col("eval_id"), jacX1000.as("j"))
      .where(col("j") >= fd)
      .select(col("doc_id"), col("eval_id"), lit(true).as("lsh_hit"))
    val brute = docs.crossJoin(broadcast(evalDocs))
      .select(col("doc_id"), col("eval_id"), jacX1000.as("jac_x1000"))
      .where(col("jac_x1000") >= fd)
    brute.join(lshFound, Seq("doc_id", "eval_id"), "left")
      .select(col("doc_id"), col("eval_id"), col("jac_x1000"),
        coalesce(col("lsh_hit"), lit(false)).as("fuzzy_ok"))
      .orderBy(col("doc_id"), col("eval_id"))
  }

  /** q116: EXACT all-pairs Jaccard ≥ 0.5 over the FULL corpus by PREFIX
    * FILTERING (AllPairs, Bayardo et al. WWW'07 — the published exact
    * similarity-join family that PPJoin refines): order every doc's
    * shingles by ascending document frequency (rarest first, ties by
    * shingle); two sets with overlap ≥ α must share an element inside
    * their (n − α + 1)-prefixes in ANY common total order (the minimal
    * common element sits at position ≤ n − α + 1 on both sides), and
    * Jaccard ≥ t forces α ≥ ⌈t·n⌉ per side — so only prefix tokens are
    * indexed and self-joined, and the exact intersection is computed on
    * the surviving candidates only. This is the production replacement
    * for q20's honestly-sampled all-pairs baseline: the oracle is the
    * NAIVE all-pairs SQL on the full table, so hash equality proves the
    * pruning lossless, not just plausible.
    *
    * Scale shape: one shingle-keyed df aggregate, one doc-keyed window
    * for prefix ranks, a prefix-only self equi-join whose buckets are
    * keyed on each doc's RAREST shingles (df order is exactly what keeps
    * boilerplate shingles out of the index — the analog of q63's
    * ubiquity cap, but lossless), a size filter (t·max ≤ min) inside the
    * join condition, and candidate-only exact verification.
    */
  def q116PrefixJoin(s: SparkSession, dir: String): DataFrame =
    prefixJaccardPairs(
      tblWide(s, dir, "documents").select(col("doc_id"), col("text")), 500)

  /** Exact similarity self-join (production API): all doc pairs with
    * round(1000·Jaccard) ≥ `jacX1000` over distinct word-bigram shingles,
    * by df-ordered prefix filtering. Lossless for any `jacX1000` ≥ 2:
    * kept pairs have J ≥ (jacX1000 − 0.5)/1000 and pruning uses the
    * strictly smaller t = (jacX1000 − 1)/1000, so round-half-up can
    * never out-run the prefix bound.
    */
  private[queries] def prefixJaccardPairs(docs: DataFrame,
      jacX1000: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = (jacX1000 - 1).toDouble / 1000.0
    // one shingle-ARRAY pass per doc feeds the df aggregate, the prefix
    // index AND candidate verification (r6: the old shape re-joined the
    // exploded shingle table twice per candidate pair — |cand|·n̄ rows
    // through a shuffle join; arrays verify each pair in one codegen'd
    // array_intersect instead)
    val sets = docs
      .select(col("doc_id"), bigrams(col("text")).as("arr"))
      .select(col("doc_id"), col("arr"), size(col("arr")).as("n"))
      .localCheckpoint()
    val sh0 = sets.select(col("doc_id"), col("n"), explode(col("arr")).as("s"))
    // r6: DICTIONARY-ENCODE shingles to integer ids (profiled: the string
    // shingle was the join key of the 12.8M-row prefix self-join AND the
    // element type of the verification arrays — both hash/compare ~13-char
    // strings where an int does). `sid` is an arbitrary-but-frozen
    // injective map (one id per distinct shingle, materialized by the
    // localCheckpoint so every later consumer reads the same assignment);
    // candidate generation and |A∩B| depend only on shingle EQUALITY,
    // which any injective recoding preserves exactly, so the output is
    // invariant to which ids were drawn. This is plain dictionary
    // encoding, not hashing — no collisions, nothing derived from row
    // order reaches the result. (Production note: on a cluster, persist
    // the dictionary to storage — reliable checkpoint or a table — so a
    // lost replica cannot re-draw ids; localCheckpoint suffices in the
    // single-JVM harness.)
    val dict = sh0.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .withColumn("sid", monotonically_increasing_id())
      .localCheckpoint()
    val sh = sh0.join(dict, "s")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))
    val pref = sh
      .withColumn("i", row_number().over(w))
      .where(col("i") <= col("n") - ceil(lit(t) * col("n")) + lit(1))
      .select(col("sid").as("s"), col("doc_id"), col("n"), col("i"))
      .localCheckpoint() // materialize the prefix index ONCE; both
                         // self-join sides and nothing else read it
    // per-doc SORTED shingle-id arrays for candidate verification (same
    // distinct elements as `arr` under the dictionary bijection; sorted so
    // the verify step can merge-count without per-pair allocation)
    val isets = sh.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("sid"))).as("iarr"),
        max(col("n")).as("n"))
      .localCheckpoint()
    // candidate generation: size filter in the join + the ACCUMULATED
    // PPJoin positional/suffix bound after the pair aggregate (Xiao et
    // al., WWW'08 §3.2), both lossless. The rank ia assigned by the
    // (df, s) window is monotone in the global shingle order within each
    // doc, so the common shingles of a pair that fall inside BOTH
    // prefixes are exactly a PREFIX e1..e_op of the pair's common-shingle
    // sequence; every remaining common shingle ranks after (ma, mb) :=
    // (rank_A(e_op), rank_B(e_op)) on both sides, giving the upper bound
    //   |A∩B| ≤ op + min(na − ma, nb − mb).
    // J > t forces |A∩B| > t/(1+t)·(na+nb), so discarding pairs whose
    // bound misses that requirement never drops a qualifying pair — and
    // the aggregate replaces the former `distinct()` one-for-one (same
    // pair-keyed exchange, map-side partial agg), while pruning far more
    // candidates than the previous first-match-only per-row filter
    // before the array_intersect verification below.
    // …plus the ASYMMETRIC prefix bound on the pair's smaller side: for a
    // qualifying pair, I ≥ t/(1+t)·(na+nb) ≥ 2t/(1+t)·min(na,nb), so the
    // minimal common shingle's rank on the SMALLER side is at most
    // n_min − ⌈2t/(1+t)·n_min⌉ + 1 — a strictly shorter prefix than the
    // ⌈t·n⌉ bound the index itself uses (which remains necessary for the
    // larger-side role). Both region constraints are monotone in rank, so
    // the common shingles surviving the join are still a PREFIX of the
    // pair's common-shingle sequence and the accumulated bound below
    // stays exact.
    val t2 = 2.0 * t / (1.0 + t)
    val smallSidePrefix = when(col("a.n") <= col("b.n"),
      col("a.i") <= col("a.n") - ceil(lit(t2) * col("a.n")) + lit(1))
      .otherwise(col("b.i") <= col("b.n") - ceil(lit(t2) * col("b.n")) + lit(1))
    // r6: SHUFFLE_HASH hint (guide §3.1) — the default sort-merge join
    // buffers and re-scans each equal-key run, and this self-join's runs
    // are df-sized (hundreds of rows on the synthetic vocab), emitting
    // 8–12 M pairs from a 132 k-row index: paired A/B measured 10.6 s
    // (SMJ) vs 5.8 s (SHJ) for the whole query. The same hint was A/B'd
    // on the other duplicate-key self-joins (q227/q63/q111/q120/q220)
    // and was a wash there — their runs are capped far smaller — so it
    // is applied only here.
    val cand = pref.as("a").hint("shuffle_hash").join(pref.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          greatest(col("a.n"), col("b.n")) * t <=
            least(col("a.n"), col("b.n")) && smallSidePrefix)
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("op"),
        max(col("a.i")).as("ma"), max(col("b.i")).as("mb"),
        max(col("a.n")).as("pna"), max(col("b.n")).as("pnb"))
      .where(col("op") + least(col("pna") - col("ma"), col("pnb") - col("mb"))
        >= lit(t / (1.0 + t)) * (col("pna") + col("pnb")))
      .select(col("a_id"), col("b_id"))
    // exact verification on the compact per-doc sorted id arrays: two
    // doc-keyed equi-joins (AQE broadcasts `isets` when it fits, shuffles
    // cleanly when not) + one allocation-free merge count per pair
    graft.functions.GraftExtensions.ensureRegistered(docs.sparkSession)
    cand
      .join(isets.select(col("doc_id").as("a_id"), col("iarr").as("arr_a"),
        col("n").as("na")), "a_id")
      .join(isets.select(col("doc_id").as("b_id"), col("iarr").as("arr_b"),
        col("n").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        call_function("sorted_inter_count", col("arr_a"), col("arr_b"))
          .as("inter"),
        col("na"), col("nb"))
      .select(col("a_id"), col("b_id"), col("inter"),
        round(lit(1000.0) * col("inter") /
          (col("na") + col("nb") - col("inter")))
          .cast("long").as("jac_x1000"))
      .where(col("jac_x1000") >= jacX1000)
      .orderBy(col("a_id"), col("b_id"))
  }

  def q60Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = tblWide(s, dir, "documents")
    val evalGrams = decontamEvalGrams(docs)
    tokenGrams(docs, "doc_id", 13)
      .join(broadcast(evalGrams), col("g") === col("eg"))
      .groupBy(col("doc_id"), col("eid"))
      .agg(count(lit(1)).as("shared_grams"))
      .select(col("doc_id"), col("eid").as("eval_id"), col("shared_grams"))
      .orderBy(col("doc_id"), col("eval_id"))
  }

  /** Distinct n-token-gram 128-bit hashes per id (shared by q60/q64). */
  private def tokenGrams(df: DataFrame, idCol: String, n: Int): DataFrame = df
    .select(col(idCol), tokens(col("text")).as("t"))
    .where(size(col("t")) >= n)
    .select(col(idCol),
      explode(sequence(lit(1), size(col("t")) - (n - 1))).as("p"),
      col("t"))
    .select(col(idCol),
      md5s(array_join(slice(col("t"), col("p"), lit(n)), " ")).as("g"))
    .distinct()

  /** q60/q64's synthesized eval set: 13-grams of token windows [6, 18] of
    * the first 10 long docs — deterministic and oracle-constructible.
    */
  private def decontamEvalGrams(docs: DataFrame): DataFrame = {
    val evalSrc = docs
      .where(size(tokens(col("text"))) >= 40)
      .orderBy(col("doc_id")).limit(10)
      .select(col("doc_id").as("eval_id"),
        array_join(slice(tokens(col("text")), 6, 13), " ").as("text"))
    tokenGrams(evalSrc, "eval_id", 13)
      .select(col("eval_id").as("eid"), col("g").as("eg"))
  }

  /** q64: the SAME decontamination contract as q60, with a BLOOM-FILTER
    * pre-filter in front of the exact join — the join-pruning shape a
    * 100 TB pipeline needs: the eval side's gram hashes build a
    * [[graft.functions.BloomBuild]] sketch (one tiny aggregate), the byte
    * array broadcasts as a scalar, and the corpus side drops non-matching
    * grams INSIDE the scan stage (`graft_bloom_contains` is codegen'd)
    * before any shuffle. Exactness is structural — the double-hashing
    * sketch has no false negatives, so the exact join downstream sees
    * every true match and the DuckDB oracle is the SAME plain-join SQL as
    * q60's; false positives only cost shuffle bytes. At sf the pruning is
    * invisible in the output by design: oracle-equality IS the
    * no-false-negative proof.
    */
  def q64BloomDecontaminate(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(s)
    val docs = tblWide(s, dir, "documents")
    val evalGrams = decontamEvalGrams(docs).localCheckpoint()
    val bloom = evalGrams.agg(graft.functions.BloomBuild
      .udafColumn(xxhash64(col("eg")), numBits = 1 << 16, k = 6).as("bf"))
    tokenGrams(docs, "doc_id", 13)
      .crossJoin(broadcast(bloom))
      .where(call_function("graft_bloom_contains", col("bf"), xxhash64(col("g"))))
      .drop("bf")
      .join(broadcast(evalGrams), col("g") === col("eg"))
      .groupBy(col("doc_id"), col("eid"))
      .agg(count(lit(1)).as("shared_grams"))
      .select(col("doc_id"), col("eid").as("eval_id"), col("shared_grams"))
      .orderBy(col("doc_id"), col("eval_id"))
  }

  /** q65: Unicode NFC normalization — the codegen'd `nfc_normalize`
    * Expression (JDK Normalizer) value-checked against DuckDB's
    * independent `nfc_normalize` implementation, over text with PLANTED
    * decomposed sequences (`e`+U+0301, `A`+U+030A) so the composition
    * actually fires (the corpus itself is ASCII/NFC). Stateless per-row.
    */
  def q65NfcNormalize(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(s)
    val messy = concat(col("text"), lit(" cafe\u0301 A\u030A"))
    val nfc = call_function("nfc_normalize", messy)
    tbl(s, dir, "documents")
      .select(col("doc_id"),
        length(messy).as("raw_len"),
        length(nfc).as("nfc_len"),
        md5s(nfc).as("nfc_fp"))
      .orderBy(col("doc_id"))
  }

  /** q90: the REST of the Gopher rule battery (Rae et al. 2021, Table A1 —
    * q50 covers the repetition rules): word-count range, mean-word-length
    * range, symbol-to-word ratio, bullet-line and ellipsis-line fractions,
    * alphabetic-word fraction, stop-word floor. The synthetic corpus is a
    * single-line word salad with none of the trigger characters, so the
    * query PLANTS the wire text deterministically (same discipline as
    * q81's PII): tokens are folded into 8-token lines and each doc_id%4
    * residue class violates exactly one rule — class 1 appends a `####`
    * symbol word per line, class 2 bullets every line, class 3 ends every
    * line with `...`, class 0 stays clean. Both engines derive the same
    * wire text; every ratio is integer (‰ via floor division).
    *
    * Scale: stateless per-row projection — the whole battery runs inside
    * one whole-stage-codegen'd map at scan speed; the only shuffle is the
    * edge ORDER BY.
    */
  def q90GopherBattery(s: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val rawLine = (i: Column) => array_join(slice(t, i * 8 + 1, lit(8)), " ")
    val cls = pmod(col("doc_id"), lit(4))
    val lineOf = (i: Column) =>
      when(cls === 1, concat(rawLine(i), lit(" ####")))
        .when(cls === 2, concat(lit("- "), rawLine(i)))
        .when(cls === 3, concat(rawLine(i), lit(" ...")))
        .otherwise(rawLine(i))
    val lines = transform(
      sequence(lit(0), ((size(t) + 7) / 8).cast("int") - 1), lineOf)
    val base = tbl(s, dir, "documents").select(
      col("doc_id"), lines.as("lines"),
      array_join(lines, "\n").as("wire"))
    val wtoks = split(col("wire"), WS)
    val words = size(wtoks).cast("long")
    val nLines = size(col("lines")).cast("long")
    val cnw = length(regexp_replace(col("wire"), WS, "")).cast("long")
    val symbols = (length(col("wire")) -
      length(regexp_replace(col("wire"), "[#…]", ""))).cast("long")
    val bullets = size(filter(col("lines"),
      l => l.startsWith("- ") || l.startsWith("* ") ||
        l.startsWith("• "))).cast("long")
    val ellip = size(filter(col("lines"),
      l => l.endsWith("...") || l.endsWith("…"))).cast("long")
    val alphaW = size(filter(wtoks, w => w.rlike("[a-z]"))).cast("long")
    val stopCnt = size(filter(wtoks, w => w.isin(stopwords: _*))).cast("long")
    base.select(col("doc_id"), words.as("words"),
        ((cnw * 100) / words).cast("long").as("mean_wlen_x100"),
        ((symbols * 1000) / words).cast("long").as("symbol_x1000"),
        ((bullets * 1000) / nLines).cast("long").as("bullet_x1000"),
        ((ellip * 1000) / nLines).cast("long").as("ellipsis_x1000"),
        ((alphaW * 1000) / words).cast("long").as("alpha_x1000"),
        stopCnt.as("stop_cnt"))
      .withColumn("keep",
        col("words").between(50, 100000) &&
          col("mean_wlen_x100").between(300, 1000) &&
          col("symbol_x1000") <= 100 &&
          col("bullet_x1000") <= 900 &&
          col("ellipsis_x1000") <= 300 &&
          col("alpha_x1000") >= 800 &&
          col("stop_cnt") >= 2)
      .orderBy(col("doc_id"))
  }

  /** q91: within-document duplicate-LINE removal — the line-grain cousin
    * of q70's corpus-level span dedup (C4 keeps only lines ending in
    * punctuation; CCNet/FineWeb drop repeated lines within a page —
    * navigation chrome, cookie banners). The corpus has no line structure,
    * so lines are PLANTED deterministically: line i of a doc is the
    * 6-token slice starting at `(i mod 5)*6`, so any doc with more than 5
    * lines provably repeats earlier lines. First occurrence (by position)
    * wins; the document text is REBUILT from surviving lines in original
    * order and fingerprinted, so the oracle checks the edit itself, not
    * just counts.
    *
    * Scale: dedup state is per-document, so no shuffle is needed AT ALL —
    * the keep-first fold runs as a stateless per-row projection (a HOF
    * `aggregate` over the line array; O(L²) membership checks against
    * bounded per-page line counts). The only exchange in the plan is the
    * edge ORDER BY. (The relational explode → (doc, line) window → doc
    * re-aggregate form computes the same thing with two doc-keyed
    * exchanges — the right shape only once dedup crosses documents, which
    * is q70's span dedup.)
    */
  def q91LineDedup(s: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val lineOf = (i: Column) =>
      array_join(slice(t, pmod(i, lit(5)) * 6 + 1, lit(6)), " ")
    val lines = transform(
      sequence(lit(0), ((size(t) + 5) / 6).cast("int") - 1), lineOf)
    val kept = aggregate(col("lines"),
      array().cast("array<string>"),
      (acc, x) => when(array_contains(acc, x), acc)
        .otherwise(concat(acc, array(x))))
    tbl(s, dir, "documents")
      .select(col("doc_id"), lines.as("lines"))
      .select(col("doc_id"),
        size(col("lines")).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept"),
        md5s(array_join(kept, "\n")).as("rebuilt_fp"))
      .orderBy(col("doc_id"))
  }

  /** q156: HOST-LEVEL boilerplate line removal — drop lines that repeat
    * across MOST documents of the same source/host (cookie banners,
    * consent notices, footer chrome: the cross-document chrome that q91's
    * within-doc dedup and q70's corpus-wide span dedup both leave
    * standing; CCNet removes exactly this class by per-shard line
    * frequency, Wenzek et al. LREC 2020). A line is boilerplate for its
    * source iff it appears in ≥ 3 documents AND ≥ 60 % of the source's
    * documents — the per-host threshold keeps one site's chrome from
    * deleting another site's content. Documents are rebuilt from the
    * surviving lines in original order and fingerprinted, so the oracle
    * checks the edit, not just counts. Lines are the q91 planting (the
    * corpus has no newlines): 6-token slices, plus a per-source banner
    * wired onto 3/4 of docs (must be removed) and a rarer promo line on
    * ~9 % (must survive the 60 % gate).
    *
    * Scale shape: one explode → one map-combined (source, line)
    * distinct-doc aggregate; the boilerplate set (a handful of lines per
    * host) re-enters BROADCAST as a per-source sorted array, so the
    * rebuild is a stateless per-row array filter — the corpus text never
    * shuffles at all. The only Exchange over full rows is the edge
    * ORDER BY.
    */
  def q156HostBoilerplate(s: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val content = transform(
      sequence(lit(0), ((size(t) + 5) / 6).cast("int") - 1),
      i => array_join(slice(t, i * 6 + 1, lit(6)), " "))
    val banner = when(col("doc_id") % 4 =!= 3,
      array(concat(lit("we use cookies on "), col("source"))))
      .otherwise(array().cast("array<string>"))
    val promo = when(col("doc_id") % 11 === 0,
      array(concat(lit("weekly promo at "), col("source"))))
      .otherwise(array().cast("array<string>"))
    val docs = tbl(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        concat(banner, promo, content).as("lines"))
    val ex = docs.select(col("doc_id"), col("source"),
      explode(col("lines")).as("line"))
    val df = ex.groupBy(col("source"), col("line"))
      .agg(countDistinct(col("doc_id")).as("d"))
    val sd = docs.groupBy(col("source")).agg(count(lit(1)).as("nd"))
    val boiler = df.join(broadcast(sd), "source")
      .filter(col("d") >= 3 && col("d") * 10 >= col("nd") * 6)
      .groupBy(col("source"))
      .agg(sort_array(collect_list(col("line"))).as("bl"))
    docs.join(broadcast(boiler), Seq("source"), "left")
      .withColumn("bl", coalesce(col("bl"), array().cast("array<string>")))
      .withColumn("kept",
        filter(col("lines"), x => !array_contains(col("bl"), x)))
      .select(col("doc_id"),
        size(col("lines")).cast("long").as("n_lines"),
        (size(col("lines")) - size(col("kept"))).cast("long").as("n_dropped"),
        md5s(array_join(col("kept"), "\n")).as("rebuilt_fp"))
      .orderBy(col("doc_id"))
  }

  /** q158: CODE-SWITCH / mixed-language detection — label disjoint
    * 30-token windows with q18's language heuristic and score each doc by
    * the share of windows DISAGREEING with its plurality language.
    * Mixed-language pages (navigation in one language, body in another;
    * spam stuffing a second script) poison monolingual training mixes,
    * and a doc-level language ID alone cannot see them — q18 labels a doc
    * 'cjk' on a single CJK character anywhere. Planted: every 6th doc
    * gets a 40-token CJK run appended, so planted docs mix (measured
    * median 5000 bp vs 0 for clean docs at sf0.001; a very short doc can
    * be swallowed whole by the run and legitimately score 0).
    * Tie-break on equal counts is lexicographic (cjk < en < other), the
    * same closed form in both engines.
    *
    * Scale shape: the window labeling is a per-row HOF projection (no
    * explode — the label alphabet has 3 symbols, so per-doc counts fold
    * in-row); the ONLY Exchange in the plan is the edge ORDER BY.
    */
  def q158CodeSwitch(s: SparkSession, dir: String): DataFrame = {
    val wire = concat(lower(trim(col("text"))),
      when(col("doc_id") % 6 === 0, expr("repeat(' 汉字', 40)"))
        .otherwise(lit("")))
    val t = split(wire, WS)
    val win = (i: Column) => slice(t, i * 30 + 1, lit(30))
    val labels = transform(
      sequence(lit(0), (size(t) / 30).cast("int") - 1),
      i => when(regexp_count(array_join(win(i), " "), lit("[一-鿿]")) > 0, "cjk")
        .when(size(filter(win(i), x => x.isin(stopwords: _*))) * 100 >= 90, "en")
        .otherwise("other"))
    tbl(s, dir, "documents")
      .filter(size(t) >= 60)
      .select(col("doc_id"), labels.as("ls"))
      .select(col("doc_id"),
        size(col("ls")).cast("long").as("n_win"),
        size(filter(col("ls"), x => x === "cjk")).cast("long").as("n_cjk"),
        size(filter(col("ls"), x => x === "en")).cast("long").as("n_en"),
        size(filter(col("ls"), x => x === "other")).cast("long").as("n_other"))
      .select(col("doc_id"), col("n_win"),
        when(col("n_cjk") >= col("n_en") && col("n_cjk") >= col("n_other"), "cjk")
          .when(col("n_en") >= col("n_other"), "en")
          .otherwise("other").as("major_lang"),
        greatest(col("n_cjk"), col("n_en"), col("n_other")).as("n_major"))
      .withColumn("switch_bp",
        expr("(n_win - n_major) * CAST(10000 AS BIGINT) DIV n_win"))
      .orderBy(col("doc_id"))
  }

  /** q162: KWIC SNIPPET generation — the search-result presentation step
    * the q92/q97/q140 retrieval family stops short of: for each document
    * containing a query term, emit the first occurrence position and a
    * 7-token keyword-in-context window (±3 tokens, clamped at the
    * document edges — a window near position 1 shifts right instead of
    * shrinking, the classical KWIC convention). Query terms are q92's.
    *
    * Scale shape: the 3-term array is a per-row literal Generate (fan-out
    * 3), position + slice are stateless; at retrieval scale this runs
    * over the top-k hits, not the corpus — here over all docs so the
    * oracle covers every edge (absent terms filtered, edge clamps).
    */
  def q162Kwic(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("dup", "line", "query")
    tbl(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"),
        explode(array(terms.map(lit): _*)).as("term"))
      .withColumn("pos", array_position(col("t"), col("term")))
      .filter(col("pos") > 0)
      .select(col("doc_id"), col("term"), col("pos").cast("long").as("pos"),
        array_join(
          slice(col("t"), greatest(lit(1), col("pos") - 3).cast("int"), lit(7)),
          " ").as("snippet"))
      .orderBy(col("doc_id"), col("term"))
  }

  /** q92: BM25 top-k retrieval (Robertson-Spärck Jones; k1=1.2, b=0.75) —
    * the ranking function of every search-indexed corpus, here over a
    * fixed three-term query. All arithmetic is integer so the DuckDB
    * oracle reproduces every score bit-for-bit: IDF uses the floor-log₂
    * bits surrogate (`length(bin(N)) - length(bin(df))`, q84's
    * discipline) and the tf saturation is evaluated as one integer
    * fraction — score_x1000 = idf_bits * (22000·tf·avgdl) div
    * (10·avgdl·tf + 3·avgdl + 9·dl), exactly k1/b scaled by 10/4.
    *
    * Scale: the document-frequency side is THREE rows — broadcast; doc
    * lengths and term frequencies are one map-combined aggregate each;
    * the final top-k plans as TakeOrderedAndProject (no global sort).
    */
  def q92Bm25(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("dup", "line", "query")
    val tk = tbl(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val dl = tk.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
      .select(col("n_docs"), expr("tot div n_docs").as("avgdl"))
    val tf = tk.where(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), "tok").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("tok"),
        expr("""(CAST(length(bin(n_docs)) - length(bin(df)) AS BIGINT)
                |  * 22000 * tf * avgdl)
                | div (10 * avgdl * tf + 3 * avgdl + 9 * dl)"""
          .stripMargin).as("term_score"))
    scored.groupBy(col("doc_id"))
      .agg(sum(col("term_score")).as("score_x1000"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score_x1000").desc, col("doc_id"))
      .limit(20)
  }

  /** q219: BM25 HARD-NEGATIVE MINING — the retrieval-training data op
    * (DPR, Karpukhin et al. EMNLP 2020): for each training query, the
    * top BM25-scoring NON-relevant documents are the "hard negatives"
    * that make a dense retriever actually learn. Queries here are the
    * doc_id % 101 == 0 stripe; each query's text is reduced to its top-3
    * non-stopword tokens by (tf desc, tok) — the classic
    * query-from-document convention — and every other document is scored
    * with q92's exact-integer BM25 over those terms. Two exclusions, both
    * standard DPR hygiene: the query document itself, and any EXACT
    * duplicate of it (md5 content equality) — a positive leaked into the
    * negatives poisons contrastive training.
    *
    * Scale shape: the query-term table is Q×3 rows — broadcast; document
    * lengths and term frequencies are one map-combined aggregate each
    * (tf only for tokens in the broadcast term set, so the token-keyed
    * shuffle carries matching rows only); the per-query top-5 is a
    * window over candidates-with-term-overlap, partitioned by q_doc.
    */
  def q219HardNegatives(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // (measured: materializing the token arrays once (localCheckpoint) to
    // share across the dl/qterms/tf branches regressed 2.35 → 3.96 s —
    // storing ~1M token strings costs more than the three cheap re-scans;
    // left as three independent scan branches)
    val d = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
    val tk = d.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val dl = tk.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
      .select(col("n_docs"), expr("tot div n_docs").as("avgdl"))
    val qW = Window.partitionBy(col("q_doc"))
      .orderBy(col("qtf").desc, col("tok"))
    val qterms = tk.where(col("doc_id") % 101 === 0)
      .where(!col("tok").isin(stopwords: _*))
      .groupBy(col("doc_id").as("q_doc"), col("tok"))
      .agg(count(lit(1)).as("qtf"))
      .withColumn("r", row_number().over(qW))
      .where(col("r") <= 3).select(col("q_doc"), col("tok"))
    val tf = tk.join(broadcast(qterms.select(col("tok")).distinct()), "tok")
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val fp = d.select(col("doc_id"), md5s(col("text")).as("fp"))
    val qfp = fp.where(col("doc_id") % 101 === 0)
      .select(col("doc_id").as("q_doc"), col("fp").as("qfp"))
    val scored = tf.join(broadcast(qterms), "tok")
      .join(broadcast(dfs), "tok").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("q_doc"), col("doc_id"),
        expr("""(CAST(length(bin(n_docs)) - length(bin(df)) AS BIGINT)
                |  * 22000 * tf * avgdl)
                | div (10 * avgdl * tf + 3 * avgdl + 9 * dl)"""
          .stripMargin).as("term_score"))
      .groupBy(col("q_doc"), col("doc_id"))
      .agg(sum(col("term_score")).as("score_x1000"))
    val rW = Window.partitionBy(col("q_doc"))
      .orderBy(col("score_x1000").desc, col("doc_id"))
    scored.where(col("doc_id") =!= col("q_doc"))
      .join(fp, "doc_id").join(broadcast(qfp), "q_doc")
      .where(col("fp") =!= col("qfp"))
      .withColumn("rank", row_number().over(rW))
      .where(col("rank") <= 5)
      .select(col("q_doc"), col("doc_id").as("neg_doc"),
        col("score_x1000"), col("rank"))
      .orderBy(col("q_doc"), col("rank"))
  }

  /** q222: PADDING-WASTE ACCOUNTING — the batching-efficiency number
    * behind length-sorted batching: a fixed-size batch pads every
    * sequence to the batch max, so tokens_wasted = B·max(len) − Σlen per
    * batch, and sorting by length before batching collapses that waste
    * (the "bucketing by sequence length" every training framework ships;
    * the accounting here is what justifies it on a given corpus). One
    * summary row per strategy — arrival order vs length-sorted — with
    * identical batch size 16, so the two waste_x1000 numbers are
    * directly comparable.
    *
    * Scale note: both strategies use a GLOBAL row_number here (exact,
    * oracle-matched); at corpus scale the sorted variant becomes q133's
    * two-level value-histogram ranking and arrival order is the
    * per-shard sequence — the waste algebra is unchanged.
    */
  def q222PaddingWaste(s: SparkSession, dir: String): DataFrame = {
    val b = 16
    val lens = tbl(s, dir, "documents")
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n"))
    val tagged = lens
      .withColumn("b_arr",
        expr(s"(row_number() OVER (ORDER BY doc_id) - 1) div $b"))
      .withColumn("b_srt",
        expr(s"(row_number() OVER (ORDER BY n DESC, doc_id) - 1) div $b"))
    def summarize(df: DataFrame, batchCol: String, name: String): DataFrame =
      df.groupBy(col(batchCol).as("batch"))
        .agg(count(lit(1)).as("rows_in_batch"), max(col("n")).as("mx"),
          sum(col("n")).as("used"))
        .agg(count(lit(1)).as("batches"),
          sum(col("rows_in_batch") * col("mx")).as("slots"),
          sum(col("used")).as("tokens"))
        .select(lit(name).as("strategy"), col("batches"), col("tokens"),
          col("slots"),
          expr("(1000 * (slots - tokens)) div slots").as("waste_x1000"))
    summarize(tagged, "b_arr", "arrival")
      .unionByName(summarize(tagged, "b_srt", "length_sorted"))
      .orderBy(col("strategy"))
  }

  /** q223: LANGUAGE-METADATA / SCRIPT CONSISTENCY AUDIT — the cheapest
    * metadata-vs-content cross-check a corpus intake runs: a document
    * labeled `zh` whose text contains not one non-ASCII character, or a
    * Latin-language document that is mostly non-Latin, has a WRONG label
    * (upstream lang-ID ran on boilerplate, or the label came from a TLD
    * guess), and mislabeled docs poison per-language mixing weights
    * (q88/q139) and fertility stats (q221). Stump: a `zh` label expects
    * non-ASCII evidence (≥1 char); en/de/es/fr expect mostly-ASCII
    * (non-ASCII < 50% of chars). Per (lang): docs, labels contradicted
    * by script evidence, and the contradiction rate in basis points.
    * (On this synthetic corpus every `zh` doc is ASCII prose — the audit
    * correctly reports the labels as decorative; that is the point.)
    */
  def q223LangScriptAudit(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("lang"), length(col("text")).cast("long").as("chars"),
        length(regexp_replace(col("text"), "[\\x00-\\x7F]", ""))
          .cast("long").as("non_ascii"))
      .withColumn("mismatch",
        when(col("lang") === "zh", col("non_ascii") === 0)
          .otherwise(col("non_ascii") * 2 > col("chars")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(when(col("mismatch"), 1L).otherwise(0L)).as("mismatched"))
      .withColumn("mismatch_bp", expr("(10000 * mismatched) div docs"))
      .orderBy(col("lang"))

  /** Production quality-gate scoring used by
    * [[graft.pipeline.QualityStage]]: the document-level keep decision a
    * curation pipeline applies before dedup — word-count bounds, Gopher
    * duplicate-token fraction, and the q75 compression band — as one
    * stateless projection (every gate is per-row; the deflate kernel is
    * the codegen'd `deflate_ratio_x1000`). Returns one row per input doc
    * with the per-rule booleans AND the composed `keep`, so accounting
    * can attribute every drop.
    */
  def qualityScores(docs: DataFrame, idCol: String,
                    minWords: Int = 20): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(docs.sparkSession)
    val t = tokens(col("text"))
    docs
      .select(col(idCol), size(t).cast("long").as("words"),
        size(array_distinct(t)).cast("long").as("uniq"),
        expr("deflate_ratio_x1000(text)").as("ratio_x1000"))
      .select(col(idCol), col("words"),
        when(col("words") > 0,
          (lit(1000L) * (col("words") - col("uniq")) / col("words"))
            .cast("long")).otherwise(1000L).as("dup_tok_x1000"),
        col("ratio_x1000"))
      .withColumn("len_ok", col("words").between(minWords, 100000L))
      .withColumn("rep_ok", col("dup_tok_x1000") <= 600L)
      .withColumn("compress_ok", col("ratio_x1000").between(200L, 1100L))
      .withColumn("keep", col("len_ok") && col("rep_ok") && col("compress_ok"))
  }

  /** q97: POSITIONAL INVERTED INDEX — the search-engine core structure
    * (token → posting list with in-document positions, term/document
    * frequencies): one (tok, doc) grain row per posting with the sorted
    * position list serialized as a comma-joined string (strings hash
    * identically across engines; array renderings don't).
    *
    * Scale shape: one explode → one (tok, doc_id) map-combined aggregate;
    * the per-token document frequency is a vocabulary-sized second
    * aggregate broadcast back (the q55/q56 Zipf discipline). Position
    * lists are bounded by document length — the per-key state is one
    * posting, never a full token's posting list, so a stop-word token
    * does not straggle a reducer. (A production index would additionally
    * block/compress posting lists at the storage layer; the delta
    * encoding is trivially derivable from the sorted positions.)
    */
  def q97InvertedIndex(s: SparkSession, dir: String): DataFrame = {
    val tk = tbl(s, dir, "documents")
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    val postings = tk.groupBy(col("tok"), col("doc_id"))
      .agg(count(lit(1)).as("tf"),
        min(col("pos")).cast("long").as("first_pos"),
        max(col("pos")).cast("long").as("last_pos"),
        array_join(transform(array_sort(collect_list(col("pos"))),
          p => p.cast("string")), ",").as("positions"))
    val dfs = postings.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
    postings.join(broadcast(dfs), "tok")
      .select(col("tok"), col("doc_id"), col("tf"), col("df"),
        col("first_pos"), col("last_pos"), col("positions"))
      .orderBy(col("tok"), col("doc_id"))
  }

  /** q140: PHRASE SEARCH through the positional index — q97 builds the
    * postings but nothing queried them; this is the consumer: exact
    * phrase matching as a postings-list equi-join with a +1 position
    * adjacency condition (the classical positional-index algorithm —
    * no text re-scan, the match runs entirely on (tok, doc, pos)
    * triples). The query phrases are data-derived (top-3 corpus bigrams,
    * total-ordered by count desc then phrase) so the test is
    * self-contained and the oracle replays the identical derivation.
    *
    * Scale shape: ONE tokenization materialized (localCheckpoint) feeds
    * the bigram statistic and both join sides; the phrase table (3 rows)
    * broadcasts, so the hit join touches only postings of the phrase's
    * first word (selectivity = its df) before the (doc, pos)-keyed
    * adjacency join; top-3 selection is TakeOrderedAndProject, never a
    * global sort.
    */
  def q140PhraseSearch(s: SparkSession, dir: String): DataFrame = {
    val tk = tbl(s, dir, "documents")
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .localCheckpoint()
    val top3 = tk.as("a").join(tk.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("b.pos") === col("a.pos") + 1)
      .select(concat(col("a.tok"), lit(" "), col("b.tok")).as("phrase"))
      .groupBy(col("phrase")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("phrase")).limit(3)
    val phrases = broadcast(top3.select(col("phrase"),
      split(col("phrase"), " ").getItem(0).as("w1"),
      split(col("phrase"), " ").getItem(1).as("w2")))
    tk.as("x").join(phrases, col("x.tok") === col("w1"))
      .join(tk.as("y"),
        col("y.doc_id") === col("x.doc_id") &&
          col("y.pos") === col("x.pos") + 1 && col("y.tok") === col("w2"))
      .groupBy(col("phrase"), col("x.doc_id").as("doc_id"))
      .agg(count(lit(1)).as("occurrences"),
        min(col("x.pos")).cast("long").as("first_pos"))
      .orderBy(col("phrase"), col("doc_id"))
  }

  /** q81: PII detection + redaction — the scrub every published web-corpus
    * pipeline runs before release (emails, IPv4 addresses, US-style phone
    * numbers; cf. the redaction pass described for BigScience ROOTS and
    * C4's cleanup). The corpus is synthetic and PII-free, so the query
    * PLANTS deterministic PII derived from doc_id (3 of 4 residue classes
    * get emails / IPs / phones; class 3 stays clean) — both engines derive
    * the same wire text, so the DuckDB oracle checks detection counts AND
    * the md5 of the redacted text byte-for-byte.
    *
    * Regex compatibility (Java on the Spark side, RE2 in DuckDB): the
    * patterns use only shared syntax — explicit classes, bounded repeats,
    * ASCII `\b` — same discipline as [[WS]]. Redaction order is fixed
    * (email → IP → phone) and each count is taken at the same stage on
    * both sides, so partially-overlapping matches cannot diverge.
    *
    * Scale: a stateless per-row projection (regex inside whole-stage
    * codegen); the only shuffle is the ORDER BY at the query edge. At
    * 100 TB this runs at scan speed alongside extraction.
    */
  def q81PiiRedact(s: SparkSession, dir: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipRe = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val phoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
    val id = col("doc_id")
    val str = (c: Column) => c.cast("string")
    val planted = when(pmod(id, lit(4)) === 0,
        concat(col("text"), lit(" Contact bob"), str(id),
          lit("@mail-example.org or sue.smith+"), str(id),
          lit("@corp.example.com now.")))
      .when(pmod(id, lit(4)) === 1,
        concat(col("text"), lit(" Host 10."), str(pmod(id, lit(200))),
          lit("."), str(pmod(id * 7, lit(250))),
          lit(".42 and 192.168.1."), str(pmod(id, lit(255))), lit(" up.")))
      .when(pmod(id, lit(4)) === 2,
        concat(col("text"), lit(" Call 415-555-"),
          str(lit(1000) + pmod(id, lit(9000))), lit(" or 212-555-"),
          str(lit(1000) + pmod(id * 3, lit(9000))), lit(".")))
      .otherwise(col("text"))
    val noEmail = regexp_replace(planted, emailRe, "<EMAIL>")
    val red = regexp_replace(
      regexp_replace(noEmail, ipRe, "<IP>"), phoneRe, "<PHONE>")
    tbl(s, dir, "documents")
      .select(col("doc_id"), planted.as("t"), noEmail.as("ne"), red.as("red"))
      .select(col("doc_id"),
        regexp_count(col("t"), lit(emailRe)).cast("long").as("n_email"),
        regexp_count(col("ne"), lit(ipRe)).cast("long").as("n_ip"),
        regexp_count(col("red"), lit("<PHONE>")).cast("long").as("n_phone"),
        length(col("red")).cast("long").as("red_chars"),
        md5s(col("red")).as("red_fp"))
      .orderBy(col("doc_id"))
  }

  /** q82: heavy-hitter tokens via a COUNT-MIN-SKETCH pre-filter
    * ([[graft.functions.CmsBuild]]) in front of the exact aggregate — the
    * frequency analog of q64's Bloom join pruning, and the shape a 100 TB
    * vocabulary scan needs: the exact "count every token, keep cnt ≥ T"
    * plan shuffles the ENTIRE corpus on a key space as large as the
    * vocabulary; this plan builds a constant-size sketch in one
    * map-combined pass (32 KB state, elementwise-add merge), broadcasts
    * it as a scalar, and drops every token occurrence whose estimated
    * count is below T INSIDE the scan stage (`graft_cms_estimate` is
    * codegen'd) — only candidate-token rows reach the groupBy shuffle.
    *
    * Exactness is structural: CMS never underestimates, so the estimate
    * filter passes a SUPERSET of the true heavy hitters, and the exact
    * count + HAVING downstream removes the false positives — the DuckDB
    * oracle is the PLAIN exact aggregate, and oracle equality IS the
    * no-false-negative proof (same certification pattern as q64).
    */
  def q82CmsHeavy(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(s)
    val thr = 40L
    val tk = tbl(s, dir, "documents")
      .select(explode(tokens(col("text"))).as("tok"))
    val sketch = tk.agg(graft.functions.CmsBuild
      .udafColumn(xxhash64(col("tok")), depth = 4, width = 1024).as("cms"))
    tk.crossJoin(broadcast(sketch))
      .where(call_function("graft_cms_estimate", col("cms"), xxhash64(col("tok"))) >= thr)
      .drop("cms")
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= thr)
      .orderBy(col("tok"))
  }

  /** q84: held-out-LM perplexity quality scoring — the CCNet-style filter
    * (Wenzek et al., LREC 2020): train a unigram LM on a deterministic
    * 80% split (doc_id % 5 != 0), score EVERY document's cross-entropy
    * under add-one smoothing, and flag low-perplexity docs as kept.
    * Unlike q55 (self-corpus surprisal), the model here is held-out, so
    * out-of-vocabulary tokens exist and are charged the smoothed floor
    * probability 1/(total+V) — the `oov` column counts them.
    *
    * Integer determinism: bits = bitlen(total+V) − bitlen(cnt+1), the
    * same floor-log₂ surrogate q55 established (identical `bin()` in
    * Spark and DuckDB); ratios ship as `*_x100` BIGINTs.
    *
    * Scale: the vocabulary side is explicitly BROADCAST (Zipf-head skew —
    * same defense as q55/q56, plan-asserted in QueriesSpec); the corpus
    * pays one explode and one doc-keyed map-combined aggregate regardless
    * of model size. If the vocab outgrows broadcast range, salt the hot
    * head (the implemented [[AdvancedOps.saltedJoin]] fallback).
    */
  def q84Perplexity(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents")
    val tk = d.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val freq = tk.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    // model-size stats from the vocab table, not a corpus re-scan
    val stats = freq.agg(sum(col("cnt")).as("total"), count(lit(1)).as("vocab"))
    val bits = length(bin(col("total") + col("vocab"))) -
      length(bin(coalesce(col("cnt"), lit(0L)) + 1))
    tk.join(broadcast(freq), Seq("tok"), "left")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("words"),
        sum(when(col("cnt").isNull, 1).otherwise(0)).cast("long").as("oov"),
        sum(bits.cast("long")).as("ppl_bits"))
      .select(col("doc_id"), col("words"), col("oov"), col("ppl_bits"),
        round(lit(100.0) * col("ppl_bits") / col("words"))
          .cast("long").as("avg_bits_x100"))
      .withColumn("kept", col("avg_bits_x100") <= 1100)
      .orderBy(col("doc_id"))
  }

  /** n-gram (bigram) Jaccard near-dup pairs over a sampled id stripe
    * (doc_id % 10 = 0): explode distinct shingles → self equi-join on
    * shingle → per-pair intersection count → Jaccard. The join is keyed on
    * the shingle (no cross product), but a FULL-index all-pairs join still
    * can't take 100×; the exact production path is q116's prefix-filtered
    * join, the approximate one q22's LSH banding.
    */
  def q20NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    // |shingles| rides along each exploded row (one extra int through the
    // shuffle) — round 1 re-joined a broadcast per-doc sizes table, which
    // is an OOM at any real corpus size and cost 26% of the whole bench.
    // max(n) per pair group is exact: n is constant within a doc's rows.
    val ex = tbl(s, dir, "documents").filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), bigrams(col("text")).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
      .localCheckpoint() // one shingle pass; both self-join sides read it
    ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"),
        max(col("a.n")).as("na"), max(col("b.n")).as("nb"))
      .select(col("a_id"), col("b_id"), col("inter"),
        round(lit(1000.0) * col("inter") /
          (col("na") + col("nb") - col("inter"))).cast("long").as("jac_x1000"))
      .filter(col("jac_x1000") >= 60)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** q227: CONTAINMENT JOIN (Broder 1997's asymmetric resemblance twin)
    * — containment(A in B) = |A∩B| / |A| over distinct bigram shingles.
    * The measure symmetric Jaccard structurally misses: a short document
    * quoted whole inside a long aggregator page has Jaccard ≈ |A|/|B|
    * (tiny) but containment ≈ 1 — exactly the quote-inclusion /
    * page-aggregation duplication a release-level dedup must disclose.
    * Pairs are kept when EITHER direction's containment ≥ 600‰; both
    * directions plus Jaccard ride along so the asymmetric cases are
    * visible in one row.
    *
    * Scale shape: q20's discipline — per-doc shingle size rides the
    * exploded row (no sizes re-join), one shingle-keyed self equi-join
    * on a deterministic id stripe; the production scale path for
    * all-pairs containment is q116's df-ordered prefix filter (the
    * prefix bound for containment indexes only |A|−⌈t·|A|⌉+1 of A's
    * rarest shingles — same machinery, asymmetric threshold).
    */
  def q227ContainmentJoin(s: SparkSession, dir: String): DataFrame = {
    val ex = tblWide(s, dir, "documents").filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), bigrams(col("text")).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
      .localCheckpoint()
    ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"),
        max(col("a.n")).as("na"), max(col("b.n")).as("nb"))
      .select(col("a_id"), col("b_id"), col("inter"),
        col("na").cast("long").as("na"), col("nb").cast("long").as("nb"),
        expr("(1000 * inter) div na").as("cont_a_x1000"),
        expr("(1000 * inter) div nb").as("cont_b_x1000"),
        expr("(1000 * inter) div (na + nb - inter)").as("jac_x1000"))
      .filter(greatest(col("cont_a_x1000"), col("cont_b_x1000")) >= 600)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** q228: SHUFFLE-HEALTH SKEW REPORT — the operational table behind
    * every broadcast/salting decision in this library: for each shuffle
    * key family actually used (raw token, bigram shingle, url-hash
    * bucket), the 10 hottest keys with their row share in basis points,
    * plus the family's key cardinality and total rows. The hottest key's
    * share IS the straggler lower bound of a hash-partitioned shuffle on
    * that key (one reducer gets at least that fraction), so this table is
    * the measured justification for the q55/q56 Zipf broadcast defense
    * and the q62 salting path — and the monitor that tells a production
    * run when a new corpus breaks those assumptions.
    *
    * Scale shape: each family is one map-combined key count; the top-10
    * window runs over the AGGREGATED per-key table (vocabulary-sized,
    * q153's one legitimate global sort — production would TakeOrdered).
    */
  def q228SkewReport(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = tbl(s, dir, "documents")
    def report(rows: DataFrame, kind: String): DataFrame = {
      val per = rows.groupBy(col("k")).agg(count(lit(1)).as("rows"))
      val tot = per.agg(sum(col("rows")).as("t"), count(lit(1)).as("n_keys"))
      val w = Window.orderBy(col("rows").desc, col("k"))
      per.withColumn("rank", row_number().over(w)).where(col("rank") <= 10)
        .crossJoin(broadcast(tot))
        .select(lit(kind).as("key_kind"), col("rank").cast("long").as("rank"),
          col("k").as("hot_key"), col("rows"),
          expr("(10000 * rows) div t").as("share_bp"),
          col("n_keys"), col("t").as("total_rows"))
    }
    val toks = d.select(explode(tokens(col("text"))).as("k"))
    val bgs = d.select(explode(bigrams(col("text"))).as("k"))
    val urls = d.select(concat(lit("b"),
      conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4),
        16, 10).cast("long") % 1024).as("k"))
    report(toks, "token")
      .unionByName(report(bgs, "bigram"))
      .unionByName(report(urls, "url_bucket"))
      .orderBy(col("key_kind"), col("rank"))
  }

  /** q229: QUALITY-GATE RANK AGREEMENT — Kendall's tau-a between two
    * independent quality signals (per-doc mean unigram surprisal, q55's
    * exact-bits formula, vs duplicate-token fraction, the Gopher
    * repetition gate) over a doc stripe. The diagnostic every
    * multi-gate curation stack needs: gates that rank documents the
    * same way are redundant, gates that anti-correlate are measuring
    * different failure modes (here repetition ⇒ low surprisal, so tau
    * comes out NEGATIVE — the two gates genuinely complement). All
    * pair counts are exact integers; tau's sign is applied OUTSIDE the
    * floor division (Spark `div` truncates toward zero, DuckDB `//`
    * floors — they disagree on negative quotients, so the quotient is
    * kept positive by construction).
    *
    * Scale shape: signals are one explode + map-combined aggregate
    * each (vocabulary broadcast per q55); the O(n²) concordance count
    * runs on the bounded stripe — at corpus scale the estimator is the
    * same counts over a fixed-size sample, which is how Kendall tau is
    * measured everywhere.
    */
  def q229GateAgreement(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents").filter(col("doc_id") % 5 === 0)
    val tk = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val freq = tk.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    val bits = length(bin(col("total"))) - length(bin(col("cnt")))
    val x = tk.join(broadcast(freq), "tok").crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("words"), sum(bits.cast("long")).as("sbits"))
      .select(col("doc_id"),
        expr("(100 * sbits) div words").as("x"))
    val t = tokens(col("text"))
    val y = docs.select(col("doc_id"),
      size(t).cast("long").as("w"),
      size(array_distinct(t)).cast("long").as("u"))
      .select(col("doc_id"), expr("(1000 * (w - u)) div w").as("y"))
    val d = x.join(y, "doc_id")
    d.as("a").join(d.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        ((col("a.x") - col("b.x")) * (col("a.y") - col("b.y"))).as("prod"),
        (col("a.x") === col("b.x")).as("tx"),
        (col("a.y") === col("b.y")).as("ty"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("prod") > 0, 1L).otherwise(0L)).as("concordant"),
        sum(when(col("prod") < 0, 1L).otherwise(0L)).as("discordant"),
        sum(when(col("tx") && !col("ty"), 1L).otherwise(0L)).as("ties_x"),
        sum(when(!col("tx") && col("ty"), 1L).otherwise(0L)).as("ties_y"),
        sum(when(col("tx") && col("ty"), 1L).otherwise(0L)).as("ties_both"))
      .select(col("n_pairs"), col("concordant"), col("discordant"),
        col("ties_x"), col("ties_y"), col("ties_both"),
        when(col("concordant") >= col("discordant"),
          expr("(1000 * (concordant - discordant)) div n_pairs"))
          .otherwise(-expr("(1000 * (discordant - concordant)) div n_pairs"))
          .as("tau_a_x1000"))
  }

  /** q230: DEDUP ROI CURVE — pair volume by true-Jaccard band over the
    * q20 stripe, with an upper-bound token-savings estimate per band
    * (Σ min(shingle counts) — an upper bound because overlapping pairs
    * double-count; the closure's keeper accounting, q180, is the exact
    * version AFTER a threshold is chosen). This is the table a release
    * reads to CHOOSE the near-dup threshold: how much pair mass and
    * token mass each 50‰ band adds — before paying for any closure.
    */
  def q230DedupRoi(s: SparkSession, dir: String): DataFrame = {
    val ex = tbl(s, dir, "documents").filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), bigrams(col("text")).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
      .localCheckpoint()
    ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"),
        max(col("a.n")).as("na"), max(col("b.n")).as("nb"))
      .select(
        expr("(1000 * inter) div (na + nb - inter)").as("jac_x1000"),
        least(col("na"), col("nb")).cast("long").as("mn"))
      .where(col("jac_x1000") >= 50)
      .withColumn("band", expr("least((jac_x1000 div 50) * 50, 950)"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("pairs"),
        sum(col("mn")).as("est_removed_shingles_ub"))
      .orderBy(col("band"))
  }

  /** q238: MAXSCORE / WAND SKIP-RATE AUDIT — the term-upper-bound
    * pruning analysis behind every dynamic top-k retrieval engine
    * (Turtle & Flood 1995 MaxScore; Broder et al. CIKM 2003 WAND): for
    * q92's query, each term's upper bound U_t = max per-doc BM25
    * contribution; a candidate doc whose Σ U_t over its matching terms
    * falls below θ (the exact k-th best full score) can be skipped
    * without scoring. Reports per term (df, U_t) plus the corpus-level
    * skip accounting — candidates, skippable, skip_bp — i.e. how much of
    * the postings traversal a MaxScore engine would never touch on this
    * corpus. Same exact-integer BM25 as q92/q219, so the audit is
    * oracle-replayable to the last basis point.
    *
    * Scale shape: reuses q92's shapes (tf/df map-combined aggregates,
    * stats broadcast); U_t is a 3-row aggregate; θ is the k-th row of
    * the scored top-k (TakeOrderedAndProject); the doc-level UB sum is
    * one more map-combined aggregate over the same matching rows. The
    * summary scalars re-enter as 1-row broadcasts.
    */
  def q238MaxscoreAudit(s: SparkSession, dir: String): DataFrame =
    maxscoreAudit(tbl(s, dir, "documents"), Seq("dup", "line", "query"), 10)

  /** Bare API for [[q238MaxscoreAudit]]: the skip-rate audit for `terms`
    * at top-`k` over an arbitrary `(doc_id, text)` table.
    */
  def maxscoreAudit(docs: DataFrame, terms: Seq[String],
                    k: Int): DataFrame = {
    val tk = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val dl = tk.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
      .select(col("n_docs"), expr("tot div n_docs").as("avgdl"))
    val tf = tk.where(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), "tok").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("tok"),
        expr("""(CAST(length(bin(n_docs)) - length(bin(df)) AS BIGINT)
                |  * 22000 * tf * avgdl)
                | div (10 * avgdl * tf + 3 * avgdl + 9 * dl)"""
          .stripMargin).as("term_score"))
      .localCheckpoint()
    val ub = scored.groupBy(col("tok"))
      .agg(max(col("term_score")).as("u_bound"), count(lit(1)).as("df"))
    val theta = scored.groupBy(col("doc_id"))
      .agg(sum(col("term_score")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .agg(min(col("score")).as("theta"))
    val docUb = scored
      .join(broadcast(ub.select(col("tok"), col("u_bound"))), "tok")
      .groupBy(col("doc_id")).agg(sum(col("u_bound")).as("ub"))
    val summary = docUb.crossJoin(broadcast(theta))
      .agg(count(lit(1)).as("candidates"),
        sum(when(col("ub") < col("theta"), 1L).otherwise(0L))
          .as("skippable"),
        max(col("theta")).as("theta"))
      .withColumn("skip_bp", expr("skippable * 10000 div candidates"))
    ub.crossJoin(broadcast(summary))
      .select(col("tok"), col("df"), col("u_bound"), col("theta"),
        col("candidates"), col("skippable"), col("skip_bp"))
      .orderBy(col("tok"))
  }

  /** q239: QUALITY-GATE AUC — the exact Mann–Whitney AUC (with the
    * standard ½-credit tie correction) of the mean-surprisal signal at
    * separating repetition-flagged documents (duplicate-token fraction
    * ≥ 600‰) from the rest: the threshold-free discrimination number a
    * curation stack reads next to q229's rank agreement (tau says "do
    * two gates agree", AUC says "does this gate separate THAT failure
    * mode at all"). AUC = P(score_pos > score_neg) + ½·P(=), computed
    * WITHOUT the O(P·N) pair join via the rank-sum identity: group docs
    * by distinct score, running sum of negatives below each score group,
    * numerator·2 = Σ_s (2·p_s·cumneg_s + p_s·n_s) — every term an exact
    * BIGINT, auc_x1e6 = num2·10⁶ div (2·P·N). On real text, repetition
    * implies low surprisal and AUC lands well below 500000 (reversed
    * polarity); on THIS harness corpus the 31-type vocabulary (q211's
    * finding) compresses the surprisal range so AUC ≈ 495000 — the same
    * tie-domination q229 reports, visible not hidden.
    *
    * Scale shape: the surprisal signal is q55's broadcast-vocab explode +
    * doc-keyed aggregate; the label is a stateless HOF projection; the
    * rank-sum runs over DISTINCT SCORES (a few hundred values at any
    * corpus size — the q153 small-global-window case), never over docs.
    */
  def q239GateAuc(s: SparkSession, dir: String): DataFrame =
    gateAuc(tbl(s, dir, "documents"), 600L)

  /** Bare API for [[q239GateAuc]]: AUC of the surprisal signal against
    * the `dupfrac ≥ labThreshold`‰ label over an arbitrary
    * `(doc_id, text)` table.
    */
  def gateAuc(documents: DataFrame, labThreshold: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = documents.select(col("doc_id"), col("text"))
    val tk = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val freq = tk.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    val bits = length(bin(col("total"))) - length(bin(col("cnt")))
    val x = tk.join(broadcast(freq), "tok").crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("words"), sum(bits.cast("long")).as("sbits"))
      .select(col("doc_id"), expr("(100 * sbits) div words").as("x"))
    val t = tokens(col("text"))
    val lab = docs.select(col("doc_id"),
        size(t).cast("long").as("w"),
        size(array_distinct(t)).cast("long").as("u"))
      .select(col("doc_id"),
        when(expr("(1000 * (w - u)) div w") >= labThreshold, 1L).otherwise(0L)
          .as("lab"))
    val byScore = x.join(lab, "doc_id")
      .groupBy(col("x"))
      .agg(sum(col("lab")).as("p"), sum(lit(1L) - col("lab")).as("n"))
    val w = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("cumneg", coalesce(sum(col("n")).over(w), lit(0L)))
      .agg(sum(col("p")).as("pos"), sum(col("n")).as("neg"),
        count(lit(1)).as("n_scores"),
        sum(lit(2L) * col("p") * col("cumneg") + col("p") * col("n"))
          .as("num2"))
      .select(col("pos"), col("neg"), col("n_scores"), col("num2"),
        expr("num2 * 1000000 div (2 * pos * neg)").as("auc_x1e6"))
  }

  /** q243: INCREMENTAL CROSS-CORPUS DEDUP — dedup a NEW crawl batch
    * against a FROZEN prior release using only the release's SIGNATURE
    * INDEX (md5 content fingerprint + the q21 MinHash signature), never
    * its text: the operation a recurring-crawl curation stack runs on
    * every increment, where re-shingling petabytes of already-released
    * text is not an option. A batch doc is `exact_dup` if its md5
    * matches any frozen fingerprint, else `near_dup` if it shares an
    * LSH band with a frozen doc AND the sketch-estimated Jaccard
    * (matching-minhash fraction, ×1000 = agree·125 for 8 hashes) clears
    * the threshold, else `kept`. The reported match is the SMALLEST
    * qualifying frozen doc_id (the release's keeper rule) and
    * `agree_x1000` the STRONGEST qualifying agreement; kept rows carry
    * the -1/0 sentinels so every column stays non-null BIGINT.
    *
    * Here frozen = doc_id % 10 ≠ 7 and batch = doc_id % 10 = 7 with the
    * index computed inline; [[graft.pipeline.IncrementalDedup]] is the
    * pipeline form that PERSISTS the index as a parquet artifact and
    * proves the release text is never re-read (PipelineSpec deletes it
    * before the batch run).
    *
    * Scale shape: the frozen side is a (doc_id, fp, h0..h7) projection
    * of the persisted index — constant bytes per released doc, no text,
    * no shingling; the batch (always small next to the corpus) pays one
    * explode→groupBy signature pass; exact matching is one fp equi-join
    * against the index's fp column; near candidates come from q22's
    * melted-band equi-join (the batch band table broadcasts when the
    * increment is small); the agreement check is 8 integer comparisons
    * on candidate pairs only. Nothing is all-pairs and the frozen
    * corpus text is never touched.
    */
  def q243IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
    incrementalDedupAgainst(
      signatureIndex(docs.where(col("doc_id") % 10 =!= 7)),
      docs.where(col("doc_id") % 10 === 7),
      500L
    ).orderBy(col("doc_id"))
  }

  /** (doc_id, fp, h0..h7) signature-index rows for a (doc_id, text)
    * corpus: fp = md5 of the text bytes (q15's exact-dedup key), h0..h7 =
    * q21's seeded MinHash values over distinct word-bigram shingles.
    * Docs with fewer than 2 tokens have no shingles and carry null
    * minhashes — they participate in exact dedup only, matching their
    * absence from shingle space. This is the projection
    * [[graft.pipeline.IncrementalDedup]] persists per corpus release.
    */
  def signatureIndex(docs: DataFrame): DataFrame =
    docs.select(Seq(col("doc_id"), md5s(col("text")).as("fp")) ++
      signatureCols(col("text")): _*)

  /** Row-local (HOF) form of the q21 MinHash signature: h_i =
    * `array_min(transform(shingles, s → seededHash(i, s)))` — the SAME
    * values as the explode→groupBy aggregation (min over a set is min
    * over the array; a shingle-less doc yields null either way,
    * NeardupSpec pins the equality) at ZERO shuffles: a stateless
    * projection. That makes the signature computable inside a streaming
    * micro-batch with no aggregation state
    * ([[graft.streaming.ReleaseDedupStream]]) and lets [[signatureIndex]]
    * skip the shuffle entirely — at 100 TB the signature pass is a pure
    * map over the scan.
    */
  def signatureCols(text: Column): Seq[Column] = {
    val sh = bigrams(text)
    (0 until NumHashes).map(i =>
      array_min(transform(sh, s => seededHash(i, s))).as(s"h$i"))
  }

  /** Bare API for [[q243IncrementalDedup]]: per-batch-doc decisions
    * against an existing signature index (as built by [[signatureIndex]]
    * or read back from [[graft.pipeline.IncrementalDedup]]'s artifact).
    * `thresholdX1000` is the minimum sketch-estimated Jaccard (in ‰) for
    * a near-dup; with 8 hashes the estimate moves in steps of 125.
    */
  def incrementalDedupAgainst(frozenIndex: DataFrame, batch: DataFrame,
                              thresholdX1000: Long): DataFrame = {
    // one signature pass over the increment; read 3× (fp join, band
    // join, agreement join) → materialize
    val bIdx = signatureIndex(batch).localCheckpoint()
    val exact = bIdx.select(col("doc_id"), col("fp"))
      .join(frozenIndex.groupBy(col("fp"))
        .agg(min(col("doc_id")).as("exact_match")), Seq("fp"))
      .select(col("doc_id"), col("exact_match"))
    // melted 2×4 bands (q22's fixed banding — the static-oracle form;
    // LshParams derives production bandings from the threshold)
    def bandsOf(idx: DataFrame, idCol: String): DataFrame = idx
      .where(col("h0").isNotNull)
      .select(col("doc_id"),
        posexplode(array(
          md5s(concat_ws("|", col("h0"), col("h1"), col("h2"), col("h3"))),
          md5s(concat_ws("|", col("h4"), col("h5"), col("h6"), col("h7"))))))
      .toDF(idCol, "band_idx", "digest")
    val cand = bandsOf(bIdx, "b_id")
      .join(bandsOf(frozenIndex, "f_id"), Seq("band_idx", "digest"))
      .select(col("b_id"), col("f_id")).distinct()
    val agree = (0 until NumHashes)
      .map(i => when(col(s"a.h$i") === col(s"f.h$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val near = cand
      .join(bIdx.as("a"), col("b_id") === col("a.doc_id"))
      .join(frozenIndex.as("f"), col("f_id") === col("f.doc_id"))
      .select(col("b_id"), col("f_id"), (agree * lit(125L)).as("ag"))
      .where(col("ag") >= thresholdX1000)
      .groupBy(col("b_id"))
      .agg(min(col("f_id")).as("near_match"), max(col("ag")).as("best_ag"))
      .withColumnRenamed("b_id", "doc_id")
    batch.select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_match").isNotNull, lit("exact_dup"))
          .when(col("near_match").isNotNull, lit("near_dup"))
          .otherwise(lit("kept")).as("decision"),
        coalesce(col("exact_match"), col("near_match"), lit(-1L))
          .as("match_id"),
        when(col("exact_match").isNotNull, lit(1000L))
          .otherwise(coalesce(col("best_ag"), lit(0L))).as("agree_x1000"))
  }

  /** q245: HYBRID RETRIEVAL FUSION — Reciprocal Rank Fusion (Cormack,
    * Clarke & Buettcher, SIGIR 2009) of the two ranking legs this repo
    * already computes exactly: q92's exact-integer BM25 lexical top-50
    * and q24's dense cosine top-50 against the vec_id = 0 query vector
    * (the documents/embeddings tables share the 0..n-1 id space).
    * rrf(d) = Σ_legs 1/(60 + rank_leg(d)) in 1e9 fixed point
    * (`1000000000 div (60 + rank)`, BIGINT-exact in both engines); a doc
    * absent from a leg contributes 0 and carries the -1 rank sentinel.
    * This is the standard production shape for hybrid search: fuse on
    * RANKS, never on incomparable scores.
    *
    * Scale shape: each leg ends in its own top-k (orderBy+limit →
    * TakeOrderedAndProject) BEFORE ranks are assigned, so the
    * single-partition row_number windows see ≤ 50 rows (q153's
    * small-global-window case); the fusion join is 50×50 ids.
    */
  def q245RrfHybrid(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = Seq("dup", "line", "query")
    val tk = tbl(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val dl = tk.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
      .select(col("n_docs"), expr("tot div n_docs").as("avgdl"))
    val tf = tk.where(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val lexTop = tf.join(broadcast(dfT), "tok").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        expr("""(CAST(length(bin(n_docs)) - length(bin(df)) AS BIGINT)
                |  * 22000 * tf * avgdl)
                | div (10 * avgdl * tf + 3 * avgdl + 9 * dl)"""
          .stripMargin).as("term_score"))
      .groupBy(col("doc_id")).agg(sum(col("term_score")).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(50)
    val lex = lexTop
      .withColumn("lex_rank", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("lex_rank"))
    val dense = VectorOps.denseTopK(s, dir, 50)
      .withColumn("dense_rank", row_number()
        .over(Window.orderBy(col("cos_x1000").desc, col("vec_id")))
        .cast("long"))
      .select(col("vec_id").as("doc_id"), col("dense_rank"))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(-1L)).as("lex_rank"),
        coalesce(col("dense_rank"), lit(-1L)).as("dense_rank"))
      .withColumn("rrf",
        expr("CASE WHEN lex_rank > 0 THEN 1000000000 div (60 + lex_rank) " +
          "ELSE 0 END") +
        expr("CASE WHEN dense_rank > 0 THEN 1000000000 div (60 + dense_rank) " +
          "ELSE 0 END"))
      .orderBy(col("rrf").desc, col("doc_id")).limit(20)
  }

  private val NumHashes = 8

  /** 60-bit seeded hash: first 15 hex chars of md5 as a BIGINT. Fixed-width
    * on purpose — min over LONG keeps the signature aggregation a
    * HashAggregate; min over the hex STRING would fall back to
    * SortAggregate and sort every exploded shingle row (measured 10×
    * slower at sf0.1).
    */
  private def seededHash(seed: Int, c: Column): Column =
    conv(substring(md5(concat(lit(s"$seed|"), c).cast("binary")), 1, 15),
      16, 10).cast("long")

  private def signatureOf(docs: DataFrame): DataFrame = {
    val ex = docs.select(col("doc_id"), explode(bigrams(col("text"))).as("s"))
    val aggs = (0 until NumHashes).map(i =>
      min(seededHash(i, col("s"))).as(s"h$i"))
    ex.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  private def signature(s: SparkSession, dir: String): DataFrame =
    signatureOf(tblWide(s, dir, "documents")) // 8 md5/shingle — widen pays

  /** MinHash signatures (8 md5-seeded min-hashes over bigram shingles) —
    * one explode + one groupBy; signature bytes per doc are constant, so
    * this is the sketch that makes near-dup linear at 100 TB.
    */
  def q21MinhashSig(s: SparkSession, dir: String): DataFrame =
    signature(s, dir).orderBy(col("doc_id"))

  /** MinHash LSH candidate pairs: 2 bands × 4 rows; a pair is a candidate if
    * any band matches. Bands are melted to (doc_id, band_idx, digest) rows so
    * ONE self equi-join on (band_idx, digest) covers all bands, and the band
    * table is MATERIALIZED (localCheckpoint — temp table / checkpoint in
    * prod) before the self-join: Spark does not reuse a subtree across
    * build/probe of a self-join, so without this the whole
    * explode→groupBy signature computation runs twice. This is the scale
    * path: only same-bucket pairs ever materialize, never the O(n²) cross
    * product.
    */
  def q22MinhashLsh(s: SparkSession, dir: String): DataFrame =
    minhashPairs(s, dir).orderBy(col("a_id"), col("b_id"))

  /** q22's candidate pairs without the presentation sort — the form other
    * operators (q49's cluster closure) consume.
    */
  private[queries] def minhashPairs(s: SparkSession, dir: String): DataFrame =
    minhashPairsOf(tblWide(s, dir, "documents"))

  /** q22's candidate pairs over an explicit doc set. Because the MinHash
    * signature and band digests are PER-DOC functions, the pair set over
    * any subset S equals the full-corpus pair set restricted to S×S —
    * which is what lets q212 run this directly on its audit stripe.
    */
  private[queries] def minhashPairsOf(docs: DataFrame): DataFrame = {
    val bands = signatureOf(docs).select(col("doc_id"),
        posexplode(array(
          md5s(concat_ws("|", col("h0"), col("h1"), col("h2"), col("h3"))),
          md5s(concat_ws("|", col("h4"), col("h5"), col("h6"), col("h7"))))))
      .toDF("doc_id", "band_idx", "digest")
    LshParams.bandedPairs(bands) // materializes one signature pass
  }

  /** 16-bit SimHash over distinct unigram tokens: md5-nibble bits, majority
    * vote per bit position. Pure explode→groupBy; the 64-bit production
    * variant only widens the bit loop.
    */
  def q23Simhash(s: SparkSession, dir: String): DataFrame = {
    val toks = tbl(s, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("tok"))
      .select(col("doc_id"), md5s(col("tok")).as("h"))
    toks
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(15))).as("b"))
      .withColumn("v", expr("instr('0123456789abcdef', substring(h, (b div 4)+1, 1)) - 1"))
      .withColumn("w", expr("2 * (shiftright(v, b % 4) & 1) - 1"))
      .groupBy(col("doc_id"), col("b")).agg(sum(col("w")).as("sw"))
      .select(col("doc_id"),
        expr("case when sw > 0 then cast(shiftleft(1, b) as bigint) else 0L end").as("bitval"))
      .groupBy(col("doc_id")).agg(sum(col("bitval")).as("simhash16"))
      .orderBy(col("doc_id"))
  }

  /** Production MinHash candidate-pair entry point (not a driver query —
    * q22 keeps fixed 2×4 banding for its static oracle): the banding is
    * derived from the TARGET JACCARD THRESHOLD via [[LshParams.minhashBands]]
    * (S-curve inversion, b ≈ t^-r), so recall is a parameter instead of a
    * constant. Same scale-safe shape as q22: melted bands, materialized
    * once, one self equi-join — candidates only, never all-pairs.
    */
  /** Melted LSH band table (doc_id, pos = band index, col = band hash) for
    * a threshold-derived banding — the shared candidate-generation core of
    * [[minhashCandidates]] (batch) and
    * [[graft.streaming.NeardupStream]] (continuous ingest).
    */
  def minhashBandTable(docs: org.apache.spark.sql.DataFrame,
                       threshold: Double,
                       rowsPerBand: Int = 4): org.apache.spark.sql.DataFrame = {
    val bands = LshParams.minhashBands(threshold, rowsPerBand)
    val numHashes = bands * rowsPerBand
    val ex = docs.select(col("doc_id"), explode(bigrams(col("text"))).as("s"))
    val aggs = (0 until numHashes).map(i => min(seededHash(i, col("s"))).as(s"h$i"))
    val sig = ex.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val bandCols = (0 until bands).map(b =>
      md5s(concat_ws("|",
        (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")): _*)))
    sig.select(col("doc_id"), posexplode(array(bandCols: _*)))
  }

  def minhashCandidates(docs: org.apache.spark.sql.DataFrame,
                        threshold: Double,
                        rowsPerBand: Int = 4): org.apache.spark.sql.DataFrame =
    LshParams.bandedPairs(minhashBandTable(docs, threshold, rowsPerBand))

  /** 64-bit SimHash production variant with banded hamming pairing: the
    * 64 md5-derived bits are built directly as [[SimBands]] band values of
    * [[SimBandBits]] bits each (melted form: doc_id, band_idx, bv — one
    * explode→groupBy, no 64-bit sign issues in either engine). A pair whose
    * hamming distance ≤ SimBands-1 must match at least one band exactly
    * (pigeonhole), so the band equi-join finds every near pair without the
    * O(n²) cross product — same LSH trick as q22. Candidates then re-join
    * the (materialized) signature to compute the exact hamming distance via
    * bit_count(xor); `is_near` flags ham ≤ 3.
    *
    * Recall beyond the guarantee (measured, NeardupSpec): 0.93 / 0.78 /
    * 0.61 at ham 4/5/6. The multi-probe knob
    * ([[LshParams.bandedPairsProbed]]) extends the EXACT guarantee to
    * ham ≤ 7 (measured 1.0 at ham 4–6) for a 17× one-side expansion of the
    * tiny band table; the oracle query keeps the plain path so its SQL twin
    * stays expressible.
    */
  def q41SimhashPairs(s: SparkSession, dir: String): DataFrame = {
    // (measured: tblWide A/B'd 2.46 s plain vs 2.92 s widened — the
    // signature work per row is one md5 per distinct token, light enough
    // that the extra blocking exchange outweighs the recovered cores)
    val toks = tbl(s, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("tok"))
      .select(col("doc_id"), md5s(col("tok")).as("h"))
    // per-(doc, nibble-position) majority vote: explode only the 16 nibble
    // positions and compute the nibble's 4 bit-sums as parallel aggregates
    // (4× fewer exploded rows than one-row-per-bit; bit b = 4p+k, so the
    // cheap post-aggregation melt below restores per-bit granularity)
    val swAggs = (0 until 4).map(k =>
      sum(expr(s"2 * (shiftright(v, $k) & 1) - 1")).as(s"sw$k"))
    val sw = toks
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(SimBits / 4 - 1))).as("p"))
      .withColumn("v", expr("instr('0123456789abcdef', substring(h, p+1, 1)) - 1"))
      .groupBy(col("doc_id"), col("p")).agg(swAggs.head, swAggs.tail: _*)
    val bands = sw
      .select(col("doc_id"), col("p"),
        posexplode(array((0 until 4).map(k => col(s"sw$k")): _*)))
      .toDF("doc_id", "p", "k", "sw")
      .groupBy(col("doc_id"), expr(s"cast((4*p+k) div $SimBandBits as int)").as("band_idx"))
      .agg(expr(s"sum(case when sw > 0 then cast(shiftleft(1, cast((4*p+k) % $SimBandBits as int)) as bigint) else 0L end)").as("bv"))
      .localCheckpoint() // one signature pass feeds join sides AND scoring
    val sigAggs = (0 until SimBands).map(k =>
      sum(when(col("band_idx") === k, col("bv")).otherwise(0L)).as(s"s$k"))
    val sig = bands.groupBy(col("doc_id")).agg(sigAggs.head, sigAggs.tail: _*)
    // bands is already checkpointed above (sig reuses it); the helper's own
    // materialization of the tiny 4-rows-per-doc table is negligible
    val pairs = LshParams.bandedPairs(bands)
    val hamExpr = (0 until SimBands)
      .map(k => s"bit_count(sa$k ^ sb$k)").mkString(" + ")
    pairs
      .join(sig.select(col("doc_id").as("said") +:
        (0 until SimBands).map(k => col(s"s$k").as(s"sa$k")): _*),
        col("a_id") === col("said"))
      .join(sig.select(col("doc_id").as("sbid") +:
        (0 until SimBands).map(k => col(s"s$k").as(s"sb$k")): _*),
        col("b_id") === col("sbid"))
      .select(col("a_id"), col("b_id"),
        expr(s"cast($hamExpr as bigint)").as("ham"),
        expr(s"cast($hamExpr as bigint) <= 3").as("is_near"))
      .orderBy(col("a_id"), col("b_id"))
  }

  private val SimBits = 64
  private val SimBandBits = 16
  private val SimBands = SimBits / SimBandBits

  /** q80: n-gram LANGUAGE IDENTIFICATION (Cavnar & Trenkle 1994 rank-order
    * profiles — the public classic behind practical langid) as a PURELY
    * RELATIONAL pipeline: character trigrams via codegen'd
    * `sequence → transform → explode → substring` (no UDF), per-language
    * rank profiles from a labeled training half (one (lang, gram)
    * HashAggregate + a WindowGroupLimit top-K), held-out documents scored
    * by out-of-place distance (doc-profile join on the BROADCAST language
    * profiles, one (doc, lang) aggregate, argmin via max_by packing).
    * Truth is PLANTED: four synthetic languages with deterministic
    * disjoint-syllable vocabularies generated in-query; `lang_ok` demands
    * the held-out prediction equal the planted label for EVERY doc (the
    * languages are separable by construction, so anything below 100% is a
    * real defect). q18 stays the cheap heuristic; this is the trainable
    * production path. Scale shape: profiles are K×L rows (broadcast);
    * the corpus pays one gram aggregate and one profile join — the same
    * shuffles at any corpus size.
    */
  def q80LangIdNgram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val langs = Array("aa", "bb", "cc", "dd")
    val syll = Map(
      "aa" -> Array("ka", "to", "ri", "mu", "sen"),
      "bb" -> Array("vel", "dor", "ba", "gu", "ne"),
      "cc" -> Array("zhi", "pa", "lo", "wen", "cu"),
      "dd" -> Array("fy", "ster", "ej", "ulf", "om"))
    val docs = s.range(0L, 1200L).as[Long].map { id =>
      val lang = langs((id % 4).toInt)
      val sy = syll(lang)
      val r = new scala.util.Random(id * 2654435761L)
      val words = (0 until (40 + r.nextInt(40))).map { _ =>
        // shared connective sprinkled in so separation isn't trivial
        if (r.nextInt(7) == 0) "na"
        else (0 to r.nextInt(2) + 1).map(_ => sy(r.nextInt(sy.length))).mkString
      }
      // split by id%8 BLOCK so train/held-out each cover all four labels
      // (an id%2 split would alias with the id%4 label assignment)
      (id, lang, id % 8 < 4, words.mkString(" "))
    }.toDF("doc_id", "lang", "is_train", "text")
      .localCheckpoint() // generated once; grams/profiles reuse it
    val grams = docs.select(col("doc_id"), col("lang"), col("is_train"),
      explode(expr(
        "transform(sequence(1, greatest(length(text) - 2, 1)), i -> substring(text, i, 3))"))
        .as("gram"))
      .filter(length(col("gram")) === 3)
    val kLang = 220
    val kDoc = 100
    val wL = Window.partitionBy(col("p_lang"))
      .orderBy(col("cnt").desc, col("gram").asc)
    val langProf = grams.filter(col("is_train"))
      .groupBy(col("lang").as("p_lang"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("lrank", row_number().over(wL))
      .filter(col("lrank") <= kLang)
      .select(col("p_lang"), col("gram"), col("lrank"))
    val wD = Window.partitionBy(col("doc_id"))
      .orderBy(col("dcnt").desc, col("gram").asc)
    val docProf = grams.filter(!col("is_train"))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("dcnt"))
      .withColumn("drank", row_number().over(wD))
      .filter(col("drank") <= kDoc)
      .select(col("doc_id"), col("gram"), col("drank"))
    val docK = docProf.groupBy(col("doc_id")).agg(count(lit(1)).as("dk"))
    // out-of-place distance per (doc, lang): matched grams contribute
    // |drank - lrank|, unmatched doc grams the max penalty kLang
    val scored = docProf
      .join(broadcast(langProf), Seq("gram"))
      .groupBy(col("doc_id"), col("p_lang"))
      .agg(sum(abs(col("drank") - col("lrank"))).as("matchedDist"),
        count(lit(1)).as("matched"))
      .join(docK, Seq("doc_id"))
      .select(col("doc_id"), col("p_lang"),
        (col("matchedDist") + (col("dk") - col("matched")) * kLang).as("oop"))
    // argmin by packing (lower oop wins; lang index breaks exact ties
    // deterministically): min over oop*8 + langIdx
    val langIdx = when(col("p_lang") === "aa", 0).when(col("p_lang") === "bb", 1)
      .when(col("p_lang") === "cc", 2).otherwise(3)
    val pred = scored
      .select(col("doc_id"), (col("oop") * 8 + langIdx).as("packed"))
      .groupBy(col("doc_id")).agg(min(col("packed")).as("best"))
      .select(col("doc_id"),
        element_at(typedLit(langs.toSeq), (col("best") % 8).cast("int") + 1)
          .as("pred"))
    docs.filter(!col("is_train"))
      .select(col("doc_id"), col("lang"))
      .join(pred, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("pred"),
        (col("pred").isNotNull && col("pred") === col("lang")).as("lang_ok"))
      .orderBy(col("doc_id"))
  }

  /** q104: content-defined-chunk dedup accounting over the corpus — the
    * storage-layer dedup primitive (gear CDC, FastCDC family; see
    * [[graft.functions.CdcOps]]): chunk every document's UTF-8 bytes at
    * content-defined boundaries (min 64 / mask 5 bits ≈ 96-byte mean /
    * max 256), fingerprint each chunk (FNV-1a 64), and account per doc
    * how many of its chunks (and bytes) occur elsewhere in the corpus.
    * Unlike fixed-width chunking, an insertion shifts only the chunk it
    * touches — CdcSpec measures the realignment directly.
    *
    * Rows-only (the boundary fold is not SQL-expressible); `cdc_ok`
    * certifies per row: chunk lengths sum exactly to the document's byte
    * length, every chunk respects the max, and at most the FINAL chunk
    * undercuts the min. CdcSpec carries the exact proof (chunks == an
    * independent sequential implementation; concat reassembles the text).
    *
    * Scale: one codegen'd projection per doc (the chunker), one explode,
    * one hash-keyed count shuffle, one doc-keyed aggregate — the chunk
    * table is materialized once and the blob never travels with it.
    */
  def q104CdcDedup(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(s)
    cdcDedup(tbl(s, dir, "documents"))
  }

  /** The operator proper, over any (doc_id, text) table (caller has
    * registered the graft functions).
    */
  def cdcDedup(docs: DataFrame): DataFrame = {
    val ch = docs
      .select(col("doc_id"), octet_length(col("text")).cast("long").as("tbytes"),
        explode(call_function("cdc_chunks",
          col("text"), lit(64), lit(5), lit(256))).as("c"))
      .select(col("doc_id"), col("tbytes"), col("c.off").as("off"),
        col("c.len").as("len"), col("c.hash").as("hash"))
      .localCheckpoint() // one chunk pass; occ-count and per-doc agg share it
    val occ = ch.groupBy(col("hash")).agg(count(lit(1)).as("occ"))
    ch.join(occ, "hash")
      .groupBy(col("doc_id"))
      .agg(max(col("tbytes")).as("bytes"),
        count(lit(1)).as("n_chunks"),
        sum(col("len")).as("sum_len"),
        max(col("len")).as("max_len"),
        sum(when(col("len") < 64, 1).otherwise(0)).cast("long").as("short_cnt"),
        max(when(col("len") < 64, col("off")).otherwise(lit(-1))).as("short_off"),
        max(col("off")).as("last_off"),
        sum(when(col("occ") > 1, 1).otherwise(0)).cast("long").as("dup_chunks"),
        sum(when(col("occ") > 1, col("len")).otherwise(lit(0L))).as("dup_bytes"))
      .select(col("doc_id"), col("n_chunks"), col("dup_chunks"), col("dup_bytes"),
        (col("sum_len") === col("bytes") && col("max_len") <= 256 &&
          col("short_cnt") <= 1 &&
          (col("short_cnt") === 0 || col("short_off") === col("last_off")))
          .as("cdc_ok"))
      .orderBy(col("doc_id"))
  }

  /** q109: training-shard assignment — the driver-checked face of
    * [[graft.pipeline.ExportStage.shardAssign]]: every document gets a
    * shard id by global token prefix-sum in (bucket, hash, id) order,
    * computed with the two-level distributed prefix sum (per-bucket sums
    * → O(buckets) driver offsets → within-bucket windows in parallel) —
    * no single-partition window anywhere. The DuckDB oracle recomputes
    * the SAME order with one global window, so every intermediate
    * (tok_len, h, b, cum_before) and the final shard id are hash-exact:
    * the distributed decomposition provably equals the sequential scan.
    */
  def q109TrainShards(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.ExportStage.shardAssign(
        tbl(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", tokensPerShard = 2000L, buckets = 64)
      .select(col("doc_id"), col("tok_len"), col("h"), col("b"),
        col("cum_before"), col("shard"))
      .orderBy(col("doc_id"))

  /** q166: EXACT edit-distance (≤ 1) similarity join by DELETION
    * NEIGHBORHOODS (FastSS, Bocek et al., ETH TIK report 2007 — the
    * published scheme behind SymSpell-family spell checkers): every
    * string emits itself plus each single-character deletion as join
    * keys; two strings within edit distance 1 ALWAYS share a key
    * (substitution at i → both i-deletions equal; indel → the shorter
    * string IS a deletion of the longer), so one equi-join on the key
    * yields a lossless candidate set and `levenshtein` verifies only
    * candidates — never all pairs. The corpus is the per-doc 5-token
    * title head plus, for every 7th doc, a planted char-4-deleted twin,
    * so true near-miss pairs exist by construction. The DuckDB oracle is
    * the NAIVE all-pairs join over the same names with its own
    * `levenshtein` — hash equality is the candidate-completeness proof
    * (both engines count edits over codepoints; the corpus is
    * all-ASCII so DuckDB's byte-wise distance agrees).
    *
    * Scale shape: n·(len+1) keys (one explode), ONE equi-join shuffle on
    * near-unique string keys, exact verify on candidates only; k > 1
    * generalizes by recursive deletions (keys ~ n·C(len,k)) with the
    * same lossless-candidate contract. The naive quadratic join exists
    * only on the oracle side.
    */
  def q166EditdistJoin(s: SparkSession, dir: String): DataFrame = {
    val base = tbl(s, dir, "documents")
      .select(col("doc_id"),
        array_join(slice(tokens(col("text")), 1, 5), " ").as("t"))
    val twins = base.filter(col("doc_id") % 7 === 0)
      .select(concat(col("t").substr(lit(1), lit(3)),
        col("t").substr(lit(5), length(col("t")))).as("t"))
    val names = base.select(col("t")).union(twins)
      .filter(length(col("t")) >= 1).distinct()
    // deletion neighborhood via codegen'd HOFs — no UDF
    val dels = transform(sequence(lit(1), length(col("t"))),
      i => concat(col("t").substr(lit(1), i - 1),
        col("t").substr(i + 1, length(col("t")))))
    val keys = names
      .select(col("t"), explode(array_union(array(col("t")), dels)).as("k"))
      .localCheckpoint() // one key pass; both self-join sides read it
    keys.as("a").join(keys.as("b"),
        col("a.k") === col("b.k") && col("a.t") < col("b.t"))
      .select(col("a.t").as("a_t"), col("b.t").as("b_t")).distinct()
      .withColumn("dist", levenshtein(col("a_t"), col("b_t")).cast("long"))
      .filter(col("dist") <= 1)
      .orderBy(col("a_t"), col("b_t"))
  }

  /** q167: PMI COLLOCATION mining (Church & Hanks, CL 1990 — pointwise
    * mutual information over adjacent word pairs, the classic
    * association measure for multi-word-expression discovery): for each
    * bigram type, pmi_bits = bitlen(c_ab·N) − bitlen(c_a·c_b), the
    * repo's exact floor-log2 surrogate (q102's discipline) of
    * log2(p(ab)/(p(a)p(b))) — bit-identical in Spark and DuckDB, so
    * every score hash-matches. Support floor c_ab ≥ 4 (PMI's known
    * low-frequency pathology; Church & Hanks use 5 on AP-wire scale).
    *
    * Scale shape: adjacent pairing is an in-row zip_with (no window, no
    * posexplode join); one map-combined groupBy per table; the unigram
    * vocabulary joins BROADCAST twice (Zipf-head defense, q55/q56
    * precedent). The bitlen products fit signed 64-bit while N < 3·10⁹
    * tokens — beyond that the same score runs per-shard or the counts
    * widen to DECIMAL(38,0); the comparison semantics are unchanged.
    */
  def q167Collocations(s: SparkSession, dir: String): DataFrame = {
    // planted multi-word expression on every 9th doc: near-IID word soup
    // has almost no true collocations, so the planted phrase supplies
    // assertable high-PMI truth (it must outrank every organic bigram)
    val d = tbl(s, dir, "documents").select(col("doc_id"),
      concat(col("text"), when(col("doc_id") % 9 === 0,
        lit(" gradient descent converges rapidly")).otherwise(lit("")))
        .as("text"))
    val t = tokens(col("text"))
    val pairs = d.select(explode(zip_with(
        slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
    val cBg = pairs.groupBy(col("bg")).agg(count(lit(1)).as("c_ab"))
    val uni = d.select(explode(t).as("w")).groupBy(col("w"))
      .agg(count(lit(1)).as("c"))
    val n = pairs.groupBy().agg(count(lit(1)).as("n_bg")) // 1-row scalar
    cBg.filter(col("c_ab") >= 4)
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
      .join(broadcast(uni.withColumnRenamed("w", "w1")
        .withColumnRenamed("c", "c_a")), "w1")
      .join(broadcast(uni.withColumnRenamed("w", "w2")
        .withColumnRenamed("c", "c_b")), "w2")
      .crossJoin(broadcast(n))
      .select(col("bg"), col("c_ab"), col("c_a"), col("c_b"),
        (length(bin(col("c_ab") * col("n_bg"))) -
          length(bin(col("c_a") * col("c_b")))).cast("long").as("pmi_bits"))
      .filter(col("pmi_bits") >= 2)
      .orderBy(col("pmi_bits").desc, col("bg"))
  }

  /** Longest period-p repetition run per document for p ∈ {1,2,3}: the
    * count of consecutive token positions i (within the first
    * `maxToks` tokens) where token_i == token_{i−p}. A loop "x y x y
    * x y …" of period 2 repeated k times scores rep2 = 2(k−1); natural
    * prose scores near zero. Production API behind q172; returns
    * (doc_id, rep1, rep2, rep3) for documents with ≥1 match.
    */
  private[queries] def repetitionRuns(docs: DataFrame,
      maxToks: Int = 2048): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = docs.select(col("doc_id"),
      posexplode(slice(tokens(col("text")), 1, maxToks))
        .as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val lagged = tk
      .withColumn("f1", col("tok") === lag(col("tok"), 1).over(w))
      .withColumn("f2", col("tok") === lag(col("tok"), 2).over(w))
      .withColumn("f3", col("tok") === lag(col("tok"), 3).over(w))
    // null lag (pos < p) and false both drop at the filter
    val flags = lagged.select(col("doc_id"), col("pos"),
        posexplode(array(col("f1"), col("f2"), col("f3")))
          .as(Seq("pi", "flag")))
      .where(col("flag"))
      .select(col("doc_id"), (col("pi") + 1).as("p"), col("pos"))
    // gaps-and-islands: consecutive flagged positions share pos − rn
    val wi = Window.partitionBy(col("doc_id"), col("p")).orderBy(col("pos"))
    flags.withColumn("isl", col("pos") - row_number().over(wi))
      .groupBy(col("doc_id"), col("p"), col("isl"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col("doc_id"), col("p")).agg(max(col("run")).as("mx"))
      .groupBy(col("doc_id"))
      .agg(coalesce(max(when(col("p") === 1, col("mx"))), lit(0L)).as("rep1"),
        coalesce(max(when(col("p") === 2, col("mx"))), lit(0L)).as("rep2"),
        coalesce(max(when(col("p") === 3, col("mx"))), lit(0L)).as("rep3"))
  }

  /** q172: DEGENERATE REPETITION-LOOP detection — the telltale failure
    * mode of neural text degeneration (public: Holtzman, Buys, Du,
    * Forbes, Choi, "The Curious Case of Neural Text Degeneration", ICLR
    * 2020): machine-generated or template-broken pages end in "… the the
    * the the" or "click here click here click here" loops that n-gram
    * repetition RATIOS (q17/q50 Gopher filters) dilute away on long
    * documents. This measures the loop directly: the longest CONSECUTIVE
    * run of positions where token_i equals token_{i−p} for period
    * p ∈ {1,2,3}, via the gaps-and-islands run-length idiom; `looped`
    * gates at a max run ≥ 12 (≥ 12 consecutive period-matching tokens,
    * e.g. a unigram echoed 13 times or a trigram cycled 5 times).
    *
    * Scale notes (100 TB): the token slice cap (2048) bounds per-row
    * cost and window width, so a degenerate giant page — exactly the
    * document this hunts — cannot straggle a reducer. ONE Exchange on
    * doc_id carries every window pass: the islands window is keyed
    * (doc_id, p), which the doc_id hash partitioning already satisfies
    * (Spark inserts only a sort), and the run/max aggregates are
    * map-combined on the same keys. The final per-doc join is keyed on
    * doc_id like everything else.
    */
  def q172RepetitionLoops(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    docs.select(col("doc_id"))
      .join(repetitionRuns(docs.select(col("doc_id"), col("text"))),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("rep1"), lit(0L)).as("rep1"),
        coalesce(col("rep2"), lit(0L)).as("rep2"),
        coalesce(col("rep3"), lit(0L)).as("rep3"))
      .withColumn("max_run", greatest(col("rep1"), col("rep2"), col("rep3")))
      .withColumn("looped", col("max_run") >= 12)
      .orderBy(col("doc_id"))
  }

  /** q175: BITEXT CANDIDATE MINING — the ParaCrawl harvesting move
    * (Bañón et al., ACL 2020 §3: translation candidates are pages of the
    * same site whose URLs differ only in a language path segment, gated
    * by the Gale–Church length prior before any expensive alignment).
    * Each document gets its deterministic site URL with a language
    * segment (`…/{lang}/a/{article}`); erasing that segment with one
    * regex yields the pairing key; one representative per (key, lang) is
    * the min-doc_id row; candidate pairs are distinct-language twins
    * under the same key whose byte lengths satisfy the integer-exact
    * 2·min ≥ max ratio gate with a 50-char floor (the length-ratio prior
    * — Gale & Church, CL 1993 — as a pre-alignment filter).
    *
    * Fully oracled: URL synthesis, erasure, representative pick, self
    * join, and ratio gate are all relational — DuckDB derives the same
    * pairs from the same parquet, so the hash equality checks the whole
    * mining path end-to-end.
    *
    * Scale shape (100 TB): one regex projection, one (key, lang) groupBy,
    * one key-equi self-join whose buckets are bounded by the language
    * count per key (≤5 here, ≤ O(100) in reality) — never all-pairs; the
    * erased key is site-prefixed, so the join shuffle is site-local.
    */
  def q175BitextMine(s: SparkSession, dir: String): DataFrame = {
    val langRe = "/(en|fr|es|de|zh)/"
    val keyed = tbl(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        regexp_replace(
          concat(lit("https://w"),
            expr("(doc_id DIV 4) % 23").cast("string"),
            lit(".example.org/"), col("lang"), lit("/a/"),
            expr("doc_id DIV 4").cast("string")),
          langRe, "/_/").as("key_url"))
    val pick = keyed.groupBy(col("key_url"), col("lang"))
      .agg(min(struct(col("doc_id"), col("n_chars"))).as("m"))
      .select(col("key_url"), col("lang"),
        col("m").getField("doc_id").as("doc_id"),
        col("m").getField("n_chars").as("n_chars"))
    val a = pick.select(col("key_url"), col("lang").as("lang_a"),
      col("doc_id").as("id_a"), col("n_chars").as("len_a"))
    val b = pick.select(col("key_url"), col("lang").as("lang_b"),
      col("doc_id").as("id_b"), col("n_chars").as("len_b"))
    a.join(b, Seq("key_url"))
      .filter(col("lang_a") < col("lang_b") &&
        col("len_a") >= 50 && col("len_b") >= 50 &&
        least(col("len_a"), col("len_b")) * 2 >=
          greatest(col("len_a"), col("len_b")))
      .select(col("key_url"), col("lang_a"), col("lang_b"),
        col("id_a"), col("id_b"), col("len_a"), col("len_b"))
      .orderBy(col("key_url"), col("lang_a"), col("lang_b"))
  }

  /** q176: GALE–CHURCH SENTENCE ALIGNMENT — the alignment stage that
    * follows q175's candidate mining in the ParaCrawl pipeline (Gale &
    * Church, CL 1993; Bañón et al., ACL 2020 §4). Each candidate pair's
    * sentence-length arrays (first 64 sentences, split on ". ") run
    * through the exact-integer DP behind the codegen'd `gale_church`
    * expression ([[graft.core.GaleChurch]]: the paper's own match-type
    * penalties 0/450/230/440, an integer length-mismatch surrogate,
    * fixed tie-break order ⇒ one unique alignment per pair on every JVM
    * and partitioning).
    *
    * Not SQL-expressible (the DP is the operator) → self-certifying
    * `gc_ok`, two independent layers:
    *  - STRUCTURAL: the exploded blocks must tile BOTH sequences exactly
    *    — running sums of (na, nb) reproduce each block's (ai, bi), the
    *    partition totals equal the array sizes, and every (na, nb) is a
    *    legal Gale–Church move. Computed relationally (windows over the
    *    exploded blocks), so a wrong DP cannot certify itself.
    *  - PLANTED: four hand-solved pairs (1–1 + 2–1 contraction, all 1–1,
    *    empty-B deletion spine, 1–2 expansion) must equal their literal
    *    expected block lists.
    *
    * Scale shape: one broadcast-joined planted union, two doc-side
    * projections, one stateless DP per pair (O(64²) ints), one window
    * over each pair's ≤67 blocks. The expensive part (the candidate
    * join) already happened in q175 — alignment itself is
    * embarrassingly parallel.
    */
  def q176GaleChurch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftExtensions.ensureRegistered(s)
    def lens(c: Column): Column = transform(
      filter(split(c, "\\. "), x => length(trim(x)) > 0),
      x => length(trim(x)).cast("int"))
    val docs = tbl(s, dir, "documents")
      .select(col("doc_id"), slice(lens(col("text")), 1, 64).as("lens"))
    val organic = q175BitextMine(s, dir)
      .select(col("key_url"), col("lang_a"), col("lang_b"),
        col("id_a"), col("id_b"))
      .join(docs.select(col("doc_id").as("id_a"), col("lens").as("lens_a")),
        "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("lens").as("lens_b")),
        "id_b")
      .select(col("key_url"), col("lang_a"), col("lang_b"),
        col("lens_a"), col("lens_b"))
    val planted = Seq(
      ("plant://gc/contract", "aa", "bb",
        Seq(100, 50, 60), Seq(102, 108)),
      ("plant://gc/ones", "aa", "bb", Seq(80, 80), Seq(82, 81)),
      ("plant://gc/delete", "aa", "bb", Seq(100, 50), Seq.empty[Int]),
      ("plant://gc/expand", "aa", "bb", Seq(200), Seq(98, 99)))
      .toDF("key_url", "lang_a", "lang_b", "lens_a", "lens_b")
      .select(col("key_url"), col("lang_a"), col("lang_b"),
        col("lens_a").cast("array<int>"), col("lens_b").cast("array<int>"))
    val aligned = organic.unionByName(planted)
      .withColumn("n_a", size(col("lens_a")))
      .withColumn("n_b", size(col("lens_b")))
      .select(col("key_url"), col("lang_a"), col("lang_b"),
        col("n_a"), col("n_b"),
        posexplode(expr("gale_church(lens_a, lens_b)")).as(Seq("pos", "blk")))
      .select(col("key_url"), col("lang_a"), col("lang_b"),
        col("n_a"), col("n_b"), col("pos"),
        col("blk.ai").as("ai"), col("blk.bi").as("bi"),
        col("blk.na").as("na"), col("blk.nb").as("nb"))
    val w = Window.partitionBy(col("key_url"), col("lang_a"), col("lang_b"))
      .orderBy(col("pos"))
    val whole = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val expected = Seq(
      ("plant://gc/contract", 0, 0, 0, 1, 1),
      ("plant://gc/contract", 1, 1, 1, 2, 1),
      ("plant://gc/ones", 0, 0, 0, 1, 1),
      ("plant://gc/ones", 1, 1, 1, 1, 1),
      ("plant://gc/delete", 0, 0, 0, 1, 0),
      ("plant://gc/delete", 1, 1, 0, 1, 0),
      ("plant://gc/expand", 0, 0, 0, 1, 2))
      .toDF("e_key", "e_pos", "e_ai", "e_bi", "e_na", "e_nb")
    aligned
      .withColumn("cum_na",
        coalesce(sum(col("na")).over(w) - col("na"), lit(0)))
      .withColumn("cum_nb",
        coalesce(sum(col("nb")).over(w) - col("nb"), lit(0)))
      .withColumn("tot_na", sum(col("na")).over(whole))
      .withColumn("tot_nb", sum(col("nb")).over(whole))
      .join(broadcast(expected),
        col("key_url") === col("e_key") && col("pos") === col("e_pos"),
        "left")
      .select(col("key_url"), col("lang_a"), col("lang_b"), col("pos"),
        col("ai"), col("bi"), col("na"), col("nb"),
        (col("ai") === col("cum_na") && col("bi") === col("cum_nb") &&
          col("tot_na") === col("n_a") && col("tot_nb") === col("n_b") &&
          ((col("na") === 1 && col("nb") === 1) ||
            (col("na") === 1 && col("nb") === 0) ||
            (col("na") === 0 && col("nb") === 1) ||
            (col("na") === 2 && col("nb") === 1) ||
            (col("na") === 1 && col("nb") === 2) ||
            (col("na") === 2 && col("nb") === 2)) &&
          (col("e_key").isNull ||
            (col("ai") === col("e_ai") && col("bi") === col("e_bi") &&
              col("na") === col("e_na") && col("nb") === col("e_nb"))) &&
          (!col("key_url").startsWith("plant://gc/") ||
            col("e_key").isNotNull)).as("gc_ok"))
      .orderBy(col("key_url"), col("lang_a"), col("lang_b"), col("pos"))
  }

  /** q177: DEHYPHENATION — the PDF/print line-wrap repair every layout
    * extractor needs (the pdfminer/GROBID heuristic): a line ending in
    * `letters-` merges its trailing word with the next line's leading
    * word; the hyphen is REMOVED when the merged word occurs elsewhere
    * in the same document as a token (wrap artifact: "exam-\nple"), and
    * KEPT when it does not (true compound: "well-\nknown"). The consumed
    * lead word leaves the next line; a next line that was exactly that
    * one word is NOT consumed (chained hyphenation guard — keeps every
    * merge decision locally window-computable).
    *
    * Not SQL-expressible as one oracle query (the rebuild is the
    * operator) → self-certifying `dehyph_ok`: the RELATIONAL path
    * (posexplode lines → lead/lag windows → dictionary semi-join →
    * ordered rebuild) must rebuild to the md5-identical text of an
    * independent SEQUENTIAL line walker, planted docs must equal their
    * literal expected outputs, and the organic documents (no hyphen
    * wraps) are a rebuilt == original negative control.
    *
    * Scale shape: one doc-keyed explode + window pass, one distinct
    * token projection feeding a broadcast-able semi-join keyed
    * (doc_id, word), one ordered collect_list per doc — the q91/q107
    * rebuild discipline; text never shuffles more than once.
    */
  def q177Dehyphenate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val planted = Seq(
      ("plant-1",
        "the example stands. exam-\nple text follows.",
        "the example stands. example\ntext follows."),
      ("plant-2",
        "a well-\nknown fact",
        "a well-known\nfact"),
      ("plant-3",
        "ends with hy-\nphen but hyphen is known. hyphen-\nword again",
        "ends with hyphen\nbut hyphen is known. hyphen-word\nagain"),
      ("plant-4",
        "single next word stays: bro-\nken",
        "single next word stays: bro-\nken"),
      ("plant-5", "no wraps at all\njust lines", "no wraps at all\njust lines"))
      .toDF("url", "text", "want")
    val organic = tbl(s, dir, "documents")
      .select(concat(lit("doc-"), col("doc_id")).as("url"),
        col("text"), col("text").as("want"))
    val input = planted.unionByName(organic)
    val lines = input
      .select(col("url"), posexplode(split(col("text"), "\n"))
        .as(Seq("pos", "line")))
    val w = Window.partitionBy(col("url")).orderBy(col("pos"))
    val trailRe = "([\\p{L}]+)-$"
    val leadRe = "^([\\p{L}]+)"
    val cand = lines
      .withColumn("trail", regexp_extract(col("line"), trailRe, 1))
      .withColumn("next_line", lead(col("line"), 1).over(w))
      .withColumn("lead_w",
        regexp_extract(coalesce(col("next_line"), lit("")), leadRe, 1))
      .withColumn("next_single",
        trim(coalesce(col("next_line"), lit(""))) === col("lead_w"))
      .withColumn("mergeable",
        col("trail") =!= "" && col("lead_w") =!= "" && !col("next_single"))
      .withColumn("merged", lower(concat(col("trail"), col("lead_w"))))
    val dict = input.select(col("url"),
        explode(array_distinct(split(lower(col("text")), "[^\\p{L}]+")))
          .as("word"))
      .filter(col("word") =!= "").distinct()
    val flagged = cand.join(dict,
        cand("url") === dict("url") && col("merged") === col("word"),
        "left_semi")
      .select(cand("url").as("m_url"), col("pos").as("m_pos"),
        lit(true).as("in_dict"))
    val decided = cand
      .join(flagged, col("url") === col("m_url") && col("pos") === col("m_pos"),
        "left")
      .withColumn("drop_hyphen",
        col("mergeable") && coalesce(col("in_dict"), lit(false)))
      .withColumn("consumed", lag(col("mergeable"), 1, false).over(w))
      .withColumn("base",
        when(col("consumed"),
          regexp_replace(col("line"), leadRe + "[ ]?", ""))
          .otherwise(col("line")))
      .withColumn("out_line",
        when(col("mergeable") && col("drop_hyphen"),
          concat(regexp_replace(col("base"), "-$", ""), col("lead_w")))
          .when(col("mergeable"),
            concat(col("base"), col("lead_w")))
          .otherwise(col("base")))
      .filter(!(col("consumed") && trim(col("out_line")) === ""))
    val rebuilt = decided.groupBy(col("url"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("out_line")))),
        x => x.getField("out_line")), "\n").as("rebuilt"))
    // independent sequential line walker (the obvious algorithm)
    val trailR = trailRe.r
    val leadR = leadRe.r
    val typed = input.select(col("url"), col("text"))
      .as[(String, String)].map { case (url, text) =>
        val ls = text.split("\n", -1)
        val words = text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
          .toSet
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < ls.length) {
          var line = ls(i)
          trailR.findFirstMatchIn(line) match {
            case Some(tm) if i + 1 < ls.length =>
              val next = ls(i + 1)
              val lm = leadR.findFirstMatchIn(next)
              val leadW = lm.map(_.group(1)).getOrElse("")
              if (leadW.nonEmpty && next.trim != leadW) {
                val trailW = tm.group(1)
                if (words.contains((trailW + leadW).toLowerCase))
                  line = line.dropRight(1) // wrap artifact: hyphen removed
                out += line + leadW
                val afterLead = lm.get.end(1)
                val rest = next.substring(afterLead +
                  (if (next.length > afterLead &&
                    next.charAt(afterLead) == ' ') 1 else 0))
                if (rest.trim.isEmpty) i += 2
                else { ls(i + 1) = rest; i += 1 }
              } else { out += line; i += 1 }
            case _ => out += line; i += 1
          }
        }
        (url, out.mkString("\n"))
      }.toDF("t_url", "t_rebuilt")
    input.join(rebuilt, Seq("url"), "left")
      .join(typed, col("url") === col("t_url"), "full_outer")
      .select(
        coalesce(col("url"), col("t_url")).as("url"),
        md5(col("rebuilt").cast("binary")).as("rebuilt_md5"),
        (length(col("text")) - length(col("rebuilt"))).as("chars_removed"),
        (col("url").isNotNull && col("t_url").isNotNull &&
          col("rebuilt") <=> col("t_rebuilt") &&
          (!col("url").startsWith("plant-") ||
            col("rebuilt") <=> col("want")) &&
          (!col("url").startsWith("doc-") ||
            col("rebuilt") <=> col("text"))).as("dehyph_ok"))
      .orderBy(col("url"))
  }

  /** Confusable → ASCII skeleton map (a UTS #39 §4 subset: the Cyrillic
    * and Greek BMP lookalikes that dominate real homograph attacks, plus
    * digit-for-letter substitutions). Shared by the Spark and DuckDB
    * sides of q178 — both engines' `translate` are per-codepoint on BMP
    * input, so the mapping is engine-identical.
    */
  private[queries] val ConfusableFrom = "асеіорѕхуονһ"
  private[queries] val ConfusableTo = "aceiopsxyovh"

  /** q178: HOMOGLYPH SKELETON SPOOF DETECTION — the UTS #39 confusable
    * discipline (Unicode TS 39 §4 "skeleton": map every confusable to
    * its prototype, then compare skeletons for equality) applied to
    * hostnames, the standard defense against IDN homograph phishing
    * domains in a crawl frontier. Hostnames are derived deterministically
    * from `documents` (every 7th doc gets a Cyrillic-substituted spoof of
    * its group's base host); the skeleton is one `translate` projection;
    * spoof GROUPS are skeletons covering >1 distinct raw hostname,
    * reported with the member list.
    *
    * Fully oracled: the same derivation, translate-based skeleton,
    * groupBy and ordered member join run in DuckDB — hash equality
    * checks map coverage, grouping, and ordering end-to-end.
    *
    * Scale shape: stateless per-row skeleton, one low-cardinality
    * groupBy; at 100 TB the skeleton is the join key against the
    * legitimate-domain allowlist (broadcast), never an all-pairs
    * comparison.
    */
  def q178Homoglyph(s: SparkSession, dir: String): DataFrame = {
    val base = concat(lit("host"),
      expr("(doc_id DIV 8) % 40").cast("string"), lit(".example.com"))
    val host = when(col("doc_id") % 7 === 0,
      translate(base, "aceo", "асео")).otherwise(base)
    tbl(s, dir, "documents")
      .select(host.as("host"))
      .withColumn("skeleton",
        translate(lower(col("host")), ConfusableFrom, ConfusableTo))
      .groupBy(col("skeleton"))
      .agg(countDistinct(col("host")).as("n_variants"),
        count(lit(1)).as("n_docs"),
        array_join(array_sort(collect_set(col("host"))), "|").as("hosts"))
      .filter(col("n_variants") > 1)
      .orderBy(col("skeleton"))
  }

  /** q193: IDN PUNYCODE SPOOF SURFACE — q178's confusable-skeleton
    * screen sees only what is WRITTEN in the host string; a homograph
    * attack ships as ASCII punycode (`xn--…` A-labels, RFC 3490/3492)
    * and only collides with the brand after IDNA ToUnicode. The new
    * codegen'd `idn_unicode` expression (JDK `java.net.IDN`, never
    * throws) decodes each host, the UTS #39 skeleton is taken over the
    * DECODED form, and a skeleton group is a spoof surface when it
    * contains both a pure-ASCII host and a punycode-decoded one.
    *
    * Planted punycode hosts are built by the inverse JDK transform
    * (`IDN.toASCII` of Cyrillic-substituted brands) at plan
    * construction, so the query performs a genuine round trip: encode
    * driver-side, decode via the expression under test, compare to the
    * carried Unicode literal. Not SQL-expressible (no punycode in
    * DuckDB) → self-certifying `idn_ok` = decoded == expected AND
    * spoof-flag == planted-flag for every row (organic ASCII hosts are
    * the negative control: identity decode, spoof-free groups).
    *
    * Scale shape: stateless per-row decode + one skeleton-keyed
    * aggregate re-joined broadcast; the host table is already tiny
    * relative to the corpus it indexes.
    */
  def q193IdnSpoof(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    val brands = Seq("apache.example.com", "mozilla.example.com",
      "paypal.example.com")
    def cyr(b: String): String = b.map { ch =>
      val i = "aceo".indexOf(ch.toInt)
      if (i < 0) ch else "асео".charAt(i)
    }
    val planted = brands.flatMap { b =>
      val u = cyr(b)
      Seq((b, b, true), (java.net.IDN.toASCII(u), u, true))
    }.toDF("host", "expected", "planted")
    val organic = tbl(s, dir, "documents")
      .select(concat(lit("host"), expr("(doc_id DIV 8) % 40").cast("string"),
        lit(".example.com")).as("host"))
      .distinct()
      .withColumn("expected", col("host"))
      .withColumn("planted", lit(false))
    val hosts = organic.unionByName(planted)
      .withColumn("decoded", expr("idn_unicode(host)"))
      .withColumn("skeleton",
        translate(lower(col("decoded")), ConfusableFrom, ConfusableTo))
    val groups = hosts.groupBy(col("skeleton"))
      .agg(
        max(when(col("host") === col("decoded"), 1).otherwise(0)).as("has_ascii"),
        max(when(col("host") =!= col("decoded"), 1).otherwise(0)).as("has_idn"))
      .withColumn("spoof", col("has_ascii") === 1 && col("has_idn") === 1)
    hosts.join(broadcast(groups.select(col("skeleton"), col("spoof"))),
        "skeleton")
      .select(col("host"), col("decoded"), col("skeleton"), col("spoof"),
        (col("decoded") <=> col("expected") &&
          col("spoof") <=> col("planted")).as("idn_ok"))
      .orderBy(col("host"))
  }

  /** q180: QUALITY-AWARE DEDUP KEEPER SELECTION — the canonicalization
    * refinement of q15: inside every exact-duplicate cluster (md5 of the
    * text bytes) the KEPT copy is the best one, not the arbitrary
    * min-id one. "Best" here is the deterministic total order
    * (longest text, then smallest doc_id) — the syndication rule: when
    * a wire story appears on 40 sites, keep the least-truncated copy
    * (Common Crawl dedup and news-corpus curation both pick keepers by
    * a quality key, not arrival order). Reports per-cluster keeper and
    * the exact bytes the demoted copies would have contributed.
    *
    * Fully oracled (one groupBy + arg-max struct in both engines).
    * Scale shape: ONE shuffle keyed on the 128-bit digest — the text
    * column never travels (n_chars is the quality key); the arg-max is
    * a map-combined `max(struct(...))`, no window, no second pass.
    */
  def q180QualityKeeper(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .groupBy(md5s(col("text")).as("fp"))
      .agg(
        max(struct(col("n_chars"), (-col("doc_id")).as("ni")))
          .as("m"),
        count(lit(1)).as("dupes"),
        sum(col("n_chars")).as("total_chars"))
      .select(col("fp"), (-col("m.ni")).as("keeper_id"),
        col("m.n_chars").as("keeper_chars"), col("dupes"),
        (col("total_chars") - col("m.n_chars")).as("removed_chars"))
      .orderBy(col("fp"))

  /** q191: QUOTE EXTRACTION + ATTRIBUTION — quoted spans are the
    * highest-value citation/claims surface a news-corpus pipeline mines
    * (and the spans most worth protecting from span-dedup, which would
    * otherwise collapse a widely-quoted sentence across articles).
    * Policy, identical in both engines: quotes = the regex
    * `"([^"]{10,200})"([^"]{0,40})` over the text — group 1 the span,
    * group 2 the trailing context (which cannot cross the next quote
    * character, so matches never swallow a following quotation) —
    * numbered in match order; `attributed` = the trailing context
    * contains a reporting verb (`said|says|wrote|told`, word-bounded).
    * Planted wires (the q105 in-query construction, derivable in SQL)
    * give every 4th doc an attributed quote and every 4th+1 an
    * unattributed one, so both verdicts exist by construction.
    *
    * No positions are used (character-offset semantics differ between
    * engines on non-ASCII text); the span itself travels as md5 + char
    * length. Scale shape: stateless per-row regex scan + one explode —
    * no shuffle before the ORDER BY.
    */
  def q191QuoteAttribution(s: SparkSession, dir: String): DataFrame = {
    val pat = "\"([^\"]{10,200})\"([^\"]{0,40})"
    tbl(s, dir, "documents")
      .withColumn("wire",
        when(pmod(col("doc_id"), lit(4)) === 0,
          concat(col("text"), lit(" \"planted quotation "),
            col("doc_id").cast("string"),
            lit(" stands right here\" the editor said afterwards.")))
          .when(pmod(col("doc_id"), lit(4)) === 1,
            concat(col("text"), lit(" \"unattributed planted quotation "),
              col("doc_id").cast("string"),
              lit(" here\" trailing words continue.")))
          .otherwise(col("text")))
      .select(col("doc_id"),
        posexplode(arrays_zip(
          expr(s"regexp_extract_all(wire, '$pat', 1)"),
          expr(s"regexp_extract_all(wire, '$pat', 2)"))).as(Seq("i", "q")))
      .select(col("doc_id"), (col("i") + 1).cast("long").as("qidx"),
        md5(col("q").getField("0").cast("binary")).as("quote_md5"),
        length(col("q").getField("0")).cast("long").as("qlen"),
        col("q").getField("1").rlike("\\b(said|says|wrote|told)\\b")
          .as("attributed"))
      .orderBy(col("doc_id"), col("qidx"))
  }

  /** q202: TOKEN DISPERSION (Gries' DP, "Dispersions and adjusted
    * frequencies in corpora", IJCL 2008) — how evenly a token spreads
    * over the sources, the corpus-linguistics complement of raw
    * frequency (a high-frequency token concentrated in one source is a
    * template artifact, not a function word). DP(t) = Σ_s |v_s − e_s|/2
    * where v_s is the token's share in source s and e_s the source's
    * share of the corpus, both as ×1e6 integer-div fixed point; sources
    * NOT containing the token contribute |0 − e_s| = e_s, folded in
    * CLOSED FORM as (Σ_all e_s − Σ_present e_s) so absent (token,
    * source) pairs never materialize. Restricted to tokens with corpus
    * count ≥ 200 (the decision-relevant head). Fully oracled.
    *
    * Scale shape: one (token, source) map-combined count; the per-source
    * share table and the frequent-token list re-enter BROADCAST (the
    * q55/q56 Zipf discipline); no windows, no absent-pair explosion.
    */
  def q202Dispersion(s: SparkSession, dir: String): DataFrame = {
    val tk = tbl(s, dir, "documents")
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .where(col("tok") =!= "")
    val st = tk.groupBy(col("source")).agg(count(lit(1)).as("stot"))
    val tot = st.agg(sum(col("stot")).as("t_all"))
    val s6 = st.crossJoin(broadcast(tot))
      .select(col("source"), expr("stot * 1000000 div t_all").as("e6"))
    val s6tot = s6.agg(sum(col("e6")).as("e6_all"))
    val ct = tk.groupBy(col("tok"), col("source")).agg(count(lit(1)).as("c"))
    val freq = ct.groupBy(col("tok")).agg(sum(col("c")).as("cnt"))
      .where(col("cnt") >= 200)
    ct.join(broadcast(freq), "tok")
      .join(broadcast(s6), "source")
      .withColumn("v6", expr("c * 1000000 div cnt"))
      .groupBy(col("tok"), col("cnt"))
      .agg(sum(abs(col("v6") - col("e6"))).as("present_abs"),
        sum(col("e6")).as("present_e6"))
      .crossJoin(broadcast(s6tot))
      .select(col("tok"), col("cnt"),
        expr("(present_abs + e6_all - present_e6) div 2").as("dp_x1e6"))
      .orderBy(col("tok"))
  }

  /** q204: ACRONYM–DEFINITION MINING — `long form (ACRO)` pairs are the
    * terminology layer a domain-adaptation pipeline extracts first
    * (Schwartz & Hearst, "A simple algorithm for identifying
    * abbreviation definitions in biomedical text", PSB 2003 — the
    * initial-matching core, relationally). Regex (Java∩RE2, greedy in
    * both): `([a-z]+(?: [a-z]+){1,5}) \(([a-z]{2,6})\)` over the
    * lowercased text; `matched` = the initials of the LAST |acro| words
    * of the long form spell the acronym (array slice + transform — no
    * per-char UDF). Planted wires give every 6th doc a true pair and
    * every 6th+1 a non-matching parenthetical, so both verdicts exist.
    * Fully oracled. Stateless per-row scan + one explode.
    */
  def q204Acronyms(s: SparkSession, dir: String): DataFrame = {
    val pat = "([a-z]+(?: [a-z]+){1,5}) \\(([a-z]{2,6})\\)"
    // tblWide: two regexp_extract_all passes per row on a single-split
    // scan with no shuffle before the final sort (the q154 profile)
    tblWide(s, dir, "documents")
      .withColumn("wire",
        when(pmod(col("doc_id"), lit(6)) === 0,
          concat(col("text"),
            lit(" the world health organization (who) announced it.")))
          .when(pmod(col("doc_id"), lit(6)) === 1,
            concat(col("text"), lit(" a big tent (abc) event happened.")))
          .otherwise(col("text")))
      .withColumn("wire", lower(col("wire")))
      .select(col("doc_id"),
        posexplode(arrays_zip(
          regexp_extract_all(col("wire"), lit(pat), lit(1)),
          regexp_extract_all(col("wire"), lit(pat), lit(2)))).as(Seq("i", "m")))
      .select(col("doc_id"), (col("i") + 1).cast("long").as("aidx"),
        col("m").getField("1").as("acro"),
        split(col("m").getField("0"), " ").as("words"))
      .withColumn("n", length(col("acro")).cast("int"))
      .withColumn("tail_words",
        slice(col("words"), size(col("words")) - col("n") + 1, col("n")))
      .select(col("doc_id"), col("aidx"), col("acro"),
        md5(array_join(col("words"), " ").cast("binary")).as("def_md5"),
        (size(col("words")) >= col("n") &&
          array_join(transform(col("tail_words"),
            w => substring(w, 1, 1)), "") === col("acro")).as("matched"))
      .orderBy(col("doc_id"), col("aidx"))
  }

  /** q205: TYPOSQUAT SCREEN — edit-distance-bounded host-label matches
    * against a protected-brand list, the Levenshtein complement of
    * q193's homoglyph surface (substitution/omission attacks instead of
    * confusable codepoints). Candidates = first DNS label within
    * distance ≤ 2 of a brand but not equal to it; the brand list enters
    * BROADCAST (it is tiny by definition), so the screen is a stateless
    * per-row loop over ~|brands| native `levenshtein` calls — never a
    * host×host self-join. Planted typos (substitution, deletion,
    * digit-swap) exist in-query in both engines; fully oracled (DuckDB
    * ships the same unit-cost levenshtein).
    */
  def q205Typosquat(s: SparkSession, dir: String): DataFrame = {
    val brands = Seq("paypal", "google", "mozilla", "amazon")
    val organic = tbl(s, dir, "documents")
      .select(concat(lit("host"), expr("(doc_id DIV 8) % 40").cast("string"),
        lit(".example.com")).as("host"))
    val planted = Seq("payp4l.example.com", "gogle.example.com",
      "mozila.example.com", "paypal.example.com", "zebra.example.com")
    import s.implicits._
    organic.unionByName(planted.toDF("host")).distinct()
      .withColumn("label", split(col("host"), "\\.").getItem(0))
      .crossJoin(broadcast(brands.toDF("brand")))
      .withColumn("dist", levenshtein(col("label"), col("brand")).cast("long"))
      .where(col("dist") <= 2 && col("label") =!= col("brand"))
      .select(col("host"), col("brand"), col("dist"))
      .orderBy(col("host"), col("brand"))
  }

  /** q206: BARE-URL CITATION MINING — http(s) URLs inside plain text
    * (the outlink evidence HTML parsing cannot see once a page is
    * reduced to text): hosts extracted by regex, trailing `.`/`-`
    * stripped (the sentence-final-dot wart, handled identically in both
    * engines), rolled up to per-host mention and document counts.
    * Every 9th doc plants two citations. Fully oracled; one regex scan
    * + one host-keyed map-combined aggregate.
    */
  def q206UrlMentions(s: SparkSession, dir: String): DataFrame = {
    val pat = "https?://([a-z0-9.-]+)"
    tbl(s, dir, "documents")
      .withColumn("wire",
        when(pmod(col("doc_id"), lit(9)) === 0,
          concat(col("text"),
            lit(" see https://cite1.example.org/a and http://cite2.example.net.")))
          .otherwise(col("text")))
      .select(col("doc_id"),
        explode(regexp_extract_all(lower(col("wire")), lit(pat), lit(1)))
          .as("h"))
      .withColumn("host", rtrim(col("h"), ".-"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_mentions"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("host"))
  }

  /** q207: RAG PASSAGE CHUNKING — fixed-size overlapping token windows
    * (W=64, stride S=48, the standard retrieval-ingest shape): chunk k
    * covers tokens [k·S, min(k·S+W, n)). A tail window that ends where
    * its predecessor ends is a strict suffix of it and is SKIPPED
    * (emit iff k == 0 or (k−1)·S + W < n) — the dedup-at-source rule a
    * vector store wants. Only digests travel (chunk_md5 of the
    * space-joined slice). Fully oracled; the whole operator is one
    * in-row sequence explode + slice — no shuffle before the ORDER BY,
    * and the token array is materialized once per row, never re-split
    * per chunk.
    */
  def q207RagChunks(s: SparkSession, dir: String): DataFrame = {
    val W = 64; val S = 48
    tbl(s, dir, "documents")
      .select(col("doc_id"),
        filter(tokens(col("text")), t => t =!= "").as("t"))
      .withColumn("n", size(col("t")))
      .where(col("n") > 0)
      .select(col("doc_id"), col("t"), col("n"),
        explode(sequence(lit(0), expr(s"(n - 1) div $S"))).as("k"))
      .where(col("k") === 0 || (col("k") - 1) * S + W < col("n"))
      .withColumn("start", col("k") * S)
      .select(col("doc_id"), col("k").cast("long").as("k"),
        col("start").cast("long").as("start"),
        (least(col("start") + W, col("n")) - col("start")).cast("long").as("len"),
        md5(array_join(slice(col("t"), col("start") + 1, lit(W)), " ")
          .cast("binary")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("k"))
  }

  /** q208: VOCABULARY CHURN BETWEEN CRAWLS — per source, the type-level
    * diff between two crawl snapshots (halves by doc_id parity, the
    * deterministic stand-in): types retired, types new, and the
    * vocabulary Jaccard ×1e6 — the drift gauge that decides whether a
    * source's language model / tokenizer stats need refreshing (q69
    * answers "which documents changed"; this answers "did the LANGUAGE
    * change"). Fully oracled. Shape: one (source, token, half)
    * map-combined aggregate → one source rollup; no joins at all — the
    * halves meet inside the aggregate via conditional counts.
    */
  def q208VocabChurn(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("source"), (col("doc_id") % 2 === 0).as("in_a"),
        explode(tokens(col("text"))).as("tok"))
      .where(col("tok") =!= "")
      .groupBy(col("source"), col("tok"))
      .agg(max(when(col("in_a"), 1).otherwise(0)).as("a"),
        max(when(!col("in_a"), 1).otherwise(0)).as("b"))
      .groupBy(col("source"))
      .agg(sum(col("a")).as("types_a"), sum(col("b")).as("types_b"),
        sum(col("a") * col("b")).as("common"))
      .select(col("source"),
        col("types_a").cast("long").as("types_a"),
        col("types_b").cast("long").as("types_b"),
        (col("types_a") - col("common")).cast("long").as("gone"),
        (col("types_b") - col("common")).cast("long").as("new_types"),
        expr("common * 1000000 div (types_a + types_b - common)")
          .as("jaccard_x1e6"))
      .orderBy(col("source"))

  /** q209: MIRROR-SOURCE DETECTION BY CONTENT OVERLAP — source pairs
    * sharing a large fraction of exact content fingerprints are mirrors
    * (or syndication partners), and a curation pipeline should collapse
    * them BEFORE per-source accounting (q163's data cards double-count
    * a mirrored site; q192 explains individual copies, this finds the
    * systemic pair). Uses q192's in-query mirror plant (every 10th doc
    * copied under `mirror-<src>`), so true mirror pairs exist by
    * construction: a planted pair shares ALL of its fps with its
    * original, organic source pairs share none. `mirror_pair` =
    * fp-Jaccard ≥ 0.5.
    *
    * Scale shape: one digest-keyed aggregate → within-fp source pairs
    * (bucket bounded by sources-per-fp, tiny by construction — the q63
    * cap discipline) → one pair rollup; per-source totals re-enter
    * BROADCAST. Fully oracled.
    */
  def q209MirrorSources(s: SparkSession, dir: String): DataFrame = {
    val base = tbl(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val mirrors = base.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"),
        concat(lit("mirror-"), col("source")).as("source"))
    val fps = base.unionByName(mirrors)
      .select(col("source"), md5s(col("text")).as("fp"))
      .distinct()
      .localCheckpoint()
    val totals = fps.groupBy(col("source")).agg(count(lit(1)).as("n_fps"))
    val pairs = fps.as("x").join(fps.as("y"),
        col("x.fp") === col("y.fp") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(count(lit(1)).as("overlap"))
    pairs
      .join(broadcast(totals.select(col("source").as("src_a"),
        col("n_fps").as("fps_a"))), "src_a")
      .join(broadcast(totals.select(col("source").as("src_b"),
        col("n_fps").as("fps_b"))), "src_b")
      .withColumn("jaccard_x1e6",
        expr("overlap * 1000000 div (fps_a + fps_b - overlap)"))
      .withColumn("mirror_pair", col("jaccard_x1e6") >= 500000)
      .select(col("src_a"), col("src_b"), col("overlap"), col("fps_a"),
        col("fps_b"), col("jaccard_x1e6"), col("mirror_pair"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** q211: ZIPF RANK-FREQUENCY FIT — the octave-binned rank/frequency
    * profile (Zipf 1949): vocabulary ranked by (freq desc, token),
    * octave k = types at ranks [2^k, 2^(k+1)); per octave the exact
    * mean frequency bitlen ×1000 and its delta to the previous octave —
    * a Zipfian corpus shows a steady ≈ −1000 (one bit per octave)
    * staircase, while template-heavy or synthetic text bends it. The
    * vocabulary ranking is a VOCAB-sized global sort (not corpus-sized;
    * the one legitimate small global sort, q153's discipline). Fully
    * oracled.
    */
  def q211ZipfFit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = tbl(s, dir, "documents")
      .select(explode(tokens(col("text"))).as("tok"))
      .where(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val ranked = freq.withColumn("rank",
      row_number().over(Window.orderBy(col("c").desc, col("tok"))))
    val oct = ranked
      .withColumn("octave", (length(bin(col("rank"))) - 1).cast("long"))
      .groupBy(col("octave"))
      .agg(count(lit(1)).as("n_types"),
        sum(length(bin(col("c"))).cast("long")).as("bits_sum"))
      .withColumn("mean_bits_x1000", expr("bits_sum * 1000 div n_types"))
    val w = Window.orderBy(col("octave"))
    oct.withColumn("delta_x1000",
        col("mean_bits_x1000") - coalesce(lag(col("mean_bits_x1000"), 1).over(w),
          col("mean_bits_x1000")))
      .select(col("octave"), col("n_types"), col("mean_bits_x1000"),
        col("delta_x1000"))
      .orderBy(col("octave"))
  }

  /** q212: LSH QUALITY AUDIT — precision/recall of q22's banded MinHash
    * candidates against the EXACT prefix-filtered similarity join
    * (q116's production-exact path) at J ≥ 0.5, on the deterministic
    * doc_id-even evaluation stripe: the sketch-observability meta-op a
    * pipeline runs after every LSH re-configuration ("is 8-hash/2-band
    * still good enough for this corpus?") — exactly the measurement
    * that justifies LshParams' threshold-derived banding when recall
    * comes back low. One full-outer join of two pair sets → one global
    * count row; both sides run on the same stripe so the audit costs a
    * quarter of the full exact join. Fully oracled (the q22 and q116
    * oracle derivations fused on the stripe).
    */
  def q212LshQuality(s: SparkSession, dir: String): DataFrame = {
    val stripe = tblWide(s, dir, "documents")
      .where(pmod(col("doc_id"), lit(2)) === 0)
      .select(col("doc_id"), col("text"))
    // r6: bands computed on the stripe directly — signatures/band digests
    // are per-doc functions, so [[minhashPairsOf]] over the stripe IS the
    // full-corpus candidate set restricted to even×even pairs (what the
    // previous shape computed by building ALL signatures and filtering
    // the pairs afterwards — twice the signature work for the same rows).
    // The two legs' construction-time localCheckpoints are independent
    // jobs, so they build CONCURRENTLY (guide §2.6) instead of
    // serializing on the driver.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val lshF = Future {
      minhashPairsOf(stripe).select(col("a_id"), col("b_id")).distinct()
    }
    val truthF = Future {
      prefixJaccardPairs(stripe, 500).select(col("a_id"), col("b_id"))
    }
    val lsh = Await.result(lshF, Duration.Inf)
    val truth = Await.result(truthF, Duration.Inf)
    lsh.withColumn("in_lsh", lit(1))
      .join(truth.withColumn("in_truth", lit(1)), Seq("a_id", "b_id"),
        "full_outer")
      .agg(
        sum(when(col("in_lsh").isNotNull && col("in_truth").isNotNull, 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("in_lsh").isNotNull && col("in_truth").isNull, 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("in_lsh").isNull && col("in_truth").isNotNull, 1L)
          .otherwise(0L)).as("fn"))
      .select(col("tp"), col("fp"), col("fn"),
        expr("CASE WHEN tp + fp > 0 THEN tp * 1000000 div (tp + fp) " +
          "ELSE 0 END").as("precision_x1e6"),
        expr("CASE WHEN tp + fn > 0 THEN tp * 1000000 div (tp + fn) " +
          "ELSE 0 END").as("recall_x1e6"))
  }

  /** q213: SHARD MOVE-COST COMPARISON — the decision evidence behind
    * q187: growing 10 → 11 shards moves ~1/11 of docs under rendezvous
    * hashing but ~10/11 under `doc_id % N` — measured exactly, side by
    * side, in one pass. One stateless projection + one global count
    * row; fully oracled.
    */
  def q213ShardMoveCost(s: SparkSession, dir: String): DataFrame = {
    def hrw(n: Int): Column =
      array_max(transform(sequence(lit(0), lit(n - 1)),
        sh => struct(
          md5(concat(col("doc_id").cast("string"), lit(":"),
            sh.cast("string")).cast("binary")).as("ticket"),
          sh.cast("long").as("s")))).getField("s")
    tbl(s, dir, "documents")
      .select(col("doc_id"),
        (hrw(10) =!= hrw(11)).as("hrw_moved"),
        (col("doc_id") % 10 =!= col("doc_id") % 11).as("mod_moved"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("hrw_moved").cast("long")).as("hrw_moved"),
        sum(col("mod_moved").cast("long")).as("mod_moved"))
      .select(col("n_docs"), col("hrw_moved"), col("mod_moved"),
        expr("hrw_moved * 1000000 div n_docs").as("hrw_rate_x1e6"),
        expr("mod_moved * 1000000 div n_docs").as("mod_rate_x1e6"))
  }

  /** q214: SPLIT-CONTAMINATION AUDIT — the governance join of q54's
    * hash split with q60's decontamination hits: per split, how many
    * documents carry eval 13-gram overlap. A nonzero train count is the
    * leak every release checklist hunts; the val/test rows calibrate
    * how aggressive the eval-gram screen is overall. One distinct
    * projection of q60's hit table + one broadcast-joinable split
    * column + one 3-group aggregate; fully oracled (q54's and q60's
    * oracle derivations fused).
    */
  def q214SplitContamination(s: SparkSession, dir: String): DataFrame = {
    val cont = q60Decontaminate(s, dir).select(col("doc_id")).distinct()
      .withColumn("hit", lit(1))
    val bucket = (conv(substring(md5(col("doc_id").cast("string")
      .cast("binary")), 1, 4), 16, 10).cast("long") % 100)
    tbl(s, dir, "documents")
      .select(col("doc_id"),
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test").as("split"))
      .join(cont, Seq("doc_id"), "left")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_contaminated"))
      .orderBy(col("split"))
  }

  /** q215: SHARED-DICTIONARY CANDIDATE MINING — the `zstd --train`
    * analog: the token 8-grams whose repetition pays the most if
    * promoted into a shared compression dictionary, scored by exact
    * byte savings `(count − 1) × chars` over grams with count ≥ 5.
    * Top-20 under the total order (savings desc, gram) so the limit is
    * a TakeOrderedAndProject, not a global sort. Fully oracled.
    *
    * Scale shape: one in-row position explode (grams built by slice
    * from ONE token array, never re-split) → one gram-keyed
    * map-combined count → top-k.
    */
  def q215DictCandidates(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(tokens(col("text")).as("t"))
      .where(size(col("t")) >= 8)
      .select(explode(sequence(lit(1), size(col("t")) - 7)).as("p"), col("t"))
      .select(array_join(slice(col("t"), col("p"), lit(8)), " ").as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 3)
      .select(col("gram"), col("cnt"),
        ((col("cnt") - 1) * length(col("gram")).cast("long")).as("savings"))
      .orderBy(col("savings").desc, col("gram"))
      .limit(20)

  /** q216: CURATION FUNNEL — the docs/tokens-surviving-each-gate table
    * every curation paper publishes (C4/Gopher/Dolma reporting shape),
    * computed over the repo's own gates in their pipeline order:
    * all → q17 quality → q50 Gopher repetition → exact-dup keeper
    * (min-id among the survivors of the previous stages, so dedup
    * never resurrects a rejected doc) → q60 eval-decontamination.
    * One row per stage with CUMULATIVE survivors. Fully oracled (the
    * four gates' oracle derivations fused; q60's rides as a nested
    * subquery).
    *
    * Scale shape: the q50 bigram-mode aggregate is the only per-doc
    * shuffle; the keeper window is digest-keyed; the decontam hit set
    * joins broadcast; the funnel itself is ONE global aggregate row
    * exploded to 5.
    */
  def q216CurationFunnel(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = tokens(col("text"))
    val base = tbl(s, dir, "documents").select(col("doc_id"),
      size(t).as("words"), size(array_distinct(t)).as("uniq"),
      size(filter(t, x => x.isin(stopwords: _*))).as("stop_cnt"),
      md5s(col("text")).as("fp"),
      zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat(a, lit(" "), b)).as("bg"))
    val mode = base.select(col("doc_id"), explode(col("bg")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("topc"), sum(col("c")).as("totc"))
    val hits = q60Decontaminate(s, dir).select(col("doc_id")).distinct()
      .withColumn("hit", lit(1))
    val dupTok = round(lit(1000.0) * (col("words") - col("uniq")) / col("words"))
      .cast("long")
    val topBg = round(lit(1000.0) * col("topc") / col("totc")).cast("long")
    val flagged = base.drop("bg").join(mode, "doc_id")
      .join(broadcast(hits), Seq("doc_id"), "left")
      .withColumn("s1", col("words") >= 20 && col("words") <= 5000 &&
        col("stop_cnt") * 20 >= col("words"))
      .withColumn("s2", col("s1") && col("words") >= 30 &&
        dupTok <= 600 && topBg <= 60)
      .withColumn("keeper",
        min(when(col("s2"), col("doc_id")))
          .over(Window.partitionBy(col("fp"))))
      .withColumn("s3", col("s2") && col("doc_id") === col("keeper"))
      .withColumn("s4", col("s3") && col("hit").isNull)
    val agg = flagged.agg(
      count(lit(1)).as("d0"), sum(col("words").cast("long")).as("t0"),
      sum(when(col("s1"), 1L).otherwise(0L)).as("d1"),
      sum(when(col("s1"), col("words").cast("long")).otherwise(0L)).as("t1"),
      sum(when(col("s2"), 1L).otherwise(0L)).as("d2"),
      sum(when(col("s2"), col("words").cast("long")).otherwise(0L)).as("t2"),
      sum(when(col("s3"), 1L).otherwise(0L)).as("d3"),
      sum(when(col("s3"), col("words").cast("long")).otherwise(0L)).as("t3"),
      sum(when(col("s4"), 1L).otherwise(0L)).as("d4"),
      sum(when(col("s4"), col("words").cast("long")).otherwise(0L)).as("t4"))
    val st = (i: Int, name: String) => struct(lit(i.toLong).as("stage_idx"),
      lit(name).as("stage"), col(s"d$i").as("docs"), col(s"t$i").as("tokens"))
    agg.select(explode(array(st(0, "all"), st(1, "quality"),
        st(2, "gopher"), st(3, "exact_dedup"), st(4, "decontam"))).as("r"))
      .select(col("r.stage_idx").as("stage_idx"), col("r.stage").as("stage"),
        col("r.docs").as("docs"), col("r.tokens").as("tokens"))
      .orderBy(col("stage_idx"))
  }

  /** q194: NUMERIC-CLAIM EXTRACTION — quantities with units are the
    * fact-mining surface QA/grounding pipelines index ("3 million
    * users", "85 %", "120 km"): extract integer-magnitude claims and
    * normalize them to a base value in exact integer arithmetic.
    * Pattern (Java∩RE2): `\b(\d{1,9}) ?(%|percent|million|billion|
    * thousand|km|kg|people|years)\b` — group 1 the magnitude, group 2
    * the unit; `scaled` = magnitude × {thousand 10³, million 10⁶,
    * billion 10⁹, else 1}. Planted wires (q105 in-query construction)
    * give every 3rd doc two claims with deterministic magnitudes, so
    * the match walk, the zip by ordinal, and the scaling are all
    * exercised; fully oracled hash-exact.
    *
    * Scale shape: stateless per-row regex scan + one explode — no
    * shuffle before the ORDER BY.
    */
  def q194NumericClaims(s: SparkSession, dir: String): DataFrame = {
    val pat = "\\b(\\d{1,9}) ?(%|percent|million|billion|thousand|km|kg|people|years)\\b"
    tbl(s, dir, "documents")
      .withColumn("wire",
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(col("text"), lit(" the survey counted "),
            (col("doc_id") % 97 + 1).cast("string"),
            lit(" million people and a "),
            (col("doc_id") % 89 + 1).cast("string"),
            lit(" % rise.")))
          .otherwise(col("text")))
      .select(col("doc_id"),
        // Column-API regexp (NOT expr(): Spark SQL string literals eat
        // backslashes, silently corrupting \b/\d)
        posexplode(arrays_zip(
          regexp_extract_all(col("wire"), lit(pat), lit(1)),
          regexp_extract_all(col("wire"), lit(pat), lit(2)))).as(Seq("i", "m")))
      .select(col("doc_id"), (col("i") + 1).cast("long").as("cidx"),
        col("m").getField("0").cast("long").as("value"),
        col("m").getField("1").as("unit"))
      .withColumn("scaled", col("value") *
        when(col("unit") === "thousand", 1000L)
          .when(col("unit") === "million", 1000000L)
          .when(col("unit") === "billion", 1000000000L)
          .otherwise(1L))
      .orderBy(col("doc_id"), col("cidx"))
  }

  /** q192: SYNDICATION-LAG PROVENANCE — inside every exact-duplicate
    * cluster, who published first and how far the copies trail (the
    * news-wire question q180's keeper selection answers mechanically;
    * this is the accounting view an editor reads). Publication day is
    * the md5-derived deterministic surrogate (q105 idiom: first 4 hex
    * nibbles of md5(decimal doc_id) mod 30), and every 10th document
    * gets an in-query mirror copy (doc_id + 100000, source
    * `mirror-<src>`), so multi-copy clusters exist by construction in
    * BOTH engines. Reports, per cluster with ≥ 2 copies: copy/source
    * counts, the argmin-(day, doc_id) first copy, and the max lag.
    *
    * Scale shape: one digest-keyed shuffle (the q15/q180 discipline —
    * the text never travels beyond its md5), map-combined argmin/argmax
    * structs, no windows.
    */
  def q192SyndicationLag(s: SparkSession, dir: String): DataFrame = {
    val base = tbl(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val mirrors = base.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"),
        concat(lit("mirror-"), col("source")).as("source"))
    val day = (conv(substring(md5(col("doc_id").cast("string")
      .cast("binary")), 1, 4), 16, 10).cast("long") % 30).as("day")
    base.unionByName(mirrors)
      .select(col("doc_id"), col("source"), md5s(col("text")).as("fp"), day)
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("source")).as("n_sources"),
        min(struct(col("day"), col("doc_id"))).as("first"),
        (max(col("day")) - min(col("day"))).as("max_lag_days"))
      .where(col("n_copies") >= 2)
      .select(col("fp"), col("n_copies"), col("n_sources"),
        col("first.doc_id").as("first_doc"), col("first.day").as("first_day"),
        col("max_lag_days"))
      .orderBy(col("fp"))
  }

  /** q235: POSTING-LIST COMPRESSION ACCOUNTING — the d-gap + Elias-γ /
    * varint size model every inverted-index storage decision runs on
    * (Witten, Moffat & Bell, "Managing Gigabytes", ch. 3): per term the
    * doc-id postings (q97's index family) delta-encode as gaps
    * (first gap = doc_id + 1, so ids start anywhere ≥ 0), and each gap g
    * costs `2·bitlen(g) − 1` bits under Elias-γ or `8·⌈bitlen(g)/7⌉`
    * bits under LEB128 varint, vs the 32-bit fixed baseline. Rolled up
    * by df-octave (`bitlen(df) − 1`, the q211 staircase device): the
    * wins concentrate in the high-df octaves (stop-word lists have tiny
    * gaps), exactly the distribution that decides "compress postings or
    * don't build the index". Ratios reported as ×10000 bp of the fixed
    * baseline (both operands non-negative — div/floor identical).
    *
    * Shape: one explode → distinct (token, doc_id) → ONE token-keyed
    * window (the same shuffle that builds the index itself — this audit
    * is free if fused with q97) → vocabulary-sized term rollup → ≤64-row
    * octave rollup.
    */
  def q235PostingCompress(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val post = tbl(s, dir, "documents")
      .select(explode(tokens(col("text"))).as("tok"), col("doc_id"))
      .where(col("tok") =!= "")
      .distinct()
    val w = Window.partitionBy(col("tok")).orderBy(col("doc_id"))
    val gaps = post
      .withColumn("gap",
        coalesce(col("doc_id") - lag(col("doc_id"), 1).over(w),
          col("doc_id") + 1))
      .withColumn("bl", (length(bin(col("gap")))).cast("long"))
    val term = gaps.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"),
        sum(lit(2L) * col("bl") - 1L).as("gamma_bits"),
        sum(lit(8L) * expr("(bl + 6) div 7")).as("varint_bits"))
    term
      .withColumn("octave", (length(bin(col("df"))) - 1).cast("long"))
      .groupBy(col("octave"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("df")).as("n_postings"),
        sum(col("gamma_bits")).as("gamma_bits"),
        sum(col("varint_bits")).as("varint_bits"))
      .withColumn("fixed_bits", col("n_postings") * 32L)
      .withColumn("gamma_bp", expr("gamma_bits * 10000 div fixed_bits"))
      .withColumn("varint_bp", expr("varint_bits * 10000 div fixed_bits"))
      .select(col("octave"), col("n_terms"), col("n_postings"),
        col("gamma_bits"), col("varint_bits"), col("fixed_bits"),
        col("gamma_bp"), col("varint_bp"))
      .orderBy(col("octave"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q235_posting_compress" -> q235PostingCompress _,
    "q238_maxscore_audit" -> q238MaxscoreAudit _,
    "q239_gate_auc" -> q239GateAuc _,
    "q243_incremental_dedup" -> q243IncrementalDedup _,
    "q245_rrf_hybrid" -> q245RrfHybrid _,
    "q191_quote_attribution" -> q191QuoteAttribution _,
    "q192_syndication_lag" -> q192SyndicationLag _,
    "q193_idn_spoof" -> q193IdnSpoof _,
    "q194_numeric_claims" -> q194NumericClaims _,
    "q202_dispersion" -> q202Dispersion _,
    "q204_acronyms" -> q204Acronyms _,
    "q205_typosquat" -> q205Typosquat _,
    "q206_url_mentions" -> q206UrlMentions _,
    "q207_rag_chunks" -> q207RagChunks _,
    "q208_vocab_churn" -> q208VocabChurn _,
    "q209_mirror_sources" -> q209MirrorSources _,
    "q211_zipf_fit" -> q211ZipfFit _,
    "q212_lsh_quality" -> q212LshQuality _,
    "q213_shard_move_cost" -> q213ShardMoveCost _,
    "q214_split_contamination" -> q214SplitContamination _,
    "q215_dict_candidates" -> q215DictCandidates _,
    "q216_curation_funnel" -> q216CurationFunnel _,
    "q217_epoch_alloc" -> q217EpochAlloc _,
    "q219_hard_negatives" -> q219HardNegatives _,
    "q222_padding_waste" -> q222PaddingWaste _,
    "q223_lang_script_audit" -> q223LangScriptAudit _,
    "q227_containment_join" -> q227ContainmentJoin _,
    "q228_skew_report" -> q228SkewReport _,
    "q229_gate_agreement" -> q229GateAgreement _,
    "q230_dedup_roi" -> q230DedupRoi _,
    "q180_quality_keeper" -> q180QualityKeeper _,
    "q176_gale_church" -> q176GaleChurch _,
    "q177_dehyphenate" -> q177Dehyphenate _,
    "q178_homoglyph" -> q178Homoglyph _,
    "q175_bitext_mine" -> q175BitextMine _,
    "q172_repetition_loops" -> q172RepetitionLoops _,
    "q166_editdist_join" -> q166EditdistJoin _,
    "q167_collocations" -> q167Collocations _,
    "q109_train_shards" -> q109TrainShards _,
    "q104_cdc_dedup" -> q104CdcDedup _,
    "q80_langid_ngram" -> q80LangIdNgram _,
    "q15_dedup_exact" -> q15DedupExact _,
    "q16_token_stats" -> q16TokenStats _,
    "q17_quality_score" -> q17QualityScore _,
    "q75_compress_quality" -> q75CompressQuality _,
    "q18_lang_id" -> q18LangId _,
    "q19_fingerprint" -> q19Fingerprint _,
    "q20_ngram_jaccard" -> q20NgramJaccard _,
    "q21_minhash_sig" -> q21MinhashSig _,
    "q22_minhash_lsh" -> q22MinhashLsh _,
    "q23_simhash" -> q23Simhash _,
    "q41_simhash_pairs" -> q41SimhashPairs _,
    "q50_quality_gopher" -> q50QualityGopher _,
    "q51_corpus_kept" -> q51CorpusKept _,
    "q54_hash_split" -> q54HashSplit _,
    "q86_seq_pack" -> q86SeqPack _,
    "q138_sentence_chunks" -> q138SentenceChunks _,
    "q139_temperature_mix" -> q139TemperatureMix _,
    "q140_phrase_search" -> q140PhraseSearch _,
    "q87_hll_distinct" -> q87HllDistinct _,
    "q88_mixture_sample" -> q88MixtureSample _,
    "q90_gopher_battery" -> q90GopherBattery _,
    "q91_line_dedup" -> q91LineDedup _,
    "q156_host_boilerplate" -> q156HostBoilerplate _,
    "q158_code_switch" -> q158CodeSwitch _,
    "q162_kwic" -> q162Kwic _,
    "q92_bm25_topk" -> q92Bm25 _,
    "q93_bpe_train" -> BpeOps.q93BpeTrain _,
    "q97_inverted_index" -> q97InvertedIndex _,
    "q98_bpe_encode" -> BpeOps.q98BpeEncode _,
    "q221_fertility" -> BpeOps.q221Fertility _,
    "q99_exact_repeats" -> SuffixOps.q99ExactRepeats _,
    "q100_exactsubstr_cut" -> SuffixOps.q100ExactSubstrCut _,
    "q55_surprisal" -> q55Surprisal _,
    "q56_tfidf_top" -> q56TfidfTop _,
    "q57_bpe_tokens" -> q57BpeTokens _,
    "q58_winnow" -> q58Winnow _,
    "q60_decontaminate" -> q60Decontaminate _,
    "q101_contamination_frac" -> q101ContaminationFrac _,
    "q111_syndication" -> q111Syndication _,
    "q113_text_sanitize" -> q113TextSanitize _,
    "q151_pii_redact" -> q151PiiRedact _,
    "q114_exact_quantiles" -> q114ExactQuantiles _,
    "q115_vocab_growth" -> q115VocabGrowth _,
    "q116_prefix_join" -> q116PrefixJoin _,
    "q118_weighted_sample" -> q118WeightedSample _,
    "q122_keyword_stuffing" -> q122KeywordStuffing _,
    "q123_mojibake" -> q123Mojibake _,
    "q125_fuzzy_decontaminate" -> q125FuzzyDecontaminate _,
    "q63_winnow_pairs" -> q63WinnowPairs _,
    "q64_bloom_decontaminate" -> q64BloomDecontaminate _,
    "q65_nfc_normalize" -> q65NfcNormalize _,
    "q67_stratified_sample" -> q67StratifiedSample _,
    "q69_crawl_delta" -> q69CrawlDelta _,
    "q70_span_dedup" -> q70SpanDedup _,
    "q81_pii_redact" -> q81PiiRedact _,
    "q82_cms_heavy" -> q82CmsHeavy _,
    "q84_perplexity" -> q84Perplexity _,
  )

  private val dkTokens = """regexp_split_to_array(lower(trim(text)), '[ \t\n\f\r\x0B]+')"""
  private val dkBigrams =
    s"""list_distinct(list_transform(generate_series(1, len($dkTokens)-1),
       | i -> $dkTokens[i] || ' ' || $dkTokens[i+1]))""".stripMargin
  private val dkStop =
    s"""len(list_filter($dkTokens, x -> x IN ('the','a','of','and','to','in')))"""

  // q64 is the SAME decontamination contract as q60 behind a bloom
  // pre-filter with no false negatives, so both share one oracle
  /** The ev/evg/dg CTE block q60, q64 and q101 share. */
  private lazy val decontamCtes: String =
    s"""ev AS (
         |  SELECT doc_id AS eval_id,
         |    array_to_string(($dkTokens)[6:18], ' ') AS text
         |  FROM documents WHERE len($dkTokens) >= 40
         |  ORDER BY doc_id LIMIT 10),
         |evg AS (
         |  SELECT DISTINCT eval_id,
         |    md5(array_to_string((regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\f\\r\\x0B]+'))[p:p+12], ' ')) AS g
         |  FROM ev, unnest(generate_series(1,
         |    len(regexp_split_to_array(lower(trim(text)), '[ \\t\\n\\f\\r\\x0B]+')) - 12)) t(p)),
         |dg AS (
         |  SELECT DISTINCT doc_id,
         |    md5(array_to_string(($dkTokens)[p:p+12], ' ')) AS g
         |  FROM documents, unnest(generate_series(1, len($dkTokens) - 12)) t(p)
         |  WHERE len($dkTokens) >= 13)""".stripMargin

  private lazy val decontamOracleSql: String =
    s"""WITH $decontamCtes
         |SELECT dg.doc_id, evg.eval_id, COUNT(*) AS shared_grams
         |FROM dg JOIN evg ON dg.g = evg.g
         |GROUP BY dg.doc_id, evg.eval_id
         |ORDER BY dg.doc_id, evg.eval_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // q235: same distinct postings, same lag-window gaps, same bitlen
    // cost model and octave rollup (all operands non-negative)
    "q235_posting_compress" ->
      """WITH tk AS (
        |  SELECT DISTINCT
        |    unnest(regexp_split_to_array(lower(trim(text)),
        |      '[ \t\n\f\r\x0B]+')) AS tok, doc_id
        |  FROM documents),
        |g AS (
        |  SELECT tok,
        |    length(bin(COALESCE(doc_id - lag(doc_id) OVER
        |      (PARTITION BY tok ORDER BY doc_id), doc_id + 1))) AS bl
        |  FROM tk WHERE tok <> ''),
        |term AS (
        |  SELECT tok, COUNT(*) AS df, SUM(2 * bl - 1) AS gamma_bits,
        |    SUM(8 * ((bl + 6) // 7)) AS varint_bits
        |  FROM g GROUP BY tok),
        |oct AS (
        |  SELECT length(bin(df)) - 1 AS octave, COUNT(*) AS n_terms,
        |    SUM(df) AS n_postings, SUM(gamma_bits) AS gamma_bits,
        |    SUM(varint_bits) AS varint_bits
        |  FROM term GROUP BY 1)
        |SELECT CAST(octave AS BIGINT) AS octave,
        |  CAST(n_terms AS BIGINT) AS n_terms,
        |  CAST(n_postings AS BIGINT) AS n_postings,
        |  CAST(gamma_bits AS BIGINT) AS gamma_bits,
        |  CAST(varint_bits AS BIGINT) AS varint_bits,
        |  CAST(n_postings * 32 AS BIGINT) AS fixed_bits,
        |  CAST(gamma_bits * 10000 // (n_postings * 32) AS BIGINT) AS gamma_bp,
        |  CAST(varint_bits * 10000 // (n_postings * 32) AS BIGINT) AS varint_bp
        |FROM oct ORDER BY octave""".stripMargin,
    // q191: same wire construction, same two-group regex scan (group-2
    // tails cannot cross a quote char, so match order/extent agree)
    "q191_quote_attribution" -> {
      val pat = """"([^"]{10,200})"([^"]{0,40})"""
      s"""WITH w AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 4 = 0 THEN text || ' "planted quotation '
         |        || CAST(doc_id AS VARCHAR)
         |        || ' stands right here" the editor said afterwards.'
         |      WHEN doc_id % 4 = 1 THEN text
         |        || ' "unattributed planted quotation '
         |        || CAST(doc_id AS VARCHAR) || ' here" trailing words continue.'
         |      ELSE text END AS wire
         |  FROM documents),
         |q1 AS (SELECT doc_id,
         |    unnest(regexp_extract_all(wire, '$pat', 1)) AS quote,
         |    generate_subscripts(regexp_extract_all(wire, '$pat', 1), 1) AS qidx
         |  FROM w),
         |q2 AS (SELECT doc_id,
         |    unnest(regexp_extract_all(wire, '$pat', 2)) AS tail,
         |    generate_subscripts(regexp_extract_all(wire, '$pat', 2), 1) AS qidx
         |  FROM w)
         |SELECT q1.doc_id, CAST(q1.qidx AS BIGINT) AS qidx,
         |  md5(q1.quote) AS quote_md5,
         |  CAST(length(q1.quote) AS BIGINT) AS qlen,
         |  regexp_matches(q2.tail, '\\b(said|says|wrote|told)\\b') AS attributed
         |FROM q1 JOIN q2 ON q1.doc_id = q2.doc_id AND q1.qidx = q2.qidx
         |ORDER BY q1.doc_id, qidx""".stripMargin
    },
    // q215: same slice-built grams, same savings order, same LIMIT
    "q215_dict_candidates" ->
      s"""WITH t AS (SELECT $dkTokens AS t FROM documents),
         |g AS (SELECT array_to_string(t[p : p + 7], ' ') AS gram
         |  FROM (SELECT t, unnest(generate_series(1, len(t) - 7)) AS p
         |        FROM t WHERE len(t) >= 8)),
         |c AS (SELECT gram, COUNT(*) AS cnt FROM g GROUP BY gram
         |      HAVING COUNT(*) >= 3)
         |SELECT gram, cnt,
         |  CAST((cnt - 1) * length(gram) AS BIGINT) AS savings
         |FROM c ORDER BY savings DESC, gram LIMIT 20""".stripMargin,
    // q216: q17 + q50 + keeper-window + q60 derivations fused; the
    // funnel row set is a UNION ALL over one aggregate
    // q229: stripe-trained surprisal vs dup fraction; tau sign applied
    // outside the floor division (negative quotients diverge div vs //)
    "q229_gate_agreement" ->
      s"""WITH docs AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
         |tk AS (SELECT doc_id, unnest($dkTokens) AS tok FROM docs),
         |freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM tk GROUP BY tok),
         |tt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM freq),
         |x AS (SELECT doc_id,
         |    (100 * CAST(SUM(CAST(length(bin((SELECT total FROM tt)))
         |       - length(bin(cnt)) AS BIGINT)) AS BIGINT)) // COUNT(*) AS x
         |  FROM tk JOIN freq USING (tok) GROUP BY doc_id),
         |y AS (SELECT doc_id,
         |    (1000 * (CAST(len($dkTokens) AS BIGINT)
         |       - CAST(len(list_distinct($dkTokens)) AS BIGINT)))
         |      // CAST(len($dkTokens) AS BIGINT) AS y
         |  FROM docs),
         |d AS (SELECT x.doc_id, x.x, y.y FROM x JOIN y USING (doc_id)),
         |p AS (SELECT (a.x - b.x) * (a.y - b.y) AS prod,
         |    a.x = b.x AS tx, a.y = b.y AS ty
         |  FROM d a JOIN d b ON a.doc_id < b.doc_id),
         |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(SUM(CASE WHEN prod > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
         |  CAST(SUM(CASE WHEN prod < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
         |  CAST(SUM(CASE WHEN tx AND NOT ty THEN 1 ELSE 0 END) AS BIGINT) AS ties_x,
         |  CAST(SUM(CASE WHEN NOT tx AND ty THEN 1 ELSE 0 END) AS BIGINT) AS ties_y,
         |  CAST(SUM(CASE WHEN tx AND ty THEN 1 ELSE 0 END) AS BIGINT) AS ties_both
         |  FROM p)
         |SELECT n_pairs, concordant, discordant, ties_x, ties_y, ties_both,
         |  CASE WHEN concordant >= discordant
         |    THEN (1000 * (concordant - discordant)) // n_pairs
         |    ELSE -((1000 * (discordant - concordant)) // n_pairs)
         |  END AS tau_a_x1000
         |FROM g""".stripMargin,
    // q230: q20's pair join binned at 50-per-mille bands from 500
    "q230_dedup_roi" ->
      s"""WITH ex AS (
         |  SELECT doc_id, CAST(len($dkBigrams) AS BIGINT) AS n,
         |    unnest($dkBigrams) AS s
         |  FROM documents WHERE doc_id % 10 = 0),
         |p AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |    CAST(COUNT(*) AS BIGINT) AS inter,
         |    MAX(a.n) AS na, MAX(b.n) AS nb
         |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT (1000 * inter) // (na + nb - inter) AS jac_x1000,
         |    least(na, nb) AS mn
         |  FROM p WHERE (1000 * inter) // (na + nb - inter) >= 50)
         |SELECT least((jac_x1000 // 50) * 50, 950) AS band,
         |  CAST(COUNT(*) AS BIGINT) AS pairs,
         |  CAST(SUM(mn) AS BIGINT) AS est_removed_shingles_ub
         |FROM j GROUP BY 1 ORDER BY band""".stripMargin,
    // q228: one key count per family, top-10 by (rows desc, key)
    "q228_skew_report" ->
      s"""WITH tok AS (
         |  SELECT 'token' AS key_kind, unnest($dkTokens) AS k FROM documents),
         |bg AS (
         |  SELECT 'bigram' AS key_kind, unnest($dkBigrams) AS k FROM documents),
         |ub AS (
         |  SELECT 'url_bucket' AS key_kind,
         |    'b' || (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
         |      % 1024) AS k
         |  FROM documents),
         |a AS (SELECT * FROM tok UNION ALL SELECT * FROM bg
         |      UNION ALL SELECT * FROM ub),
         |per AS (SELECT key_kind, k, CAST(COUNT(*) AS BIGINT) AS rows
         |  FROM a GROUP BY 1, 2),
         |tot AS (SELECT key_kind, CAST(SUM(rows) AS BIGINT) AS t,
         |    CAST(COUNT(*) AS BIGINT) AS n_keys
         |  FROM per GROUP BY 1),
         |r AS (SELECT per.*, row_number() OVER (PARTITION BY key_kind
         |    ORDER BY rows DESC, k) AS rank FROM per)
         |SELECT r.key_kind, CAST(rank AS BIGINT) AS rank, k AS hot_key, rows,
         |  (10000 * rows) // t AS share_bp, n_keys, t AS total_rows
         |FROM r JOIN tot ON tot.key_kind = r.key_kind
         |WHERE rank <= 10 ORDER BY r.key_kind, rank""".stripMargin,
    // q227: q20's pair join + integer containment in both directions;
    // all operands positive so // and div agree
    "q227_containment_join" ->
      s"""WITH ex AS (
         |  SELECT doc_id, CAST(len($dkBigrams) AS BIGINT) AS n,
         |    unnest($dkBigrams) AS s
         |  FROM documents WHERE doc_id % 3 = 0),
         |p AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |    CAST(COUNT(*) AS BIGINT) AS inter,
         |    MAX(a.n) AS na, MAX(b.n) AS nb
         |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT a_id, b_id, inter, na, nb,
         |  (1000 * inter) // na AS cont_a_x1000,
         |  (1000 * inter) // nb AS cont_b_x1000,
         |  (1000 * inter) // (na + nb - inter) AS jac_x1000
         |FROM p
         |WHERE greatest((1000 * inter) // na, (1000 * inter) // nb) >= 600
         |ORDER BY a_id, b_id""".stripMargin,
    // q222: same global row_number batching, same waste algebra
    "q222_padding_waste" ->
      s"""WITH l AS (
         |  SELECT doc_id, CAST(len($dkTokens) AS BIGINT) AS n FROM documents),
         |t AS (
         |  SELECT n,
         |    (row_number() OVER (ORDER BY doc_id) - 1) // 16 AS b_arr,
         |    (row_number() OVER (ORDER BY n DESC, doc_id) - 1) // 16 AS b_srt
         |  FROM l),
         |arr AS (
         |  SELECT b_arr, COUNT(*) AS r, MAX(n) AS mx, SUM(n) AS used
         |  FROM t GROUP BY b_arr),
         |srt AS (
         |  SELECT b_srt, COUNT(*) AS r, MAX(n) AS mx, SUM(n) AS used
         |  FROM t GROUP BY b_srt),
         |s1 AS (
         |  SELECT 'arrival' AS strategy, CAST(COUNT(*) AS BIGINT) AS batches,
         |    CAST(SUM(used) AS BIGINT) AS tokens,
         |    CAST(SUM(r * mx) AS BIGINT) AS slots FROM arr),
         |s2 AS (
         |  SELECT 'length_sorted' AS strategy, CAST(COUNT(*) AS BIGINT) AS batches,
         |    CAST(SUM(used) AS BIGINT) AS tokens,
         |    CAST(SUM(r * mx) AS BIGINT) AS slots FROM srt),
         |u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
         |SELECT strategy, batches, tokens, slots,
         |  (1000 * (slots - tokens)) // slots AS waste_x1000
         |FROM u ORDER BY strategy""".stripMargin,
    // q223: char-level length()/regexp in both engines count codepoints
    "q223_lang_script_audit" ->
      """WITH d AS (
        |  SELECT lang, CAST(length(text) AS BIGINT) AS chars,
        |    CAST(length(regexp_replace(text, '[\x00-\x7F]', '', 'g'))
        |      AS BIGINT) AS non_ascii
        |  FROM documents),
        |m AS (
        |  SELECT lang,
        |    CASE WHEN lang = 'zh' THEN non_ascii = 0
        |         ELSE non_ascii * 2 > chars END AS mismatch
        |  FROM d)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs,
        |  CAST(SUM(CASE WHEN mismatch THEN 1 ELSE 0 END) AS BIGINT) AS mismatched,
        |  (10000 * CAST(SUM(CASE WHEN mismatch THEN 1 ELSE 0 END) AS BIGINT))
        |    // COUNT(*) AS mismatch_bp
        |FROM m GROUP BY lang ORDER BY lang""".stripMargin,
    // q219: q92's integer BM25 per (query, term); every division operand
    // positive so // and div agree; md5 dup guard on both sides
    "q219_hard_negatives" ->
      s"""WITH tk AS (SELECT doc_id, unnest($dkTokens) AS tok FROM documents),
         |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
         |       FROM tk GROUP BY doc_id),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(dl) AS BIGINT) // CAST(count(*) AS BIGINT) AS avgdl
         |       FROM dl),
         |qt0 AS (SELECT doc_id AS q_doc, tok, count(*) AS qtf FROM tk
         |       WHERE doc_id % 101 = 0
         |         AND tok NOT IN ('the','a','of','and','to','in')
         |       GROUP BY 1, 2),
         |qt AS (SELECT q_doc, tok FROM (
         |       SELECT *, row_number() OVER (PARTITION BY q_doc
         |         ORDER BY qtf DESC, tok) AS r FROM qt0) WHERE r <= 3),
         |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM tk
         |       WHERE tok IN (SELECT DISTINCT tok FROM qt)
         |       GROUP BY doc_id, tok),
         |dfs AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf
         |       GROUP BY tok),
         |fp AS (SELECT doc_id, md5(text) AS fp FROM documents),
         |sc AS (
         |  SELECT qt.q_doc, tf.doc_id,
         |    CAST(sum((CAST(length(bin((SELECT n_docs FROM st)))
         |       - length(bin(dfs.df)) AS BIGINT)
         |     * 22000 * tf.tf * (SELECT avgdl FROM st))
         |    // (10 * (SELECT avgdl FROM st) * tf.tf
         |        + 3 * (SELECT avgdl FROM st) + 9 * dl.dl)) AS BIGINT)
         |      AS score_x1000
         |  FROM tf JOIN qt USING (tok) JOIN dfs USING (tok)
         |    JOIN dl USING (doc_id)
         |  GROUP BY 1, 2),
         |cand AS (
         |  SELECT sc.* FROM sc
         |    JOIN fp c ON c.doc_id = sc.doc_id
         |    JOIN fp q ON q.doc_id = sc.q_doc
         |  WHERE sc.doc_id <> sc.q_doc AND c.fp <> q.fp)
         |SELECT q_doc, doc_id AS neg_doc, score_x1000, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_doc
         |    ORDER BY score_x1000 DESC, doc_id) AS rank FROM cand)
         |WHERE rank <= 5 ORDER BY q_doc, rank""".stripMargin,
    // q217: the whole waterfall is one cumulative window over the S-row
    // per-source table; every quantity integer (B = 5U div 2, 3n extra cap)
    "q217_epoch_alloc" ->
      s"""WITH l AS (
         |  SELECT source, CAST(len($dkTokens) AS BIGINT) AS tok_len
         |  FROM documents),
         |per AS (
         |  SELECT source, COUNT(*) AS docs,
         |    CAST(SUM(tok_len) AS BIGINT) AS toks,
         |    CAST((1000 * SUM(tok_len)) // COUNT(*) AS BIGINT) AS quality_x1000
         |  FROM l GROUP BY source),
         |u AS (SELECT CAST(SUM(toks) AS BIGINT) AS u_toks FROM per),
         |r AS (
         |  SELECT per.*, u_toks, (5 * u_toks) // 2 AS budget,
         |    row_number() OVER w AS rank,
         |    CAST(COALESCE(SUM(3 * toks) OVER (ORDER BY quality_x1000 DESC, source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |  FROM per, u
         |  WINDOW w AS (ORDER BY quality_x1000 DESC, source)),
         |x AS (
         |  SELECT r.*, greatest(0, least(budget - u_toks - cum_before,
         |    3 * toks)) AS extra FROM r)
         |SELECT source, docs, toks, quality_x1000, rank,
         |  CAST(1 + (extra // toks) AS BIGINT) AS epochs_full,
         |  CAST(((extra % toks) * 10000) // toks AS BIGINT) AS partial_bp,
         |  CAST(toks + extra AS BIGINT) AS toks_alloc
         |FROM x ORDER BY rank""".stripMargin,
    "q216_curation_funnel" ->
      s"""WITH t0 AS (SELECT doc_id, $dkTokens AS toks, md5(text) AS fp,
         |    CAST($dkStop AS BIGINT) AS stop_cnt FROM documents),
         |bg AS (SELECT doc_id, unnest(list_transform(
         |    generate_series(1, len(toks) - 1),
         |    i -> toks[i] || ' ' || toks[i + 1])) AS g FROM t0),
         |bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g),
         |md AS (SELECT doc_id, max(c) AS topc, sum(c) AS totc FROM bc
         |       GROUP BY doc_id),
         |hits AS (SELECT DISTINCT doc_id FROM ( $decontamOracleSql )),
         |f0 AS (SELECT t0.doc_id, t0.fp, CAST(len(toks) AS BIGINT) AS words,
         |    (len(toks) BETWEEN 20 AND 5000
         |      AND stop_cnt * 20 >= len(toks)) AS s1,
         |    (len(toks) BETWEEN 20 AND 5000
         |      AND stop_cnt * 20 >= len(toks)
         |      AND len(toks) >= 30
         |      AND round(1000.0 * (len(toks) - len(list_distinct(toks)))
         |            / len(toks)) <= 600
         |      AND round(1000.0 * md.topc / md.totc) <= 60) AS s2,
         |    (hits.doc_id IS NOT NULL) AS hit
         |  FROM t0 JOIN md ON t0.doc_id = md.doc_id
         |  LEFT JOIN hits ON t0.doc_id = hits.doc_id),
         |f1 AS (SELECT *,
         |    min(CASE WHEN s2 THEN doc_id END) OVER (PARTITION BY fp)
         |      AS keeper FROM f0),
         |f2 AS (SELECT *, (s2 AND doc_id = keeper) AS s3,
         |    (s2 AND doc_id = keeper AND NOT hit) AS s4 FROM f1),
         |a AS (SELECT COUNT(*) AS d0, SUM(words) AS t0w,
         |    SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS d1,
         |    SUM(CASE WHEN s1 THEN words ELSE 0 END) AS t1,
         |    SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS d2,
         |    SUM(CASE WHEN s2 THEN words ELSE 0 END) AS t2,
         |    SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS d3,
         |    SUM(CASE WHEN s3 THEN words ELSE 0 END) AS t3,
         |    SUM(CASE WHEN s4 THEN 1 ELSE 0 END) AS d4,
         |    SUM(CASE WHEN s4 THEN words ELSE 0 END) AS t4
         |  FROM f2)
         |SELECT * FROM (
         |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'all' AS stage,
         |    d0 AS docs, CAST(t0w AS BIGINT) AS tokens FROM a
         |  UNION ALL SELECT 1, 'quality', CAST(d1 AS BIGINT),
         |    CAST(t1 AS BIGINT) FROM a
         |  UNION ALL SELECT 2, 'gopher', CAST(d2 AS BIGINT),
         |    CAST(t2 AS BIGINT) FROM a
         |  UNION ALL SELECT 3, 'exact_dedup', CAST(d3 AS BIGINT),
         |    CAST(t3 AS BIGINT) FROM a
         |  UNION ALL SELECT 4, 'decontam', CAST(d4 AS BIGINT),
         |    CAST(t4 AS BIGINT) FROM a)
         |ORDER BY stage_idx""".stripMargin,
    // q212: q22's band-pair CTEs and q116's naive exact join fused on
    // the even-doc stripe, counted through one full-outer join
    "q212_lsh_quality" ->
      s"""WITH sh AS (SELECT doc_id, unnest($dkBigrams) AS s
         |  FROM documents WHERE doc_id % 2 = 0),
         |sig AS (SELECT doc_id,
         |   ${(0 until NumHashes).map(i => s"min(('0x' || substr(md5('$i|' || s),1,15))::BIGINT) AS h$i").mkString(",\n   ")}
         |  FROM sh GROUP BY doc_id),
         |bands AS (SELECT doc_id,
         |   md5(h0||'|'||h1||'|'||h2||'|'||h3) AS band0,
         |   md5(h4||'|'||h5||'|'||h6||'|'||h7) AS band1 FROM sig),
         |lsh AS (SELECT DISTINCT a_id, b_id FROM (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id FROM bands a
         |   JOIN bands b ON a.band0 = b.band0 AND a.doc_id < b.doc_id
         |  UNION ALL
         |  SELECT a.doc_id, b.doc_id FROM bands a
         |   JOIN bands b ON a.band1 = b.band1 AND a.doc_id < b.doc_id)),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |truth AS (SELECT a_id, b_id FROM inter
         |  JOIN sizes sa ON a_id = sa.doc_id
         |  JOIN sizes sb ON b_id = sb.doc_id
         |  WHERE CAST(round(1000.0*inter/(sa.n + sb.n - inter)) AS BIGINT)
         |    >= 500),
         |j AS (SELECT (l.a_id IS NOT NULL) AS in_l,
         |    (t.a_id IS NOT NULL) AS in_t
         |  FROM lsh l FULL OUTER JOIN truth t
         |    ON l.a_id = t.a_id AND l.b_id = t.b_id),
         |c AS (SELECT
         |    CAST(SUM(CASE WHEN in_l AND in_t THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(SUM(CASE WHEN in_l AND NOT in_t THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(SUM(CASE WHEN NOT in_l AND in_t THEN 1 ELSE 0 END) AS BIGINT) AS fn
         |  FROM j)
         |SELECT tp, fp, fn,
         |  CAST(CASE WHEN tp + fp > 0 THEN tp * 1000000 // (tp + fp)
         |       ELSE 0 END AS BIGINT) AS precision_x1e6,
         |  CAST(CASE WHEN tp + fn > 0 THEN tp * 1000000 // (tp + fn)
         |       ELSE 0 END AS BIGINT) AS recall_x1e6
         |FROM c""".stripMargin,
    // q213: q187's argmax tickets vs plain mod, one global count
    "q213_shard_move_cost" ->
      """WITH t AS (
        |  SELECT doc_id, g.s,
        |    md5(CAST(doc_id AS VARCHAR) || ':' || CAST(g.s AS VARCHAR))
        |      AS ticket
        |  FROM documents, generate_series(0, 10) AS g(s)),
        |r10 AS (SELECT doc_id, s AS shard10 FROM (
        |    SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY ticket DESC, s DESC) AS rn
        |    FROM t WHERE s < 10) WHERE rn = 1),
        |r11 AS (SELECT doc_id, s AS shard11 FROM (
        |    SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY ticket DESC, s DESC) AS rn
        |    FROM t) WHERE rn = 1),
        |d AS (SELECT r10.doc_id,
        |    (shard10 <> shard11) AS hrw_moved,
        |    (r10.doc_id % 10 <> r10.doc_id % 11) AS mod_moved
        |  FROM r10 JOIN r11 ON r10.doc_id = r11.doc_id),
        |c AS (SELECT COUNT(*) AS n_docs,
        |    CAST(SUM(CASE WHEN hrw_moved THEN 1 ELSE 0 END) AS BIGINT)
        |      AS hrw_moved,
        |    CAST(SUM(CASE WHEN mod_moved THEN 1 ELSE 0 END) AS BIGINT)
        |      AS mod_moved
        |  FROM d)
        |SELECT n_docs, hrw_moved, mod_moved,
        |  CAST(hrw_moved * 1000000 // n_docs AS BIGINT) AS hrw_rate_x1e6,
        |  CAST(mod_moved * 1000000 // n_docs AS BIGINT) AS mod_rate_x1e6
        |FROM c""".stripMargin,
    // q214: q54's split CASE + q60's full decontamination derivation as
    // a nested subquery, one 3-group rollup
    "q214_split_contamination" ->
      s"""WITH cont AS (
         |  SELECT DISTINCT doc_id FROM ( $decontamOracleSql )),
         |sp AS (SELECT doc_id,
         |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 80 THEN 'train'
         |         WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents)
         |SELECT sp.split, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN cont.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_contaminated
         |FROM sp LEFT JOIN cont ON sp.doc_id = cont.doc_id
         |GROUP BY sp.split ORDER BY sp.split""".stripMargin,
    // q209: same mirror plant, same within-fp pair counting
    "q209_mirror_sources" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text, 'mirror-' || source
        |  FROM documents WHERE doc_id % 10 = 0),
        |fps AS (SELECT DISTINCT source, md5(text) AS fp FROM all_docs),
        |tot AS (SELECT source, COUNT(*) AS n_fps FROM fps GROUP BY source),
        |p AS (SELECT x.source AS src_a, y.source AS src_b,
        |    COUNT(*) AS overlap
        |  FROM fps x JOIN fps y ON x.fp = y.fp AND x.source < y.source
        |  GROUP BY 1, 2)
        |SELECT p.src_a, p.src_b, CAST(p.overlap AS BIGINT) AS overlap,
        |  ta.n_fps AS fps_a, tb.n_fps AS fps_b,
        |  CAST(p.overlap * 1000000 // (ta.n_fps + tb.n_fps - p.overlap)
        |    AS BIGINT) AS jaccard_x1e6,
        |  (p.overlap * 1000000 // (ta.n_fps + tb.n_fps - p.overlap)
        |    >= 500000) AS mirror_pair
        |FROM p JOIN tot ta ON ta.source = p.src_a
        |JOIN tot tb ON tb.source = p.src_b
        |ORDER BY p.src_a, p.src_b""".stripMargin,
    // q211: same vocab-sized ranking, same octave bitlen staircase
    "q211_zipf_fit" ->
      """WITH tk AS (SELECT
        |    unnest(regexp_split_to_array(lower(trim(text)),
        |      '[ \t\n\f\r\x0B]+')) AS tok
        |  FROM documents),
        |freq AS (SELECT tok, COUNT(*) AS c FROM tk WHERE tok <> ''
        |         GROUP BY tok),
        |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rank
        |      FROM freq),
        |o AS (SELECT length(bin(rank)) - 1 AS octave, COUNT(*) AS n_types,
        |    SUM(length(bin(c))) AS bits_sum
        |  FROM r GROUP BY 1),
        |o2 AS (SELECT octave, n_types,
        |    bits_sum * 1000 // n_types AS mb FROM o)
        |SELECT CAST(octave AS BIGINT) AS octave, n_types,
        |  CAST(mb AS BIGINT) AS mean_bits_x1000,
        |  CAST(mb - coalesce(lag(mb) OVER (ORDER BY octave), mb) AS BIGINT)
        |    AS delta_x1000
        |FROM o2 ORDER BY octave""".stripMargin,
    // q207: same windows (generate_subscripts alignment via pos-free
    // list ops), same suffix-skip rule, same joined-slice md5
    "q207_rag_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)),
        |    '[ \t\n\f\r\x0B]+'), x -> x <> '') AS t
        |  FROM documents),
        |n AS (SELECT doc_id, t, len(t) AS n FROM t WHERE len(t) > 0),
        |k AS (SELECT doc_id, t, n, unnest(generate_series(0, (n - 1) // 48))
        |        AS k FROM n)
        |SELECT doc_id, CAST(k AS BIGINT) AS k,
        |  CAST(k * 48 AS BIGINT) AS start,
        |  CAST(least(k * 48 + 64, n) - k * 48 AS BIGINT) AS len,
        |  md5(array_to_string(t[k * 48 + 1 : least(k * 48 + 64, n)], ' '))
        |    AS chunk_md5
        |FROM k WHERE k = 0 OR (k - 1) * 48 + 64 < n
        |ORDER BY doc_id, k""".stripMargin,
    // q208: same parity halves, same conditional-count rollup
    "q208_vocab_churn" ->
      """WITH tk AS (SELECT source, doc_id % 2 = 0 AS in_a,
        |    unnest(regexp_split_to_array(lower(trim(text)),
        |      '[ \t\n\f\r\x0B]+')) AS tok
        |  FROM documents),
        |tt AS (SELECT source, tok,
        |    MAX(CASE WHEN in_a THEN 1 ELSE 0 END) AS a,
        |    MAX(CASE WHEN in_a THEN 0 ELSE 1 END) AS b
        |  FROM tk WHERE tok <> '' GROUP BY source, tok),
        |r AS (SELECT source, SUM(a) AS types_a, SUM(b) AS types_b,
        |    SUM(a * b) AS common FROM tt GROUP BY source)
        |SELECT source, CAST(types_a AS BIGINT) AS types_a,
        |  CAST(types_b AS BIGINT) AS types_b,
        |  CAST(types_a - common AS BIGINT) AS gone,
        |  CAST(types_b - common AS BIGINT) AS new_types,
        |  CAST(common * 1000000 // (types_a + types_b - common) AS BIGINT)
        |    AS jaccard_x1e6
        |FROM r ORDER BY source""".stripMargin,
    // q204: same greedy two-group scan, same slice/initials check
    "q204_acronyms" -> {
      val pat = """([a-z]+(?: [a-z]+){1,5}) \(([a-z]{2,6})\)"""
      s"""WITH w AS (
         |  SELECT doc_id, lower(CASE WHEN doc_id % 6 = 0
         |    THEN text || ' the world health organization (who) announced it.'
         |    WHEN doc_id % 6 = 1 THEN text || ' a big tent (abc) event happened.'
         |    ELSE text END) AS wire
         |  FROM documents),
         |q1 AS (SELECT doc_id,
         |    unnest(regexp_extract_all(wire, '$pat', 1)) AS def,
         |    generate_subscripts(regexp_extract_all(wire, '$pat', 1), 1) AS aidx
         |  FROM w),
         |q2 AS (SELECT doc_id,
         |    unnest(regexp_extract_all(wire, '$pat', 2)) AS acro,
         |    generate_subscripts(regexp_extract_all(wire, '$pat', 2), 1) AS aidx
         |  FROM w),
         |j AS (SELECT q1.doc_id, q1.aidx, q2.acro,
         |    regexp_split_to_array(q1.def, ' ') AS words, q1.def
         |  FROM q1 JOIN q2 ON q1.doc_id = q2.doc_id AND q1.aidx = q2.aidx)
         |SELECT doc_id, CAST(aidx AS BIGINT) AS aidx, acro,
         |  md5(def) AS def_md5,
         |  (len(words) >= length(acro) AND
         |   array_to_string(list_transform(
         |     words[len(words) - length(acro) + 1 : len(words)],
         |     x -> substr(x, 1, 1)), '') = acro) AS matched
         |FROM j ORDER BY doc_id, aidx""".stripMargin
    },
    // q205: same brand list, same unit-cost levenshtein bound
    "q205_typosquat" ->
      """WITH hosts AS (
        |  SELECT DISTINCT host FROM (
        |    SELECT 'host' || CAST((doc_id // 8) % 40 AS VARCHAR)
        |      || '.example.com' AS host FROM documents
        |    UNION ALL
        |    SELECT unnest(['payp4l.example.com','gogle.example.com',
        |      'mozila.example.com','paypal.example.com','zebra.example.com']))),
        |b AS (SELECT unnest(['paypal','google','mozilla','amazon']) AS brand),
        |l AS (SELECT host, string_split(host, '.')[1] AS label FROM hosts)
        |SELECT l.host, b.brand,
        |  CAST(levenshtein(l.label, b.brand) AS BIGINT) AS dist
        |FROM l, b
        |WHERE levenshtein(l.label, b.brand) <= 2 AND l.label <> b.brand
        |ORDER BY l.host, b.brand""".stripMargin,
    // q206: same host regex, same trailing ./- strip
    "q206_url_mentions" ->
      """WITH w AS (
        |  SELECT doc_id, CASE WHEN doc_id % 9 = 0
        |    THEN text || ' see https://cite1.example.org/a and http://cite2.example.net.'
        |    ELSE text END AS wire
        |  FROM documents),
        |h0 AS (SELECT doc_id,
        |    unnest(regexp_extract_all(lower(wire),
        |      'https?://([a-z0-9.-]+)', 1)) AS hraw
        |  FROM w),
        |h AS (SELECT doc_id, rtrim(hraw, '.-') AS host FROM h0)
        |SELECT host, COUNT(*) AS n_mentions,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM h GROUP BY host ORDER BY host""".stripMargin,
    // q202: same shares, same integer-div fixed point, same closed-form
    // absent-source fold
    "q202_dispersion" ->
      """WITH tk AS (SELECT source,
        |    unnest(regexp_split_to_array(lower(trim(text)),
        |      '[ \t\n\f\r\x0B]+')) AS tok
        |  FROM documents),
        |t2 AS (SELECT source, tok FROM tk WHERE tok <> ''),
        |st AS (SELECT source, COUNT(*) AS stot FROM t2 GROUP BY source),
        |tot AS (SELECT SUM(stot) AS t_all FROM st),
        |s6 AS (SELECT source, stot * 1000000 // (SELECT t_all FROM tot) AS e6
        |       FROM st),
        |s6t AS (SELECT SUM(e6) AS e6_all FROM s6),
        |ct AS (SELECT tok, source, COUNT(*) AS c FROM t2 GROUP BY tok, source),
        |freq AS (SELECT tok, SUM(c) AS cnt FROM ct GROUP BY tok
        |         HAVING SUM(c) >= 200),
        |j AS (SELECT ct.tok, freq.cnt,
        |    abs(ct.c * 1000000 // freq.cnt - s6.e6) AS a6, s6.e6
        |  FROM ct JOIN freq USING (tok) JOIN s6 USING (source))
        |SELECT tok, CAST(cnt AS BIGINT) AS cnt,
        |  CAST((SUM(a6) + (SELECT e6_all FROM s6t) - SUM(e6)) // 2 AS BIGINT)
        |    AS dp_x1e6
        |FROM j GROUP BY tok, cnt ORDER BY tok""".stripMargin,
    // q194: same wire, same two-group regex walk (DuckDB strings do not
    // process backslashes, so \b/\d pass through literally)
    "q194_numeric_claims" ->
      s"""WITH w AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 0 THEN text || ' the survey counted '
         |        || CAST(doc_id % 97 + 1 AS VARCHAR) || ' million people and a '
         |        || CAST(doc_id % 89 + 1 AS VARCHAR) || ' % rise.'
         |      ELSE text END AS wire
         |  FROM documents),
         |pt AS (SELECT '\\b(\\d{1,9}) ?(%|percent|million|billion|thousand|km|kg|people|years)\\b' AS p),
         |q1 AS (SELECT doc_id,
         |    unnest(regexp_extract_all(wire, (SELECT p FROM pt), 1)) AS v,
         |    generate_subscripts(regexp_extract_all(wire, (SELECT p FROM pt), 1), 1) AS cidx
         |  FROM w),
         |q2 AS (SELECT doc_id,
         |    unnest(regexp_extract_all(wire, (SELECT p FROM pt), 2)) AS unit,
         |    generate_subscripts(regexp_extract_all(wire, (SELECT p FROM pt), 2), 1) AS cidx
         |  FROM w)
         |SELECT q1.doc_id, CAST(q1.cidx AS BIGINT) AS cidx,
         |  CAST(q1.v AS BIGINT) AS value, q2.unit,
         |  CAST(q1.v AS BIGINT) * CASE q2.unit WHEN 'thousand' THEN 1000
         |    WHEN 'million' THEN 1000000 WHEN 'billion' THEN 1000000000
         |    ELSE 1 END AS scaled
         |FROM q1 JOIN q2 ON q1.doc_id = q2.doc_id AND q1.cidx = q2.cidx
         |ORDER BY q1.doc_id, cidx""".stripMargin,
    // q192: same mirror construction, md5-derived day, argmin-(day, id)
    // first copy via a per-cluster window
    "q192_syndication_lag" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text, 'mirror-' || source
        |  FROM documents WHERE doc_id % 10 = 0),
        |d AS (SELECT doc_id, source, md5(text) AS fp,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 30
        |      AS day
        |  FROM all_docs),
        |g AS (SELECT fp, COUNT(*) AS n_copies,
        |    COUNT(DISTINCT source) AS n_sources,
        |    MIN(day) AS min_day, MAX(day) AS max_day
        |  FROM d GROUP BY fp HAVING COUNT(*) >= 2),
        |f AS (SELECT fp, doc_id, day,
        |    row_number() OVER (PARTITION BY fp ORDER BY day, doc_id) AS rn
        |  FROM d)
        |SELECT g.fp, g.n_copies, g.n_sources, f.doc_id AS first_doc,
        |  CAST(f.day AS BIGINT) AS first_day,
        |  CAST(g.max_day - g.min_day AS BIGINT) AS max_lag_days
        |FROM g JOIN f ON f.fp = g.fp AND f.rn = 1
        |ORDER BY g.fp""".stripMargin,
    // q180: arg-max keeper via min_by/max_by-free sorted-struct trick in
    // DuckDB too (max of (n_chars, -doc_id) row)
    "q180_quality_keeper" ->
      """WITH g AS (
        |  SELECT md5(text) AS fp, doc_id, n_chars FROM documents),
        |k AS (SELECT fp, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY fp
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM g),
        |agg AS (SELECT fp, COUNT(*) AS dupes, SUM(n_chars) AS total_chars
        |  FROM g GROUP BY fp)
        |SELECT k.fp, k.doc_id AS keeper_id, k.n_chars AS keeper_chars,
        |  agg.dupes, CAST(agg.total_chars - k.n_chars AS BIGINT)
        |    AS removed_chars
        |FROM k JOIN agg USING (fp) WHERE k.rn = 1
        |ORDER BY fp""".stripMargin,
    // q178: same host derivation, confusable-skeleton translate, spoof
    // grouping, and ordered member list in DuckDB (both translates are
    // per-codepoint on BMP input).
    "q178_homoglyph" ->
      s"""WITH h AS (
         |  SELECT CASE WHEN doc_id % 7 = 0 THEN translate(
         |      'host' || CAST(CAST((doc_id - doc_id % 8) / 8 AS BIGINT) % 40 AS VARCHAR)
         |        || '.example.com', 'aceo', 'асео')
         |    ELSE 'host' || CAST(CAST((doc_id - doc_id % 8) / 8 AS BIGINT) % 40 AS VARCHAR)
         |        || '.example.com' END AS host
         |  FROM documents),
         |sk AS (SELECT host,
         |    translate(lower(host), '$ConfusableFrom', '$ConfusableTo') AS skeleton
         |  FROM h)
         |SELECT skeleton, count(DISTINCT host) AS n_variants,
         |  count(*) AS n_docs,
         |  string_agg(DISTINCT host, '|' ORDER BY host) AS hosts
         |FROM sk GROUP BY skeleton HAVING count(DISTINCT host) > 1
         |ORDER BY skeleton""".stripMargin,
    // q175: same URL synthesis + language-segment erasure + min-doc_id
    // representative + ratio-gated distinct-language self-join in DuckDB.
    "q175_bitext_mine" ->
      """WITH keyed AS (
        |  SELECT doc_id, lang, n_chars,
        |    regexp_replace(
        |      'https://w' ||
        |      CAST(CAST((doc_id - doc_id % 4) / 4 AS BIGINT) % 23 AS VARCHAR) ||
        |      '.example.org/' || lang || '/a/' ||
        |      CAST(CAST((doc_id - doc_id % 4) / 4 AS BIGINT) AS VARCHAR),
        |      '/(en|fr|es|de|zh)/', '/_/') AS key_url
        |  FROM documents),
        |pick AS (
        |  SELECT key_url, lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY key_url, lang ORDER BY doc_id) AS rn
        |  FROM keyed)
        |SELECT a.key_url, a.lang AS lang_a, b.lang AS lang_b,
        |  a.doc_id AS id_a, b.doc_id AS id_b,
        |  a.n_chars AS len_a, b.n_chars AS len_b
        |FROM pick a JOIN pick b
        |  ON a.key_url = b.key_url AND a.lang < b.lang
        |WHERE a.rn = 1 AND b.rn = 1
        |  AND a.n_chars >= 50 AND b.n_chars >= 50
        |  AND 2 * least(a.n_chars, b.n_chars) >= greatest(a.n_chars, b.n_chars)
        |ORDER BY a.key_url, lang_a, lang_b""".stripMargin,
    // identical slice cap, lag flags, and gaps-and-islands run-length;
    // DuckDB's zipped UNNEST pair reproduces posexplode's 0-based pos
    "q172_repetition_loops" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    UNNEST(generate_series(0, len(list_slice($dkTokens, 1, 2048))-1)) AS pos,
         |    UNNEST(list_slice($dkTokens, 1, 2048)) AS tok
         |  FROM documents),
         |lagd AS (SELECT doc_id, pos,
         |    tok = lag(tok, 1) OVER w AS f1,
         |    tok = lag(tok, 2) OVER w AS f2,
         |    tok = lag(tok, 3) OVER w AS f3
         |  FROM tk WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
         |fl AS (
         |  SELECT doc_id, 1 AS p, pos FROM lagd WHERE f1
         |  UNION ALL SELECT doc_id, 2, pos FROM lagd WHERE f2
         |  UNION ALL SELECT doc_id, 3, pos FROM lagd WHERE f3),
         |isl AS (SELECT doc_id, p,
         |    pos - row_number() OVER (PARTITION BY doc_id, p ORDER BY pos) AS g
         |  FROM fl),
         |run AS (SELECT doc_id, p, COUNT(*) AS run FROM isl GROUP BY doc_id, p, g),
         |mx AS (SELECT doc_id, p, max(run) AS mx FROM run GROUP BY doc_id, p),
         |agg AS (SELECT doc_id,
         |    CAST(coalesce(max(CASE WHEN p = 1 THEN mx END), 0) AS BIGINT) AS rep1,
         |    CAST(coalesce(max(CASE WHEN p = 2 THEN mx END), 0) AS BIGINT) AS rep2,
         |    CAST(coalesce(max(CASE WHEN p = 3 THEN mx END), 0) AS BIGINT) AS rep3
         |  FROM mx GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(rep1, 0) AS rep1, coalesce(rep2, 0) AS rep2,
         |  coalesce(rep3, 0) AS rep3,
         |  greatest(coalesce(rep1, 0), coalesce(rep2, 0), coalesce(rep3, 0)) AS max_run,
         |  greatest(coalesce(rep1, 0), coalesce(rep2, 0), coalesce(rep3, 0)) >= 12 AS looped
         |FROM documents d LEFT JOIN agg USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    // q166: the NAIVE all-pairs levenshtein join — hash equality vs the
    // deletion-neighborhood candidate path proves FastSS losslessness.
    "q166_editdist_join" ->
      s"""WITH base AS (
         |  SELECT doc_id, array_to_string(($dkTokens)[1:5], ' ') AS t
         |  FROM documents),
         |names AS (
         |  SELECT DISTINCT t FROM (
         |    SELECT t FROM base
         |    UNION ALL
         |    SELECT substr(t, 1, 3) || substr(t, 5) AS t
         |    FROM base WHERE doc_id % 7 = 0)
         |  WHERE length(t) >= 1)
         |SELECT a.t AS a_t, b.t AS b_t,
         |  CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
         |FROM names a JOIN names b ON a.t < b.t
         |WHERE levenshtein(a.t, b.t) <= 1
         |ORDER BY a_t, b_t""".stripMargin,
    "q167_collocations" ->
      s"""WITH docs AS (
         |  SELECT doc_id, text || CASE WHEN doc_id % 9 = 0
         |    THEN ' gradient descent converges rapidly' ELSE '' END AS text
         |  FROM documents),
         |tk AS (SELECT doc_id, $dkTokens AS ts FROM docs),
         |bg AS (
         |  SELECT unnest(list_transform(generate_series(1, len(ts)-1),
         |    i -> ts[i] || ' ' || ts[i+1])) AS bg
         |  FROM tk),
         |cbg AS (SELECT bg, COUNT(*) AS c_ab FROM bg GROUP BY bg),
         |cu AS (SELECT w, COUNT(*) AS c
         |       FROM (SELECT unnest(ts) AS w FROM tk) GROUP BY w),
         |n AS (SELECT COUNT(*) AS n_bg FROM bg)
         |SELECT bg, c_ab, ca.c AS c_a, cb.c AS c_b,
         |  CAST(length(bin(c_ab * n_bg)) - length(bin(ca.c * cb.c))
         |       AS BIGINT) AS pmi_bits
         |FROM cbg, n
         |JOIN cu ca ON ca.w = split_part(bg, ' ', 1)
         |JOIN cu cb ON cb.w = split_part(bg, ' ', 2)
         |WHERE c_ab >= 4
         |  AND length(bin(c_ab * n_bg)) - length(bin(ca.c * cb.c)) >= 2
         |ORDER BY pmi_bits DESC, bg""".stripMargin,
    "q109_train_shards" ->
      s"""WITH d AS (SELECT doc_id, CAST(len($dkTokens) AS BIGINT) AS tok_len,
         |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS h
         |  FROM documents),
         |bk AS (SELECT *, h % 64 AS b FROM d),
         |c AS (SELECT doc_id, tok_len, h, b,
         |    CAST(COALESCE(SUM(tok_len) OVER (ORDER BY b, h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |  FROM bk)
         |SELECT doc_id, tok_len, h, b, cum_before,
         |  CAST(cum_before // 2000 AS BIGINT) AS shard
         |FROM c ORDER BY doc_id""".stripMargin,
    "q15_dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keeper_id, COUNT(*) AS dupes
        |FROM documents GROUP BY md5(text) ORDER BY fp""".stripMargin,
    "q16_token_stats" ->
      s"""SELECT doc_id,
         | CAST(len($dkTokens) AS INT) AS n_tokens,
         | CAST(len(list_distinct($dkTokens)) AS INT) AS n_uniq,
         | CAST(length(text) AS INT) AS chars,
         | CAST(length(regexp_replace(text, '[ \\t\\n\\f\\r\\x0B]', '', 'g')) AS INT) AS chars_nows
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q17_quality_score" ->
      s"""SELECT doc_id,
         | CAST(len($dkTokens) AS INT) AS words,
         | CAST($dkStop AS INT) AS stop_cnt,
         | CAST(length(text) AS INT) AS chars,
         | (len($dkTokens) BETWEEN 20 AND 5000 AND $dkStop*20 >= len($dkTokens)) AS is_quality
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q18_lang_id" ->
      s"""SELECT doc_id, lang,
         | CASE WHEN len(regexp_extract_all(text, '[一-鿿]')) > 0 THEN 'cjk'
         |      WHEN $dkStop*100 >= len($dkTokens)*3 THEN 'en'
         |      ELSE 'other' END AS lang_guess
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q19_fingerprint" ->
      s"""SELECT doc_id,
         | md5(lower(regexp_replace(trim(text), '[ \\t\\n\\f\\r\\x0B]+', ' ', 'g'))) AS fp,
         | md5(array_to_string(list_sort(list_distinct($dkTokens)), ' ')) AS tok_fp
         |FROM documents ORDER BY doc_id""".stripMargin,
    // SUM over a window of BIGINT is HUGEINT in DuckDB — cast back so the
    // pandas dtype matches Spark's long (the q01 gotcha, window flavor)
    "q122_keyword_stuffing" ->
      s"""WITH tf AS (
         |  SELECT doc_id, t AS term, COUNT(*) AS cnt
         |  FROM (SELECT doc_id, unnest($dkTokens) AS t FROM documents)
         |  GROUP BY 1, 2)
         |SELECT doc_id, term AS top_term, cnt AS top_cnt,
         |  CAST(SUM(cnt) OVER (PARTITION BY doc_id) AS BIGINT) AS n_tokens,
         |  cnt*100 >= CAST(SUM(cnt) OVER (PARTITION BY doc_id) AS BIGINT)*20 AS stuffed
         |FROM tf
         |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, term ASC) = 1
         |ORDER BY doc_id""".stripMargin,
    "q116_prefix_join" ->
      s"""WITH sh AS (SELECT doc_id, unnest($dkBigrams) AS s FROM documents),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT a_id, b_id, inter,
         | CAST(round(1000.0*inter/(sa.n + sb.n - inter)) AS BIGINT) AS jac_x1000
         |FROM inter JOIN sizes sa ON a_id = sa.doc_id
         | JOIN sizes sb ON b_id = sb.doc_id
         |WHERE CAST(round(1000.0*inter/(sa.n + sb.n - inter)) AS BIGINT) >= 500
         |ORDER BY a_id, b_id""".stripMargin,
    "q20_ngram_jaccard" ->
      s"""WITH sh AS (
         |  SELECT doc_id, unnest($dkBigrams) AS s
         |  FROM documents WHERE doc_id % 10 = 0),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT a_id, b_id, inter,
         | CAST(round(1000.0*inter/(sa.n + sb.n - inter)) AS BIGINT) AS jac_x1000
         |FROM inter JOIN sizes sa ON a_id = sa.doc_id
         | JOIN sizes sb ON b_id = sb.doc_id
         |WHERE CAST(round(1000.0*inter/(sa.n + sb.n - inter)) AS BIGINT) >= 60
         |ORDER BY a_id, b_id""".stripMargin,
    "q21_minhash_sig" ->
      s"""WITH sh AS (SELECT doc_id, unnest($dkBigrams) AS s FROM documents)
         |SELECT doc_id,
         | ${(0 until NumHashes).map(i => s"min(('0x' || substr(md5('$i|' || s),1,15))::BIGINT) AS h$i").mkString(",\n ")}
         |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q22_minhash_lsh" ->
      s"""WITH sh AS (SELECT doc_id, unnest($dkBigrams) AS s FROM documents),
         |sig AS (SELECT doc_id,
         |   ${(0 until NumHashes).map(i => s"min(('0x' || substr(md5('$i|' || s),1,15))::BIGINT) AS h$i").mkString(",\n   ")}
         |  FROM sh GROUP BY doc_id),
         |bands AS (SELECT doc_id,
         |   md5(h0||'|'||h1||'|'||h2||'|'||h3) AS band0,
         |   md5(h4||'|'||h5||'|'||h6||'|'||h7) AS band1 FROM sig)
         |SELECT DISTINCT a_id, b_id FROM (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id FROM bands a
         |   JOIN bands b ON a.band0 = b.band0 AND a.doc_id < b.doc_id
         |  UNION ALL
         |  SELECT a.doc_id, b.doc_id FROM bands a
         |   JOIN bands b ON a.band1 = b.band1 AND a.doc_id < b.doc_id)
         |ORDER BY a_id, b_id""".stripMargin,
    "q41_simhash_pairs" ->
      s"""WITH toks AS (
         |  SELECT doc_id, md5(unnest(list_distinct($dkTokens))) AS h FROM documents),
         |sw AS (
         |  SELECT doc_id, b,
         |   SUM(2 * ((strpos('0123456789abcdef', substr(h, b//4+1, 1))-1 >> (b%4)) & 1) - 1) AS sw
         |  FROM toks, generate_series(0,${SimBits - 1}) t(b) GROUP BY doc_id, b),
         |bands AS (
         |  SELECT doc_id, b//$SimBandBits AS band_idx,
         |   CAST(SUM(CASE WHEN sw > 0 THEN 1<<(b%$SimBandBits) ELSE 0 END) AS BIGINT) AS bv
         |  FROM sw GROUP BY doc_id, b//$SimBandBits),
         |sig AS (
         |  SELECT doc_id,
         |   ${(0 until SimBands).map(k => s"CAST(SUM(CASE WHEN band_idx = $k THEN bv ELSE 0 END) AS BIGINT) AS s$k").mkString(",\n   ")}
         |  FROM bands GROUP BY doc_id),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.bv = b.bv AND a.doc_id < b.doc_id)
         |SELECT a_id, b_id,
         | CAST(${(0 until SimBands).map(k => s"bit_count(xor(sa.s$k, sb.s$k))").mkString(" + ")} AS BIGINT) AS ham,
         | CAST(${(0 until SimBands).map(k => s"bit_count(xor(sa.s$k, sb.s$k))").mkString(" + ")} AS BIGINT) <= 3 AS is_near
         |FROM pairs JOIN sig sa ON a_id = sa.doc_id JOIN sig sb ON b_id = sb.doc_id
         |ORDER BY a_id, b_id""".stripMargin,
    "q50_quality_gopher" ->
      s"""WITH t AS (SELECT doc_id, $dkTokens AS toks,
         |   length(regexp_replace(text, '[ \\t\\n\\f\\r\\x0B]', '', 'g')) AS cnw FROM documents),
         |bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)-1),
         |   i -> toks[i] || ' ' || toks[i+1])) AS g FROM t),
         |bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g),
         |top AS (SELECT doc_id, max(c) AS topc, sum(c) AS totc FROM bc GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(toks) AS INT) AS words,
         | CAST(round(1000.0*(len(toks)-len(list_distinct(toks)))/len(toks)) AS BIGINT) AS dup_tok_x1000,
         | CAST(round(1000.0*topc/totc) AS BIGINT) AS top_bigram_x1000,
         | CAST(round(100.0*cnw/len(toks)) AS BIGINT) AS mean_wlen_x100,
         | (len(toks) >= 30
         |  AND round(1000.0*(len(toks)-len(list_distinct(toks)))/len(toks)) <= 600
         |  AND round(1000.0*topc/totc) <= 60) AS keep
         |FROM t JOIN top ON t.doc_id = top.doc_id ORDER BY t.doc_id""".stripMargin,
    "q51_corpus_kept" ->
      s"""WITH d AS (SELECT doc_id, lang, source, n_chars,
         |  (len($dkTokens) BETWEEN 20 AND 5000 AND $dkStop*20 >= len($dkTokens)) AS is_quality,
         |  min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
         | FROM documents)
         |SELECT lang, source, COUNT(*) AS n_docs,
         | CAST(SUM(CASE WHEN doc_id = keeper AND is_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         | CAST(SUM(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_dropped,
         | CAST(SUM(CASE WHEN doc_id = keeper AND NOT is_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_lowq_dropped,
         | CAST(SUM(CASE WHEN doc_id = keeper AND is_quality THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
         |FROM d GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "q54_hash_split" ->
      """SELECT doc_id,
        | ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 AS bucket,
        | CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 80 THEN 'train'
        |      WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 90 THEN 'val'
        |      ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    // same top-3 derivation (count desc, phrase — a total order), then
    // position-adjacency matching; Spark's posexplode is 0-based so the
    // oracle's generate_subscripts shifts by one
    "q140_phrase_search" ->
      s"""WITH tk AS (SELECT doc_id, unnest($dkTokens) AS tok,
         |            generate_subscripts($dkTokens, 1) - 1 AS pos
         |            FROM documents),
         |bg AS (SELECT a.tok || ' ' || b.tok AS phrase, COUNT(*) AS cnt
         |       FROM tk a JOIN tk b
         |         ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |       GROUP BY 1),
         |top3 AS (SELECT phrase FROM bg ORDER BY cnt DESC, phrase LIMIT 3),
         |hits AS (SELECT t.phrase, x.doc_id, x.pos
         |         FROM top3 t
         |         JOIN tk x ON x.tok = string_split(t.phrase, ' ')[1]
         |         JOIN tk y ON y.doc_id = x.doc_id AND y.pos = x.pos + 1
         |                  AND y.tok = string_split(t.phrase, ' ')[2])
         |SELECT phrase, doc_id, CAST(COUNT(*) AS BIGINT) AS occurrences,
         |  CAST(MIN(pos) AS BIGINT) AS first_pos
         |FROM hits GROUP BY phrase, doc_id ORDER BY phrase, doc_id""".stripMargin,
    // exact isqrt both sides (double-sqrt floor + ±1 integer correction),
    // basis-point rates by integer floor division — every row hash-exact
    "q139_temperature_mix" ->
      s"""WITH l AS (SELECT doc_id, source,
         |  CAST(len($dkTokens) AS BIGINT) AS tok_len FROM documents),
         |p AS (SELECT source, CAST(SUM(tok_len) AS BIGINT) AS toks
         |      FROM l GROUP BY source),
         |w0 AS (SELECT source, toks,
         |       CAST(floor(sqrt(CAST(toks AS DOUBLE))) AS BIGINT) AS r0 FROM p),
         |w1 AS (SELECT source, toks,
         |       r0 - (CASE WHEN r0*r0 > toks THEN 1 ELSE 0 END)
         |          + (CASE WHEN (r0+1)*(r0+1) <= toks THEN 1 ELSE 0 END) AS w
         |       FROM w0),
         |ws AS (SELECT CAST(SUM(w) AS BIGINT) AS wsum FROM w1),
         |r AS (SELECT source, toks, w,
         |      least(10000, (CAST(10000 AS BIGINT) * CAST(15000 AS BIGINT) * w)
         |        // ((SELECT wsum FROM ws) * toks)) AS rate_bp FROM w1),
         |k AS (SELECT l.doc_id, l.source, l.tok_len, r.toks, r.w, r.rate_bp,
         |      (('0x' || substr(md5(CAST(l.doc_id AS VARCHAR)), 1, 4))::BIGINT
         |        % 10000) < r.rate_bp AS kept
         |      FROM l JOIN r USING (source))
         |SELECT source, toks, w, CAST(rate_bp AS BIGINT) AS rate_bp,
         |  CAST(COUNT(*) AS BIGINT) AS docs,
         |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
         |  CAST(SUM(CASE WHEN kept THEN tok_len ELSE 0 END) AS BIGINT) AS kept_tokens
         |FROM k GROUP BY source, toks, w, rate_bp ORDER BY source""".stripMargin,
    // the oracle replays the greedy fold as a recursive CTE over
    // (doc, sentence-index) — per-chunk md5 of the string_agg rebuild
    // pins boundary placement and text integrity in one hash
    "q138_sentence_chunks" ->
      """WITH RECURSIVE
        |sp AS (SELECT doc_id,
        |         regexp_split_to_array(trim(text), '[ \t\n\f\r\x0B]+') AS tks,
        |         CAST(doc_id % 37 + 3 AS INT) AS g FROM documents),
        |s0 AS (SELECT doc_id, list_transform(
        |         generate_series(0, CAST(floor((len(tks)-1.0)/g) AS INT)),
        |         k -> array_to_string(tks[k*g+1 : k*g+g], ' ')) AS arr
        |       FROM sp),
        |t AS (SELECT doc_id, unnest(arr) AS sent,
        |             generate_subscripts(arr, 1) AS i FROM s0),
        |tk AS (SELECT doc_id, i, sent,
        |       CAST(len(regexp_split_to_array(trim(sent), '[ \t\n\f\r\x0B]+')) AS BIGINT) AS tk
        |       FROM t),
        |r(doc_id, i, chunk, run) AS (
        |  SELECT doc_id, i, CAST(0 AS BIGINT), tk FROM tk WHERE i = 1
        |  UNION ALL
        |  SELECT tk.doc_id, tk.i,
        |    CASE WHEN r.run + tk.tk > 32 THEN r.chunk + 1 ELSE r.chunk END,
        |    CASE WHEN r.run + tk.tk > 32 THEN tk.tk ELSE r.run + tk.tk END
        |  FROM r JOIN tk ON tk.doc_id = r.doc_id AND tk.i = r.i + 1)
        |SELECT r.doc_id, r.chunk,
        |  CAST(COUNT(*) AS BIGINT) AS n_sents,
        |  CAST(SUM(tk.tk) AS BIGINT) AS chunk_tokens,
        |  md5(string_agg(tk.sent, '. ' ORDER BY tk.i)) AS text_md5
        |FROM r JOIN tk ON tk.doc_id = r.doc_id AND tk.i = r.i
        |GROUP BY r.doc_id, r.chunk
        |ORDER BY r.doc_id, r.chunk""".stripMargin,
    "q86_seq_pack" ->
      s"""WITH l AS (
         |  SELECT doc_id, CAST(len($dkTokens) AS BIGINT) AS tok_len
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, tok_len,
         |    CAST(sum(tok_len) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok_len
         |      AS BIGINT) AS start_off
         |  FROM l)
         |SELECT doc_id, tok_len, start_off,
         |  CAST(start_off // 512 AS BIGINT) AS first_seq,
         |  CAST(CASE WHEN tok_len > 0 THEN (start_off + tok_len - 1) // 512
         |       ELSE start_off // 512 END AS BIGINT) AS last_seq,
         |  CAST(CASE WHEN tok_len > 0
         |       THEN (CASE WHEN tok_len > 0 THEN (start_off + tok_len - 1) // 512
         |                  ELSE start_off // 512 END) - start_off // 512 + 1
         |       ELSE 0 END AS BIGINT) AS n_seqs
         |FROM c ORDER BY doc_id""".stripMargin,
    "q88_mixture_sample" ->
      s"""WITH l AS (
         |  SELECT doc_id, source, CAST(len($dkTokens) AS BIGINT) AS tok_len
         |  FROM documents),
         |t AS (
         |  SELECT source, CAST(sum(tok_len) AS BIGINT) AS toks,
         |    (CAST(substr(source, 4) AS INT) % 4) + 1 AS w
         |  FROM l GROUP BY source),
         |s AS (SELECT CAST(sum(w) AS BIGINT) AS wsum FROM t),
         |r AS (
         |  SELECT source,
         |    CAST(least(10000, (200000::BIGINT * w * 10000) // ((SELECT wsum FROM s) * toks))
         |      AS BIGINT) AS rate_bp
         |  FROM t)
         |SELECT l.doc_id, l.source, l.tok_len,
         |  ('0x' || substr(md5(CAST(l.doc_id AS VARCHAR)), 1, 4))::BIGINT % 10000 AS bucket,
         |  r.rate_bp,
         |  (('0x' || substr(md5(CAST(l.doc_id AS VARCHAR)), 1, 4))::BIGINT % 10000) < r.rate_bp AS keep
         |FROM l JOIN r USING (source) ORDER BY doc_id""".stripMargin,
    "q90_gopher_battery" ->
      s"""WITH b AS (
         |  SELECT doc_id, $dkTokens AS t, CAST(doc_id % 4 AS INT) AS cls
         |  FROM documents),
         |ln AS (
         |  SELECT doc_id,
         |    list_transform(generate_series(0, CAST((len(t)+7)//8 AS INT)-1),
         |      i -> CASE cls
         |        WHEN 1 THEN array_to_string(t[i*8+1:i*8+8], ' ') || ' ####'
         |        WHEN 2 THEN '- ' || array_to_string(t[i*8+1:i*8+8], ' ')
         |        WHEN 3 THEN array_to_string(t[i*8+1:i*8+8], ' ') || ' ...'
         |        ELSE array_to_string(t[i*8+1:i*8+8], ' ') END) AS lines
         |  FROM b),
         |m AS (
         |  SELECT doc_id, lines, array_to_string(lines, chr(10)) AS wire,
         |    regexp_split_to_array(array_to_string(lines, chr(10)),
         |      '[ \\t\\n\\f\\r\\x0B]+') AS wt
         |  FROM ln),
         |r AS (
         |  SELECT doc_id,
         |    CAST(len(wt) AS BIGINT) AS words,
         |    (CAST(length(regexp_replace(wire, '[ \\t\\n\\f\\r\\x0B]+', '', 'g'))
         |       AS BIGINT) * 100) // len(wt) AS mean_wlen_x100,
         |    (CAST(length(wire) - length(regexp_replace(wire, '[#…]', '', 'g'))
         |       AS BIGINT) * 1000) // len(wt) AS symbol_x1000,
         |    (CAST(len(list_filter(lines, l -> starts_with(l, '- ')
         |       OR starts_with(l, '* ') OR starts_with(l, '• ')))
         |       AS BIGINT) * 1000) // len(lines) AS bullet_x1000,
         |    (CAST(len(list_filter(lines, l -> ends_with(l, '...')
         |       OR ends_with(l, '…'))) AS BIGINT) * 1000) // len(lines)
         |       AS ellipsis_x1000,
         |    (CAST(len(list_filter(wt, x -> regexp_matches(x, '[a-z]')))
         |       AS BIGINT) * 1000) // len(wt) AS alpha_x1000,
         |    CAST(len(list_filter(wt,
         |       x -> x IN ('the','a','of','and','to','in'))) AS BIGINT)
         |       AS stop_cnt
         |  FROM m)
         |SELECT *,
         |  (words BETWEEN 50 AND 100000 AND mean_wlen_x100 BETWEEN 300 AND 1000
         |   AND symbol_x1000 <= 100 AND bullet_x1000 <= 900
         |   AND ellipsis_x1000 <= 300 AND alpha_x1000 >= 800
         |   AND stop_cnt >= 2) AS keep
         |FROM r ORDER BY doc_id""".stripMargin,
    "q91_line_dedup" ->
      s"""WITH b AS (SELECT doc_id, $dkTokens AS t FROM documents),
         |ln AS (
         |  SELECT doc_id,
         |    list_transform(generate_series(0, CAST((len(t)+5)//6 AS INT)-1),
         |      i -> array_to_string(t[(i%5)*6+1:(i%5)*6+6], ' ')) AS lines
         |  FROM b),
         |ex AS (
         |  SELECT doc_id, UNNEST(generate_series(1, len(lines))) AS pos,
         |    UNNEST(lines) AS line
         |  FROM ln),
         |k AS (
         |  SELECT doc_id, pos, line,
         |    min(pos) OVER (PARTITION BY doc_id, line) AS first_pos
         |  FROM ex)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(sum(CASE WHEN pos = first_pos THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  md5(string_agg(CASE WHEN pos = first_pos THEN line END, chr(10)
         |    ORDER BY pos)) AS rebuilt_fp
         |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q156_host_boilerplate" ->
      s"""WITH b AS (SELECT doc_id, source, $dkTokens AS t FROM documents),
         |d0 AS (
         |  SELECT doc_id, source,
         |    (CASE WHEN doc_id % 4 <> 3
         |          THEN ['we use cookies on ' || source] ELSE [] END) ||
         |    (CASE WHEN doc_id % 11 = 0
         |          THEN ['weekly promo at ' || source] ELSE [] END) ||
         |    list_transform(generate_series(0, CAST((len(t)+5)//6 AS INT)-1),
         |      i -> array_to_string(t[i*6+1:i*6+6], ' ')) AS lines
         |  FROM b),
         |ex AS (SELECT doc_id, source, UNNEST(lines) AS line FROM d0),
         |df AS (SELECT source, line, COUNT(DISTINCT doc_id) AS d
         |       FROM ex GROUP BY 1, 2),
         |sd AS (SELECT source, COUNT(*) AS nd FROM d0 GROUP BY 1),
         |bo AS (SELECT source, list_sort(list(line)) AS bl
         |       FROM df JOIN sd USING (source)
         |       WHERE d >= 3 AND d * 10 >= 6 * nd GROUP BY 1),
         |k AS (SELECT doc_id, lines, COALESCE(bl, []) AS bl
         |      FROM d0 LEFT JOIN bo USING (source)),
         |f AS (SELECT doc_id, lines,
         |        list_filter(lines, x -> NOT list_contains(bl, x)) AS kept
         |      FROM k)
         |SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
         |  CAST(len(lines) - len(kept) AS BIGINT) AS n_dropped,
         |  md5(array_to_string(kept, chr(10))) AS rebuilt_fp
         |FROM f ORDER BY doc_id""".stripMargin,
    "q158_code_switch" ->
      """WITH w0 AS (
        |  SELECT doc_id, lower(trim(text)) ||
        |    CASE WHEN doc_id % 6 = 0 THEN repeat(' 汉字', 40) ELSE '' END AS wire
        |  FROM documents),
        |tk AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(wire, '[ \t\n\f\r\x0B]+') AS t
        |  FROM w0),
        |lb AS (
        |  SELECT doc_id, list_transform(
        |    generate_series(0, CAST(len(t)//30 AS INT)-1),
        |    i -> CASE
        |      WHEN regexp_matches(array_to_string(t[i*30+1:i*30+30], ' '),
        |        '[一-鿿]') THEN 'cjk'
        |      WHEN len(list_filter(t[i*30+1:i*30+30],
        |        x -> list_contains(['the','a','of','and','to','in'], x)))
        |        * 100 >= 90 THEN 'en'
        |      ELSE 'other' END) AS ls
        |  FROM tk WHERE len(t) >= 60),
        |c AS (SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_win,
        |  CAST(len(list_filter(ls, x -> x = 'cjk')) AS BIGINT) AS n_cjk,
        |  CAST(len(list_filter(ls, x -> x = 'en')) AS BIGINT) AS n_en,
        |  CAST(len(list_filter(ls, x -> x = 'other')) AS BIGINT) AS n_other
        |  FROM lb)
        |SELECT doc_id, n_win,
        |  CASE WHEN n_cjk >= n_en AND n_cjk >= n_other THEN 'cjk'
        |       WHEN n_en >= n_other THEN 'en' ELSE 'other' END AS major_lang,
        |  greatest(n_cjk, n_en, n_other) AS n_major,
        |  (n_win - greatest(n_cjk, n_en, n_other)) * CAST(10000 AS BIGINT)
        |    // n_win AS switch_bp
        |FROM c ORDER BY doc_id""".stripMargin,
    "q162_kwic" ->
      s"""WITH tk AS (SELECT doc_id, $dkTokens AS t FROM documents),
         |e AS (SELECT doc_id, t, unnest(['dup', 'line', 'query']) AS term
         |      FROM tk),
         |p AS (SELECT doc_id, term, t, list_position(t, term) AS pos FROM e)
         |SELECT doc_id, term, CAST(pos AS BIGINT) AS pos,
         |  array_to_string(t[greatest(1, pos - 3):greatest(1, pos - 3) + 6],
         |    ' ') AS snippet
         |FROM p WHERE pos IS NOT NULL AND pos > 0
         |ORDER BY doc_id, term""".stripMargin,
    // q238: q92's exact-integer BM25 CTEs + the MaxScore upper-bound /
    // k-th-score-threshold accounting (all operands non-negative)
    "q238_maxscore_audit" ->
      s"""WITH tk AS (SELECT doc_id, unnest($dkTokens) AS tok FROM documents),
         |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
         |       FROM tk GROUP BY doc_id),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(dl) AS BIGINT) // CAST(count(*) AS BIGINT) AS avgdl
         |       FROM dl),
         |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM tk
         |       WHERE tok IN ('dup','line','query') GROUP BY doc_id, tok),
         |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
         |sc AS (
         |  SELECT tf.doc_id, tf.tok,
         |    (CAST(length(bin((SELECT n_docs FROM st)))
         |       - length(bin(df.df)) AS BIGINT)
         |     * 22000 * tf.tf * (SELECT avgdl FROM st))
         |    // (10 * (SELECT avgdl FROM st) * tf.tf
         |        + 3 * (SELECT avgdl FROM st) + 9 * dl.dl) AS term_score
         |  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id)),
         |ub AS (SELECT tok, MAX(term_score) AS u_bound, COUNT(*) AS df
         |       FROM sc GROUP BY tok),
         |fs AS (SELECT doc_id, SUM(term_score) AS score FROM sc
         |       GROUP BY doc_id),
         |th AS (SELECT MIN(score) AS theta FROM (
         |    SELECT score FROM fs ORDER BY score DESC, doc_id LIMIT 10)),
         |du AS (SELECT sc.doc_id, SUM(ub.u_bound) AS ubv
         |       FROM sc JOIN ub USING (tok) GROUP BY sc.doc_id),
         |sm AS (SELECT COUNT(*) AS candidates,
         |         SUM(CASE WHEN du.ubv < th.theta THEN 1 ELSE 0 END)
         |           AS skippable,
         |         MAX(th.theta) AS theta
         |       FROM du, th)
         |SELECT ub.tok, CAST(ub.df AS BIGINT) AS df,
         |  CAST(ub.u_bound AS BIGINT) AS u_bound,
         |  CAST(sm.theta AS BIGINT) AS theta,
         |  CAST(sm.candidates AS BIGINT) AS candidates,
         |  CAST(sm.skippable AS BIGINT) AS skippable,
         |  CAST(sm.skippable * 10000 // sm.candidates AS BIGINT) AS skip_bp
         |FROM ub, sm ORDER BY ub.tok""".stripMargin,
    // q239: same surprisal signal (q229's x over all docs), same 600‰
    // repetition label, and the tie-corrected rank-sum AUC identity —
    // the window runs over DISTINCT scores only
    "q239_gate_auc" ->
      s"""WITH tk AS (SELECT doc_id, unnest($dkTokens) AS tok FROM documents),
         |freq AS (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY tok),
         |tot AS (SELECT SUM(cnt) AS total FROM freq),
         |x AS (
         |  SELECT doc_id,
         |    (100 * SUM(length(bin((SELECT total FROM tot)))
         |       - length(bin(freq.cnt)))) // COUNT(*) AS x
         |  FROM tk JOIN freq USING (tok) GROUP BY doc_id),
         |lb AS (
         |  SELECT doc_id,
         |    CASE WHEN (1000 * (len(tks) - len(list_distinct(tks))))
         |           // len(tks) >= 600 THEN 1 ELSE 0 END AS lab
         |  FROM (SELECT doc_id, $dkTokens AS tks FROM documents)),
         |bs AS (SELECT x.x, SUM(lb.lab) AS p, SUM(1 - lb.lab) AS n
         |       FROM x JOIN lb USING (doc_id) GROUP BY x.x),
         |cm AS (SELECT x, p, n,
         |    COALESCE(SUM(n) OVER (ORDER BY x
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cumneg
         |  FROM bs)
         |SELECT CAST(SUM(p) AS BIGINT) AS pos, CAST(SUM(n) AS BIGINT) AS neg,
         |  CAST(COUNT(*) AS BIGINT) AS n_scores,
         |  CAST(SUM(2*p*cumneg + p*n) AS BIGINT) AS num2,
         |  CAST(SUM(2*p*cumneg + p*n) * 1000000
         |    // (2 * SUM(p) * SUM(n)) AS BIGINT) AS auc_x1e6
         |FROM cm""".stripMargin,
    // q243: q15's md5 fingerprint + q21's minhash CTEs on both sides of
    // the frozen/batch split, q22's band digests for candidates, and the
    // 8-comparison sketch-Jaccard (steps of 125‰) — exact + near + kept
    // decisions per batch doc, keeper = min frozen doc_id
    "q243_incremental_dedup" ->
      s"""WITH fz AS (SELECT doc_id, md5(text) AS fp FROM documents
         |            WHERE doc_id % 10 != 7),
         |bt AS (SELECT doc_id, md5(text) AS fp FROM documents
         |       WHERE doc_id % 10 = 7),
         |fsh AS (SELECT doc_id, unnest($dkBigrams) AS s FROM documents
         |        WHERE doc_id % 10 != 7),
         |bsh AS (SELECT doc_id, unnest($dkBigrams) AS s FROM documents
         |        WHERE doc_id % 10 = 7),
         |fsig AS (SELECT doc_id,
         |   ${(0 until NumHashes).map(i => s"min(('0x' || substr(md5('$i|' || s),1,15))::BIGINT) AS h$i").mkString(",\n   ")}
         |  FROM fsh GROUP BY doc_id),
         |bsig AS (SELECT doc_id,
         |   ${(0 until NumHashes).map(i => s"min(('0x' || substr(md5('$i|' || s),1,15))::BIGINT) AS h$i").mkString(",\n   ")}
         |  FROM bsh GROUP BY doc_id),
         |fb AS (SELECT doc_id, 0 AS band_idx,
         |         md5(h0||'|'||h1||'|'||h2||'|'||h3) AS digest FROM fsig
         |       UNION ALL SELECT doc_id, 1,
         |         md5(h4||'|'||h5||'|'||h6||'|'||h7) FROM fsig),
         |bb AS (SELECT doc_id, 0 AS band_idx,
         |         md5(h0||'|'||h1||'|'||h2||'|'||h3) AS digest FROM bsig
         |       UNION ALL SELECT doc_id, 1,
         |         md5(h4||'|'||h5||'|'||h6||'|'||h7) FROM bsig),
         |cand AS (SELECT DISTINCT bb.doc_id AS b_id, fb.doc_id AS f_id
         |         FROM bb JOIN fb ON bb.band_idx = fb.band_idx
         |           AND bb.digest = fb.digest),
         |near AS (
         |  SELECT b_id, min(f_id) AS near_match, max(ag) AS best_ag FROM (
         |    SELECT c.b_id, c.f_id,
         |      (${(0 until NumHashes).map(i => s"(CASE WHEN a.h$i = f.h$i THEN 1 ELSE 0 END)").mkString(" + ")}) * 125 AS ag
         |    FROM cand c JOIN bsig a ON c.b_id = a.doc_id
         |      JOIN fsig f ON c.f_id = f.doc_id)
         |  WHERE ag >= 500 GROUP BY b_id),
         |ex AS (SELECT bt.doc_id, fk.k AS exact_match FROM bt
         |       JOIN (SELECT fp, min(doc_id) AS k FROM fz GROUP BY fp) fk
         |         USING (fp))
         |SELECT bt.doc_id,
         |  CASE WHEN ex.exact_match IS NOT NULL THEN 'exact_dup'
         |       WHEN near.near_match IS NOT NULL THEN 'near_dup'
         |       ELSE 'kept' END AS decision,
         |  CAST(COALESCE(ex.exact_match, near.near_match, -1) AS BIGINT)
         |    AS match_id,
         |  CAST(CASE WHEN ex.exact_match IS NOT NULL THEN 1000
         |       ELSE COALESCE(near.best_ag, 0) END AS BIGINT) AS agree_x1000
         |FROM bt LEFT JOIN ex USING (doc_id)
         |  LEFT JOIN near ON bt.doc_id = near.b_id
         |ORDER BY doc_id""".stripMargin,
    // q245: q92's BM25 CTEs for the lexical leg, q24's cosine idiom for
    // the dense leg, ranks assigned inside each leg's top-50 cut, RRF in
    // 1e9 fixed point — absent-leg sentinel -1, contribution 0
    "q245_rrf_hybrid" ->
      s"""WITH tk AS (SELECT doc_id, unnest($dkTokens) AS tok FROM documents),
         |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
         |       FROM tk GROUP BY doc_id),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(dl) AS BIGINT) // CAST(count(*) AS BIGINT) AS avgdl
         |       FROM dl),
         |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM tk
         |       WHERE tok IN ('dup','line','query') GROUP BY doc_id, tok),
         |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
         |sc AS (
         |  SELECT tf.doc_id,
         |    (CAST(length(bin((SELECT n_docs FROM st)))
         |       - length(bin(df.df)) AS BIGINT)
         |     * 22000 * tf.tf * (SELECT avgdl FROM st))
         |    // (10 * (SELECT avgdl FROM st) * tf.tf
         |        + 3 * (SELECT avgdl FROM st) + 9 * dl.dl) AS term_score
         |  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id)),
         |fs AS (SELECT doc_id, SUM(term_score) AS score FROM sc
         |       GROUP BY doc_id),
         |lex AS (SELECT doc_id,
         |    row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
         |  FROM (SELECT * FROM fs ORDER BY score DESC, doc_id LIMIT 50)),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
         |      FROM embeddings),
         |qv AS (SELECT emb AS q FROM e WHERE vec_id = 0),
         |dsc AS (SELECT vec_id,
         |    CAST(round(1000*list_dot_product(emb, q) /
         |      (sqrt(list_dot_product(emb, emb)) *
         |       sqrt(list_dot_product(q, q)))) AS BIGINT) AS cos_x1000
         |  FROM e, qv),
         |den AS (SELECT vec_id AS doc_id,
         |    row_number() OVER (ORDER BY cos_x1000 DESC, vec_id)
         |      AS dense_rank
         |  FROM (SELECT * FROM dsc ORDER BY cos_x1000 DESC, vec_id
         |        LIMIT 50)),
         |j AS (SELECT COALESCE(lex.doc_id, den.doc_id) AS doc_id,
         |    CAST(COALESCE(lex_rank, -1) AS BIGINT) AS lex_rank,
         |    CAST(COALESCE(dense_rank, -1) AS BIGINT) AS dense_rank
         |  FROM lex FULL OUTER JOIN den ON lex.doc_id = den.doc_id)
         |SELECT doc_id, lex_rank, dense_rank,
         |  CAST((CASE WHEN lex_rank > 0
         |          THEN 1000000000 // (60 + lex_rank) ELSE 0 END)
         |    + (CASE WHEN dense_rank > 0
         |          THEN 1000000000 // (60 + dense_rank) ELSE 0 END)
         |    AS BIGINT) AS rrf
         |FROM j ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
    "q92_bm25_topk" ->
      s"""WITH tk AS (SELECT doc_id, unnest($dkTokens) AS tok FROM documents),
         |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
         |       FROM tk GROUP BY doc_id),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(dl) AS BIGINT) // CAST(count(*) AS BIGINT) AS avgdl
         |       FROM dl),
         |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM tk
         |       WHERE tok IN ('dup','line','query') GROUP BY doc_id, tok),
         |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
         |sc AS (
         |  SELECT tf.doc_id,
         |    (CAST(length(bin((SELECT n_docs FROM st)))
         |       - length(bin(df.df)) AS BIGINT)
         |     * 22000 * tf.tf * (SELECT avgdl FROM st))
         |    // (10 * (SELECT avgdl FROM st) * tf.tf
         |        + 3 * (SELECT avgdl FROM st) + 9 * dl.dl) AS term_score
         |  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id))
         |SELECT doc_id, CAST(sum(term_score) AS BIGINT) AS score_x1000,
         |  CAST(count(*) AS BIGINT) AS n_terms
         |FROM sc GROUP BY doc_id
         |ORDER BY score_x1000 DESC, doc_id LIMIT 20""".stripMargin,
    "q97_inverted_index" ->
      s"""WITH tk AS (
         |  SELECT doc_id, UNNEST(generate_series(0, len($dkTokens)-1)) AS pos,
         |         UNNEST($dkTokens) AS tok
         |  FROM documents),
         |p AS (
         |  SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS tf,
         |    CAST(min(pos) AS BIGINT) AS first_pos,
         |    CAST(max(pos) AS BIGINT) AS last_pos,
         |    string_agg(CAST(pos AS VARCHAR), ',' ORDER BY pos) AS positions
         |  FROM tk GROUP BY tok, doc_id),
         |d AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY tok)
         |SELECT p.tok, p.doc_id, p.tf, d.df, p.first_pos, p.last_pos,
         |  p.positions
         |FROM p JOIN d USING (tok)
         |ORDER BY p.tok, p.doc_id""".stripMargin,
    "q55_surprisal" ->
      s"""WITH tk AS (SELECT doc_id, unnest($dkTokens) AS tok FROM documents),
         |freq AS (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY tok),
         |n AS (SELECT COUNT(*) AS total FROM tk)
         |SELECT doc_id, COUNT(*) AS words,
         | CAST(SUM(length(bin((SELECT total FROM n))) - length(bin(cnt))) AS BIGINT) AS surprisal_bits,
         | CAST(round(100.0*SUM(length(bin((SELECT total FROM n))) - length(bin(cnt)))/COUNT(*)) AS BIGINT) AS avg_bits_x100
         |FROM tk JOIN freq USING (tok)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q56_tfidf_top" ->
      s"""WITH tf AS (
         |  SELECT doc_id, tok, COUNT(*) AS tf FROM (
         |    SELECT doc_id, unnest($dkTokens) AS tok FROM documents)
         |  GROUP BY doc_id, tok),
         |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
         |nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.tok,
         |    tf.tf * (length(bin((SELECT n_docs FROM nd))) - length(bin(df.df))) AS score,
         |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
         |      ORDER BY tf.tf * (length(bin((SELECT n_docs FROM nd))) - length(bin(df.df))) DESC, tf.tok) AS rank
         |  FROM tf JOIN df USING (tok))
         |SELECT doc_id, CAST(rank AS BIGINT) AS rank, tok, CAST(score AS BIGINT) AS score
         |FROM scored WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q57_bpe_tokens" ->
      s"""SELECT doc_id,
         | CAST(len($dkTokens) AS INT) AS ws_tokens,
         | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\f\\r\\x0B]')) AS INT) AS bpe_tokens,
         | CAST(round(100.0*len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\f\\r\\x0B]'))
         |   / len($dkTokens)) AS BIGINT) AS ratio_x100
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q63_winnow_pairs" ->
      """WITH base AS (
        |  SELECT doc_id, lower(regexp_replace(trim(text), '[ \t\n\f\r\x0B]+', ' ', 'g')) AS s
        |  FROM documents
        |  WHERE length(lower(regexp_replace(trim(text), '[ \t\n\f\r\x0B]+', ' ', 'g'))) >= 8),
        |grams AS (
        |  SELECT doc_id, p,
        |    ('0x' || substr(md5(substr(s, CAST(p AS INT), 8)), 1, 15))::BIGINT AS h,
        |    length(s) - 7 AS nk
        |  FROM base, unnest(generate_series(1, length(s) - 7)) AS t(p)),
        |wins AS (
        |  SELECT doc_id, p, nk,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        |  FROM grams),
        |fps AS (SELECT DISTINCT doc_id, fp FROM wins WHERE p <= nk - 3),
        |ok AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 20),
        |kept AS (SELECT f.doc_id, f.fp FROM fps f JOIN ok USING (fp))
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
        |FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING COUNT(*) >= 2
        |ORDER BY a_id, b_id""".stripMargin,
    "q58_winnow" ->
      """WITH base AS (
        |  SELECT doc_id, lower(regexp_replace(trim(text), '[ \t\n\f\r\x0B]+', ' ', 'g')) AS s
        |  FROM documents
        |  WHERE length(lower(regexp_replace(trim(text), '[ \t\n\f\r\x0B]+', ' ', 'g'))) >= 8),
        |grams AS (
        |  SELECT doc_id, p,
        |    ('0x' || substr(md5(substr(s, CAST(p AS INT), 8)), 1, 15))::BIGINT AS h,
        |    length(s) - 7 AS nk
        |  FROM base, unnest(generate_series(1, length(s) - 7)) AS t(p)),
        |wins AS (
        |  SELECT doc_id, p, nk,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        |  FROM grams)
        |SELECT DISTINCT doc_id, fp FROM wins
        |WHERE p <= nk - 3 ORDER BY doc_id, fp""".stripMargin,
    "q60_decontaminate" -> decontamOracleSql,
    "q118_weighted_sample" ->
      s"""WITH wt AS (SELECT doc_id,
         |    least(8, 1 + CAST(len($dkTokens) AS INT) // 64) AS w
         |  FROM documents),
         |keys AS (SELECT doc_id, CAST(w AS BIGINT) AS w,
         |    list_min([('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' ||
         |                CAST(i AS VARCHAR)), 1, 15))::BIGINT
         |              for i in generate_series(0, w - 1)]) AS key
         |  FROM wt)
         |SELECT doc_id, w, key FROM keys
         |ORDER BY key, doc_id LIMIT 40""".stripMargin,
    "q115_vocab_growth" ->
      s"""WITH tk AS (SELECT DISTINCT doc_id,
         |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS h,
         |    tok
         |  FROM (SELECT doc_id, unnest($dkTokens) AS tok FROM documents)),
         |f AS (SELECT tok, doc_id AS first_doc,
         |    ROW_NUMBER() OVER (PARTITION BY tok ORDER BY h, doc_id) AS rn
         |  FROM tk)
         |SELECT tk.doc_id, COUNT(*) AS distinct_toks,
         |  CAST(SUM(CASE WHEN ff.first_doc = tk.doc_id THEN 1 ELSE 0 END)
         |    AS BIGINT) AS new_toks
         |FROM tk JOIN (SELECT tok, first_doc FROM f WHERE rn = 1) ff USING (tok)
         |GROUP BY tk.doc_id ORDER BY tk.doc_id""".stripMargin,
    "q114_exact_quantiles" ->
      s"""WITH l AS (SELECT CAST(len($dkTokens) AS BIGINT) AS len FROM documents),
         |n AS (SELECT COUNT(*) AS n FROM l),
         |s AS (SELECT len, ROW_NUMBER() OVER (ORDER BY len) AS rn FROM l),
         |k AS (SELECT * FROM (VALUES ('p50', 50), ('p90', 90), ('p99', 99))
         |        t(stat, pct))
         |SELECT k.stat,
         |  (SELECT s.len FROM s
         |   WHERE s.rn = (k.pct * (SELECT n FROM n) + 99) // 100) AS len
         |FROM k ORDER BY k.stat""".stripMargin,
    // DuckDB regexp_replace needs the explicit 'g' flag (Spark's is
    // global by default); patterns are the Java∩RE2 dialect intersection
    "q151_pii_redact" ->
      """WITH wired AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@mail.example.org now' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || (doc_id % 200) || '.3.44 logged' ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN ' call +44 207 ' || lpad(CAST(doc_id % 1000000 AS VARCHAR), 6, '0') || ' today' ELSE '' END AS wire
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, wire,
        |    regexp_replace(regexp_replace(regexp_replace(wire,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |      '\+[0-9]{2} [0-9]{3} [0-9]{6}', '[PHONE]', 'g'),
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g') AS red
        |  FROM wired)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(wire, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(wire, '\+[0-9]{2} [0-9]{3} [0-9]{6}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(wire, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
        |  md5(red) AS redacted_md5,
        |  CAST(length(wire) - length(red) AS BIGINT) AS shrunk
        |FROM r ORDER BY doc_id""".stripMargin,
    "q113_text_sanitize" ->
      """WITH w AS (SELECT doc_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN chr(8238) || text
        |      WHEN 1 THEN text || chr(8203) || 'tail'
        |      WHEN 2 THEN text || chr(1)
        |      ELSE text END AS wire
        |  FROM documents),
        |c AS (SELECT doc_id, length(wire) AS wire_chars,
        |    regexp_replace(wire,
        |      '[\x{200B}-\x{200D}\x{FEFF}\x{202A}-\x{202E}\x{2066}-\x{2069}\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}\x{007F}]',
        |      '', 'g') AS clean
        |  FROM w)
        |SELECT doc_id, wire_chars, length(clean) AS clean_chars,
        |  wire_chars - length(clean) AS removed, md5(clean) AS clean_md5
        |FROM c ORDER BY doc_id""".stripMargin,
    "q111_syndication" ->
      s"""WITH tk AS (SELECT source, $dkTokens AS t FROM documents),
         |gr AS (SELECT DISTINCT source, md5(array_to_string(t[p:p+9], ' ')) AS g
         |  FROM tk, unnest(generate_series(1, len(t) - 9)) s(p) WHERE len(t) >= 10),
         |sizes AS (SELECT source, COUNT(*) AS n FROM gr GROUP BY source),
         |sdf AS (SELECT g, COUNT(*) AS src_df FROM gr GROUP BY g),
         |cap AS (SELECT gr.source, gr.g FROM gr JOIN sdf USING (g)
         |  WHERE src_df <= $SyndMaxSrcDf),
         |p AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared_spans
         |  FROM cap a JOIN cap b ON a.g = b.g AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT src_a, src_b, shared_spans, sa.n AS spans_a, sb.n AS spans_b,
         |  CAST(round(1000.0 * shared_spans / least(sa.n, sb.n)) AS BIGINT)
         |    AS overlap_x1000,
         |  (CAST(round(1000.0 * shared_spans / least(sa.n, sb.n)) AS BIGINT) >= 50)
         |    AS syndicated
         |FROM p JOIN sizes sa ON src_a = sa.source JOIN sizes sb ON src_b = sb.source
         |ORDER BY src_a, src_b""".stripMargin,
    "q101_contamination_frac" ->
      s"""WITH $decontamCtes,
         |eg AS (SELECT DISTINCT g FROM evg)
         |SELECT dg.doc_id, COUNT(*) AS grams,
         |  CAST(SUM(CASE WHEN eg.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS shared_grams,
         |  CAST(round(1000.0 * SUM(CASE WHEN eg.g IS NOT NULL THEN 1 ELSE 0 END)
         |    / COUNT(*)) AS BIGINT) AS frac_x1000,
         |  (SUM(CASE WHEN eg.g IS NOT NULL THEN 1 ELSE 0 END) = 0) AS kept
         |FROM dg LEFT JOIN eg ON dg.g = eg.g
         |GROUP BY dg.doc_id ORDER BY dg.doc_id""".stripMargin,
    "q64_bloom_decontaminate" -> decontamOracleSql,
    "q81_pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 4 AS INT)
        |      WHEN 0 THEN text || ' Contact bob' || doc_id || '@mail-example.org or sue.smith+' || doc_id || '@corp.example.com now.'
        |      WHEN 1 THEN text || ' Host 10.' || (doc_id % 200) || '.' || ((doc_id * 7) % 250) || '.42 and 192.168.1.' || (doc_id % 255) || ' up.'
        |      WHEN 2 THEN text || ' Call 415-555-' || (1000 + doc_id % 9000) || ' or 212-555-' || (1000 + (doc_id * 3) % 9000) || '.'
        |      ELSE text END AS t
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, t,
        |    regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS ne,
        |    regexp_replace(regexp_replace(regexp_replace(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
        |      '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g') AS red
        |  FROM p)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(ne, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ip,
        |  CAST(len(regexp_extract_all(red, '<PHONE>')) AS BIGINT) AS n_phone,
        |  CAST(length(red) AS BIGINT) AS red_chars,
        |  md5(red) AS red_fp
        |FROM r ORDER BY doc_id""".stripMargin,
    "q82_cms_heavy" ->
      s"""WITH tk AS (SELECT unnest($dkTokens) AS tok FROM documents)
         |SELECT tok, COUNT(*) AS cnt FROM tk
         |GROUP BY tok HAVING COUNT(*) >= 40 ORDER BY tok""".stripMargin,
    "q84_perplexity" ->
      s"""WITH tk AS (SELECT doc_id, unnest($dkTokens) AS tok FROM documents),
         |freq AS (SELECT tok, COUNT(*) AS cnt FROM tk WHERE doc_id % 5 <> 0 GROUP BY tok),
         |st AS (SELECT SUM(cnt) + COUNT(*) AS tv FROM freq),
         |sc AS (
         |  SELECT tk.doc_id, COUNT(*) AS words,
         |    CAST(SUM(CASE WHEN f.cnt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov,
         |    CAST(SUM(length(bin((SELECT tv FROM st))) - length(bin(COALESCE(f.cnt, 0) + 1))) AS BIGINT) AS ppl_bits
         |  FROM tk LEFT JOIN freq f USING (tok)
         |  GROUP BY tk.doc_id)
         |SELECT doc_id, words, oov, ppl_bits,
         |  CAST(round(100.0 * ppl_bits / words) AS BIGINT) AS avg_bits_x100,
         |  (CAST(round(100.0 * ppl_bits / words) AS BIGINT) <= 1100) AS kept
         |FROM sc ORDER BY doc_id""".stripMargin,
    "q70_span_dedup" ->
      s"""WITH b AS (
         |  SELECT doc_id, $dkTokens AS tk, len($dkTokens) AS n FROM documents),
         |c AS (
         |  SELECT doc_id, p, array_to_string(tk[p:p+9], ' ') AS chunk
         |  FROM b, unnest(generate_series(1, n - 9, 10)) s(p)
         |  WHERE n >= 10),
         |m AS (
         |  SELECT doc_id, p, chunk,
         |    ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, p) AS rk
         |  FROM c),
         |a AS (
         |  SELECT doc_id, COUNT(*) AS n_spans,
         |    CAST(SUM(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |    string_agg(CASE WHEN rk = 1 THEN chunk END, ' ' ORDER BY p) AS kept_joined
         |  FROM m GROUP BY doc_id)
         |SELECT b.doc_id,
         |  COALESCE(a.n_spans, 0) AS n_spans,
         |  COALESCE(a.n_dropped, 0) AS n_dropped,
         |  md5(concat_ws(' ',
         |    CASE WHEN length(COALESCE(a.kept_joined, '')) > 0 THEN a.kept_joined END,
         |    CASE WHEN n % 10 > 0 THEN array_to_string(tk[n - n % 10 + 1 : n], ' ') END)) AS new_sha
         |FROM b LEFT JOIN a USING (doc_id)
         |ORDER BY b.doc_id""".stripMargin,
    "q69_crawl_delta" ->
      """WITH prev AS (SELECT doc_id, md5(text) AS old_sha FROM documents),
        |next AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 31 = 0 THEN text || ' v2' ELSE text END) AS new_sha
        |  FROM documents WHERE doc_id % 97 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    md5('new ' || CAST(doc_id AS VARCHAR))
        |  FROM documents WHERE doc_id % 50 = 0)
        |SELECT CASE WHEN old_sha IS NULL THEN 'new'
        |            WHEN new_sha IS NULL THEN 'gone'
        |            WHEN old_sha <> new_sha THEN 'changed'
        |            ELSE 'unchanged' END AS status,
        |  COUNT(*) AS docs
        |FROM prev FULL OUTER JOIN next USING (doc_id)
        |GROUP BY 1 ORDER BY status""".stripMargin,
    "q67_stratified_sample" ->
      """WITH r AS (
        |  SELECT lang, source, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang, source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT lang, source, CAST(rk AS BIGINT) AS rk, doc_id
        |FROM r WHERE rk <= 20
        |ORDER BY lang, source, rk""".stripMargin,
    "q65_nfc_normalize" ->
      """SELECT doc_id,
        | CAST(length(text || ' cafe' || chr(769) || ' A' || chr(778)) AS INT) AS raw_len,
        | CAST(length(nfc_normalize(text || ' cafe' || chr(769) || ' A' || chr(778))) AS INT) AS nfc_len,
        | md5(nfc_normalize(text || ' cafe' || chr(769) || ' A' || chr(778))) AS nfc_fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q23_simhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id, md5(unnest(list_distinct($dkTokens))) AS h FROM documents),
         |bits AS (
         |  SELECT doc_id, b,
         |   SUM(2 * ((strpos('0123456789abcdef', substr(h, b//4+1, 1))-1 >> (b%4)) & 1) - 1) AS sw
         |  FROM toks, generate_series(0,15) t(b) GROUP BY doc_id, b)
         |SELECT doc_id,
         | CAST(SUM(CASE WHEN sw > 0 THEN 1<<b ELSE 0 END) AS BIGINT) AS simhash16
         |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  )
}
