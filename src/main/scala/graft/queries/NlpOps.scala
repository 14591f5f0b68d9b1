package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-scale NLP analysis operators over the `documents` table:
  * keyphrase extraction (RAKE), unseen-vocabulary estimation
  * (Good–Turing / Chao1), and extractive summarization (TextRank).
  *
  * All three are fully oracled: every score is exact-integer arithmetic
  * (scaled fixed-point with `div` integer division — DuckDB `//`), every
  * regex lives in the Java∩RE2 dialect intersection with the explicit
  * whitespace class (TextOps.WS), and every output ORDERs BY a unique key.
  *
  * Scale notes (100 TB): RAKE and TextRank are per-document — the only
  * corpus-wide shuffles are doc-keyed (explode → window/groupBy), the
  * q58/q169 discipline. TextRank's within-doc sentence-pair join is
  * quadratic PER DOCUMENT, so the sentence count is hard-capped at
  * [[NlpOps.MaxSents]] per doc (the q63 ubiquity-cap discipline: bound
  * every self-join bucket before the join, never after). Good–Turing is
  * one token explode → one (source, token) map-combined aggregate → a
  * per-source rollup whose output is one row per source.
  */
object NlpOps {
  import Q._

  private val WS = TextOps.WS
  private def tokens(c: Column): Column = split(lower(trim(c)), WS)

  /** Max sentences per document entering TextRank's pairwise join. */
  val MaxSents = 64

  /** Phrase-breaking stopword list — TextOps.stopwords, shared with the
    * quality battery so "a stopword" means one thing in this repo.
    */
  private val stops = TextOps.stopwords

  // ---------------------------------------------------------------- RAKE

  /** Rapid Automatic Keyword Extraction (Rose, Engel, Cramer & Cowley,
    * "Automatic keyword extraction from individual documents", 2010) on
    * `(doc_id, text)`:
    *
    *  - candidate phrases = maximal runs of content tokens, broken at
    *    stopwords, at tokens with no `[a-z0-9]` left after edge-stripping,
    *    and AFTER any token ending in sentence punctuation `[.!?,;:]`;
    *  - per-document word scores `score(w) = deg(w)/freq(w)` where
    *    `freq` counts occurrences inside candidates and `deg` sums the
    *    lengths of the candidates containing each occurrence — kept exact
    *    as `deg*1000 div freq`;
    *  - phrase score = sum of member word scores (with multiplicity);
    *    top-[[k]] distinct phrases per doc, ties broken by phrase text.
    *
    * Shape: one posexplode, one doc-keyed window set (running phrase-id
    * sum), one (doc, phrase) and one (doc, word) aggregate — a single
    * doc-keyed Exchange serves all of it; word stats are PER DOCUMENT so
    * no Zipf-head vocabulary join exists at all.
    */
  def rake(docs: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val tk = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("norm",
        regexp_replace(col("tok"), "^[^a-z0-9]+|[^a-z0-9]+$", ""))
      .withColumn("is_delim",
        col("norm").isin(stops: _*) || col("norm") === "")
      .withColumn("brk", col("tok").rlike("[.!?,;:]$"))
      .withColumn("cut",
        (col("is_delim") ||
          coalesce(lag(col("brk"), 1).over(w), lit(false))).cast("int"))
      .withColumn("pid", sum(col("cut")).over(w))
    // (measured: localCheckpointing members+phrases to share across the
    // three consumers regressed 1.30 → 1.80 s — materializing the ~1 M-row
    // token frame costs more than the cheap recomputes; left recomputed)
    val members = tk.filter(!col("is_delim"))
      .select(col("doc_id"), col("pid"), col("pos"), col("norm"))
    val phrases = members
      .groupBy(col("doc_id"), col("pid"))
      .agg(
        count(lit(1)).as("plen"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("norm")))),
          x => x.getField("norm")), " ").as("phrase"))
    val wordScore = members
      .join(phrases.select(col("doc_id"), col("pid"), col("plen")),
        Seq("doc_id", "pid"))
      .groupBy(col("doc_id"), col("norm"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .withColumn("wscore", expr("deg * 1000 div freq"))
    val scored = members
      .join(wordScore.select(col("doc_id"), col("norm"), col("wscore")),
        Seq("doc_id", "norm"))
      .groupBy(col("doc_id"), col("pid"))
      .agg(sum(col("wscore")).as("score"))
      .join(phrases.select(col("doc_id"), col("pid"), col("phrase")),
        Seq("doc_id", "pid"))
      .groupBy(col("doc_id"), col("phrase"))
      .agg(max(col("score")).as("score"))
    val rw = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("phrase"))
    scored
      .withColumn("rank", row_number().over(rw))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("phrase"), col("score").cast("long").as("score"))
  }

  /** q182: RAKE keyphrases, top-3 per document. */
  def q182Rake(s: SparkSession, dir: String): DataFrame =
    rake(tbl(s, dir, "documents").select(col("doc_id"), col("text")))
      .orderBy(col("doc_id"), col("rank"))

  // ------------------------------------------------- Good–Turing / Chao1

  /** q183: UNSEEN-VOCABULARY ESTIMATION per source — "how much novel text
    * is still out there" for a crawl-scheduling decision. Per source:
    * token count N, type count V, singleton/doubleton type counts f1/f2,
    * the Good–Turing unseen-probability mass `p0 ≈ f1/N` (Good, Biometrika
    * 1953; the leave-one-out estimator), and the Chao1 richness lower
    * bound `V + f1²/(2·f2)` (Chao, Scand. J. Statist. 1984) with the
    * standard bias-corrected `V + f1(f1−1)/2` fallback when f2 = 0. All
    * reported as scaled BIGINTs under integer division.
    *
    * Shape: one explode → one (source, token) map-combined count → one
    * per-source rollup; output is one row per source.
    */
  def unseenVocab(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .where(col("tok") =!= "")
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("v_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .withColumn("p0_x1e6", expr("f1 * 1000000 div n_tokens"))
      .withColumn("chao1_x100",
        when(col("f2") > 0,
          col("v_types") * 100 + expr("f1 * f1 * 100 div (2 * f2)"))
          .otherwise(col("v_types") * 100 + expr("f1 * (f1 - 1) * 100 div 2")))
      .select(col("source"), col("n_tokens"), col("v_types"), col("f1"),
        col("f2"), col("p0_x1e6"), col("chao1_x100"))

  def q183UnseenVocab(s: SparkSession, dir: String): DataFrame =
    unseenVocab(tbl(s, dir, "documents")).orderBy(col("source"))

  // ------------------------------------------------------------ TextRank

  /** TextRank extractive summarization (Mihalcea & Tarau, EMNLP 2004) on
    * `(doc_id, text)`: sentences = `[.!?]+`-split spans of the lowercased
    * text (whitespace-stripped, empties dropped, renumbered 1..n, capped
    * at [[MaxSents]]); edge weight between two sentences of one document
    * = `|shared distinct tokens| · 1000 div (bitlen(|Si|) + bitlen(|Sj|))`
    * — the paper's log-denominator similarity with the repo's exact
    * integer bitlen surrogate; then `rounds` synchronous iterations of
    * `WS(i) = 0.15 + 0.85 · Σ_j w_ji/outsum_j · WS(j)` in ×1e6 fixed
    * point where EVERY division is integer `div` — the iteration is
    * bit-reproducible under any partitioning (the q117 discipline).
    * Returns the top-`k` sentences per doc (score desc, index asc).
    *
    * Shape per iteration: one edges⋈scores equi-join on (doc, src) + one
    * (doc, dst) map-combined aggregate over localCheckpointed edges —
    * q53's PageRank loop, keyed by (doc, sentence) instead of node.
    */
  def textrank(docs: DataFrame, rounds: Int = 10, k: Int = 2): DataFrame = {
    val iw = Window.partitionBy(col("doc_id")).orderBy(col("sidx"))
    val sent = docs
      .select(col("doc_id"),
        posexplode(split(lower(trim(col("text"))), "[.!?]+"))
          .as(Seq("sidx", "raw")))
      .withColumn("sent",
        regexp_replace(col("raw"), s"^$WS|$WS$$", ""))
      .where(col("sent") =!= "")
      .withColumn("idx", row_number().over(iw))
      .where(col("idx") <= MaxSents)
      .select(col("doc_id"), col("idx"), col("sent"))
      .localCheckpoint()
    val st = sent
      .select(col("doc_id"), col("idx"),
        explode(array_distinct(split(col("sent"), WS))).as("tok"))
      .where(col("tok") =!= "")
    val slen = st.groupBy(col("doc_id"), col("idx"))
      .agg(count(lit(1)).as("ntok"))
      .withColumn("bl", length(bin(col("ntok"))))
    val edges = st.as("a")
      .join(st.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("a.tok") === col("b.tok") &&
          col("a.idx") =!= col("b.idx"))
      .groupBy(col("a.doc_id").as("doc_id"), col("a.idx").as("src"),
        col("b.idx").as("dst"))
      .agg(count(lit(1)).as("shared"))
      .join(slen.select(col("doc_id"), col("idx").as("src"),
        col("bl").as("bl_s")), Seq("doc_id", "src"))
      .join(slen.select(col("doc_id"), col("idx").as("dst"),
        col("bl").as("bl_d")), Seq("doc_id", "dst"))
      .select(col("doc_id"), col("src"), col("dst"),
        expr("shared * 1000 div (bl_s + bl_d)").as("w"))
      .where(col("w") > 0)
      .localCheckpoint()
    val outsum = edges.groupBy(col("doc_id"), col("src"))
      .agg(sum(col("w")).as("outsum"))
      .localCheckpoint()
    var ws = sent.select(col("doc_id"), col("idx"), lit(1000000L).as("ws"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val contrib = edges
        .join(ws.select(col("doc_id"), col("idx").as("src"), col("ws")),
          Seq("doc_id", "src"))
        .join(outsum, Seq("doc_id", "src"))
        .groupBy(col("doc_id"), col("dst").as("idx"))
        .agg(sum(expr("w * ws div outsum")).as("c"))
      ws = sent.select(col("doc_id"), col("idx"))
        .join(contrib, Seq("doc_id", "idx"), "left")
        .select(col("doc_id"), col("idx"),
          (lit(150000L) +
            expr("850 * coalesce(c, 0L) div 1000")).as("ws"))
        .localCheckpoint()
    }
    val rw = Window.partitionBy(col("doc_id"))
      .orderBy(col("ws").desc, col("idx"))
    ws.withColumn("rank", row_number().over(rw))
      .where(col("rank") <= k)
      .join(sent, Seq("doc_id", "idx"))
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("idx").cast("long").as("sent_idx"), col("ws").as("score"),
        md5(col("sent").cast("binary")).as("sent_md5"))
  }

  /** q184: TextRank top-2 summary sentences per document. */
  def q184Textrank(s: SparkSession, dir: String): DataFrame =
    textrank(tbl(s, dir, "documents").select(col("doc_id"), col("text")))
      .orderBy(col("doc_id"), col("rank"))

  // ---------------------------------------------------------- TextTiling

  /** Pseudo-sentence width (tokens) and block size (pseudo-sentences per
    * side of a gap) for [[texttile]] — Hearst's w=20/k=10 scaled to the
    * short synthetic docs; the depth peak window mirrors k.
    */
  val TileW = 10
  val TileK = 5

  /** TextTiling topic segmentation (Hearst, "TextTiling: Segmenting Text
    * into Multi-paragraph Subtopic Passages", CL 23(1), 1997) with the
    * repo's exact-integer surrogates:
    *
    *  - pseudo-sentences of [[TileW]] tokens; a GAP g sits between
    *    pseudo-sentence g−1 and g;
    *  - gap cohesion = `2000·dot div (Σcl² + Σcr²)` over the token-count
    *    vectors of the [[TileK]] pseudo-sentences on each side — the
    *    cosine surrogate that needs no square root (2ab ≤ a²+b² keeps it
    *    in [0, 1000], exactly 1000 for identical blocks);
    *  - depth(g) = (maxL − s_g) + (maxR − s_g) with the peaks taken over
    *    a bounded ±[[TileK]] gap window (the practical bounded-window
    *    variant of Hearst's climb — a window function instead of a scan);
    *  - boundary iff `d_g ≥ μ − σ/2` (Hearst's cutoff), decided in exact
    *    integers by comparing `(2·n·d_g − 2·Σd)` against `−n·σ` via its
    *    square: no float mean, no float sqrt ever materializes.
    *
    * Scale shape: one posexplode → (doc, ps, tok) count → a bounded
    * explode of each pseudo-sentence into the ≤ 2·[[TileK]] gaps it
    * feeds → one (doc, gap, tok) aggregate and one (doc, gap) self-join —
    * every key is doc-scoped, so the whole thing is one doc-keyed
    * Exchange family; the per-doc stats re-enter by broadcast-sized
    * aggregate join on doc_id.
    */
  def texttile(docs: DataFrame): DataFrame = {
    val tc = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .where(col("tok") =!= "")
      .withColumn("ps", expr(s"pos div $TileW"))
      .groupBy(col("doc_id"), col("ps"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val nps = tc.groupBy(col("doc_id"))
      .agg((max(col("ps")) + 1).as("n_ps"))
    // each pseudo-sentence ps feeds gaps [ps+1, ps+K] as a LEFT block and
    // gaps [ps-K+1, ps] as a RIGHT block; valid gaps are 1..n_ps-1
    val left = tc.select(col("doc_id"), col("tok"), col("c"),
      explode(sequence(col("ps") + 1, col("ps") + TileK)).as("gap"))
      .groupBy(col("doc_id"), col("gap"), col("tok"))
      .agg(sum(col("c")).as("cl"))
    val right = tc.select(col("doc_id"), col("tok"), col("c"),
      explode(sequence(col("ps") - TileK + 1, col("ps"))).as("gap"))
      .where(col("gap") >= 1)
      .groupBy(col("doc_id"), col("gap"), col("tok"))
      .agg(sum(col("c")).as("cr"))
    val dot = left.join(right, Seq("doc_id", "gap", "tok"))
      .groupBy(col("doc_id"), col("gap"))
      .agg(sum(col("cl") * col("cr")).as("dot"))
    val nl = left.groupBy(col("doc_id"), col("gap"))
      .agg(sum(col("cl") * col("cl")).as("sql_"))
    val nr = right.groupBy(col("doc_id"), col("gap"))
      .agg(sum(col("cr") * col("cr")).as("sqr_"))
    val sim = nl.join(nr, Seq("doc_id", "gap"))
      .join(dot, Seq("doc_id", "gap"), "left")
      .join(nps, "doc_id")
      .where(col("gap") >= 1 && col("gap") <= col("n_ps") - 1)
      .select(col("doc_id"), col("gap"),
        expr("2000 * coalesce(dot, 0L) div (sql_ + sqr_)").as("sim"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("gap"))
    val depth = sim
      .withColumn("maxl", greatest(col("sim"),
        coalesce(max(col("sim")).over(w.rowsBetween(-TileK, -1)), lit(0L))))
      .withColumn("maxr", greatest(col("sim"),
        coalesce(max(col("sim")).over(w.rowsBetween(1, TileK)), lit(0L))))
      .select(col("doc_id"), col("gap"),
        col("sim"), (col("maxl") + col("maxr") - col("sim") * 2).as("depth"))
    val stats = depth.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), sum(col("depth")).as("sd"),
        sum(col("depth") * col("depth")).as("sdd"))
    // d >= mu - sigma/2  <=>  lhs := 2*n*d - 2*sd >= -n*sigma, decided by
    // lhs >= 0, or lhs^2 <= n^2 sigma^2 = n*sdd - sd^2 (all BIGINT-exact)
    depth.join(stats, "doc_id")
      .withColumn("lhs", col("n") * col("depth") * 2 - col("sd") * 2)
      .withColumn("boundary",
        col("lhs") >= 0 ||
          col("lhs") * col("lhs") <= col("n") * col("sdd") - col("sd") * col("sd"))
      .select(col("doc_id"), col("gap").cast("long").as("gap"), col("sim"),
        col("depth"), col("boundary"))
  }

  /** q188: TextTiling gap cohesion / depth / boundary table. */
  def q188Texttile(s: SparkSession, dir: String): DataFrame =
    texttile(tbl(s, dir, "documents").select(col("doc_id"), col("text")))
      .orderBy(col("doc_id"), col("gap"))

  // --------------------------------------------------------- Readability

  /** q231: READABILITY SCORING per document — the Automated Readability
    * Index (Senter & Smith 1967) and the Coleman–Liau index (Coleman &
    * Liau 1975), the two standard formulas that need NO syllable counter
    * (syllabification is dictionary-bound and engine-divergent; ARI/CLI
    * run on character/word/sentence counts alone, which is why
    * large-scale quality pipelines use exactly these two). Reported in
    * ×100 fixed point with every division integer `div`:
    *
    *   ari_x100 = 471·chars div words + 50·words div sents − 2143
    *   cli_x100 = 588·chars div words − 2960·sents div words − 1580
    *
    * (ARI = 4.71·chars/words + 0.5·words/sents − 21.43; CLI =
    * 0.0588·L − 0.296·S − 15.8 with L = chars per 100 words and S =
    * sents per 100 words — the ×100 constants absorb the /100s exactly.)
    * Both numerators are non-negative before the one subtraction, so
    * Spark's truncating `div` and DuckDB's flooring `//` agree. The ARI
    * value ×100 is a US grade level; `band` buckets it the way a quality
    * gate consumes it.
    *
    * Shape: ZERO shuffles — words/chars/sentences are higher-order-
    * function folds over the in-row token and sentence arrays (stateless
    * projection; the scan's narrow pass at any corpus size). Sentences
    * reuse q184's `[.!?]+` splitter; a sentence counts if it contains
    * any non-whitespace char; sents is floored at 1 so fragment-only
    * docs still score.
    */
  def readability(docs: DataFrame): DataFrame = {
    val toks = filter(tokens(col("text")), t => t =!= "")
    val sents = greatest(lit(1L),
      size(filter(split(lower(trim(col("text"))), "[.!?]+"),
        x => x.rlike("[^ \\t\\n\\f\\r\\x0B]"))).cast("long"))
    docs
      .select(col("doc_id"),
        aggregate(toks, lit(0L), (a, t) => a + length(t).cast("long"))
          .as("n_chars"),
        size(toks).cast("long").as("n_words"),
        sents.as("n_sents"))
      .where(col("n_words") > 0)
      .withColumn("ari_x100",
        expr("471 * n_chars div n_words + 50 * n_words div n_sents - 2143"))
      .withColumn("cli_x100",
        expr("588 * n_chars div n_words - 2960 * n_sents div n_words - 1580"))
      .withColumn("band",
        when(col("ari_x100") < 500, "elementary")
          .when(col("ari_x100") < 900, "middle")
          .when(col("ari_x100") < 1300, "high")
          .otherwise("college"))
  }

  def q231Readability(s: SparkSession, dir: String): DataFrame =
    readability(tbl(s, dir, "documents").select(col("doc_id"), col("text")))
      .orderBy(col("doc_id"))

  // ------------------------------------------------- Lexical repeat rate

  /** q232: YULE'S K per source — the classic lexical-richness
    * characteristic (Yule, "The Statistical Study of Literary
    * Vocabulary", 1944): K = 10⁴·(Σ_m m²·V_m − N)/N², where V_m is the
    * count of types occurring m times and N the token count. Unlike raw
    * type/token ratio, K is (asymptotically) length-invariant, which is
    * why stylometry uses it to compare sources of different sizes; a
    * template-stamped source shows a much higher K (mass concentrated in
    * few types) than organic prose. Σ m²·V_m ≡ Σ_types c², so one
    * (source, token) count feeds it directly. Reported as
    * yule_k_x100 = (Σc² − N)·10⁶ div N² — exact BIGINT at the harness
    * scales (the docstring bound: |Σc²·10⁶| < 2⁶³ up to ~3·10⁶ tokens
    * per source; beyond that the 100 TB path is the same query over
    * DECIMAL(38,0), a type change, not a plan change).
    *
    * Shape: one explode → one (source, token) map-combined count → one
    * per-source rollup; output one row per source (q183's exact shape —
    * the two richness views share a scan in a fused pipeline).
    */
  def yuleK(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .where(col("tok") =!= "")
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("v_types"),
        sum(col("c") * col("c")).as("sum_c2"))
      .withColumn("yule_k_x100",
        expr("(sum_c2 - n_tokens) * 1000000 div (n_tokens * n_tokens)"))
      .select(col("source"), col("n_tokens"), col("v_types"),
        col("sum_c2"), col("yule_k_x100"))

  def q232YuleK(s: SparkSession, dir: String): DataFrame =
    yuleK(tbl(s, dir, "documents")).orderBy(col("source"))

  // ----------------------------------------------------- Token burstiness

  /** q233: TOKEN BURSTINESS — the across-document Fano factor
    * (variance-to-mean ratio of per-document counts, zeros included) for
    * the top-20 corpus tokens (Church & Gale, "Poisson mixtures", 1995):
    * function words arrive ≈ Poisson (fano ≈ 1), content/topic words are
    * bursty (a doc that mentions one mentions it many times — fano ≫ 1),
    * and boilerplate stamped once per page undershoots. With D docs,
    * T = Σc total occurrences and S2 = Σc² over the docs containing the
    * token, var/mean over ALL D docs collapses to the closed form
    *
    *   fano_x1000 = (D·S2 − T²) · 1000 div (D·T)
    *
    * — absent docs contribute zeros without ever materializing them (the
    * q202 absent-source fold). Top-20 by (total desc, tok) via the
    * vocabulary-sized ranking window (q153/q211's one legitimate small
    * global sort).
    *
    * Shape: one explode → one (doc, token) map-combined count → one
    * token-keyed rollup (vocabulary-sized) → the 20-row cut; the D
    * scalar enters as a 1-row broadcast cross join (the repo's
    * O(1)-scalar discipline).
    */
  def burstiness(docs: DataFrame, k: Int = 20): DataFrame = {
    val d = docs.agg(count(lit(1)).as("n_docs"))
    val tok = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .where(col("tok") =!= "")
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("tok"))
      .agg(sum(col("c")).as("total_c"), count(lit(1)).as("df"),
        sum(col("c") * col("c")).as("s2"))
    val w = Window.orderBy(col("total_c").desc, col("tok"))
    tok.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .crossJoin(broadcast(d))
      .withColumn("mean_x1000", expr("total_c * 1000 div n_docs"))
      .withColumn("fano_x1000",
        expr("(n_docs * s2 - total_c * total_c) * 1000 div (n_docs * total_c)"))
      .withColumn("bursty", col("fano_x1000") > 2000)
      .select(col("rank"), col("tok"), col("total_c"), col("df"),
        col("mean_x1000"), col("fano_x1000"), col("bursty"))
  }

  def q233Burstiness(s: SparkSession, dir: String): DataFrame =
    burstiness(tbl(s, dir, "documents")).orderBy(col("rank"))

  // ------------------------------------------------- Stylometric distance

  /** q236: STYLOMETRIC SOURCE DISTANCE — a pairwise chi-squared distance
    * between sources over the corpus's top-30 most frequent words
    * (Burrows' "Delta" frame, Literary & Linguistic Computing 2002, with
    * Kilgarriff's chi-squared corpus-comparison statistic in place of
    * z-scores — Delta's σ normalization needs an irrational sqrt; χ² is
    * exact in integers): per source the ×1e6 relative frequency r of
    * each marker word within the source's marker mass, then per pair
    *
    *   chi2_x1e6 = Σ_w (r_a − r_b)² div (r_a + r_b)    over r_a+r_b > 0.
    *
    * Near-zero distance between two "different" sources is the mirror /
    * same-author / same-template signal that corroborates q209's
    * content-fingerprint view with a purely distributional one (catches
    * paraphrased mirrors content hashing misses).
    *
    * Shape: marker selection is the vocabulary-sized top-30 ranking
    * (q211 discipline); per-source profiles are |sources|×30 rows that
    * BROADCAST into the pair join; the corpus pays one (source, token)
    * map-combined count. The S×S pair table is tiny at any corpus size
    * (sources, not documents).
    */
  def styloChi2(docs: DataFrame, k: Int = 30): DataFrame = {
    val tc = docs
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .where(col("tok") =!= "")
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val markers = tc.groupBy(col("tok")).agg(sum(col("c")).as("tc"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("tc").desc, col("tok"))))
      .where(col("rank") <= k)
      .select(col("tok"))
    val prof = tc.join(broadcast(markers), "tok")
      .withColumn("mass", sum(col("c")).over(
        Window.partitionBy(col("source"))))
      .withColumn("r", expr("c * 1000000 div mass"))
      .select(col("source"), col("tok"), col("r"))
    prof.as("a").join(prof.as("b"),
        col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        col("a.r").as("ra"), col("b.r").as("rb"))
      .where(col("ra") + col("rb") > 0)
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_terms"),
        sum(expr("(ra - rb) * (ra - rb) div (ra + rb)")).as("chi2_x1e6"))
      .select(col("src_a"), col("src_b"), col("n_terms"), col("chi2_x1e6"))
  }

  def q236StyloChi2(s: SparkSession, dir: String): DataFrame =
    styloChi2(tbl(s, dir, "documents")).orderBy(col("src_a"), col("src_b"))

  // ---------------------------------------------- Distributional neighbors

  /** q237: DISTRIBUTIONAL NEIGHBORS by SPPMI cosine — the count-based
    * word-similarity backbone (Levy & Goldberg, NeurIPS 2014 showed
    * skip-gram factorizes exactly this matrix): each token's context
    * vector is its shifted-positive-PMI weight against every context
    * token, built from ADJACENT-pair counts (window 1, both directions),
    * with the repo's exact-integer bitlen log surrogate
    * `w = max(0, bitlen(c_xy·N) − bitlen(c_x·c_y))` (the q166 PMI
    * device). Neighbor ranking uses SQUARED cosine ×1e6 — SPPMI
    * components are ≥ 0, so dot ≥ 0 and cos² is monotone in cos, and
    * `dot²·1e6 div (‖a‖²·‖b‖²)` needs no irrational sqrt. Top-3
    * neighbors per token; the "which words behave alike" table that
    * drives query expansion and synonym-aware dedup.
    *
    * Scale shape: everything after the one (token, context) adjacency
    * count is VOCABULARY-sized, and both the vector space and the
    * neighbor self-join are hard-bounded by the top-100 marker cut
    * (q236's device) + the w > 0 SPPMI sparsification — the context
    * self-join is ≤ 100² rows joined on ctx at any corpus size. The
    * corpus pays one zip_with adjacency explode + one map-combined
    * count.
    */
  def sppmiNeighbors(docs: DataFrame, cap: Int = 100,
                     topK: Int = 3): DataFrame = {
    val t = tokens(col("text"))
    val adj = docs
      .select(explode(zip_with(
        slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .where(col("a") =!= "" && col("b") =!= "")
    // directed both ways so c_x is each token's full adjacency mass
    val dir2 = adj.select(col("a").as("x"), col("b").as("ctx"))
      .unionAll(adj.select(col("b").as("x"), col("a").as("ctx")))
    val cxy = dir2.groupBy(col("x"), col("ctx")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val cx = cxy.groupBy(col("x")).agg(sum(col("c")).as("cx"))
    val top = cx
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cx").desc, col("x"))))
      .where(col("rank") <= cap)
      .select(col("x"), col("cx"))
    val n = cxy.agg(sum(col("c")).as("n"))
    val vec = cxy
      .join(broadcast(top), "x")
      .join(broadcast(top.select(col("x").as("ctx"), col("cx").as("cctx"))),
        "ctx")
      .crossJoin(broadcast(n))
      .select(col("x"), col("ctx"),
        greatest(lit(0L),
          (length(bin(col("c") * col("n"))) -
            length(bin(col("cx") * col("cctx")))).cast("long")).as("w"))
      .where(col("w") > 0)
      .localCheckpoint()
    val norms = vec.groupBy(col("x"))
      .agg(sum(col("w") * col("w")).as("n2"))
      .where(col("n2") > 0)
    val dots = vec.as("va").join(vec.as("vb"),
        col("va.ctx") === col("vb.ctx") && col("va.x") =!= col("vb.x"))
      .groupBy(col("va.x").as("tok"), col("vb.x").as("nbr"))
      .agg(sum(col("va.w") * col("vb.w")).as("dot"))
    val sim = dots
      .join(broadcast(norms.select(col("x").as("tok"), col("n2").as("na2"))),
        "tok")
      .join(broadcast(norms.select(col("x").as("nbr"), col("n2").as("nb2"))),
        "nbr")
      .withColumn("cos2_x1e6", expr("dot * dot * 1000000 div (na2 * nb2)"))
    val w = Window.partitionBy(col("tok"))
      .orderBy(col("cos2_x1e6").desc, col("nbr"))
    sim.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
      .select(col("tok"), col("rank"), col("nbr"), col("dot"),
        col("cos2_x1e6"))
      .orderBy(col("tok"), col("rank"))
  }

  def q237Sppmi(s: SparkSession, dir: String): DataFrame =
    sppmiNeighbors(tbl(s, dir, "documents"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q182_rake" -> q182Rake _,
    "q183_unseen_vocab" -> q183UnseenVocab _,
    "q184_textrank" -> q184Textrank _,
    "q188_texttile" -> q188Texttile _,
    "q231_readability" -> q231Readability _,
    "q232_yule_k" -> q232YuleK _,
    "q233_burstiness" -> q233Burstiness _,
    "q236_stylo_chi2" -> q236StyloChi2 _,
    "q237_sppmi_neighbors" -> q237Sppmi _)

  private val dkTokens =
    """regexp_split_to_array(lower(trim(text)), '[ \t\n\f\r\x0B]+')"""

  val oracles: Map[String, String] = Map(
    // q182: same token walk (unnest + generate_subscripts), same window
    // running phrase-id sum, same per-doc deg/freq integer scores
    "q182_rake" ->
      s"""WITH tk0 AS (
         |  SELECT doc_id, unnest($dkTokens) AS tok,
         |         generate_subscripts($dkTokens, 1) AS pos FROM documents),
         |tk AS (
         |  SELECT doc_id, pos, tok,
         |    regexp_replace(tok, '^[^a-z0-9]+|[^a-z0-9]+$$', '', 'g') AS norm,
         |    regexp_matches(tok, '[.!?,;:]$$') AS brk
         |  FROM tk0),
         |tk2 AS (
         |  SELECT doc_id, pos, norm,
         |    (norm IN ('the','a','of','and','to','in') OR norm = '') AS is_delim,
         |    brk FROM tk),
         |tkc AS (
         |  SELECT doc_id, pos, norm, is_delim,
         |    CASE WHEN is_delim OR coalesce(
         |        lag(brk) OVER (PARTITION BY doc_id ORDER BY pos), false)
         |      THEN 1 ELSE 0 END AS cut
         |  FROM tk2),
         |tk3 AS (
         |  SELECT doc_id, pos, norm, is_delim,
         |    SUM(cut) OVER (PARTITION BY doc_id ORDER BY pos) AS pid
         |  FROM tkc),
         |members AS (SELECT doc_id, pid, pos, norm FROM tk3 WHERE NOT is_delim),
         |phrases AS (
         |  SELECT doc_id, pid, COUNT(*) AS plen,
         |         string_agg(norm, ' ' ORDER BY pos) AS phrase
         |  FROM members GROUP BY doc_id, pid),
         |wordscore AS (
         |  SELECT m.doc_id, m.norm,
         |    CAST(SUM(p.plen) * 1000 // COUNT(*) AS BIGINT) AS wscore
         |  FROM members m JOIN phrases p USING (doc_id, pid)
         |  GROUP BY m.doc_id, m.norm),
         |scored AS (
         |  SELECT m.doc_id, m.pid, SUM(w.wscore) AS score
         |  FROM members m JOIN wordscore w ON m.doc_id = w.doc_id AND m.norm = w.norm
         |  GROUP BY m.doc_id, m.pid),
         |dedup AS (
         |  SELECT s.doc_id, p.phrase, MAX(s.score) AS score
         |  FROM scored s JOIN phrases p USING (doc_id, pid)
         |  GROUP BY s.doc_id, p.phrase),
         |ranked AS (
         |  SELECT doc_id, phrase, score,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, phrase) AS rank
         |  FROM dedup)
         |SELECT doc_id, CAST(rank AS BIGINT) AS rank, phrase,
         |  CAST(score AS BIGINT) AS score
         |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    // q188: same pseudo-sentence blocks, bounded-gap explode, integer
    // cosine surrogate, window peaks, and squared-sigma cutoff
    "q188_texttile" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest($dkTokens) AS tok,
         |         generate_subscripts($dkTokens, 1) AS pos FROM documents),
         |tc AS (
         |  SELECT doc_id, (pos - 1) // $TileW AS ps, tok, COUNT(*) AS c
         |  FROM tk WHERE tok <> '' GROUP BY doc_id, (pos - 1) // $TileW, tok),
         |nps AS (SELECT doc_id, MAX(ps) + 1 AS n_ps FROM tc GROUP BY doc_id),
         |lft AS (
         |  SELECT doc_id, gap, tok, SUM(c) AS cl FROM (
         |    SELECT doc_id, tok, c,
         |      unnest(generate_series(ps + 1, ps + $TileK)) AS gap FROM tc)
         |  GROUP BY doc_id, gap, tok),
         |rgt AS (
         |  SELECT doc_id, gap, tok, SUM(c) AS cr FROM (
         |    SELECT doc_id, tok, c,
         |      unnest(generate_series(ps - $TileK + 1, ps)) AS gap FROM tc)
         |  WHERE gap >= 1 GROUP BY doc_id, gap, tok),
         |dt AS (
         |  SELECT l.doc_id, l.gap, SUM(l.cl * r.cr) AS dot
         |  FROM lft l JOIN rgt r ON l.doc_id = r.doc_id AND l.gap = r.gap
         |    AND l.tok = r.tok
         |  GROUP BY l.doc_id, l.gap),
         |nl AS (SELECT doc_id, gap, SUM(cl * cl) AS sql_ FROM lft
         |       GROUP BY doc_id, gap),
         |nr AS (SELECT doc_id, gap, SUM(cr * cr) AS sqr_ FROM rgt
         |       GROUP BY doc_id, gap),
         |sim AS (
         |  SELECT nl.doc_id, nl.gap,
         |    2000 * coalesce(dt.dot, 0) // (nl.sql_ + nr.sqr_) AS sim
         |  FROM nl JOIN nr ON nl.doc_id = nr.doc_id AND nl.gap = nr.gap
         |  LEFT JOIN dt ON dt.doc_id = nl.doc_id AND dt.gap = nl.gap
         |  JOIN nps ON nps.doc_id = nl.doc_id
         |  WHERE nl.gap BETWEEN 1 AND nps.n_ps - 1),
         |dep AS (
         |  SELECT doc_id, gap, sim,
         |    greatest(sim, coalesce(MAX(sim) OVER (PARTITION BY doc_id
         |      ORDER BY gap ROWS BETWEEN $TileK PRECEDING AND 1 PRECEDING), 0))
         |    + greatest(sim, coalesce(MAX(sim) OVER (PARTITION BY doc_id
         |      ORDER BY gap ROWS BETWEEN 1 FOLLOWING AND $TileK FOLLOWING), 0))
         |    - 2 * sim AS depth
         |  FROM sim),
         |st AS (SELECT doc_id, COUNT(*) AS n, SUM(depth) AS sd,
         |         SUM(depth * depth) AS sdd FROM dep GROUP BY doc_id)
         |SELECT d.doc_id, CAST(d.gap AS BIGINT) AS gap,
         |  CAST(d.sim AS BIGINT) AS sim, CAST(d.depth AS BIGINT) AS depth,
         |  (2 * st.n * d.depth - 2 * st.sd >= 0 OR
         |   (2 * st.n * d.depth - 2 * st.sd) * (2 * st.n * d.depth - 2 * st.sd)
         |     <= st.n * st.sdd - st.sd * st.sd) AS boundary
         |FROM dep d JOIN st ON st.doc_id = d.doc_id
         |ORDER BY d.doc_id, d.gap""".stripMargin,
    // q183: same per-source type-frequency spectrum and scaled estimators
    "q183_unseen_vocab" ->
      s"""WITH tk AS (
         |  SELECT source, unnest($dkTokens) AS tok FROM documents),
         |tc AS (SELECT source, tok, COUNT(*) AS c FROM tk
         |       WHERE tok <> '' GROUP BY source, tok),
         |agg AS (
         |  SELECT source, SUM(c) AS n_tokens, COUNT(*) AS v_types,
         |    SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
         |    SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
         |  FROM tc GROUP BY source)
         |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(v_types AS BIGINT) AS v_types, CAST(f1 AS BIGINT) AS f1,
         |  CAST(f2 AS BIGINT) AS f2,
         |  CAST(f1 * 1000000 // n_tokens AS BIGINT) AS p0_x1e6,
         |  CAST(CASE WHEN f2 > 0 THEN v_types * 100 + f1 * f1 * 100 // (2 * f2)
         |       ELSE v_types * 100 + f1 * (f1 - 1) * 100 // 2 END AS BIGINT)
         |    AS chao1_x100
         |FROM agg ORDER BY source""".stripMargin,
    // q184: same sentence split/cap, same bitlen-denominator edges, and
    // the 10-round fixed-point iteration unrolled as CTEs
    "q184_textrank" -> {
      def round(kk: Int): String =
        s"""w$kk AS (
           |  SELECT s.doc_id, s.idx,
           |    150000 + 850 * coalesce(SUM(e.w * p.ws // o.outsum), 0) // 1000
           |      AS ws
           |  FROM sent s
           |  LEFT JOIN edges e ON e.doc_id = s.doc_id AND e.dst = s.idx
           |  LEFT JOIN w${kk - 1} p ON p.doc_id = e.doc_id AND p.idx = e.src
           |  LEFT JOIN outsum o ON o.doc_id = e.doc_id AND o.src = e.src
           |  GROUP BY s.doc_id, s.idx)""".stripMargin
      s"""WITH sp AS (
         |  SELECT doc_id,
         |    unnest(regexp_split_to_array(lower(trim(text)), '[.!?]+')) AS raw,
         |    generate_subscripts(
         |      regexp_split_to_array(lower(trim(text)), '[.!?]+'), 1) AS sidx
         |  FROM documents),
         |s0 AS (
         |  SELECT doc_id, sidx,
         |    regexp_replace(raw,
         |      '^[ \\t\\n\\f\\r\\x0B]+|[ \\t\\n\\f\\r\\x0B]+$$', '', 'g') AS sent
         |  FROM sp),
         |sent AS (
         |  SELECT doc_id, sent,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY sidx) AS idx
         |  FROM s0 WHERE sent <> '' QUALIFY idx <= ${MaxSents}),
         |st AS (
         |  SELECT doc_id, idx,
         |    unnest(regexp_split_to_array(sent, '[ \\t\\n\\f\\r\\x0B]+')) AS tok
         |  FROM sent),
         |st2 AS (SELECT DISTINCT doc_id, idx, tok FROM st WHERE tok <> ''),
         |slen AS (
         |  SELECT doc_id, idx, length(bin(COUNT(*))) AS bl
         |  FROM st2 GROUP BY doc_id, idx),
         |edges AS (
         |  SELECT a.doc_id, a.idx AS src, b.idx AS dst,
         |    COUNT(*) * 1000 // (la.bl + lb.bl) AS w
         |  FROM st2 a
         |  JOIN st2 b ON a.doc_id = b.doc_id AND a.tok = b.tok
         |    AND a.idx <> b.idx
         |  JOIN slen la ON la.doc_id = a.doc_id AND la.idx = a.idx
         |  JOIN slen lb ON lb.doc_id = b.doc_id AND lb.idx = b.idx
         |  GROUP BY a.doc_id, a.idx, b.idx, la.bl, lb.bl
         |  HAVING COUNT(*) * 1000 // (la.bl + lb.bl) > 0),
         |outsum AS (
         |  SELECT doc_id, src, SUM(w) AS outsum FROM edges
         |  GROUP BY doc_id, src),
         |w0 AS (SELECT doc_id, idx, 1000000 AS ws FROM sent),
         |${(1 to 10).map(round).mkString(",\n")},
         |ranked AS (
         |  SELECT doc_id, idx, ws,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY ws DESC, idx) AS rank
         |  FROM w10)
         |SELECT r.doc_id, CAST(r.rank AS BIGINT) AS rank,
         |  CAST(r.idx AS BIGINT) AS sent_idx, CAST(r.ws AS BIGINT) AS score,
         |  md5(s.sent) AS sent_md5
         |FROM ranked r JOIN sent s ON s.doc_id = r.doc_id AND s.idx = r.idx
         |WHERE r.rank <= 2 ORDER BY r.doc_id, r.rank""".stripMargin
    },
    // q231: same token/sentence folds (list HOFs), same ×100 integer
    // formulas — both divisions have non-negative operands, so Spark's
    // truncating div and DuckDB's flooring // agree
    "q231_readability" ->
      s"""WITH base AS (
         |  SELECT doc_id,
         |    list_filter($dkTokens, t -> t <> '') AS toks,
         |    greatest(1, len(list_filter(
         |      regexp_split_to_array(lower(trim(text)), '[.!?]+'),
         |      x -> regexp_matches(x, '[^ \\t\\n\\f\\r\\x0B]')))) AS sents
         |  FROM documents),
         |c AS (
         |  SELECT doc_id,
         |    CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum')
         |      AS BIGINT) AS n_chars,
         |    CAST(len(toks) AS BIGINT) AS n_words,
         |    CAST(sents AS BIGINT) AS n_sents
         |  FROM base WHERE len(toks) > 0)
         |SELECT doc_id, n_chars, n_words, n_sents,
         |  CAST(471 * n_chars // n_words + 50 * n_words // n_sents - 2143
         |    AS BIGINT) AS ari_x100,
         |  CAST(588 * n_chars // n_words - 2960 * n_sents // n_words - 1580
         |    AS BIGINT) AS cli_x100,
         |  CASE WHEN 471 * n_chars // n_words + 50 * n_words // n_sents - 2143
         |         < 500 THEN 'elementary'
         |       WHEN 471 * n_chars // n_words + 50 * n_words // n_sents - 2143
         |         < 900 THEN 'middle'
         |       WHEN 471 * n_chars // n_words + 50 * n_words // n_sents - 2143
         |         < 1300 THEN 'high'
         |       ELSE 'college' END AS band
         |FROM c ORDER BY doc_id""".stripMargin,
    // q232: same (source, token) spectrum; Σc² ≥ Σc so the one division's
    // numerator is non-negative
    "q232_yule_k" ->
      s"""WITH tk AS (SELECT source, unnest($dkTokens) AS tok FROM documents),
         |tc AS (SELECT source, tok, COUNT(*) AS c FROM tk
         |       WHERE tok <> '' GROUP BY source, tok),
         |agg AS (SELECT source, SUM(c) AS n_tokens, COUNT(*) AS v_types,
         |               SUM(c * c) AS sum_c2
         |        FROM tc GROUP BY source)
         |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(v_types AS BIGINT) AS v_types,
         |  CAST(sum_c2 AS BIGINT) AS sum_c2,
         |  CAST((sum_c2 - n_tokens) * 1000000 // (n_tokens * n_tokens)
         |    AS BIGINT) AS yule_k_x100
         |FROM agg ORDER BY source""".stripMargin,
    // q233: same (doc, token) counts, closed-form Fano with zeros folded;
    // D·S2 ≥ T² (Cauchy–Schwarz) keeps the numerator non-negative
    "q233_burstiness" ->
      s"""WITH d AS (SELECT COUNT(*) AS n_docs FROM documents),
         |tk AS (SELECT doc_id, unnest($dkTokens) AS tok FROM documents),
         |tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tk
         |       WHERE tok <> '' GROUP BY doc_id, tok),
         |t AS (SELECT tok, SUM(c) AS total_c, COUNT(*) AS df,
         |             SUM(c * c) AS s2
         |      FROM tc GROUP BY tok),
         |r AS (SELECT tok, total_c, df, s2,
         |        row_number() OVER (ORDER BY total_c DESC, tok) AS rank
         |      FROM t)
         |SELECT CAST(rank AS BIGINT) AS rank, tok,
         |  CAST(total_c AS BIGINT) AS total_c, CAST(df AS BIGINT) AS df,
         |  CAST(total_c * 1000 // n_docs AS BIGINT) AS mean_x1000,
         |  CAST((n_docs * s2 - total_c * total_c) * 1000
         |    // (n_docs * total_c) AS BIGINT) AS fano_x1000,
         |  ((n_docs * s2 - total_c * total_c) * 1000
         |    // (n_docs * total_c)) > 2000 AS bursty
         |FROM r, d WHERE rank <= 20 ORDER BY rank""".stripMargin,
    // q236: same top-30 marker cut, same ×1e6 per-source profile, same
    // per-term chi-squared fold ((ra−rb)² ≥ 0 keeps div/floor identical)
    "q236_stylo_chi2" ->
      s"""WITH tk AS (SELECT source, unnest($dkTokens) AS tok FROM documents),
         |tc AS (SELECT source, tok, COUNT(*) AS c FROM tk
         |       WHERE tok <> '' GROUP BY source, tok),
         |tot AS (SELECT tok, SUM(c) AS tcc FROM tc GROUP BY tok),
         |mk AS (SELECT tok FROM (
         |    SELECT tok, row_number() OVER (ORDER BY tcc DESC, tok) AS rank
         |    FROM tot) WHERE rank <= 30),
         |prof AS (
         |  SELECT source, tc.tok,
         |    c * 1000000 // SUM(c) OVER (PARTITION BY source) AS r
         |  FROM tc JOIN mk ON mk.tok = tc.tok)
         |SELECT a.source AS src_a, b.source AS src_b,
         |  CAST(COUNT(*) AS BIGINT) AS n_terms,
         |  CAST(SUM((a.r - b.r) * (a.r - b.r) // (a.r + b.r)) AS BIGINT)
         |    AS chi2_x1e6
         |FROM prof a JOIN prof b ON a.tok = b.tok AND a.source < b.source
         |WHERE a.r + b.r > 0
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q237: same adjacency counts (positional self-join replays the
    // zip_with pairing exactly), same bitlen SPPMI weights, same squared-
    // cosine ranking — every number an exact BIGINT
    "q237_sppmi_neighbors" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest($dkTokens) AS tok,
         |         generate_subscripts($dkTokens, 1) AS pos FROM documents),
         |adj AS (
         |  SELECT a.tok AS a, b.tok AS b
         |  FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  WHERE a.tok <> '' AND b.tok <> ''),
         |d2 AS (SELECT a AS x, b AS ctx FROM adj
         |       UNION ALL SELECT b, a FROM adj),
         |cxy AS (SELECT x, ctx, COUNT(*) AS c FROM d2 GROUP BY x, ctx),
         |cx AS (SELECT x, SUM(c) AS cx FROM cxy GROUP BY x),
         |top AS (SELECT x, cx FROM (
         |    SELECT x, cx, row_number() OVER (ORDER BY cx DESC, x) AS rank
         |    FROM cx) WHERE rank <= 100),
         |nn AS (SELECT SUM(c) AS n FROM cxy),
         |vec0 AS (
         |  SELECT cxy.x, cxy.ctx,
         |    greatest(0, length(bin(cxy.c * nn.n)) -
         |                length(bin(tx.cx * tc.cx))) AS w
         |  FROM cxy JOIN top tx ON tx.x = cxy.x
         |           JOIN top tc ON tc.x = cxy.ctx, nn),
         |vec AS (SELECT x, ctx, w FROM vec0 WHERE w > 0),
         |norms AS (SELECT x, SUM(w*w) AS n2 FROM vec GROUP BY x
         |          HAVING SUM(w*w) > 0),
         |dots AS (
         |  SELECT va.x AS tok, vb.x AS nbr, SUM(va.w * vb.w) AS dot
         |  FROM vec va JOIN vec vb ON va.ctx = vb.ctx AND va.x <> vb.x
         |  GROUP BY 1, 2),
         |sim AS (
         |  SELECT tok, nbr, dot,
         |    dot * dot * 1000000 // (na.n2 * nb.n2) AS cos2
         |  FROM dots JOIN norms na ON na.x = dots.tok
         |            JOIN norms nb ON nb.x = dots.nbr),
         |r AS (SELECT tok, nbr, dot, cos2,
         |    row_number() OVER (PARTITION BY tok
         |      ORDER BY cos2 DESC, nbr) AS rank
         |  FROM sim)
         |SELECT tok, CAST(rank AS BIGINT) AS rank, nbr,
         |  CAST(dot AS BIGINT) AS dot, CAST(cos2 AS BIGINT) AS cos2_x1e6
         |FROM r WHERE rank <= 3 ORDER BY tok, rank""".stripMargin)
}
