package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators of the data-selection family: DSIR
  * importance weighting (Xie et al., NeurIPS 2023 — hashed-n-gram
  * importance resampling, the public method behind targeted pre-training
  * mixes), domain/source-level quality rollups (the RefinedWeb-style
  * "judge the site, not just the page" gate), and CCNet-style
  * SEGMENT-level perplexity cleaning (Wenzek et al., LREC 2020 — score
  * and drop low-quality spans, keep the rest of the document).
  *
  * All three follow the repo's exact-integer discipline (q55/q84
  * precedent): log-probabilities are floor-log2 bit surrogates
  * (`length(bin(x))`, bit-identical in Spark and DuckDB), ratios ship as
  * `*_x100`/`*_x1000` BIGINTs, so every row hash-matches the DuckDB
  * oracle.
  *
  * Scale shape: model sides (256 hash buckets; per-source rollup; the
  * unigram vocabulary) are explicitly BROADCAST — the Zipf-head defense
  * established at q55/q56/q84, with [[AdvancedOps.saltedJoin]] the
  * beyond-broadcast fallback; the corpus pays one explode and one or two
  * map-combined keyed aggregates regardless of model size.
  */
object CurationOps {
  import Q._
  import TextOps.WS

  private def tokens(c: Column): Column = split(lower(trim(c)), WS)

  /** Number of hashed feature buckets (DSIR's hashed n-gram space). */
  private val Buckets = 256

  /** Per-feature average importance (x100) at or above this resamples the
    * doc in. Fixed constant between the two planted-class medians
    * (measured −66 vs −36 at sf0.001, −65 vs −38 at sf0.01 — the
    * floor-log2 surrogate is systematically negative, so 0 is NOT the
    * neutral point; CurationSpec pins the separation).
    */
  private val DsirKeepX100 = -55L

  /** q103: DSIR importance weights — hashed-bigram importance resampling
    * (Xie et al., NeurIPS 2023): estimate a target distribution and the
    * raw distribution over [[Buckets]] hashed bigram features, then
    * weight every document by
    *
    *   w_bits(doc) = Σ_f [bitlen(ct_f+1) − bitlen(Ct+B)]
    *               − [bitlen(cr_f+1) − bitlen(Cr+B)]
    *
    * — the floor-log2 surrogate of log p_target(doc) − log p_raw(doc)
    * under add-one smoothing. `kept` = per-feature average ≥
    * [[DsirKeepX100]], the deterministic analog of resampling
    * proportional to the importance ratio.
    *
    * The harness corpus is IID word soup (no natural sub-distribution to
    * steer toward — measured: lang slices are indistinguishable), so the
    * driver query targets the PLANTED class-0 slice of
    * [[LmOps.plantedWire]]'s wire corpus — the planted truth makes the
    * separation itself assertable: CurationSpec pins 100% target recall
    * at this threshold, and the oracle reproduces every weight exactly.
    *
    * Scale: bigram pairing is a per-doc `lead` window (state bounded by
    * one document); both distributions live in ONE 256-row broadcast
    * table — the corpus is exploded once and aggregated once per doc.
    */
  def q103DsirWeights(s: SparkSession, dir: String): DataFrame =
    dsirWeights(
      LmOps.plantedWire(tbl(s, dir, "documents"))
        .select(col("doc_id"), col("cls_true"), col("wire").as("text")),
      col("cls_true") === 0)

  /** The operator proper over any (doc_id, text, …) table; `isTarget`
    * selects the rows whose distribution the corpus is steered toward.
    */
  def dsirWeights(d: DataFrame, isTarget: Column): DataFrame = {
    val tk = d.select(col("doc_id"), isTarget.as("tgt"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val feats = tk.withColumn("nxt", lead(col("tok"), 1).over(w))
      .where(col("nxt").isNotNull)
      .select(col("doc_id"), col("tgt"),
        conv(substring(md5(concat(col("tok"), lit(" "), col("nxt"))
          .cast("binary")), 1, 2), 16, 10).cast("int").as("b"))
    val dist = feats.groupBy(col("b")).agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cr"))
    // model-size stats from the 256-bucket table, not a corpus re-scan
    val stats = dist.agg(sum(col("ct")).as("sct"), sum(col("cr")).as("scr"))
    val fbits = length(bin(col("ct") + 1)) - length(bin(col("cr") + 1))
    val kbits = length(bin(col("scr") + Buckets)) -
      length(bin(col("sct") + Buckets))
    feats
      .join(broadcast(dist), Seq("b"))
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("feats"),
        (sum(fbits.cast("long")) + count(lit(1)) * max(kbits.cast("long")))
          .as("w_bits"))
      .select(col("doc_id"), col("feats"), col("w_bits"),
        round(lit(100.0) * col("w_bits") / col("feats"))
          .cast("long").as("avg_bits_x100"))
      .withColumn("kept", col("avg_bits_x100") >= DsirKeepX100)
      .orderBy(col("doc_id"))
  }

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** Per-source median stopword density (x1000) at or above this keeps
    * the whole source — the domain-level admission floor.
    */
  private val DomainFloorX1000 = 55L

  /** q106: domain-level quality rollup + whole-source gate — the
    * RefinedWeb/Gopher practice of filtering by SITE statistics, because
    * a source whose median page is junk poisons even its good-looking
    * pages (SEO farms). Per-doc quality = stopword density x1000 (the
    * q17 integer signal); per source: doc count, rounded mean, and the
    * EXACT rank-based median (the value at row ⌊(n+1)/2⌋ ordered by
    * (q, doc_id) — deterministic under ties); `dom_kept` gates the whole
    * source at [[DomainFloorX1000]].
    *
    * Scale: one map-combined per-source aggregate for the mean; the
    * median costs one window shuffle keyed by source — at 100 TB the
    * per-source groups are the unit of parallelism and the rollup output
    * (one row per registered domain) is broadcast back wherever the gate
    * is applied.
    */
  /** Per-doc stopword-density quality (x1000) — the q17 integer signal,
    * shared by q106 and q112.
    */
  private def docQuality(d: DataFrame): DataFrame = {
    val stop = Stopwords.map(w => when(col("tok") === w, 1L).otherwise(0L))
      .reduce(_ + _)
    d.select(col("doc_id"), col("source"),
        explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("words"), sum(stop).as("stops"))
      .select(col("doc_id"), col("source"),
        round(lit(1000.0) * col("stops") / col("words"))
          .cast("long").as("q1000"))
  }

  def q106DomainRollup(s: SparkSession, dir: String): DataFrame = {
    val q = docQuality(tbl(s, dir, "documents"))
    val w = Window.partitionBy(col("source")).orderBy(col("q1000"), col("doc_id"))
    q.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        round(sum(col("q1000")).cast("double") / count(lit(1)))
          .cast("long").as("avg_q_x1000"),
        max(when(col("rn") === floor((col("n") + 1) / 2).cast("long"),
          col("q1000"))).as("med_q_x1000"),
        min(col("q1000")).as("min_q_x1000"),
        max(col("q1000")).as("max_q_x1000"))
      .withColumn("dom_kept", col("med_q_x1000") >= DomainFloorX1000)
      .orderBy(col("source"))
  }

  /** q163: DATA CARD — the per-source datasheet every released corpus
    * publishes (Gebru et al., "Datasheets for Datasets", CACM 2021;
    * Dolma/FineWeb ship exactly this rollup): volume (docs/tokens/
    * chars), exact-duplicate share (corpus-wide md5 groups, the q15
    * key), quality-gate pass share (q17's integer rule), dominant
    * language with its share, and the exact median length (q106's rank
    * discipline: rn == (n+1) div 2 over a (value, doc_id) total order).
    * One row per source, every number a BIGINT or basis points.
    *
    * Scale shape: one md5-keyed join (dup membership — the q15/q51
    * discipline), one map-combined source aggregate, a (source, lang)
    * aggregate of ≤ S·L rows, and the per-source median window; the
    * tiny per-source frames re-enter by BROADCAST join.
    */
  def q163DataCard(s: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val base = tbl(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        size(t).cast("long").as("ntok"),
        size(filter(t, x => x.isin(TextOps.stopwords: _*)))
          .cast("long").as("stop"),
        md5(col("text").cast("binary")).as("fp"))
      .localCheckpoint() // feeds dup join, source agg, lang agg, median
    val fpCnt = base.groupBy(col("fp")).agg(count(lit(1)).as("c"))
    val srcAgg = base.join(fpCnt, "fp")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("dup_docs"),
        sum(when(col("ntok") >= 10 && col("stop") * 20 >= col("ntok"), 1L)
          .otherwise(0L)).as("pass_docs"))
    val lw = Window.partitionBy(col("source"))
      .orderBy(col("lc").desc, col("lang"))
    val topLang = base.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("lc"))
      .withColumn("rn", row_number().over(lw))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("lc"))
    val mw = Window.partitionBy(col("source"))
      .orderBy(col("n_chars"), col("doc_id"))
    val med = base
      .withColumn("rn", row_number().over(mw))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
      .filter(col("rn") === floor((col("n") + 1) / 2).cast("long"))
      .select(col("source"), col("n_chars").as("len_p50"))
    srcAgg.join(broadcast(topLang), "source").join(broadcast(med), "source")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        expr("dup_docs * CAST(10000 AS BIGINT) DIV n_docs").as("dup_bp"),
        expr("pass_docs * CAST(10000 AS BIGINT) DIV n_docs").as("pass_bp"),
        col("top_lang"),
        expr("lc * CAST(10000 AS BIGINT) DIV n_docs").as("top_lang_bp"),
        col("len_p50"))
      .orderBy(col("source"))
  }

  /** Tokens per cleaning segment and the per-segment keep threshold
    * (average bits x100 per token). The harness LM is near-uniform over
    * its ~60-word vocabulary, so per-token cost concentrates at exactly
    * 5.00 bits; 510 cuts precisely the segments carrying rare/OOV tokens
    * (measured: 24 of 1346 segments at sf0.001).
    */
  private val SegTokens = 25
  private val SegBitsX100 = 510L

  /** q107: CCNet-style segment-level perplexity cleaning (Wenzek 2020
    * §4.3 — score SPANS under a held-out LM and drop only the bad spans,
    * instead of q84's whole-document verdict): split each document into
    * [[SegTokens]]-token segments, score each under the q84 unigram LM
    * (trained on the doc_id %5 ≠ 0 split, add-one smoothing, integer
    * bits), drop segments whose per-token average exceeds
    * [[SegBitsX100]], and rebuild the surviving text in order. The md5
    * of the rebuilt text crosses to the oracle, so the REBUILD (not just
    * the counts) is hash-verified; fully-dropped docs ship kept_words=0
    * with md5("").
    *
    * Scale: one explode; the vocabulary joins BROADCAST; one
    * (doc, seg)-keyed map-combined aggregate for scores and one
    * doc-keyed rebuild aggregate — the rebuild concatenation is the only
    * O(doc-length) state and it is bounded by one document per key.
    */
  def q107ParagraphClean(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents")
    val tk = d.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("seg", floor(col("pos") / SegTokens).cast("long"))
    val freq = tk.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val stats = freq.agg((sum(col("cnt")) + count(lit(1))).as("tv"))
    val bits = length(bin(col("tv"))) -
      length(bin(coalesce(col("cnt"), lit(0L)) + 1))
    val scored = tk.join(broadcast(freq), Seq("tok"), "left")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("seg"), col("pos"), col("tok"),
        bits.cast("long").as("tb"))
      .localCheckpoint() // scored once; segment verdicts and rebuild share it
    val segs = scored.groupBy(col("doc_id"), col("seg"))
      .agg(count(lit(1)).as("w"), sum(col("tb")).as("b"))
      .select(col("doc_id"), col("seg"),
        (round(lit(100.0) * col("b") / col("w")).cast("long") <= SegBitsX100)
          .as("seg_kept"))
    val stat = segs.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("segs"),
        sum(when(col("seg_kept"), 0L).otherwise(1L)).as("segs_dropped"))
    val rebuilt = scored.join(segs.where(col("seg_kept")), Seq("doc_id", "seg"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("kept_words"),
        md5(concat_ws(" ",
          transform(sort_array(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok"))).cast("binary")).as("kept_md5"))
    stat.join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("segs"), col("segs_dropped"),
        coalesce(col("kept_words"), lit(0L)).as("kept_words"),
        coalesce(col("kept_md5"), md5(lit("").cast("binary"))).as("kept_md5"))
      .orderBy(col("doc_id"))
  }

  /** q112: per-host CRAWL-BUDGET allocation — the frontier-sizing rule a
    * recurring crawl applies once it has judged its sources (q106): a
    * source's budget is a deterministic tier of its median quality
    * (≥70‰ → 15 docs, ≥60‰ → 10, else 5), and within each source the
    * budget is filled in md5-hash order (the q54/q67 discipline — adding
    * documents never flips an earlier pick). Output keeps EVERY doc with
    * its rank, the source tier and the keep flag, so the allocation is
    * auditable rather than a silent filter.
    *
    * Scale: the per-source median costs one source-keyed window (as
    * q106); the tier table is one row per source, broadcast back; the
    * ranking is a second source-keyed window over ids-only rows. At
    * web scale both windows partition on the host — the natural unit —
    * and no host's group exceeds its own page count.
    */
  def q112HostBudget(s: SparkSession, dir: String): DataFrame = {
    val q = docQuality(tbl(s, dir, "documents")).localCheckpoint()
    val mw = Window.partitionBy(col("source")).orderBy(col("q1000"), col("doc_id"))
    val med = q.withColumn("rn", row_number().over(mw))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
      .groupBy(col("source"))
      .agg(max(when(col("rn") === floor((col("n") + 1) / 2).cast("long"),
        col("q1000"))).as("med_q_x1000"))
      .withColumn("budget",
        when(col("med_q_x1000") >= 70, 15L)
          .when(col("med_q_x1000") >= 60, 10L).otherwise(5L))
    val rw = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
    q.join(broadcast(med), "source")
      .withColumn("rnk", row_number().over(rw).cast("long"))
      .select(col("doc_id"), col("source"), col("med_q_x1000"),
        col("budget"), col("rnk"),
        (col("rnk") <= col("budget")).as("kept"))
      .orderBy(col("doc_id"))
  }

  /** q126: training-shard BIN PACKING by distributed first-fit-decreasing —
    * q86's concat-and-chunk packs a token stream by splitting documents
    * across window boundaries; this is the no-split alternative (document
    * integrity preserved, the attention-mask-friendly packing): each doc
    * goes whole into some 512-token bin, bins are closed at the cap, and
    * padding waste is bounded by the classic FFD guarantee.
    *
    * Distribution shape: docs hash into 16 independent packing buckets
    * (the parallel unit — at 100 TB, thousands of buckets), ONE explicit
    * repartition on the bucket key, an in-partition sort (n_tokens desc,
    * doc_id — a total order, so the result is identical regardless of
    * arrival order), and a streaming per-bucket first-fit pass inside
    * `mapPartitions` (the genuinely sequential kernel — state is one
    * fill-array per bucket, O(bins) not O(rows)). Oversize docs (> cap)
    * isolate into singleton bins automatically: they fit no bin,
    * including an empty one, so first-fit opens a fresh bin that can
    * never accept a second doc.
    *
    * Self-certifying `pack_ok` (sequential FFD is not SQL-expressible):
    * every bin is within cap (or a singleton oversize), every doc packed
    * exactly once, and per bucket AT MOST ONE bin ends ≤ half-full — the
    * provable FFD invariant (two bins ≤ C/2 cannot coexist: the item
    * that opened the later one would have fit the earlier), i.e. the
    * packing really is first-fit, not some cap-respecting shuffle.
    */
  def q126BinPack(s: SparkSession, dir: String): DataFrame = {
    val sized = tbl(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"),
        size(split(lower(trim(col("text"))), WS)).as("n_tokens"))
    binPack(sized, cap = 512, nBuckets = 16).orderBy(col("doc_id"))
  }

  /** Production no-split packing API behind q126 and `--pack`: input
    * (doc_id BIGINT or STRING, n_tokens INT) → (doc_id, bucket, bin_id,
    * n_tokens, pack_ok) with the id type preserved. The kernel is typed
    * on the id's string form (one encoder serves both id families; the
    * string cast of a BIGINT is injective, so identity — and the
    * within-ties sort order — stays a total order). See q126's doc for
    * the algorithm, distribution shape, and certificate.
    */
  def binPack(sized: DataFrame, cap: Int, nBuckets: Int): DataFrame = {
    val s = sized.sparkSession
    import s.implicits._
    val idType = sized.schema("doc_id").dataType
    val packed = sized
      .select(col("doc_id").cast("string").as("doc_id"), col("n_tokens"))
      .select(pmod(xxhash64(col("doc_id")), lit(nBuckets)).cast("int").as("bucket"),
        col("n_tokens"), col("doc_id"))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("n_tokens").desc, col("doc_id"))
      .as[(Int, Int, String)]
      .mapPartitions { rows =>
        val fills = scala.collection.mutable.ArrayBuffer.empty[Int]
        var curBucket = -1
        rows.map { case (bucket, n, id) =>
          if (bucket != curBucket) { curBucket = bucket; fills.clear() }
          var b = 0
          while (b < fills.length && fills(b) + n > cap) b += 1
          if (b == fills.length) fills += 0
          fills(b) += n
          (id, bucket, b, n)
        }
      }
      .toDF("doc_id", "bucket", "bin_id", "n_tokens")
      .withColumn("doc_id", col("doc_id").cast(idType))
      .localCheckpoint() // feeds the certificates and the output once
    val bins = packed.groupBy(col("bucket"), col("bin_id"))
      .agg(sum(col("n_tokens")).as("fill"), count(lit(1)).as("ndocs"))
    val bucketOk = bins.groupBy(col("bucket"))
      .agg(
        min((col("fill") <= cap || col("ndocs") === 1).cast("int")).as("capmin"),
        sum(when(col("fill") * 2 <= cap, 1).otherwise(0)).as("halfEmpty"))
      .select(col("bucket"),
        (col("capmin") === 1 && col("halfEmpty") <= 1).as("bucket_ok"))
    packed.join(broadcast(bucketOk), "bucket")
      .withColumn("dups",
        count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .select(col("doc_id"), col("bucket"), col("bin_id"), col("n_tokens"),
        (col("bucket_ok") && col("dups") === 1).as("pack_ok"))
  }

  /** q133: CURRICULUM DECILES — exact global rank (score desc, doc_id) and
    * decile bucket for every document WITHOUT a global window (the
    * single-partition `Window.orderBy` is exactly the 100 TB anti-pattern
    * this replaces). Two-level scheme keyed on the VALUE: one map-combined
    * per-distinct-score histogram (bounded by the score domain, not the
    * corpus — token counts here; pre-bucketize via q114's bisection when
    * the domain is unbounded), an O(distinct-scores) driver prefix sum
    * (the established O(1)-ish read-back), offsets re-entering broadcast,
    * and a within-score row_number whose partitions are the score groups —
    * every window bounded, fully parallel. Quality-ordered curricula and
    * decile-capped mixes (the q88/q112 consumers) read this table.
    */
  def q133QualityDeciles(s: SparkSession, dir: String): DataFrame = {
    val scored = tbl(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"),
        size(split(lower(trim(col("text"))), WS)).cast("long").as("score"))
      .localCheckpoint() // one scan feeds the histogram and the rank join
    val hist = scored.groupBy(col("score")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    val n = hist.map(_._2).sum
    val offsets = hist.scanLeft((0L, 0L)) { case ((_, acc), (sc, c)) =>
      (sc, acc + c)
    }.sliding(2).collect { case Array((_, acc), (sc, _)) => (sc, acc) }.toSeq
    import s.implicits._
    val offDf = offsets.toDF("score", "off")
    scored.join(broadcast(offDf), "score")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("score")).orderBy(col("doc_id"))))
      .select(col("doc_id"), col("score"),
        (col("off") + col("rn")).as("rank"),
        floor((col("off") + col("rn") - 1) * 10 / lit(n)).cast("int").as("decile"))
      .orderBy(col("doc_id"))
  }

  /** Pool-adjacent-violators over per-bucket (count, positives), exact
    * rational arithmetic (pool means compared by Long cross-multiplication
    * — no float enters the merge decision, so the pooling is
    * deterministic and engine-independent). Returns one (n, sumY) pool
    * per input bucket, in bucket order. Public algorithm: Ayer et al.
    * 1955; Robertson & Wright's minimax characterization is the oracle.
    */
  private[graft] def pav(buckets: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val st = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    buckets.foreach { case (n, sy) =>
      var (cn, cy, w) = (n, sy, 1)
      // violator: previous pool mean >= current (ties merge too — PAV's
      // fitted sequence is strictly increasing between pools)
      while (st.nonEmpty && st.last._2 * cn >= cy * st.last._1) {
        val (pn, py, pw) = st.remove(st.length - 1)
        cn += pn; cy += py; w += pw
      }
      st += ((cn, cy, w))
    }
    st.toSeq.flatMap { case (n, sy, w) => Seq.fill(w)((n, sy)) }
  }

  /** q137: ISOTONIC CALIBRATION — fit a monotone score→P(label) map by
    * pool-adjacent-violators, the standard calibrator for a quality
    * classifier's raw scores before they become sampling probabilities
    * (q117/q118's consumer: a miscalibrated gate over- or under-samples
    * entire quality strata). Labels are planted with a deliberately
    * NON-monotone bucket→rate table so real pooling occurs.
    *
    * Distributed shape (the q133 discipline): ONE map-combined
    * per-score-bucket aggregate (bounded by the score domain, 50 here;
    * pre-bucketize via q114 bisection when unbounded), an O(buckets)
    * driver PAV in exact rational arithmetic, results re-entering as a
    * literal table. No per-doc window, no global sort, nothing wide.
    *
    * Oracle: DuckDB computes the fit INDEPENDENTLY via the minimax
    * characterization fit(i) = max_{l≤i} min_{r≥i} mean(y[l..r])
    * (Robertson & Wright) — a different algorithm entirely, so hash
    * equality checks PAV itself, not its transcription. Bucket-mean
    * doubles are quotients of exact ints; distinct rationals differ by
    * ≥ 1/(n·n) ≫ double ulp, so the float comparison is faithful and
    * both engines round the identical quotient to fit_x1e6.
    */
  def q137Isotonic(s: SparkSession, dir: String): DataFrame = {
    val sCol = (col("doc_id") % 50).as("s")
    val rate = element_at(
      array(lit(30), lit(60), lit(45), lit(80), lit(20)),
      ((col("doc_id") % 50) % 5 + 1).cast("int"))
    val y = (conv(substring(md5(concat(lit("y"),
      col("doc_id").cast("string")).cast("binary")), 1, 4), 16, 10)
      .cast("long") % 100 < rate).cast("long").as("y")
    val hist = tbl(s, dir, "documents")
      .select(sCol, y)
      .groupBy(col("s")).agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      .orderBy(col("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val fit = pav(hist.map { case (_, n, p) => (n, p) }.toSeq)
    import s.implicits._
    hist.zip(fit).map { case ((sc, n, p), (fn, fy)) =>
      (sc, n, p, math.round(1e6 * fy.toDouble / fn.toDouble))
    }.toSeq.toDF("s", "n", "pos", "fit_x1e6")
      .orderBy(col("s"))
  }

  /** q143: Flesch readability scoring (Flesch 1948; Kincaid et al. 1975 —
    * the oldest quality-scoring family web curation still runs). All-
    * integer surrogates so Spark and DuckDB agree bit-for-bit: words =
    * whitespace tokens (the q16/q57 idiom), sentences = `[.!?]+` runs
    * (floored at 1), syllables = `[aeiouy]+` vowel-group runs (floored at
    * one per word — the classic per-word floor lifted to the document).
    * Reading ease ×1000 and grade level ×100 use integer `div` with the
    * published coefficients scaled whole:
    *
    *   fre_x1000  = 206835 − (1015·w) div s − (84600·syl) div w
    *   fkgl_x100  = (3900·w) div s + (1180·syl) div w − 1559
    *
    * Scale shape: three stateless regex splits + arithmetic in one
    * WholeStageCodegen projection, zero shuffles beyond the contract
    * ORDER BY — the cheapest kind of quality gate there is.
    */
  def q143Readability(s: SparkSession, dir: String): DataFrame = {
    val words = size(split(lower(trim(col("text"))), WS)).cast("long")
    val sents = greatest(lit(1L),
      (size(split(col("text"), "[.!?]+")) - 1).cast("long"))
    val sylls = greatest(words,
      (size(split(lower(col("text")), "[aeiouy]+")) - 1).cast("long"))
    tbl(s, dir, "documents")
      .select(col("doc_id"), words.as("words"), sents.as("sents"),
        sylls.as("sylls"))
      .select(col("doc_id"), col("words"), col("sents"), col("sylls"),
        (lit(206835L) - expr("(1015 * words) div sents") -
          expr("(84600 * sylls) div words")).as("fre_x1000"),
        (expr("(3900 * words) div sents") +
          expr("(1180 * sylls) div words") - 1559L).as("fkgl_x100"))
      .withColumn("band",
        when(col("fre_x1000") >= 60000L, lit("easy"))
          .when(col("fre_x1000") >= 30000L, lit("standard"))
          .otherwise(lit("hard")))
      .orderBy(col("doc_id"))
  }

  /** q144: robust per-source length-outlier detection by MEDIAN ABSOLUTE
    * DEVIATION (Hampel's robust scale — the outlier screen that, unlike
    * mean±kσ, a single giant page cannot drag): per source the exact
    * lower median of n_chars, the exact lower median of |n_chars − med|,
    * and the count of docs beyond 3·MAD. A MAD of 0 (over half the
    * source at one length) degenerates to "any deviation is an outlier"
    * — the documented behavior, deterministic either way.
    *
    * Scale shape: exact medians via the q106 rn/n window discipline (two
    * source-keyed window shuffles); the per-source med/MAD tables re-enter
    * by BROADCAST; the final rollup is map-combined. The approximate
    * 100 TB path is the q44 histogram-sketch quantile — this operator is
    * the exact twin a low-cardinality source dimension affords.
    */
  def q144OutlierMad(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    def medOf(df: DataFrame, v: String, out: String): DataFrame = {
      val w = Window.partitionBy(col("source")).orderBy(col(v), col("doc_id"))
      df.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
        .groupBy(col("source"))
        .agg(max(when(col("rn") === floor((col("n") + 1) / 2).cast("long"),
          col(v))).as(out))
    }
    val med = medOf(d, "n_chars", "med_chars")
    val dev = d.join(broadcast(med), "source")
      .withColumn("dev", abs(col("n_chars") - col("med_chars")))
    val mad = medOf(dev, "dev", "mad_chars")
    dev.join(broadcast(mad), "source")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        first(col("med_chars")).as("med_chars"),
        first(col("mad_chars")).as("mad_chars"),
        sum(when(col("dev") > lit(3) * col("mad_chars"), 1L)
          .otherwise(0L)).as("n_outliers"),
        max(col("dev")).as("max_dev"))
      .orderBy(col("source"))
  }

  /** q147: DOMAIN DISTINCTIVENESS BY TOTAL-VARIATION DISTANCE — how far
    * each source's unigram distribution sits from the corpus-wide one,
    * TV(p_s, q) = ½·Σ_t |p_s(t) − q(t)|. The distribution-shift screen of
    * the data-selection family: a source whose token distribution is far
    * from the corpus mean is boilerplate, spam, or another language
    * (q103/q107 attack the same decision from the model side; this is
    * the model-free screen).
    *
    * EXACT-INTEGER discipline (q55/q114 precedent): with obs = count of
    * token t in source s, dt = Σ_t obs, cc = corpus count of t, ct = Σ cc,
    * the TV numerator over tokens PRESENT in s is Σ|obs·ct − dt·cc|, and
    * the absent-token mass folds in closed form to dt·(ct − Σ_present cc)
    * — so the full-vocabulary TV needs NO domain×vocabulary grid. Both
    * terms are exact BIGINTs; tv_ppm = num·10⁶ ÷ (2·dt·ct) by integer
    * division on both engines. Hash-identical, no float ordering anywhere.
    *
    * Scale shape: one explode → one (source, tok) map-combined aggregate;
    * the vocabulary side re-enters BROADCAST (the q55/q56 Zipf-head
    * discipline — [[AdvancedOps.saltedJoin]] is the beyond-broadcast
    * fallback), per-source totals broadcast too; nothing vocabulary-sized
    * shuffles twice, nothing corpus-sized shuffles more than once.
    */
  def q147DomainTv(s: SparkSession, dir: String): DataFrame = {
    val dom = tbl(s, dir, "documents")
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("obs"))
    val corp = dom.groupBy(col("tok")).agg(sum(col("obs")).as("cc"))
    val dts = dom.groupBy(col("source")).agg(sum(col("obs")).as("dt"))
    val ctDf = corp.agg(sum(col("cc")).as("ct"))
    dom.join(broadcast(corp), "tok")
      .join(broadcast(dts), "source")
      .crossJoin(broadcast(ctDf))
      .groupBy(col("source"), col("dt"), col("ct"))
      .agg(
        sum(abs(col("obs") * col("ct") - col("dt") * col("cc")))
          .as("present_num"),
        sum(col("cc")).as("cc_present"),
        count(lit(1)).as("vocab_in_source"))
      .select(col("source"), col("dt").as("dom_tokens"),
        col("ct").as("corpus_tokens"), col("vocab_in_source"),
        (col("present_num") + col("dt") * (col("ct") - col("cc_present")))
          .as("tv_num"), col("dt"), col("ct"))
      .withColumn("tv_ppm", expr(
        "tv_num * CAST(1000000 AS BIGINT) DIV (2 * dt * ct)"))
      .drop("dt", "ct")
      .orderBy(col("source"))
  }

  /** q150: DISTRIBUTION-DRIFT MONITORING — the exact two-sample
    * KOLMOGOROV–SMIRNOV statistic between every pair of sources' document
    * length distributions, D = sup_v |F_a(v) − F_b(v)|. The between-crawl
    * / between-source drift alarm: a source whose length ECDF moved is a
    * template change, a scraper break, or an injection — before any
    * content model sees it. Complements q147 (token-distribution shift)
    * on the size axis and q144 (per-doc outliers) with a whole-
    * distribution view.
    *
    * EXACT-INTEGER discipline: on discrete data the sup is attained on
    * the merged value grid, and |F_a − F_b| at grid point v is
    * |cum_a·n_b − cum_b·n_a| / (n_a·n_b) — numerator and argmax computed
    * in BIGINT, ks_x1e6 by integer division. No float enters the max.
    *
    * Scale shape: one (source, value) map-combined aggregate; the value
    * GRID (distinct lengths — bounded by the value domain, the q133
    * histogram discipline) crossed with the O(sources) totals, one
    * source-keyed cumulative window, one grid-keyed pair join whose
    * fan-out is sources², never documents².
    */
  def q150KsDrift(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents").select(col("source"), col("n_chars"))
    val grid = d.select(col("n_chars").as("v")).distinct()
    val srcs = d.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val bySv = d.groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("c"))
      .withColumnRenamed("n_chars", "v")
    val fl = srcs.crossJoin(grid)
      .join(bySv, Seq("source", "v"), "left")
      .na.fill(0L, Seq("c"))
      .withColumn("cum", sum(col("c"))
        .over(Window.partitionBy(col("source")).orderBy(col("v"))))
    fl.as("a").join(fl.as("b"),
        col("a.v") === col("b.v") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .agg(max(abs(col("a.cum") * col("b.n") - col("b.cum") * col("a.n")))
        .as("ks_num"))
      .withColumn("ks_x1e6",
        expr("ks_num * CAST(1000000 AS BIGINT) DIV (n_a * n_b)"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** q153: CORPUS-BALANCE DIAGNOSTICS — the GINI COEFFICIENT of
    * per-source document counts and token mass, the one-number skew
    * alarm for a training mix (G = 0 perfectly balanced sources, → 1 one
    * source owns the corpus; mixture designers track exactly this before
    * reaching for q139's temperature reweighting). Computed by the
    * sorted-prefix identity G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) — all
    * BIGINT, gini_x1e6 by integer division, no float anywhere.
    *
    * The ranking window is over ONE ROW PER SOURCE — bounded by the
    * source count, not the corpus (q133's single-partition-window
    * objection applies to per-document windows; a mixture has dozens of
    * sources, so this is the legitimate tiny-global-sort case).
    */
  def q153ShardGini(s: SparkSession, dir: String): DataFrame = {
    val per = tbl(s, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
      .localCheckpoint()
    def gini(valueCol: String, name: String): DataFrame =
      per.select(col("source"), col(valueCol).as("x"))
        .withColumn("i",
          row_number().over(Window.orderBy(col("x"), col("source"))).cast("long"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("total"),
          sum(col("i") * col("x")).as("six"))
        .select(lit(name).as("metric"), col("n"), col("total"),
          (lit(2L) * col("six") - (col("n") + 1L) * col("total"))
            .as("gini_num"))
        .withColumn("gini_x1e6",
          expr("gini_num * CAST(1000000 AS BIGINT) DIV (n * total)"))
    gini("docs", "docs_per_source")
      .unionByName(gini("chars", "chars_per_source"))
      .orderBy(col("metric"))
  }

  /** q168: SOFT-404 detection (Bar-Yossef, Broder, Kumar, Tomkins, WWW
    * 2004, "Sic transit gloria telae") — pages that answer 200 with an
    * error body poison a crawl corpus silently; the gate is the
    * published detector's deterministic core: error-phrase evidence
    * (ONE Aho–Corasick automaton walk per body —
    * [[graft.functions.BlocklistHits]], q119's codegen'd expression,
    * O(len) per row at any phrase-list size) combined with the
    * short-thin-body signal. Every 11th doc is PLANTED as an error page
    * (canned banner + truncated body), so detection truth exists by
    * construction; the DuckDB oracle recomputes the same overlapping
    * phrase counts by position×pattern substring arithmetic, so the
    * automaton, the stump thresholds, and the planted outcome are all
    * hash-checked. Scale shape: stateless per-row projection (automaton
    * built once, shipped as a plan reference), zero shuffles before the
    * final order — the gate belongs inside the fetch/extract scan.
    */
  def q168Soft404(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(s)
    val banner = "error 404 - page not found. the page you requested " +
      "does not exist or is no longer available. "
    val d = tbl(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 11 === 0,
        concat(lit(banner), substring(col("text"), 1, 40)))
        .otherwise(col("text")).as("body"))
    d.select(col("doc_id"),
        length(col("body")).cast("long").as("body_len"),
        expr("blocklist_hits(body, array('page not found'," +
          "'does not exist','no longer available','error 404'))")
          .as("hits"))
      .withColumn("soft404", col("hits") >= 2 && col("body_len") < 200)
      .orderBy(col("doc_id"))
  }

  /** q187: RENDEZVOUS-HASH SHARD STABILITY — consistent doc→shard
    * assignment by highest-random-weight hashing (Thaler & Ravishankar,
    * "Using name-based mappings to increase hit rates", IEEE/ACM ToN
    * 1998): `shard(doc, N) = argmax over s<N of md5(doc_id ‖ ':' ‖ s)`.
    * Unlike `doc_id % N` (which remaps (N−1)/N of the corpus when N
    * grows), growing N→N+1 moves EXACTLY the docs whose new-shard ticket
    * wins — in expectation 1/(N+1) of them — and every moved doc moves TO
    * the new shard. That second property is the in-query correctness
    * certificate: `gain_ok = (NOT moved) OR shard11 = 10`, a structural
    * consequence of argmax that the oracle recomputes independently.
    *
    * Why a curation engine needs it: re-sharding a 100 TB deduped corpus
    * for N→N+1 training-data workers should rewrite ~1/(N+1) of the
    * bytes, not all of them. Scale shape: stateless per-row projection —
    * the argmax is an in-row array fold over N tickets, no shuffle at
    * all before the ORDER BY; the moved-count rollup downstream is one
    * low-cardinality aggregate.
    */
  def q187RendezvousShard(s: SparkSession, dir: String): DataFrame = {
    def shard(n: Int): Column =
      array_max(transform(sequence(lit(0), lit(n - 1)),
        sh => struct(
          md5(concat(col("doc_id").cast("string"), lit(":"),
            sh.cast("string")).cast("binary")).as("ticket"),
          sh.cast("long").as("s")))).getField("s")
    tbl(s, dir, "documents")
      .select(col("doc_id"), shard(10).as("shard10"), shard(11).as("shard11"))
      .withColumn("moved", col("shard10") =!= col("shard11"))
      .withColumn("gain_ok", !col("moved") || col("shard11") === 10)
      .orderBy(col("doc_id"))
  }

  /** q196: LLM-ARTIFACT SCREENING — chat-template/control tokens and
    * assistant boilerplate (`<|im_start|>`, `<|endoftext|>`,
    * `### instruction:`, "as an ai language model", …) are the tells of
    * synthetic or chat-log text that self-training pipelines must keep
    * OUT of pretraining corpora (model-collapse hygiene). One
    * Aho–Corasick walk per document (q119's codegen'd automaton);
    * stump: flagged iff ≥ 2 artifact hits, so a single quoted mention
    * in organic prose survives — the planted single-hit wire pins that
    * threshold. Every 13th doc is planted with a two-artifact
    * chat-template tail, every 13th+1 with one quoted artifact.
    * Oracled: DuckDB recounts by position×pattern substring arithmetic
    * (q168 idiom). Stateless per-row, zero shuffles.
    */
  def q196LlmArtifacts(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(s)
    val d = tbl(s, dir, "documents").select(col("doc_id"),
      when(pmod(col("doc_id"), lit(13)) === 0,
        concat(col("text"),
          lit(" <|im_start|>assistant as an ai language model i can help.")))
        .when(pmod(col("doc_id"), lit(13)) === 1,
          concat(col("text"),
            lit(" the model printed \"<|endoftext|>\" once and stopped.")))
        .otherwise(col("text")).as("body"))
    d.select(col("doc_id"),
        expr("blocklist_hits(lower(body), array('<|im_start|>'," +
          "'<|endoftext|>','### instruction:','as an ai language model'," +
          "'i cannot fulfill that request'))").as("hits"))
      .withColumn("llm_artifact", col("hits") >= 2)
      .orderBy(col("doc_id"))
  }

  /** q197: BASE64-BLOB JUNK DETECTION — long base64/alphanumeric runs
    * (inline images, serialized payloads, tracking state) are
    * token-budget poison: they tokenize terribly and teach nothing.
    * Blobs = regex runs `[A-Za-z0-9+/]{40,}={0,2}`; a document is junk
    * when blobs occupy ≥ 20% of its characters. Every 17th doc is
    * planted with a 96-char md5-concat blob (hex ⊂ the base64 alphabet,
    * byte-identically derivable in DuckDB), so detection truth exists
    * by construction; fully oracled. Stateless per-row regex scan.
    */
  def q197Base64Junk(s: SparkSession, dir: String): DataFrame = {
    def m(off: Int) = md5((col("doc_id") + off).cast("string").cast("binary"))
    val d = tbl(s, dir, "documents").select(col("doc_id"),
      when(pmod(col("doc_id"), lit(17)) === 0,
        concat(col("text"), lit(" "), m(0), m(1), m(2)))
        .otherwise(col("text")).as("body"))
    val blobs = regexp_extract_all(col("body"),
      lit("[A-Za-z0-9+/]{40,}={0,2}"), lit(0))
    d.select(col("doc_id"),
        size(blobs).cast("long").as("n_blobs"),
        coalesce(aggregate(transform(blobs, b => length(b).cast("long")),
          lit(0L), (acc, x) => acc + x), lit(0L)).as("blob_chars"),
        length(col("body")).cast("long").as("body_chars"))
      .withColumn("ratio_x1000", expr("blob_chars * 1000 div body_chars"))
      .withColumn("junk", col("ratio_x1000") >= 200)
      .orderBy(col("doc_id"))
  }

  /** q198: LOG-DUMP / STACK-TRACE DETECTION — the C4-style "page is a
    * machine log" screen: stack-frame markers (one Aho–Corasick walk)
    * plus `YYYY-MM-DD hh:mm:ss` timestamp density (one regex scan).
    * Stump: log-dump iff ≥ 2 stack hits OR ≥ 3 timestamps. Planted
    * wires: every 19th doc a three-frame Java trace, 19th+1 three
    * timestamped log lines, 19th+2 a single timestamp (below
    * threshold — pins the cutoff). Fully oracled. Stateless per-row.
    */
  def q198LogDump(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(s)
    val d = tbl(s, dir, "documents").select(col("doc_id"),
      when(pmod(col("doc_id"), lit(19)) === 0,
        concat(col("text"), lit(" exception in thread \"main\"" +
          " java.lang.IllegalStateException at java.base/x.y(Z.java:1)" +
          " at java.base/a.b(C.java:2)")))
        .when(pmod(col("doc_id"), lit(19)) === 1,
          concat(col("text"), lit(" 2024-01-02 10:11:12 info started" +
            " 2024-01-02 10:11:13 warn retry 2024-01-02 10:11:14 info done")))
        .when(pmod(col("doc_id"), lit(19)) === 2,
          concat(col("text"), lit(" released 2024-01-02 10:11:12 final")))
        .otherwise(col("text")).as("body"))
    val tsPat = "\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}"
    d.select(col("doc_id"),
        expr("blocklist_hits(lower(body), array(" +
          "'traceback (most recent call last)','at java.'," +
          "'caused by: ','exception in thread'))").as("stack_hits"),
        size(regexp_extract_all(col("body"), lit(tsPat), lit(0)))
          .cast("long").as("ts_count"))
      .withColumn("logdump", col("stack_hits") >= 2 || col("ts_count") >= 3)
      .orderBy(col("doc_id"))
  }

  /** q201: POISSON-BOOTSTRAP CONFIDENCE ACCOUNTING — the one-pass
    * bootstrap for corpus statistics at scale (Chamandy et al., "Estimating
    * uncertainty for massive data streams", Google TR 2012): resampling
    * n docs WITH replacement is unpayable at 100 TB, but per-doc
    * Poisson(1) replicate weights stream in one scan and 16 replicates
    * fit one map-combined aggregate. Weights are md5-derived through the
    * exact cumulative Poisson(1) table on u = md5(doc:r) % 10000
    * (3679/7358/9197/9810/9963 — deterministic, engine-identical), the
    * statistic is mean document length, and the replicate spread IS the
    * error bar a data card should print next to the point estimate.
    * Fully oracled. Scale shape: one 16-way in-row explode → one
    * 16-group aggregate; nothing keyed finer than the replicate id.
    */
  def q201PoissonBootstrap(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        explode(sequence(lit(0), lit(15))).as("r"))
      .withColumn("u", conv(substring(md5(concat(
        col("doc_id").cast("string"), lit(":"), col("r").cast("string"))
        .cast("binary")), 1, 4), 16, 10).cast("long") % 10000)
      .withColumn("w",
        when(col("u") < 3679, 0L).when(col("u") < 7358, 1L)
          .when(col("u") < 9197, 2L).when(col("u") < 9810, 3L)
          .when(col("u") < 9963, 4L).otherwise(5L))
      .groupBy(col("r"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("n_eff"),
        sum(col("w") * col("n_chars")).as("w_chars"))
      .withColumn("mean_chars_x100", expr("w_chars * 100 div n_eff"))
      .select(col("r").cast("long").as("r"), col("n_docs"), col("n_eff"),
        col("w_chars"), col("mean_chars_x100"))
      .orderBy(col("r"))

  /** Per-language keyword lists for [[codeDetect]] — tiny, word-exact,
    * lowercased (the extension-free fallback signals public code-corpus
    * pipelines use when a page has no path hint).
    */
  private val CodeKeywords: Seq[(String, Seq[String])] = Seq(
    "c" -> Seq("#include", "printf", "sizeof", "struct", "void"),
    "java" -> Seq("public", "static", "void", "class", "new"),
    "js" -> Seq("function", "const", "var", "return", "=>"),
    "python" -> Seq("def", "import", "lambda", "self", "elif"),
    "rust" -> Seq("fn", "let", "mut", "impl", "match"))

  /** q244: CODE / MATH CONTENT DETECTION — the non-natural-text gate
    * every web-curation stack runs before language-model filtering:
    * C4 (Raffel et al. 2020) famously DROPS any page containing `{`;
    * The Stack (Kocetkov et al. 2022) routes code to its own corpus with
    * per-language handling; OpenWebMath (Paster et al. 2023) keeps LaTeX
    * pages C4 would have thrown away. This operator computes the
    * deterministic signals those decisions need, per document:
    * symbol-character density (`{}()[];=<>` as basis points of chars),
    * indented-line fraction (2-space/tab starts — the layout signal),
    * per-language keyword hit counts with an alphabetical-tiebreak
    * argmax, LaTeX marker occurrences (`\frac \sum \int \begin{ $$`
    * counted by literal replace — no regex escaping divergence to
    * hand an oracle), the C4 brace flag, and the routed class
    * (`code` > `math` > `prose`).
    *
    * Scale shape: ZERO shuffles besides the presentation sort — every
    * signal is a row-local HOF/replace projection over the scan, the
    * same WholeStageCodegen span as q231's readability.
    */
  def q244CodeDetect(s: SparkSession, dir: String): DataFrame =
    codeDetect(tbl(s, dir, "documents")).orderBy(col("doc_id"))

  /** Bare API for [[q244CodeDetect]] over any `(doc_id, text)` table. */
  def codeDetect(documents: DataFrame): DataFrame = {
    val txt = col("text")
    val tk = tokens(txt)
    val lines = split(txt, "\n")
    def kwCnt(kws: Seq[String]): Column =
      size(filter(tk, t => t.isin(kws: _*))).cast("long")
    // literal-substring occurrence count: (len - len(without)) / len(m)
    def litCnt(sqlLit: String, w: Int): Column =
      expr(s"(length(text) - length(replace(text, '$sqlLit', ''))) div $w")
    val cnts = CodeKeywords.map { case (lang, kws) =>
      lang -> kwCnt(kws).as(s"cnt_$lang")
    }
    val sym = regexp_replace(txt, """[{}()\[\];=<>]""", "")
    val base = documents.select(
      Seq(col("doc_id"),
        length(txt).cast("long").as("n_chars"),
        size(lines).cast("long").as("n_lines"),
        (length(txt) - length(sym)).cast("long").as("n_sym"),
        size(filter(lines, l =>
          substring(l, 1, 2) === "  " || substring(l, 1, 1) === "\t"))
          .cast("long").as("n_indent"),
        (litCnt("""\\frac""", 5) + litCnt("""\\sum""", 4) +
          litCnt("""\\int""", 4) + litCnt("""\\begin{""", 7) +
          litCnt("$$", 2)).cast("long").as("math_hits"),
        when(instr(txt, "{") > 0, 1L).otherwise(0L).as("has_brace")) ++
        cnts.map(_._2): _*)
      .withColumn("sym_bp", expr("10000 * n_sym div greatest(n_chars, 1)"))
      .withColumn("indent_bp",
        expr("10000 * n_indent div greatest(n_lines, 1)"))
      .drop("n_chars", "n_sym", "n_indent")
    val kwMax = greatest(CodeKeywords.map(k => col(s"cnt_${k._1}")): _*)
    val langCase = CodeKeywords.foldLeft(
      when(kwMax === 0L, "none")) { case (acc, (lang, _)) =>
      acc.when(col(s"cnt_$lang") === kwMax, lang)
    }
    base
      .withColumn("kw_max", kwMax)
      .withColumn("kw_lang", langCase)
      .withColumn("cls",
        when(col("sym_bp") >= 300L &&
          (col("indent_bp") >= 2000L || col("kw_max") >= 3L), "code")
          .when(col("math_hits") >= 2L, "math")
          .otherwise("prose"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q244_code_detect" -> q244CodeDetect _,
    "q201_poisson_bootstrap" -> q201PoissonBootstrap _,
    "q196_llm_artifacts" -> q196LlmArtifacts _,
    "q197_base64_junk" -> q197Base64Junk _,
    "q198_log_dump" -> q198LogDump _,
    "q187_rendezvous_shard" -> q187RendezvousShard _,
    "q168_soft404" -> q168Soft404 _,
    "q153_shard_gini" -> q153ShardGini _,
    "q163_data_card" -> q163DataCard _,
    "q150_ks_drift" -> q150KsDrift _,
    "q147_domain_tv" -> q147DomainTv _,
    "q103_dsir_weights" -> q103DsirWeights _,
    "q143_readability" -> q143Readability _,
    "q144_outlier_mad" -> q144OutlierMad _,
    "q133_quality_deciles" -> q133QualityDeciles _,
    "q137_isotonic" -> q137Isotonic _,
    "q106_domain_rollup" -> q106DomainRollup _,
    "q107_paragraph_clean" -> q107ParagraphClean _,
    "q112_host_budget" -> q112HostBudget _,
    "q126_bin_pack" -> q126BinPack _)

  private val dkTokens =
    """regexp_split_to_array(lower(trim(text)), '[ \t\n\f\r\x0B]+')"""

  val oracles: Map[String, String] = Map(
    // q244: every signal is a per-row projection; replace() literal
    // counting sidesteps regex-escape divergence entirely; the kw_lang
    // CASE chain order (c, java, js, python, rust) IS the tiebreak
    "q244_code_detect" ->
      s"""WITH b AS (
         |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_chars,
         |    regexp_split_to_array(text, '\n') AS lines, $dkTokens AS tk
         |  FROM documents),
         |c AS (
         |  SELECT doc_id,
         |    CAST(len(lines) AS BIGINT) AS n_lines,
         |    n_chars,
         |    CAST(length(text) - length(regexp_replace(text,
         |      '[{}()\\[\\];=<>]', '', 'g')) AS BIGINT) AS n_sym,
         |    CAST(len(list_filter(lines, l -> substr(l, 1, 2) = '  '
         |      OR substr(l, 1, 1) = chr(9))) AS BIGINT) AS n_indent,
         |    CAST((length(text) - length(replace(text, '\\frac', ''))) // 5
         |      + (length(text) - length(replace(text, '\\sum', ''))) // 4
         |      + (length(text) - length(replace(text, '\\int', ''))) // 4
         |      + (length(text) - length(replace(text, '\\begin{', ''))) // 7
         |      + (length(text) - length(replace(text, '$$$$', ''))) // 2
         |      AS BIGINT) AS math_hits,
         |    CAST(CASE WHEN strpos(text, '{') > 0 THEN 1 ELSE 0 END
         |      AS BIGINT) AS has_brace,
         |    CAST(len(list_filter(tk, x -> x IN ('#include', 'printf',
         |      'sizeof', 'struct', 'void'))) AS BIGINT) AS cnt_c,
         |    CAST(len(list_filter(tk, x -> x IN ('public', 'static',
         |      'void', 'class', 'new'))) AS BIGINT) AS cnt_java,
         |    CAST(len(list_filter(tk, x -> x IN ('function', 'const',
         |      'var', 'return', '=>'))) AS BIGINT) AS cnt_js,
         |    CAST(len(list_filter(tk, x -> x IN ('def', 'import',
         |      'lambda', 'self', 'elif'))) AS BIGINT) AS cnt_python,
         |    CAST(len(list_filter(tk, x -> x IN ('fn', 'let', 'mut',
         |      'impl', 'match'))) AS BIGINT) AS cnt_rust
         |  FROM b),
         |d AS (
         |  SELECT *, 10000 * n_sym // greatest(n_chars, 1) AS sym_bp,
         |    10000 * n_indent // greatest(n_lines, 1) AS indent_bp,
         |    greatest(cnt_c, cnt_java, cnt_js, cnt_python, cnt_rust)
         |      AS kw_max
         |  FROM c)
         |SELECT doc_id, n_lines, math_hits, has_brace, cnt_c, cnt_java,
         |  cnt_js, cnt_python, cnt_rust, sym_bp, indent_bp, kw_max,
         |  CASE WHEN kw_max = 0 THEN 'none'
         |       WHEN cnt_c = kw_max THEN 'c'
         |       WHEN cnt_java = kw_max THEN 'java'
         |       WHEN cnt_js = kw_max THEN 'js'
         |       WHEN cnt_python = kw_max THEN 'python'
         |       ELSE 'rust' END AS kw_lang,
         |  CASE WHEN sym_bp >= 300 AND (indent_bp >= 2000 OR kw_max >= 3)
         |         THEN 'code'
         |       WHEN math_hits >= 2 THEN 'math'
         |       ELSE 'prose' END AS cls
         |FROM d ORDER BY doc_id""".stripMargin,
    // q187: same ticket argmax, ties (never observed) broken toward the
    // larger shard index to match Spark's lexicographic struct max
    "q187_rendezvous_shard" ->
      """WITH t AS (
        |  SELECT doc_id, g.s,
        |    md5(CAST(doc_id AS VARCHAR) || ':' || CAST(g.s AS VARCHAR))
        |      AS ticket
        |  FROM documents, generate_series(0, 10) AS g(s)),
        |r10 AS (
        |  SELECT doc_id, s AS shard10 FROM (
        |    SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY ticket DESC, s DESC) AS rn
        |    FROM t WHERE s < 10) WHERE rn = 1),
        |r11 AS (
        |  SELECT doc_id, s AS shard11 FROM (
        |    SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY ticket DESC, s DESC) AS rn
        |    FROM t) WHERE rn = 1)
        |SELECT r10.doc_id, CAST(shard10 AS BIGINT) AS shard10,
        |  CAST(shard11 AS BIGINT) AS shard11,
        |  shard10 <> shard11 AS moved,
        |  (shard10 = shard11 OR shard11 = 10) AS gain_ok
        |FROM r10 JOIN r11 USING (doc_id) ORDER BY doc_id""".stripMargin,
    // q201: same md5->cumulative-Poisson(1) weights, same exact sums
    "q201_poisson_bootstrap" ->
      """WITH x AS (
        |  SELECT doc_id, n_chars, g.r,
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':'
        |      || CAST(g.r AS VARCHAR)), 1, 4))::BIGINT % 10000 AS u
        |  FROM documents, generate_series(0, 15) AS g(r)),
        |w AS (SELECT doc_id, n_chars, r,
        |    CASE WHEN u < 3679 THEN 0 WHEN u < 7358 THEN 1
        |         WHEN u < 9197 THEN 2 WHEN u < 9810 THEN 3
        |         WHEN u < 9963 THEN 4 ELSE 5 END AS w
        |  FROM x)
        |SELECT CAST(r AS BIGINT) AS r, COUNT(*) AS n_docs,
        |  CAST(SUM(w) AS BIGINT) AS n_eff,
        |  CAST(SUM(w * n_chars) AS BIGINT) AS w_chars,
        |  CAST(SUM(w * n_chars) * 100 // SUM(w) AS BIGINT) AS mean_chars_x100
        |FROM w GROUP BY r ORDER BY r""".stripMargin,
    // q196: q168's position×pattern recount over the lowercased body
    "q196_llm_artifacts" ->
      """WITH d AS (
        |  SELECT doc_id, lower(CASE WHEN doc_id % 13 = 0
        |    THEN text || ' <|im_start|>assistant as an ai language model i can help.'
        |    WHEN doc_id % 13 = 1
        |    THEN text || ' the model printed "<|endoftext|>" once and stopped.'
        |    ELSE text END) AS body
        |  FROM documents),
        |p AS (SELECT unnest(['<|im_start|>','<|endoftext|>',
        |    '### instruction:','as an ai language model',
        |    'i cannot fulfill that request']) AS pat),
        |h AS (
        |  SELECT d.doc_id,
        |    CAST(SUM(list_sum(list_transform(generate_series(1, len(d.body)),
        |      i -> CASE WHEN substr(d.body, i, len(p.pat)) = p.pat
        |           THEN 1 ELSE 0 END))) AS BIGINT) AS hits
        |  FROM d, p GROUP BY d.doc_id)
        |SELECT doc_id, hits, hits >= 2 AS llm_artifact
        |FROM h ORDER BY doc_id""".stripMargin,
    // q197: same md5-concat blob plant, same regex, list_sum lengths
    "q197_base64_junk" ->
      """WITH d AS (
        |  SELECT doc_id, CASE WHEN doc_id % 17 = 0
        |    THEN text || ' ' || md5(CAST(doc_id AS VARCHAR))
        |      || md5(CAST(doc_id + 1 AS VARCHAR))
        |      || md5(CAST(doc_id + 2 AS VARCHAR))
        |    ELSE text END AS body
        |  FROM documents),
        |b AS (SELECT doc_id,
        |    regexp_extract_all(body, '[A-Za-z0-9+/]{40,}={0,2}', 0) AS blobs,
        |    length(body) AS bc
        |  FROM d),
        |c AS (SELECT doc_id, CAST(len(blobs) AS BIGINT) AS n_blobs,
        |    CAST(coalesce(list_sum(list_transform(blobs, x -> length(x))), 0)
        |      AS BIGINT) AS blob_chars,
        |    CAST(bc AS BIGINT) AS body_chars
        |  FROM b)
        |SELECT doc_id, n_blobs, blob_chars, body_chars,
        |  CAST(blob_chars * 1000 // body_chars AS BIGINT) AS ratio_x1000,
        |  (blob_chars * 1000 // body_chars >= 200) AS junk
        |FROM c ORDER BY doc_id""".stripMargin,
    // q198: stack markers by position recount + regex timestamp density
    "q198_log_dump" ->
      """WITH d AS (
        |  SELECT doc_id, CASE WHEN doc_id % 19 = 0
        |    THEN text || ' exception in thread "main"' ||
        |      ' java.lang.IllegalStateException at java.base/x.y(Z.java:1)' ||
        |      ' at java.base/a.b(C.java:2)'
        |    WHEN doc_id % 19 = 1
        |    THEN text || ' 2024-01-02 10:11:12 info started' ||
        |      ' 2024-01-02 10:11:13 warn retry 2024-01-02 10:11:14 info done'
        |    WHEN doc_id % 19 = 2
        |    THEN text || ' released 2024-01-02 10:11:12 final'
        |    ELSE text END AS body
        |  FROM documents),
        |p AS (SELECT unnest(['traceback (most recent call last)','at java.',
        |    'caused by: ','exception in thread']) AS pat),
        |h AS (
        |  SELECT d.doc_id,
        |    CAST(SUM(list_sum(list_transform(generate_series(1, len(lower(d.body))),
        |      i -> CASE WHEN substr(lower(d.body), i, len(p.pat)) = p.pat
        |           THEN 1 ELSE 0 END))) AS BIGINT) AS stack_hits
        |  FROM d, p GROUP BY d.doc_id),
        |t AS (SELECT doc_id, CAST(len(regexp_extract_all(body,
        |    '\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}', 0)) AS BIGINT) AS ts_count
        |  FROM d)
        |SELECT h.doc_id, h.stack_hits, t.ts_count,
        |  (h.stack_hits >= 2 OR t.ts_count >= 3) AS logdump
        |FROM h JOIN t USING (doc_id) ORDER BY h.doc_id""".stripMargin,
    // q168: position×pattern substring arithmetic counts the same
    // overlapping occurrences the Aho–Corasick walk does (q119 idiom)
    "q168_soft404" ->
      """WITH d AS (
        |  SELECT doc_id, CASE WHEN doc_id % 11 = 0
        |    THEN 'error 404 - page not found. the page you requested ' ||
        |         'does not exist or is no longer available. ' ||
        |         substr(text, 1, 40)
        |    ELSE text END AS body
        |  FROM documents),
        |p AS (SELECT unnest(['page not found','does not exist',
        |                     'no longer available','error 404']) AS pat),
        |h AS (
        |  SELECT d.doc_id,
        |    CAST(SUM(list_sum(list_transform(generate_series(1, len(d.body)),
        |      i -> CASE WHEN substr(d.body, i, len(p.pat)) = p.pat
        |           THEN 1 ELSE 0 END))) AS BIGINT) AS hits
        |  FROM d, p GROUP BY d.doc_id)
        |SELECT d.doc_id, CAST(length(d.body) AS BIGINT) AS body_len,
        |  h.hits, (h.hits >= 2 AND length(d.body) < 200) AS soft404
        |FROM d JOIN h USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "q163_data_card" ->
      s"""WITH base AS (
         |  SELECT doc_id, source, lang, n_chars,
         |    CAST(len($dkTokens) AS BIGINT) AS ntok,
         |    CAST(len(list_filter($dkTokens,
         |      x -> list_contains(['the','a','of','and','to','in'], x)))
         |      AS BIGINT) AS stop,
         |    md5(text) AS fp
         |  FROM documents),
         |fc AS (SELECT fp, COUNT(*) AS c FROM base GROUP BY 1),
         |sa AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |    CAST(SUM(ntok) AS BIGINT) AS n_tokens,
         |    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
         |    CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS dup_docs,
         |    CAST(SUM(CASE WHEN ntok >= 10 AND stop * 20 >= ntok
         |      THEN 1 ELSE 0 END) AS BIGINT) AS pass_docs
         |  FROM base JOIN fc USING (fp) GROUP BY 1),
         |tl AS (
         |  SELECT source, lang AS top_lang, lc FROM (
         |    SELECT source, lang, COUNT(*) AS lc,
         |      ROW_NUMBER() OVER (PARTITION BY source
         |        ORDER BY COUNT(*) DESC, lang) AS rn
         |    FROM base GROUP BY source, lang)
         |  WHERE rn = 1),
         |md AS (
         |  SELECT source, n_chars AS len_p50 FROM (
         |    SELECT source, n_chars, doc_id,
         |      ROW_NUMBER() OVER (PARTITION BY source
         |        ORDER BY n_chars, doc_id) AS rn,
         |      COUNT(*) OVER (PARTITION BY source) AS n
         |    FROM base)
         |  WHERE rn = (n + 1) // 2)
         |SELECT source, n_docs, n_tokens, n_chars,
         |  dup_docs * CAST(10000 AS BIGINT) // n_docs AS dup_bp,
         |  pass_docs * CAST(10000 AS BIGINT) // n_docs AS pass_bp,
         |  top_lang, lc * CAST(10000 AS BIGINT) // n_docs AS top_lang_bp,
         |  len_p50
         |FROM sa JOIN tl USING (source) JOIN md USING (source)
         |ORDER BY source""".stripMargin,
    "q153_shard_gini" ->
      s"""WITH per AS (SELECT source, COUNT(*) AS docs,
         |    CAST(SUM(n_chars) AS BIGINT) AS chars
         |  FROM documents GROUP BY 1),
         |g AS (
         |  SELECT 'docs_per_source' AS metric, COUNT(*) AS n,
         |    CAST(SUM(x) AS BIGINT) AS total, CAST(SUM(i * x) AS BIGINT) AS six
         |  FROM (SELECT docs AS x,
         |    ROW_NUMBER() OVER (ORDER BY docs, source) AS i FROM per)
         |  UNION ALL
         |  SELECT 'chars_per_source', COUNT(*),
         |    CAST(SUM(x) AS BIGINT), CAST(SUM(i * x) AS BIGINT)
         |  FROM (SELECT chars AS x,
         |    ROW_NUMBER() OVER (ORDER BY chars, source) AS i FROM per))
         |SELECT metric, CAST(n AS BIGINT) AS n, total,
         |  CAST(2 * six - (n + 1) * total AS BIGINT) AS gini_num,
         |  CAST((2 * six - (n + 1) * total) * 1000000 // (n * total) AS BIGINT) AS gini_x1e6
         |FROM g ORDER BY metric""".stripMargin,
    "q150_ks_drift" ->
      s"""WITH grid AS (SELECT DISTINCT n_chars AS v FROM documents),
         |srcs AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
         |bysv AS (SELECT source, n_chars AS v, COUNT(*) AS c
         |         FROM documents GROUP BY 1, 2),
         |fl AS (
         |  SELECT s.source, s.n, g.v,
         |    SUM(COALESCE(b.c, 0)) OVER (PARTITION BY s.source ORDER BY g.v) AS cum
         |  FROM srcs s CROSS JOIN grid g
         |  LEFT JOIN bysv b ON b.source = s.source AND b.v = g.v)
         |SELECT a.source AS source_a, b.source AS source_b,
         |  CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
         |  CAST(MAX(ABS(a.cum * b.n - b.cum * a.n)) AS BIGINT) AS ks_num,
         |  CAST(MAX(ABS(a.cum * b.n - b.cum * a.n)) * 1000000 // (a.n * b.n) AS BIGINT) AS ks_x1e6
         |FROM fl a JOIN fl b ON a.v = b.v AND a.source < b.source
         |GROUP BY a.source, b.source, a.n, b.n
         |ORDER BY source_a, source_b""".stripMargin,
    "q147_domain_tv" ->
      s"""WITH tk AS (SELECT source, unnest($dkTokens) AS tok FROM documents),
         |dom AS (SELECT source, tok, COUNT(*) AS obs FROM tk GROUP BY 1, 2),
         |corp AS (SELECT tok, CAST(SUM(obs) AS BIGINT) AS cc FROM dom GROUP BY 1),
         |dts AS (SELECT source, CAST(SUM(obs) AS BIGINT) AS dt FROM dom GROUP BY 1),
         |n AS (SELECT CAST(SUM(cc) AS BIGINT) AS ct FROM corp),
         |agg AS (
         |  SELECT d.source, dts.dt, (SELECT ct FROM n) AS ct,
         |    COUNT(*) AS vocab_in_source,
         |    CAST(SUM(ABS(d.obs * (SELECT ct FROM n) - dts.dt * c.cc)) AS BIGINT) AS present_num,
         |    CAST(SUM(c.cc) AS BIGINT) AS cc_present
         |  FROM dom d JOIN corp c USING (tok) JOIN dts USING (source)
         |  GROUP BY d.source, dts.dt)
         |SELECT source, dt AS dom_tokens, ct AS corpus_tokens,
         |  CAST(vocab_in_source AS BIGINT) AS vocab_in_source,
         |  CAST(present_num + dt * (ct - cc_present) AS BIGINT) AS tv_num,
         |  CAST((present_num + dt * (ct - cc_present)) * 1000000 // (2 * dt * ct) AS BIGINT) AS tv_ppm
         |FROM agg ORDER BY source""".stripMargin,
    "q143_readability" ->
      s"""WITH a AS (SELECT doc_id,
         |    CAST(len($dkTokens) AS BIGINT) AS words,
         |    CAST(greatest(1, len(regexp_split_to_array(text, '[.!?]+')) - 1)
         |      AS BIGINT) AS sents,
         |    CAST(len(regexp_split_to_array(lower(text), '[aeiouy]+')) - 1
         |      AS BIGINT) AS vg
         |  FROM documents),
         |b AS (SELECT doc_id, words, sents,
         |    greatest(words, vg) AS sylls FROM a),
         |c AS (SELECT doc_id, words, sents, sylls,
         |    CAST(206835 - (1015 * words) // sents
         |         - (84600 * sylls) // words AS BIGINT) AS fre_x1000,
         |    CAST((3900 * words) // sents
         |         + (1180 * sylls) // words - 1559 AS BIGINT) AS fkgl_x100
         |  FROM b)
         |SELECT doc_id, words, sents, sylls, fre_x1000, fkgl_x100,
         |  CASE WHEN fre_x1000 >= 60000 THEN 'easy'
         |       WHEN fre_x1000 >= 30000 THEN 'standard'
         |       ELSE 'hard' END AS band
         |FROM c ORDER BY doc_id""".stripMargin,
    "q144_outlier_mad" ->
      """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
        |r1 AS (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n FROM d),
        |med AS (SELECT source, MAX(CASE WHEN rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
        |      THEN n_chars END) AS med_chars FROM r1 GROUP BY source),
        |dev AS (SELECT d.doc_id, d.source, m.med_chars,
        |    abs(d.n_chars - m.med_chars) AS dev
        |  FROM d JOIN med m USING (source)),
        |r2 AS (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY dev, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n FROM dev),
        |mad AS (SELECT source, MAX(CASE WHEN rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
        |      THEN dev END) AS mad_chars FROM r2 GROUP BY source)
        |SELECT dev.source, COUNT(*) AS docs,
        |  MAX(dev.med_chars) AS med_chars, MAX(mad.mad_chars) AS mad_chars,
        |  CAST(SUM(CASE WHEN dev.dev > 3 * mad.mad_chars THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers,
        |  MAX(dev.dev) AS max_dev
        |FROM dev JOIN mad USING (source)
        |GROUP BY dev.source ORDER BY source""".stripMargin,
    // the oracle fits the isotonic regression by a DIFFERENT algorithm —
    // the Robertson–Wright minimax identity fit(i) = max_{l≤i} min_{r≥i}
    // mean(l..r) over prefix sums — so hash equality checks PAV itself
    "q137_isotonic" ->
      """WITH d AS (
        |  SELECT doc_id % 50 AS s,
        |    CASE WHEN ('0x' || substr(md5('y' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 <
        |      ([30,60,45,80,20])[CAST((doc_id % 50) % 5 AS INT) + 1]
        |    THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |b AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n,
        |             CAST(SUM(y) AS BIGINT) AS pos FROM d GROUP BY s),
        |pre AS (SELECT s, n, pos,
        |        SUM(n) OVER (ORDER BY s) AS cn,
        |        SUM(pos) OVER (ORDER BY s) AS cy,
        |        COALESCE(SUM(n) OVER (ORDER BY s
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pcn,
        |        COALESCE(SUM(pos) OVER (ORDER BY s
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pcy
        |        FROM b),
        |m AS (SELECT l.s AS l, r.s AS r,
        |       CAST(r.cy - l.pcy AS DOUBLE) / CAST(r.cn - l.pcn AS DOUBLE) AS mu
        |      FROM pre l JOIN pre r ON l.s <= r.s),
        |inr AS (SELECT m.l, i.s AS i, MIN(m.mu) AS v
        |        FROM m JOIN b i ON m.l <= i.s AND m.r >= i.s
        |        GROUP BY m.l, i.s),
        |fit AS (SELECT i AS s, MAX(v) AS f FROM inr GROUP BY i)
        |SELECT b.s, b.n, b.pos, CAST(round(1e6 * fit.f) AS BIGINT) AS fit_x1e6
        |FROM b JOIN fit ON b.s = fit.s ORDER BY b.s""".stripMargin,
    // the oracle takes the global window the Spark side deliberately
    // avoids — rank equality proves the two-level scheme exact
    "q133_quality_deciles" ->
      s"""WITH r AS (
         |  SELECT doc_id, CAST(len($dkTokens) AS BIGINT) AS score,
         |    row_number() OVER (
         |      ORDER BY CAST(len($dkTokens) AS BIGINT) DESC, doc_id) AS rank
         |  FROM documents)
         |SELECT doc_id, score, rank,
         |  CAST(floor(((rank - 1) * 10) /
         |    (SELECT COUNT(*) FROM documents)) AS INT) AS decile
         |FROM r ORDER BY doc_id""".stripMargin,
    "q103_dsir_weights" ->
      s"""WITH ${LmOps.PlantedWireCtes},
         |tk AS (SELECT doc_id, (cls_true = 0) AS tgt, unnest(${LmOps.dkWire}) AS tok,
         |             generate_subscripts(${LmOps.dkWire}, 1) AS pos FROM wirev),
         |pr AS (SELECT doc_id, tgt, tok,
         |         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM tk),
         |feats AS (SELECT doc_id, tgt,
         |    ('0x' || substring(md5(tok || ' ' || nxt), 1, 2))::BIGINT AS b
         |  FROM pr WHERE nxt IS NOT NULL),
         |dist AS (SELECT b, CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         |    COUNT(*) AS cr FROM feats GROUP BY b),
         |st AS (SELECT SUM(ct) AS sct, SUM(cr) AS scr FROM dist),
         |sc AS (SELECT f.doc_id, COUNT(*) AS feats,
         |    CAST(SUM(length(bin(d.ct + 1)) - length(bin(d.cr + 1))) AS BIGINT)
         |    + COUNT(*) * (length(bin((SELECT scr FROM st) + $Buckets))
         |                  - length(bin((SELECT sct FROM st) + $Buckets))) AS w_bits
         |  FROM feats f JOIN dist d USING (b) GROUP BY f.doc_id)
         |SELECT doc_id, feats, w_bits,
         |  CAST(round(100.0 * w_bits / feats) AS BIGINT) AS avg_bits_x100,
         |  (CAST(round(100.0 * w_bits / feats) AS BIGINT) >= $DsirKeepX100) AS kept
         |FROM sc ORDER BY doc_id""".stripMargin,
    "q112_host_budget" ->
      s"""WITH tk AS (SELECT doc_id, source, unnest($dkTokens) AS tok FROM documents),
         |q AS (SELECT doc_id, source,
         |    CAST(round(1000.0 * SUM(CASE WHEN tok IN ('the','a','of','and','to','in')
         |      THEN 1 ELSE 0 END) / COUNT(*)) AS BIGINT) AS q1000
         |  FROM tk GROUP BY doc_id, source),
         |r AS (SELECT *,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY q1000, doc_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY source) AS n FROM q),
         |med AS (SELECT source,
         |    MAX(CASE WHEN rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
         |        THEN q1000 END) AS med_q_x1000
         |  FROM r GROUP BY source),
         |b AS (SELECT source, med_q_x1000,
         |    CAST(CASE WHEN med_q_x1000 >= 70 THEN 15
         |         WHEN med_q_x1000 >= 60 THEN 10 ELSE 5 END AS BIGINT) AS budget
         |  FROM med),
         |rk AS (SELECT doc_id, source,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rnk
         |  FROM q)
         |SELECT rk.doc_id, rk.source, b.med_q_x1000, b.budget, rk.rnk,
         |  (rk.rnk <= b.budget) AS kept
         |FROM rk JOIN b USING (source) ORDER BY rk.doc_id""".stripMargin,
    "q106_domain_rollup" ->
      s"""WITH tk AS (SELECT doc_id, source, unnest($dkTokens) AS tok FROM documents),
         |q AS (SELECT doc_id, source,
         |    CAST(round(1000.0 * SUM(CASE WHEN tok IN ('the','a','of','and','to','in')
         |      THEN 1 ELSE 0 END) / COUNT(*)) AS BIGINT) AS q1000
         |  FROM tk GROUP BY doc_id, source),
         |r AS (SELECT *,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY q1000, doc_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY source) AS n FROM q)
         |SELECT source, COUNT(*) AS docs,
         |  CAST(round(1.0 * SUM(q1000) / COUNT(*)) AS BIGINT) AS avg_q_x1000,
         |  MAX(CASE WHEN rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
         |      THEN q1000 END) AS med_q_x1000,
         |  MIN(q1000) AS min_q_x1000, MAX(q1000) AS max_q_x1000,
         |  (MAX(CASE WHEN rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
         |      THEN q1000 END) >= $DomainFloorX1000) AS dom_kept
         |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "q107_paragraph_clean" ->
      s"""WITH tk AS (SELECT doc_id, unnest($dkTokens) AS tok,
         |             generate_subscripts($dkTokens, 1) AS pos FROM documents),
         |freq AS (SELECT tok, COUNT(*) AS cnt FROM tk WHERE doc_id % 5 <> 0 GROUP BY tok),
         |st AS (SELECT SUM(cnt) + COUNT(*) AS tv FROM freq),
         |sb AS (SELECT tk.doc_id, (tk.pos - 1) // $SegTokens AS seg, tk.pos, tk.tok,
         |    CAST(length(bin((SELECT tv FROM st)))
         |         - length(bin(COALESCE(f.cnt, 0) + 1)) AS BIGINT) AS tb
         |  FROM tk LEFT JOIN freq f USING (tok)),
         |segs AS (SELECT doc_id, seg, COUNT(*) AS w, SUM(tb) AS b FROM sb GROUP BY 1, 2),
         |sk AS (SELECT doc_id, seg,
         |    (CAST(round(100.0 * b / w) AS BIGINT) <= $SegBitsX100) AS seg_kept FROM segs),
         |stats AS (SELECT doc_id, COUNT(*) AS segs,
         |    CAST(SUM(CASE WHEN seg_kept THEN 0 ELSE 1 END) AS BIGINT) AS segs_dropped
         |  FROM sk GROUP BY doc_id),
         |reb AS (SELECT sb.doc_id, COUNT(*) AS kept_words,
         |    md5(string_agg(sb.tok, ' ' ORDER BY sb.pos)) AS kept_md5
         |  FROM sb JOIN sk ON sb.doc_id = sk.doc_id AND sb.seg = sk.seg
         |  WHERE sk.seg_kept GROUP BY sb.doc_id)
         |SELECT s.doc_id, s.segs, s.segs_dropped,
         |  COALESCE(r.kept_words, 0) AS kept_words,
         |  COALESCE(r.kept_md5, md5('')) AS kept_md5
         |FROM stats s LEFT JOIN reb r USING (doc_id) ORDER BY doc_id""".stripMargin)
}
