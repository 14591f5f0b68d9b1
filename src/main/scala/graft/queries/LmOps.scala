package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical language-model operators beyond q84's unigram perplexity:
  * bigram stupid-backoff scoring (Brants et al., EMNLP 2007 — the LM the
  * original "large LMs for MT" pipeline ran at web scale precisely because
  * its score needs no normalization pass) and a multinomial Naive-Bayes
  * document classifier (the model-based quality-filter shape: train on a
  * labeled split, score every document, keep by predicted class).
  *
  * Both follow the repo's exact-integer discipline: probabilities are
  * floor-log2 bit surrogates (`length(bin(x))`, identical in Spark and
  * DuckDB — established by q55/q84), backoff penalties are whole bits, so
  * every score is a BIGINT and the DuckDB oracle reproduces it bit-for-bit.
  *
  * Scale shape (both): model tables (vocab/class-conditional counts) are
  * explicitly BROADCAST — the Zipf-head defense q55/q56/q84 established,
  * with [[AdvancedOps.saltedJoin]] as the beyond-broadcast fallback; the
  * corpus pays one explode + one doc-keyed map-combined aggregate
  * regardless of model size.
  */
object LmOps {
  import Q._
  import TextOps.WS

  private def tokens(c: Column): Column = split(lower(trim(c)), WS)

  /** q102: bigram stupid-backoff LM scoring (Brants 2007 §3). Train on the
    * deterministic 80% split (doc_id % 5 != 0): bigram counts c2(w1,w2)
    * and unigram counts c1(w). Score EVERY document's adjacent pairs:
    *
    *   hit      (c2 > 0): bits = bitlen(c1(w1)) - bitlen(c2)
    *   backoff  (c2 = 0): bits = 2 + bitlen(total+V) - bitlen(c1(w2)+1)
    *
    * — the backoff constant alpha = 0.4 is taken as exactly 1/4 (2 whole
    * bits) so the score stays integral; the unigram fallback is add-one
    * smoothed exactly as q84 (OOV w2 charged the floor). Documents keep
    * when their per-bigram average is at most the corpus-typical 4.9 bits.
    *
    * The bigram pairing is a per-doc `lead` window (state bounded by one
    * document — safe at corpus scale); both model sides broadcast.
    */
  def q102BigramBackoff(s: SparkSession, dir: String): DataFrame =
    bigramBackoff(tbl(s, dir, "documents"))

  /** The operator proper, over any (doc_id, text) table. */
  def bigramBackoff(d: DataFrame): DataFrame = {
    val tk = d.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val pairs = tk.withColumn("nxt", lead(col("tok"), 1).over(w))
      .where(col("nxt").isNotNull)
      .select(col("doc_id"), col("tok"), col("nxt"))
    val trainTk = tk.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val uni = trainTk.groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val bi = pairs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .groupBy(col("tok"), col("nxt")).agg(count(lit(1)).as("c2"))
    // model-size stats from the vocab table, not a corpus re-scan
    val stats = uni.agg((sum(col("c1")) + count(lit(1))).as("tv"))
    val hitBits = length(bin(col("c1w1"))) - length(bin(col("c2")))
    val backBits = lit(2) + length(bin(col("tv"))) -
      length(bin(coalesce(col("c1w2"), lit(0L)) + 1))
    val bits = when(col("c2").isNotNull, hitBits).otherwise(backBits)
    pairs
      .join(broadcast(bi), Seq("tok", "nxt"), "left")
      .join(broadcast(uni.withColumnRenamed("c1", "c1w1")), Seq("tok"), "left")
      .join(broadcast(uni.toDF("nxt", "c1w2")), Seq("nxt"), "left")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("bigrams"),
        sum(when(col("c2").isNull, 1).otherwise(0)).cast("long").as("backoffs"),
        sum(bits.cast("long")).as("sb_bits"))
      .select(col("doc_id"), col("bigrams"), col("backoffs"), col("sb_bits"),
        round(lit(100.0) * col("sb_bits") / col("bigrams"))
          .cast("long").as("avg_bits_x100"))
      .withColumn("kept", col("avg_bits_x100") <= 490)
      .orderBy(col("doc_id"))
  }

  /** The three planted quality classes and their 4-word vocabularies —
    * class = doc_id % 3 (0 research-ish / 1 spam / 2 boilerplate). The
    * wire text is the document text plus 10 class-vocabulary words, word i
    * selected by the first md5 nibble of the decimal string of
    * doc_id*31+i — byte-identically derivable in DuckDB, so the planted
    * corpus (not just the classifier) is oracle-checked.
    */
  private val ClassVocab = Seq(
    Seq("research", "study", "method", "results"),
    Seq("buy", "cheap", "free", "offer"),
    Seq("copyright", "reserved", "privacy", "cookie"))

  private[queries] def plantedWire(docs: DataFrame): DataFrame = {
    val cv = when(pmod(col("doc_id"), lit(3)) === 0,
        array(ClassVocab(0).map(lit): _*))
      .when(pmod(col("doc_id"), lit(3)) === 1,
        array(ClassVocab(1).map(lit): _*))
      .otherwise(array(ClassVocab(2).map(lit): _*))
    val word = (i: Int) => element_at(cv,
      (conv(substring(md5((col("doc_id") * 31 + lit(i))
        .cast("string").cast("binary")), 1, 1), 16, 10)
        .cast("int") % 4) + 1)
    docs.select(col("doc_id"),
      pmod(col("doc_id"), lit(3)).cast("long").as("cls_true"),
      concat(col("text"), lit(" "),
        concat_ws(" ", (1 to 10).map(word): _*)).as("wire"))
  }

  /** q105: multinomial Naive-Bayes quality classification — the
    * model-based filter of FineWeb-Edu/DCLM pipelines, in its exactly-
    * parallelizable form (all training state is integer counts, so
    * map-side combine is lossless and the oracle is bit-exact; a
    * gradient-descent classifier would be order-dependent in float sums).
    *
    * Train on the 80% split of the PLANTED corpus ([[plantedWire]]);
    * score every document against each class: bits(doc, c) = prior bits
    * (bitlen(totalDocs) - bitlen(docs_c)) plus per-token add-one-smoothed
    * class-conditional bits (bitlen(ctot_c + V) - bitlen(cnt(tok,c) + 1));
    * predict the argmin with (bits, class) tie-break. The 3-class scoring
    * is a 3× crossJoin of a BROADCAST class table — the corpus-side cost
    * stays one explode + one map-combined aggregate.
    */
  def q105NaiveBayes(s: SparkSession, dir: String): DataFrame =
    naiveBayes(plantedWire(tbl(s, dir, "documents")))

  /** The classifier proper, over any (doc_id, cls_true, wire) table. */
  def naiveBayes(wirev: DataFrame): DataFrame = {
    val tk = wirev.select(col("doc_id"), col("cls_true"),
      explode(tokens(col("wire"))).as("tok"))
    val tr = tk.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val cw = tr.groupBy(col("cls_true").as("cls"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val ct = cw.groupBy(col("cls")).agg(sum(col("cnt")).as("ctot"))
    val v = tr.agg(countDistinct(col("tok")).as("vocab"))
    val pd = wirev.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .groupBy(col("cls_true").as("cls")).agg(count(lit(1)).as("docs"))
    val pt = pd.agg(sum(col("docs")).as("tdocs"))
    val classes = ct.join(pd, "cls") // 3 rows — the broadcast model head
    val tokBits = length(bin(col("ctot") + col("vocab"))) -
      length(bin(coalesce(col("cnt"), lit(0L)) + 1))
    val priorBits = length(bin(col("tdocs"))) - length(bin(col("docs")))
    val sc = tk.crossJoin(broadcast(classes))
      .join(broadcast(cw), Seq("cls", "tok"), "left")
      .crossJoin(broadcast(v)).crossJoin(broadcast(pt))
      .groupBy(col("doc_id"), col("cls_true"), col("cls"))
      .agg((sum(tokBits.cast("long")) + max(priorBits.cast("long")))
        .as("bits"))
    val rk = Window.partitionBy(col("doc_id"))
      .orderBy(col("bits"), col("cls"))
    sc.withColumn("r", row_number().over(rk)).where(col("r") === 1)
      .select(col("doc_id"), col("cls_true"), col("cls").as("pred"),
        col("bits").as("pred_bits"), (col("cls") === col("cls_true")).as("correct"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q117
  /** Fixed-point scale for the reproducible-GD classifier: weights and
    * gradient accumulators live in LONGS at 1e9 units. Long addition is
    * exactly associative and commutative, so the distributed gradient sum
    * is BIT-IDENTICAL under any partitioning — the reproducibility that
    * float sums cannot give (the exact objection q105's docstring raises
    * against gradient training, answered rather than avoided).
    */
  private[graft] val ClfScale = 1e9
  private[graft] val ClfDim = 256
  private[graft] val ClfIters = 8
  private[graft] val ClfLrNum = 8L // lr = 8 (integer: grad*8/nTrain)

  /** Binary planted corpus for the classifier: label = doc_id % 2, wire =
    * text + 8 hash-chosen words from the label's 4-word vocabulary
    * (quality-page words vs spam words — the DCLM/fastText quality-filter
    * setup in miniature, deterministic so every engine rebuilds it).
    */
  private[queries] def plantedBinary(docs: DataFrame): DataFrame = {
    val cv = when(pmod(col("doc_id"), lit(2)) === 0,
      array(Seq("research", "study", "method", "results").map(lit): _*))
      .otherwise(array(Seq("buy", "cheap", "free", "offer").map(lit): _*))
    val word = (i: Int) => element_at(cv,
      (conv(substring(md5((col("doc_id") * 37 + lit(i))
        .cast("string").cast("binary")), 1, 1), 16, 10)
        .cast("int") % 4) + 1)
    docs.select(col("doc_id"),
      pmod(col("doc_id"), lit(2)).cast("long").as("y"),
      concat(col("text"), lit(" "),
        concat_ws(" ", (1 to 8).map(word): _*)).as("wire"))
  }

  /** Hashed-feature bucket: first 8 md5 hex chars of the token, mod dim. */
  private def featBucket(c: Column, dim: Int): Column =
    pmod(conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long"),
      lit(dim.toLong)).cast("int")

  /** One row per doc: label, token count, and the per-bucket term counts
    * sorted by bucket id (sorted so the per-doc double dot product has ONE
    * defined summation order — the only float in the pipeline is per-row,
    * never accumulated across rows).
    */
  private[graft] def clfFeatures(wirev: DataFrame, dim: Int): DataFrame =
    wirev.select(col("doc_id"), col("y"),
        explode(tokens(col("wire"))).as("tok"))
      .groupBy(col("doc_id"), col("y"),
        featBucket(col("tok"), dim).as("f"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"), col("y"))
      .agg(sum(col("cnt")).as("ntok"),
        sort_array(collect_list(struct(col("f"), col("cnt")))).as("feats"))

  /** Train a logistic-regression quality classifier by full-batch gradient
    * descent where every cross-row accumulation is a LONG sum in 1e9
    * fixed-point units: the weight trajectory is bit-reproducible under
    * any partitioning/core count (LmSpec pins distributed == sequential
    * reference EXACTLY, and 1-partition == 7-partition). Per iteration:
    * one broadcast of the dim-sized weight array as literals (the IVF
    * centroid-literal pattern — zero extra shuffle for the model) and one
    * explode + map-combined LONG aggregate for the gradient.
    *
    * Returns (final fixed-point weights, per-iteration fixed-point train
    * losses). Model math: z = (Σ_f w_f·cnt_f)/ntok; p = σ(z);
    * per-feature gradient contribution = ((p−y)·cnt_f/ntok)·1e9 truncated
    * to LONG; update w_f −= gradSum_f·lr/nTrain in integer arithmetic.
    */
  private[graft] def trainClassifier(feats: DataFrame, dim: Int,
      iters: Int): (Array[Long], Seq[Long]) = {
    val train = feats.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    var nTrain = 0L // learned from iteration 1's collect, not a count() job
    val w = new Array[Long](dim)
    val losses = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (_ <- 1 to iters) {
      val wlit = typedLit(w.map(_.toDouble / ClfScale).toSeq)
      val z = aggregate(col("feats"), lit(0.0d), (acc, e) =>
        acc + element_at(wlit, e.getField("f") + 1) * e.getField("cnt")) /
        col("ntok")
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val lossCol = (-(col("y") * log(greatest(col("p"), lit(1e-12))) +
        (lit(1L) - col("y")) * log(greatest(lit(1.0) - col("p"), lit(1e-12)))) *
        lit(1e6)).cast("long")
      // ONE job per iteration: gradient rows come from posexplode and the
      // doc's loss contribution rides on its pos=0 row (still a pure LONG
      // sum, so grouping order cannot perturb it)
      val grad = train.withColumn("p", p)
        .select(col("p") - col("y").cast("double") as "err",
          col("ntok"), lossCol.as("loss"),
          posexplode(col("feats")).as(Seq("pos", "e")))
        .select(col("e.f").as("f"),
          (col("err") * col("e.cnt") / col("ntok") * lit(ClfScale))
            .cast("long").as("g"),
          when(col("pos") === 0, col("loss")).otherwise(0L).as("l"),
          when(col("pos") === 0, 1L).otherwise(0L).as("n"))
        .groupBy(col("f")).agg(sum(col("g")).as("g"), sum(col("l")).as("l"),
          sum(col("n")).as("n"))
        .collect() // O(dim) read-back, the k-means-centroid pattern
      losses += grad.map(_.getLong(2)).sum
      if (nTrain == 0L) nTrain = grad.map(_.getLong(3)).sum
      grad.foreach { r =>
        val f = r.getInt(0)
        w(f) -= r.getLong(1) * ClfLrNum / nTrain
      }
    }
    (w, losses.toSeq)
  }

  /** Holdout metrics for a fixed-point weight vector: docs with
    * doc_id % 5 == 0 (never trained on), predicted by sign(z).
    */
  private[graft] def holdoutAccX1000(feats: DataFrame,
      w: Array[Long]): Long = {
    val wlit = typedLit(w.map(_.toDouble / ClfScale).toSeq)
    val z = aggregate(col("feats"), lit(0.0d), (acc, e) =>
      acc + element_at(wlit, e.getField("f") + 1) * e.getField("cnt")) /
      col("ntok")
    val r = feats.filter(pmod(col("doc_id"), lit(5)) === 0)
      .agg(sum(when((z >= 0) === (col("y") === 1L), 1L).otherwise(0L))
        .as("ok"), count(lit(1)).as("n")).head
    r.getLong(0) * 1000L / r.getLong(1)
  }

  /** Score every doc in a feature table with a fixed-point weight vector:
    * (doc_id, y, z_x1e6, pred). z in 1e-6 units is a LONG so downstream
    * artifacts stay integer-deterministic; pred = sign(z).
    */
  private[graft] def scoreAll(feats: DataFrame, w: Array[Long]): DataFrame = {
    val wlit = typedLit(w.map(_.toDouble / ClfScale).toSeq)
    val z = aggregate(col("feats"), lit(0.0d), (acc, e) =>
      acc + element_at(wlit, e.getField("f") + 1) * e.getField("cnt")) /
      col("ntok")
    feats.select(col("doc_id"), col("y"),
      (z * lit(1e6)).cast("long").as("z_x1e6"), (z >= 0).as("pred"))
  }

  /** q117: TRAINABLE quality classifier — logistic regression on hashed
    * token features (the fastText/DCLM model-based filter shape), trained
    * by bit-reproducible distributed gradient descent: every cross-row sum
    * is a fixed-point LONG, so the same corpus gives the same weights on
    * 1 core or 1000 executors. Output: one row per GD iteration with the
    * fixed-point train loss, plus the final holdout accuracy and the
    * self-certifying flag (losses strictly decreasing AND holdout
    * accuracy ≥ 0.9 on the never-trained split of the planted corpus).
    * Not SQL-expressible (iterative training) → rows-only + flag.
    */
  def q117QualityClassifier(s: SparkSession, dir: String): DataFrame = {
    // (measured: tblWide on the feature scan was a wash — the GD
    // iterations over the checkpointed features bound this query)
    val feats = clfFeatures(plantedBinary(tbl(s, dir, "documents")), ClfDim)
      .localCheckpoint()
    val (w, losses) = trainClassifier(feats, ClfDim, ClfIters)
    val acc = holdoutAccX1000(feats, w)
    val ok = losses.sliding(2).forall(p => p(1) < p.head) && acc >= 900L
    import s.implicits._
    losses.zipWithIndex
      .map { case (l, i) => (i + 1L, l, acc, ok) }
      .toDF("iter", "loss_x1e6", "holdout_acc_x1000", "clf_ok")
      .orderBy(col("iter"))
  }

  /** q189: INTERPOLATED KNESER–NEY bigram scoring (Kneser & Ney,
    * ICASSP 1995; interpolated form per Chen & Goodman, "An empirical
    * study of smoothing techniques for language modeling", 1998) — the
    * smoothing that actually ships in n-gram LM tooling, next to q102's
    * stupid backoff. Trained on the same 80% split (doc_id % 5 ≠ 0);
    * with discount D = 3/4 every probability is the exact rational
    *
    *   P(w2|w1) = [max(4·c(w1w2)−3, 0)·B + 3·N1+(w1·)·N1+(·w2)]
    *              / [4·c(w1·)·B]
    *
    * where B = N1+(··) (distinct training bigrams), N1+(w1·)/N1+(·w2)
    * are the continuation type counts. Unseen context (c(w1·) = 0)
    * backs off to the continuation distribution with an add-one floor:
    * max(N1+(·w2), 1)/B. Each bigram contributes `num·1e6 div den` —
    * a per-row exact integer — so the per-doc sum is order-independent
    * and the DuckDB replay is hash-exact. A training bigram unseen as a
    * continuation contributes 0 (bigram-interpolated only; no unigram
    * floor below Pcont — documented, deterministic).
    *
    * Scale shape: q102's exactly — the bigram/vocab model tables enter
    * the per-doc scoring join BROADCAST (Zipf-head defense; saltedJoin
    * is the beyond-broadcast fallback), the only big shuffle is the
    * doc-keyed aggregate. The ×1e6 rationals assume corpus-scale counts
    * fit 63 bits after `4·c·B·1e6` — at 100 TB drop the 1e6 scale to
    * 1e3 or score in bitlen space (q102) instead.
    */
  def q189KneserNey(s: SparkSession, dir: String): DataFrame =
    kneserNey(tbl(s, dir, "documents"))

  def kneserNey(d: DataFrame): DataFrame = {
    val tk = d.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val pairs = tk.withColumn("nxt", lead(col("tok"), 1).over(w))
      .where(col("nxt").isNotNull)
      .select(col("doc_id"), col("tok"), col("nxt"))
    val bi = pairs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .groupBy(col("tok"), col("nxt")).agg(count(lit(1)).as("c2"))
      .localCheckpoint()
    val ctx = bi.groupBy(col("tok"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1p"))
    val cont = bi.groupBy(col("nxt")).agg(count(lit(1)).as("n1s"))
    val bstat = bi.agg(count(lit(1)).as("bt"))
    val num = when(col("c1").isNotNull,
      greatest(col("c2k") * 4 - 3, lit(0L)) * col("bt") +
        lit(3) * col("n1p") * coalesce(col("n1s"), lit(0L)))
      .otherwise(greatest(coalesce(col("n1s"), lit(0L)), lit(1L)))
    val den = when(col("c1").isNotNull, col("c1") * col("bt") * 4)
      .otherwise(col("bt"))
    pairs
      .join(broadcast(bi), Seq("tok", "nxt"), "left")
      .withColumn("c2k", coalesce(col("c2"), lit(0L)))
      .join(broadcast(ctx), Seq("tok"), "left")
      .join(broadcast(cont), Seq("nxt"), "left")
      .crossJoin(broadcast(bstat))
      .withColumn("num_c", num)
      .withColumn("den_c", den)
      .withColumn("px", expr("num_c * 1000000 div den_c"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("bigrams"),
        sum(when(col("c1").isNull, 1L).otherwise(0L)).as("oov_ctx"),
        sum(col("px")).as("kn_x1e6"))
      .orderBy(col("doc_id"))
  }

  /** q200: T5 SPAN-CORRUPTION EXAMPLE GENERATION (Raffel et al., "Exploring
    * the limits of transfer learning with a unified text-to-text
    * transformer", JMLR 2020, §3.1.4): replace token spans with numbered
    * sentinels `<extra_id_K>` and emit the (corrupted input, target)
    * pair — the denoising objective's data builder, run at corpus scale.
    *
    * Deterministic masking, identical in both engines: positions are
    * cut into blocks of 10 tokens; a block is MASKED iff
    * `md5(doc_id:block) % 5 == 0` (≈ 20% of blocks); within a masked
    * block the span starts at `h = md5 % 8` and runs `1 + md5(…) % 2`
    * tokens (1–2, never crossing the block edge — non-overlap by
    * construction, the relational-friendly form of T5's iid span draw;
    * mean mask rate ≈ 3%, sentinels numbered in block order by a dense
    * rank). Only digests travel: input_md5/target_md5 hash the rebuilt
    * strings, built with the q58/q70 ordered collect_list rebuild.
    *
    * Fully oracled (md5 arithmetic + string_agg in DuckDB). Scale
    * shape: one posexplode → one doc-keyed window (sentinel rank) →
    * one doc-keyed rebuild aggregate — single Exchange family; the
    * examples write out as a stateless projection.
    */
  def q200SpanCorrupt(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = tbl(s, dir, "documents")
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .where(col("tok") =!= "")
      .withColumn("blk", expr("pos div 10"))
    def h(salt: String) = conv(substring(md5(concat(
      col("doc_id").cast("string"), lit(":"), col("blk").cast("string"),
      lit(salt)).cast("binary")), 1, 4), 16, 10).cast("long")
    val marked = tk
      .withColumn("masked_blk", h("") % 5 === 0)
      .withColumn("start", h("s") % 8)
      .withColumn("len", h("l") % 2 + 1)
      .withColumn("off", col("pos") - col("blk") * 10)
      .withColumn("in_span",
        col("masked_blk") && col("off") >= col("start") &&
          col("off") < col("start") + col("len"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("blk"))
    val sent = marked.filter(col("in_span") && col("off") === col("start"))
      .select(col("doc_id"), col("blk"),
        (row_number().over(w) - 1).as("k"))
    val ev = marked.join(sent, Seq("doc_id", "blk"), "left")
      .withColumn("inp_tok",
        when(!col("in_span"), col("tok"))
          .when(col("off") === col("start"),
            concat(lit("<extra_id_"), col("k").cast("string"), lit(">"))))
      .withColumn("tgt_tok",
        when(col("in_span") && col("off") === col("start"),
          concat(lit("<extra_id_"), col("k").cast("string"), lit("> "),
            col("tok")))
          .when(col("in_span"), col("tok")))
    def rebuild(c: String) = array_join(transform(
      array_sort(collect_list(when(col(c).isNotNull,
        struct(col("pos"), col(c).as("t"))))),
      x => x.getField("t")), " ")
    ev.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("in_span").cast("long")).as("n_masked"),
        md5(rebuild("inp_tok").cast("binary")).as("input_md5"),
        md5(rebuild("tgt_tok").cast("binary")).as("target_md5"))
      .withColumn("mask_rate_x1000", expr("n_masked * 1000 div n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** q210: DUAL-LM ENSEMBLE GATE — stupid-backoff bits (q102) and
    * interpolated Kneser–Ney probability (q189) scored from ONE shared
    * training pass: the tokenize, the bigram window, the bigram/unigram
    * count tables and the per-pair scoring join are built once and feed
    * BOTH models' per-bigram contributions, which meet in a single
    * doc-keyed aggregate producing both metrics — the "one Exchange
    * family serves two models" plan a production gate wants (CCNet runs
    * exactly this shape: several LM scores per doc, one pass). Keep
    * rule: floor-avg backoff bits ≤ 4.90/bigram AND floor-avg KN mass ≥
    * 0.033/bigram (the corpus median band measured at both scales) —
    * agreement of two differently-smoothed models is the fluency vote.
    * Fully oracled (the two models' CTEs share their prefix in SQL too).
    */
  def q210LmEnsemble(s: SparkSession, dir: String): DataFrame = {
    val tk = tbl(s, dir, "documents").select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val pairs = tk.withColumn("nxt", lead(col("tok"), 1).over(w))
      .where(col("nxt").isNotNull)
      .select(col("doc_id"), col("tok"), col("nxt"))
      .localCheckpoint()
    val bi = pairs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .groupBy(col("tok"), col("nxt")).agg(count(lit(1)).as("c2"))
      .localCheckpoint()
    val uni = tk.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("c1u"))
      .localCheckpoint()
    val ctx = bi.groupBy(col("tok"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1p"))
    val cont = bi.groupBy(col("nxt")).agg(count(lit(1)).as("n1s"))
    val stats = uni.agg((sum(col("c1u")) + count(lit(1))).as("tv"))
    val bstat = bi.agg(count(lit(1)).as("bt"))
    val hitBits = length(bin(col("c1w1"))) - length(bin(col("c2")))
    val backBits = lit(2) + length(bin(col("tv"))) -
      length(bin(coalesce(col("c1w2"), lit(0L)) + 1))
    val bits = when(col("c2").isNotNull, hitBits).otherwise(backBits)
    val num = when(col("c1").isNotNull,
      greatest(coalesce(col("c2"), lit(0L)) * 4 - 3, lit(0L)) * col("bt") +
        lit(3) * col("n1p") * coalesce(col("n1s"), lit(0L)))
      .otherwise(greatest(coalesce(col("n1s"), lit(0L)), lit(1L)))
    val den = when(col("c1").isNotNull, col("c1") * col("bt") * 4)
      .otherwise(col("bt"))
    pairs
      .join(broadcast(bi), Seq("tok", "nxt"), "left")
      .join(broadcast(uni.withColumnRenamed("c1u", "c1w1")), Seq("tok"), "left")
      .join(broadcast(uni.toDF("nxt", "c1w2")), Seq("nxt"), "left")
      .join(broadcast(ctx), Seq("tok"), "left")
      .join(broadcast(cont), Seq("nxt"), "left")
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(bstat))
      .withColumn("bits", bits.cast("long"))
      .withColumn("num_c", num)
      .withColumn("den_c", den)
      .withColumn("px", expr("num_c * 1000000 div den_c"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("bigrams"), sum(col("bits")).as("sb_bits"),
        sum(col("px")).as("kn_sum"))
      .withColumn("avg_bits_x100", expr("sb_bits * 100 div bigrams"))
      .withColumn("kn_avg_x1e6", expr("kn_sum div bigrams"))
      .withColumn("sb_ok", col("avg_bits_x100") <= 490)
      .withColumn("kn_ok", col("kn_avg_x1e6") >= 33000)
      .withColumn("kept", col("sb_ok") && col("kn_ok"))
      .select(col("doc_id"), col("bigrams"), col("avg_bits_x100"),
        col("kn_avg_x1e6"), col("sb_ok"), col("kn_ok"), col("kept"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q102_bigram_backoff" -> q102BigramBackoff _,
    "q105_naive_bayes" -> q105NaiveBayes _,
    "q189_kneser_ney" -> q189KneserNey _,
    "q200_span_corrupt" -> q200SpanCorrupt _,
    "q210_lm_ensemble" -> q210LmEnsemble _,
    "q117_quality_classifier" -> q117QualityClassifier _)

  private val dkTokens =
    """regexp_split_to_array(lower(trim(text)), '[ \t\n\f\r\x0B]+')"""
  private[queries] val dkWire =
    """regexp_split_to_array(lower(trim(wire)), '[ \t\n\f\r\x0B]+')"""

  /** DuckDB twin of [[plantedWire]] — the `base`/`wirev` CTE pair every
    * planted-corpus oracle shares (q105; CurationOps q103).
    */
  private[queries] val PlantedWireCtes: String =
    """base AS (
      |  SELECT doc_id, text,
      |    CASE doc_id % 3
      |      WHEN 0 THEN ['research','study','method','results']
      |      WHEN 1 THEN ['buy','cheap','free','offer']
      |      ELSE ['copyright','reserved','privacy','cookie'] END AS cv
      |  FROM documents),
      |wirev AS (
      |  SELECT doc_id, doc_id % 3 AS cls_true,
      |    text || ' ' || array_to_string(
      |      [cv[1 + CAST(('0x' || substring(md5(CAST(doc_id*31+i AS VARCHAR)),1,1))::BIGINT % 4 AS INT)]
      |       for i in generate_series(1,10)], ' ') AS wire
      |  FROM base)""".stripMargin

  val oracles: Map[String, String] = Map(
    // q200: same 0-based blocks (generate_subscripts is 1-based, hence
    // pos-1), same md5-derived block mask/start/len, same ordered
    // rebuild; coalesce('') because string_agg of all NULLs is NULL in
    // DuckDB while Spark's rebuild of an empty list is ''
    "q200_span_corrupt" ->
      s"""WITH tk AS (SELECT doc_id, unnest($dkTokens) AS tok,
         |             generate_subscripts($dkTokens, 1) AS pos1 FROM documents),
         |m AS (SELECT doc_id, pos1 - 1 AS pos, tok, (pos1 - 1) // 10 AS blk
         |      FROM tk WHERE tok <> ''),
         |hh AS (SELECT doc_id, blk,
         |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':'
         |      || CAST(blk AS VARCHAR)), 1, 4))::BIGINT % 5 = 0 AS masked_blk,
         |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':'
         |      || CAST(blk AS VARCHAR) || 's'), 1, 4))::BIGINT % 8 AS st,
         |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':'
         |      || CAST(blk AS VARCHAR) || 'l'), 1, 4))::BIGINT % 2 + 1 AS ln
         |  FROM (SELECT DISTINCT doc_id, blk FROM m)),
         |mk AS (SELECT m.doc_id, m.pos, m.tok, m.blk, hh.st,
         |    m.pos - m.blk * 10 AS off,
         |    (hh.masked_blk AND m.pos - m.blk * 10 >= hh.st
         |      AND m.pos - m.blk * 10 < hh.st + hh.ln) AS in_span
         |  FROM m JOIN hh ON m.doc_id = hh.doc_id AND m.blk = hh.blk),
         |snt AS (SELECT doc_id, blk,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY blk) - 1 AS k
         |  FROM mk WHERE in_span AND off = st),
         |ev AS (SELECT mk.*, snt.k FROM mk
         |  LEFT JOIN snt ON mk.doc_id = snt.doc_id AND mk.blk = snt.blk),
         |re AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |    SUM(CASE WHEN in_span THEN 1 ELSE 0 END) AS n_masked,
         |    md5(coalesce(string_agg(CASE WHEN NOT in_span THEN tok
         |        WHEN off = st THEN '<extra_id_' || CAST(k AS VARCHAR) || '>'
         |        END, ' ' ORDER BY pos), '')) AS input_md5,
         |    md5(coalesce(string_agg(CASE WHEN in_span AND off = st
         |        THEN '<extra_id_' || CAST(k AS VARCHAR) || '> ' || tok
         |        WHEN in_span THEN tok END, ' ' ORDER BY pos), ''))
         |      AS target_md5
         |  FROM ev GROUP BY doc_id)
         |SELECT doc_id, n_tokens, CAST(n_masked AS BIGINT) AS n_masked,
         |  input_md5, target_md5,
         |  CAST(n_masked * 1000 // n_tokens AS BIGINT) AS mask_rate_x1000
         |FROM re ORDER BY doc_id""".stripMargin,
    // q210: q102's and q189's CTEs fused on their shared prefix, both
    // per-pair scores in one scan, same floor thresholds
    "q210_lm_ensemble" ->
      s"""WITH tk AS (SELECT doc_id, unnest($dkTokens) AS tok,
         |             generate_subscripts($dkTokens, 1) AS pos FROM documents),
         |pr AS (SELECT doc_id, tok,
         |         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM tk),
         |pairs AS (SELECT doc_id, tok, nxt FROM pr WHERE nxt IS NOT NULL),
         |bi AS (SELECT tok, nxt, COUNT(*) AS c2 FROM pairs
         |       WHERE doc_id % 5 <> 0 GROUP BY tok, nxt),
         |uni AS (SELECT tok, COUNT(*) AS c1u FROM tk
         |        WHERE doc_id % 5 <> 0 GROUP BY tok),
         |ctx AS (SELECT tok, SUM(c2) AS c1, COUNT(*) AS n1p FROM bi GROUP BY tok),
         |cont AS (SELECT nxt, COUNT(*) AS n1s FROM bi GROUP BY nxt),
         |st AS (SELECT SUM(c1u) + COUNT(*) AS tv FROM uni),
         |bs AS (SELECT COUNT(*) AS bt FROM bi),
         |sc AS (SELECT p.doc_id,
         |    CASE WHEN b.c2 IS NOT NULL
         |         THEN length(bin(u1.c1u)) - length(bin(b.c2))
         |         ELSE 2 + length(bin((SELECT tv FROM st)))
         |              - length(bin(COALESCE(u2.c1u, 0) + 1)) END AS bits,
         |    CASE WHEN x.c1 IS NOT NULL THEN
         |      (greatest(coalesce(b.c2, 0) * 4 - 3, 0) * s.bt
         |        + 3 * x.n1p * coalesce(n.n1s, 0)) * 1000000
         |        // (x.c1 * s.bt * 4)
         |    ELSE greatest(coalesce(n.n1s, 0), 1) * 1000000 // s.bt END AS px
         |  FROM pairs p
         |  LEFT JOIN bi b ON p.tok = b.tok AND p.nxt = b.nxt
         |  LEFT JOIN uni u1 ON p.tok = u1.tok
         |  LEFT JOIN uni u2 ON p.nxt = u2.tok
         |  LEFT JOIN ctx x ON p.tok = x.tok
         |  LEFT JOIN cont n ON p.nxt = n.nxt
         |  CROSS JOIN bs s),
         |agg AS (SELECT doc_id, COUNT(*) AS bigrams,
         |    CAST(SUM(bits) AS BIGINT) AS sb_bits,
         |    CAST(SUM(px) AS BIGINT) AS kn_sum
         |  FROM sc GROUP BY doc_id)
         |SELECT doc_id, bigrams,
         |  CAST(sb_bits * 100 // bigrams AS BIGINT) AS avg_bits_x100,
         |  CAST(kn_sum // bigrams AS BIGINT) AS kn_avg_x1e6,
         |  (sb_bits * 100 // bigrams <= 490) AS sb_ok,
         |  (kn_sum // bigrams >= 33000) AS kn_ok,
         |  (sb_bits * 100 // bigrams <= 490 AND kn_sum // bigrams >= 33000)
         |    AS kept
         |FROM agg ORDER BY doc_id""".stripMargin,
    // q189: same 80% split, same continuation-count tables, same exact
    // D=3/4 rationals under integer division
    "q189_kneser_ney" ->
      s"""WITH tk AS (SELECT doc_id, unnest($dkTokens) AS tok,
         |             generate_subscripts($dkTokens, 1) AS pos FROM documents),
         |pr AS (SELECT doc_id, tok,
         |         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM tk),
         |pairs AS (SELECT doc_id, tok, nxt FROM pr WHERE nxt IS NOT NULL),
         |bi AS (SELECT tok, nxt, COUNT(*) AS c2 FROM pairs
         |       WHERE doc_id % 5 <> 0 GROUP BY tok, nxt),
         |ctx AS (SELECT tok, SUM(c2) AS c1, COUNT(*) AS n1p FROM bi GROUP BY tok),
         |cont AS (SELECT nxt, COUNT(*) AS n1s FROM bi GROUP BY nxt),
         |bstat AS (SELECT COUNT(*) AS bt FROM bi),
         |sc AS (SELECT p.doc_id,
         |    CASE WHEN x.c1 IS NOT NULL THEN
         |      (greatest(coalesce(b.c2, 0) * 4 - 3, 0) * s.bt
         |        + 3 * x.n1p * coalesce(n.n1s, 0)) * 1000000
         |        // (x.c1 * s.bt * 4)
         |    ELSE greatest(coalesce(n.n1s, 0), 1) * 1000000 // s.bt END AS px,
         |    CASE WHEN x.c1 IS NULL THEN 1 ELSE 0 END AS oov
         |  FROM pairs p
         |  LEFT JOIN bi b ON p.tok = b.tok AND p.nxt = b.nxt
         |  LEFT JOIN ctx x ON p.tok = x.tok
         |  LEFT JOIN cont n ON p.nxt = n.nxt
         |  CROSS JOIN bstat s)
         |SELECT doc_id, COUNT(*) AS bigrams,
         |  CAST(SUM(oov) AS BIGINT) AS oov_ctx,
         |  CAST(SUM(px) AS BIGINT) AS kn_x1e6
         |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q102_bigram_backoff" ->
      s"""WITH tk AS (SELECT doc_id, unnest($dkTokens) AS tok,
         |             generate_subscripts($dkTokens, 1) AS pos FROM documents),
         |pr AS (SELECT doc_id, tok,
         |         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM tk),
         |pairs AS (SELECT doc_id, tok, nxt FROM pr WHERE nxt IS NOT NULL),
         |uni AS (SELECT tok, COUNT(*) AS c1 FROM tk WHERE doc_id % 5 <> 0 GROUP BY tok),
         |bi AS (SELECT tok, nxt, COUNT(*) AS c2 FROM pairs
         |       WHERE doc_id % 5 <> 0 GROUP BY tok, nxt),
         |st AS (SELECT SUM(c1) + COUNT(*) AS tv FROM uni),
         |sc AS (SELECT p.doc_id, COUNT(*) AS bigrams,
         |  CAST(SUM(CASE WHEN b.c2 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS backoffs,
         |  CAST(SUM(CASE WHEN b.c2 IS NOT NULL
         |       THEN length(bin(u1.c1)) - length(bin(b.c2))
         |       ELSE 2 + length(bin((SELECT tv FROM st))) - length(bin(COALESCE(u2.c1,0)+1))
         |       END) AS BIGINT) AS sb_bits
         |  FROM pairs p LEFT JOIN bi b ON p.tok = b.tok AND p.nxt = b.nxt
         |  LEFT JOIN uni u1 ON p.tok = u1.tok
         |  LEFT JOIN uni u2 ON p.nxt = u2.tok
         |  GROUP BY p.doc_id)
         |SELECT doc_id, bigrams, backoffs, sb_bits,
         |  CAST(round(100.0 * sb_bits / bigrams) AS BIGINT) AS avg_bits_x100,
         |  (CAST(round(100.0 * sb_bits / bigrams) AS BIGINT) <= 490) AS kept
         |FROM sc ORDER BY doc_id""".stripMargin,
    "q105_naive_bayes" ->
      s"""WITH $PlantedWireCtes,
         |tk AS (SELECT doc_id, cls_true, unnest($dkWire) AS tok FROM wirev),
         |tr AS (SELECT * FROM tk WHERE doc_id % 5 <> 0),
         |cw AS (SELECT cls_true AS cls, tok, COUNT(*) AS cnt FROM tr GROUP BY 1, 2),
         |ct AS (SELECT cls, SUM(cnt) AS ctot FROM cw GROUP BY cls),
         |v AS (SELECT COUNT(DISTINCT tok) AS vocab FROM tr),
         |pd AS (SELECT cls_true AS cls, COUNT(*) AS docs FROM wirev
         |       WHERE doc_id % 5 <> 0 GROUP BY 1),
         |pt AS (SELECT SUM(docs) AS tdocs FROM pd),
         |sc AS (
         |  SELECT t.doc_id, t.cls_true, c.cls,
         |    CAST(SUM(length(bin(c.ctot + (SELECT vocab FROM v)))
         |             - length(bin(COALESCE(w.cnt,0)+1))) AS BIGINT)
         |    + MAX(length(bin((SELECT tdocs FROM pt))) - length(bin(p.docs))) AS bits
         |  FROM tk t CROSS JOIN ct c
         |  LEFT JOIN cw w ON w.cls = c.cls AND w.tok = t.tok
         |  JOIN pd p ON p.cls = c.cls
         |  GROUP BY 1, 2, 3),
         |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY bits, cls) AS r FROM sc)
         |SELECT doc_id, cls_true, cls AS pred, bits AS pred_bits,
         |  (cls = cls_true) AS correct
         |FROM rk WHERE r = 1 ORDER BY doc_id""".stripMargin)
}
