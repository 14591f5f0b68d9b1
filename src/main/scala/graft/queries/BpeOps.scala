package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge-table training (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * tokenizer-training step of a training-data pipeline, in the paper's own
  * scalable formulation: BPE statistics depend only on the distinct-WORD
  * HISTOGRAM, so the corpus pays exactly one groupBy shuffle up front and
  * every iteration runs on the vocabulary-sized histogram, never the
  * corpus.
  *
  * Per iteration (K iterations for K merges):
  *   - adjacent symbol pairs exploded from the histogram, weighted by word
  *     count — one map-combined aggregate on the pair key;
  *   - the argmax pair via `orderBy(...).limit(1)` — a 1-row driver
  *     read-back (the same O(1) pattern as the k-means centroid fetch),
  *     with a DETERMINISTIC tie-break: highest count, then lexicographic
  *     (left, right);
  *   - greedy leftmost non-overlapping merge application as a pure
  *     `aggregate` fold over each word's symbol array — a stateless map;
  *   - `localCheckpoint()` keeps lineage flat across iterations (the
  *     PageRank/closure discipline).
  *
  * At 100 TB the histogram is vocabulary-sized (1e6–1e8 rows) — still a
  * distributed table, which is why the iteration stays in DataFrames
  * instead of collecting the histogram to the driver.
  *
  * The chosen pair count is NON-INCREASING across merges: a merge only
  * removes occurrences of existing pairs, and any newly-created pair
  * (x, ab) needs an `ab` per occurrence so its count is bounded by the
  * count just merged. q93's flag asserts this invariant; BpeSpec proves
  * merge-table equality against an independent sequential implementation.
  */
object BpeOps {

  /** Character symbols of a word (no end-of-word marker — documented
    * simplification; the merge algebra is identical).
    */
  private def chars(w: Column): Column = split(w, "")

  /** Greedy leftmost non-overlapping application of one merge (l, r) to a
    * symbol array, as a pure fold: append each symbol, or replace the
    * accumulator's tail when it forms the pair.
    */
  private[queries] def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** One learned merge. */
  final case class Merge(rank: Int, left: String, right: String,
                         pairCount: Long)

  /** Train `nMerges` BPE merges over the whitespace-tokenized corpus.
    * Returns the merges in rank order (may be fewer than requested if the
    * histogram runs out of adjacent pairs).
    */
  def trainBpe(docs: DataFrame, nMerges: Int): Seq[Merge] = {
    require(nMerges > 0)
    var hist = docs
      .select(explode(split(lower(trim(col("text"))), TextOps.WS)).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), chars(col("w")).as("syms"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val best = hist
        .where(size(col("syms")) > 1)
        .select(col("cnt"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("l"), col("r"))
        .limit(1)
        .collect() // 1 row: the argmax read-back
      if (best.isEmpty) done = true
      else {
        val l = best(0).getString(0)
        val r = best(0).getString(1)
        val pc = best(0).getLong(2)
        merges += Merge(rank, l, r, pc)
        hist = hist
          .withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint()
        rank += 1
      }
    }
    merges.result()
  }

  /** Sequential-by-rank BPE encoding of one word (the reference apply
    * order: each merge applied fully — greedy leftmost — before the next
    * rank). Plain-JVM hot loop: encoding runs per corpus row, so this is
    * scanner-grade code, not an expression tree.
    */
  def encodeWord(w: String, merges: Seq[(String, String)]): Array[String] = {
    // split by CODEPOINT, not UTF-16 unit — Spark's split(w, "") keeps
    // surrogate pairs together, and the q98 twin flag compares the two
    var syms: Array[String] =
      w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    merges.foreach { case (l, r) =>
      if (syms.length > 1) {
        val out = Array.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  /** JVM-side twin of the tokens() split (same explicit class as
    * [[TextOps.WS]]). */
  private def jvmTokens(text: String): Array[String] =
    // Locale.ROOT: Spark's lower() is locale-independent; default-locale
    // toLowerCase would diverge on Turkish dotted/dotless I
    text.toLowerCase(java.util.Locale.ROOT).trim
      .split("[ \t\n\f\r\u000B]+").filter(_.nonEmpty)

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map("%02x".format(_)).mkString
  }

  /** q98: BPE ENCODING with the learned merges — the apply half of the
    * tokenizer loop (q93 trains, this encodes). Per document: word count,
    * subword count, words that stayed a single token, and an md5
    * fingerprint of the full subword sequence.
    *
    * Rows-only; `enc_ok` certifies through two INDEPENDENT execution
    * paths: the typed JVM encoder (the production path — a per-row hot
    * loop, scanner-grade) and a pure Catalyst HIGHER-ORDER-FUNCTION fold
    * (`transform` over words, 8 nested `aggregate` merges over the char
    * array) must produce byte-identical sequence fingerprints and counts
    * for every document. Scale: encoding is a stateless projection; the
    * learned merge table (8 rows) rides into both paths as literals.
    */
  def q98BpeEncode(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val merges = trainBpe(Q.tbl(s, dir, "documents"), 8)
      .map(m => (m.left, m.right))
    import s.implicits._
    // tblWide on both certifying legs: the per-row BPE encode (JVM hot
    // loop / 8-level Catalyst fold) is heavy stateless scan work with no
    // earlier exchange to spread it (the q204 profile)
    val jvm = Q.tblWide(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val words = jvmTokens(if (text == null) "" else text)
        val subs = words.map(encodeWord(_, merges))
        (id, words.length.toLong, subs.map(_.length.toLong).sum,
          subs.count(_.length == 1).toLong,
          md5hex(subs.map(_.mkString("\u0001")).mkString("\u0002")))
      }
      .toDF("doc_id", "n_words", "n_subwords", "n_whole", "enc_fp")
    // Catalyst twin: the same encode as a pure expression fold
    val wordsCol = filter(
      split(lower(trim(col("text"))), TextOps.WS), w => length(w) > 0)
    val encExpr = (w: Column) => merges.foldLeft(chars(w)) {
      case (c, (l, r)) => applyMerge(c, l, r)
    }
    val subsCol = transform(wordsCol, w => encExpr(w))
    val twin = Q.tblWide(s, dir, "documents").select(col("doc_id"),
      size(wordsCol).cast("long").as("t_words"),
      aggregate(subsCol, lit(0L), (acc, x) => acc + size(x)).as("t_subwords"),
      size(filter(subsCol, x => size(x) === 1)).cast("long").as("t_whole"),
      md5(array_join(transform(subsCol, x => array_join(x, "\u0001")),
        "\u0002").cast("binary")).as("t_fp"))
    jvm.join(twin, "doc_id")
      .select(col("doc_id"), col("n_words"), col("n_subwords"),
        col("n_whole"), col("enc_fp"),
        (col("n_words") === col("t_words") &&
          col("n_subwords") === col("t_subwords") &&
          col("n_whole") === col("t_whole") &&
          col("enc_fp") === col("t_fp") &&
          col("n_subwords") >= col("n_words")).as("enc_ok"))
      .orderBy(col("doc_id"))
  }

  /** q93: the learned merge table as a driver query. Rows-only (iterative —
    * not SQL-expressible); `bpe_ok` self-certifies the structural algebra:
    * merged symbol == left‖right, ranks contiguous from 1, counts strictly
    * positive and NON-INCREASING in rank (see object doc for why that
    * invariant must hold). BpeSpec carries the full correctness proof
    * (merge-table equality vs an independent sequential implementation,
    * including tie-break cases).
    */
  def q93BpeTrain(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = trainBpe(Q.tbl(s, dir, "documents"), 12)
    import s.implicits._
    val w = Window.orderBy(col("rank")) // 12 rows: single-partition is fine
    m.toDF("rank", "left", "right", "pair_count")
      .select(col("rank").cast("long").as("rank"), col("left"), col("right"),
        concat(col("left"), col("right")).as("merged"), col("pair_count"))
      .withColumn("bpe_ok",
        col("merged") === concat(col("left"), col("right")) &&
          col("pair_count") > 0 &&
          col("rank") === row_number().over(w).cast("long") &&
          coalesce(lag(col("pair_count"), 1).over(w) >= col("pair_count"),
            lit(true)))
      .orderBy(col("rank"))
  }

  /** q221: TOKENIZER FERTILITY AUDIT — per-language subwords-per-word
    * and bytes-per-subword under the learned BPE table, plus each
    * language's fertility RELATIVE to the corpus mean. The fairness
    * number multilingual-tokenizer reports publish (Petrov et al. 2023,
    * "Language Model Tokenizers Introduce Unfairness Between
    * Languages"): a language whose rel_fert is well above 1000 pays
    * proportionally more sequence length — and so more compute and a
    * shorter effective context — for the same text.
    *
    * Rows-only; `fert_ok` certifies the q98 discipline one level up:
    * per-language totals from the Catalyst higher-order-function encode
    * aggregated RELATIONALLY must equal an independent sequential
    * groupByKey fold running the typed JVM encoder — two execution
    * paths for the encode AND two for the aggregation. Scale: encoding
    * is stateless per row; the per-language rollup is one L-row
    * map-combined aggregate; the totals row broadcasts back.
    */
  def q221Fertility(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val merges = trainBpe(Q.tbl(s, dir, "documents"), 8)
      .map(m => (m.left, m.right))
    import s.implicits._
    val wordsCol = filter(
      split(lower(trim(col("text"))), TextOps.WS), w => length(w) > 0)
    val encExpr = (w: Column) => merges.foldLeft(chars(w)) {
      case (c, (l, r)) => applyMerge(c, l, r)
    }
    val subsCol = transform(wordsCol, w => encExpr(w))
    // (measured: tblWide on this leg was a wash — the twin leg's
    // mapGroups, capped at one task per language, bounds the query)
    val rel = Q.tbl(s, dir, "documents")
      .select(col("lang"),
        octet_length(col("text")).cast("long").as("b"),
        size(wordsCol).cast("long").as("w"),
        aggregate(subsCol, lit(0L), (acc, x) => acc + size(x)).as("sw"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"), sum(col("b")).as("bytes"),
        sum(col("w")).as("words"), sum(col("sw")).as("subwords"))
    val tot = rel.agg(sum(col("words")).as("tw"),
      sum(col("subwords")).as("tsw"))
    val relF = rel.crossJoin(broadcast(tot))
      .withColumn("fert_x1000", expr("(1000 * subwords) div words"))
      .withColumn("bytes_per_sub_x1000", expr("(1000 * bytes) div subwords"))
      .withColumn("rel_fert_x1000",
        expr("(1000 * subwords * tw) div (words * tsw)"))
    val twin = Q.tbl(s, dir, "documents")
      .select(col("lang"), col("text")).as[(String, String)]
      .groupByKey(_._1).mapGroups { (lang, it) =>
        var docs = 0L; var bytes = 0L; var words = 0L; var subs = 0L
        it.foreach { case (_, text0) =>
          val text = if (text0 == null) "" else text0
          docs += 1
          bytes += text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
          val ws = jvmTokens(text)
          words += ws.length
          var i = 0
          while (i < ws.length) { subs += encodeWord(ws(i), merges).length; i += 1 }
        }
        (lang, docs, bytes, words, subs)
      }.toDF("t_lang", "t_docs", "t_bytes", "t_words", "t_subwords")
    relF.join(twin, col("lang") === col("t_lang"))
      .select(col("lang"), col("docs"), col("bytes"), col("words"),
        col("subwords"), col("fert_x1000"), col("bytes_per_sub_x1000"),
        col("rel_fert_x1000"),
        (col("docs") === col("t_docs") && col("bytes") === col("t_bytes") &&
          col("words") === col("t_words") &&
          col("subwords") === col("t_subwords") &&
          col("subwords") >= col("words")).as("fert_ok"))
      .orderBy(col("lang"))
  }
}
