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
}
