package graft.queries

/** Corpus-scaled LSH parameter planning (VERDICT r1 gap: band widths were
  * hardcoded demo constants; a 100 TB deployment needs them as functions of
  * corpus size / target recall).
  *
  * The harness queries (q22/q26/q41) keep FIXED parameters because their
  * DuckDB oracle SQL is generated from the same compile-time constants —
  * determinism of the correctness gate. A production job sizes its sketch
  * from the corpus with these helpers and passes the results into the same
  * plan shapes (the plans are parameter-independent: band equi-join,
  * pairs-then-score).
  *
  * Standard LSH analysis (public: Leskovec/Rajaraman/Ullman, "Mining of
  * Massive Datasets" ch. 3):
  *  - sign-LSH bucket width: with b hyperplane bits there are 2^b buckets;
  *    expected occupancy n/2^b drives per-bucket pair cost (occ²/2).
  *    Keeping occupancy O(1–100) makes the candidate set linear in n.
  *  - MinHash banding: a pair with Jaccard similarity s matches some band
  *    of r rows with probability 1-(1-s^r)^b; the S-curve threshold is
  *    approximately t ≈ (1/b)^(1/r).
  */
object LshParams {

  /** Hyperplane bits per sign-LSH band so that expected bucket occupancy
    * n / 2^bits ≈ `targetOccupancy`. Clamped to [8, 30]: below 8 bits the
    * bucket count can drop under the task count (shuffle skew wall); 30
    * keeps the bucket id a positive Int.
    *
    * n = 10^6  → 14 bits;  n = 10^9 → 24 bits;  n = 10^12 → 30 (clamped).
    */
  def signBits(n: Long, targetOccupancy: Long = 64L): Int = {
    require(n > 0 && targetOccupancy > 0)
    val buckets = math.max(1.0, n.toDouble / targetOccupancy)
    val bits = math.ceil(math.log(buckets) / math.log(2)).toInt
    math.min(30, math.max(8, bits))
  }

  /** Expected per-band bucket occupancy for a given corpus size and width —
    * the quantity [[signBits]] holds constant under corpus growth.
    */
  def occupancy(n: Long, bits: Int): Double = n.toDouble / (1L << bits)

  /** Number of OR-ed MinHash bands (of `rowsPerBand` rows each) so the
    * match-probability S-curve crosses 1/2 near Jaccard `threshold`:
    * smallest b with (1/b)^(1/r) ≤ t, i.e. b ≥ t^(-r). Clamped to [1, 64].
    *
    * t=0.8, r=4 → 3 bands;  t=0.5, r=4 → 16 bands.
    */
  def minhashBands(threshold: Double, rowsPerBand: Int): Int = {
    require(threshold > 0 && threshold <= 1 && rowsPerBand > 0)
    val b = math.ceil(math.pow(threshold, -rowsPerBand.toDouble))
    math.min(64, math.max(1, b.toInt))
  }

  /** The approximate Jaccard threshold of a (bands, rowsPerBand) banding:
    * t ≈ (1/b)^(1/r).
    */
  def bandThreshold(bands: Int, rowsPerBand: Int): Double =
    math.pow(1.0 / bands, 1.0 / rowsPerBand)

  /** The shared LSH pairing step: a melted band table with columns
    * `(id, band_idx, key)` (exactly three, in that order, any names/types)
    * → distinct candidate pairs `(a_id, b_id)` with `a_id < b_id`.
    *
    * The input is MATERIALIZED (`localCheckpoint`; a checkpoint/temp table
    * in prod) before the self equi-join — Spark does not reuse a subtree
    * across a self-join's build/probe, so without this the band
    * computation runs once per side. Used by q22/q26/q41 and the
    * production entry points (minhashCandidates, neardupPairs).
    */
  def bandedPairs(melted: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    require(melted.columns.length == 3,
      s"bandedPairs expects (id, band_idx, key), got ${melted.columns.mkString(",")}")
    val m = melted.toDF("id", "band_idx", "k").localCheckpoint()
    m.as("a").join(m.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.k") === col("b.k") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
  }

  /** Multi-probe variant of [[bandedPairs]] for INTEGER band values
    * (SimHash-style bit bands of `bandBits` bits): one join side is
    * expanded with every single-bit flip of its band value, so a band
    * matches when it differs by AT MOST ONE bit instead of exactly zero.
    * By pigeonhole this turns the exact guarantee "hamming ≤ bands-1" into
    * "hamming ≤ 2·bands-1" (4×16-bit bands: every pair at ham ≤ 7 is
    * found — measured in NeardupSpec: recall 1.0 at ham 4–6, where plain
    * banding measures ≈0.90/0.74/0.58).
    *
    * Cost model: probe-side rows × (bandBits+1) — a (1+16)× one-side blow
    * of a table that is already only bands-per-doc rows, and the expansion
    * happens AFTER the checkpoint, so the signature computation still runs
    * once. Buckets stay uniform (a bit flip maps buckets 1:1), so the
    * skew analysis of the plain path carries over.
    */
  def bandedPairsProbed(melted: org.apache.spark.sql.DataFrame,
                        bandBits: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(melted.columns.length == 3,
      s"bandedPairsProbed expects (id, band_idx, key), got ${melted.columns.mkString(",")}")
    require(bandBits >= 1 && bandBits <= 62)
    val m = melted.toDF("id", "band_idx", "k").localCheckpoint()
    val probes = array(col("k") +: (0 until bandBits).map(j =>
      col("k").bitwiseXOR(lit(1L << j))): _*)
    val probed = m.select(col("id"), col("band_idx"),
      explode(probes).as("k"))
    probed.as("a").join(m.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.k") === col("b.k") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
  }
}
