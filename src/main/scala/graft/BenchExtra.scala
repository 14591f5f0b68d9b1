package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round helper bench (guide §1.4): times a SUBSET of the
  * declared queries with the SAME session config and methodology as
  * graft.Bench (warm-up pass, then min of two timed rounds, `.count()`
  * action), so per-query numbers are comparable to BENCH_r*.json without
  * paying for the full 245-query suite + extraction probes.
  *
  *   sbt "runMain graft.BenchExtra q116_prefix_join q212_lsh_quality"
  *   sbt "runMain graft.BenchExtra top25"        # the round-6 hot list
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_ROUNDS (default 2).
  */
object BenchExtra {
  val top25: Seq[String] = Seq(
    "q116_prefix_join", "q212_lsh_quality", "q125_fuzzy_decontaminate",
    "q99_exact_repeats", "q129_kcore", "q100_exactsubstr_cut", "q141_pq_ann",
    "q49_dedup_clusters", "q134_cluster_split", "q63_winnow_pairs",
    "q220_cluster_diameter", "q58_winnow", "q85_surt_lookup", "q95_hits",
    "q41_simhash_pairs", "q117_quality_classifier", "q227_containment_join",
    "q120_triangle_count", "q73_frontier", "q218_margin_bitext",
    "q154_url_templates", "q111_syndication", "q22_minhash_lsh",
    "q181_modularity", "q219_hard_negatives")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "2").toInt
    val names: Seq[String] =
      if (args.isEmpty || args.sameElements(Array("top25"))) top25
      else args.toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = names.map(n => n -> SparkEntry.queries.getOrElse(n,
      sys.error(s"unknown query $n")))
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    qs.foreach { case (n, fn) =>
      spark.sparkContext.setJobDescription(s"warmup $n"); time(fn)
    }
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (r <- 1 to rounds) qs.foreach { case (n, fn) =>
      spark.sparkContext.setJobDescription(s"round$r $n")
      val t = time(fn)
      best(n) = math.min(best.getOrElse(n, Double.MaxValue), t)
    }
    val total = qs.map { case (n, _) => best(n) }.sum
    qs.foreach { case (n, _) => println(f"$n%-28s ${best(n)}%7.3f s") }
    println(f"TOTAL ${total}%7.3f s over ${qs.size} queries")
    spark.stop()
  }
}
