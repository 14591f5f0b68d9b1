package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the q116 prefix-join pipeline (guide §1:
  * isolate where the wall-clock goes before optimizing further).
  */
object ProfileQ116 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window
    def timeIt[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    val t = 0.499
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(cpus).select(col("doc_id"), col("text"))
    def bigrams(c: org.apache.spark.sql.Column) = {
      val tk = split(lower(c), "[^a-z0-9]+")
      val tt = filter(tk, x => length(x) > 0)
      array_distinct(zip_with(
        slice(tt, lit(1), size(tt) - 1), slice(tt, lit(2), size(tt) - 1),
        (a, b) => concat(a, lit(" "), b)))
    }
    // NOTE: tokenizer here approximates queries.TextOps.tokens for
    // profiling only; absolute numbers matter, not exact row counts.
    val sets = timeIt("sets checkpoint") {
      docs.select(col("doc_id"), bigrams(col("text")).as("arr"))
        .select(col("doc_id"), col("arr"), size(col("arr")).as("n"))
        .localCheckpoint()
    }
    val sh0 = sets.select(col("doc_id"), col("n"), explode(col("arr")).as("s"))
    val dict = timeIt("dict checkpoint") {
      sh0.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .withColumn("sid", monotonically_increasing_id())
        .localCheckpoint()
    }
    val sh = sh0.join(dict, "s")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))
    val pref = timeIt("pref checkpoint") {
      sh
        .withColumn("i", row_number().over(w))
        .where(col("i") <= col("n") - ceil(lit(t) * col("n")) + lit(1))
        .select(col("sid").as("s"), col("doc_id"), col("n"), col("i"))
        .localCheckpoint()
    }
    val isets = timeIt("isets checkpoint") {
      sh.groupBy(col("doc_id"))
        .agg(collect_list(col("sid")).as("iarr"), max(col("n")).as("n"))
        .localCheckpoint()
    }
    println(s"pref rows = ${pref.count()}")
    val joined = pref.as("a").join(pref.as("b"),
      col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
        greatest(col("a.n"), col("b.n")) * t <= least(col("a.n"), col("b.n")))
    timeIt("join row count")(println(s"  joined rows = ${joined.count()}"))
    val cand = joined
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("op"),
        max(col("a.i")).as("ma"), max(col("b.i")).as("mb"),
        max(col("a.n")).as("pna"), max(col("b.n")).as("pnb"))
      .where(col("op") + least(col("pna") - col("ma"), col("pnb") - col("mb"))
        >= lit(t / (1.0 + t)) * (col("pna") + col("pnb")))
      .select(col("a_id"), col("b_id"))
      .localCheckpoint()
    timeIt("cand groupBy+filter")(println(s"  cand pairs = ${cand.count()}"))
    val out = cand
      .join(isets.select(col("doc_id").as("a_id"), col("iarr").as("arr_a"),
        col("n").as("na")), "a_id")
      .join(isets.select(col("doc_id").as("b_id"), col("iarr").as("arr_b"),
        col("n").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        size(array_intersect(col("arr_a"), col("arr_b"))).cast("long")
          .as("inter"), col("na"), col("nb"))
      .select(col("a_id"), col("b_id"), col("inter"),
        round(lit(1000.0) * col("inter") /
          (col("na") + col("nb") - col("inter"))).cast("long").as("jac"))
      .where(col("jac") >= 500)
    timeIt("verify")(println(s"  result rows = ${out.count()}"))
    spark.stop()
  }
}
