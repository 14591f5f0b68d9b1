package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.ExtractPipeline
import graft.sources.PagesSynth

/** Driver-run benchmark. Prints ONE JSON line:
  *   - per-query seconds for every SparkEntry query on SPARK_GRAFT_SF_DIR;
  *   - the flagship extraction throughput (docs/sec, html MB/sec) over a
  *     pre-materialized synthetic pages table, measured at two parallelism
  *     levels in CPU-pinned child JVMs (local[N] pinned to N CPUs vs
  *     local[4N] pinned to 4N) plus the N→4N scaling efficiency — the
  *     BASELINE.md / north_rule criterion, evidenced at two parallelism
  *     levels per the driver's instruction.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "200000").toLong
    val loCores = math.max(cpus / 4, 1)

    // ---- per-query timings at full parallelism ----
    val spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // ---- extraction scaling: materialize pages once, read in both runs ----
    // RAM-backed dir: disk writeback of the freshly written corpus would
    // otherwise steal cycles from the first timed runs (observed 2-3×
    // variance on ext4); the scaling criterion measures compute, not disk.
    val benchBase =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"
    val pagesPath = s"$benchBase/graft_bench_pages_$benchDocs"
    val pagesDf = PagesSynth.pages(spark, benchDocs, numSlices = cpus * 4)
    pagesDf.write.mode("overwrite").parquet(pagesPath)
    val htmlBytes = spark.read.parquet(pagesPath)
      .select(sum(length(col("html")))).collect()(0).getLong(0)
    spark.stop()

    // Each scaling level runs in its own CHILD JVM pinned (taskset +
    // ActiveProcessorCount) to exactly that many CPUs — see ScalingProbe
    // for why a shared JVM corrupts the N vs 4N ratio.
    def probe(cores: Int): Double = {
      import scala.jdk.CollectionConverters._
      val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala
        .filter(a => a.startsWith("--add-opens") || a.startsWith("java.base/") ||
          a.startsWith("-Xmx") || a.startsWith("-D"))
      val cmd = Seq("taskset", "-c", s"0-${cores - 1}",
        s"${System.getProperty("java.home")}/bin/java",
        s"-XX:ActiveProcessorCount=$cores") ++ jvmArgs ++
        Seq("-cp", System.getProperty("java.class.path"),
          "graft.ScalingProbe", pagesPath, cores.toString, "3")
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(false).start()
      val out = new String(p.getInputStream.readAllBytes)
      p.waitFor()
      val t = out.linesIterator.collectFirst {
        case l if l.startsWith("min_wall_s=") => l.stripPrefix("min_wall_s=").toDouble
      }.getOrElse(sys.error(s"probe($cores) produced no timing: $out"))
      System.err.println(f"[bench] extract pinned[$cores] min=$t%.2fs")
      t
    }
    val tHi = probe(cpus)
    val tLo = probe(loCores)

    // best-effort cleanup of the RAM-backed corpus
    def rmrf(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rmrf); f.delete()
    }
    rmrf(new java.io.File(pagesPath))

    val thrHi = benchDocs / tHi
    val thrLo = benchDocs / tLo
    val eff = thrHi / ((cpus.toDouble / loCores) * thrLo)

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val extract =
      f"""{"docs":$benchDocs,"html_mb":${htmlBytes / 1e6}%.1f,""" +
      f""""cores_lo":$loCores,"cores_hi":$cpus,""" +
      f""""wall_s_lo":$tLo%.2f,"wall_s_hi":$tHi%.2f,""" +
      f""""docs_per_sec_lo":$thrLo%.0f,"docs_per_sec_hi":$thrHi%.0f,""" +
      f""""mb_per_sec_hi":${htmlBytes / 1e6 / tHi}%.1f,""" +
      f""""scaling_efficiency":$eff%.3f}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":$qs,"extract":$extract,"sf":"$sfDir"}""")
  }
}
